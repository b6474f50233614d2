"""Explicit fractional-step solver (Blasco-Codina-Huerta 1998).

TPU-native rebuild of the reference flagship
(``fractionalStep/explicit/Cpp/blascoCodinaHuerta.cpp``): Q2/Q1 hexes
(27-node velocity, 8-node pressure), lumped-mass explicit predictor,
pressure-Poisson solve on Z = G^T Md^-1 G, projection, with ``maxIter``
nonlinear sub-iterations per time step (``timeLoop`` :2815-3120,
``step1/2/3`` :3692-3974).

TPU-first design decisions (SURVEY.md §7):

* The *entire* time step — sub-iteration loop, CG solve included — is one
  jitted function; ``steps_per_chunk`` of them are fused into a single
  ``lax.while_loop`` dispatch, so there are **zero host round-trips per
  step** (the reference GPU path syncs scalars + copies the full monitor
  state to host every step, ``CUDAcodes.cu:1090-1143``).
* Convection is matrix-free (gather -> einsum -> segment_sum), mirroring
  the reference GPU kernel's "never materialise A" trick
  (``CUDAcodes.cu:848-887``) without its mesh-coloring machinery.
* Constant operators K, G, G^T, Z live in HBM as padded ELL.
* Dirichlet velocity BCs are the reference's exact recipe: Md := 1 at BC
  rows (``applyBC_Step1(1)`` :4129-4135), RHS rows zeroed (R1/R3 hold
  velocity *increments* at BC nodes, :4137-4146, :4192-4207); the pressure
  pin multiplies Z[pin,pin] by LARGE=1000 (:4167-4180).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from cfd_with_cuda_tpu.fem.assembly import assemble_operators
from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.fem.sparse import ell_from_csr
from cfd_with_cuda_tpu.io.deck import Deck
from cfd_with_cuda_tpu.mesh.topology import (
    face_bc_to_node_bc,
    find_monitor_node,
    promote_hex_mesh,
)
from cfd_with_cuda_tpu.ops.krylov import cg
from cfd_with_cuda_tpu.ops.spmv import convection_apply, ell_spmv
from cfd_with_cuda_tpu.solvers.base import ChunkedTimeLoop, StepStats
from cfd_with_cuda_tpu.utils.config import SolverConfig

__all__ = ["ExplicitState", "StepStats", "ExplicitBCHSolver"]


class ExplicitState(NamedTuple):
    """Device-resident solution state (a pytree).

    ``unp1_prev`` persists across time steps because the reference only
    resets ``UnpHalf_prev``/``Acc_prev`` at the top of each step
    (``timeLoop`` :2872-2880 — the ``Unp1_prev=Un`` reset is commented
    out), so the first sub-iteration's convergence test compares against
    the previous step's last iterate.
    """

    un: jax.Array      # (3, NN) velocity at time n (lane-major layout)
    pn: jax.Array      # (NNp,)  pressure at time n
    unp1_prev: jax.Array
    # last pressure-rate solution: warm start for the next step's first
    # (cold) CG solve — pdot varies slowly step to step, and the first
    # sub-iteration's solve dominates the pressure cost (44 cold vs ~10
    # warm iterations at NE27000).  The CG bound stays relative to ||b||
    # so the converged iterate is unchanged.
    pdot: jax.Array
    # pdot one step earlier: with pressure_warm_extrap the first solve
    # warm-starts from the linear extrapolation 2*pdot - pdot_nm1
    # (carrying the step-to-step trend), same ||b||-relative bound
    pdot_nm1: jax.Array


@dataclass
class ExplicitBCHSolver(ChunkedTimeLoop):
    """Setup once from a deck, then run jitted chunks of time steps."""

    deck: Deck
    config: SolverConfig

    def __init__(self, deck: Deck, config: SolverConfig | None = None):
        self.deck = deck
        self.config = config or SolverConfig()
        self._setup()

    # attributes snapshotted by the on-disk setup cache (utils/setup_cache)
    _SNAP_ATTRS = (
        "nn", "nnp", "pin", "dt", "structured", "elem_structured", "perm",
        "perm_p", "fine_dims", "coarse_dims", "elem_dims", "chan_order",
        "local_off", "k_offsets", "z_radius", "g_radius", "gt_radius",
        "s_pad", "pin_grid", "monitor_node", "monitor_node_deck",
        "monitor_node_p", "bc_of_node", "f64_dia", "g_dia_off",
        "gt_dia_off", "use_mg", "mg_dims", "mg_radii",
        "mg_omegas", "_pallas_layout", "conv_oij",
        "layout", "sp_c", "k_pairs", "g_pairs", "mon_cls", "mon_q",
        "z_offs",
        "conv_i_order", "conv_groups", "conv_pairs2",
    )

    # ------------------------------------------------------------------ setup
    def _setup(self) -> None:
        deck = self.deck
        cfg = self.config
        dtype = cfg.jnp_dtype()

        from cfd_with_cuda_tpu.utils import setup_cache as sc

        # decided at setup: the fused Pallas path wants device arrays
        # pre-padded to the kernel block multiple (backend-dependent, so
        # it participates in the cache fingerprint)
        self._pallas_layout = cfg.fused_pressure_eligible()

        cache_dir = cfg.setup_cache_dir()
        cache_key = None
        if cache_dir:
            cache_key = sc.deck_fingerprint(
                deck, cfg, type(self).__name__, self._pallas_layout
            )
            snap = sc.snapshot_load(cache_dir, cache_key)
            if snap is not None:
                sc.solver_restore(self, snap)
                self._compiled = {}
                self.setup_cache_hit = True
                return
        self.setup_cache_hit = False

        # parity-split layout attrs (filled by _try_structured when active)
        self.layout = "interleaved"
        self.sp_c = None
        self.k_pairs = None
        self.g_pairs = None
        self.mon_cls = None
        self.mon_q = None
        self.conv_i_order = None
        self.conv_groups = None
        self.conv_pairs2 = None

        mesh = promote_hex_mesh(deck.conn, deck.coords)
        self.mesh = mesh
        self.nn, self.nnp = mesh.nn, deck.nnp
        tab = build_element_tables(
            mesh.coords, mesh.ltog_node, etype=deck.etype,
            nenv=deck.nenv, nenp=deck.nenp, ngp=deck.ngp,
        )
        self.tables = tab

        ops = assemble_operators(
            tab, mesh.ltog_node, mesh.nn, self.nnp,
            viscosity=deck.viscosity, density=deck.density, z_mode="product",
        )
        self.ops = ops

        # BC node info
        bc_of_node = face_bc_to_node_bc(
            mesh.ltog_node, deck.bc_vel_faces, mesh.nn,
            quadratic=deck.nenv != deck.nenp,
        )
        self.bc_of_node = bc_of_node
        is_bc = bc_of_node >= 0
        bc_vel = np.zeros((mesh.nn, 3))
        bc_vel[is_bc] = deck.bc_str[bc_of_node[is_bc]]
        from cfd_with_cuda_tpu.mesh.profiles import apply_inlet_profile

        apply_inlet_profile(deck, mesh.coords, bc_of_node, bc_vel)

        # Lumped mass with/without BC rows (ref step0 :3281-3295)
        md = ops.Md.copy()
        md_orig_inv = 1.0 / md
        md[is_bc] = 1.0
        md_inv = 1.0 / md

        # Pressure pin: LARGE * Z[pin, pin]  (ref applyBC_Step2(1))
        Z = ops.Z.tocsr().copy()
        pin = deck.zero_pressure_node
        self.pin = pin
        if pin >= 0:
            Z[pin, pin] = Z[pin, pin] * cfg.pressure_pin_large

        # ---- structured fast path: detect a box-grid topology, renumber
        # nodes lexicographically and build gather-free DIA operators
        # (fem/structured.py — random gathers are the TPU bottleneck).
        self.structured = False
        self.elem_structured = False
        self.use_mg = False
        self.perm = None
        if self.config.structured in ("auto", "force"):
            self._try_structured(mesh, ops, Z, is_bc, bc_vel, md_inv, md_orig_inv)
            if self.config.structured == "force" and not self.structured:
                raise ValueError("structured mode forced but mesh is not a box grid")
        if self.config.pressure_precond == "mg" and not self.use_mg:
            raise ValueError(
                "pressure_precond='mg' needs the structured fast path "
                "(geometric hierarchy); this mesh fell back to ELL"
            )
        if self.config.structured_layout == "parity" and self.layout != "parity":
            raise ValueError(
                "structured_layout='parity' needs the fused Pallas path "
                "(single chip, f32/pallas backend) on an element-"
                "structured box grid"
            )

        dev = lambda x: np.asarray(x, dtype=dtype)
        self.z_offs = None
        if not self.structured:
            z_ell = ell_from_csr(
                Z.indptr.astype(np.int64), Z.indices.astype(np.int64),
                Z.data, n_cols=self.nnp,
            )
            # Device layouts: lane-major (big node/element axis minor-most)
            # — see ops/spmv.py.  Fields are (3, NN); element tables
            # NE-minor.  K, A(un), G and G^T all apply matrix-free
            # through ELEMENTAL matrices (ops.spmv.elem_*): the assembled
            # slot-major ELL forms gather L x N elements per apply and
            # XLA:TPU random gathers run at ~1e8 elem/s — the K ELL SpMV
            # alone measured ~0.7 s/apply at NE27000 (9.4 s/step; chunk
            # dispatches then exceeded the tunnel worker's watchdog —
            # the round-3 "TPU worker crashed" bench failures).  Only
            # the pressure operator Z (27 cols on the coarse 8-node
            # pattern; ~22 ms/step measured for the whole CG) stays ELL:
            # it has no elemental form on the product route.
            from cfd_with_cuda_tpu.fem.assembly import (
                elemental_gradient,
                elemental_stiffness,
            )

            ke = elemental_stiffness(tab, deck.viscosity)
            ge = elemental_gradient(tab, deck.density)
            from cfd_with_cuda_tpu.ops.spmv import build_reverse_incidence

            ltog_t = np.asarray(mesh.ltog_node.T, dtype=np.int32)
            ltog_p_t = np.asarray(
                mesh.ltog_node[:, : deck.nenp].T, dtype=np.int32
            )
            self.d = {
                "ltog": ltog_t,
                "ltog_p": ltog_p_t,
                # reverse-incidence scatter tables (ops.spmv): the
                # elemental scatter as deg gathers, not an XLA scatter
                # (segment-sum measured 4.2 s/step on TPU at NE27000)
                "rev": build_reverse_incidence(ltog_t, mesh.nn),
                "rev_p": build_reverse_incidence(ltog_p_t, self.nnp),
                "Sv": dev(tab.Sv),
                "gDSv": dev(np.transpose(tab.gDSv, (3, 2, 1, 0))),
                "gq": dev(tab.gq_factor.T),
                "Ke": dev(np.transpose(ke, (1, 2, 0))),
                "Ge": dev(np.transpose(ge, (0, 2, 3, 1))),
                "Z_vals": dev(z_ell.vals),
                "Z_cols": np.asarray(z_ell.cols),
                "Z_diag": dev(Z.diagonal()),
                "md_inv": dev(md_inv),
                "md_orig_inv": dev(md_orig_inv),
                "bc_mask": dev(np.where(is_bc, 0.0, 1.0)),
                "bc_vel": dev(bc_vel.T),
            }
            self.monitor_node = find_monitor_node(
                deck.coords,
                deck.monitor_xyz if deck.monitor_xyz is not None else (0.5,) * 3,
            )
            # pressure monitor: corner node ids < NNp index pn directly
            self.monitor_node_p = self.monitor_node

            # Banded-window pressure operator (ops/banded.py): when the
            # deck's corner-node numbering keeps Z's column offsets
            # bounded (every generator/converter scan order does), the
            # pressure CG rides the SAME windowed kernels as the
            # structured path — shifted contiguous reads instead of the
            # L x NNp random ELL gather per iteration (measured ~2 s of
            # the 4.2 s/step ell bench row).  ELL stays the fallback.
            from cfd_with_cuda_tpu.ops.banded import banded_from_csr

            banded = banded_from_csr(Z, max_offsets=512)
            if banded is not None:
                self.z_offs, z_bwin = banded
                self.d["Z_bwin"] = dev(z_bwin)
                if self._pallas_layout:
                    # pre-laid DMA-block weight layout + inverse diag for
                    # the fused CG kernel (skips the per-call pad chain)
                    from cfd_with_cuda_tpu.ops.pallas_cg import (
                        cg_weight_layout,
                    )

                    self.d["Z_bwin_cg"] = cg_weight_layout(
                        dev(z_bwin), (self.nnp, 1, 1), None,
                        offs=self.z_offs,
                    )
        if not self.structured:
            # ELL path shard padding: pad the velocity-node axis to a
            # shard_pad multiple so SPMD runs can 1-D-shard the fields
            # and ELL operators (parallel/sharding).  Padded rows carry
            # zero operator values / col 0, md_inv 1, bc_mask 0 — results
            # are bit-identical to the unpadded layout.  Pressure-rowed
            # tables (GT/Z) stay at NNp: the small pressure solve remains
            # replicated.
            pad = max(1, int(self.config.shard_pad))
            self.s_pad = -(-self.nn // pad) * pad
            e = self.s_pad - self.nn
            if e:
                dd = self.d
                padn = lambda a: np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, e)])
                for k in ("bc_mask", "bc_vel"):
                    dd[k] = padn(dd[k])
                for k in ("md_inv", "md_orig_inv"):
                    dd[k] = np.pad(dd[k], (0, e), constant_values=1.0)
        self.dt = float(deck.dt)
        self._compiled = {}
        if cache_dir:
            sc.snapshot_store(
                cache_dir, cache_key, sc.solver_snapshot(self, self._SNAP_ATTRS)
            )
        # one host->device transfer at the end (setup + snapshot stay numpy)
        self.d = {k: jnp.asarray(v) for k, v in self.d.items()}

    def _try_structured(self, mesh, ops, Z, is_bc, bc_vel, md_inv, md_orig_inv):
        """Build the DIA operator set if the mesh is a box grid."""
        from cfd_with_cuda_tpu.fem.structured import (
            detect_promoted_box,
            dia_from_csr,
            shard_pad_size,
        )

        deck = self.deck
        dtype = self.config.jnp_dtype()
        box = detect_promoted_box(mesh.coords, self.nnp, mesh.ltog_node)
        if box is None:
            return
        fx, fy, fz = box.fine_dims
        cx, cy, cz = box.coarse_dims
        perm, perm_p, embed = box.perm, box.perm_p, box.embed
        S = box.size

        K_csr = ops.pattern_m.to_scipy(ops.K)
        k_dia = dia_from_csr(K_csr, perm, perm, box.fine_dims)
        z_dia = dia_from_csr(Z, perm_p, perm_p, box.coarse_dims)
        g_dias = [
            dia_from_csr(ops.G_csr(d), perm, embed, box.fine_dims)
            for d in range(3)
        ]
        gt_dias = [
            dia_from_csr(ops.G_csr(d).T.tocsr(), embed, perm, box.fine_dims)
            for d in range(3)
        ]
        if any(x is None for x in [k_dia, z_dia, *g_dias, *gt_dias]):
            return

        self.structured = True
        self.perm = perm
        self.perm_p = perm_p
        self.fine_dims = box.fine_dims
        self.coarse_dims = box.coarse_dims
        # element-level structure: strided-slice elemental gather/scatter
        # for convection (fem/structured.detect_promoted_box)
        self.elem_structured = box.elem_perm is not None
        elem_perm = box.elem_perm
        if self.elem_structured:
            self.elem_dims = box.elem_dims
            self.chan_order = box.chan_order           # channel -> local
            self.local_off = box.local_off
        # K: roll-based DIA (bandwidth-bound on the big fine grid);
        # Z/G/GT: window-patches form (latency-bound small/medium applies).
        self.k_offsets = k_dia.flat_offsets
        self.z_radius = z_dia.radius
        self.g_radius = max(g.radius for g in g_dias)
        self.gt_radius = max(g.radius for g in gt_dias)

        permute_vec = box.permute_vec        # node order -> grid order
        dev = lambda x: np.asarray(x, dtype=dtype)
        z_diag = box.permute_vec_p(np.asarray(Z.diagonal()))
        gDSv_t = np.transpose(self.tables.gDSv, (3, 2, 1, 0))
        gq_t = self.tables.gq_factor.T
        Sv_t = self.tables.Sv
        if self.elem_structured:
            # element tables to element-grid order + channel-ordered locals
            g2 = np.empty_like(gDSv_t)
            g2[..., elem_perm] = gDSv_t
            q2 = np.empty_like(gq_t)
            q2[..., elem_perm] = gq_t
            gDSv_t, gq_t = g2[:, self.chan_order], q2
            Sv_t = Sv_t[:, self.chan_order]
        # f64 (x64-emulated on TPU) must NOT use the fine-grid patch
        # extraction for G/G^T: conv_general_dilated_patches of the
        # (3, S) field with a 125-wide window materialises ~2.5 GB
        # buffers that the x64 pair-splitting triples — measured 22.05 GB
        # HBM (OOM) at NE27000.  Roll-form DIA applies stream only the
        # PRESENT diagonals with no patch tensor at all.
        self.f64_dia = bool(np.dtype(dtype) == np.float64)
        if self.f64_dia:
            gw = {
                f"G_dia{i}": dev(g_dias[i].vals) for i in range(3)
            } | {
                f"GT_dia{i}": dev(gt_dias[i].vals) for i in range(3)
            }
            self.g_dia_off = tuple(g.flat_offsets for g in g_dias)
            self.gt_dia_off = tuple(g.flat_offsets for g in gt_dias)
        else:
            gw = {
                "G_win": dev(np.stack(
                    [g.window_vals(self.g_radius, dtype) for g in g_dias]
                )),
                "GT_win": dev(np.stack(
                    [g.window_vals(self.gt_radius, dtype) for g in gt_dias]
                )),
            }
            self.g_dia_off = None
            self.gt_dia_off = None
        self.d = gw | {
            "ltog": np.asarray(perm[mesh.ltog_node].T, dtype=np.int32),
            "Sv": dev(Sv_t),
            "gDSv": dev(gDSv_t),
            "gq": dev(gq_t),
            "K_vals": dev(k_dia.vals),
            "Z_win": dev(z_dia.window_vals(dtype=dtype)),
            "Z_diag": dev(z_diag),
            "md_inv": dev(permute_vec(md_inv)),
            "md_orig_inv": dev(permute_vec(md_orig_inv)),
            "bc_mask": dev(permute_vec(np.where(is_bc, 0.0, 1.0))),
            "bc_vel": dev(np.stack([permute_vec(bc_vel[:, d]) for d in range(3)])),
        }
        # sharding pad: zero-pad every fine-grid axis to a multiple of
        # shard_pad (padding rows carry zero operator values, so results
        # are unchanged; see fem/structured.shard_pad_size)
        self.s_pad = shard_pad_size(S, self.config, self._pallas_layout)
        if self.s_pad > S:
            extra = self.s_pad - S
            for key in list(self.d):
                v = self.d[key]
                if v.ndim >= 1 and v.shape[-1] == S and key not in ("ltog",):
                    widths = [(0, 0)] * (v.ndim - 1) + [(0, extra)]
                    self.d[key] = np.pad(v, widths)
        # fused-CG weights pre-padded to the kernel's DMA-block layout:
        # built in-step they sit under two while_loop nests where XLA
        # re-materialises the ~16 MB pad every pressure solve (measured
        # ~9 ms/solve at NE27000 — 25x the rest of the step)
        if self._pallas_layout:
            from cfd_with_cuda_tpu.ops.pallas_cg import cg_weight_layout

            self.d["Z_win_cg"] = cg_weight_layout(
                self.d["Z_win"], (cx, cy, cz), z_dia.radius,
                sym=self.config.pressure_cg_sym,
            )
            # inverse Jacobi diagonal, pre-padded to the CG kernel's lane
            # width: computing 1/Z_diag (+ pad) per pressure solve sits
            # under two while_loop nests where XLA cannot hoist it
            nnp_pad = -(-self.nnp // 128) * 128
            zdinv = np.zeros(nnp_pad, dtype)
            zdinv[: self.nnp] = 1.0 / z_diag[: self.nnp]
            self.d["Z_dinv_cg"] = dev(zdinv)
            # compact G^T table: divergence rows exist only at embedded
            # coarse positions, so 7/8 of GT_win's streamed rows are
            # structural zeros — the compact form is 8x less HBM traffic
            # per div apply (ops/pallas_stencil.pallas_div_compact)
            from cfd_with_cuda_tpu.ops.pallas_stencil import compact_gt_window

            self.d["GT_cwin"] = dev(compact_gt_window(
                self.d["GT_win"], (fx, fy, fz), (cx, cy, cz)
            ))
        # channel-pair -> K DIA offset-index table: on a box grid, every
        # elemental entry (i, j) lands at the FIXED window offset
        # fo(j) - fo(i), so the fused path assembles A(un) into K's DIA
        # rows with 27 dilated-pad placements + static add chains — no
        # runtime scatter (jax segment_sum lowers to a 19.7M-element
        # device sort, measured 220 ms/step)
        if self.elem_structured:
            fo = [ox + fx * (oy + fy * oz) for (ox, oy, oz) in self.local_off]
            off_index = {o: idx for idx, o in enumerate(self.k_offsets)}
            nen = len(self.local_off)
            self.conv_oij = tuple(
                tuple(off_index[fo[j] - fo[i]] for j in range(nen))
                for i in range(nen)
            )
        else:
            self.conv_oij = None
        self.pin_grid = int(perm_p[self.pin]) if self.pin >= 0 else -1
        mon = find_monitor_node(
            deck.coords,
            deck.monitor_xyz if deck.monitor_xyz is not None else (0.5,) * 3,
        )
        self.monitor_node_deck = mon
        self.monitor_node = int(perm[mon])
        # pressure field lives on the COARSE grid in perm_p order — the
        # fine-grid id perm[mon] would index pn out of bounds (clamped by
        # XLA to the last entry: p_mon silently read the wrong node)
        self.monitor_node_p = int(perm_p[mon])

        # geometric-multigrid pressure preconditioner (the grid hierarchy
        # is free on the structured path; ops/multigrid.py) — the pinned Z
        # in grid order feeds the Galerkin ladder.  Skipped under "auto"
        # when the fused Pallas path is active: that path is Jacobi-only
        # and the hierarchy would be dead setup time + HBM (an explicit
        # "mg" disables the fused path, utils/config.py).
        if self.config.pressure_precond == "mg" or (
            self.config.pressure_precond == "auto" and not self._pallas_layout
        ):
            from cfd_with_cuda_tpu.ops.multigrid import attach_hierarchy

            inv_p = np.argsort(perm_p)          # flat grid id -> node id
            Zg = Z[inv_p][:, inv_p].tocsr()
            attach_hierarchy(self, Zg, box.coarse_dims, dtype)

        # ---- parity-split (class-major) field layout: the fused path's
        # remaining stride-2 ops (convection gather/scatter, coarse
        # embed/extract) become contiguous slices, and the G/K tables
        # compact to their structural-nonzero count (ops/parity_stencil).
        use_parity = (
            self._pallas_layout
            and self.elem_structured
            and int(self.config.spmd_devices or 0) < 1
            and self.config.structured_layout in ("auto", "parity")
        )
        if use_parity:
            from cfd_with_cuda_tpu.ops import parity_stencil as pstl

            self.layout = "parity"
            (pcx, pcy, pcz), sp_c = pstl.parity_dims((fx, fy, fz))
            assert (pcx, pcy, pcz) == (cx, cy, cz)
            self.sp_c = sp_c
            offs_k = pstl.decode_offsets(self.k_offsets, (fx, fy, fz))
            kc, self.k_pairs = pstl.build_parity_apply_tables(
                self.d["K_vals"], offs_k, (fx, fy, fz)
            )
            r = self.g_radius
            offs_g = tuple(
                (dx, dy, dz)
                for dz in range(-r, r + 1)
                for dy in range(-r, r + 1)
                for dx in range(-r, r + 1)
            )
            gc, self.g_pairs = pstl.build_parity_apply_tables(
                self.d["G_win"], offs_g, (fx, fy, fz)
            )
            # grad reads ONLY the coarse pressure (class 0): the step
            # passes it as a (1, 1, Sp) plane
            assert all(
                pp == 0 for cls in self.g_pairs for (_, pp, _) in cls
            )
            self.d["Kp"] = dev(kc)
            self.d["Gp"] = dev(gc)
            for key in ("md_inv", "md_orig_inv", "bc_mask"):
                self.d[key + "_p"] = pstl.parity_split_table(
                    self.d[key], (fx, fy, fz), sp_c
                )
            self.d["bc_vel_p"] = pstl.parity_split_table(
                self.d["bc_vel"], (fx, fy, fz), sp_c
            )
            # monitor node: fine flat id -> (class, coarse flat)
            mxyz = (
                self.monitor_node % fx,
                (self.monitor_node // fx) % fy,
                self.monitor_node // (fx * fy),
            )
            self.mon_cls = (
                (mxyz[2] & 1) * 2 + (mxyz[1] & 1)
            ) * 2 + (mxyz[0] & 1)
            self.mon_q = (
                (mxyz[2] >> 1) * cy + (mxyz[1] >> 1)
            ) * cx + (mxyz[0] >> 1)
            # all-Pallas convection: (K + A(un)) u is ONE parity_apply
            # with the per-step A planes streamed as the second weight
            # table (build_conv_plane_route / conv_planes_from_ae) —
            # zero XLA ops in the sub-iteration loop
            (self.conv_i_order, self.conv_groups,
             self.conv_pairs2) = pstl.build_conv_plane_route(
                self.local_off, (cx, cy, cz)
            )
            # element tables re-embedded on the coarse-flat axis: the
            # parity convection is matrix-free over FLAT minor-axis
            # shifts (parity_gather/scatter_elem_flat) — the 3-D box
            # slice/DUS forms relayout against the Pallas kernels'
            # flat outputs (measured: K apply 0.79 ms alone, 9.3 ms
            # next to the box-form convection)
            self.d["gDSv_p"] = pstl.embed_elem_table(
                self.d["gDSv"], self.elem_dims, (cx, cy, cz), sp_c
            )
            self.d["gq_p"] = pstl.embed_elem_table(
                self.d["gq"], self.elem_dims, (cx, cy, cz), sp_c
            )
            # the step never touches the interleaved big tables (nor the
            # interleaved mask/mass vectors it just split into *_p
            # copies, nor the element-axis tables the flat convection
            # just re-embedded): drop them from HBM + the snapshot
            # (~800 MB at NE27000)
            for key in ("K_vals", "G_win", "GT_win", "Z_win",
                        "md_inv", "md_orig_inv", "bc_mask", "bc_vel",
                        "gDSv", "gq"):
                self.d.pop(key, None)

    # ----------------------------------------------------------- initial state
    def initial_state(self) -> ExplicitState:
        """Zero field with BC velocities imposed (``applyBC_initial``)."""
        dtype = self.config.jnp_dtype()
        # copy=True: run() donates the state, so it must not alias bc_vel
        key = "bc_vel_p" if self.layout == "parity" else "bc_vel"
        un = jnp.array(self.d[key], dtype=dtype, copy=True)
        pn = jnp.zeros(self.nnp, dtype=dtype)
        return ExplicitState(
            un=un, pn=pn, unp1_prev=jnp.zeros_like(un),
            pdot=jnp.zeros_like(pn), pdot_nm1=jnp.zeros_like(pn),
        )

    def state_from_fields(self, u: np.ndarray, p: np.ndarray) -> ExplicitState:
        """u is accepted as (NN, 3) in deck node order; stored (3, NN)
        (grid order when the structured path is active)."""
        dtype = self.config.jnp_dtype()
        u = np.asarray(u).T.copy()
        p = np.asarray(p).copy()
        if self.structured:
            ug = np.zeros((3, self.s_pad), dtype=u.dtype)
            ug[:, self.perm] = u
            pg = np.empty_like(p)
            pg[self.perm_p] = p
            u, p = ug, pg
            if self.layout == "parity":
                from cfd_with_cuda_tpu.ops import parity_stencil as pstl

                u = pstl.parity_split_table(u, self.fine_dims, self.sp_c)
        elif self.s_pad > self.nn:       # ELL shard padding
            u = np.pad(u, ((0, 0), (0, self.s_pad - self.nn)))
        return ExplicitState(
            un=jnp.asarray(u, dtype=dtype),
            pn=jnp.asarray(p, dtype=dtype),
            unp1_prev=jnp.zeros(u.shape, dtype=dtype),
            pdot=jnp.zeros(p.shape, dtype=dtype),
            pdot_nm1=jnp.zeros(p.shape, dtype=dtype),
        )

    # ------------------------------------------------------------- one step
    def _time_step(self, params, state: ExplicitState) -> tuple[ExplicitState, StepStats]:
        d = params
        cfg = self.config
        deck = self.deck
        dt = self.dt
        nn = self.nn

        un, pn, unp1_prev0, pdot0, pdot_nm1 = state
        if cfg.pressure_warm_extrap and cfg.pressure_warm_start:
            # first-solve warm start carries the step-to-step trend;
            # sub-iteration warm starts (pdot_prev in the carry) are
            # within-step and stay plain
            pdot_init = pdot0 + (pdot0 - pdot_nm1)
        else:
            pdot_init = pdot0
        zeros_u = jnp.zeros_like(un)
        # profiling scaffolding: scripts/ablate_step.py sets _ablate to
        # compile step variants with components nulled out and recover
        # per-component cost by subtraction (direct op timing through the
        # axon tunnel is unreliable); never set in production
        abl = getattr(self, "_ablate", ())

        if self.structured:
            from cfd_with_cuda_tpu.ops.stencil import (
                dia_spmv,
                patches_div_apply,
                patches_grad_apply,
                patches_spmv,
            )

            from cfd_with_cuda_tpu.ops.stencil import convection_apply_stencil

            Sr = self.nn                     # real fine-grid size
            pad_u = lambda y: jnp.pad(y, ((0, 0), (0, self.s_pad - Sr)))

            k_mul = lambda u: dia_spmv(d["K_vals"], u, self.k_offsets)
            z_mul = lambda p: patches_spmv(
                d["Z_win"][:, :self.nnp], p, self.coarse_dims, self.z_radius
            )
            if getattr(self, "f64_dia", False):
                # f64: roll-form G/G^T (fine-grid patch extraction OOMs
                # under x64 emulation — see _try_structured)
                from cfd_with_cuda_tpu.ops.stencil import coarse_to_fine

                def grad(p):
                    pf = jnp.pad(
                        coarse_to_fine(p, self.coarse_dims, self.fine_dims),
                        (0, self.s_pad - Sr),
                    )
                    return jnp.stack([
                        dia_spmv(d[f"G_dia{i}"], pf, self.g_dia_off[i])
                        for i in range(3)
                    ])

                def div(u):
                    acc = sum(
                        dia_spmv(d[f"GT_dia{i}"], u[i], self.gt_dia_off[i])
                        for i in range(3)
                    )
                    from cfd_with_cuda_tpu.ops.stencil import fine_to_coarse

                    return fine_to_coarse(
                        acc[:Sr], self.coarse_dims, self.fine_dims
                    )
            else:
                grad = lambda p: pad_u(patches_grad_apply(
                    d["G_win"][..., :Sr], p, self.coarse_dims, self.fine_dims,
                    self.g_radius,
                ))
                div = lambda u: patches_div_apply(
                    d["GT_win"][..., :Sr], u[:, :Sr], self.coarse_dims,
                    self.fine_dims, self.gt_radius,
                )
            pin = self.pin_grid
        else:
            from cfd_with_cuda_tpu.ops.spmv import (
                elem_div_apply,
                elem_grad_apply,
                elem_matvec_apply,
            )

            pad_nn = lambda y: jnp.pad(y, ((0, 0), (0, self.s_pad - nn)))

            def k_mul(u):
                return pad_nn(
                    elem_matvec_apply(d["Ke"], u[:, :nn], d["ltog"], d["rev"])
                )

            if self.z_offs is not None:
                from cfd_with_cuda_tpu.ops.banded import banded_spmv_xla
                from cfd_with_cuda_tpu.ops.pallas_cg import fused_cg

                z_mul = lambda p: banded_spmv_xla(
                    d["Z_bwin"], self.z_offs, p
                )
            else:
                z_mul = lambda p: ell_spmv(d["Z_vals"], d["Z_cols"], p)
            grad = lambda p: pad_nn(
                elem_grad_apply(d["Ge"], p, d["ltog_p"], d["rev"])
            )
            div = lambda u: elem_div_apply(
                d["Ge"], u[:, :nn], d["ltog"], d["rev_p"]
            )
            pin = self.pin

        if self.use_mg:
            from cfd_with_cuda_tpu.ops.multigrid import make_vcycle

            precond = make_vcycle(d, self.mg_dims, self.mg_radii, self.mg_omegas)
        else:
            precond = lambda r: r / d["Z_diag"]

        from cfd_with_cuda_tpu.ops.krylov import KrylovResult

        if "kmul" in abl:
            k_mul = lambda u: u * 0.0
        if "grad" in abl:
            grad = lambda p: zeros_u
        if "div" in abl:
            div = lambda u: pn * 0.0

        # fused Pallas path (ops/pallas_cg.py + ops/pallas_stencil.py):
        # the ablation study shows the XLA CG body is ~98% of step time,
        # and a trace shows the XLA patch-extraction convolutions degrade
        # badly when co-resident with Pallas custom calls in the loop
        # body — so the fused path goes Pallas for EVERY windowed
        # operator (Z-CG, G, G^T, K, K+A) and assembles the convection
        # operator A(un) into K's DIA slots once per time step.
        parity = self.structured and self.layout == "parity"
        use_fused = self.structured and (
            parity or cfg.fused_pressure_eligible()
        )
        fused_conv = use_fused and self.elem_structured and "conv" not in abl
        if parity:
            # class-major layout (ops/parity_stencil): fields are
            # (3, 8, Sp); grad reads the coarse pressure directly (it IS
            # class 0), div emits the coarse grid directly, and the K/G
            # tables are compacted to their structural nonzeros
            from cfd_with_cuda_tpu.ops import parity_stencil as pstl
            from cfd_with_cuda_tpu.ops.pallas_cg import fused_cg

            sp_c = self.sp_c
            Sr3 = self.nn                   # unused; kept for symmetry
            if "kmul" not in abl:
                k_mul = lambda u: pstl.parity_apply(
                    d["Kp"], u, pairs=self.k_pairs, co=3
                )
            if "grad" not in abl:
                def grad(p):
                    xp = jnp.pad(p, (0, sp_c - p.shape[0]))[None, None]
                    return pstl.parity_apply(
                        d["Gp"], xp, pairs=self.g_pairs, co=3
                    )
            if "div" not in abl:
                div = lambda u: pstl.parity_div_apply(
                    d["GT_cwin"], u, self.coarse_dims
                )[: self.nnp]
        elif use_fused:
            from cfd_with_cuda_tpu.ops.pallas_cg import fused_cg
            from cfd_with_cuda_tpu.ops.pallas_stencil import (
                pallas_div_window,
                pallas_grad_window,
                pallas_window_spmv,
            )
            from cfd_with_cuda_tpu.ops.stencil import (
                coarse_to_fine,
                fine_to_coarse,
                gather_elem_stencil,
            )

            Sr3 = self.nn
            sp = self.s_pad
            spmd_mesh = self.spmd_mesh
            if spmd_mesh is not None:
                # multi-chip: big velocity-grid applies shard with flat
                # halo ppermutes; div all-gathers for the replicated
                # coarse-grid pressure solve (parallel/sharded_stencil)
                from cfd_with_cuda_tpu.ops.pallas_stencil import window_offsets
                from cfd_with_cuda_tpu.parallel.sharded_stencil import (
                    sharded_div_window,
                    sharded_grad_window,
                    sharded_window_spmv,
                )

                g_offs = window_offsets(self.fine_dims, self.g_radius)
                gt_offs = window_offsets(self.fine_dims, self.gt_radius)
                if "kmul" not in abl:
                    k_mul = lambda u: sharded_window_spmv(
                        d["K_vals"], u, self.fine_dims,
                        offsets=self.k_offsets, mesh=spmd_mesh,
                    )
                if "grad" not in abl:
                    def grad(p):
                        pf = coarse_to_fine(p, self.coarse_dims, self.fine_dims)
                        return sharded_grad_window(
                            d["G_win"], jnp.pad(pf, (0, sp - Sr3)),
                            self.fine_dims, offsets=g_offs, mesh=spmd_mesh,
                        )
                if "div" not in abl:
                    div = lambda u: fine_to_coarse(
                        sharded_div_window(
                            d["GT_win"], u, self.fine_dims,
                            offsets=gt_offs, mesh=spmd_mesh,
                        )[:Sr3],
                        self.coarse_dims, self.fine_dims,
                    )
            else:
                if "kmul" not in abl:
                    k_mul = lambda u: pallas_window_spmv(
                        d["K_vals"], u, self.fine_dims,
                        offsets=self.k_offsets, trim=False,
                    )
                if "grad" not in abl:
                    def grad(p):
                        pf = coarse_to_fine(p, self.coarse_dims, self.fine_dims)
                        return pallas_grad_window(
                            d["G_win"], jnp.pad(pf, (0, sp - Sr3)),
                            self.fine_dims, self.g_radius, trim=False,
                        )
                if "div" not in abl:
                    if "GT_cwin" in d:
                        from cfd_with_cuda_tpu.ops.pallas_stencil import (
                            pallas_div_compact,
                        )

                        div = lambda u: pallas_div_compact(
                            d["GT_cwin"], u, self.fine_dims, self.coarse_dims,
                        )[: self.nnp]
                    else:
                        div = lambda u: fine_to_coarse(
                            pallas_div_window(
                                d["GT_win"], u, self.fine_dims, self.gt_radius,
                            ),
                            self.coarse_dims, self.fine_dims,
                        )
        if fused_conv:
            # elemental convection matrices A_e(un) ONCE per step (un is
            # fixed across sub-iterations, ref calculateMatrixA uses Un
            # :3520-3685)
            if parity:
                # FLAT elemental ops: the element axis is embedded in
                # the coarse grid, gather/scatter are minor-axis shifts
                # (the 3-D box forms relayout against the Pallas
                # kernels — measured 9.3 ms vs 0.79 ms for K alone);
                # conv_mode is ignored here — the assembled route's
                # windowed scatter-add measured 321 ms/step on TPU
                gather = lambda u: pstl.parity_gather_elem_flat(
                    u, self.coarse_dims
                )
                gtab, qtab = d["gDSv_p"], d["gq_p"]
            else:
                gather = lambda u: gather_elem_stencil(
                    u[:, :Sr3], self.elem_dims, self.fine_dims
                )
                gtab, qtab = d["gDSv"], d["gq"]
            u0_e = gather(un)
            u0_gq = jnp.einsum("ki,die->dke", d["Sv"], u0_e)
            udotg = jnp.einsum("dke,djke->jke", u0_gq, gtab)
            if cfg.conv_stab:
                # Temam (div u0) Sv_i Sv_j stabilization (conv_stab;
                # the ref's implicit kernel carries this term with
                # coefficient 0.0, guermondQuartapelle.cpp:3864-3865)
                div0 = jnp.einsum("djke,dje->ke", gtab, u0_e)
                udotg = udotg + (
                    cfg.conv_stab * div0[None] * d["Sv"].T[:, :, None]
                )
            # planes-route scale guard: at 51^3 coarse (ne125 row,
            # round-5 BENCH_MATRIX) the streamed two-table kernel
            # crashes the remote compile helper; the flat matrix-free
            # route covers those sizes.  A/B at 45^3 (ne85): planes
            # 509.5 vs flat 526.8 ms/step — planes stay the better
            # route up to the guard.  conv_mode="planes" forces the
            # route regardless (for re-probing on newer runtimes).
            planes_fits = self.sp_c is None or self.sp_c <= 100_000
            conv_planes = parity and (
                cfg.conv_mode == "planes"
                or (cfg.conv_mode != "matrix-free" and planes_fits)
            )
            sv_i = d["Sv"]
            if conv_planes:
                # planes mode wants ae's i axis grouped by element-
                # corner offset (conv_planes_from_ae's 8-shift build)
                sv_i = d["Sv"][:, np.asarray(self.conv_i_order)]
            ae = jnp.einsum("ki,ke,jke->ije", sv_i, qtab, udotg)
            if conv_planes:
                # all-Pallas momentum: A(un)'s 729 weight planes stream
                # through the K kernel as a second table — the sub-
                # iteration loop has NO XLA convection ops next to the
                # fused CG (measured: that co-residency cost ~8 ms/step)
                conv_wc = pstl.conv_planes_from_ae(
                    ae, groups=self.conv_groups
                )
                ka_mul = lambda u: pstl.parity_apply(
                    d["Kp"], u, pairs=self.k_pairs, co=3,
                    wc2=conv_wc, pairs2=self.conv_pairs2, blk=512,
                )
            elif parity:
                def conv_apply(u_star):
                    r1e = jnp.einsum("ije,dje->die", ae, gather(u_star))
                    return pstl.parity_scatter_elem_flat(
                        r1e, self.coarse_dims
                    )

                ka_mul = lambda u: k_mul(u) + conv_apply(u)
            elif cfg.conv_mode == "assemble":
                # scatter A_e into K's DIA rows -> (K+A) is ONE Pallas
                # stencil apply per sub-iteration
                from cfd_with_cuda_tpu.ops.stencil import assemble_window_values

                conv_vals = assemble_window_values(
                    ae, self.local_off, self.conv_oij, len(self.k_offsets),
                    self.elem_dims, self.fine_dims, sp,
                )
                ka_vals = d["K_vals"] + conv_vals
                if self.spmd_mesh is not None:
                    from cfd_with_cuda_tpu.parallel.sharded_stencil import (
                        sharded_window_spmv as _sspmv,
                    )

                    ka_mul = lambda u: _sspmv(
                        ka_vals, u, self.fine_dims,
                        offsets=self.k_offsets, mesh=self.spmd_mesh,
                    )
                else:
                    ka_mul = lambda u: pallas_window_spmv(
                        ka_vals, u, self.fine_dims,
                        offsets=self.k_offsets, trim=False,
                    )
            else:
                # matrix-free: per sub-iteration gather -> batched
                # per-element matvec -> dilated-pad scatter (cheaper per
                # step at the usual 2-3 sub-iterations)
                from cfd_with_cuda_tpu.ops.stencil import scatter_elem_stencil

                def conv_apply(u_star):
                    up_e = gather_elem_stencil(
                        u_star[:, :Sr3], self.elem_dims, self.fine_dims
                    )
                    r1e = jnp.einsum("ije,dje->die", ae, up_e)
                    out = scatter_elem_stencil(
                        r1e, self.local_off, self.elem_dims, self.fine_dims
                    )
                    return jnp.pad(out, ((0, 0), (0, sp - Sr3)))

                ka_mul = lambda u: k_mul(u) + conv_apply(u)
        elif not self.structured and not abl:
            # unstructured fusion: Ae(un) built elementally once per
            # step, then (K + A(un)) u* is ONE elemental gather ->
            # matvec -> scatter per sub-iteration (ops.spmv docstring:
            # the assembled ELL route's gathers were the round-3
            # "TPU worker crashed" bench failures)
            from cfd_with_cuda_tpu.ops.spmv import convection_elemental

            ae = convection_elemental(
                un[:, :nn], d["ltog"], d["Sv"], d["gDSv"], d["gq"],
                stab_coef=cfg.conv_stab,
            )
            ka = d["Ke"] + ae
            ka_mul = lambda u: pad_nn(
                elem_matvec_apply(ka, u[:, :nn], d["ltog"], d["rev"])
            )
            fused_conv = True

        # banded unstructured meshes run the SAME fused CG kernel with
        # their explicit offset set (ops/banded.py); spmd runs keep the
        # XLA banded apply (rolls compose with GSPMD; a pallas_call
        # cannot sit under it directly)
        banded_fused = (
            not use_fused
            and getattr(self, "z_offs", None) is not None
            and "Z_bwin_cg" in d
            and self.spmd_mesh is None
        )

        def pressure_solve(r2, x0=None):
            if "cg" in abl:
                return KrylovResult(precond(r2), jnp.asarray(0), jnp.asarray(0.0))
            if use_fused or banded_fused:
                if banded_fused:
                    win_cg = d["Z_bwin_cg"]
                    cg_dims, cg_radius = (self.nnp, 1, 1), None
                    cg_offs = self.z_offs
                else:
                    win_cg = d["Z_win_cg"] if "Z_win_cg" in d else d["Z_win"][:, :self.nnp]
                    cg_dims, cg_radius = self.coarse_dims, self.z_radius
                    cg_offs = None
                dinv = d["Z_dinv_cg"] if "Z_dinv_cg" in d else 1.0 / d["Z_diag"]
                warm = x0 if cfg.pressure_warm_start else None

                def solve(win_, r2_, dinv_, *x0_):
                    return fused_cg(
                        win_, r2_, dinv_,
                        dims=cg_dims, radius=cg_radius, offs=cg_offs,
                        tol=cfg.pressure_cg_tol,
                        maxiter=cfg.pressure_cg_maxiter,
                        x0=x0_[0] if x0_ else None,
                        unroll=max(1, int(cfg.pressure_cg_unroll)),
                        fuse_loop=cfg.pressure_cg_fuse_loop,
                        sym=cfg.pressure_cg_sym and "Z_win_cg" in d,
                        _skip_loop="cgnoloop" in abl,
                        # MIXED policy: double-single in-kernel dots
                        # stand in for the XLA path's f64 reductions
                        dot_mode=(
                            "compensated"
                            if cfg.krylov_dot_dtype() is not None
                            else "plain"
                        ),
                    )

                if self.spmd_mesh is not None:
                    # the coarse-grid CG runs REPLICATED per device: at
                    # ~0.1 MB per vector, redundant compute beats two
                    # latency-bound psums per iteration (see
                    # parallel/sharded_stencil.py module docstring); a
                    # pallas_call also cannot sit under GSPMD directly
                    from cfd_with_cuda_tpu.parallel.sharded_stencil import shard_map  # version-compat shim
                    from jax.sharding import PartitionSpec as P

                    args = (win_cg, r2, dinv) + (
                        (warm,) if warm is not None else ()
                    )
                    return shard_map(
                        solve, mesh=self.spmd_mesh,
                        in_specs=tuple(P() for _ in args),
                        out_specs=P(),
                        check_vma=False,
                    )(*args)
                return solve(win_cg, r2, dinv, *(
                    (warm,) if warm is not None else ()
                ))
            return cg(
                z_mul, r2,
                x0 if cfg.pressure_warm_start else None,
                tol=cfg.pressure_cg_tol, maxiter=cfg.pressure_cg_maxiter,
                precond=precond, dot_dtype=cfg.krylov_dot_dtype(),
            )

        if parity:
            mask = d["bc_mask_p"][None]
            md_inv_b = d["md_inv_p"][None]
            md_orig_inv_b = d["md_orig_inv_p"][None]
        else:
            mask = d["bc_mask"][None, :]
            md_inv_b = d["md_inv"][None, :]
            md_orig_inv_b = d["md_orig_inv"][None, :]

        # G pn is loop-invariant across the sub-iterations (pn is fixed
        # for the whole time step) — hoist it: XLA does not move a
        # Pallas custom call out of the while body, so computing it
        # in-loop re-streams the G table every sub-iteration (340 MB
        # interleaved / 46 MB parity-compacted per apply)
        g_pn = grad(pn)

        def iteration(carry):
            (it, _conv, unp_half_prev, unp1_prev, pnp1_prev,
             k_acc_prev, _unp1, _pnp1, _cgit, pdot_prev) = carry

            # ---- step1: R1 = -K u* - A(un) u* - G pn  (ref :3712-3783)
            if fused_conv:
                r1 = -ka_mul(unp_half_prev)       # (K + A(un)) u* fused
            else:
                r1 = -k_mul(unp_half_prev)
            if "conv" in abl or fused_conv:
                pass
            elif self.structured and self.elem_structured:
                Sr2 = self.nn
                conv = convection_apply_stencil(
                    un[:, :Sr2], unp_half_prev[:, :Sr2], d["Sv"], d["gDSv"],
                    d["gq"], self.local_off, self.elem_dims, self.fine_dims,
                    stab_coef=cfg.conv_stab,
                )
                r1 -= jnp.pad(conv, ((0, 0), (0, self.s_pad - Sr2)))
            else:
                conv = convection_apply(
                    un, unp_half_prev, d["ltog"], d["Sv"], d["gDSv"], d["gq"],
                    nn, stab_coef=cfg.conv_stab,
                )
                r1 -= jnp.pad(conv, ((0, 0), (0, self.s_pad - nn)))
            r1 -= g_pn
            r1 = r1 * mask
            unp_half = un + dt * r1 * md_inv_b

            # ---- step2: R2 = G^T (u*/dt^2 - MdOrigInv K acc_prev)  (:3813-3868)
            dummy = unp_half / (dt * dt) - md_orig_inv_b * k_acc_prev
            r2 = div(dummy)
            if pin >= 0:
                r2 = r2.at[pin].set(0.0)
            sol = pressure_solve(r2, pdot_prev)
            pdot = sol.x
            pnp1 = pn + dt * pdot

            # ---- step3: R3 = -dt (G pdot + K acc_prev)  (:3917-3967)
            r3 = -dt * (grad(pdot) + k_acc_prev)
            r3 = r3 * mask
            acc = r3 * md_inv_b
            unp1 = unp_half + dt * acc

            # ---- convergence (ref :2936-2961)
            norm1 = jnp.linalg.norm(unp1 - unp1_prev) / jnp.linalg.norm(unp1)
            norm2 = jnp.linalg.norm(pnp1 - pnp1_prev) / jnp.linalg.norm(pnp1)
            conv = (norm1 < deck.tolerance) & (norm2 < deck.tolerance)

            # ---- next-iteration rotation + K*acc (skipped on break, :2963-3025)
            keep = lambda new, old: jnp.where(conv, old, new)
            # K*acc feeds ONLY the next sub-iteration: on the exiting
            # trip (converged, or the max_iter-th) the apply is dead —
            # branch around the 63-113 MB K stream instead of computing
            # it and selecting it away (ablation mode keeps the fixed
            # op count its timing-by-subtraction needs)
            done = conv | (it >= deck.max_iter)
            if abl:
                k_acc = keep(k_mul(acc), k_acc_prev)
            else:
                k_acc = lax.cond(
                    done, lambda a: k_acc_prev, lambda a: k_mul(a), acc
                )
            return (
                it + 1,
                conv,
                keep(unp_half, unp_half_prev),
                keep(unp1, unp1_prev),
                keep(pnp1, pnp1_prev),
                k_acc,
                unp1,
                pnp1,
                sol.iters,
                pdot,
            )

        def cond(carry):
            it, conv = carry[0], carry[1]
            if abl:
                # ablation timing: always run the full sub-iteration count
                # (nulled components would otherwise fake convergence)
                return it <= deck.max_iter
            return (it <= deck.max_iter) & (~conv)

        init = (
            jnp.asarray(1), jnp.asarray(False),
            un, unp1_prev0, pn, zeros_u,
            un, pn, jnp.asarray(0), pdot_init,
        )
        out = lax.while_loop(cond, iteration, init)
        (it, _conv, _uhp, unp1_prev, _pprev, _kacc, unp1, pnp1, cgit,
         pdot_out) = out

        max_acc = jnp.max(jnp.abs(unp1 - un)) / dt
        if parity:
            probe = lambda a, c_: a[c_, self.mon_cls, self.mon_q]
        else:
            probe = lambda a, c_: a[c_, self.monitor_node]
        stats = StepStats(
            u_mon=probe(unp1, 0), v_mon=probe(unp1, 1), w_mon=probe(unp1, 2),
            p_mon=pnp1[self.monitor_node_p], max_acc=max_acc, iters=it - 1,
            cg_iters=cgit, mom_iters=jnp.asarray(0),
        )
        new_state = ExplicitState(
            un=unp1, pn=pnp1, unp1_prev=unp1_prev, pdot=pdot_out,
            pdot_nm1=pdot0,
        )
        return new_state, stats

    def _monitor_only(self, state: ExplicitState) -> StepStats:
        if self.layout == "parity":
            probe = lambda c_: state.un[c_, self.mon_cls, self.mon_q]
        else:
            probe = lambda c_: state.un[c_, self.monitor_node]
        zero = jnp.zeros((), self.config.jnp_dtype())
        return StepStats(
            probe(0), probe(1), probe(2),
            state.pn[self.monitor_node_p], zero, jnp.asarray(0),
            jnp.asarray(0), jnp.asarray(0),
        )

    # ------------------------------------------------------------------- io
    def fields(self, state: ExplicitState) -> tuple[np.ndarray, np.ndarray]:
        """(u (NN,3), p (NNp,)) as numpy (host convention, deck node order)."""
        if self.layout == "parity":
            from cfd_with_cuda_tpu.ops import parity_stencil as pstl

            u = np.asarray(pstl.parity_merge(state.un, self.fine_dims))
        else:
            u = np.asarray(state.un)[:, : self.nn]
        pfield = np.asarray(state.pn)
        if self.structured:
            u = u[:, self.perm]
            pfield = pfield[self.perm_p]
        return u.T, pfield

    def write_tecplot(self, state: ExplicitState, path) -> None:
        """FEBRICK `.dat` dump (ref ``createTecplot`` :4249-4482)."""
        from cfd_with_cuda_tpu.io.tecplot import write_tecplot

        u, p = self.fields(state)
        write_tecplot(
            path, self.deck.title, self.mesh.coords, self.mesh.ltog_node, u, p
        )

    def state_from_restart(self, path) -> ExplicitState:
        """Initial condition from a prior `.dat` (ref ``readRestartFile``)."""
        from cfd_with_cuda_tpu.io.tecplot import read_restart

        u, p = read_restart(path, self.nn, self.nnp)
        return self.state_from_fields(u, p)
