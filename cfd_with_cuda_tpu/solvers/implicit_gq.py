"""Implicit fractional-step solver (Guermond-Quartapelle incremental
pressure-correction).

TPU-native rebuild of ``fractionalStep/implicit/Cpp/guermondQuartapelle.cpp``:
one pass per time step (no inner iterations, ``timeLoop`` :3308-3416),

* step1 (:3906-4083): momentum LHS  A = M/dt + K + A(u^k)  re-assembled on
  device every step; RHS = (M/dt) u^k - G (2 p^k - p^{k-1}); Dirichlet
  rows zeroed with unit diagonal (:4622-4632) and RHS set to the BC value
  (:4634-4642); solved by Jacobi-BiCGStab.  The reference solves the three
  directions sequentially (:3972-4033) — here they ride as one batched
  (NN, 3) solve sharing iterations, since the LHS is identical.
* step2 (:4090-4176): R2 = -(1/dt) G^T u; CG on the *directly assembled*
  Z = -int grad Sp . grad Sp (:3579-3670) with the LARGE pressure pin;
  p^{k+1} = p^k + Pdiff.

Deliberate divergence: the reference's steady check at :3347-3353 assigns
``maxAcc`` *signed* (a bug — its own explicit solver takes |.| at
``blascoCodinaHuerta.cpp:3049-3061``), which can spuriously stop the run;
this rebuild uses the correct |.| semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from cfd_with_cuda_tpu.fem.assembly import assemble_operators
from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.fem.sparse import ell_from_csr
from cfd_with_cuda_tpu.io.deck import Deck
from cfd_with_cuda_tpu.mesh.topology import (
    face_bc_to_node_bc,
    find_monitor_node,
    promote_hex_mesh,
)
from cfd_with_cuda_tpu.ops.gradient import div_apply, grad_apply
from cfd_with_cuda_tpu.ops.krylov import cg, solver_by_name
from cfd_with_cuda_tpu.ops.spmv import convection_assemble_csr, ell_spmv
from cfd_with_cuda_tpu.solvers.base import ChunkedTimeLoop, StepStats
from cfd_with_cuda_tpu.utils.config import SolverConfig

__all__ = ["ImplicitState", "ImplicitGQSolver"]


class ImplicitState(NamedTuple):
    uk: jax.Array            # (3, NN)  u^k (lane-major layout)
    pk: jax.Array            # (NNp,)   p^k
    pk_prev: jax.Array       # (NNp,)   p^{k-1}


@dataclass
class ImplicitGQSolver(ChunkedTimeLoop):
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
        "local_off", "a_offsets", "a_zero_off", "z_radius", "g_radius",
        "gt_radius", "conv_oij", "_ell_shape", "_nnz",
        "f64_dia", "g_dia_off", "gt_dia_off",
        "s_pad", "pin_grid", "monitor_node", "monitor_node_p", "use_mg",
        "mg_dims", "mg_radii", "mg_omegas", "_pallas_layout", "ppe_project",
        "layout", "sp_c", "a_pairs", "m_pairs", "g_pairs",
        "diag_planes", "mon_cls", "mon_q", "conv_i_order", "conv_groups",
    )

    def _setup(self) -> None:
        deck = self.deck
        cfg = self.config
        dtype = cfg.jnp_dtype()

        from cfd_with_cuda_tpu.utils import setup_cache as sc

        # the fused Pallas path wants device arrays pre-padded to the
        # kernel block multiple (backend-dependent -> in the fingerprint)
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
                self._momentum_solver = solver_by_name(cfg.momentum_solver)
                self.setup_cache_hit = True
                return
        self.setup_cache_hit = False

        # parity-split layout attrs (filled by _try_structured when active)
        self.layout = "interleaved"
        self.sp_c = None
        self.a_pairs = None
        self.m_pairs = None
        self.g_pairs = None
        self.conv_i_order = None
        self.conv_groups = None
        self.diag_planes = None
        self.mon_cls = None
        self.mon_q = None

        mesh = promote_hex_mesh(deck.conn, deck.coords)
        self.mesh = mesh
        self.nn, self.nnp = mesh.nn, deck.nnp
        tab = build_element_tables(
            mesh.coords, mesh.ltog_node, etype=deck.etype,
            nenv=deck.nenv, nenp=deck.nenp, ngp=deck.ngp,
        )
        self.tables = tab

        # M/dt + K + direct-assembly Z (step0, guermondQuartapelle.cpp:3425-3572)
        ops = assemble_operators(
            tab, mesh.ltog_node, mesh.nn, self.nnp,
            viscosity=deck.viscosity, density=deck.density,
            z_mode="direct", mass_scale=1.0 / deck.dt, keep_consistent_mass=True,
        )
        self.ops = ops

        bc_of_node = face_bc_to_node_bc(
            mesh.ltog_node, deck.bc_vel_faces, mesh.nn,
            quadratic=deck.nenv != deck.nenp,
        )
        is_bc = bc_of_node >= 0
        bc_vel = np.zeros((mesh.nn, 3))
        bc_vel[is_bc] = deck.bc_str[bc_of_node[is_bc]]
        from cfd_with_cuda_tpu.mesh.profiles import apply_inlet_profile

        apply_inlet_profile(deck, mesh.coords, bc_of_node, bc_vel)

        Z = ops.Z.tocsr().copy()
        pin = deck.zero_pressure_node
        self.pin = pin
        if pin >= 0:
            Z[pin, pin] = Z[pin, pin] * cfg.pressure_pin_large

        # Outflow faces -> homogeneous Dirichlet on the pressure INCREMENT
        # at outflow pressure nodes (symmetric row/col elimination keeping
        # the original diagonal).  The direct-assembly Z is the all-Neumann
        # Laplacian: consistent only when the RHS sums to zero, i.e. when
        # the flux across the whole boundary balances — always true for
        # enclosed flows, violated during open-boundary transients, where
        # the pinned-but-inconsistent solve injects a huge spurious global
        # pressure mode and the 2p^k - p^{k-1} extrapolation amplifies it
        # into blow-up (observed on channel decks).  The reference parses
        # its outflow faces and never consumes them (it only ever ran the
        # implicit solver on enclosed cavities); open-boundary support is a
        # capability extension using the standard pressure-correction
        # outflow treatment.  The explicit solver needs none of this: its
        # Z = G^T Md^-1 G keeps boundary-row contributions, so constants
        # are not in its null space.
        p_mask = np.ones(self.nnp)
        if deck.bc_out_faces is not None and len(deck.bc_out_faces):
            ob = face_bc_to_node_bc(
                mesh.ltog_node, deck.bc_out_faces, mesh.nn, quadratic=False
            )
            out_p = np.flatnonzero(ob[: self.nnp] >= 0)
            if out_p.size:
                import scipy.sparse as sps

                p_mask[out_p] = 0.0
                d0 = Z.diagonal()
                Dm = sps.diags(p_mask)
                Z = (Dm @ Z @ Dm
                     + sps.diags(np.where(p_mask == 0.0, d0, 0.0))).tocsr()
                Z.sort_indices()

        # All-Neumann pressure problems with flow THROUGH the boundary
        # (e.g. the Kovasznay MMS deck: every face Dirichlet with nonzero
        # normal velocity): each step's PPE RHS carries a small
        # inconsistent component along the constant null vector (discrete
        # boundary-flux defect of the solved field), and CG must push it
        # through the pinned near-null eigenvalue — it stalls at maxiter
        # and the 2p^k - p^{k-1} extrapolation amplifies the junk into
        # blow-up (the scipy-LU oracle instead shows a harmless linear
        # |p| drift, velocities clean).  Gate: geometric thru-flow
        # detection — any velocity-BC face whose mean BC velocity has a
        # normal component.  Enclosed tangential-flow decks (cavity: lid
        # moves along its own plane) measure exactly zero and keep the
        # reference-exact behaviour; when detected, the RHS is
        # mean-projected every solve.
        self.ppe_project = False
        if (
            p_mask.min() == 1.0           # no outflow Dirichlet rows
            and deck.bc_vel_faces is not None
            and len(deck.bc_vel_faces)
        ):
            from cfd_with_cuda_tpu.fem.shape import (
                HEX_FACE_ALL_NODES,
                HEX_FACE_CORNERS,
            )

            fc = np.asarray(deck.bc_vel_faces, np.int64)
            corners = deck.conn[
                fc[:, 0][:, None], HEX_FACE_CORNERS[fc[:, 1]]
            ]
            c = mesh.coords[corners]                     # (nf, 4, 3)
            nrm = np.cross(c[:, 1] - c[:, 0], c[:, 2] - c[:, 0])
            nn_ = np.linalg.norm(nrm, axis=1, keepdims=True)
            nrm = nrm / np.maximum(nn_, 1e-300)
            # probe the MID-FACE node (HEX_FACE_ALL_NODES[:, 8]): it
            # belongs to exactly one boundary face, so the sequential
            # corner-node BC overwrite (lid value leaking onto side-wall
            # faces at shared edges) cannot fake a normal component
            mid = mesh.ltog_node[fc[:, 0], HEX_FACE_ALL_NODES[fc[:, 1], 8]]
            thru = float(np.abs((bc_vel[mid] * nrm).sum(axis=1)).max())
            umax = float(np.abs(bc_vel).max()) or 1.0
            self.ppe_project = thru > 1e-9 * umax

        pat = ops.pattern_m
        mk_vals = ops.M + ops.K          # M/dt + K CSR values (:3921-3923)

        # Dirichlet row-zeroing masks on the CSR value array (:4622-4632):
        # entries in BC rows -> 0, then +1 on their diagonal slots.
        nnz = pat.nnz
        row_ids = np.repeat(np.arange(mesh.nn), np.diff(pat.indptr))
        row_mask = np.where(is_bc[row_ids], 0.0, 1.0)
        diag_all_slots = np.flatnonzero(row_ids == pat.indices)
        assert diag_all_slots.size == mesh.nn
        diag_add = np.zeros(nnz)
        diag_add[diag_all_slots[is_bc]] = 1.0

        # ---- structured fast path (see explicit_bch._try_structured) ----
        self.structured = False
        self.elem_structured = False
        self.use_mg = False
        if cfg.structured in ("auto", "force"):
            self._try_structured(mesh, ops, Z, is_bc, bc_vel, mk_vals, pat,
                                 p_mask)
            if cfg.structured == "force" and not self.structured:
                raise ValueError("structured mode forced but mesh is not a box grid")
        if cfg.pressure_precond == "mg" and not self.use_mg:
            raise ValueError(
                "pressure_precond='mg' needs the structured fast path "
                "(geometric hierarchy); this mesh fell back to ELL"
            )
        if cfg.structured_layout == "parity" and self.layout != "parity":
            raise ValueError(
                "structured_layout='parity' needs the fused Pallas path "
                "(single chip, f32/pallas backend) on an element-"
                "structured box grid"
            )
        if self.structured:
            self.dt = float(deck.dt)
            self._momentum_solver = solver_by_name(cfg.momentum_solver)
            if cache_dir:
                sc.snapshot_store(
                    cache_dir, cache_key,
                    sc.solver_snapshot(self, self._SNAP_ATTRS),
                )
            self.d = {k: jnp.asarray(v) for k, v in self.d.items()}
            return

        mk_ell = ell_from_csr(pat, values=mk_vals)
        m_ell = ell_from_csr(pat, values=ops.M)
        g_ells = [ell_from_csr(ops.pattern_g, values=ops.G[d]) for d in range(3)]
        gt_csrs = [ops.G_csr(d).T.tocsr() for d in range(3)]
        for m in gt_csrs:
            m.sort_indices()
        gt_ells = [
            ell_from_csr(
                m.indptr.astype(np.int64), m.indices.astype(np.int64),
                m.data, n_cols=mesh.nn,
            )
            for m in gt_csrs
        ]
        z_ell = ell_from_csr(
            Z.indptr.astype(np.int64), Z.indices.astype(np.int64),
            Z.data, n_cols=self.nnp,
        )

        dev = lambda x: np.asarray(x, dtype=dtype)
        self.d = {
            "ltog": np.asarray(mesh.ltog_node.T, dtype=np.int32),
            "Sv": dev(tab.Sv),
            "gDSv": dev(np.transpose(tab.gDSv, (3, 2, 1, 0))),
            "gq": dev(tab.gq_factor.T),
            "scatter_m": np.asarray(np.transpose(pat.scatter, (1, 2, 0)), dtype=np.int32),
            "mk_vals_csr": dev(mk_vals),
            "m_vals": dev(m_ell.vals),
            "row_mask": dev(row_mask),
            "diag_add": dev(diag_add),
            "csr_to_ell": np.asarray(mk_ell.csr_to_ell),
            "A_cols": np.asarray(mk_ell.cols),
            "G_vals": dev(np.stack([g.vals for g in g_ells])),
            "G_cols": np.asarray(g_ells[0].cols),
            "GT_vals": dev(np.stack([g.vals for g in gt_ells])),
            "GT_cols": np.asarray(gt_ells[0].cols),
            "Z_vals": dev(z_ell.vals),
            "Z_cols": np.asarray(z_ell.cols),
            "Z_diag": dev(Z.diagonal()),
            "p_mask": dev(p_mask),
            "bc_mask": dev(np.where(is_bc, 0.0, 1.0)),
            "bc_vel": dev(bc_vel.T),
            "diag_slots": np.asarray(diag_all_slots),
        }
        # ELL shard padding (see explicit_bch): pad the velocity-node
        # axis to a shard_pad multiple so SPMD runs can 1-D-shard fields
        # and node-rowed ELL operators.  Padded rows: zero vals / col 0 /
        # bc_mask 0; the per-step assembled a_ell is padded in-graph.
        pad = max(1, int(cfg.shard_pad))
        self.s_pad = -(-mesh.nn // pad) * pad
        e = self.s_pad - mesh.nn
        if e:
            padn = lambda a: np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, e)])
            for k in ("m_vals", "A_cols", "G_vals", "G_cols",
                      "bc_mask", "bc_vel"):
                self.d[k] = padn(self.d[k])
        self._ell_shape = mk_ell.vals.shape
        self._nnz = nnz
        self.monitor_node = find_monitor_node(
            deck.coords, deck.monitor_xyz if deck.monitor_xyz is not None else (0.5,) * 3
        )
        # pressure monitor: corner node ids < NNp index pk directly
        self.monitor_node_p = self.monitor_node
        self.dt = float(deck.dt)
        self._momentum_solver = solver_by_name(cfg.momentum_solver)
        if cache_dir:
            sc.snapshot_store(
                cache_dir, cache_key, sc.solver_snapshot(self, self._SNAP_ATTRS)
            )
        # one host->device transfer at the end (setup + snapshot stay numpy)
        self.d = {k: jnp.asarray(v) for k, v in self.d.items()}

    def _try_structured(self, mesh, ops, Z, is_bc, bc_vel, mk_vals, pat,
                        p_mask):
        """DIA operators + per-step device assembly maps for a box grid."""
        from cfd_with_cuda_tpu.fem.structured import (
            detect_promoted_box,
            dia_from_csr,
            shard_pad_size,
        )

        deck = self.deck
        dtype = self.config.jnp_dtype()
        box = detect_promoted_box(mesh.coords, self.nnp, mesh.ltog_node)
        if box is None or box.elem_perm is None:
            # (unlike the explicit solver, the per-step LHS assembly
            # needs element-grid structure too)
            return
        fx, fy, fz = box.fine_dims
        cx, cy, cz = box.coarse_dims
        perm, perm_p, embed = box.perm, box.perm_p, box.embed
        elem_perm = box.elem_perm

        MK = pat.to_scipy(mk_vals)
        mk_dia = dia_from_csr(MK, perm, perm, box.fine_dims)
        m_dia = dia_from_csr(pat.to_scipy(ops.M), perm, perm, box.fine_dims)
        z_dia = dia_from_csr(Z, perm_p, perm_p, box.coarse_dims)
        g_dias = [
            dia_from_csr(ops.G_csr(d), perm, embed, box.fine_dims)
            for d in range(3)
        ]
        gt_dias = [
            dia_from_csr(ops.G_csr(d).T.tocsr(), embed, perm, box.fine_dims)
            for d in range(3)
        ]
        if any(x is None for x in [mk_dia, m_dia, z_dia, *g_dias, *gt_dias]):
            return
        # M and MK must share the DIA offset layout for cheap addition
        if m_dia.flat_offsets != mk_dia.flat_offsets:
            return

        self.structured = True
        self.elem_structured = True
        self.perm = perm
        self.perm_p = perm_p
        self.fine_dims = box.fine_dims
        self.coarse_dims = box.coarse_dims
        self.elem_dims = box.elem_dims
        self.a_offsets = mk_dia.flat_offsets
        self.a_zero_off = self.a_offsets.index(0)
        self.z_radius = z_dia.radius
        self.g_radius = max(g.radius for g in g_dias)
        self.gt_radius = max(g.radius for g in gt_dias)

        self.chan_order = box.chan_order
        self.local_off = box.local_off

        # sharding pad: the fine-grid axis is zero-padded to a multiple of
        # shard_pad so multi-chip device_put can split it evenly (padding
        # rows carry zero operator values + unit diagonal -> no-op rows)
        S = box.size
        self.s_pad = shard_pad_size(S, self.config, self._pallas_layout)
        n_off = mk_dia.vals.shape[0]

        # channel-pair -> DIA offset-index table: entry (i, j) of every
        # element lands at the fixed window offset fo(j) - fo(i), so the
        # per-step LHS assembly is 27 dilated-pad placements + static add
        # chains (no device scatter — jax segment_sum lowers to a
        # 19.7M-element sort, measured ~220 ms/step)
        fo = [ox + fx * (oy + fy * oz) for (ox, oy, oz) in self.local_off]
        off_index = {o: idx for idx, o in enumerate(self.a_offsets)}
        nen = len(self.local_off)
        self.conv_oij = tuple(
            tuple(off_index[fo[j] - fo[i]] for j in range(nen))
            for i in range(nen)
        )

        permute_vec = box.permute_vec
        permute_vec_p = box.permute_vec_p

        gDSv_t = np.transpose(self.tables.gDSv, (3, 2, 1, 0))
        gq_t = self.tables.gq_factor.T
        g2 = np.empty_like(gDSv_t)
        g2[..., elem_perm] = gDSv_t
        q2 = np.empty_like(gq_t)
        q2[..., elem_perm] = gq_t
        gDSv_t = g2[:, box.chan_order]
        gq_t = q2
        Sv_t = self.tables.Sv[:, box.chan_order]

        dev = lambda x: np.asarray(x, dtype=dtype)
        bc_mask = np.where(is_bc, 0.0, 1.0)
        diag_add = np.zeros(self.s_pad)
        diag_add[perm[is_bc]] = 1.0
        diag_add[S:] = 1.0     # padding rows -> identity (keeps Jacobi finite)

        # f64 (x64-emulated on TPU): roll-form DIA G/G^T instead of the
        # fine-grid patch extraction, which OOMs at NE27000 (see
        # explicit_bch._try_structured for the numbers)
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
            "Sv": dev(Sv_t),
            "gDSv": dev(gDSv_t),
            "gq": dev(gq_t),
            "MK_vals": dev(mk_dia.vals),
            "M_vals": dev(m_dia.vals),
            "row_mask_grid": dev(permute_vec(bc_mask)),
            "diag_add_grid": dev(diag_add),
            "Z_win": dev(z_dia.window_vals(dtype=dtype)),
            "Z_diag": dev(permute_vec_p(np.asarray(Z.diagonal()))),
            "p_mask": dev(permute_vec_p(p_mask)),
            "bc_mask": dev(permute_vec(bc_mask)),
            "bc_vel": dev(np.stack([permute_vec(bc_vel[:, d]) for d in range(3)])),
        }
        if self.s_pad > S:
            extra = self.s_pad - S
            for key in list(self.d):
                v = self.d[key]
                if v.ndim >= 1 and v.shape[-1] == S:
                    widths = [(0, 0)] * (v.ndim - 1) + [(0, extra)]
                    self.d[key] = np.pad(v, widths)
        # fused-CG weights pre-padded to the kernel's DMA-block layout
        # (see explicit_bch._try_structured: built in-step the ~16 MB pad
        # re-runs every solve under the while_loop nest, ~9 ms each)
        if self._pallas_layout:
            from cfd_with_cuda_tpu.ops.pallas_cg import cg_weight_layout

            self.d["Z_win_cg"] = cg_weight_layout(
                self.d["Z_win"], (cx, cy, cz), z_dia.radius,
                sym=self.config.pressure_cg_sym,
            )
            # pre-padded inverse Jacobi diagonal (see explicit_bch: the
            # per-solve 1/Z_diag + pad cannot be hoisted out of the
            # while_loop nest by XLA)
            nnp_pad = -(-self.nnp // 128) * 128
            zdinv = np.zeros(nnp_pad, dtype)
            zdinv[: self.nnp] = 1.0 / np.asarray(self.d["Z_diag"])[: self.nnp]
            self.d["Z_dinv_cg"] = dev(zdinv)
            # compact G^T table (see explicit_bch: 7/8 of GT_win's rows
            # are structural zeros; 8x less stream per div apply)
            from cfd_with_cuda_tpu.ops.pallas_stencil import compact_gt_window

            self.d["GT_cwin"] = dev(compact_gt_window(
                self.d["GT_win"], (fx, fy, fz), (cx, cy, cz)
            ))
        self.pin_grid = int(perm_p[self.pin]) if self.pin >= 0 else -1
        mon = find_monitor_node(
            deck.coords,
            deck.monitor_xyz if deck.monitor_xyz is not None else (0.5,) * 3,
        )
        self.monitor_node = int(perm[mon])
        # pressure field lives on the COARSE grid in perm_p order — the
        # fine-grid id perm[mon] would index pk out of bounds (clamped by
        # XLA to the last entry: p_mon silently read the wrong node)
        self.monitor_node_p = int(perm_p[mon])

        # geometric-multigrid pressure preconditioner on the pinned
        # direct-assembly Z (sign-agnostic cycle; ops/multigrid.py).
        # Skipped under "auto" when the fused Pallas path is active: that
        # path is Jacobi-only and the hierarchy would be dead setup time
        # + HBM (an explicit "mg" disables the fused path, utils/config.py).
        # Also requires a NONSINGULAR Z (pin or outflow Dirichlet rows):
        # the Galerkin coarse solve of the unpinned all-Neumann Laplacian
        # inverts a singular matrix and the V-cycle returns garbage —
        # Jacobi handles the singular-consistent case instead.
        z_regular = self.pin >= 0 or float(np.min(p_mask)) == 0.0
        if self.config.pressure_precond == "mg" and not z_regular:
            raise ValueError(
                "pressure_precond='mg' needs a nonsingular Z (a pressure "
                "pin node > 0 or outflow Dirichlet rows); this deck's "
                "all-Neumann Z is singular"
            )
        if self.config.pressure_precond == "mg" or (
            self.config.pressure_precond == "auto"
            and not self._pallas_layout
            and z_regular
        ):
            from cfd_with_cuda_tpu.ops.multigrid import attach_hierarchy

            inv_p = np.argsort(perm_p)          # flat grid id -> node id
            Zg = Z[inv_p][:, inv_p].tocsr()
            attach_hierarchy(self, Zg, box.coarse_dims, dtype)

        # ---- parity-split (class-major) layout (see explicit_bch): the
        # per-step LHS assembly becomes contiguous DUS adds straight into
        # compacted concat-slot planes (no interior-dilated pads), the
        # momentum applies stream ~2x less weight, and every stride-2
        # gather/embed is a contiguous slice (ops/parity_stencil).
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
            offs_a = pstl.decode_offsets(self.a_offsets, (fx, fy, fz))
            # static LHS part pre-masked (BC rows zeroed, unit diagonal
            # there): the per-step device work is ONLY the masked
            # convection add
            mk_masked = np.asarray(self.d["MK_vals"]) * np.asarray(
                self.d["row_mask_grid"]
            )[None]
            mk_masked[self.a_zero_off] += np.asarray(self.d["diag_add_grid"])
            mkp, self.a_pairs = pstl.build_parity_apply_tables(
                mk_masked, offs_a, (fx, fy, fz)
            )
            self.diag_planes = pstl.diag_plane_indices(self.a_pairs)
            # class-box pad slots carry no row: unit diagonal keeps the
            # Jacobi division finite (their residuals are identically 0)
            for p in range(8):
                col = mkp[0, self.diag_planes[p]]
                mkp[0, self.diag_planes[p]] = np.where(col == 0.0, 1.0, col)
            try:
                # scatter-free per-step LHS assembly: the 729 convection
                # planes (8 contiguous shifts of the embedded-axis ae)
                # merge onto the static MKp planes with ONE MXU matmul
                # (conv_plane_merge_matrix; the old grouped windowed
                # scatter-add, parity_assemble_conv, measured 321
                # ms/step on TPU)
                (self.conv_i_order, self.conv_groups,
                 _unused_pairs2) = pstl.build_conv_plane_route(
                    self.local_off, (cx, cy, cz)
                )
                conv_sel = pstl.conv_plane_merge_matrix(
                    self.local_off, self.conv_i_order, self.a_pairs,
                    (cx, cy, cz),
                )
            except ValueError:
                # Dirichlet masking zeroed an entire (class, offset)
                # plane (one-element-thin box between opposing walls), so
                # the per-step parity LHS assembly cannot route.  Unlike
                # the explicit solver (which survives matrix-free,
                # explicit_bch.py), this path NEEDS the route — fall back
                # to the interleaved layout for the whole solver.
                self.layout = "interleaved"
                self.conv_i_order = None
                self.conv_groups = None
            if self.layout == "parity":
                mp, self.m_pairs = pstl.build_parity_apply_tables(
                    np.asarray(self.d["M_vals"]), offs_a, (fx, fy, fz)
                )
                r = self.g_radius
                offs_g = tuple(
                    (dx, dy, dz)
                    for dz in range(-r, r + 1)
                    for dy in range(-r, r + 1)
                    for dx in range(-r, r + 1)
                )
                gp, self.g_pairs = pstl.build_parity_apply_tables(
                    self.d["G_win"], offs_g, (fx, fy, fz)
                )
                assert all(
                    pp == 0 for cls_ in self.g_pairs for (_, pp, _) in cls_
                )
                self.d["MKp"] = np.asarray(mkp, dtype)
                self.d["Mp"] = np.asarray(mp, dtype)
                self.d["Gp"] = np.asarray(gp, dtype)
                self.d["bc_mask_p"] = pstl.parity_split_table(
                    self.d["bc_mask"], (fx, fy, fz), sp_c
                )
                # elemental Dirichlet row mask on the EMBEDDED flat axis,
                # i channels pre-permuted to conv_i_order (it multiplies
                # ae's i axis, which the step builds permuted); gathered
                # ONCE at setup (the per-step body must not re-gather a
                # constant inside the chunk while-loop)
                mask_p = np.asarray(self.d["bc_mask_p"], dtype)
                mask_e = np.zeros((27, sp_c), dtype)
                for c, (p_idx, dqf) in enumerate(
                    pstl.elem_channel_shifts((cx, cy, cz))
                ):
                    mask_e[c, : sp_c - dqf] = mask_p[p_idx, dqf:]
                self.d["bc_mask_e"] = mask_e[np.asarray(self.conv_i_order)]
                self.d["conv_sel"] = np.asarray(conv_sel, dtype)
                # element tables re-embedded on the coarse-flat axis for
                # the flat ae build (see explicit_bch / parity_stencil)
                self.d["gDSv_p"] = pstl.embed_elem_table(
                    self.d["gDSv"], self.elem_dims, (cx, cy, cz), sp_c
                )
                self.d["gq_p"] = pstl.embed_elem_table(
                    self.d["gq"], self.elem_dims, (cx, cy, cz), sp_c
                )
                self.d["bc_vel_p"] = pstl.parity_split_table(
                    self.d["bc_vel"], (fx, fy, fz), sp_c
                )
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
                # the step never touches the interleaved big tables (nor
                # the element-axis tables the flat ae build re-embedded):
                # drop them from HBM + the snapshot
                for key in ("MK_vals", "M_vals", "G_win", "GT_win",
                            "Z_win", "row_mask_grid", "diag_add_grid",
                            "bc_mask", "bc_vel", "gDSv", "gq"):
                    self.d.pop(key, None)

    # ----------------------------------------------------------------- state
    def initial_state(self) -> ImplicitState:
        dtype = self.config.jnp_dtype()
        key = "bc_vel_p" if self.layout == "parity" else "bc_vel"
        uk = jnp.array(self.d[key], dtype=dtype, copy=True)
        pk = jnp.zeros(self.nnp, dtype=dtype)
        return ImplicitState(uk=uk, pk=pk, pk_prev=jnp.zeros_like(pk))

    def state_from_fields(self, u, p) -> ImplicitState:
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
        # pk and pk_prev must be DISTINCT buffers: run() donates the state,
        # and aliased leaves make XLA reject the donation (buffer donated
        # twice)
        return ImplicitState(
            uk=jnp.asarray(u, dtype=dtype),
            pk=jnp.asarray(p, dtype=dtype),
            pk_prev=jnp.array(p, dtype=dtype, copy=True),
        )

    # ------------------------------------------------------------- one step
    def _time_step(self, params, state: ImplicitState):
        if self.structured:
            if self.layout == "parity":
                return self._time_step_parity(params, state)
            return self._time_step_structured(params, state)
        return self._time_step_ell(params, state)

    def _time_step_parity(self, d, state: ImplicitState):
        """Class-major layout (ops/parity_stencil): the per-step LHS is
        assembled by contiguous DUS adds straight into compacted
        concat-slot planes (no interior-dilated pads), the momentum
        BiCGStab applies the compacted table, and grad/div read/emit the
        coarse pressure grid directly."""
        from cfd_with_cuda_tpu.ops import parity_stencil as pstl
        from cfd_with_cuda_tpu.ops.pallas_cg import fused_cg

        cfg = self.config
        dt = self.dt
        uk_prev, pk_prev, pk_prevprev = state       # uk (3, 8, Sp)
        sp_c = self.sp_c

        # ---- per-step LHS: A = (M/dt + K)|masked + masked A(u^k).
        # Flat ae build (embedded element axis, minor-axis shift gathers)
        # -> 729 convection weight planes (8 contiguous shifts) -> ONE
        # MXU matmul merges them onto the static MKp planes — no XLA
        # scatter anywhere (parity_assemble_conv's grouped windowed
        # scatter-add measured 321 ms/step on TPU).
        u0_e = pstl.parity_gather_elem_flat(uk_prev, self.coarse_dims)
        u0_gq = jnp.einsum("ki,die->dke", d["Sv"], u0_e)
        udotg = jnp.einsum("dke,djke->jke", u0_gq, d["gDSv_p"])
        if cfg.conv_stab:
            # Temam (div u0) Sv_i Sv_j term (SolverConfig.conv_stab; the
            # ref carries it with coefficient 0.0, :3864-3865)
            div0 = jnp.einsum("djke,dje->ke", d["gDSv_p"], u0_e)
            udotg = udotg + cfg.conv_stab * div0[None] * d["Sv"].T[:, :, None]
        sv_i = d["Sv"][:, np.asarray(self.conv_i_order)]
        ae = jnp.einsum("ki,ke,jke->ije", sv_i, d["gq_p"], udotg)
        # Dirichlet row-zeroing in ELEMENT space: contributions whose
        # output node is a BC node vanish (the static MKp already carries
        # the unit diagonal there); the mask is gathered once at setup,
        # i channels pre-permuted to conv_i_order like ae's i axis
        ae = ae * d["bc_mask_e"][:, None, :]
        conv_wc = pstl.conv_planes_from_ae(ae, groups=self.conv_groups)
        conv_p = jnp.einsum(
            "pj,js->ps", d["conv_sel"], conv_wc[0],
            preferred_element_type=ae.dtype,
        )[None]
        a_wc = d["MKp"] + conv_p
        a_diag = jnp.stack(
            [a_wc[0, jp] for jp in self.diag_planes]
        ).reshape(1, -1)                             # (1, 8*Sp)

        a_mul = lambda x: pstl.parity_apply(
            a_wc, x.reshape(3, 8, sp_c), pairs=self.a_pairs, co=3
        ).reshape(3, -1)
        m_mul = lambda x: pstl.parity_apply(
            d["Mp"], x, pairs=self.m_pairs, co=3
        )

        def grad(p):
            xp = jnp.pad(p, (0, sp_c - p.shape[0]))[None, None]
            return pstl.parity_apply(d["Gp"], xp, pairs=self.g_pairs, co=3)

        div = lambda u: pstl.parity_div_apply(
            d["GT_cwin"], u, self.coarse_dims
        )[: self.nnp]

        # ---- RHS = (M/dt) u^k - G (2 p^k - p^{k-1}); BC rows = BC values
        pdiff2 = 2.0 * pk_prev - pk_prevprev
        r1 = m_mul(uk_prev) - grad(pdiff2)
        r1 = r1 * d["bc_mask_p"][None] + d["bc_vel_p"]

        warm = bool(getattr(cfg, "implicit_warm_start", False))
        mom = self._momentum_solver(
            a_mul,
            r1.reshape(3, -1),
            x0=uk_prev.reshape(3, -1) if warm else None,
            tol=cfg.momentum_tol,
            atol=cfg.momentum_abs_tol,
            maxiter=cfg.momentum_maxiter,
            # warm-started solves take AT LEAST one Krylov step (the
            # ||b||-relative bound is inflated by the M/dt term and lets
            # a warm solve exit at 0 iterations, freezing the time loop
            # at an unconverged state — the Re=1000 step-463 freeze,
            # docs/VALIDATION.md round 5).  The earlier fix (bound capped
            # at 1% of the warm residual) chased an f32-unattainable
            # residual once the warm start was already converged —
            # momentum solves ground at maxiter and broke down to NaN
            # (Re=1000 round-5 rerun).  miniter keeps the reference's
            # exact bound and merely forbids the zero-iteration exit.
            miniter=1 if warm else 0,
            dot_dtype=cfg.krylov_dot_dtype(),
            precond=lambda r: r / a_diag,
        )
        uk = mom.x.reshape(3, 8, sp_c)

        # ---- step2: fused pressure CG on the coarse grid (unchanged —
        # the pressure grid IS class 0)
        r2 = (-1.0 / dt) * div(uk) * d["p_mask"]
        if self.ppe_project:
            # all-Neumann + boundary thru-flow: remove the null-space
            # (constant) component the discrete BC flux defect injects
            r2 = r2 - jnp.mean(r2)
        if self.pin_grid >= 0:
            r2 = r2.at[self.pin_grid].set(0.0)
        pdiff0 = (pk_prev - pk_prevprev) if warm else None
        win_cg = d["Z_win_cg"]
        sol = fused_cg(
            win_cg, r2, d["Z_dinv_cg"],
            dims=self.coarse_dims, radius=self.z_radius,
            tol=cfg.pressure_cg_tol, maxiter=cfg.pressure_cg_maxiter,
            x0=pdiff0,
            unroll=max(1, int(cfg.pressure_cg_unroll)),
            fuse_loop=cfg.pressure_cg_fuse_loop,
            sym=cfg.pressure_cg_sym,
            dot_mode=(
                "compensated" if cfg.krylov_dot_dtype() is not None
                else "plain"
            ),
        )
        pdiff = sol.x
        if self.ppe_project:
            # singular all-Neumann solve: pick the mean-zero
            # representative so the arbitrary pressure level cannot
            # drift across steps (f32: G @ (large const) leaks noise)
            pdiff = pdiff - jnp.mean(pdiff)
        pk = pk_prev + pdiff

        max_acc = jnp.max(jnp.abs(uk - uk_prev)) / dt
        probe = lambda a, c_: a[c_, self.mon_cls, self.mon_q]
        stats = StepStats(
            u_mon=probe(uk, 0), v_mon=probe(uk, 1), w_mon=probe(uk, 2),
            p_mon=pk[self.monitor_node_p], max_acc=max_acc,
            iters=jnp.asarray(1), cg_iters=sol.iters, mom_iters=mom.iters,
        )
        return ImplicitState(uk=uk, pk=pk, pk_prev=pk_prev), stats

    def _time_step_structured(self, params, state: ImplicitState):
        """Structured path: per-step LHS (re)assembled straight into DIA
        slots by one segment-sum; all operator applications are stencils."""
        from cfd_with_cuda_tpu.ops.stencil import (
            dia_spmv,
            gather_elem_stencil,
            patches_div_apply,
            patches_grad_apply,
            patches_spmv,
        )

        d = params
        cfg = self.config
        dt = self.dt
        uk_prev, pk_prev, pk_prevprev = state
        S = int(np.prod(self.fine_dims))      # real fine-grid size (<= s_pad)
        pad_u = lambda y: jnp.pad(y, ((0, 0), (0, self.s_pad - S)))

        # fused Pallas path: same gating as the explicit solver — XLA
        # patch convolutions degrade badly next to Pallas custom calls,
        # so when the fused CG is active, M/A/G/G^T also go Pallas
        use_fused = cfg.fused_pressure_eligible()

        # A = M/dt + K + A(u^k): convection assembled into DIA rows via
        # scatter-free parity-class accumulation + one interleave
        # (conv_oij maps each (i, j) channel pair to its fixed window
        # offset; ops.stencil.assemble_window_values)
        from cfd_with_cuda_tpu.ops.stencil import assemble_window_values

        u0_e = gather_elem_stencil(uk_prev[:, :S], self.elem_dims, self.fine_dims)
        u0_gq = jnp.einsum("ki,die->dke", d["Sv"], u0_e)
        udotg = jnp.einsum("dke,djke->jke", u0_gq, d["gDSv"])
        if cfg.conv_stab:
            div0 = jnp.einsum("djke,dje->ke", d["gDSv"], u0_e)
            udotg = udotg + cfg.conv_stab * div0[None] * d["Sv"].T[:, :, None]
        ae = jnp.einsum("ki,ke,jke->ije", d["Sv"], d["gq"], udotg)
        conv_vals = assemble_window_values(
            ae, self.local_off, self.conv_oij, len(self.a_offsets),
            self.elem_dims, self.fine_dims, self.s_pad,
        )
        a_vals = (d["MK_vals"] + conv_vals) * d["row_mask_grid"][None, :]
        a_vals = a_vals.at[self.a_zero_off].add(d["diag_add_grid"])
        a_diag = a_vals[self.a_zero_off]

        if use_fused:
            from cfd_with_cuda_tpu.ops.pallas_stencil import (
                pallas_div_window,
                pallas_grad_window,
                pallas_window_spmv,
            )
            from cfd_with_cuda_tpu.ops.stencil import coarse_to_fine, fine_to_coarse

            sp = self.s_pad
            spmd_mesh = self.spmd_mesh
            if spmd_mesh is not None:
                # multi-chip fast path (parallel/sharded_stencil): sharded
                # applies with flat halo ppermutes; div all-gathers for
                # the replicated coarse-grid pressure CG
                from cfd_with_cuda_tpu.ops.pallas_stencil import window_offsets
                from cfd_with_cuda_tpu.parallel.sharded_stencil import (
                    sharded_div_window,
                    sharded_grad_window,
                    sharded_window_spmv,
                )

                g_offs = window_offsets(self.fine_dims, self.g_radius)
                gt_offs = window_offsets(self.fine_dims, self.gt_radius)
                a_mul = lambda x: sharded_window_spmv(
                    a_vals, x, self.fine_dims, offsets=self.a_offsets,
                    mesh=spmd_mesh,
                )
                m_mul = lambda x: sharded_window_spmv(
                    d["M_vals"], x, self.fine_dims, offsets=self.a_offsets,
                    mesh=spmd_mesh,
                )
                grad = lambda p: sharded_grad_window(
                    d["G_win"],
                    jnp.pad(coarse_to_fine(p, self.coarse_dims, self.fine_dims),
                            (0, sp - S)),
                    self.fine_dims, offsets=g_offs, mesh=spmd_mesh,
                )
                div = lambda u: fine_to_coarse(
                    sharded_div_window(
                        d["GT_win"], u, self.fine_dims, offsets=gt_offs,
                        mesh=spmd_mesh,
                    )[:S],
                    self.coarse_dims, self.fine_dims,
                )
            else:
                a_mul = lambda x: pallas_window_spmv(
                    a_vals, x, self.fine_dims, offsets=self.a_offsets,
                    trim=False,
                )
                m_mul = lambda x: pallas_window_spmv(
                    d["M_vals"], x, self.fine_dims, offsets=self.a_offsets,
                    trim=False,
                )
                grad = lambda p: pallas_grad_window(
                    d["G_win"],
                    jnp.pad(coarse_to_fine(p, self.coarse_dims, self.fine_dims),
                            (0, sp - S)),
                    self.fine_dims, self.g_radius, trim=False,
                )
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
                            d["GT_win"], u, self.fine_dims, self.gt_radius
                        ),
                        self.coarse_dims, self.fine_dims,
                    )
        else:
            a_mul = lambda x: dia_spmv(a_vals, x, self.a_offsets)
            m_mul = lambda x: dia_spmv(d["M_vals"], x, self.a_offsets)
            if getattr(self, "f64_dia", False):
                # f64: roll-form G/G^T (fine-grid patch extraction OOMs
                # under x64 emulation — see explicit_bch)
                from cfd_with_cuda_tpu.ops.stencil import (
                    coarse_to_fine,
                    fine_to_coarse,
                )

                def grad(p):
                    pf = jnp.pad(
                        coarse_to_fine(p, self.coarse_dims, self.fine_dims),
                        (0, self.s_pad - S),
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
                    return fine_to_coarse(
                        acc[:S], self.coarse_dims, self.fine_dims
                    )
            else:
                grad = lambda p: pad_u(patches_grad_apply(
                    d["G_win"][..., :S], p, self.coarse_dims, self.fine_dims,
                    self.g_radius,
                ))
                div = lambda u: patches_div_apply(
                    d["GT_win"][..., :S], u[:, :S], self.coarse_dims,
                    self.fine_dims, self.gt_radius,
                )

        # RHS = (M/dt) u^k - G (2 p^k - p^{k-1}); BC rows = BC values
        pdiff2 = 2.0 * pk_prev - pk_prevprev
        r1 = m_mul(uk_prev)
        r1 = r1 - grad(pdiff2)
        r1 = r1 * d["bc_mask"][None, :] + d["bc_vel"]

        # warm starts: momentum from u^k (changes O(dt)/step), pressure
        # increment from the previous step's increment.  The stopping
        # bounds stay relative to ||b||, so only iteration counts change.
        warm = bool(getattr(cfg, "implicit_warm_start", False))
        mom = self._momentum_solver(
            a_mul,
            r1,
            x0=uk_prev if warm else None,
            tol=cfg.momentum_tol,
            atol=cfg.momentum_abs_tol,
            maxiter=cfg.momentum_maxiter,
            # warm-started solves take AT LEAST one Krylov step (the
            # ||b||-relative bound is inflated by the M/dt term and lets
            # a warm solve exit at 0 iterations, freezing the time loop
            # at an unconverged state — the Re=1000 step-463 freeze,
            # docs/VALIDATION.md round 5).  The earlier fix (bound capped
            # at 1% of the warm residual) chased an f32-unattainable
            # residual once the warm start was already converged —
            # momentum solves ground at maxiter and broke down to NaN
            # (Re=1000 round-5 rerun).  miniter keeps the reference's
            # exact bound and merely forbids the zero-iteration exit.
            miniter=1 if warm else 0,
            dot_dtype=cfg.krylov_dot_dtype(),
            precond=lambda r: r / a_diag,
        )
        uk = mom.x

        r2 = (-1.0 / dt) * div(uk) * d["p_mask"]
        if self.ppe_project:
            # all-Neumann + boundary thru-flow: remove the null-space
            # (constant) component the discrete BC flux defect injects
            r2 = r2 - jnp.mean(r2)
        if self.pin_grid >= 0:
            r2 = r2.at[self.pin_grid].set(0.0)
        pdiff0 = (pk_prev - pk_prevprev) if warm else None
        if use_fused:
            from cfd_with_cuda_tpu.ops.pallas_cg import fused_cg

            win_cg = d["Z_win_cg"] if "Z_win_cg" in d else d["Z_win"]
            dinv = d["Z_dinv_cg"] if "Z_dinv_cg" in d else 1.0 / d["Z_diag"]

            def solve(win_, r2_, dinv_, *x0_):
                return fused_cg(
                    win_, r2_, dinv_,
                    dims=self.coarse_dims, radius=self.z_radius,
                    tol=cfg.pressure_cg_tol, maxiter=cfg.pressure_cg_maxiter,
                    x0=x0_[0] if x0_ else None,
                    unroll=max(1, int(cfg.pressure_cg_unroll)),
                    fuse_loop=cfg.pressure_cg_fuse_loop,
                    sym=cfg.pressure_cg_sym and "Z_win_cg" in d,
                    # MIXED policy: double-single in-kernel dots stand in
                    # for the XLA path's f64 reductions
                    dot_mode=(
                        "compensated" if cfg.krylov_dot_dtype() is not None
                        else "plain"
                    ),
                )

            args = (win_cg, r2, dinv) + ((pdiff0,) if pdiff0 is not None else ())
            if self.spmd_mesh is not None:
                # replicated coarse-grid CG (see explicit_bch: redundant
                # per-device compute beats per-iteration psums at this
                # size, and a pallas_call cannot sit under GSPMD)
                from cfd_with_cuda_tpu.parallel.sharded_stencil import shard_map  # version-compat shim
                from jax.sharding import PartitionSpec as P

                sol = shard_map(
                    solve, mesh=self.spmd_mesh,
                    in_specs=tuple(P() for _ in args), out_specs=P(),
                    check_vma=False,
                )(*args)
            else:
                sol = solve(*args)
        else:
            if self.use_mg:
                from cfd_with_cuda_tpu.ops.multigrid import make_vcycle

                precond = make_vcycle(
                    d, self.mg_dims, self.mg_radii, self.mg_omegas
                )
            else:
                precond = lambda r: r / d["Z_diag"]
            sol = cg(
                lambda p: patches_spmv(
                    d["Z_win"], p, self.coarse_dims, self.z_radius
                ),
                r2,
                x0=pdiff0,
                tol=cfg.pressure_cg_tol,
                maxiter=cfg.pressure_cg_maxiter,
                dot_dtype=cfg.krylov_dot_dtype(),
                precond=precond,
            )
        pdiff = sol.x
        if self.ppe_project:
            # singular all-Neumann solve: pick the mean-zero
            # representative so the arbitrary pressure level cannot
            # drift across steps (f32: G @ (large const) leaks noise)
            pdiff = pdiff - jnp.mean(pdiff)
        pk = pk_prev + pdiff

        max_acc = jnp.max(jnp.abs(uk - uk_prev)) / dt
        mon = self.monitor_node
        stats = StepStats(
            u_mon=uk[0, mon], v_mon=uk[1, mon], w_mon=uk[2, mon],
            p_mon=pk[self.monitor_node_p], max_acc=max_acc, iters=jnp.asarray(1),
            cg_iters=sol.iters, mom_iters=mom.iters,
        )
        return ImplicitState(uk=uk, pk=pk, pk_prev=pk_prev), stats

    def _time_step_ell(self, params, state: ImplicitState):
        d = params
        cfg = self.config
        dt = self.dt
        uk_prev, pk_prev, pk_prevprev = state

        # ---- step1 LHS: A = M/dt + K + A(u^k), BC rows zeroed (:3916-3929)
        conv_vals = convection_assemble_csr(
            uk_prev, d["ltog"], d["Sv"], d["gDSv"], d["gq"],
            d["scatter_m"], self._nnz, stab_coef=cfg.conv_stab,
        )
        a_csr = (d["mk_vals_csr"] + conv_vals) * d["row_mask"] + d["diag_add"]
        a_ell = jnp.zeros(
            self._ell_shape[0] * self._ell_shape[1], a_csr.dtype
        ).at[d["csr_to_ell"]].set(a_csr).reshape(self._ell_shape)
        if self.s_pad > self._ell_shape[1]:       # ELL shard padding
            a_ell = jnp.pad(
                a_ell, ((0, 0), (0, self.s_pad - self._ell_shape[1]))
            )

        # ---- step1 RHS: (M/dt) u^k - G (2 p^k - p^{k-1})  (:3937-4005)
        pdiff2 = 2.0 * pk_prev - pk_prevprev
        r1 = ell_spmv(d["m_vals"], d["A_cols"], uk_prev)
        r1 = r1 - grad_apply(d["G_vals"], d["G_cols"], pdiff2)
        r1 = r1 * d["bc_mask"][None, :] + d["bc_vel"]       # RHS = BC value

        # ---- momentum solve, 3 directions batched (:3972-4033); Jacobi
        # preconditioner like Paralution's (:4213-4216)
        a_diag = a_csr[d["diag_slots"]]
        if self.s_pad > self._ell_shape[1]:
            a_diag = jnp.pad(
                a_diag, (0, self.s_pad - self._ell_shape[1]),
                constant_values=1.0,
            )
        warm = bool(getattr(cfg, "implicit_warm_start", False))
        mom = self._momentum_solver(
            lambda x: ell_spmv(a_ell, d["A_cols"], x),
            r1,
            x0=uk_prev if warm else None,
            tol=cfg.momentum_tol,
            atol=cfg.momentum_abs_tol,
            maxiter=cfg.momentum_maxiter,
            # warm-started solves take AT LEAST one Krylov step (the
            # ||b||-relative bound is inflated by the M/dt term and lets
            # a warm solve exit at 0 iterations, freezing the time loop
            # at an unconverged state — the Re=1000 step-463 freeze,
            # docs/VALIDATION.md round 5).  The earlier fix (bound capped
            # at 1% of the warm residual) chased an f32-unattainable
            # residual once the warm start was already converged —
            # momentum solves ground at maxiter and broke down to NaN
            # (Re=1000 round-5 rerun).  miniter keeps the reference's
            # exact bound and merely forbids the zero-iteration exit.
            miniter=1 if warm else 0,
            dot_dtype=cfg.krylov_dot_dtype(),
            precond=lambda r: r / a_diag,
        )
        uk = mom.x

        # ---- step2: R2 = -(1/dt) G^T u^k  (:4096-4127)
        r2 = (-1.0 / dt) * div_apply(d["GT_vals"], d["GT_cols"], uk) * d["p_mask"]
        if self.ppe_project:
            r2 = r2 - jnp.mean(r2)
        if self.pin >= 0:
            r2 = r2.at[self.pin].set(0.0)
        # CG on the (negative-definite) direct Z — sign-consistent, like the
        # reference's unpreconditioned MKL dcg (:4503-4536); Jacobi here
        # only rescales and changes no solution.
        sol = cg(
            lambda p: ell_spmv(d["Z_vals"], d["Z_cols"], p),
            r2,
            x0=(pk_prev - pk_prevprev) if warm else None,
            tol=cfg.pressure_cg_tol,
            maxiter=cfg.pressure_cg_maxiter,
            dot_dtype=cfg.krylov_dot_dtype(),
            precond=lambda r: r / d["Z_diag"],
        )
        pdiff = sol.x
        if self.ppe_project:
            pdiff = pdiff - jnp.mean(pdiff)
        pk = pk_prev + pdiff                                 # (:4162-4165)

        # ---- steady check.  NOTE deliberate divergence: the reference
        # implicit solver assigns maxAcc *signed* (:3347-3353, a bug — the
        # explicit solver :3049-3061 correctly takes |.|), which makes its
        # steady test spuriously fire whenever the largest-|.| acceleration
        # is negative.  We use the correct |.| semantics.
        max_acc = jnp.max(jnp.abs(uk - uk_prev)) / dt

        mon = self.monitor_node
        stats = StepStats(
            u_mon=uk[0, mon], v_mon=uk[1, mon], w_mon=uk[2, mon],
            p_mon=pk[self.monitor_node_p], max_acc=max_acc, iters=jnp.asarray(1),
            cg_iters=sol.iters, mom_iters=mom.iters,
        )
        return ImplicitState(uk=uk, pk=pk, pk_prev=pk_prev), stats

    def _monitor_only(self, state: ImplicitState) -> StepStats:
        if self.layout == "parity":
            probe = lambda c_: state.uk[c_, self.mon_cls, self.mon_q]
        else:
            probe = lambda c_: state.uk[c_, self.monitor_node]
        zero = jnp.zeros((), self.config.jnp_dtype())
        return StepStats(
            probe(0), probe(1), probe(2),
            state.pk[self.monitor_node_p], zero, jnp.asarray(0),
            jnp.asarray(0), jnp.asarray(0),
        )

    # ------------------------------------------------------------------- io
    def fields(self, state: ImplicitState):
        """(u (NN,3), p (NNp,)) as numpy (host convention, deck order)."""
        if self.layout == "parity":
            from cfd_with_cuda_tpu.ops import parity_stencil as pstl

            u = np.asarray(pstl.parity_merge(state.uk, self.fine_dims))
        elif self.structured:
            u = np.asarray(state.uk)
        else:
            u = np.asarray(state.uk)[:, : self.nn]
        pf = np.asarray(state.pk)
        if self.structured:
            u = u[:, self.perm]
            pf = pf[self.perm_p]
        return u.T, pf

    def write_tecplot(self, state: ImplicitState, path) -> None:
        from cfd_with_cuda_tpu.io.tecplot import write_tecplot

        u, p = self.fields(state)
        write_tecplot(
            path, self.deck.title, self.mesh.coords, self.mesh.ltog_node, u, p
        )

    def state_from_restart(self, path) -> ImplicitState:
        from cfd_with_cuda_tpu.io.tecplot import read_restart

        u, p = read_restart(path, self.nn, self.nnp)
        return self.state_from_fields(u, p)
