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

    def _setup(self) -> None:
        deck = self.deck
        cfg = self.config
        dtype = cfg.jnp_dtype()

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

        Z = ops.Z.tocsr().copy()
        pin = deck.zero_pressure_node
        self.pin = pin
        if pin > 0:
            Z[pin, pin] = Z[pin, pin] * cfg.pressure_pin_large

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

        dev = lambda x: jnp.asarray(x, dtype=dtype)
        self.d = {
            "ltog": jnp.asarray(mesh.ltog_node.T, dtype=jnp.int32),
            "Sv": dev(tab.Sv),
            "gDSv": dev(np.transpose(tab.gDSv, (3, 2, 1, 0))),
            "gq": dev(tab.gq_factor.T),
            "scatter_m": jnp.asarray(np.transpose(pat.scatter, (1, 2, 0)), dtype=jnp.int32),
            "mk_vals_csr": dev(mk_vals),
            "m_vals": dev(m_ell.vals),
            "row_mask": dev(row_mask),
            "diag_add": dev(diag_add),
            "csr_to_ell": jnp.asarray(mk_ell.csr_to_ell),
            "A_cols": jnp.asarray(mk_ell.cols),
            "G_vals": dev(np.stack([g.vals for g in g_ells])),
            "G_cols": jnp.asarray(g_ells[0].cols),
            "GT_vals": dev(np.stack([g.vals for g in gt_ells])),
            "GT_cols": jnp.asarray(gt_ells[0].cols),
            "Z_vals": dev(z_ell.vals),
            "Z_cols": jnp.asarray(z_ell.cols),
            "Z_diag": dev(Z.diagonal()),
            "bc_mask": dev(np.where(is_bc, 0.0, 1.0)),
            "bc_vel": dev(bc_vel.T),
            "diag_slots": jnp.asarray(diag_all_slots),
        }
        self._ell_shape = mk_ell.vals.shape
        self._nnz = nnz
        self.monitor_node = find_monitor_node(
            deck.coords, deck.monitor_xyz if deck.monitor_xyz is not None else (0.5,) * 3
        )
        self.dt = float(deck.dt)
        self._momentum_solver = solver_by_name(cfg.momentum_solver)

    # ----------------------------------------------------------------- state
    def initial_state(self) -> ImplicitState:
        dtype = self.config.jnp_dtype()
        uk = jnp.array(self.d["bc_vel"], dtype=dtype, copy=True)
        pk = jnp.zeros(self.nnp, dtype=dtype)
        return ImplicitState(uk=uk, pk=pk, pk_prev=jnp.zeros_like(pk))

    def state_from_fields(self, u, p) -> ImplicitState:
        dtype = self.config.jnp_dtype()
        p = jnp.asarray(p, dtype=dtype)
        return ImplicitState(
            uk=jnp.asarray(np.asarray(u).T, dtype=dtype), pk=p, pk_prev=p
        )

    # ------------------------------------------------------------- one step
    def _time_step(self, params, state: ImplicitState):
        d = params
        cfg = self.config
        dt = self.dt
        uk_prev, pk_prev, pk_prevprev = state

        # ---- step1 LHS: A = M/dt + K + A(u^k), BC rows zeroed (:3916-3929)
        conv_vals = convection_assemble_csr(
            uk_prev, d["ltog"], d["Sv"], d["gDSv"], d["gq"],
            d["scatter_m"], self._nnz,
        )
        a_csr = (d["mk_vals_csr"] + conv_vals) * d["row_mask"] + d["diag_add"]
        a_ell = jnp.zeros(
            self._ell_shape[0] * self._ell_shape[1], a_csr.dtype
        ).at[d["csr_to_ell"]].set(a_csr).reshape(self._ell_shape)

        # ---- step1 RHS: (M/dt) u^k - G (2 p^k - p^{k-1})  (:3937-4005)
        pdiff2 = 2.0 * pk_prev - pk_prevprev
        r1 = ell_spmv(d["m_vals"], d["A_cols"], uk_prev)
        r1 = r1 - grad_apply(d["G_vals"], d["G_cols"], pdiff2)
        r1 = r1 * d["bc_mask"][None, :] + d["bc_vel"]       # RHS = BC value

        # ---- momentum solve, 3 directions batched (:3972-4033); Jacobi
        # preconditioner like Paralution's (:4213-4216)
        a_diag = a_csr[d["diag_slots"]]
        mom = self._momentum_solver(
            lambda x: ell_spmv(a_ell, d["A_cols"], x),
            r1,
            tol=cfg.momentum_tol,
            atol=cfg.momentum_abs_tol,
            maxiter=cfg.momentum_maxiter,
            precond=lambda r: r / a_diag,
        )
        uk = mom.x

        # ---- step2: R2 = -(1/dt) G^T u^k  (:4096-4127)
        r2 = (-1.0 / dt) * div_apply(d["GT_vals"], d["GT_cols"], uk)
        if self.pin > 0:
            r2 = r2.at[self.pin].set(0.0)
        # CG on the (negative-definite) direct Z — sign-consistent, like the
        # reference's unpreconditioned MKL dcg (:4503-4536); Jacobi here
        # only rescales and changes no solution.
        sol = cg(
            lambda p: ell_spmv(d["Z_vals"], d["Z_cols"], p),
            r2,
            tol=cfg.pressure_cg_tol,
            maxiter=cfg.pressure_cg_maxiter,
            precond=lambda r: r / d["Z_diag"],
        )
        pk = pk_prev + sol.x                                 # (:4162-4165)

        # ---- steady check.  NOTE deliberate divergence: the reference
        # implicit solver assigns maxAcc *signed* (:3347-3353, a bug — the
        # explicit solver :3049-3061 correctly takes |.|), which makes its
        # steady test spuriously fire whenever the largest-|.| acceleration
        # is negative.  We use the correct |.| semantics.
        max_acc = jnp.max(jnp.abs(uk - uk_prev)) / dt

        mon = self.monitor_node
        stats = StepStats(
            u_mon=uk[0, mon], v_mon=uk[1, mon], w_mon=uk[2, mon],
            p_mon=pk[mon], max_acc=max_acc, iters=jnp.asarray(1),
            cg_iters=sol.iters, mom_iters=mom.iters,
        )
        return ImplicitState(uk=uk, pk=pk, pk_prev=pk_prev), stats

    def _monitor_only(self, state: ImplicitState) -> StepStats:
        mon = self.monitor_node
        zero = jnp.zeros((), self.config.jnp_dtype())
        return StepStats(
            state.uk[0, mon], state.uk[1, mon], state.uk[2, mon],
            state.pk[mon], zero, jnp.asarray(0), jnp.asarray(0), jnp.asarray(0),
        )

    # ------------------------------------------------------------------- io
    def fields(self, state: ImplicitState):
        """(u (NN,3), p (NNp,)) as numpy (host convention)."""
        return np.asarray(state.uk).T, np.asarray(state.pk)

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
