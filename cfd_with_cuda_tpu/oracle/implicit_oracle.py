"""Numpy/scipy oracle of the implicit GQ fractional-step scheme.

Independent host-side implementation of ``guermondQuartapelle.cpp``'s time
step, with *direct* sparse momentum solves (scipy splu) in place of
BiCGStab — so the jitted path must agree to within its own iterative
tolerance, an independent check of LHS assembly, BC row-zeroing and the
pressure-correction update.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from cfd_with_cuda_tpu.fem.assembly import assemble_operators
from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.io.deck import Deck
from cfd_with_cuda_tpu.mesh.topology import face_bc_to_node_bc, promote_hex_mesh

__all__ = ["ImplicitOracle"]


class ImplicitOracle:
    def __init__(self, deck: Deck):
        self.deck = deck
        mesh = promote_hex_mesh(deck.conn, deck.coords)
        self.mesh = mesh
        self.nn = mesh.nn
        self.nnp = deck.nnp
        tab = build_element_tables(
            mesh.coords, mesh.ltog_node, etype=deck.etype,
            nenv=deck.nenv, nenp=deck.nenp, ngp=deck.ngp,
        )
        self.tab = tab
        ops = assemble_operators(
            tab, mesh.ltog_node, mesh.nn, self.nnp,
            viscosity=deck.viscosity, density=deck.density,
            z_mode="direct", mass_scale=1.0 / deck.dt, keep_consistent_mass=True,
        )
        self.pat = ops.pattern_m
        self.M = ops.pattern_m.to_scipy(ops.M)
        self.K = ops.K_csr()
        self.G = [ops.G_csr(d) for d in range(3)]
        self.Gt = [g.T.tocsr() for g in self.G]

        bc = face_bc_to_node_bc(
            mesh.ltog_node, deck.bc_vel_faces, mesh.nn,
            quadratic=deck.nenv != deck.nenp,
        )
        self.is_bc = bc >= 0
        self.bc_vel = np.zeros((mesh.nn, 3))
        self.bc_vel[self.is_bc] = deck.bc_str[bc[self.is_bc]]

        Z = ops.Z.tocsr().copy()
        self.pin = deck.zero_pressure_node
        if self.pin >= 0:
            Z[self.pin, self.pin] *= 1000.0
        self.Z = Z
        self.MplusK = (self.M + self.K).tocsr()

    def convection_matrix(self, u0: np.ndarray) -> sp.csr_matrix:
        tab = self.tab
        ltog = self.mesh.ltog_node
        u0e = u0[ltog]
        u0gq = np.einsum("ki,eid->ekd", tab.Sv, u0e)
        udotg = np.einsum("ekd,ekjd->ekj", u0gq, tab.gDSv)
        ae = np.einsum("ki,ek,ekj->eij", tab.Sv, tab.gq_factor, udotg)
        vals = self.pat.assemble(ae)
        return self.pat.to_scipy(vals)

    def initial_state(self):
        return self.bc_vel.copy(), np.zeros(self.nnp), np.zeros(self.nnp)

    def time_step(self, uk_prev, pk_prev, pk_prevprev):
        deck = self.deck
        dt = deck.dt

        # step1 LHS with Dirichlet row zeroing (:3916-3929, :4622-4632)
        A = (self.MplusK + self.convection_matrix(uk_prev)).tolil()
        for n in np.flatnonzero(self.is_bc):
            A.rows[n] = [n]
            A.data[n] = [1.0]
        A = A.tocsr()

        pdiff2 = 2.0 * pk_prev - pk_prevprev
        uk = np.empty_like(uk_prev)
        lu = spla.splu(A.tocsc())
        for d in range(3):
            r1 = self.M @ uk_prev[:, d] - self.G[d] @ pdiff2
            r1[self.is_bc] = self.bc_vel[self.is_bc, d]
            uk[:, d] = lu.solve(r1)

        # step2 (:4096-4165)
        r2 = -(1.0 / dt) * sum(self.Gt[d] @ uk[:, d] for d in range(3))
        if self.pin >= 0:
            r2[self.pin] = 0.0
        pdiff = spla.spsolve(self.Z.tocsc(), r2)
        pk = pk_prev + pdiff

        max_acc = np.abs(uk - uk_prev).max() / dt
        return uk, pk, pk_prev, max_acc

    def run(self, n_steps: int):
        uk, pk, pk_prev = self.initial_state()
        hist = []
        for _ in range(n_steps):
            uk, pk, pk_prev, max_acc = self.time_step(uk, pk, pk_prev)
            hist.append(max_acc)
        return uk, pk, hist
