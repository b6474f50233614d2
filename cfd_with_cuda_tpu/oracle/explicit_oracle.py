"""Numpy/scipy oracle of the explicit BCH fractional-step scheme.

Plays the role the MATLAB implementation
(``fractionalStep/explicit/MATLAB/unsteadyNS_BlascoCodinaHuerta.m``) plays
for the reference: an independent, readable implementation of the *same*
algorithm used as numerical ground truth for the jitted TPU path.  It
shares only the setup layers (mesh/tables/assembly) with the production
solver; the time loop, BC handling and CG are separate host-side code
following ``blascoCodinaHuerta.cpp`` step by step (line refs inline).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from cfd_with_cuda_tpu.fem.assembly import assemble_operators
from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.io.deck import Deck
from cfd_with_cuda_tpu.mesh.topology import face_bc_to_node_bc, promote_hex_mesh

__all__ = ["ExplicitOracle"]


def _jacobi_cg(A: sp.csr_matrix, b: np.ndarray, tol: float, maxiter: int):
    """Jacobi-preconditioned CG (mirrors MKL dcg with ipar[10]=1)."""
    d = A.diagonal()
    x = np.zeros_like(b)
    r = b - A @ x
    z = r / d
    p = z.copy()
    rz = r @ z
    bnorm = np.linalg.norm(b)
    if bnorm == 0.0:
        return x, 0
    for k in range(maxiter):
        if np.linalg.norm(r) <= tol * bnorm:
            return x, k
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        z = r / d
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x, maxiter


class ExplicitOracle:
    def __init__(self, deck: Deck, conv_stab: float = 0.0):
        self.deck = deck
        # Temam (div u0) Sv_i Sv_j stabilization coefficient — mirrors
        # SolverConfig.conv_stab (0.0 = reference behaviour; the ref's
        # implicit kernel hardcodes the same term to 0.0,
        # guermondQuartapelle.cpp:3864-3865)
        self.conv_stab = float(conv_stab)
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
            viscosity=deck.viscosity, density=deck.density, z_mode="product",
        )
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

        md = ops.Md.copy()
        self.md_orig_inv = 1.0 / md
        md[self.is_bc] = 1.0            # applyBC_Step1(1), :4129-4135
        self.md_inv = 1.0 / md

        Z = ops.Z.tocsr().copy()
        self.pin = deck.zero_pressure_node
        if self.pin >= 0:                 # applyBC_Step2(1), :4171-4180
            Z[self.pin, self.pin] *= 1000.0
        self.Z = Z
        self.ltog = mesh.ltog_node

    # ------------------------------------------------------------------
    def convection(self, u0: np.ndarray, uprev: np.ndarray) -> np.ndarray:
        """A(u0) @ uprev accumulated nodally (calculateMatrixA, :3608-3655)."""
        tab, ltog = self.tab, self.ltog
        u0e = u0[ltog]
        upe = uprev[ltog]
        u0gq = np.einsum("ki,eid->ekd", tab.Sv, u0e)
        udotg = np.einsum("ekd,ekjd->ekj", u0gq, tab.gDSv)
        if self.conv_stab:
            div0 = np.einsum("ekjd,ejd->ek", tab.gDSv, u0e)
            udotg = udotg + self.conv_stab * div0[:, :, None] * tab.Sv[None]
        conv = np.einsum("ekj,ejd->ekd", udotg, upe)
        r1e = np.einsum("ki,ek,ekd->eid", tab.Sv, tab.gq_factor, conv)
        out = np.zeros((self.nn, 3))
        np.add.at(out, ltog.ravel(), r1e.reshape(-1, 3))
        return out

    def initial_state(self):
        u = self.bc_vel.copy()
        p = np.zeros(self.nnp)
        return u, p, np.zeros_like(u)

    def time_step(self, un, pn, unp1_prev, *, cg_tol=1e-12, cg_maxiter=1000):
        """One time step with maxIter sub-iterations (timeLoop :2859-3040)."""
        deck = self.deck
        dt = deck.dt
        unp_half_prev = un.copy()
        pnp1_prev = pn.copy()
        k_acc_prev = np.zeros_like(un)
        unp1 = un
        pnp1 = pn
        iters = 0
        for it in range(1, deck.max_iter + 1):
            iters = it
            # step1 (:3712-3783)
            r1 = -(self.K @ unp_half_prev)
            r1 -= self.convection(un, unp_half_prev)
            for d in range(3):
                r1[:, d] -= self.G[d] @ pn
            r1[self.is_bc] = 0.0
            unp_half = un + dt * r1 * self.md_inv[:, None]

            # step2 (:3813-3893)
            dummy = unp_half / (dt * dt) - self.md_orig_inv[:, None] * k_acc_prev
            r2 = sum(self.Gt[d] @ dummy[:, d] for d in range(3))
            if self.pin >= 0:
                r2[self.pin] = 0.0
            pdot, _ = _jacobi_cg(self.Z, r2, cg_tol, cg_maxiter)
            pnp1 = pn + dt * pdot

            # step3 (:3917-3967)
            r3 = np.stack([-dt * (self.G[d] @ pdot) for d in range(3)], axis=1)
            r3 -= dt * k_acc_prev
            r3[self.is_bc] = 0.0
            acc = r3 * self.md_inv[:, None]
            unp1 = unp_half + dt * acc

            # convergence (:2936-2961)
            norm1 = np.linalg.norm(unp1 - unp1_prev) / np.linalg.norm(unp1)
            norm2 = np.linalg.norm(pnp1 - pnp1_prev) / np.linalg.norm(pnp1)
            if norm1 < deck.tolerance and norm2 < deck.tolerance:
                break
            unp_half_prev = unp_half
            unp1_prev = unp1
            pnp1_prev = pnp1
            k_acc_prev = self.K @ acc

        max_acc = np.abs(unp1 - un).max() / dt
        return unp1, pnp1, unp1_prev, max_acc, iters

    def run(self, n_steps: int, **kw):
        u, p, unp1_prev = self.initial_state()
        hist = []
        for _ in range(n_steps):
            u, p, unp1_prev, max_acc, iters = self.time_step(u, p, unp1_prev, **kw)
            hist.append((max_acc, iters))
        return u, p, hist
