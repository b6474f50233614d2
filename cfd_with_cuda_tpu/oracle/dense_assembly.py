"""Independent dense loop-nest assembly oracle (tests only).

A deliberately naive, loop-for-loop transcription of the reference's
elemental integrals (``step0`` at ``blascoCodinaHuerta.cpp:3190-3229``,
``calculateMatrixA`` at ``:3608-3629``, ``calculateZ`` direct assembly at
``guermondQuartapelle.cpp:3604-3623``) into *dense* global matrices.  It
shares no code with the vectorised production path, so agreement on tiny
meshes validates both the einsums and the sparse scatter maps — the same
role the MATLAB implementation played for the reference (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

from cfd_with_cuda_tpu.fem.jacobian import ElementTables

__all__ = ["dense_mass", "dense_stiffness", "dense_gradient", "dense_convection",
           "dense_pressure_laplacian"]


def dense_mass(tab: ElementTables, ltog: np.ndarray, nn: int) -> np.ndarray:
    ne, nen = ltog.shape
    ngp = tab.Sv.shape[0]
    M = np.zeros((nn, nn))
    for e in range(ne):
        for k in range(ngp):
            gq = tab.det_jacob[e][k] * tab.weights[k]
            for i in range(nen):
                for j in range(nen):
                    M[ltog[e][i], ltog[e][j]] += tab.Sv[k][i] * tab.Sv[k][j] * gq
    return M


def dense_stiffness(
    tab: ElementTables, ltog: np.ndarray, nn: int, viscosity: float
) -> np.ndarray:
    ne, nen = ltog.shape
    ngp = tab.Sv.shape[0]
    K = np.zeros((nn, nn))
    for e in range(ne):
        for k in range(ngp):
            gq = tab.det_jacob[e][k] * tab.weights[k]
            for i in range(nen):
                for j in range(nen):
                    K[ltog[e][i], ltog[e][j]] += (
                        viscosity
                        * (
                            tab.gDSv[e][k][i][0] * tab.gDSv[e][k][j][0]
                            + tab.gDSv[e][k][i][1] * tab.gDSv[e][k][j][1]
                            + tab.gDSv[e][k][i][2] * tab.gDSv[e][k][j][2]
                        )
                        * gq
                    )
    return K


def dense_gradient(
    tab: ElementTables, ltog: np.ndarray, nn: int, nnp: int, density: float
) -> np.ndarray:
    """G (3, NN, NNp)."""
    ne, nen = ltog.shape
    nenp = tab.Sp.shape[1]
    ngp = tab.Sv.shape[0]
    G = np.zeros((3, nn, nnp))
    for e in range(ne):
        for k in range(ngp):
            gq = tab.det_jacob[e][k] * tab.weights[k]
            for i in range(nen):
                for j in range(nenp):
                    for d in range(3):
                        G[d, ltog[e][i], ltog[e][j]] += (
                            -(1.0 / density) * tab.Sp[k][j] * tab.gDSv[e][k][i][d] * gq
                        )
    return G


def dense_convection(
    tab: ElementTables, ltog: np.ndarray, nn: int, u0: np.ndarray
) -> np.ndarray:
    """A(u0) (NN, NN): Ae[i,j] = sum_k (u0.grad Sv_j) Sv_i |J| w."""
    ne, nen = ltog.shape
    ngp = tab.Sv.shape[0]
    A = np.zeros((nn, nn))
    for e in range(ne):
        u0n = u0[ltog[e]]  # (nen, 3)
        for k in range(ngp):
            gq = tab.det_jacob[e][k] * tab.weights[k]
            ug = np.zeros(3)
            for i in range(nen):
                ug += tab.Sv[k][i] * u0n[i]
            for i in range(nen):
                for j in range(nen):
                    A[ltog[e][i], ltog[e][j]] += (
                        (
                            ug[0] * tab.gDSv[e][k][j][0]
                            + ug[1] * tab.gDSv[e][k][j][1]
                            + ug[2] * tab.gDSv[e][k][j][2]
                        )
                        * tab.Sv[k][i]
                        * gq
                    )
    return A


def dense_pressure_laplacian(
    tab: ElementTables, ltog_p: np.ndarray, nnp: int
) -> np.ndarray:
    """Z (NNp, NNp) = -int grad Sp . grad Sp (implicit-solver convention)."""
    ne, nenp = ltog_p.shape
    ngp = tab.Sp.shape[0]
    Z = np.zeros((nnp, nnp))
    for e in range(ne):
        for k in range(ngp):
            gq = tab.det_jacob[e][k] * tab.weights[k]
            for i in range(nenp):
                for j in range(nenp):
                    Z[ltog_p[e][i], ltog_p[e][j]] -= (
                        tab.gDSp[e][k][i][0] * tab.gDSp[e][k][j][0]
                        + tab.gDSp[e][k][i][1] * tab.gDSp[e][k][j][1]
                        + tab.gDSp[e][k][i][2] * tab.gDSp[e][k][j][2]
                    ) * gq
    return Z
