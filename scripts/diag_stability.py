"""Explicit-scheme stability margins: dt * lambda_max(Md^-1 K).

The explicit BCH step treats diffusion explicitly; the sub-iterations
are a Picard iteration whose iteration matrix is ~ -dt Md^-1 (K + A(u)),
so modes with dt*lambda > 1 diverge within sub-iterations and > ~2
destabilise even the plain forward-Euler predictor.  This prints the
margin for the diagnosis meshes and the reference's NE27000 deck.

Host-only (scipy); no TPU needed.
"""

import sys

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from cfd_with_cuda_tpu.fem.assembly import assemble_operators
from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.mesh.topology import promote_hex_mesh


def margins(deck, label):
    mesh = promote_hex_mesh(deck.conn, deck.coords)
    tab = build_element_tables(
        mesh.coords, mesh.ltog_node, etype=deck.etype,
        nenv=deck.nenv, nenp=deck.nenp, ngp=deck.ngp,
    )
    ops = assemble_operators(
        tab, mesh.ltog_node, mesh.nn, deck.nnp,
        viscosity=deck.viscosity, density=deck.density, z_mode="product",
    )
    K = ops.K_csr()
    Md = ops.Md
    # lambda_max of Md^-1 K  ==  max eig of  K x = lam Md x (symmetric)
    lam = spla.eigsh(
        K, k=1, M=sp.diags(Md), which="LA", return_eigenvectors=False,
        tol=1e-4, maxiter=5000,
    )[0]
    # where does the extreme mode live? Rayleigh-quotient proxy per node:
    diagK = K.diagonal()
    r = diagK / Md
    hot = np.argmax(r)
    x = mesh.coords
    print(f"{label}: NN={mesh.nn} nu={deck.viscosity} dt={deck.dt}")
    print(f"  lambda_max(MdInv K) = {lam:.1f}  ->  dt*lambda = {deck.dt*lam:.3f}")
    print(f"  max diag(K)/Md = {r[hot]:.1f} at node xyz="
          f"({x[hot,0]:.4f},{x[hot,1]:.4f},{x[hot,2]:.4f}); dt*diagratio = {deck.dt*r[hot]:.3f}")
    # convective scale: u=1 at lid, smallest fine spacing
    for d in range(3):
        us = np.unique(np.round(x[:, d], 10))
        print(f"  axis {d}: min fine spacing {np.diff(us).min():.5f} "
              f"max {np.diff(us).max():.5f}")
    return lam


if "--ne27000" in sys.argv:
    from cfd_with_cuda_tpu.io.deck import read_deck

    deck = read_deck(
        "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"
    )
    margins(deck, "NE27000 (reference deck)")
else:
    for N, cluster, dt in [(15, 2.0, 0.002), (15, 2.0, 0.001), (15, None, 0.002)]:
        deck = cavity_deck(N, cluster=cluster, viscosity=0.01, dt=dt, t_final=1.0)
        margins(deck, f"cavity {N}^3 cluster={cluster} dt={dt}")
