"""TPU smoke of the converter-import route (VERDICT r4 #3): synthetic
Gambit .neu -> read_neu -> deck_from_mesh(quadratic=True) -> flagship
explicit solver, a few dozen steps on the real backend."""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    from test_converters import _write_neu

    from cfd_with_cuda_tpu.mesh.converters import deck_from_mesh, read_neu
    from cfd_with_cuda_tpu.mesh.generators import cube_hex_mesh
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import SolverConfig

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    coords, conn = cube_hex_mesh(n)
    lid = np.flatnonzero(np.isclose(coords[:, 2], 1.0))
    walls = np.flatnonzero(
        (np.isclose(coords, 0.0) | np.isclose(coords, 1.0)).any(axis=1)
        & ~np.isclose(coords[:, 2], 1.0)
    )
    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "cavity.neu"
        _write_neu(p, coords, conn, walls)
        c2, k2, groups = read_neu(p)
    groups["lid"] = lid
    deck = deck_from_mesh(
        c2, k2, groups,
        bc_table=[(1.0, (0.0, 0.0, 0.0)), (1.0, (1.0, 0.0, 0.0))],
        group_bc={"inlet": 0, "lid": 1},
        viscosity=0.1, quadratic=True,
    )
    # explicit diffusive stability: dt < h^2/(6 nu) on the fine grid
    # (h = 1/(2n) after Q2 promotion); 0.4x margin
    deck.dt = round(0.4 * (1.0 / (2 * n)) ** 2 / (6 * 0.1), 6)
    deck.t_final = 10.0
    deck.zero_pressure_node = 0
    deck.max_iter = 4
    deck.tolerance = 1e-3
    deck.convergence_criteria = 1e-6

    import jax

    t0 = time.time()
    solver = ExplicitBCHSolver(deck, SolverConfig(steps_per_chunk=25))
    setup = time.time() - t0
    t0 = time.time()
    state, hist = solver.run(n_steps=100)
    u, pr = solver.fields(state)
    h = hist[-1]
    print(
        f"platform={jax.devices()[0].platform} n={n}^3 structured="
        f"{solver.structured} banded_D="
        f"{len(solver.z_offs) if getattr(solver, 'z_offs', None) else None} "
        f"setup={setup:.0f}s run={(time.time()-t0)/100*1e3:.1f} ms/step "
        f"u_mon={h['u_mon']:+.5f} cg={int(h['cg_iters'])} "
        f"finite={bool(np.isfinite(u).all() and np.isfinite(pr).all())}",
        flush=True,
    )


if __name__ == "__main__":
    main()
