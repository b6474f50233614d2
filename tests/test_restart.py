"""Checkpoint/resume: ``isRestart`` deck contract (ref
``blascoCodinaHuerta.cpp:2793-2799, 4214-4242``).

``run()`` must auto-load ``<title>_restart.dat`` from the deck directory
when the deck says ``isRestart``, and write that file at dump cadence.
The mid-run resume reproduces the uninterrupted trajectory up to the
restart file's round-off (%.11e text) and the re-seeded sub-iteration
history (the reference restart stores only u,v,w,p, so the first resumed
step re-converges its inner loop from scratch — same information loss).
"""

import dataclasses

import numpy as np
import pytest

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
from cfd_with_cuda_tpu.utils.config import SolverConfig


def _cfg():
    return SolverConfig(pressure_cg_tol=1e-12, steps_per_chunk=1)


@pytest.mark.parametrize(
    "solver_cls,rtol",
    [
        # implicit: the restart file has no p^{k-1}, so the resumed step's
        # pressure extrapolation 2p^k - p^{k-1} degrades to p^k — a ~2%
        # one-step transient (the reference restart loses the same state)
        (ExplicitBCHSolver, 2e-4),
        (ImplicitGQSolver, 5e-2),
    ],
)
def test_restart_roundtrip(solver_cls, rtol, tmp_path):
    deck = cavity_deck(5, viscosity=0.01, dt=2e-3, t_final=1.0)
    deck.title = "cavity_rt"
    deck.source_path = str(tmp_path / "cavity_rt.inp")

    # uninterrupted: 6 steps
    s = solver_cls(deck, _cfg())
    _, hist_full = s.run(n_steps=6)

    # interrupted: 3 steps, dump (which writes <title>_restart.dat), then a
    # fresh solver with isRestart resumes for 3 more
    s1 = solver_cls(deck, _cfg())
    state, _ = s1.run(n_steps=3, tecplot_path=tmp_path / "out.dat")
    assert (tmp_path / "cavity_rt_restart.dat").exists()

    deck2 = dataclasses.replace(deck, is_restart=True)
    s2 = solver_cls(deck2, _cfg())
    _, hist_resumed = s2.run(n_steps=3)

    u_full = [h["u_mon"] for h in hist_full[3:]]
    u_res = [h["u_mon"] for h in hist_resumed]
    np.testing.assert_allclose(u_res, u_full, rtol=rtol, atol=1e-7)


def test_restart_missing_file_raises(tmp_path):
    deck = cavity_deck(4, viscosity=0.01, dt=2e-3, t_final=1.0)
    deck.title = "nowhere"
    deck.source_path = str(tmp_path / "nowhere.inp")
    deck.is_restart = True
    s = ExplicitBCHSolver(deck, _cfg())
    with pytest.raises(FileNotFoundError):
        s.run(n_steps=1)


def test_deck_source_path_recorded(tmp_path):
    """read_deck stamps provenance so restart_path anchors correctly."""
    from cfd_with_cuda_tpu.io.deck import read_deck, write_fractional_deck

    deck = cavity_deck(3, viscosity=0.01, dt=1e-3, t_final=0.01)
    p = tmp_path / "gen.inp"
    write_fractional_deck(p, deck)
    d2 = read_deck(p)
    assert d2.source_path == str(p)
