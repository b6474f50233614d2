"""The command-line driver: the reference's ProblemName.txt workflow."""

import re

import numpy as np

from cfd_with_cuda_tpu.__main__ import _resolve_deck, main
from cfd_with_cuda_tpu.io.deck import write_fractional_deck
from cfd_with_cuda_tpu.mesh.generators import cavity_deck


def make_problem_dir(tmp_path):
    deck = cavity_deck(3, viscosity=0.01, dt=0.001, t_final=0.01)
    write_fractional_deck(tmp_path / "tinyCavity.inp", deck)
    (tmp_path / "ProblemName.txt").write_text("tinyCavity\n")
    return tmp_path


def test_resolve_deck(tmp_path):
    make_problem_dir(tmp_path)
    assert _resolve_deck(str(tmp_path)).name == "tinyCavity.inp"
    assert (
        _resolve_deck(str(tmp_path / "ProblemName.txt")).name
        == "tinyCavity.inp"
    )
    assert (
        _resolve_deck(str(tmp_path / "tinyCavity.inp")).name
        == "tinyCavity.inp"
    )


def test_cli_run_and_restart_roundtrip(tmp_path):
    """Run via ProblemName.txt; products appear under the reference
    names; flipping isRestart resumes from the written checkpoint."""
    d = make_problem_dir(tmp_path)
    rc = main([str(d), "--quiet", "--chunk", "5", "--steps", "10"])
    assert rc == 0
    dat = d / "tinyCavity.dat"
    restart = d / "tinyCavity_restart.dat"
    assert dat.exists() and restart.exists()
    rows = np.loadtxt(dat, skiprows=3, max_rows=343)
    assert np.isfinite(rows).all()

    inp = d / "tinyCavity.inp"
    inp.write_text(
        re.sub(r"(isRestart\s*:\s*)0", r"\g<1>1", inp.read_text(), count=1)
    )
    rc = main([str(d), "--quiet", "--chunk", "5", "--steps", "5"])
    assert rc == 0


def test_resolve_deck_missing_pointer_names_the_problem(tmp_path):
    from cfd_with_cuda_tpu.__main__ import _resolve_deck

    out = _resolve_deck(str(tmp_path))
    assert "<missing-ProblemName.txt>" in out.name
    (tmp_path / "ProblemName.txt").write_text("")
    out = _resolve_deck(str(tmp_path))
    assert "<empty-ProblemName.txt>" in out.name
