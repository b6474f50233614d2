"""Physical validation: cavity centerline profiles vs Ghia et al. (1982).

Two layers (VERDICT r1 item 2 — round 1 had only self-consistency vs
builder-written oracles, no external ground truth):

* a fast check of the STORED converged profiles (written by
  ``scripts/validate_cavity.py`` from a steady-state TPU run of the
  reference NE27000 deck) against the Ghia tables inside the documented
  3-D mid-plane band;
* a short coarse-mesh smoke run asserting the transient is heading into
  physically sane territory (signs, magnitudes, monotone spin-up).
"""

from pathlib import Path

import numpy as np
import pytest

from cfd_with_cuda_tpu.validation.ghia1982 import (
    BAND_3D,
    GHIA_U,
    GHIA_V,
    centerline_profiles,
    check_against_ghia,
)

DATA = Path(__file__).resolve().parents[1] / "cfd_with_cuda_tpu" / "validation" / "data"


def _stored(re, tag="explicit"):
    p = DATA / f"cavity_re{re}_{tag}.npz"
    if not p.exists():
        pytest.skip(f"{p.name} not generated yet (scripts/validate_cavity.py)")
    return np.load(p)


def test_stored_re100_profiles_within_ghia_band():
    """Canonical validation: the IMPLICIT integrator's converged NE27000
    fixed point (docs/VALIDATION.md — the explicit scheme's long-horizon
    limit cycle is characterized separately below)."""
    d = _stored(100, "implicit")
    err_u, err_v = check_against_ghia(d["z"], d["u_x"], d["x"], d["u_z"], re=100)
    assert err_u < BAND_3D, err_u
    assert err_v < BAND_3D, err_v
    # profile SHAPE must track Ghia tightly, not just sit inside the band:
    # correlation over the sample points
    u_i = np.interp(GHIA_U[:, 0], d["z"], d["u_x"])
    v_i = np.interp(GHIA_V[:, 0], d["x"], d["u_z"])
    assert np.corrcoef(u_i, GHIA_U[:, 1])[0, 1] > 0.995
    assert np.corrcoef(v_i, GHIA_V[:, 1])[0, 1] > 0.99
    # center-monitor value at the 2-D Ghia centerline reading
    assert abs(float(d["u_mon"]) - (-0.20581)) < 0.02


def test_stored_re100_was_steady():
    """Steadiness by monitor drift: the saturated near-lid oscillation
    (docs/VALIDATION.md) keeps max_acc pinned well above the deck's 1e-6
    criterion, so the monitor trend is the usable steadiness signal."""
    d = _stored(100, "implicit")
    assert d["drift_per_kstep"] < 5e-5, (
        "stored profile is still drifting: "
        f"{float(d['drift_per_kstep']):.2e} per 1000 steps"
    )


def test_stored_re100_explicit_documented_behavior():
    """The explicit artifact records the honest reference-parity t=250
    state: profile SHAPE right (the flow is the cavity vortex), magnitude
    eroded by the documented limit-cycle drift — within the documented
    envelope, NOT presented as a pass (docs/VALIDATION.md)."""
    d = _stored(100, "explicit")
    err_u, err_v = check_against_ghia(d["z"], d["u_x"], d["x"], d["u_z"], re=100)
    # documented erosion envelope (band 0.06 < err < 0.25)
    assert err_u < 0.25 and err_v < 0.25, (err_u, err_v)
    u_i = np.interp(GHIA_U[:, 0], d["z"], d["u_x"])
    assert np.corrcoef(u_i, GHIA_U[:, 1])[0, 1] > 0.99
    doc = Path(__file__).resolve().parents[1] / "docs" / "VALIDATION.md"
    assert doc.exists() and "limit cycle" in doc.read_text()


def test_stored_re100_explicit_stabilized_measured_envelope():
    """Temam stabilization (conv_stab=0.5 — the divergence correction
    the reference's implicit kernel carries hardcoded to 0.0,
    guermondQuartapelle.cpp:3864-3865) does NOT rescue the explicit
    scheme's saturated-oscillation erosion at the canonical deck: the
    quiet-regime mechanism the 15^3 oracle validated
    (diag_oracle_drift_stab0.5.npz holds to 1.5e-5) does not transfer
    to the f32 NE27000 deck, where rounding noise keeps the near-lid
    mode saturated (docs/VALIDATION.md round 5).  This pins the
    MEASURED 100k-step envelope (seeded at the implicit steady state)
    as characterization, exactly like the plain-explicit artifact —
    if stabilization starts holding, the docs must change."""
    d = _stored(100, "explicit_stab")
    assert int(d["steps"]) >= 50_000, int(d["steps"])
    err_u, err_v = check_against_ghia(d["z"], d["u_x"], d["x"], d["u_z"], re=100)
    # measured at 100k steps: err 0.082/0.054 — profile still SHAPED
    # right, magnitude eroding within the documented envelope
    assert err_u < 0.15 and err_v < 0.15, (err_u, err_v)
    u_i = np.interp(GHIA_U[:, 0], d["z"], d["u_x"])
    assert np.corrcoef(u_i, GHIA_U[:, 1])[0, 1] > 0.99
    # still drifting at the measured rate (measured 3.6e-4/kstep; the
    # oscillation stays saturated) — NOT a hold
    assert 5e-5 < float(d["drift_per_kstep"]) < 1e-3
    doc = (
        Path(__file__).resolve().parents[1] / "docs" / "VALIDATION.md"
    ).read_text()
    assert "does not transfer" in doc


def test_stored_re1000_measured_envelope():
    """Re=1000 refined-cavity long-horizon run (implicit, 56^3 clustered
    — the lidDrivenCavity_NE85000/125000-class refinement the
    reference's stripped decks targeted).  MEASURED behaviour, round 5:
    the plain-Galerkin convection operator (the reference's own
    discretization — no SUPG anywhere in the fractional-step solvers,
    ``calculateMatrixA`` blascoCodinaHuerta.cpp:3520-3685) sits at
    interior cell-Peclet u*h/nu ~ 15-25 on the 40^3-56^3 meshes and
    sustains a bounded dispersive limit cycle instead of the steady
    state (which exists physically: the cubic cavity's first instability
    is at Re ~ 1900, Feldman & Gelfgat 2010).  This test pins that
    measured envelope: mean-flow STRUCTURE matches Ghia (correlation),
    amplitudes sit within the oscillation band, the state is neither
    frozen (the round-5 warm-start bug) nor divergent.  docs/VALIDATION.md
    "Re=1000" section carries the full dossier."""
    d = _stored(1000, "implicit")
    assert int(d["steps"]) >= 30_000
    for k in ("u_x", "u_z"):
        assert np.isfinite(d[k]).all()
    err_u, err_v = check_against_ghia(d["z"], d["u_x"], d["x"], d["u_z"], re=1000)
    # instantaneous snapshot of the limit cycle: bounded, structure right
    assert err_u < 0.35, err_u
    assert err_v < 0.40, err_v
    u_i = np.interp(GHIA_U[:, 0], d["z"], d["u_x"])
    v_i = np.interp(GHIA_V[:, 0], d["x"], d["u_z"])
    assert np.corrcoef(u_i, GHIA_U[:, 2])[0, 1] > 0.90
    assert np.corrcoef(v_i, GHIA_V[:, 2])[0, 1] > 0.90
    # oscillating, not frozen (max_acc==0.0 was the freeze signature)
    # and not diverging
    assert 0.05 < float(d["max_acc"]) < 5.0, float(d["max_acc"])
    doc = (
        Path(__file__).resolve().parents[1] / "docs" / "VALIDATION.md"
    ).read_text()
    assert "cell-Peclet" in doc


@pytest.mark.slow  # ~8 min on the 1-core CPU host (600-step run)
def test_cavity_smoke_physics():
    """600 coarse-mesh steps: lid drives +x flow near the top, return flow
    below the center, w down near the right wall — the cavity vortex is
    forming with the right orientation."""
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = cavity_deck(8, viscosity=0.01, dt=0.01, t_final=10.0)
    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6, steps_per_chunk=50,
    )
    s = ExplicitBCHSolver(deck, cfg)
    state, hist = s.run(n_steps=600)
    u, p = s.fields(state)
    coords = s.mesh.coords
    z, u_x, x, u_z = centerline_profiles(coords, u)
    assert np.isfinite(u).all()
    # near-lid u strongly positive, below-center u negative (return flow)
    assert u_x[-2] > 0.3, u_x[-2]
    assert u_x[len(u_x) // 2] < -0.05, u_x[len(u_x) // 2]
    # downward flow near the right wall at mid-height
    assert u_z[-2] < -0.05, u_z[-2]
    # rough band vs Ghia on the still-developing field
    err_u, err_v = check_against_ghia(z, u_x, x, u_z, re=100)
    assert err_u < 0.25 and err_v < 0.25, (err_u, err_v)


def test_stored_precision_parity_ne27000():
    """f32 / MIXED vs f64 on the canonical NE27000 deck (100 steps,
    stored by scripts/precision_parity.py on TPU): the speed policies
    track the reference-precision run — monitor trace to ~1e-6,
    fieldwise to sub-percent of the velocity scale (VERDICT r3 #2 /
    r4 #2 artifact).  The reference is f64 throughout
    (blascoCodinaHuerta.cpp:130-134); f32 is this framework's speed
    mode and MIXED its compensated-reduction middle ground."""
    path = (
        Path(__file__).resolve().parents[1]
        / "cfd_with_cuda_tpu" / "validation" / "data"
        / "precision_ne27000.npz"
    )
    d = np.load(path)
    ref_u = d["f64_u"]
    scale = np.abs(ref_u).max()
    for pol in ("f32", "mixed"):
        du_mon = np.max(np.abs(d[f"{pol}_u_mon"] - d["f64_u_mon"]))
        dfield = np.max(np.abs(d[f"{pol}_u"] - ref_u)) / scale
        assert du_mon < 1e-5, (pol, du_mon)
        assert dfield < 1e-2, (pol, dfield)
    # all three ran on real hardware
    for pol in ("f32", "mixed", "f64"):
        assert str(d[f"{pol}_platform"]) in ("tpu", "axon"), pol
