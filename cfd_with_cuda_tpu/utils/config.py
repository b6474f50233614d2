"""Solver configuration: one dataclass replacing the reference's flag zoo.

The reference scatters configuration over three tiers (SURVEY.md §5):
``ProblemName.txt`` -> deck name, `.inp` header -> physics/numerics, and
compile-time ``-D`` flags -> precision & solver backend selection
(``blascoCodinaHuerta.cpp:130-134``, ``segregatedSolver.cpp:14-21``).
Here everything is a runtime field on :class:`SolverConfig`.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

__all__ = ["DTypePolicy", "SolverConfig"]


class DTypePolicy(str, enum.Enum):
    """Precision policy (supersedes the reference's ``-DSINGLE``).

    * ``F64``   — double everywhere (reference parity; needs jax x64).
    * ``F32``   — single everywhere (TPU speed mode).
    * ``MIXED`` — f32 state/operators, f64 Krylov reductions.
    """

    F64 = "f64"
    F32 = "f32"
    MIXED = "mixed"

    @property
    def state_dtype(self):
        return np.float64 if self is DTypePolicy.F64 else np.float32

    @property
    def reduce_dtype(self):
        return np.float32 if self is DTypePolicy.F32 else np.float64


@dataclasses.dataclass
class SolverConfig:
    """Runtime knobs common to all solvers."""

    dtype_policy: DTypePolicy = DTypePolicy.F64
    # Pressure-Poisson CG (ref MKL dcg: tol 1e-12 / maxit 1000, Jacobi;
    # blascoCodinaHuerta.cpp:4013-4018).
    pressure_cg_tol: float = 1e-12
    pressure_cg_maxiter: int = 1000
    # Momentum BiCGStab (ref Paralution: abs 1e-15 / rel 1e-6 / maxit 1000;
    # guermondQuartapelle.cpp:4210-4213).
    momentum_tol: float = 1e-6
    momentum_abs_tol: float = 1e-15
    momentum_maxiter: int = 1000
    # Pressure pin LARGE-number trick (ref :4167-4180).
    pressure_pin_large: float = 1000.0
    # Linear-solver backend name: "cg", "cr", "bicg", "bicgstab", "gmres".
    momentum_solver: str = "bicgstab"
    pressure_solver: str = "cg"
    gmres_restart: int = 100
    # Pressure-CG preconditioner: "auto" uses the geometric-multigrid
    # V-cycle whenever the structured fast path is active (~51 -> ~7
    # Jacobi-CG iterations on the NE27000 cavity; ops/multigrid.py) and
    # Jacobi otherwise; "mg" / "jacobi" force a choice ("mg" on an
    # unstructured mesh raises).  The reference only ever precondition
    # with Jacobi (blascoCodinaHuerta.cpp:4013-4018, CUDAcodes.cu:437).
    pressure_precond: str = "auto"
    # Pressure-solve backend: "auto" uses the fused Pallas CG kernel
    # (ops/pallas_cg.py — one op per CG iteration, measured ~9x per
    # iteration vs the XLA body) when the structured path is active on a
    # single TPU chip; "xla" forces the lax.while_loop CG; "pallas"
    # forces the fused kernel (interpret mode off-TPU — slow, for
    # tests).  F64 storage always takes the XLA path (TPU f64 is
    # emulated and unsupported in Mosaic kernels); MIXED runs the fused
    # kernel with double-single compensated dots (dot_mode="compensated")
    # standing in for the f64 reductions.
    pressure_backend: str = "auto"
    # Stream only the dq >= 0 half of the SYMMETRIC Z window in the
    # fused CG, applying each positive offset both ways in-kernel:
    # halves the dominant per-iteration HBM traffic (125 -> 63 slots at
    # radius 2).  Exact-equality tested vs the full kernel
    # (tests/test_pallas_cg.py); opt-in pending an on-TPU A/B of the
    # extra in-register lane shifts vs the saved DMA bytes.
    pressure_cg_sym: bool = False
    # Run the ENTIRE pressure CG (init + iteration loop + convergence)
    # as ONE pallas_call with the lax.while_loop INSIDE the kernel
    # (ops/pallas_cg._cg_solve_kernel): iterate vectors never leave
    # VMEM and the loop carry is scalar-only, removing the measured
    # ~100 us/iteration dispatch + while-carry cost of the
    # one-call-per-iteration variant (docs/PERF.md round 4) and the
    # unroll quantization of iteration counts.  False = the
    # per-iteration kernel under an XLA while_loop.
    pressure_cg_fuse_loop: bool = False
    # Warm-start the pressure CG from the previous sub-iteration's pdot
    # (x0=0 matches the reference's MKL/CUSP solvers exactly, so this
    # defaults off).  The convergence bound stays relative to ||b||, so
    # the solution quality contract is unchanged — only the iteration
    # count drops.  Fused-Pallas path only.
    pressure_warm_start: bool = False
    # With pressure_warm_start: seed each step's FIRST pressure solve
    # from the linear extrapolation 2*pdot - pdot(previous step) instead
    # of the last pdot — carries the step-to-step trend of the pressure
    # rate.  Same ||b||-relative bound; only the iteration count changes.
    pressure_warm_extrap: bool = False
    # Warm-start the implicit integrator's solves: momentum BiCGStab from
    # u^k (the unknown changes O(dt) per step) and the pressure-increment
    # CG from the previous step's increment.  Same relative-to-||b||
    # stopping bounds, so the solution contract is unchanged — only the
    # iteration counts drop.  Off = the reference's zero initial guesses.
    implicit_warm_start: bool = True
    # Convection treatment on the fused Pallas path.  "auto" (default):
    # on the PARITY layout, stream A(un) as 729 per-pair weight planes
    # through the K parity_apply kernel (second weight table) so (K+A) u
    # is ONE all-Pallas op per sub-iteration — measured 4.7 vs 10.4
    # ms/step at NE27000 against the matrix-free form, whose XLA
    # gather/matvec/scatter ops poison the schedule next to the fused
    # CG; matrix-free elsewhere.  "matrix-free" forces the elemental
    # A_e(un) gather -> batched matvec -> scatter per sub-iteration.
    # "assemble"/"planes" force the assembled/planes form (on the
    # interleaved layout "assemble" scatters A_e into K's DIA rows —
    # one stencil apply, ~9 ms/step of dilated-pad assembly).
    conv_mode: str = "auto"
    # Coefficient of the (div u0) * Sv_i * Sv_j Temam stabilization term
    # added to the convection matrix.  The reference's implicit kernel
    # carries exactly this term HARDCODED TO 0.0
    # (``guermondQuartapelle.cpp:3864-3865``), so 0.0 is reference
    # behaviour; 0.5 makes the discrete convection operator
    # skew-symmetric up to boundary terms, removing the energy bias that
    # drives the explicit scheme's documented long-horizon drift
    # (docs/VALIDATION.md) — a capability EXTENSION, not a parity item.
    conv_stab: float = 0.0
    # CG iterations per convergence check in the fused Pallas solver
    # (the scalar check between while-loop trips stalls the pipeline for
    # about one kernel body).  Iteration counts round up to a multiple.
    pressure_cg_unroll: int = 4
    # Structured-grid DIA fast path: "auto" detects box-grid decks and
    # replaces gather-bound ELL SpMV with shift+FMA stencils; "never"
    # forces ELL; "force" errors if the mesh is not a box grid.
    structured: str = "auto"
    # Field layout on the structured fused-Pallas path: "auto" stores
    # fields CLASS-MAJOR (parity-split red-black, ops/parity_stencil.py)
    # whenever the fused path is active on a single chip with
    # element-structured convection — every stride-2 gather/scatter/
    # embed becomes a contiguous slice and the G/K window tables compact
    # to their structural-nonzero count (grad 340 -> 46 MB, K 113 -> ~63
    # MB per apply at NE27000).  "interleaved" keeps the flat z-major
    # fine-grid layout; "parity" forces class-major (raises when the
    # prerequisites are missing).  Results are equal to the interleaved
    # path up to f32 accumulation order.
    structured_layout: str = "auto"
    # Multi-chip SPMD over the Pallas fast path: >1 shards the windowed
    # stencil applies over an n-device mesh via shard_map (flat halo
    # ppermutes; parallel/sharded_stencil.py) and runs the coarse-grid
    # pressure CG replicated.  0 = single-device kernels; 1 = explicit
    # opt-in that runs the shard_map machinery on a 1-device mesh (for
    # measuring the SPMD path's per-chip cost).  The legacy
    # GSPMD path (pure-XLA ops sharded by annotation alone) remains the
    # fallback whenever the fused path is ineligible.
    spmd_devices: int = 0
    # Steps fused into one jitted device loop (0/1 = one step per dispatch).
    steps_per_chunk: int = 10
    # Pad the fine-grid axis to a multiple of this (structured path only):
    # sharded device_put requires the sharded axis divisible by the mesh
    # size, and odd box grids ((2n+1)^3) never are.  Padding slots carry
    # zero operator values, so results are bit-identical.
    shard_pad: int = 1
    # On-disk setup cache: "auto" -> $CFD_TPU_CACHE_DIR or <repo>/.cache/
    # setup; a path -> that dir; None -> disabled (tests default to this
    # via conftest to avoid stale-snapshot surprises).
    setup_cache: str | None = None
    # Print per-step monitor rows like the reference's monitor table.
    verbose: bool = False

    def setup_cache_dir(self) -> str | None:
        if self.setup_cache == "auto":
            from cfd_with_cuda_tpu.utils.setup_cache import default_cache_dir

            return default_cache_dir()
        if self.setup_cache in (None, "", "off", "none", "0"):
            # "off"/"none" read as intent to disable, not as a directory
            # literally named "off" (which one test accidentally created)
            return None
        return self.setup_cache

    def jnp_dtype(self):
        import jax.numpy as jnp

        return jnp.float64 if self.dtype_policy is DTypePolicy.F64 else jnp.float32

    def fused_pressure_eligible(self) -> bool:
        """True when the fused Pallas pressure path (ops/pallas_cg.py +
        ops/pallas_stencil.py) should be used on a structured mesh:
        plain-f32 dots and either forced ("pallas") or auto on a
        single-TPU backend.  Also controls the setup-time decision to
        pre-pad structured device arrays to the Pallas block multiple
        (2048) so kernel calls skip their 340 MB weight pads."""
        import jax
        import jax.numpy as jnp

        if self.pressure_backend == "xla":
            return False
        if self.pressure_precond == "mg":
            # the fused kernel is Jacobi-only: honour an explicit MG
            # request by routing to the XLA CG + V-cycle path instead of
            # silently ignoring the preconditioner choice
            return False
        if self.jnp_dtype() != jnp.float32:
            return False        # F64 storage: XLA path (TPU f64 is emulated)
        # MIXED (f32 storage + f64 Krylov reductions) IS eligible: the
        # fused kernel runs its dots in double-single arithmetic
        # (ops.pallas_cg dot_mode="compensated"), the TPU-native
        # equivalent of the XLA path's f64 accumulation.
        if self.pressure_backend == "pallas":
            return True
        if jax.config.jax_enable_x64 and jax.default_backend() == "tpu":
            # under x64, python int literals trace as i64 inside kernels
            # and Mosaic rejects them (index maps, DMA slices); interpret
            # mode off-TPU is unaffected.  pressure_backend="pallas"
            # above force-overrides for hardware verification.
            return False
        if jax.default_backend() != "tpu":
            return False
        # multi-chip: eligible when the sharded fast path is configured
        # for exactly the visible device count (shard_map kernels +
        # replicated pressure CG); otherwise single-chip only
        if jax.device_count() > 1:
            return self.spmd_devices == jax.device_count()
        return True

    def krylov_dot_dtype(self):
        """f64 accumulation dtype for Krylov inner products under the
        MIXED policy (f32 state + f64 reductions, SURVEY §7); None
        otherwise.  Needs jax x64 enabled — without it the casts silently
        truncate back to f32 (jax emits a UserWarning)."""
        import jax.numpy as jnp

        return jnp.float64 if self.dtype_policy is DTypePolicy.MIXED else None
