"""Observability: phase wall-clock timers and the monitor table.

Replaces the reference's ``getHighResolutionTime``/``PRINT_TIMES`` ladder
(``blascoCodinaHuerta.cpp:4489-4518``, per-phase prints at :415-507 and the
per-step ``TimeSpend`` column :3084-3093) plus hooks into the jax profiler
for device-side traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

__all__ = ["PhaseTimer", "monitor_header", "monitor_row", "jax_trace"]


@dataclass
class PhaseTimer:
    """Accumulates named phase durations; prints like the reference."""

    verbose: bool = True
    phases: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            if self.verbose:
                print(f"{name:<24s} took {dt:9.3f} seconds.")

    def report(self) -> str:
        lines = [f"{k:<24s} {v:9.3f} s" for k, v in self.phases.items()]
        return "\n".join(lines)


def monitor_header() -> str:
    """The reference's monitor table header (:2855-2856)."""
    return (
        "Time step  Iter     Time       u_monitor     v_monitor     "
        "w_monitor     p_monitor     TimeSpend      maxAcc \n"
        + "-" * 109
    )


def monitor_row(step, iters, t, u, v, w, p, wall, max_acc) -> str:
    return (
        f"{step:6d}  {iters:6d}  {t:10.5f}  {u:12.5f}  {v:12.5f}  "
        f"{w:12.5f}  {p:12.5f} {wall:12.5f} {max_acc:12.5f}"
    )


@contextlib.contextmanager
def jax_trace(log_dir: str | None):
    """Optional jax profiler trace around a region (TPU timeline)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
