"""Tracing, timing, and profiling utilities.

The reference's observability is debug prints gated on an env flag plus
an unused `time.monotonic()` (SURVEY §5.1). Here the same env flags
(`MARKOV_TAPES_DEBUG` / `CKPE_DEBUG`) gate structured trace logging, and
two first-class tools are added:

- :func:`timed` / :class:`Timings` — lightweight wall-clock section
  timers with aggregate statistics (the compile/solve phases report
  through these when debug is on),
- :func:`device_profile` — context manager around ``jax.profiler.trace``
  producing a TensorBoard/XProf trace of the on-device kernels.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

from . import config


class Timings:
    """Accumulates named wall-clock sections."""

    def __init__(self):
        self._acc: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self._acc[name].append(time.monotonic() - t0)

    def stats(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "count": len(vals),
                "total_s": sum(vals),
                "mean_s": sum(vals) / len(vals),
                "max_s": max(vals),
            }
            for name, vals in self._acc.items()
        }

    def report(self) -> str:
        lines = [
            f"{name}: n={s['count']} total={s['total_s']:.3f}s "
            f"mean={s['mean_s']*1e3:.2f}ms max={s['max_s']*1e3:.2f}ms"
            for name, s in sorted(self.stats().items())
        ]
        return "\n".join(lines)


GLOBAL_TIMINGS = Timings()


@contextlib.contextmanager
def timed(name: str, timings: Timings | None = None):
    """Times a section into ``timings`` (default: the global table) and
    trace-logs it when debug is enabled."""
    t = timings or GLOBAL_TIMINGS
    t0 = time.monotonic()
    with t.section(name):
        yield
    if config.IS_DEBUG:
        print(f"[ckpe] {name}: {(time.monotonic() - t0)*1e3:.2f} ms")


def trace(msg: str) -> None:
    """Debug-gated trace print (the reference's `MARKOV_TAPES_DEBUG`
    behavior, `markov_tapes.py:38,62-71`)."""
    if config.IS_DEBUG:
        print(f"[ckpe] {msg}")


@contextlib.contextmanager
def device_profile(log_dir: str):
    """Captures an XProf/TensorBoard device trace of the enclosed block.

    Usage:
        with device_profile("/tmp/ckpe-trace"):
            ys = solve(...)  # traced kernels show up per-op
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
