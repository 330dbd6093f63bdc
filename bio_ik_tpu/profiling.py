"""Profiling / tracing utilities.

TPU-native counterpart of the reference's embedded sampling profiler
(reference: src/utils.h:134-317, FNPROFILER/BLOCKPROFILER scopes + a
random-sampling reader thread).  None of that mechanism ports — on TPU the
profiler of record is XLA's: :func:`trace` wraps a block in a
``jax.profiler`` trace whose dump is viewable in TensorBoard/Perfetto, and
:func:`annotate` provides named phase scopes (the FNPROFILER analog) that
show up inside those traces.

Quick phase timing without a trace viewer: :class:`PhaseTimer` measures
wall-clock of explicitly-synchronized device calls — the moral equivalent
of the reference's per-scope sample counts, printed as a ranking
(utils.h:286-303).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax

__all__ = ["trace", "annotate", "PhaseTimer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace of the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler traces (FNPROFILER analog)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Wall-clock phase accumulator with a reference-style ranking report
    (reference: Profiler report, utils.h:286-303)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            # synchronize so device work is attributed to this phase
            (jax.device_put(0.0) + 0).block_until_ready()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = ["p    time      calls  phase"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"{t / total:5.3f} {t:8.4f}s {self.counts[name]:6d}  {name}"
            )
        return "\n".join(lines)
