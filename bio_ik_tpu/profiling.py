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

__all__ = ["trace", "annotate", "PhaseTimer", "SolveStats"]


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


class SolveStats:
    """Rolling serving metrics for an :class:`bio_ik_tpu.api.IKSolver`.

    Observability analog of the reference's per-query ``counter`` logging
    (reference: ik_parallel.h:107, 263-266 logs iteration_count after
    each query) widened to the batched serving setting: query/success
    counts, solver steps, and wall time accumulate per call; ``summary``
    returns a metrics dict suitable for export.  Enabled by
    ``SolverConfig.counter`` — recording forces a device→host sync of
    the success/fitness buffers, so it is opt-in.
    """

    def __init__(self):
        self.queries = 0
        self.successes = 0
        self.batches = 0
        self.steps = 0
        self.wall_s = 0.0
        self.fitness_sum = 0.0

    def record(self, result, wall_s: float, steps: int) -> None:
        import numpy as np

        ok = np.atleast_1d(np.asarray(result.success))
        fit = np.atleast_1d(np.asarray(result.fitness))
        self.queries += int(ok.size)
        self.successes += int(ok.sum())
        self.batches += 1
        self.steps += int(steps)
        self.wall_s += float(wall_s)
        self.fitness_sum += float(fit.sum())

    def summary(self) -> Dict[str, float]:
        q = max(self.queries, 1)
        return {
            "queries": self.queries,
            "batches": self.batches,
            "success_rate": self.successes / q,
            "mean_fitness": self.fitness_sum / q,
            "mean_steps_per_call": self.steps / max(self.batches, 1),
            "wall_s": self.wall_s,
            "queries_per_sec": self.queries / max(self.wall_s, 1e-12),
        }

    def report(self) -> str:
        s = self.summary()
        return (f"{s['queries']} queries in {s['batches']} calls: "
                f"{100 * s['success_rate']:.1f} % success, "
                f"{s['queries_per_sec']:.0f} q/s, "
                f"mean fitness {s['mean_fitness']:.3e}")


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
