#!/usr/bin/env python
"""Measure per-solver-step wall time on-chip for each parity mode.

The reference races every solver mode for the SAME wall-clock timeout
(reference: src/ik_parallel.h:160-210), so a fair cross-mode success-rate
comparison must give each mode the step count its per-step cost affords.
This tool measures that cost directly: each mode solves the same
``B``-scenario batch at two step budgets on the production path
(fused engine for bio2-family modes, vmapped XLA otherwise) and the
per-step cost is the slope ``(t(hi) − t(lo)) / (hi − lo)`` — launch and
dispatch overhead cancels in the difference.

Writes ``tools/step_times.json`` (consumed by ``tools/parity_rates.py``
to derive wall-time-matched budgets) and prints one JSON line per mode.

Usage: ``python tools/bench_step_times.py`` (on the TPU chip).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import bio_ik_tpu.goals as G
from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.api import IKSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk

# Batch must be large enough that device compute dominates the ~25-30 ms
# tunneled-dispatch floor (at B=64 every mode times identically — pure
# RTT); the per-step RATIO between modes is what parity budgets need and
# it is batch-independent once compute-bound.
B = int(os.environ.get("STEP_TIME_BATCH", "4096"))
TIP = "r_gripper_tool_frame"
REPEATS = 3

# (mode, lo_steps, hi_steps): step counts chosen so the hi−lo difference
# is well above timing noise while keeping each timing ≲ seconds
MODES = [
    ("bio2_memetic", 16, 64),
    ("bio2", 16, 64),
    ("bio2_memetic_l", 16, 64),
    ("bio1", 8, 24),
    ("gd_c_4", 8, 24),
    ("gd_r_4", 8, 24),
    ("jac_4", 8, 24),
]


def make_batch(m, fk):
    rng = np.random.default_rng(42)
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"], size=(B, m.nvars)).astype(np.float32)
    return fk(jnp.asarray(qg))


def timed_solve(m, tg, mode, steps):
    cfg = SolverConfig(mode=mode, max_steps=steps, dtwist=1e-3)
    s = IKSolver(m, [G.PoseGoal(link=TIP)], cfg)
    data0 = s.make_data(jnp.asarray(m.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    s.solve_batch(keys, data).q.block_until_ready()  # compile + warm
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        s.solve_batch(keys, data).q.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ("fused" if s.engine is not None else "vmap")


def main():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    fk = jax.jit(make_fk(m, [TIP]))
    tg = make_batch(m, fk)

    out = {"batch": B, "device": str(jax.devices()[0]), "modes": {}}
    for mode, lo, hi in MODES:
        t_lo, path = timed_solve(m, tg, mode, lo)
        t_hi, _ = timed_solve(m, tg, mode, hi)
        per_step_ms = (t_hi - t_lo) / (hi - lo) * 1e3
        row = {
            "per_step_ms": round(per_step_ms, 4),
            "path": path,
            "t_lo_ms": round(t_lo * 1e3, 2),
            "t_hi_ms": round(t_hi * 1e3, 2),
            "lo": lo, "hi": hi,
        }
        out["modes"][mode] = row
        print(json.dumps({"mode": mode, **row}), flush=True)

    ref = out["modes"]["bio2_memetic"]["per_step_ms"]
    for mode, row in out["modes"].items():
        row["steps_per_memetic_step"] = round(
            ref / max(row["per_step_ms"], 1e-9), 3)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "step_times.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": path}), flush=True)


if __name__ == "__main__":
    main()
