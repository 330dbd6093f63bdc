#!/usr/bin/env python
"""Phase-cost breakdown of the bio2 solve on the real TPU chip.

Times solve_batch for solver variants that isolate the evolution /
memetic / eval phases, to direct kernel-fusion work.  Not part of the
test suite; run manually: ``python tools/bench_profile.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import bio_ik_tpu.goals as G
from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.api import IKSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk

B = int(os.environ.get("BENCH_BATCH", "4096"))
TIP = "r_gripper_tool_frame"


def timed(s, keys, data, label):
    res = s.solve_batch(keys, data)
    res.q.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = s.solve_batch(keys, data)
        res.q.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    succ = float(np.asarray(res.success).mean())
    print(f"{label:42s} {dt*1e3:9.1f} ms  success {succ:.4f}")
    return dt


def main():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    fk = jax.jit(make_fk(m, [TIP]))
    rng = np.random.default_rng(0)
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"], size=(B, m.nvars)).astype(np.float32)
    tg = fk(jnp.asarray(qg))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def make(mode, steps, islands=1):
        cfg = SolverConfig(mode=mode, max_steps=steps, islands=islands, dtwist=1e-3)
        s = IKSolver(m, [G.PoseGoal(link=TIP)], cfg)
        data0 = s.make_data(jnp.asarray(m.neutral_q()))
        data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
        data["primary"][0]["position"] = tg.pos
        data["primary"][0]["orientation"] = tg.quat
        return s, data

    print(f"batch={B} device={jax.devices()[0]}")
    for mode, steps in [
        ("bio2_memetic", 1),
        ("bio2_memetic", 2),
        ("bio2_memetic", 4),
        ("bio2_memetic", 8),
        ("bio2", 8),            # no memetic phase (16 gens though)
        ("gd", 8),              # exact-FK-only baseline shape
    ]:
        s, data = make(mode, steps)
        timed(s, keys, data, f"{mode} x{steps}")


if __name__ == "__main__":
    main()
