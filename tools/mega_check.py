#!/usr/bin/env python
"""Quick TPU validation + timing of the megastep engine path.

Not part of the test suite; run manually: ``python tools/mega_check.py``.
"""

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
from bio_ik_tpu.api import AdaptiveBatchSolver, IKSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk

B = int(os.environ.get("BENCH_BATCH", "4096"))
TIP = "r_gripper_tool_frame"


def main():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    fk = jax.jit(make_fk(m, [TIP]))
    rng = np.random.default_rng(0)
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"], size=(B, m.nvars)).astype(np.float32)
    tg = fk(jnp.asarray(qg))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    print(f"batch={B} device={jax.devices()[0]}")

    def mkdata(s):
        data0 = s.make_data(jnp.asarray(m.neutral_q()))
        data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
        data["primary"][0]["position"] = tg.pos
        data["primary"][0]["orientation"] = tg.quat
        return data

    def timed(s, data, label):
        res = s.solve_batch(keys, data)
        res.q.block_until_ready()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = s.solve_batch(keys, data)
            res.q.block_until_ready()
            times.append(time.perf_counter() - t0)
        dt = min(times)
        succ = float(np.asarray(res.success).mean())
        t2 = fk(res.q)
        perr = np.linalg.norm(
            np.asarray(t2.pos)[:, 0] - np.asarray(tg.pos)[:, 0], axis=-1)
        print(f"{label:40s} {dt*1e3:8.2f} ms  success {succ:.4f} "
              f"mederr {np.median(perr):.2e}  -> {B*succ/dt:,.0f} solves/s")
        return dt, succ

    for steps, spc in [(8, 8), (16, 16), (16, 4)]:
        cfg = SolverConfig(mode="bio2_memetic", max_steps=steps,
                           steps_per_check=spc, dtwist=1e-3, islands=1)
        s = IKSolver(m, [G.PoseGoal(link=TIP)], cfg)
        assert s.engine is not None and s.engine.fullstep
        timed(s, mkdata(s), f"mega x{steps} (spc={spc}, I=1)")

    cfg = SolverConfig(mode="bio2_memetic", dtwist=1e-3)
    s = AdaptiveBatchSolver(m, [G.PoseGoal(link=TIP)], cfg,
                            phases=((1, 8), (2, 32), (4, 64)),
                            chunk_fraction=0.25)
    timed(s, mkdata(s), "adaptive 1x8,2x32,4x64")


if __name__ == "__main__":
    main()
