#!/usr/bin/env python
"""Sweep adaptive phase budgets/fractions for throughput at fixed success.

Manual tool; writes one line per variant.
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
from bio_ik_tpu.api import AdaptiveBatchSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk

TIP = "r_gripper_tool_frame"
B = int(os.environ.get("BENCH_BATCH", "16384"))
K = 8

VARIANTS = [
    ("cur (2,24)(4,48) f=.30/.05", ((1, 16), (2, 24), (4, 48)), (0.3, 0.05)),
    ("E (2,16)(4,48) f=.30/.05  ", ((1, 16), (2, 16), (4, 48)), (0.3, 0.05)),
    ("F (2,20)(4,40) f=.30/.04  ", ((1, 16), (2, 20), (4, 40)), (0.3, 0.04)),
    ("G (2,24)(4,48) f=.25/.04  ", ((1, 16), (2, 24), (4, 48)), (0.25, 0.04)),
    ("H (2,16)(4,32) f=.30/.06  ", ((1, 16), (2, 16), (4, 32)), (0.3, 0.06)),
]


def main():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    fk = jax.jit(make_fk(m, [TIP]))
    rng = np.random.default_rng(0)
    bn = m._np_bounds
    qg = rng.uniform(bn["min"], bn["max"], size=(B, m.nvars)).astype(np.float32)
    tg = fk(jnp.asarray(qg))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    cfg = SolverConfig(mode="bio2_memetic", dtwist=1e-3)

    for label, phases, fracs in VARIANTS:
        s = AdaptiveBatchSolver(m, [G.PoseGoal(link=TIP)], cfg,
                                phases=phases, fractions=fracs)
        data0 = s.make_data(jnp.asarray(m.neutral_q()))
        data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
        data["primary"][0]["position"] = tg.pos
        data["primary"][0]["orientation"] = tg.quat
        res = s.solve_batch(keys, data)
        res.q.block_until_ready()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            for r in range(K):
                res = s.solve_batch(
                    jax.vmap(jax.random.fold_in, (0, None))(keys, r), data)
            res.q.block_until_ready()
            ts.append((time.perf_counter() - t0) / K)
        dt = min(ts)
        succ = float(np.asarray(res.success).mean())
        print(f"{label} {dt*1e3:8.2f} ms  {B*succ/dt:9.0f} solves/s  "
              f"success {succ:.4f}", flush=True)


if __name__ == "__main__":
    main()
