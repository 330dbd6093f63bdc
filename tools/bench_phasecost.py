#!/usr/bin/env python
"""Per-phase cost of the adaptive bench pipeline on the real TPU.

Times (a) each phase's engine alone at its effective lane count,
(b) the fused 3-phase adaptive program, to quantify the per-launch
program-switch overhead and guide phase tuning.  Manual tool.
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


def setup():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    fk = jax.jit(make_fk(m, [TIP]))
    rng = np.random.default_rng(0)
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"], size=(B, m.nvars)).astype(np.float32)
    tg = fk(jnp.asarray(qg))
    return m, tg


def timed(fn, label, n=3):
    r = fn()
    jax.tree.map(lambda x: x.block_until_ready(), r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        jax.tree.map(lambda x: x.block_until_ready(), r)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{label:45s} {dt*1e3:8.2f} ms")
    return dt, r


def main():
    m, tg = setup()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    cfg = SolverConfig(mode="bio2_memetic", dtwist=1e-3)

    def make_single(islands, steps, nb):
        s = IKSolver(m, [G.PoseGoal(link=TIP)],
                     cfg.replace(islands=islands, max_steps=steps,
                                 steps_per_check=steps))
        data0 = s.make_data(jnp.asarray(m.neutral_q()))
        data = jax.tree.map(lambda x: jnp.broadcast_to(x, (nb,) + x.shape),
                            data0)
        data["primary"][0]["position"] = tg.pos[:nb]
        data["primary"][0]["orientation"] = tg.quat[:nb]
        k = keys[:nb]
        return s, k, data

    for islands, steps, frac in ((1, 16, 1.0), (2, 32, 0.3), (4, 64, 0.08)):
        nb = max(1, int(B * frac))
        s, k, data = make_single(islands, steps, nb)
        dt, r = timed(lambda: s.solve_batch(k, data),
                      f"phase {islands}x{steps} nb={nb}")
        print(f"    success {float(np.asarray(r.success).mean()):.4f}")

    s = AdaptiveBatchSolver(
        m, [G.PoseGoal(link=TIP)], cfg,
        phases=((1, 16), (2, 32), (4, 64)), fractions=(0.3, 0.08))
    data0 = s.make_data(jnp.asarray(m.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    dt, r = timed(lambda: s.solve_batch(keys, data), "adaptive 3-phase fused")
    print(f"    success {float(np.asarray(r.success).mean()):.4f}"
          f"  -> {B*float(np.asarray(r.success).mean())/dt:.0f} solves/s")


if __name__ == "__main__":
    main()
