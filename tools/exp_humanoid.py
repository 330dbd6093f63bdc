#!/usr/bin/env python
"""Budget sweep: humanoid whole-body (3 tips, 30 DOF) at 1 cm tolerance.

Finds the step/phase budget at which the fused bio2_memetic engine holds
>=0.99 success at dpos=1e-2 (VERDICT r4 item 7: the reference's 20 ms
whole-body analog, reference README.md:89-101).
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
from bio_ik_tpu.api import AdaptiveBatchSolver, IKSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk

BATCH = int(os.environ.get("BENCH_BATCH", "1024"))
TOL = float(os.environ.get("TOL", "1e-2"))


def run(tag, cfg, adaptive=False, phases=None, fractions=None):
    m = RobotModel.from_urdf_file(asset_path("humanoid.urdf"))
    tips = ["r_hand", "l_hand", "head"]
    goals = [G.PoseGoal(link=t) for t in tips]
    fk = jax.jit(make_fk(m, tips))
    rng = np.random.default_rng(0)
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"], size=(BATCH, m.nvars)).astype(np.float32)
    tg = fk(jnp.asarray(qg))

    if adaptive:
        s = AdaptiveBatchSolver(m, goals, cfg, phases=phases, fractions=fractions)
    else:
        s = IKSolver(m, goals, cfg)
    data0 = s.make_data(jnp.asarray(m.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), data0)
    for i, grp in enumerate(s.problem.primary):
        if grp.goal_type not in ("position", "pose"):
            continue
        for k in range(grp.count):
            slot = int(grp.tip_slots[k])
            data["primary"][i]["position"] = (
                data["primary"][i]["position"].at[:, k].set(tg.pos[:, slot]))
            if "orientation" in data["primary"][i]:
                data["primary"][i]["orientation"] = (
                    data["primary"][i]["orientation"].at[:, k].set(tg.quat[:, slot]))
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

    res = s.solve_batch(keys, data)
    res.q.block_until_ready()
    t0 = time.perf_counter()
    res = s.solve_batch(keys, data)
    res.q.block_until_ready()
    dt = time.perf_counter() - t0

    t2 = fk(res.q)
    perr = np.linalg.norm(np.asarray(t2.pos) - np.asarray(tg.pos), axis=-1).max(axis=-1)
    success = float(np.asarray(res.success).mean())
    print(json.dumps({
        "tag": tag,
        "success": round(success, 4),
        f"frac<{TOL}": round(float((perr < TOL).mean()), 4),
        "median_err_m": float(np.median(perr)),
        "p99_err_m": float(np.quantile(perr, 0.99)),
        "batch_time_ms": round(dt * 1e3, 1),
        "solves_per_sec": round(BATCH * success / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["steps"]
    if "steps" in which:
        for steps in (32, 64, 128):
            run(f"fixed-{steps}",
                SolverConfig(mode="bio2_memetic", dpos=TOL,
                             dtwist=float("inf"), max_steps=steps))
    if "adaptive" in which:
        run("adaptive-1x16,2x32,4x64",
            SolverConfig(mode="bio2_memetic", dpos=TOL, dtwist=float("inf")),
            adaptive=True, phases=((1, 16), (2, 32), (4, 64)))
        run("adaptive-1x32,2x64,4x128",
            SolverConfig(mode="bio2_memetic", dpos=TOL, dtwist=float("inf")),
            adaptive=True, phases=((1, 32), (2, 64), (4, 128)))
