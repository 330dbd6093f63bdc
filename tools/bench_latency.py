#!/usr/bin/env python
"""Single-query latency benchmark (latency mode, ``solve_until``).

The reference's primary published metric is per-query wall-clock latency
(reference: README.md:74-101 — 1 ms recommended for a 6-7 DOF arm, 5 ms
per PR2 arm group, 20 ms whole-body).  This harness measures the TPU
analog: ``IKSolver.solve_until`` (host-polled early exit, the direct
analog of the reference's first-success-cancels-the-rest race,
ik_parallel.h:160-190) on PR2 7-DOF pose queries at dtwist = 1e-3,
reporting p50/p99 per accepted solve.

Each ``steps_per_check`` chunk is one device dispatch; through the
tunneled TPU backend a dispatch costs ~1 ms fixed, so the chunk size
trades early-exit granularity against dispatch count — the sweep reports
every setting.  On a locally-attached chip the fixed cost is far lower;
tunnel numbers are an upper bound.

Usage: ``python tools/bench_latency.py`` (on the TPU chip).
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

N_QUERIES = int(os.environ.get("BENCH_QUERIES", "200"))


def run_setting(m, fk, targets, spc, max_steps):
    cfg = SolverConfig(mode="bio2_memetic", dtwist=1e-3,
                       max_steps=max_steps, steps_per_check=spc)
    s = IKSolver(m, [G.PoseGoal(link="r_gripper_tool_frame")], cfg)
    seed = jnp.asarray(m.neutral_q())
    data0 = s.make_data(seed)

    # warm up every chunk-count specialization (compile outside timing)
    gp, gq = targets[0]
    data = dict(data0)
    data["primary"] = [dict(data0["primary"][0])]
    data["primary"][0]["position"] = gp[None]
    data["primary"][0]["orientation"] = gq[None]
    s.solve_until(seed, key=jax.random.PRNGKey(0), data=data)

    lat, ok = [], 0
    for i, (gp, gq) in enumerate(targets):
        data["primary"][0]["position"] = gp[None]
        data["primary"][0]["orientation"] = gq[None]
        t0 = time.perf_counter()
        res = s.solve_until(seed, key=jax.random.PRNGKey(i), data=data)
        bool(res.success)  # sync
        lat.append(time.perf_counter() - t0)
        ok += bool(res.success)
    lat_ms = np.asarray(lat) * 1e3
    return {
        "steps_per_check": spc,
        "max_steps": max_steps,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 3),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "success_rate": round(ok / len(targets), 4),
        "n": len(targets),
    }


def run_fused_single(m, fk, tg, max_steps=64, spc=16):
    """Latency-optimal single query on TPU: the fused engine runs the
    WHOLE solve (all chunks + acceptance + winner) as one device
    program, so a query costs exactly one host dispatch — early-exit
    polling cannot beat that when dispatch dominates (the tunneled
    backend adds ~30 ms RTT per dispatch; a co-located chip ~100 µs)."""
    cfg = SolverConfig(mode="bio2_memetic", dtwist=1e-3,
                       max_steps=max_steps, steps_per_check=spc)
    s = IKSolver(m, [G.PoseGoal(link="r_gripper_tool_frame")], cfg)
    assert s.engine is not None
    data0 = s.make_data(jnp.asarray(m.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos[:1]
    data["primary"][0]["orientation"] = tg.quat[:1]
    key = jax.random.split(jax.random.PRNGKey(0), 1)
    s.solve_batch(key, data).q.block_until_ready()

    lat, ok = [], 0
    for i in range(N_QUERIES):
        d = dict(data)
        d["primary"] = [dict(data["primary"][0])]
        d["primary"][0]["position"] = tg.pos[i : i + 1]
        d["primary"][0]["orientation"] = tg.quat[i : i + 1]
        k = jax.random.split(jax.random.PRNGKey(i), 1)
        t0 = time.perf_counter()
        r = s.solve_batch(k, d)
        r.q.block_until_ready()
        lat.append(time.perf_counter() - t0)
        ok += int(np.asarray(r.success)[0])
    # pipelined (queued) per-query cost: dispatch K queries back-to-back
    # with one sync — the serving-floor latency without the RTT stall
    K = 64
    t0 = time.perf_counter()
    for i in range(K):
        r = s.solve_batch(jax.random.split(jax.random.PRNGKey(i), 1), data)
    r.q.block_until_ready()
    queued_ms = (time.perf_counter() - t0) / K * 1e3
    lat_ms = np.asarray(lat) * 1e3
    return {
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 3),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "queued_per_query_ms": round(queued_ms, 3),
        "success_rate": round(ok / N_QUERIES, 4),
        "n": N_QUERIES,
    }


def main():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    tip = "r_gripper_tool_frame"
    fk = jax.jit(make_fk(m, [tip]))
    rng = np.random.default_rng(0)
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"], size=(N_QUERIES, m.nvars)).astype(
        np.float32)
    tg = fk(jnp.asarray(qg))
    targets = [(jnp.asarray(np.asarray(tg.pos)[i, 0]),
                jnp.asarray(np.asarray(tg.quat)[i, 0]))
               for i in range(N_QUERIES)]

    results = []
    for spc, max_steps in [(4, 64), (8, 64), (16, 64), (32, 64)]:
        r = run_setting(m, fk, targets, spc, max_steps)
        results.append(r)
        print(json.dumps({"config": "pr2_arm_pose_latency_solve_until", **r,
                          "device": str(jax.devices()[0])}), flush=True)
    best = min(results, key=lambda r: r["p50_ms"])
    print(json.dumps({"config": "pr2_arm_pose_latency_solve_until_best",
                      **best, "device": str(jax.devices()[0])}), flush=True)
    rf = run_fused_single(m, fk, tg)
    print(json.dumps({"config": "pr2_arm_pose_latency_fused_single_dispatch",
                      **rf, "reference_recommendation_ms": 1.0,
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
