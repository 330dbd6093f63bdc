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


def run_deadline(m, targets, timeout_s, spc=8):
    """Wall-clock deadline mode (``solve_until(timeout_s=...)``): the
    reference's config vocabulary — 1 ms (6-7 DOF arm), 5 ms (PR2 arm
    group), 20 ms (whole-body); reference README.md:74-101,
    kinematics_plugin.cpp:506-507.  Chunks of ``steps_per_check`` run
    until acceptance or deadline; the returned solution is the best
    accepted so far.  Through the tunneled chip every dispatch pays
    ~30 ms RTT, so wall-clock numbers here are RTT-dominated; the
    success-at-deadline column is the meaningful one (a co-located chip
    pays ~100 µs per chunk dispatch)."""
    cfg = SolverConfig(mode="bio2_memetic", dtwist=1e-3,
                       max_steps=1 << 30, steps_per_check=spc)
    s = IKSolver(m, [G.PoseGoal(link="r_gripper_tool_frame")], cfg)
    seed = jnp.asarray(m.neutral_q())
    data0 = s.make_data(seed)
    data = dict(data0)
    data["primary"] = [dict(data0["primary"][0])]
    gp, gq = targets[0]
    data["primary"][0]["position"] = gp[None]
    data["primary"][0]["orientation"] = gq[None]
    s.solve_until(seed, key=jax.random.PRNGKey(0), data=data,
                  timeout_s=timeout_s)  # compile warmup

    lat, ok = [], 0
    for i, (gp, gq) in enumerate(targets):
        data["primary"][0]["position"] = gp[None]
        data["primary"][0]["orientation"] = gq[None]
        t0 = time.perf_counter()
        res = s.solve_until(seed, key=jax.random.PRNGKey(i), data=data,
                            timeout_s=timeout_s)
        bool(res.success)  # sync
        lat.append(time.perf_counter() - t0)
        ok += bool(res.success)
    lat_ms = np.asarray(lat) * 1e3
    return {
        "deadline_ms": timeout_s * 1e3,
        "steps_per_check": spc,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "success_at_deadline": round(ok / len(targets), 4),
        "n": len(targets),
    }


def run_deadline_device(m, tg, deadlines_s, spc=8):
    """Deadline → device-step-budget emulation: measure the fused
    single-query per-step DEVICE cost (pipelined, so the tunnel RTT
    cancels), convert each wall-clock deadline into the step budget a
    co-located chip would fit inside it, and report success at that
    budget over N single queries run as fused single-dispatch programs.
    This is the tunnel-honest rendering of the reference's "best
    solution within timeout" race (ik_parallel.h:160-210).

    Single queries race ``islands=32`` (64 of the kernel's 128 lanes) —
    the latency-mode analog of the reference racing its solver on all
    threads (ik_parallel.h:110-139): at batch 1 the extra islands ride
    otherwise-idle VPU lanes, so success at a fixed step budget rises
    sharply at ~zero wall-clock cost (measured: 8 steps 0.30 → 0.58,
    16 steps → 1.00 at the same queued per-query time)."""
    def build(max_steps, islands=32):
        cfg = SolverConfig(mode="bio2_memetic", dtwist=1e-3,
                           islands=islands,
                           max_steps=max_steps, steps_per_check=spc)
        s = IKSolver(m, [G.PoseGoal(link="r_gripper_tool_frame")], cfg)
        assert s.engine is not None
        data0 = s.make_data(jnp.asarray(m.neutral_q()))
        data = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (1,) + x.shape), data0)
        data["primary"][0]["position"] = tg.pos[:1]
        data["primary"][0]["orientation"] = tg.quat[:1]
        return s, data

    def queued_ms(s, data, K=64):
        key = jax.random.split(jax.random.PRNGKey(0), 1)
        s.solve_batch(key, data).q.block_until_ready()
        t0 = time.perf_counter()
        for i in range(K):
            r = s.solve_batch(jax.random.split(jax.random.PRNGKey(i), 1),
                              data)
        r.q.block_until_ready()
        return (time.perf_counter() - t0) / K * 1e3

    # per-step device cost from the slope between two budgets (the fixed
    # per-program cost cancels)
    s_lo, d_lo = build(2 * spc)
    s_hi, d_hi = build(8 * spc)
    ms_lo, ms_hi = queued_ms(s_lo, d_lo), queued_ms(s_hi, d_hi)
    step_ms = max((ms_hi - ms_lo) / (6 * spc), 1e-4)
    fixed_ms = max(ms_lo - 2 * spc * step_ms, 0.0)

    out = []
    for t in deadlines_s:
        budget = int((t * 1e3 - fixed_ms) / step_ms)
        n_steps = max(spc, (budget // spc) * spc)
        s, data = build(n_steps)
        key = jax.random.split(jax.random.PRNGKey(0), 1)
        s.solve_batch(key, data).q.block_until_ready()
        ok = 0
        N = min(N_QUERIES, tg.pos.shape[0])
        for i in range(N):
            d = dict(data)
            d["primary"] = [dict(data["primary"][0])]
            d["primary"][0]["position"] = tg.pos[i : i + 1]
            d["primary"][0]["orientation"] = tg.quat[i : i + 1]
            r = s.solve_batch(jax.random.split(jax.random.PRNGKey(i), 1), d)
            ok += int(np.asarray(r.success)[0])
        out.append({
            "deadline_ms": t * 1e3,
            "device_step_budget": n_steps,
            "per_step_device_us": round(step_ms * 1e3, 1),
            "fixed_program_ms": round(fixed_ms, 3),
            "success_at_deadline": round(ok / N, 4),
            "n": N,
        })
    return out


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
    # the reference's 1/5/20 ms deadline configs (README.md:74-101):
    # wall-clock mode through the tunnel is RTT-degenerate (~30 ms per
    # dispatch swallows every deadline — exactly one chunk runs), so the
    # meaningful sweep converts each deadline into its DEVICE-time step
    # budget and reports success at that budget (what a co-located chip
    # would achieve inside the wall-clock deadline)
    for r in run_deadline_device(m, tg, (1e-3, 5e-3, 20e-3)):
        print(json.dumps({"config": "pr2_arm_pose_latency_deadline_device",
                          **r, "device": str(jax.devices()[0])}), flush=True)
    rd = run_deadline(m, targets, 20e-3)
    print(json.dumps({"config": "pr2_arm_pose_latency_deadline_wall", **rd,
                      "note": "tunnel RTT ~30ms dominates; see _device rows",
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
