#!/usr/bin/env python
"""Benchmark: scenario-batched IK solves/sec on the PR2 7-DOF pose problem.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Configuration mirrors BASELINE.json's headline config: bio2_memetic,
PR2-like right arm (7 DOF), single 6-DOF PoseGoal, 1 mm tolerance
(dtwist = 1e-3: every twist component ≤ 1 mm / 1 mrad — the reference's
acceptance semantics, problem.cpp:276-322).  Targets are reachable by
construction (FK of random valid configurations — the reference's
FK-IK-FK harness, README.md:404-447).

``vs_baseline`` is measured against ~1,000 solves/sec — the reference's
single-CPU throughput at its recommended 1 ms timeout (BASELINE.md:
"a CPU core solves ~1k queries/sec when most succeed early").

The metric counts only SUCCESSFUL solves (throughput × success rate).
"""

import json
import os
import subprocess
import sys
import time

REFERENCE_SOLVES_PER_SEC = 1000.0


def run_bench():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bio_ik_tpu.goals as G
    from bio_ik_tpu import RobotModel, asset_path
    from bio_ik_tpu.api import IKSolver
    from bio_ik_tpu.config import SolverConfig
    from bio_ik_tpu.kinematics import make_fk

    from bio_ik_tpu.api import AdaptiveBatchSolver

    # B and K chosen from the measured throughput plateau
    # (tools/bench_scaling.py): larger batches amortize the tunnel's fixed
    # per-dispatch latency; deeper queues overlap dispatch with compute.
    B = int(os.environ.get("BENCH_BATCH", "65536"))

    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    tip = "r_gripper_tool_frame"
    fk = jax.jit(make_fk(m, [tip]))
    rng = np.random.default_rng(0)
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"], size=(B, m.nvars)).astype(np.float32)
    tg = fk(jnp.asarray(qg))

    # adaptive multi-phase batching: full-budget pass over everything,
    # then failure-compacted retries with bigger island counts (see
    # api.py); phase budgets sized to the measured HONEST per-step
    # success decay (24 steps ⇒ 89 % solved; +2-island/32-step retry of
    # the worst 15 % ⇒ 99.5 %; +4-island/64-step retry of the worst 3 %
    # ⇒ 99.99 %; +8-island/32-step fresh-randomness retry of the worst
    # 0.8 % ⇒ 100.00 % — r5 sweep after the retry-success accounting fix
    # in api.py demoted better-fitness-but-failed retries; the r4
    # schedule (1,16),(2,16),(4,48) measures 93 % honest)
    cfg = SolverConfig(mode="bio2_memetic", dtwist=1e-3)
    s = AdaptiveBatchSolver(
        m, [G.PoseGoal(link=tip)], cfg,
        phases=((1, 24), (2, 32), (4, 64), (8, 32)),
        fractions=(0.15, 0.03, 0.008),
    )
    data0 = s.make_data(jnp.asarray(m.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    res = s.solve_batch(keys, data)  # compile + warmup
    res.q.block_until_ready()

    # steady-state throughput: K batches dispatched back-to-back (the
    # serving pattern), one device sync at the end — amortizes the
    # fixed per-sync tunnel latency that single-shot timing includes
    K = int(os.environ.get("BENCH_QUEUE", "16"))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for r in range(K):
            res = s.solve_batch(jax.vmap(jax.random.fold_in, (0, None))(
                keys, r), data)
        res.q.block_until_ready()
        times.append((time.perf_counter() - t0) / K)
    dt = min(times)

    success = float(np.asarray(res.success).mean())
    t2 = fk(res.q)
    perr = np.linalg.norm(np.asarray(t2.pos)[:, 0] - np.asarray(tg.pos)[:, 0], axis=-1)
    solves_per_sec = B * success / dt

    print(
        json.dumps(
            {
                "metric": "IK solves/sec (PR2 7-DOF pose, 1mm tol, bio2_memetic)",
                "value": round(solves_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / REFERENCE_SOLVES_PER_SEC, 3),
                "success_rate": round(success, 4),
                "batch": B,
                "phases": "1x24,2x32,4x64,8x32 adaptive",
                "batch_time_ms": round(dt * 1e3, 2),
                "median_pos_err_m": float(np.median(perr)),
                "note": ("r5: honest success accounting (r4's 451k@1.0 "
                         "was 93% honest after the retry-merge fix; see "
                         "BENCHMARKS.md)"),
                "device": str(jax.devices()[0]),
            }
        )
    )


def main():
    # The tunneled TPU claim is exclusive and occasionally fails to register
    # if another process held it recently, surfacing as FAILED_PRECONDITION /
    # backend errors at arbitrary points.  Once the in-process JAX backend
    # has errored it cannot be re-initialized, so retries must run in a
    # FRESH subprocess.  The parent orchestrates; the child (env marker)
    # does one attempt.
    if os.environ.get("_BIOIK_BENCH_CHILD"):
        run_bench()
        return
    for attempt in range(6):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "_BIOIK_BENCH_CHILD": "1"},
                capture_output=True, text=True, timeout=1800,
            )
        except subprocess.TimeoutExpired as e:
            # a hung tunnel claim counts as a failed attempt — keep the
            # fresh-subprocess retry loop alive rather than aborting
            sys.stderr.write(f"bench child timed out after {e.timeout}s\n")
            if attempt < 5:
                time.sleep(30 * (attempt + 1))
            continue
        out = r.stdout.strip().splitlines()
        if r.returncode == 0 and out and out[-1].startswith("{"):
            print(out[-1])
            return
        sys.stderr.write(r.stderr[-4000:] + "\n")
        if attempt < 5:
            time.sleep(30 * (attempt + 1))
    sys.exit(1)


if __name__ == "__main__":
    main()
