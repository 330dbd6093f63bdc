#!/usr/bin/env python
"""Multi-config benchmark suite (the BASELINE.json config list).

Runs the FK-IK-FK throughput harness on every bundled robot config and
prints one JSON line per config.  ``bench.py`` at the repo root remains
the single-line headline benchmark; this is the coverage sweep:

  * PR2 right arm, 7 DOF, single pose goal (headline, fused fullstep)
  * UR5, 6 DOF, single pose goal (fused fullstep)
  * PR2 dual-arm, 17 DOF, two pose goals (fused fullstep, multi-tip)
  * snake-32, 32 DOF, position goal (fused fullstep — high-DOF tier)
  * humanoid-30, 3 tips (fused fullstep)
  * PR2 + MinimalDisplacement/AvoidJointLimits regularizers (fused
    fullstep with in-kernel secondary pre-selection)

Usage: ``python tools/bench_suite.py`` (on the TPU chip).
BENCH_BATCH overrides the batch size (default 2048).
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

B = int(os.environ.get("BENCH_BATCH", "2048"))


def run_config(name, urdf, tips, goals, cfg, pos_tol, batch=None,
               adaptive=True, phases=((1, 8), (2, 32), (4, 64)),
               fractions=None):
    batch = batch or B
    m = RobotModel.from_urdf_file(asset_path(urdf))
    fk = jax.jit(make_fk(m, tips))
    rng = np.random.default_rng(0)
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"], size=(batch, m.nvars)).astype(np.float32)
    tg = fk(jnp.asarray(qg))

    if adaptive:
        s = AdaptiveBatchSolver(m, goals, cfg, phases=phases,
                                fractions=fractions)
    else:
        s = IKSolver(m, goals, cfg)
    data0 = s.make_data(jnp.asarray(m.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), data0)
    pos_slots = []
    for i, grp in enumerate(s.problem.primary):
        if grp.goal_type not in ("position", "pose"):
            continue
        for k in range(grp.count):
            slot = int(grp.tip_slots[k])
            pos_slots.append(slot)
            if "position" in data["primary"][i]:
                data["primary"][i]["position"] = (
                    data["primary"][i]["position"].at[:, k].set(tg.pos[:, slot])
                )
            if "orientation" in data["primary"][i]:
                data["primary"][i]["orientation"] = (
                    data["primary"][i]["orientation"].at[:, k].set(tg.quat[:, slot])
                )
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    res = s.solve_batch(keys, data)
    res.q.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = s.solve_batch(keys, data)
        res.q.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    t2 = fk(res.q)
    perr = np.linalg.norm(
        np.asarray(t2.pos) - np.asarray(tg.pos), axis=-1
    )[:, sorted(set(pos_slots))].max(axis=-1)  # worst position-goal tip
    success = float(np.asarray(res.success).mean())
    solved = float((perr < pos_tol).mean())
    print(json.dumps({
        "config": name,
        "solves_per_sec": round(batch * success / dt, 1),
        "success_rate": round(success, 4),
        f"frac_pos_err<{pos_tol}": round(solved, 4),
        "median_pos_err_m": float(np.median(perr)),
        "batch": batch,
        "batch_time_ms": round(dt * 1e3, 2),
        "dof": m.nvars,
        "engine": "fused" if getattr(s, "_fused_adaptive", None) is not None
                  or getattr(s, "engine", None) is not None else "vmap",
    }), flush=True)


def main():
    run_config(
        "pr2_arm_pose", "pr2_arm.urdf", ["r_gripper_tool_frame"],
        [G.PoseGoal(link="r_gripper_tool_frame")],
        SolverConfig(mode="bio2_memetic", dtwist=1e-3), 1e-3,
    )
    run_config(
        "ur5_pose", "ur5.urdf", ["tool0"],
        [G.PoseGoal(link="tool0")],
        SolverConfig(mode="bio2_memetic", dtwist=1e-3), 1e-3,
        phases=((1, 8), (2, 32), (4, 64), (8, 64)),
        fractions=(0.75, 0.25, 0.02),
    )
    # 17-DOF dual-arm at 1 mm/1 mrad on BOTH tips: the hardest ladder —
    # a 32-step first pass solves only 51 %, so the first pass runs 64
    # steps and the escalations carry wide fractions (r5 honest sweep)
    run_config(
        "pr2_dual_pose2", "pr2_dual.urdf",
        ["r_gripper_tool_frame", "l_gripper_tool_frame"],
        [G.PoseGoal(link="r_gripper_tool_frame"),
         G.PoseGoal(link="l_gripper_tool_frame")],
        SolverConfig(mode="bio2_memetic", dtwist=1e-3), 1e-3,
        phases=((1, 64), (2, 64), (4, 128), (8, 128)),
        fractions=(0.25, 0.08, 0.03),
    )
    # BASELINE.json config 4: 30+ DOF approximate convergence — the
    # fused fullstep tier handles high-DOF chains (measured 13.5× the
    # vmapped path on this config)
    run_config(
        "snake32_position", "snake.urdf", ["head"],
        [G.PositionGoal(link="head")],
        SolverConfig(mode="bio2_memetic", dpos=5e-3, dtwist=float("inf"),
                     max_steps=16),
        5e-3, adaptive=False,
    )
    # floating-base arm (mobile-manipulator analog): the fused species
    # tier with in-kernel quaternion-gene renormalization (reference:
    # ik_evolution_2.cpp:320-324)
    run_config(
        "free_arm_floating_base", "free_arm.urdf", ["tool"],
        [G.PositionGoal(link="tool")],
        SolverConfig(mode="bio2_memetic", dpos=5e-3, dtwist=float("inf"),
                     max_steps=16),
        5e-3, batch=min(B, 1024), adaptive=False,
    )
    # BASELINE.json config 2: bio1 + gradient-descent modes on UR5
    # (vmapped XLA solver paths — neither qualifies for the fused engine)
    run_config(
        "ur5_pose_bio1", "ur5.urdf", ["tool0"],
        [G.PoseGoal(link="tool0")],
        SolverConfig(mode="bio1", dtwist=1e-3, max_steps=32),
        1e-3, batch=min(B, 512), adaptive=False,
    )
    run_config(
        "ur5_pose_gd4", "ur5.urdf", ["tool0"],
        [G.PoseGoal(link="tool0")],
        SolverConfig(mode="gd_4", dtwist=1e-3, max_steps=64),
        1e-3, batch=min(B, 512), adaptive=False,
    )
    # BASELINE.json config 2b: KUKA iiwa-like 7-DOF with TIGHT bounds on
    # every joint (the bounded-revolute branch of the clip path)
    run_config(
        "kuka_iiwa_pose", "kuka_iiwa.urdf", ["tool0"],
        [G.PoseGoal(link="tool0")],
        SolverConfig(mode="bio2_memetic", dtwist=1e-3), 1e-3,
    )
    # BASELINE.json config 4b: 30-DOF branching humanoid, 3 simultaneous
    # tips (whole-body `all`-group analog) — fused fullstep tier with
    # adaptive retry escalation (reference's 20 ms whole-body analog,
    # reference README.md:89-101): 1 cm tolerance at >=0.99 success
    run_config(
        "humanoid_whole_body", "humanoid.urdf", ["r_hand", "l_hand", "head"],
        [G.PoseGoal(link="r_hand"), G.PoseGoal(link="l_hand"),
         G.PoseGoal(link="head")],
        SolverConfig(mode="bio2_memetic", dpos=1e-2, dtwist=float("inf")),
        1e-2, batch=min(B, 1024),
        phases=((1, 32), (2, 64), (4, 128), (8, 128)),
    )
    # millimeter-class whole-body: same 3-tip 30-DOF problem at 1 mm —
    # deeper retry ladder with tail-sized retry fractions
    run_config(
        "humanoid_whole_body_mm", "humanoid.urdf", ["r_hand", "l_hand", "head"],
        [G.PoseGoal(link="r_hand"), G.PoseGoal(link="l_hand"),
         G.PoseGoal(link="head")],
        SolverConfig(mode="bio2_memetic", dpos=1e-3, dtwist=float("inf")),
        1e-3, batch=min(B, 1024),
        phases=((1, 32), (2, 64), (4, 128), (8, 256), (8, 256), (8, 256)),
        fractions=(0.75, 0.3, 0.2, 0.15, 0.12),
    )
    # the reference's RECOMMENDED production config (pose + minimal-
    # displacement + avoid-joint-limits regularizers, kinematics_plugin
    # .cpp:286-329) — joint-space secondary goals stay on the fused path
    # (in-kernel pre-selection, ik_evolution_2.cpp:366-378)
    run_config(
        "pr2_arm_pose_regularized", "pr2_arm.urdf", ["r_gripper_tool_frame"],
        [G.PoseGoal(link="r_gripper_tool_frame"),
         G.MinimalDisplacementGoal(weight=0.05),
         G.AvoidJointLimitsGoal(weight=0.05)],
        SolverConfig(mode="bio2_memetic", dtwist=1e-3), 1e-3,
        phases=((1, 32), (2, 64), (4, 128), (8, 256)),
        fractions=(0.3, 0.1, 0.03),
    )
    # BASELINE.json config 3: weighted multi-goal dual-arm — PoseGoal +
    # LookAtGoal primaries with MinimalDisplacement + AvoidJointLimits
    # secondaries — ALL fused (lookat fitness + joint-space secondary
    # pre-selection run in-kernel; measured 17.6× the vmapped path at
    # equal quality)
    run_config(
        "pr2_dual_multigoal", "pr2_dual.urdf",
        ["r_gripper_tool_frame", "l_gripper_tool_frame"],
        [G.PoseGoal(link="r_gripper_tool_frame"),
         G.LookAtGoal(link="l_gripper_tool_frame", axis=(1.0, 0.0, 0.0),
                      target=(1.0, 0.0, 0.5), weight=0.5),
         G.MinimalDisplacementGoal(weight=0.2),
         G.AvoidJointLimitsGoal(weight=0.2)],
        SolverConfig(mode="bio2_memetic", dpos=1e-2, drot=float("inf"),
                     dtwist=float("inf")),
        1e-2, batch=min(B, 1024),
        phases=((1, 32), (2, 32), (4, 64), (8, 128)),
        fractions=(0.3, 0.1, 0.04),
    )


if __name__ == "__main__":
    main()
