"""FK-IK-FK round trips on the remaining BASELINE.json robot configs:
UR5 (bio1 + gd modes with joint limits) and the 32-DOF snake
(approximate-solution convergence)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bio_ik_tpu.goals as G
from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.api import IKSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk
from tests.test_fk import random_q


def roundtrip(urdf, tip, mode, max_steps, n, rng, dtwist=1e-3,
              position_only=False, seed_near=None):
    """FK-IK-FK rounds; ``seed_near`` perturbs the goal configuration by
    U(−seed_near, seed_near) to produce the solve seed (local solvers
    are specified from a nearby seed; global solvers from neutral)."""
    m = RobotModel.from_urdf_file(asset_path(urdf))
    fk = make_fk(m, [tip])
    goals = [G.PoseGoal(link=tip)] if not position_only else [G.PositionGoal(link=tip)]
    cfg = SolverConfig(mode=mode, max_steps=max_steps, dtwist=dtwist)
    s = IKSolver(m, goals, cfg)
    errs, succ = [], 0
    for i in range(n):
        qg = random_q(m, rng)
        t = fk(jnp.asarray(qg))
        if seed_near is None:
            seed = jnp.asarray(m.neutral_q())
        else:
            b = m._np_bounds
            seed = jnp.asarray(np.clip(
                qg + rng.uniform(-seed_near, seed_near, size=qg.shape),
                b["clip_min"], b["clip_max"]).astype(qg.dtype))
        data = s.make_data(seed)
        data["primary"][0]["position"] = t.pos
        if not position_only:
            data["primary"][0]["orientation"] = t.quat
        res = s.solve(seed, key=jax.random.PRNGKey(i), data=data)
        t2 = fk(res.q)
        errs.append(float(np.linalg.norm(np.asarray(t2.pos)[0] - np.asarray(t.pos)[0])))
        succ += bool(res.success)
    return m, succ, errs


def test_ur5_bio2(rng):
    _, succ, errs = roundtrip("ur5.urdf", "tool0", "bio2_memetic", 16, 3, rng)
    assert np.median(errs) < 2e-3, errs


def test_ur5_gd(rng):
    # gd on UR5 pose goals with joint limits (BASELINE config 2).
    # gd is a LOCAL method (same as the reference's, ik_gradient.cpp —
    # islands only add random restarts), so it is specified from a seed
    # near the target: a ±0.3 rad perturbation of the goal configuration
    # must be pulled back to tight tolerance.
    _, succ, errs = roundtrip("ur5.urdf", "tool0", "gd_4", 64, 4, rng,
                              seed_near=0.3)
    assert np.median(errs) < 1e-2, errs
    # ... and from the distant neutral seed it must still make clear
    # progress on at least one target (global behavior not required)
    _, _, errs_far = roundtrip("ur5.urdf", "tool0", "gd_4", 64, 2, rng)
    assert min(errs_far) < 0.2, errs_far


@pytest.mark.slow
def test_snake_approximate_convergence(rng):
    """High-DOF (32 joints) approximate convergence (BASELINE config 4):
    the pose is usually reachable many ways; expect coarse convergence
    quickly and sub-cm with a bigger budget."""
    _, succ, errs = roundtrip(
        "snake.urdf", "head", "bio2_memetic", 16, 2, rng, dtwist=1e-2
    )
    assert np.median(errs) < 5e-2, errs


def test_kuka_iiwa_bio2(rng):
    # 7-DOF arm with TIGHT joint bounds on every joint (the UR5 asset is
    # position-unbounded) — exercises the bounded-revolute clip path
    # (reference: robot_info.h:82-90) through a full solve
    m, succ, errs = roundtrip("kuka_iiwa.urdf", "tool0", "bio2_memetic", 16, 3, rng)
    b = m._np_bounds
    assert np.all(np.isfinite(b["min"])) and np.all(np.isfinite(b["max"]))
    assert np.median(errs) < 2e-3, errs


@pytest.mark.slow
def test_humanoid_whole_body(rng):
    """30-DOF branching humanoid, 3 simultaneous tips (both hands + head
    look direction analog) — the whole-body `all`-group config
    (reference: README.md:89-101's 20 ms whole-body example).  Over the
    fused unroll guard, so this runs the vmapped XLA solver path."""
    import jax

    m = RobotModel.from_urdf_file(asset_path("humanoid.urdf"))
    tips = ["r_hand", "l_hand", "head"]
    fk = make_fk(m, tips)
    qg = random_q(m, rng)
    tg = fk(jnp.asarray(qg))
    cfg = SolverConfig(mode="bio2_memetic", max_steps=32, dtwist=1e-2)
    s = IKSolver(m, [G.PoseGoal(link=t) for t in tips], cfg)
    data = s.make_data(jnp.asarray(m.neutral_q()))
    # same-type goals compile into ONE struct-of-arrays group (count 3)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    res = s.solve(jnp.asarray(m.neutral_q()), key=jax.random.PRNGKey(0), data=data)
    t2 = fk(res.q)
    errs = np.linalg.norm(np.asarray(t2.pos) - np.asarray(tg.pos), axis=-1)
    # approximate convergence: each tip within a few cm from a 16-step budget
    assert float(np.median(errs)) < 5e-2, errs
