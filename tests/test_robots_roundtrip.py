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


def roundtrip(urdf, tip, mode, max_steps, n, rng, dtwist=1e-3, position_only=False):
    m = RobotModel.from_urdf_file(asset_path(urdf))
    fk = make_fk(m, [tip])
    goals = [G.PoseGoal(link=tip)] if not position_only else [G.PositionGoal(link=tip)]
    cfg = SolverConfig(mode=mode, max_steps=max_steps, dtwist=dtwist)
    s = IKSolver(m, goals, cfg)
    errs, succ = [], 0
    for i in range(n):
        qg = random_q(m, rng)
        t = fk(jnp.asarray(qg))
        data = s.make_data(jnp.asarray(m.neutral_q()))
        data["primary"][0]["position"] = t.pos
        if not position_only:
            data["primary"][0]["orientation"] = t.quat
        res = s.solve(jnp.asarray(m.neutral_q()), key=jax.random.PRNGKey(i), data=data)
        t2 = fk(res.q)
        errs.append(float(np.linalg.norm(np.asarray(t2.pos)[0] - np.asarray(t.pos)[0])))
        succ += bool(res.success)
    return m, succ, errs


def test_ur5_bio2(rng):
    _, succ, errs = roundtrip("ur5.urdf", "tool0", "bio2_memetic", 16, 3, rng)
    assert np.median(errs) < 2e-3, errs


def test_ur5_gd(rng):
    # gd on UR5 pose goals with joint limits (BASELINE config 2);
    # gd is approximate — check error reduction, not tolerance
    _, succ, errs = roundtrip("ur5.urdf", "tool0", "gd_4", 32, 2, rng)
    assert np.median(errs) < 0.1, errs


def test_snake_approximate_convergence(rng):
    """High-DOF (32 joints) approximate convergence (BASELINE config 4):
    the pose is usually reachable many ways; expect coarse convergence
    quickly and sub-cm with a bigger budget."""
    _, succ, errs = roundtrip(
        "snake.urdf", "head", "bio2_memetic", 16, 2, rng, dtwist=1e-2
    )
    assert np.median(errs) < 5e-2, errs
