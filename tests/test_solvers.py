"""Solver tests: FK-IK-FK round trips on the bundled robots.

The FK-IK-FK harness is the reference's primary acceptance benchmark
(reference: README.md:404-447): sample a random valid configuration,
FK → target pose, solve IK from a neutral seed, FK again, check the pose
matches.  CPU budgets here are small — these are correctness gates, not
benchmarks (bench.py on TPU is the benchmark).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bio_ik_tpu.goals as G
from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.api import IKSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk
from bio_ik_tpu.solvers.base import solver_names
from tests.test_fk import random_q

TIP = "r_gripper_tool_frame"


@pytest.fixture(scope="module")
def arm():
    return RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))


@pytest.fixture(scope="module")
def arm_fk(arm):
    return make_fk(arm, [TIP])


def reachable_target(arm, arm_fk, rng):
    qg = random_q(arm, rng)
    t = arm_fk(jnp.asarray(qg))
    return np.asarray(t.pos)[0], np.asarray(t.quat)[0]


def solve_roundtrip(arm, arm_fk, rng, mode, max_steps, dtwist=1e-3, n=4, seed_goals=None):
    cfg = SolverConfig(mode=mode, max_steps=max_steps, dtwist=dtwist)
    goals = seed_goals or [G.PoseGoal(link=TIP)]
    s = IKSolver(arm, goals, cfg)
    n_success, errs = 0, []
    for i in range(n):
        gp, gq = reachable_target(arm, arm_fk, rng)
        data = s.make_data(jnp.asarray(arm.neutral_q()))
        data["primary"][0]["position"] = jnp.asarray(gp)[None]
        data["primary"][0]["orientation"] = jnp.asarray(gq)[None]
        res = s.solve(jnp.asarray(arm.neutral_q()), key=jax.random.PRNGKey(i), data=data)
        t2 = arm_fk(res.q)
        errs.append(np.linalg.norm(np.asarray(t2.pos)[0] - gp))
        n_success += bool(res.success)
    return n_success, errs


def test_registry_has_reference_modes():
    names = solver_names()
    # every reference-registered mode name must exist
    # (reference: ik_evolution_2.cpp:652-654, ik_gradient.cpp:253-292)
    for n in ["bio2", "bio2_memetic", "bio2_memetic_l", "gd", "gd_2", "gd_4",
              "gd_8", "gd_r", "gd_c", "jac", "jac_2", "jac_4", "jac_8"]:
        assert n in names, n


def test_jac_solves_reachable_pose(arm, arm_fk, rng):
    # jac is a local Newton-style method and can diverge from a distant
    # seed near singularities (same brittleness as the reference jac,
    # ik_gradient.cpp:269-292) — islands with random restarts recover most
    n_success, errs = solve_roundtrip(arm, arm_fk, rng, "jac_4", max_steps=32, n=4)
    assert n_success >= 2, (n_success, errs)
    assert np.median(errs) < 2e-2, errs


def test_gd_reduces_error(arm, arm_fk, rng):
    _, errs = solve_roundtrip(arm, arm_fk, rng, "gd_4", max_steps=32, n=2)
    # gd is a weak local solver (matches reference behavior); require
    # convergence to within a few cm rather than full tolerance
    assert np.median(errs) < 0.05, errs


def test_bio2_memetic_solves(arm, arm_fk, rng):
    n_success, errs = solve_roundtrip(arm, arm_fk, rng, "bio2_memetic", max_steps=16, n=4)
    assert n_success >= 2, (n_success, errs)
    assert np.median(errs) < 2e-3, errs


def test_bio2_nonmemetic_solves(arm, arm_fk, rng):
    n_success, errs = solve_roundtrip(arm, arm_fk, rng, "bio2", max_steps=16, n=2)
    assert np.median(errs) < 5e-3, errs


def test_bio2_with_secondary_goals(arm, arm_fk, rng):
    cfg = SolverConfig(mode="bio2_memetic", max_steps=16, dtwist=1e-3)
    s = IKSolver(
        arm,
        [G.PoseGoal(link=TIP), G.MinimalDisplacementGoal(weight=0.1)],
        cfg,
    )
    gp, gq = reachable_target(arm, arm_fk, rng)
    data = s.make_data(jnp.asarray(arm.neutral_q()))
    data["primary"][0]["position"] = jnp.asarray(gp)[None]
    data["primary"][0]["orientation"] = jnp.asarray(gq)[None]
    res = s.solve(jnp.asarray(arm.neutral_q()), key=jax.random.PRNGKey(0), data=data)
    t2 = arm_fk(res.q)
    err = np.linalg.norm(np.asarray(t2.pos)[0] - gp)
    # secondary pre-selection trims the effective child pool (reference:
    # ik_evolution_2.cpp:366-378), slowing convergence — allow 1 cm here
    assert err < 1e-2, err


def test_solve_batch(arm, arm_fk, rng):
    B = 4
    cfg = SolverConfig(mode="bio2_memetic", max_steps=8, dtwist=1e-3)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    qg = random_q(arm, rng, B)
    tg = arm_fk(jnp.asarray(qg))
    data0 = s.make_data(jnp.asarray(arm.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res = s.solve_batch(keys, data)
    assert res.q.shape == (B, arm.nvars)
    t2 = arm_fk(res.q)
    errs = np.linalg.norm(np.asarray(t2.pos)[:, 0] - np.asarray(tg.pos)[:, 0], axis=-1)
    assert np.median(errs) < 5e-2, errs


def test_solver_deterministic_under_fixed_key(arm, arm_fk, rng):
    """Fixed PRNG key ⇒ bitwise-identical result (impossible for the
    reference's thread-racing design; SURVEY §4 calls this out as a gain)."""
    cfg = SolverConfig(mode="bio2_memetic", max_steps=4)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    gp, gq = reachable_target(arm, arm_fk, rng)
    data = s.make_data(jnp.asarray(arm.neutral_q()))
    data["primary"][0]["position"] = jnp.asarray(gp)[None]
    data["primary"][0]["orientation"] = jnp.asarray(gq)[None]
    r1 = s.solve(jnp.asarray(arm.neutral_q()), key=jax.random.PRNGKey(7), data=data)
    r2 = s.solve(jnp.asarray(arm.neutral_q()), key=jax.random.PRNGKey(7), data=data)
    np.testing.assert_array_equal(np.asarray(r1.q), np.asarray(r2.q))


def test_unknown_mode_raises(arm):
    with pytest.raises(ValueError):
        IKSolver(arm, [G.PoseGoal(link=TIP)], SolverConfig(mode="nope"))
