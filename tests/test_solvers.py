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
    n_success, errs = solve_roundtrip(arm, arm_fk, rng, "bio2", max_steps=32, n=2)
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


def test_rewrap_toward_seed(arm, arm_fk, rng):
    """Continuous-joint solutions are shifted by 2π multiples toward the
    seed (reference: kinematics_plugin.cpp:580-613)."""
    cfg = SolverConfig(mode="bio2_memetic", max_steps=8, dtwist=1e-3)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    gp, gq = reachable_target(arm, arm_fk, rng)
    seed = arm.neutral_q()
    i = arm.var_index["r_forearm_roll_joint"]  # continuous joint
    seed[i] = 2.5
    data = s.make_data(jnp.asarray(seed))
    data["primary"][0]["position"] = jnp.asarray(gp)[None]
    data["primary"][0]["orientation"] = jnp.asarray(gq)[None]
    res = s.solve(jnp.asarray(seed), key=jax.random.PRNGKey(0), data=data)
    # after rewrap the continuous joint lands inside its reported [-π, π]
    # range (like the reference, which wraps at getMin/getMax after moving
    # toward the seed), and FK is unchanged modulo 2π
    assert -np.pi - 1e-5 <= float(res.q[i]) <= np.pi + 1e-5
    t2 = arm_fk(res.q)
    err = np.linalg.norm(np.asarray(t2.pos)[0] - gp)
    assert err < 5e-2, err


def test_for_tips_default_goals(arm):
    """Default-goal construction (reference: kinematics_plugin.cpp:273-330)."""
    cfg = SolverConfig(
        mode="bio2_memetic", avoid_joint_limits_weight=0.5,
        minimal_displacement_weight=0.1,
    )
    s = IKSolver.for_tips(arm, [TIP], cfg)
    assert len(s.problem.primary) == 1      # pose group
    assert len(s.problem.secondary) == 2    # the two regularizers
    cfg2 = cfg.replace(position_only_ik=True)
    s2 = IKSolver.for_tips(arm, [TIP], cfg2)
    # rotation_scale 0 ⇒ orientation has no influence on fitness
    assert float(s2.problem.primary[0].params["rotation_scale_sq"][0]) == 0.0


def test_solve_until_early_exit(arm, arm_fk, rng):
    """Latency mode stops at the first accepted solution
    (reference analog: ik_parallel.h:160-190 first-success race)."""
    cfg = SolverConfig(mode="bio2_memetic", max_steps=64, steps_per_check=2, dtwist=1e-3)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    gp, gq = reachable_target(arm, arm_fk, rng)
    data = s.make_data(jnp.asarray(arm.neutral_q()))
    data["primary"][0]["position"] = jnp.asarray(gp)[None]
    data["primary"][0]["orientation"] = jnp.asarray(gq)[None]
    res = s.solve_until(jnp.asarray(arm.neutral_q()), key=jax.random.PRNGKey(0), data=data)
    assert bool(res.success)
    t2 = arm_fk(res.q)
    assert np.linalg.norm(np.asarray(t2.pos)[0] - gp) < 2e-3


def test_optlib_lbfgs_solves(arm, arm_fk, rng):
    """optax-L-BFGS analog of the cppoptlib modes
    (reference: ik_cppoptlib.cpp:72-257, optional)."""
    n_success, errs = solve_roundtrip(arm, arm_fk, rng, "optlib_lbfgs_4",
                                      max_steps=16, n=2)
    assert np.median(errs) < 2e-2, errs


@pytest.mark.slow
def test_bio1_solves(arm, arm_fk, rng):
    _, errs = solve_roundtrip(arm, arm_fk, rng, "bio1", max_steps=8, n=2)
    assert np.median(errs) < 5e-2, errs


@pytest.mark.slow
def test_bio1_linear_fitness_random_mix(arm, arm_fk, rng):
    """linear_fitness mode evaluates offspring with a RANDOM per-goal
    position/rotation weight (reference: computeFitness(genes, false),
    ik_evolution_1.cpp:250, 384, 457) — the random branch must be live
    (key-dependent) while the balanced comparisons keep w=0.5."""
    from bio_ik_tpu.problem import Problem
    from bio_ik_tpu.solvers.base import SolverContext, make_solver

    cfg = SolverConfig(mode="bio1", linear_fitness=True, max_steps=4)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    solver = s.solver
    data = s.make_data(jnp.asarray(arm.neutral_q()))
    g = jnp.asarray(random_q(arm, rng)[s.problem.active_vars])
    f_bal = solver._fitness(g, data)
    fa = solver._fitness(g, data, key=jax.random.PRNGKey(1), balanced=False)
    fb = solver._fitness(g, data, key=jax.random.PRNGKey(2), balanced=False)
    assert float(fa) != float(fb), (fa, fb)       # random branch is live
    assert float(f_bal) == float(solver._fitness(g, data))  # balanced stable
    # and the full solve still reduces error
    gp, gq = reachable_target(arm, arm_fk, rng)
    data["primary"][0]["position"] = jnp.asarray(gp)[None]
    data["primary"][0]["orientation"] = jnp.asarray(gq)[None]
    res = s.solve(jnp.asarray(arm.neutral_q()), key=jax.random.PRNGKey(0),
                  data=data)
    t2 = arm_fk(res.q)
    assert np.linalg.norm(np.asarray(t2.pos)[0] - gp) < 0.3


def test_solve_stats_counter(arm, arm_fk, rng):
    """config.counter enables the §5.5 observability accumulator
    (reference: per-query iteration-count logging, ik_parallel.h:263-266)."""
    cfg = SolverConfig(mode="bio2_memetic", max_steps=4, counter=True)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    assert s.stats is not None
    gp, gq = reachable_target(arm, arm_fk, rng)
    data = s.make_data(jnp.asarray(arm.neutral_q()))
    data["primary"][0]["position"] = jnp.asarray(gp)[None]
    data["primary"][0]["orientation"] = jnp.asarray(gq)[None]
    s.solve(jnp.asarray(arm.neutral_q()), key=jax.random.PRNGKey(0), data=data)
    B = 3
    datab = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    s.solve_batch(keys, datab)
    summ = s.stats.summary()
    assert summ["queries"] == 1 + B and summ["batches"] == 2
    assert 0.0 <= summ["success_rate"] <= 1.0 and summ["wall_s"] > 0
    assert "queries" in s.stats.report() or summ["queries"] == 4


def test_adaptive_batch_solver(arm, arm_fk, rng):
    """Failure-compaction multi-phase batching recovers failures from the
    cheap first pass."""
    from bio_ik_tpu.api import AdaptiveBatchSolver

    B = 8
    s = AdaptiveBatchSolver(
        arm, [G.PoseGoal(link=TIP)],
        SolverConfig(mode="bio2_memetic", dtwist=1e-3),
        phases=((1, 4), (2, 16)), chunk_fraction=0.5,
    )
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
    assert np.median(errs) < 5e-3, errs


def test_registry_has_optional_modes():
    names = solver_names()
    # optional reference modes (cppoptlib/FANN equivalents + diagnostics)
    for n in ["bio2_memetic_lbfgs", "optlib_lbfgs", "optlib_lbfgs_r_4",
              "neural", "neural2", "test"]:
        assert n in names, n
    # all 7 cppoptlib solver families × reset/island suffixes
    # (reference: ik_cppoptlib.cpp:241-257 registration lines)
    for v in ["lbfgs", "bfgs", "lbfgsb", "gd", "cgd", "nd", "nm"]:
        for suffix in ["", "_r", "_2", "_r_8"]:
            assert f"optlib_{v}{suffix}" in names, (v, suffix)


@pytest.mark.parametrize("variant", ["lbfgsb", "cgd", "nd", "nm"])
def test_optlib_derivative_variants_reduce_error(arm, arm_fk, rng, variant):
    """Bound-projected / CG / Newton / simplex cppoptlib analogs
    (reference: ik_cppoptlib.cpp:241-257).  Coarser optimizers — assert
    substantial error reduction from the neutral seed, not convergence."""
    cfg = SolverConfig(mode=f"optlib_{variant}", max_steps=12, dtwist=1e-3)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    gp, gq = reachable_target(arm, arm_fk, rng)
    data = s.make_data(jnp.asarray(arm.neutral_q()))
    data["primary"][0]["position"] = jnp.asarray(gp)[None]
    data["primary"][0]["orientation"] = jnp.asarray(gq)[None]
    seed = jnp.asarray(arm.neutral_q())
    err0 = np.linalg.norm(np.asarray(arm_fk(seed).pos)[0] - gp)
    res = s.solve(seed, key=jax.random.PRNGKey(0), data=data)
    err = np.linalg.norm(np.asarray(arm_fk(res.q).pos)[0] - gp)
    assert err < max(0.5 * err0, 2e-2), (variant, err0, err)
    if variant == "lbfgsb":  # projected iterates must respect the box
        qa = np.asarray(res.q)[np.asarray(s.solver.ctx.av)]
        lo = np.asarray(s.problem.aclip_min) - 1e-6
        hi = np.asarray(s.problem.aclip_max) + 1e-6
        assert np.all(qa >= lo) and np.all(qa <= hi)


@pytest.mark.slow
def test_bio2_memetic_lbfgs_solves(arm, arm_fk, rng):
    """L-BFGS memetic variant (reference: bio2_memetic_lbfgs,
    ik_evolution_2.cpp:656-658, optional behind USE_CPPOPTLIB)."""
    n_success, errs = solve_roundtrip(arm, arm_fk, rng, "bio2_memetic_lbfgs",
                                      max_steps=16, n=2)
    assert np.median(errs) < 1e-2, errs


@pytest.mark.slow
def test_neural_solver_reduces_error(arm, arm_fk, rng):
    """MLP twist→Δq solver (reference: IKNeural, ik_neural.cpp:135-427).
    Like the reference's, a coarse approximator — assert improvement over
    the seed, not full convergence."""
    cfg = SolverConfig(mode="neural", max_steps=16, dtwist=1e-3,
                       neural_train_steps=400)  # CPU test budget
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    gp, gq = reachable_target(arm, arm_fk, rng)
    seed = jnp.asarray(arm.neutral_q())
    data = s.make_data(seed)
    data["primary"][0]["position"] = jnp.asarray(gp)[None]
    data["primary"][0]["orientation"] = jnp.asarray(gq)[None]
    err0 = np.linalg.norm(np.asarray(arm_fk(seed).pos)[0] - gp)
    res = s.solve(seed, key=jax.random.PRNGKey(0), data=data)
    err = np.linalg.norm(np.asarray(arm_fk(res.q).pos)[0] - gp)
    assert err < err0, (err, err0)


@pytest.mark.slow
def test_neural2_solver_regresses_pose(arm, arm_fk, rng):
    """Direct pose→q regression (reference: IKNeural2, ik_neural.cpp:432-689)."""
    cfg = SolverConfig(mode="neural2", max_steps=2, dtwist=1e-3,
                       neural_train_steps=600)  # CPU test budget
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    gp, gq = reachable_target(arm, arm_fk, rng)
    seed = jnp.asarray(arm.neutral_q())
    data = s.make_data(seed)
    data["primary"][0]["position"] = jnp.asarray(gp)[None]
    data["primary"][0]["orientation"] = jnp.asarray(gq)[None]
    res = s.solve(seed, key=jax.random.PRNGKey(0), data=data)
    err = np.linalg.norm(np.asarray(arm_fk(res.q).pos)[0] - gp)
    # network regression accuracy, not solver accuracy (reference's
    # neural2 is similarly coarse)
    assert err < 0.5, err


def test_test_mode_reports_approx_error(arm, arm_fk, rng):
    """Diagnostic mode 'test' (reference: IKTest, ik_test.cpp:40-137):
    linearizer-vs-exact-FK error stats; solution == seed."""
    cfg = SolverConfig(mode="test", max_steps=2)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    seed = jnp.asarray(arm.neutral_q())
    state = s.solver.init(jax.random.PRNGKey(0), s.make_data(seed),
                          jnp.zeros((), bool))
    assert float(state.pos_err) < 5e-3, float(state.pos_err)   # ±0.1 rad probes
    assert float(state.rot_err) < 5e-2, float(state.rot_err)
    st2 = s.solver.step(state, s.make_data(seed))
    np.testing.assert_array_equal(np.asarray(st2.qa), np.asarray(state.qa))


def test_triangular_selection_distribution():
    """Histogram of the triangular parent-selection distribution matches
    the expected weights — the counterpart of the reference's own
    linear_int_distribution unit test (reference: test/utest.cpp:83-111,
    1M samples vs weights n−i).  Also covers the masked shrinking-pool
    case (reference: survivor-pool removal, ik_evolution_1.cpp:518-533),
    which the reference's scalar distribution cannot express."""
    from bio_ik_tpu.solvers.bio1 import _triangular_pick

    n, iters = 8, 200_000
    keys = jax.random.split(jax.random.PRNGKey(0), iters)

    # full pool: weight of rank i is n - i
    mask = jnp.ones((n,), bool)
    picks = jax.jit(jax.vmap(lambda k: _triangular_pick(k, mask)))(keys)
    v = np.bincount(np.asarray(picks), minlength=n) / iters
    r = np.arange(n, 0, -1, dtype=np.float64)
    r /= r.sum()
    np.testing.assert_allclose(v, r, atol=0.004)    # ~4 sigma at 200k

    # masked pool: only entries {1, 3, 4, 6} selectable; their weights
    # follow the triangular law over the ACTIVE ranks (4, 3, 2, 1)
    mask2 = jnp.asarray([False, True, False, True, True, False, True, False])
    picks2 = jax.jit(jax.vmap(lambda k: _triangular_pick(k, mask2)))(keys)
    counts = np.bincount(np.asarray(picks2), minlength=n) / iters
    assert counts[~np.asarray(mask2)].sum() == 0.0  # never an inactive pick
    want = np.zeros(n)
    want[[1, 3, 4, 6]] = np.array([4.0, 3.0, 2.0, 1.0]) / 10.0
    np.testing.assert_allclose(counts, want, atol=0.004)
