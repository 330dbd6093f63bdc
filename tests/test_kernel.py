"""Fused bio2 species-kernel tests (bio_ik_tpu/kernels/bio2_step.py) and
engine integration (bio_ik_tpu/engine.py).

The Pallas kernel and the plain-jnp inner share one source, so the
Pallas interpreter run must match the direct jnp evaluation bitwise on
identical inputs (the oracle-vs-kernel pattern of the reference's IKTest,
ik_test.cpp:40-137, applied to the blocked execution).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bio_ik_tpu.goals as G
from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.api import IKSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.engine import FusedBio2Engine
from bio_ik_tpu.kernels.bio2_step import (
    SpeciesParams,
    make_species_inner,
    make_species_kernel,
)
from bio_ik_tpu.kinematics import make_fk
from tests.test_fk import random_q

TIP = "r_gripper_tool_frame"


def _random_args(sp, N, seed=0):
    rng = np.random.default_rng(seed)

    def r(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    V, K, C = sp.V, sp.K, sp.C
    return (
        r(2 * V, N),                 # genes
        r(2 * V, N, scale=0.01),     # grads
        r(K * 7, N),                 # tips0
        r(V * K * 7, N, scale=0.1),  # deltas
        r(K * 3, N),                 # gpos
        r(K * 4, N),                 # gquat
        jnp.abs(r(K, N)),            # wpos
        jnp.abs(r(K, N)),            # wrot
        jnp.abs(r(V, N)) + 1.0,      # span
        jnp.full((V, N), -10.0),     # cmin
        jnp.full((V, N), 10.0),      # cmax
        r(sp.gens, V, C, N),         # noise
        jnp.abs(r(sp.gens, C, N, scale=1e-4)),  # rates
    )


@pytest.mark.parametrize("memetic", ["q", "l", ""])
def test_pallas_interpret_matches_jnp_inner(memetic):
    sp = SpeciesParams(V=3, K=2, C=4, gens=2, mem_iters=2, memetic=memetic)
    args = _random_args(sp, 256)
    g1, r1 = jax.jit(make_species_inner(sp))(*args)
    g2, r2 = make_species_kernel(sp, block_n=128, interpret=True)(*args)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_kernel_selection_keeps_best_two():
    """After one generation with zero noise/rates/grads, both parents must
    carry the best pool fitness (the seed parents themselves)."""
    sp = SpeciesParams(V=2, K=1, C=4, gens=1, mem_iters=0, memetic="")
    N = 128
    args = list(_random_args(sp, N))
    args[1] = jnp.zeros_like(args[1])    # grads = 0
    args[11] = jnp.zeros_like(args[11])  # noise = 0
    args[12] = jnp.zeros_like(args[12])  # rates = 0
    genes = args[0]
    g_out, _ = jax.jit(make_species_inner(sp))(*args)
    # all children equal parent 0 ⇒ per lane, the selected best is one of
    # the two original parents (selection is independent per lane)
    p0, p1 = np.asarray(genes[:2]), np.asarray(genes[2:4])
    o0 = np.asarray(g_out[:2])
    is_p0 = np.all(np.isclose(o0, p0), axis=0)
    is_p1 = np.all(np.isclose(o0, p1), axis=0)
    assert np.all(is_p0 | is_p1)


@pytest.fixture(scope="module")
def arm():
    return RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))


@pytest.fixture(scope="module")
def arm_fk(arm):
    return make_fk(arm, [TIP])


def test_engine_supports_classification(arm):
    s = IKSolver(arm, [G.PoseGoal(link=TIP)],
                 SolverConfig(mode="bio2_memetic", fused="off"))
    assert FusedBio2Engine.supports(s) is None
    s2 = IKSolver(arm, [G.PoseGoal(link=TIP), G.LookAtGoal(link=TIP)],
                  SolverConfig(mode="bio2_memetic", fused="off"))
    assert FusedBio2Engine.supports(s2) is not None
    s3 = IKSolver(arm, [G.PoseGoal(link=TIP)],
                  SolverConfig(mode="gd", fused="off"))
    assert FusedBio2Engine.supports(s3) is not None
    s4 = IKSolver(
        arm,
        [G.PoseGoal(link=TIP), G.MinimalDisplacementGoal(weight=0.1)],
        SolverConfig(mode="bio2_memetic", fused="off"),
    )
    assert FusedBio2Engine.supports(s4) is not None  # secondary goals


def test_engine_solves_and_is_deterministic(arm, arm_fk, rng):
    B = 8
    cfg = SolverConfig(mode="bio2_memetic", max_steps=16, dtwist=1e-3)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    assert s.engine is not None  # auto-routed
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
    errs = np.linalg.norm(
        np.asarray(t2.pos)[:, 0] - np.asarray(tg.pos)[:, 0], axis=-1
    )
    assert np.median(errs) < 5e-3, errs
    assert np.asarray(res.success).sum() >= B // 4, np.asarray(res.success)
    res2 = s.solve_batch(keys, data)
    np.testing.assert_array_equal(np.asarray(res.q), np.asarray(res2.q))


def test_engine_respects_position_only_goals(arm, arm_fk, rng):
    """Position and orientation goal groups fold into the fused fitness
    with the right weight rows (wrot = 0 / wpos = 0)."""
    B = 4
    cfg = SolverConfig(mode="bio2_memetic", max_steps=16, dtwist=1e-3)
    s = IKSolver(arm, [G.PositionGoal(link=TIP)], cfg)
    assert s.engine is not None
    qg = random_q(arm, rng, B)
    tg = arm_fk(jnp.asarray(qg))
    data0 = s.make_data(jnp.asarray(arm.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res = s.solve_batch(keys, data)
    t2 = arm_fk(res.q)
    errs = np.linalg.norm(
        np.asarray(t2.pos)[:, 0] - np.asarray(tg.pos)[:, 0], axis=-1
    )
    assert np.median(errs) < 5e-3, errs
