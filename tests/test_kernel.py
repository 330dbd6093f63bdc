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
    # every link-goal kind except touch/balance/link_function is fused
    # (fullstep tier); touch stays on the vmapped path
    s2 = IKSolver(arm, [G.PoseGoal(link=TIP), G.LookAtGoal(link=TIP)],
                  SolverConfig(mode="bio2_memetic", fused="off"))
    assert FusedBio2Engine.supports(s2) is None
    s2a = IKSolver(arm, [G.PoseGoal(link=TIP), G.LineGoal(link=TIP),
                         G.MaxDistanceGoal(link=TIP, distance=1.0),
                         G.ConeGoal(link=TIP)],
                   SolverConfig(mode="bio2_memetic", fused="off"))
    assert FusedBio2Engine.supports(s2a) is None
    s2b = IKSolver(arm, [G.PoseGoal(link=TIP), G.TouchGoal(link=TIP)],
                   SolverConfig(mode="bio2_memetic", fused="off"))
    assert FusedBio2Engine.supports(s2b) is not None
    s3 = IKSolver(arm, [G.PoseGoal(link=TIP)],
                  SolverConfig(mode="gd", fused="off"))
    assert FusedBio2Engine.supports(s3) is not None
    # joint-space secondary goals ARE fused now (in-kernel pre-selection)
    s4 = IKSolver(
        arm,
        [G.PoseGoal(link=TIP), G.MinimalDisplacementGoal(weight=0.1)],
        SolverConfig(mode="bio2_memetic", fused="off"),
    )
    assert FusedBio2Engine.supports(s4) is None
    # ... but an arbitrary-python-function secondary goal is not
    s5 = IKSolver(
        arm,
        [G.PoseGoal(link=TIP),
         G.JointFunctionGoal(variable_names=("r_shoulder_pan_joint",),
                             function=lambda v: v, secondary=True)],
        SolverConfig(mode="bio2_memetic", fused="off"),
    )
    assert FusedBio2Engine.supports(s5) is not None


def test_engine_smoke_deterministic(arm, arm_fk, rng):
    """Fast-tier engine round trip: 2 fused steps, B=2 — covers the
    engine path end-to-end at minimal XLA:CPU compile cost (the full
    16-step convergence round trips live in the slow tier)."""
    B = 2
    cfg = SolverConfig(mode="bio2_memetic", max_steps=2, steps_per_check=2,
                       dtwist=1e-3)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    assert s.engine is not None
    qg = random_q(arm, rng, B)
    tg = arm_fk(jnp.asarray(qg))
    data0 = s.make_data(jnp.asarray(arm.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res = s.solve_batch(keys, data)
    assert res.q.shape == (B, arm.nvars)
    assert np.all(np.isfinite(np.asarray(res.fitness)))
    # two steps must improve on the seed fitness
    f0 = np.asarray(s.problem.fitness(
        jnp.concatenate([arm_fk(data["seed_full"]).pos,
                         arm_fk(data["seed_full"]).quat], -1),
        data["seed_active"], data))
    assert np.all(np.asarray(res.fitness) <= f0 + 1e-6)
    res2 = s.solve_batch(keys, data)
    np.testing.assert_array_equal(np.asarray(res.q), np.asarray(res2.q))


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---- fullstep kernel (bio_ik_tpu/kernels/bio2_fullstep.py) ---------------


def test_fk_rows_matches_kinematics_fk(arm, rng):
    """Row-level in-kernel FK (fk_rows) vs the XLA FK on random configs."""
    from bio_ik_tpu.kernels.fk_rows import FkRows

    fkr = FkRows(arm, [TIP], list(range(arm.nvars)))
    assert fkr.fixed_vars == []
    N = 32
    q = random_q(arm, rng, N).astype(np.float32)
    xrows = [jnp.asarray(q[:, v][None, :]) for v in range(arm.nvars)]
    fr = fkr.frames(xrows, [])
    pos, quat = fkr.tips(fr)[0]
    ref = make_fk(arm, [TIP])(jnp.asarray(q))
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(pos[d])[0], np.asarray(ref.pos)[:, 0, d], atol=1e-5
        )
    for d in range(4):
        np.testing.assert_allclose(
            np.asarray(quat[d])[0], np.asarray(ref.quat)[:, 0, d], atol=1e-5
        )


def test_fk_rows_deltas_match_linearizer(arm, rng):
    from bio_ik_tpu.kernels.fk_rows import FkRows
    from bio_ik_tpu.kinematics import make_linearizer

    V = arm.nvars
    fkr = FkRows(arm, [TIP], list(range(V)))
    N = 16
    q = random_q(arm, rng, N).astype(np.float32)
    xrows = [jnp.asarray(q[:, v][None, :]) for v in range(V)]
    dts = fkr.deltas(fkr.frames(xrows, []))
    _, dl = make_linearizer(arm, [TIP], list(range(V)))(jnp.asarray(q))
    for v in range(V):
        dv = dts[v][0]
        for d in range(7):
            comp = dv[0][d] if d < 3 else dv[1][d - 3]
            refc = np.asarray(dl)[:, 0, v, d]
            got = np.full(N, comp) if isinstance(comp, float) else np.asarray(comp)[0]
            np.testing.assert_allclose(got, refc, atol=1e-4)


def test_fullstep_inner_matches_pallas_interpret(arm):
    """Fullstep Pallas (interpret) vs the plain-jnp inner, bitwise."""
    from bio_ik_tpu.kernels.bio2_fullstep import (
        make_fullstep_inner,
        make_fullstep_kernel,
    )

    V = arm.nvars
    sp = SpeciesParams(V=V, K=1, C=4, gens=2, mem_iters=2, memetic="q")
    inner, F = make_fullstep_inner(arm, [TIP], list(range(V)), [0], sp)
    kfn, F2 = make_fullstep_kernel(arm, [TIP], list(range(V)), [0], sp,
                                   block_n=128, interpret=True)
    assert F == F2 == 0
    N = 128
    rng = np.random.default_rng(3)

    def r(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    b = arm._np_bounds
    qmid = ((b["min"] + b["max"]) / 2).astype(np.float32)
    genes = jnp.asarray(np.tile(qmid, 2)[:, None] + rng.normal(
        size=(2 * V, N)).astype(np.float32) * 0.1)
    args = (
        genes, r(2 * V, N, scale=0.01), jnp.zeros((1, N), jnp.float32),
        r(3, N), r(4, N), jnp.abs(r(1, N)), jnp.abs(r(1, N)),
        jnp.abs(r(V, N)) + 1.0,
        jnp.asarray(np.tile(b["clip_min"].astype(np.float32)[:, None], (1, N))),
        jnp.asarray(np.tile(b["clip_max"].astype(np.float32)[:, None], (1, N))),
        r(sp.gens, V, sp.C, N), jnp.abs(r(sp.gens, sp.C, N, scale=1e-4)),
    )
    from bio_ik_tpu.kernels.bio2_fullstep import array_draw_gen

    g1, r1, t1, f1 = jax.jit(
        lambda *a: inner(*a[:-2], array_draw_gen(a[-2], a[-1]))
    )(*args)
    g2, r2, t2, f2 = kfn(*args)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_megastep_body_matches_pallas_interpret(arm):
    """Megastep Pallas (interpret, host noise) vs the plain-jnp body,
    bitwise — chunk of 2 steps incl. species swap/wipeout/incumbents."""
    from bio_ik_tpu.kernels.bio2_megastep import (
        make_megastep_body,
        make_megastep_kernel,
    )

    V = arm.nvars
    sp = SpeciesParams(V=V, K=1, C=4, gens=2, mem_iters=2, memetic="q")
    nst = 2
    body, F = make_megastep_body(
        arm, [TIP], list(range(V)), [0], sp, nst, use_pltpu_roll=False)
    kfn, F2 = make_megastep_kernel(
        arm, [TIP], list(range(V)), [0], sp, nst,
        block_n=128, interpret=True, inkernel_rng=False)
    assert F == F2 == 0
    N = 256
    rng = np.random.default_rng(7)

    def r(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    b = arm._np_bounds
    qmid = ((b["min"] + b["max"]) / 2).astype(np.float32)
    genes = jnp.asarray(np.tile(qmid, 2)[:, None] + rng.normal(
        size=(2 * V, N)).astype(np.float32) * 0.1)
    T7 = 7
    state = (
        genes, r(2 * V, N, scale=0.01),
        jnp.full((1, N), np.inf, jnp.float32),        # sfit
        genes[:V],                                    # sol
        jnp.full((1, N), 1e30, jnp.float32),          # sol_fit
        jnp.zeros((T7, N), jnp.float32),              # sol_tips
    )
    cmin = jnp.asarray(np.tile(b["clip_min"].astype(np.float32)[:, None],
                               (1, N)))
    cmax = jnp.asarray(np.tile(b["clip_max"].astype(np.float32)[:, None],
                               (1, N)))
    consts = (
        jnp.zeros((1, N), jnp.float32),               # qfix (dummy)
        r(3, N), r(4, N), jnp.abs(r(1, N)), jnp.abs(r(1, N)),
        jnp.abs(r(V, N)) + 1.0, cmin, cmax, cmin, cmax,
    )
    noise = r(nst * sp.gens, V, sp.C, N)
    rates = jnp.abs(r(nst * sp.gens, sp.C, N, scale=1e-4))
    wu = jnp.asarray(rng.uniform(size=(nst, 1, N)).astype(np.float32))
    wg = jnp.asarray(rng.uniform(size=(nst, V, N)).astype(np.float32))

    from bio_ik_tpu.kernels.bio2_fullstep import array_draw_gen

    def draw(i):
        g0 = i * sp.gens
        return (
            array_draw_gen(
                jax.lax.dynamic_slice_in_dim(noise, g0, sp.gens, 0),
                jax.lax.dynamic_slice_in_dim(rates, g0, sp.gens, 0),
            ),
            jax.lax.dynamic_slice_in_dim(wu, i, 1, 0)[0],
            jax.lax.dynamic_slice_in_dim(wg, i, 1, 0)[0],
        )

    out1 = jax.jit(lambda st, co: body(st, co, draw))(state, consts)
    out2 = kfn(*state, *consts, noise, rates, wu, wg)
    for a, b2 in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


@pytest.mark.slow
def test_megastep_secondary_matches_pallas_interpret(arm):
    """Secondary-goal megastep (pre-selection + combined memetic) —
    Pallas interpret vs plain-jnp body, bitwise."""
    from bio_ik_tpu.kernels.bio2_fullstep import array_draw_gen
    from bio_ik_tpu.kernels.bio2_megastep import (
        make_megastep_body,
        make_megastep_kernel,
    )

    V = arm.nvars
    sp = SpeciesParams(V=V, K=1, C=4, gens=2, mem_iters=2, memetic="q")
    nst = 2
    sec_terms = ("alpha", "beta", "delta", "gamma")
    body, F = make_megastep_body(
        arm, [TIP], list(range(V)), [0], sp, nst, use_pltpu_roll=False,
        sec_terms=sec_terms)
    kfn, F2 = make_megastep_kernel(
        arm, [TIP], list(range(V)), [0], sp, nst,
        block_n=128, interpret=True, inkernel_rng=False,
        sec_terms=sec_terms)
    assert F == F2 == 0
    N = 256
    rng = np.random.default_rng(11)

    def r(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    b = arm._np_bounds
    qmid = ((b["min"] + b["max"]) / 2).astype(np.float32)
    genes = jnp.asarray(np.tile(qmid, 2)[:, None] + rng.normal(
        size=(2 * V, N)).astype(np.float32) * 0.1)
    state = (
        genes, r(2 * V, N, scale=0.01),
        jnp.full((1, N), np.inf, jnp.float32),
        genes[:V],
        jnp.full((1, N), 1e30, jnp.float32),
        jnp.zeros((7, N), jnp.float32),
    )
    cmin = jnp.asarray(np.tile(b["clip_min"].astype(np.float32)[:, None],
                               (1, N)))
    cmax = jnp.asarray(np.tile(b["clip_max"].astype(np.float32)[:, None],
                               (1, N)))
    # packed sec rows: positive coefficients, plausible centers
    sec = jnp.concatenate([
        jnp.abs(r(V, N, scale=0.1)),                  # alpha
        jnp.abs(r(V, N, scale=0.1)),                  # beta
        jnp.abs(r(V, N, scale=0.1)),                  # gamma
        jnp.abs(r(V, N, scale=0.1)),                  # delta
        r(V, N, scale=0.3),                           # tbar
        jnp.asarray(np.tile(qmid[:, None], (1, N))),  # mid
        jnp.abs(r(V, N)) + 0.5,                       # hspan
        r(V, N, scale=0.3),                           # seed
    ], axis=0)
    consts = (
        jnp.zeros((1, N), jnp.float32),
        r(3, N), r(4, N), jnp.abs(r(1, N)), jnp.abs(r(1, N)),
        jnp.abs(r(V, N)) + 1.0, cmin, cmax, cmin, cmax, sec,
    )
    noise = r(nst * sp.gens, V, sp.C, N)
    rates = jnp.abs(r(nst * sp.gens, sp.C, N, scale=1e-4))
    keep = jnp.asarray(rng.uniform(size=(nst * sp.gens, 1, N))
                       .astype(np.float32))
    wu = jnp.asarray(rng.uniform(size=(nst, 1, N)).astype(np.float32))
    wg = jnp.asarray(rng.uniform(size=(nst, V, N)).astype(np.float32))

    def draw(i):
        g0 = i * sp.gens
        return (
            array_draw_gen(
                jax.lax.dynamic_slice_in_dim(noise, g0, sp.gens, 0),
                jax.lax.dynamic_slice_in_dim(rates, g0, sp.gens, 0),
                jax.lax.dynamic_slice_in_dim(keep, g0, sp.gens, 0),
            ),
            jax.lax.dynamic_slice_in_dim(wu, i, 1, 0)[0],
            jax.lax.dynamic_slice_in_dim(wg, i, 1, 0)[0],
        )

    out1 = jax.jit(lambda st, co: body(st, co, draw))(state, consts)
    out2 = kfn(*state, *consts, noise, rates, wu, wg, keep)
    for a, b2 in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


@pytest.mark.slow
def test_megastep_aux_kinds_match_pallas_interpret(arm):
    """Non-pose goal-kind megastep (lookat/line/plane/distance/direction/
    side errors + partial gradients) — Pallas interpret vs plain-jnp
    body, bitwise."""
    from bio_ik_tpu.kernels.bio2_fullstep import array_draw_gen
    from bio_ik_tpu.kernels.bio2_megastep import (
        make_megastep_body,
        make_megastep_kernel,
    )

    V = arm.nvars
    inst_kind = ["pose", "lookat", "line", "plane", "max_distance",
                 "min_distance", "direction", "side", "cone"]
    K = len(inst_kind)
    sp = SpeciesParams(V=V, K=K, C=4, gens=2, mem_iters=2, memetic="q")
    nst = 2
    body, F = make_megastep_body(
        arm, [TIP], list(range(V)), [0] * K, sp, nst, use_pltpu_roll=False,
        inst_kind=inst_kind)
    kfn, F2 = make_megastep_kernel(
        arm, [TIP], list(range(V)), [0] * K, sp, nst,
        block_n=128, interpret=True, inkernel_rng=False,
        inst_kind=inst_kind)
    assert F == F2 == 0
    N = 256
    rng = np.random.default_rng(13)

    def r(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    b = arm._np_bounds
    qmid = ((b["min"] + b["max"]) / 2).astype(np.float32)
    genes = jnp.asarray(np.tile(qmid, 2)[:, None] + rng.normal(
        size=(2 * V, N)).astype(np.float32) * 0.1)
    state = (
        genes, r(2 * V, N, scale=0.01),
        jnp.full((1, N), np.inf, jnp.float32),
        genes[:V],
        jnp.full((1, N), 1e30, jnp.float32),
        jnp.zeros((7, N), jnp.float32),
    )
    cmin = jnp.asarray(np.tile(b["clip_min"].astype(np.float32)[:, None],
                               (1, N)))
    cmax = jnp.asarray(np.tile(b["clip_max"].astype(np.float32)[:, None],
                               (1, N)))
    # unit aux vectors (axis / line direction / plane normal) per instance
    aux = rng.normal(size=(K, 3)).astype(np.float32)
    aux /= np.linalg.norm(aux, axis=-1, keepdims=True)
    aux_rows = np.tile(aux.reshape(K * 3, 1), (1, N))
    consts = (
        jnp.zeros((1, N), jnp.float32),
        r(K * 3, N), r(K * 4, N), jnp.asarray(aux_rows),  # gpos,gquat,gaux
        jnp.abs(r(K, N)), jnp.abs(r(K, N)),
        jnp.abs(r(V, N)) + 1.0, cmin, cmax, cmin, cmax,
    )
    noise = r(nst * sp.gens, V, sp.C, N)
    rates = jnp.abs(r(nst * sp.gens, sp.C, N, scale=1e-4))
    wu = jnp.asarray(rng.uniform(size=(nst, 1, N)).astype(np.float32))
    wg = jnp.asarray(rng.uniform(size=(nst, V, N)).astype(np.float32))

    def draw(i):
        g0 = i * sp.gens
        return (
            array_draw_gen(
                jax.lax.dynamic_slice_in_dim(noise, g0, sp.gens, 0),
                jax.lax.dynamic_slice_in_dim(rates, g0, sp.gens, 0),
            ),
            jax.lax.dynamic_slice_in_dim(wu, i, 1, 0)[0],
            jax.lax.dynamic_slice_in_dim(wg, i, 1, 0)[0],
        )

    out1 = jax.jit(lambda st, co: body(st, co, draw))(state, consts)
    out2 = kfn(*state, *consts, noise, rates, wu, wg)
    for a, b2 in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


@pytest.mark.slow
def test_engine_solves_lookat(arm, arm_fk, rng):
    """A pose + lookat problem keeps the fused path and converges to the
    same quality as the vmapped evaluator's math (both use the
    normalized-direction error, goal_types.h:183-211)."""
    B = 4
    cfg = SolverConfig(mode="bio2_memetic", max_steps=16, dpos=1e-2,
                       dtwist=float("inf"))
    s = IKSolver(
        arm,
        [G.PositionGoal(link=TIP),
         G.LookAtGoal(link=TIP, axis=(1.0, 0.0, 0.0),
                      target=(1.0, 0.0, 0.5), weight=0.5)],
        cfg,
    )
    assert s.engine is not None and s.engine.has_aux
    qg = random_q(arm, rng, B)
    tg = arm_fk(jnp.asarray(qg))
    data0 = s.make_data(jnp.asarray(arm.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res = s.solve_batch(keys, data)
    t2 = arm_fk(res.q)
    errs = np.linalg.norm(
        np.asarray(t2.pos)[:, 0] - np.asarray(tg.pos)[:, 0], axis=-1)
    assert np.median(errs) < 2e-2, errs
    # the gripper x-axis must point at the lookat target
    from scipy.spatial.transform import Rotation as R

    rot = R.from_quat(np.asarray(t2.quat)[:, 0])
    v = rot.apply(np.array([1.0, 0, 0]))
    d = np.array([1.0, 0, 0.5]) - np.asarray(t2.pos)[:, 0]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ang = np.degrees(np.arccos(np.clip(np.sum(v * d, axis=-1), -1, 1)))
    assert np.median(ang) < 10.0, ang


@pytest.mark.slow
def test_engine_solves_with_secondary_goals(arm, arm_fk, rng):
    """The reference's recommended regularizer config (pose +
    MinimalDisplacement + AvoidJointLimits, kinematics_plugin.cpp:286-329)
    keeps the fused fast path and still solves."""
    B = 4
    cfg = SolverConfig(mode="bio2_memetic", max_steps=16, dtwist=1e-3)
    s = IKSolver(
        arm,
        [G.PoseGoal(link=TIP), G.MinimalDisplacementGoal(weight=0.05),
         G.AvoidJointLimitsGoal(weight=0.05)],
        cfg,
    )
    assert s.engine is not None and s.engine.fullstep
    assert s.engine.sec_terms == ("beta", "gamma")
    qg = random_q(arm, rng, B)
    tg = arm_fk(jnp.asarray(qg))
    data0 = s.make_data(jnp.asarray(arm.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res = s.solve_batch(keys, data)
    t2 = arm_fk(res.q)
    errs = np.linalg.norm(
        np.asarray(t2.pos)[:, 0] - np.asarray(tg.pos)[:, 0], axis=-1
    )
    assert np.median(errs) < 1e-2, errs


@pytest.mark.slow
def test_engine_honors_per_scenario_keys(arm, arm_fk, rng):
    """solve_batch on the ENGINE path must honor each entry of ``keys``:
    changing keys[i] re-randomizes scenario i only; identical keys
    reproduce bitwise (VERDICT r3 weak #1 — previously keys[1:] were
    dead on the fused path)."""
    B = 4
    cfg = SolverConfig(mode="bio2_memetic", max_steps=8, dtwist=1e-3)
    s = IKSolver(arm, [G.PoseGoal(link=TIP)], cfg)
    assert s.engine is not None
    qg = random_q(arm, rng, B)
    tg = arm_fk(jnp.asarray(qg))
    data0 = s.make_data(jnp.asarray(arm.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res1 = s.solve_batch(keys, data)
    keys2 = keys.at[2].set(jax.random.PRNGKey(999))
    res2 = s.solve_batch(keys2, data)
    q1, q2 = np.asarray(res1.qa), np.asarray(res2.qa)
    # untouched scenarios bitwise identical; scenario 2 re-randomized
    for i in (0, 1, 3):
        np.testing.assert_array_equal(q1[i], q2[i])
    assert not np.array_equal(q1[2], q2[2])


def test_gauss_mode_reaches_engine(arm):
    """config.gauss_mode is plumbed through to the fused kernels (ADVICE
    r3: previously unreachable from the public API)."""
    s = IKSolver(arm, [G.PoseGoal(link=TIP)],
                 SolverConfig(mode="bio2_memetic", max_steps=4,
                              gauss_mode="box_muller"))
    assert s.engine is not None
    assert s.engine.config.gauss_mode == "box_muller"
    with pytest.raises(ValueError, match="gauss_mode"):
        SolverConfig(gauss_mode="nope")


def test_engine_uses_fullstep_for_pr2(arm):
    s = IKSolver(arm, [G.PoseGoal(link=TIP)],
                 SolverConfig(mode="bio2_memetic", max_steps=4))
    assert s.engine is not None and s.engine.fullstep


@pytest.mark.slow
def test_adaptive_on_device_pipeline(arm, arm_fk, rng):
    """Single-program multi-phase retry with on-device failure compaction."""
    from bio_ik_tpu.api import AdaptiveBatchSolver

    B = 8
    s = AdaptiveBatchSolver(
        arm, [G.PoseGoal(link=TIP)],
        SolverConfig(mode="bio2_memetic", dtwist=1e-3),
        phases=((1, 4), (2, 16)), fractions=(0.75,),
    )
    assert s._fused_adaptive is not None
    qg = random_q(arm, rng, B)
    tg = arm_fk(jnp.asarray(qg))
    data0 = s.make_data(jnp.asarray(arm.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res = s.solve_batch(keys, data)
    t2 = arm_fk(res.q)
    errs = np.linalg.norm(
        np.asarray(t2.pos)[:, 0] - np.asarray(tg.pos)[:, 0], axis=-1
    )
    assert np.median(errs) < 1e-2, errs
