"""Floating- and planar-joint coverage: FK vs oracles and end-to-end
solves on a floating-base arm.

The reference supports FLOATING (7-variable pos+quat,
forward_kinematics.h:120-127) and delegates other multi-DOF types to
MoveIt's computeTransform; bio2 renormalizes the quaternion gene blocks
of floating joints after reproduction (ik_evolution_2.cpp:320-324).
These robots exercise: the 7/3-variable windows in both the unrolled and
scan FK paths, default bounds for unlimited variables, the numeric
Jacobian fallback, bio2's quaternion renormalization, and the fused
engine's rejection of floating chains (vmapped fallback)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bio_ik_tpu.goals as G
from bio_ik_tpu import IKSolver, RobotModel, SolverConfig, asset_path
from bio_ik_tpu import native
from bio_ik_tpu.kinematics import make_fk
from tests.test_fk import random_q, scipy_fk


@pytest.mark.parametrize("urdf,tip", [("free_arm.urdf", "tool"),
                                      ("planar_arm.urdf", "tool")])
def test_fk_vs_scipy_oracle(urdf, tip, rng):
    m = RobotModel.from_urdf_file(asset_path(urdf))
    for unroll in (True, False):  # unrolled AND scan paths
        fk = jax.jit(make_fk(m, [tip], unroll=unroll))
        qs = random_q(m, rng, 16)
        tips = fk(jnp.asarray(qs))
        ti = m.link_index[tip]
        for k in range(16):
            opos, orot = scipy_fk(m, qs[k])[ti]
            np.testing.assert_allclose(np.asarray(tips.pos)[k, 0], opos,
                                       atol=5e-6)
            gq, oq = np.asarray(tips.quat)[k, 0], orot.as_quat()
            assert min(np.abs(gq - oq).max(), np.abs(gq + oq).max()) < 5e-6


def test_fk_vs_native_oracle(rng):
    if not native.available():
        pytest.skip("native oracle not built")
    m = RobotModel.from_urdf_file(asset_path("free_arm.urdf"))
    fk = jax.jit(make_fk(m, ["tool"]))
    qs = random_q(m, rng, 8)
    tips = fk(jnp.asarray(qs))
    opos, oquat = native.oracle_fk(m, qs.astype(np.float64), ["tool"])
    np.testing.assert_allclose(np.asarray(tips.pos)[:, 0], opos[:, 0],
                               atol=5e-6)


def test_floating_base_solve(rng):
    """bio2_memetic position goal on the floating-base arm: the fused
    species tier accepts the chain (quaternion genes renormalized
    in-kernel, SpeciesParams.quat_slices) and converges — the base can
    simply translate to the target."""
    m = RobotModel.from_urdf_file(asset_path("free_arm.urdf"))
    fk = make_fk(m, ["tool"])
    qg = random_q(m, rng)
    tg = fk(jnp.asarray(qg))
    cfg = SolverConfig(mode="bio2_memetic", max_steps=16,
                       dpos=5e-3, dtwist=float("inf"))
    s = IKSolver(m, [G.PositionGoal(link="tool")], cfg)
    assert s.engine is not None  # species tier, in-kernel quat renorm
    assert s.engine.sp.quat_slices  # the quat gene block was detected
    data = s.make_data(jnp.asarray(m.neutral_q()))
    data["primary"][0]["position"] = tg.pos
    # solve_batch(B=1) routes through the fused engine (the species
    # tier); solve() stays on the vmapped path — run both
    datab = jax.tree.map(lambda x: x[None], data)
    resb = s.solve_batch(jax.random.split(jax.random.PRNGKey(0), 1), datab)
    res = s.solve(jnp.asarray(m.neutral_q()), key=jax.random.PRNGKey(0),
                  data=data)
    vs = int(m.vstart[m.link_index["base"]])
    for r, q in ((resb, np.asarray(resb.q)[0]), (res, np.asarray(res.q))):
        t2 = fk(jnp.asarray(q)[None])
        err = float(np.linalg.norm(
            np.asarray(t2.pos)[0, 0] - np.asarray(tg.pos)[0]))
        assert err < 5e-3, err
        # the floating quaternion block of the solution must be normalized
        qn = np.linalg.norm(q[vs + 3 : vs + 7])
        assert abs(qn - 1.0) < 1e-2, qn


def test_jacobian_fd_columns(rng):
    """make_jacobian's floating-base columns (numeric fallback, reference:
    forward_kinematics.h:695-727) must match finite differences of FK —
    non-zero base columns, consistent with the analytic revolute columns."""
    from bio_ik_tpu.kinematics import make_jacobian
    from bio_ik_tpu.math.quat import (quat_conj, quat_mul,
                                      quat_to_rotvec_wrapped)

    m = RobotModel.from_urdf_file(asset_path("free_arm.urdf"))
    active = list(range(m.nvars))
    jac = jax.jit(make_jacobian(m, ["tool"], active))
    fk = jax.jit(make_fk(m, ["tool"]))
    q = jnp.asarray(random_q(m, rng), jnp.float32)
    tips0, J = jac(q)
    J = np.asarray(J)[0]                                  # (6, V)
    # floating base occupies vars [vs, vs+7): its columns must be non-zero
    vs = int(m.vstart[m.link_index["base"]])
    assert np.abs(J[:, vs : vs + 7]).max() > 0.1, J[:, vs : vs + 7]
    # every column ≈ central finite difference of (pos, rotvec)
    eps = 1e-3
    t0 = fk(q)
    for v in range(m.nvars):
        e = jnp.zeros(m.nvars, jnp.float32).at[v].set(eps)
        tp, tm = fk(q + e), fk(q - e)
        dpos = np.asarray(tp.pos - tm.pos)[0] / (2 * eps)
        rel = quat_mul(tp.quat, quat_conj(tm.quat))
        drot = np.asarray(quat_to_rotvec_wrapped(rel))[0] / (2 * eps)
        np.testing.assert_allclose(J[0:3, v], dpos, atol=2e-3)
        np.testing.assert_allclose(J[3:6, v], drot, atol=2e-3)


def test_jac_solver_floating_base(rng):
    """`jac` mode on the floating-base arm: with the FD fallback the
    least-squares step can translate the base toward the target."""
    m = RobotModel.from_urdf_file(asset_path("free_arm.urdf"))
    fk = make_fk(m, ["tool"])
    qg = random_q(m, rng)
    tg = fk(jnp.asarray(qg))
    cfg = SolverConfig(mode="jac", max_steps=32, dpos=1e-2,
                       dtwist=float("inf"))
    s = IKSolver(m, [G.PositionGoal(link="tool")], cfg)
    data = s.make_data(jnp.asarray(m.neutral_q()))
    data["primary"][0]["position"] = tg.pos
    res = s.solve(jnp.asarray(m.neutral_q()), key=jax.random.PRNGKey(0),
                  data=data)
    t2 = fk(res.q)
    err = float(np.linalg.norm(np.asarray(t2.pos)[0] - np.asarray(tg.pos)[0]))
    assert err < 1e-2, err
    # the base must actually have moved (non-zero FD columns in use)
    vs = int(m.vstart[m.link_index["base"]])
    base_disp = np.abs(np.asarray(res.q)[vs : vs + 3]
                       - np.asarray(m.neutral_q())[vs : vs + 3]).max()
    assert base_disp > 1e-4, base_disp


def test_planar_base_solve(rng):
    m = RobotModel.from_urdf_file(asset_path("planar_arm.urdf"))
    fk = make_fk(m, ["tool"])
    qg = random_q(m, rng)
    tg = fk(jnp.asarray(qg))
    cfg = SolverConfig(mode="bio2_memetic", max_steps=16,
                       dpos=5e-3, dtwist=float("inf"))
    s = IKSolver(m, [G.PositionGoal(link="tool")], cfg)
    data = s.make_data(jnp.asarray(m.neutral_q()))
    data["primary"][0]["position"] = tg.pos
    res = s.solve(jnp.asarray(m.neutral_q()), key=jax.random.PRNGKey(0),
                  data=data)
    t2 = fk(res.q)
    err = float(np.linalg.norm(np.asarray(t2.pos)[0] - np.asarray(tg.pos)[0]))
    assert err < 5e-3, err
