"""Linearizer / mutation-approximator error-bound tests.

Mirrors the reference's `IKTest` oracle comparison (reference:
src/ik_test.cpp:92-128): approximate tip frames under random ±0.1 rad
mutations must stay close to exact FK, and converge linearly as the
mutation shrinks.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.kinematics import (
    apply_deltas,
    apply_deltas_single,
    make_fk,
    make_jacobian,
    make_linearizer,
)
from tests.test_fk import random_q


def setup(urdf, tip):
    m = RobotModel.from_urdf_file(asset_path(urdf))
    av = m.actuated_variables()
    fk = jax.jit(make_fk(m, [tip]))
    lin = jax.jit(make_linearizer(m, [tip], av))
    return m, av, fk, lin


def exact_tips_packed(m, fk, q, av, dq):
    qfull = np.tile(np.asarray(q), (dq.shape[0], 1))
    for i, v in enumerate(av):
        qfull[:, v] += dq[:, i]
    t = fk(jnp.asarray(qfull))
    return np.concatenate([np.asarray(t.pos), np.asarray(t.quat)], axis=-1)


def test_approx_error_small_mutations(rng):
    m, av, fk, lin = setup("pr2_arm.urdf", "r_gripper_tool_frame")
    q = random_q(m, rng)
    tips0, deltas = lin(jnp.asarray(q))
    dq = rng.normal(size=(64, len(av))).astype(np.float32) * 0.01
    approx = np.asarray(apply_deltas(tips0, deltas, jnp.asarray(dq)))
    exact = exact_tips_packed(m, fk, q, av, dq)
    err = np.abs(approx - exact).max()
    assert err < 5e-4, err  # first-order error ~ O(|dq|²)


def test_approx_linear_convergence(rng):
    """Halving the mutation must quarter the error (2nd-order remainder)."""
    m, av, fk, lin = setup("ur5.urdf", "tool0")
    q = random_q(m, rng)
    tips0, deltas = lin(jnp.asarray(q))
    direction = rng.normal(size=(1, len(av))).astype(np.float32)
    errs = []
    for scale in (0.2, 0.1, 0.05):
        dq = direction * scale
        approx = np.asarray(apply_deltas(tips0, deltas, jnp.asarray(dq)))
        exact = exact_tips_packed(m, fk, q, av, dq)
        errs.append(np.abs(approx - exact).max())
    assert errs[1] < errs[0] * 0.35
    assert errs[2] < errs[1] * 0.35


def test_approx_at_linearization_point(rng):
    m, av, fk, lin = setup("pr2_arm.urdf", "r_gripper_tool_frame")
    q = random_q(m, rng)
    tips0, deltas = lin(jnp.asarray(q))
    approx = np.asarray(apply_deltas(tips0, deltas, jnp.zeros((1, len(av)), jnp.float32)))
    exact = exact_tips_packed(m, fk, q, av, np.zeros((1, len(av)), np.float32))
    np.testing.assert_allclose(approx, exact, atol=1e-6)


def test_apply_deltas_single_matches_full(rng):
    m, av, fk, lin = setup("pr2_arm.urdf", "r_gripper_tool_frame")
    q = random_q(m, rng)
    tips0, deltas = lin(jnp.asarray(q))
    i, d = 3, 0.05
    dq = np.zeros((1, len(av)), np.float32)
    dq[0, i] = d
    full = np.asarray(apply_deltas(tips0, deltas, jnp.asarray(dq)))[0]
    single = np.asarray(apply_deltas_single(tips0, deltas, i, d))
    np.testing.assert_allclose(single, full, atol=1e-7)


def test_jacobian_finite_difference(rng):
    m, av, fk, _ = setup("ur5.urdf", "tool0")
    jac = jax.jit(make_jacobian(m, ["tool0"], av))
    q = random_q(m, rng)
    tips0, J = jac(jnp.asarray(q))
    J = np.asarray(J)  # (T, 6, V)
    eps = 1e-3
    for i, v in enumerate(av):
        qp = np.asarray(q).copy()
        qp[v] += eps
        tp = fk(jnp.asarray(qp))
        dpos = (np.asarray(tp.pos)[0] - np.asarray(tips0.pos)[0]) / eps
        np.testing.assert_allclose(J[0, :3, i], dpos, atol=5e-3)
        # angular part: dq = 0.5 * (ω,0) ⊗ q  ⇒ check ω via quat difference
        dq_num = (np.asarray(tp.quat)[0] - np.asarray(tips0.quat)[0]) / eps
        q0 = np.asarray(tips0.quat)[0]
        # ω_quat = 2 * dq ⊗ q0⁻¹
        x, y, z, w = q0
        q0_inv = np.array([-x, -y, -z, w])

        def hprod(a, b):
            ax, ay, az, aw = a
            bx, by, bz, bw = b
            return np.array(
                [
                    aw * bx + ax * bw + ay * bz - az * by,
                    aw * by - ax * bz + ay * bw + az * bx,
                    aw * bz + ax * by - ay * bx + az * bw,
                    aw * bw - ax * bx - ay * by - az * bz,
                ]
            )

        omega = 2 * hprod(dq_num, q0_inv)
        np.testing.assert_allclose(J[0, 3:, i], omega[:3], atol=5e-3)


def test_jacobian_mimic(rng):
    """Mimic joints fold into their source column with factor scaling
    (reference: forward_kinematics.h:578-587)."""
    from tests.test_robot_model import MIMIC_URDF

    m = RobotModel.from_urdf_string(MIMIC_URDF)
    av = m.actuated_variables()
    jac = make_jacobian(m, ["f1", "f2"], av)
    q = np.zeros(m.nvars, dtype=np.float32)
    _, J = jac(jnp.asarray(q))
    J = np.asarray(J)
    # tip f1 rotates at 1×, tip f2 at 2× (mimic multiplier)
    np.testing.assert_allclose(J[0, 5, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(J[1, 5, 0], 2.0, atol=1e-6)
