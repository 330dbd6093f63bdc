"""Native C++ oracle tests: device FK vs the double-precision C++ oracle.

The oracle pattern mirrors the reference's RobotFK vs RobotFK_MoveIt
comparison (reference: src/ik_test.cpp:92-128).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bio_ik_tpu import RobotModel, asset_path, native
from bio_ik_tpu.kinematics import make_fk
from tests.test_fk import random_q, scipy_fk

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


@pytest.mark.parametrize("urdf,tip", [
    ("pr2_arm.urdf", "r_gripper_tool_frame"),
    ("ur5.urdf", "tool0"),
    ("snake.urdf", "head"),
    ("pr2_dual.urdf", "l_gripper_tool_frame"),
])
def test_native_oracle_matches_scipy(urdf, tip, rng):
    m = RobotModel.from_urdf_file(asset_path(urdf))
    qs = random_q(m, rng, 8).astype(np.float64)
    pos, quat = native.oracle_fk(m, qs, [tip])
    ti = m.link_index[tip]
    for k in range(8):
        opos, orot = scipy_fk(m, qs[k])[ti]
        np.testing.assert_allclose(pos[k, 0], opos, atol=1e-12)
        oq = orot.as_quat()
        assert min(np.abs(quat[k, 0] - oq).max(), np.abs(quat[k, 0] + oq).max()) < 1e-12


def test_device_fk_matches_native_oracle(rng):
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    tip = "r_gripper_tool_frame"
    fk = make_fk(m, [tip])
    qs = random_q(m, rng, 32)
    device = fk(jnp.asarray(qs))
    pos, quat = native.oracle_fk(m, qs, [tip])
    np.testing.assert_allclose(np.asarray(device.pos), pos, atol=3e-6)
    gq = np.asarray(device.quat)
    sign = np.sign(np.sum(gq * quat, axis=-1, keepdims=True))
    np.testing.assert_allclose(gq, sign * quat, atol=3e-6)


def test_native_mimic(rng):
    from tests.test_robot_model import MIMIC_URDF

    m = RobotModel.from_urdf_string(MIMIC_URDF)
    q = np.array([[0.3, 0.0]])
    pos, quat = native.oracle_fk(m, q, ["f2"])
    from scipy.spatial.transform import Rotation as R

    want = R.from_rotvec([0, 0, 0.7]).as_quat()
    assert min(np.abs(quat[0, 0] - want).max(), np.abs(quat[0, 0] + want).max()) < 1e-12


def test_support_point():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 2, 0], [0, 0, 3.0]])
    assert native.support_point(pts, np.array([1.0, 0, 0])) == 1
    assert native.support_point(pts, np.array([0, 0, -1.0])) == 0
    assert native.support_point(pts, np.array([0, 1.0, 1.0])) == 3
