"""FK oracle tests: batched TPU-style FK vs a straightforward scipy chain.

Mirrors the reference's oracle pattern (RobotFK vs RobotFK_MoveIt,
reference: src/ik_test.cpp:92-128, forward_kinematics.h:1468-1503).
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.kinematics import make_fk
from bio_ik_tpu.robot.urdf import FLOATING, PLANAR, PRISMATIC, REVOLUTE


def scipy_fk(m: RobotModel, q: np.ndarray):
    """Trusted host-side FK oracle over all links."""
    q = np.asarray(q, dtype=np.float64)
    # mimic propagation
    for v in m.mimic_vars:
        q[v] = q[m.mimic_src[v]] * m.mimic_factor[v] + m.mimic_offset[v]
    frames = {}
    for li in range(m.nlinks):
        if m.parent[li] < 0:
            frames[li] = (np.zeros(3), R.identity())
            continue
        ppos, prot = frames[int(m.parent[li])]
        pos = ppos + prot.apply(m.origin_pos[li])
        rot = prot * R.from_quat(m.origin_quat[li])
        jt = int(m.jtype[li])
        vs = int(m.vstart[li])
        if jt == REVOLUTE:
            rot = rot * R.from_rotvec(np.asarray(m.axis[li]) * q[vs])
        elif jt == PRISMATIC:
            pos = pos + rot.apply(np.asarray(m.axis[li]) * q[vs])
        elif jt == FLOATING:
            # 7 variables: translation + quaternion, normalized before use
            # (reference: forward_kinematics.h:120-127)
            qq = q[vs + 3 : vs + 7]
            qq = qq / np.linalg.norm(qq)
            pos = pos + rot.apply(q[vs : vs + 3])
            rot = rot * R.from_quat(qq)
        elif jt == PLANAR:
            # 3 variables: x, y, theta about z
            pos = pos + rot.apply(np.array([q[vs], q[vs + 1], 0.0]))
            rot = rot * R.from_rotvec(np.array([0.0, 0.0, 1.0]) * q[vs + 2])
        frames[li] = (pos, rot)
    return frames


def random_q(m: RobotModel, rng, n=None):
    b = m._np_bounds
    shape = (n, m.nvars) if n else (m.nvars,)
    return rng.uniform(b["min"], b["max"], size=shape).astype(np.float32)


def check_fk_vs_oracle(urdf_name, tip, rng, pos_tol=2e-6, quat_tol=2e-6):
    m = RobotModel.from_urdf_file(asset_path(urdf_name))
    fk = jax.jit(make_fk(m, [tip]))
    qs = random_q(m, rng, 32)
    tips = fk(jnp.asarray(qs))
    ti = m.link_index[tip]
    for k in range(32):
        opos, orot = scipy_fk(m, qs[k])[ti]
        np.testing.assert_allclose(np.asarray(tips.pos)[k, 0], opos, atol=pos_tol)
        gq, oq = np.asarray(tips.quat)[k, 0], orot.as_quat()
        assert min(np.abs(gq - oq).max(), np.abs(gq + oq).max()) < quat_tol


def test_fk_pr2(rng):
    check_fk_vs_oracle("pr2_arm.urdf", "r_gripper_tool_frame", rng)


def test_fk_ur5(rng):
    check_fk_vs_oracle("ur5.urdf", "tool0", rng)


def test_fk_snake(rng):
    # longer chain → slightly looser f32 accumulation tolerance
    check_fk_vs_oracle("snake.urdf", "head", rng, pos_tol=1e-5, quat_tol=1e-5)


def test_fk_batched_matches_single(rng):
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    fk = jax.jit(make_fk(m, ["r_gripper_tool_frame", "r_elbow_flex_link"]))
    qs = random_q(m, rng, 8)
    batched = fk(jnp.asarray(qs))
    assert batched.pos.shape == (8, 2, 3) and batched.quat.shape == (8, 2, 4)
    for k in range(8):
        single = fk(jnp.asarray(qs[k]))
        np.testing.assert_allclose(np.asarray(batched.pos)[k], np.asarray(single.pos), atol=1e-6)


def test_fk_multi_tip_dedup(rng):
    """Two tips sharing a chain prefix — schedule computes shared links once."""
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    sched = m.link_schedule(
        [m.link_index["r_gripper_tool_frame"], m.link_index["r_wrist_flex_link"]]
    )
    assert len(sched) == m.nlinks  # full chain robot: all links needed exactly once
    fk = make_fk(m, ["r_wrist_flex_link", "r_gripper_tool_frame"])
    q = random_q(m, rng)
    tips = fk(jnp.asarray(q))
    o = scipy_fk(m, q)
    np.testing.assert_allclose(
        np.asarray(tips.pos)[0], o[m.link_index["r_wrist_flex_link"]][0], atol=2e-6
    )


def test_fk_mimic():
    import jax.numpy as jnp
    from tests.test_robot_model import MIMIC_URDF

    m = RobotModel.from_urdf_string(MIMIC_URDF)
    fk = make_fk(m, ["f2"])
    q = np.zeros(2, dtype=np.float32)
    q[m.var_index["drive"]] = 0.3
    tips = fk(jnp.asarray(q))
    # follower angle = 0.3*2 + 0.1 = 0.7 about z
    want = R.from_rotvec([0, 0, 0.7]).as_quat()
    gq = np.asarray(tips.quat)[0]
    assert min(np.abs(gq - want).max(), np.abs(gq + want).max()) < 1e-6
