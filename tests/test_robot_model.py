"""URDF parsing + robot model compilation tests."""

import numpy as np
import pytest

from bio_ik_tpu import RobotModel, asset_path, parse_urdf
from bio_ik_tpu.robot.urdf import FIXED, REVOLUTE

MIMIC_URDF = """
<robot name="gripper">
  <link name="base"/><link name="f1"/><link name="f2"/>
  <joint name="drive" type="revolute">
    <parent link="base"/><child link="f1"/>
    <axis xyz="0 0 1"/><limit lower="0" upper="1" velocity="1"/>
  </joint>
  <joint name="follower" type="revolute">
    <parent link="base"/><child link="f2"/>
    <axis xyz="0 0 1"/><limit lower="0" upper="2" velocity="1"/>
    <mimic joint="drive" multiplier="2.0" offset="0.1"/>
  </joint>
</robot>
"""


def test_pr2_arm_model():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    assert m.nvars == 7
    assert m.link_names[0] == "torso_lift_link"
    assert all(m.parent[i] < i for i in range(1, m.nlinks))
    # continuous joints → unbounded clip, ±π min/max
    # (reference semantics: robot_info.h:82-90)
    i = m.var_index["r_forearm_roll_joint"]
    b = m._np_bounds
    assert b["clip_min"][i] == -np.inf and b["clip_max"][i] == np.inf
    np.testing.assert_allclose(b["min"][i], -np.pi)
    np.testing.assert_allclose(b["span"][i], 2 * np.pi)
    # bounded joint → clip == limits
    j = m.var_index["r_elbow_flex_joint"]
    assert b["clip_min"][j] == -2.3213 and b["clip_max"][j] == 0.0
    # velocity reciprocal
    np.testing.assert_allclose(b["max_velocity_rcp"][j], 1.0 / 3.3, rtol=1e-6)


def test_ur5_unbounded_revolutes():
    m = RobotModel.from_urdf_file(asset_path("ur5.urdf"))
    assert m.nvars == 6
    b = m._np_bounds
    # ±2π limits span > 2π ⇒ treated as position-unbounded; the elbow's ±π
    # limits give span exactly 2π ≥ 2π·0.9999, so it is unbounded as well
    # (reference rule: robot_info.h:82-90)
    assert np.all(np.isinf(b["clip_min"]))
    np.testing.assert_allclose(b["span"][m.var_index["elbow_joint"]], 2 * np.pi)


def test_snake_model():
    m = RobotModel.from_urdf_file(asset_path("snake.urdf"))
    assert m.nvars == 32
    assert len(m.actuated_variables()) == 32


def test_mimic():
    import jax.numpy as jnp

    m = RobotModel.from_urdf_string(MIMIC_URDF)
    assert m.nvars == 2
    # active variables exclude the mimic follower
    assert m.actuated_variables() == [m.var_index["drive"]]
    q = jnp.asarray([0.5, 0.0])
    q2 = np.asarray(m.apply_mimic(q))
    np.testing.assert_allclose(q2[m.var_index["follower"]], 0.5 * 2.0 + 0.1, rtol=1e-6)


def test_fixed_joints_excluded():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    av = m.actuated_variables(exclude_fixed_joints=["r_wrist_roll_joint"])
    assert len(av) == 6
    assert m.var_index["r_wrist_roll_joint"] not in av


def test_bad_urdf_errors():
    with pytest.raises(ValueError):
        parse_urdf("<robot name='x'><link name='a'/><link name='b'/></robot>").root_link


COLLISION_URDF = """
<robot name="colbot">
  <link name="base"/>
  <link name="tool">
    <collision>
      <origin xyz="0.1 0 0" rpy="0 0 1.5707963"/>
      <geometry><box size="0.2 0.4 0.6"/></geometry>
    </collision>
    <collision>
      <geometry><cylinder radius="0.05" length="0.3"/></geometry>
    </collision>
    <collision>
      <origin xyz="0 0 0.5"/>
      <geometry><sphere radius="0.1"/></geometry>
    </collision>
  </link>
  <joint name="j" type="revolute">
    <parent link="base"/><child link="tool"/>
    <axis xyz="0 0 1"/><limit lower="-1" upper="1" velocity="1"/>
  </joint>
</robot>
"""


def test_collision_geometry_parsing_and_points():
    """URDF collision primitives compile to convex support point clouds
    (reference derives TouchGoal surfaces from the FCL collision model,
    goal_types.cpp:45-228)."""
    m = RobotModel.from_urdf_string(COLLISION_URDF)
    assert "tool" in m.collisions and len(m.collisions["tool"]) == 3
    pts = m.collision_points("tool", ring=8, sphere_points=20)
    assert pts.shape == (8 + 16 + 20, 3)
    box = pts[:8]
    # box rotated 90° about z: x-extent becomes the 0.4 side (±0.2),
    # y-extent the 0.2 side (±0.1), centered at (0.1, 0, 0)
    np.testing.assert_allclose(box[:, 0].max(), 0.1 + 0.2, atol=1e-5)
    np.testing.assert_allclose(box[:, 0].min(), 0.1 - 0.2, atol=1e-5)
    np.testing.assert_allclose(box[:, 1].max(), 0.1, atol=1e-5)
    np.testing.assert_allclose(box[:, 2].max(), 0.3, atol=1e-5)
    cyl = pts[8:24]
    np.testing.assert_allclose(
        np.linalg.norm(cyl[:, :2], axis=-1), 0.05, atol=1e-6)
    assert set(np.round(cyl[:, 2], 6)) == {-0.15, 0.15}
    sph = pts[24:]
    np.testing.assert_allclose(
        np.linalg.norm(sph - np.array([0, 0, 0.5]), axis=-1), 0.1, atol=1e-6)
    # link without collision geometry raises
    with pytest.raises(ValueError, match="no collision geometry"):
        m.collision_points("base")


def test_collision_support_mixed_shapes():
    """collision_support: spheres collapse to one center point with
    radius=r (exact support), boxes/cylinders keep radius 0 — mixed
    shapes concatenate points and radii consistently."""
    m = RobotModel.from_urdf_string(COLLISION_URDF)
    pts, rad = m.collision_support("tool", ring=16)
    assert pts.shape == (8 + 32 + 1, 3) and rad.shape == (8 + 32 + 1,)
    np.testing.assert_allclose(rad[:40], 0.0)
    np.testing.assert_allclose(pts[-1], [0.0, 0.0, 0.5])
    np.testing.assert_allclose(rad[-1], 0.1)
    # deepest extent along -z (the evaluator's min(sd - radius)): the
    # sphere contributes center_z - r = 0.5 - 0.1 = 0.4 exactly, and the
    # cylinder rims reach z = -0.15
    n = np.array([0.0, 0.0, 1.0])
    sd = pts @ n - rad
    assert np.isclose(sd[-1], 0.4)
    assert np.isclose(sd[8:40].min(), -0.15)
