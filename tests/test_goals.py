"""Goal evaluation tests: every goal kind vs hand-computed numpy values.

Covers the full reference goal inventory (reference:
include/bio_ik/goal_types.h:80-713) and the fitness contract
``Σ weight²·e`` (reference: problem.cpp:244-257).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

import bio_ik_tpu.goals as G
from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk
from bio_ik_tpu.math.frame import Frame
from bio_ik_tpu.problem import Problem
from tests.test_fk import random_q, scipy_fk

TIP = "r_gripper_tool_frame"


@pytest.fixture(scope="module")
def arm():
    return RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))


def eval_fitness(arm, goal_list, q, config=SolverConfig()):
    """Compile a problem, run exact FK, return (fitness, tips, problem, data)."""
    p = Problem(arm, goal_list, config=config)
    qj = jnp.asarray(q)
    if p.tip_links:
        fk = make_fk(arm, p.tip_links)
        tips_frame = fk(qj)
        tips = jnp.concatenate([tips_frame.pos, tips_frame.quat], axis=-1)
    else:
        tips_frame = None
        tips = jnp.zeros(qj.shape[:-1] + (0, 7), qj.dtype)
    qa = qj[..., np.asarray(p.active_vars)]
    data = p.make_data(jnp.zeros(arm.nvars, jnp.float32))
    f = p.fitness(tips, qa, data)
    return np.asarray(f), tips_frame, p, data


def tip_pose(arm, q, link=TIP):
    fr = scipy_fk(arm, q)[arm.link_index[link]]
    return fr[0], fr[1]


def test_position_goal(arm, rng):
    q = random_q(arm, rng)
    target = np.array([0.5, -0.2, 0.1])
    f, _, _, _ = eval_fitness(arm, [G.PositionGoal(link=TIP, position=tuple(target), weight=2.0)], q)
    pos, _ = tip_pose(arm, q)
    want = 4.0 * np.sum((pos - target) ** 2)
    np.testing.assert_allclose(f, want, rtol=1e-4)


def test_orientation_goal(arm, rng):
    q = random_q(arm, rng)
    goal_rot = R.random(random_state=3)
    f, _, _, _ = eval_fitness(
        arm, [G.OrientationGoal(link=TIP, orientation=tuple(goal_rot.as_quat()))], q
    )
    _, rot = tip_pose(arm, q)
    tq, gq = rot.as_quat(), goal_rot.as_quat()
    want = min(np.sum((tq - gq) ** 2), np.sum((tq + gq) ** 2))
    np.testing.assert_allclose(f, want, rtol=1e-3, atol=1e-7)


def test_pose_goal(arm, rng):
    q = random_q(arm, rng)
    goal_rot = R.random(random_state=4)
    target = np.array([0.4, 0.0, -0.2])
    f, _, _, _ = eval_fitness(
        arm,
        [G.PoseGoal(link=TIP, position=tuple(target), orientation=tuple(goal_rot.as_quat()),
                    rotation_scale=0.7)],
        q,
    )
    pos, rot = tip_pose(arm, q)
    tq, gq = rot.as_quat(), goal_rot.as_quat()
    want = np.sum((pos - target) ** 2) + 0.49 * min(
        np.sum((tq - gq) ** 2), np.sum((tq + gq) ** 2)
    )
    np.testing.assert_allclose(f, want, rtol=1e-3, atol=1e-7)


def test_lookat_goal(arm, rng):
    q = random_q(arm, rng)
    target = np.array([1.0, 1.0, 0.5])
    axis = np.array([0.0, 0.0, 1.0])
    f, _, _, _ = eval_fitness(arm, [G.LookAtGoal(link=TIP, axis=tuple(axis), target=tuple(target))], q)
    pos, rot = tip_pose(arm, q)
    v = rot.apply(axis)
    n = (target - pos) / np.linalg.norm(target - pos)
    want = np.sum((n - v / np.linalg.norm(v)) ** 2)
    np.testing.assert_allclose(f, want, rtol=1e-3, atol=1e-6)


def test_min_max_distance_goals(arm, rng):
    q = random_q(arm, rng)
    target = np.array([0.2, -0.1, 0.0])
    pos, _ = tip_pose(arm, q)
    dist = np.linalg.norm(pos - target)
    # max-distance violated when d > limit
    f, _, _, _ = eval_fitness(arm, [G.MaxDistanceGoal(link=TIP, target=tuple(target), distance=dist * 0.5)], q)
    np.testing.assert_allclose(f, (dist * 0.5) ** 2, rtol=1e-3)
    # satisfied → 0
    f, _, _, _ = eval_fitness(arm, [G.MaxDistanceGoal(link=TIP, target=tuple(target), distance=dist * 2)], q)
    np.testing.assert_allclose(f, 0.0, atol=1e-8)
    # min-distance violated when d < limit
    f, _, _, _ = eval_fitness(arm, [G.MinDistanceGoal(link=TIP, target=tuple(target), distance=dist * 2)], q)
    np.testing.assert_allclose(f, dist**2, rtol=1e-3)


def test_line_plane_goals(arm, rng):
    q = random_q(arm, rng)
    pos, _ = tip_pose(arm, q)
    origin = np.array([0.1, 0.1, 0.1])
    direction = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    f, _, _, _ = eval_fitness(arm, [G.LineGoal(link=TIP, position=tuple(origin), direction=(1, 1, 0))], q)
    d = pos - origin
    perp = d - direction * d.dot(direction)
    np.testing.assert_allclose(f, np.sum(perp**2), rtol=1e-3, atol=1e-7)

    normal = np.array([0.0, 0.0, 1.0])
    f, _, _, _ = eval_fitness(arm, [G.PlaneGoal(link=TIP, position=tuple(origin), normal=tuple(normal))], q)
    np.testing.assert_allclose(f, (pos - origin).dot(normal) ** 2, rtol=1e-3, atol=1e-7)


def test_touch_goal_auto_collision_surface(arm, rng):
    """TouchGoal with no explicit points derives the surface from the
    link's URDF collision primitives (reference derives it from the
    MoveIt/FCL collision model, goal_types.cpp:45-228), and the deepest
    point matches the native convex support oracle."""
    q = random_q(arm, rng)
    pos, rot = tip_pose(arm, q)
    pts = arm.collision_points(TIP)               # 8 box corners
    assert pts.shape == (8, 3)
    normal = np.array([0.0, 0.0, 1.0])
    plane_pos = np.array([0.0, 0.0, -0.5])
    f, _, _, _ = eval_fitness(
        arm, [G.TouchGoal(link=TIP, position=tuple(plane_pos),
                          normal=tuple(normal))], q
    )
    world = pos + rot.apply(pts)
    sd = (world - plane_pos) @ normal
    np.testing.assert_allclose(f, np.min(sd) ** 2, rtol=1e-3, atol=1e-7)

    from bio_ik_tpu import native

    if native.available():
        # support point along -normal in link coordinates == deepest
        # point along the plane normal (ties broken identically: the
        # box corners are distinct along any generic direction)
        d_link = rot.inv().apply(-normal)
        i_native = native.support_point(pts, d_link)
        assert i_native == int(np.argmin(sd))


def test_touch_goal_mesh_collision_surface(arm, rng):
    """TouchGoal surfaces auto-derive from STL ``<mesh>`` collision
    elements: the mesh is loaded, reduced to its convex-hull vertex set
    (the exact support set — reference: FCL convex meshes with a
    support-vertex search, goal_types.cpp:45-228), and evaluated with
    the same point-cloud machinery as the primitives."""
    link = "r_wrist_roll_link"
    pts = arm.collision_points(link)
    # the fingertip wedge STL has 8 hull vertices, offset by the
    # collision origin (0.14, 0, 0)
    assert pts.shape == (8, 3)
    assert abs(pts[:, 0].min() - 0.14) < 1e-6   # STL stores float32
    assert abs(pts[:, 0].max() - 0.185) < 1e-6

    q = random_q(arm, rng)
    pos, rot = tip_pose(arm, q, link=link)
    normal = np.array([0.0, 0.0, 1.0])
    plane_pos = np.array([0.0, 0.0, -0.5])
    f, _, _, _ = eval_fitness(
        arm, [G.TouchGoal(link=link, position=tuple(plane_pos),
                          normal=tuple(normal))], q
    )
    world = pos + rot.apply(pts)
    sd = (world - plane_pos) @ normal
    np.testing.assert_allclose(f, np.min(sd) ** 2, rtol=1e-3, atol=1e-7)

    from bio_ik_tpu import native

    if native.available():
        # the hull-vertex min IS the exact convex support: cross-check
        # against the native support-vertex oracle on many directions
        gen = np.random.default_rng(5)
        for d in gen.normal(size=(16, 3)):
            i_native = native.support_point(pts, d)
            assert np.dot(pts[i_native], d) >= np.max(pts @ d) - 1e-12


def test_touch_goal_mesh_solves(arm, rng):
    """End-to-end: solve a TouchGoal whose surface comes from the
    gripper mesh — the deepest hull vertex lands on the plane."""
    from bio_ik_tpu.api import IKSolver

    link = "r_wrist_roll_link"
    pts = arm.collision_points(link)
    s = IKSolver(
        arm,
        [G.TouchGoal(link=link, position=(0.55, -0.6, 0.2),
                     normal=(0.0, 0.0, 1.0))],
        SolverConfig(mode="bio2_memetic", max_steps=8, dtwist=1e-3),
    )
    res = s.solve(jnp.asarray(arm.neutral_q()), key=jax.random.PRNGKey(3))
    pos, rot = tip_pose(arm, np.asarray(res.q), link=link)
    sd = (pos + rot.apply(pts) - np.array([0.55, -0.6, 0.2])) @ np.array(
        [0.0, 0.0, 1.0])
    assert abs(np.min(sd)) < 5e-3, (np.min(sd), bool(res.success))


SPHERE_URDF = """
<robot name="sph">
  <link name="base"/>
  <link name="tool">
    <collision><origin xyz="0.02 0 0.05"/>
      <geometry><sphere radius="0.07"/></geometry></collision>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="tool"/>
    <origin xyz="0.3 0 0.1"/><axis xyz="0 1 0"/>
    <limit lower="-2" upper="2" effort="1" velocity="1"/>
  </joint>
</robot>
"""


def test_touch_goal_sphere_exact_support(rng):
    """A sphere collision enters the TouchGoal support set as one center
    point with radius=r — the EXACT convex support (the reference's FCL
    sphere support, goal_types.cpp:45-228), not a surface sampling:
    fitness equals (signed_distance(center) − r)² in closed form."""
    m = RobotModel.from_urdf_string(SPHERE_URDF)
    pts, rad = m.collision_support("tool")
    assert pts.shape == (1, 3) and rad.shape == (1,)
    np.testing.assert_allclose(pts[0], [0.02, 0, 0.05])
    np.testing.assert_allclose(rad, [0.07])

    q = np.asarray([0.37], np.float32)
    normal = np.array([0.0, 0.3, 1.0]) / np.linalg.norm([0.0, 0.3, 1.0])
    plane_pos = np.array([0.0, 0.0, -0.2])
    f, _, _, _ = eval_fitness(
        m, [G.TouchGoal(link="tool", position=tuple(plane_pos),
                        normal=tuple(normal))], q)
    pos, rot = tip_pose(m, q, link="tool")
    center = pos + rot.apply(pts[0])
    want = ((center - plane_pos).dot(normal) - 0.07) ** 2
    np.testing.assert_allclose(f, want, rtol=1e-4, atol=1e-8)


def test_touch_goal(arm, rng):
    q = random_q(arm, rng)
    pos, rot = tip_pose(arm, q)
    pts = ((0.05, 0, 0), (-0.05, 0, 0), (0, 0.05, 0))
    normal = (0.0, 0.0, 1.0)
    plane_pos = (0.0, 0.0, -0.5)
    f, _, _, _ = eval_fitness(
        arm, [G.TouchGoal(link=TIP, position=plane_pos, normal=normal, points=pts)], q
    )
    world = pos + rot.apply(np.asarray(pts))
    sd = (world - np.asarray(plane_pos)) @ np.asarray(normal)
    np.testing.assert_allclose(f, np.min(sd) ** 2, rtol=1e-3, atol=1e-7)


def test_side_direction_cone_goals(arm, rng):
    q = random_q(arm, rng)
    _, rot = tip_pose(arm, q)
    axis = np.array([0.0, 0.0, 1.0])
    direction = np.array([1.0, 0.0, 0.0])
    v = rot.apply(axis)

    f, _, _, _ = eval_fitness(arm, [G.SideGoal(link=TIP, axis=tuple(axis), direction=tuple(direction))], q)
    np.testing.assert_allclose(f, max(0.0, v.dot(direction)) ** 2, rtol=1e-3, atol=1e-7)

    f, _, _, _ = eval_fitness(arm, [G.DirectionGoal(link=TIP, axis=tuple(axis), direction=tuple(direction))], q)
    np.testing.assert_allclose(f, np.sum((v - direction) ** 2), rtol=1e-3, atol=1e-7)

    cone_angle = 0.3
    pos, _ = tip_pose(arm, q)
    f, _, _, _ = eval_fitness(
        arm,
        [G.ConeGoal(link=TIP, axis=tuple(axis), direction=tuple(direction),
                    angle=cone_angle, position=(0.3, 0, 0), position_weight=0.5)],
        q,
    )
    ang = np.arccos(np.clip(v.dot(direction), -1, 1))
    want = max(0.0, ang - cone_angle) ** 2 + 0.25 * np.sum((np.array([0.3, 0, 0]) - pos) ** 2)
    np.testing.assert_allclose(f, want, rtol=1e-3, atol=1e-6)


def test_link_function_goal(arm, rng):
    q = random_q(arm, rng)
    pos, _ = tip_pose(arm, q)

    def fn(p, quat):
        return jnp.sum(jnp.square(p)) * 2.0

    f, _, _, _ = eval_fitness(arm, [G.LinkFunctionGoal(link=TIP, function=fn)], q)
    np.testing.assert_allclose(f, 2.0 * np.sum(pos**2), rtol=1e-3)


def test_joint_space_goals(arm, rng):
    q = random_q(arm, rng)
    b = arm._np_bounds
    av = arm.actuated_variables()
    bounded = np.isfinite(b["clip_max"][av])
    rcp = b["max_velocity_rcp"][av]
    w = rcp / rcp.sum()
    mid = 0.5 * (b["min"][av] + b["max"][av])
    span = b["span"][av]
    qa = q[av]

    # CenterJoints (evaluated as primary here: secondary=False)
    f, _, _, _ = eval_fitness(arm, [G.CenterJointsGoal(secondary=False)], q)
    want = np.sum(((qa - mid) * w * bounded) ** 2)
    np.testing.assert_allclose(f, want, rtol=1e-3, atol=1e-9)

    # AvoidJointLimits
    f, _, _, _ = eval_fitness(arm, [G.AvoidJointLimitsGoal(secondary=False)], q)
    d = np.maximum(0.0, np.abs(qa - mid) * 2.0 - span * 0.5) * w * bounded
    np.testing.assert_allclose(f, np.sum(d * d), rtol=1e-3, atol=1e-9)

    # Regularization & MinimalDisplacement vs zero seed
    f, _, _, _ = eval_fitness(arm, [G.RegularizationGoal()], q)
    np.testing.assert_allclose(f, np.sum(qa**2), rtol=1e-3)
    f, _, _, _ = eval_fitness(arm, [G.MinimalDisplacementGoal(secondary=False)], q)
    np.testing.assert_allclose(f, np.sum((qa * w) ** 2), rtol=1e-3, atol=1e-9)


def test_joint_variable_and_function_goals(arm, rng):
    q = random_q(arm, rng)
    name = "r_elbow_flex_joint"
    i = arm.var_index[name]
    f, _, _, _ = eval_fitness(arm, [G.JointVariableGoal(variable_name=name, variable_position=-1.0)], q)
    np.testing.assert_allclose(f, (q[i] + 1.0) ** 2, rtol=1e-3)

    def prefer_zero(vals):
        return jnp.zeros_like(vals)

    f, _, _, _ = eval_fitness(
        arm, [G.JointFunctionGoal(variable_names=(name,), function=prefer_zero)], q
    )
    np.testing.assert_allclose(f, q[i] ** 2, rtol=1e-3)


def test_balance_goal(arm, rng):
    q = random_q(arm, rng)
    frames = scipy_fk(arm, q)
    masses = arm.masses
    total = masses.sum()
    com = np.zeros(3)
    for li in range(arm.nlinks):
        if masses[li] > 0:
            p, r = frames[li]
            com += (p + r.apply(arm.coms[li])) * masses[li] / total
    target = np.array([0.1, 0.0, 0.0])
    d = com - target
    d = d - np.array([0, 0, 1.0]) * d[2]
    f, _, _, _ = eval_fitness(arm, [G.BalanceGoal(target=tuple(target))], q)
    np.testing.assert_allclose(f, np.sum(d * d), rtol=1e-3, atol=1e-7)


def test_secondary_split_and_combined(arm, rng):
    q = random_q(arm, rng)
    goals = [
        G.PositionGoal(link=TIP, position=(0.5, 0, 0)),
        G.MinimalDisplacementGoal(weight=0.5),  # secondary by default
    ]
    p = Problem(arm, goals)
    assert len(p.primary) == 1 and len(p.secondary) == 1
    fk = make_fk(arm, p.tip_links)
    t = fk(jnp.asarray(q))
    tips = jnp.concatenate([t.pos, t.quat], -1)
    qa = jnp.asarray(q)[np.asarray(p.active_vars)]
    data = p.make_data(jnp.zeros(arm.nvars, jnp.float32))
    fp = np.asarray(p.fitness(tips, qa, data))
    fs = np.asarray(p.fitness_secondary(qa, data))
    fc = np.asarray(p.fitness_combined(tips, qa, data))
    np.testing.assert_allclose(fc, fp + fs, rtol=1e-6)
    assert fs > 0  # displacement from zero seed


def test_secondary_tip_goal_rejected(arm):
    with pytest.raises(ValueError):
        Problem(arm, [G.PositionGoal(link=TIP, secondary=True)])


def test_check_solution_pose(arm, rng):
    """Acceptance test semantics (reference: problem.cpp:259-341)."""
    q = random_q(arm, rng)
    pos, rot = tip_pose(arm, q)
    goals = [G.PoseGoal(link=TIP, position=tuple(pos), orientation=tuple(rot.as_quat()))]
    cfg = SolverConfig(dtwist=1e-4)
    p = Problem(arm, goals, config=cfg)
    fk = make_fk(arm, p.tip_links)
    t = fk(jnp.asarray(q))
    qa = jnp.asarray(q)[np.asarray(p.active_vars)]
    data = p.make_data(jnp.asarray(q))
    assert bool(p.check_solution(t, qa, data))
    # perturb beyond tolerance
    q2 = q.copy()
    q2[av0 := p.active_vars[0]] += 0.1
    t2 = fk(jnp.asarray(q2))
    assert not bool(p.check_solution(t2, jnp.asarray(q2)[np.asarray(p.active_vars)], data))


def test_check_solution_batched(arm, rng):
    qs = random_q(arm, rng, 4)
    pos, rot = tip_pose(arm, qs[0])
    goals = [G.PoseGoal(link=TIP, position=tuple(pos), orientation=tuple(rot.as_quat()))]
    p = Problem(arm, goals, config=SolverConfig(dtwist=1e-4))
    fk = make_fk(arm, p.tip_links)
    t = fk(jnp.asarray(qs))
    qa = jnp.asarray(qs)[:, np.asarray(p.active_vars)]
    data = p.make_data(jnp.asarray(qs[0]))
    ok = np.asarray(p.check_solution(t, qa, data))
    assert ok.shape == (4,)
    assert ok[0] and not ok[1:].any()


def test_multi_goal_weighted_sum(arm, rng):
    q = random_q(arm, rng)
    g1 = G.PositionGoal(link=TIP, position=(0.5, 0, 0), weight=1.5)
    g2 = G.PositionGoal(link="r_wrist_flex_link", position=(0.2, 0, 0), weight=0.5)
    f12, _, _, _ = eval_fitness(arm, [g1, g2], q)
    f1, _, _, _ = eval_fitness(arm, [g1], q)
    f2, _, _, _ = eval_fitness(arm, [g2], q)
    np.testing.assert_allclose(f12, f1 + f2, rtol=1e-5)
