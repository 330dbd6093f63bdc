"""Multi-goal dual-arm problem: the BASELINE.json 3rd benchmark config
(PoseGoal ×2 + LookAtGoal + MinimalDisplacement + AvoidJointLimits on a
PR2-like dual-arm robot)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bio_ik_tpu.goals as G
from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.api import IKSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk

R_TIP, L_TIP, HEAD = "r_gripper_tool_frame", "l_gripper_tool_frame", "head_tilt_link"


@pytest.fixture(scope="module")
def dual():
    return RobotModel.from_urdf_file(asset_path("pr2_dual.urdf"))


@pytest.mark.slow
def test_dual_arm_multigoal(dual, rng):
    m = dual
    fk = make_fk(m, [R_TIP, L_TIP])
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"]).astype(np.float32)
    tg = fk(jnp.asarray(qg))
    gp = np.asarray(tg.pos)
    gq = np.asarray(tg.quat)
    look_target = tuple(0.5 * (gp[0] + gp[1]))

    goals = [
        G.PoseGoal(link=R_TIP),
        G.PoseGoal(link=L_TIP),
        G.LookAtGoal(link=HEAD, axis=(1, 0, 0), target=look_target, weight=0.5),
        G.MinimalDisplacementGoal(weight=0.1),
        G.AvoidJointLimitsGoal(weight=0.1),
    ]
    cfg = SolverConfig(mode="bio2_memetic", max_steps=16, dtwist=1e-2)
    s = IKSolver(m, goals, cfg)
    assert s.problem.ntips == 3
    assert len(s.problem.secondary) == 2

    data = s.make_data(jnp.asarray(m.neutral_q()))
    # both pose goals are in one group (same kind): instances 0,1
    data["primary"][0]["position"] = jnp.asarray(gp)
    data["primary"][0]["orientation"] = jnp.asarray(gq)
    res = s.solve(jnp.asarray(m.neutral_q()), key=jax.random.PRNGKey(0), data=data)
    t2 = fk(res.q)
    errs = np.linalg.norm(np.asarray(t2.pos) - gp, axis=-1)
    # dual-arm 17-DOF multi-goal is much harder; expect coarse convergence
    # within a small CPU budget
    assert np.all(np.isfinite(np.asarray(res.fitness)))
    assert errs.max() < 0.15, errs

    # LookAt error: head x-axis should roughly point between the grippers
    fk_head = make_fk(m, [HEAD])
    th = fk_head(res.q)
    from scipy.spatial.transform import Rotation as R

    v = R.from_quat(np.asarray(th.quat)[0]).apply([1, 0, 0])
    n = np.asarray(look_target) - np.asarray(th.pos)[0]
    n /= np.linalg.norm(n)
    assert np.dot(v, n) > 0.5, (v, n)


@pytest.mark.slow
def test_fixed_joints_dual(dual, rng):
    """fixed_joints parameter locks a joint at the seed value
    (reference: BioIKKinematicsQueryOptions::fixed_joints, goal.h:124)."""
    m = dual
    goals = [G.PoseGoal(link=R_TIP)]
    s = IKSolver(m, goals, SolverConfig(mode="bio2_memetic", max_steps=4),
                 fixed_joints=["torso_lift_joint"])
    ti = m.var_index["torso_lift_joint"]
    assert ti not in s.problem.active_vars
    seed = m.neutral_q()
    res = s.solve(jnp.asarray(seed), key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(res.q)[ti], seed[ti], atol=1e-7)
