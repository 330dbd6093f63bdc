"""Config/goal deserialization tests (XmlRpcReader analog)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.params import (
    config_from_dict,
    goal_from_dict,
    goals_from_dicts,
    solver_from_spec,
)
import bio_ik_tpu.goals as G


def test_goal_from_dict():
    g = goal_from_dict({"type": "pose", "link": "tip", "position": [1, 2, 3],
                        "weight": 2.0})
    assert isinstance(g, G.PoseGoal)
    assert g.position == (1, 2, 3) and g.weight == 2.0


def test_goal_unknown_type():
    with pytest.raises(ValueError, match="unknown goal type"):
        goal_from_dict({"type": "teleport"})


def test_goal_unknown_field():
    with pytest.raises(ValueError, match="unknown field"):
        goal_from_dict({"type": "pose", "link": "x", "positionn": [0, 0, 0]})


def test_lookat_alias_and_struct_vectors():
    g = goal_from_dict({"type": "lookat", "link": "tip",
                        "target": {"x": 1, "y": 2, "z": 3}})
    assert isinstance(g, G.LookAtGoal) and g.target == (1.0, 2.0, 3.0)


def test_config_from_dict():
    c = config_from_dict({"mode": "bio1", "max_steps": 7})
    assert c.mode == "bio1" and c.max_steps == 7
    with pytest.raises(ValueError):
        config_from_dict({"modee": "x"})


def test_solver_from_spec():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    spec = {
        "mode": "bio2_memetic",
        "max_steps": 2,
        "goals": [
            {"type": "pose", "link": "r_gripper_tool_frame"},
            {"type": "minimal_displacement", "weight": 0.2},
        ],
        "fixed_joints": ["r_wrist_roll_joint"],
    }
    s = solver_from_spec(m, spec)
    assert len(s.problem.primary) == 1 and len(s.problem.secondary) == 1
    assert m.var_index["r_wrist_roll_joint"] not in s.problem.active_vars
