"""Structured-config deserialization: dicts/JSON/YAML-style → goals + config.

TPU-native counterpart of the reference's ROS-param plumbing — ``lookupParam``
(kinematics_plugin.cpp:109-115) and the ``XmlRpcReader`` structured-value
reader (utils.h:475-523).  Lets serving layers describe an IK problem as
plain data:

    spec = {
      "mode": "bio2_memetic",
      "max_steps": 16,
      "goals": [
        {"type": "pose", "link": "gripper", "position": [0.4, 0, 0.3],
         "orientation": [0, 0, 0, 1]},
        {"type": "minimal_displacement", "weight": 0.2},
      ],
    }
    solver = solver_from_spec(model, spec)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Sequence

from . import goals as G
from .config import SolverConfig

__all__ = ["goal_from_dict", "goals_from_dicts", "config_from_dict", "solver_from_spec"]

_GOAL_TYPES: Dict[str, type] = {
    "position": G.PositionGoal,
    "orientation": G.OrientationGoal,
    "pose": G.PoseGoal,
    "lookat": G.LookAtGoal,
    "look_at": G.LookAtGoal,
    "max_distance": G.MaxDistanceGoal,
    "min_distance": G.MinDistanceGoal,
    "line": G.LineGoal,
    "plane": G.PlaneGoal,
    "touch": G.TouchGoal,
    "side": G.SideGoal,
    "direction": G.DirectionGoal,
    "cone": G.ConeGoal,
    "avoid_joint_limits": G.AvoidJointLimitsGoal,
    "center_joints": G.CenterJointsGoal,
    "regularization": G.RegularizationGoal,
    "minimal_displacement": G.MinimalDisplacementGoal,
    "joint_variable": G.JointVariableGoal,
    "balance": G.BalanceGoal,
}


def _as_tuple(v):
    return tuple(v) if isinstance(v, (list, tuple)) else v


def goal_from_dict(d: Mapping[str, Any]) -> G.Goal:
    d = dict(d)
    type_name = d.pop("type", None)
    if type_name not in _GOAL_TYPES:
        raise ValueError(
            f"unknown goal type {type_name!r}; available: {sorted(_GOAL_TYPES)}"
        )
    cls = _GOAL_TYPES[type_name]
    fields = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - fields
    if unknown:
        raise ValueError(f"goal {type_name!r}: unknown fields {sorted(unknown)}")
    return cls(**{k: _as_tuple(v) for k, v in d.items()})


def goals_from_dicts(ds: Sequence[Mapping[str, Any]]) -> List[G.Goal]:
    return [goal_from_dict(d) for d in ds]


def config_from_dict(d: Mapping[str, Any]) -> SolverConfig:
    fields = {f.name for f in dataclasses.fields(SolverConfig)}
    unknown = set(d) - fields
    if unknown:
        raise ValueError(f"unknown config fields {sorted(unknown)}")
    return SolverConfig(**dict(d))


def solver_from_spec(model, spec: Mapping[str, Any]):
    """Build an :class:`bio_ik_tpu.api.IKSolver` from one spec dict holding
    config fields + a ``goals`` list (+ optional ``fixed_joints``)."""
    from .api import IKSolver

    spec = dict(spec)
    goal_dicts = spec.pop("goals")
    fixed_joints = spec.pop("fixed_joints", ())
    cfg = config_from_dict(spec)
    return IKSolver(model, goals_from_dicts(goal_dicts), cfg, fixed_joints=fixed_joints)
