"""Tests for structured-parameter loading (params.py — the XmlRpcReader /
kinematics.yaml analog, reference: utils.h:475-523, kinematics_plugin.cpp:
243-267) and the MoveIt-style ``IKSolver.search`` semantics
(reference: kinematics_plugin.cpp:638-654)."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

import bio_ik_tpu.goals as G
from bio_ik_tpu import (
    IKSolver,
    RobotModel,
    SolverConfig,
    asset_path,
    config_from_dict,
    goal_from_dict,
    goals_from_dict,
    load_yaml,
)
from bio_ik_tpu.params import GOAL_TYPES


def test_config_from_dict_native_and_reference_names():
    cfg = config_from_dict(
        {"mode": "gd_4", "threads": 2, "random_seed": 7, "dtwist": 1e-3}
    )
    assert cfg.mode == "gd_4"
    assert cfg.islands == 2  # reference alias `threads`
    assert cfg.seed == 7
    assert cfg.dtwist == 1e-3


def test_config_from_dict_rejects_unknown_key():
    with pytest.raises(ValueError, match="unknown config key"):
        config_from_dict({"modee": "gd"})


def test_goal_from_dict_array_and_struct_vectors():
    g1 = goal_from_dict(
        {"type": "pose", "link": "a", "position": [1, 2, 3],
         "orientation": [0, 0, 0, 1], "weight": 2.0}
    )
    g2 = goal_from_dict(
        {"type": "pose", "link": "a",
         "position": {"x": 1, "y": 2, "z": 3},
         "orientation": {"x": 0, "y": 0, "z": 0, "w": 1}, "weight": 2.0}
    )
    assert g1 == g2 == G.PoseGoal(
        link="a", position=(1.0, 2.0, 3.0), orientation=(0.0, 0.0, 0.0, 1.0),
        weight=2.0,
    )


def test_goal_from_dict_rejects_unknown():
    with pytest.raises(ValueError, match="unknown goal type"):
        goal_from_dict({"type": "nope"})
    with pytest.raises(ValueError, match="unknown field"):
        goal_from_dict({"type": "position", "positionn": [0, 0, 0]})


def test_every_goal_type_constructible_from_dict():
    # every registered type round-trips through its default construction
    for name, cls in GOAL_TYPES.items():
        g = goal_from_dict({"type": name})
        assert isinstance(g, cls)


def test_load_yaml_roundtrip(tmp_path):
    p = tmp_path / "kin.yaml"
    p.write_text(
        "mode: bio2_memetic\n"
        "dtwist: 1.0e-3\n"
        "goals:\n"
        "  - {type: pose, link: tool0, weight: 1.0}\n"
        "  - {type: avoid_joint_limits, weight: 0.5}\n"
    )
    cfg, goals = load_yaml(str(p))
    assert cfg == SolverConfig(mode="bio2_memetic", dtwist=1e-3)
    assert goals == [
        G.PoseGoal(link="tool0"),
        G.AvoidJointLimitsGoal(weight=0.5),
    ]


def test_goal_types_table_is_complete():
    # all public Goal dataclasses are reachable from the dict loader
    public = {
        cls for cls in vars(G).values()
        if isinstance(cls, type) and issubclass(cls, G.Goal)
        and cls is not G.Goal and dataclasses.is_dataclass(cls)
    }
    assert public == set(GOAL_TYPES.values())


@pytest.fixture(scope="module")
def ur5_solver():
    m = RobotModel.from_urdf_file(asset_path("ur5.urdf"))
    cfg = SolverConfig(mode="gd", max_steps=4, dtwist=1e-3)
    return m, IKSolver(m, [G.PoseGoal(link="tool0")], cfg)


def test_search_returns_none_on_failure(ur5_solver):
    m, s = ur5_solver
    from bio_ik_tpu.kinematics import make_fk

    fk = jax.jit(make_fk(m, ["tool0"]))
    q = jnp.asarray(m.neutral_q())
    tips = fk(q)
    data = s.make_data(q)
    # unreachable target (far outside the workspace) with a tiny budget
    data["primary"][0]["position"] = tips.pos.at[0].set(
        jnp.asarray([10.0, 10.0, 10.0]))
    res = s.search(q, data=data)
    assert res is None
    res = s.search(q, data=data, return_approximate_solution=True)
    assert res is not None and not bool(res.success)


def test_search_callback_filters(ur5_solver):
    m, s = ur5_solver
    from bio_ik_tpu.kinematics import make_fk

    fk = jax.jit(make_fk(m, ["tool0"]))
    q = jnp.asarray(m.neutral_q())
    tips = fk(q)
    data = s.make_data(q)
    # target = seed pose ⇒ immediate success
    data["primary"][0]["position"] = tips.pos
    data["primary"][0]["orientation"] = tips.quat
    res = s.search(q, data=data)
    assert res is not None and bool(res.success)
    assert s.search(q, data=data, solution_callback=lambda r: False) is None
    assert s.search(q, data=data, solution_callback=lambda r: True) is not None


def test_counter_logs_iterations(ur5_solver, caplog):
    """`counter` config logs the per-query iteration count
    (reference: ik_parallel.h:263-266)."""
    import logging

    m, _ = ur5_solver
    cfg = SolverConfig(mode="gd", max_steps=4, counter=True)
    s = IKSolver(m, [G.PoseGoal(link="tool0")], cfg)
    q = jnp.asarray(m.neutral_q())
    with caplog.at_level(logging.INFO, logger="bio_ik_tpu"):
        s.solve(q)
    assert any("steps" in r.message for r in caplog.records)
