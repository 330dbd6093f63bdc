"""Multi-device island/scenario sharding tests on the virtual 8-CPU mesh.

Exercises the collective layer that replaces the reference's pthread
executor (reference: src/ik_parallel.h:43-277) — see
bio_ik_tpu/parallel/islands.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bio_ik_tpu.goals as G
from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.api import IKSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk
from bio_ik_tpu.parallel.islands import (
    default_mesh,
    make_sharded_batch_solve,
    make_sharded_island_solve,
)
from tests.test_fk import random_q

TIP = "r_gripper_tool_frame"


@pytest.fixture(scope="module")
def setup():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    fk = make_fk(m, [TIP])
    cfg = SolverConfig(mode="bio2_memetic", max_steps=4, dtwist=1e-3)
    s = IKSolver(m, [G.PoseGoal(link=TIP)], cfg)
    return m, fk, s


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_island_sharded_solve(setup, rng):
    m, fk, s = setup
    mesh = default_mesh("islands")
    solve = make_sharded_island_solve(s, mesh)
    qg = random_q(m, rng)
    tg = fk(jnp.asarray(qg))
    data = s.make_data(jnp.asarray(m.neutral_q()))
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    res = solve(jax.random.PRNGKey(0), data)
    assert res.q.shape == (m.nvars,)
    assert np.isfinite(float(res.fitness))
    # 8 device-groups × 4 islands should at least improve on the seed
    seed_fit = float(s.ctx.fitness_exact(data["seed_active"], data))
    assert float(res.fitness) < seed_fit


@pytest.mark.slow  # ~6-7 min shard_map compile on a 2-core CPU box;
#   the same machinery runs every round in the driver dryrun and in
#   test_island_sharded_solve (kept in the default tier)
def test_batch_sharded_solve(setup, rng):
    m, fk, s = setup
    B = 16
    mesh = default_mesh("data")
    solve = make_sharded_batch_solve(s, mesh)
    qg = random_q(m, rng, B)
    tg = fk(jnp.asarray(qg))
    data0 = s.make_data(jnp.asarray(m.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res = solve(keys, data)
    assert res.q.shape == (B, m.nvars)
    assert np.all(np.isfinite(np.asarray(res.fitness)))


def test_batch_not_divisible_raises(setup):
    m, fk, s = setup
    mesh = default_mesh("data")
    solve = make_sharded_batch_solve(s, mesh)
    with pytest.raises(ValueError):
        solve(jax.random.split(jax.random.PRNGKey(0), 3), {})


def test_graft_entry_compiles():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out.fitness)))


@pytest.mark.slow
def test_graft_dryrun_multichip():
    # the 8-device shard_map SPMD compile of the full dryrun takes tens
    # of minutes on a 2-core XLA:CPU box (the driver runs
    # ``dryrun_multichip`` itself every round — MULTICHIP_r0N.json — so
    # the default tier does not repeat it; the lighter island/batch
    # sharding paths above stay in the default tier)
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow  # ~6-7 min shard_map compile on a 2-core CPU box;
#   the same machinery runs every round in the driver dryrun and in
#   test_island_sharded_solve (kept in the default tier)
def test_island_sharded_solve_with_migration(setup, rng):
    """Elite migration over the mesh (Solver.inject + all_gather between
    chunks) — island-model extension of SURVEY §5.8."""
    m, fk, s = setup
    mesh = default_mesh("islands")
    solve = make_sharded_island_solve(s, mesh, migrate=True)
    qg = random_q(m, rng)
    tg = fk(jnp.asarray(qg))
    data = s.make_data(jnp.asarray(m.neutral_q()))
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    res = solve(jax.random.PRNGKey(0), data)
    assert res.q.shape == (m.nvars,)
    seed_fit = float(s.ctx.fitness_exact(data["seed_active"], data))
    assert float(res.fitness) < seed_fit


def test_elite_migration_single_chip(setup, rng):
    """config.elite_migration broadcasts the running best into every
    island between chunks."""
    m, fk, s = setup
    cfg = SolverConfig(mode="bio2_memetic", max_steps=4, dtwist=1e-3,
                       elite_migration=True)
    s2 = IKSolver(m, [G.PoseGoal(link=TIP)], cfg)
    qg = random_q(m, rng)
    tg = fk(jnp.asarray(qg))
    data = s2.make_data(jnp.asarray(m.neutral_q()))
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    res = s2.solve(jnp.asarray(m.neutral_q()), key=jax.random.PRNGKey(0), data=data)
    seed_fit = float(s2.ctx.fitness_exact(data["seed_active"], data))
    assert float(res.fitness) < seed_fit


def test_make_pod_mesh_helpers():
    """Multi-host mesh construction helpers (SURVEY §5.8 backend slot)."""
    from bio_ik_tpu.parallel.distributed import local_batch_slice, make_pod_mesh

    mesh = make_pod_mesh()
    assert mesh.shape[next(iter(mesh.shape))] == 8
    mesh2 = make_pod_mesh(("data", "islands"), (4, 2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["islands"] == 2
    with pytest.raises(ValueError):
        make_pod_mesh(("data",), (7,))
    s = local_batch_slice(64, 8, process_index=0)
    assert s == slice(0, 64)  # single-process: whole batch


@pytest.mark.slow  # ~6-7 min shard_map compile on a 2-core CPU box;
#   the same machinery runs every round in the driver dryrun and in
#   test_island_sharded_solve (kept in the default tier)
def test_batch_sharded_solve_engine_path(setup, rng):
    """Engine-routed scenario sharding (fused kernel per device shard)."""
    m, fk, s = setup
    assert s.engine is not None
    B = 16
    mesh = default_mesh("data")
    solve = make_sharded_batch_solve(s, mesh)
    qg = random_q(m, rng, B)
    tg = fk(jnp.asarray(qg))
    data0 = s.make_data(jnp.asarray(m.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res = solve(keys, data)
    assert res.q.shape == (B, m.nvars)
    assert np.all(np.isfinite(np.asarray(res.fitness)))
