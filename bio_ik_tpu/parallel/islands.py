"""Multi-device island parallelism.

TPU-native counterpart of the reference's thread-racing executor
(reference: src/ik_parallel.h:43-277 — N pre-spawned pthreads parked on a
boost::barrier, sharing `finished`/`canceled` flags).  Here the islands
axis is sharded over a ``jax.sharding.Mesh``: each device runs its local
islands with the *same* single-chip solve program, and the winner is
selected by an all-gather reduction over the mesh — the collective analog
of the reference's winner scan (ik_parallel.h:220-261).  The reference's
islands exchange nothing until the end (first success merely cancels the
rest), so no mid-run migration is needed for parity; optional elite
migration hooks are a planned extension for scale-out quality.

Two sharding modes:
  * :func:`make_sharded_island_solve` — ONE query, islands split across
    devices (latency mode; the direct analog of the 4-thread race).
  * :func:`make_sharded_batch_solve` — B queries sharded across devices,
    each device racing its local islands per query (throughput mode; no
    reference analog).

Both are pure jitted programs over a mesh and also run multi-host (the
mesh then spans hosts; collectives ride ICI within a slice and DCN
across hosts).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_sharded_island_solve", "make_sharded_batch_solve", "default_mesh"]


def default_mesh(axis: str = "islands", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _pick_winner(solver, qa, fit, ok):
    """Global winner among per-device winners (stacked on axis 0).

    Ordering matches the reference (ik_parallel.h:220-261): any success
    beats any failure; ties by fitness.
    """
    any_ok = jnp.any(ok)
    key = jnp.where(ok == any_ok, fit, jnp.inf)
    i = jnp.argmin(key)
    return jax.tree.map(lambda a: a[i], (qa, fit, ok))


def make_sharded_island_solve(iksolver, mesh: Mesh, axis: str = "islands",
                              migrate: bool = False):
    """Latency mode: one query, ``mesh.shape[axis]`` device-groups each
    running the solver's full island count locally; global winner via
    all-gather.

    With ``migrate=True``, the per-device running best is all-gathered
    between step chunks and the global best injected into every local
    island (``Solver.inject``) — elite migration over ICI, the island-
    model extension of SURVEY §5.8 (the reference's islands exchange
    nothing until the end, ik_parallel.h:94-97).

    Returns ``fn(key, data) -> IKResult`` (jitted over the mesh; ``data``
    replicated).
    """
    from ..api import IKResult

    n = mesh.shape[axis]
    cfg = iksolver.config
    spc = max(1, min(cfg.steps_per_check, cfg.max_steps))
    nchecks = max(1, cfg.max_steps // spc)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(keys, data):
        state, best = iksolver._init_islands(keys[0], data)

        def body(carry, _):
            state, best = carry
            state, best = iksolver._chunk(state, best, data)
            if migrate:
                # global best across devices → inject into local islands
                qa = jax.lax.all_gather(best[0], axis)
                fit = jax.lax.all_gather(best[1], axis)
                ok = jax.lax.all_gather(best[2], axis)
                rank = jax.lax.all_gather(best[3], axis)
                any_ok = jnp.any(ok)
                sel = jnp.where(ok == any_ok, rank, jnp.inf)
                i = jnp.argmin(sel)
                cand = (qa[i], fit[i], ok[i], rank[i])
                state = jax.vmap(
                    lambda s: iksolver.solver.inject(s, qa[i], fit[i])
                )(state)
                best = iksolver._merge_best(best, cand)
            return (state, best), None

        (state, best), _ = jax.lax.scan(body, (state, best), None, length=nchecks)
        res = iksolver._result(best, data)
        # gather per-device winners and reduce identically everywhere
        qa = jax.lax.all_gather(res.qa, axis)
        fit = jax.lax.all_gather(res.fitness, axis)
        ok = jax.lax.all_gather(res.success, axis)
        q = jax.lax.all_gather(res.q, axis)
        any_ok = jnp.any(ok)
        key = jnp.where(ok == any_ok, fit, jnp.inf)
        i = jnp.argmin(key)
        return IKResult(q=q[i], success=ok[i], fitness=fit[i], qa=qa[i])

    def solve(key, data):
        keys = jax.random.split(key, n)
        return jax.jit(run)(keys, data)

    return solve


def make_sharded_batch_solve(iksolver, mesh: Mesh, axis: str = "data"):
    """Throughput mode: scenario batch sharded over the mesh; each device
    solves its local shard of queries (islands vmapped locally).

    When the solver has a fused engine (bio2 family, see
    ``bio_ik_tpu.engine``), each device runs the fused kernel pipeline on
    its local shard under ``shard_map`` — the multi-chip scaling path of
    the headline benchmark.  No cross-device collectives are needed:
    every query's islands stay on one device.

    Returns ``fn(keys (B,2), data) -> IKResult`` with B divisible by the
    mesh size; every leaf of ``data`` must carry the leading B axis.
    """
    n = mesh.shape[axis]
    batch_sharding = NamedSharding(mesh, P(axis))

    if iksolver.engine is not None:
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
        def run(keys, data):
            return iksolver.engine._solve_batch(keys, data)
    else:
        @partial(jax.jit, out_shardings=batch_sharding)
        def run(keys, data):
            keys = jax.lax.with_sharding_constraint(keys, batch_sharding)
            data = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), data
            )
            return jax.vmap(iksolver._solve)(keys, data)

    def solve(keys, data):
        B = keys.shape[0]
        if B % n:
            raise ValueError(f"batch {B} not divisible by mesh size {n}")
        return jax.jit(run)(keys, data)

    return solve
