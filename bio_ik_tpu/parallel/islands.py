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

    When the solver has a fused megastep engine (bio2 family on a
    FIXED/REVOLUTE/PRISMATIC chain), each device runs the engine's
    kernel pipeline on its local islands instead of the vmapped solver —
    the flagship solver on the multi-device island path.  Migration then
    injects the global best into the species-1 second-parent gene rows
    of every local lane (the lane-layout analog of ``Bio2Solver.inject``)
    and updates each lane's incumbent where better.

    Returns ``fn(key, data) -> IKResult`` (jitted over the mesh; ``data``
    replicated).
    """
    from ..api import IKResult

    n = mesh.shape[axis]
    if iksolver.engine is not None and iksolver.engine.fullstep:
        return _make_sharded_island_solve_fused(iksolver, mesh, axis, migrate)
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


def _make_sharded_island_solve_fused(iksolver, mesh: Mesh, axis: str,
                                     migrate: bool):
    """Fused-engine island sharding (see make_sharded_island_solve)."""
    from ..api import IKResult

    engine = iksolver.engine
    n = mesh.shape[axis]

    def _global_best(best):
        """Reduce per-device bests (leaves lead with B=1) to the global
        winner, identically on every device (ik_parallel.h:220-261)."""
        qa, fit, ok, rank = best
        qa_g = jax.lax.all_gather(qa, axis).reshape(-1, qa.shape[-1])
        fit_g = jax.lax.all_gather(fit, axis).reshape(-1)
        ok_g = jax.lax.all_gather(ok, axis).reshape(-1)
        rank_g = jax.lax.all_gather(rank, axis).reshape(-1)
        any_ok = jnp.any(ok_g)
        sel = jnp.where(ok_g == any_ok, rank_g, jnp.inf)
        i = jnp.argmin(sel)
        return qa_g[i], fit_g[i], ok_g[i], rank_g[i]

    def _inject_lanes(state, qa, fit, tips_row):
        """Lane-layout analog of ``Bio2Solver.inject``: the migrant
        replaces the second parent on species-1 lanes (S is the fastest
        lane axis) and updates each lane's incumbent where better."""
        genes, grads, sfit, sol_r, sol_fit_r, sol_tips_r = state
        V = engine.sp.V
        odd = (jnp.arange(genes.shape[1]) % 2) == 1     # species-1 lanes
        qa_col = qa[:, None].astype(genes.dtype)
        genes = genes.at[V:2 * V].set(
            jnp.where(odd[None, :], qa_col, genes[V:2 * V]))
        grads = grads.at[V:2 * V].set(
            jnp.where(odd[None, :], 0.0, grads[V:2 * V]))
        better = fit < sol_fit_r[0]                     # (Mp,)
        sol_r = jnp.where(better[None, :], qa_col, sol_r)
        sol_fit_r = jnp.where(better[None, :], fit, sol_fit_r)
        sol_tips_r = jnp.where(
            better[None, :], tips_row[:, None].astype(sol_tips_r.dtype),
            sol_tips_r)
        return genes, grads, sfit, sol_r, sol_fit_r, sol_tips_r

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(keys, data):
        dataB = jax.tree.map(lambda x: x[None], data)
        state, consts, salt, best = engine._mega_prep(keys[0][None], dataB)

        def chunk_fn(state, best, c):
            state = engine._mega_once(
                engine._chunk_key(c), salt, state, consts)
            best = engine._merge(
                best, engine._eval_lanes(state[3], state[4], state[5], dataB))
            if migrate:
                qa_g, fit_g, ok_g, rank_g = _global_best(best)
                tipf = iksolver.ctx.tips_frame(
                    dataB["seed_full"], qa_g[None])
                tips_row = jnp.concatenate(
                    [tipf.pos, tipf.quat], -1).reshape(-1)
                state = _inject_lanes(state, qa_g, fit_g, tips_row)
                best = engine._merge(
                    best, (qa_g[None], fit_g[None], ok_g[None], rank_g[None]))
            return state, best

        if engine.inkernel_rng:
            # TPU: unroll — a pallas launch inside lax.scan reloads the
            # kernel program every iteration (see engine._solve_batch)
            for c in range(engine.nchecks):
                state, best = chunk_fn(state, best, c)
        else:
            # jnp tier: scan compiles the chunk body once
            (state, best), _ = jax.lax.scan(
                lambda carry, c: (chunk_fn(*carry, c), None),
                (state, best), jnp.arange(engine.nchecks))
        qa_g, fit_g, ok_g, _ = _global_best(best)
        qa_g = iksolver._rewrap(qa_g, data["seed_active"])
        return IKResult(
            q=iksolver.ctx.qfull(data["seed_full"], qa_g),
            success=ok_g, fitness=fit_g, qa=qa_g)

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
