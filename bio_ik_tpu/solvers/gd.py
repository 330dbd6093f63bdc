"""Gradient-descent solver family (``gd``, ``gd_r``, ``gd_c``, ``_2/_4/_8``).

TPU-native counterpart of the reference's ``IKGradientDescent``
(reference: src/ik_gradient.cpp:136-266).  The reference's per-variable
scalar probe loop (2 FK per variable) becomes one batched FK+fitness call
over a ``(2V, V)`` candidate matrix; the 3-point line probe is a second
``(2, V)`` batch.  Variants (template parameter ``if_stuck``):

  * ``gd``   — keep step only if fitness improves
  * ``gd_r`` — additionally randomize the config when stuck
  * ``gd_c`` — always accept ("continue")

The ``_2/_4/_8`` suffixes set the default island count, mirroring the
thread counts baked into the reference solver names
(ik_gradient.cpp:253-266).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import Solver, SolverContext, register_solver

__all__ = ["GDSolver"]


class GDState(NamedTuple):
    key: jax.Array
    qa: jax.Array           # current config (V,)
    fitness: jax.Array      # fitness of qa
    best: jax.Array         # best-so-far config
    best_fitness: jax.Array
    reset: jax.Array        # bool: randomize at next step (gd_r)


class GDSolver(Solver):
    def __init__(self, ctx: SolverContext, config, if_stuck=" ", islands=1):
        super().__init__(ctx, config)
        self.if_stuck = if_stuck
        self.default_islands = islands

    def init(self, key, data, randomize):
        ctx = self.ctx
        key, k1 = jax.random.split(key)
        rand_q = ctx.random_config(k1)
        qa = jnp.where(randomize, rand_q, data["seed_active"])
        f = ctx.fitness_exact(qa, data)
        return GDState(
            key=key, qa=qa, fitness=f, best=qa, best_fitness=f,
            reset=jnp.zeros((), bool),
        )

    def step(self, st: GDState, data) -> GDState:
        ctx = self.ctx
        V = ctx.nvars
        dtype = st.qa.dtype
        key, k1 = jax.random.split(st.key)

        # random reset if flagged (reference: ik_gradient.cpp:161-167)
        rand_q = ctx.random_config(k1)
        qa = jnp.where(st.reset, rand_q, st.qa)
        f0 = jnp.where(st.reset, ctx.fitness_exact(qa, data), st.fitness)

        # 2-point numeric gradient, one batched fitness call
        # (reference: ik_gradient.cpp:171-188, jd = 1e-4)
        jd = jnp.asarray(1e-4, dtype)
        eye = jnp.eye(V, dtype=dtype) * jd
        cand = jnp.concatenate([qa - eye, qa + eye], axis=0)       # (2V, V)
        fc = ctx.fitness_exact(cand, data)                         # (2V,)
        g = fc[V:] - fc[:V]

        # L1 normalization scaled to jd (reference: ik_gradient.cpp:191-196)
        g = g * (jd / (jnp.sum(jnp.abs(g)) + jnp.asarray(1e-4, dtype)))

        # 3-point line probe with linear step estimate
        # (reference: ik_gradient.cpp:199-221)
        pair = jnp.stack([qa - g, qa + g])                         # (2, V)
        fp = ctx.fitness_exact(pair, data)
        p1, p3 = fp[0], fp[1]
        p2 = (p1 + p3) * 0.5
        cost_diff = (p3 - p1) * 0.5
        joint_diff = p2 / cost_diff
        joint_diff = jnp.where(jnp.isfinite(joint_diff), joint_diff, 0.0)

        stepped = ctx.clip(qa - g * joint_diff)
        f_stepped = ctx.fitness_exact(stepped, data)

        if self.if_stuck == "c":
            new_qa, new_f = stepped, f_stepped
            reset = jnp.zeros((), bool)
        else:
            improved = f_stepped < f0
            new_qa = jnp.where(improved, stepped, qa)
            new_f = jnp.where(improved, f_stepped, f0)
            reset = (
                ~improved if self.if_stuck == "r" else jnp.zeros((), bool)
            )

        better = new_f < st.best_fitness
        return GDState(
            key=key,
            qa=new_qa,
            fitness=new_f,
            best=jnp.where(better, new_qa, st.best),
            best_fitness=jnp.where(better, new_f, st.best_fitness),
            reset=reset,
        )

    def solution(self, st: GDState, data):
        return st.best, st.best_fitness

    def inject(self, st: GDState, qa, fitness):
        """Adopt the migrant as the working point when it beats the
        current one (see Solver.inject)."""
        take = fitness < st.fitness
        return st._replace(
            qa=jnp.where(take, qa, st.qa),
            fitness=jnp.where(take, fitness, st.fitness),
            best=jnp.where(fitness < st.best_fitness, qa, st.best),
            best_fitness=jnp.minimum(fitness, st.best_fitness),
        )


for _name, _stuck, _islands in [
    ("gd", " ", 1), ("gd_2", " ", 2), ("gd_4", " ", 4), ("gd_8", " ", 8),
    ("gd_r", "r", 1), ("gd_r_2", "r", 2), ("gd_r_4", "r", 4), ("gd_r_8", "r", 8),
    ("gd_c", "c", 1), ("gd_c_2", "c", 2), ("gd_c_4", "c", 4), ("gd_c_8", "c", 8),
]:
    register_solver(_name)(
        lambda ctx, config, _s=_stuck, _i=_islands: GDSolver(ctx, config, _s, _i)
    )
