"""Neural-network solver family (``neural``, ``neural2``).

TPU-native counterpart of the reference's optional FANN-based solvers
(reference: src/ik_neural.cpp:83-690, OFF by default behind USE_FANN,
CMakeLists.txt:38-50):

  * ``neural``  — an MLP mapping (per-tip twist error toward the goal,
    current joint values) → Δq, applied iteratively
    (reference: IKNeural, ik_neural.cpp:135-427 — in = vars + 6/tip,
    hidden 50, out = vars, trained on 10k random delta-pose samples at
    first initialize, then iterative twist→Δq steps).
  * ``neural2`` — direct pose→q regression applied once
    (reference: IKNeural2, ik_neural.cpp:432-689 — trained pose→joints,
    only 2 solve steps).

The reference trains a FANN net with incremental backprop on the CPU at
the solver's first ``initialize`` (ik_neural.cpp:270-281).  Here training
is a jitted optax/Adam minibatch loop over freshly sampled FK data — run
once per (robot, goal structure) at solver construction, on device; the
trained weights become closure constants of the step function.  Training
samples mirror the reference's generator (ik_neural.cpp:150-266): random
in-bounds configurations, gaussian joint perturbations scaled like
``dpos/drot`` mixing, exact-FK input/target pairs.

Like the reference, these solvers support pose-type goals only (the net
consumes tip frame errors, ik_neural.cpp:300-356); fitness/acceptance of
the produced configurations still flows through the full goal system.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..math.quat import quat_conj, quat_mul, quat_to_rotvec_wrapped
from .base import Solver, SolverContext, register_solver

__all__ = ["NeuralSolver", "Neural2Solver"]

_HIDDEN = 50        # reference: layer sizes {input, 50, output}, ik_neural.cpp:287
_TRAIN_SAMPLES = 10_000   # reference: 10k samples, ik_neural.cpp:152
_TRAIN_STEPS = 2_000
_BATCH = 256
_DPOS = 0.1         # reference: perturbation scales, ik_neural.cpp:158-166
_DROT = 0.5


def _mlp_init(key, sizes, dtype):
    params = []
    for din, dout in zip(sizes[:-1], sizes[1:]):
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (din, dout), dtype) * jnp.sqrt(2.0 / din)
        params.append((w, jnp.zeros((dout,), dtype)))
    return params


def _mlp_apply(params, x):
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if i < len(params) - 1:
            x = jnp.tanh(x)  # reference: FANN sigmoid-symmetric, ik_neural.cpp:289
    return x


def _train(key, sizes, make_batch, dtype, train_steps=_TRAIN_STEPS):
    """Jitted Adam training loop; ``make_batch(key) -> (X, Y)``."""
    k_init, k_data = jax.random.split(key)
    params = _mlp_init(k_init, sizes, dtype)
    opt = optax.adam(1e-3)

    def loss_fn(p, X, Y):
        return jnp.mean(jnp.square(_mlp_apply(p, X) - Y))

    @jax.jit
    def run(params, key):
        opt_state = opt.init(params)

        def body(carry, k):
            params, opt_state = carry
            X, Y = make_batch(k)
            loss, g = jax.value_and_grad(loss_fn)(params, X, Y)
            updates, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, train_steps)
        )
        return params, losses[-1]

    return run(params, k_data)


class _NeuralBase(Solver):
    """Shared plumbing: goal tip frames + twist features."""

    def __init__(self, ctx: SolverContext, config):
        super().__init__(ctx, config)
        if ctx.fk is None:
            raise ValueError("neural solvers require link goals")
        p = ctx.problem
        self._objective_groups = [
            (i, grp)
            for i, grp in enumerate(p.primary)
            if grp.goal_type in ("position", "orientation", "pose")
        ]
        if not self._objective_groups:
            raise ValueError("neural solvers require pose-type goals")

    def _goal_tips(self, data, like):
        """Per-tip objective frames (pos (T,3), quat (T,4)) from the goal
        data, defaulting to the provided tip frames where unconstrained
        (reference analog: tipObjectives, ik_neural.cpp:300-320)."""
        pos, quat = like
        for gi, grp in self._objective_groups:
            gdata = data["primary"][gi]
            slots = grp.tip_slots
            if grp.goal_type in ("position", "pose"):
                pos = pos.at[..., slots, :].set(
                    jnp.broadcast_to(gdata["position"], pos[..., slots, :].shape)
                )
            if grp.goal_type in ("orientation", "pose"):
                quat = quat.at[..., slots, :].set(
                    jnp.broadcast_to(gdata["orientation"], quat[..., slots, :].shape)
                )
        return pos, quat

    @staticmethod
    def _twist(tip_pos, tip_quat, goal_pos, goal_quat):
        """6-vector per tip: [Δpos, rotvec(goal·tip⁻¹)]
        (reference: twist inputs, ik_neural.cpp:326-356)."""
        vel = goal_pos - tip_pos
        rot = quat_to_rotvec_wrapped(quat_mul(goal_quat, quat_conj(tip_quat)))
        return jnp.concatenate([vel, rot], axis=-1)


class NeuralState(NamedTuple):
    key: jax.Array
    qa: jax.Array
    best: jax.Array
    best_fitness: jax.Array


class NeuralSolver(_NeuralBase):
    """Iterative twist→Δq network (reference: IKNeural)."""

    default_islands = 1

    def __init__(self, ctx: SolverContext, config):
        super().__init__(ctx, config)
        p = ctx.problem
        V, T = ctx.nvars, ctx.ntips
        dtype = p.amin.dtype
        feat = 6 * T + V

        amin, amax = p.amin, p.amax
        span = jnp.where(jnp.isfinite(p.aspan), p.aspan, 1.0)
        neutral = jnp.asarray(p.model.neutral_q(), dtype)

        def make_batch(key):
            kq, kd = jax.random.split(key)
            u = jax.random.uniform(kq, (_BATCH, V), dtype)
            qa = amin + u * (amax - amin)
            dq = jax.random.normal(kd, (_BATCH, V), dtype) * (span * (_DPOS / 2))
            qa2 = jnp.clip(qa + dq, p.aclip_min, p.aclip_max)
            # tip frames of both configurations (exact FK)
            q0 = ctx.qfull(neutral, qa)
            q1 = ctx.qfull(neutral, qa2)
            f0 = ctx.fk(q0)
            f1 = ctx.fk(q1)
            tw = self._twist(f0.pos, f0.quat, f1.pos, f1.quat)  # (B, T, 6)
            X = jnp.concatenate([tw.reshape(_BATCH, -1), qa], axis=-1)
            Y = qa2 - qa
            return X, Y

        key = jax.random.PRNGKey(config.seed + 12345)
        self.params, self.final_loss = _train(
            key, (feat, _HIDDEN, V), make_batch, dtype,
            train_steps=config.neural_train_steps,
        )

    def init(self, key, data, randomize):
        ctx = self.ctx
        key, k1 = jax.random.split(key)
        qa = jnp.where(randomize, ctx.random_config(k1), data["seed_active"])
        f = ctx.fitness_exact(qa, data)
        return NeuralState(key=key, qa=qa, best=qa, best_fitness=f)

    def step(self, st: NeuralState, data) -> NeuralState:
        ctx = self.ctx
        tips = ctx.tips_frame(data["seed_full"], st.qa)
        gpos, gquat = self._goal_tips(data, (tips.pos, tips.quat))
        tw = self._twist(tips.pos, tips.quat, gpos, gquat)
        X = jnp.concatenate([tw.reshape(-1), st.qa], axis=-1)
        dq = _mlp_apply(self.params, X)
        # damped application (reference: iterative fractional steps,
        # ik_neural.cpp:358-427 apply with step scaling)
        qa = ctx.clip(st.qa + dq * 0.5)
        f = ctx.fitness_exact(qa, data)
        better = f < st.best_fitness
        return NeuralState(
            key=st.key,
            qa=qa,
            best=jnp.where(better, qa, st.best),
            best_fitness=jnp.where(better, f, st.best_fitness),
        )

    def solution(self, st: NeuralState, data):
        return st.best, st.best_fitness


class Neural2Solver(_NeuralBase):
    """Direct pose→q regression (reference: IKNeural2, 2 steps)."""

    default_islands = 1

    def __init__(self, ctx: SolverContext, config):
        super().__init__(ctx, config)
        p = ctx.problem
        V, T = ctx.nvars, ctx.ntips
        dtype = p.amin.dtype
        feat = 7 * T

        amin, amax = p.amin, p.amax
        neutral = jnp.asarray(p.model.neutral_q(), dtype)

        def make_batch(key):
            u = jax.random.uniform(key, (_BATCH, V), dtype)
            qa = amin + u * (amax - amin)
            q0 = ctx.qfull(neutral, qa)
            f0 = ctx.fk(q0)
            X = jnp.concatenate([f0.pos, f0.quat], axis=-1).reshape(_BATCH, -1)
            return X, qa

        key = jax.random.PRNGKey(config.seed + 54321)
        self.params, self.final_loss = _train(
            key, (feat, _HIDDEN, _HIDDEN, V), make_batch, dtype,
            train_steps=config.neural_train_steps,
        )

    def init(self, key, data, randomize):
        ctx = self.ctx
        qa = data["seed_active"]
        f = ctx.fitness_exact(qa, data)
        return NeuralState(key=key, qa=qa, best=qa, best_fitness=f)

    def step(self, st: NeuralState, data) -> NeuralState:
        ctx = self.ctx
        tips = ctx.tips_frame(data["seed_full"], st.qa)
        gpos, gquat = self._goal_tips(data, (tips.pos, tips.quat))
        X = jnp.concatenate([gpos, gquat], axis=-1).reshape(-1)
        qa = ctx.clip(_mlp_apply(self.params, X))
        f = ctx.fitness_exact(qa, data)
        better = f < st.best_fitness
        return NeuralState(
            key=st.key,
            qa=qa,
            best=jnp.where(better, qa, st.best),
            best_fitness=jnp.where(better, f, st.best_fitness),
        )

    def solution(self, st: NeuralState, data):
        return st.best, st.best_fitness


register_solver("neural")(lambda ctx, config: NeuralSolver(ctx, config))
register_solver("neural2")(lambda ctx, config: Neural2Solver(ctx, config))
