"""Pseudoinverse-Jacobian solver (``jac``, ``jac_2/_4/_8``).

TPU-native counterpart of the reference's ``IKJacobianBase``/``IKJacobian``
(reference: src/ik_gradient.cpp:42-133, 269-292): per step, compute the
tip→goal twist errors, solve the stacked least-squares system ``J Δq = t``
and apply the clipped update.  The reference computes tip-local twists and
a tip-local Jacobian and solves via Eigen's SVD; here both sides are in
world coordinates (a per-tip block-orthogonal rotation of the same system,
so the least-squares solution is identical) and the solve is
``jnp.linalg.lstsq`` on device.

Goal frames are taken from position/orientation/pose goal groups
(reference analog: tipObjectives from goal.frame, ik_gradient.cpp:62-68);
tips without such a goal keep a zero twist error.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math.frame import Frame
from .base import Solver, SolverContext, register_solver

__all__ = ["JacobianSolver"]


class JacState(NamedTuple):
    key: jax.Array
    qa: jax.Array


class JacobianSolver(Solver):
    def __init__(self, ctx: SolverContext, config, islands=1):
        super().__init__(ctx, config)
        self.default_islands = islands
        if ctx.jacobian is None:
            raise ValueError("jac solver requires link goals")
        # static map: which goal groups define tip objective frames
        self._objective_groups = [
            (i, grp)
            for i, grp in enumerate(ctx.problem.primary)
            if grp.goal_type in ("position", "orientation", "pose")
        ]

    def _objectives(self, tips0: Frame, data) -> Frame:
        """Per-tip goal frames; components not constrained by any goal
        default to the current tip value (zero twist error)."""
        pos, quat = tips0.pos, tips0.quat
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
        return Frame(pos=pos, quat=quat)

    def init(self, key, data, randomize):
        ctx = self.ctx
        key, k1 = jax.random.split(key)
        qa = jnp.where(randomize, ctx.random_config(k1), data["seed_active"])
        return JacState(key=key, qa=qa)

    def step(self, st: JacState, data) -> JacState:
        ctx = self.ctx
        qfull = ctx.qfull(data["seed_full"], st.qa)
        tips0, J = ctx.jacobian(qfull)            # J: (T, 6, V)
        objectives = self._objectives(tips0, data)
        # twist toward the goal, world frame (see module docstring)
        vel = objectives.pos - tips0.pos          # (T, 3)
        from ..math.quat import quat_conj, quat_mul, quat_to_rotvec_wrapped

        rot = quat_to_rotvec_wrapped(quat_mul(objectives.quat, quat_conj(tips0.quat)))
        t = jnp.concatenate([vel, rot], axis=-1).reshape(-1)        # (6T,)
        A = J.reshape(-1, J.shape[-1])                              # (6T, V)
        dq, *_ = jnp.linalg.lstsq(A, t)
        dq = jnp.where(jnp.isfinite(dq), dq, 0.0)
        qa = ctx.clip(st.qa + dq)
        return JacState(key=st.key, qa=qa)

    def solution(self, st: JacState, data):
        return st.qa, self.ctx.fitness_exact(st.qa, data)


for _name, _islands in [("jac", 1), ("jac_2", 2), ("jac_4", 4), ("jac_8", 8)]:
    register_solver(_name)(
        lambda ctx, config, _i=_islands: JacobianSolver(ctx, config, _i)
    )
