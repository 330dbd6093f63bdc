"""Diagnostic solver mode ``test``.

TPU-native counterpart of the reference's ``IKTest``
(reference: src/ik_test.cpp:40-137): compares the first-order tip-frame
linearizer against exact FK on randomly perturbed configurations
(±0.1 rad, ik_test.cpp:96) and reports the mean position / rotation
error of the approximation.  ``step()`` is a no-op (ik_test.cpp:132) and
the solution is the seed; the value of this mode is the logged error
statistics (available as device arrays in the state and printed via
``jax.debug.print`` at init, the analog of the reference's LOG lines,
ik_test.cpp:118-127).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kinematics.approx import apply_deltas
from ..math.quat import quat_angle_shortest, quat_normalize
from .base import Solver, SolverContext, register_solver

__all__ = ["TestSolver"]

_N_PROBES = 64      # perturbed configurations per init
_AMPLITUDE = 0.1    # reference: random(-0.1, 0.1) rad, ik_test.cpp:96


class TestState(NamedTuple):
    qa: jax.Array
    fitness: jax.Array
    pos_err: jax.Array   # mean |approx_pos − exact_pos|
    rot_err: jax.Array   # mean shortest-path angle(approx_quat, exact_quat)


class TestSolver(Solver):
    default_islands = 1

    def __init__(self, ctx: SolverContext, config):
        super().__init__(ctx, config)
        if ctx.linearize is None:
            raise ValueError("test mode requires link goals")

    def init(self, key, data, randomize):
        ctx = self.ctx
        qa0 = data["seed_active"]
        qfull = ctx.qfull(data["seed_full"], qa0)
        tips0, deltas = ctx.linearize(qfull)

        dq = jax.random.uniform(
            key, (_N_PROBES, ctx.nvars), qa0.dtype, -_AMPLITUDE, _AMPLITUDE
        )
        qs = ctx.clip(qa0 + dq)
        approx = apply_deltas(tips0, deltas, qs - qa0)       # (N, T, 7)
        exact = ctx.tips_frame(data["seed_full"], qs)        # Frame (N, T)

        pos_err = jnp.mean(
            jnp.linalg.norm(approx[..., 0:3] - exact.pos, axis=-1)
        )
        rot_err = jnp.mean(
            quat_angle_shortest(quat_normalize(approx[..., 3:7]), exact.quat)
        )
        jax.debug.print(
            "ik test: mean dpos {p} mean drot {r} rad over {n} probes",
            p=pos_err, r=rot_err, n=_N_PROBES,
        )
        return TestState(
            qa=qa0,
            fitness=ctx.fitness_exact(qa0, data),
            pos_err=pos_err,
            rot_err=rot_err,
        )

    def step(self, st: TestState, data) -> TestState:
        return st  # no-op (reference: ik_test.cpp:132)

    def solution(self, st: TestState, data):
        return st.qa, st.fitness


register_solver("test")(lambda ctx, config: TestSolver(ctx, config))
