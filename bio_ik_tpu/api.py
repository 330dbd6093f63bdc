"""Top-level solve API: island racing + scenario batching.

TPU-native counterpart of the reference's plugin entry point + island
executor (reference: src/kinematics_plugin.cpp:437-655 searchPositionIK,
src/ik_parallel.h:90-277 IKParallel).  The reference clones the solver
onto N racing threads sharing a `finished` flag; here islands are a vmapped
leading axis of the solver state, stepped in lock-step on device, and the
"race" is a fixed iteration budget with a running best-accepted-solution
reduction — the jit-able equivalent of the reference's
first-success-cancels-the-rest protocol (winner selection semantics match
ik_parallel.h:220-261).

Wall-clock timeouts cannot be observed inside a jitted loop; budgets are
iterations (``config.max_steps``).  ``solve()`` handles one problem;
``solve_batch()`` vmaps the whole pipeline over a scenario axis whose
per-scenario goal parameters live in the data pytree.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .config import DEFAULT_CONFIG, SolverConfig
from .goals import Goal
from .problem import Problem
from .robot.model import RobotModel
from .solvers.base import SolverContext, make_solver

__all__ = ["IKSolver", "IKResult"]


class IKResult(NamedTuple):
    q: jax.Array          # full variable vector of the winner (Vfull,)
    success: jax.Array    # bool: winner passed the acceptance test
    fitness: jax.Array    # primary fitness of the winner
    qa: jax.Array         # active variables of the winner (V,)


_BIG = 1e30


class IKSolver:
    """Compiled solver for one robot + goal structure.

    Mirrors the reference's plugin lifecycle: construct once per
    (robot, goal structure, config) — the analog of plugin `initialize`
    (kinematics_plugin.cpp:191-335) — then call :meth:`solve` per query
    with a seed state and fresh goal parameters.
    """

    def __init__(
        self,
        model: RobotModel,
        goals: Sequence[Goal],
        config: SolverConfig = DEFAULT_CONFIG,
        fixed_joints: Sequence[str] = (),
        active_variables: Optional[Sequence[int]] = None,
    ):
        self.model = model
        self.config = config
        self.problem = Problem(
            model, goals, fixed_joints=fixed_joints,
            active_variables=active_variables, config=config,
        )
        self.ctx = SolverContext(self.problem)
        self.solver = make_solver(config.mode, self.ctx, config)
        self.islands = config.islands or self.solver.default_islands
        self._solve_jit = jax.jit(self._solve)
        self._solve_batch_jit = jax.jit(self._solve_batch)

    # ------------------------------------------------------------------
    def make_data(self, q_seed_full) -> Dict[str, Any]:
        return self.problem.make_data(q_seed_full)

    def _solve(self, key, data) -> IKResult:
        p, ctx, solver = self.problem, self.ctx, self.solver
        I = self.islands
        keys = jax.random.split(key, I)
        randomize = jnp.arange(I) > 0  # island 0 starts from the seed

        state = jax.vmap(lambda k, r: solver.init(k, data, r))(keys, randomize)

        def eval_islands(state):
            """Winner among islands (reference: ik_parallel.h:220-261):
            successes ranked by fitness (+ secondary fitness when secondary
            goals exist), before failures ranked by primary fitness."""
            qa, fit = jax.vmap(lambda s: solver.solution(s, data))(state)
            tips = ctx.tips_frame(data["seed_full"], qa)
            ok = p.check_solution(tips, qa, data)
            fsec = p.fitness_secondary(qa, data)
            rank_fit = fit + fsec if p.has_secondary else fit
            any_ok = jnp.any(ok)
            i = jnp.where(
                any_ok,
                jnp.argmin(jnp.where(ok, rank_fit, jnp.inf)),
                jnp.argmin(fit),
            )
            # comparison key across iterations: successes compare by
            # rank_fit, failures by primary fitness; success always beats
            # failure (handled in `body`)
            key = jnp.where(any_ok, rank_fit[i], fit[i])
            return qa[i], fit[i], ok[i], key

        # batch solver steps between acceptance checks
        # (reference: 4 steps per timeout/solution check, ik_parallel.h:165-168)
        spc = max(1, min(self.config.steps_per_check, self.config.max_steps))
        nchecks = max(1, self.config.max_steps // spc)

        def body(carry, _):
            state, best = carry
            state = jax.lax.fori_loop(
                0, spc, lambda _, s: jax.vmap(lambda x: solver.step(x, data))(s), state
            )
            qa, fit, ok, k = eval_islands(state)
            b_qa, b_fit, b_ok, b_key = best
            take = (ok & ~b_ok) | ((ok == b_ok) & (k < b_key))
            best = (
                jnp.where(take, qa, b_qa),
                jnp.where(take, fit, b_fit),
                jnp.where(take, ok, b_ok),
                jnp.where(take, k, b_key),
            )
            return (state, best), None

        best0 = eval_islands(state)
        (state, best), _ = jax.lax.scan(body, (state, best0), None, length=nchecks)
        qa, fit, ok, _ = best
        return IKResult(
            q=ctx.qfull(data["seed_full"], qa), success=ok, fitness=fit, qa=qa
        )

    def _solve_batch(self, keys, data) -> IKResult:
        return jax.vmap(self._solve)(keys, data)

    # ------------------------------------------------------------------
    def solve(self, q_seed, key=None, data=None) -> IKResult:
        """Solve one query.  ``q_seed (Vfull,)`` is the seed/initial guess;
        ``data`` (optional) a pytree from :meth:`make_data` with updated
        goal parameters."""
        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        if data is None:
            data = self.make_data(q_seed)
        return self._solve_jit(key, data)

    def solve_batch(self, keys, data) -> IKResult:
        """Solve B queries at once.  Every leaf of ``data`` must carry a
        leading batch axis (stack B outputs of :meth:`make_data`, e.g. via
        ``jax.tree.map(lambda *xs: jnp.stack(xs), *datas)``); ``keys`` is a
        ``(B, 2)`` PRNG key array.  This is the scenario-batched throughput
        mode (no reference analog — the reference solves one query per
        call)."""
        return self._solve_batch_jit(keys, data)
