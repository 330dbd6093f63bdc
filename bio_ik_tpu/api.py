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

import itertools
import math
import time
from typing import Any, Dict, NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .config import DEFAULT_CONFIG, SolverConfig
from .goals import Goal
from .problem import Problem
from .robot.model import RobotModel
from .solvers.base import SolverContext, make_solver

__all__ = ["IKSolver", "IKResult", "AdaptiveBatchSolver"]


class AdaptiveBatchSolver:
    """Multi-phase scenario-batched solving with failure compaction.

    Runs a cheap first pass over the whole batch, then gathers the failed
    queries and re-solves only those with progressively larger island
    counts / step budgets.  This recovers most of the reference's
    early-exit economics (easy queries stop early, ik_parallel.h:160-190)
    in a fixed-shape batched setting: each phase is one compiled program,
    failures are compacted host-side into fixed-size retry chunks.

    ``phases`` is a sequence of ``(islands, max_steps)``; the first phase
    processes the full batch, later phases process failure chunks of size
    ``batch × chunk_fraction`` (padded by repeating failures).
    """

    def __init__(self, model, goal_list, config=DEFAULT_CONFIG,
                 phases=((1, 8), (2, 32), (4, 64)), chunk_fraction=0.25,
                 fractions=None, **kwargs):
        self.phases = phases
        self.chunk_fraction = chunk_fraction
        # per-retry-phase batch fraction for the on-device pipeline: each
        # retry phase re-solves the worst ``fractions[i]·B`` problems
        # (failures first).  Defaults sized to the measured failure decay
        # of the default phases (~75 % unsolved after the cheap pass,
        # ~15 % after the second).
        if fractions is None:
            fractions = tuple(
                0.75 if i == 0 else 0.25 / (2 ** (i - 1))
                for i in range(len(phases) - 1)
            )
        self.fractions = fractions
        # each phase checks acceptance once, at its end (steps_per_check =
        # max_steps): phases are retry escalations, not latency races, so
        # intermediate checks only add launches — the in-kernel incumbent
        # is monotone in fitness and is what the final check evaluates
        self.solvers = [
            IKSolver(model, goal_list,
                     config.replace(islands=i, max_steps=s,
                                    steps_per_check=s), **kwargs)
            for i, s in phases
        ]
        # when every phase has a fused engine, the whole multi-phase
        # pipeline runs as ONE device program: failure compaction happens
        # on device (sort-by-success + fixed-size gather), eliminating
        # the per-phase host sync (~25 ms each through a remote tunnel)
        if all(s.engine is not None for s in self.solvers):
            self._fused_adaptive = jax.jit(self._adaptive_on_device)
        else:
            self._fused_adaptive = None

    def _adaptive_on_device(self, keys, data):
        B = keys.shape[0]
        res = self.solvers[0].engine._solve_batch(keys, data)
        for phase_idx, solver in enumerate(self.solvers[1:], start=1):
            chunk = max(1, int(B * self.fractions[phase_idx - 1]))
            # failures first (stable sort keeps a deterministic order)
            order = jnp.argsort(res.success.astype(jnp.int32), stable=True)
            idx = order[:chunk]
            sub_data = jax.tree.map(lambda x: x[idx], data)
            sub_keys = jax.vmap(jax.random.fold_in, (0, None))(
                keys[idx], phase_idx
            )
            sub = solver.engine._solve_batch(sub_keys, sub_data)
            take = (sub.success & ~res.success[idx]) | (
                (sub.success == res.success[idx]) & (sub.fitness < res.fitness[idx])
            )
            res = IKResult(
                q=res.q.at[idx].set(jnp.where(take[:, None], sub.q, res.q[idx])),
                # adopt the retry's OWN success flag when taking it — a
                # better-fitness failure must not be promoted to success
                success=res.success.at[idx].set(
                    jnp.where(take, sub.success, res.success[idx])
                ),
                fitness=res.fitness.at[idx].set(
                    jnp.where(take, sub.fitness, res.fitness[idx])
                ),
                qa=res.qa.at[idx].set(jnp.where(take[:, None], sub.qa, res.qa[idx])),
            )
        return res

    @property
    def problem(self):
        return self.solvers[0].problem

    def make_data(self, q_seed_full):
        return self.solvers[0].make_data(q_seed_full)

    def solve_batch(self, keys, data) -> "IKResult":
        import numpy as np

        if self._fused_adaptive is not None:
            return self._fused_adaptive(keys, data)

        res = self.solvers[0].solve_batch(keys, data)
        B = keys.shape[0]
        chunk = max(1, int(B * self.chunk_fraction))
        for phase_idx, solver in enumerate(self.solvers[1:], start=1):
            fail = np.flatnonzero(~np.asarray(res.success))
            if fail.size == 0:
                break
            for lo in range(0, fail.size, chunk):
                idx = fail[lo : lo + chunk]
                # pad the chunk to fixed size by repeating entries
                pad = np.resize(idx, chunk)
                sub_data = jax.tree.map(lambda x: x[pad], data)
                sub_keys = jax.vmap(jax.random.fold_in, (0, None))(
                    keys[pad], phase_idx
                )
                sub = solver.solve_batch(sub_keys, sub_data)
                # scatter back entries that improved (success wins; ties by
                # fitness — same ordering as the island winner selection)
                take = np.asarray(sub.success)[: idx.size] | (
                    np.asarray(sub.fitness)[: idx.size]
                    < np.asarray(res.fitness)[idx]
                )
                upd = idx[take]
                src = np.flatnonzero(take)
                res = IKResult(
                    q=res.q.at[upd].set(sub.q[src]),
                    success=res.success.at[upd].set(sub.success[src]),
                    fitness=res.fitness.at[upd].set(sub.fitness[src]),
                    qa=res.qa.at[upd].set(sub.qa[src]),
                )
        return res


class IKResult(NamedTuple):
    q: jax.Array          # full variable vector of the winner (Vfull,)
    success: jax.Array    # bool: winner passed the acceptance test
    fitness: jax.Array    # primary fitness of the winner
    qa: jax.Array         # active variables of the winner (V,)


_BIG = 1e30


def _log_counter(steps: int, islands: int) -> None:
    """Iteration-count observability (reference: the `counter` param logs
    iteration_count after each query, ik_parallel.h:107, 263-266)."""
    import logging

    logging.getLogger("bio_ik_tpu").info(
        "ik solve: %d steps x %d islands", steps, islands
    )


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
        block_n: Optional[int] = None,
    ):
        self.model = model
        self.config = config
        self.problem = Problem(
            model, goals, fixed_joints=fixed_joints,
            active_variables=active_variables, config=config,
        )
        # §5.5 observability: per-query metrics accumulate when the
        # reference's `counter` knob is on (opt-in — recording syncs the
        # success/fitness buffers to host)
        if config.counter:
            from .profiling import SolveStats

            self.stats = SolveStats()
        else:
            self.stats = None
        self.ctx = SolverContext(self.problem)
        self.solver = make_solver(config.mode, self.ctx, config)
        self.islands = config.islands or self.solver.default_islands
        self._solve_jit = jax.jit(self._solve)
        self._solve_batch_jit = jax.jit(self._solve_batch)
        self.engine = None
        if config.fused != "off" and config.elite_migration is False:
            from .engine import FusedBio2Engine

            if FusedBio2Engine.supports(self) is None:
                # Pallas on TPU; the same fused math as plain jnp elsewhere
                self.engine = FusedBio2Engine(
                    self, block_n=block_n,
                    use_pallas=jax.default_backend() == "tpu",
                )

    # ------------------------------------------------------------------
    @classmethod
    def for_tips(
        cls,
        model: RobotModel,
        tip_links: Sequence[str],
        config: SolverConfig = DEFAULT_CONFIG,
        **kwargs,
    ) -> "IKSolver":
        """Default-goal construction mirroring the reference plugin's
        ``load()`` (kinematics_plugin.cpp:273-330): one PoseGoal per tip
        with ``rotation_scale`` (0 when ``position_only_ik``), plus
        optional CenterJoints / AvoidJointLimits / MinimalDisplacement
        regularizers from the config weights."""
        from .goals import (
            AvoidJointLimitsGoal,
            CenterJointsGoal,
            MinimalDisplacementGoal,
            PoseGoal,
        )

        rs = 0.0 if config.position_only_ik else config.rotation_scale
        goals = [PoseGoal(link=t, rotation_scale=rs) for t in tip_links]
        if config.center_joints_weight > 0:
            goals.append(CenterJointsGoal(weight=config.center_joints_weight))
        if config.avoid_joint_limits_weight > 0:
            goals.append(AvoidJointLimitsGoal(weight=config.avoid_joint_limits_weight))
        if config.minimal_displacement_weight > 0:
            goals.append(
                MinimalDisplacementGoal(weight=config.minimal_displacement_weight)
            )
        return cls(model, goals, config, **kwargs)

    def make_data(self, q_seed_full) -> Dict[str, Any]:
        return self.problem.make_data(q_seed_full)

    def _init_islands(self, key, data):
        solver = self.solver
        keys = jax.random.split(key, self.islands)
        randomize = jnp.arange(self.islands) > 0  # island 0 starts from the seed
        state = jax.vmap(lambda k, r: solver.init(k, data, r))(keys, randomize)
        return state, self._eval_islands(state, data)

    def _eval_islands(self, state, data):
        """Winner among islands (reference: ik_parallel.h:220-261):
        successes ranked by fitness (+ secondary fitness when secondary
        goals exist), before failures ranked by primary fitness."""
        p, ctx, solver = self.problem, self.ctx, self.solver
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
        # comparison key across iterations: successes compare by rank_fit,
        # failures by primary fitness; success beats failure in _merge_best
        key = jnp.where(any_ok, rank_fit[i], fit[i])
        return qa[i], fit[i], ok[i], key

    @staticmethod
    def _merge_best(best, cand):
        b_qa, b_fit, b_ok, b_key = best
        qa, fit, ok, k = cand
        take = (ok & ~b_ok) | ((ok == b_ok) & (k < b_key))
        return (
            jnp.where(take, qa, b_qa),
            jnp.where(take, fit, b_fit),
            jnp.where(take, ok, b_ok),
            jnp.where(take, k, b_key),
        )

    def _chunk(self, state, best, data):
        """steps_per_check solver steps then one acceptance evaluation
        (reference: 4 steps per timeout/solution check, ik_parallel.h:165-168).
        """
        solver = self.solver
        spc = max(1, min(self.config.steps_per_check, self.config.max_steps))
        state = jax.lax.fori_loop(
            0, spc, lambda _, s: jax.vmap(lambda x: solver.step(x, data))(s), state
        )
        best = self._merge_best(best, self._eval_islands(state, data))
        if self.config.elite_migration:
            # broadcast the running best into every island (island-model
            # extension, no reference analog — see Solver.inject)
            qa, fit = best[0], best[1]
            state = jax.vmap(lambda s: solver.inject(s, qa, fit))(state)
        return state, best

    def _result(self, best, data) -> IKResult:
        qa, fit, ok, _ = best
        qa = self._rewrap(qa, data["seed_active"])
        return IKResult(
            q=self.ctx.qfull(data["seed_full"], qa), success=ok, fitness=fit, qa=qa
        )

    def _solve(self, key, data) -> IKResult:
        spc = max(1, min(self.config.steps_per_check, self.config.max_steps))
        nchecks = max(1, self.config.max_steps // spc)
        state, best0 = self._init_islands(key, data)

        def body(carry, _):
            state, best = carry
            state, best = self._chunk(state, best, data)
            return (state, best), None

        (state, best), _ = jax.lax.scan(body, (state, best0), None, length=nchecks)
        return self._result(best, data)

    def _rewrap(self, qa, seed_active):
        """Shift revolute solution angles by 2π multiples toward the seed,
        wrap into limits, clamp (reference: kinematics_plugin.cpp:580-613;
        skipped when the robot has mimic joints, as in the reference)."""
        if self.model.mimic_vars:
            return qa
        p = self.problem
        av = np.asarray(p.active_vars)
        rev = jnp.asarray(self.model.var_is_revolute[av])
        two_pi = 2.0 * math.pi
        r = seed_active
        # nearest 2π-congruent value to the seed
        v = qa - jnp.round((qa - r) / two_pi) * two_pi
        # wrap into [min, max] by 2π steps, then clamp
        hi, lo = p.amax, p.amin
        v = v - jnp.ceil(jnp.maximum(0.0, v - hi) / two_pi) * two_pi
        v = v + jnp.ceil(jnp.maximum(0.0, lo - v) / two_pi) * two_pi
        v = jnp.clip(v, lo, hi)
        return jnp.where(rev, v, qa)

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
        t0 = time.perf_counter()
        res = self._solve_jit(key, data)
        if self.stats is not None:
            # reference: `counter` param logs the per-query iteration
            # count (ik_parallel.h:263-266); fixed-budget solves always
            # run the full budget across all islands
            self.stats.record(res, time.perf_counter() - t0,
                              self.config.max_steps)
            _log_counter(self.config.max_steps, self.islands)
        return res

    def search(self, q_seed, key=None, data=None, *,
               return_approximate_solution=False, solution_callback=None):
        """MoveIt-style search semantics on top of :meth:`solve`
        (reference: kinematics_plugin.cpp:638-654): returns ``None``
        instead of an unaccepted result unless
        ``return_approximate_solution``; when ``solution_callback`` is
        given it acts as a host-side validity filter — a callable
        ``(IKResult) -> bool`` (the analog of MoveIt's IKCallbackFn) that
        can reject an otherwise-accepted solution."""
        res = self.solve(q_seed, key=key, data=data)
        if not bool(res.success) and not return_approximate_solution:
            return None
        if solution_callback is not None and not solution_callback(res):
            return None
        return res

    def solve_until(self, q_seed, key=None, data=None,
                    timeout_s=None) -> IKResult:
        """Latency mode: host-polled early exit.  Runs
        ``steps_per_check``-step chunks and stops as soon as the acceptance
        test passes — the direct analog of the reference's wall-clock race
        where the first accepted solution cancels the remaining work
        (reference: ik_parallel.h:160-190).  Same result distribution as
        :meth:`solve` for failed queries; successful queries return the
        FIRST accepted winner rather than the best within the full budget.

        ``timeout_s`` adds the reference's wall-clock deadline ("best
        accepted solution within ``timeout`` seconds",
        kinematics_plugin.cpp:506-507): when given it REPLACES the step
        budget — chunks keep running until acceptance or the deadline.
        Routed to the fused megastep engine (one kernel launch per chunk)
        when the problem qualifies; the vmapped island path otherwise.
        """
        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        if data is None:
            data = self.make_data(q_seed)
        t_start = time.perf_counter()
        if self.engine is not None and self.engine.fullstep:
            res, steps = self.engine.solve_until(key, data,
                                                 timeout_s=timeout_s)
            if self.stats is not None:
                self.stats.record(res, time.perf_counter() - t_start, steps)
                _log_counter(steps, self.islands)
            return res
        if not hasattr(self, "_init_jit"):
            self._init_jit = jax.jit(self._init_islands)
            self._chunk_jit = jax.jit(self._chunk)
            self._result_jit = jax.jit(self._result)
        spc = max(1, min(self.config.steps_per_check, self.config.max_steps))
        nchecks = max(1, self.config.max_steps // spc)
        deadline = None if timeout_s is None else t_start + timeout_s
        state, best = self._init_jit(key, data)
        steps = 0
        checks = itertools.count() if timeout_s is not None else range(nchecks)
        for _ in checks:
            state, best = self._chunk_jit(state, best, data)
            steps += spc
            if bool(best[2]):  # success flag — host-side early exit
                break
            if deadline is not None and time.perf_counter() >= deadline:
                break
        res = self._result_jit(best, data)
        if self.stats is not None:
            self.stats.record(res, time.perf_counter() - t_start, steps)
            _log_counter(steps, self.islands)
        return res

    def solve_batch(self, keys, data) -> IKResult:
        """Solve B queries at once.  Every leaf of ``data`` must carry a
        leading batch axis (stack B outputs of :meth:`make_data`, e.g. via
        ``jax.tree.map(lambda *xs: jnp.stack(xs), *datas)``); ``keys`` is a
        ``(B, 2)`` PRNG key array.  This is the scenario-batched throughput
        mode (no reference analog — the reference solves one query per
        call).

        Routed to the fused species-kernel engine when the problem
        qualifies (``config.fused``, bio2-family modes): same algorithm
        and acceptance semantics, ~an order of magnitude faster on TPU
        (different PRNG stream, so results differ bitwise from the
        vmapped path)."""
        t0 = time.perf_counter()
        if self.engine is not None:
            res = self.engine.solve_batch(keys, data)
        else:
            res = self._solve_batch_jit(keys, data)
        if self.stats is not None:
            res.q.block_until_ready()
            self.stats.record(res, time.perf_counter() - t0,
                              self.config.max_steps)
        return res
