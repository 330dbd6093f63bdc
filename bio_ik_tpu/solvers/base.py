"""Solver infrastructure: shared per-problem machinery + solver registry.

TPU-native counterpart of the reference's ``IKBase`` + ``IKFactory``
(reference: src/ik_base.h:128-214).  A solver here is a pure-function
triple ``init / step / solution`` over an immutable state pytree — the
population-loop analog of the reference's mutable ``step()`` objects —
vmapped over islands and scenarios by the orchestrator in
:mod:`bio_ik_tpu.api`.

The reference's per-thread RNG buffers (ik_base.h:49-126) become threefry
keys carried in the state; `thread_index`-dependent random initialization
(e.g. ik_gradient.cpp:150-152) becomes a traced ``randomize`` flag.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..kinematics import make_fk, make_linearizer, make_jacobian
from ..math.frame import Frame
from ..problem import Problem

__all__ = ["SolverContext", "register_solver", "make_solver", "solver_names"]


class SolverContext:
    """Compiled kinematics + fitness plumbing for one Problem."""

    def __init__(self, problem: Problem):
        self.problem = problem
        model = problem.model
        self.av = np.asarray(problem.active_vars, dtype=np.int64)
        self.nvars = len(self.av)
        self.ntips = problem.ntips
        self.dtype = problem.dtype
        if problem.tip_links:
            self.fk = make_fk(model, problem.tip_links)
            self.linearize = make_linearizer(model, problem.tip_links, problem.active_vars)
            self.jacobian = make_jacobian(model, problem.tip_links, problem.active_vars)
        else:
            self.fk = self.linearize = self.jacobian = None

    # ---- configuration plumbing --------------------------------------
    def qfull(self, seed_full, qa):
        """Scatter active values into the full variable vector
        (reference analog: genesToJointVariables, ik_evolution_2.cpp:101-107).
        """
        base = jnp.broadcast_to(seed_full, qa.shape[:-1] + seed_full.shape[-1:])
        return base.at[..., self.av].set(qa)

    def tips_frame(self, seed_full, qa) -> Frame:
        if self.fk is None:
            shape = qa.shape[:-1]
            return Frame(
                pos=jnp.zeros(shape + (0, 3), qa.dtype),
                quat=jnp.zeros(shape + (0, 4), qa.dtype),
            )
        return self.fk(self.qfull(seed_full, qa))

    def tips_packed(self, seed_full, qa):
        f = self.tips_frame(seed_full, qa)
        return jnp.concatenate([f.pos, f.quat], axis=-1)

    # ---- fitness helpers (reference: ik_base.h:163-207) ---------------
    def fitness_exact(self, qa, data):
        """Primary fitness via exact FK."""
        tips = self.tips_packed(data["seed_full"], qa)
        return self.problem.fitness(tips, qa, data)

    def fitness_combined_exact(self, qa, data):
        tips = self.tips_packed(data["seed_full"], qa)
        return self.problem.fitness_combined(tips, qa, data)

    # ---- variable-space helpers ---------------------------------------
    def random_config(self, key, shape=()):
        """Uniform sample in the [min, max] box (reference: random(min,max)
        init, e.g. ik_evolution_2.cpp:628-629)."""
        p = self.problem
        u = jax.random.uniform(key, tuple(shape) + (self.nvars,), p.amin.dtype)
        return p.amin + u * (p.amax - p.amin)

    def clip(self, qa):
        return jnp.clip(qa, self.problem.aclip_min, self.problem.aclip_max)


class Solver:
    """Protocol for pure-function solvers (single island).

    Subclasses set ``default_islands`` (reference: concurrency(),
    ik_base.h:208) and implement init/step/solution.
    """

    default_islands = 1

    def __init__(self, ctx: SolverContext, config):
        self.ctx = ctx
        self.config = config

    def init(self, key, data, randomize):
        raise NotImplementedError

    def step(self, state, data):
        raise NotImplementedError

    def solution(self, state, data):
        """→ (qa, primary_fitness) of the incumbent best."""
        raise NotImplementedError

    def inject(self, state, qa, fitness):
        """Elite migration hook: absorb a migrant ``(qa, fitness)`` from
        another island into the state.  Default: no-op.

        No reference analog (the reference's islands exchange nothing,
        ik_parallel.h:94-97); this is the island-model extension SURVEY
        §5.8 plans for scale-out quality — the migrant is the global best
        broadcast between step chunks via ``all_gather`` over the mesh.
        """
        return state


_REGISTRY: Dict[str, Callable[[SolverContext, object], Solver]] = {}


def register_solver(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def make_solver(mode: str, ctx: SolverContext, config) -> Solver:
    """Instantiate a solver by mode name (reference: IKFactory::create,
    utils.h:398-444 + registration lines in each solver file)."""
    _import_all()
    if mode not in _REGISTRY:
        raise ValueError(f"unknown solver mode {mode!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[mode](ctx, config)


def _import_all():
    # import solver modules lazily to populate the registry
    from . import gd as _gd  # noqa: F401
    from . import jac as _jac  # noqa: F401
    from . import bio2 as _bio2  # noqa: F401
    from . import bio1 as _bio1  # noqa: F401
    from . import optlib as _optlib  # noqa: F401
    from . import neural as _neural  # noqa: F401
    from . import testmode as _testmode  # noqa: F401


def solver_names():
    _import_all()
    return sorted(_REGISTRY)
