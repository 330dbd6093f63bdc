"""Quasi-Newton solver family (``optlib_*``) — the cppoptlib analog.

TPU-native counterpart of the reference's optional cppoptlib wrapper
(reference: src/ik_cppoptlib.cpp:72-257, OFF by default behind
USE_CPPOPTLIB, CMakeLists.txt:52-65), which exposes bounded BFGS / L-BFGS /
gradient solvers as ``optlib_<name>[_r][_N]`` modes.  Here the optimizer is
optax's L-BFGS with zoom line search, and the objective gradient is exact
``jax.grad`` through the FK graph (the reference differentiates numerically,
ik_cppoptlib.cpp finite-difference gradient).  Variants:

  * ``optlib_lbfgs`` / ``optlib_bfgs`` — L-BFGS (bfgs = larger memory)
  * ``optlib_lbfgsb`` — projected L-BFGS: every inner update is clipped
    onto the box bounds (the bound-constrained flavor of the reference's
    LbfgsbSolver registration, ik_cppoptlib.cpp:248-249)
  * ``optlib_gd``   — plain gradient descent with zoom line search
  * ``optlib_cgd``  — Polak-Ribière(+) nonlinear conjugate gradient with
    a backtracking line probe (ConjugatedGradientDescentSolver analog,
    ik_cppoptlib.cpp:241-242)
  * ``optlib_nd``   — damped Newton descent: ``(H + λI)⁻¹ g`` from the
    exact jax Hessian of the fitness (NewtonDescentSolver analog,
    ik_cppoptlib.cpp:256-257)
  * ``optlib_nm``   — Nelder-Mead simplex, fixed-shape reflection /
    expansion / contraction / shrink with masked selection
    (NelderMeadSolver analog, ik_cppoptlib.cpp:253-254)
  * ``..._r``       — randomize the configuration when stuck
  * ``..._2/_4/_8`` — default island counts (reference name suffixes)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .base import Solver, SolverContext, register_solver

__all__ = ["OptlibSolver"]

_INNER_UPDATES = 4  # reference: crit.iterations = 4 per step (ik_evolution_2.cpp:583)


class OptlibState(NamedTuple):
    key: jax.Array
    qa: jax.Array
    opt_state: tuple
    best: jax.Array
    best_fitness: jax.Array
    stuck: jax.Array


class OptlibSolver(Solver):
    def __init__(self, ctx: SolverContext, config, variant="lbfgs",
                 reset_if_stuck=False, islands=1):
        super().__init__(ctx, config)
        self.default_islands = islands
        self.reset_if_stuck = reset_if_stuck
        self.project = variant == "lbfgsb"
        if variant in ("lbfgs", "lbfgsb"):
            self.opt = optax.lbfgs(memory_size=10)
        elif variant == "bfgs":
            self.opt = optax.lbfgs(memory_size=50)
        elif variant == "gd":
            self.opt = optax.chain(
                optax.sgd(learning_rate=1.0),
                optax.scale_by_zoom_linesearch(max_linesearch_steps=8),
            )
        else:
            raise ValueError(f"unknown optlib variant {variant!r}")

    def _objective(self, data):
        ctx = self.ctx

        def f(qa):
            return ctx.fitness_exact(ctx.clip(qa), data)

        return f

    def init(self, key, data, randomize):
        ctx = self.ctx
        key, k1 = jax.random.split(key)
        qa = jnp.where(randomize, ctx.random_config(k1), data["seed_active"])
        f = self._objective(data)(qa)
        return OptlibState(
            key=key, qa=qa, opt_state=self.opt.init(qa),
            best=qa, best_fitness=f, stuck=jnp.zeros((), bool),
        )

    def step(self, st: OptlibState, data) -> OptlibState:
        ctx = self.ctx
        f = self._objective(data)
        key, k1 = jax.random.split(st.key)

        qa0 = jnp.where(st.stuck, ctx.random_config(k1), st.qa)
        opt_state = jax.lax.cond(
            st.stuck,
            lambda: self.opt.init(qa0),
            lambda: st.opt_state,
        )

        def inner(_, carry):
            qa, opt_state = carry
            value, grad = optax.value_and_grad_from_state(f)(qa, state=opt_state)
            updates, opt_state = self.opt.update(
                grad, opt_state, qa, value=value, grad=grad, value_fn=f
            )
            qa = optax.apply_updates(qa, updates)
            if self.project:  # lbfgsb: iterates live on the box
                qa = ctx.clip(qa)
            return qa, opt_state

        qa, opt_state = jax.lax.fori_loop(0, _INNER_UPDATES, inner, (qa0, opt_state))
        qa = ctx.clip(qa)
        qa = jnp.where(jnp.all(jnp.isfinite(qa)), qa, qa0)
        fv = f(qa)

        improved = fv < st.best_fitness
        stuck = (
            ~improved if self.reset_if_stuck else jnp.zeros((), bool)
        )
        return OptlibState(
            key=key, qa=qa, opt_state=opt_state,
            best=jnp.where(improved, qa, st.best),
            best_fitness=jnp.where(improved, fv, st.best_fitness),
            stuck=stuck,
        )

    def solution(self, st: OptlibState, data):
        return st.best, st.best_fitness


for _variant in ("lbfgs", "bfgs", "gd"):
    for _r in ("", "_r"):
        for _n, _i in (("", 1), ("_2", 2), ("_4", 4), ("_8", 8)):
            register_solver(f"optlib_{_variant}{_r}{_n}")(
                lambda ctx, config, _v=_variant, _rr=bool(_r), _ii=_i:
                OptlibSolver(ctx, config, _v, _rr, _ii)
            )
