"""Quasi-Newton / derivative-free solver family (``optlib_*``) — cppoptlib analog.

TPU-native counterpart of the reference's optional cppoptlib wrapper
(reference: src/ik_cppoptlib.cpp:72-257, OFF by default behind
USE_CPPOPTLIB, CMakeLists.txt:52-65), which exposes bounded BFGS / L-BFGS /
gradient / conjugate-gradient / Newton / Nelder-Mead solvers as
``optlib_<name>[_r][_N]`` modes.  Gradient-based variants use exact
``jax.grad`` through the FK graph (the reference differentiates
numerically).  Variants:

  * ``optlib_lbfgs`` / ``optlib_bfgs`` — optax L-BFGS with zoom line
    search (bfgs = larger memory)
  * ``optlib_lbfgsb`` — projected L-BFGS: every inner update is clipped
    onto the box bounds (the bound-constrained flavor of the reference's
    LbfgsbSolver registration, ik_cppoptlib.cpp:248-249)
  * ``optlib_gd``   — plain gradient descent with zoom line search
  * ``optlib_cgd``  — Polak-Ribière(+) nonlinear conjugate gradient with
    a geometric backtracking line probe (ConjugatedGradientDescentSolver
    analog, ik_cppoptlib.cpp:241-242)
  * ``optlib_nd``   — damped Newton descent: ``-(H + λI)⁻¹ g`` from the
    exact jax Hessian of the fitness (NewtonDescentSolver analog,
    ik_cppoptlib.cpp:256-257)
  * ``optlib_nm``   — Nelder-Mead-style simplex: fixed-shape reflection /
    expansion / contraction candidates with masked best-of selection and
    masked shrink (NelderMeadSolver analog, ik_cppoptlib.cpp:253-254)
  * ``..._r``       — randomize the configuration when stuck
    (ik_cppoptlib.cpp:169-176)
  * ``..._2/_4/_8`` — default island counts.  The reference registers
    1/2/4-thread variants (IKCPPOPT macro, ik_cppoptlib.cpp); ``_8`` is a
    deliberate extension of the naming ladder here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .base import Solver, SolverContext, register_solver

__all__ = ["OptlibSolver"]

# 4 inner optimizer updates per step() is this framework's per-step
# granularity choice (matching the memetic 4-steps-per-check pattern);
# the reference runs cppoptlib with its default stopping criteria.
_INNER_UPDATES = 4
_PROBE_STEPS = 8  # geometric backtracking ladder for cgd/nd line probes


def _line_probe(f, qa, d, f0):
    """Evaluate ``qa + t·d`` for t in a geometric ladder 1..2^-7 and keep
    the best improving point (masked analog of a backtracking search)."""
    ts = 2.0 ** -jnp.arange(_PROBE_STEPS, dtype=qa.dtype)
    cands = qa[None, :] + ts[:, None] * d[None, :]
    fs = jax.vmap(f)(cands)
    i = jnp.argmin(fs)
    better = fs[i] < f0
    return jnp.where(better, cands[i], qa), jnp.where(better, fs[i], f0)


class OptlibState(NamedTuple):
    key: jax.Array
    qa: jax.Array
    opt_state: tuple  # variant-specific pytree
    best: jax.Array
    best_fitness: jax.Array
    stuck: jax.Array


class OptlibSolver(Solver):
    def __init__(self, ctx: SolverContext, config, variant="lbfgs",
                 reset_if_stuck=False, islands=1):
        super().__init__(ctx, config)
        self.default_islands = islands
        self.reset_if_stuck = reset_if_stuck
        self.variant = variant
        self.project = variant == "lbfgsb"
        self.opt = None
        if variant in ("lbfgs", "lbfgsb"):
            self.opt = optax.lbfgs(memory_size=10)
        elif variant == "bfgs":
            self.opt = optax.lbfgs(memory_size=50)
        elif variant == "gd":
            self.opt = optax.chain(
                optax.sgd(learning_rate=1.0),
                optax.scale_by_zoom_linesearch(max_linesearch_steps=8),
            )
        elif variant not in ("cgd", "nd", "nm"):
            raise ValueError(f"unknown optlib variant {variant!r}")

    def _objective(self, data):
        ctx = self.ctx

        def f(qa):
            return ctx.fitness_exact(ctx.clip(qa), data)

        return f

    # ---- variant-specific opt_state ------------------------------------
    def _init_opt(self, qa, f):
        if self.opt is not None:
            return self.opt.init(qa)
        if self.variant == "cgd":
            return (jnp.zeros_like(qa), jnp.zeros_like(qa))  # (g_prev, d_prev)
        if self.variant == "nd":
            return ()
        # nm: right-angled simplex around qa, one vertex per variable
        n = qa.shape[-1]
        span = self.ctx.problem.amax - self.ctx.problem.amin
        simplex = jnp.concatenate(
            [qa[None, :], qa[None, :] + 0.1 * span[None, :] * jnp.eye(n, dtype=qa.dtype)]
        )
        fvals = jax.vmap(f)(simplex)
        return (simplex, fvals)

    def init(self, key, data, randomize):
        ctx = self.ctx
        key, k1 = jax.random.split(key)
        qa = jnp.where(randomize, ctx.random_config(k1), data["seed_active"])
        f = self._objective(data)
        return OptlibState(
            key=key, qa=qa, opt_state=self._init_opt(qa, f),
            best=qa, best_fitness=f(qa), stuck=jnp.zeros((), bool),
        )

    # ---- inner update bodies --------------------------------------------
    def _inner_optax(self, f):
        def inner(_, carry):
            qa, opt_state = carry
            value, grad = optax.value_and_grad_from_state(f)(qa, state=opt_state)
            updates, opt_state = self.opt.update(
                grad, opt_state, qa, value=value, grad=grad, value_fn=f
            )
            qa = optax.apply_updates(qa, updates)
            if self.project:  # lbfgsb: iterates live on the box
                qa = self.ctx.clip(qa)
            return qa, opt_state

        return inner

    def _inner_cgd(self, f):
        def inner(_, carry):
            qa, (g_prev, d_prev) = carry
            f0, g = jax.value_and_grad(f)(qa)
            denom = jnp.maximum(jnp.vdot(g_prev, g_prev), 1e-30)
            beta = jnp.maximum(0.0, jnp.vdot(g, g - g_prev) / denom)  # PR+
            d = -g + beta * d_prev  # d_prev is unnormalized: standard PR+
            d = jnp.where(jnp.vdot(d, g) < 0, d, -g)  # enforce descent
            d_unit = d / (jnp.linalg.norm(d) + 1e-30)
            qa, _ = _line_probe(f, qa, d_unit, f0)
            return qa, (g, d)

        return inner

    def _inner_nd(self, f):
        def inner(_, carry):
            qa, opt_state = carry
            f0, g = jax.value_and_grad(f)(qa)
            H = jax.hessian(f)(qa)
            n = qa.shape[-1]
            lam = 1e-4 * (jnp.trace(jnp.abs(H)) / n + 1.0)
            d = -jnp.linalg.solve(H + lam * jnp.eye(n, dtype=qa.dtype), g)
            ok = jnp.all(jnp.isfinite(d)) & (jnp.vdot(d, g) < 0)
            d = jnp.where(ok, d, -g)
            d = d / (jnp.linalg.norm(d) + 1e-30)
            qa, _ = _line_probe(f, qa, d, f0)
            return qa, opt_state

        return inner

    def _inner_nm(self, f):
        def inner(_, carry):
            _, (s, fv) = carry
            order = jnp.argsort(fv)
            s, fv = s[order], fv[order]
            c = jnp.mean(s[:-1], axis=0)  # centroid of all but worst
            xw, fw = s[-1], fv[-1]
            step = c - xw
            cands = jnp.stack([c + step, c + 2.0 * step,  # reflect, expand
                               c + 0.5 * step, c - 0.5 * step])  # out/in contract
            fs = jax.vmap(f)(cands)
            k = jnp.argmin(fs)
            replace = fs[k] < fw
            s = s.at[-1].set(jnp.where(replace, cands[k], xw))
            fv = fv.at[-1].set(jnp.where(replace, fs[k], fw))
            # masked shrink toward the best vertex when nothing improved
            shrunk = s[0][None, :] + 0.5 * (s - s[0][None, :])
            shrunk_f = jax.vmap(f)(shrunk)
            s = jnp.where(replace, s, shrunk)
            fv = jnp.where(replace, fv, shrunk_f)
            return s[jnp.argmin(fv)], (s, fv)

        return inner

    def step(self, st: OptlibState, data) -> OptlibState:
        ctx = self.ctx
        f = self._objective(data)
        key, k1 = jax.random.split(st.key)

        qa0 = jnp.where(st.stuck, ctx.random_config(k1), st.qa)
        opt_state = jax.lax.cond(
            st.stuck,
            lambda: self._init_opt(qa0, f),
            lambda: st.opt_state,
        )

        inner = {
            "cgd": self._inner_cgd,
            "nd": self._inner_nd,
            "nm": self._inner_nm,
        }.get(self.variant, self._inner_optax)(f)

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


for _variant in ("lbfgs", "bfgs", "lbfgsb", "gd", "cgd", "nd", "nm"):
    for _r in ("", "_r"):
        for _n, _i in (("", 1), ("_2", 2), ("_4", 4), ("_8", 8)):
            register_solver(f"optlib_{_variant}{_r}{_n}")(
                lambda ctx, config, _v=_variant, _rr=bool(_r), _ii=_i:
                OptlibSolver(ctx, config, _v, _rr, _ii)
            )
