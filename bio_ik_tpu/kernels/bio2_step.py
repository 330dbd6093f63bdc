"""Fused bio2 species-step kernel (Pallas TPU) — the M8 north-star kernel.

One kernel invocation runs the ENTIRE bio2 species inner loop — 8
generations of (mutate → approximate-FK → fitness → select-2) plus the
8-iteration memetic gradient descent — for a lane-batch of problems,
entirely in VMEM.  This is the TPU answer to the reference's AVX+FMA
mutation approximator (reference: src/forward_kinematics.h:932-1233
computeApproximateMutations + src/ik_evolution_2.cpp:242-600 reproduce/
memetic): where the reference vectorizes one problem's genes across SIMD
lanes, this kernel vectorizes PROBLEMS across the 128-wide vector lanes
and keeps every intermediate (children, phenotypes, fitness, gradients)
on-chip, eliminating the HBM round-trips that dominate the XLA op-by-op
path (~20 ms/step at B=4096 measured; arithmetic is ~100× less).

Data layout: every per-problem quantity is an ``(rows, N)`` array with
the problem/species index N on the minor (lane) axis, blocked to
``(rows, W)`` tiles; scalar rows are ``(1, W)`` and child-indexed tiles
are ``(C, W)``.  All loops over generations, variables, children and
goals are unrolled at trace time (V, K, C are small and static).

Fast-path restrictions (callers fall back to the XLA path otherwise):
  * primary goals are position/orientation/pose groups only (folded into
    K goal rows with per-goal weight², rotation_scale² and a goal→tip map
    applied by the caller),
  * no secondary goals (no pre-selection pass, reference :366-378).

Floating-joint quaternion gene blocks ARE supported: each mutation
renormalizes them in-kernel (``SpeciesParams.quat_slices``, reference:
ik_evolution_2.cpp:320-324).

The same math runs in three ways from one source (``make_species_inner``):
inside the Pallas kernel, as a plain-jnp function (CPU tests / fallback),
and under ``interpret=True`` — so the kernel is testable bit-for-bit
against the pure-jnp evaluation of identical inputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["make_species_inner", "make_species_kernel", "SpeciesParams",
           "SEC_ROWS", "make_sec_eval"]

_P = 2  # parents kept per species (reference: population_size=2, ik_evolution_2.cpp:137)

# packed per-variable secondary-fitness rows (engine._secondary_rows
# builds them in this order; shared by the species and fullstep tiers)
SEC_ROWS = ("alpha", "beta", "gamma", "delta", "tbar", "mid", "hspan",
            "seed")


def make_sec_eval(sec, V, sec_terms):
    """Row-level secondary fitness + gradient over the packed ``sec``
    const ``(8·V, N)``.  ``sec_terms`` ⊆ {"alpha","beta","gamma","delta"}
    statically gates which terms the problem actually has (absent terms
    cost nothing).  Returns ``(sec_of(xs) → (·,N), sec_grad(xs, v) →
    (·,N))`` for ``xs`` a list of V rows.  Quadratic forms: see the
    secondary evaluators in problem.py (reference: goal_types.h:240-367).
    """
    ridx = {name: i for i, name in enumerate(SEC_ROWS)}

    def row(name, v):
        return sec[ridx[name] * V + v : ridx[name] * V + v + 1, :]

    def terms_v(xs, v):
        out = []
        xm = xs[v] - row("mid", v)
        es = xs[v] - row("seed", v)
        if "alpha" in sec_terms:
            out.append(("alpha", xm))
        if "beta" in sec_terms:
            out.append(("beta", es))
        if "delta" in sec_terms:
            out.append(("delta", xs[v] - row("tbar", v)))
        return out, xm

    def sec_of(xs):
        acc = 0.0
        for v in range(V):
            quads, xm = terms_v(xs, v)
            for name, e in quads:
                acc = acc + row(name, v) * (e * e)
            if "gamma" in sec_terms:
                r = jnp.maximum(2.0 * jnp.abs(xm) - row("hspan", v), 0.0)
                acc = acc + row("gamma", v) * (r * r)
        return acc

    def sec_grad(xs, v):
        quads, xm = terms_v(xs, v)
        g = 0.0
        for name, e in quads:
            g = g + 2.0 * row(name, v) * e
        if "gamma" in sec_terms:
            r = jnp.maximum(2.0 * jnp.abs(xm) - row("hspan", v), 0.0)
            sgn = jnp.where(xm >= 0, 1.0, -1.0).astype(xs[v].dtype)
            g = g + 4.0 * row("gamma", v) * r * sgn
        return g

    return sec_of, sec_grad


class SpeciesParams(NamedTuple):
    """Static shape/config of the fused kernel."""

    V: int            # active variables
    K: int            # pose-goal instances
    C: int = 16       # children per generation (reference :138)
    gens: int = 8     # generations (reference :349-351, memetic variant)
    mem_iters: int = 8  # memetic iterations (reference :453)
    memetic: str = "q"  # 'q' quadratic | 'l' linear | '' none
    h: float = 1e-3   # memetic probe length (f32-resolvable; see bio2.py)
    quat_slices: tuple = ()  # start rows of floating-joint quat gene
    #                          blocks, renormalized after each mutation
    #                          (reference: ik_evolution_2.cpp:320-324)


def make_species_inner(sp: SpeciesParams, sec_terms: tuple = ()):
    """Build ``inner(args...) -> (genes_out, grads_out)`` on (rows, N)
    arrays.  Row layouts:

      genes/grads   (P·V, N)   parent-major: row p·V+v
      tips0         (K·7, N)   goal-instance tip frames at x0 (pos+quat)
      deltas        (V·K·7, N) row v·K·7 + k·7 + d  (∂tip_kd/∂x_v)
      gpos          (K·3, N), gquat (K·4, N)
      wpos, wrot    (K, N)   position / rotation error weights
      span, cmin, cmax (V, N)
      noise         (gens, V, C, N) unit gaussians
      rates         (gens, C, N) mutation rates (2^(k-23), reference :265)

    With ``sec_terms`` non-empty two trailing args are required:

      keeps         (gens, 1, N) uniforms for the pre-selection prefix
      sec           (8·V, N)   packed :data:`SEC_ROWS` quadratic consts

    and each generation ranks children by secondary fitness, keeping a
    random-count best prefix (reference: ik_evolution_2.cpp:366-378);
    the memetic line search then runs on the COMBINED fitness with
    primary-vs-primary acceptance (reference :459-537).

    The linearization point x0 is genes row block of parent 0 (the caller
    linearized there, reference :341-346).
    """
    V, K, C = sp.V, sp.K, sp.C
    C2 = C + _P

    def row(a, i):
        return a[i : i + 1, :]

    def phen_rows(tips0, deltas, dq):
        """Approximate tip rows for gene deltas ``dq``: list over v of
        (M, N) arrays → K·7 list of (M, N).
        (reference: computeApproximateMutations, forward_kinematics.h:1061)
        """
        ph = []
        for k in range(K):
            for d in range(7):
                acc = row(tips0, k * 7 + d)
                for v in range(V):
                    acc = acc + row(deltas, (v * K + k) * 7 + d) * dq[v]
                ph.append(acc)
        return ph

    def fitness_rows(ph, gpos, gquat, wpos, wrot):
        """Σ_k wpos·‖Δp‖² + wrot·min(‖q−ĝ‖², ‖q+ĝ‖²)
        (reference: Position/Orientation/PoseGoal::evaluate,
        goal_types.h:80-181; wpos/wrot fold weight² and rotation_scale²).
        """
        fit = None
        for k in range(K):
            perr = 0.0
            for d in range(3):
                e = ph[k * 7 + d] - row(gpos, k * 3 + d)
                perr = perr + e * e
            dm = 0.0
            dp = 0.0
            for d in range(4):
                q = ph[k * 7 + 3 + d]
                g = row(gquat, k * 4 + d)
                dm = dm + (q - g) * (q - g)
                dp = dp + (q + g) * (q + g)
            qerr = jnp.minimum(dm, dp)
            term = row(wpos, k) * perr + row(wrot, k) * qerr
            fit = term if fit is None else fit + term
        return fit

    def inner(genes, grads, tips0, deltas, gpos, gquat, wpos, wrot,
              span, cmin, cmax, noise, rates, keeps=None, sec=None):
        f32 = genes.dtype
        N = genes.shape[-1]
        if sec_terms:
            sec_of, sec_grad = make_sec_eval(sec, V, sec_terms)

        # parent gene/grad rows as lists of (1, N)
        p0g = [row(genes, 0 * V + v) for v in range(V)]
        p1g = [row(genes, 1 * V + v) for v in range(V)]
        p0r = [row(grads, 0 * V + v) for v in range(V)]
        p1r = [row(grads, 1 * V + v) for v in range(V)]
        x0 = list(p0g)  # linearization point (parent 0 at entry)

        spn = [row(span, v) for v in range(V)]
        clo = [row(cmin, v) for v in range(V)]
        chi = [row(cmax, v) for v in range(V)]
        x0_pool = [jnp.broadcast_to(x0[v], (C2, N)) for v in range(V)]

        # per-child constants (reference child_index = 2.., :263-269)
        child_global = jax.lax.broadcasted_iota(jnp.int32, (C, N), 0) + _P
        fmix = jnp.where(child_global % 2 == 0, 0.2, 0.0).astype(f32)
        gfac = (child_global % 3).astype(f32)

        # ---- generations (reference :349-431) --------------------------
        for g in range(sp.gens):
            rate = rates[g]  # (C, N)
            pgrad = [p0r[v] * (1.0 - fmix) + p1r[v] * fmix for v in range(V)]
            cg, cr = [], []
            for v in range(V):
                gv = p0g[v] + noise[g, v] * (rate * spn[v]) + pgrad[v] * gfac
                gv = jnp.clip(gv, clo[v], chi[v])
                cg.append(gv)
                cr.append(pgrad[v] * 0.7 + (gv - p0g[v]) * 0.3)  # mix(:299)

            # renormalize floating-joint quaternion gene blocks per child
            # (reference: ik_evolution_2.cpp:320-324 normalizeFast — one
            # Newton-Raphson step toward unit norm, frame.h:231-238)
            for s in sp.quat_slices:
                n2 = (cg[s] * cg[s] + cg[s + 1] * cg[s + 1]
                      + cg[s + 2] * cg[s + 2] + cg[s + 3] * cg[s + 3])
                fnorm = (3.0 - n2) * 0.5
                for d in range(4):
                    cg[s + d] = cg[s + d] * fnorm

            # pool rows: parents first (kept alive, reference :381-388)
            pool_g = [
                jnp.concatenate([p0g[v], p1g[v], cg[v]], axis=0) for v in range(V)
            ]
            pool_r = [
                jnp.concatenate([p0r[v], p1r[v], cr[v]], axis=0) for v in range(V)
            ]

            dq = [pool_g[v] - x0_pool[v] for v in range(V)]
            ph = phen_rows(tips0, deltas, dq)
            fit = fitness_rows(ph, gpos, gquat, wpos, wrot)  # (C2, N)

            if sec_terms:
                # pre-selection: rank children by secondary fitness, keep
                # a random-count best prefix for the primary selection
                # (reference :366-378)
                ssec = sec_of(cg)                       # (C, N)
                s_i = ssec[:, None, :]                  # (C, 1, N)
                s_j = ssec[None, :, :]                  # (1, C, N)
                ii = jax.lax.broadcasted_iota(jnp.int32, (C, C, 1), 0)
                jj = jax.lax.broadcasted_iota(jnp.int32, (C, C, 1), 1)
                beats = (s_j < s_i) | ((s_j == s_i) & (jj < ii))
                rank = jnp.sum(beats.astype(jnp.int32), axis=1)   # (C, N)
                kcount = (keeps[g] * (C - 1)).astype(jnp.int32) + 1
                child_keep = rank < kcount              # ∈ [1, C-1] kept
                # parents always survive; mask dropped children to +inf
                # (f32 concat — Mosaic cannot concatenate i1 vectors)
                fit = jnp.concatenate(
                    [fit[:_P],
                     jnp.where(child_keep, fit[_P:],
                               jnp.asarray(jnp.inf, f32))], axis=0)

            # select best 2 by one-hot min (reference selection :410-431);
            # first-occurrence tie-break via an index-min (cumsum does not
            # lower to Pallas TPU)
            sub_idx = jax.lax.broadcasted_iota(jnp.int32, (C2, N), 0)

            def pick(f):
                m = jnp.min(f, axis=0, keepdims=True)
                eq = f == m
                first = jnp.min(
                    jnp.where(eq, sub_idx, jnp.asarray(C2, jnp.int32)),
                    axis=0, keepdims=True,
                )
                oh = (sub_idx == first).astype(f32)
                return m, oh

            _, oh1 = pick(fit)
            fit2 = jnp.where(oh1 > 0, jnp.asarray(jnp.inf, f32), fit)
            _, oh2 = pick(fit2)

            def gather(oh, rows):
                return [
                    jnp.sum(oh * rows[v], axis=0, keepdims=True) for v in range(V)
                ]

            p0g, p1g = gather(oh1, pool_g), gather(oh2, pool_g)
            p0r, p1r = gather(oh1, pool_r), gather(oh2, pool_r)

        # ---- memetic phase on parent 0 (reference :436-600) -------------
        if sp.memetic:
            h = jnp.asarray(sp.h, f32)
            eps = jnp.asarray(1e-12, f32)

            def f_of(xs):
                dq = [xs[v] - x0[v] for v in range(V)]
                ph = phen_rows(tips0, deltas, dq)
                return fitness_rows(ph, gpos, gquat, wpos, wrot), ph

            x = list(p0g)
            done = jnp.zeros((1, x[0].shape[-1]), bool)
            for _ in range(sp.mem_iters):
                f2p, ph = f_of(x)
                # line search runs on the COMBINED fitness when secondary
                # goals exist; acceptance stays primary-vs-primary
                # (reference :459-537: fa = f2p + secondary, f4p < f2p)
                f2 = f2p + sec_of(x) if sec_terms else f2p
                # analytic gradient of the approximated pose fitness
                # (replaces the reference's 1e-7 finite differences, :450-474
                # — see bio2.py for the precision rationale)
                grad = []
                sgn = []
                for k in range(K):
                    dm = 0.0
                    dp = 0.0
                    for d in range(4):
                        q = ph[k * 7 + 3 + d]
                        gq = row(gquat, k * 4 + d)
                        dm = dm + (q - gq) * (q - gq)
                        dp = dp + (q + gq) * (q + gq)
                    sgn.append(jnp.where(dm <= dp, 1.0, -1.0).astype(f32))
                for v in range(V):
                    gv = 0.0
                    for k in range(K):
                        acc_p = 0.0
                        for d in range(3):
                            e = ph[k * 7 + d] - row(gpos, k * 3 + d)
                            acc_p = acc_p + row(deltas, (v * K + k) * 7 + d) * e
                        acc_q = 0.0
                        for d in range(4):
                            e = ph[k * 7 + 3 + d] - sgn[k] * row(gquat, k * 4 + d)
                            acc_q = acc_q + row(deltas, (v * K + k) * 7 + 3 + d) * e
                        gv = gv + 2.0 * (row(wpos, k) * acc_p
                                          + row(wrot, k) * acc_q)
                    if sec_terms:
                        gv = gv + sec_grad(x, v)
                    grad.append(gv)

                l1 = 0.0
                for v in range(V):
                    l1 = l1 + jnp.abs(grad[v])
                scale = h / (l1 + eps)
                gdir = [grad[v] * scale for v in range(V)]

                xm_ = [x[v] - gdir[v] for v in range(V)]
                xp_ = [x[v] + gdir[v] for v in range(V)]
                f1, _ = f_of(xm_)
                f3, _ = f_of(xp_)
                if sec_terms:
                    f1 = f1 + sec_of(xm_)
                    f3 = f3 + sec_of(xp_)

                if sp.memetic == "q":
                    # quadratic fit (reference :498-516)
                    v1, v2 = f2 - f1, f3 - f2
                    vv = (v1 + v2) * 0.5
                    a = v1 - v2
                    step = vv / a
                    step = jnp.where(jnp.isfinite(step), step, 0.0)
                    cand = [
                        jnp.clip(x[v] + gdir[v] * step, clo[v], chi[v])
                        for v in range(V)
                    ]
                else:
                    # linear step (reference :545-556)
                    cost_diff = (f3 - f1) * 0.5
                    step = f2 / cost_diff
                    step = jnp.where(jnp.isfinite(step), step, 0.0)
                    cand = [
                        jnp.clip(x[v] - gdir[v] * step, clo[v], chi[v])
                        for v in range(V)
                    ]

                f4p, _ = f_of(cand)
                accept = (f4p < f2p) & ~done
                x = [jnp.where(accept, cand[v], x[v]) for v in range(V)]
                done = done | ~accept  # break on non-improvement (:535-537)
            p0g = x

        genes_out = jnp.concatenate(p0g + p1g, axis=0)
        grads_out = jnp.concatenate(p0r + p1r, axis=0)
        return genes_out, grads_out

    return inner


def make_species_kernel(sp: SpeciesParams, block_n: int = 256,
                        interpret: bool = False, sec_terms: tuple = ()):
    """Wrap the inner as a ``pl.pallas_call`` blocked over the problem
    lane axis.  Returns ``fn(genes, grads, tips0, deltas, gpos, gquat,
    wsq, rssq, span, cmin, cmax, noise, rates[, keeps, sec]) ->
    (genes', grads')`` for ``(rows, N)`` inputs with N a multiple of
    ``block_n`` (trailing ``keeps/sec`` required iff ``sec_terms``).
    """
    from jax.experimental.pallas import tpu as pltpu  # deferred: CPU-safe

    V, K, C = sp.V, sp.K, sp.C
    inner = make_species_inner(sp, sec_terms)
    has_sec = bool(sec_terms)

    def kernel(*refs):
        (genes_ref, grads_ref, tips0_ref, deltas_ref, gpos_ref,
         gquat_ref, wpos_ref, wrot_ref, span_ref, cmin_ref, cmax_ref,
         noise_ref, rates_ref) = refs[:13]
        extra = {}
        if has_sec:
            extra = dict(keeps=refs[13][:], sec=refs[14][:])
        genes_out_ref, grads_out_ref = refs[-2:]
        genes_out, grads_out = inner(
            genes_ref[:], grads_ref[:], tips0_ref[:], deltas_ref[:],
            gpos_ref[:], gquat_ref[:], wpos_ref[:], wrot_ref[:],
            span_ref[:], cmin_ref[:], cmax_ref[:],
            noise_ref[:], rates_ref[:], **extra,
        )
        genes_out_ref[:] = genes_out
        grads_out_ref[:] = grads_out

    W = block_n

    def spec2(rows):
        return pl.BlockSpec((rows, W), lambda i: (0, i), memory_space=pltpu.VMEM)

    in_specs = [
        spec2(_P * V),           # genes
        spec2(_P * V),           # grads
        spec2(K * 7),            # tips0
        spec2(V * K * 7),        # deltas
        spec2(K * 3),            # gpos
        spec2(K * 4),            # gquat
        spec2(K),                # wpos
        spec2(K),                # wrot
        spec2(V),                # span
        spec2(V),                # cmin
        spec2(V),                # cmax
        pl.BlockSpec((sp.gens, V, C, W), lambda i: (0, 0, 0, i),
                     memory_space=pltpu.VMEM),   # noise
        pl.BlockSpec((sp.gens, C, W), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),   # rates
    ]
    if has_sec:
        in_specs.append(pl.BlockSpec((sp.gens, 1, W), lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM))  # keeps
        in_specs.append(spec2(8 * V))                           # sec rows
    out_specs = (spec2(_P * V), spec2(_P * V))

    # FLOP estimate: (gens·C2 + memetic·4)·(K·7·V·2 + K·30) per lane
    evals = sp.gens * (C + _P) + (sp.mem_iters * 4 if sp.memetic else 0)
    flops_per_lane = evals * (K * 7 * V * 2 + K * 30)

    @jax.jit
    def run(genes, grads, tips0, deltas, gpos, gquat, wpos, wrot,
            span, cmin, cmax, noise, rates, *sec_args):
        N = genes.shape[-1]
        if N % W:
            raise ValueError(f"lane batch {N} not a multiple of {W}")
        grid = (N // W,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((_P * V, N), genes.dtype),
                jax.ShapeDtypeStruct((_P * V, N), genes.dtype),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_lane * N,
                bytes_accessed=4 * N * (sp.gens * V * C + sp.gens * C
                                        + 4 * _P * V + V * K * 7 + 3 * V),
                transcendentals=0,
            ),
            interpret=interpret,
        )(genes, grads, tips0, deltas, gpos, gquat, wpos, wrot,
          span, cmin, cmax, noise, rates, *sec_args)

    return run
