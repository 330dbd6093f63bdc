"""Fully-fused bio2 step kernel: exact FK + linearize + generations +
memetic + exact-FK species fitness, one Pallas program per step.

Extends :mod:`bio_ik_tpu.kernels.bio2_step` (which consumes
pre-linearized tips/deltas) by generating the exact FK chain and the
delta-frame build *inside* the kernel from the robot's static structure
(:mod:`bio_ik_tpu.kernels.fk_rows`), so a solver step leaves only
species bookkeeping in XLA.  This is the whole of the reference's
per-step pipeline — applyConfiguration + initializeMutationApproximator
+ reproduce×gens + memetic + exact species fitness
(ik_evolution_2.cpp:328-614) — as one kernel.

Outputs per lane: updated genes/grads, the exact tip frames of the new
parent 0 (reused for acceptance checks — no extra FK), and its exact
primary fitness (reference :608-614).

Trace-time constant folding (floats vs rows, fk_rows) plays the role of
the reference's sparse mutation masks (forward_kinematics.h:907-929):
zero delta components and constant chain prefixes cost nothing.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .bio2_step import SpeciesParams, _P
from .fk_rows import FkRows

__all__ = ["make_fullstep_inner", "make_fullstep_kernel"]


def _comp(tipcomp, d):
    pos, quat = tipcomp
    return pos[d] if d < 3 else quat[d - 3]


def _is_zero(c):
    return isinstance(c, float) and c == 0.0


def make_fullstep_inner(model, tip_links: Sequence[str],
                        active_vars: Sequence[int],
                        inst_tip: Sequence[int], sp: SpeciesParams):
    """Build the fused step on (rows, N) arrays.

    ``inst_tip[k]`` maps goal instance k → tip index (into ``tip_links``).
    Signature of the returned ``inner``:

      inner(genes (P·V,N), grads (P·V,N), qfix (F,N) or None,
            gpos (K·3,N), gquat (K·4,N), wpos (K,N), wrot (K,N),
            span/cmin/cmax (V,N), noise (gens,V,C,N), rates (gens,C,N))
        → genes' (P·V,N), grads' (P·V,N), tips_exact (T·7,N), fit (1,N)
    """
    fkr = FkRows(model, tip_links, active_vars)
    V, K, C = sp.V, sp.K, sp.C
    T = len(tip_links)
    C2 = C + _P
    F = len(fkr.fixed_vars)

    def row(a, i):
        return a[i : i + 1, :]

    def inner(genes, grads, qfix, gpos, gquat, wpos, wrot,
              span, cmin, cmax, noise, rates):
        f32 = genes.dtype
        N = genes.shape[-1]

        p0g = [row(genes, v) for v in range(V)]
        p1g = [row(genes, V + v) for v in range(V)]
        p0r = [row(grads, v) for v in range(V)]
        p1r = [row(grads, V + v) for v in range(V)]
        x0 = list(p0g)
        fixed_rows = [row(qfix, i) for i in range(F)]

        spn = [row(span, v) for v in range(V)]
        clo = [row(cmin, v) for v in range(V)]
        chi = [row(cmax, v) for v in range(V)]

        # ---- exact FK + linearization at parent 0 (reference :341-346) --
        fr = fkr.frames(x0, fixed_rows)
        tips0 = fkr.tips(fr)        # [t] → (pos3, quat4) comps
        dts = fkr.deltas(fr)        # [v][t] → (dpos3, dquat4) | None

        def phen_of(dq):
            """K·7 phenotype components for gene deltas ``dq`` (list of V
            arrays, any common shape)."""
            ph = []
            for k in range(K):
                t = inst_tip[k]
                for d in range(7):
                    acc = _comp(tips0[t], d)
                    for v in range(V):
                        dv = dts[v][t]
                        if dv is None:
                            continue
                        c = _comp(dv, d)
                        if _is_zero(c):
                            continue
                        acc = acc + c * dq[v]
                    ph.append(acc)
            return ph

        def fitness_of(ph):
            fit = None
            sgns = []
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
                sgns.append(jnp.where(dm <= dp, 1.0, -1.0).astype(f32))
                term = row(wpos, k) * perr + row(wrot, k) * qerr
                fit = term if fit is None else fit + term
            return fit, sgns

        child_global = jax.lax.broadcasted_iota(jnp.int32, (C, N), 0) + _P
        fmix = jnp.where(child_global % 2 == 0, 0.2, 0.0).astype(f32)
        gfac = (child_global % 3).astype(f32)
        sub_idx = jax.lax.broadcasted_iota(jnp.int32, (C2, N), 0)

        # ---- generations (reference :349-431) ---------------------------
        for g in range(sp.gens):
            rate = rates[g]
            pgrad = [p0r[v] * (1.0 - fmix) + p1r[v] * fmix for v in range(V)]
            cg, cr = [], []
            for v in range(V):
                gv = p0g[v] + noise[g, v] * (rate * spn[v]) + pgrad[v] * gfac
                gv = jnp.clip(gv, clo[v], chi[v])
                cg.append(gv)
                cr.append(pgrad[v] * 0.7 + (gv - p0g[v]) * 0.3)

            pool_g = [
                jnp.concatenate([p0g[v], p1g[v], cg[v]], axis=0) for v in range(V)
            ]
            pool_r = [
                jnp.concatenate([p0r[v], p1r[v], cr[v]], axis=0) for v in range(V)
            ]
            dq = [pool_g[v] - x0[v] for v in range(V)]
            fit, _ = fitness_of(phen_of(dq))

            def pick(f):
                m = jnp.min(f, axis=0, keepdims=True)
                first = jnp.min(
                    jnp.where(f == m, sub_idx, jnp.asarray(C2, jnp.int32)),
                    axis=0, keepdims=True,
                )
                return (sub_idx == first).astype(f32)

            oh1 = pick(fit)
            oh2 = pick(jnp.where(oh1 > 0, jnp.asarray(jnp.inf, f32), fit))

            def gather(oh, rows_):
                return [
                    jnp.sum(oh * rows_[v], axis=0, keepdims=True)
                    for v in range(V)
                ]

            p0g, p1g = gather(oh1, pool_g), gather(oh2, pool_g)
            p0r, p1r = gather(oh1, pool_r), gather(oh2, pool_r)

        # ---- memetic on parent 0 (reference :436-600) --------------------
        if sp.memetic:
            h = jnp.asarray(sp.h, f32)
            eps = jnp.asarray(1e-12, f32)
            x = list(p0g)
            done = jnp.zeros((1, N), bool)
            for _ in range(sp.mem_iters):
                ph = phen_of([x[v] - x0[v] for v in range(V)])
                f2, sgns = fitness_of(ph)

                grad = []
                for v in range(V):
                    gv = 0.0
                    for k in range(K):
                        t = inst_tip[k]
                        dv = dts[v][t]
                        if dv is None:
                            continue
                        acc_p = 0.0
                        for d in range(3):
                            c = _comp(dv, d)
                            if _is_zero(c):
                                continue
                            acc_p = acc_p + c * (ph[k * 7 + d] - row(gpos, k * 3 + d))
                        acc_q = 0.0
                        for d in range(4):
                            c = _comp(dv, 3 + d)
                            if _is_zero(c):
                                continue
                            e = ph[k * 7 + 3 + d] - sgns[k] * row(gquat, k * 4 + d)
                            acc_q = acc_q + c * e
                        gv = gv + 2.0 * (row(wpos, k) * acc_p
                                         + row(wrot, k) * acc_q)
                    grad.append(gv)

                l1 = 0.0
                for v in range(V):
                    if _is_zero(grad[v]):
                        continue
                    l1 = l1 + jnp.abs(grad[v])
                scale = h / (l1 + eps)
                gdir = [
                    (0.0 if _is_zero(grad[v]) else grad[v] * scale)
                    for v in range(V)
                ]

                f1, _ = fitness_of(phen_of([x[v] - gdir[v] - x0[v] for v in range(V)]))
                f3, _ = fitness_of(phen_of([x[v] + gdir[v] - x0[v] for v in range(V)]))

                if sp.memetic == "q":
                    v1, v2 = f2 - f1, f3 - f2
                    vv = (v1 + v2) * 0.5
                    a = v1 - v2
                    step = jnp.where(jnp.isfinite(vv / a), vv / a, 0.0)
                    cand = [
                        jnp.clip(x[v] + gdir[v] * step, clo[v], chi[v])
                        for v in range(V)
                    ]
                else:
                    cost_diff = (f3 - f1) * 0.5
                    step = jnp.where(
                        jnp.isfinite(f2 / cost_diff), f2 / cost_diff, 0.0
                    )
                    cand = [
                        jnp.clip(x[v] - gdir[v] * step, clo[v], chi[v])
                        for v in range(V)
                    ]

                f4, _ = fitness_of(phen_of([cand[v] - x0[v] for v in range(V)]))
                accept = (f4 < f2) & ~done
                x = [jnp.where(accept, cand[v], x[v]) for v in range(V)]
                done = done | ~accept
            p0g = x

        # ---- exact FK + species fitness at the new parent 0 -------------
        fr2 = fkr.frames(p0g, fixed_rows)
        tips2 = fkr.tips(fr2)
        ph_exact = []
        for k in range(K):
            for d in range(7):
                ph_exact.append(_comp(tips2[inst_tip[k]], d))
        fit_exact, _ = fitness_of(ph_exact)

        tip_rows = []
        for t in range(T):
            for d in range(7):
                c = _comp(tips2[t], d)
                if isinstance(c, float):
                    c = jnp.full((1, N), c, f32)
                tip_rows.append(c)

        genes_out = jnp.concatenate(p0g + p1g, axis=0)
        grads_out = jnp.concatenate(p0r + p1r, axis=0)
        tips_out = jnp.concatenate(tip_rows, axis=0)
        return genes_out, grads_out, tips_out, fit_exact

    return inner, F


def make_fullstep_kernel(model, tip_links, active_vars, inst_tip,
                         sp: SpeciesParams, block_n: int = 256,
                         interpret: bool = False, inkernel_rng: bool = False):
    """Pallas wrapper of :func:`make_fullstep_inner` blocked over lanes.

    With ``inkernel_rng``, the gaussian mutation noise and the mutation-
    rate ladder are generated inside the kernel from the TPU per-core
    PRNG (Box–Muller over ``pltpu.prng_random_bits``; rates built
    directly from exponent bits) — the on-chip analog of the reference's
    precomputed 8M-entry noise ring buffers (ik_base.h:49-126), saving
    the gens·V·C noise tensor's HBM round trip per step.  The caller
    then passes a ``(1, 1)`` int32 seed instead of noise/rates arrays.

    Returns ``(fn, F)`` where F is the number of fixed-variable rows the
    caller must supply (``qfix (max(F,1), N)`` — a dummy row when F=0).
    """
    from jax.experimental.pallas import tpu as pltpu

    inner, F = make_fullstep_inner(model, tip_links, active_vars, inst_tip, sp)
    V, K, C = sp.V, sp.K, sp.C
    T = len(tip_links)
    W = block_n
    Fq = max(F, 1)

    def body(noise, rates, genes_ref, grads_ref, qfix_ref, gpos_ref,
             gquat_ref, wpos_ref, wrot_ref, span_ref, cmin_ref, cmax_ref,
             genes_out_ref, grads_out_ref, tips_out_ref, fit_out_ref):
        g, r, t, f = inner(
            genes_ref[:], grads_ref[:], qfix_ref[:],
            gpos_ref[:], gquat_ref[:], wpos_ref[:], wrot_ref[:],
            span_ref[:], cmin_ref[:], cmax_ref[:],
            noise, rates,
        )
        genes_out_ref[:] = g
        grads_out_ref[:] = r
        tips_out_ref[:] = t
        fit_out_ref[:] = f

    if inkernel_rng:
        def kernel(seed_ref, genes_ref, grads_ref, qfix_ref, gpos_ref,
                   gquat_ref, wpos_ref, wrot_ref, span_ref, cmin_ref,
                   cmax_ref, genes_out_ref, grads_out_ref, tips_out_ref,
                   fit_out_ref):
            pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
            shape = (sp.gens, V, C, W)
            b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            f32 = jnp.float32
            # Box–Muller: u ∈ (2⁻²⁵, 1] from the top 24 bits
            inv24 = jnp.asarray(1.0 / (1 << 24), f32)
            # Mosaic lacks a uint32→f32 cast; the top-24-bit values fit
            # int32, so bitcast first
            i1 = pltpu.bitcast(b1 >> 8, jnp.int32)
            i2 = pltpu.bitcast(b2 >> 8, jnp.int32)
            u1 = i1.astype(f32) * inv24 + jnp.asarray(2.0 ** -25, f32)
            u2 = i2.astype(f32) * inv24
            rad = jnp.sqrt(-2.0 * jnp.log(u1))
            noise = rad * jnp.cos(jnp.asarray(2.0 * np.pi, f32) * u2)
            # rate = 2^(k−23), k ∈ [0,16): exponent-bits construction
            kb = pltpu.bitcast(
                pltpu.prng_random_bits((sp.gens, C, W)), jnp.uint32
            ) & jnp.uint32(15)
            rates = pltpu.bitcast(
                ((kb + jnp.uint32(104)) << 23).astype(jnp.uint32), f32
            )
            body(noise, rates, genes_ref, grads_ref, qfix_ref, gpos_ref,
                 gquat_ref, wpos_ref, wrot_ref, span_ref, cmin_ref,
                 cmax_ref, genes_out_ref, grads_out_ref, tips_out_ref,
                 fit_out_ref)
    else:
        def kernel(genes_ref, grads_ref, qfix_ref, gpos_ref, gquat_ref,
                   wpos_ref, wrot_ref, span_ref, cmin_ref, cmax_ref,
                   noise_ref, rates_ref,
                   genes_out_ref, grads_out_ref, tips_out_ref, fit_out_ref):
            body(noise_ref[:], rates_ref[:], genes_ref, grads_ref, qfix_ref,
                 gpos_ref, gquat_ref, wpos_ref, wrot_ref, span_ref,
                 cmin_ref, cmax_ref, genes_out_ref, grads_out_ref,
                 tips_out_ref, fit_out_ref)

    def spec2(rows):
        return pl.BlockSpec((rows, W), lambda i: (0, i), memory_space=pltpu.VMEM)

    data_specs = [
        spec2(_P * V), spec2(_P * V), spec2(Fq),
        spec2(K * 3), spec2(K * 4), spec2(K), spec2(K),
        spec2(V), spec2(V), spec2(V),
    ]
    if inkernel_rng:
        in_specs = [
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        ] + data_specs
    else:
        in_specs = data_specs + [
            pl.BlockSpec((sp.gens, V, C, W), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp.gens, C, W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
    out_specs = (spec2(_P * V), spec2(_P * V), spec2(T * 7), spec2(1))

    evals = sp.gens * (C + _P) + (sp.mem_iters * 4 if sp.memetic else 0)
    flops_per_lane = evals * (K * 7 * V * 2 + K * 30) + 900
    nlinks = len(model.link_schedule(
        [model.link_index[t] for t in tip_links]))

    @jax.jit
    def run(*args):
        genes = args[1] if inkernel_rng else args[0]
        N = genes.shape[-1]
        if N % W:
            raise ValueError(f"lane batch {N} not a multiple of {W}")
        return pl.pallas_call(
            kernel,
            grid=(N // W,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((_P * V, N), genes.dtype),
                jax.ShapeDtypeStruct((_P * V, N), genes.dtype),
                jax.ShapeDtypeStruct((T * 7, N), genes.dtype),
                jax.ShapeDtypeStruct((1, N), genes.dtype),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_lane * N,
                bytes_accessed=4 * N * (sp.gens * V * C + sp.gens * C
                                        + 4 * _P * V + 3 * V + Fq),
                transcendentals=(2 * nlinks
                                 + (3 * sp.gens * V * C if inkernel_rng else 0)
                                 ) * N,
            ),
            interpret=interpret,
        )(*args)

    return run, F
