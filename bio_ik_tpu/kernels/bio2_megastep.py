"""Megastep kernel: MANY fused bio2 steps — including species sort,
wipeout, and incumbent tracking — in ONE Pallas program.

:mod:`bio_ik_tpu.kernels.bio2_fullstep` fuses a single solver step
(exact FK + linearize + generations + memetic + exact species fitness);
the per-step species bookkeeping (sort/wipeout, reference:
ik_evolution_2.cpp:604-645) and the incumbent update (reference
:640-644) still ran as XLA ops between kernel launches, costing an HBM
round trip of the full solver state per step plus launch/interleave
overhead on every step.  This module moves that bookkeeping into the
kernel and wraps the whole step sequence of one acceptance chunk
(reference: ik_parallel.h:165-168 — 4 steps between solution checks) in
an in-kernel ``fori_loop``, so solver state lives in VMEM for the whole
chunk and XLA only sees one launch per chunk.

Species pairing rides the lane layout: the engine lays lanes out as
``lane = ((b·I + i)·S + s)`` with S = 2 species fastest, so the two
species of an island are ADJACENT lanes and the species compare-swap
(reference :617) is a conditional exchange with lane-rolled partners
(``pltpu.roll`` by ±1) — no cross-block communication.

The incumbent (best-ever genes/tips/fitness) is tracked PER LANE; the
per-island incumbent of the reference (min over species each step,
reference :640-644) is recovered exactly by the engine's winner
reduction over the island × species axes at chunk boundaries.

Two RNG modes, as in bio2_fullstep: on-chip PRNG (Box–Muller over
``pltpu.prng_random_bits``) for compiled TPU runs, host-provided noise
tensors for interpret/CPU testing.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .bio2_step import SpeciesParams, _P
from .bio2_fullstep import make_fullstep_inner

__all__ = ["make_megastep_body", "make_megastep_kernel"]

_WIPEOUT_P = 0.1  # reference: ik_evolution_2.cpp:632


def make_megastep_body(model, tip_links, active_vars, inst_tip,
                       sp: SpeciesParams, n_steps: int, *, use_pltpu_roll):
    """Build the chunk body over ``(rows, N)`` arrays.

    Returns ``(body, F)``; ``body(state, consts, draw)`` advances the
    solver state by ``n_steps`` fused steps where

      state  = (genes (2V,N), grads (2V,N), sfit (1,N),
                sol (V,N), sol_fit (1,N), sol_tips (T·7,N))
      consts = (qfix (max(F,1),N), gpos (K·3,N), gquat (K·4,N),
                wpos (K,N), wrot (K,N), span/cmin/cmax/amin/amax (V,N))
      draw(i) → (noise (gens,V,C,N), rates (gens,C,N),
                 wipe_u (1,N), wipe_g (V,N))   per-step randomness

    ``sfit`` is the previous step's exact species fitness (∞ initially)
    used for the stagnation test (reference :620-637); ``sol*`` is the
    per-lane incumbent.
    """
    inner, F = make_fullstep_inner(model, tip_links, active_vars, inst_tip, sp)
    V = sp.V
    T = len(tip_links)

    if use_pltpu_roll:
        from jax.experimental.pallas import tpu as pltpu

        def _roll(x, shift):
            return pltpu.roll(x, shift % x.shape[-1], axis=1)
    else:
        def _roll(x, shift):
            return jnp.roll(x, shift, axis=-1)

    def body(state, consts, draw):
        genes0, grads0, sfit0, sol0, sol_fit0, sol_tips0 = state
        qfix, gpos, gquat, wpos, wrot, span, cmin, cmax, amin, amax = consts
        f32 = genes0.dtype
        N = genes0.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        even = (lane % 2) == 0  # species-0 lanes

        def partner(x):
            """The paired-species lane values (adjacent-lane exchange)."""
            return jnp.where(even, _roll(x, -1), _roll(x, 1))

        def step(i, carry):
            genes, grads, sfit, sol, sol_fit, sol_tips = carry
            noise, rates, wipe_u, wipe_g = draw(i)

            genes, grads, tips, fit = inner(
                genes, grads, qfix, gpos, gquat, wpos, wrot,
                span, cmin, cmax, noise, rates,
            )

            # per-lane incumbent update (reference :640-644, per-lane
            # here; per-island = engine reduction over lanes)
            better = fit < sol_fit
            sol = jnp.where(better, genes[:V], sol)
            sol_tips = jnp.where(better, tips, sol_tips)
            sol_fit = jnp.where(better, fit, sol_fit)

            improved = (fit != sfit).astype(f32)

            # species compare-swap between adjacent lanes (reference
            # :617: sort 2 species by fitness — strict less-than)
            fp = partner(fit)
            # boolean combine, not where-on-bools (Mosaic can't select i1)
            swap = (even & (fp < fit)) | ((~even) & (fit < fp))
            genes = jnp.where(swap, partner(genes), genes)
            grads = jnp.where(swap, partner(grads), grads)
            improved = jnp.where(swap, partner(improved), improved)
            fit = jnp.where(swap, fp, fit)

            # wipeout of the stagnant/unlucky non-best species
            # (reference :620-637): odd lanes only; both parents get the
            # same uniform-random genes, momentum cleared
            wipe = (~even) & ((wipe_u < _WIPEOUT_P) | (improved < 0.5))
            rand = amin + wipe_g * (amax - amin)
            genes = jnp.where(wipe, jnp.concatenate([rand, rand], axis=0),
                              genes)
            grads = jnp.where(wipe, jnp.zeros_like(grads), grads)

            return genes, grads, fit, sol, sol_fit, sol_tips

        return jax.lax.fori_loop(
            0, n_steps, step,
            (genes0, grads0, sfit0, sol0, sol_fit0, sol_tips0),
        )

    return body, F


def make_megastep_kernel(model, tip_links, active_vars, inst_tip,
                         sp: SpeciesParams, n_steps: int,
                         block_n: int = 256, interpret: bool = False,
                         inkernel_rng: bool = True,
                         gauss_mode: str = "clt4"):
    """Pallas wrapper of :func:`make_megastep_body` blocked over lanes.

    With ``inkernel_rng`` (compiled TPU runs) all per-step randomness —
    mutation noise, rate ladder, wipeout coin flips and restart genes —
    comes from the on-chip PRNG; the caller passes a ``(1, 1)`` int32
    seed.  Without it (interpret/CPU testing) the caller provides
    ``noise (steps·gens, V, C, N)``, ``rates (steps·gens, C, N)``,
    ``wipe_u (steps, 1, N)`` and ``wipe_g (steps, V, N)``.

    Signature of the returned function::

      run(seed?, genes, grads, sfit, sol, sol_fit, sol_tips,
          qfix, gpos, gquat, wpos, wrot, span, cmin, cmax, amin, amax,
          [noise, rates, wipe_u, wipe_g])
        → (genes', grads', sfit', sol', sol_fit', sol_tips')

    State buffers are input/output aliased (donated) — callers must
    thread fresh values between calls.
    """
    from jax.experimental.pallas import tpu as pltpu

    body, F = make_megastep_body(
        model, tip_links, active_vars, inst_tip, sp, n_steps,
        use_pltpu_roll=not interpret,
    )
    V, K, C = sp.V, sp.K, sp.C
    T = len(tip_links)
    W = block_n
    Fq = max(F, 1)
    nst = n_steps

    def consts_of(refs):
        return tuple(r[:] for r in refs)

    if inkernel_rng:
        def kernel(seed_ref, genes_ref, grads_ref, sfit_ref, sol_ref,
                   sol_fit_ref, sol_tips_ref, qfix_ref, gpos_ref, gquat_ref,
                   wpos_ref, wrot_ref, span_ref, cmin_ref, cmax_ref,
                   amin_ref, amax_ref,
                   genes_o, grads_o, sfit_o, sol_o, sol_fit_o, sol_tips_o):
            pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
            f32 = jnp.float32
            inv24 = jnp.asarray(1.0 / (1 << 24), f32)

            def u01(shape, lo=0.0):
                bits = pltpu.bitcast(pltpu.prng_random_bits(shape),
                                     jnp.uint32)
                i = pltpu.bitcast(bits >> 8, jnp.int32)
                return i.astype(f32) * inv24 + jnp.asarray(lo, f32)

            def draw(_i):
                shape = (sp.gens, V, C, W)
                if gauss_mode == "clt4":
                    # Irwin–Hall CLT: (Σ₄ u01 − 2)·√3 has unit variance
                    # and is transcendental-free — Box–Muller's
                    # log/sqrt/cos per sample dominated the VPU budget
                    # (gens·V·C samples per lane-step).  Tails truncate
                    # at ±2√3 σ ≈ ±3.46 σ, irrelevant for mutation noise
                    # (global exploration comes from wipeout restarts,
                    # reference: ik_evolution_2.cpp:620-637, not tails).
                    s = u01(shape) + u01(shape) + u01(shape) + u01(shape)
                    noise = (s - 2.0) * jnp.asarray(np.sqrt(3.0), f32)
                else:
                    # Box–Muller; u1 ∈ (2⁻²⁵, 1] avoids log(0)
                    u1 = u01(shape, lo=2.0 ** -25)
                    u2 = u01(shape)
                    rad = jnp.sqrt(-2.0 * jnp.log(u1))
                    noise = rad * jnp.cos(jnp.asarray(2.0 * np.pi, f32) * u2)
                # rate = 2^(k−23), k ∈ [0,16): exponent-bit construction
                kb = pltpu.bitcast(
                    pltpu.prng_random_bits((sp.gens, C, W)), jnp.uint32
                ) & jnp.uint32(15)
                rates = pltpu.bitcast(
                    ((kb + jnp.uint32(104)) << 23).astype(jnp.uint32), f32
                )
                return noise, rates, u01((1, W)), u01((V, W))

            state = (genes_ref[:], grads_ref[:], sfit_ref[:], sol_ref[:],
                     sol_fit_ref[:], sol_tips_ref[:])
            consts = consts_of((qfix_ref, gpos_ref, gquat_ref, wpos_ref,
                                wrot_ref, span_ref, cmin_ref, cmax_ref,
                                amin_ref, amax_ref))
            out = body(state, consts, draw)
            for ref, val in zip(
                (genes_o, grads_o, sfit_o, sol_o, sol_fit_o, sol_tips_o), out
            ):
                ref[:] = val
    else:
        def kernel(genes_ref, grads_ref, sfit_ref, sol_ref, sol_fit_ref,
                   sol_tips_ref, qfix_ref, gpos_ref, gquat_ref, wpos_ref,
                   wrot_ref, span_ref, cmin_ref, cmax_ref, amin_ref,
                   amax_ref, noise_ref, rates_ref, wu_ref, wg_ref,
                   genes_o, grads_o, sfit_o, sol_o, sol_fit_o, sol_tips_o):
            def draw(i):
                g0 = i * sp.gens
                noise = jax.lax.dynamic_slice_in_dim(
                    noise_ref[:], g0, sp.gens, axis=0)
                rates = jax.lax.dynamic_slice_in_dim(
                    rates_ref[:], g0, sp.gens, axis=0)
                wu = jax.lax.dynamic_slice_in_dim(wu_ref[:], i, 1, axis=0)[0]
                wg = jax.lax.dynamic_slice_in_dim(wg_ref[:], i, 1, axis=0)[0]
                return noise, rates, wu, wg

            state = (genes_ref[:], grads_ref[:], sfit_ref[:], sol_ref[:],
                     sol_fit_ref[:], sol_tips_ref[:])
            consts = consts_of((qfix_ref, gpos_ref, gquat_ref, wpos_ref,
                                wrot_ref, span_ref, cmin_ref, cmax_ref,
                                amin_ref, amax_ref))
            out = body(state, consts, draw)
            for ref, val in zip(
                (genes_o, grads_o, sfit_o, sol_o, sol_fit_o, sol_tips_o), out
            ):
                ref[:] = val

    def spec2(rows):
        return pl.BlockSpec((rows, W), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    state_rows = [_P * V, _P * V, 1, V, 1, T * 7]
    state_specs = [spec2(r) for r in state_rows]
    const_specs = [spec2(Fq), spec2(K * 3), spec2(K * 4), spec2(K), spec2(K),
                   spec2(V), spec2(V), spec2(V), spec2(V), spec2(V)]
    if inkernel_rng:
        in_specs = [
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        ] + state_specs + const_specs
        # alias the 6 state inputs (after the seed) onto the 6 outputs
        aliases = {1 + j: j for j in range(6)}
    else:
        in_specs = state_specs + const_specs + [
            pl.BlockSpec((nst * sp.gens, V, C, W), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nst * sp.gens, C, W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nst, 1, W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nst, V, W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        aliases = {j: j for j in range(6)}
    out_specs = tuple(spec2(r) for r in state_rows)

    evals = sp.gens * (C + _P) + (sp.mem_iters * 4 if sp.memetic else 0)
    flops_per_lane = nst * (evals * (K * 7 * V * 2 + K * 30) + 900)
    nlinks = len(model.link_schedule(
        [model.link_index[t] for t in tip_links]))

    @jax.jit
    def run(*args):
        genes = args[1] if inkernel_rng else args[0]
        N = genes.shape[-1]
        if N % W:
            raise ValueError(f"lane batch {N} not a multiple of {W}")
        dt = genes.dtype
        return pl.pallas_call(
            kernel,
            grid=(N // W,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=tuple(
                jax.ShapeDtypeStruct((r, N), dt) for r in state_rows
            ),
            input_output_aliases=aliases,
            cost_estimate=pl.CostEstimate(
                flops=flops_per_lane * N,
                bytes_accessed=4 * N * (2 * sum(state_rows) + 5 * V
                                        + 7 * K + Fq),
                transcendentals=nst * (2 * nlinks
                                       + (3 * sp.gens * V * C
                                          if inkernel_rng
                                          and gauss_mode != "clt4"
                                          else 0)) * N,
            ),
            interpret=interpret,
        )(*args)

    return run, F
