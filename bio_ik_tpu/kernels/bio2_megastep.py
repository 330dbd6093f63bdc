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
from .bio2_fullstep import (
    AUX_KINDS,
    array_draw_gen,
    gauss_from_u01,
    make_fullstep_inner,
    make_rate_draw,
    make_rng_helpers,
)

__all__ = ["make_megastep_body", "make_megastep_kernel"]

_WIPEOUT_P = 0.1  # reference: ik_evolution_2.cpp:632


def make_megastep_body(model, tip_links, active_vars, inst_tip,
                       sp: SpeciesParams, n_steps: int, *, use_pltpu_roll,
                       sec_terms=(), inst_kind=None, unroll=False):
    """Build the chunk body over ``(rows, N)`` arrays.

    Returns ``(body, F)``; ``body(state, consts, draw)`` advances the
    solver state by ``n_steps`` fused steps where

      state  = (genes (2V,N), grads (2V,N), sfit (1,N),
                sol (V,N), sol_fit (1,N), sol_tips (T·7,N))
      consts = (qfix (max(F,1),N), gpos (K·3,N), gquat (K·4,N),
                [gaux (K·3,N) when an AUX_KINDS instance exists,]
                wpos (K,N), wrot (K,N), span/cmin/cmax/amin/amax (V,N)
                [, sec (8·V,N) when sec_terms])
      draw(i) → (draw_gen, wipe_u (1,N), wipe_g (V,N))   per-step
                randomness; draw_gen(g) → (noise (V,C,N), rates (C,N)
                [, keep_u (1,N)]) supplies one generation at a time
                (in-kernel RNG keeps only a (V,C,W) noise tile live in
                VMEM)

    ``sfit`` is the previous step's exact species fitness (∞ initially)
    used for the stagnation test (reference :620-637); ``sol*`` is the
    per-lane incumbent.  ``sec_terms`` enables in-kernel joint-space
    secondary goals (see :func:`bio2_fullstep.make_fullstep_inner`).
    """
    inner, F = make_fullstep_inner(model, tip_links, active_vars, inst_tip,
                                   sp, sec_terms=sec_terms,
                                   inst_kind=inst_kind)
    secondary = bool(sec_terms)
    has_aux = bool(inst_kind) and any(k in AUX_KINDS for k in inst_kind)
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
        # consts: qfix, gpos, gquat, [gaux], wpos, wrot, span, cmin,
        # cmax, amin, amax, [sec] — optional entries per static flags
        consts = list(consts)
        qfix, gpos, gquat = consts[:3]
        i = 3
        head = [qfix, gpos, gquat]
        if has_aux:
            head.append(consts[i])
            i += 1
        wpos, wrot, span, cmin, cmax, amin, amax = consts[i : i + 7]
        i += 7
        sec_args = tuple(consts[i:])  # (sec,) when secondary else ()
        head += [wpos, wrot, span, cmin, cmax]
        f32 = genes0.dtype
        N = genes0.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        even = (lane % 2) == 0  # species-0 lanes

        def partner(x):
            """The paired-species lane values (adjacent-lane exchange)."""
            return jnp.where(even, _roll(x, -1), _roll(x, 1))

        def step(i, carry):
            genes, grads, sfit, sol, sol_fit, sol_tips = carry
            draw_gen, wipe_u, wipe_g = draw(i)

            genes, grads, tips, fit = inner(
                genes, grads, *head, *sec_args, draw_gen,
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

        carry0 = (genes0, grads0, sfit0, sol0, sol_fit0, sol_tips0)
        if unroll:
            # static step indices — needed when ``draw`` slices noise
            # tensors (Mosaic has no dynamic_slice lowering)
            carry = carry0
            for si in range(n_steps):
                carry = step(si, carry)
            return carry
        return jax.lax.fori_loop(0, n_steps, step, carry0)

    return body, F


def make_megastep_kernel(model, tip_links, active_vars, inst_tip,
                         sp: SpeciesParams, n_steps: int,
                         block_n: int = 256, interpret: bool = False,
                         inkernel_rng: bool = True,
                         gauss_mode: str = "clt4", sec_terms=(),
                         inst_kind=None):
    """Pallas wrapper of :func:`make_megastep_body` blocked over lanes.

    With ``inkernel_rng`` (compiled TPU runs) all per-step randomness —
    mutation noise, rate ladder, wipeout coin flips and restart genes —
    comes from the on-chip PRNG, drawn one GENERATION at a time (only a
    (V, C, W) noise tile is ever live in VMEM); the caller passes a
    ``(1, 1)`` int32 seed plus a ``(1, N)`` int32 per-lane ``salt`` row
    XORed into every draw (the per-scenario PRNG key injection — see
    :func:`bio2_fullstep.make_rng_helpers`).  Without it (interpret/CPU
    testing) the caller provides ``noise (steps·gens, V, C, N)``,
    ``rates (steps·gens, C, N)``, ``wipe_u (steps, 1, N)`` and
    ``wipe_g (steps, V, N)``.

    Signature of the returned function::

      run(seed?, salt?, genes, grads, sfit, sol, sol_fit, sol_tips,
          qfix, gpos, gquat, wpos, wrot, span, cmin, cmax, amin, amax,
          [noise, rates, wipe_u, wipe_g])
        → (genes', grads', sfit', sol', sol_fit', sol_tips')

    State buffers are input/output aliased (donated) — callers must
    thread fresh values between calls.
    """
    from jax.experimental.pallas import tpu as pltpu

    body, F = make_megastep_body(
        model, tip_links, active_vars, inst_tip, sp, n_steps,
        use_pltpu_roll=not interpret, sec_terms=sec_terms,
        inst_kind=inst_kind,
        # noise-tensor mode slices the noise stack per step — Mosaic has
        # no dynamic_slice lowering, so the step loop unrolls with
        # static indices there
        unroll=not inkernel_rng,
    )
    secondary = bool(sec_terms)
    has_aux = bool(inst_kind) and any(k in AUX_KINDS for k in inst_kind)
    V, K, C = sp.V, sp.K, sp.C
    T = len(tip_links)
    W = block_n
    Fq = max(F, 1)
    nst = n_steps
    # + lookat axis rows + packed sec rows
    NCONST = 10 + (1 if has_aux else 0) + (1 if secondary else 0)
    NRNG = 4 + (1 if secondary else 0)      # + keep uniforms (host noise)

    if inkernel_rng:
        def kernel(*refs):
            seed_ref, salt_ref = refs[0], refs[1]
            state_refs = refs[2:8]
            const_refs = refs[8:8 + NCONST]
            out_refs = refs[8 + NCONST:]
            pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))
            rbits, u01 = make_rng_helpers(salt_ref[:])
            draw_rates = make_rate_draw(rbits, sp, W)

            def draw(_i):
                def draw_gen(_g):
                    noise = gauss_from_u01(u01, (V, C, W), gauss_mode)
                    if secondary:
                        return noise, draw_rates(), u01((1, W))
                    return noise, draw_rates()

                return draw_gen, u01((1, W)), u01((V, W))

            out = body(tuple(r[:] for r in state_refs),
                       tuple(r[:] for r in const_refs), draw)
            for ref, val in zip(out_refs, out):
                ref[:] = val
    else:
        def kernel(*refs):
            state_refs = refs[0:6]
            const_refs = refs[6:6 + NCONST]
            rng_refs = refs[6 + NCONST:6 + NCONST + NRNG]
            out_refs = refs[6 + NCONST + NRNG:]
            noise_ref, rates_ref, wu_ref, wg_ref = rng_refs[:4]

            def draw(i):
                # i is a python int (unrolled body) — static slices only
                g0 = i * sp.gens
                noise = noise_ref[:][g0:g0 + sp.gens]
                rates = rates_ref[:][g0:g0 + sp.gens]
                keep = None
                if secondary:
                    keep = rng_refs[4][:][g0:g0 + sp.gens]
                wu = wu_ref[:][i]
                wg = wg_ref[:][i]
                return array_draw_gen(noise, rates, keep), wu, wg

            out = body(tuple(r[:] for r in state_refs),
                       tuple(r[:] for r in const_refs), draw)
            for ref, val in zip(out_refs, out):
                ref[:] = val

    def spec2(rows):
        return pl.BlockSpec((rows, W), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    state_rows = [_P * V, _P * V, 1, V, 1, T * 7]
    state_specs = [spec2(r) for r in state_rows]
    const_specs = [spec2(Fq), spec2(K * 3), spec2(K * 4)]
    if has_aux:
        const_specs.append(spec2(K * 3))     # aux rows (axis/normal/dir)
    const_specs += [spec2(K), spec2(K),
                    spec2(V), spec2(V), spec2(V), spec2(V), spec2(V)]
    if secondary:
        const_specs.append(spec2(8 * V))     # packed sec rows (SEC_ROWS)
    if inkernel_rng:
        in_specs = [
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            spec2(1),  # per-lane salt
        ] + state_specs + const_specs
        # alias the 6 state inputs (after seed + salt) onto the 6 outputs
        aliases = {2 + j: j for j in range(6)}
    else:
        rng_specs = [
            pl.BlockSpec((nst * sp.gens, V, C, W), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nst * sp.gens, C, W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nst, 1, W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nst, V, W), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        if secondary:
            rng_specs.append(
                pl.BlockSpec((nst * sp.gens, 1, W), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM))
        in_specs = state_specs + const_specs + rng_specs
        aliases = {j: j for j in range(6)}
    out_specs = tuple(spec2(r) for r in state_rows)

    evals = sp.gens * (C + _P) + (sp.mem_iters * 4 if sp.memetic else 0)
    flops_per_lane = nst * (evals * (K * 7 * V * 2 + K * 30) + 900)
    nlinks = len(model.link_schedule(
        [model.link_index[t] for t in tip_links]))

    @jax.jit
    def run(*args):
        genes = args[2] if inkernel_rng else args[0]
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
