"""Kernel self-checks: megastep Pallas kernel vs the plain-jnp body.

Shared by the CPU test suite (``interpret=True`` — Pallas interpreter)
and the on-chip verify flow (``interpret=False`` — compiled Mosaic on a
real TPU), closing the gap between "interpret matches jnp" and
"hardware matches jnp".  Uses the noise-TENSOR kernel mode so both
sides consume identical randomness and the comparison is bitwise-exact
(both paths are deterministic f32 programs; Mosaic compiles the same
fused arithmetic).

The reference's analog is its ``test`` solver mode — a trusted oracle
vs the production kernel (reference: src/ik_test.cpp:40-137).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["megastep_bitwise_check"]


def megastep_bitwise_check(model, tip: str, interpret: bool,
                           block_n: int = 128, n_steps: int = 2,
                           lanes: int = 256, seed: int = 7):
    """Run one megastep chunk through the Pallas kernel (interpret or
    compiled) and the plain-jnp body on identical inputs; return the
    maximum absolute difference over all state outputs (0.0 = bitwise).
    """
    from .bio2_fullstep import array_draw_gen
    from .bio2_megastep import make_megastep_body, make_megastep_kernel
    from .bio2_step import SpeciesParams

    V = model.nvars
    sp = SpeciesParams(V=V, K=1, C=4, gens=2, mem_iters=2, memetic="q")
    nst = n_steps
    body, F = make_megastep_body(
        model, [tip], list(range(V)), [0], sp, nst, use_pltpu_roll=False)
    kfn, F2 = make_megastep_kernel(
        model, [tip], list(range(V)), [0], sp, nst,
        block_n=block_n, interpret=interpret, inkernel_rng=False)
    assert F == F2 == 0
    N = lanes
    rng = np.random.default_rng(seed)

    def r(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    b = model._np_bounds
    qmid = ((b["min"] + b["max"]) / 2).astype(np.float32)
    genes = jnp.asarray(np.tile(qmid, 2)[:, None] + rng.normal(
        size=(2 * V, N)).astype(np.float32) * 0.1)
    state = (
        genes, r(2 * V, N, scale=0.01),
        jnp.full((1, N), np.inf, jnp.float32),        # sfit
        genes[:V],                                    # sol
        jnp.full((1, N), 1e30, jnp.float32),          # sol_fit
        jnp.zeros((7, N), jnp.float32),               # sol_tips
    )
    cmin = jnp.asarray(np.tile(b["clip_min"].astype(np.float32)[:, None],
                               (1, N)))
    cmax = jnp.asarray(np.tile(b["clip_max"].astype(np.float32)[:, None],
                               (1, N)))
    consts = (
        jnp.zeros((1, N), jnp.float32),               # qfix (dummy)
        r(3, N), r(4, N), jnp.abs(r(1, N)), jnp.abs(r(1, N)),
        jnp.abs(r(V, N)) + 1.0, cmin, cmax, cmin, cmax,
    )
    noise = r(nst * sp.gens, V, sp.C, N)
    rates = jnp.abs(r(nst * sp.gens, sp.C, N, scale=1e-4))
    wu = jnp.asarray(rng.uniform(size=(nst, 1, N)).astype(np.float32))
    wg = jnp.asarray(rng.uniform(size=(nst, V, N)).astype(np.float32))

    def draw(i):
        g0 = i * sp.gens
        return (
            array_draw_gen(
                jax.lax.dynamic_slice_in_dim(noise, g0, sp.gens, 0),
                jax.lax.dynamic_slice_in_dim(rates, g0, sp.gens, 0),
            ),
            jax.lax.dynamic_slice_in_dim(wu, i, 1, 0)[0],
            jax.lax.dynamic_slice_in_dim(wg, i, 1, 0)[0],
        )

    out1 = jax.jit(lambda st, co: body(st, co, draw))(state, consts)
    out2 = kfn(*state, *consts, noise, rates, wu, wg)
    # Per-LANE bitwise comparison.  In interpret mode every lane must
    # match exactly (same op-by-op arithmetic).  Compiled Mosaic vs
    # XLA:TPU are two different compilers of the same f32 program: a
    # handful of transcendental results (FK sin/cos) land on ULP
    # rounding boundaries, and a 1-ULP fitness difference can flip a
    # discrete selection, after which that lane's whole state diverges
    # (chaotic but valid evolution).  Measured: ~91 % of lanes bitwise
    # identical across the full 2-step chunk incl. memetic + wipeout.
    lanes = np.zeros(np.asarray(out1[0]).shape[-1], bool)
    for a, b2 in zip(out1, out2):
        a, b2 = np.asarray(a), np.asarray(b2)
        lanes |= (a.view(np.uint32) != b2.view(np.uint32)).any(axis=0)
    return int(lanes.sum()), int(lanes.shape[0])
