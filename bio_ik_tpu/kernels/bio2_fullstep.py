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

from .bio2_step import SEC_ROWS, SpeciesParams, _P, make_sec_eval
from .fk_rows import FkRows, _qrot as _qrot_comp

__all__ = ["make_fullstep_inner", "make_fullstep_kernel",
           "make_rng_helpers", "gauss_from_u01", "array_draw_gen",
           "AUX_KINDS", "SEC_ROWS", "make_sec_eval"]

# goal kinds whose kernel rows need the extra gaux (K·3) const: the
# link-local axis (lookat/direction/side/cone) or the line direction /
# plane normal; every kind here also requires the fullstep tier
AUX_KINDS = ("lookat", "line", "plane", "direction", "side", "cone")

GAUSS_MODES = ("clt4", "box_muller")


def make_rng_helpers(salt=None):
    """In-kernel PRNG primitives over ``pltpu.prng_random_bits`` (call
    AFTER ``pltpu.prng_seed``).  ``salt`` is an optional ``(1, W)`` int32
    row XORed into every raw draw — the per-scenario key injection: lanes
    with different salts see decorrelated streams, so re-solving a
    scenario with a fresh key changes its draws while identical keys
    reproduce bitwise (the per-island RNG independence of the reference,
    ik_base.h:49-126, keyed per scenario).

    Returns ``(rbits(shape) → uint32, u01(shape, lo) → f32 in [lo, lo+1))``.
    """
    from jax.experimental.pallas import tpu as pltpu

    inv24 = jnp.asarray(1.0 / (1 << 24), jnp.float32)
    salt_u32 = None if salt is None else pltpu.bitcast(salt, jnp.uint32)

    def rbits(shape):
        b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        if salt_u32 is not None:
            b = b ^ salt_u32
        return b

    def u01(shape, lo=0.0):
        i = pltpu.bitcast(rbits(shape) >> 8, jnp.int32)
        return i.astype(jnp.float32) * inv24 + jnp.asarray(lo, jnp.float32)

    return rbits, u01


def gauss_from_u01(u01, shape, gauss_mode="clt4"):
    """Unit gaussians from a ``u01`` sampler (in-kernel or jnp).

    ``clt4`` (default): Irwin–Hall CLT — ``(Σ₄ u01 − 2)·√3`` has unit
    variance and is transcendental-free; Box–Muller's log/sqrt/cos per
    sample dominated the VPU budget.  Tails truncate at ±2√3 σ ≈ ±3.46 σ,
    irrelevant for mutation noise (global exploration comes from wipeout
    restarts, reference: ik_evolution_2.cpp:620-637, not tails).
    ``box_muller``: exact normals (u1 ∈ (2⁻²⁵, 1] avoids log(0)).
    """
    f32 = jnp.float32
    if gauss_mode == "clt4":
        s = u01(shape) + u01(shape) + u01(shape) + u01(shape)
        return (s - 2.0) * jnp.asarray(np.sqrt(3.0), f32)
    u1 = u01(shape, lo=2.0 ** -25)
    u2 = u01(shape)
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    return rad * jnp.cos(jnp.asarray(2.0 * np.pi, f32) * u2)


def array_draw_gen(noise, rates, keep=None):
    """Adapt host-provided ``noise (gens,V,C,N)`` / ``rates (gens,C,N)``
    (+ optional pre-selection ``keep (gens,1,N)`` uniforms, secondary
    mode) arrays to the per-generation ``draw_gen`` interface of
    :func:`make_fullstep_inner`."""
    def draw_gen(g):
        if keep is None:
            return noise[g], rates[g]
        return noise[g], rates[g], keep[g]

    return draw_gen


# secondary-fitness row layout inside the packed ``sec (8·V, N)`` const:
# per-variable coefficient/center rows of the joint-space quadratic
#   sec(x) = Σ_v α(x−mid)² + β(x−seed)² + γ·relu(2|x−mid|−hspan)²
#            + δ(x−tbar)²
# covering center_joints (α), regularization/minimal_displacement (β),
# avoid_joint_limits (γ) and joint_variable (δ) secondary goals
# (reference: computeSecondaryFitnessActiveVariables, ik_base.h:163-185
# over goal_types.h:410-533).  Constant offsets (inactive-variable goals,
# the δ completion term) are dropped — every kernel use of the secondary
# fitness (pre-selection ranking, memetic line-search differences,
# gradients) is invariant to them.
def _atan2_nonneg(y, x):
    """atan2 for y ≥ 0 (range [0, π]) via a Hastings odd polynomial —
    Mosaic has no atan2/acos lowering; max error ~1e-5 rad, irrelevant
    for the cone hinge it feeds (the acceptance test re-evaluates the
    exact XLA form at chunk boundaries)."""
    ax = jnp.abs(x)
    mn = jnp.minimum(y, ax)
    mx = jnp.maximum(y, ax)
    t = mn / (mx + 1e-30)
    t2 = t * t
    p = t * (0.9998660 + t2 * (-0.3302995 + t2 * (0.1801410 + t2 * (
        -0.0851330 + t2 * 0.0208351))))
    r = jnp.where(y > ax, jnp.float32(np.pi / 2) - p, p)
    return jnp.where(x < 0, jnp.float32(np.pi) - r, r)


def _comp(tipcomp, d):
    pos, quat = tipcomp
    return pos[d] if d < 3 else quat[d - 3]


def _is_zero(c):
    return isinstance(c, float) and c == 0.0


def make_fullstep_inner(model, tip_links: Sequence[str],
                        active_vars: Sequence[int],
                        inst_tip: Sequence[int], sp: SpeciesParams,
                        sec_terms: Sequence[str] = (),
                        inst_kind: Sequence[str] = None):
    """Build the fused step on (rows, N) arrays.

    ``inst_tip[k]`` maps goal instance k → tip index (into ``tip_links``);
    ``inst_kind[k]`` its goal kind — "pose" family (position/orientation/
    pose, folded through the weight rows) or "lookat" (reference:
    goal_types.h:183-211 — ‖normalize(target−p) − normalize(R·axis)‖²,
    target in the ``gpos`` rows, axis in the extra ``gaux`` rows, weight
    in ``wpos``).  Signature of the returned ``inner``:

      inner(genes (P·V,N), grads (P·V,N), qfix (F,N) or None,
            gpos (K·3,N), gquat (K·4,N), [gaux (K·3,N),]
            wpos (K,N), wrot (K,N),
            span/cmin/cmax (V,N), [sec (8·V,N),] draw_gen)
        → genes' (P·V,N), grads' (P·V,N), tips_exact (T·7,N), fit (1,N)

    ``draw_gen(g) → (noise (V,C,N), rates (C,N)[, keep_u (1,N)])``
    supplies ONE generation's randomness at a time — in-kernel RNG
    callers generate it on demand so only one generation's noise tile is
    ever live in VMEM (the on-chip analog of streaming the reference's
    8M-entry noise ring buffer, ik_base.h:49-126, instead of
    materializing gens×V×C×N).

    With a non-empty ``sec_terms`` the step evaluates joint-space
    secondary goals in-kernel (packed ``sec`` const, see
    :data:`SEC_ROWS`): each generation ranks children by secondary
    fitness and keeps a random-count prefix for the primary selection
    (the reference's pre-selection pass, ik_evolution_2.cpp:366-378),
    and the memetic phase searches the combined fitness while accepting
    on primary (reference :459-537: fa/f1/f3 combined, f4p vs f2p
    primary).
    """
    fkr = FkRows(model, tip_links, active_vars)
    V, K, C = sp.V, sp.K, sp.C
    T = len(tip_links)
    C2 = C + _P
    F = len(fkr.fixed_vars)
    secondary = bool(sec_terms)
    if inst_kind is None:
        inst_kind = ["pose"] * K
    inst_kind = list(inst_kind)
    has_aux = any(k in AUX_KINDS for k in inst_kind)

    def row(a, i):
        return a[i : i + 1, :]

    def inner(genes, grads, qfix, gpos, gquat, *rest):
        rest = list(rest)
        gaux = rest.pop(0) if has_aux else None
        wpos, wrot, span, cmin, cmax = rest[:5]
        rest = rest[5:]
        if secondary:
            sec, draw_gen = rest
            sec_of, sec_grad = make_sec_eval(sec, V, tuple(sec_terms))
        else:
            (draw_gen,) = rest
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

        def eval_goals(ph, want_grad=False):
            """Per-instance goal errors (sum → fit); with ``want_grad``
            also the per-phenotype-component gradient rows ``gvec`` with
            d(fit)/d(ph[k·7+d]) = gvec[k·7+d] (floats 0.0 where the kind
            has no dependence — skipped at trace time)."""
            fit = None
            gvec = [0.0] * (K * 7) if want_grad else None
            for k in range(K):
                if inst_kind[k] == "lookat":
                    # ‖normalize(target−p) − normalize(R(q)·axis)‖²
                    # (reference: goal_types.h:183-211); R·axis via the
                    # two-cross form, then renormalized — same math as
                    # the XLA evaluator (problem.py _eval_lookat)
                    q = tuple(ph[k * 7 + 3 + d] for d in range(4))
                    ax = tuple(row(gaux, k * 3 + d) for d in range(3))
                    u = _qrot_comp(q, ax)
                    uinv = jax.lax.rsqrt(
                        u[0] * u[0] + u[1] * u[1] + u[2] * u[2] + 1e-12)
                    v = tuple(c * uinv for c in u)
                    dx = tuple(row(gpos, k * 3 + d) - ph[k * 7 + d]
                               for d in range(3))
                    dinv = jax.lax.rsqrt(
                        dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
                        + 1e-12)
                    n = tuple(c * dinv for c in dx)
                    err = 0.0
                    for d in range(3):
                        e = n[d] - v[d]
                        err = err + e * e
                    term = row(wpos, k) * err
                    if want_grad:
                        # ∂/∂p through n = (target−p)/|target−p|:
                        # gvec_d = w·(−2/|dx|)·((n−v)_d − n_d·(n·(n−v)));
                        # quaternion columns omitted — the memetic line
                        # search's accept test guards monotonicity, and
                        # the reference's own dp=1e-7 FD gradient is
                        # noise-dominated there (ik_evolution_2.cpp:459)
                        s = 0.0
                        for d in range(3):
                            s = s + n[d] * (n[d] - v[d])
                        for d in range(3):
                            gvec[k * 7 + d] = (
                                row(wpos, k) * (-2.0 * dinv)
                                * ((n[d] - v[d]) - n[d] * s)
                            )
                elif inst_kind[k] == "line":
                    # ‖(p−o) − d·((p−o)·d)‖² (problem.py _eval_line);
                    # o in gpos, unit d in gaux
                    dx = tuple(ph[k * 7 + d] - row(gpos, k * 3 + d)
                               for d in range(3))
                    ax = tuple(row(gaux, k * 3 + d) for d in range(3))
                    along = dx[0] * ax[0] + dx[1] * ax[1] + dx[2] * ax[2]
                    perp = tuple(dx[d] - ax[d] * along for d in range(3))
                    err = perp[0] * perp[0] + perp[1] * perp[1] \
                        + perp[2] * perp[2]
                    term = row(wpos, k) * err
                    if want_grad:
                        for d in range(3):
                            gvec[k * 7 + d] = 2.0 * row(wpos, k) * perp[d]
                elif inst_kind[k] == "plane":
                    # ((p−o)·n)² (problem.py _eval_plane); o in gpos,
                    # unit n in gaux
                    ax = tuple(row(gaux, k * 3 + d) for d in range(3))
                    sd = 0.0
                    for d in range(3):
                        sd = sd + (ph[k * 7 + d] - row(gpos, k * 3 + d)) \
                            * ax[d]
                    term = row(wpos, k) * (sd * sd)
                    if want_grad:
                        for d in range(3):
                            gvec[k * 7 + d] = 2.0 * row(wpos, k) * sd * ax[d]
                elif inst_kind[k] in ("max_distance", "min_distance"):
                    # relu(±(|p−t| − dist))² (problem.py _eval_maxd/mind);
                    # t in gpos, dist scalar reuses the wrot row
                    dx = tuple(ph[k * 7 + d] - row(gpos, k * 3 + d)
                               for d in range(3))
                    nrm2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
                    rinv = jax.lax.rsqrt(nrm2 + 1e-12)
                    nrm = nrm2 * rinv
                    sgn = 1.0 if inst_kind[k] == "max_distance" else -1.0
                    dd = jnp.maximum(sgn * (nrm - row(wrot, k)), 0.0)
                    term = row(wpos, k) * (dd * dd)
                    if want_grad:
                        c = 2.0 * sgn * row(wpos, k) * dd * rinv
                        for d in range(3):
                            gvec[k * 7 + d] = c * dx[d]
                elif inst_kind[k] == "cone":
                    # max(0, angle(R·axis, dir) − angle)² + pw·‖pos−p‖²
                    # (problem.py _eval_cone, goal_types.h:646-712) —
                    # axis in gaux; the free gquat rows carry [dir(3),
                    # angle]; pw rides the wrot row; cone apex in gpos;
                    # angular gradient omitted (accept-guard policy)
                    q = tuple(ph[k * 7 + 3 + d] for d in range(4))
                    ax = tuple(row(gaux, k * 3 + d) for d in range(3))
                    v = _qrot_comp(q, ax)
                    dr = tuple(row(gquat, k * 4 + d) for d in range(3))
                    cx = v[1] * dr[2] - v[2] * dr[1]
                    cy = v[2] * dr[0] - v[0] * dr[2]
                    cz = v[0] * dr[1] - v[1] * dr[0]
                    cn = jnp.sqrt(cx * cx + cy * cy + cz * cz + 1e-18)
                    dot = v[0] * dr[0] + v[1] * dr[1] + v[2] * dr[2]
                    ang = _atan2_nonneg(cn, dot)
                    dd = jnp.maximum(ang - row(gquat, k * 4 + 3), 0.0)
                    pe = 0.0
                    for d in range(3):
                        e = row(gpos, k * 3 + d) - ph[k * 7 + d]
                        pe = pe + e * e
                    term = row(wpos, k) * (dd * dd + row(wrot, k) * pe)
                    if want_grad:
                        c = 2.0 * row(wpos, k) * row(wrot, k)
                        for d in range(3):
                            gvec[k * 7 + d] = c * (
                                ph[k * 7 + d] - row(gpos, k * 3 + d))
                elif inst_kind[k] in ("direction", "side"):
                    # direction: ‖R(q)·axis − dir‖²; side: relu(R·axis ·
                    # dir)² (problem.py _eval_direction/_eval_side) —
                    # axis in gaux, dir in gpos; raw (unnormalized)
                    # rotation exactly as the XLA evaluator applies to
                    # linearizer phenotypes; quaternion gradient omitted
                    # (same policy as lookat)
                    q = tuple(ph[k * 7 + 3 + d] for d in range(4))
                    ax = tuple(row(gaux, k * 3 + d) for d in range(3))
                    v = _qrot_comp(q, ax)
                    if inst_kind[k] == "direction":
                        err = 0.0
                        for d in range(3):
                            e = v[d] - row(gpos, k * 3 + d)
                            err = err + e * e
                    else:
                        f = 0.0
                        for d in range(3):
                            f = f + v[d] * row(gpos, k * 3 + d)
                        fr = jnp.maximum(f, 0.0)
                        err = fr * fr
                    term = row(wpos, k) * err
                else:
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
                    if want_grad:
                        sgn = jnp.where(dm <= dp, 1.0, -1.0).astype(f32)
                        for d in range(3):
                            gvec[k * 7 + d] = 2.0 * row(wpos, k) * (
                                ph[k * 7 + d] - row(gpos, k * 3 + d))
                        for d in range(4):
                            gvec[k * 7 + 3 + d] = 2.0 * row(wrot, k) * (
                                ph[k * 7 + 3 + d]
                                - sgn * row(gquat, k * 4 + d))
                fit = term if fit is None else fit + term
            return fit, gvec

        child_global = jax.lax.broadcasted_iota(jnp.int32, (C, N), 0) + _P
        fmix = jnp.where(child_global % 2 == 0, 0.2, 0.0).astype(f32)
        gfac = (child_global % 3).astype(f32)
        sub_idx = jax.lax.broadcasted_iota(jnp.int32, (C2, N), 0)

        # ---- generations (reference :349-431) ---------------------------
        for g in range(sp.gens):
            if secondary:
                noise_g, rate, keep_u = draw_gen(g)
            else:
                noise_g, rate = draw_gen(g)
            pgrad = [p0r[v] * (1.0 - fmix) + p1r[v] * fmix for v in range(V)]
            cg, cr = [], []
            for v in range(V):
                gv = p0g[v] + noise_g[v] * (rate * spn[v]) + pgrad[v] * gfac
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
            fit, _ = eval_goals(phen_of(dq))

            if secondary:
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
                kcount = (keep_u * (C - 1)).astype(jnp.int32) + 1  # ∈[1,C-1]
                child_keep = rank < kcount
                # parents always survive; mask dropped children to +inf
                # (f32 concat — Mosaic cannot concatenate i1 vectors)
                fit = jnp.concatenate(
                    [fit[:_P],
                     jnp.where(child_keep, fit[_P:],
                               jnp.asarray(jnp.inf, f32))], axis=0)

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
                f2p, gvec = eval_goals(ph, want_grad=True)
                # line search runs on the COMBINED fitness when secondary
                # goals exist; acceptance stays primary-vs-primary
                # (reference :459-537: fa = f2p + secondary, f4p < f2p)
                f2 = f2p + sec_of(x) if secondary else f2p

                # chain rule through the linearization: grad_v =
                # Σ_{k,d} (∂tip_kd/∂x_v)·(∂fit/∂tip_kd) — the gvec rows
                # come from eval_goals, the delta components from dts
                grad = []
                for v in range(V):
                    gv = 0.0
                    for k in range(K):
                        t = inst_tip[k]
                        dv = dts[v][t]
                        if dv is None:
                            continue
                        for d in range(7):
                            c = _comp(dv, d)
                            if _is_zero(c):
                                continue
                            gk = gvec[k * 7 + d]
                            if _is_zero(gk):
                                continue
                            gv = gv + c * gk
                    if secondary:
                        gv = gv + sec_grad(x, v)
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

                xm = [x[v] - gdir[v] for v in range(V)]
                xp = [x[v] + gdir[v] for v in range(V)]
                f1, _ = eval_goals(phen_of([xm[v] - x0[v] for v in range(V)]))
                f3, _ = eval_goals(phen_of([xp[v] - x0[v] for v in range(V)]))
                if secondary:
                    f1 = f1 + sec_of(xm)
                    f3 = f3 + sec_of(xp)

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

                f4, _ = eval_goals(phen_of([cand[v] - x0[v] for v in range(V)]))
                accept = (f4 < f2p) & ~done
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
        fit_exact, _ = eval_goals(ph_exact)

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


def make_rate_draw(rbits, sp, W):
    """Mutation-rate ladder draw: rate = 2^(k−23), k ∈ [0,16), built from
    exponent bits (reference: mutation_rate, ik_evolution_2.cpp:265)."""
    from jax.experimental.pallas import tpu as pltpu

    def draw_rates():
        kb = rbits((sp.C, W)) & jnp.uint32(15)
        return pltpu.bitcast(
            ((kb + jnp.uint32(104)) << 23).astype(jnp.uint32), jnp.float32
        )

    return draw_rates


def make_fullstep_kernel(model, tip_links, active_vars, inst_tip,
                         sp: SpeciesParams, block_n: int = 256,
                         interpret: bool = False, inkernel_rng: bool = False,
                         gauss_mode: str = "clt4"):
    """Pallas wrapper of :func:`make_fullstep_inner` blocked over lanes.

    With ``inkernel_rng``, the gaussian mutation noise and the mutation-
    rate ladder are generated inside the kernel from the TPU per-core
    PRNG (``gauss_mode`` selects Irwin–Hall/Box–Muller, see
    :func:`gauss_from_u01`; rates built directly from exponent bits) —
    the on-chip analog of the reference's precomputed 8M-entry noise
    ring buffers (ik_base.h:49-126), saving the gens·V·C noise tensor's
    HBM round trip per step.  Draws happen one GENERATION at a time so
    only a (V, C, W) noise tile is live in VMEM.  The caller then passes
    a ``(1, 1)`` int32 seed instead of noise/rates arrays.

    Returns ``(fn, F)`` where F is the number of fixed-variable rows the
    caller must supply (``qfix (max(F,1), N)`` — a dummy row when F=0).
    """
    from jax.experimental.pallas import tpu as pltpu

    inner, F = make_fullstep_inner(model, tip_links, active_vars, inst_tip, sp)
    V, K, C = sp.V, sp.K, sp.C
    T = len(tip_links)
    W = block_n
    Fq = max(F, 1)

    def body(draw_gen, genes_ref, grads_ref, qfix_ref, gpos_ref,
             gquat_ref, wpos_ref, wrot_ref, span_ref, cmin_ref, cmax_ref,
             genes_out_ref, grads_out_ref, tips_out_ref, fit_out_ref):
        g, r, t, f = inner(
            genes_ref[:], grads_ref[:], qfix_ref[:],
            gpos_ref[:], gquat_ref[:], wpos_ref[:], wrot_ref[:],
            span_ref[:], cmin_ref[:], cmax_ref[:],
            draw_gen,
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
            rbits, u01 = make_rng_helpers()
            draw_rates = make_rate_draw(rbits, sp, W)

            def draw_gen(_g):
                noise = gauss_from_u01(u01, (V, C, W), gauss_mode)
                return noise, draw_rates()

            body(draw_gen, genes_ref, grads_ref, qfix_ref, gpos_ref,
                 gquat_ref, wpos_ref, wrot_ref, span_ref, cmin_ref,
                 cmax_ref, genes_out_ref, grads_out_ref, tips_out_ref,
                 fit_out_ref)
    else:
        def kernel(genes_ref, grads_ref, qfix_ref, gpos_ref, gquat_ref,
                   wpos_ref, wrot_ref, span_ref, cmin_ref, cmax_ref,
                   noise_ref, rates_ref,
                   genes_out_ref, grads_out_ref, tips_out_ref, fit_out_ref):
            body(array_draw_gen(noise_ref[:], rates_ref[:]),
                 genes_ref, grads_ref, qfix_ref,
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
                                 + (3 * sp.gens * V * C
                                    if inkernel_rng and gauss_mode != "clt4"
                                    else 0)) * N,
            ),
            interpret=interpret,
        )(*args)

    return run, F
