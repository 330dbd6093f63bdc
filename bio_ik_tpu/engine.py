"""Fused bio2 throughput engine: scenario batch × islands × species on
the kernel lane axis.

The XLA op-by-op solver path (bio_ik_tpu.solvers.bio2 under vmap) spends
~20 ms per step at B=4096 on HBM round-trips between hundreds of small
fused ops.  This engine keeps solver state in the fused kernel's
``(rows, N)`` lane layout (N = batch·islands·species) and runs the
species inner loop as ONE Pallas kernel per step, with only species
bookkeeping (sort/wipeout, reference: ik_evolution_2.cpp:604-645) and
the chunked acceptance/winner logic (reference: ik_parallel.h:160-261)
remaining as XLA ops.

Two kernel tiers, selected automatically:
  * **fullstep** (:mod:`bio_ik_tpu.kernels.bio2_fullstep`): exact FK,
    linearization, generations, memetic and exact species fitness all
    in-kernel — requires a FIXED/REVOLUTE/PRISMATIC chain.  Joint-space
    secondary goals (the reference's recommended regularizer config)
    run in-kernel on this tier: per-generation pre-selection by
    secondary fitness + combined memetic line search (reference:
    ik_evolution_2.cpp:366-378, :459-537);
  * **species** (:mod:`bio_ik_tpu.kernels.bio2_step`): linearization and
    exact FK stay in XLA; used when the chain has floating/planar
    joints.  Joint-space secondary goals and floating-joint quaternion
    gene renormalization run in-kernel on this tier too.

Semantically equivalent to ``IKSolver.solve_batch`` with a bio2-family
mode (same per-step algorithm, same acceptance and winner-selection
rules; PRNG streams differ, so equivalence is statistical, not bitwise).
``IKSolver`` routes to this engine automatically when the problem
qualifies (see :func:`FusedBio2Engine.supports`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .kernels.bio2_step import SpeciesParams, make_species_inner, make_species_kernel
from .kernels.bio2_fullstep import AUX_KINDS
from .kernels.bio2_megastep import make_megastep_body, make_megastep_kernel
from .kernels.fk_rows import supports_fullstep_chain
from .math.frame import Frame

__all__ = ["FusedBio2Engine"]

_S = 2   # species per island (reference: ik_evolution_2.cpp:141)
_P = 2
_C = 16
_WIPEOUT_P = 0.1
# unroll guard: the fused kernels unroll the per-variable delta
# contraction at trace time; with per-generation noise draws the VMEM
# footprint stays bounded and 30+ DOF chains (snake-32, humanoid-30)
# compile and run on the fast path — the guard only rejects sizes where
# Mosaic program size becomes the bottleneck
_MAX_FUSED_VARS = 40

_MEMETIC_OF_MODE = {"bio2": "", "bio2_memetic": "q", "bio2_memetic_l": "l"}

# secondary goal kind → in-kernel quadratic term (see bio2_fullstep.SEC_ROWS)
_SEC_TERM_OF = {
    "center_joints": "alpha",
    "regularization": "beta",
    "minimal_displacement": "beta",
    "avoid_joint_limits": "gamma",
    "joint_variable": "delta",
}

_INV24 = 1.0 / (1 << 24)
_SQRT3 = float(np.sqrt(3.0))


def _scenario_salt(keys):
    """Per-scenario 32-bit PRNG salts from the ``(B,)`` key batch.

    The fused engine draws all randomness from one engine-level stream
    (per-lane independence comes from the lane axis of each draw); the
    salt XORs each scenario's key into its lanes' raw bits so
    ``solve_batch`` honors every entry of ``keys``: identical keys
    reproduce bitwise, a fresh ``keys[i]`` re-randomizes scenario i only
    (the per-island RNG independence of the reference, ik_base.h:49-126,
    keyed per scenario)."""
    arr = keys
    if jnp.issubdtype(arr.dtype, jax.dtypes.prng_key):
        arr = jax.random.key_data(arr)
    arr = arr.astype(jnp.uint32)
    # mix both key words so changing either changes the salt
    return arr[..., 0] ^ (arr[..., 1] * jnp.uint32(2654435761))


def _u01_bits(key, shape, salt, lo=0.0):
    """Uniform [lo, lo+1) from salted threefry bits — the XLA mirror of
    the kernel's ``make_rng_helpers`` u01 (same top-24-bit mapping)."""
    b = jax.random.bits(key, shape, jnp.uint32) ^ salt
    return ((b >> 8).astype(jnp.float32) * jnp.float32(_INV24)
            + jnp.float32(lo))


def _gauss_bits(key, shape, salt, gauss_mode):
    """Unit gaussians from salted bits (same construction as the kernel's
    ``gauss_from_u01``)."""
    if gauss_mode == "clt4":
        s = sum(_u01_bits(jax.random.fold_in(key, j), shape, salt)
                for j in range(4))
        return (s - 2.0) * jnp.float32(_SQRT3)
    u1 = _u01_bits(jax.random.fold_in(key, 0), shape, salt, lo=2.0 ** -25)
    u2 = _u01_bits(jax.random.fold_in(key, 1), shape, salt)
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    return rad * jnp.cos(jnp.float32(2.0 * np.pi) * u2)


def _rate_bits(key, shape, salt):
    """Mutation-rate ladder 2^(k−23), k ∈ [0,16) from salted bits
    (reference: ik_evolution_2.cpp:265)."""
    kb = (jax.random.bits(key, shape, jnp.uint32) ^ salt) & jnp.uint32(15)
    return jnp.exp2(kb.astype(jnp.float32) - 23.0)


class FusedBio2Engine:
    """Batched bio2 solve with the fused species kernel in the hot loop."""

    def __init__(self, iksolver, block_n: Optional[int] = None,
                 use_pallas: bool = True, interpret: bool = False):
        reason = self.supports(iksolver)
        if reason is not None:
            raise ValueError(f"fused engine unsupported: {reason}")
        self.iksolver = iksolver
        self.problem = p = iksolver.problem
        self.ctx = iksolver.ctx
        self.config = iksolver.config
        self.islands = iksolver.islands

        memetic = _MEMETIC_OF_MODE[self.config.mode]
        gens = 8 if memetic else 16

        if block_n is None:
            # widest lane block whose per-lane VMEM footprint fits a ~6 MB
            # budget — wider blocks measurably help (+5 % at 512 vs 256 on
            # the 7-DOF bench) until VMEM pressure bites.  Noise is drawn
            # one generation at a time (V·C·W floats live), so gens does
            # not enter; the dominant tenants are the per-generation child
            # pools (2·V·(C+2)), the noise tile (V·C), phenotype rows
            # (K·7·(C+2)) and the aliased state blocks (~8·V).
            V = self.ctx.nvars  # kernel V (SpeciesParams), not active_vars
            K0 = sum(grp.count for grp in p.primary)
            # ×3 = measured Mosaic stack multiplier over the live-buffer
            # estimate (snake-32 at W=512 hit 34.4 KB/lane vs 10.9 KB
            # estimated; 17.6 MB scoped-vmem OOM against the 16 MB limit)
            per_lane = 3 * 4 * (2 * V * (_C + 2) + 2 * V * _C
                                + K0 * 7 * (_C + 2) + 13 * V)
            budget = (12 * 1024 * 1024) // max(per_lane, 1)
            # cap at 512: measured on the PR2 7-DOF headline bench,
            # W=1024 is ~2 % SLOWER than 512 (373k vs 366k solves/s)
            block_n = max(256, min(512, (budget // 256) * 256))
        self.block_n = block_n

        # goal-instance table: one kernel row group per primary goal
        # instance (kind decides which weight rows are active)
        self.ginst = []  # (group_idx, instance, tip_slot, kind)
        for gi, grp in enumerate(p.primary):
            for k in range(grp.count):
                self.ginst.append((gi, k, int(grp.tip_slots[k]), grp.kind))
        K = len(self.ginst)
        self.inst_kind = [g[3] for g in self.ginst]
        self.has_aux = any(k in AUX_KINDS for k in self.inst_kind)

        self.sp = SpeciesParams(
            V=self.ctx.nvars, K=K, C=_C, gens=gens,
            mem_iters=8, memetic=memetic,
            # floating-joint quat gene blocks renormalized in-kernel after
            # each mutation (only ever non-empty on the species tier — a
            # fullstep chain is FIXED/REVOLUTE/PRISMATIC, so no quat genes)
            quat_slices=tuple(getattr(iksolver.solver, "quat_slices", ())),
        )
        # joint-space secondary goals run in-kernel (pre-selection +
        # combined memetic fitness, reference: ik_evolution_2.cpp:366-378,
        # :459-537) — the reference's recommended regularizer config
        # (kinematics_plugin.cpp:286-329) keeps the fast path
        self.sec_terms = tuple(sorted(
            {_SEC_TERM_OF[grp.kind] for grp in p.secondary}
        )) if p.has_secondary else ()
        model = p.model
        tip_idx = [model.link_index[t] for t in p.tip_links]
        self.fullstep = supports_fullstep_chain(model, tip_idx)
        inst_tip = [g[2] for g in self.ginst]
        self.inkernel_rng = False
        cfg = self.config
        self.spc = max(1, min(cfg.steps_per_check, cfg.max_steps))
        self.nchecks = max(1, cfg.max_steps // self.spc)
        if self.fullstep:
            # megastep: the whole steps_per_check chunk — species steps,
            # sort/wipeout, incumbent tracking — is ONE kernel launch.
            # Launch count per solve is nchecks, not max_steps (each
            # pallas launch interleaved with XLA ops costs ~3.5 ms of
            # program-switch overhead on the tunneled TPU backend,
            # measured; the in-kernel loop avoids it).
            if use_pallas and not interpret:
                self.inkernel_rng = True
                self.mega, self.n_fix = make_megastep_kernel(
                    model, p.tip_links, p.active_vars, inst_tip, self.sp,
                    n_steps=self.spc, block_n=block_n, inkernel_rng=True,
                    gauss_mode=self.config.gauss_mode,
                    sec_terms=self.sec_terms, inst_kind=self.inst_kind,
                )
            else:
                body, self.n_fix = make_megastep_body(
                    model, p.tip_links, p.active_vars, inst_tip, self.sp,
                    n_steps=self.spc, use_pltpu_roll=False,
                    sec_terms=self.sec_terms, inst_kind=self.inst_kind,
                )
                sp = self.sp
                gm = self.config.gauss_mode
                has_sec = bool(self.sec_terms)

                def mega_jnp(key, salt, genes, grads, sfit, sol, sol_fit,
                             sol_tips, *consts):
                    """XLA mirror of the megastep kernel's salted per-
                    generation draws (CPU tests / fallback): the salt row
                    injects per-scenario keys exactly as in-kernel."""
                    N = genes.shape[-1]

                    def draw(i):
                        ki = jax.random.fold_in(key, i)

                        def draw_gen(g):
                            kg = jax.random.fold_in(ki, g)
                            noise = _gauss_bits(
                                jax.random.fold_in(kg, 0),
                                (sp.V, sp.C, N), salt, gm)
                            rates = _rate_bits(
                                jax.random.fold_in(kg, 1), (sp.C, N), salt)
                            if has_sec:
                                keep = _u01_bits(jax.random.fold_in(kg, 2),
                                                 (1, N), salt)
                                return noise, rates, keep
                            return noise, rates

                        wu = _u01_bits(jax.random.fold_in(ki, 101),
                                       (1, N), salt)
                        wg = _u01_bits(jax.random.fold_in(ki, 102),
                                       (sp.V, N), salt)
                        return draw_gen, wu, wg

                    return body((genes, grads, sfit, sol, sol_fit,
                                 sol_tips), consts, draw)

                self.mega = jax.jit(mega_jnp)
            from .kernels.fk_rows import FkRows

            self.fixed_vars = FkRows(
                model, p.tip_links, p.active_vars
            ).fixed_vars
        else:
            if use_pallas:
                self.kernel = make_species_kernel(self.sp, block_n=block_n,
                                                  interpret=interpret,
                                                  sec_terms=self.sec_terms)
            else:
                self.kernel = jax.jit(
                    make_species_inner(self.sp, self.sec_terms))
        self._solve_jit = jax.jit(self._solve_batch)

    # ------------------------------------------------------------------
    @staticmethod
    def supports(iksolver) -> Optional[str]:
        """None when the fused fast path applies, else the reason why not."""
        p = iksolver.problem
        if iksolver.config.mode not in _MEMETIC_OF_MODE:
            return f"mode {iksolver.config.mode!r} is not a fused bio2 family"
        # non-pose goal kinds run only on the fullstep kernel tier (the
        # species tier keeps pose-shaped rows)
        from .kernels.bio2_fullstep import AUX_KINDS as _AUX

        fused_kinds = ("position", "orientation", "pose",
                       "max_distance", "min_distance") + _AUX
        # joint-space secondary goals run on BOTH tiers (fullstep:
        # in-kernel SEC_ROWS; species: the same pre-selection + combined
        # memetic in make_species_inner) — only non-pose primaries force
        # the fullstep chain requirement
        needs_fullstep = False
        if p.has_secondary:
            for grp in p.secondary:
                if grp.kind not in _SEC_TERM_OF:
                    return (f"secondary goal kind {grp.kind!r} not in the "
                            "fused secondary fitness")
        for grp in p.primary:
            if grp.kind not in fused_kinds:
                return f"goal kind {grp.kind!r} not in the fused fitness"
            if grp.kind not in ("position", "orientation", "pose"):
                needs_fullstep = True
        if not p.primary:
            return "no primary goals"
        if needs_fullstep:
            model = p.model
            tip_idx = [model.link_index[t] for t in p.tip_links]
            if not supports_fullstep_chain(model, tip_idx):
                return ("non-pose primary goals need the fullstep "
                        "kernel (floating/planar chain)")
        # floating-joint quaternion genes are renormalized in-kernel on
        # the species tier (SpeciesParams.quat_slices) — no rejection
        if np.dtype(p.dtype) != np.float32:
            return "fused kernel is float32"
        if len(p.active_vars) > _MAX_FUSED_VARS:
            return f"{len(p.active_vars)} active variables exceed the unroll guard"
        return None

    # ------------------------------------------------------------------
    def _secondary_rows(self, data, B):
        """Packed per-variable secondary-fitness rows ``(B, 8·V)`` in
        :data:`bio2_fullstep.SEC_ROWS` order, folding each secondary
        group's (per-scenario) weight² into the quadratic coefficients
        (see the evaluators in problem.py:607-686 for the source forms).
        Inactive-variable joint goals contribute only constants and are
        dropped (every kernel use is offset-invariant)."""
        p = self.problem
        V = self.sp.V
        dt = jnp.float32
        vw = p.velocity_weights.astype(dt)
        bnd = p.abounded.astype(dt)
        zeros = jnp.zeros((B, V), dt)
        alpha, beta, gamma, delta, tsum = zeros, zeros, zeros, zeros, zeros
        for grp, gdata in zip(p.secondary, data["secondary"]):
            w2 = gdata["weight_sq"].astype(dt)            # (B, count)
            w2s = jnp.sum(w2, axis=-1)[:, None]           # (B, 1)
            if grp.kind == "center_joints":
                alpha = alpha + w2s * jnp.square(vw * bnd)
            elif grp.kind == "regularization":
                beta = beta + w2s
            elif grp.kind == "minimal_displacement":
                beta = beta + w2s * jnp.square(vw)
            elif grp.kind == "avoid_joint_limits":
                gamma = gamma + w2s * jnp.square(vw * bnd)
            elif grp.kind == "joint_variable":
                slots = np.asarray(grp.static["slots"])
                act = slots >= 0
                if act.any():
                    asl = slots[act]
                    w2a = w2[:, act]
                    tgt = gdata["target"].astype(dt)[:, act]
                    delta = delta.at[:, asl].add(w2a)
                    tsum = tsum.at[:, asl].add(w2a * tgt)
        tbar = jnp.where(delta > 0, tsum / jnp.maximum(delta, 1e-30), 0.0)
        mid = jnp.broadcast_to(p.amid.astype(dt), (B, V))
        hspan = jnp.broadcast_to(p.aspan.astype(dt) * 0.5, (B, V))
        seed = data["seed_active"].astype(dt)
        return jnp.concatenate(
            [alpha, beta, gamma, delta, tbar, mid, hspan, seed], axis=-1)

    # ------------------------------------------------------------------
    def _goal_rows(self, data, B):
        """Per-goal-instance kernel rows from the data pytree:
        gpos (B, K·3), gquat (B, K·4), gaux (B, K·3), wpos/wrot (B, K).
        Row reuse per kind (see bio2_fullstep.eval_goals): lookat/
        max/min_distance put the TARGET in gpos; line/plane their
        anchor point; direction/side the world direction; gaux carries
        the link-local axis (lookat/direction/side) or the line
        direction / plane normal; wrot doubles as the distance scalar
        for max/min_distance.  wpos always carries the weight for
        non-pose kinds."""
        dt = jnp.float32
        gpos, gquat, gaux, wpos, wrot = [], [], [], [], []
        for gi, k, _slot, kind in self.ginst:
            gd = data["primary"][gi]
            w = gd["weight_sq"][..., k]
            zeros3 = jnp.zeros(w.shape + (3,), dt)
            ident = jnp.broadcast_to(
                jnp.asarray([0, 0, 0, 1], dt), w.shape + (4,)
            )
            if kind == "lookat":
                gpos.append(gd["target"][..., k, :])
                gquat.append(ident)
                gaux.append(gd["axis"][..., k, :])
                wpos.append(w)
                wrot.append(jnp.zeros_like(w))
                continue
            if kind in ("line", "plane"):
                gpos.append(gd["position"][..., k, :])
                gquat.append(ident)
                gaux.append(gd["direction" if kind == "line" else "normal"]
                            [..., k, :])
                wpos.append(w)
                wrot.append(jnp.zeros_like(w))
                continue
            if kind in ("max_distance", "min_distance"):
                gpos.append(gd["target"][..., k, :])
                gquat.append(ident)
                gaux.append(zeros3)
                wpos.append(w)
                wrot.append(gd["distance"][..., k])   # scalar param row
                continue
            if kind in ("direction", "side"):
                gpos.append(gd["direction"][..., k, :])
                gquat.append(ident)
                gaux.append(gd["axis"][..., k, :])
                wpos.append(w)
                wrot.append(jnp.zeros_like(w))
                continue
            if kind == "cone":
                gpos.append(gd["position"][..., k, :])
                # free gquat rows carry [direction(3), angle]
                gquat.append(jnp.concatenate(
                    [gd["direction"][..., k, :],
                     gd["angle"][..., k][..., None]], axis=-1))
                gaux.append(gd["axis"][..., k, :])
                wpos.append(w)
                wrot.append(gd["position_weight_sq"][..., k])
                continue
            gaux.append(zeros3)
            gpos.append(gd["position"][..., k, :] if kind in ("position", "pose")
                        else zeros3)
            gquat.append(gd["orientation"][..., k, :]
                         if kind in ("orientation", "pose") else ident)
            if kind == "pose":
                wpos.append(w)
                wrot.append(w * gd["rotation_scale_sq"][..., k])
            elif kind == "position":
                wpos.append(w)
                wrot.append(jnp.zeros_like(w))
            else:
                wpos.append(jnp.zeros_like(w))
                wrot.append(w)
        return (
            jnp.concatenate([g[..., None, :] for g in gpos], -2).reshape(B, -1),
            jnp.concatenate([g[..., None, :] for g in gquat], -2).reshape(B, -1),
            jnp.concatenate([g[..., None, :] for g in gaux], -2).reshape(B, -1),
            jnp.stack(wpos, -1),
            jnp.stack(wrot, -1),
        )

    # ------------------------------------------------------------------
    def _lane_setup(self, keys, data):
        """Shared (rows, lanes) layout prep for both kernel tiers: reshape
        helpers, lane-broadcast bounds/goal constants, seed-state arrays and
        per-lane data views.  Returned as a dict consumed by the megastep
        prep (:meth:`_mega_prep`) and the species-tier step loop."""
        p, ctx = self.problem, self.ctx
        V, I, S = self.sp.V, self.islands, _S
        T = p.ntips
        dt = jnp.float32
        B = keys.shape[0]
        M = B * I * S
        Mp = -(-M // self.block_n) * self.block_n  # pad lanes to block

        def to_lanes(x):
            """(B, I, S, R) → (R, Mp) — species fastest on lanes."""
            r = x.reshape(M, -1).T
            return jnp.pad(r, ((0, 0), (0, Mp - M)))

        def lane_goal(x):
            r = x.shape[-1]
            return to_lanes(jnp.broadcast_to(x[:, None, None, :], (B, I, S, r)))

        def unlane(x, R):
            return x[:, :M].T.reshape(B, I, S, R)

        seed_active = data["seed_active"].astype(dt)            # (B, V)
        seed_full = data["seed_full"]                           # (B, Vfull)
        seed_bis = jnp.broadcast_to(seed_active[:, None, None, :], (B, I, S, V))
        seed_full_m = jnp.broadcast_to(
            seed_full[:, None, None, :], (B, I, S) + seed_full.shape[-1:]
        ).reshape(M, -1)

        # goal rows, broadcast over (I, S) then laned
        gpos_b, gquat_b, gaux_b, wpos_b, wrot_b = self._goal_rows(data, B)

        # data views batched per lane for fitness/acceptance calls
        data_m = jax.tree.map(
            lambda x: jnp.broadcast_to(
                x[:, None, None], (B, I, S) + x.shape[1:]
            ).reshape((M,) + x.shape[1:]),
            data,
        )
        data_bi = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (B, I) + x.shape[1:]).reshape(
                (B * I,) + x.shape[1:]
            ),
            data,
        )

        # ---- init (reference :155-166: all islands start from the seed) --
        genes = to_lanes(
            jnp.broadcast_to(seed_bis[..., None, :], (B, I, S, _P, V))
            .reshape(B, I, S, _P * V)
        )
        seed_tips_f = ctx.tips_frame(data["seed_full"], seed_active)  # (B,T)
        f0 = p.fitness(
            jnp.concatenate([seed_tips_f.pos, seed_tips_f.quat], -1),
            seed_active, data,
        )                                                        # (B,)

        salt_m = jnp.broadcast_to(
            _scenario_salt(keys)[:, None], (B, I * S)).reshape(M)

        return dict(
            B=B, M=M, Mp=Mp, T=T,
            to_lanes=to_lanes, lane_goal=lane_goal, unlane=unlane,
            seed_active=seed_active, seed_full=seed_full,
            seed_bis=seed_bis, seed_full_m=seed_full_m,
            span=jnp.broadcast_to(p.aspan[:, None], (V, Mp)).astype(dt),
            cmin=jnp.broadcast_to(p.aclip_min[:, None], (V, Mp)).astype(dt),
            cmax=jnp.broadcast_to(p.aclip_max[:, None], (V, Mp)).astype(dt),
            gpos=lane_goal(gpos_b), gquat=lane_goal(gquat_b),
            gaux_b=gaux_b,
            wpos=lane_goal(wpos_b), wrot=lane_goal(wrot_b),
            data_m=data_m, data_bi=data_bi,
            genes=genes, grads=jnp.zeros_like(genes),
            seed_tips_f=seed_tips_f, f0=f0,
            salt_row=jnp.pad(salt_m, (0, Mp - M))[None, :],      # (1, Mp) u32
        )

    def _mega_prep(self, keys, data):
        """Megastep-path initial state: ``(state, consts, salt, best)``.

        Solver state lives in the (rows, lanes) kernel layout across the
        whole solve; incumbents are tracked per LANE in-kernel and
        :meth:`_eval_lanes` checks every island × species incumbent (a
        superset of the reference's per-island checks)."""
        p = self.problem
        V, I, S = self.sp.V, self.islands, _S
        dt = jnp.float32
        ls = self._lane_setup(keys, data)
        B, Mp, T = ls["B"], ls["Mp"], ls["T"]
        to_lanes, lane_goal = ls["to_lanes"], ls["lane_goal"]
        seed_tips_f, f0, seed_bis = ls["seed_tips_f"], ls["f0"], ls["seed_bis"]

        fv = self.fixed_vars
        if fv:
            qfix = to_lanes(
                jnp.broadcast_to(
                    ls["seed_full"][:, None, None, fv], (B, I, S, len(fv))
                )
            ).astype(dt)
        else:
            qfix = jnp.zeros((1, Mp), dt)

        amin = jnp.broadcast_to(p.amin[:, None], (V, Mp)).astype(dt)
        amax = jnp.broadcast_to(p.amax[:, None], (V, Mp)).astype(dt)
        seed_tips_b = jnp.concatenate(
            [seed_tips_f.pos, seed_tips_f.quat], -1)          # (B,T,7)
        sfit_r = jnp.full((1, Mp), jnp.inf, dt)
        sol_r = to_lanes(seed_bis)                            # (V, Mp)
        sol_fit_r = to_lanes(
            jnp.broadcast_to(f0[:, None, None, None], (B, I, S, 1)))
        sol_tips_r = to_lanes(jnp.broadcast_to(
            seed_tips_b.reshape(B, 1, 1, T * 7), (B, I, S, T * 7)))

        best = self._eval_lanes(sol_r, sol_fit_r, sol_tips_r, data)
        state = (ls["genes"], ls["grads"], sfit_r, sol_r, sol_fit_r,
                 sol_tips_r)
        consts = (qfix, ls["gpos"], ls["gquat"])
        if self.has_aux:
            consts = consts + (lane_goal(ls["gaux_b"]),)
        consts = consts + (ls["wpos"], ls["wrot"], ls["span"], ls["cmin"],
                           ls["cmax"], amin, amax)
        if self.sec_terms:
            consts = consts + (lane_goal(self._secondary_rows(data, B)),)
        if self.inkernel_rng:
            salt = jax.lax.bitcast_convert_type(ls["salt_row"], jnp.int32)
        else:
            salt = ls["salt_row"]
        return state, consts, salt, best

    def _mega_once(self, kc, salt, state, consts):
        """One megastep launch (= ``steps_per_check`` solver steps) under
        chunk key ``kc``."""
        if self.inkernel_rng:
            seed32 = jax.random.key_data(kc)[..., 0].astype(
                jnp.int32).reshape(1, 1)
            return self.mega(seed32, salt, *state, *consts)
        return self.mega(kc, salt, *state, *consts)

    def _chunk_key(self, c):
        """Per-chunk PRNG key: one engine-level stream seeded from the
        STATIC config seed (per-lane independence comes from the lane axis
        of each draw; per-SCENARIO keys enter via the salt row, so all B
        entries of ``keys`` are honored)."""
        master = jax.random.fold_in(
            jax.random.PRNGKey(self.config.seed), 0x5EED)
        return jax.random.fold_in(master, c)

    @staticmethod
    def _merge(best, cand):
        b_qa, b_fit, b_ok, b_key = best
        qa, fit, ok, kk = cand
        take = (ok & ~b_ok) | ((ok == b_ok) & (kk < b_key))
        return (
            jnp.where(take[..., None], qa, b_qa),
            jnp.where(take, fit, b_fit),
            jnp.where(take, ok, b_ok),
            jnp.where(take, kk, b_key),
        )

    def _eval_lanes(self, sol_r, sol_fit_r, sol_tips_r, data):
        """Winner per scenario among all island × species lane incumbents
        (reference: ik_parallel.h:220-261): successes ranked by combined
        fitness when secondary goals exist, failures by primary
        (api._eval_islands)."""
        p = self.problem
        V, T, L = self.sp.V, p.ntips, self.islands * _S
        B = data["seed_active"].shape[0]
        M = B * L
        data_bl = jax.tree.map(
            lambda x: jnp.broadcast_to(
                x[:, None], (B, L) + x.shape[1:]
            ).reshape((B * L,) + x.shape[1:]),
            data,
        )
        qa = sol_r[:, :M].T.reshape(B * L, V)
        tips = sol_tips_r[:, :M].T.reshape(B * L, T, 7)
        tf = Frame(pos=tips[..., 0:3], quat=tips[..., 3:7])
        ok = p.check_solution(tf, qa, data_bl).reshape(B, L)
        fit = sol_fit_r[:, :M].T.reshape(B, L)
        if p.has_secondary:
            fsec = p.fitness_secondary(qa, data_bl).reshape(B, L)
            rank = jnp.where(ok, fit + fsec, fit)
        else:
            rank = fit
        any_ok = jnp.any(ok, axis=1, keepdims=True)
        sel = jnp.where(ok == any_ok, rank, jnp.inf)
        i = jnp.argmin(sel, axis=1)
        bi = jnp.arange(B)
        qa = qa.reshape(B, L, V)
        return qa[bi, i], fit[bi, i], ok[bi, i], rank[bi, i]

    def _mega_result(self, best, data):
        from .api import IKResult

        qa_w, fit_w, ok_w, _ = best
        qa_w = self.iksolver._rewrap(qa_w, data["seed_active"])
        qfull_w = self.ctx.qfull(data["seed_full"], qa_w)
        return IKResult(q=qfull_w, success=ok_w, fitness=fit_w, qa=qa_w)

    # ------------------------------------------------------------------
    def _solve_batch(self, keys, data):
        from .api import IKResult

        p, ctx, cfg = self.problem, self.ctx, self.config
        V, K, I, S = self.sp.V, self.sp.K, self.islands, _S
        gens, C = self.sp.gens, self.sp.C
        dt = jnp.float32
        merge = self._merge

        if self.fullstep:
            # ---- megastep path: one kernel launch per acceptance chunk --
            state, consts, salt, best = self._mega_prep(keys, data)
            if self.inkernel_rng:
                # TPU: unroll chunks at trace time — a pallas launch
                # inside lax.scan reloads the kernel program every
                # iteration on the tunneled backend (measured ~3.5 ms)
                for c in range(self.nchecks):
                    state = self._mega_once(
                        self._chunk_key(c), salt, state, consts)
                    best = merge(
                        best,
                        self._eval_lanes(state[3], state[4], state[5], data),
                    )
            else:
                # plain-jnp path (CPU tests/fallback): scan compiles the
                # chunk body once — no pallas inside, no reload issue
                def chunk_step(carry, c):
                    state, best = carry
                    kc = self._chunk_key(c)
                    state = self._mega_once(kc, salt, state, consts)
                    best = merge(
                        best,
                        self._eval_lanes(state[3], state[4], state[5], data),
                    )
                    return (state, best), None

                (state, best), _ = jax.lax.scan(
                    chunk_step, (state, best), jnp.arange(self.nchecks))
            return self._mega_result(best, data)

        ls = self._lane_setup(keys, data)
        B, M, Mp, T = ls["B"], ls["M"], ls["Mp"], ls["T"]
        to_lanes, lane_goal, unlane = (
            ls["to_lanes"], ls["lane_goal"], ls["unlane"])
        seed_bis, seed_full_m = ls["seed_bis"], ls["seed_full_m"]
        span, cmin, cmax = ls["span"], ls["cmin"], ls["cmax"]
        gpos, gquat, wpos, wrot = (
            ls["gpos"], ls["gquat"], ls["wpos"], ls["wrot"])
        data_m, data_bi = ls["data_m"], ls["data_bi"]
        genes, grads = ls["genes"], ls["grads"]
        seed_tips_f, f0 = ls["seed_tips_f"], ls["f0"]
        salt_row = ls["salt_row"]
        tip_slots = np.asarray([g[2] for g in self.ginst])

        sfit = jnp.full((B, I, S), jnp.inf, dt)
        solution = seed_bis[..., 0, :]                           # (B, I, V)
        sol_fit = jnp.broadcast_to(f0[:, None], (B, I))
        sol_tips = jnp.broadcast_to(
            jnp.concatenate([seed_tips_f.pos, seed_tips_f.quat], -1)[:, None],
            (B, I, T, 7),
        )

        # ---- one fused step (species-kernel path: floating/planar
        # chains keep the XLA linearizer between launches) --------------
        salt_bi = jnp.broadcast_to(_scenario_salt(keys)[:, None], (B, I))
        gm = self.config.gauss_mode
        if self.sec_terms:
            sec_rows = lane_goal(self._secondary_rows(data, B))  # (8V, Mp)

        def step(carry, key):
            genes, grads, sfit, solution, sol_fit, sol_tips = carry
            k_noise, k_rate, k_wipe_p, k_wipe_g, k_keep = (
                jax.random.split(key, 5))

            noise = _gauss_bits(k_noise, (gens, V, C, Mp), salt_row, gm)
            rates = _rate_bits(k_rate, (gens, C, Mp), salt_row)
            sec_args = ()
            if self.sec_terms:
                keeps = _u01_bits(k_keep, (gens, 1, Mp), salt_row)
                sec_args = (keeps, sec_rows)

            # linearize at parent 0 in XLA (reference :341-346)
            qa0 = genes[:V, :M].T                            # (M, V)
            qfull = ctx.qfull(seed_full_m, qa0)
            tips0_f, deltas_f = ctx.linearize(qfull)
            tips0 = to_lanes(tips0_f[:, tip_slots, :].reshape(M, K * 7))
            dsel = deltas_f[:, tip_slots, :, :]              # (M, K, V, 7)
            deltas = to_lanes(
                jnp.transpose(dsel, (0, 2, 1, 3)).reshape(M, V * K * 7)
            )
            genes, grads = self.kernel(
                genes, grads, tips0, deltas, gpos, gquat, wpos, wrot,
                span, cmin, cmax, noise, rates, *sec_args,
            )
            qa_new = genes[:V, :M].T                         # (M, V)
            tips_f = ctx.tips_frame(seed_full_m, qa_new)     # (M, T)
            tips_m = jnp.concatenate([tips_f.pos, tips_f.quat], -1)
            f = p.fitness(tips_m, qa_new, data_m).reshape(B, I, S)
            tips_bis = tips_m.reshape(B, I, S, T * 7)

            qa_bis = unlane(genes[:V], V)                        # (B,I,S,V)
            improved = f != sfit

            # incumbent update from BOTH species (reference :640-644 after
            # sort — equivalent to taking the per-island min)
            s_best = jnp.argmin(f, axis=-1)                      # (B, I)
            bi, ii = jnp.meshgrid(jnp.arange(B), jnp.arange(I), indexing="ij")
            f_best = f[bi, ii, s_best]
            better = f_best < sol_fit
            solution = jnp.where(
                better[..., None], qa_bis[bi, ii, s_best], solution
            )
            sol_tips = jnp.where(
                better[..., None, None],
                tips_bis[bi, ii, s_best].reshape(B, I, T, 7),
                sol_tips,
            )
            sol_fit = jnp.where(better, f_best, sol_fit)

            # species sort (S = 2 compare-swap; reference :617)
            swap = f[..., 1] < f[..., 0]

            def sswap(x):
                xr = x[:, :M].reshape(-1, B, I, S)
                xs = jnp.where(swap[None, :, :, None], xr[..., ::-1], xr)
                return jnp.pad(xs.reshape(-1, M), ((0, 0), (0, Mp - M)))

            genes, grads = sswap(genes), sswap(grads)
            f = jnp.where(swap[..., None], f[..., ::-1], f)
            improved = jnp.where(swap[..., None], improved[..., ::-1], improved)

            # wipeout of stagnant non-best species (reference :620-637)
            wipe = (_u01_bits(k_wipe_p, (B, I), salt_bi) < _WIPEOUT_P) | (
                ~improved[..., 1]
            )
            rand_u = _u01_bits(k_wipe_g, (B, I, V), salt_bi[..., None])
            rand_genes = p.amin + rand_u * (p.amax - p.amin)

            gr = genes[:, :M].reshape(_P, V, B, I, S)
            rg = jnp.transpose(rand_genes, (2, 0, 1))             # (V, B, I)
            gr = gr.at[..., 1].set(
                jnp.where(wipe[None, None, :, :], rg[None], gr[..., 1])
            )
            genes = jnp.pad(gr.reshape(_P * V, M), ((0, 0), (0, Mp - M)))
            rr = grads[:, :M].reshape(_P, V, B, I, S)
            rr = rr.at[..., 1].set(
                jnp.where(wipe[None, None, :, :], 0.0, rr[..., 1])
            )
            grads = jnp.pad(rr.reshape(_P * V, M), ((0, 0), (0, Mp - M)))

            return (genes, grads, f, solution, sol_fit, sol_tips), None

        # ---- chunked run with acceptance checks (ik_parallel.h:160-261) --
        spc = max(1, min(cfg.steps_per_check, cfg.max_steps))
        nchecks = max(1, cfg.max_steps // spc)

        def eval_islands(solution, sol_fit, sol_tips):
            """Winner per scenario among islands (api._eval_islands,
            vectorized over B) — tips come from the stored incumbent
            frames (exact FK, computed in-kernel)."""
            qa = solution.reshape(B * I, V)
            tf = Frame(
                pos=sol_tips.reshape(B * I, T, 7)[..., 0:3],
                quat=sol_tips.reshape(B * I, T, 7)[..., 3:7],
            )
            ok = p.check_solution(tf, qa, data_bi).reshape(B, I)
            fit = sol_fit
            if p.has_secondary:
                # successes ranked by combined fitness, failures by
                # primary (api._eval_islands / ik_parallel.h:220-261)
                fsec = p.fitness_secondary(qa, data_bi).reshape(B, I)
                rank = jnp.where(ok, fit + fsec, fit)
            else:
                rank = fit
            any_ok = jnp.any(ok, axis=1, keepdims=True)
            sel = jnp.where(ok == any_ok, rank, jnp.inf)
            i = jnp.argmin(sel, axis=1)
            bi = jnp.arange(B)
            return solution[bi, i], fit[bi, i], ok[bi, i], rank[bi, i]

        carry = (genes, grads, sfit, solution, sol_fit, sol_tips)
        best = eval_islands(solution, sol_fit, sol_tips)
        # one engine-level step-key stream seeded from the STATIC config
        # seed; per-lane independence comes from the lane axis of each
        # draw and per-SCENARIO keys enter via the salt rows, so the run
        # is deterministic under a fixed key set and every entry of
        # ``keys`` is honored
        master = jax.random.fold_in(
            jax.random.PRNGKey(self.config.seed), 0x5EED)
        kstream = jax.random.split(master, nchecks * spc)
        kstream = kstream.reshape((nchecks, spc) + kstream.shape[1:])

        def chunk(carry_best, ks):
            carry, best = carry_best
            carry, _ = jax.lax.scan(step, carry, ks)
            _, _, _, solution, sol_fit, sol_tips = carry
            best = merge(best, eval_islands(solution, sol_fit, sol_tips))
            return (carry, best), None

        (carry, best), _ = jax.lax.scan(chunk, (carry, best), kstream)
        qa_w, fit_w, ok_w, _ = best
        qa_w = self.iksolver._rewrap(qa_w, data["seed_active"])  # elementwise
        qfull_w = ctx.qfull(data["seed_full"], qa_w)
        return IKResult(q=qfull_w, success=ok_w, fitness=fit_w, qa=qa_w)

    # ------------------------------------------------------------------
    def solve_batch(self, keys, data):
        return self._solve_jit(keys, data)

    # ------------------------------------------------------------------
    def solve_until(self, key, data, timeout_s=None, max_checks=None):
        """Latency mode on the megastep path: ONE kernel launch per
        ``steps_per_check`` chunk, host-polled early exit, optional
        wall-clock deadline — the direct analog of the reference's "best
        accepted solution within ``timeout`` seconds" contract
        (reference: kinematics_plugin.cpp:506-507, ik_parallel.h:160-168).

        ``key``/``data`` are a single unbatched query.  When ``timeout_s``
        is given it REPLACES the step budget (chunks run until acceptance
        or the deadline); otherwise ``config.max_steps`` caps the run.
        Returns ``(IKResult, steps_run)`` with unbatched leaves.
        """
        import time as _time

        if not self.fullstep:
            raise ValueError(
                "solve_until latency mode needs the megastep kernel tier")
        if not hasattr(self, "_until_fns"):
            def chunk_fn(kc, salt, state, consts, best, data):
                state = self._mega_once(kc, salt, state, consts)
                cand = self._eval_lanes(
                    state[3], state[4], state[5], data)
                return state, self._merge(best, cand)

            self._until_fns = (
                jax.jit(self._mega_prep),
                jax.jit(chunk_fn),
                jax.jit(self._mega_result),
            )
        prep, chunk, result = self._until_fns
        t0 = _time.perf_counter()
        deadline = None if timeout_s is None else t0 + timeout_s
        keys = key[None]
        dataB = jax.tree.map(lambda x: x[None], data)
        state, consts, salt, best = prep(keys, dataB)
        if max_checks is None:
            max_checks = self.nchecks if timeout_s is None else (1 << 30)
        steps = 0
        for c in range(max_checks):
            state, best = chunk(
                self._chunk_key(c), salt, state, consts, best, dataB)
            steps += self.spc
            if bool(best[2][0]):      # success flag — host-side early exit
                break
            if deadline is not None and _time.perf_counter() >= deadline:
                break
        res = result(best, dataB)
        return jax.tree.map(lambda x: x[0], res), steps
