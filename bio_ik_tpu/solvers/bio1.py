"""bio1 evolutionary solver — reimplementation of the original Unity BioIK.

TPU-native counterpart of the reference's ``IKEvolution1``
(reference: src/ik_evolution_1.cpp:40-561, registered as ``bio1`` :558).

Algorithm per island per step (reference evolve(), :501-548):
  * elites improved by a greedy per-variable ``exploit`` using heuristic
    error step sizes (:387-432 — 2 probe FK evaluations per variable,
    sequential over variables),
  * non-elites reproduced from triangular-selected parents out of a
    shrinking survivor pool (:143-149, :518-533), with extinction-scaled
    mutation (:153-158, :303-312) and gene-mixing toward parents mean /
    prototype (:354-385),
  * sort, extinction recompute, solution update, and a wipeout-restart
    when no single-variable probe improves (:277-301, :536-547).

All fitness evaluations use **exact FK** (bio1 predates the reference's
mutation approximator).  TPU mapping: elites are vmapped, the per-variable
exploit loop is a ``lax.scan`` (inherently sequential in the reference
too), child reproduction is a ``lax.scan`` carrying the pool mask, and the
triangular parent selection becomes a categorical draw with the
equivalent descending-linear weights ``P(rank j) ∝ n−j`` (the rejection
sampler at utils.h:348-367 induces exactly this distribution).

The optional ``linear_fitness`` mode (:253-275) mixes per-goal position /
rotation distances with a random (or 0.5 when "balanced") weight and uses
the angular scale ``sqrt(chain_length·‖p_goal‖)/π`` (:161-165).  It
applies to position/orientation/pose goal groups; following the
reference's ``GoalType`` classification, other goal kinds do not
contribute in this mode.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..math.quat import quat_angle_shortest
from .base import Solver, SolverContext, register_solver

__all__ = ["Bio1Solver"]


class Bio1State(NamedTuple):
    key: jax.Array
    genes: jax.Array       # (N, V) sorted by fitness ascending
    grads: jax.Array       # (N, V)
    fitness: jax.Array     # (N,)
    extinction: jax.Array  # (N,)
    solution: jax.Array    # (V,)


def _triangular_pick(key, mask):
    """Sample an index with the reference's triangular parent-selection
    distribution restricted to ``mask``: among the ``na`` active entries
    (in ascending-fitness order), rank ``j`` has weight ``na − j``
    (reference: linear_int_distribution, utils.h:348-367)."""
    n = mask.shape[0]
    rank = jnp.cumsum(mask) - 1                      # rank among active
    na = jnp.sum(mask)
    w = jnp.where(mask, (na - rank).astype(jnp.float32), 0.0)
    logits = jnp.where(w > 0, jnp.log(w), -jnp.inf)
    return jax.random.categorical(key, logits)


class Bio1Solver(Solver):
    default_islands = 4  # reference: concurrency(), ik_evolution_1.cpp:555

    def __init__(self, ctx: SolverContext, config):
        super().__init__(ctx, config)
        self.N = max(config.population_size, 2)
        self.elites = min(config.elite_count, self.N - 1)
        self.no_wipeout = config.no_wipeout
        self.linear_fitness = config.linear_fitness
        self._build_heuristic_tables()

    # -- HeuristicErrorTree (reference: ik_evolution_1.cpp:50-119) --------
    def _build_heuristic_tables(self):
        ctx = self.ctx
        p = ctx.problem
        model = p.model
        V = ctx.nvars
        active = list(p.active_vars)

        # pose-typed goal instances: (group index, instance, tip slot)
        self.pose_goals = []
        for gi, grp in enumerate(p.primary):
            if grp.goal_type in ("position", "orientation", "pose"):
                for k in range(grp.count):
                    self.pose_goals.append((gi, k, int(grp.tip_slots[k])))
        G = len(self.pose_goals)

        tip_idx = [model.link_index[t] for t in p.tip_links]
        influence = np.zeros((V, G))
        chain_len = np.zeros(G)
        chain_len2 = np.zeros((G, V))
        for g, (_, _, slot) in enumerate(self.pose_goals):
            chain = model.ancestors(tip_idx[slot])[::-1]  # tip → root
            acc = 0.0
            for li in chain:
                vs, vc = int(model.vstart[li]), int(model.vcount[li])
                if vs >= 0:
                    for v in range(vs, vs + vc):
                        if v in active:
                            i = active.index(v)
                            influence[i, g] = 1.0
                            chain_len2[g, i] = acc
                acc += float(np.linalg.norm(model.origin_pos[li]))
            chain_len[g] = acc
        s = influence.sum(axis=1, keepdims=True)
        influence = np.where(s > 0, influence / np.maximum(s, 1), 0.0)

        self.influence = jnp.asarray(influence, p.dtype)       # (V, G)
        self.chain_len = jnp.asarray(chain_len, p.dtype)       # (G,)
        self.chain_len2 = jnp.asarray(chain_len2, p.dtype)     # (G, V)
        av = np.asarray(active)
        self.is_prismatic = jnp.asarray(model.var_is_prismatic[av])
        self.is_revolute = jnp.asarray(model.var_is_revolute[av])

    # -- per-goal frames from problem data --------------------------------
    def _goal_frames(self, data):
        """(G, 3) positions + (G, 4) orientations of the pose-typed goals
        (identity components where the goal does not constrain them —
        reference GoalInfo.frame, problem.cpp:153-176)."""
        p = self.ctx.problem
        pos, quat = [], []
        for gi, k, _ in self.pose_goals:
            gdata = data["primary"][gi]
            grp = p.primary[gi]
            pos.append(
                gdata["position"][k] if "position" in gdata else jnp.zeros(3, p.dtype)
            )
            quat.append(
                gdata["orientation"][k]
                if "orientation" in gdata
                else jnp.asarray([0, 0, 0, 1], p.dtype)
            )
        return jnp.stack(pos), jnp.stack(quat)

    def _heuristic_errors(self, tips, data):
        """Heuristic error per active variable given current tip frames
        (reference: getHeuristicError, ik_evolution_1.cpp:171-236)."""
        gp, gq = self._goal_frames(data)
        slots = np.asarray([s for _, _, s in self.pose_goals])
        tp = tips.pos[..., slots, :]
        tq = tips.quat[..., slots, :]
        pos_dist = jnp.linalg.norm(tp - gp, axis=-1)            # (G,)
        rot_ang = quat_angle_shortest(tq, gq)                   # (G,)
        L = self.chain_len2                                      # (G, V)
        has_len = L > 0
        rev = (
            jnp.where(has_len, 0.5 * (pos_dist[:, None] / jnp.maximum(L, 1e-9)
                                      + rot_ang[:, None]),
                      rot_ang[:, None])
        )
        pris = jnp.where(
            has_len,
            0.5 * (pos_dist[:, None] + rot_ang[:, None] * L),
            pos_dist[:, None],
        )
        per_var = jnp.where(self.is_revolute[None, :], rev,
                            jnp.where(self.is_prismatic[None, :], pris, 0.0))
        return jnp.sum(per_var * self.influence.T, axis=0)       # (V,)

    # -- fitness ----------------------------------------------------------
    def _fitness(self, genes, data, key=None, balanced=True):
        """Standard fitness, or the linear position/rotation mix
        (reference: computeFitness, ik_evolution_1.cpp:253-275).

        ``balanced=False`` + a key draws a fresh uniform position/rotation
        mixing weight per goal — the reference evaluates *offspring* (and
        rerolls / the initial population) with the random weight
        (:250, :384, :457) and uses the balanced 0.5 weight only for the
        exploit probes, wipeout checks, and solution comparisons
        (:285-291, :317-318, :397-408)."""
        ctx = self.ctx
        if not self.linear_fitness:
            return ctx.fitness_exact(genes, data)
        tips = ctx.tips_frame(data["seed_full"], genes)
        gp, gq = self._goal_frames(data)
        slots = np.asarray([s for _, _, s in self.pose_goals])
        tp = tips.pos[..., slots, :]
        tq = tips.quat[..., slots, :]
        pos_dist = jnp.linalg.norm(tp - gp, axis=-1)
        rot_ang = quat_angle_shortest(tq, gq)
        scale = jnp.sqrt(self.chain_len * jnp.linalg.norm(gp, axis=-1)) / math.pi
        tdist = pos_dist / jnp.maximum(scale, 1e-9)
        if balanced or key is None:
            w = 0.5
        else:
            w = jax.random.uniform(key, rot_ang.shape, rot_ang.dtype)
        return jnp.sum(tdist * (1 - w) + rot_ang * w, axis=-1)

    # -- lifecycle --------------------------------------------------------
    def _reroll(self, key, genes):
        """Random restart of one individual (reference: reroll, :241-251):
        uniform in limits, mixed toward mid-range by U(0, 0.1)."""
        p = self.ctx.problem
        k1, k2 = jax.random.split(key)
        u = self.ctx.random_config(k1)
        mid = p.amid
        t = jax.random.uniform(k2, genes.shape, genes.dtype) * 0.1
        return u * (1 - t) + mid * t

    def _extinctions(self, fitness):
        """Rank-scaled extinction factors (reference: computeExtinctions,
        :303-312): ext[i] = (fit[i] + min·(i/(n−1) − 1)) / max."""
        n = self.N
        fmin, fmax = fitness[0], fitness[-1]
        grading = jnp.arange(n, dtype=fitness.dtype) / (n - 1)
        return (fitness + fmin * (grading - 1)) / jnp.where(fmax != 0, fmax, 1.0)

    def _population_from(self, key, seed_genes, data):
        """population[0] = seed/solution, others rerolled; sorted
        (reference: init(), :445-471 — initial fitness uses the RANDOM
        linear mix, computeFitness(genes, false) at :457)."""
        N, V = self.N, self.ctx.nvars
        k_roll, k_fit = jax.random.split(key)
        keys = jax.random.split(k_roll, N)
        rerolled = jax.vmap(lambda k: self._reroll(k, seed_genes))(keys)
        genes = jnp.concatenate([seed_genes[None], rerolled[1:]], axis=0)
        fkeys = jax.random.split(k_fit, N)
        fit = jax.vmap(
            lambda k, g: self._fitness(g, data, key=k, balanced=False)
        )(fkeys, genes)
        order = jnp.argsort(fit)
        genes, fit = genes[order], fit[order]
        grads = jnp.zeros((N, V), genes.dtype)
        return genes, grads, fit, self._extinctions(fit)

    def init(self, key, data, randomize):
        key, k1 = jax.random.split(key)
        seed = data["seed_active"].astype(self.ctx.problem.amin.dtype)
        genes, grads, fit, ext = self._population_from(k1, seed, data)
        return Bio1State(
            key=key, genes=genes, grads=grads, fitness=fit,
            extinction=ext, solution=seed,
        )

    # -- exploit (reference: :387-432) ------------------------------------
    def _exploit(self, key, genes, grads, data):
        ctx = self.ctx
        V = ctx.nvars

        def var_body(carry, inp):
            genes, grads, fsum = carry
            i, k = inp
            k1, k2, k3 = jax.random.split(k, 3)
            tips = ctx.tips_frame(data["seed_full"], genes)
            f0 = self._fitness(genes, data)
            he = self._heuristic_errors(tips, data)[i]
            v0 = genes[i]
            vinc = jnp.clip(v0 + jax.random.uniform(k1) * he,
                            ctx.problem.aclip_min[i], ctx.problem.aclip_max[i])
            vdec = jnp.clip(v0 - jax.random.uniform(k2) * he,
                            ctx.problem.aclip_min[i], ctx.problem.aclip_max[i])
            finc = self._fitness(genes.at[i].set(vinc), data)
            fdec = self._fitness(genes.at[i].set(vdec), data)
            take_inc = (finc < f0) & (finc <= fdec)
            take_dec = (fdec < f0) & (fdec <= finc) & ~take_inc
            newv = jnp.where(take_inc, vinc, jnp.where(take_dec, vdec, v0))
            newg = jnp.where(
                take_inc | take_dec,
                v0 * jax.random.uniform(k3) + newv - v0,
                grads[i],
            )
            fsum = fsum + jnp.where(take_inc, finc, jnp.where(take_dec, fdec, f0))
            return (genes.at[i].set(newv), grads.at[i].set(newg), fsum), None

        keys = jax.random.split(key, V)
        (genes, grads, fsum), _ = jax.lax.scan(
            var_body, (genes, grads, jnp.zeros((), genes.dtype)),
            (jnp.arange(V), keys),
        )
        return genes, grads, fsum / V

    # -- reproduce (reference: :343-385) ----------------------------------
    def _reproduce(self, key, pa_g, pa_gr, pa_ext, pb_g, pb_gr, pb_ext,
                   proto_g, off_gr_prev, data):
        ctx = self.ctx
        V = ctx.nvars
        dtype = pa_g.dtype
        r = jax.random.uniform(key, (9, V), dtype)
        g = pa_g * (1 - r[0]) + pb_g * r[0]
        g = g + pa_gr * r[1] + pb_gr * r[2]
        storage = g
        ext = 0.5 * (pa_ext + pb_ext)
        mut_p = ext * (1.0 - 1.0 / V) + 1.0 / V      # (:332-337)
        mut_s = ctx.problem.aspan * ext              # (:153-158)
        g = g + jnp.where(r[3] < mut_p, (r[4] * 2 - 1) * mut_s, 0.0)
        a = r[5] * (0.5 * (pa_g + pb_g) - g)
        b = r[6] * (proto_g - g)
        g = g + a * (1 - r[7]) + b * r[7]
        g = ctx.clip(g)
        grad = r[8] * off_gr_prev + g - storage
        return g, grad

    # -- evolve (reference: :501-548) --------------------------------------
    def step(self, st: Bio1State, data) -> Bio1State:
        ctx = self.ctx
        N, V, E = self.N, ctx.nvars, self.elites
        key, k_ex, k_ch, k_wp, k_init = jax.random.split(st.key, 5)

        # elites: greedy exploit (vmapped)
        ekeys = jax.random.split(k_ex, E)
        e_genes, e_grads, e_fit = jax.vmap(
            lambda k, g, gr: self._exploit(k, g, gr, data)
        )(ekeys, st.genes[:E], st.grads[:E])

        # children: pool-shrinking reproduction (sequential scan)
        def child_body(carry, inp):
            pool, key = carry
            i, = inp
            key, ka, kb, kp, kr, krr, kf, kf2 = jax.random.split(key, 8)
            ia = _triangular_pick(ka, pool)
            ib = _triangular_pick(kb, pool)
            ip = _triangular_pick(kp, pool)
            cg, cgr = self._reproduce(
                kr,
                st.genes[ia], st.grads[ia], st.extinction[ia],
                st.genes[ib], st.grads[ib], st.extinction[ib],
                st.genes[ip], st.grads[i], data,
            )
            # offspring evaluated with the RANDOM linear mix (reference
            # :384: computeFitness(offspring.genes, false))
            cf = self._fitness(cg, data, key=kf, balanced=False)
            # pool empty → reroll instead (reference :526-533; reroll
            # fitness is also random-mix, :250)
            empty = jnp.sum(pool) == 0
            rg = self._reroll(krr, st.genes[0])
            rf = self._fitness(rg, data, key=kf2, balanced=False)
            cg = jnp.where(empty, rg, cg)
            cgr = jnp.where(empty, jnp.zeros_like(cgr), cgr)
            cf = jnp.where(empty, rf, cf)
            # remove beaten parents from the pool (:518-533)
            beat_a = cf < st.fitness[ia]
            beat_b = cf < st.fitness[ib]
            pool = pool & ~((jnp.arange(N) == ia) & beat_a & ~empty)
            pool = pool & ~((jnp.arange(N) == ib) & beat_b & ~empty)
            return (pool, key), (cg, cgr, cf)

        pool0 = jnp.ones((N,), bool)
        (_, _), (c_genes, c_grads, c_fit) = jax.lax.scan(
            child_body, (pool0, k_ch), (jnp.arange(E, N),)
        )

        genes = jnp.concatenate([e_genes, c_genes], axis=0)
        grads = jnp.concatenate([e_grads, c_grads], axis=0)
        fit = jnp.concatenate([e_fit, c_fit], axis=0)

        order = jnp.argsort(fit)
        genes, grads, fit = genes[order], grads[order], fit[order]
        ext = self._extinctions(fit)

        # solution update with balanced fitness (reference :314-330)
        sol_f = self._fitness(st.solution, data)
        cand_f = self._fitness(genes[0], data)
        improved = cand_f < sol_f
        solution = jnp.where(improved, genes[0], st.solution)

        if self.no_wipeout:
            return Bio1State(key, genes, grads, fit, ext, solution)

        # wipeout check (reference checkWipeout :277-301): restart unless
        # some single-variable probe of the best individual improves
        tips = ctx.tips_frame(data["seed_full"], genes[0])
        he = self._heuristic_errors(tips, data)
        kp1, kp2 = jax.random.split(k_wp)
        du = jax.random.uniform(kp1, (V,), genes.dtype) * he
        dd = jax.random.uniform(kp2, (V,), genes.dtype) * he
        eye = jnp.eye(V, dtype=genes.dtype)
        cands = jnp.concatenate(
            [ctx.clip(genes[0] + eye * du), ctx.clip(genes[0] - eye * dd)], axis=0
        )
        cand_fits = jax.vmap(lambda g: self._fitness(g, data))(cands)
        f_best = self._fitness(genes[0], data)
        stuck = ~jnp.any(cand_fits < f_best)
        do_wipe = stuck & ~improved

        w_genes, w_grads, w_fit, w_ext = self._population_from(
            k_init, solution, data
        )
        genes = jnp.where(do_wipe, w_genes, genes)
        grads = jnp.where(do_wipe, w_grads, grads)
        fit = jnp.where(do_wipe, w_fit, fit)
        ext = jnp.where(do_wipe, w_ext, ext)
        # second tryUpdateSolution after re-init (reference :547)
        cand_f2 = self._fitness(genes[0], data)
        solution = jnp.where(do_wipe & (cand_f2 < sol_f), genes[0], solution)

        return Bio1State(key, genes, grads, fit, ext, solution)

    def solution(self, st: Bio1State, data):
        return st.solution, self.ctx.fitness_exact(st.solution, data)

    def inject(self, st: Bio1State, qa, fitness):
        """Absorb a migrant into the worst population slot (see
        Solver.inject)."""
        return st._replace(
            genes=st.genes.at[-1].set(qa.astype(st.genes.dtype)),
            grads=st.grads.at[-1].set(0.0),
            fitness=st.fitness.at[-1].set(fitness.astype(st.fitness.dtype)),
        )


register_solver("bio1")(lambda ctx, config: Bio1Solver(ctx, config))
