"""bio2 memetic-evolutionary solver family (the reference default).

TPU-native counterpart of the reference's ``IKEvolution2``
(reference: src/ik_evolution_2.cpp:45-658; registered modes ``bio2``,
``bio2_memetic``, ``bio2_memetic_l`` at :652-654).

Algorithm per island per step (reference step(), ik_evolution_2.cpp:328-646):
two species, each running

  1. linearize tip frames at the species' best individual
     (applyConfiguration + initializeMutationApproximator, :341-346),
  2. 8 generations (16 if non-memetic) of reproduce → pre-select →
     approximate-FK fitness → select-2 (:349-432),
  3. a memetic phase of 8 forward-difference gradient + 3-point line-search
     iterations on the approximated fitness (:436-600, 'q' quadratic /
     'l' linear step),
  4. exact-FK species fitness, species sort, wipeout of stagnant non-best
     species, incumbent solution update (:604-645).

TPU mapping: species and children are leading array axes (the per-child
scalar loops of reproduce(:242-326) become one ``(16, V)`` vectorized
update; the 18-phenotype approximation is one einsum); the per-variable
memetic gradient probes become one ``(V, T, 7)`` batched evaluation; the
early-break accept loops become masked ``fori_loop`` carries.  The
reference's precomputed 8M-entry gaussian ring buffers (ik_base.h:49-126)
become fresh threefry draws.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kinematics.approx import apply_deltas
from ..math.quat import quat_normalize_fast
from .base import Solver, SolverContext, register_solver

__all__ = ["Bio2Solver"]

_SPECIES = 2            # reference: species.resize(2), ik_evolution_2.cpp:141
_PARENTS = 2            # population_size = 2, :137
_CHILDREN = 16          # child_count = 16, :138
_MEMETIC_ITERS = 8      # :453
_WIPEOUT_P = 0.1        # :622


class Bio2State(NamedTuple):
    key: jax.Array
    genes: jax.Array            # (S, P, V)
    grads: jax.Array            # (S, P, V) momentum "gradients"
    species_fitness: jax.Array  # (S,) exact fitness of species best
    solution: jax.Array         # (V,) incumbent best genes
    solution_fitness: jax.Array


class Bio2Solver(Solver):
    """``memetic`` ∈ {'', 'q', 'l'} selects bio2 / bio2_memetic /
    bio2_memetic_l (reference template parameter, ik_evolution_2.cpp:45)."""

    default_islands = 4  # reference: concurrency(), ik_evolution_2.cpp:649

    def __init__(self, ctx: SolverContext, config, memetic="q"):
        super().__init__(ctx, config)
        self.memetic = memetic
        self.generations = 8 if memetic else 16  # reference :349-350
        # quaternion gene blocks of active floating joints, renormalized
        # after mutation (reference :117-126, :320-324)
        from ..robot.urdf import FLOATING

        model = ctx.problem.model
        self.quat_slices = []
        active = list(ctx.problem.active_vars)
        for li in range(model.nlinks):
            if model.jtype[li] == FLOATING and model.vstart[li] >= 0:
                qv = int(model.vstart[li]) + 3
                if qv in active and all((qv + k) in active for k in range(4)):
                    s = active.index(qv)
                    if active[s : s + 4] == [qv, qv + 1, qv + 2, qv + 3]:
                        self.quat_slices.append(s)

    # ------------------------------------------------------------------
    def init(self, key, data, randomize):
        ctx = self.ctx
        V = ctx.nvars
        dtype = ctx.problem.amin.dtype
        # all islands start from the seed (reference `if(1)` branch,
        # ik_evolution_2.cpp:155-166) — `randomize` is intentionally unused
        seed = data["seed_active"].astype(dtype)
        genes = jnp.broadcast_to(seed, (_SPECIES, _PARENTS, V))
        grads = jnp.zeros((_SPECIES, _PARENTS, V), dtype)
        f0 = ctx.fitness_exact(seed, data)
        return Bio2State(
            key=key,
            genes=genes,
            grads=grads,
            species_fitness=jnp.full((_SPECIES,), jnp.inf, dtype),
            solution=seed,
            solution_fitness=f0,
        )

    # ------------------------------------------------------------------
    def _reproduce(self, key, genes, grads, x0, tips0, deltas, data):
        """One generation: mutate 16 children from parent 0, pre-select by
        secondary fitness, evaluate approximate primary fitness, keep the
        best 2 of {parents, children} (reference: ik_evolution_2.cpp:242-431).

        ``genes/grads (P, V)``; returns updated ``(genes, grads)``.
        """
        ctx, p = self.ctx, self.ctx.problem
        V = ctx.nvars
        dtype = genes.dtype
        k_rate, k_noise, k_keep = jax.random.split(key, 3)

        child_global = jnp.arange(2, 2 + _CHILDREN)  # reference child_index
        # mutation_rate = 2^k / 2^23, k ∈ [0,16) (reference :265)
        k_exp = jax.random.randint(k_rate, (_CHILDREN,), 0, 16)
        mutation_rate = jnp.exp2(k_exp.astype(dtype) - 23.0)
        fmix = jnp.where(child_global % 2 == 0, 0.2, 0.0).astype(dtype)[:, None]
        gradient_factor = (child_global % 3).astype(dtype)[:, None]

        r = jax.random.normal(k_noise, (_CHILDREN, V), dtype)
        span = p.aspan
        parent_genes, parent2_genes = genes[0], genes[1]
        parent_grad = grads[0] * (1 - fmix) + grads[1] * fmix   # mix(:294)
        gene = parent_genes + r * (mutation_rate[:, None] * span)
        gene = gene + parent_grad * gradient_factor
        gene = jnp.clip(gene, p.aclip_min, p.aclip_max)
        child_grads = parent_grad * 0.7 + (gene - parent_genes) * 0.3  # mix(:299)
        for s in self.quat_slices:
            gene = gene.at[:, s : s + 4].set(
                quat_normalize_fast(gene[:, s : s + 4])
            )

        # candidate pool: parents first (kept alive, reference :381-388)
        pool_genes = jnp.concatenate([genes, gene], axis=0)        # (2+16, V)
        pool_grads = jnp.concatenate([grads, child_grads], axis=0)

        # pre-selection by secondary fitness with a random keep-prefix
        # (reference :366-378: children sorted by secondary fitness, a
        # random count of the best kept)
        if p.has_secondary:
            fsec = p.fitness_secondary(gene, data)                  # (16,)
            order_rank = jnp.argsort(jnp.argsort(fsec))             # rank per child
            keep = jax.random.randint(k_keep, (), 1, _CHILDREN)     # ∈ [1,16)
            child_active = order_rank < keep
        else:
            child_active = jnp.ones((_CHILDREN,), bool)
        active_mask = jnp.concatenate([jnp.ones((_PARENTS,), bool), child_active])

        # approximate phenotypes + primary fitness (reference :391-407);
        # deltas are measured from the linearization point x0, not the
        # current parent (reference: p_variables in computeApproximateMutations)
        dq = pool_genes - x0                                        # (18, V)
        phen = apply_deltas(tips0, deltas, dq)                      # (18, T, 7)
        fit = p.fitness(phen, pool_genes, data)                     # (18,)
        fit = jnp.where(active_mask, fit, jnp.inf)

        # selection: best 2 (reference selection sort :410-431)
        _, top = jax.lax.top_k(-fit, _PARENTS)
        return pool_genes[top], pool_grads[top]

    # ------------------------------------------------------------------
    def _memetic(self, key, genes0, x0, tips0, deltas, data):
        """Gradient-descent local search on the approximated fitness
        (reference: ik_evolution_2.cpp:439-569).  ``x0`` is the
        linearization point of ``tips0``/``deltas``."""
        ctx, p = self.ctx, self.ctx.problem
        dtype = genes0.dtype
        # The reference estimates the gradient by per-variable forward
        # differences with dp = ±1e-7 (:450-474) — far below float32
        # resolution.  The approximate fitness is a small closed-form
        # function of the genes, so we take its exact gradient with
        # jax.grad instead (cheaper than V probes and noise-free), then
        # keep the reference's L1 normalization and 3-point line search
        # verbatim with a f32-resolvable probe length h.
        h = jnp.asarray(1e-3, dtype)

        def fitness_at(x):
            phen = tips0 + jnp.einsum("tvd,v->td", deltas, x - x0)
            return p.fitness(phen, x, data), phen

        def combined_at(x):
            f, phen = fitness_at(x)
            return f + p.fitness_secondary(x, data)

        grad_fn = jax.value_and_grad(combined_at)

        if self.memetic == "o":
            # L-BFGS memetic phase (reference: bio2_memetic_lbfgs,
            # ik_evolution_2.cpp:571-600 — cppoptlib L-BFGS on the
            # approximated fitness, 4 inner iterations per invocation)
            import optax

            opt = optax.lbfgs(memory_size=10)

            def obj(x):
                return combined_at(ctx.clip(x))

            def lbfgs_body(_, carry):
                x, opt_state = carry
                value, grad = optax.value_and_grad_from_state(obj)(
                    x, state=opt_state
                )
                updates, opt_state = opt.update(
                    grad, opt_state, x, value=value, grad=grad, value_fn=obj
                )
                x = optax.apply_updates(x, updates)
                return x, opt_state

            x, _ = jax.lax.fori_loop(
                0, _MEMETIC_ITERS, lbfgs_body, (genes0, opt.init(genes0))
            )
            x = ctx.clip(x)
            x = jnp.where(jnp.all(jnp.isfinite(x)), x, genes0)
            # keep the reference's keep-if-better contract (:604-614 via
            # species fitness): never return a worse individual
            better = combined_at(x) < combined_at(genes0)
            return jnp.where(better, x, genes0)

        def body(_, carry):
            genes, done = carry
            f2p, _ = fitness_at(genes)
            fa, grad = grad_fn(genes)

            # L1 normalization to probe length h (reference :477-482 with
            # g_fd ≈ grad·dp: g ← g·dp/(dp²+Σ|g|) ≈ ĝ_L1·dp)
            g = grad * (h / (jnp.sum(jnp.abs(grad)) + jnp.asarray(1e-12, dtype)))

            # 3-point line probe (reference :485-495)
            f1 = combined_at(genes - g)
            f2 = fa
            f3 = combined_at(genes + g)

            if self.memetic == "q":
                # quadratic-fit step (reference :498-516)
                v1, v2 = f2 - f1, f3 - f2
                v = (v1 + v2) * 0.5
                a = v1 - v2
                step = v / a
                step = jnp.where(jnp.isfinite(step), step, 0.0)
                cand = ctx.clip(genes + g * step)
            else:
                # linear step (reference :545-556)
                cost_diff = (f3 - f1) * 0.5
                step = f2 / cost_diff
                step = jnp.where(jnp.isfinite(step), step, 0.0)
                cand = ctx.clip(genes - g * step)

            f4p, _ = fitness_at(cand)
            accept = (f4p < f2p) & ~done
            genes = jnp.where(accept, cand, genes)
            done = done | ~accept  # break on first non-improvement (:535-537)
            return genes, done

        genes, _ = jax.lax.fori_loop(
            0, _MEMETIC_ITERS, body, (genes0, jnp.zeros((), bool))
        )
        return genes

    # ------------------------------------------------------------------
    def step(self, st: Bio2State, data) -> Bio2State:
        ctx, p = self.ctx, self.ctx.problem
        key, k_species, k_wipe_p, k_wipe_g = jax.random.split(st.key, 4)

        def species_step(key, genes, grads):
            """Evolution + memetic for one species (vmapped over species)."""
            # linearization at the species best (reference :341-346)
            x0 = genes[0]
            qfull = ctx.qfull(data["seed_full"], x0)
            tips0, deltas = ctx.linearize(qfull)

            def gen_body(i, carry):
                genes, grads, key = carry
                key, kg = jax.random.split(key)
                genes, grads = self._reproduce(
                    kg, genes, grads, x0, tips0, deltas, data
                )
                return genes, grads, key

            genes, grads, key = jax.lax.fori_loop(
                0, self.generations, gen_body, (genes, grads, key)
            )

            if self.memetic:
                key, km = jax.random.split(key)
                best = self._memetic(km, genes[0], x0, tips0, deltas, data)
                genes = genes.at[0].set(best)

            # exact species fitness (reference :608-614)
            f = ctx.fitness_exact(genes[0], data)
            return genes, grads, f

        skeys = jax.random.split(k_species, _SPECIES)
        genes, grads, sfit = jax.vmap(species_step)(skeys, st.genes, st.grads)

        improved = sfit != st.species_fitness                        # (:612)

        # sort species by fitness (reference :617)
        order = jnp.argsort(sfit)
        genes, grads = genes[order], grads[order]
        sfit, improved = sfit[order], improved[order]

        # wipeout of stagnant non-best species (reference :620-637)
        wipe_rand = jax.random.uniform(k_wipe_p, (_SPECIES,)) < _WIPEOUT_P
        wipe = (wipe_rand | ~improved) & (jnp.arange(_SPECIES) > 0)
        rand_genes = ctx.random_config(k_wipe_g, (_SPECIES,))        # (S, V)
        new_first = jnp.where(wipe[:, None], rand_genes, genes[:, 0])
        genes = jnp.where(
            wipe[:, None, None], jnp.broadcast_to(new_first[:, None], genes.shape), genes
        )
        grads = jnp.where(wipe[:, None, None], 0.0, grads)

        # incumbent update (reference :640-644)
        better = sfit[0] < st.solution_fitness
        return Bio2State(
            key=key,
            genes=genes,
            grads=grads,
            species_fitness=sfit,
            solution=jnp.where(better, genes[0, 0], st.solution),
            solution_fitness=jnp.where(better, sfit[0], st.solution_fitness),
        )

    def solution(self, st: Bio2State, data):
        return st.solution, st.solution_fitness

    def inject(self, st: Bio2State, qa, fitness):
        """Absorb a migrant: it replaces the worst species' second parent
        (preserving each species' local best for diversity) and updates
        the incumbent if better (see Solver.inject)."""
        genes = st.genes.at[_SPECIES - 1, 1].set(qa.astype(st.genes.dtype))
        better = fitness < st.solution_fitness
        return st._replace(
            genes=genes,
            solution=jnp.where(better, qa, st.solution),
            solution_fitness=jnp.minimum(fitness, st.solution_fitness),
        )


register_solver("bio2")(lambda ctx, config: Bio2Solver(ctx, config, memetic=""))
register_solver("bio2_memetic")(lambda ctx, config: Bio2Solver(ctx, config, memetic="q"))
register_solver("bio2_memetic_l")(lambda ctx, config: Bio2Solver(ctx, config, memetic="l"))
register_solver("bio2_memetic_lbfgs")(lambda ctx, config: Bio2Solver(ctx, config, memetic="o"))
