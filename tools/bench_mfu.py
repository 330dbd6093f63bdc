#!/usr/bin/env python
"""Arithmetic-efficiency (MFU-style) data point for the megastep kernel.

Three measurements on the chip:
  1. an empirical VPU roofline — a synthetic Pallas kernel of pure
     dependent FMA chains on VMEM-resident f32 tiles (the best case any
     elementwise kernel can hit on the vector unit);
  2. the megastep kernel's useful-FLOP throughput — algorithmic FLOPs
     from its own CostEstimate model (pl.CostEstimate in
     kernels/bio2_megastep.py) over measured marginal kernel time
     (difference between 4-chunk and 1-chunk solves, removing setup and
     acceptance overhead);
  3. their ratio — the fraction of the attainable vector-unit peak the
     solver's useful arithmetic sustains.

The megastep is VPU-bound by construction: its per-lane work is scalar
FMA accumulation across gene rows (no contraction large enough to shape
onto the MXU — V·K·7 ≈ 50 terms), plus selection/bookkeeping and PRNG
whose ops are NOT counted as useful FLOPs.  The ratio therefore
understates hardware utilization; it measures how much of the machine's
elementwise peak goes into the IK math itself.

Usage: ``python tools/bench_mfu.py`` (on the TPU chip).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import bio_ik_tpu.goals as G
from bio_ik_tpu import RobotModel, asset_path
from bio_ik_tpu.api import IKSolver
from bio_ik_tpu.config import SolverConfig
from bio_ik_tpu.kinematics import make_fk


def vpu_peak_flops():
    """Empirical sustained elementwise peak: 8 independent CHAOTIC
    logistic recurrence chains (x <- 3.9*x*(1-x)) under a fori_loop on
    (256, 512) f32 VMEM tiles, tiny output tile, synchronized by VALUE
    FETCH (``block_until_ready`` through the tunneled backend does not
    reliably wait for device completion — fetching a value does).  The
    chaotic map is provably executed (verified bit-exact against numpy)
    and cannot be collapsed; an affine x*a+b chain strength-reduces to
    one FMA and a CONVERGING quadratic map also collapses, both
    reporting impossible >1000 TFLOP/s.  mul + fma = 3 FLOPs per
    iteration per lane; the rate is the SLOPE between two iteration
    counts, cancelling dispatch/transfer overhead.  Measured
    ~1.16 TFLOP/s on v5e — the attainable dependent-chain vector
    throughput any elementwise kernel competes against."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, W, CH, G_ = 256, 512, 8, 16

    def timed(T):
        def kernel(x_ref, o_ref):
            xs = tuple(x_ref[:] * jnp.float32(1.0 - 0.01 * i)
                       for i in range(CH))

            def step(_, xs):
                return tuple(jnp.float32(3.9) * x * (jnp.float32(1.0) - x)
                             for x in xs)

            xs = jax.lax.fori_loop(0, T, step, xs)
            acc = xs[0]
            for x in xs[1:]:
                acc = acc + x
            o_ref[:] = acc

        x = jnp.asarray(np.random.default_rng(0).uniform(
            0.2, 0.8, size=(R, W * G_)).astype(np.float32))
        fn = jax.jit(lambda x: pl.pallas_call(
            kernel,
            grid=(G_,),
            in_specs=[pl.BlockSpec((R, W), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            # every block writes the same small tile: sync is real,
            # result transfer is ~0.5 MB
            out_specs=pl.BlockSpec((R, W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        )(x))
        float(np.asarray(fn(x))[0, 0])
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(fn(x))[0, 0])   # value fetch = real sync
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(1024), timed(4096)
    flops = 3 * R * W * G_ * CH * (4096 - 1024)
    return flops / max(t_hi - t_lo, 1e-9)


def megastep_flops_per_step_lane(engine):
    """Useful algorithmic FLOPs per solver step per lane, from the same
    model as the kernel's CostEstimate (bio2_megastep.py)."""
    sp = engine.sp
    evals = sp.gens * (sp.C + 2) + (sp.mem_iters * 4 if sp.memetic else 0)
    return evals * (sp.K * 7 * sp.V * 2 + sp.K * 30) + 900


def measure(mode_steps, m, tg, B):
    cfg = SolverConfig(mode="bio2_memetic", dtwist=1e-3,
                       max_steps=mode_steps, steps_per_check=16)
    s = IKSolver(m, [G.PoseGoal(link="r_gripper_tool_frame")], cfg)
    assert s.engine is not None and s.engine.fullstep
    data0 = s.make_data(jnp.asarray(m.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    float(np.asarray(s.solve_batch(keys, data).fitness)[0])
    K = 8
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for r in range(K):
            res = s.solve_batch(keys, data)
        float(np.asarray(res.fitness)[0])   # value fetch = real sync
        times.append((time.perf_counter() - t0) / K)
    return min(times), s.engine


def main():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    fk = jax.jit(make_fk(m, ["r_gripper_tool_frame"]))
    rng = np.random.default_rng(0)
    b = m._np_bounds
    B = 32768
    qg = rng.uniform(b["min"], b["max"], size=(B, m.nvars)).astype(np.float32)
    tg = fk(jnp.asarray(qg))

    peak = vpu_peak_flops()

    # marginal chunk cost: 64-step solve (4 megastep launches) minus
    # 16-step solve (1 launch) = 3 × (16-step kernel + acceptance eval)
    t16, eng = measure(16, m, tg, B)
    t64, _ = measure(64, m, tg, B)
    chunk = (t64 - t16) / 3.0
    lanes = B * eng.islands * 2
    fl = megastep_flops_per_step_lane(eng) * 16 * lanes
    ach = fl / chunk
    print(json.dumps({
        "config": "megastep_mfu_pr2",
        "vpu_fma_peak_tflops": round(peak / 1e12, 3),
        "kernel_chunk_ms": round(chunk * 1e3, 3),
        "useful_flops_per_chunk": fl,
        "achieved_useful_tflops": round(ach / 1e12, 3),
        "fraction_of_vpu_peak": round(ach / peak, 4),
        "lanes": lanes,
        "note": "chunk includes the XLA acceptance eval; PRNG/selection "
                "ops excluded from useful FLOPs — ratio is a lower bound",
        "device": str(jax.devices()[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
