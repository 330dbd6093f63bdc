#!/usr/bin/env python
"""Statistical success-rate parity on a fixed PR2 target set
(SURVEY §7 "validated statistically").

The reference races every solver mode for the SAME wall-clock timeout
(reference: src/ik_parallel.h:160-210) and its README claims the default
``bio2_memetic`` achieves "higher success rates" and "improved
precision" over the non-memetic modes and bio1 (reference:
README.md:10-13).  This harness verifies that claim for this
implementation with honestly matched budgets:

* **Table A — wall-time-matched.**  Per-mode step budgets derived from
  per-step wall times MEASURED on this chip by
  ``tools/bench_step_times.py`` (run it first; its ``step_times.json``
  is loaded here, with the 2026-08 v5e measurements as fallback).  The
  base budget is ``bio2_memetic`` at 16 steps; every other mode gets
  ``round(16 · t_memetic / t_mode)`` steps (min 1) — the step count its
  measured per-step cost affords in the same wall time, exactly the
  reference's racing rule.  Note a *non*-memetic bio2 step (16
  generations) measures ~1.24× the cost of a memetic step (8
  generations + 8 line-search probes), so bio2 gets FEWER steps than
  bio2_memetic, not more.

* **Table B — budget convergence.**  Slow-per-step modes (bio1 full-FK
  generations, jac least-squares) afford ≤1 step in Table A's window;
  Table B shows they remain usable solvers when given generous budgets
  (the algorithmic-quality view, decoupled from per-step cost).

Checked expectations (printed in the summary line):
  * bio2_memetic ≥ bio2 in success AND ≤ in median error at matched
    wall time (the reference's headline claim);
  * bio2_memetic beats every other mode in Table A;
  * bio1 and gd_c success rates increase with budget in Table B.

Usage: ``python tools/parity_rates.py`` (on the TPU chip).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The gd rows run in float64 (the reference's precision): their 2-point
# numeric gradient drowns in f32 FK roundoff near convergence — measured
# 0.594 (f32) vs 0.922 (f64, = the reference's own success) at 1024
# steps.  x64 must NOT be enabled in the main process (it breaks Pallas
# kernel tracing for the fused bio2 rows), so the f64 rows run in a
# child process (``--gd64-child``) with x64 on.
if "--gd64-child" in sys.argv:
    jax.config.update("jax_enable_x64", True)
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

N_TARGETS = int(os.environ.get("PARITY_TARGETS", "64"))
TIP = "r_gripper_tool_frame"
BASE_MODE, BASE_STEPS = "bio2_memetic", 16

# fallback per-step wall times [ms] (B=4096, one v5e chip, 2026-08-22,
# tools/bench_step_times.py) — overridden by tools/step_times.json
_FALLBACK_STEP_MS = {
    "bio2_memetic": 1.0536, "bio2": 1.3011, "bio2_memetic_l": 0.9768,
    "bio1": 19.7785, "gd_c_4": 0.3837, "gd_r_4": 0.3687, "jac_4": 228.3277,
}


def load_step_times():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "step_times.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        return {k: v["per_step_ms"] for k, v in data["modes"].items()}, path
    return dict(_FALLBACK_STEP_MS), "(fallback constants)"


def run_mode(m, fk, tg, mode, max_steps, extra=()):
    cfg = SolverConfig(mode=mode, max_steps=max_steps, dtwist=1e-3,
                       steps_per_check=max_steps, **dict(extra))
    s = IKSolver(m, [G.PoseGoal(link=TIP)], cfg)
    B = tg.pos.shape[0]
    data0 = s.make_data(jnp.asarray(m.neutral_q()))
    data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data0)
    data["primary"][0]["position"] = tg.pos
    data["primary"][0]["orientation"] = tg.quat
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    res = s.solve_batch(keys, data)
    t2 = fk(res.q)
    perr = np.linalg.norm(
        np.asarray(t2.pos)[:, 0] - np.asarray(tg.pos)[:, 0], axis=-1)
    return {
        "mode": mode,
        "max_steps": max_steps,
        "success_rate": round(float(np.asarray(res.success).mean()), 4),
        "median_pos_err_m": float(np.median(perr)),
        "frac_err<1mm": round(float((perr < 1e-3).mean()), 4),
        "n_targets": int(B),
    }


def make_targets():
    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    fk = jax.jit(make_fk(m, [TIP]))
    rng = np.random.default_rng(42)
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"], size=(N_TARGETS, m.nvars)).astype(
        np.float32)
    tg = fk(jnp.asarray(qg.astype(np.float32)))
    return m, fk, tg


def gd64_child():
    """Run the float64 gd rows under x64 (spawned by main)."""
    m, fk, tg = make_targets()
    for spec in json.loads(sys.argv[sys.argv.index("--gd64-child") + 1]):
        r = run_mode(m, fk, tg, spec["mode"], spec["steps"],
                     (("dtype", "float64"),))
        print("GD64 " + json.dumps(r), flush=True)


def main():
    if "--gd64-child" in sys.argv:
        gd64_child()
        return
    m, fk, tg = make_targets()

    step_ms, src = load_step_times()
    base_ms = step_ms[BASE_MODE]
    print(json.dumps({"step_times_source": src, "per_step_ms": step_ms}),
          flush=True)

    # ---- Table A: wall-time-matched budgets --------------------------
    rows = {}
    for mode in ["bio2_memetic", "bio2", "bio2_memetic_l", "bio1",
                 "gd_c_4", "gd_r_4", "jac_4"]:
        steps = max(1, round(BASE_STEPS * base_ms / step_ms[mode]))
        r = run_mode(m, fk, tg, mode, steps)
        r["table"] = "A_wall_matched"
        rows[mode] = r
        print(json.dumps({"config": f"pr2_parity_{N_TARGETS}", **r,
                          "device": str(jax.devices()[0])}), flush=True)

    # ---- Table B: budget convergence for slow-per-step modes ---------
    rows_b = {}
    for mode, steps, extra in [
        ("bio1", 64, ()),
        ("bio1", 256, ()),
        # 1024 generations reproduces the reference's own 20 ms bio1
        # success EXACTLY (0.9219 vs its 0.922 on this target set — see
        # the reference-anchor table in BENCHMARKS.md) at 150× lower
        # median error
        ("bio1", 1024, ()),
        ("bio1", 64, (("linear_fitness", True),)),
        ("jac_4", 32, ()),
    ]:
        r = run_mode(m, fk, tg, mode, steps, extra)
        r["table"] = "B_budget_convergence"
        label = r["mode"] + (
            "+" + ",".join(f"{k}={v}" for k, v in extra) if extra else "")
        rows_b[(label, steps)] = r
        print(json.dumps({"config": f"pr2_parity_{N_TARGETS}", **r,
                          "mode": label}), flush=True)

    # gd rows in float64 via the x64 child process (see module docstring)
    import subprocess

    gd_specs = [{"mode": "gd_c_4", "steps": 256},
                {"mode": "gd_c_4", "steps": 1024},
                {"mode": "gd_r_4", "steps": 1024}]
    child = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--gd64-child",
         json.dumps(gd_specs)],
        capture_output=True, text=True)
    if child.returncode != 0:
        sys.stderr.write(child.stderr[-2000:])
        raise RuntimeError("gd64 child failed")
    for ln in child.stdout.splitlines():
        if not ln.startswith("GD64 "):
            continue
        r = json.loads(ln[5:])
        r["table"] = "B_budget_convergence"
        label = r["mode"] + "+dtype=float64"
        rows_b[(label, r["max_steps"])] = r
        print(json.dumps({"config": f"pr2_parity_{N_TARGETS}", **r,
                          "mode": label}), flush=True)

    mem, b2 = rows["bio2_memetic"], rows["bio2"]
    memetic_wins = (
        mem["success_rate"] >= b2["success_rate"]
        and mem["median_pos_err_m"] <= b2["median_pos_err_m"]
    )
    beats_all = all(
        mem["success_rate"] >= r["success_rate"]
        for k, r in rows.items() if k != "bio2_memetic"
    )
    gd_label = "gd_c_4+dtype=float64"
    converges = (
        rows_b[("bio1", 256)]["success_rate"]
        > rows_b[("bio1", 64)]["success_rate"]
        and rows_b[(gd_label, 1024)]["success_rate"]
        >= rows_b[(gd_label, 256)]["success_rate"]
    )
    print(json.dumps({
        "config": f"pr2_parity_{N_TARGETS}_summary",
        "memetic_beats_bio2_wall_matched": bool(memetic_wins),
        "memetic_beats_all_wall_matched": bool(beats_all),
        "slow_modes_converge_with_budget": bool(converges),
    }), flush=True)


if __name__ == "__main__":
    main()
