#!/usr/bin/env python
"""Run the REFERENCE bio_ik solvers on the parity target set.

Builds the unmodified reference sources (/root/reference/src) against the
ROS-free stubs in ./stubs, dumps our compiled PR2-arm robot model + the
SAME 64-target set ``tools/parity_rates.py`` uses (same PRNG stream), and
races the reference's own bio2/bio1/gd modes at the reference README's
recommended wall-clock budgets (1/5/20 ms per query,
reference: README.md:74-101).  The emulation runs IKParallel's racing
threads sequentially, granting each island its full per-thread window
(ik_parallel.h:160-190) — if anything slightly favorable to the
reference.  Results land in ``results.json`` and anchor the
reference-vs-ours table in BENCHMARKS.md.

Usage: ``python tools/ref_baseline/run_baseline.py`` (CPU only; no JAX
device needed beyond FK).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

N_TARGETS = int(os.environ.get("PARITY_TARGETS", "64"))
TIP = "r_gripper_tool_frame"
TIMEOUTS_S = (0.001, 0.005, 0.020)
MODES = ("bio2_memetic", "bio2", "bio1", "gd_c_4", "gd_r_4", "jac_4")
DTWIST = 1e-3  # matches tools/parity_rates.py


def dump_spec(m, path):
    """Flat robot spec consumed by the stub RobotModel loader."""
    from bio_ik_tpu.robot.urdf import FLOATING, PLANAR, PRISMATIC, REVOLUTE

    tname = {0: "fixed", REVOLUTE: "revolute", PRISMATIC: "prismatic",
             FLOATING: "floating", PLANAR: "planar"}
    b = m._np_bounds
    unbounded = ~np.isfinite(b["clip_min"])
    lines = [f"root {m.link_names[0]}"]
    mimic_lines = []
    for li in range(1, m.nlinks):
        jt = tname[int(m.jtype[li])]
        p = m.origin_pos[li]
        q = m.origin_quat[li]
        a = m.axis[li]
        parent = m.link_names[int(m.parent[li])]
        jname = m.joint_names[li]
        lines.append(
            f"joint {jname} {jt} {parent} {m.link_names[li]} "
            + " ".join(repr(float(x)) for x in (*p, *q, *a)))
        v0, vc = int(m.vstart[li]), int(m.vcount[li])
        for v in range(v0, v0 + vc) if v0 >= 0 else ():
            lines.append(
                f"var {jname} {m.var_names[v]} {float(b['min'][v])!r} "
                f"{float(b['max'][v])!r} {0 if unbounded[v] else 1} "
                f"{float(b['max_velocity'][v])!r}")
        if v0 >= 0 and vc > 0 and m.mimic_src[v0] >= 0:
            src_li = next(
                l for l in range(m.nlinks)
                if int(m.vstart[l]) == int(m.mimic_src[v0]))
            mimic_lines.append(
                f"mimic {jname} {m.joint_names[src_li]} "
                f"{float(m.mimic_factor[v0])!r} {float(m.mimic_offset[v0])!r}")
    with open(path, "w") as f:
        f.write("\n".join(lines + mimic_lines) + "\n")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from bio_ik_tpu import RobotModel, asset_path
    from bio_ik_tpu.kinematics import make_fk

    m = RobotModel.from_urdf_file(asset_path("pr2_arm.urdf"))
    fk = jax.jit(make_fk(m, [TIP]))

    # same stream as tools/parity_rates.py
    rng = np.random.default_rng(42)
    b = m._np_bounds
    qg = rng.uniform(b["min"], b["max"], size=(N_TARGETS, m.nvars)).astype(
        np.float32)
    tg = fk(jnp.asarray(qg))
    pos = np.asarray(tg.pos)[:, 0]
    quat = np.asarray(tg.quat)[:, 0]

    spec = os.path.join(HERE, "robot.spec")
    targets = os.path.join(HERE, "targets.txt")
    dump_spec(m, spec)
    seed = np.asarray(m.neutral_q(), dtype=np.float64)
    with open(targets, "w") as f:
        f.write("seed " + " ".join(repr(float(v)) for v in seed) + "\n")
        for i in range(N_TARGETS):
            f.write(" ".join(repr(float(v)) for v in pos[i]) + " " +
                    " ".join(repr(float(v)) for v in quat[i]) + "\n")

    driver = os.path.join(HERE, "build", "ref_driver")
    if not os.path.exists(driver):
        subprocess.run(["bash", os.path.join(HERE, "build.sh")], check=True)

    # FK cross-check: reference FK vs ours on the target configurations
    qfile = os.path.join(HERE, "fkcheck.txt")
    with open(qfile, "w") as f:
        f.write("seed " + " ".join(repr(float(v)) for v in seed) + "\n")
        for i in range(N_TARGETS):
            f.write(" ".join(repr(float(v)) for v in qg[i]) + "\n")
    out = subprocess.run(
        [driver, spec, qfile, "fkcheck", "0", "1", "0", TIP],
        capture_output=True, text=True, check=True)
    ref_fk = np.array([[float(x) for x in ln.split()]
                       for ln in out.stdout.strip().splitlines()])
    fk_err = np.linalg.norm(ref_fk[:, :3] - pos, axis=-1).max()
    print(json.dumps({"fk_crosscheck_max_pos_err_m": float(fk_err)}),
          flush=True)
    assert fk_err < 1e-5, "reference-stub FK disagrees with bio_ik_tpu FK"

    results = {"n_targets": N_TARGETS, "dtwist": DTWIST, "rows": []}
    for mode in MODES:
        for timeout_s in TIMEOUTS_S:
            out = subprocess.run(
                [driver, spec, targets, mode, repr(timeout_s), "0",
                 repr(DTWIST), TIP],
                capture_output=True, text=True, check=True)
            row = json.loads(out.stdout.strip().splitlines()[-1])
            results["rows"].append(row)
            print(json.dumps(row), flush=True)

    with open(os.path.join(HERE, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"wrote": os.path.join(HERE, "results.json")}),
          flush=True)


if __name__ == "__main__":
    main()
