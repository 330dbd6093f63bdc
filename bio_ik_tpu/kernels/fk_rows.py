"""Row-level exact FK + linearizer generator for in-kernel use.

Generates, per robot × tip set × active-variable set, a pure function
over ``(1, N)`` lane-row arrays that computes exact link frames, tip
frames, and the per-(tip, variable) delta-frame linearization — the
in-kernel counterpart of :mod:`bio_ik_tpu.kinematics.fk` /
``kinematics.approx`` (reference: src/forward_kinematics.h:217-360 tree
FK and :553-930 Jacobian→delta-frame build).

Representation: every frame component is either a Python ``float``
(trace-time constant) or a ``(1, N)`` array row.  Arithmetic uses plain
operators, so constant subtrees (fixed-joint prefixes, zero quaternion
components, the reference's sparse skip masks forward_kinematics.h:
907-929) fold away at trace time and never reach the kernel.

Supported joint types: FIXED, REVOLUTE, PRISMATIC (+ mimic of an active
1-DOF joint).  Floating/planar chains fall back to the XLA path
(engine.supports_fullstep).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from ..robot.model import RobotModel
from ..robot.urdf import FIXED, PRISMATIC, REVOLUTE

__all__ = ["FkRows", "supports_fullstep_chain"]


def _qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    )


def _qrot(q, v):
    # two-cross-product form (reference: quat_mul_vec, frame.h:108-149)
    qx, qy, qz, qw = q
    vx, vy, vz = v
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    return (
        vx + qw * tx + (qy * tz - qz * ty),
        vy + qw * ty + (qz * tx - qx * tz),
        vz + qw * tz + (qx * ty - qy * tx),
    )


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def supports_fullstep_chain(model: RobotModel, tip_idx: Sequence[int]) -> bool:
    """True when every joint on the tip chains is FIXED/REVOLUTE/PRISMATIC."""
    for li in model.link_schedule(tip_idx):
        if model.parent[li] < 0:
            continue
        if int(model.jtype[li]) not in (FIXED, REVOLUTE, PRISMATIC):
            return False
    return True


class FkRows:
    """Generated row-level FK for one (model, tips, active set).

    ``fixed_vars`` lists the global variable indices whose values must be
    provided as extra rows (chain joints that are neither active nor
    mimic-of-active); callers pass them in chain order.
    """

    def __init__(self, model: RobotModel, tip_links: Sequence[str],
                 active_vars: Sequence[int]):
        self.model = model
        tip_idx = [model.link_index[t] for t in tip_links]
        if not supports_fullstep_chain(model, tip_idx):
            raise ValueError("chain has floating/planar joints")
        self.schedule = model.link_schedule(tip_idx)
        self.tip_idx = tip_idx
        active = list(active_vars)
        self.active = active
        aslot = {v: i for i, v in enumerate(active)}

        # per-link variable source: ("const",) | ("active", slot, f, off)
        # | ("fixed", fixed_row_index, f, off)
        self.fixed_vars: List[int] = []
        self.var_src = {}
        for li in self.schedule:
            if model.parent[li] < 0 or model.jtype[li] == FIXED:
                continue
            v = int(model.vstart[li])
            f, off = 1.0, 0.0
            if model.mimic_src[v] >= 0:
                f = float(model.mimic_factor[v])
                off = float(model.mimic_offset[v])
                v = int(model.mimic_src[v])
            if v in aslot:
                self.var_src[li] = ("active", aslot[v], f, off)
            else:
                if v not in self.fixed_vars:
                    self.fixed_vars.append(v)
                self.var_src[li] = ("fixed", self.fixed_vars.index(v), f, off)

        # moving joints that displace any tip → (link, active slot, factor)
        tip_anc = [set(model.ancestors(t)) for t in tip_idx]
        self.moving = []
        for li in self.schedule:
            src = self.var_src.get(li)
            if src is None or src[0] != "active":
                continue
            if any(li in anc for anc in tip_anc):
                self.moving.append((li, src[1], src[2]))
        self.tip_anc = tip_anc

    # ------------------------------------------------------------------
    def frames(self, xrows, fixed_rows):
        """Exact global frames for every schedule link.

        ``xrows``: list of V active-variable rows; ``fixed_rows``: rows
        for :attr:`fixed_vars`.  Returns ``{link: (pos3, quat4)}`` with
        float/row components.
        """
        m = self.model
        out = {}
        for li in self.schedule:
            if m.parent[li] < 0:
                out[li] = ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0, 1.0))
                continue
            ppos, pquat = out[int(m.parent[li])]
            opos = tuple(float(c) for c in m.origin_pos[li])
            oquat = tuple(float(c) for c in m.origin_quat[li])
            rx, ry, rz = _qrot(pquat, opos)
            pre_pos = (ppos[0] + rx, ppos[1] + ry, ppos[2] + rz)
            pre_quat = _qmul(pquat, oquat)
            jt = int(m.jtype[li])
            if jt == FIXED:
                out[li] = (pre_pos, pre_quat)
                continue
            kind, idx, f, off = self.var_src[li]
            q = (xrows[idx] if kind == "active" else fixed_rows[idx])
            if f != 1.0 or off != 0.0:
                q = q * f + off
            ax, ay, az = (float(c) for c in m.axis[li])
            if jt == REVOLUTE:
                h = 0.5 * q
                s, c = jnp.sin(h), jnp.cos(h)
                jq = (ax * s, ay * s, az * s, c)
                out[li] = (pre_pos, _qmul(pre_quat, jq))
            else:  # PRISMATIC
                dx, dy, dz = _qrot(pre_quat, (ax * q, ay * q, az * q))
                out[li] = (
                    (pre_pos[0] + dx, pre_pos[1] + dy, pre_pos[2] + dz),
                    pre_quat,
                )
        return out

    def tips(self, frames):
        """Tip components per tip: list of (pos3, quat4)."""
        return [frames[t] for t in self.tip_idx]

    def deltas(self, frames):
        """Per-(active var, tip) delta-frame components.

        Returns ``d[v][t]`` → ``(dpos3, dquat4)`` or ``None`` (no
        dependency — the trace-time analog of the reference's
        mutation_approx_mask, forward_kinematics.h:907-929).  Mimic
        factors are folded into the components
        (forward_kinematics.h:578-587).
        """
        m = self.model
        V = len(self.active)
        T = len(self.tip_idx)
        d = [[None] * T for _ in range(V)]
        for li, slot, factor in self.moving:
            pj, qj = frames[li]
            ax = tuple(float(c) for c in m.axis[li])
            omega = _qrot(qj, ax)
            is_rev = int(m.jtype[li]) == REVOLUTE
            for t in range(T):
                if li not in self.tip_anc[t]:
                    continue
                tp, tq = frames[self.tip_idx[t]]
                if is_rev:
                    arm = (tp[0] - pj[0], tp[1] - pj[1], tp[2] - pj[2])
                    dpos = _cross(omega, arm)
                    dquat = _qmul((omega[0], omega[1], omega[2], 0.0), tq)
                    dquat = tuple(0.5 * c for c in dquat)
                else:
                    dpos = omega
                    dquat = (0.0, 0.0, 0.0, 0.0)
                if factor != 1.0:
                    dpos = tuple(factor * c for c in dpos)
                    dquat = tuple(factor * c for c in dquat)
                prev = d[slot][t]
                if prev is None:
                    d[slot][t] = (dpos, dquat)
                else:  # mimic fan-in onto the same active slot
                    pp, pq = prev
                    d[slot][t] = (
                        tuple(a + b for a, b in zip(pp, dpos)),
                        tuple(a + b for a, b in zip(pq, dquat)),
                    )
        return d
