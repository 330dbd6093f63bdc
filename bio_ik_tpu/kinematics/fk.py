"""Batched forward kinematics.

TPU-native counterpart of the reference FK engine
(reference: src/forward_kinematics.h:217-360, RobotFK_Fast_Base).

Design: per-robot *program specialization*.  :func:`make_fk` compiles the
static kinematic structure into per-link metadata arrays and emits a pure
function ``q (..., V_full) → tip frames`` that runs a ``lax.scan`` over the
topologically-ordered link schedule.  The scan body is compiled once
regardless of chain length (an unrolled chain makes XLA's fusion passes
explode super-linearly past ~16 links), while the batch (population /
scenario) axis provides all the data parallelism the VPU needs.  Short
chains (≤ ``UNROLL_MAX`` links) are unrolled instead — XLA then fuses the
whole chain into one kernel.

There is no incremental-FK analog (reference forward_kinematics.h:363-550):
recomputation is already fully batched, and the hot path uses the
linearizer in :mod:`bio_ik_tpu.kinematics.approx` instead.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..math.frame import Frame
from ..math.quat import quat_from_axis_angle, quat_mul, quat_normalize, quat_rotate
from ..robot.model import RobotModel
from ..robot.urdf import FIXED, FLOATING, PLANAR, PRISMATIC, REVOLUTE

__all__ = ["make_fk", "make_link_frames_fn", "joint_frame", "LinkFrames"]

UNROLL_MAX = 12


class LinkFrames(NamedTuple):
    """Global frames for every link in a schedule: ``pos (..., S, 3)``,
    ``quat (..., S, 4)``, with ``slot_of_link`` mapping link index → row."""

    pos: jnp.ndarray
    quat: jnp.ndarray


def joint_frame(jtype: int, axis: np.ndarray, qvals, dtype) -> Frame:
    """Local joint transform for one joint given its variable slice
    (static ``jtype``/``axis``; used by the unrolled path).

    Reference analog: RobotJointEvaluator::getJointFrame
    (forward_kinematics.h:89-135).
    """
    if jtype == REVOLUTE:
        ax = jnp.asarray(axis, dtype=dtype)
        angle = qvals[..., 0]
        return Frame(
            pos=jnp.zeros(angle.shape + (3,), dtype=dtype),
            quat=quat_from_axis_angle(ax, angle),
        )
    if jtype == PRISMATIC:
        ax = jnp.asarray(axis, dtype=dtype)
        d = qvals[..., 0:1]
        return Frame(
            pos=ax * d,
            quat=jnp.broadcast_to(jnp.array([0, 0, 0, 1], dtype=dtype), d.shape[:-1] + (4,)),
        )
    if jtype == FLOATING:
        return Frame(pos=qvals[..., 0:3], quat=quat_normalize(qvals[..., 3:7]))
    if jtype == PLANAR:
        x, y, theta = qvals[..., 0], qvals[..., 1], qvals[..., 2]
        pos = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
        z_axis = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
        return Frame(pos=pos, quat=quat_from_axis_angle(z_axis, theta))
    raise ValueError(f"unexpected joint type {jtype}")


def _joint_frame_dynamic(jtype, axis, qwin, dtype):
    """Joint transform with *traced* ``jtype`` (scan path): computes every
    variant on masks and selects.  ``qwin (..., 7)`` is the joint's padded
    variable window."""
    zero3 = jnp.zeros(qwin.shape[:-1] + (3,), dtype=dtype)
    ident = jnp.broadcast_to(jnp.array([0, 0, 0, 1], dtype=dtype), qwin.shape[:-1] + (4,))

    angle = qwin[..., 0]
    q_rev = quat_from_axis_angle(axis, angle)
    p_pris = axis * qwin[..., 0:1]
    p_float = qwin[..., 0:3]
    q_float = quat_normalize(qwin[..., 3:7])
    z_axis = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
    p_plan = jnp.stack([qwin[..., 0], qwin[..., 1], jnp.zeros_like(angle)], axis=-1)
    q_plan = quat_from_axis_angle(z_axis, qwin[..., 2])

    is_rev = (jtype == REVOLUTE)[..., None]
    is_pris = (jtype == PRISMATIC)[..., None]
    is_float = (jtype == FLOATING)[..., None]
    is_plan = (jtype == PLANAR)[..., None]

    pos = jnp.where(is_pris, p_pris, jnp.where(is_float, p_float, jnp.where(is_plan, p_plan, zero3)))
    quat = jnp.where(is_rev, q_rev, jnp.where(is_float, q_float, jnp.where(is_plan, q_plan, ident)))
    return Frame(pos=pos, quat=quat)


class _Schedule:
    """Static per-robot arrays for the scan FK over one link schedule."""

    def __init__(self, model: RobotModel, schedule: List[int]):
        S = len(schedule)
        self.links = schedule
        self.slot_of_link = {li: s for s, li in enumerate(schedule)}
        self.parent_slot = np.array(
            [self.slot_of_link[int(model.parent[li])] if model.parent[li] >= 0 else s
             for s, li in enumerate(schedule)],
            dtype=np.int32,
        )
        self.is_root = np.array([model.parent[li] < 0 for li in schedule], dtype=bool)
        self.origin_pos = model.origin_pos[schedule]
        self.origin_quat = model.origin_quat[schedule]
        self.axis = model.axis[schedule]
        self.jtype = model.jtype[schedule].astype(np.int32)
        self.vstart = np.maximum(model.vstart[schedule], 0).astype(np.int32)


def _link_frames_scan(model: RobotModel, sched: _Schedule, q) -> LinkFrames:
    """Scan-based FK over the schedule for a single configuration ``q (V,)``."""
    dtype = q.dtype
    S = len(sched.links)
    qpad = jnp.concatenate([q, jnp.zeros(7, dtype=dtype)])

    origin_pos = jnp.asarray(sched.origin_pos, dtype=dtype)
    origin_quat = jnp.asarray(sched.origin_quat, dtype=dtype)
    axis = jnp.asarray(sched.axis, dtype=dtype)
    jtype = jnp.asarray(sched.jtype)
    vstart = jnp.asarray(sched.vstart)
    parent_slot = jnp.asarray(sched.parent_slot)
    is_root = jnp.asarray(sched.is_root)

    pos_buf = jnp.zeros((S, 3), dtype=dtype)
    quat_buf = jnp.zeros((S, 4), dtype=dtype).at[:, 3].set(1.0)

    def body(i, bufs):
        pos_buf, quat_buf = bufs
        ppos = pos_buf[parent_slot[i]]
        pquat = quat_buf[parent_slot[i]]
        # parent · origin
        pre_pos = ppos + quat_rotate(pquat, origin_pos[i])
        pre_quat = quat_mul(pquat, origin_quat[i])
        qwin = lax.dynamic_slice(qpad, (vstart[i],), (7,))
        jf = _joint_frame_dynamic(jtype[i], axis[i], qwin, dtype)
        new_pos = pre_pos + quat_rotate(pre_quat, jf.pos)
        new_quat = quat_mul(pre_quat, jf.quat)
        new_pos = jnp.where(is_root[i], ppos, new_pos)
        new_quat = jnp.where(is_root[i], pquat, new_quat)
        return (pos_buf.at[i].set(new_pos), quat_buf.at[i].set(new_quat))

    pos_buf, quat_buf = lax.fori_loop(0, S, body, (pos_buf, quat_buf))
    return LinkFrames(pos=pos_buf, quat=quat_buf)


def _link_frames_unrolled(model: RobotModel, sched: _Schedule, q) -> LinkFrames:
    """Unrolled FK (small robots): one fused XLA graph, no scan overhead."""
    dtype = q.dtype
    frames = {}
    for s, li in enumerate(sched.links):
        if model.parent[li] < 0:
            frames[s] = Frame(
                pos=jnp.zeros(3, dtype=dtype),
                quat=jnp.array([0, 0, 0, 1], dtype=dtype),
            )
            continue
        parent = frames[sched.slot_of_link[int(model.parent[li])]]
        opos = jnp.asarray(model.origin_pos[li], dtype=dtype)
        oquat = jnp.asarray(model.origin_quat[li], dtype=dtype)
        pre = Frame(
            pos=parent.pos + quat_rotate(parent.quat, opos),
            quat=quat_mul(parent.quat, oquat),
        )
        jt = int(model.jtype[li])
        if jt == FIXED:
            frames[s] = pre
        else:
            vs, vc = int(model.vstart[li]), int(model.vcount[li])
            jf = joint_frame(jt, model.axis[li], q[vs : vs + vc], dtype)
            frames[s] = Frame(
                pos=pre.pos + quat_rotate(pre.quat, jf.pos),
                quat=quat_mul(pre.quat, jf.quat),
            )
    S = len(sched.links)
    return LinkFrames(
        pos=jnp.stack([frames[s].pos for s in range(S)]),
        quat=jnp.stack([frames[s].quat for s in range(S)]),
    )


def _batchify(fn_single: Callable) -> Callable:
    """Lift a ``q (V,) → pytree`` function to arbitrary leading batch dims."""

    def fn(q):
        batch = q.shape[:-1]
        if not batch:
            return fn_single(q)
        flat = q.reshape((-1, q.shape[-1]))
        out = jax.vmap(fn_single)(flat)
        return jax.tree.map(lambda a: a.reshape(batch + a.shape[1:]), out)

    return fn


def make_link_frames_fn(model: RobotModel, link_indices: Sequence[int], unroll=None):
    """Build ``fn(q_full) → LinkFrames`` over the deduped ancestor schedule
    of ``link_indices``; also returns the :class:`_Schedule` (slot mapping).
    """
    schedule = model.link_schedule(link_indices)
    sched = _Schedule(model, schedule)
    if unroll is None:
        unroll = len(schedule) <= UNROLL_MAX

    impl = _link_frames_unrolled if unroll else _link_frames_scan

    def single(q):
        q = model.apply_mimic(q)
        return impl(model, sched, q)

    return _batchify(single), sched


def make_fk(model: RobotModel, tip_links: Sequence[str], unroll=None) -> Callable:
    """Build ``fk(q_full (..., V)) → Frame`` with tips stacked on axis -2."""
    tip_idx = [model.link_index[t] for t in tip_links]
    frames_fn, sched = make_link_frames_fn(model, tip_idx, unroll=unroll)
    tip_slots = np.array([sched.slot_of_link[t] for t in tip_idx])

    def fk(q_full):
        lf = frames_fn(q_full)
        return Frame(pos=lf.pos[..., tip_slots, :], quat=lf.quat[..., tip_slots, :])

    return fk
