"""Geometric Jacobian + first-order tip-frame linearizer (the hot kernel).

TPU-native counterpart of the reference's ``RobotFK_Jacobian`` +
``RobotFK_Mutator`` (reference: src/forward_kinematics.h:553-731 and
783-1234).  Where the reference hand-writes AVX FMA loops over per-(tip,
variable) delta frames, here the delta-tensor build is fully vectorized
over joints (no per-variable Python loops in the traced graph) and the
mutation approximation is one dense contraction

    ``tips ≈ tips0 (T,7)  +  dq (N,V) · deltas (V, T·7)``

i.e. a single MXU-friendly matmul over the population — the design's
"north star" kernel.  Per the reference (forward_kinematics.h:1061-1233),
approximated quaternions are **not** renormalized; goal evaluators operate
on the raw first-order extrapolation.

Delta-frame math (equivalent to forward_kinematics.h:827-853, which builds
the Jacobian tip-locally and rotates into world):

  * revolute joint, world axis ``ω`` through point ``p_j``:
      ``∂pos/∂q = ω × (p_tip − p_j)``,  ``∂quat/∂q = ½·(ω,0) ⊗ q_tip``
  * prismatic: ``∂pos/∂q = ω``, ``∂quat/∂q = 0``
  * other joint types (floating/planar): forward-difference fallback
    (reference: forward_kinematics.h:695-727)
  * mimic joints contribute factor-scaled columns to their source variable
    (reference: forward_kinematics.h:578-587) — implemented as one static
    scatter matmul ``cols (T,J,7) · S (J,V)``.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np
import jax.numpy as jnp

from ..math.frame import Frame
from ..math.quat import quat_conj, quat_mul, quat_rotate, quat_to_rotvec_wrapped
from ..robot.model import RobotModel
from ..robot.urdf import PRISMATIC, REVOLUTE
from .fk import make_fk, make_link_frames_fn

__all__ = ["make_linearizer", "apply_deltas", "apply_deltas_single", "make_jacobian"]


class _JointCols:
    """Static structure shared by the linearizer and the Jacobian builder.

    Enumerates the "moving joints" J that can displace any tip: joints
    owning an active variable, plus mimic joints whose source is active.
    Builds the (T,J) dependency mask and the (J,V) mimic scatter matrix.
    """

    def __init__(self, model: RobotModel, tip_idx: List[int], active_vars: Sequence[int]):
        self.model = model
        self.active_vars = list(active_vars)
        var_slot = {v: i for i, v in enumerate(self.active_vars)}
        tip_anc = [set(model.ancestors(t)) for t in tip_idx]

        joints: List[int] = []        # link index of each moving joint
        target: List[int] = []        # active-var slot its column scatters to
        factor: List[float] = []
        self.fd_vars: List[int] = []  # active-var slots needing finite differences

        for i, v in enumerate(self.active_vars):
            lv = int(model.var_link[v])
            jt = int(model.jtype[lv])
            if jt not in (REVOLUTE, PRISMATIC):
                self.fd_vars.append(i)
                continue
            # only 1-DOF joints take the analytic path; the owning var is
            # the joint's single variable
            if any(lv in anc for anc in tip_anc):
                joints.append(lv)
                target.append(i)
                factor.append(1.0)
        # mimic fan-out
        for m in model.mimic_vars:
            src = int(model.mimic_src[m])
            if src in var_slot:
                lm = int(model.var_link[m])
                if any(lm in anc for anc in tip_anc):
                    joints.append(lm)
                    target.append(var_slot[src])
                    factor.append(float(model.mimic_factor[m]))

        self.joints = joints
        J, V, T = len(joints), len(self.active_vars), len(tip_idx)
        self.scatter = np.zeros((J, V))
        for j, (t, f) in enumerate(zip(target, factor)):
            self.scatter[j, t] = f
        self.dep = np.zeros((T, J))
        for ti, anc in enumerate(tip_anc):
            for j, lj in enumerate(joints):
                self.dep[ti, j] = 1.0 if lj in anc else 0.0
        self.axis = model.axis[joints] if joints else np.zeros((0, 3))
        self.is_rev = np.array(
            [model.jtype[lj] == REVOLUTE for lj in joints], dtype=bool
        )


def _joint_cols(jc: _JointCols, lf, slots_j, tip_slots, dtype, want7: bool):
    """Per-(tip, joint) delta columns from a LinkFrames buffer.

    Returns ``cols (..., T, J, 7)`` when ``want7`` (linearizer: pos delta +
    quaternion derivative) else ``(..., T, J, 6)`` (Jacobian: pos delta +
    angular velocity)."""
    pj = lf.pos[..., slots_j, :]        # (..., J, 3)
    qj = lf.quat[..., slots_j, :]       # (..., J, 4)
    axis = jnp.asarray(jc.axis, dtype=dtype)
    omega = quat_rotate(qj, axis)       # (..., J, 3) world-frame joint axis

    tp = lf.pos[..., tip_slots, :]      # (..., T, 3)
    tq = lf.quat[..., tip_slots, :]     # (..., T, 4)

    # broadcast to (..., T, J, ·)
    arm = tp[..., :, None, :] - pj[..., None, :, :]
    omega_b = jnp.broadcast_to(omega[..., None, :, :], arm.shape)
    dpos_rev = jnp.cross(omega_b, arm)

    is_rev = jnp.asarray(jc.is_rev)[..., None]
    dpos = jnp.where(is_rev, dpos_rev, omega_b)

    if want7:
        zw = jnp.zeros_like(omega[..., :1])
        omega_q = jnp.concatenate([omega, zw], axis=-1)          # (..., J, 4)
        dquat_rev = 0.5 * quat_mul(omega_q[..., None, :, :], tq[..., :, None, :])
        dquat = jnp.where(is_rev, dquat_rev, jnp.zeros_like(dquat_rev))
        cols = jnp.concatenate([dpos, dquat], axis=-1)           # (..., T, J, 7)
    else:
        drot = jnp.where(is_rev, omega_b, jnp.zeros_like(omega_b))
        cols = jnp.concatenate([dpos, drot], axis=-1)            # (..., T, J, 6)

    dep = jnp.asarray(jc.dep, dtype=dtype)[..., None]            # (T, J, 1)
    return cols * dep


def make_linearizer(
    model: RobotModel,
    tip_links: Sequence[str],
    active_vars: Sequence[int],
    fd_eps: float = 1e-4,
) -> Callable:
    """Build ``linearize(q_full) → (tips0 (..., T, 7), deltas (..., T, V, 7))``.

    ``q_full (..., V_full)`` (mimics applied internally); ``V`` is
    ``len(active_vars)``.  All per-joint structure is resolved statically;
    the traced graph is O(1) in the number of joints.
    """
    tip_idx = [model.link_index[t] for t in tip_links]
    frames_fn, sched = make_link_frames_fn(model, tip_idx)
    tip_slots = np.array([sched.slot_of_link[t] for t in tip_idx])
    jc = _JointCols(model, tip_idx, active_vars)
    slots_j = np.array([sched.slot_of_link[lj] for lj in jc.joints], dtype=np.int64)
    fd_fk = make_fk(model, tip_links) if jc.fd_vars else None
    active_np = np.asarray(list(active_vars), dtype=np.int64)
    V = len(jc.active_vars)

    def linearize(q_full):
        dtype = q_full.dtype
        lf = frames_fn(q_full)
        tips0 = jnp.concatenate(
            [lf.pos[..., tip_slots, :], lf.quat[..., tip_slots, :]], axis=-1
        )  # (..., T, 7)
        cols = _joint_cols(jc, lf, slots_j, tip_slots, dtype, want7=True)
        scatter = jnp.asarray(jc.scatter, dtype=dtype)
        deltas = jnp.einsum("...tjd,jv->...tvd", cols, scatter)

        if jc.fd_vars:
            eps = jnp.asarray(fd_eps, dtype=dtype)
            for i in jc.fd_vars:
                e = jnp.zeros(model.nvars, dtype=dtype).at[active_np[i]].set(eps)
                te = fd_fk(q_full + e)
                te_packed = jnp.concatenate([te.pos, te.quat], axis=-1)
                dcol = (te_packed - tips0) / eps                 # (..., T, 7)
                deltas = deltas.at[..., :, i, :].set(dcol)

        return tips0, deltas

    return linearize


def apply_deltas(tips0, deltas, dq):
    """Approximate tip frames for a population of gene deltas.

    ``tips0 (..., T, 7)``, ``deltas (..., T, V, 7)``, ``dq (..., N, V)`` →
    ``(..., N, T, 7)``.  One einsum → one MXU contraction per call
    (reference analog: computeApproximateMutations,
    forward_kinematics.h:1061-1233).
    """
    return tips0[..., None, :, :] + jnp.einsum("...tvd,...nv->...ntd", deltas, dq)


def apply_deltas_single(phen, deltas, var_slot, delta):
    """Single-variable update of an existing phenotype ``phen (..., T, 7)``:
    ``phen + deltas[..., :, var_slot, :] · delta`` (reference analog:
    computeApproximateMutation1, forward_kinematics.h:1198-1233)."""
    return phen + deltas[..., :, var_slot, :] * delta


def make_jacobian(
    model: RobotModel, tip_links: Sequence[str], active_vars: Sequence[int],
    fd_eps: float = 1e-4,
) -> Callable:
    """Build ``jac(q_full) → (tips0: Frame (..., T), J (..., T, 6, V))``.

    Geometric (twist) Jacobian in **world** coordinates: rows are
    ``[dpos(3), ω(3)]``.  Used by the ``jac`` pseudoinverse solver family
    (reference analog: computeJacobian, forward_kinematics.h:599-731).
    Variables without an analytic column (floating/planar) get
    forward-difference columns: ``dpos = Δp/ε`` and ``ω`` from the
    rotation vector of the relative quaternion ``q(x+ε)·q(x)⁻¹``
    (reference: the numeric-differentiation default branch + frameTwist,
    forward_kinematics.h:695-727, frame.h:240-259 — twist expressed in
    world coordinates to match the analytic columns here).
    """
    tip_idx = [model.link_index[t] for t in tip_links]
    frames_fn, sched = make_link_frames_fn(model, tip_idx)
    tip_slots = np.array([sched.slot_of_link[t] for t in tip_idx])
    jc = _JointCols(model, tip_idx, active_vars)
    slots_j = np.array([sched.slot_of_link[lj] for lj in jc.joints], dtype=np.int64)
    fd_fk = make_fk(model, tip_links) if jc.fd_vars else None
    active_np = np.asarray(list(active_vars), dtype=np.int64)

    def jac(q_full):
        dtype = q_full.dtype
        lf = frames_fn(q_full)
        tips0 = Frame(pos=lf.pos[..., tip_slots, :], quat=lf.quat[..., tip_slots, :])
        cols = _joint_cols(jc, lf, slots_j, tip_slots, dtype, want7=False)
        scatter = jnp.asarray(jc.scatter, dtype=dtype)
        J = jnp.einsum("...tjd,jv->...tdv", cols, scatter)  # (..., T, 6, V)

        if jc.fd_vars:
            eps = jnp.asarray(fd_eps, dtype=dtype)
            for i in jc.fd_vars:
                e = jnp.zeros(model.nvars, dtype=dtype).at[active_np[i]].set(eps)
                te = fd_fk(q_full + e)
                dpos = (te.pos - tips0.pos) / eps                    # (..., T, 3)
                rel = quat_mul(te.quat, quat_conj(tips0.quat))
                drot = quat_to_rotvec_wrapped(rel) / eps             # (..., T, 3)
                dcol = jnp.concatenate([dpos, drot], axis=-1)        # (..., T, 6)
                J = J.at[..., :, :, i].set(dcol)

        return tips0, J

    return jac
