"""Rigid-transform ("frame") algebra on batched ``(pos, quat)`` pairs.

TPU-native counterpart of the reference's ``struct Frame`` and its free
functions (reference: include/bio_ik/frame.h:51-259).  A :class:`Frame`
is a pytree of two arrays — ``pos (..., 3)`` and ``quat (..., 4)`` xyzw —
so every operation broadcasts/vmaps over leading batch dims and jits
cleanly.  Where the reference packs one frame into 8 aligned doubles for
AVX, here the batch dimension IS the vector dimension.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .quat import (
    quat_conj,
    quat_identity,
    quat_mul,
    quat_normalize_fast,
    quat_rotate,
    quat_to_rotvec_wrapped,
)

__all__ = ["Frame", "frame_identity", "frame_mul", "frame_inv", "frame_change",
           "frame_apply", "frame_twist", "frame_pack", "frame_unpack"]


class Frame(NamedTuple):
    """Position + unit quaternion transform. Leading dims are batch dims."""

    pos: jnp.ndarray   # (..., 3)
    quat: jnp.ndarray  # (..., 4) xyzw

    def __matmul__(self, other: "Frame") -> "Frame":
        return frame_mul(self, other)

    @property
    def batch_shape(self):
        return self.pos.shape[:-1]


def frame_identity(shape=(), dtype=jnp.float32) -> Frame:
    return Frame(
        pos=jnp.zeros(tuple(shape) + (3,), dtype=dtype),
        quat=quat_identity(shape, dtype=dtype),
    )


def frame_mul(a: Frame, b: Frame) -> Frame:
    """Compose ``a · b`` (apply ``b`` in ``a``'s coordinates).

    Reference: concat(a, b, r), frame.h:174-181.
    """
    return Frame(
        pos=a.pos + quat_rotate(a.quat, b.pos),
        quat=quat_mul(a.quat, b.quat),
    )


def frame_inv(f: Frame) -> Frame:
    """Inverse transform. Reference: invert/inverse, frame.h:198-216."""
    qc = quat_conj(f.quat)
    return Frame(pos=-quat_rotate(qc, f.pos), quat=qc)


def frame_change(a: Frame, b: Frame, c: Frame) -> Frame:
    """``a · b⁻¹ · c`` — re-base a cached frame ``c`` from old parent ``b``
    to new parent ``a``.  Reference: change(), frame.h:204-209; identity
    tested by the reference's utest (change(c, b, b·a) == c·a).
    """
    return frame_mul(frame_mul(a, frame_inv(b)), c)


def frame_apply(f: Frame, points):
    """Transform point(s) ``(..., 3)`` by frame(s)."""
    return f.pos + quat_rotate(f.quat, points)


def frame_twist(a: Frame, b: Frame):
    """6-twist of the relative transform ``a⁻¹ · b`` → ``(..., 6)``.

    ``[vel(3), rot(3)]`` where ``vel`` is the relative translation expressed
    in ``a``'s coordinates and ``rot`` the axis·angle vector (angle wrapped
    into ``(−π, π]``).  Reference: frameTwist, frame.h:240-259; used by the
    default dtwist acceptance test (problem.cpp:276-322).
    """
    rel = frame_mul(frame_inv(a), b)
    return jnp.concatenate([rel.pos, quat_to_rotvec_wrapped(rel.quat)], axis=-1)


def frame_pack(f: Frame):
    """Pack to ``(..., 7)`` = ``[pos, quat]`` for matmul-style contractions."""
    return jnp.concatenate([f.pos, f.quat], axis=-1)


def frame_unpack(arr, renormalize: bool = False) -> Frame:
    """Unpack ``(..., 7)`` to a Frame; optionally fast-renormalize the quat."""
    q = arr[..., 3:7]
    if renormalize:
        q = quat_normalize_fast(q)
    return Frame(pos=arr[..., 0:3], quat=q)
