"""Quaternion algebra on ``(..., 4)`` arrays, **xyzw** convention.

TPU-native counterpart of the reference's scalar quaternion kernels
(reference: include/bio_ik/frame.h:108-238).  Instead of hand-SIMD scalar
structs, every function here is a pure jnp op broadcastable over arbitrary
leading batch dimensions, so the same code serves a single frame, a
population of mutants, or a scenario batch under ``vmap``/``jit``.

Convention notes:
  * layout ``[x, y, z, w]`` (matches scipy.spatial.transform.Rotation, which
    the tests use as the trusted oracle).
  * all rotations are unit quaternions unless stated otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "quat_identity",
    "quat_mul",
    "quat_conj",
    "quat_inv",
    "quat_rotate",
    "quat_norm_sq",
    "quat_normalize",
    "quat_normalize_fast",
    "quat_from_axis_angle",
    "quat_from_rpy",
    "quat_to_matrix",
    "quat_angle",
    "quat_angle_shortest",
    "quat_dist_sq_double_cover",
    "quat_to_rotvec_wrapped",
]


def quat_identity(shape=(), dtype=jnp.float32):
    """Identity quaternion broadcast to ``shape + (4,)``."""
    q = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)
    return jnp.broadcast_to(q, tuple(shape) + (4,))


def quat_mul(a, b):
    """Hamilton product ``a ⊗ b`` (apply ``b`` then ``a``).

    Reference: quat_mul_quat, frame.h:151-172.
    """
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conj(q):
    """Conjugate (= inverse for unit quaternions). Reference: frame.h:189-196."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


quat_inv = quat_conj


def quat_rotate(q, v):
    """Rotate vector(s) ``v`` ``(..., 3)`` by unit quaternion(s) ``q``.

    Uses the two-cross-product form (15 mul + 15 add), the vector analog of
    the reference's expanded scalar kernel (quat_mul_vec, frame.h:108-149).
    """
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_norm_sq(q):
    return jnp.sum(q * q, axis=-1, keepdims=True)


def quat_normalize(q):
    return q / jnp.sqrt(quat_norm_sq(q))


def quat_normalize_fast(q):
    """One Newton-Raphson step toward unit norm: ``q * (3 - |q|²)/2``.

    Valid when ``|q|`` is already close to 1 (post-mutation drift).
    Reference: normalizeFast, frame.h:231-238.
    """
    f = (3.0 - quat_norm_sq(q)) * 0.5
    return q * f


def quat_from_axis_angle(axis, angle):
    """Unit quaternion from unit ``axis`` ``(...,3)`` and ``angle`` ``(...,)``.

    Reference: revolute joint frame computation, forward_kinematics.h:89-112.
    """
    half = 0.5 * angle
    s = jnp.sin(half)
    c = jnp.cos(half)
    return jnp.concatenate([axis * s[..., None], c[..., None]], axis=-1)


def quat_from_rpy(roll, pitch, yaw):
    """Unit quaternion from URDF fixed-axis roll/pitch/yaw (XYZ extrinsic)."""
    hr, hp, hy = 0.5 * roll, 0.5 * pitch, 0.5 * yaw
    sr, cr = jnp.sin(hr), jnp.cos(hr)
    sp, cp = jnp.sin(hp), jnp.cos(hp)
    sy, cy = jnp.sin(hy), jnp.cos(hy)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_matrix(q):
    """Rotation matrix ``(..., 3, 3)`` of unit quaternion(s)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_angle(q):
    """Rotation angle in ``[0, 2π)`` — NOT shortest path (tf2 getAngle).

    Reference uses this in frameTwist (frame.h:248) and then wraps > π by
    subtracting 2π; see :func:`quat_to_rotvec_wrapped`.
    """
    s = jnp.linalg.norm(q[..., :3], axis=-1)
    return 2.0 * jnp.arctan2(s, q[..., 3])


def quat_angle_shortest(a, b):
    """Shortest-path angle between two unit quaternions, in ``[0, π]``.

    Reference: tf2 angleShortestPath used by the acceptance test
    (problem.cpp:291,311).
    """
    d = jnp.abs(jnp.sum(a * b, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, 0.0, 1.0))


def quat_dist_sq_double_cover(a, b):
    """``min(‖a−b‖², ‖a+b‖²)`` — double-cover-safe squared distance.

    The orientation/pose goal metric (reference: goal_types.h:119,172).
    """
    d_minus = jnp.sum(jnp.square(a - b), axis=-1)
    d_plus = jnp.sum(jnp.square(a + b), axis=-1)
    return jnp.minimum(d_minus, d_plus)


def quat_to_rotvec_wrapped(q, eps=1e-12):
    """Axis·angle vector with the reference's wrap convention.

    ``angle = getAngle(q) ∈ [0, 2π)``, then ``angle -= 2π`` if ``angle > π``
    (frame.h:246-253), axis = normalized vector part (zero-safe).
    """
    v = q[..., :3]
    s = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(s[..., 0], q[..., 3])
    angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    axis = v / jnp.maximum(s, eps)
    return axis * angle[..., None]
