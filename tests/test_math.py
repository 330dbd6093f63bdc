"""Property tests of the quaternion/frame algebra vs scipy.

Mirrors the reference's utest strategy (reference: test/utest.cpp:63-81 —
the change() re-basing identity over random frames) and extends it with a
scipy.spatial.transform oracle for every op.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from bio_ik_tpu.math import (
    Frame,
    frame_apply,
    frame_change,
    frame_inv,
    frame_mul,
    frame_twist,
    quat_angle_shortest,
    quat_dist_sq_double_cover,
    quat_from_axis_angle,
    quat_from_rpy,
    quat_mul,
    quat_normalize_fast,
    quat_rotate,
    quat_to_matrix,
    quat_to_rotvec_wrapped,
)

N = 256


def random_quats(rng, n=N):
    return R.random(n, random_state=np.random.RandomState(rng.integers(1 << 31)))


def random_frames(rng, n=N):
    rot = random_quats(rng, n)
    pos = rng.normal(size=(n, 3))
    return Frame(
        pos=jnp.asarray(pos, dtype=jnp.float32),
        quat=jnp.asarray(rot.as_quat(), dtype=jnp.float32),
    ), pos, rot


def quat_close(got, want, tol=1e-5):
    got, want = np.asarray(got), np.asarray(want)
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * want, atol=tol)


def test_quat_mul_vs_scipy(rng):
    a, b = random_quats(rng), random_quats(rng)
    got = quat_mul(jnp.asarray(a.as_quat(), jnp.float32), jnp.asarray(b.as_quat(), jnp.float32))
    quat_close(got, (a * b).as_quat())


def test_quat_rotate_vs_scipy(rng):
    a = random_quats(rng)
    v = rng.normal(size=(N, 3))
    got = quat_rotate(jnp.asarray(a.as_quat(), jnp.float32), jnp.asarray(v, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), a.apply(v), atol=1e-5)


def test_quat_to_matrix_vs_scipy(rng):
    a = random_quats(rng)
    got = quat_to_matrix(jnp.asarray(a.as_quat(), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), a.as_matrix(), atol=1e-5)


def test_quat_axis_angle_roundtrip(rng):
    axis = rng.normal(size=(N, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-np.pi, np.pi, size=N)
    got = quat_from_axis_angle(jnp.asarray(axis, jnp.float32), jnp.asarray(angle, jnp.float32))
    want = R.from_rotvec(axis * angle[:, None]).as_quat()
    quat_close(got, want)


def test_quat_from_rpy_vs_scipy(rng):
    rpy = rng.uniform(-np.pi, np.pi, size=(N, 3))
    got = quat_from_rpy(*[jnp.asarray(rpy[:, i], jnp.float32) for i in range(3)])
    want = R.from_euler("xyz", rpy).as_quat()
    quat_close(got, want)


def test_quat_normalize_fast(rng):
    a = random_quats(rng).as_quat()
    # perturb slightly off unit norm — the regime normalizeFast is built for
    a = a * (1.0 + rng.uniform(-0.01, 0.01, size=(N, 1)))
    got = np.asarray(quat_normalize_fast(jnp.asarray(a, jnp.float32)))
    norms = np.linalg.norm(got, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=3e-4)


def test_double_cover_distance(rng):
    a = random_quats(rng)
    q = jnp.asarray(a.as_quat(), jnp.float32)
    # distance to the antipodal representation of the SAME rotation is 0
    d = quat_dist_sq_double_cover(q, -q)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    # small-angle consistency: ‖q−q̂‖² ≈ (θ/2)² for small θ
    theta = 1e-2
    dq = R.from_rotvec([theta, 0, 0])
    b = jnp.asarray((a * dq).as_quat(), jnp.float32)
    d2 = np.asarray(quat_dist_sq_double_cover(q, b))
    np.testing.assert_allclose(d2, (theta / 2) ** 2, rtol=1e-2)


def test_angle_shortest(rng):
    a = random_quats(rng)
    angle = rng.uniform(0, np.pi * 0.95, size=N)
    axis = rng.normal(size=(N, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    b = a * R.from_rotvec(axis * angle[:, None])
    got = quat_angle_shortest(
        jnp.asarray(a.as_quat(), jnp.float32), jnp.asarray(b.as_quat(), jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(got), angle, atol=1e-3)


def test_rotvec_wrapped(rng):
    a = random_quats(rng)
    got = np.asarray(quat_to_rotvec_wrapped(jnp.asarray(a.as_quat(), jnp.float32)))
    want = a.as_rotvec()  # scipy always returns the shortest rotvec
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_frame_mul_vs_scipy(rng):
    fa, pa, ra = random_frames(rng)
    fb, pb, rb = random_frames(rng)
    got = frame_mul(fa, fb)
    np.testing.assert_allclose(np.asarray(got.pos), pa + ra.apply(pb), atol=1e-5)
    quat_close(got.quat, (ra * rb).as_quat())


def test_frame_inv(rng):
    fa, _, _ = random_frames(rng)
    ident = frame_mul(fa, frame_inv(fa))
    np.testing.assert_allclose(np.asarray(ident.pos), 0.0, atol=1e-5)
    quat_close(ident.quat, np.tile([0, 0, 0, 1.0], (N, 1)))


def test_frame_change_identity(rng):
    """The reference's own property test: change(c, b, b·a) == c·a
    (reference: test/utest.cpp:63-81, tolerance 1e-3)."""
    fa, _, _ = random_frames(rng)
    fb, _, _ = random_frames(rng)
    fc, _, _ = random_frames(rng)
    got = frame_change(fc, fb, frame_mul(fb, fa))
    want = frame_mul(fc, fa)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(want.pos), atol=1e-3)
    quat_close(got.quat, np.asarray(want.quat), tol=1e-3)


def test_frame_twist(rng):
    fa, pa, ra = random_frames(rng)
    # b = a ∘ small twist
    dv = rng.normal(size=(N, 3)) * 0.01
    dw = rng.normal(size=(N, 3)) * 0.01
    fb = frame_mul(
        fa,
        Frame(
            pos=jnp.asarray(dv, jnp.float32),
            quat=jnp.asarray(R.from_rotvec(dw).as_quat(), jnp.float32),
        ),
    )
    tw = np.asarray(frame_twist(fa, fb))
    np.testing.assert_allclose(tw[:, :3], dv, atol=1e-5)
    np.testing.assert_allclose(tw[:, 3:], dw, atol=1e-5)


def test_frame_apply(rng):
    fa, pa, ra = random_frames(rng)
    pts = rng.normal(size=(N, 3))
    got = frame_apply(fa, jnp.asarray(pts, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), pa + ra.apply(pts), atol=1e-5)
