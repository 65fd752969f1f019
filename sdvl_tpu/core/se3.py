"""SE(3) Lie-group operations, functional and vmappable.

TPU-native replacement for the reference's quaternion+translation SE3 class
(reference: extra/se3.{h,cc}, e.g. Exp/Log at se3.cc:72-112 with small-angle
Taylor branches). Unlike the reference's scalar C++ class, every op here is a
pure function over stacked arrays: a pose is a float32 array of shape
``(..., 7)`` laid out as ``[qw, qx, qy, qz, tx, ty, tz]`` so that thousands of
poses batch onto the VPU/MXU via ``vmap``/broadcasting.

Conventions match the reference: a pose ``T`` maps world coordinates to camera
coordinates, ``x_cam = R @ x_world + t`` (reference frame.h:84 stores
world->cam and inverts for display).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle threshold mirroring the reference's Taylor-branch switch
# (reference se3.cc:82,101 uses ~1e-8 on theta^2; we work in f32 so widen it).
_EPS = 1e-6


def identity(batch_shape=()) -> jnp.ndarray:
    """Identity pose(s) of shape ``batch_shape + (7,)``."""
    pose = jnp.zeros(batch_shape + (7,), dtype=jnp.float32)
    return pose.at[..., 0].set(1.0)


def from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build pose array from rotation matrix ``(...,3,3)`` and translation."""
    return jnp.concatenate([quat_from_matrix(R), t], axis=-1)


def rotation(pose: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``(...,3,3)`` of the pose."""
    return matrix_from_quat(pose[..., :4])

def translation(pose: jnp.ndarray) -> jnp.ndarray:
    return pose[..., 4:7]


def normalize(pose: jnp.ndarray) -> jnp.ndarray:
    """Renormalize the quaternion part (guards f32 drift across composes)."""
    q = pose[..., :4]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    # Canonical sign: qw >= 0 keeps log() on the short geodesic.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return jnp.concatenate([q, pose[..., 4:7]], axis=-1)


# ---------------------------------------------------------------------------
# Quaternion helpers (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors ``v`` ``(...,3)`` by quaternion(s) ``q`` ``(...,4)``.

    Uses the two-cross-product form (cheaper than building the matrix when the
    rotation is applied once).
    """
    qv = q[..., 1:4]
    qw = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def matrix_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
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
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Branch-free (where-based) Shepperd conversion, safe under vmap/jit."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate solutions; pick the numerically strongest per element.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    s0 = _safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    s2 = _safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    s3 = _safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    return jnp.where(q[..., :1] < 0, -q, q)


# ---------------------------------------------------------------------------
# Group operations
# ---------------------------------------------------------------------------

def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a * b``: apply ``b`` first, then ``a`` (reference se3.cc:59-64)."""
    q = quat_multiply(a[..., :4], b[..., :4])
    t = quat_rotate(a[..., :4], b[..., 4:7]) + a[..., 4:7]
    return normalize(jnp.concatenate([q, t], axis=-1))


def inverse(pose: jnp.ndarray) -> jnp.ndarray:
    """Pose inverse (reference se3.cc:166-177)."""
    qinv = quat_conjugate(pose[..., :4])
    t = -quat_rotate(qinv, pose[..., 4:7])
    return jnp.concatenate([qinv, t], axis=-1)


def transform(pose: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply pose(s) to points ``(...,3)``: ``R @ p + t``."""
    return quat_rotate(pose[..., :4], pts) + pose[..., 4:7]


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of ``(...,3)`` (reference se3.h hat operator)."""
    zeros = jnp.zeros_like(w[..., 0])
    rows = jnp.stack(
        [
            zeros, -w[..., 2], w[..., 1],
            w[..., 2], zeros, -w[..., 0],
            -w[..., 1], w[..., 0], zeros,
        ],
        axis=-1,
    )
    return rows.reshape(w.shape[:-1] + (3, 3))


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential map. ``xi`` is ``(...,6)`` = [rho (trans), omega (rot)].

    Matches the reference's parameter order (translation first, rotation
    second; reference se3.cc:72-99) and includes the small-angle Taylor
    branches, expressed with ``jnp.where`` so the whole thing traces.
    """
    rho, omega = xi[..., :3], xi[..., 3:6]
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    half = 0.5 * theta

    small = theta_sq < _EPS
    # Quaternion: [cos(theta/2), sin(theta/2)/theta * omega]
    sinc_half = jnp.where(
        small, 0.5 - theta_sq / 48.0, jnp.sin(half) / jnp.maximum(theta, 1e-20)
    )
    qw = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    q = jnp.concatenate([qw, sinc_half * omega], axis=-1)

    # V matrix: I + (1-cos)/th^2 * W + (th - sin)/th^3 * W^2
    W = hat(omega)
    W2 = W @ W
    a = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, 1e-20))
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta_sq * theta, 1e-20))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + a[..., None] * W + b[..., None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return normalize(jnp.concatenate([q, t], axis=-1))


def log(pose: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm, inverse of :func:`exp` (reference se3.cc:101-112)."""
    pose = normalize(pose)
    q, t = pose[..., :4], pose[..., 4:7]
    qw = jnp.clip(q[..., 0:1], -1.0, 1.0)
    qv = q[..., 1:4]
    sin_half = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(sin_half, qw)
    small = theta * theta < _EPS
    k = jnp.where(small, 2.0 + theta * theta / 12.0,
                  theta / jnp.maximum(sin_half, 1e-20))
    omega = k * qv

    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    W = hat(omega)
    W2 = W @ W
    # V^{-1} = I - W/2 + (1 - th*cos(th/2)/(2 sin(th/2))) / th^2 * W^2
    th = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    half = 0.5 * th
    coeff = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-20))
        / jnp.maximum(theta_sq, 1e-20),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pose.dtype), W.shape)
    Vinv = eye - 0.5 * W + coeff[..., None] * W2
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, omega], axis=-1)


def boxplus(pose: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative update ``exp(xi) * pose`` used by all GN solvers."""
    return compose(exp(xi), pose)


def relative(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a * b^{-1}``: the motion taking frame b's camera to frame a's."""
    return compose(a, inverse(b))
