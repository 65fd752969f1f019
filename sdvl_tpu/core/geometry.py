"""Batched multi-view geometry primitives.

TPU-native replacement for the reference's utils (reference extra/utils.{h,cc}):
projection Jacobians (utils.cc:99-131), midpoint/DLT triangulation
(utils.cc:133-191), two-view depth (utils.cc:193-205), parallax cosine
(utils.cc:207-213). Everything broadcasts/vmaps; no per-feature scalar loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3


def jacobian_unit_plane(p_cam: jnp.ndarray) -> jnp.ndarray:
    """d(unit-plane projection) / d(twist) for a left-multiplicative SE3 update.

    Returns ``(..., 2, 6)``. Twist order is [trans, rot] matching
    :func:`sdvl_tpu.core.se3.exp`. Mirrors reference utils.cc:99-118
    (Jacobian3DToPlane) up to our sign convention: residual = measured -
    projected, so solvers negate as needed.
    """
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    row0 = jnp.stack(
        [zi, zero, -x * zi2, -x * y * zi2, 1.0 + x * x * zi2, -y * zi], axis=-1
    )
    row1 = jnp.stack(
        [zero, zi, -y * zi2, -1.0 - y * y * zi2, x * y * zi2, x * zi], axis=-1
    )
    return jnp.stack([row0, row1], axis=-2)


def jacobian_point(pose_q: jnp.ndarray, p_cam: jnp.ndarray) -> jnp.ndarray:
    """d(unit-plane projection) / d(world point), ``(..., 2, 3)``.

    Chain rule: d(proj)/d(p_cam) @ R  (reference utils.cc:120-131). ``pose_q``
    is the world->cam pose quaternion part ``(...,4)``.
    """
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    dproj = jnp.stack(
        [
            jnp.stack([zi, zero, -x * zi2], axis=-1),
            jnp.stack([zero, zi, -y * zi2], axis=-1),
        ],
        axis=-2,
    )
    R = se3.matrix_from_quat(pose_q)
    return dproj @ R


def triangulate_midpoint(pose_rel: jnp.ndarray, bearing_ref: jnp.ndarray,
                         bearing_cur: jnp.ndarray) -> jnp.ndarray:
    """Midpoint triangulation in the *current* frame.

    ``pose_rel`` maps ref-frame coords to cur-frame coords. Solves
    ``min || (b_cur * d_cur) - (R b_ref * d_ref + t) ||`` for (d_cur, d_ref)
    by 2x2 normal equations, returns the midpoint in cur coordinates.
    Mirrors reference utils.cc:133-159.
    """
    R = se3.rotation(pose_rel)
    t = se3.translation(pose_rel)
    f2 = jnp.einsum("...ij,...j->...i", R, bearing_ref)
    f1 = bearing_cur
    # Solve [f1, -f2] [d1; d2] = t in least squares
    a11 = jnp.sum(f1 * f1, axis=-1)
    a12 = -jnp.sum(f1 * f2, axis=-1)
    a22 = jnp.sum(f2 * f2, axis=-1)
    b1 = jnp.sum(f1 * t, axis=-1)
    b2 = -jnp.sum(f2 * t, axis=-1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    d1 = (a22 * b1 - a12 * b2) / det
    d2 = (a11 * b2 - a12 * b1) / det
    p1 = f1 * d1[..., None]
    p2 = f2 * d2[..., None] + t
    return 0.5 * (p1 + p2)


def depth_from_triangulation(pose_rel: jnp.ndarray, bearing_ref: jnp.ndarray,
                             bearing_cur: jnp.ndarray) -> jnp.ndarray:
    """Depth of the point along ``bearing_ref`` in the *reference* frame.

    ``pose_rel`` maps ref coords to cur coords. Least-squares solve of
    ``[R b_ref, -b_cur] [d_ref; d_cur] = -t`` via 3x2 normal equations,
    mirroring reference utils.cc:193-205 (GetDepthFromTriangulation).
    Returns d_ref; negative/invalid geometry yields negative depths the
    caller masks out.
    """
    R = se3.rotation(pose_rel)
    t = se3.translation(pose_rel)
    f_ref = jnp.einsum("...ij,...j->...i", R, bearing_ref)
    a11 = jnp.sum(f_ref * f_ref, axis=-1)
    a12 = -jnp.sum(f_ref * bearing_cur, axis=-1)
    a22 = jnp.sum(bearing_cur * bearing_cur, axis=-1)
    b1 = -jnp.sum(f_ref * t, axis=-1)
    b2 = jnp.sum(bearing_cur * t, axis=-1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return (a22 * b1 - a12 * b2) / det


def triangulate_dlt(pose_a: jnp.ndarray, pose_b: jnp.ndarray,
                    uv_a: jnp.ndarray, uv_b: jnp.ndarray) -> jnp.ndarray:
    """SVD/DLT triangulation from two world->cam poses and unit-plane coords.

    Functional equivalent of reference utils.cc:161-191 for the two-view
    case. Returns world points ``(...,3)``. Rather than the homogeneous 4x4
    DLT eigenproblem (badly conditioned in f32 — the only precision TPUs
    like), we solve depth along the ``a``-frame bearing in the *relative*
    frame — numerically benign — and map back to world.
    """
    rel = se3.compose(pose_b, se3.inverse(pose_a))  # a-cam -> b-cam
    one = jnp.ones_like(uv_a[..., :1])
    ray_a = jnp.concatenate([uv_a, one], axis=-1)
    ray_b = jnp.concatenate([uv_b, one], axis=-1)
    b_a = ray_a / jnp.linalg.norm(ray_a, axis=-1, keepdims=True)
    b_b = ray_b / jnp.linalg.norm(ray_b, axis=-1, keepdims=True)
    d_a = depth_from_triangulation(rel, b_a, b_b)
    p_a_cam = b_a * d_a[..., None]
    return se3.transform(se3.inverse(pose_a), p_a_cam)


def parallax_cosine(p_world: jnp.ndarray, c_a: jnp.ndarray,
                    c_b: jnp.ndarray) -> jnp.ndarray:
    """Cosine of the angle at the point between two camera centers.

    Mirrors reference utils.cc:207-213.
    """
    ra = c_a - p_world
    rb = c_b - p_world
    na = jnp.linalg.norm(ra, axis=-1).clip(1e-12)
    nb = jnp.linalg.norm(rb, axis=-1).clip(1e-12)
    return jnp.sum(ra * rb, axis=-1) / (na * nb)


def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over valid entries of a fixed-size masked array.

    TPU-native stand-in for the reference's ``nth_element`` median
    (utils.cc:215-220): sort once, index the middle valid rank. Invalid slots
    sort to +inf.
    """
    big = jnp.asarray(jnp.inf, values.dtype)
    v = jnp.where(mask, values, big)
    v = jnp.sort(v, axis=-1)
    n = jnp.sum(mask, axis=-1)
    idx = jnp.maximum(n - 1, 0) // 2
    med = jnp.take_along_axis(v, idx[..., None], axis=-1)[..., 0]
    return jnp.where(n > 0, med, jnp.zeros_like(med))


def sampson_error_unit_plane(E: jnp.ndarray, uv_a: jnp.ndarray,
                             uv_b: jnp.ndarray) -> jnp.ndarray:
    """First-order Sampson distance for an essential/fundamental matrix on
    unit-plane coordinates; used to score homography decompositions
    (reference homography_init.cc:535-560 SampsonusError).
    ``uv_b^T E uv_a`` with uv homogeneous [x, y, 1].
    """
    ha = jnp.concatenate([uv_a, jnp.ones_like(uv_a[..., :1])], axis=-1)
    hb = jnp.concatenate([uv_b, jnp.ones_like(uv_b[..., :1])], axis=-1)
    Ea = jnp.einsum("...ij,...j->...i", E, ha)
    Etb = jnp.einsum("...ji,...j->...i", E, hb)
    num = jnp.einsum("...i,...i->...", hb, Ea) ** 2
    den = Ea[..., 0] ** 2 + Ea[..., 1] ** 2 + Etb[..., 0] ** 2 + Etb[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def fit_plane_ransac(pts: jnp.ndarray, valid: jnp.ndarray, key,
                     iters: int = 64, thresh: float = 0.05):
    """Dominant-plane fit: vmapped 3-point RANSAC + PCA refinement.

    The batched replacement for the reference's serial RANSAC plane search
    with unseeded rand() (Map::TransformInitialMap, map.cc:714-783): all
    ``iters`` minimal hypotheses are scored at once, then the winner's
    inliers are refined by one SVD (the reference's PCA step, map.cc:760-770).

    Returns ``(normal (3,) unit, d ()), inliers (N,)`` with the plane as
    ``n . p + d = 0``.
    """
    import jax

    N = pts.shape[0]
    k1, _ = jax.random.split(key)
    # 3 distinct VALID points per hypothesis (invalid slots are all-zero
    # placeholders — sampling them would let degenerate planes win)
    idx = jax.vmap(
        lambda kk: sample_without_replacement(kk, valid, 3)
    )(jax.random.split(k1, iters))

    def hypothesis(tri):
        a, b, c = pts[tri[0]], pts[tri[1]], pts[tri[2]]
        n = jnp.cross(b - a, c - a)
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
        d = -jnp.dot(n, a)
        dist = jnp.abs(pts @ n + d)
        score = jnp.sum((dist < thresh) & valid)
        return score, n, d

    scores, ns, ds = jax.vmap(hypothesis)(idx)
    best = jnp.argmax(scores)
    n, d = ns[best], ds[best]

    # PCA refinement on the consensus set
    w = ((jnp.abs(pts @ n + d) < thresh) & valid).astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    centroid = jnp.sum(pts * w[:, None], axis=0) / wsum
    centered = (pts - centroid) * w[:, None]
    cov = centered.T @ centered / wsum
    _, vecs = jnp.linalg.eigh(cov)
    n_ref = vecs[:, 0]  # smallest-eigenvalue direction
    n_ref = n_ref / jnp.maximum(jnp.linalg.norm(n_ref), 1e-12)
    # keep orientation consistent with the RANSAC winner
    n_ref = jnp.where(jnp.dot(n_ref, n) < 0, -n_ref, n_ref)
    d_ref = -jnp.dot(n_ref, centroid)
    inliers = (jnp.abs(pts @ n_ref + d_ref) < thresh) & valid
    return (n_ref, d_ref), inliers


def rotation_between(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Minimal rotation matrix taking unit vector ``a`` onto unit ``b``
    (Rodrigues; the reference's GetRotation, map.cc:793-820)."""
    v = jnp.cross(a, b)
    c = jnp.dot(a, b)
    s2 = jnp.dot(v, v)
    vx = jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])
    # guard the antiparallel case (c ~= -1): fall back to a 180-deg flip
    # about any axis orthogonal to a
    safe = s2 > 1e-12
    R = jnp.eye(3) + vx + vx @ vx * ((1.0 - c) / jnp.where(safe, s2, 1.0))
    ortho = jnp.where(jnp.abs(a[0]) < 0.9,
                      jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    axis = jnp.cross(a, ortho)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    flip = 2.0 * jnp.outer(axis, axis) - jnp.eye(3)
    return jnp.where(safe | (c > 0), R, flip)


def sample_without_replacement(key, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """``k`` DISTINCT indices drawn uniformly from the True entries of
    ``valid`` (Gumbel top-k: perturb a flat logit per valid entry with
    Gumbel noise, take the k largest). The reference gets distinct samples
    from ``random_shuffle`` (feature_align.cc:180); independent categorical
    draws would allow duplicates and rank-deficient minimal sets.

    When fewer than ``k`` entries are valid, invalid indices fill the tail
    (callers' consensus checks reject those hypotheses anyway).
    """
    g = jax.random.gumbel(key, valid.shape, jnp.float32)
    score = jnp.where(valid, g, -jnp.inf)
    _, idx = jax.lax.top_k(score, k)  # top_k positions are always distinct
    return idx
