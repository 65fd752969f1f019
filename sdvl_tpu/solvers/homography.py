"""Two-view homography estimation + Faugeras decomposition, batched.

TPU-native replacement for the reference HomographyInit's math (reference
homography_init.cc): ``cv::findHomography`` RANSAC on unit-plane coords
(homography_init.cc:237-282) becomes a vmapped 4-point DLT RANSAC; the
Faugeras-Lustman SVD decomposition into 8 (R, t, n) candidates
(homography_init.cc:329-443) and visibility/Sampson scoring
(homography_init.cc:449-533) are batched over candidates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import geometry, se3


def dlt_homography(uv_a: jnp.ndarray, uv_b: jnp.ndarray,
                   weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted DLT: H such that uv_b ~ H uv_a (unit-plane homogeneous).

    Works for >= 4 correspondences; solved as the null vector of the 2Nx9
    design matrix via the smallest eigenvector of A^T A (9x9 — small enough
    that f32 eigh is fine, unlike the 4x4 triangulation case).
    """
    N = uv_a.shape[0]
    x, y = uv_a[:, 0], uv_a[:, 1]
    xp, yp = uv_b[:, 0], uv_b[:, 1]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -xp * x, -xp * y, -xp], -1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -yp * x, -yp * y, -yp], -1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2N, 9)
    w = jnp.concatenate([weights, weights], axis=0)
    AtA = jnp.einsum("ni,nj,n->ij", A, A, w)
    _, v = jnp.linalg.eigh(AtA)
    h = v[:, 0]
    H = h.reshape(3, 3)
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def transfer_error(H: jnp.ndarray, uv_a: jnp.ndarray,
                   uv_b: jnp.ndarray) -> jnp.ndarray:
    """Symmetric-ish forward transfer error |H a - b| on the unit plane."""
    ha = jnp.concatenate([uv_a, jnp.ones_like(uv_a[:, :1])], -1)
    hb = jnp.einsum("ij,nj->ni", H, ha)
    w = jnp.where(jnp.abs(hb[:, 2:3]) < 1e-12, 1e-12, hb[:, 2:3])
    return jnp.linalg.norm(hb[:, :2] / w - uv_b, axis=-1)


def ransac_homography(uv_a: jnp.ndarray, uv_b: jnp.ndarray,
                      valid: jnp.ndarray, key: jnp.ndarray,
                      n_hyp: int = 128, thresh: float = 2.0 / 525.0,
                      refine_iters: int = 2):
    """Fixed-shape RANSAC + weighted-DLT refinement.

    Equivalent of ``cv::findHomography(..., RANSAC)`` as called at
    homography_init.cc:237-282 but with all hypotheses evaluated as one
    vmapped batch. Returns (H, inlier_mask).
    """
    keys = jax.random.split(key, n_hyp)

    def one(k):
        # 4 distinct valid correspondences per hypothesis (Gumbel top-k)
        idx = geometry.sample_without_replacement(k, valid, 4)
        w = jnp.zeros_like(valid, jnp.float32).at[idx].set(1.0)
        H = dlt_homography(uv_a, uv_b, w)
        err = transfer_error(H, uv_a, uv_b)
        score = jnp.sum((err < thresh) & valid)
        return H, score

    Hs, scores = jax.vmap(one)(keys)
    H = Hs[jnp.argmax(scores)]

    inl = valid & (transfer_error(H, uv_a, uv_b) < thresh)
    for _ in range(refine_iters):
        H = dlt_homography(uv_a, uv_b, inl.astype(jnp.float32))
        inl = valid & (transfer_error(H, uv_a, uv_b) < thresh)
    return H, inl


class Decomposition(NamedTuple):
    R: jnp.ndarray  # (8, 3, 3)
    t: jnp.ndarray  # (8, 3)
    n: jnp.ndarray  # (8, 3)
    d: jnp.ndarray  # (8,)


def decompose_homography(H: jnp.ndarray) -> Decomposition:
    """Faugeras-Lustman SVD decomposition into 8 (R, t, n) candidates.

    Mirrors reference DecomposeHomography (homography_init.cc:329-443),
    including both the d>0 and d<0 families with the four epsilon sign
    combinations. Degenerate (near-equal singular value) cases produce
    numerically harmless duplicates rather than branches.
    """
    U, S, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    V = Vt.T

    d2sq = d2 * d2
    denom = jnp.maximum(d1 - d3, 1e-12) * jnp.maximum(d1 + d3, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2sq) / denom, 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2sq - d3 * d3) / denom, 0.0))

    eps = jnp.array([[1.0, 1.0], [1.0, -1.0], [-1.0, 1.0], [-1.0, -1.0]])
    e1, e3 = eps[:, 0], eps[:, 1]  # (4,)

    x1 = e1 * aux1
    x3 = e3 * aux3
    zero = jnp.zeros_like(x1)

    # --- d' = +d2 family ---
    aux_st = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2sq) * (d2sq - d3 * d3), 0.0)) / jnp.maximum((d1 + d3) * d2, 1e-12)
    st = e1 * e3 * aux_st
    ct = (d2sq + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    Rp = jnp.zeros((4, 3, 3))
    Rp = Rp.at[:, 0, 0].set(ct).at[:, 0, 2].set(-st)
    Rp = Rp.at[:, 1, 1].set(1.0)
    Rp = Rp.at[:, 2, 0].set(st).at[:, 2, 2].set(ct)
    tp = jnp.stack([x1, zero, -x3], -1) * (d1 - d3)
    np_ = jnp.stack([x1, zero, x3], -1)
    R_pos = s * jnp.einsum("ij,njk,lk->nil", U, Rp, V)
    t_pos = jnp.einsum("ij,nj->ni", U, tp)
    n_pos = jnp.einsum("ij,nj->ni", V, np_)
    d_pos = jnp.full((4,), s * d2)

    # --- d' = -d2 family ---
    aux_sp = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2sq) * (d2sq - d3 * d3), 0.0)) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sp = e1 * e3 * aux_sp
    cp = (d1 * d3 - d2sq) / jnp.maximum((d1 - d3) * d2, 1e-12)
    Rn = jnp.zeros((4, 3, 3))
    Rn = Rn.at[:, 0, 0].set(cp).at[:, 0, 2].set(sp)
    Rn = Rn.at[:, 1, 1].set(-1.0)
    Rn = Rn.at[:, 2, 0].set(sp).at[:, 2, 2].set(-cp)
    tn = jnp.stack([x1, zero, x3], -1) * (d1 + d3)
    R_neg = s * jnp.einsum("ij,njk,lk->nil", U, Rn, V)
    t_neg = jnp.einsum("ij,nj->ni", U, tn)
    n_neg = n_pos
    d_neg = jnp.full((4,), -s * d2)

    return Decomposition(
        R=jnp.concatenate([R_pos, R_neg]),
        t=jnp.concatenate([t_pos, t_neg]),
        n=jnp.concatenate([n_pos, n_neg]),
        d=jnp.concatenate([d_pos, d_neg]),
    )


def choose_decomposition(dec: Decomposition, uv_a: jnp.ndarray,
                         uv_b: jnp.ndarray, weights: jnp.ndarray):
    """Pick the (R, t) with the most in-front-of-both-cameras votes, ties by
    Sampson score — mirroring ChooseBestDecomposition
    (homography_init.cc:449-533). Returns pose_b_a (7,) with unit-norm t.
    """
    ha = jnp.concatenate([uv_a, jnp.ones_like(uv_a[:, :1])], -1)

    def score(R, t, n, d):
        # visibility: point on plane n.x = d; depth in a: d / (n . ray)
        denom = jnp.einsum("j,nj->n", n, ha)
        depth_a = d / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        p_a = ha * depth_a[:, None]
        p_b = jnp.einsum("ij,nj->ni", R, p_a) + t
        votes = jnp.sum(((p_a[:, 2] > 0) & (p_b[:, 2] > 0)) * weights)
        E = se3.hat(t) @ R
        samp = jnp.sum(geometry.sampson_error_unit_plane(E, uv_a, uv_b) * weights)
        return votes, samp

    votes, samps = jax.vmap(score)(dec.R, dec.t, dec.n, dec.d)
    # primary: votes; tiebreak: smaller sampson. combine into single key
    key = votes - samps / (jnp.max(samps) + 1e-12)
    best = jnp.argmax(key)
    R, t = dec.R[best], dec.t[best]
    tn = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return se3.from_rt(R, tn), votes[best]
