"""Patch extraction, affine warping, and ZMSSD scoring — batched.

TPU-native replacement for the reference Matcher's patch machinery:
``WarpMatrixAffine`` (matcher.cc:293-312), ``GetSearchLevel``
(matcher.cc:314-323), ``CreatePatch`` warping (matcher.cc:325-357) and the
ZMSSD scorer (matcher.cc:447-476). The reference warps one 8x8 patch at a
time in scalar loops; here every (point, candidate) pair is a lane in a
batched gather + reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import se3
from . import interp


def warp_matrix_affine(intr, px_ref: jnp.ndarray, level_ref: jnp.ndarray,
                       depth_ref: jnp.ndarray, pose_cur_ref: jnp.ndarray,
                       ) -> jnp.ndarray:
    """First-order affine warp A_cur_ref (..., 2, 2) between views.

    Finite-difference construction mirroring reference matcher.cc:293-312:
    project the patch corner offsets (halfpatch+border px at the feature's
    level) through ref-depth into the current view and difference.
    ``pose_cur_ref`` maps ref-cam coords to cur-cam coords.
    """
    du = (5.0) * jnp.exp2(level_ref.astype(jnp.float32))  # halfpatch+1 at level
    bearing_c = cam.unproject(intr, px_ref)
    xyz_ref = bearing_c * (depth_ref / bearing_c[..., 2])[..., None]

    def _project_offset(offset):
        b = cam.unproject(intr, px_ref + offset)
        xyz = b * (xyz_ref[..., 2] / b[..., 2])[..., None]
        return cam.project(intr, se3.transform(pose_cur_ref, xyz))

    px_cur = cam.project(intr, se3.transform(pose_cur_ref, xyz_ref))
    dx = (_project_offset(jnp.stack([du, jnp.zeros_like(du)], -1)) - px_cur) / du[..., None]
    dy = (_project_offset(jnp.stack([jnp.zeros_like(du), du], -1)) - px_cur) / du[..., None]
    return jnp.stack([dx, dy], axis=-1)  # columns are image-x/image-y derivs


def search_level_from_warp(A: jnp.ndarray, max_level: int = 4) -> jnp.ndarray:
    """Best pyramid level to search in, from the warp determinant.

    Mirrors reference matcher.cc:314-323: halve until det/4^l <= 3.
    Branch-free: level = ceil(log4(det/3)) clamped to [0, max_level].
    """
    det = jnp.abs(A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0])
    lvl = jnp.ceil(jnp.log2(jnp.maximum(det / 3.0, 1e-6)) * 0.5)
    return jnp.clip(lvl, 0, max_level).astype(jnp.int32)


def warp_patch(img_ref: jnp.ndarray, A_ref_cur: jnp.ndarray,
               px_ref_level: jnp.ndarray, half: int) -> jnp.ndarray:
    """Warp a square patch from the reference image.

    For each output-patch offset ``o`` (in the *current* view's search level),
    sample the reference image at ``px_ref_level + A_ref_cur @ o``. Batched
    over leading dims of ``A_ref_cur``/``px_ref_level``. Returns
    (..., 2*half, 2*half).

    Equivalent to reference CreatePatch (matcher.cc:325-357) which iterates
    patch pixels serially per feature.
    """
    s = 2 * half
    d = jnp.arange(s, dtype=jnp.float32) - half
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([ox, oy], axis=-1).reshape(s * s, 2)  # (P,2)
    warped = jnp.einsum("...ij,pj->...pi", A_ref_cur, offs)
    pos = px_ref_level[..., None, :] + warped  # (..., P, 2)
    vals = interp.bilinear(img_ref, pos)
    return vals.reshape(vals.shape[:-1] + (s, s))


def grid_search(img: jnp.ndarray, ref_patches: jnp.ndarray,
                xy: jnp.ndarray, radius: int, step: float = 1.0):
    """Exhaustive integer-offset patch search around ``xy``, batched.

    For each feature, scores ZMSSD of ``ref_patches`` (N, s, s) against the
    (2*radius+1)^2 offset grid in ``img`` and returns the best position
    ``(xy_best (N,2), score_best (N,))``. This is the translation-only,
    fixed-shape analog of widening an LK search window (OpenCV winSize):
    N x G^2 x s^2 fused multiply-adds — dense, branch-free, ideal VPU work —
    replacing the serial early-exit candidate scans of reference
    matcher.cc:123-230.
    """
    g = jnp.arange(-radius, radius + 1, dtype=jnp.float32) * step
    oy, ox = jnp.meshgrid(g, g, indexing="ij")
    offs = jnp.stack([ox, oy], axis=-1).reshape(-1, 2)          # (G,2)
    pos = xy[:, None, :] + offs[None]                           # (N,G,2)
    s = ref_patches.shape[-1]
    half = s // 2
    cur = interp.extract_patches(img, pos.reshape(-1, 2), half)
    cur = cur.reshape(xy.shape[0], offs.shape[0], s, s)         # (N,G,s,s)
    score = zmssd(ref_patches[:, None], cur)                    # (N,G)
    best = jnp.argmin(score, axis=1)
    xy_best = jnp.take_along_axis(pos, best[:, None, None], axis=1)[:, 0]
    return xy_best, jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]


def zmssd(ref_patch: jnp.ndarray, cur_patch: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean SSD between patches; broadcasts over leading dims.

    Mirrors reference GetZMSSDScore (matcher.cc:447-476). Lower is better.
    """
    r = ref_patch - jnp.mean(ref_patch, axis=(-2, -1), keepdims=True)
    c = cur_patch - jnp.mean(cur_patch, axis=(-2, -1), keepdims=True)
    return jnp.sum((r - c) ** 2, axis=(-2, -1))
