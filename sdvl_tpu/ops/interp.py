"""Bilinear image sampling — the workhorse gather behind every aligner.

TPU-native replacement for the reference's scalar ``Interpolate8U``
(reference extra/utils.cc:44-59) and the hand-unrolled bilinear taps inside
ImageAlign/Matcher. Works on arbitrary batches of sample positions against a
single image; gathers lower to XLA dynamic-gathers that pipeline well from
HBM. Out-of-bounds samples clamp to the edge; callers mask validity
separately (masks, not branches — the TPU way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pyr_meta(pyr):
    """Static per-level (flat offset, H, W) tables as NUMPY constants.

    Numpy on purpose: these are closed over / inlined into jitted code, and
    device-array constants poison the TPU runtime (ops/pyramid.py docstring).
    """
    Hs = np.asarray([p.shape[-2] for p in pyr], np.int32)
    Ws = np.asarray([p.shape[-1] for p in pyr], np.int32)
    offs = np.concatenate([[0], np.cumsum(Hs.astype(np.int64) * Ws)[:-1]])
    return offs.astype(np.int32), Hs, Ws


def _flat_level_index(pyr, level, xy_l0):
    """Shared index math for flat-pyramid sampling.

    Returns (idx00, idx01, idx10, idx11, wx, wy) flat indices into the
    level-concatenated buffer for the 4 bilinear taps of each sample, with
    per-element pyramid ``level``. One gather per tap regardless of the
    number of levels — the levels-times-redundant sample-then-select of the
    naive approach is gone.
    """
    offs, Hs, Ws = _pyr_meta(pyr)
    lvl = jnp.broadcast_to(level, xy_l0.shape[:-1]).astype(jnp.int32)
    off = jnp.take(offs, lvl)
    H = jnp.take(Hs, lvl)
    W = jnp.take(Ws, lvl)
    scale = jnp.exp2(-lvl.astype(jnp.float32))
    x = xy_l0[..., 0] * scale
    y = xy_l0[..., 1] * scale
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx, wy = x - x0, y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)
    idx00 = off + y0i * W + x0i
    idx01 = off + y0i * W + x1i
    idx10 = off + y1i * W + x0i
    idx11 = off + y1i * W + x1i
    return idx00, idx01, idx10, idx11, wx, wy


def bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` (H, W) at positions ``xy`` (..., 2) given as (x, y).

    Returns samples of shape ``(...)`` in img's dtype promoted to f32.
    """
    H, W = img.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)
    wy = (y - y0)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    f = img.astype(jnp.float32)
    v00 = f[y0i, x0i]
    v01 = f[y0i, x1i]
    v10 = f[y1i, x0i]
    v11 = f[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def nearest(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-pixel sampling via ONE flat gather.

    For integer-tap reads (the reference reads ``image.at<uchar>(cvRound(x))``
    throughout ORB, orb_detector.cc:350-437) a single rounded gather is 4x
    cheaper than :func:`bilinear` — gathers dominate the tracker's runtime.
    """
    H, W = img.shape
    xi = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, H - 1)
    return img.reshape(-1).astype(jnp.float32)[yi * W + xi]


def bilinear_with_grad(img: jnp.ndarray, xy: jnp.ndarray):
    """Sample intensity and central-difference image gradient at ``xy``.

    Returns ``(val (...,), grad (..., 2))`` with grad = (dI/dx, dI/dy).
    Gradient is computed by sampling the bilinear surface at +-0.5 px —
    matching the half-pixel central differences the reference uses when
    precomputing alignment Jacobians (image_align.cc:240-255).
    """
    val = bilinear(img, xy)
    dx = 0.5 * (
        bilinear(img, xy + jnp.array([0.5, 0.0], xy.dtype))
        - bilinear(img, xy - jnp.array([0.5, 0.0], xy.dtype))
    ) * 2.0
    dy = 0.5 * (
        bilinear(img, xy + jnp.array([0.0, 0.5], xy.dtype))
        - bilinear(img, xy - jnp.array([0.0, 0.5], xy.dtype))
    ) * 2.0
    return val, jnp.stack([dx, dy], axis=-1)


def remap(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Dense remap: sample img at ``grid`` (H', W', 2) of (x, y) positions.

    Used for full-image undistortion (reference camera.cc:100-105 uses
    ``cv::undistort`` per frame; we apply a precomputed map in one gather).
    """
    return bilinear(img, grid)


def patch_grid(center_xy: jnp.ndarray, half: int, dtype=jnp.float32):
    """Pixel offsets for a ``(2*half) x (2*half)`` patch centered at
    ``center_xy`` (..., 2). Returns positions of shape (..., s, s, 2).

    Offsets run over ``[-half, half)`` matching the reference's patch loops
    (image_align.cc:151-166 iterates y,x in [-halfpatch, halfpatch)).
    """
    s = 2 * half
    d = jnp.arange(s, dtype=dtype) - half
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([ox, oy], axis=-1)  # (s, s, 2)
    return center_xy[..., None, None, :] + offs


def extract_patches(img: jnp.ndarray, centers: jnp.ndarray, half: int):
    """Bilinearly sample square patches at subpixel ``centers`` (N, 2).

    Returns (N, 2*half, 2*half) f32.
    """
    pos = patch_grid(centers, half)
    return bilinear(img, pos)


def bilinear_indexed(imgs: jnp.ndarray, k: jnp.ndarray,
                     xy: jnp.ndarray) -> jnp.ndarray:
    """Sample a *stack* of images (K, H, W) — image ``k[i]`` at ``xy[i]``.

    ``k`` broadcasts against the leading dims of ``xy``. One fused gather:
    this is how per-point anchor-keyframe patches are read out of the
    keyframe store without materializing (N, H, W) copies.
    """
    K, H, W = imgs.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx, wy = x - x0, y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    kk = jnp.broadcast_to(k, x0i.shape)
    v00 = imgs[kk, y0i, x0i].astype(jnp.float32)
    v01 = imgs[kk, y0i, x1i].astype(jnp.float32)
    v10 = imgs[kk, y1i, x0i].astype(jnp.float32)
    v11 = imgs[kk, y1i, x1i].astype(jnp.float32)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_indexed_pyramid(pyr_stack, k: jnp.ndarray, level: jnp.ndarray,
                             xy_l0: jnp.ndarray) -> jnp.ndarray:
    """Stacked-pyramid sampling with per-element image index AND level.

    ``pyr_stack`` is a tuple of (K, H/2^l, W/2^l) arrays. ``level``
    broadcasts against ``xy_l0``'s leading dims (level-0 coordinates).

    Implementation: all levels of each keyframe flattened into one
    (K, total) buffer, four taps gathered by computed flat index — 4 gathers
    total instead of 4 per level (sample-all-then-select). Gathers are the
    dominant cost of the whole tracker; this is the difference between
    ~250 ms and tens of ms per mapper step on real hardware.
    """
    K = pyr_stack[0].shape[0]
    flat = jnp.concatenate([p.reshape(K, -1) for p in pyr_stack], axis=1)
    i00, i01, i10, i11, wx, wy = _flat_level_index(pyr_stack, level, xy_l0)
    kk = jnp.broadcast_to(k, i00.shape)
    # gather THEN convert: the store may be uint8 (kf_pyr) — converting
    # first would materialize a f32 copy of the whole keyframe store
    v00 = flat[kk, i00].astype(jnp.float32)
    v01 = flat[kk, i01].astype(jnp.float32)
    v10 = flat[kk, i10].astype(jnp.float32)
    v11 = flat[kk, i11].astype(jnp.float32)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_pyramid(pyr, level: jnp.ndarray, xy_l0: jnp.ndarray) -> jnp.ndarray:
    """Sample a pyramid at a *per-element dynamic* level.

    ``pyr`` is a tuple of (H/2^l, W/2^l) images; ``level`` broadcasts against
    the leading dims of ``xy_l0`` (level-0 pixel coords). Pyramid levels have
    different static shapes, so a dynamic level index is impossible on the
    tuple — instead the levels are flattened into ONE 1-D buffer and the
    four bilinear taps are gathered by computed flat index: 4 gathers total,
    versus 4 *per level* for the sample-everything-then-select approach.
    (The reference's scalar code branches per feature, matcher.cc:123-230.)
    """
    flat = jnp.concatenate([p.reshape(-1) for p in pyr])
    i00, i01, i10, i11, wx, wy = _flat_level_index(pyr, level, xy_l0)
    v00 = flat[i00].astype(jnp.float32)
    v01 = flat[i01].astype(jnp.float32)
    v10 = flat[i10].astype(jnp.float32)
    v11 = flat[i11].astype(jnp.float32)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def extract_patches_pyramid(pyr, level: jnp.ndarray, centers_l0: jnp.ndarray,
                            half: int):
    """Square patches sampled at each feature's own pyramid level.

    ``centers_l0`` (N, 2) in level-0 coords; patch offsets are applied in
    *level* pixels (so the patch covers 2^l times more level-0 area at
    level l). Returns (N, s, s).
    """
    s = 2 * half
    d = jnp.arange(s, dtype=jnp.float32) - half
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([ox, oy], axis=-1)  # (s, s, 2)
    # positions expressed in LEVEL-0 coords with LEVEL-pixel offsets: add
    # offs * 2^l, then the flat sampler rescales back — one gather set.
    scale = jnp.exp2(level.astype(jnp.float32))[:, None, None, None]
    pos_l0 = centers_l0[:, None, None, :] + offs[None] * scale
    return bilinear_pyramid(pyr, level[:, None, None], pos_l0)
