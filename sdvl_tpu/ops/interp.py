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
    f = imgs.astype(jnp.float32)
    v00 = f[kk, y0i, x0i]
    v01 = f[kk, y0i, x1i]
    v10 = f[kk, y1i, x0i]
    v11 = f[kk, y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_indexed_pyramid(pyr_stack, k: jnp.ndarray, level: jnp.ndarray,
                             xy_l0: jnp.ndarray) -> jnp.ndarray:
    """Stacked-pyramid sampling with per-element image index AND level.

    ``pyr_stack`` is a tuple of (K, H/2^l, W/2^l) arrays. ``level``
    broadcasts against ``xy_l0``'s leading dims (level-0 coordinates).
    """
    out = None
    for l, imgs in enumerate(pyr_stack):
        v = bilinear_indexed(imgs, k, xy_l0 / (1 << l))
        out = v if out is None else jnp.where(level == l, v, out)
    return out


def bilinear_pyramid(pyr, level: jnp.ndarray, xy_l0: jnp.ndarray) -> jnp.ndarray:
    """Sample a pyramid at a *per-element dynamic* level.

    ``pyr`` is a tuple of (H/2^l, W/2^l) images; ``level`` broadcasts against
    the leading dims of ``xy_l0`` (level-0 pixel coords). Pyramid levels have
    different static shapes, so a dynamic index is impossible; instead every
    level is sampled and the result selected per lane — levels is small (5)
    and the VPU eats the redundancy, which beats host-side bucketing by level
    (the reference's scalar code just branches per feature,
    matcher.cc:123-230).
    """
    out = None
    for l, img in enumerate(pyr):
        v = bilinear(img, xy_l0 / (1 << l))
        out = v if out is None else jnp.where(level == l, v, out)
    return out


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
    out = None
    for l, img in enumerate(pyr):
        pos = centers_l0[:, None, None, :] / (1 << l) + offs[None]
        v = bilinear(img, pos)
        sel = (level == l)[:, None, None]
        out = v if out is None else jnp.where(sel, v, out)
    return out
