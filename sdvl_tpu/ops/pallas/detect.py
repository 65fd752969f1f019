"""Fused FAST-9/16 + Shi-Tomasi detection kernel.

One Pallas program computes, in a single pass with image rows resident in
VMEM, what the XLA path (ops/fast.py) expresses as ~100 separate full-image
ops: the 16-offset segment test, the structure-tensor min-eigenvalue score,
and the corner/score-threshold mask. The image is processed in row TILES
with a HALO of overlap rows DMA'd from HBM (whole-image single-block VMEM
residency OOMs: the kernel's ~40 live full-image f32 temporaries are ~50 MB
at 640x480 against the ~16 MB VMEM budget, so each tile keeps temporaries
at (TILE+2*HALO, W) instead).

Semantics match ops/fast.py exactly EXCEPT at the image border: this kernel
uses circular shifts within a tile and invalidates a ``_BORDER``-pixel
border (detectors ignore borders anyway; the reference's grid filter never
selects them either, fast_detector.cc:177-218 operates on interior cells).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (dx, dy) and the FAST-9 arc length — the
# same constants as ops/fast.py (reference fast_detector.cc uses OpenCV's
# FAST-9/16).
_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
_ARC = 9
_BORDER = 4   # stencil reach: FAST radius 3 < sobel(1) + box(half_box+1)
_HALO = 8     # overlap rows per tile (>= stencil reach, sublane-aligned)
_TILE = 64    # output rows per grid step


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Circular shift bringing pixel (y+dy, x+dx) to position (y, x).

    Hand-rolled concatenate instead of ``jnp.roll``: a tuple roll emits a
    zero-size slice for any zero component, which Mosaic rejects
    ("vector types must have positive constant sizes") — so this version
    only slices axes that actually move.
    """
    H, W = x.shape
    # concat([x[k:], x[:k]]) yields out[i] = x[i + k]; we want x[y + dy]
    if dy:
        k = dy % H
        x = jnp.concatenate([x[k:], x[:k]], axis=0)
    if dx:
        k = dx % W
        x = jnp.concatenate([x[:, k:], x[:, :k]], axis=1)
    return x


def _detect_block(f: jnp.ndarray, y0, img_h: int, img_w: int | None = None,
                  *, fast_threshold: float,
                  st_threshold: float, half_box: int) -> jnp.ndarray:
    """Masked score map for one row block whose first row is global ``y0``.

    ``img_h``/``img_w`` are the TRUE image dims — rows/cols at the global
    border (and any alignment padding) are invalidated here.
    """
    H, W = f.shape
    if img_w is None:
        img_w = W

    # ---- FAST-9/16 segment test (dense) ----
    # Count circular runs of >= _ARC brighter/darker neighbors. Instead of
    # the cumsum-window trick (needs a (17,H,W) stack), AND together the
    # _ARC consecutive comparisons for each of the 16 arc start positions —
    # 2*16*_ARC cheap VPU ops, zero extra HBM traffic.
    bright = []
    dark = []
    for dx, dy in _CIRCLE:
        nb = _shift(f, dy, dx)
        bright.append(nb > f + fast_threshold)
        dark.append(nb < f - fast_threshold)

    def any_arc(flags):
        # prefix-AND doubling: run-of-8 in 3 rounds, then extend to 9
        cur, run = list(flags), 1
        while run * 2 <= _ARC:
            cur = [cur[s] & cur[(s + run) % 16] for s in range(16)]
            run *= 2
        if run < _ARC:  # 8 -> 9: AND one more trailing flag
            cur = [cur[s] & flags[(s + run) % 16] for s in range(16)]
        hit = cur[0]
        for s in range(1, 16):
            hit = hit | cur[s]
        return hit

    corner = any_arc(bright) | any_arc(dark)

    # ---- Shi-Tomasi min-eigenvalue score (dense) ----
    # Identical math to ops/fast.py shi_tomasi: Sobel-smoothed central
    # differences, 2*half_box box sum, min eigenvalue of the 2x2 structure
    # tensor, OpenCV-compatible normalization.
    fy = _shift(f, 1, 0) - _shift(f, -1, 0)
    fx = _shift(f, 0, 1) - _shift(f, 0, -1)
    dx_ = 0.25 * (_shift(fx, -1, 0) + 2.0 * fx + _shift(fx, 1, 0))
    dy_ = 0.25 * (_shift(fy, 0, -1) + 2.0 * fy + _shift(fy, 0, 1))

    box = 2 * half_box

    def boxsum(x):
        v = jnp.zeros_like(x)
        for i in range(-half_box, half_box):
            v = v + _shift(x, i, 0)
        h = jnp.zeros_like(x)
        for j in range(-half_box, half_box):
            h = h + _shift(v, 0, j)
        return h

    dxx = boxsum(dx_ * dx_)
    dyy = boxsum(dy_ * dy_)
    dxy = boxsum(dx_ * dy_)
    tr = dxx + dyy
    det_term = jnp.sqrt(jnp.maximum((dxx - dyy) ** 2 + 4.0 * dxy * dxy, 0.0))
    score = 0.5 * (tr - det_term) / (box * box)

    # ---- fused mask (corner test + score threshold + GLOBAL border) ----
    yy = y0 + jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (
        (yy >= _BORDER) & (yy < img_h - _BORDER)
        & (xx >= _BORDER) & (xx < img_w - _BORDER)
    )
    keep = corner & interior & (score > st_threshold)
    return jnp.where(keep, score, -jnp.inf)


def _tiled_kernel(img_hbm, out_ref, scratch, sem, *, img_h: int,
                  img_w: int, fast_threshold: float, st_threshold: float,
                  half_box: int):
    """One grid step: DMA (TILE + 2*HALO) rows, compute, write the middle
    TILE rows (static slice — Mosaic has no dynamic_slice). The caller pads
    the image with a HALO of rows top AND bottom, so tile i's block simply
    starts at padded row i*TILE and the output is always rows
    [HALO, HALO+TILE). Double-buffering is pointless here — the compute is
    ~100x the DMA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    block = _TILE + 2 * _HALO
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * _TILE, block)], scratch, sem
    )
    dma.start()
    dma.wait()
    smap = _detect_block(
        scratch[:].astype(jnp.float32), i * _TILE - _HALO, img_h, img_w,
        fast_threshold=fast_threshold, st_threshold=st_threshold,
        half_box=half_box,
    )
    out_ref[:] = smap[_HALO: _HALO + _TILE]


def _single_kernel(img_ref, out_ref, *, img_h: int, fast_threshold: float,
                   st_threshold: float, half_box: int):
    out_ref[:] = _detect_block(
        img_ref[:].astype(jnp.float32), 0, img_h,
        fast_threshold=fast_threshold, st_threshold=st_threshold,
        half_box=half_box,
    )


@functools.partial(jax.jit, static_argnames=(
    "fast_threshold", "st_threshold", "half_box", "interpret"))
def fast_shi_tomasi_map(img: jnp.ndarray, fast_threshold: float = 10.0,
                        st_threshold: float = 50.0, half_box: int = 2,
                        interpret: bool = False) -> jnp.ndarray:
    """Masked Shi-Tomasi score map: ``score`` where the pixel passes the
    FAST test and the score threshold, ``-inf`` elsewhere.

    Feed directly to ``ops.fast._grid_best`` for per-cell selection. Set
    ``interpret=True`` to run on CPU (tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = img.shape
    if H <= _TILE + 2 * _HALO:
        # small image: one block fits VMEM comfortably
        kernel = functools.partial(
            _single_kernel, img_h=H, fast_threshold=float(fast_threshold),
            st_threshold=float(st_threshold), half_box=half_box,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(img)

    n_tiles = -(-H // _TILE)
    padded_h = n_tiles * _TILE
    padded_w = -(-W // 128) * 128  # DMA slices need 128-lane alignment
    # halo padding top AND bottom: tile i's block is padded rows
    # [i*TILE, i*TILE + TILE + 2*HALO), global rows i*TILE - HALO onward
    img_p = jnp.pad(img, ((_HALO, padded_h - H + _HALO),
                          (0, padded_w - W)))
    kernel = functools.partial(
        _tiled_kernel, img_h=H, img_w=W,
        fast_threshold=float(fast_threshold),
        st_threshold=float(st_threshold), half_box=half_box,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((padded_h, padded_w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_TILE, padded_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_TILE + 2 * _HALO, padded_w), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p)
    return out[:H, :W]
