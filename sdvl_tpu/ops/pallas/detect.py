"""Fused FAST-9/16 + Shi-Tomasi detection kernel.

One Pallas program computes, in a single pass with the image resident in
VMEM, what the XLA path (ops/fast.py) expresses as ~100 separate full-image
ops: the 16-offset segment test, the structure-tensor min-eigenvalue score,
and the corner/score-threshold mask. A 640x480 f32 level is 1.2 MB — far
under the ~16 MB VMEM budget — so the kernel reads HBM once and writes once
(the masked score map), instead of materializing the (16, H, W) neighbor
stack and a dozen intermediates.

Semantics match ops/fast.py exactly EXCEPT at the image border: this kernel
uses circular shifts and then invalidates a 3-pixel border (detectors ignore
borders anyway; the reference's grid filter never selects them either,
fast_detector.cc:177-218 operates on interior cells).
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
_BORDER = 3


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Circular shift bringing pixel (y+dy, x+dx) to position (y, x)."""
    return jnp.roll(x, (-dy, -dx), axis=(0, 1))


def _detect_kernel(img_ref, out_ref, *, fast_threshold: float,
                   st_threshold: float, half_box: int):
    f = img_ref[:].astype(jnp.float32)
    H, W = f.shape

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

    # ---- fused mask (corner test + score threshold + border) ----
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (
        (yy >= _BORDER) & (yy < H - _BORDER)
        & (xx >= _BORDER) & (xx < W - _BORDER)
    )
    keep = corner & interior & (score > st_threshold)
    out_ref[:] = jnp.where(keep, score, -jnp.inf)


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

    kernel = functools.partial(
        _detect_kernel, fast_threshold=float(fast_threshold),
        st_threshold=float(st_threshold), half_box=half_box,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(img.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img)
