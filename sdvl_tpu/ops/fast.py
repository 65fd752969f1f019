"""FAST-9/16 corner detection + Shi-Tomasi scoring + grid selection.

TPU-native replacement for the reference's FastDetector (reference
extra/fast_detector.{h,cc}): per-cell OpenCV FAST calls (fast_detector.cc:
58-106), per-cell best-Shi-Tomasi filtering (fast_detector.cc:177-218) and
cell locking (fast_detector.cc:48-56). The C++ walks cells in scalar loops;
here the segment test is evaluated *densely* for every pixel as 16 shifted
image planes on the VPU, Shi-Tomasi is three convolutions, and grid selection
is a single reshape+argmax — everything static-shape, one corner slot per
grid cell per pyramid level (a fixed capacity that doubles as the
reference's per-cell quota, fast_detector.cc:108-135).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 — the 16 segment-test offsets (dx, dy).
_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
_ARC = 9  # FAST-9: need 9 contiguous brighter/darker pixels


class Corners(NamedTuple):
    """Fixed-capacity corner set. One slot per grid cell per level."""

    xy: jnp.ndarray      # (N, 2) position at level-0 coordinates, f32
    score: jnp.ndarray   # (N,) Shi-Tomasi score
    level: jnp.ndarray   # (N,) pyramid level, int32
    valid: jnp.ndarray   # (N,) bool


def _shifted_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W) stack of the circle-offset neighbours of each pixel."""
    H, W = img.shape
    pad = jnp.pad(img, 3, mode="edge")
    planes = [pad[3 + dy: 3 + dy + H, 3 + dx: 3 + dx + W] for dx, dy in _CIRCLE]
    return jnp.stack(planes, axis=0)


def fast_corner_mask(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9/16 segment test. Returns (H, W) bool.

    Functionally equivalent to the OpenCV ``FAST()`` the reference calls per
    cell (fast_detector.cc:88), evaluated for all pixels at once.
    """
    nb = _shifted_stack(img)
    c = img[None]
    bright = (nb > c + threshold).astype(jnp.int32)
    dark = (nb < c - threshold).astype(jnp.int32)

    def _has_arc(mask16):
        # circular run of >= _ARC: windowed sums over the wrapped sequence
        wrapped = jnp.concatenate([mask16, mask16[: _ARC - 1]], axis=0)
        cs = jnp.cumsum(wrapped, axis=0)
        cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
        window = cs[_ARC:] - cs[:-_ARC]  # (16, H, W)
        return jnp.any(window >= _ARC, axis=0)

    return _has_arc(bright) | _has_arc(dark)


def shi_tomasi(img: jnp.ndarray, half_box: int = 2) -> jnp.ndarray:
    """Dense min-eigenvalue (Shi-Tomasi) response map, (H, W).

    Mirrors reference utils.cc:61-97: central-difference derivatives, a
    ``2*half_box`` box sum of the structure tensor, min-eigenvalue normalized
    by the window area.
    """
    f = img.astype(jnp.float32)
    # Sobel 3x3 (smoothed central difference) — matches the derivative the
    # OpenCV oracle (cornerMinEigenVal ksize=3) and the reference's detector
    # effectively rank corners by.
    fy = jnp.roll(f, -1, axis=0) - jnp.roll(f, 1, axis=0)
    fx = jnp.roll(f, -1, axis=1) - jnp.roll(f, 1, axis=1)
    dx = 0.25 * (jnp.roll(fx, 1, axis=0) + 2.0 * fx + jnp.roll(fx, -1, axis=0))
    dy = 0.25 * (jnp.roll(fy, 1, axis=1) + 2.0 * fy + jnp.roll(fy, -1, axis=1))
    box = 2 * half_box

    def _boxsum(x):
        # Even-sized window anchored like OpenCV boxFilter: spans
        # [i - box/2, i + box/2 - 1] in each axis. Shift-add with scalar
        # weights — no device-array kernel constants (see ops/pyramid.py
        # docstring for the TPU-runtime poisoning this avoids).
        H, W = x.shape
        p = jnp.pad(x, ((half_box, half_box - 1), (0, 0)))
        v = sum(p[i : i + H] for i in range(box))
        p = jnp.pad(v, ((0, 0), (half_box, half_box - 1)))
        return sum(p[:, i : i + W] for i in range(box))

    dxx = _boxsum(dx * dx)
    dyy = _boxsum(dy * dy)
    dxy = _boxsum(dx * dy)
    norm = 1.0 / (2.0 * box * box)
    tr = dxx + dyy
    det_term = jnp.sqrt(jnp.maximum((dxx - dyy) ** 2 + 4.0 * dxy * dxy, 0.0))
    return 0.5 * (tr - det_term) * norm * 2.0


def _grid_best(score_map: jnp.ndarray, mask: jnp.ndarray, cell: int):
    """Best-scoring masked pixel per cell. Returns (gh*gw,) xy/score/valid.

    The image is cropped to a whole number of cells; border remnants are
    ignored exactly like cells the reference never fills.
    """
    H, W = score_map.shape
    gh, gw = H // cell, W // cell
    s = jnp.where(mask, score_map, -jnp.inf)
    s = s[: gh * cell, : gw * cell].reshape(gh, cell, gw, cell)
    s = s.transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    idx = jnp.argmax(s, axis=1)
    best = jnp.take_along_axis(s, idx[:, None], axis=1)[:, 0]
    cy, cx = idx // cell, idx % cell
    gy = jnp.arange(gh * gw) // gw
    gx = jnp.arange(gh * gw) % gw
    x = (gx * cell + cx).astype(jnp.float32)
    y = (gy * cell + cy).astype(jnp.float32)
    valid = jnp.isfinite(best)
    return jnp.stack([x, y], axis=-1), jnp.where(valid, best, 0.0), valid


def detect_level(img: jnp.ndarray, level: int, cell: int = 32,
                 fast_threshold: float = 10.0, st_threshold: float = 50.0,
                 locked_cells: jnp.ndarray | None = None,
                 use_pallas: bool = False) -> Corners:
    """Detect corners on one pyramid level; one slot per grid cell.

    ``locked_cells`` is an optional (gh*gw,) bool of cells to suppress —
    the TPU-native equivalent of the reference's LockCell for cells already
    holding tracked features (fast_detector.cc:48-56, frame.cc:141-144).
    Positions are reported in level-0 pixel coordinates (scaled by 2**level),
    matching reference corner bookkeeping (frame.h stores level-0 coords).

    ``use_pallas`` routes the dense FAST+Shi-Tomasi pass through the fused
    VMEM-resident kernel (ops/pallas/detect.py) — one HBM read/write
    instead of the (16, H, W) neighbor stack; semantics differ only in a
    4-pixel border (invalid there, which grid selection ignores anyway).
    """
    if use_pallas:
        from .pallas.detect import fast_shi_tomasi_map

        smap = fast_shi_tomasi_map(img, fast_threshold, st_threshold)
        xy, best, valid = _grid_best(smap, jnp.isfinite(smap), cell)
    else:
        corner = fast_corner_mask(img, fast_threshold)
        score = shi_tomasi(img)
        xy, best, valid = _grid_best(score, corner, cell)
    valid = valid & (best > st_threshold)
    if locked_cells is not None:
        valid = valid & ~locked_cells
    scale = jnp.float32(1 << level)
    n = xy.shape[0]
    return Corners(
        xy=xy * scale,
        score=best,
        level=jnp.full((n,), level, jnp.int32),
        valid=valid,
    )


def detect_pyramid(pyr: Sequence[jnp.ndarray], levels: int = 3,
                   cell: int = 32, fast_threshold: float = 10.0,
                   st_threshold: float = 50.0,
                   max_features: int | None = None,
                   use_pallas: bool = False,
                   lock_xy: jnp.ndarray | None = None,
                   lock_valid: jnp.ndarray | None = None) -> Corners:
    """Detect over the first ``levels`` pyramid levels and concatenate.

    Mirrors reference DetectPyramid (fast_detector.cc:154-175) which detects
    on 3 levels; capacity control is structural (cells) rather than the
    reference's mutable per-cell quotas. ``max_features`` caps the total
    corner budget like the reference's ``Config::NumFeatures``
    (fast_detector.cc:108-151 retainBest): when the cell capacity exceeds
    it, only the ``max_features`` best-scoring corners survive (static
    top-k, so the output shape is ``min(cells*levels, max_features)``).

    ``lock_xy``/``lock_valid`` (level-0 px, (M, 2)/(M,)) suppress corners
    in LEVEL-0 grid cells already holding tracked features — the
    reference's LockCell pass (fast_detector.cc:48-56, frame.cc:141-144
    operates one grid in level-0 coordinates regardless of corner level) —
    so both the surviving winners and the ``max_features`` budget shift to
    uncovered image regions instead of re-detecting what is already
    tracked. The lock granularity is deliberately level-0 cells applied to
    each corner's level-0 position AFTER per-cell selection: locking each
    level's own covering cell instead would black out entire coarse levels
    (one level-2 cell spans 16 level-0 cells; a normal match set would
    suppress every coarse corner, starving candidate seeding — measured as
    a 5x ATE regression on the eviction-churn test).
    """
    parts = [
        detect_level(pyr[l], l, cell=cell, fast_threshold=fast_threshold,
                     st_threshold=st_threshold, use_pallas=use_pallas)
        for l in range(levels)
    ]
    out = Corners(
        xy=jnp.concatenate([p.xy for p in parts]),
        score=jnp.concatenate([p.score for p in parts]),
        level=jnp.concatenate([p.level for p in parts]),
        valid=jnp.concatenate([p.valid for p in parts]),
    )
    if lock_xy is not None:
        H0, W0 = pyr[0].shape
        gw0, gh0 = W0 // cell, H0 // cell
        occ0 = occupied_cells(lock_xy, lock_valid, H0, W0, cell)
        cx = jnp.clip((out.xy[:, 0] // cell).astype(jnp.int32), 0, gw0 - 1)
        cy = jnp.clip((out.xy[:, 1] // cell).astype(jnp.int32), 0, gh0 - 1)
        out = out._replace(valid=out.valid & ~occ0[cy * gw0 + cx])
    if max_features is not None and max_features < out.xy.shape[0]:
        key = jnp.where(out.valid, out.score, -jnp.inf)
        _, keep = jax.lax.top_k(key, max_features)
        out = Corners(xy=out.xy[keep], score=out.score[keep],
                      level=out.level[keep], valid=out.valid[keep])
    return out


def occupied_cells(feature_xy: jnp.ndarray, feature_valid: jnp.ndarray,
                   height: int, width: int, cell: int) -> jnp.ndarray:
    """(gh*gw,) bool mask of grid cells containing a valid feature.

    Scatter-based replacement for the reference's LockCell bookkeeping.
    ``feature_xy`` is in level-0 coordinates. Features in the border
    remnant the grid does not cover (e.g. y in [gh*cell, height)) lock NO
    cell — clipping them in would wrongly suppress the last in-grid
    row/column (round-4 advisor finding).
    """
    gh, gw = height // cell, width // cell
    in_grid = ((feature_xy[:, 0] >= 0) & (feature_xy[:, 0] < gw * cell)
               & (feature_xy[:, 1] >= 0) & (feature_xy[:, 1] < gh * cell))
    cx = jnp.clip((feature_xy[:, 0] // cell).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((feature_xy[:, 1] // cell).astype(jnp.int32), 0, gh - 1)
    flat = cy * gw + cx
    occ = jnp.zeros((gh * gw,), jnp.int32)
    occ = occ.at[flat].add((feature_valid & in_grid).astype(jnp.int32))
    return occ > 0
