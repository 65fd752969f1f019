"""Two-view map initialization: pyramidal flow + homography + triangulation.

TPU-native replacement for the reference's HomographyInit pipeline glue
(reference homography_init.cc): ``TrackSecondFrame`` pyramidal LK flow
(homography_init.cc:185-235, done there by cv::calcOpticalFlowPyrLK),
homography + decomposition (via sdvl_tpu.solvers.homography), inlier
triangulation and map-scale normalization (homography_init.cc:112-182).

Note: the reference additionally rotates the initial map so the dominant
plane is z=0 (Map::TransformInitialMap, map.cc:704-837). That step is
implemented in mapper.transform_initial_map and runs right after seeding
when ``Config.align_ground_plane`` is set (the default) — see
device_fsm.seed_map and sdvl.handle_frame, which also rebase the emitted
trajectory by the returned world transform. It is not part of THIS module
because it operates on the seeded MapState, not the two-view geometry.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import geometry, se3
from ..ops import interp
from ..solvers import homography, lk


def pyramidal_flow(pyr_a, pyr_b, xy_a: jnp.ndarray, valid: jnp.ndarray,
                   half: int = 4, iters: int = 12, start_level: int = 2,
                   max_err: float = 25.0, search_radius: int = 16):
    """Sparse optical flow a->b, coarse-to-fine (calcOpticalFlowPyrLK
    equivalent). Returns (xy_b (N,2) level-0 coords, ok (N,)).

    Large displacements: LK's basin of attraction is only ~the patch radius,
    so before descending the pyramid an exhaustive ZMSSD grid search at
    ``start_level`` (±``search_radius`` px there = ±radius*2^l at level 0)
    finds the basin — the batched, fixed-shape stand-in for OpenCV's big
    ``winSize`` (the reference uses winSize=30, homography_init.cc:198-204).

    Coarse levels only *warm-start* the estimate — a feature too close to a
    coarse-level border (patch clamps flat, LK stalls) is recovered at finer
    levels, so success is judged only at level 0: converged, in-bounds, and
    final photometric residual below ``max_err`` grey levels.
    """
    from ..ops import patch as patch_ops

    l0 = start_level
    ref_c = interp.extract_patches(pyr_a[l0], xy_a / (1 << l0), half)
    xy_c, _ = patch_ops.grid_search(
        pyr_b[l0], ref_c, xy_a / (1 << l0), search_radius
    )
    xy = xy_c * (1 << l0)
    for l in range(start_level, -1, -1):
        patches = interp.extract_patches(pyr_a[l], xy_a / (1 << l), half)
        res = lk.align_patches(
            pyr_b[l], patches, xy / (1 << l), valid,
            iters=iters, max_shift=jnp.inf,
        )
        # adopt the level's refinement only where it stayed sane
        sane = res.converged & (
            jnp.linalg.norm(res.xy * (1 << l) - xy, axis=-1) < 32.0
        )
        xy = jnp.where(sane[:, None], res.xy * (1 << l), xy)
        if l == 0:
            ok = valid & res.converged & (res.error < max_err)
    return xy, ok


class BootstrapResult(NamedTuple):
    ok_flow: jnp.ndarray       # () bool: enough flow survivors
    median_shift: jnp.ndarray  # () px
    pose2: jnp.ndarray         # (7,) second-camera pose (world = cam1)
    pts_w: jnp.ndarray         # (N, 3) triangulated world points
    px1: jnp.ndarray           # (N, 2) pixel in frame 1
    px2: jnp.ndarray           # (N, 2) pixel in frame 2
    inlier: jnp.ndarray        # (N,) bool
    n_inliers: jnp.ndarray     # () int32


def init_two_view(intr, pyr1, pyr2, corners_xy: jnp.ndarray,
                  corners_valid: jnp.ndarray, key: jnp.ndarray,
                  map_scale: float = 1.0, thresh_px: float = 2.0,
                  min_corners: int = 50) -> BootstrapResult:
    """Full second-frame initialization (reference InitSecondFrame,
    homography_init.cc:83-182) as one jitted program.

    The caller (host FSM) checks ``median_shift``/``n_inliers`` to decide
    RESET / RETRY / SUCCESS like sdvl.cc:150-161.
    """
    px2, flow_ok = pyramidal_flow(pyr1, pyr2, corners_xy, corners_valid)
    shift = jnp.linalg.norm(px2 - corners_xy, axis=-1)
    median_shift = geometry.masked_median(shift, flow_ok)

    uv1 = cam.unproject(intr, corners_xy)
    uv1 = uv1[:, :2] / uv1[:, 2:3]
    uv2 = cam.unproject(intr, px2)
    uv2 = uv2[:, :2] / uv2[:, 2:3]

    thresh = thresh_px / jnp.minimum(intr.fx, intr.fy)
    H, inl = homography.ransac_homography(uv1, uv2, flow_ok, key,
                                          thresh=thresh)
    dec = homography.decompose_homography(H)
    pose2, _votes = homography.choose_decomposition(
        dec, uv1, uv2, inl.astype(jnp.float32)
    )

    # triangulate inliers in world (= cam1) frame
    pts_w = geometry.triangulate_dlt(
        jnp.broadcast_to(se3.identity(), (uv1.shape[0], 7)),
        jnp.broadcast_to(pose2, (uv1.shape[0], 7)),
        uv1, uv2,
    )
    p1 = pts_w  # cam1 == world
    p2 = se3.transform(pose2[None], pts_w)
    good = inl & (p1[:, 2] > 1e-3) & (p2[:, 2] > 1e-3)

    # rescale so median depth == map_scale (homography_init.cc:112-121)
    med_depth = geometry.masked_median(p1[:, 2], good)
    scale = map_scale / jnp.maximum(med_depth, 1e-6)
    pts_w = pts_w * scale
    pose2 = jnp.concatenate([pose2[:4], pose2[4:] * scale])

    return BootstrapResult(
        ok_flow=jnp.sum(flow_ok) >= min_corners,
        median_shift=median_shift,
        pose2=pose2,
        pts_w=pts_w,
        px1=corners_xy,
        px2=px2,
        inlier=good,
        n_inliers=jnp.sum(good).astype(jnp.int32),
    )
