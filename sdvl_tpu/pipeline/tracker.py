"""Per-frame tracking step: direct alignment -> matching -> robust pose.

TPU-native replacement for the reference's per-frame pipeline
(SDVL::ProcessFrame, sdvl.cc:179-203): ImageAlign::ComputePose against the
last frame, FeatureAlign::Reproject matching against the map, then the
robust pose optimization — fused here into ONE jitted program per frame so
the hot path never round-trips to the host (the reference instead crosses
a mutex and several scalar loops per frame).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..state.map_state import MapState
from ..solvers import image_align, pose as pose_opt
from . import matcher


class TrackResult(NamedTuple):
    pose: jnp.ndarray        # (7,) refined world->cam pose
    match_pt_idx: jnp.ndarray  # (S,) point slots attempted this frame
    match_px: jnp.ndarray    # (S, 2)
    match_ok: jnp.ndarray    # (S,) final inlier matches
    match_attempted: jnp.ndarray  # (S,) a match was attempted
    match_level: jnp.ndarray # (S,) int32 pyramid level of each match
    n_matches: jnp.ndarray   # () int32
    n_attempts: jnp.ndarray  # () int32
    align_error: jnp.ndarray # () direct-alignment residual


def track_frame(m: MapState, intr, last_pyr, last_pt_idx: jnp.ndarray,
                last_ok: jnp.ndarray, pose_last: jnp.ndarray,
                cur_pyr, pose_pred: jnp.ndarray,
                cell: int = 32, align_max_level: int = 4,
                align_min_level: int = 2, align_iters: int = 10,
                pose_iters: int = 10, inlier_thresh_px: float = 2.0,
                use_orb: bool = False, ransac_key: jnp.ndarray | None = None,
                ransac_hypotheses: int = 64, ransac_points: int = 5,
                patch_half: int = 4, lk_iters: int = 10,
                search_px: float = 6.0, max_matches: int | None = None,
                align_patch_half: int = 2, orb_radius: int = 15,
                affine_illum: bool = False,
                ) -> TrackResult:
    """One tracking step (reference sdvl.cc:179-203 + feature_align.cc).

    ``last_pt_idx``/``last_ok`` are the previous frame's match set — its
    "features with points" in reference terms — used both for direct
    alignment and as the quality baseline. With ``ransac_key``, matches are
    additionally gated by a vmapped pose RANSAC of ``ransac_points``-point
    minimal sets before the robust optimization (reference SelectInliers,
    feature_align.cc:152-216 with Config::MaxRansacPoints, and the 2x
    rescue threshold at :258-283); without a key the Tukey IRLS alone
    handles outliers.

    Knob mapping to the reference Config: ``patch_half`` = PatchSize/2,
    ``lk_iters`` = MaxAlignIts, ``search_px`` = SearchSize,
    ``max_matches`` = MaxMatches, ``align_patch_half`` = AlignPatchSize/2,
    ``orb_radius`` = ORBSize/2.
    """
    pts_last = m.pt_pos[last_pt_idx]

    ia = image_align.compute_pose(
        last_pyr, cur_pyr, intr, pts_last, last_ok & m.pt_valid[last_pt_idx],
        pose_last, pose_pred,
        max_level=align_max_level, min_level=align_min_level,
        iters=align_iters, patch_half=align_patch_half,
        affine_illum=affine_illum,
    )

    mr = matcher.match_map_points(m, intr, cur_pyr, ia.pose, cell=cell,
                                  use_orb=use_orb, half=patch_half,
                                  lk_iters=lk_iters, reproj_px=search_px,
                                  max_matches=max_matches,
                                  orb_radius=orb_radius)

    thresh = inlier_thresh_px / jnp.minimum(intr.fx, intr.fy)
    ok = mr.ok
    if ransac_key is not None:
        from ..core import camera as cam

        pose_r = pose_opt.ransac(
            ia.pose, m.pt_pos[mr.pt_idx], mr.uv, ok, ransac_key,
            n_hyp=ransac_hypotheses, sample_size=ransac_points,
            inlier_thresh=thresh,
        )
        p_cam = se3.transform(pose_r, m.pt_pos[mr.pt_idx])
        r = jnp.linalg.norm(
            mr.uv - cam.project_unit_plane(p_cam), axis=-1
        )
        gated = ok & (r < 2.0 * thresh) & (p_cam[..., 2] > 0)
        # keep the gate only if RANSAC found real consensus — otherwise it
        # would wipe the match set on a degenerate sample
        ok = jnp.where(jnp.sum(gated) >= 8, gated, ok)
    po = pose_opt.optimize(
        ia.pose, m.pt_pos[mr.pt_idx], mr.uv, ok,
        iters=pose_iters, inlier_thresh=thresh,
    )
    ok = ok & po.inliers
    return TrackResult(
        pose=po.pose,
        match_pt_idx=mr.pt_idx,
        match_px=mr.px,
        match_ok=ok,
        match_attempted=mr.attempted,
        match_level=mr.level,
        n_matches=jnp.sum(ok).astype(jnp.int32),
        n_attempts=jnp.sum(mr.attempted).astype(jnp.int32),
        align_error=ia.error,
    )


def update_point_stats(m: MapState, tr: TrackResult,
                       max_failed: int = 15,
                       enabled=True) -> MapState:
    """Success/failure bookkeeping on tracked points.

    Mirrors the reference's per-point counters: found/fail counts and
    deletion after ``max_failed`` consecutive misses (point.cc:103-116,
    config.cc:62). Runs as two scatters.

    ``enabled`` (scalar bool, may be traced) gates the whole update —
    the reference counts NOTHING while relocalizing
    (feature_align.cc:128,141 ``if (!relocalizing_)``). Without the gate,
    a long LOST stretch decays every attempted point by ~1 failure per
    frame and deletes the entire map in ``max_failed`` frames, after
    which relocalization is impossible forever (measured: a 3000-frame
    eviction-churn run collapsed to 46 live points and never recovered).
    """
    P = m.pt_valid.shape[0]
    idx_ok = jnp.where(enabled & tr.match_ok, tr.match_pt_idx, P)
    idx_bad = jnp.where(enabled & tr.match_attempted & ~tr.match_ok,
                        tr.match_pt_idx, P)
    pt_found = m.pt_found.at[idx_ok].add(1, mode="drop")
    pt_fail = m.pt_fail.at[idx_ok].set(0, mode="drop")
    pt_fail = pt_fail.at[idx_bad].add(1, mode="drop")
    pt_valid = m.pt_valid & (pt_fail <= max_failed)
    return m._replace(pt_found=pt_found, pt_fail=pt_fail, pt_valid=pt_valid)


def motion_model_update(xi_prev: jnp.ndarray, pose_new: jnp.ndarray,
                        pose_old: jnp.ndarray, decay: float = 0.9):
    """Constant-velocity model with decay (reference sdvl.cc:266-281).

    Returns (xi_model, pose_prediction_for_next_frame).
    """
    xi = se3.log(se3.compose(pose_new, se3.inverse(pose_old)))
    xi_model = decay * xi
    pred = se3.compose(se3.exp(xi_model), pose_new)
    return xi_model, pred
