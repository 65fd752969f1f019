"""Point reprojection + epipolar matching against the current frame.

TPU-native replacement for the reference's Matcher + FeatureAlign front half:
``FeatureAlign::Reproject/SelectPoints`` (feature_align.cc:42-150: project
map points into a 32px cell grid, one match attempt per cell) and
``Matcher::SearchPoint`` (matcher.cc:45-121: affine-warped reference patch,
epipolar candidate scan, ZMSSD scoring, LK subpixel refinement).

The reference walks cells and candidate corners in nested scalar loops; here:
  * visibility tests for ALL P point slots are one batched projection,
  * per-cell winner selection is a scatter-max (``grid_select``),
  * the epipolar scan scores a fixed number of samples along the
    rho +- 2 sigma segment for ALL candidates at once (no corner lists),
  * subpixel refinement is the batched multi-level LK solver.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import geometry, se3
from ..ops import interp, patch as patch_ops
from ..solvers import lk
from ..state.map_state import MapState, best_connections


def grid_select(cell_id: jnp.ndarray, score: jnp.ndarray, valid: jnp.ndarray,
                n_cells: int):
    """Pick the best-scoring valid element per grid cell.

    Returns ``(sel_idx (n_cells,), sel_valid (n_cells,))`` — the TPU-native
    equivalent of the reference's per-cell point selection
    (feature_align.cc:88-150, best-quality point per cell).
    """
    n = cell_id.shape[0]
    idx = jnp.arange(n)
    # unique sortable key: score major, index minor (later index wins ties)
    key = jnp.where(valid, score.astype(jnp.float32) * n + idx, -jnp.inf)
    cell = jnp.where(valid, cell_id, n_cells)  # invalid -> dropped
    best = jnp.full((n_cells,), -jnp.inf).at[cell].max(key, mode="drop")
    winner = valid & (key == best[jnp.clip(cell, 0, n_cells - 1)])
    sel = jnp.zeros((n_cells,), jnp.int32).at[
        jnp.where(winner, cell, n_cells)
    ].max(idx.astype(jnp.int32), mode="drop")
    sel_valid = jnp.zeros((n_cells,), bool).at[
        jnp.where(winner, cell, n_cells)
    ].set(True, mode="drop")
    return sel, sel_valid


class MatchResult(NamedTuple):
    pt_idx: jnp.ndarray    # (S,) point-slot index per match attempt
    px: jnp.ndarray        # (S, 2) refined pixel position in current frame
    ok: jnp.ndarray        # (S,) bool match succeeded
    attempted: jnp.ndarray # (S,) bool a match was attempted
    uv: jnp.ndarray        # (S, 2) unit-plane measurement (from px)
    level: jnp.ndarray     # (S,) int32 pyramid level the match was made at
                           #   (reference GetSearchLevel, matcher.cc:314-323)


def _anchor_data(m: MapState, pt_idx: jnp.ndarray):
    ak = m.pt_anchor_kf[pt_idx]
    apx = m.obs_px[ak, pt_idx]
    alevel = m.obs_level[ak, pt_idx]
    apose = m.kf_pose[ak]
    return ak, apx, alevel, apose


def _warped_ref_patches(m: MapState, intr, pt_idx, pose_cur, half: int):
    """Affine-warped anchor patches + per-point search level.

    Mirrors Matcher::WarpMatrixAffine + GetSearchLevel + CreatePatch
    (matcher.cc:293-357) as batched einsums and one indexed gather.
    Returns (patches (S, s, s), search_level (S,), px_cur (S, 2)).
    """
    S = pt_idx.shape[0]
    s = 2 * half
    ak, apx, alevel, apose = _anchor_data(m, pt_idx)
    p_w = m.pt_pos[pt_idx]
    p_anchor = se3.transform(apose, p_w)
    depth_ref = jnp.linalg.norm(p_anchor, axis=-1)

    T_cur_ref = se3.compose(pose_cur[None], se3.inverse(apose))
    A_cur_ref = patch_ops.warp_matrix_affine(
        intr, apx, alevel, depth_ref, T_cur_ref
    )  # (S,2,2) d(px_cur)/d(px_ref)
    search_level = patch_ops.search_level_from_warp(A_cur_ref,
                                                    len(m.kf_pyr) - 1)
    det = (A_cur_ref[:, 0, 0] * A_cur_ref[:, 1, 1]
           - A_cur_ref[:, 0, 1] * A_cur_ref[:, 1, 0])
    det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
    inv = jnp.stack([
        jnp.stack([A_cur_ref[:, 1, 1], -A_cur_ref[:, 0, 1]], -1),
        jnp.stack([-A_cur_ref[:, 1, 0], A_cur_ref[:, 0, 0]], -1),
    ], -2) / det[:, None, None]                     # A_ref_cur (S,2,2)

    # output patch offsets live at the *search level* of the current frame
    d = jnp.arange(s, dtype=jnp.float32) - half
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([ox, oy], -1).reshape(s * s, 2)
    scale_cur = jnp.exp2(search_level.astype(jnp.float32))[:, None, None]
    offs_ref_l0 = jnp.einsum("sij,pj->spi", inv, offs) * scale_cur  # (S,P,2)
    pos_ref_l0 = apx[:, None, :] + offs_ref_l0

    vals = interp.bilinear_indexed_pyramid(
        m.kf_pyr, ak[:, None], alevel[:, None], pos_ref_l0
    )
    patches = vals.reshape(S, s, s)
    px_cur = cam.project(intr, se3.transform(T_cur_ref, p_anchor))
    return patches, search_level, px_cur


def match_map_points(m: MapState, intr, cur_pyr, pose_cur: jnp.ndarray,
                     cell: int, half: int = 4, lk_iters: int = 10,
                     reproj_px: float = 6.0, use_orb: bool = False,
                     orb_max_dist: int = 100,
                     err_max: float = 22.0,
                     max_matches: int | None = None,
                     orb_radius: int = 15) -> MatchResult:
    """Reproject valid map points, pick one per grid cell, LK-align each.

    Equivalent to FeatureAlign::Reproject+SelectPoints+SearchPoint for
    converged points. The per-cell capacity is the structural match budget;
    ``max_matches`` additionally caps the number of attempts like the
    reference's ``Config::MaxMatches`` (feature_align.cc:119 stops selecting
    at 150-300 depending on preset): when fewer than the cell count, only
    the ``max_matches`` best per-cell winners (by found-fail quality) are
    LK-aligned — which also shrinks every downstream lane count.
    A match succeeds when LK converges and lands within ``reproj_px``
    (``Config::SearchSize``) of the prediction (gross drifts are outliers
    for the pose stage anyway).

    With ``use_orb`` (static), matches are additionally gated by the Hamming
    distance between the point's anchor ORB descriptor and a descriptor at
    the matched position (< ``orb_max_dist``) — the reference's descriptor
    check in Matcher::SearchPoint (matcher.cc:232-291, threshold 100).
    """
    H, W = cur_pyr[0].shape
    gw, gh = W // cell, H // cell
    n_cells = gw * gh

    p_cam = se3.transform(pose_cur[None], m.pt_pos)
    px = cam.project(intr, p_cam)
    visible = (
        m.pt_valid & (p_cam[:, 2] > 1e-3)
        & cam.in_bounds(intr, px, margin=half + 2)
    )
    cx = jnp.clip((px[:, 0] // cell).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((px[:, 1] // cell).astype(jnp.int32), 0, gh - 1)
    cell_id = cy * gw + cx
    quality = (m.pt_found - m.pt_fail).astype(jnp.float32)
    sel_idx, attempted = grid_select(cell_id, quality, visible, n_cells)
    if max_matches is not None and max_matches < n_cells:
        q_sel = jnp.where(attempted, quality[sel_idx], -jnp.inf)
        _, keep = jax.lax.top_k(q_sel, max_matches)
        sel_idx, attempted = sel_idx[keep], attempted[keep]

    patches, search_level, px_pred = _warped_ref_patches(
        m, intr, sel_idx, pose_cur, half
    )
    res = lk.align_patches_pyramid(
        cur_pyr, search_level, patches, px_pred, attempted, iters=lk_iters
    )
    drift = jnp.linalg.norm(res.xy - px_pred, axis=-1)
    scale = jnp.exp2(search_level.astype(jnp.float32))
    # photometric acceptance: mean-abs residual per pixel, the LK-final
    # equivalent of the reference's ZMSSD cap (MAX_SSD_PER_PIXEL = 500,
    # matcher.h:36 — sqrt(500) ~ 22 gray levels RMS). Without it a
    # textureless/occluded frame "converges" trivially (zero gradient,
    # zero drift) and fake matches keep quality GOOD.
    ok = (attempted & res.converged & (drift < reproj_px * scale)
          & (res.error < err_max))
    if use_orb:
        from ..ops import orb

        desc_cur = orb.descriptors(cur_pyr[0], res.xy, radius=orb_radius)
        dist = orb.hamming(desc_cur, m.pt_desc[sel_idx])
        ok = ok & (dist < orb_max_dist)
    uv = jnp.stack([
        (res.xy[:, 0] - intr.cx) / intr.fx,
        (res.xy[:, 1] - intr.cy) / intr.fy,
    ], -1)
    return MatchResult(pt_idx=sel_idx, px=res.xy, ok=ok,
                       attempted=attempted, uv=uv,
                       level=search_level.astype(jnp.int32))


def reobserve_points(m: MapState, intr, pyr, pose: jnp.ndarray,
                     kf_slot: jnp.ndarray, n_best: int = 5,
                     max_reobs: int = 512, half: int = 4,
                     lk_iters: int = 8, reproj_px: float = 3.0,
                     err_max: float = 22.0) -> MapState:
    """Re-link existing map points into a NEW keyframe.

    Mirrors Map::AddConnectionsPoints (reference map.cc:560-617): every
    valid point seen by the ``n_best`` most-covisible keyframes but NOT yet
    observed in the new keyframe is projected into it and patch-verified
    (warped anchor patch + LK, the reference's Matcher::SearchPoint); the
    successes become observations. Without this, covisibility stays thin —
    each point would carry only the observations of the frames where it was
    *tracked*, local BA windows lose constraints, and weak-point pruning
    kills points the reference would have re-linked.

    Fixed shape: the ``max_reobs`` best candidates (by found-fail quality)
    are attempted in one batched LK solve.
    """
    K, P, _ = m.capacities
    max_reobs = min(max_reobs, P)

    conn_idx, conn_counts = best_connections(m, kf_slot, min(n_best, K))
    seen_by_conn = jnp.any(
        m.obs_mask[conn_idx] & (conn_counts > 0)[:, None], axis=0
    )  # (P,)
    cand = m.pt_valid & seen_by_conn & ~m.obs_mask[kf_slot]

    p_cam = se3.transform(pose[None], m.pt_pos)
    px = cam.project(intr, p_cam)
    visible = cand & (p_cam[:, 2] > 1e-3) & cam.in_bounds(
        intr, px, margin=half + 2
    )
    quality = jnp.where(
        visible, (m.pt_found - m.pt_fail).astype(jnp.float32), -jnp.inf
    )
    _, sel = jax.lax.top_k(quality, max_reobs)
    sel_ok = visible[sel]

    patches, search_level, px_pred = _warped_ref_patches(
        m, intr, sel, pose, half
    )
    res = lk.align_patches_pyramid(
        pyr, search_level, patches, px_pred, sel_ok, iters=lk_iters
    )
    drift = jnp.linalg.norm(res.xy - px_pred, axis=-1)
    scale = jnp.exp2(search_level.astype(jnp.float32))
    ok = (sel_ok & res.converged & (drift < reproj_px * scale)
          & (res.error < err_max))

    idx = jnp.where(ok, sel, P)
    return m._replace(
        obs_mask=m.obs_mask.at[kf_slot, idx].set(True, mode="drop"),
        obs_px=m.obs_px.at[kf_slot, idx].set(res.xy, mode="drop"),
        obs_level=m.obs_level.at[kf_slot, idx].set(
            search_level.astype(jnp.int32), mode="drop"
        ),
        pt_found=m.pt_found.at[idx].add(1, mode="drop"),
    )


class EpipolarResult(NamedTuple):
    px: jnp.ndarray           # (C, 2) matched pixel in current frame
    ok: jnp.ndarray           # (C,) bool
    depth_anchor: jnp.ndarray # (C,) triangulated depth along the anchor bearing
    attempted: jnp.ndarray    # (C,)


def epipolar_search(m: MapState, intr, cur_pyr, pose_cur: jnp.ndarray,
                    n_samples: int = 32, half: int = 4,
                    zmssd_max: float = 40.0 ** 2 * 64,
                    lk_iters: int = 8, use_orb: bool = False,
                    orb_max_dist: int = 100,
                    orb_radius: int = 15,
                    corner_gate: bool = False,
                    corner_thresh: float = 50.0) -> EpipolarResult:
    """Match depth-filter candidates along their epipolar segments.

    Mirrors Matcher::SearchPoint for unconverged candidates
    (matcher.cc:58-230): the rho +- 2 sigma inverse-depth interval projects
    to a segment in the current image; the reference scans detected corners
    near that segment, we score ``n_samples`` equispaced samples (uniform in
    inverse depth) by ZMSSD against the warped anchor patch — no corner
    lists, fully batched — then LK-refine the winner and triangulate.

    ``corner_gate`` (static) restores the reference's image-structure
    restriction (matcher.cc:123-230: only detected corners near the segment
    are candidates): each sample must sit within 1 px of a pixel whose
    Shi-Tomasi response at the candidate's search level clears
    ``corner_thresh`` (Config::MinFeatureScore). On repetitive texture the
    unrestricted ZMSSD scan can lock onto period aliases mid-texture; the
    gate rejects samples that are not corner-like at all. Computed as a
    3x3-max-dilated dense response per level — inside the fused step XLA
    CSEs it with the detector's own Shi-Tomasi pass over the same pyramid.
    """
    C = m.cand_valid.shape[0]
    s = 2 * half

    apose = m.kf_pose[m.cand_kf]
    T_cur_ref = se3.compose(pose_cur[None], se3.inverse(apose))  # (C,7)

    sigma = jnp.sqrt(jnp.maximum(m.cand_sigma2, 1e-12))
    rho_min = jnp.maximum(m.cand_rho - 2 * sigma, 1e-6)
    rho_max = m.cand_rho + 2 * sigma
    ts = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    rho_s = rho_min[:, None] + (rho_max - rho_min)[:, None] * ts[None]  # (C,S)

    p_ref = m.cand_bearing[:, None, :] / rho_s[..., None]      # (C,S,3)
    p_cur = se3.transform(T_cur_ref[:, None, :], p_ref)
    px_s = cam.project(intr, p_cur)                             # (C,S,2)
    inb = cam.in_bounds(intr, px_s, margin=half + 2) & (p_cur[..., 2] > 1e-3)

    # warp anchor patch once per candidate at the mean depth
    depth_mean = 1.0 / jnp.maximum(m.cand_rho, 1e-6)
    A = patch_ops.warp_matrix_affine(
        intr, m.cand_px, m.cand_level, depth_mean, T_cur_ref
    )
    search_level = patch_ops.search_level_from_warp(A, len(cur_pyr) - 1)
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
    inv = jnp.stack([
        jnp.stack([A[:, 1, 1], -A[:, 0, 1]], -1),
        jnp.stack([-A[:, 1, 0], A[:, 0, 0]], -1),
    ], -2) / det[:, None, None]

    d = jnp.arange(s, dtype=jnp.float32) - half
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([ox, oy], -1).reshape(s * s, 2)
    scale_cur = jnp.exp2(search_level.astype(jnp.float32))[:, None, None]
    pos_ref = m.cand_px[:, None, :] + jnp.einsum("cij,pj->cpi", inv, offs) * scale_cur
    ref_patch = interp.bilinear_indexed_pyramid(
        m.kf_pyr, m.cand_kf[:, None], m.cand_level[:, None], pos_ref
    )  # (C, s*s)
    ref_zm = ref_patch - jnp.mean(ref_patch, axis=-1, keepdims=True)

    # ZMSSD of every sample: (C, S, s*s) gather from the current pyramid
    scale_c = jnp.exp2(search_level.astype(jnp.float32))  # (C,)
    pos_cur = px_s[:, :, None, :] + offs[None, None] * scale_c[:, None, None, None]
    cur_vals = interp.bilinear_pyramid(
        cur_pyr, search_level[:, None, None], pos_cur
    )  # (C,S,s*s)
    cur_zm = cur_vals - jnp.mean(cur_vals, axis=-1, keepdims=True)
    score = jnp.sum((cur_zm - ref_zm[:, None, :]) ** 2, axis=-1)
    score = jnp.where(inb, score, jnp.inf)
    if corner_gate:
        from ..ops import fast as fast_ops

        gate_maps = tuple(
            jax.lax.reduce_window(
                # f32 cast: seed-triangulation passes a uint8 keyframe
                # pyramid; Shi-Tomasi in integer arithmetic would overflow
                fast_ops.shi_tomasi(p.astype(jnp.float32)), -jnp.inf,
                jax.lax.max, (3, 3), (1, 1), "SAME",
            )
            for p in cur_pyr
        )
        gate_vals = interp.bilinear_pyramid(
            gate_maps, search_level[:, None], px_s
        )  # (C, S)
        score = jnp.where(gate_vals > corner_thresh, score, jnp.inf)

    best = jnp.argmin(score, axis=1)
    best_px = jnp.take_along_axis(px_s, best[:, None, None], axis=1)[:, 0]
    best_score = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]
    attempted = m.cand_valid & jnp.isfinite(best_score)
    good = attempted & (best_score < zmssd_max)

    res = lk.align_patches_pyramid(
        cur_pyr, search_level, ref_patch.reshape(C, s, s), best_px, good,
        iters=lk_iters, max_shift=8.0,
    )
    bearing_cur = cam.unproject(intr, res.xy)
    depth = geometry.depth_from_triangulation(
        T_cur_ref, m.cand_bearing, bearing_cur
    )
    ok = good & res.converged & (depth > 1e-4)
    if use_orb:
        from ..ops import orb

        desc_cur = orb.descriptors(cur_pyr[0], res.xy, radius=orb_radius)
        dist = orb.hamming(desc_cur, m.cand_desc)
        ok = ok & (dist < orb_max_dist)
    return EpipolarResult(px=res.xy, ok=ok, depth_anchor=depth,
                          attempted=attempted)
