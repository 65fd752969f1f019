"""Bayesian inverse-depth filter: candidate seeding, update, promotion.

TPU-native replacement for the reference's Point filter lifecycle (reference
point.{h,cc} + Map::InitCandidates/UpdateCandidates, map.cc:262-498): the
Vogiatzis Beta x Gaussian inverse-depth model (point.cc:63-100), the
one-pixel epipolar error angle tau (point.cc:186-198, camera.h:104-107),
convergence (point.cc:162-176) and failure-based deletion (point.cc:103-116).

The reference updates one candidate at a time inside the mapping thread's
polling loop; here the whole candidate table updates as fused elementwise
tensor ops after one batched epipolar search.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import se3
from ..ops import fast as fast_ops
from ..state.map_state import MapState, alloc_slots
from .matcher import EpipolarResult, epipolar_search


def compute_tau(T_ref_cur_t: jnp.ndarray, bearing: jnp.ndarray,
                z: jnp.ndarray, px_error_angle: jnp.ndarray) -> jnp.ndarray:
    """Depth measurement std dev from one pixel of epipolar error.

    Law-of-sines construction identical to reference ComputeTau
    (point.cc:186-198): ``t`` is the translation from anchor to current
    camera in anchor coordinates.
    """
    t = T_ref_cur_t
    tn = jnp.linalg.norm(t, axis=-1).clip(1e-9)
    a = bearing * z[..., None] - t
    an = jnp.linalg.norm(a, axis=-1).clip(1e-9)
    alpha = jnp.arccos(jnp.clip(jnp.sum(bearing * t, -1) / tn, -1, 1))
    beta = jnp.arccos(jnp.clip(-jnp.sum(a * t, -1) / (an * tn), -1, 1))
    beta_plus = beta + px_error_angle
    gamma = jnp.pi - alpha - beta_plus
    z_plus = tn * jnp.sin(beta_plus) / jnp.maximum(jnp.sin(gamma), 1e-6)
    return jnp.abs(z_plus - z)


def vogiatzis_update(rho, sigma2, a, b, x, tau2, rho_range):
    """One Beta x Gaussian inverse-depth filter step (point.cc:63-100).

    ``x`` is the inverse-depth measurement, ``tau2`` its variance,
    ``rho_range`` the uniform-outlier support. All args broadcast.
    """
    norm_scale = jnp.sqrt(sigma2 + tau2).clip(1e-12)
    s2 = 1.0 / (1.0 / sigma2.clip(1e-12) + 1.0 / tau2.clip(1e-12))
    mm = s2 * (rho / sigma2.clip(1e-12) + x / tau2.clip(1e-12))
    gauss = jnp.exp(-0.5 * ((x - rho) / norm_scale) ** 2) / (
        norm_scale * jnp.sqrt(2.0 * jnp.pi)
    )
    c1 = a / (a + b) * gauss
    c2 = b / (a + b) / rho_range.clip(1e-12)
    norm = (c1 + c2).clip(1e-12)
    c1, c2 = c1 / norm, c2 / norm

    f = c1 * (a + 1.0) / (a + b + 1.0) + c2 * a / (a + b + 1.0)
    e = (
        c1 * (a + 1.0) * (a + 2.0) / ((a + b + 1.0) * (a + b + 2.0))
        + c2 * a * (a + 1.0) / ((a + b + 1.0) * (a + b + 2.0))
    )
    rho_new = c1 * mm + c2 * rho
    sigma2_new = (
        c1 * (s2 + mm * mm) + c2 * (sigma2 + rho * rho) - rho_new * rho_new
    )
    # NB: numerator and denominator are both typically negative here —
    # guard magnitude only, never the sign.
    denom = f - e / f.clip(1e-12)
    denom = jnp.where(jnp.abs(denom) < 1e-12,
                      jnp.where(denom < 0, -1e-12, 1e-12), denom)
    a_new = (e - f) / denom
    b_new = a_new * (1.0 - f) / f.clip(1e-12)
    return rho_new, sigma2_new.clip(1e-12), a_new.clip(1e-4), b_new.clip(1e-4)


def update_candidates(m: MapState, intr, cur_pyr, pose_cur: jnp.ndarray,
                      n_samples: int = 32, max_failed: int = 15,
                      use_orb: bool = False, patch_half: int = 4,
                      lk_iters: int = 8, orb_radius: int = 15,
                      stale_kf_window: int = 10,
                      map_scale: float = 1.0,
                      scale_min_dist: float = 0.25,
                      corner_gate: bool = False,
                      corner_thresh: float = 50.0) -> MapState:
    """Epipolar-match every candidate and update its depth filter.

    Mirrors Map::UpdateCandidates (map.cc:402-498): match -> triangulate ->
    Bayesian update; misses bump the fail counter; candidates with more
    evidence for outlier than inlier (b > 2a after warm-up) or too many
    failures are freed. Degenerate measurements are gated like the
    reference: near-zero baseline relative to depth skips the whole attempt
    (map.cc:450-455, using the candidate's own depth as the scale), and a
    successful match still doesn't update on ~zero parallax
    (map.cc:474-479) or a too-close triangulation (map.cc:482-485).
    Candidates NOT visible from the current frame whose anchor keyframe is
    older than ``stale_kf_window`` keyframes (reference default
    2*MaxSearchKeyframes, map.cc:413,438-442) age out — without this,
    invisible seeds occupy fixed-capacity slots forever and block new
    seeding once the camera moves on.

    The baseline and min-depth gates are scaled by the CURRENT frame's
    median scene depth (``frame->GetSceneDepth()``, map.cc:411), estimated
    here as the masked median depth of valid map points in front of this
    camera that project in-image; when the map has no such points yet the
    candidate's own filtered depth stands in (keeps early bootstrap frames
    gated sensibly).
    """
    from ..core import geometry

    res: EpipolarResult = epipolar_search(
        m, intr, cur_pyr, pose_cur, n_samples=n_samples, use_orb=use_orb,
        half=patch_half, lk_iters=lk_iters, orb_radius=orb_radius,
        corner_gate=corner_gate, corner_thresh=corner_thresh,
    )

    T_cur_ref = se3.compose(pose_cur[None], se3.inverse(m.kf_pose[m.cand_kf]))
    # translation anchor->cur expressed in anchor frame
    t_ref = se3.translation(se3.inverse(T_cur_ref))
    z = jnp.maximum(res.depth_anchor, 1e-6)
    tau = compute_tau(t_ref, m.cand_bearing, z, cam.pixel_error_angle(intr))
    # convert depth variance to inverse-depth variance
    tau_inv = 0.5 * (1.0 / jnp.maximum(z - tau, 1e-6)
                     - 1.0 / (z + tau))
    x = 1.0 / z
    rho_range = m.cand_rho + 4.0 * jnp.sqrt(m.cand_sigma2)

    rho_n, sig_n, a_n, b_n = vogiatzis_update(
        m.cand_rho, m.cand_sigma2, m.cand_a, m.cand_b,
        x, tau_inv * tau_inv, rho_range,
    )
    # measurement gates (map.cc:450-485), scaled by the frame's median
    # scene depth (map.cc:411) with the candidate depth as the no-map
    # fallback
    depth_cand = 1.0 / jnp.maximum(m.cand_rho, 1e-6)
    p_cam_all = se3.transform(pose_cur[None], m.pt_pos)
    H0, W0 = cur_pyr[0].shape
    px_all = cam.project(intr, p_cam_all)
    vis_pt = (m.pt_valid & (p_cam_all[:, 2] > 1e-6)
              & (px_all[:, 0] >= 0) & (px_all[:, 0] < W0)
              & (px_all[:, 1] >= 0) & (px_all[:, 1] < H0))
    depth_scene = geometry.masked_median(p_cam_all[:, 2], vis_pt)
    scale_depth = jnp.where(depth_scene > 1e-6, depth_scene, depth_cand)
    baseline_ok = (jnp.linalg.norm(t_ref, axis=-1)
                   / jnp.maximum(scale_depth, 1e-6)) >= 0.01
    anchor_pos = se3.translation(se3.inverse(m.kf_pose[m.cand_kf]))
    cur_pos = se3.translation(se3.inverse(pose_cur))
    p_world = se3.transform(
        se3.inverse(m.kf_pose[m.cand_kf]), m.cand_bearing * z[:, None]
    )
    cosa = geometry.parallax_cosine(p_world, anchor_pos, cur_pos[None])
    deep_enough = ((z >= map_scale * scale_min_dist)
                   & (z >= scale_depth * scale_min_dist))
    upd = (res.ok & m.cand_valid & baseline_ok
           & (cosa < 0.999999) & deep_enough)
    # a gated-out attempt is a skip, not a failure (the reference
    # `continue`s before SearchPoint on low baseline)
    miss = res.attempted & baseline_ok & ~res.ok
    m = m._replace(
        cand_rho=jnp.where(upd, rho_n, m.cand_rho),
        cand_sigma2=jnp.where(upd, sig_n, m.cand_sigma2),
        cand_a=jnp.where(upd, a_n, m.cand_a),
        cand_b=jnp.where(upd, b_n, m.cand_b),
        cand_fail=jnp.where(
            upd, 0, m.cand_fail + miss.astype(jnp.int32)
        ),
    )
    # deletion (point.cc:103-116 + inlier-ratio test)
    n_upd = m.cand_a + m.cand_b
    bad = (m.cand_fail > max_failed) | ((n_upd > 20) & (m.cand_b > 2 * m.cand_a))
    # aging (map.cc:438-442): invisible from this frame (no epipolar sample
    # landed in view -> attempted is False) AND anchored >= stale_kf_window
    # keyframes ago (rank by kf_frame_id among valid keyframes)
    anchor_fid = m.kf_frame_id[m.cand_kf]
    newer = jnp.sum(
        (m.kf_frame_id[None, :] > anchor_fid[:, None]) & m.kf_valid[None, :],
        axis=1,
    )
    stale = m.cand_valid & ~res.attempted & (newer >= stale_kf_window)
    return m._replace(cand_valid=m.cand_valid & ~bad & ~stale)


def promote_converged(m: MapState, threshold_converged: float = 0.1,
                      min_inlier_ratio: float = 0.6) -> MapState:
    """Move converged candidates into the point store.

    Convergence mirrors point.cc:162-176: the depth interval spanned by
    +-2 sigma in inverse depth, relative to the current depth, must shrink
    below the threshold; plus the Beta inlier ratio must support it.
    """
    sigma = jnp.sqrt(m.cand_sigma2)
    z = 1.0 / jnp.maximum(m.cand_rho, 1e-6)
    z_min = 1.0 / (m.cand_rho + 2 * sigma)
    z_max = 1.0 / jnp.maximum(m.cand_rho - 2 * sigma, 1e-6)
    ratio = m.cand_a / jnp.maximum(m.cand_a + m.cand_b, 1e-6)
    converged = (
        m.cand_valid
        & ((z_max - z_min) / z < threshold_converged)
        & (ratio > min_inlier_ratio)
        & (m.cand_rho > 1e-6)
    )

    slots, ok = alloc_slots(~m.pt_valid, converged)
    p_anchor = m.cand_bearing * z[:, None]
    T_w_anchor = se3.inverse(m.kf_pose[m.cand_kf])
    p_world = se3.transform(T_w_anchor, p_anchor)

    P = m.pt_valid.shape[0]
    m = m._replace(
        pt_pos=m.pt_pos.at[slots].set(p_world, mode="drop"),
        pt_valid=m.pt_valid.at[slots].set(True, mode="drop"),
        pt_anchor_kf=m.pt_anchor_kf.at[slots].set(m.cand_kf, mode="drop"),
        pt_fail=m.pt_fail.at[slots].set(0, mode="drop"),
        pt_found=m.pt_found.at[slots].set(1, mode="drop"),
        pt_desc=m.pt_desc.at[slots].set(m.cand_desc, mode="drop"),
        obs_mask=m.obs_mask.at[m.cand_kf, slots].set(True, mode="drop"),
        obs_px=m.obs_px.at[m.cand_kf, slots].set(m.cand_px, mode="drop"),
        obs_level=m.obs_level.at[m.cand_kf, slots].set(
            m.cand_level, mode="drop"
        ),
        cand_valid=m.cand_valid & ~ok,
    )
    return m


def seed_candidates(m: MapState, intr, fs_pyr, fs_corners, kf_slot,
                    scene_depth_median: jnp.ndarray, cell: int,
                    orb_radius: int = 15):
    """Seed new candidates at detected corners of a new keyframe.

    Mirrors Map::InitCandidates (map.cc:262-400): corners in cells not
    already holding a tracked observation become inverse-depth seeds at
    rho = 1/median scene depth with a wide prior (sigma covering
    (0, 2/median]). Returns ``(m, new_mask (C,))`` — pass ``new_mask`` to
    :func:`triangulate_new_seeds` to re-center the fresh seeds at a
    triangulated depth like the reference does.
    """
    from ..ops import orb

    corner_xy, corner_level, corner_valid = fs_corners
    H, W = fs_pyr[0].shape
    # anchor ORB descriptor per seed (reference InitCandidates stores the
    # creating feature's descriptor, map.cc:335-346 via Feature ctor)
    desc = orb.descriptors(fs_pyr[0], corner_xy, radius=orb_radius)

    # Suppress cells already occupied by observations of this keyframe
    occ = fast_ops.occupied_cells(
        m.obs_px[kf_slot], m.obs_mask[kf_slot], H, W, cell
    )
    gw = W // cell
    ccx = jnp.clip((corner_xy[:, 0] // cell).astype(jnp.int32), 0, gw - 1)
    ccy = jnp.clip((corner_xy[:, 1] // cell).astype(jnp.int32), 0, H // cell - 1)
    free_cell = ~occ[ccy * gw + ccx]
    new_valid = corner_valid & free_cell

    slots, ok = alloc_slots(~m.cand_valid, new_valid)
    rho0 = 1.0 / jnp.maximum(scene_depth_median, 1e-6)
    sigma0 = rho0 / 3.0  # ~95% mass within (0, ~1.7*rho0]: wide prior
    bearing = cam.unproject(intr, corner_xy)

    n = corner_xy.shape[0]
    C = m.cand_valid.shape[0]
    new_mask = jnp.zeros(C, bool).at[slots].set(True, mode="drop")
    m = m._replace(
        cand_valid=m.cand_valid.at[slots].set(True, mode="drop"),
        cand_kf=m.cand_kf.at[slots].set(
            jnp.full((n,), kf_slot, jnp.int32), mode="drop"
        ),
        cand_px=m.cand_px.at[slots].set(corner_xy, mode="drop"),
        cand_level=m.cand_level.at[slots].set(corner_level, mode="drop"),
        cand_bearing=m.cand_bearing.at[slots].set(bearing, mode="drop"),
        cand_rho=m.cand_rho.at[slots].set(
            jnp.full((n,), rho0, jnp.float32), mode="drop"
        ),
        cand_sigma2=m.cand_sigma2.at[slots].set(
            jnp.full((n,), sigma0 * sigma0, jnp.float32), mode="drop"
        ),
        cand_a=m.cand_a.at[slots].set(jnp.full((n,), 10.0), mode="drop"),
        cand_b=m.cand_b.at[slots].set(jnp.full((n,), 10.0), mode="drop"),
        cand_fail=m.cand_fail.at[slots].set(0, mode="drop"),
        cand_desc=m.cand_desc.at[slots].set(desc, mode="drop"),
    )
    return m, new_mask


def triangulate_new_seeds(m: MapState, intr, anchor_slot,
                          scene_depth_median: jnp.ndarray,
                          new_mask: jnp.ndarray, n_samples: int = 32,
                          n_best: int = 5, scale_min_dist: float = 0.25,
                          map_scale: float = 1.0,
                          use_orb: bool = False, patch_half: int = 4,
                          lk_iters: int = 8,
                          orb_radius: int = 15,
                          corner_gate: bool = False,
                          corner_thresh: float = 50.0) -> MapState:
    """Re-center fresh seeds at a triangulated depth.

    Mirrors the triangulation half of Map::InitCandidates (reference
    map.cc:262-400): each new corner is epipolar-matched against the best
    covisible keyframe with sufficient baseline (distance/depth >= 0.01,
    map.cc:300-304) and, on success, the filter re-initializes at
    rho = 1/GetDepthFromTriangulation (Point::InitCandidate,
    point.cc:48-61) — instead of starting at the median-depth prior, which
    on depth-varied scenes costs many extra filter updates and seeds
    outliers. Gates mirror the reference: near-zero parallax rejected
    (map.cc:357-360), too-close points dropped entirely (map.cc:362-364,
    ``scale_min_dist``). Unmatched seeds keep the median prior (SVO-style
    fallback).
    """
    from ..core import geometry
    from ..state.map_state import best_connections

    n_best = min(n_best, m.kf_valid.shape[0])
    conn_idx, conn_counts = best_connections(m, anchor_slot, n_best)
    anchor_pos = se3.translation(se3.inverse(m.kf_pose[anchor_slot]))
    kf_pos = se3.translation(se3.inverse(m.kf_pose[conn_idx]))
    dist = jnp.linalg.norm(kf_pos - anchor_pos, axis=-1)
    depth_med = jnp.maximum(scene_depth_median, 1e-6)
    ok_kf = ((conn_counts > 0) & m.kf_valid[conn_idx]
             & (dist / depth_med >= 0.01))
    any_ok = jnp.any(ok_kf)
    ref = conn_idx[jnp.argmax(ok_kf)]

    ref_pyr = tuple(p[ref] for p in m.kf_pyr)
    ref_pose = m.kf_pose[ref]
    m_search = m._replace(cand_valid=new_mask & m.cand_valid)
    res = epipolar_search(m_search, intr, ref_pyr, ref_pose,
                          n_samples=n_samples, use_orb=use_orb,
                          half=patch_half, lk_iters=lk_iters,
                          orb_radius=orb_radius,
                          corner_gate=corner_gate,
                          corner_thresh=corner_thresh)

    z = jnp.maximum(res.depth_anchor, 1e-6)
    p_anchor = m.cand_bearing * z[:, None]
    p_world = se3.transform(se3.inverse(m.kf_pose[m.cand_kf]), p_anchor)
    ref_pos = se3.translation(se3.inverse(ref_pose))
    cosa = geometry.parallax_cosine(p_world, anchor_pos, ref_pos)

    matched = new_mask & m.cand_valid & res.ok & any_ok
    min_depth = scale_min_dist * jnp.maximum(
        jnp.asarray(map_scale, jnp.float32), depth_med
    )
    deep_enough = z > min_depth
    good = matched & deep_enough & (cosa < 0.999999)
    too_close = matched & ~deep_enough

    rho_t = 1.0 / z
    sigma_t = rho_t / 3.0
    return m._replace(
        cand_rho=jnp.where(good, rho_t, m.cand_rho),
        cand_sigma2=jnp.where(good, sigma_t * sigma_t, m.cand_sigma2),
        cand_valid=m.cand_valid & ~too_close,
    )
