"""Map maintenance: keyframe insertion, candidate updates, local BA, pruning.

TPU-native replacement for the reference's mapping thread work items
(reference map.{h,cc}): AddKeyframe (map.cc:145-158), InitCandidates seeding
(map.cc:262-400), UpdateCandidates (map.cc:402-498), connection upkeep
(map.cc:500-617), redundant-keyframe pruning (map.cc:619-687), keyframe-cap
eviction (map.cc:190-205) and BundleAdjustment windowing (map.cc:844-869).

The reference runs these on a second std::thread behind one mutex; here each
is a pure ``MapState -> MapState`` function. The scheduler (pipeline.sdvl /
runtime) decides whether they run inline with tracking ("sequential mode",
main.cc:97) or overlapped on a different device/stream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import geometry, se3
from ..solvers import ba
from ..state.map_state import (MapState, alloc_slots, best_connections,
                               covisibility, kf_slot_to_evict, store_pyramid)
from . import depth_filter


def add_keyframe(m: MapState, intr, pyr, pose: jnp.ndarray,
                 frame_id: jnp.ndarray, match_pt_idx: jnp.ndarray,
                 match_px: jnp.ndarray, match_ok: jnp.ndarray,
                 match_level: jnp.ndarray,
                 corners_xy: jnp.ndarray, corners_level: jnp.ndarray,
                 corners_valid: jnp.ndarray, cell: int,
                 n_search_kf: int = 5, max_reobs: int = 512,
                 scale_min_dist: float = 0.25, map_scale: float = 1.0,
                 use_orb: bool = False, epipolar_samples: int = 32,
                 patch_half: int = 4, lk_iters: int = 8,
                 orb_radius: int = 15,
                 corner_gate: bool = False,
                 corner_thresh: float = 50.0):
    """Insert the current frame as a keyframe.

    Combines reference AddKeyframe + CheckConnections + AddConnectionsPoints
    + InitCandidates (map.cc:145-158, 262-400, 500-617): stores the pyramid
    and pose, writes the frame's matches as observations into the dense
    (K, P) structure (covisibility then needs no separate bookkeeping),
    re-links existing points seen by covisible keyframes
    (matcher.reobserve_points), seeds new depth-filter candidates in
    unoccupied grid cells, and re-centers the fresh seeds at triangulated
    depths (depth_filter.triangulate_new_seeds). If the keyframe store is
    full the furthest keyframe is evicted (map.cc:190-205) — its
    observation row, anchored candidates, and anchored points' anchors die
    with it.
    """
    from . import matcher as matcher_mod
    K, P, C = m.capacities

    cur_pos = se3.translation(se3.inverse(pose))
    evict = kf_slot_to_evict(m, cur_pos)
    full = jnp.sum(~m.kf_valid) == 0
    # free slot: first invalid, else evicted slot
    first_free = jnp.argmax(~m.kf_valid)
    slot = jnp.where(full, evict, first_free).astype(jnp.int32)

    # clear any state anchored to the slot being reused
    m = m._replace(
        obs_mask=m.obs_mask.at[slot].set(False),
        cand_valid=m.cand_valid & (m.cand_kf != slot),
        # points anchored at the dying keyframe lose their patch source;
        # re-anchoring would need a search, so they are dropped (the
        # reference deletes such points with the KF too, map.cc:190-205)
        pt_valid=m.pt_valid & ~(full & (m.pt_anchor_kf == slot)),
        n_evicted=m.n_evicted + full.astype(jnp.int32),
    )

    # write keyframe (store quantizes to uint8, map_state.store_pyramid)
    kf_pyr = tuple(
        lvl.at[slot].set(img)
        for lvl, img in zip(m.kf_pyr, store_pyramid(pyr))
    )
    m = m._replace(
        kf_pose=m.kf_pose.at[slot].set(pose),
        kf_valid=m.kf_valid.at[slot].set(True),
        kf_frame_id=m.kf_frame_id.at[slot].set(frame_id.astype(jnp.int32)),
        kf_pyr=kf_pyr,
        n_keyframes=m.n_keyframes + 1,
    )

    # observations from this frame's matches
    idx = jnp.where(match_ok & m.pt_valid[match_pt_idx], match_pt_idx, P)
    m = m._replace(
        obs_mask=m.obs_mask.at[slot, idx].set(True, mode="drop"),
        obs_px=m.obs_px.at[slot, idx].set(match_px, mode="drop"),
        # the level the match was actually made at (the reference stores the
        # search level in the Feature, matcher.cc:100-121) — anchor-patch
        # warping reads it back when this keyframe becomes an anchor
        obs_level=m.obs_level.at[slot, idx].set(
            match_level.astype(jnp.int32), mode="drop"
        ),
    )

    # median scene depth of matched points (frame.cc:70-91 GetSceneDepth)
    p_cam = se3.transform(pose[None], m.pt_pos[match_pt_idx])
    depth_med = geometry.masked_median(
        p_cam[:, 2], match_ok & (p_cam[:, 2] > 1e-6)
    )
    depth_med = jnp.where(depth_med > 1e-6, depth_med, 1.0)

    # re-link existing points from covisible keyframes BEFORE seeding, so
    # their cells count as occupied (reference order: AddConnectionsPoints
    # then InitCandidates, map.cc:116-118); max_reobs=0 disables (baseline)
    if max_reobs > 0:
        m = matcher_mod.reobserve_points(
            m, intr, pyr, pose, slot, n_best=n_search_kf,
            max_reobs=max_reobs, half=patch_half, lk_iters=lk_iters,
        )
    m, new_seeds = depth_filter.seed_candidates(
        m, intr, pyr, (corners_xy, corners_level, corners_valid), slot,
        depth_med, cell, orb_radius=orb_radius,
    )
    m = depth_filter.triangulate_new_seeds(
        m, intr, slot, depth_med, new_seeds, n_samples=epipolar_samples,
        n_best=n_search_kf, scale_min_dist=scale_min_dist,
        map_scale=map_scale, use_orb=use_orb, patch_half=patch_half,
        lk_iters=lk_iters, orb_radius=orb_radius,
        corner_gate=corner_gate, corner_thresh=corner_thresh,
    )
    return m, slot


def update_map(m: MapState, intr, cur_pyr, pose_cur: jnp.ndarray,
               n_samples: int = 32, threshold_converged: float = 0.1,
               max_failed: int = 15, use_orb: bool = False,
               patch_half: int = 4, lk_iters: int = 8,
               orb_radius: int = 15,
               prune_redundant: bool = True,
               stale_kf_window: int = 10,
               map_scale: float = 1.0,
               scale_min_dist: float = 0.25,
               corner_gate: bool = False,
               corner_thresh: float = 50.0) -> MapState:
    """Per-frame mapper iteration (Map::UpdateMap, map.cc:73-143): update
    all candidate depth filters against this frame, promote converged ones,
    and retire one redundant keyframe if any (the reference runs
    CheckRedundantKeyframes on every non-keyframe mapper iteration,
    map.cc:121 — running it per frame here means a pruning backlog drains
    at >= 1 keyframe/frame instead of accumulating between keyframes)."""
    m = depth_filter.update_candidates(
        m, intr, cur_pyr, pose_cur, n_samples=n_samples,
        max_failed=max_failed, use_orb=use_orb, patch_half=patch_half,
        lk_iters=lk_iters, orb_radius=orb_radius,
        stale_kf_window=stale_kf_window,
        map_scale=map_scale, scale_min_dist=scale_min_dist,
        corner_gate=corner_gate, corner_thresh=corner_thresh,
    )
    m = depth_filter.promote_converged(m, threshold_converged)
    if prune_redundant:
        m = check_redundant_keyframes(m)
    return m


class BAWindow(NamedTuple):
    kf_idx: jnp.ndarray   # (Kw,) keyframe slots in window
    pt_idx: jnp.ndarray   # (Pw,) point slots in window
    problem: ba.BAProblem


def extract_local_ba(m: MapState, intr, center_kf: jnp.ndarray,
                     window: int = 10, max_points: int = 1024) -> BAWindow:
    """Build the fixed-capacity local BA problem around ``center_kf``.

    Mirrors Bundle::Local's gathering (bundle.cc:65-139 via map.cc:844-868):
    the window is the center + its best covisible keyframes; all points they
    observe join (capped at ``max_points`` by observation count); the two
    oldest keyframes in the window are held fixed, pinning the 7-dof
    monocular gauge (the reference instead fixes every outside observer KF).
    """
    K, P, _ = m.capacities
    Kw = window + 1

    conn_idx, conn_counts = best_connections(m, center_kf, window)
    kf_idx = jnp.concatenate([center_kf[None], conn_idx])
    kf_ok = jnp.concatenate(
        [jnp.ones(1, bool), conn_counts > 0]
    ) & m.kf_valid[kf_idx]

    # points observed from the window, ranked by in-window observation count
    obs_win = m.obs_mask[kf_idx] & kf_ok[:, None]        # (Kw, P)
    n_obs = jnp.sum(obs_win, axis=0)
    pt_ok = m.pt_valid & (n_obs >= 2)
    order = jnp.argsort(
        jnp.where(pt_ok, -n_obs.astype(jnp.float32), jnp.inf)
    )
    pt_idx = order[:max_points]
    pt_sel_ok = pt_ok[pt_idx]

    obs_mask = obs_win[:, pt_idx].T & pt_sel_ok[:, None]  # (Pw, Kw)
    px = m.obs_px[kf_idx][:, pt_idx].transpose(1, 0, 2)   # (Pw, Kw, 2)
    uv = jnp.stack([
        (px[..., 0] - intr.cx) / intr.fx,
        (px[..., 1] - intr.cy) / intr.fy,
    ], -1)

    # fix the two oldest valid window KFs (gauge incl. scale)
    age = jnp.where(kf_ok, m.kf_frame_id[kf_idx], jnp.iinfo(jnp.int32).max)
    order_age = jnp.argsort(age)
    fixed = jnp.zeros(Kw, bool).at[order_age[:2]].set(True)
    fixed = fixed | ~kf_ok

    problem = ba.BAProblem(
        poses=m.kf_pose[kf_idx],
        fixed=fixed,
        points=m.pt_pos[pt_idx],
        obs_uv=uv,
        obs_mask=obs_mask,
    )
    return BAWindow(kf_idx=kf_idx, pt_idx=pt_idx, problem=problem)


def local_ba(m: MapState, intr, center_kf: jnp.ndarray, window: int = 10,
             max_points: int = 1024) -> MapState:
    """Local bundle adjustment + write-back (Map::BundleAdjustment,
    map.cc:844-869; write-back mirrors bundle.cc:211-223). Gated
    observations are removed from the dense structure like the reference
    drops chi2>5.991 edges."""
    win = extract_local_ba(m, intr, center_kf, window, max_points)
    huber = jnp.sqrt(5.991) / jnp.minimum(intr.fx, intr.fy)
    res = ba.solve(win.problem, huber=huber)

    kf_ok = ~win.problem.fixed
    new_kf_pose = jnp.where(
        kf_ok[:, None], res.poses, win.problem.poses
    )
    m = m._replace(
        kf_pose=m.kf_pose.at[win.kf_idx].set(new_kf_pose),
        pt_pos=m.pt_pos.at[win.pt_idx].set(res.points),
    )
    # clear observations the BA gated out
    removed = win.problem.obs_mask & ~res.inlier_mask       # (Pw, Kw)
    obs_mask = m.obs_mask.at[
        win.kf_idx[None, :], win.pt_idx[:, None]
    ].min(~removed)
    return m._replace(obs_mask=obs_mask)


def extract_global_ba(m: MapState, intr) -> ba.BAProblem:
    """Whole-map BA problem: every valid keyframe and every valid point.

    The reference cannot do this — its BA is bounded to the center KF + 10
    covisible neighbours (map.cc:848-851) because g2o solves on one CPU
    thread. Here the problem stays fixed-capacity (the map capacities ARE
    the problem shape), so the full map is one batched linearization; with a
    device mesh the point blocks shard across chips (dist.ba_sharded).

    Gauge: the two oldest valid keyframes are held fixed (position + scale
    of the monocular gauge), like ``extract_local_ba``.
    """
    K, P, _ = m.capacities
    kf_ok = m.kf_valid
    pt_ok = m.pt_valid & (
        jnp.sum(m.obs_mask & kf_ok[:, None], axis=0) >= 2
    )
    obs_mask = (m.obs_mask & kf_ok[:, None] & pt_ok[None, :]).T   # (P, K)
    uv = jnp.stack([
        (m.obs_px[..., 0] - intr.cx) / intr.fx,
        (m.obs_px[..., 1] - intr.cy) / intr.fy,
    ], -1).transpose(1, 0, 2)                                     # (P, K, 2)

    age = jnp.where(kf_ok, m.kf_frame_id, jnp.iinfo(jnp.int32).max)
    oldest = jnp.argsort(age)[:2]
    fixed = jnp.zeros(K, bool).at[oldest].set(True) | ~kf_ok

    return ba.BAProblem(poses=m.kf_pose, fixed=fixed, points=m.pt_pos,
                        obs_uv=uv, obs_mask=obs_mask)


def global_ba(m: MapState, intr, mesh=None, stage_iters=(8, 12),
              axis: str = "point") -> MapState:
    """Full-map bundle adjustment + write-back.

    The offline/anytime refinement pass the reference lacks (its map drifts
    with whatever local BA left behind). Single-device by default; pass a
    ``jax.sharding.Mesh`` to shard the point blocks over ``axis`` and psum
    the reduced camera system over ICI (dist.ba_sharded.solve_sharded) —
    point capacity then scales linearly with devices. The reduced camera
    solve is a dense (6K, 6K) Cholesky up to ba.CG_KF_THRESHOLD keyframe
    slots and matrix-free block-Jacobi PCG beyond (ba._schur_solve_cg), so
    Zurich-scale maps (max_keyframes 1000) never materialize the dense
    system.
    """
    problem = extract_global_ba(m, intr)
    huber = jnp.sqrt(5.991) / jnp.minimum(intr.fx, intr.fy)
    if mesh is None:
        res = ba.solve(problem, huber=huber, stage_iters=tuple(stage_iters))
    else:
        from ..dist import ba_sharded
        res = ba_sharded.solve_sharded(
            problem, mesh, huber=float(huber),
            stage_iters=tuple(stage_iters), axis=axis,
        )

    free = ~problem.fixed
    m = m._replace(
        kf_pose=jnp.where(free[:, None], res.poses, m.kf_pose),
        pt_pos=jnp.where(m.pt_valid[:, None], res.points, m.pt_pos),
    )
    removed = problem.obs_mask & ~res.inlier_mask                 # (P, K)
    return m._replace(obs_mask=m.obs_mask & ~removed.T)


def prune_weak_points(m: MapState, min_obs: int = 2,
                      grace_keyframes: int = 2) -> MapState:
    """Drop points whose observation support collapsed (BA gating or KF
    eviction can orphan them) — the reference deletes points when their
    feature list empties (map.cc passim)."""
    n_obs = jnp.sum(m.obs_mask & m.kf_valid[:, None], axis=0)
    # points anchored at recent keyframes get a grace period to gather obs
    anchor_age = m.kf_frame_id[m.pt_anchor_kf]
    recent = anchor_age >= jnp.max(
        jnp.where(m.kf_valid, m.kf_frame_id, -1)
    ) - grace_keyframes
    keep = (n_obs >= min_obs) | recent
    return m._replace(pt_valid=m.pt_valid & keep)


def check_redundant_keyframes(m: MapState) -> MapState:
    """Prune keyframes whose points are redundantly observed.

    Mirrors Map::CheckRedundantKeyframes (map.cc:619-687): a keyframe whose
    observed points are >=80% also seen by >=3 *other* keyframes **at the
    same or finer scale** (map.cc:667 ``level2 <= level1+1``) is dropped.
    The scale test matters: a point re-observed only from far away (coarse
    pyramid levels) does not make the close-up keyframe redundant, because
    the coarse observations cannot replace its fine-scale BA constraints.

    Vectorized form: per level ``l`` build ``cnt_le[l, p]`` = how many valid
    keyframes observe point ``p`` at level <= ``l`` (an (L+1, K, P) masked
    reduce), then each observation (k, p) at level ``l1`` gathers
    ``cnt_le[l1+1, p] - 1`` as its same-or-finer-scale support from other
    keyframes (the -1 removes the observation itself, which always passes
    its own scale test). The newest two keyframes are protected.

    Points ANCHORED at the pruned keyframe are re-homed, not dropped: the
    dense observation structure carries per-KF ``obs_px``/``obs_level`` for
    every observer, so the anchor role (patch source + measured level,
    matcher._anchor_data) moves to the point's newest other observer in one
    gather. The anchor ORB descriptor is kept — it describes the point's
    appearance, like the reference Feature's stored descriptor. Without
    re-homing the ">=80% redundant" test almost never fires in practice:
    as a map matures every keyframe anchors something (round-4 review).
    """
    K, P, _ = m.capacities
    L = len(m.kf_pyr)
    obs_at = m.obs_mask & m.kf_valid[:, None] & m.pt_valid[None, :]
    lvls = jnp.arange(L + 1, dtype=m.obs_level.dtype)
    cnt_le = jnp.sum(
        obs_at[None] & (m.obs_level[None] <= lvls[:, None, None]), axis=1
    )                                                            # (L+1, P)
    thr = jnp.clip(m.obs_level + 1, 0, L)                        # (K, P)
    support = cnt_le[thr, jnp.arange(P)[None, :]] - 1            # (K, P)
    redundant = obs_at & (support >= 3)
    per_kf_total = jnp.sum(m.obs_mask & m.pt_valid[None, :], axis=1)
    per_kf_red = jnp.sum(redundant, axis=1)
    frac = per_kf_red / jnp.maximum(per_kf_total, 1)
    newest = jnp.argsort(-jnp.where(m.kf_valid, m.kf_frame_id, -1))[:2]
    protect = jnp.zeros(K, bool).at[newest].set(True)
    drop = m.kf_valid & (frac > 0.8) & (per_kf_total > 10) & ~protect
    # drop at most one per call (like one pass of the reference loop)
    first = jnp.argmax(drop)
    do = jnp.any(drop)

    # re-home anchors before the obs row dies: newest OTHER observer wins
    obs_other = obs_at & (jnp.arange(K) != first)[:, None]       # (K, P)
    alt_key = jnp.where(obs_other, m.kf_frame_id[:, None], -1)
    new_anchor = jnp.argmax(alt_key, axis=0).astype(jnp.int32)   # (P,)
    has_alt = jnp.any(obs_other, axis=0)
    rehome = do & m.pt_valid & (m.pt_anchor_kf == first)
    pt_anchor_kf = jnp.where(rehome & has_alt, new_anchor, m.pt_anchor_kf)
    pt_valid = m.pt_valid & ~(rehome & ~has_alt)

    kf_valid = m.kf_valid.at[first].set(
        jnp.where(do, False, m.kf_valid[first])
    )
    obs_mask = m.obs_mask.at[first].set(
        jnp.where(do, jnp.zeros(P, bool), m.obs_mask[first])
    )
    cand_valid = jnp.where(
        do & (m.cand_kf == first), False, m.cand_valid
    )
    return m._replace(kf_valid=kf_valid, obs_mask=obs_mask,
                      cand_valid=cand_valid, pt_anchor_kf=pt_anchor_kf,
                      pt_valid=pt_valid,
                      n_pruned=m.n_pruned + do.astype(jnp.int32))


def need_keyframe(n_matches, kf_matches, frames_since_kf,
                  min_keyframe_its: int = 30, lost_ratio: float = 0.7):
    """Keyframe policy (Map::NeedKeyframe, map.cc:170-188): enough frames
    elapsed AND 10% of matches lost, OR 30% lost outright. Host-side scalars.
    """
    lost = 1.0 - n_matches / max(float(kf_matches), 1.0)
    return (frames_since_kf >= min_keyframe_its and lost > 0.1) or lost > 0.3


def transform_initial_map(m: MapState, key, dist_thresh: float = 0.1):
    """Rotate/translate the world so the dominant plane of the initial map
    becomes z = 0 with the cameras on the +z side.

    Mirrors Map::TransformInitialMap (reference map.cc:704-837: RANSAC plane
    + PCA + rotation to the floor plane) as one jitted program. Returns
    ``(m', T_new_old (7,))`` — apply ``T`` to any external pose records
    (e.g. the trajectory) via ``se3.compose(pose, se3.inverse(T))``.
    """
    (n, d), _inl = geometry.fit_plane_ransac(
        m.pt_pos, m.pt_valid, key, thresh=dist_thresh
    )
    # orient the plane so the first camera (world origin) is above it
    flip = d < 0
    n = jnp.where(flip, -n, n)
    d = jnp.where(flip, -d, d)
    R = geometry.rotation_between(n, jnp.asarray([0.0, 0.0, 1.0]))
    t = jnp.asarray([0.0, 0.0, 1.0]) * d
    T = se3.from_rt(R, t)  # world_old -> world_new

    pt_pos = se3.transform(T[None], m.pt_pos)
    kf_pose = se3.compose(m.kf_pose, se3.inverse(T)[None])
    m = m._replace(pt_pos=pt_pos, kf_pose=kf_pose)
    return m, T
