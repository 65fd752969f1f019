"""The whole SLAM state machine as ONE device program — zero host round trips.

TPU-native redesign of the reference's tracking FSM (reference sdvl.h:38-42
FIRST_FRAME/SECOND_FRAME/RUNNING + SDVL::HandleFrame, sdvl.cc:55-130). The
host-FSM variant (pipeline.sdvl.SDVL) pulls a few scalars per frame to make
its Python-side decisions; on this TPU runtime the FIRST device->host
transfer permanently degrades every subsequent launch to a ~25 ms
synchronous round trip (tunnel sync mode), which caps the pipeline at ~5-8
FPS regardless of compute. The fix is structural, not incremental: every
decision the reference takes in C++ control flow (bootstrap accept/retry,
tracking quality, lost->relocalize, keyframe policy) happens *on device* via
``lax.switch``/``lax.cond`` over an integer state, the per-frame outputs are
returned as device references, and the host never reads a scalar until the
sequence is over. One launch per frame (or one per chunk with
:func:`make_chunk_step`'s ``lax.scan``), pure async dispatch, ~ms-level
steady-state frame times.

States: 0 FIRST_FRAME, 1 SECOND_FRAME, 2 RUNNING, 3 LOST (sdvl.h:38-42 plus
the reference's implicit "lost" flag, sdvl.cc:73-89).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import geometry, se3
from ..ops import fast as fast_ops
from ..ops import interp, orb, pyramid
from ..state.map_state import (MapState, alloc_slots, empty_map,
                               store_pyramid)
from . import bootstrap, depth_filter, mapper, matcher, relocalize, tracker
from .config import Config, intrinsics

STATE_FIRST = 0
STATE_SECOND = 1
STATE_RUNNING = 2
STATE_LOST = 3

QUALITY_BAD = 0
QUALITY_INSUFFICIENT = 1
QUALITY_GOOD = 2


class SlamCarry(NamedTuple):
    """Inter-frame device state (what the reference keeps in SDVL members)."""

    state: jnp.ndarray        # () int32, STATE_*
    key: jnp.ndarray          # (2,) uint32 PRNG key
    frame_id: jnp.ndarray     # () int32
    pose: jnp.ndarray         # (7,) last world->cam pose
    xi_model: jnp.ndarray     # (6,) constant-velocity model (sdvl.cc:266-281)
    frames_since_kf: jnp.ndarray  # () int32
    kf_matches: jnp.ndarray   # () int32 matches at last keyframe
    lost_frames: jnp.ndarray  # () int32 consecutive bad frames (sdvl.cc:73)
    # first-frame snapshot for two-view bootstrap (sdvl.cc:132-148)
    pyr1: Tuple[jnp.ndarray, ...]
    c1_xy: jnp.ndarray        # (N, 2)
    c1_valid: jnp.ndarray     # (N,)
    # previous frame (alignment reference, sdvl.cc:179-203)
    last_pyr: Tuple[jnp.ndarray, ...]
    last_idx: jnp.ndarray     # (S,) last frame's matched point slots
    last_ok: jnp.ndarray      # (S,)


class FrameInfo(NamedTuple):
    """Per-frame outputs (device refs until the host finalizes)."""

    pose: jnp.ndarray         # (7,) world->cam after this frame
    world_tf: jnp.ndarray     # (7,) world rebasing applied THIS frame
                              # (identity except at ground-plane alignment)
    state: jnp.ndarray        # () int32 state AFTER the frame
    quality: jnp.ndarray      # () int32 QUALITY_*
    n_matches: jnp.ndarray    # () int32
    n_attempts: jnp.ndarray   # () int32
    is_keyframe: jnp.ndarray  # () bool
    n_corners: jnp.ndarray    # () int32
    median_shift: jnp.ndarray # () f32 (bootstrap diagnostics)


def init_state(cfg: Config, seed: int = 0):
    """Fresh (MapState, SlamCarry) sized by the config capacities."""
    s = cfg.sdvl
    H, W = cfg.camera.height, cfg.camera.width
    div = 1 << (s.pyramid_levels - 1)
    ch, cw = (H // div) * div, (W // div) * div
    m = empty_map(n_kf=s.max_keyframes, n_pts=s.max_points,
                  n_cand=s.max_candidates, img_shape=(ch, cw),
                  levels=s.pyramid_levels)
    return m, init_carry(cfg, seed)


def init_carry(cfg: Config, seed: int = 0) -> "SlamCarry":
    """Fresh per-stream SlamCarry WITHOUT allocating a MapState.

    Shared-map serving (dist/multi_stream.py frozen mode) builds one carry
    per stream against a single replicated map; going through init_state
    there would transiently allocate a full keyframe store (0.46 GB at
    Zurich capacity) per stream just to throw it away."""
    s = cfg.sdvl
    H, W = cfg.camera.height, cfg.camera.width
    div = 1 << (s.pyramid_levels - 1)
    ch, cw = (H // div) * div, (W // div) * div

    def fresh_pyr():
        # distinct allocations: pyr1/last_pyr live in one donated carry and
        # aliased buffers trip "donate the same buffer twice"
        return tuple(
            jnp.zeros((ch >> l, cw >> l), jnp.float32)
            for l in range(s.pyramid_levels)
        )

    # corner capacity = detector output shape (static fn of image size)
    pyr_structs = tuple(
        jax.ShapeDtypeStruct((ch >> l, cw >> l), jnp.float32)
        for l in range(s.pyramid_levels)
    )
    probe = jax.eval_shape(
        functools.partial(fast_ops.detect_pyramid, levels=s.max_fast_levels,
                          cell=s.cell_size, fast_threshold=s.fast_threshold,
                          st_threshold=s.min_feature_score,
                          max_features=s.num_features),
        pyr_structs,
    )
    n_corners = probe.xy.shape[0]
    n_cells = (cw // s.cell_size) * (ch // s.cell_size)
    # match-lane capacity: per-cell winners capped by Config::MaxMatches
    # (matcher.match_map_points max_matches top-k) — the carry's match set
    # must share that static shape
    n_cells = min(n_cells, s.max_matches)

    return SlamCarry(
        state=jnp.asarray(STATE_FIRST, jnp.int32),
        key=jax.random.PRNGKey(seed),
        frame_id=jnp.asarray(0, jnp.int32),
        pose=se3.identity(),
        xi_model=jnp.zeros(6, jnp.float32),
        frames_since_kf=jnp.asarray(0, jnp.int32),
        kf_matches=jnp.asarray(1, jnp.int32),
        lost_frames=jnp.asarray(0, jnp.int32),
        pyr1=fresh_pyr(),
        c1_xy=jnp.zeros((n_corners, 2), jnp.float32),
        c1_valid=jnp.zeros(n_corners, bool),
        last_pyr=fresh_pyr(),
        last_idx=jnp.zeros(n_cells, jnp.int32),
        last_ok=jnp.zeros(n_cells, bool),
    )


def _where_tree(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(
            jnp.reshape(pred, (1,) * x.ndim) if x.ndim else pred, x, y
        ),
        a, b,
    )


def make_step(cfg: Config, undistort: bool):
    """Build ``step(m, carry, img, grid) -> (m, carry, FrameInfo)``.

    ``img`` is the raw (cropped) frame, any integer/float dtype — uint8
    recommended: host->device bytes ride the same tunnel as launches.
    ``grid`` is the undistort map (ignored when ``undistort`` is False but
    must still be passed — keeps one signature for jit/donation).
    """
    s = cfg.sdvl
    intr = intrinsics(cfg)
    levels = s.pyramid_levels

    def preprocess(img, grid, lock_xy, lock_valid):
        img = img.astype(jnp.float32)
        if undistort:
            img = interp.remap(img, grid)
        pyr = tuple(pyramid.build_pyramid(img, levels))
        corners = fast_ops.detect_pyramid(
            pyr, levels=s.max_fast_levels, cell=s.cell_size,
            fast_threshold=s.fast_threshold,
            st_threshold=s.min_feature_score,
            max_features=s.num_features,
            use_pallas=s.use_pallas_detect,
            lock_xy=lock_xy, lock_valid=lock_valid,
        )
        return pyr, corners

    def _info(carry, **kw):
        base = FrameInfo(
            pose=carry.pose,
            world_tf=se3.identity(),
            state=carry.state,
            quality=jnp.asarray(QUALITY_GOOD, jnp.int32),
            n_matches=jnp.asarray(0, jnp.int32),
            n_attempts=jnp.asarray(0, jnp.int32),
            is_keyframe=jnp.asarray(False),
            n_corners=jnp.asarray(0, jnp.int32),
            median_shift=jnp.asarray(0.0, jnp.float32),
        )
        return base._replace(**kw)

    # ------------------------------------------------------------ FIRST
    def first_frame(m, carry, pyr, corners):
        """Reference SaveFirstFrame (sdvl.cc:132-148): keep the frame if it
        has enough corners, else try again next frame."""
        n = jnp.sum(corners.valid).astype(jnp.int32)
        ok = n >= s.min_init_corners
        carry = carry._replace(
            state=jnp.where(ok, STATE_SECOND, STATE_FIRST).astype(jnp.int32),
            pyr1=_where_tree(ok, pyr, carry.pyr1),
            c1_xy=jnp.where(ok, corners.xy, carry.c1_xy),
            c1_valid=jnp.where(ok, corners.valid, carry.c1_valid),
        )
        return m, carry, _info(carry, n_corners=n)

    # ------------------------------------------------------------ SECOND
    def seed_map(m, carry, pyr, corners, boot):
        """Write both bootstrap keyframes + triangulated points + candidate
        seeds (reference InitSecondFrame success path,
        homography_init.cc:124-182 + sdvl.cc:162-176)."""
        pose1 = se3.identity()
        kf_pyr = tuple(
            lvl.at[0].set(i1).at[1].set(i2)
            for lvl, i1, i2 in zip(
                m.kf_pyr, store_pyramid(carry.pyr1), store_pyramid(pyr)
            )
        )
        m = m._replace(
            kf_pose=m.kf_pose.at[0].set(pose1).at[1].set(boot.pose2),
            kf_valid=m.kf_valid.at[0].set(True).at[1].set(True),
            kf_frame_id=m.kf_frame_id.at[0].set(
                carry.frame_id - 1).at[1].set(carry.frame_id),
            kf_pyr=kf_pyr,
            n_keyframes=jnp.asarray(2, jnp.int32),
        )
        slots, _ok = alloc_slots(~m.pt_valid, boot.inlier)
        desc1 = orb.descriptors(carry.pyr1[0], boot.px1,
                                radius=s.orb_size // 2)
        m = m._replace(
            pt_pos=m.pt_pos.at[slots].set(boot.pts_w, mode="drop"),
            pt_desc=m.pt_desc.at[slots].set(desc1, mode="drop"),
            pt_valid=m.pt_valid.at[slots].set(True, mode="drop"),
            pt_anchor_kf=m.pt_anchor_kf.at[slots].set(0, mode="drop"),
            pt_found=m.pt_found.at[slots].set(2, mode="drop"),
            pt_fail=m.pt_fail.at[slots].set(0, mode="drop"),
            obs_mask=m.obs_mask.at[0, slots].set(True, mode="drop")
                               .at[1, slots].set(True, mode="drop"),
            obs_px=m.obs_px.at[0, slots].set(boot.px1, mode="drop")
                           .at[1, slots].set(boot.px2, mode="drop"),
        )
        depth_med = jnp.asarray(s.map_scale, jnp.float32)
        m, _ = depth_filter.seed_candidates(
            m, intr, pyr, (corners.xy, corners.level, corners.valid),
            jnp.asarray(1, jnp.int32), depth_med, s.cell_size,
            orb_radius=s.orb_size // 2,
        )
        # two-view BA over the seed map (sdvl.cc:172 Map::BundleAdjustment)
        m = mapper.local_ba(m, intr, jnp.asarray(1, jnp.int32), window=1,
                            max_points=min(s.max_points, 512))
        pose = m.kf_pose[1]
        T = se3.identity()
        if s.align_ground_plane:
            key_t = jax.random.fold_in(carry.key, 1)
            m, T = mapper.transform_initial_map(m, key_t)
            pose = se3.compose(pose, se3.inverse(T))
        mr = matcher.match_map_points(m, intr, pyr, pose, cell=s.cell_size,
                                      use_orb=s.use_orb,
                                      half=s.patch_size // 2,
                                      lk_iters=s.max_align_its,
                                      reproj_px=float(s.search_size),
                                      max_matches=s.max_matches,
                                      orb_radius=s.orb_size // 2)
        n_match = jnp.maximum(jnp.sum(mr.ok), 1).astype(jnp.int32)
        carry = carry._replace(
            state=jnp.asarray(STATE_RUNNING, jnp.int32),
            pose=pose,
            last_idx=mr.pt_idx,
            last_ok=mr.ok,
            kf_matches=n_match,
            frames_since_kf=jnp.asarray(0, jnp.int32),
            xi_model=jnp.zeros(6, jnp.float32),
        )
        return m, carry, T

    def second_frame(m, carry, pyr, corners):
        """Reference SaveSecondFrame (sdvl.cc:150-176): flow + homography;
        restart on flow collapse, wait on low parallax, seed on success."""
        key = jax.random.fold_in(carry.key, 0)
        boot = bootstrap.init_two_view(
            intr, carry.pyr1, pyr, carry.c1_xy, carry.c1_valid, key,
            map_scale=s.map_scale, thresh_px=s.inlier_error_threshold,
            min_corners=s.min_init_corners,
        )
        success = (boot.ok_flow & (boot.median_shift >= s.min_avg_shift)
                   & (boot.n_inliers >= s.min_init_corners))

        def do_seed(args):
            return seed_map(*args, boot)

        def no_seed(args):
            m, carry, _pyr, _corners = args
            state = jnp.where(boot.ok_flow, STATE_SECOND, STATE_FIRST)
            return m, carry._replace(state=state.astype(jnp.int32)), \
                se3.identity()

        m, carry, T = jax.lax.cond(
            success, do_seed, no_seed, (m, carry, pyr, corners)
        )
        info = _info(
            carry, world_tf=T, is_keyframe=success,
            n_matches=boot.n_inliers, median_shift=boot.median_shift,
        )
        return m, carry, info

    # ----------------------------------------------------------- RUNNING
    def running(m, carry, pyr, corners):
        """One steady-state tracking step (sdvl.cc:55-130 RUNNING/LOST)."""
        is_lost = carry.state == STATE_LOST
        S = carry.last_idx.shape[0]

        def do_reloc(_):
            """Relocalize (sdvl.cc:205-238): the alignment reference becomes
            the best-matching KEYFRAME (its pyramid, pose and observed
            points), not the previous — possibly garbage — frame."""
            lvl = min(4, levels - 1)

            def reloc_at(max_kf):
                return relocalize.relocalize(m, intr, pyr, carry.pose,
                                             level=lvl, max_kf=max_kf)

            if (s.reloc_escalate_after >= 0
                    and s.max_keyframes > s.reloc_max_keyframes):
                # kidnapped-robot escape hatch: the nearest-to-guess lane
                # prior is wrong after a teleport (the guess is garbage) —
                # after reloc_escalate_after failed frames, pay for the
                # full-K sweep the reference always does (sdvl.cc:205-238).
                # lost_frames counts from 0; LOST begins at 3 (bad_path)
                rl = jax.lax.cond(
                    carry.lost_frames >= 3 + s.reloc_escalate_after,
                    lambda _: reloc_at(s.max_keyframes),
                    lambda _: reloc_at(s.reloc_max_keyframes),
                    None,
                )
            else:
                rl = reloc_at(s.reloc_max_keyframes)
            # f32: lax.cond branch outputs must match do_predict's dtype
            ref_pyr = tuple(p[rl.kf].astype(jnp.float32) for p in m.kf_pyr)
            obs = m.obs_mask[rl.kf] & m.pt_valid
            order = jnp.argsort(~obs)[:S].astype(jnp.int32)
            return ref_pyr, order, obs[order], m.kf_pose[rl.kf], rl.pose

        def do_predict(_):
            pred = se3.compose(se3.exp(carry.xi_model), carry.pose)
            return (carry.last_pyr, carry.last_idx, carry.last_ok,
                    carry.pose, pred)

        ref_pyr, ref_idx, ref_ok, pose_ref, pose_pred = jax.lax.cond(
            is_lost, do_reloc, do_predict, None
        )

        tr = tracker.track_frame(
            m, intr, ref_pyr, ref_idx, ref_ok,
            pose_ref, pyr, pose_pred,
            cell=s.cell_size, align_max_level=s.max_align_level,
            align_min_level=s.min_align_level,
            align_iters=max(s.max_img_align_its // 3, 1),
            pose_iters=s.max_optim_pose_its,
            inlier_thresh_px=s.inlier_error_threshold,
            use_orb=s.use_orb,
            ransac_key=jax.random.fold_in(carry.key, carry.frame_id),
            ransac_hypotheses=min(s.ransac_hypotheses, s.max_ransac_its),
            ransac_points=s.max_ransac_points,
            patch_half=s.patch_size // 2, lk_iters=s.max_align_its,
            search_px=float(s.search_size), max_matches=s.max_matches,
            align_patch_half=s.align_patch_size // 2,
            orb_radius=s.orb_size // 2,
            affine_illum=s.use_affine_illum,
        )
        if not s.localize_only:
            # frozen-map serving must not age out points that happen to be
            # unobserved from the query viewpoints; and NO frame counts
            # failures while relocalizing (feature_align.cc:128,141) —
            # else a LOST stretch deletes the map out from under the
            # relocalizer
            m = tracker.update_point_stats(m, tr, max_failed=s.max_failed,
                                           enabled=~is_lost)

        ratio = tr.n_matches / jnp.maximum(tr.n_attempts, 1)
        quality = jnp.where(
            tr.n_matches < s.min_matches, QUALITY_BAD,
            jnp.where(ratio < 0.2, QUALITY_INSUFFICIENT, QUALITY_GOOD),
        ).astype(jnp.int32)
        good = quality != QUALITY_BAD

        def bad_path(args):
            m, carry = args
            lost_frames = carry.lost_frames + 1
            carry = carry._replace(
                pose=pose_pred,
                lost_frames=lost_frames,
                state=jnp.where(lost_frames >= 3, STATE_LOST,
                                STATE_RUNNING).astype(jnp.int32),
            )
            return m, carry, jnp.asarray(False)

        def good_path(args):
            m, carry = args
            xi_model, _ = tracker.motion_model_update(
                carry.xi_model, tr.pose, carry.pose
            )
            # recovering from LOST: the previous pose was a relocalization
            # guess, so the velocity estimate is meaningless — coast from
            # rest (the reference re-enters RUNNING the same way,
            # sdvl.cc:83-89 after Relocalize)
            xi_model = jnp.where(is_lost, jnp.zeros_like(xi_model), xi_model)
            frames_since_kf = carry.frames_since_kf + 1
            # keyframe policy (Map::NeedKeyframe, map.cc:170-188)
            lost = 1.0 - tr.n_matches / jnp.maximum(
                carry.kf_matches.astype(jnp.float32), 1.0
            )
            is_kf = (((frames_since_kf >= s.min_keyframe_its) & (lost > 0.1))
                     | (lost > 0.3))
            if s.localize_only:
                is_kf = jnp.asarray(False)

            def with_kf(m):
                m, slot = mapper.add_keyframe(
                    m, intr, pyr, tr.pose, carry.frame_id,
                    tr.match_pt_idx, tr.match_px, tr.match_ok,
                    tr.match_level,
                    corners.xy, corners.level, corners.valid, s.cell_size,
                    n_search_kf=s.max_search_keyframes,
                    max_reobs=s.max_reobs,
                    scale_min_dist=s.scale_min_dist, map_scale=s.map_scale,
                    use_orb=s.use_orb, epipolar_samples=s.epipolar_samples,
                    patch_half=s.patch_size // 2, lk_iters=s.max_align_its,
                    orb_radius=s.orb_size // 2,
                    corner_gate=s.epipolar_corner_gate,
                    corner_thresh=s.min_feature_score,
                )
                m = mapper.local_ba(
                    m, intr, slot,
                    window=min(10, s.max_keyframes - 1),
                    max_points=min(s.max_points, 512),
                )
                # redundant-KF pruning happens in update_map below, every
                # frame (reference map.cc:121 non-KF iterations)
                return mapper.prune_weak_points(m)

            if not s.localize_only:
                # mapping stage — compiled out entirely in localize_only
                # serving (the map is immutable; the step is pure tracking)
                m = jax.lax.cond(is_kf, with_kf, lambda m: m, m)
                m = mapper.update_map(
                    m, intr, pyr, tr.pose, n_samples=s.epipolar_samples,
                    threshold_converged=s.threshold_converged,
                    max_failed=s.max_failed, use_orb=s.use_orb,
                    patch_half=s.patch_size // 2, lk_iters=s.max_align_its,
                    orb_radius=s.orb_size // 2,
                    stale_kf_window=2 * s.max_search_keyframes,
                    map_scale=s.map_scale, scale_min_dist=s.scale_min_dist,
                    corner_gate=s.epipolar_corner_gate,
                    corner_thresh=s.min_feature_score,
                )
            carry = carry._replace(
                pose=tr.pose,
                xi_model=xi_model,
                lost_frames=jnp.asarray(0, jnp.int32),
                state=jnp.asarray(STATE_RUNNING, jnp.int32),
                frames_since_kf=jnp.where(is_kf, 0, frames_since_kf),
                # HIGH-WATER mark, not the at-KF snapshot (deliberate
                # departure from map.cc:170-188, identical whenever matches
                # only decay after a keyframe — the reference's handheld
                # regime): freshly promoted candidates can push matches
                # well ABOVE the insertion-time count (measured 21 -> 56 at
                # fast sweep speeds), and a stale low snapshot then blinds
                # the "lost > 0.1" decay test for the whole overshoot —
                # a 70-frame keyframe stall that starves the map
                kf_matches=jnp.where(
                    is_kf, jnp.maximum(tr.n_matches, 1),
                    jnp.maximum(carry.kf_matches, tr.n_matches)
                ),
                last_idx=tr.match_pt_idx,
                last_ok=tr.match_ok,
            )
            return m, carry, is_kf

        m, carry, is_kf = jax.lax.cond(good, good_path, bad_path, (m, carry))
        info = _info(carry, quality=quality, n_matches=tr.n_matches,
                     n_attempts=tr.n_attempts, is_keyframe=is_kf)
        return m, carry, info

    # -------------------------------------------------------------- step
    def step(m: MapState, carry: SlamCarry, img, grid):
        # steady-state cell locking (fast_detector.cc:48-56,
        # frame.cc:141-144): suppress detector cells that already hold
        # tracked map points, projected at the previous frame's pose (the
        # new pose doesn't exist yet; inter-frame motion is << a 32 px
        # cell). In FIRST/SECOND states last_ok is all-False -> no-op.
        pts_cam = se3.transform(carry.pose, m.pt_pos[carry.last_idx])
        lock_xy = cam.project(intr, pts_cam)
        # in-bounds: occupied_cells clips coordinates into the grid, so an
        # off-image projection (stale match set + extrapolated pose during
        # LOST) would otherwise lock a border cell it isn't in
        lock_valid = (carry.last_ok & m.pt_valid[carry.last_idx]
                      & (pts_cam[:, 2] > 0.0)
                      & cam.in_bounds(intr, lock_xy, margin=0))
        pyr, corners = preprocess(img, grid, lock_xy, lock_valid)

        # localize_only sessions start in LOST against a loaded map; the
        # bootstrap states are unreachable, so compiling them out shrinks
        # the program to pure tracking + relocalization
        if s.localize_only:
            branches = [running, running, running, running]
        else:
            branches = [first_frame, second_frame, running, running]
        m, carry, info = jax.lax.switch(
            jnp.clip(carry.state, 0, 3), branches, m, carry, pyr, corners
        )
        carry = carry._replace(
            last_pyr=pyr,
            frame_id=carry.frame_id + 1,
        )
        return m, carry, info

    return step


def make_chunk_step(cfg: Config, undistort: bool):
    """``chunk_step(m, carry, imgs (T,H,W), grid)`` — ``lax.scan`` over a
    stack of frames. One launch and one host->device transfer per T frames:
    dispatch cost amortizes to nothing and XLA overlaps the per-frame work.
    Returns stacked FrameInfo (leading dim T)."""
    step = make_step(cfg, undistort)

    def chunk_step(m, carry, imgs, grid):
        def body(mc, img):
            m, carry = mc
            m, carry, info = step(m, carry, img, grid)
            return (m, carry), info

        (m, carry), infos = jax.lax.scan(body, (m, carry), imgs)
        return m, carry, infos

    return chunk_step
