"""Top-level SLAM orchestrator: the host-side FSM over jitted device steps.

TPU-native replacement for the reference's SDVL class + main loop glue
(reference sdvl.{h,cc}: the FIRST_FRAME/SECOND_FRAME/RUNNING state machine
sdvl.h:38-42, HandleFrame sdvl.cc:55-130, relocalization sdvl.cc:73-89 and
205-238, motion model sdvl.cc:266-281, tracking quality sdvl.cc:240-264).

Division of labor (SURVEY.md §7 "host/device split"):
  * Everything per-pixel/per-point runs in a handful of jitted programs
    with shapes fixed by the Config capacities.
  * The FSM itself — a dozen scalar decisions per frame — runs in Python
    on scalars pulled from the device (one small transfer per frame).

Mapping runs inline by default ("sequential mode", reference main.cc:97);
the async runtime (tracker/mapper overlap) lives in sdvl_tpu.runtime.
"""

from __future__ import annotations

import enum
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam
from ..core import se3
from ..ops import fast as fast_ops
from ..ops import interp, pyramid
from ..solvers import image_align
from ..state.map_state import (MapState, alloc_slots, empty_map,
                               store_pyramid)
from . import bootstrap, mapper, matcher, relocalize, tracker
from .config import Config, intrinsics


class TrackingState(enum.Enum):
    FIRST_FRAME = 0
    SECOND_FRAME = 1
    RUNNING = 2
    LOST = 3


class TrackingQuality(enum.Enum):
    BAD = 0
    INSUFFICIENT = 1
    GOOD = 2


class SDVL:
    """The system facade (reference SDVL::HandleFrame/GetPose, sdvl.h:57-69)."""

    def __init__(self, config: Config, seed: int = 0, tracer=None):
        from ..utils.trace import Tracer

        self.tracer = tracer if tracer is not None else Tracer(enabled=False)
        self.cfg = config
        s = config.sdvl
        self.intr = intrinsics(config)
        self.levels = s.pyramid_levels
        H, W = config.camera.height, config.camera.width
        div = 1 << (self.levels - 1)
        self.crop_h = (H // div) * div
        self.crop_w = (W // div) * div

        self.m: MapState = empty_map(
            n_kf=s.max_keyframes, n_pts=s.max_points,
            n_cand=s.max_candidates, img_shape=(self.crop_h, self.crop_w),
            levels=self.levels,
        )
        self._undistort_grid = None
        if any(abs(d) > 1e-12 for d in config.camera.dist):
            # device-resident, but always passed as a jit *argument*
            self._undistort_grid = jax.device_put(
                cam.undistort_map(self.intr)[: self.crop_h, : self.crop_w]
            )

        self.state = TrackingState.FIRST_FRAME
        self.quality = TrackingQuality.GOOD
        self.frame_id = 0
        self.frames_since_kf = 0
        self.kf_matches = 1
        self.lost_frames = 0
        self.key = jax.random.PRNGKey(seed)
        # immutable base key: per-frame fold_in must match the device FSM's
        # (carry.key never mutates there) so both drivers gate identically
        self.key0 = jax.random.PRNGKey(seed)

        # device-side inter-frame state
        self.last_pyr = None
        self.last_pose = se3.identity()
        self.xi_model = jnp.zeros(6, jnp.float32)
        self.last_match_idx = None
        self.last_match_ok = None
        self._first_fs = None
        self._async_mapper = None  # set by runtime.AsyncMapper
        self.trajectory = []  # (frame_id, pose 7) host copies

        self._build_jits()

    # ------------------------------------------------------------------ jit
    def _build_jits(self):
        s = self.cfg.sdvl
        intr = self.intr
        has_grid = self._undistort_grid is not None

        # NOTE: these closures may capture `intr` (numpy leaves -> HLO
        # literals) and Python scalars, but NEVER device arrays — the
        # undistort grid is threaded through as an argument. Closure-captured
        # device arrays poison this TPU runtime (~30 ms/launch sync mode).
        def _pre(img, grid, lock_xy=None, lock_valid=None):
            img = img.astype(jnp.float32)
            if has_grid:
                img = interp.remap(img, grid)
            pyr = pyramid.build_pyramid(img, self.levels)
            corners = fast_ops.detect_pyramid(
                pyr, levels=s.max_fast_levels, cell=s.cell_size,
                fast_threshold=s.fast_threshold,
                st_threshold=s.min_feature_score,
                max_features=s.num_features,
                use_pallas=s.use_pallas_detect,
                lock_xy=lock_xy, lock_valid=lock_valid,
            )
            return pyr, corners

        _preprocess = jax.jit(_pre)

        @jax.jit
        def _preprocess_locked(img, grid, pt_pos, pt_valid, idx, ok, pose):
            """Steady-state variant (fast_detector.cc:48-56,
            frame.cc:141-144): suppress detector cells already holding
            tracked map points, projected at the previous frame's pose
            (inter-frame motion is << a cell)."""
            pts_cam = se3.transform(pose, pt_pos[idx])
            lock_xy = cam.project(intr, pts_cam)
            # in-bounds: occupied_cells clips into the grid, so off-image
            # projections would wrongly lock border cells
            lock_valid = (ok & pt_valid[idx] & (pts_cam[:, 2] > 0.0)
                          & cam.in_bounds(intr, lock_xy, margin=0))
            return _pre(img, grid, lock_xy, lock_valid)

        @jax.jit
        def _bootstrap(pyr1, pyr2, corners_xy, corners_valid, key):
            return bootstrap.init_two_view(
                intr, pyr1, pyr2, corners_xy, corners_valid, key,
                map_scale=s.map_scale,
                thresh_px=s.inlier_error_threshold,
                min_corners=s.min_init_corners,
            )

        @jax.jit
        def _seed_map(m: MapState, pyr1, pyr2, boot, corners2_xy,
                      corners2_level, corners2_valid):
            """Write the two bootstrap keyframes + triangulated points."""
            pose1 = se3.identity()
            kf_pyr = tuple(
                lvl.at[0].set(i1).at[1].set(i2)
                for lvl, i1, i2 in zip(
                    m.kf_pyr, store_pyramid(pyr1), store_pyramid(pyr2)
                )
            )
            m = m._replace(
                kf_pose=m.kf_pose.at[0].set(pose1).at[1].set(boot.pose2),
                kf_valid=m.kf_valid.at[0].set(True).at[1].set(True),
                kf_frame_id=m.kf_frame_id.at[0].set(0).at[1].set(1),
                kf_pyr=kf_pyr,
                n_keyframes=jnp.asarray(2, jnp.int32),
            )
            from ..ops import orb

            slots, ok = alloc_slots(~m.pt_valid, boot.inlier)
            desc1 = orb.descriptors(pyr1[0], boot.px1, radius=s.orb_size // 2)
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
            # seed depth-filter candidates from the 2nd frame's corners
            from . import depth_filter
            depth_med = jnp.asarray(s.map_scale, jnp.float32)
            m, _ = depth_filter.seed_candidates(
                m, intr, pyr2, (corners2_xy, corners2_level, corners2_valid),
                jnp.asarray(1, jnp.int32), depth_med, s.cell_size,
                orb_radius=s.orb_size // 2,
            )
            return m

        @jax.jit
        def _track(m, last_pyr, last_idx, last_ok, pose_last, cur_pyr,
                   pose_pred, key, stats_enabled):
            tr = tracker.track_frame(
                m, intr, last_pyr, last_idx, last_ok, pose_last,
                cur_pyr, pose_pred,
                cell=s.cell_size, align_max_level=s.max_align_level,
                align_min_level=s.min_align_level,
                align_iters=s.max_img_align_its // 3,
                pose_iters=s.max_optim_pose_its,
                inlier_thresh_px=s.inlier_error_threshold,
                use_orb=s.use_orb,
                ransac_key=key,
                ransac_hypotheses=min(s.ransac_hypotheses, s.max_ransac_its),
                ransac_points=s.max_ransac_points,
                patch_half=s.patch_size // 2, lk_iters=s.max_align_its,
                search_px=float(s.search_size), max_matches=s.max_matches,
                align_patch_half=s.align_patch_size // 2,
                orb_radius=s.orb_size // 2,
                affine_illum=s.use_affine_illum,
            )
            # no failure counting while relocalizing
            # (feature_align.cc:128,141) — a LOST stretch must not decay
            # the map the relocalizer depends on
            m = tracker.update_point_stats(m, tr, max_failed=s.max_failed,
                                           enabled=stats_enabled)
            return m, tr

        @jax.jit
        def _update_stats(m, tr, enabled):
            """Standalone stat fold for the async mapper (runtime.py), which
            owns all map writes and replays the tracker's stat update —
            including the relocalizing gate (feature_align.cc:128,141), so
            async and sync drivers decay points identically."""
            return tracker.update_point_stats(m, tr, max_failed=s.max_failed,
                                              enabled=enabled)

        @jax.jit
        def _update_map(m, cur_pyr, pose):
            return mapper.update_map(
                m, intr, cur_pyr, pose,
                n_samples=s.epipolar_samples,
                threshold_converged=s.threshold_converged,
                max_failed=s.max_failed,
                use_orb=s.use_orb,
                patch_half=s.patch_size // 2, lk_iters=s.max_align_its,
                orb_radius=s.orb_size // 2,
                stale_kf_window=2 * s.max_search_keyframes,
                map_scale=s.map_scale, scale_min_dist=s.scale_min_dist,
                corner_gate=s.epipolar_corner_gate,
                corner_thresh=s.min_feature_score,
            )

        @jax.jit
        def _add_keyframe(m, pyr, pose, frame_id, match_idx, match_px,
                          match_ok, match_level, corners_xy, corners_level,
                          corners_valid):
            return mapper.add_keyframe(
                m, intr, pyr, pose, frame_id, match_idx, match_px, match_ok,
                match_level, corners_xy, corners_level, corners_valid,
                s.cell_size,
                n_search_kf=s.max_search_keyframes, max_reobs=s.max_reobs,
                scale_min_dist=s.scale_min_dist, map_scale=s.map_scale,
                use_orb=s.use_orb, epipolar_samples=s.epipolar_samples,
                patch_half=s.patch_size // 2, lk_iters=s.max_align_its,
                orb_radius=s.orb_size // 2,
            )

        @functools.partial(jax.jit, static_argnames=("window", "max_points"))
        def _local_ba(m, center, window=10, max_points=512):
            return mapper.local_ba(m, intr, center, window=window,
                                   max_points=max_points)

        @jax.jit
        def _match_initial(m, pyr, pose):
            """Initial match set after bootstrap — jitted: eager dispatch
            over the device tunnel can stall for minutes per op."""
            return matcher.match_map_points(
                m, intr, pyr, pose, cell=s.cell_size, use_orb=s.use_orb,
                half=s.patch_size // 2, lk_iters=s.max_align_its,
                reproj_px=float(s.search_size), max_matches=s.max_matches,
                orb_radius=s.orb_size // 2,
            )

        @jax.jit
        def _transform_initial(m, key):
            return mapper.transform_initial_map(m, key)

        @jax.jit
        def _apply_world_tf(pose, T):
            return se3.compose(pose, se3.inverse(T))

        @jax.jit
        def _motion_update(xi_prev, pose_new, pose_old):
            return tracker.motion_model_update(xi_prev, pose_new, pose_old)

        @jax.jit
        def _predict(xi_model, pose_last):
            return se3.compose(se3.exp(xi_model), pose_last)

        @jax.jit
        def _relocalize(m, cur_pyr, pose_guess):
            return relocalize.relocalize(m, intr, cur_pyr, pose_guess,
                                         max_kf=s.reloc_max_keyframes)

        @jax.jit
        def _relocalize_full(m, cur_pyr, pose_guess):
            # kidnapped-robot escalation: all-keyframe sweep (compiled
            # lazily — a session that never escalates never pays for it)
            return relocalize.relocalize(m, intr, cur_pyr, pose_guess,
                                         max_kf=s.max_keyframes)

        @functools.partial(jax.jit, static_argnames=("n_ref",))
        def _reloc_ref(m, kf, n_ref):
            """Tracking reference for a relocalized frame: the winning
            KEYFRAME's pyramid, pose and observed points — never the stale
            (lost) previous frame (mirrors device_fsm.do_reloc; reference
            sdvl.cc:217-231 aligns kf -> current)."""
            ref_pyr = tuple(p[kf].astype(jnp.float32) for p in m.kf_pyr)
            obs = m.obs_mask[kf] & m.pt_valid
            order = jnp.argsort(~obs)[:n_ref].astype(jnp.int32)
            return ref_pyr, order, obs[order], m.kf_pose[kf]

        @jax.jit
        def _prune(m):
            # redundant-KF pruning lives in _update_map (every frame,
            # reference map.cc:121); here only weak-point cleanup post-BA
            return mapper.prune_weak_points(m)

        self._preprocess = _preprocess
        self._preprocess_locked = _preprocess_locked
        self._update_stats = _update_stats
        self._bootstrap = _bootstrap
        self._seed_map = _seed_map
        self._track = _track
        self._update_map = _update_map
        self._add_keyframe = _add_keyframe
        self._local_ba = _local_ba
        self._motion_update = _motion_update
        self._predict = _predict
        self._relocalize = _relocalize
        self._relocalize_full = _relocalize_full
        self._reloc_ref = _reloc_ref
        self._prune = _prune
        self._match_initial = _match_initial
        self._transform_initial = _transform_initial
        self._apply_world_tf = _apply_world_tf

    # ----------------------------------------------------------------- util
    def _crop(self, img: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(img[: self.crop_h, : self.crop_w])

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def get_pose(self) -> np.ndarray:
        """Current world->cam pose (7,) like SDVL::GetPose (sdvl.cc:347)."""
        return np.asarray(self.last_pose)

    # ------------------------------------------------------------ main loop
    def handle_frame(self, img: np.ndarray) -> dict:
        """Process one grayscale frame; returns a status dict.

        Mirrors SDVL::HandleFrame (sdvl.cc:55-130). ``img`` is (H, W)
        grayscale, uint8 or float.
        """
        s = self.cfg.sdvl
        with self.tracer.span("preprocess"):
            if self.last_match_idx is not None:
                m_now = self.m   # ONE read: the async mapper publishes via
                                 # a single attribute store; two reads could
                                 # mix fields from different map versions
                pyr, corners = self._preprocess_locked(
                    self._crop(img), self._undistort_grid, m_now.pt_pos,
                    m_now.pt_valid, self.last_match_idx,
                    self.last_match_ok, self.last_pose,
                )
            else:
                pyr, corners = self._preprocess(
                    self._crop(img), self._undistort_grid
                )
        info = {"frame_id": self.frame_id, "state": self.state.name,
                "n_matches": 0, "n_attempts": 0, "keyframe": False}

        if self.state == TrackingState.FIRST_FRAME:
            n_corners = int(corners.valid.sum())
            if n_corners >= s.min_init_corners:
                self._first_fs = (pyr, corners)
                self.state = TrackingState.SECOND_FRAME
            info["n_corners"] = n_corners

        elif self.state == TrackingState.SECOND_FRAME:
            pyr1, corners1 = self._first_fs
            # fixed fold_in constants, NOT a split chain: the device FSM
            # derives its bootstrap/plane keys as fold_in(key, 0/1)
            # (device_fsm.py second_frame/seed_map) and driver equivalence
            # requires identical RANSAC draws
            boot = self._bootstrap(
                pyr1, pyr, corners1.xy, corners1.valid,
                jax.random.fold_in(self.key0, 0),
            )
            med_shift = float(boot.median_shift)
            n_inl = int(boot.n_inliers)
            info.update(median_shift=med_shift, n_inliers=n_inl)
            if not bool(boot.ok_flow):
                # flow collapsed: restart from scratch (sdvl.cc:156-160)
                self.state = TrackingState.FIRST_FRAME
                self._first_fs = None
            elif med_shift >= s.min_avg_shift and n_inl >= s.min_init_corners:
                self.m = self._seed_map(
                    self.m, pyr1, pyr, boot,
                    corners.xy, corners.level, corners.valid,
                )
                self.m = self._local_ba(self.m, jnp.asarray(1, jnp.int32),
                                        window=1)
                self.last_pose = self.m.kf_pose[1]
                if s.align_ground_plane:
                    # z=0-align the initial map (Map::TransformInitialMap)
                    self.m, T = self._transform_initial(
                        self.m, jax.random.fold_in(self.key0, 1)
                    )
                    self.last_pose = self._apply_world_tf(self.last_pose, T)
                    self.trajectory = [
                        (fid, np.asarray(self._apply_world_tf(
                            jnp.asarray(p), T)))
                        for fid, p in self.trajectory
                    ]
                # initial match set = the seeded points' obs in KF1
                mr = self._match_initial(self.m, pyr, self.last_pose)
                self.last_match_idx = mr.pt_idx
                self.last_match_ok = mr.ok
                self.kf_matches = max(int(mr.ok.sum()), 1)
                self.state = TrackingState.RUNNING
                self.frames_since_kf = 0
                info["keyframe"] = True
            # else: wait for more parallax (stay in SECOND_FRAME)

        elif self.state in (TrackingState.RUNNING, TrackingState.LOST):
            was_lost = self.state == TrackingState.LOST
            if was_lost:
                with self.tracer.span("relocalize"):
                    # escalation condition mirrors device_fsm.do_reloc
                    # exactly (driver-equivalence tests compare the FSMs)
                    escalate = (
                        s.reloc_escalate_after >= 0
                        and s.max_keyframes > s.reloc_max_keyframes
                        and self.lost_frames >= 3 + s.reloc_escalate_after
                    )
                    reloc_fn = (self._relocalize_full if escalate
                                else self._relocalize)
                    rl = reloc_fn(self.m, pyr, self.last_pose)
                    pose_pred = rl.pose
                    ref_pyr, ref_idx, ref_ok, pose_ref = self._reloc_ref(
                        self.m, rl.kf, self.last_match_idx.shape[0]
                    )
            else:
                pose_pred = self._predict(self.xi_model, self.last_pose)
                ref_pyr, ref_idx, ref_ok, pose_ref = (
                    self.last_pyr, self.last_match_idx,
                    self.last_match_ok, self.last_pose,
                )

            with self.tracer.span("track"):
                m_tracked, tr = self._track(
                    self.m, ref_pyr, ref_idx, ref_ok, pose_ref, pyr,
                    pose_pred,
                    jax.random.fold_in(self.key0, self.frame_id),
                    jnp.asarray(not was_lost),
                )
                if self._async_mapper is None:
                    self.m = m_tracked
                # else: the mapper thread owns map writes and replays the
                # stat fold itself; m_tracked is discarded (runtime.py)
                # one batched device_get: each separate scalar pull costs a
                # full tunnel round trip
                n_matches, n_attempts = (
                    int(v) for v in jax.device_get(
                        (tr.n_matches, tr.n_attempts))
                )
            info.update(n_matches=n_matches, n_attempts=n_attempts,
                        # device refs (no transfer unless a consumer, e.g.
                        # viz.VizRecorder, converts them)
                        match_px=tr.match_px, match_ok=tr.match_ok,
                        match_attempted=tr.match_attempted)

            ratio = n_matches / max(n_attempts, 1)
            if n_matches < s.min_matches:
                self.quality = TrackingQuality.BAD
            elif ratio < 0.2:
                self.quality = TrackingQuality.INSUFFICIENT
            else:
                self.quality = TrackingQuality.GOOD

            if self.quality == TrackingQuality.BAD:
                self.lost_frames += 1
                if self.lost_frames >= 3:
                    self.state = TrackingState.LOST
                # pose not trusted; keep motion-model prediction
                self.last_pose = pose_pred
            else:
                self.lost_frames = 0
                if was_lost:
                    # recovering: previous pose was a relocalization guess,
                    # the velocity estimate is meaningless — coast from rest
                    # (device_fsm good_path does the same)
                    self.xi_model = jnp.zeros(6, jnp.float32)
                else:
                    self.xi_model, _ = self._motion_update(
                        self.xi_model, tr.pose, self.last_pose
                    )
                self.last_pose = tr.pose
                self.state = TrackingState.RUNNING

                self.frames_since_kf += 1
                is_kf = mapper.need_keyframe(
                    n_matches, self.kf_matches, self.frames_since_kf,
                    min_keyframe_its=s.min_keyframe_its,
                    lost_ratio=s.lost_ratio,
                )
                if is_kf:
                    self.kf_matches = max(n_matches, 1)
                    self.frames_since_kf = 0
                    info["keyframe"] = True
                else:
                    # high-water mark, mirroring device_fsm.good_path (see
                    # the comment there): candidate promotions can push
                    # matches above the at-KF snapshot, and the decay test
                    # must measure against the best recent coverage or it
                    # stalls for the whole overshoot
                    self.kf_matches = max(self.kf_matches, n_matches)

                if self._async_mapper is not None:
                    # hand mapping work to the mapper thread (reference
                    # Map::AddKeyframe/AddFrame queue handoff, map.cc:145-163)
                    if is_kf:
                        self._async_mapper.submit_keyframe(
                            tr, pyr, tr.pose,
                            jnp.asarray(self.frame_id, jnp.int32), corners,
                            stats_enabled=jnp.asarray(not was_lost),
                        )
                    else:
                        self._async_mapper.submit_frame(
                            tr, pyr, self.last_pose,
                            stats_enabled=jnp.asarray(not was_lost),
                        )
                else:
                    if is_kf:
                        with self.tracer.span("keyframe"):
                            self.m, slot = self._add_keyframe(
                                self.m, pyr, tr.pose,
                                jnp.asarray(self.frame_id, jnp.int32),
                                tr.match_pt_idx, tr.match_px, tr.match_ok,
                                tr.match_level,
                                corners.xy, corners.level, corners.valid,
                            )
                            with self.tracer.span("ba"):
                                self.m = self._local_ba(self.m, slot)
                            self.m = self._prune(self.m)
                    with self.tracer.span("map_update"):
                        self.m = self._update_map(self.m, pyr, self.last_pose)
                self.last_match_idx = tr.match_pt_idx
                self.last_match_ok = tr.match_ok

        self.last_pyr = pyr
        self.trajectory.append((self.frame_id, np.asarray(self.last_pose)))
        self.frame_id += 1
        info["pose"] = np.asarray(self.last_pose)
        return info
