"""World-model state: frames, keyframes, points, candidates — as one pytree.

TPU-native replacement for the reference's pointer-rich world model
(reference frame.{h,cc}, feature.{h,cc}, point.{h,cc}, map.{h,cc}): Frame
objects holding feature vectors, Features back-pointing to Frames and Points,
Points holding observation lists, the Map holding shared_ptr lists guarded by
a mutex. None of that survives contact with XLA; instead the whole map is a
single fixed-capacity SoA pytree:

  * Keyframes: ``K`` slots — pose, validity, stacked image pyramids.
  * Points:    ``P`` slots — world position, anchor info, filter counters.
  * Observations: a dense ``(K, P)`` masked matrix. The reference's Feature
    objects (feature.h:38-105) become entries ``obs_mask[k, p]`` with
    pixel/unit-plane measurements in parallel ``(K, P, ...)`` arrays.
    Covisibility (frame.cc:192-212 sorted connection lists) is then just
    ``obs @ obs.T`` — one int matmul on the MXU instead of hash-map walks.
  * Candidates: ``C`` slots of Bayesian inverse-depth filter state
    (point.h:37-147), updated as fused elementwise ops.

Deleted objects are simply cleared mask bits — the reference's trash-vector
deferred deletion dance (map.cc:207-254) does not exist because nothing is
heap-allocated.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import se3


class FrameState(NamedTuple):
    """One processed camera frame (reference frame.h:41-173)."""

    pyr: Tuple[jnp.ndarray, ...]   # L levels, (H/2^l, W/2^l) f32
    pose: jnp.ndarray              # (7,) world->cam
    corner_xy: jnp.ndarray         # (C2, 2) detected corners, level-0 px
    corner_level: jnp.ndarray      # (C2,) int32
    corner_score: jnp.ndarray      # (C2,)
    corner_valid: jnp.ndarray      # (C2,) bool
    frame_id: jnp.ndarray          # () int32


class MapState(NamedTuple):
    # --- keyframes ---
    kf_pose: jnp.ndarray           # (K, 7)
    kf_valid: jnp.ndarray          # (K,) bool
    kf_frame_id: jnp.ndarray       # (K,) int32 (age/order; -1 empty)
    kf_pyr: Tuple[jnp.ndarray, ...]  # per level (K, H/2^l, W/2^l) uint8
                                   #   (the reference stores 8U cv::Mat
                                   #   pyramids, frame.cc:114-120; u8 at
                                   #   rest is 4x less HBM than f32 — at
                                   #   max_keyframes=1000 (Zurich preset)
                                   #   the store would otherwise be ~1.6 GB.
                                   #   Samplers convert at gather time.)

    # --- dense observation structure ---
    obs_mask: jnp.ndarray          # (K, P) bool
    obs_px: jnp.ndarray            # (K, P, 2) pixel position of observation
    obs_level: jnp.ndarray         # (K, P) int32 pyramid level

    # --- world points ---
    pt_pos: jnp.ndarray            # (P, 3) world xyz
    pt_valid: jnp.ndarray          # (P,) bool
    pt_anchor_kf: jnp.ndarray      # (P,) int32 keyframe slot of anchor obs
    pt_fail: jnp.ndarray           # (P,) int32 consecutive failed projections
                                   #   (reference point.cc:103-116, delete at 15)
    pt_found: jnp.ndarray          # (P,) int32 total successful observations
    pt_desc: jnp.ndarray           # (P, 8) uint32 anchor ORB descriptor
                                   #   (reference feature.h descriptor; used
                                   #   when Config.use_orb to gate matches)

    # --- depth-filter candidates (reference point.h Bayesian filter) ---
    cand_valid: jnp.ndarray        # (C,) bool
    cand_kf: jnp.ndarray           # (C,) int32 anchor keyframe slot
    cand_px: jnp.ndarray           # (C, 2) anchor pixel
    cand_level: jnp.ndarray        # (C,) int32
    cand_bearing: jnp.ndarray      # (C, 3) unit bearing in anchor cam
    cand_rho: jnp.ndarray          # (C,) inverse-depth mean
    cand_sigma2: jnp.ndarray       # (C,) inverse-depth variance
    cand_a: jnp.ndarray            # (C,) Beta inlier count
    cand_b: jnp.ndarray            # (C,) Beta outlier count
    cand_fail: jnp.ndarray         # (C,) consecutive failed epipolar searches
    cand_desc: jnp.ndarray         # (C, 8) uint32 anchor ORB descriptor

    # --- counters ---
    n_keyframes: jnp.ndarray       # () int32 total ever added
    n_evicted: jnp.ndarray         # () int32 keyframes removed by the
                                   #   capacity cap (map.cc:190-205 analog)
    n_pruned: jnp.ndarray          # () int32 keyframes removed as redundant
                                   #   (map.cc:619-687 analog)

    @property
    def capacities(self):
        K, P = self.obs_mask.shape
        C = self.cand_valid.shape[0]
        return K, P, C


def store_pyramid(pyr):
    """Quantize a float pyramid for the keyframe store (uint8, like the
    reference's 8U Mats). Rounding, not truncation — keeps LK/ZMSSD patch
    reads centered on the measured intensity."""
    return tuple(
        jnp.clip(jnp.round(p), 0.0, 255.0).astype(jnp.uint8) for p in pyr
    )


def empty_map(n_kf: int, n_pts: int, n_cand: int, img_shape: Tuple[int, int],
              levels: int) -> MapState:
    H, W = img_shape
    pyr = tuple(
        jnp.zeros((n_kf, H >> l, W >> l), jnp.uint8) for l in range(levels)
    )
    return MapState(
        kf_pose=se3.identity((n_kf,)),
        kf_valid=jnp.zeros(n_kf, bool),
        kf_frame_id=jnp.full(n_kf, -1, jnp.int32),
        kf_pyr=pyr,
        obs_mask=jnp.zeros((n_kf, n_pts), bool),
        obs_px=jnp.zeros((n_kf, n_pts, 2), jnp.float32),
        obs_level=jnp.zeros((n_kf, n_pts), jnp.int32),
        pt_pos=jnp.zeros((n_pts, 3), jnp.float32),
        pt_valid=jnp.zeros(n_pts, bool),
        pt_anchor_kf=jnp.zeros(n_pts, jnp.int32),
        pt_fail=jnp.zeros(n_pts, jnp.int32),
        pt_found=jnp.zeros(n_pts, jnp.int32),
        pt_desc=jnp.zeros((n_pts, 8), jnp.uint32),
        cand_valid=jnp.zeros(n_cand, bool),
        cand_kf=jnp.zeros(n_cand, jnp.int32),
        cand_px=jnp.zeros((n_cand, 2), jnp.float32),
        cand_level=jnp.zeros(n_cand, jnp.int32),
        cand_bearing=jnp.zeros((n_cand, 3), jnp.float32),
        cand_rho=jnp.zeros(n_cand, jnp.float32),
        cand_sigma2=jnp.zeros(n_cand, jnp.float32),
        cand_a=jnp.zeros(n_cand, jnp.float32),
        cand_b=jnp.zeros(n_cand, jnp.float32),
        cand_fail=jnp.zeros(n_cand, jnp.int32),
        cand_desc=jnp.zeros((n_cand, 8), jnp.uint32),
        n_keyframes=jnp.asarray(0, jnp.int32),
        n_evicted=jnp.asarray(0, jnp.int32),
        n_pruned=jnp.asarray(0, jnp.int32),
    )


def alloc_slots(free: jnp.ndarray, incoming_valid: jnp.ndarray):
    """Assign each valid incoming item a free slot index.

    Replaces heap allocation (the reference's ``new Point``/``shared_ptr``)
    with a rank-based scatter: the i-th valid incoming item takes the i-th
    free slot. Returns ``(slots (M,), ok (M,))`` where ``ok`` is False for
    invalid items or when free slots ran out; rejected items get slot == N
    (out of range — scatter with mode='drop' discards them).
    """
    N = free.shape[0]
    order = jnp.argsort(~free)          # free slots first, stable
    n_free = jnp.sum(free)
    rank = jnp.cumsum(incoming_valid) - 1
    ok = incoming_valid & (rank < n_free) & (rank >= 0)
    slots = jnp.where(ok, order[jnp.clip(rank, 0, N - 1)], N)
    return slots, ok


def covisibility(m: MapState) -> jnp.ndarray:
    """(K, K) shared-point counts — reference frame.cc:192-212's sorted
    connection lists as a single int matmul."""
    obs = m.obs_mask.astype(jnp.float32)
    covis = obs @ obs.T
    covis = covis * m.kf_valid[:, None] * m.kf_valid[None, :]
    return covis - jnp.diag(jnp.diag(covis))


def best_connections(m: MapState, kf: jnp.ndarray, n: int):
    """Top-n covisible keyframe slots of ``kf`` (reference GetBestConnections
    frame.h usage at map.cc:850). Returns (idx (n,), counts (n,))."""
    covis = covisibility(m)
    row = covis[kf]
    counts, idx = jax.lax.top_k(row, n)
    return idx, counts


def kf_slot_to_evict(m: MapState, cur_pos: jnp.ndarray) -> jnp.ndarray:
    """Furthest keyframe from current camera position (reference
    map.cc:190-205 keyframe-cap eviction)."""
    centers = se3.translation(se3.inverse(m.kf_pose))
    d = jnp.linalg.norm(centers - cur_pos, axis=-1)
    d = jnp.where(m.kf_valid, d, -jnp.inf)
    return jnp.argmax(d)
