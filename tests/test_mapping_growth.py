"""Keyframe reobservation + triangulated candidate seeding + non-planar e2e.

Round-2 parity closures (VERDICT r1 items 1, 3, 4):
  * Map::AddConnectionsPoints (reference map.cc:560-617) — new keyframes
    re-link existing map points seen by covisible keyframes.
  * Map::InitCandidates triangulated seeding (reference map.cc:262-400) —
    fresh depth-filter seeds re-center at a triangulated depth instead of
    the median-scene-depth prior.
  * Accuracy beyond the textured plane: the MultiPlaneScene end-to-end gate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sdvl_tpu.core import camera, se3
from sdvl_tpu.io import evaluate
from sdvl_tpu.io.synthetic import (MultiPlaneScene, PlaneScene, _np_se3_exp,
                                   _np_se3_inverse)
from sdvl_tpu.ops import pyramid
from sdvl_tpu.pipeline import depth_filter, mapper, matcher
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
from sdvl_tpu.state.map_state import empty_map, store_pyramid

W, H = 320, 240
INTR = camera.Intrinsics.create(210.0, 210.0, 159.5, 119.5, width=W, height=H)
LEVELS = 4


def _project_np(pose, pts):
    """World points -> pixels through a (7,) world->cam pose, NumPy."""
    from sdvl_tpu.io.synthetic import _np_quat_to_matrix

    R = _np_quat_to_matrix(np.asarray(pose[:4], np.float64))
    t = np.asarray(pose[4:], np.float64)
    pc = pts @ R.T + t
    return np.stack([210.0 * pc[:, 0] / pc[:, 2] + 159.5,
                     210.0 * pc[:, 1] / pc[:, 2] + 119.5], -1), pc[:, 2]


def _pyr(img):
    return tuple(pyramid.build_pyramid(jnp.asarray(img), LEVELS))


@pytest.fixture(scope="module")
def two_view_plane():
    """Two rendered plane views + world points on the plane."""
    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=W, height=H, plane_z=4.0)
    pose0 = np.asarray(se3.identity())
    pose1 = _np_se3_inverse(_np_se3_exp(
        np.array([0.25, 0.1, 0.02, 0.01, 0.02, 0.0], np.float32)))
    pose2 = _np_se3_inverse(_np_se3_exp(
        np.array([0.45, 0.18, 0.05, 0.02, 0.03, 0.01], np.float32)))
    # world points: unproject a pixel grid of view 0 onto the plane z=4
    us = np.arange(40, 280, 24, np.float64)
    vs = np.arange(40, 200, 24, np.float64)
    uu, vv = np.meshgrid(us, vs)
    xn = (uu.ravel() - 159.5) / 210.0
    yn = (vv.ravel() - 119.5) / 210.0
    pts = np.stack([xn * 4.0, yn * 4.0, np.full_like(xn, 4.0)], -1)
    return scene, (pose0, pose1, pose2), pts


def _seed_two_kf_map(scene, poses, pts, n_pts_cap=128):
    """MapState with KF0/KF1 observing all points (exact projections)."""
    pose0, pose1, _ = poses
    N = len(pts)
    m = empty_map(n_kf=6, n_pts=n_pts_cap, n_cand=256, img_shape=(H, W),
                  levels=LEVELS)
    kf_pyr = tuple(
        lvl.at[0].set(p0).at[1].set(p1)
        for lvl, p0, p1 in zip(m.kf_pyr,
                               store_pyramid(_pyr(scene.render(pose0))),
                               store_pyramid(_pyr(scene.render(pose1))))
    )
    px0, _ = _project_np(pose0, pts)
    px1, _ = _project_np(pose1, pts)
    idx = jnp.arange(N)
    m = m._replace(
        kf_pose=m.kf_pose.at[0].set(jnp.asarray(pose0))
                          .at[1].set(jnp.asarray(pose1)),
        kf_valid=m.kf_valid.at[0].set(True).at[1].set(True),
        kf_frame_id=m.kf_frame_id.at[0].set(0).at[1].set(1),
        kf_pyr=kf_pyr,
        pt_pos=m.pt_pos.at[idx].set(jnp.asarray(pts, jnp.float32)),
        pt_valid=m.pt_valid.at[idx].set(True),
        pt_anchor_kf=m.pt_anchor_kf.at[idx].set(0),
        pt_found=m.pt_found.at[idx].set(2),
        obs_mask=m.obs_mask.at[0, idx].set(True).at[1, idx].set(True),
        obs_px=m.obs_px.at[0, idx].set(jnp.asarray(px0, jnp.float32))
                       .at[1, idx].set(jnp.asarray(px1, jnp.float32)),
        n_keyframes=jnp.asarray(2, jnp.int32),
    )
    return m, N


def _add_kf2(m, scene, poses, pts, N, max_reobs):
    """Insert pose2 as a keyframe whose match set covers HALF the points."""
    pose2 = poses[2]
    px2, _ = _project_np(pose2, pts)
    half_n = N // 2
    match_idx = jnp.arange(half_n, dtype=jnp.int32)
    match_px = jnp.asarray(px2[:half_n], jnp.float32)
    match_ok = jnp.ones(half_n, bool)
    match_level = jnp.zeros(half_n, jnp.int32)
    no_corners = (jnp.zeros((4, 2)), jnp.zeros(4, jnp.int32),
                  jnp.zeros(4, bool))
    m2, slot = mapper.add_keyframe(
        m, INTR, _pyr(scene.render(pose2)), jnp.asarray(pose2),
        jnp.asarray(2, jnp.int32), match_idx, match_px, match_ok,
        match_level, no_corners[0], no_corners[1], no_corners[2],
        cell=32, max_reobs=max_reobs,
    )
    return m2, int(slot), half_n


def test_reobservation_relinks_points(two_view_plane):
    """New keyframes gain observations beyond their tracked match set
    (Map::AddConnectionsPoints, map.cc:560-617)."""
    scene, poses, pts = two_view_plane
    m, N = _seed_two_kf_map(scene, poses, pts)

    m_base, slot_b, half_n = _add_kf2(m, scene, poses, pts, N, max_reobs=0)
    m_reob, slot_r, _ = _add_kf2(m, scene, poses, pts, N, max_reobs=128)
    assert slot_b == slot_r

    n_base = int(m_base.obs_mask[slot_b].sum())
    n_reob = int(m_reob.obs_mask[slot_r].sum())
    assert n_base == half_n
    # most of the unmatched half is re-linked by patch verification
    assert n_reob > n_base + (N - half_n) // 2, (n_base, n_reob, N)

    # mean observations-per-point strictly exceeds the matches-only baseline
    obs_per_pt_base = np.asarray(
        m_base.obs_mask.sum(0)[np.asarray(m_base.pt_valid)])
    obs_per_pt_reob = np.asarray(
        m_reob.obs_mask.sum(0)[np.asarray(m_reob.pt_valid)])
    assert obs_per_pt_reob.mean() > obs_per_pt_base.mean()

    # reobserved pixels agree with the exact projections
    px2, _ = _project_np(poses[2], pts)
    relinked = np.asarray(
        m_reob.obs_mask[slot_r] & ~m_base.obs_mask[slot_b]
    )[: len(pts)]
    got = np.asarray(m_reob.obs_px[slot_r])[: len(pts)][relinked]
    want = px2[relinked]
    err = np.linalg.norm(got - want, axis=-1)
    assert np.median(err) < 1.0, err


def test_triangulated_seeding_recenters_depth():
    """Fresh seeds re-initialize at the triangulated depth, not the median
    prior (Map::InitCandidates, map.cc:262-400 + point.cc:48-61)."""
    scene = MultiPlaneScene()
    pose0 = np.asarray(se3.identity())
    pose1 = _np_se3_inverse(_np_se3_exp(
        np.array([0.3, 0.12, 0.02, 0.0, 0.01, 0.0], np.float32)))

    m = empty_map(n_kf=4, n_pts=64, n_cand=256, img_shape=(H, W),
                  levels=LEVELS)
    kf_pyr = tuple(
        lvl.at[0].set(p0).at[1].set(p1)
        for lvl, p0, p1 in zip(m.kf_pyr,
                               store_pyramid(_pyr(scene.render(pose0))),
                               store_pyramid(_pyr(scene.render(pose1))))
    )
    # shared observations so KF0 is covisible with KF1 (best_connections)
    pts = np.array([[0.0, 0.0, 6.0], [0.5, 0.3, 6.0], [-0.6, 0.4, 6.0],
                    [0.3, -0.5, 6.0]])
    px0, _ = _project_np(pose0, pts)
    px1, _ = _project_np(pose1, pts)
    idx = jnp.arange(4)
    m = m._replace(
        kf_pose=m.kf_pose.at[0].set(jnp.asarray(pose0))
                          .at[1].set(jnp.asarray(pose1)),
        kf_valid=m.kf_valid.at[0].set(True).at[1].set(True),
        kf_frame_id=m.kf_frame_id.at[0].set(0).at[1].set(1),
        kf_pyr=kf_pyr,
        pt_pos=m.pt_pos.at[idx].set(jnp.asarray(pts, jnp.float32)),
        pt_valid=m.pt_valid.at[idx].set(True),
        obs_mask=m.obs_mask.at[0, idx].set(True).at[1, idx].set(True),
        obs_px=m.obs_px.at[0, idx].set(jnp.asarray(px0, jnp.float32))
                       .at[1, idx].set(jnp.asarray(px1, jnp.float32)),
        n_keyframes=jnp.asarray(2, jnp.int32),
    )

    # corners in KF1 over depth-varied structure (true depths 2.8 .. 6)
    depth_gt = scene.depth(pose1)
    us = np.arange(32, 300, 16, np.float64)
    vs = np.arange(32, 220, 16, np.float64)
    uu, vv = np.meshgrid(us, vs)
    corner_xy = np.stack([uu.ravel(), vv.ravel()], -1).astype(np.float32)
    corners = (jnp.asarray(corner_xy),
               jnp.zeros(len(corner_xy), jnp.int32),
               jnp.ones(len(corner_xy), bool))

    depth_med = jnp.asarray(4.2, jnp.float32)
    m, new_mask = depth_filter.seed_candidates(
        m, INTR, tuple(p[1] for p in m.kf_pyr), corners,
        jnp.asarray(1, jnp.int32), depth_med, cell=32,
    )
    prior_rho = float(1.0 / depth_med)
    m_tri = depth_filter.triangulate_new_seeds(
        m, INTR, jnp.asarray(1, jnp.int32), depth_med, new_mask,
    )

    moved = np.asarray(
        (jnp.abs(m_tri.cand_rho - prior_rho) > 1e-4)
        & m_tri.cand_valid & new_mask
    )
    assert moved.sum() >= 10, f"only {moved.sum()} seeds re-centered"

    # re-centered seeds agree with ground-truth depth
    cand_px = np.asarray(m_tri.cand_px)
    gt = depth_gt[np.clip(cand_px[:, 1].astype(int), 0, H - 1),
                  np.clip(cand_px[:, 0].astype(int), 0, W - 1)]
    est = 1.0 / np.maximum(np.asarray(m_tri.cand_rho), 1e-6)
    rel = np.abs(est[moved] - gt[moved]) / gt[moved]
    assert np.median(rel) < 0.1, (np.median(rel), est[moved][:8],
                                  gt[moved][:8])
    # and the prior would have been badly off for the near structure
    near = moved & (gt < 3.5)
    if near.sum() >= 3:
        prior_rel = np.abs(1.0 / prior_rho - gt[near]) / gt[near]
        tri_rel = np.abs(est[near] - gt[near]) / gt[near]
        assert np.median(tri_rel) < np.median(prior_rel)


@pytest.fixture(scope="module")
def multiplane_run():
    scene = MultiPlaneScene()
    cfg = Config(
        camera=CameraConfig(width=W, height=H, fx=210.0, fy=210.0,
                            u0=159.5, v0=119.5, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(cell_size=32, min_avg_shift=5.0, max_keyframes=10,
                        min_keyframe_its=5, min_init_corners=30,
                        max_points=512, max_candidates=256, min_matches=15,
                        map_scale=4.0),
    )
    from sdvl_tpu.pipeline.sdvl import SDVL

    slam = SDVL(cfg, seed=0)
    poses_gt = scene.trajectory(30)
    infos = [slam.handle_frame(scene.render(p)) for p in poses_gt]
    return slam, infos, poses_gt


def test_multiplane_tracks_and_ate(multiplane_run):
    """Accuracy gate on NON-PLANAR structure (VERDICT r1: every ATE number
    ever produced was the textured plane)."""
    slam, infos, poses_gt = multiplane_run
    assert infos[-1]["state"] == "RUNNING"
    start = next(i for i, inf in enumerate(infos) if inf["state"] == "RUNNING")
    est = np.stack([inf["pose"] for inf in infos[start:]])
    gt = np.stack(poses_gt[start:])
    p_est = evaluate.positions_from_poses(est)
    p_gt = evaluate.positions_from_poses(gt)
    extent = float(np.linalg.norm(np.ptp(p_gt, axis=0)))
    ate = evaluate.ate_rmse(p_est, p_gt, with_scale=True)
    assert ate < 0.03 * max(extent, 1e-6), f"ATE {ate} vs extent {extent}"


def test_multiplane_map_has_depth_structure(multiplane_run):
    """The converged map must span the scene's depth range — depth filters
    and triangulation actually resolved non-planar structure."""
    slam, _, _ = multiplane_run
    valid = np.asarray(slam.m.pt_valid)
    assert valid.sum() >= 40
    z = np.asarray(slam.m.pt_pos)[valid, 2]
    # after ground-plane alignment the backdrop is ~z=0 and the boxes float
    # in front; the spread must cover a substantial fraction of the true
    # relative depth range (3.2 of 6 units, scale-free check)
    spread = np.percentile(z, 95) - np.percentile(z, 5)
    assert spread > 0.25 * abs(np.median(z) - np.percentile(z, 5) + 1e-9) \
        or spread > 0.2, f"map is flat: spread {spread}"


def _redundancy_map(obs_level_others: int):
    """A 6-KF map where KF 2's 16 points are each re-observed by 3 other
    keyframes at pyramid level ``obs_level_others`` (KF 2 observes at 0)."""
    m = empty_map(n_kf=6, n_pts=32, n_cand=8, img_shape=(64, 64), levels=4)
    P = 16
    observers = (1, 3, 4)
    kf_valid = m.kf_valid.at[:5].set(True)
    kf_frame_id = m.kf_frame_id.at[:5].set(jnp.arange(5))
    obs_mask = m.obs_mask.at[2, :P].set(True)
    obs_level = m.obs_level
    for k in observers:
        obs_mask = obs_mask.at[k, :P].set(True)
        obs_level = obs_level.at[k, :P].set(obs_level_others)
    # newest-two protection covers KFs 3 and 4; KF 1 additionally observes
    # 16 points of its own (nobody else sees them), so its redundant
    # fraction is 0.5 < 0.8 and only KF 2 is eligible for pruning. (Before
    # round 5 this was done via the anchor exemption, which anchor
    # re-homing removed.)
    obs_mask = obs_mask.at[1, P:2 * P].set(True)
    return m._replace(
        kf_valid=kf_valid, kf_frame_id=kf_frame_id, obs_mask=obs_mask,
        obs_level=obs_level,
        pt_valid=m.pt_valid.at[:2 * P].set(True),
        pt_anchor_kf=jnp.ones_like(m.pt_anchor_kf),
    )


def test_redundancy_prune_requires_same_or_finer_scale():
    """map.cc:667: only observations at level2 <= level1+1 count toward
    redundancy. Support at the same scale prunes the keyframe; the same
    support seen only from far away (coarse levels) must not."""
    fine = mapper.check_redundant_keyframes(_redundancy_map(obs_level_others=0))
    assert not bool(fine.kf_valid[2])  # redundant at same scale -> pruned

    border = mapper.check_redundant_keyframes(_redundancy_map(obs_level_others=1))
    assert not bool(border.kf_valid[2])  # level1+1 still counts (<=)

    coarse = mapper.check_redundant_keyframes(_redundancy_map(obs_level_others=2))
    assert bool(coarse.kf_valid[2])  # coarse-only support -> kept
    assert np.array_equal(np.asarray(coarse.kf_valid),
                          np.asarray(_redundancy_map(2).kf_valid))
