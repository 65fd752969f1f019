"""Scale hardening: uint8 keyframe store, CG reduced-camera solve, long runs.

VERDICT r1 item 7: the Zurich preset allows ``max_keyframes: 1000``
(reference config/config_zurich.cfg, eviction at map.cc:190-205), which the
f32 keyframe store and the dense (6K,6K) Cholesky could not survive. These
tests pin the three mitigations: 8-bit pyramid storage, the matrix-free PCG
fallback above ``ba.CG_KF_THRESHOLD`` slots, and bounded state across a long
insertion/eviction/pruning sequence.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvl_tpu.core import camera, se3
from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.ops import pyramid
from sdvl_tpu.pipeline import mapper
from sdvl_tpu.solvers import ba
from sdvl_tpu.state.map_state import empty_map, store_pyramid


def _synthetic_ba_problem(K, P, seed=0, noise=0.02):
    """Exact projections from a camera line, perturbed initial state."""
    rs = np.random.default_rng(seed)
    pts = rs.uniform([-3, -3, 4], [3, 3, 10], (P, 3)).astype(np.float32)
    poses = np.stack([
        np.asarray(se3.exp(jnp.asarray(
            [0.08 * k, 0.01 * k, 0.0, 0.0, 0.002 * k, 0.0], jnp.float32)))
        for k in range(K)
    ])
    p_cam = np.asarray(se3.transform(jnp.asarray(poses)[None, :],
                                     jnp.asarray(pts)[:, None]))
    uv = p_cam[..., :2] / p_cam[..., 2:3]
    fixed = np.zeros(K, bool)
    fixed[:2] = True
    poses_init = poses.copy()
    poses_init[~fixed, 4:] += rs.normal(0, noise, (K - 2, 3)).astype(np.float32)
    return ba.BAProblem(
        poses=jnp.asarray(poses_init),
        fixed=jnp.asarray(fixed),
        points=jnp.asarray(pts + rs.normal(0, noise, (P, 3)).astype(np.float32)),
        obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_mask=jnp.ones((P, K), bool),
    ), jnp.asarray(poses), jnp.asarray(pts)


def test_cg_matches_cholesky_small():
    problem, gt_poses, gt_pts = _synthetic_ba_problem(K=8, P=96)
    r_chol = jax.jit(lambda p: ba.solve(p, huber=0.05, method="chol"))(problem)
    r_cg = jax.jit(lambda p: ba.solve(p, huber=0.05, method="cg"))(problem)
    np.testing.assert_allclose(np.asarray(r_cg.poses),
                               np.asarray(r_chol.poses), atol=5e-4)
    np.testing.assert_allclose(np.asarray(r_cg.points),
                               np.asarray(r_chol.points), atol=5e-3)
    # both recover the ground truth
    np.testing.assert_allclose(np.asarray(r_cg.poses[2:, 4:]),
                               np.asarray(gt_poses[2:, 4:]), atol=2e-3)


def test_cg_selected_above_threshold_and_converges():
    """K above CG_KF_THRESHOLD -> auto-CG; it must still solve the problem.
    (The dense path would build a (6K,6K) system here; CG never does.)"""
    K = ba.CG_KF_THRESHOLD + 56
    problem, gt_poses, _ = _synthetic_ba_problem(K=K, P=256, noise=0.01)
    res = jax.jit(lambda p: ba.solve(p, huber=0.05, stage_iters=(4, 6)))(
        problem
    )
    err0 = float(jnp.abs(problem.poses[2:, 4:] - gt_poses[2:, 4:]).max())
    err1 = float(jnp.abs(res.poses[2:, 4:] - gt_poses[2:, 4:]).max())
    assert np.isfinite(float(res.chi2))
    # must clearly solve the problem (dense chol lands ~0.28*err0 here; CG
    # tracks it within LM accept/reject noise — and never builds dense S).
    # Exact CG==chol equivalence is pinned at small K above.
    assert err1 < 0.5 * err0, (err0, err1)
    assert float(res.inlier_mask.mean()) > 0.8


def test_kf_store_is_uint8():
    m = empty_map(n_kf=4, n_pts=32, n_cand=16, img_shape=(64, 96), levels=3)
    for lvl in m.kf_pyr:
        assert lvl.dtype == jnp.uint8
    # quantization rounds (store_pyramid), it doesn't truncate
    q = store_pyramid((jnp.full((8, 8), 99.7, jnp.float32),))[0]
    assert int(q[0, 0]) == 100
    # at Zurich scale the store stays ~4x smaller than f32
    bytes_u8 = sum(l.nbytes for l in m.kf_pyr)
    assert bytes_u8 * 4 == sum(4 * l.size for l in m.kf_pyr)


def test_long_stream_run_bounded_and_tracking():
    """End-to-end long-horizon run through the DEVICE FSM: 160 frames at
    160x120 with an 8-slot keyframe store — several eviction/pruning cycles
    deep, tracking must stay alive and the map bounded (the Zurich axis:
    reference max_keyframes up to 1000 with eviction, map.cc:190-205)."""
    from sdvl_tpu.pipeline.stream import SdvlStream

    H, W = 120, 160
    scene = PlaneScene(fx=120.0, fy=120.0, cx=79.5, cy=59.5,
                       width=W, height=H, plane_z=4.0)
    cfg_ = __import__("sdvl_tpu.pipeline.config", fromlist=["Config"])
    cfg = cfg_.Config(
        camera=cfg_.CameraConfig(width=W, height=H, fx=120.0, fy=120.0,
                                 u0=79.5, v0=59.5, dist=(0, 0, 0, 0, 0)),
        sdvl=cfg_.SdvlConfig(cell_size=16, min_avg_shift=3.0,
                             max_keyframes=8, min_keyframe_its=3,
                             min_init_corners=15, min_matches=8,
                             max_points=256, max_candidates=128,
                             map_scale=4.0),
    )
    slam = SdvlStream(cfg, seed=0)
    n = 160
    # wide, fast sweep: the view leaves old keyframes behind, forcing
    # keyframe churn through the 8-slot store
    poses = scene.trajectory(n, translation_amp=3.5, rot_amp=0.08,
                             rate=1.0 / 110.0)
    for p in poses:
        slam.feed(np.round(np.clip(scene.render(p), 0, 255)
                           ).astype(np.uint8))
    slam.block()
    r = slam.result()
    states = np.asarray(r.states)
    # tracking survives the whole run (brief LOST dips allowed, must recover)
    assert states[-1] == 2, states[-20:]
    assert (states[n // 2:] == 2).mean() > 0.9
    # enough keyframes flowed through the 8-slot store to force evictions
    assert int(slam.m.n_keyframes) > 8, int(slam.m.n_keyframes)
    assert int(np.asarray(slam.m.kf_valid).sum()) <= 8
    # all surviving anchors point at live keyframes
    kf_valid = np.asarray(slam.m.kf_valid)
    anchors = np.asarray(slam.m.pt_anchor_kf)[np.asarray(slam.m.pt_valid)]
    assert kf_valid[anchors].all()
    # ATE still sane over the tracked tail (Sim(3) aligned)
    from sdvl_tpu.io import evaluate

    tracked = states == 2
    est = np.asarray(r.trajectory)[tracked]
    gt = np.stack(poses)[tracked]
    ate = evaluate.ate_rmse(evaluate.positions_from_poses(est),
                            evaluate.positions_from_poses(gt),
                            with_scale=True)
    extent = float(np.linalg.norm(np.ptp(
        evaluate.positions_from_poses(gt), axis=0)))
    assert ate < 0.08 * max(extent, 1e-6), (ate, extent)


def test_redundant_prune_drains_every_frame():
    """A backlog of redundant keyframes drains at >=1 per update_map call —
    the reference runs CheckRedundantKeyframes every non-KF mapper iteration
    (map.cc:121); r1 only ran it at keyframe insertion, so backlog could
    accumulate unboundedly on long runs."""
    H, W, levels = 64, 96, 3
    intr = camera.Intrinsics.create(80.0, 80.0, 47.5, 31.5,
                                    width=W, height=H)
    K, P = 6, 32
    m = empty_map(n_kf=K, n_pts=P, n_cand=8, img_shape=(H, W), levels=levels)
    # five keyframes all observing all 32 points -> three old ones (beyond
    # the protected newest two) are redundant simultaneously
    m = m._replace(
        kf_valid=m.kf_valid.at[:5].set(True),
        kf_frame_id=m.kf_frame_id.at[:5].set(jnp.arange(5, dtype=jnp.int32)),
        pt_valid=m.pt_valid.at[:].set(True),
        pt_anchor_kf=m.pt_anchor_kf.at[:].set(4),  # anchored at newest
        obs_mask=m.obs_mask.at[:5, :].set(True),
        n_keyframes=jnp.asarray(5, jnp.int32),
    )
    pyr = tuple(jnp.zeros((H >> l, W >> l), jnp.float32)
                for l in range(levels))
    pose = se3.identity()
    step = jax.jit(lambda m: mapper.update_map(m, intr, pyr, pose,
                                               n_samples=8))
    n0 = int(np.asarray(m.kf_valid).sum())
    m1 = step(m)
    m2 = step(m1)
    n1 = int(np.asarray(m1.kf_valid).sum())
    n2 = int(np.asarray(m2.kf_valid).sum())
    assert n0 == 5 and n1 == 4 and n2 == 3, (n0, n1, n2)
    # protected set survives: the newest two
    assert bool(m2.kf_valid[4]) and bool(m2.kf_valid[3])
    # prune events are counted in the map state (LONGRUN artifact source)
    assert int(m1.n_pruned) == 1 and int(m2.n_pruned) == 2


def test_prune_rehomes_anchors():
    """Pruning a keyframe that ANCHORS live points must re-home the anchors
    to another observer instead of exempting the keyframe forever (round-4
    review: the anchor exemption made map.cc:619-687 parity near-inert,
    since a mature map anchors something at almost every keyframe)."""
    H, W, levels = 64, 96, 3
    K, P = 6, 32
    m = empty_map(n_kf=K, n_pts=P, n_cand=8, img_shape=(H, W), levels=levels)
    obs_px = jnp.tile(jnp.asarray([[40.0, 30.0]]), (K, P, 1))
    m = m._replace(
        kf_valid=m.kf_valid.at[:5].set(True),
        kf_frame_id=m.kf_frame_id.at[:5].set(jnp.arange(5, dtype=jnp.int32)),
        pt_valid=m.pt_valid.at[:].set(True),
        # every point anchored at the OLDEST keyframe — the prune target
        pt_anchor_kf=m.pt_anchor_kf.at[:].set(0),
        obs_mask=m.obs_mask.at[:5, :].set(True),
        obs_px=obs_px,
        n_keyframes=jnp.asarray(5, jnp.int32),
    )
    m1 = jax.jit(mapper.check_redundant_keyframes)(m)
    assert int(m1.n_pruned) == 1
    assert not bool(m1.kf_valid[0])          # the anchor KF was prunable
    assert bool(np.asarray(m1.pt_valid).all())  # no point died with it
    anchors = np.asarray(m1.pt_anchor_kf)
    assert (anchors == 4).all(), anchors     # re-homed to newest observer
    # a point with NO other observer dies with its anchor keyframe
    m_lone = m._replace(
        obs_mask=m.obs_mask.at[1:, 0].set(False),  # point 0 seen only by KF0
    )
    m2 = jax.jit(mapper.check_redundant_keyframes)(m_lone)
    assert not bool(m2.kf_valid[0])
    assert not bool(m2.pt_valid[0])
    assert bool(np.asarray(m2.pt_valid)[1:].all())


def test_long_sequence_keyframes_bounded():
    """~120 keyframe insertions through add_keyframe/local BA/pruning with a
    16-slot store: eviction keeps the store full-but-bounded, anchors stay
    valid, per-insertion latency stays flat (one compiled program)."""
    H, W, levels = 120, 160, 4
    scene = PlaneScene(fx=120.0, fy=120.0, cx=79.5, cy=59.5,
                       width=W, height=H, plane_z=4.0)
    intr = camera.Intrinsics.create(120.0, 120.0, 79.5, 59.5,
                                    width=W, height=H)
    K_CAP = 16
    m = empty_map(n_kf=K_CAP, n_pts=256, n_cand=128, img_shape=(H, W),
                  levels=levels)

    poses = scene.trajectory(240, translation_amp=1.2)

    @jax.jit
    def insert(m, pyr, pose, fid, corners_xy, corners_valid):
        S = corners_xy.shape[0]
        m, slot = mapper.add_keyframe(
            m, intr, pyr, pose, fid,
            jnp.zeros(S, jnp.int32), corners_xy,
            jnp.zeros(S, bool), jnp.zeros(S, jnp.int32),
            corners_xy, jnp.zeros(S, jnp.int32), corners_valid,
            cell=32, max_reobs=64,
        )
        m = mapper.local_ba(m, intr, slot, window=4, max_points=128)
        m = mapper.prune_weak_points(m)
        return mapper.check_redundant_keyframes(m), slot

    rs = np.random.default_rng(0)
    times = []
    for i in range(120):
        pose = jnp.asarray(poses[2 * i])
        pyr = tuple(pyramid.build_pyramid(
            jnp.asarray(scene.render(np.asarray(pose))), levels
        ))
        xy = jnp.asarray(rs.uniform([8, 8], [W - 8, H - 8],
                                    (32, 2)).astype(np.float32))
        t0 = time.perf_counter()
        m, _ = insert(m, pyr, pose, jnp.asarray(i, jnp.int32),
                      xy, jnp.ones(32, bool))
        jax.block_until_ready(m.kf_valid)
        times.append(time.perf_counter() - t0)

    n_kf = int(np.asarray(m.kf_valid).sum())
    assert 2 <= n_kf <= K_CAP
    assert int(m.n_keyframes) == 120  # every insertion counted
    # anchors of surviving points reference valid keyframes
    kf_valid = np.asarray(m.kf_valid)
    anchors = np.asarray(m.pt_anchor_kf)[np.asarray(m.pt_valid)]
    assert kf_valid[anchors].all()
    # state size is static: the store never grew
    assert m.kf_pyr[0].shape[0] == K_CAP
    # steady-state latency flat: late insertions no slower than early ones
    early = float(np.median(times[5:20]))
    late = float(np.median(times[-15:]))
    assert late < 3.0 * early, (early, late)
