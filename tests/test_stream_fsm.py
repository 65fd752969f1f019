"""Device-resident FSM (pipeline.device_fsm / pipeline.stream) tests.

The stream driver exists so the TPU hot loop never transfers device->host
(see device_fsm docstring). These tests pin its *behavioral equivalence* to
the host-FSM reference implementation (pipeline.sdvl.SDVL), which itself
mirrors reference sdvl.cc.
"""

import numpy as np
import pytest

from sdvl_tpu.io import evaluate
from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
from sdvl_tpu.pipeline.sdvl import SDVL
from sdvl_tpu.pipeline.stream import SdvlStream


def _setup(n=30):
    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=320, height=240, plane_z=4.0)
    cfg = Config(
        camera=CameraConfig(width=320, height=240, fx=210.0, fy=210.0,
                            u0=159.5, v0=119.5, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(cell_size=32, min_avg_shift=5.0, max_keyframes=10,
                        min_keyframe_its=5, min_init_corners=30,
                        max_points=512, max_candidates=256, min_matches=15,
                        map_scale=4.0),
    )
    poses_gt = scene.trajectory(n)
    frames = [scene.render(p) for p in poses_gt]
    return cfg, frames, poses_gt


@pytest.fixture(scope="module")
def streamed():
    cfg, frames, poses_gt = _setup()
    st = SdvlStream(cfg, seed=0)
    for f in frames:
        st.feed(f)
    return cfg, frames, poses_gt, st, st.result()


def test_bootstraps_and_runs(streamed):
    _, _, _, st, r = streamed
    assert r.state_name() == "RUNNING"
    running = r.states == 2
    assert running.sum() >= 20
    assert (r.n_matches[running] >= 15).mean() > 0.9


def test_matches_host_fsm_exactly(streamed):
    """Same jitted sub-programs, same decisions -> same trajectory."""
    cfg, frames, _, _, r = streamed
    old = SDVL(cfg, seed=0)
    infos = [old.handle_frame(f) for f in frames]
    # old.trajectory is rebased at ground-plane alignment like the stream's
    host_traj = np.stack([p for _, p in old.trajectory])
    np.testing.assert_allclose(r.trajectory, host_traj, atol=1e-4)
    # n_matches agrees frame-by-frame in steady state (during bootstrap the
    # stream reports homography inliers in the same field; the host FSM
    # reports them as `n_inliers` instead)
    host_matches = np.asarray([i["n_matches"] for i in infos])
    running = r.states == 2
    running[np.argmax(running)] = False  # skip the transition frame itself
    # n_matches agrees up to single borderline flips: the two drivers are
    # different XLA programs (fused switch vs separate jits), so a match
    # sitting exactly on a gate threshold can flip under different fusion
    # rounding. Systematic divergence would show as >1 diffs or many frames.
    diff = np.abs(r.n_matches[running] - host_matches[running])
    assert diff.max() <= 1, (r.n_matches[running], host_matches[running])
    assert (diff > 0).mean() <= 0.15, (r.n_matches[running],
                                       host_matches[running])


def test_ate_small(streamed):
    _, _, poses_gt, _, r = streamed
    start = int(np.argmax(r.states == 2))
    gt = np.stack(poses_gt[start:])
    p_gt = evaluate.positions_from_poses(gt)
    p_est = evaluate.positions_from_poses(r.trajectory[start:])
    extent = float(np.linalg.norm(np.ptp(p_gt, axis=0)))
    ate = evaluate.ate_rmse(p_est, p_gt, with_scale=True)
    assert ate < 0.03 * max(extent, 1e-6), f"ATE {ate} vs extent {extent}"


def test_chunked_scan_matches_per_frame(streamed):
    """feed_chunk (lax.scan) must reproduce frame-at-a-time feeding."""
    cfg, frames, _, _, r = streamed
    st2 = SdvlStream(cfg, seed=0)
    stack = np.stack(frames)
    st2.feed_chunk(stack[:10])
    st2.feed_chunk(stack[10:20])
    for f in frames[20:]:
        st2.feed(f)
    r2 = st2.result()
    np.testing.assert_array_equal(r2.states, r.states)
    np.testing.assert_allclose(r2.trajectory, r.trajectory, atol=1e-4)


def test_textureless_frames_stay_first():
    cfg, _, _ = _setup()
    st = SdvlStream(cfg, seed=0)
    flat = np.full((240, 320), 128.0, np.float32)
    for _ in range(4):
        st.feed(flat)
    r = st.result()
    assert (r.states == 0).all()
    assert (r.n_corners < cfg.sdvl.min_init_corners).all()


def test_uint8_input_equivalent():
    """uint8 frames (the cheap transfer path) behave like float frames."""
    cfg, frames, _ = _setup(n=16)
    st_f = SdvlStream(cfg, seed=0)
    st_u = SdvlStream(cfg, seed=0)
    for f in frames:
        st_f.feed(np.round(np.clip(f, 0, 255)).astype(np.float32))
        st_u.feed(np.round(np.clip(f, 0, 255)).astype(np.uint8))
    rf, ru = st_f.result(), st_u.result()
    np.testing.assert_array_equal(rf.states, ru.states)
    np.testing.assert_allclose(rf.trajectory, ru.trajectory, atol=1e-5)


def test_stream_snapshot_resume(tmp_path):
    """Checkpoint mid-sequence, resume in a fresh session, same trajectory."""
    from sdvl_tpu.io.snapshot import (load_stream_snapshot,
                                      save_stream_snapshot)

    cfg, frames, _ = _setup(n=24)
    a = SdvlStream(cfg, seed=0)
    for f in frames[:14]:
        a.feed(f)
    p = str(tmp_path / "session.npz")
    save_stream_snapshot(a, p)

    b = SdvlStream(cfg, seed=0)
    load_stream_snapshot(b, p)
    for f in frames[14:]:
        a.feed(f)
        b.feed(f)
    ra, rb = a.result(), b.result()
    np.testing.assert_allclose(ra.trajectory[-10:], rb.trajectory[-10:],
                               atol=1e-5)
    np.testing.assert_array_equal(ra.states[-10:], rb.states[-10:])


def test_lost_and_relocalize():
    """Occlusion -> LOST -> revisit -> relocalize and keep tracking.

    Mirrors the reference's lost-frame counter + keyframe relocalization
    sweep (sdvl.cc:73-89, 205-238): three bad frames trip LOST, and once the
    mapped area is visible again the keyframe-referenced alignment recovers
    the pose and tracking resumes at full match counts.
    """
    cfg, frames, _ = _setup(n=30)
    st = SdvlStream(cfg, seed=0)
    for f in frames[:18]:
        st.feed(f)
    blank = np.zeros((240, 320), np.float32)
    for _ in range(5):
        st.feed(blank)
    for f in frames[18:30]:
        st.feed(f)
    r = st.result()
    assert (r.states == 3).any(), "never went LOST"
    assert r.state_name() == "RUNNING", r.states
    # solid tracking after recovery
    assert (r.n_matches[-6:] >= cfg.sdvl.min_matches).all(), r.n_matches[-8:]


def test_distorted_lens_end_to_end():
    """Frames rendered through a distorted lens, undistorted on device.

    Exercises the remap path (reference Camera::UndistortImage,
    camera.cc:100-105, done per frame with cv::undistort; here a precomputed
    gather grid inside the fused step) with TUM-fr1-like radial distortion.
    """
    from sdvl_tpu.io import evaluate

    dist = (-0.28, 0.07, 0.0002, -0.0001, 0.0)
    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=320, height=240, plane_z=4.0, dist=dist)
    cfg = Config(
        camera=CameraConfig(width=320, height=240, fx=210.0, fy=210.0,
                            u0=159.5, v0=119.5, dist=dist),
        sdvl=SdvlConfig(cell_size=32, min_avg_shift=5.0, max_keyframes=10,
                        min_keyframe_its=5, min_init_corners=30,
                        max_points=512, max_candidates=256, min_matches=15,
                        map_scale=4.0),
    )
    poses = scene.trajectory(30)
    st = SdvlStream(cfg, seed=0)
    for p in poses:
        st.feed(scene.render(p))
    r = st.result()
    assert r.state_name() == "RUNNING"
    start = int(np.argmax(r.states == 2))
    p_gt = evaluate.positions_from_poses(np.stack(poses[start:]))
    p_est = evaluate.positions_from_poses(r.trajectory[start:])
    extent = float(np.linalg.norm(np.ptp(p_gt, axis=0)))
    ate = evaluate.ate_rmse(p_est, p_gt, with_scale=True)
    assert ate < 0.03 * max(extent, 1e-6), f"ATE {ate} vs extent {extent}"


def test_brightness_drift_with_affine_illum():
    """Exposure drift across the sequence: with use_affine_illum the direct
    aligner absorbs the gain/bias change and tracking stays RUNNING with a
    bounded ATE (capability beyond the reference, which assumes brightness
    constancy in image_align.cc)."""
    import dataclasses

    from sdvl_tpu.io import evaluate

    cfg, frames, poses_gt = _setup(n=30)
    cfg = dataclasses.replace(
        cfg, sdvl=dataclasses.replace(cfg.sdvl, use_affine_illum=True))
    # smooth exposure drift AFTER bootstrap (frames 0-4 stay clean so the
    # two-view init sees comparable images): gain up to 1.4x, bias up to +25
    drifted = []
    for i, f in enumerate(frames):
        t = max(0, i - 4) / max(1, len(frames) - 5)
        g, b = 1.0 + 0.4 * t, 25.0 * t
        drifted.append(np.clip(g * np.asarray(f, np.float32) + b, 0, 255))
    st = SdvlStream(cfg, seed=0)
    for f in drifted:
        st.feed(f)
    r = st.result()
    assert r.state_name() == "RUNNING"
    running = r.states == 2
    assert running.sum() >= 20
    assert (r.n_matches[running] >= 15).mean() > 0.85

    start = int(np.argmax(running))
    gt = np.stack(poses_gt[start:])
    p_gt = evaluate.positions_from_poses(gt)
    p_est = evaluate.positions_from_poses(r.trajectory[start:])
    ate = evaluate.ate_rmse(p_est, p_gt, with_scale=True)
    assert ate < 0.05 * 4.0, f"ATE {ate}"  # 5% of scene depth
