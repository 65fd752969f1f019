"""Checkpoint/resume tests: save → load must resume bit-identically.

The reference has no persistence (SURVEY.md §5); these tests define the
contract for ours: a resumed session produces the same subsequent
trajectory as an uninterrupted one.
"""

import numpy as np
import pytest

from sdvl_tpu.io import snapshot
from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
from sdvl_tpu.pipeline.sdvl import SDVL


def _make(seed=0):
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
    return scene, cfg, SDVL(cfg, seed=seed)


@pytest.fixture(scope="module")
def saved_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("snap")
    scene, cfg, slam = _make()
    poses = scene.trajectory(22)
    frames = [scene.render(p) for p in poses]
    for img in frames[:12]:
        slam.handle_frame(img)
    path = str(tmp / "ckpt.npz")
    snapshot.save_snapshot(slam, path)
    # continue the original run to the end
    for img in frames[12:]:
        slam.handle_frame(img)
    return cfg, frames, path, slam


def test_roundtrip_resume_identical(saved_run):
    cfg, frames, path, slam_orig = saved_run
    slam2 = SDVL(cfg, seed=0)
    snapshot.load_snapshot(slam2, path)
    assert slam2.frame_id == 12
    assert slam2.state == slam_orig.state.__class__[
        # state at save time was RUNNING (bootstraps by frame 6)
        "RUNNING"
    ]
    for img in frames[12:]:
        slam2.handle_frame(img)
    # identical continuation: same trajectory, same map occupancy
    t1 = np.stack([p for _, p in slam_orig.trajectory])
    t2 = np.stack([p for _, p in slam2.trajectory[-len(frames[12:]):]])
    np.testing.assert_allclose(t1[-len(frames[12:]):], t2, rtol=0, atol=1e-6)
    assert int(slam2.m.pt_valid.sum()) == int(slam_orig.m.pt_valid.sum())
    assert int(slam2.m.kf_valid.sum()) == int(slam_orig.m.kf_valid.sum())


def test_capacity_mismatch_rejected(saved_run, tmp_path):
    cfg, _, path, _ = saved_run
    import dataclasses

    bad = dataclasses.replace(
        cfg, sdvl=dataclasses.replace(cfg.sdvl, max_points=256)
    )
    slam = SDVL(bad, seed=0)
    with pytest.raises(ValueError, match="capacities"):
        snapshot.load_snapshot(slam, path)


def test_atomic_save_never_corrupts(saved_run, tmp_path):
    cfg, _, path, slam = saved_run
    # an existing checkpoint survives a failed overwrite attempt
    dst = tmp_path / "c.npz"
    snapshot.save_snapshot(slam, str(dst))
    before = dst.read_bytes()
    import unittest.mock as mock

    with mock.patch("numpy.savez_compressed",
                    side_effect=RuntimeError("disk full")):
        with pytest.raises(RuntimeError):
            snapshot.save_snapshot(slam, str(dst))
    assert dst.read_bytes() == before
    assert not list(tmp_path.glob("*.tmp"))


def test_tum_trajectory_export(saved_run, tmp_path):
    cfg, _, _, slam = saved_run
    out = tmp_path / "traj.txt"
    snapshot.save_trajectory_tum(slam, str(out))
    lines = out.read_text().strip().splitlines()
    assert len(lines) == len(slam.trajectory)
    assert all(len(l.split()) == 8 for l in lines)
