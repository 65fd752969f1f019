"""End-to-end tracking test on a rendered synthetic sequence.

The "fake backend" integration test SURVEY.md §4 calls for: a textured-plane
world with exact ground truth, run through the full SDVL pipeline (bootstrap
-> tracking -> depth filters -> keyframes -> local BA), scored by Sim(3)-
aligned ATE. No dataset needed; runs on the CPU test backend.
"""

import numpy as np
import pytest

from sdvl_tpu.io import evaluate
from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
from sdvl_tpu.pipeline.sdvl import SDVL, TrackingState


@pytest.fixture(scope="module")
def run_sequence():
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
    slam = SDVL(cfg, seed=0)
    n = 30
    poses_gt = scene.trajectory(n)
    infos = []
    for p in poses_gt:
        infos.append(slam.handle_frame(scene.render(p)))
    return slam, infos, poses_gt


def test_bootstraps_quickly(run_sequence):
    slam, infos, _ = run_sequence
    running_from = next(
        i for i, inf in enumerate(infos) if inf["state"] == "RUNNING"
    )
    assert running_from <= 6, f"bootstrap too slow: frame {running_from}"
    assert slam.state == TrackingState.RUNNING


def test_tracks_with_enough_matches(run_sequence):
    slam, infos, _ = run_sequence
    running = [inf for inf in infos if inf["state"] == "RUNNING"]
    assert len(running) >= 20
    n_matches = np.asarray([inf["n_matches"] for inf in running])
    assert (n_matches >= 15).mean() > 0.9, n_matches


def test_ate_within_one_percent_ish(run_sequence):
    slam, infos, poses_gt = run_sequence
    start = next(
        i for i, inf in enumerate(infos) if inf["state"] == "RUNNING"
    )
    est = np.stack([inf["pose"] for inf in infos[start:]])
    gt = np.stack(poses_gt[start:])
    p_est = evaluate.positions_from_poses(est)
    p_gt = evaluate.positions_from_poses(gt)
    extent = float(np.linalg.norm(np.ptp(p_gt, axis=0)))
    ate = evaluate.ate_rmse(p_est, p_gt, with_scale=True)
    assert ate < 0.03 * max(extent, 1e-6), f"ATE {ate} vs extent {extent}"


def test_map_grows_and_stays_bounded(run_sequence):
    slam, infos, _ = run_sequence
    n_pts = int(slam.m.pt_valid.sum())
    n_kfs = int(slam.m.kf_valid.sum())
    assert n_pts >= 30, n_pts
    assert 2 <= n_kfs <= 10
    # keyframes were actually inserted beyond the bootstrap pair
    assert int(slam.m.n_keyframes) >= 2


def test_host_fsm_lost_and_relocalize():
    """Host-driver twin of the stream lost/relocalize test (VERDICT r1: the
    host FSM used to align against the stale lost frame; it must re-reference
    the winning keyframe like the device FSM / reference sdvl.cc:217-231)."""
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
    poses = scene.trajectory(30)
    slam = SDVL(cfg, seed=0)
    for p in poses[:18]:
        slam.handle_frame(scene.render(p))
    blank = np.zeros((240, 320), np.float32)
    went_lost = False
    for _ in range(5):
        slam.handle_frame(blank)
        went_lost |= slam.state == TrackingState.LOST
    assert went_lost, "never went LOST"
    infos = [slam.handle_frame(scene.render(p)) for p in poses[18:]]
    assert slam.state == TrackingState.RUNNING
    assert all(i["n_matches"] >= cfg.sdvl.min_matches for i in infos[-6:]), \
        [i["n_matches"] for i in infos]
