"""Localization-only serving mode (SdvlStream.localizer).

A SLAM session builds a map and checkpoints it; a *localizer* session loads
that snapshot, starts LOST, relocalizes against the frozen keyframes, and
tracks without any mapping work (the mapping stage is compiled out of the
step when ``localize_only`` is set). The map must be bit-identical before
and after serving — that immutability is what makes the mode safe to fan
out over many concurrent query streams.

Capability beyond the reference: it has no map persistence at all
(SURVEY.md §5 "Checkpoint / resume: none"), so every reference run re-maps
from scratch.
"""

import dataclasses

import jax
import numpy as np
import pytest

from sdvl_tpu.io import evaluate
from sdvl_tpu.io.snapshot import save_stream_snapshot
from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
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
    return cfg, scene, frames, poses_gt


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """Map built by SLAM -> snapshot -> localizer serving the same scene."""
    cfg, scene, frames, poses_gt = _setup()
    slam = SdvlStream(cfg, seed=0)
    for f in frames:
        slam.feed(f)
    r_map = slam.result()
    assert r_map.state_name() == "RUNNING"
    snap = str(tmp_path_factory.mktemp("serve") / "map.npz")
    save_stream_snapshot(slam, snap)

    loc = SdvlStream.localizer(cfg, snap, seed=1)
    map_before = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(loc.m)]
    # query stream: a later re-visit of the mapped area (same trajectory
    # shape, no bootstrap frames — the localizer may not map or bootstrap)
    for f in frames[8:]:
        loc.feed(f)
    r = loc.result()
    map_after = [np.asarray(x) for x in
                 jax.tree_util.tree_leaves(loc.m)]
    return cfg, frames, poses_gt, r, map_before, map_after, snap


def test_relocalizes_and_tracks(served):
    _, frames, _, r, _, _, _ = served
    assert r.state_name() == "RUNNING"
    running = r.states == 2
    # recovery within a few frames, then stays tracking
    assert int(np.argmax(running)) <= 5
    assert running[-5:].all()
    assert (r.n_matches[running] >= 15).mean() > 0.9


def test_map_is_frozen(served):
    *_, before, after, _ = served
    assert len(before) == len(after)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)


def test_localized_poses_accurate(served):
    _, _, poses_gt, r, _, _, _ = served
    running = r.states == 2
    gt = np.stack(poses_gt[8:])[running]
    p_gt = evaluate.positions_from_poses(gt)
    p_est = evaluate.positions_from_poses(r.trajectory[running])
    extent = float(np.linalg.norm(np.ptp(p_gt, axis=0)))
    ate = evaluate.ate_rmse(p_est, p_gt, with_scale=True)
    assert ate < 0.05 * max(extent, 1e-6), f"ATE {ate} vs extent {extent}"


def test_shared_map_multistream(served):
    """N query streams share ONE replicated frozen map per device.

    The map has no stream dimension (P() replication) — per-stream state
    is only the SlamCarry, so serving density is bounded by carries, not
    map replicas (at Zurich capacity: 0.46 GB shared vs 1.85 GB for 4
    replicas)."""
    from jax.sharding import Mesh

    from sdvl_tpu.dist.multi_stream import MultiStream
    from sdvl_tpu.io import evaluate

    cfg, frames, poses_gt, _, _, _, snap = served
    mesh = Mesh(np.array(jax.devices()[:2]), ("stream",))
    ms = MultiStream(cfg, mesh, n_streams=4, seed=7, frozen_map=snap)
    # shared map: the device value must carry no stream dim
    assert ms.m.kf_valid.ndim == 1
    stack = np.stack([np.asarray(f) for f in frames[8:20]])
    ms.feed_chunk(np.repeat(stack[:, None], 4, axis=1))   # (T, 4, H, W)
    gt = np.stack(poses_gt[8:20])
    p_gt = evaluate.positions_from_poses(gt)
    extent = float(np.linalg.norm(np.ptp(p_gt, axis=0)))
    for res in ms.result():
        assert res.state_name() == "RUNNING"
        running = res.states == 2
        assert running[-4:].all()
        p_est = evaluate.positions_from_poses(res.trajectory[running])
        ate = evaluate.ate_rmse(p_est, p_gt[running], with_scale=True)
        assert ate < 0.08 * max(extent, 1e-6), f"ATE {ate} / {extent}"


def test_localize_only_flag_roundtrips_config():
    s = SdvlConfig(localize_only=True)
    assert s.localize_only is True
    # part of the jit cache key: must stay hashable
    hash(dataclasses.replace(s, localize_only=False))


@pytest.mark.parametrize("extra", [["--global-ba"], ["--resume", "x.npz"]])
def test_cli_rejects_map_mutators_with_localize(extra, tmp_path):
    """--localize serves a frozen map: combining it with --global-ba (which
    would rewrite the map and rebase the trajectory) or --resume must be a
    usage error, mirroring the --localize/--stream guard."""
    from sdvl_tpu.cli.run import main

    with pytest.raises(SystemExit) as e:
        main(["--synthetic", "4", "--stream",
              "--localize", str(tmp_path / "snap.npz"), *extra])
    assert e.value.code == 2  # argparse usage error
