"""Async tracker/mapper runtime tests (reference's thread-split architecture).

The mapper owns all MapState writes and publishes immutable pytrees; the
tracker reads the latest published map. These tests run the full pipeline
with the mapper on its own thread and check that tracking quality and map
growth match the sequential mode.
"""

import numpy as np

from sdvl_tpu.io import evaluate
from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
from sdvl_tpu.pipeline.runtime import AsyncMapper
from sdvl_tpu.pipeline.sdvl import SDVL, TrackingState


def _cfg():
    return Config(
        camera=CameraConfig(width=320, height=240, fx=210.0, fy=210.0,
                            u0=159.5, v0=119.5, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(cell_size=32, min_avg_shift=5.0, max_keyframes=10,
                        min_keyframe_its=5, min_init_corners=30,
                        max_points=512, max_candidates=256, min_matches=15,
                        map_scale=4.0),
    )


def test_async_tracks_like_sequential():
    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=320, height=240, plane_z=4.0)
    poses = scene.trajectory(26)
    frames = [scene.render(p) for p in poses]

    slam = SDVL(_cfg(), seed=0)
    mapper = AsyncMapper(slam)
    try:
        infos = [slam.handle_frame(img) for img in frames]
    finally:
        mapper.stop()

    assert slam.state == TrackingState.RUNNING
    assert mapper.processed > 0
    running = [i for i, inf in enumerate(infos) if inf["state"] == "RUNNING"]
    assert len(running) >= 18
    n_matches = np.asarray([infos[i]["n_matches"] for i in running])
    assert (n_matches >= 15).mean() > 0.8, n_matches
    # map actually grew through the async path
    assert int(slam.m.pt_valid.sum()) >= 30
    assert int(slam.m.kf_valid.sum()) >= 2

    est = np.stack([infos[i]["pose"] for i in running])
    gt = np.stack([poses[i] for i in running])
    ate = evaluate.ate_rmse(evaluate.positions_from_poses(est),
                            evaluate.positions_from_poses(gt),
                            with_scale=True)
    extent = float(np.linalg.norm(
        np.ptp(evaluate.positions_from_poses(gt), axis=0)))
    assert ate < 0.05 * max(extent, 1e-6), (ate, extent)


def test_mapper_error_propagates():
    """A crash on the mapper thread must surface at the next tracker call,
    not hang or vanish."""
    import time

    import pytest

    slam = SDVL(_cfg(), seed=0)
    mapper = AsyncMapper(slam)

    class Boom:
        kind = "frame"
        payload = (None, None, None)  # malformed -> worker raises

    mapper.q.put(Boom())
    for _ in range(200):
        if mapper._exc is not None:
            break
        time.sleep(0.05)
    with pytest.raises(BaseException):
        mapper._check()
    mapper._stop.set()
    mapper.q.put(type("S", (), {"kind": "stop", "payload": ()})())
    mapper.thread.join(timeout=10)
    assert not mapper.thread.is_alive()
