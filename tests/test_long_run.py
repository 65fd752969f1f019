"""CI twin of tools/long_run.py: a long live-mapping stream at reduced
scale — the map fills past capacity and recycles (eviction + pruning +
reobservation all active) with tracking in the loop, a mid-sequence
blackout forces LOST, and recovery must come from relocalization against
the already-built map (reference map.cc:190-205 eviction,
sdvl.cc:205-238 relocalization)."""

import numpy as np

from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig


def test_long_stream_fills_recycles_and_relocalizes():
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from tools.long_run import run_protocol

    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=320, height=240, plane_z=4.0, extent=12.0)
    K = 6
    cfg = Config(
        camera=CameraConfig(width=320, height=240, fx=210.0, fy=210.0,
                            u0=159.5, v0=119.5, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(min_avg_shift=5.0, max_keyframes=K,
                        min_keyframe_its=4, min_init_corners=30,
                        max_points=1024, max_candidates=256, min_matches=15,
                        map_scale=4.0),
    )
    r, gt, stats = run_protocol(
        cfg, scene, n_frames=360, chunk=16, blackout_frac=0.65,
        blackout_len=5, span=10.0,
    )
    assert stats["final_state"] == "RUNNING", stats
    assert stats["tracked_ratio"] > 0.85, stats
    # the store filled and recycled: more insertions than live slots
    # (every insertion past K evicted a keyframe, map.cc:190-205)
    assert stats["keyframes_live"] <= K, stats
    assert stats["keyframes_total_inserted"] >= K + 3, stats
    # device-side counters: capacity eviction demonstrably fired
    assert stats["evictions"] > 0, stats
    # blackout forced LOST, recovery was a real relocalization
    states = np.asarray(r.states)
    assert (states == 3).any(), stats
    assert stats["reloc_after_blackout"], stats
    assert stats["ate_rmse"] is not None, stats
    # drift bounded relative to the ~2.2-unit trajectory extent
    assert stats["ate_rmse"] < 0.25, stats
