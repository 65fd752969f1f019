"""Headline benchmark: tracked frames/s per chip on the full pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: render a 640x480 synthetic sequence (same camera geometry as TUM
fr1), run the full SLAM pipeline (bootstrap + per-frame tracking + depth
filter mapping + keyframes/BA) to steady state, then time the tracking hot
path end-to-end (host FSM + device step + pose readback) over the remaining
frames.

Baseline: the reference SDVL is engineered around a 30 FPS real-time budget —
main.cc:99-100,157-158 paces the loop to 33.3 ms/frame and the tracking
latency it prints is measured against that budget (no other number is
published in the repo; see BASELINE.md). vs_baseline = fps / 30.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402

    from sdvl_tpu.io.synthetic import PlaneScene  # noqa: E402
    from sdvl_tpu.pipeline.config import (CameraConfig, Config,  # noqa: E402
                                          SdvlConfig)
    from sdvl_tpu.pipeline.sdvl import SDVL  # noqa: E402

    n_warm = 12     # frames: bootstrap + compile everything
    n_timed = 60

    scene = PlaneScene(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                       width=640, height=480, plane_z=4.0)
    cfg = Config(
        camera=CameraConfig(width=640, height=480, fx=517.3, fy=516.5,
                            u0=318.6, v0=255.3, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(min_avg_shift=10.0, max_keyframes=20,
                        min_keyframe_its=15, min_init_corners=40,
                        max_points=2048, max_candidates=512,
                        map_scale=4.0),
    )
    slam = SDVL(cfg, seed=0)

    frames = [scene.render(p)
              for p in scene.trajectory(n_warm + n_timed,
                                        translation_amp=1.0)]

    for img in frames[:n_warm]:
        slam.handle_frame(img)
    assert slam.state.name == "RUNNING", f"no bootstrap: {slam.state}"

    # timed steady-state tracking (includes host FSM + transfers, i.e. the
    # real per-frame latency a user sees)
    t0 = time.perf_counter()
    kf = 0
    for img in frames[n_warm:]:
        info = slam.handle_frame(img)
        kf += int(info["keyframe"])
    dt = time.perf_counter() - t0
    fps = n_timed / dt

    print(json.dumps({
        "metric": "tracked_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
