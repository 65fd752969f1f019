"""Measure the live-step cost wall vs map capacity: K = 100 / 300 / 1000.

Why this exists (round-4 review): every reference dataset preset ships
``max_keyframes: 1000`` (config/config_tum_f1.cfg:37), but a LIVE run that
actually fills 1000 slots is bounded by geometry, not compute — a keyframe
is inserted about every FOV turnover (~300 px of image travel,
map.cc:170-188), so 3x capacity churn at K=1000 needs ~3000 insertions
~= 1e6 px of continuously-novel camera path ~= 50k frames of video. The
live churn artifact (tools/long_run.py, LONGRUN_r05.json) therefore runs
K=100; THIS tool publishes the other half of the story: the per-frame
step cost, compile time, and state footprint at K=1000 are measured, so
the cap on the live demo is frame-budget physics, not a framework limit.

Protocol: for each K, build the preset-shaped config (640x480, ORB gate,
1000 features, 200 match lanes — bench.py's preset mode), bootstrap a
stream, then time pre-rendered 16-frame chunks through the fused device
FSM. NO device->host transfer happens before the last timing (the first
transfer permanently degrades launch latency on this runtime,
pipeline/device_fsm.py). One JSON line per K.

Usage: python tools/capacity_probe.py [--ks 100,300,1000] [--json out]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHUNK = 16


def probe_one(K: int, frames, cfg_base):
    import dataclasses

    from sdvl_tpu.pipeline.stream import SdvlStream

    cfg = dataclasses.replace(
        cfg_base, sdvl=dataclasses.replace(cfg_base.sdvl, max_keyframes=K))
    slam = SdvlStream(cfg, seed=0)
    state_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(slam.m))

    chunks = [np.ascontiguousarray(np.stack(frames[i: i + CHUNK]))
              for i in range(0, len(frames), CHUNK)]
    t0 = time.perf_counter()
    slam.feed_chunk(chunks[0])
    slam.block()                      # compile + bootstrap
    compile_s = time.perf_counter() - t0

    # warm pass then timed windows; block() syncs without transfers
    for c in chunks[1:3]:
        slam.feed_chunk(c)
    slam.block()
    timed = chunks[3:]
    t0 = time.perf_counter()
    for c in timed:
        slam.feed_chunk(c)
    slam.block()
    dt = time.perf_counter() - t0
    n = len(timed) * CHUNK
    return {
        "metric": "capacity_probe",
        "max_keyframes": K,
        "step_ms_per_frame": round(dt / n * 1000, 3),
        "fps": round(n / dt, 1),
        "compile_s": round(compile_s, 1),
        "map_state_mb": round(state_bytes / 1e6, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="100,300,1000")
    ap.add_argument("--frames", type=int, default=20 * CHUNK)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from sdvl_tpu.io.synthetic import PlaneScene
    from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig

    scene = PlaneScene(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                       width=640, height=480, plane_z=4.0)
    # the preset shape (bench.py make_setup(preset=True)) minus the K knob
    cfg = Config(
        camera=CameraConfig(width=640, height=480, fx=517.3, fy=516.5,
                            u0=318.6, v0=255.3, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(use_orb=True, num_features=1000, max_matches=200,
                        max_points=4096, fast_threshold=10.0, cell_size=32,
                        min_avg_shift=10.0, min_keyframe_its=15,
                        min_init_corners=40, map_scale=4.0,
                        max_candidates=512),
    )
    frames = [np.clip(scene.render(p), 0, 255).astype(np.uint8)
              for p in scene.trajectory(args.frames, translation_amp=1.0)]

    out = []
    for k in (int(x) for x in args.ks.split(",")):
        r = probe_one(k, frames, cfg)
        out.append(r)
        print(json.dumps(r), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
