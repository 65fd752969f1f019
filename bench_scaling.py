"""Scaling benchmark: multi-stream frames/s vs device count.

Prints one JSON line per mesh size:
  {"metric": "multistream_fps", "devices": D, "streams": S,
   "value": fps_total, "per_stream": fps_each, "efficiency": vs_1_device}

The stream axis carries no collectives (dist/multi_stream.py), so scaling is
expected linear over ICI-connected chips; this harness *measures* it on
whatever devices are present (one real chip here; N virtual CPU devices in
CI via XLA_FLAGS=--xla_force_host_platform_device_count=N — note virtual
devices share host cores, so CPU efficiency numbers validate mechanics, not
speedup). BASELINE.md's 2-host target runs this same harness under
jax.distributed on a real pod.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def run(n_devices: int, streams_per_device: int = 1,
        n_warm: int = 12, n_timed: int = 48, size=(320, 240)):
    import jax  # noqa: E402

    from sdvl_tpu.dist.mesh import make_mesh
    from sdvl_tpu.dist.multi_stream import MultiStream
    from sdvl_tpu.io.synthetic import PlaneScene
    from sdvl_tpu.pipeline.config import (CameraConfig, Config,  # noqa: E402
                                          SdvlConfig)

    W, H = size
    scene = PlaneScene(fx=210.0, fy=210.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5,
                       width=W, height=H, plane_z=4.0)
    cfg = Config(
        camera=CameraConfig(width=W, height=H, fx=210.0, fy=210.0,
                            u0=W / 2 - 0.5, v0=H / 2 - 0.5,
                            dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(cell_size=32, min_avg_shift=5.0, max_keyframes=10,
                        min_keyframe_its=5, min_init_corners=30,
                        max_points=512, max_candidates=256, min_matches=15,
                        map_scale=4.0),
    )
    B = n_devices * streams_per_device
    mesh = make_mesh(n_devices, axis="stream")
    ms = MultiStream(cfg, mesh, n_streams=B, seed=0)
    seqs = [
        [np.clip(scene.render(p), 0, 255).astype(np.uint8)
         for p in scene.trajectory(n_warm + n_timed,
                                   translation_amp=1.0 + 0.05 * i)]
        for i in range(B)
    ]
    for t in range(n_warm):
        ms.feed(np.stack([s[t] for s in seqs]))
    ms.block()
    t0 = time.perf_counter()
    for t in range(n_warm, n_warm + n_timed):
        ms.feed(np.stack([s[t] for s in seqs]))
    ms.block()
    dt = time.perf_counter() - t0
    return B * n_timed / dt


def main():
    import jax

    n_avail = len(jax.devices())
    sizes = sorted({1, max(1, n_avail // 2), n_avail})
    base = None
    for d in sizes:
        fps = run(d)
        if base is None:
            base = fps
        print(json.dumps({
            "metric": "multistream_fps",
            "devices": d,
            "streams": d,
            "value": round(fps, 2),
            "per_stream": round(fps / d, 2),
            "efficiency": round(fps / (base * d), 3),
        }))


if __name__ == "__main__":
    main()
