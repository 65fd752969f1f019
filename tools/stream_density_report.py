"""Streams-per-device density report: compile time + throughput vs unroll.

dist/multi_stream.py host-unrolls the local streams inside each shard (a
deliberate choice: per-stream scalar FSM state keeps ``lax.switch``
executing only the taken branch, where a vmapped FSM would execute every
branch for every stream). The cost is program size: compile time grows
with streams-per-device. This tool MEASURES that tradeoff (round-3 review
weak item 8: "serving density is exactly the axis being sold" and no
crossover number existed): for n local streams it reports construction +
compile wall time and steady aggregate fps in shared-frozen-map
localization mode (the serving configuration), one device.

Usage: python tools/stream_density_report.py [--streams 1,2,4,8]
       [--size 320x240] [--chunks 8]
Prints one JSON line per density.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="1,2,4,8")
    ap.add_argument("--size", default="320x240")
    ap.add_argument("--chunks", type=int, default=8,
                    help="16-frame chunks per timed window")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the container pins "
                         "jax_platforms to the TPU tunnel, shadowing "
                         "JAX_PLATFORMS=cpu)")
    args = ap.parse_args()
    W, H = (int(v) for v in args.size.split("x"))

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.sharding import Mesh

    from sdvl_tpu.dist.multi_stream import MultiStream
    from sdvl_tpu.io.synthetic import PlaneScene
    from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
    from sdvl_tpu.pipeline.device_fsm import init_state
    from sdvl_tpu.pipeline.stream import SdvlStream

    fx = 210.0 * W / 320.0
    cfg = Config(
        camera=CameraConfig(width=W, height=H, fx=fx, fy=fx,
                            u0=W / 2 - 0.5, v0=H / 2 - 0.5,
                            dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(min_avg_shift=5.0, max_keyframes=10,
                        min_keyframe_its=5, min_init_corners=30,
                        max_points=512, max_candidates=256, min_matches=15,
                        map_scale=4.0),
    )
    scene = PlaneScene(fx=fx, fy=fx, cx=W / 2 - 0.5, cy=H / 2 - 0.5,
                       width=W, height=H, plane_z=4.0)

    # build ONE frozen map by running a short SLAM session; query streams
    # then REPLAY the same smooth trajectory (a continuous sequence —
    # re-feeding one chunk in a loop would be a 16-frame jump-cut per
    # chunk, forcing every stream through the reloc branch every frame)
    n_chunks = args.chunks
    poses = scene.trajectory(16 * (2 + n_chunks))
    frames = [np.round(np.clip(scene.render(p), 0, 255)).astype(np.uint8)
              for p in poses]
    src = SdvlStream(cfg, seed=0, donate=False)
    for f in frames[:40]:
        src.feed(f)
    src.block()
    frozen = (src.m, src.carry)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("stream",))

    for n in (int(v) for v in args.streams.split(",")):
        t0 = time.perf_counter()
        ms = MultiStream(cfg, mesh, n_streams=n, seed=1, frozen_map=frozen)

        def imgs_at(c):
            blk = np.stack(frames[16 * c: 16 * (c + 1)])
            return np.broadcast_to(blk[:, None], (16, n, H, W)).copy()

        ms.feed_chunk(imgs_at(0))
        ms.feed_chunk(imgs_at(1))
        ms.block()
        compile_s = time.perf_counter() - t0

        chunks = [imgs_at(2 + c) for c in range(n_chunks)]
        t0 = time.perf_counter()
        for imgs in chunks:
            ms.feed_chunk(imgs)
        ms.block()
        dt = time.perf_counter() - t0
        agg_fps = 16 * n_chunks * n / dt
        print(json.dumps({
            "streams_per_device": n,
            "compile_s": round(compile_s, 1),
            "aggregate_fps": round(agg_fps, 1),
            "fps_per_stream": round(agg_fps / n, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
