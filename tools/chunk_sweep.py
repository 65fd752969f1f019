"""A/B the serving chunk size (frames per fused lax.scan launch) on-chip.

The headline bench dispatches CHUNK-frame chunks; each launch pays a
tunnel round-trip (~0.4-1.7 ms observed) and each chunk upload pays the
link's per-transfer overhead. Larger chunks amortize both — at the cost
of a bigger executable (compile time) and coarser serving latency. This
tool measures the actual fps at several chunk sizes in bench.py's two
shapes so the shipped CHUNK constant is a measured choice, not a guess.

Protocol per (shape, chunk): fresh SdvlStream, one warm-up chunk
(compile + bootstrap), two settle chunks, then 2 timed windows of ~240
frames each (whole chunks), block() once per window, no device->host
transfer before the end. Prints one JSON line per cell.

Usage: python tools/chunk_sweep.py [--chunks 8,16,32,64] [--json out]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import bench  # noqa: E402  (applies the persistent-cache config)


def sweep_one(preset: bool, chunk: int, n_windows: int = 2):
    from sdvl_tpu.pipeline.stream import SdvlStream

    scene, cfg = bench.make_setup(preset)
    slam = SdvlStream(cfg, seed=0)

    per_win = max(1, 240 // chunk)
    n_total = chunk * (3 + per_win * n_windows)
    frames = [np.clip(scene.render(p), 0, 255).astype(np.uint8)
              for p in scene.trajectory(n_total, translation_amp=1.0)]
    chunks = [np.ascontiguousarray(np.stack(frames[i: i + chunk]))
              for i in range(0, n_total, chunk)]

    t0 = time.perf_counter()
    slam.feed_chunk(chunks[0])
    slam.block()
    compile_s = time.perf_counter() - t0
    for c in chunks[1:3]:
        slam.feed_chunk(c)
    slam.block()

    window_fps = []
    idx = 3
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for c in chunks[idx: idx + per_win]:
            slam.feed_chunk(c)
        slam.block()
        window_fps.append(per_win * chunk / (time.perf_counter() - t0))
        idx += per_win
    return {
        "metric": "chunk_sweep",
        "shape": "preset" if preset else "light",
        "chunk": chunk,
        "windows_fps": [round(f, 1) for f in window_fps],
        "best_fps": round(max(window_fps), 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="8,16,32,64")
    ap.add_argument("--shapes", default="light,preset")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    out = []
    for shape in args.shapes.split(","):
        for chunk in (int(x) for x in args.chunks.split(",")):
            r = sweep_one(shape == "preset", chunk)
            out.append(r)
            print(json.dumps(r), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
