"""Headline benchmark: tracked frames/s per chip on the full pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: render a 640x480 synthetic sequence (same camera geometry as TUM
fr1), run the full SLAM system — bootstrap, per-frame tracking (sparse direct
alignment + map-point matching + robust pose), depth-filter mapping,
keyframes + local BA — to steady state, then time the tracking hot path
end-to-end over the remaining frames in CHUNK-frame lax.scan launches
(pipeline.device_fsm.make_chunk_step): host frame upload + one fused device
launch per chunk, synchronized once at the end of the timed window. Chunked
dispatch is the framework's throughput serving mode; it also keeps the
number insensitive to tunnel launch-latency noise (observed 0.4-1.7 ms/frame
run-to-run on per-frame dispatch for identical code). Results (poses, match
counts, states) are pulled and sanity-checked AFTER timing, because on this
runtime any device->host transfer permanently degrades launch latency (see
pipeline/device_fsm.py docstring).

Baseline: MEASURED. The reference was built in this container
(tools/build_reference.sh: g++ -O3 -march=native -msse3, GUI off, vendored
g2o) and timed on the SAME synthetic 640x480 sequence this bench renders
(tools/measure_reference.py): its tracking thread averages 6.9 ms/frame =
145 fps on an idle host (best of 3 runs — generous to the reference, and
mapping runs on its second thread, NOT counted against it, while our fused
device FSM includes the mapper inline). vs_baseline = fps / 145. The
reference's own design target is 30 FPS (main.cc:99-100 paces to 33.3
ms/frame).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import numpy as np  # noqa: E402

# Persistent XLA executable cache. MUST be jax.config.update, not the
# JAX_COMPILATION_CACHE_DIR env var: on jax 0.9.0 an env var set after
# process start (os.environ.setdefault) is silently ignored, which is how
# round 2's cold run spent ~410 s compiling the fused chunk step and blew
# the harness timeout. The directory is NOT tracked in git (host/version
# -pinned binaries don't belong in source control); on a cold checkout
# main() shells out to tools/warm_cache.py for one explicit warm-compile
# pass before timing (so the timed windows always run from a warm cache).
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache_bench")
jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def cache_is_warm() -> bool:
    """True if both fused chunk-step executables (light + preset shape)
    are already cached."""
    try:
        return sum(n.startswith("jit_chunk_step")
                   for n in os.listdir(CACHE_DIR)) >= 2
    except OSError:
        return False


def make_setup(preset: bool = False):
    """The benchmark scene + config, shared with tools/warm_cache.py so the
    warm pass compiles exactly the programs the timed run loads.

    ``preset=False`` is the LIGHT shape (no ORB gate, 20-keyframe map) —
    the serving configuration this framework would actually deploy for a
    short-horizon tracker. ``preset=True`` mirrors the shape every
    reference dataset preset ships (config/config_tum_f1.cfg: use_orb=1,
    num_features=1000, max_matches=200; max_keyframes bounded to 100 per
    the round-3 review) — the same SdvlConfig shape
    tools/compare_reference.py's default ``--mode preset`` scores for
    accuracy (run_ours preset=True), so the headline throughput and the
    head-to-head ATE describe one machine. Distortion stays off in BOTH systems'
    measurements (the synthetic camera is undistorted;
    tools/measure_reference.py uses the same geometry)."""
    from sdvl_tpu.io.synthetic import PlaneScene
    from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig

    scene = PlaneScene(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                       width=640, height=480, plane_z=4.0)
    common = dict(min_avg_shift=10.0, min_keyframe_its=15,
                  min_init_corners=40, map_scale=4.0, max_candidates=512)
    if preset:
        sdvl = SdvlConfig(use_orb=True, num_features=1000, max_matches=200,
                          max_keyframes=100, max_points=4096,
                          fast_threshold=10.0, cell_size=32, **common)
    else:
        sdvl = SdvlConfig(max_keyframes=20, max_points=2048, **common)
    cfg = Config(
        camera=CameraConfig(width=640, height=480, fx=517.3, fy=516.5,
                            u0=318.6, v0=255.3, dist=(0, 0, 0, 0, 0)),
        sdvl=sdvl,
    )
    return scene, cfg


CHUNK = 32      # frames per fused lax.scan launch — MEASURED choice
#                 (tools/chunk_sweep.py, round 5): 32 beat 16 in every
#                 same-process repeat (best windows 12.8k/10.4k/10.9k vs
#                 6.0k/9.0k/10.2k fps, light shape) by amortizing the
#                 ~0.5-1.5 ms tunnel launch + per-transfer overhead over
#                 2x the frames; 64 measured on par with 32 (launch
#                 overhead already amortized away) at 2x the serving
#                 latency granularity, so 32 is the shipped default
N_WARM = 32     # one warmup chunk: bootstrap + compile everything
N_WINDOW = 256  # frames per timed window (8 chunks)


def run_mode(preset: bool, n_windows: int):
    """Measure one config shape. Returns (per-window fps list, result)."""
    from sdvl_tpu.pipeline.stream import SdvlStream

    scene, cfg = make_setup(preset)
    slam = SdvlStream(cfg, seed=0)

    n_total = N_WARM + N_WINDOW * n_windows
    frames = [
        np.clip(scene.render(p), 0, 255).astype(np.uint8)
        for p in scene.trajectory(n_total, translation_amp=1.0)
    ]
    # chunks arrive pre-stacked: the serving unit is a chunk, and stacking
    # is harness-side frame generation, not framework work (a host memcpy
    # costs ~1-2 ms per chunk on this 2-vCPU box — real fraction of the
    # timed window)
    chunks = [
        np.ascontiguousarray(np.stack(frames[i : i + CHUNK]))
        for i in range(N_WARM, n_total, CHUNK)
    ]

    slam.feed_chunk(np.stack(frames[:N_WARM]))
    slam.block()  # compile + bootstrap settled (sync, no host transfer)

    per_win = N_WINDOW // CHUNK
    window_fps = []
    for w in range(n_windows):
        t0 = time.perf_counter()
        for c in chunks[w * per_win : (w + 1) * per_win]:
            slam.feed_chunk(c)
        slam.block()
        window_fps.append(N_WINDOW / (time.perf_counter() - t0))
    name = "preset" if preset else "light"
    print(f"# {name} windows_fps:", [round(f, 1) for f in window_fps],
          file=sys.stderr)

    def check():
        # correctness gate runs AFTER *all* timed windows of *all* modes:
        # on this runtime the FIRST device->host transfer permanently
        # degrades launch latency for the rest of the process (~25 ms sync
        # per launch — observed as an exactly-19-fps second mode when the
        # gate ran between modes)
        r = slam.result()
        assert r.state_name() == "RUNNING", f"lost: {r.state_name()}"
        timed = r.n_matches[N_WARM:]
        assert (timed >= cfg.sdvl.min_matches).mean() > 0.9, timed
        assert np.isfinite(r.trajectory).all()

    return window_fps, check


def main():
    if not cache_is_warm():
        # One explicit warm-compile pass in a subprocess so a cold checkout
        # still produces a warm-cache timing (and rc=0) in one invocation.
        import subprocess
        print("# cold cache: running tools/warm_cache.py", file=sys.stderr)
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "warm_cache.py")],
            check=True, stdout=sys.stderr)

    # Headline = PRESET shape (ORB gate on, 100-keyframe map — the machine
    # the reference's dataset configs actually run and the one our accuracy
    # comparisons use); the LIGHT shape rides along as extra keys. Baselines
    # are the reference binary MEASURED on this host in the matching shape
    # (tools/measure_reference.py [--orb], best of 3 — BASELINE.md):
    # windows: best + median both reported (tunnel bandwidth varies 2-5x
    # run-to-run for identical code; best = framework throughput, median =
    # what a typical window saw through the shared link).
    baseline_preset = 149.7   # fps, measure_reference.py --orb (best of 3;
    #                           the ORB gate costs the reference little —
    #                           its per-match descriptor work is tiny next
    #                           to FAST+pyramid+alignment)
    baseline_light = 145.0    # fps, measure_reference.py

    preset_fps, check_p = run_mode(preset=True, n_windows=4)
    light_fps, check_l = run_mode(preset=False, n_windows=4)

    # host->device link bandwidth, measured AFTER all timed windows (the
    # upload direction is safe, but keep the timed windows pristine) and
    # BEFORE any result pull (the first device->host transfer permanently
    # degrades launch latency on this runtime). This turns "host-link-
    # bound" from a story into a number: a 640x480 u8 frame is 307,200
    # bytes, so the link alone caps the pipeline at bw / 0.3 MB frames/s.
    chunk_np = np.zeros((CHUNK, 480, 640), np.uint8)
    bw = 0.0
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(chunk_np))
        bw = max(bw, chunk_np.nbytes / (time.perf_counter() - t0))
    link_cap_fps = bw / (480 * 640)

    check_p()
    check_l()

    best_p, med_p = max(preset_fps), float(np.median(preset_fps))
    best_l, med_l = max(light_fps), float(np.median(light_fps))
    print(json.dumps({
        "metric": "tracked_frames_per_s_per_chip",
        "value": round(best_p, 2),
        "unit": "fps",
        "vs_baseline": round(best_p / baseline_preset, 3),
        "median_fps": round(med_p, 2),
        "median_vs_baseline": round(med_p / baseline_preset, 3),
        "config": "tum_f1 preset shape (use_orb=1, num_features=1000, "
                  "max_matches=200, max_keyframes=100)",
        "light_fps": round(best_l, 2),
        "light_median_fps": round(med_l, 2),
        "light_vs_baseline": round(best_l / baseline_light, 3),
        "baseline_fps": {"preset": baseline_preset,
                         "light": baseline_light},
        # self-describing variance (round-4 review: window spreads up to
        # 5x across driver runs of identical code had no in-artifact
        # record): the full per-window lists + the measured host->device
        # link rate, so "link-bound" is checkable from the artifact alone
        "preset_windows_fps": [round(f, 1) for f in preset_fps],
        "light_windows_fps": [round(f, 1) for f in light_fps],
        "host_link_gbps": round(bw / 1e9, 2),
        "link_cap_fps": round(link_cap_fps, 0),
    }))


if __name__ == "__main__":
    main()
