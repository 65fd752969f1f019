"""Long live-mapping run: thousands of frames filling + recycling the map.

The reference's long-trajectory axis is the Zurich preset
(config/config_zurich.cfg, max_keyframes=1000) with keyframe-cap eviction
(map.cc:190-205) and redundancy pruning (map.cc:619-687) keeping the map
bounded. Every prior in-repo long-horizon artifact either wrote synthetic
keyframes directly (tools/zurich_scale_smoke.py) or stopped near ~120
insertions; this tool runs a REAL multi-thousand-frame tracking sequence
on-chip with the full mapper in the loop — eviction, pruning,
reobservation, depth-filter recycling — plus a mid-sequence sensor
blackout that forces LOST and a genuine relocalization against the
already-built map.

Asserts: finishes RUNNING, bounded live keyframes with total insertions
well past capacity (eviction exercised), finite Sim(3) ATE over tracked
frames, >= 1 LOST->RUNNING recovery after the blackout, and steady
throughput. Prints one JSON artifact.

Usage: python tools/long_run.py [--frames 3000] [--kf 100] [--json out]
The CI twin (tests/test_long_run.py) calls run_protocol() at reduced scale.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def long_trajectory(n_frames: int, span: float = 8.0, y_amp: float = 0.4,
                    yaw_amp: float = 0.06):
    """Out-and-back traveling sweep (world->cam poses, frame 0 identity).

    Unlike PlaneScene.trajectory's bounded sinusoid (which keeps revisiting
    already-mapped ground, so the keyframe policy plateaus after a handful
    of insertions), this TRAVELS: x covers ``span`` world units as a
    triangle wave, continuously leaving old territory — keyframes keep
    being created, the capacity cap keeps evicting — then returns through
    it on the second half (the revisit leg for relocalization).
    """
    from sdvl_tpu.io.synthetic import _np_se3_exp, _np_se3_inverse

    poses = []
    for i in range(n_frames):
        t = i / max(n_frames - 1, 1)
        tri = 2.0 * t if t < 0.5 else 2.0 * (1.0 - t)
        ph = i / 90.0
        xi = np.array([
            span * tri,
            y_amp * np.sin(2 * np.pi * ph),
            0.2 * np.sin(2 * np.pi * t),
            yaw_amp * np.sin(2 * np.pi * ph * 0.5),
            yaw_amp * np.cos(2 * np.pi * ph * 0.25) - yaw_amp,
            0.5 * yaw_amp * np.sin(2 * np.pi * ph * 0.33),
        ], np.float32)
        poses.append(_np_se3_inverse(_np_se3_exp(xi)))
    return poses


def run_protocol(cfg, scene, n_frames: int, chunk: int = 16,
                 blackout_frac: float = 0.6, blackout_len: int = 5,
                 span: float = 8.0, seed: int = 0):
    """Feed a long out-and-back sweep (continuous new coverage -> many
    keyframes -> eviction) with a short blackout at ``blackout_frac``
    (on the return leg, i.e. in REVISITED territory), so recovery must
    come from relocalization against previously-built map structure.

    Returns (result, gt_poses, stats dict). Pure protocol — no asserts —
    shared by tools/long_run.py (full scale, real chip) and
    tests/test_long_run.py (reduced scale, CPU).
    """
    from sdvl_tpu.pipeline.stream import SdvlStream

    poses = long_trajectory(n_frames, span=span)
    b0 = int(n_frames * blackout_frac)
    blackout = set(range(b0, b0 + blackout_len))

    slam = SdvlStream(cfg, seed=seed)
    n_done = 0
    t_comp = None
    t0 = time.perf_counter()
    while n_done < n_frames:
        n = min(chunk, n_frames - n_done)
        imgs = np.stack([
            np.zeros((scene.height, scene.width), np.uint8)
            if (n_done + j) in blackout else
            np.round(np.clip(scene.render(poses[n_done + j]), 0, 255)
                     ).astype(np.uint8)
            for j in range(n)
        ])
        slam.feed_chunk(imgs)
        n_done += n
        if t_comp is None:
            slam.block()          # first chunk: compile + bootstrap
            t_comp = time.perf_counter() - t0
            t0 = time.perf_counter()
    slam.block()
    wall = time.perf_counter() - t0
    n_steady = n_frames - chunk  # first chunk excluded from the clock

    r = slam.result()
    states = np.asarray(r.states)
    running = states == 2
    # LOST->RUNNING transition after the blackout = a real relocalization
    after = np.arange(len(states)) >= b0
    reloc_ok = bool(np.any((states[:-1] == 3) & (states[1:] == 2)
                           & after[1:]))
    m = slam.m
    live_kf = int(np.asarray(m.kf_valid).sum())
    total_kf = int(np.asarray(m.n_keyframes))
    live_pts = int(np.asarray(m.pt_valid).sum())

    from sdvl_tpu.io import evaluate

    idx = np.flatnonzero(running)
    gt = np.stack(poses)
    ate = None
    if len(idx) > 30:
        p_est = evaluate.positions_from_poses(r.trajectory[idx])
        p_gt = evaluate.positions_from_poses(gt[idx])
        ate = float(evaluate.ate_rmse(p_est, p_gt, with_scale=True))

    lost = np.flatnonzero(states == 3)
    kf_frames = np.flatnonzero(np.asarray(r.is_keyframe))
    is_lost = states == 3
    edges = np.diff(is_lost.astype(np.int8))
    seg_start = (np.flatnonzero(edges == 1) + 1).tolist()
    seg_end = np.flatnonzero(edges == -1).tolist()
    if len(is_lost) and is_lost[0]:
        seg_start = [0] + seg_start
    if len(seg_end) < len(seg_start):
        seg_end.append(len(states) - 1)
    nm = np.asarray(r.n_matches)
    stats = {
        "frames": int(n_frames),
        "tracked_ratio": round(float(running.mean()), 4),
        "first_lost_frame": int(lost[0]) if len(lost) else None,
        "n_lost_frames": int(len(lost)),
        "lost_segments": [[int(a), int(b)] for a, b in
                          zip(seg_start, seg_end)],
        "matches_before_first_lost": (
            [int(x) for x in nm[max(0, lost[0] - 12): lost[0]]]
            if len(lost) else []),
        "keyframe_frames": [int(k) for k in kf_frames],
        "final_state": r.state_name(),
        "reloc_after_blackout": reloc_ok,
        "keyframes_live": live_kf,
        "keyframes_total_inserted": total_kf,
        "points_live": live_pts,
        "ate_rmse": None if ate is None else round(ate, 4),
        "fps": round(n_steady / wall, 1),
        "compile_s": round(t_comp, 1),
    }
    return r, gt, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3000)
    ap.add_argument("--kf", type=int, default=24)
    ap.add_argument("--span", type=float, default=45.0,
                    help="world units traveled out (and back)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdvl_tpu.io.synthetic import PlaneScene, make_texture
    from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig

    # Keyframe cadence is ~1 per FOV turnover (~190 px of image travel:
    # matches decay below the policy thresholds only as points leave the
    # view, map.cc:170-188) — so recycling a k-slot store live requires
    # ~k*190 px of travel. Deep plane (z=8) + a 4096-px texture keeps
    # texture resolution matched to image resolution (fx/z = 65 px/unit
    # vs 4096/(2*extent) = 60 px/unit) over a 45-unit span: ~2 px/frame,
    # ~30 keyframe insertions per out-and-back at 3000 frames.
    Z = 8.0
    scene = PlaneScene(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                       width=640, height=480, plane_z=Z, extent=34.0,
                       texture=make_texture(4096, seed=0))
    cfg = Config(
        camera=CameraConfig(width=640, height=480, fx=517.3, fy=516.5,
                            u0=318.6, v0=255.3, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(min_avg_shift=10.0, max_keyframes=args.kf,
                        min_keyframe_its=10, min_init_corners=40,
                        max_points=4096, max_candidates=512,
                        map_scale=Z),
    )
    _, _, stats = run_protocol(cfg, scene, args.frames, span=args.span)
    print(json.dumps(stats, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(stats, f, indent=1)

    assert stats["final_state"] == "RUNNING", stats
    assert stats["tracked_ratio"] > 0.9, stats
    assert stats["reloc_after_blackout"], stats
    assert stats["keyframes_live"] <= args.kf, stats
    assert stats["ate_rmse"] is not None and np.isfinite(stats["ate_rmse"])
    print("LONG_RUN_OK")


if __name__ == "__main__":
    main()
