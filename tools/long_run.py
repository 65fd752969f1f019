"""Long live-mapping run: thousands of frames filling + recycling the map.

The reference's long-trajectory axis is its shipped preset capacity
(config/config_tum_f1.cfg:37 `max_keyframes: 1000`) with keyframe-cap
eviction (map.cc:190-205) and redundancy pruning (map.cc:619-687) keeping
the map bounded. This tool runs a REAL multi-thousand-frame tracking
sequence on-chip with the full mapper in the loop — eviction, pruning,
reobservation, depth-filter recycling — plus a mid-sequence sensor
blackout that forces LOST and a genuine relocalization against the
already-built map.

The churn regime is geometric, not a knob: a keyframe is inserted about
every FOV turnover (~190-380 px of image travel, map.cc:170-188 —
matches only decay as points leave the view), so a K-slot store starts
EVICTING only once the live corridor exceeds ~K*300 px of travel, and
reaching insertions >= 3*K takes >= 3*K*300 px of path. The default
lawnmower sweep (lawnmower_trajectory) is sized for K=100: ~1550 world
units of path at z=8 (65 px/unit) in ~13000 frames at <= ~11 px/frame,
entirely inside the textured extent. For the K=1000 presets the same
physics needs ~10x that path — the per-step cost at K=1000 is measured
separately by tools/capacity_probe.py. Point capacity must scale with
keyframe capacity (see --points); the point store recycles only through
observer death (eviction / pruning / weak-point reaping).

Asserts: finishes RUNNING, bounded live keyframes with total insertions
well past capacity, eviction AND redundancy pruning fired (counted on
device: MapState.n_evicted / n_pruned), finite Sim(3) ATE over tracked
frames, >= 1 LOST->RUNNING recovery after the blackout. Prints one JSON
artifact.

Usage: python tools/long_run.py [--frames 5200] [--kf 100] [--json out]
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
                    yaw_amp: float = 0.06, legs: int = 2,
                    loiter=None, loiter_r: float = 1.5,
                    loiter_laps: int = 3):
    """Multi-leg traveling sweep (world->cam poses, frame 0 identity).

    Unlike PlaneScene.trajectory's bounded sinusoid (which keeps revisiting
    already-mapped ground, so the keyframe policy plateaus after a handful
    of insertions), this TRAVELS: x sweeps [0, span] ``legs`` times with a
    cosine profile (smooth velocity reversal at the ends — a triangle
    wave's instantaneous flip would spike the motion-model error by the
    full per-frame shift at every turnaround). When ``span`` exceeds the
    live map's corridor coverage, every leg keeps creating keyframes over
    re-entered territory the capacity cap already evicted.

    ``loiter=(t0, t1)`` pauses the sweep over that time fraction and orbits
    a circle of radius ``loiter_r`` instead (``loiter_laps`` laps, cosine-
    ramped angular speed). Each lap re-observes the previous laps' ground
    at the SAME scale, which is what makes redundancy pruning
    (map.cc:619-687) fire live: a straight corridor alone rarely gives a
    point the >=3 same-or-finer-scale co-observers the rule requires.
    """
    from sdvl_tpu.io.synthetic import _np_se3_exp, _np_se3_inverse

    l0, l1 = loiter if loiter else (1.0, 1.0)
    d = l1 - l0
    poses = []
    for i in range(n_frames):
        t = i / max(n_frames - 1, 1)
        dx = dy = 0.0
        if loiter and l0 <= t < l1:
            tau = l0 / max(1.0 - d, 1e-9)
            lt = (t - l0) / d
            ang = 2 * np.pi * loiter_laps * 0.5 * (1 - np.cos(np.pi * lt))
            dx = loiter_r * np.sin(ang)
            dy = loiter_r * (1.0 - np.cos(ang))
        else:
            tau = (t if t < l0 else t - d) / max(1.0 - d, 1e-9)
        sweep = 0.5 * (1.0 - np.cos(np.pi * legs * tau))
        ph = i / 90.0
        xi = np.array([
            span * sweep + dx,
            y_amp * np.sin(2 * np.pi * ph) + dy,
            0.2 * np.sin(2 * np.pi * t),
            yaw_amp * np.sin(2 * np.pi * ph),
            yaw_amp * np.cos(2 * np.pi * ph * 0.25) - yaw_amp,
            0.5 * yaw_amp * np.sin(2 * np.pi * ph * 0.33),
        ], np.float32)
        poses.append(_np_se3_inverse(_np_se3_exp(xi)))
    return poses


def lawnmower_trajectory(n_frames: int, ax: float = 30.0,
                         y0: float = -28.0, y1: float = 28.0,
                         k: int = 12, legs: int = 2,
                         yaw_amp: float = 0.05):
    """Boustrophedon sweep INSIDE the textured extent (world->cam poses).

    x oscillates sinusoidally over [-ax, ax] ``k`` times while y advances
    across [y0, y1] and back (``legs`` passes, cosine profile). Total path
    ~ 4*ax*k + |y1-y0|*legs world units — enough for hundreds of keyframe
    insertions WITHOUT ever leaving the real texture: the multi-hundred-
    unit straight corridor alternative runs deep into cv2's BORDER_REFLECT
    mirror zone, where live runs repeatedly collapsed (r5: three crashes
    at x ~= 60/69/107, all >= 26 units past the x=extent fold, with clean
    tracking elsewhere at the same speeds). Adjacent rows overlap ~50%
    vertically at z=8, so revisited points gain same-scale co-observers —
    the condition redundancy pruning (map.cc:619-687) needs to fire live.
    """
    from sdvl_tpu.io.synthetic import _np_se3_exp, _np_se3_inverse

    poses = []
    for i in range(n_frames):
        t = i / max(n_frames - 1, 1)
        x = ax * np.sin(2 * np.pi * k * t)
        y = y0 + (y1 - y0) * 0.5 * (1.0 - np.cos(np.pi * legs * t))
        ph = i / 90.0
        xi = np.array([
            x,
            y,
            0.2 * np.sin(2 * np.pi * t),
            yaw_amp * np.sin(2 * np.pi * ph),
            yaw_amp * np.cos(2 * np.pi * ph * 0.25) - yaw_amp,
            0.5 * yaw_amp * np.sin(2 * np.pi * ph * 0.33),
        ], np.float32)
        poses.append(_np_se3_inverse(_np_se3_exp(xi)))
    return poses


def run_protocol(cfg, scene, n_frames: int, chunk: int = 16,
                 blackout_frac: float = 0.6, blackout_len: int = 5,
                 span: float = 8.0, legs: int = 2, loiter=None,
                 poses=None, seed: int = 0):
    """Feed a long multi-leg sweep (continuous new coverage -> many
    keyframes -> eviction) with a short blackout at ``blackout_frac``
    (mid-leg, i.e. in recently-REVISITED territory), so recovery must
    come from relocalization against previously-built map structure.

    Returns (result, gt_poses, stats dict). Pure protocol — no asserts —
    shared by tools/long_run.py (full scale, real chip) and
    tests/test_long_run.py (reduced scale, CPU).
    """
    from sdvl_tpu.pipeline.stream import SdvlStream

    if poses is None:
        poses = long_trajectory(n_frames, span=span, legs=legs,
                                loiter=loiter)
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
        "n_keyframe_frames": int(len(kf_frames)),
        "final_state": r.state_name(),
        "reloc_after_blackout": reloc_ok,
        "keyframes_live": live_kf,
        "keyframes_total_inserted": total_kf,
        # device-counted map-maintenance events (MapState.n_evicted /
        # n_pruned): eviction = capacity cap (map.cc:190-205), prune =
        # redundancy (map.cc:619-687 with anchor re-homing)
        "evictions": int(np.asarray(m.n_evicted)),
        "prunes": int(np.asarray(m.n_pruned)),
        "points_live": live_pts,
        "ate_rmse": None if ate is None else round(ate, 4),
        # HARNESS rate: the wall clock includes per-frame host rendering
        # (~14 ms/frame at 640x480) — this is NOT framework throughput
        # (bench.py measures that against pre-rendered chunks)
        "harness_fps": round(n_steady / wall, 1),
        "compile_s": round(t_comp, 1),
    }
    return r, gt, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=13000)
    ap.add_argument("--kf", type=int, default=100)
    ap.add_argument("--rows", type=int, default=12,
                    help="lawnmower x-periods (path ~ 4*30*rows units; "
                         "must exceed the live corridor, ~kf*4.6 units, "
                         "for eviction churn)")
    ap.add_argument("--legs", type=int, default=2)
    ap.add_argument("--points", type=int, default=None,
                    help="point-slot capacity; defaults to 160*kf. MUST "
                         "scale with the keyframe capacity: live keyframes "
                         "each hold ~150 points, and points are only "
                         "recycled when observers die (eviction/pruning/"
                         "weak-point reaping) — a 4096-point store under a "
                         "100-KF map FILLS after ~26 insertions, seeding "
                         "stops, and tracking starves (measured r5)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdvl_tpu.io.synthetic import PlaneScene, make_texture
    from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig

    # Deep plane (z=8) + a 4096-px texture keeps texture resolution matched
    # to image resolution (fx/z = 65 px/unit vs 4096/(2*extent) = 60
    # px/unit). The lawnmower stays INSIDE the extent: beyond it cv2's
    # BORDER_REFLECT mirror zone repeatedly collapsed live tracking (see
    # lawnmower_trajectory docstring). Default speed: ~7.8 px/frame mean,
    # ~11.3 peak.
    Z = 8.0
    if args.points is None:
        args.points = 160 * args.kf
    scene = PlaneScene(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                       width=640, height=480, plane_z=Z, extent=34.0,
                       texture=make_texture(4096, seed=0))
    cfg = Config(
        camera=CameraConfig(width=640, height=480, fx=517.3, fy=516.5,
                            u0=318.6, v0=255.3, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(min_avg_shift=10.0, max_keyframes=args.kf,
                        min_keyframe_its=10, min_init_corners=40,
                        max_points=args.points, max_candidates=512,
                        map_scale=Z),
    )
    poses = lawnmower_trajectory(args.frames, k=args.rows, legs=args.legs)
    _, _, stats = run_protocol(cfg, scene, args.frames, poses=poses)
    print(json.dumps(stats, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(stats, f, indent=1)

    assert stats["final_state"] == "RUNNING", stats
    assert stats["tracked_ratio"] > 0.9, stats
    assert stats["reloc_after_blackout"], stats
    assert stats["keyframes_live"] <= args.kf, stats
    assert stats["keyframes_total_inserted"] >= 3 * args.kf, stats
    assert stats["evictions"] > 0 and stats["prunes"] > 0, stats
    assert stats["ate_rmse"] is not None and np.isfinite(stats["ate_rmse"])
    print("LONG_RUN_OK")


if __name__ == "__main__":
    main()
