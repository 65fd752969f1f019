"""Per-stage device timing of the tracking/mapping hot path.

Observability tool (SURVEY.md §5: the reference only has per-frame stopwatch
prints, main.cc:136-146): builds the SAME workload as bench.py, runs the
stream to steady state, then times each pipeline stage as its own jitted
program on the device — pyramid+detect, direct alignment, map-point
matching, robust pose, candidate depth-filter update, keyframe insertion +
local BA, and the fused full step — and prints a JSON breakdown.

No device->host value transfer happens before timing ends (transfers poison
launch latency on this runtime, see pipeline/device_fsm.py). Synchronization
is block_until_ready only.

Usage: python tools/profile_step.py [--reps 32] [--chunk 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_profile"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, args, reps):
    out = fn(*args)                      # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--warm-frames", type=int, default=48)
    args = ap.parse_args()

    from sdvl_tpu.core import se3
    from sdvl_tpu.io.synthetic import PlaneScene
    from sdvl_tpu.ops import fast as fast_ops
    from sdvl_tpu.ops import pyramid
    from sdvl_tpu.pipeline import mapper, matcher, tracker
    from sdvl_tpu.pipeline.config import (CameraConfig, Config, SdvlConfig,
                                          intrinsics)
    from sdvl_tpu.pipeline.stream import SdvlStream
    from sdvl_tpu.solvers import image_align

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
    s = cfg.sdvl
    intr = intrinsics(cfg)

    # steady-state map/carry from a real run (donate=False so the state
    # survives for the stage probes)
    slam = SdvlStream(cfg, seed=0, donate=False)
    n = args.warm_frames
    frames = [np.clip(scene.render(p), 0, 255).astype(np.uint8)
              for p in scene.trajectory(n + args.chunk, translation_amp=1.0)]
    for i in range(0, n, args.chunk):
        slam.feed_chunk(np.stack(frames[i:i + args.chunk]))
    slam.block()
    m, carry = slam.m, slam.carry

    levels = s.pyramid_levels

    def make_preprocess(use_pallas):
        def preprocess(img):
            pyr = tuple(
                pyramid.build_pyramid(img.astype(jnp.float32), levels))
            corners = fast_ops.detect_pyramid(
                pyr, levels=s.max_fast_levels, cell=s.cell_size,
                fast_threshold=s.fast_threshold,
                st_threshold=s.min_feature_score,
                max_features=s.num_features,
                use_pallas=use_pallas)
            return pyr, corners
        return preprocess

    preprocess = make_preprocess(s.use_pallas_detect)

    img_dev = jax.device_put(frames[n][: slam.crop_h, : slam.crop_w])
    pyr, corners = jax.jit(preprocess)(img_dev)
    jax.block_until_ready(pyr)

    pose_pred = se3.compose(se3.exp(carry.xi_model), carry.pose)

    def stage_align(m, last_pyr, cur_pyr, pose, pred, idx, ok):
        pts = m.pt_pos[idx]
        return image_align.compute_pose(
            last_pyr, cur_pyr, intr, pts, ok & m.pt_valid[idx], pose, pred,
            max_level=s.max_align_level, min_level=s.min_align_level,
            iters=max(s.max_img_align_its // 3, 1),
            patch_half=s.align_patch_size // 2).pose

    def stage_match(m, cur_pyr, pose):
        mr = matcher.match_map_points(
            m, intr, cur_pyr, pose, cell=s.cell_size, use_orb=s.use_orb,
            half=s.patch_size // 2, lk_iters=s.max_align_its,
            reproj_px=float(s.search_size), max_matches=s.max_matches,
            orb_radius=s.orb_size // 2)
        return mr.px, mr.ok

    def stage_track(m, carry, cur_pyr, pose, pred):
        tr = tracker.track_frame(
            m, intr, carry.last_pyr, carry.last_idx, carry.last_ok,
            pose, cur_pyr, pred,
            cell=s.cell_size, align_max_level=s.max_align_level,
            align_min_level=s.min_align_level,
            align_iters=max(s.max_img_align_its // 3, 1),
            pose_iters=s.max_optim_pose_its,
            inlier_thresh_px=s.inlier_error_threshold, use_orb=s.use_orb,
            ransac_key=jax.random.PRNGKey(7),
            ransac_hypotheses=min(s.ransac_hypotheses, s.max_ransac_its),
            ransac_points=s.max_ransac_points,
            patch_half=s.patch_size // 2, lk_iters=s.max_align_its,
            search_px=float(s.search_size), max_matches=s.max_matches,
            align_patch_half=s.align_patch_size // 2,
            orb_radius=s.orb_size // 2)
        return tr.pose, tr.n_matches

    def stage_update_map(m, cur_pyr, pose):
        mm = mapper.update_map(
            m, intr, cur_pyr, pose, n_samples=s.epipolar_samples,
            threshold_converged=s.threshold_converged,
            max_failed=s.max_failed, use_orb=s.use_orb,
            patch_half=s.patch_size // 2, lk_iters=s.max_align_its,
            orb_radius=s.orb_size // 2,
            stale_kf_window=2 * s.max_search_keyframes,
            map_scale=s.map_scale, scale_min_dist=s.scale_min_dist)
        return mm.cand_rho, mm.pt_valid

    def stage_keyframe(m, carry, corners, cur_pyr, pose):
        mm, slot = mapper.add_keyframe(
            m, intr, cur_pyr, pose, carry.frame_id,
            carry.last_idx, m.obs_px[0, carry.last_idx], carry.last_ok,
            jnp.zeros_like(carry.last_idx),
            corners.xy, corners.level, corners.valid, s.cell_size,
            n_search_kf=s.max_search_keyframes, max_reobs=s.max_reobs,
            scale_min_dist=s.scale_min_dist, map_scale=s.map_scale,
            use_orb=s.use_orb, epipolar_samples=s.epipolar_samples,
            patch_half=s.patch_size // 2, lk_iters=s.max_align_its,
            orb_radius=s.orb_size // 2)
        mm = mapper.local_ba(mm, intr, slot,
                             window=min(10, s.max_keyframes - 1),
                             max_points=min(s.max_points, 512))
        return mm.kf_pose, mm.pt_pos

    reps = args.reps
    out = {}
    out["preprocess_ms"] = timeit(jax.jit(preprocess), (img_dev,), reps)
    # XLA-vs-Pallas A/B of the detect stage (round-3 review: the fused
    # VMEM kernel shipped with no published on-chip comparison). Both
    # variants run the identical pyramid+detect program; only the dense
    # FAST+Shi-Tomasi map differs (ops/pallas/detect.py vs the XLA
    # neighbor-stack path).
    if jax.default_backend() != "cpu":
        out["preprocess_xla_ms"] = timeit(
            jax.jit(make_preprocess(False)), (img_dev,), reps)
        try:
            out["preprocess_pallas_ms"] = timeit(
                jax.jit(make_preprocess(True)), (img_dev,), reps)
        except Exception as e:  # Mosaic/platform unavailable
            out["preprocess_pallas_ms"] = None
            print(f"# pallas detect failed: {e}", file=sys.stderr)
    # state passed as ARGUMENTS: a closed-over device array is baked into
    # the executable as a literal and re-crosses the tunnel every launch,
    # inflating a stage by its state size (same trap as ops/pyramid.py:8-16)
    out["image_align_ms"] = timeit(
        jax.jit(stage_align),
        (m, carry.last_pyr, pyr, carry.pose, pose_pred, carry.last_idx,
         carry.last_ok), reps)
    out["match_map_points_ms"] = timeit(
        jax.jit(stage_match), (m, pyr, pose_pred), reps)
    out["track_frame_ms"] = timeit(
        jax.jit(stage_track), (m, carry, pyr, carry.pose, pose_pred), reps)
    out["update_map_ms"] = timeit(
        jax.jit(stage_update_map), (m, pyr, pose_pred), reps)
    out["keyframe_plus_local_ba_ms"] = timeit(
        jax.jit(stage_keyframe), (m, carry, corners, pyr, pose_pred),
        max(reps // 4, 4))

    # fused full step over a chunk, amortized per frame
    chunk = np.stack(frames[n:n + args.chunk])
    t_c = timeit(lambda c: slam.feed_chunk(c) and None or slam.carry.pose,
                 (chunk,), reps=4)
    out["fused_step_per_frame_ms"] = t_c / args.chunk

    out["derived_sum_track_ms"] = (
        out["preprocess_ms"] + out["track_frame_ms"] + out["update_map_ms"])
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
