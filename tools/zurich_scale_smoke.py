"""Zurich-preset scale smoke on the real chip: max_keyframes=1000.

Evidence for the long-trajectory axis (SURVEY.md §5 "map-size scaling";
reference config_zurich.cfg sets max_keyframes=1000, map.cc:190-205 evicts
beyond it): allocates the FULL Zurich-capacity MapState at 640x480 — the
uint8 keyframe store is what makes this fit (~0.4 GB; f32 would be ~1.6 GB
— state/map_state.py) — fills hundreds of keyframe slots with real
rendered views, and runs the matrix-free block-Jacobi PCG global BA
(solvers/ba.py above CG_KF_THRESHOLD=200 slots the dense (6K,6K) reduced
system is never materialized). Prints one JSON line with state sizes,
BA wall time, and the post-BA mean reprojection error.

Usage: python tools/zurich_scale_smoke.py [--kf 320] [--pts 4096]
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
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kf", type=int, default=320,
                    help="keyframes to actually populate (capacity is 1000)")
    ap.add_argument("--pts", type=int, default=4096)
    ap.add_argument("--stage-iters", type=int, nargs=2, default=(4, 6))
    ap.add_argument("--no-serve", dest="serve", action="store_false",
                    help="skip the localize-only serving phase")
    args = ap.parse_args()

    from sdvl_tpu.core import camera, se3
    from sdvl_tpu.io.synthetic import PlaneScene
    from sdvl_tpu.ops import pyramid
    from sdvl_tpu.pipeline import mapper
    from sdvl_tpu.state.map_state import empty_map, store_pyramid

    K_CAP, P, LEVELS = 1000, args.pts, 5
    H, W = 480, 640
    intr = camera.Intrinsics.create(517.3, 516.5, 318.6, 255.3,
                                    width=W, height=H)
    scene = PlaneScene(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                       width=W, height=H, plane_z=4.0)

    m = empty_map(n_kf=K_CAP, n_pts=P, n_cand=8, img_shape=(H, W),
                  levels=LEVELS)
    state_bytes = sum(np.prod(x.shape) * x.dtype.itemsize
                      for x in jax.tree_util.tree_leaves(m))

    # world points on the plane, observed by a long keyframe trajectory
    rs = np.random.default_rng(0)
    pts_w = np.concatenate([
        rs.uniform([-3.5, -2.5], [3.5, 2.5], (P, 2)), np.full((P, 1), 4.0),
    ], axis=1).astype(np.float32)

    Kn = args.kf
    kf_poses = np.stack([
        np.asarray(scene.trajectory(Kn, translation_amp=1.5)[k])
        for k in range(Kn)
    ]).astype(np.float32)

    @jax.jit
    def fill(m, kf_poses, pts_w, imgs):
        p_cam = se3.transform(kf_poses[:, None], pts_w[None])   # (Kn,P,3)
        px = jax.vmap(lambda pc: camera.project(intr, pc))(p_cam)
        vis = ((p_cam[..., 2] > 0.1)
               & jax.vmap(lambda q: camera.in_bounds(intr, q, margin=8))(px))
        kf_ids = jnp.arange(Kn, dtype=jnp.int32)
        kf_pyr = m.kf_pyr
        pyrs = jax.vmap(lambda im: tuple(
            store_pyramid(pyramid.build_pyramid(im, LEVELS))))(imgs)
        kf_pyr = tuple(
            lvl.at[:Kn].set(p) for lvl, p in zip(kf_pyr, pyrs)
        )
        return m._replace(
            kf_pose=m.kf_pose.at[:Kn].set(kf_poses),
            kf_valid=m.kf_valid.at[:Kn].set(True),
            kf_frame_id=m.kf_frame_id.at[:Kn].set(kf_ids),
            kf_pyr=kf_pyr,
            n_keyframes=jnp.asarray(Kn, jnp.int32),
            pt_pos=jnp.asarray(pts_w),
            pt_valid=jnp.ones(P, bool),
            pt_anchor_kf=jnp.zeros(P, jnp.int32),
            pt_found=jnp.full(P, 3, jnp.int32),
            obs_mask=m.obs_mask.at[:Kn].set(vis),
            obs_px=m.obs_px.at[:Kn].set(px + 0.3),  # ~0.3px measurement noise
        )

    imgs = np.stack([
        np.clip(scene.render(p), 0, 255).astype(np.float32)
        for p in kf_poses
    ])
    m = fill(m, jnp.asarray(kf_poses), jnp.asarray(pts_w), jnp.asarray(imgs))
    jax.block_until_ready(m.kf_pose)

    # SERVING PHASE FIRST: it is latency-sensitive, and the BA phase below
    # reads scalar reprojection errors off-device — on this runtime the
    # FIRST device->host transfer of the process permanently degrades
    # launch latency (~25 ms sync mode; pipeline/device_fsm.py docstring),
    # which round 5 measured poisoning the serve timings 100x when the BA
    # phase ran first (chunked 3,263 -> 26 fps, 16-lane reloc 0.5 -> 37 ms
    # for identical code). The BA phase times multi-second jitted solves
    # under block_until_ready, so launch-latency poisoning from the serve
    # phase's final result() pull is noise to it.
    serve_out = serve_smoke(m, intr, scene, kf_poses, K_CAP, P) \
        if args.serve else {}

    # perturb poses+points, then PCG global BA must pull them back
    key = jax.random.PRNGKey(1)
    dk, pk = jax.random.split(key)

    @jax.jit
    def perturb(m, dk, pk):
        noise = 0.01 * jax.random.normal(dk, (K_CAP, 6))
        noise = noise.at[:2].set(0.0)  # gauge: first two fixed by BA anyway
        poses = jax.vmap(lambda p, x: se3.compose(se3.exp(x), p))(
            m.kf_pose, noise)
        pts = m.pt_pos + 0.02 * jax.random.normal(pk, m.pt_pos.shape)
        return m._replace(kf_pose=poses, pt_pos=pts)

    m_noisy = perturb(m, dk, pk)

    @jax.jit
    def reproj_err(m):
        p_cam = se3.transform(m.kf_pose[:, None], m.pt_pos[None])
        px = jax.vmap(lambda pc: camera.project(intr, pc))(p_cam)
        e = jnp.linalg.norm(px - m.obs_px, axis=-1)
        w = m.obs_mask & m.kf_valid[:, None] & m.pt_valid[None, :]
        return jnp.sum(jnp.where(w, e, 0)) / jnp.maximum(jnp.sum(w), 1)

    e0 = float(reproj_err(m_noisy))
    ba_fn = jax.jit(lambda mm: mapper.global_ba(
        mm, intr, stage_iters=tuple(args.stage_iters)))
    t0 = time.perf_counter()
    m_ba = ba_fn(m_noisy)
    jax.block_until_ready(m_ba.kf_pose)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    m_ba = ba_fn(m_noisy)
    jax.block_until_ready(m_ba.kf_pose)
    t_warm = time.perf_counter() - t0
    e1 = float(reproj_err(m_ba))

    out = {
        "kf_capacity": K_CAP,
        "kf_filled": Kn,
        "points": P,
        "state_gb": round(state_bytes / 1e9, 3),
        "reproj_px_before": round(e0, 3),
        "reproj_px_after": round(e1, 3),
        "ba_s_compile+run": round(t_first, 1),
        "ba_s_warm": round(t_warm, 2),
    }
    assert e1 < 0.35 * e0, (e0, e1)

    out.update(serve_out)
    print(json.dumps(out))
    print("zurich_scale_smoke OK")


def serve_smoke(m, intr, scene, kf_poses, K_CAP, P):
    """Localize-only serving against the Zurich-capacity map (round-3
    review item 4: no reloc/steady latency number existed at K=1000).

    Starts a frozen-map SdvlStream LOST over the populated 1000-slot map,
    measures the relocalization step latency (bounded fan-out:
    reloc_max_keyframes=64 nearest lanes — NOT a 1000-lane vmap) and the
    steady tracking step latency, then separately times the standalone
    relocalizer at several lane budgets to show the cost scales with the
    LANE budget, not with K."""
    from sdvl_tpu.core import se3
    from sdvl_tpu.pipeline import relocalize as reloc_mod
    from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
    from sdvl_tpu.pipeline.device_fsm import STATE_LOST
    from sdvl_tpu.pipeline.stream import SdvlStream
    from sdvl_tpu.ops import pyramid as pyr_ops

    cfg = Config(
        camera=CameraConfig(width=640, height=480, fx=517.3, fy=516.5,
                            u0=318.6, v0=255.3, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(max_keyframes=K_CAP, max_points=P,
                        max_candidates=8, localize_only=True,
                        reloc_max_keyframes=64, map_scale=4.0,
                        min_avg_shift=10.0),
    )
    slam = SdvlStream(cfg, seed=0, donate=False)
    slam.m = m

    def go_lost(near_kf: int):
        slam.carry = slam.carry._replace(
            state=jnp.asarray(STATE_LOST, jnp.int32),
            lost_frames=jnp.asarray(3, jnp.int32),
            pose=jnp.asarray(kf_poses[near_kf]),
            xi_model=jnp.zeros(6, jnp.float32),
        )

    # query frames: revisit the mapped trajectory with a small offset
    q_poses = [kf_poses[10 + i] for i in range(130)]
    q_frames = [np.clip(scene.render(p), 0, 255).astype(np.uint8)
                for p in q_poses]

    go_lost(8)
    t0 = time.perf_counter()
    slam.feed(q_frames[0], block=True)          # compile + first reloc
    t_compile = time.perf_counter() - t0

    go_lost(8)
    t0 = time.perf_counter()
    slam.feed(q_frames[0], block=True)          # warm reloc step
    reloc_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    for f in q_frames[1:65]:
        slam.feed(f)
    slam.block()
    steady_ms = (time.perf_counter() - t0) / 64 * 1e3

    # chunked serving at capacity: one fused lax.scan launch per 32 frames
    # amortizes the per-launch tunnel latency that dominates steady_ms
    # (32 = the measured sweet spot, tools/chunk_sweep.py round 5)
    chunks = [np.stack(q_frames[i:i + 32]) for i in (1, 33, 65, 97)]
    slam.feed_chunk(chunks[0])
    slam.block()                       # compile the chunk program
    t0 = time.perf_counter()
    for c in chunks:
        slam.feed_chunk(c)
    slam.block()
    chunk_fps = 128 / (time.perf_counter() - t0)

    # standalone relocalizer: cost tracks the lane budget, not K
    img = jnp.asarray(q_frames[0][: slam.crop_h, : slam.crop_w],
                      jnp.float32)
    pyr = tuple(pyr_ops.build_pyramid(img, len(m.kf_pyr)))
    lane_ms = {}
    for lanes in (16, 64, 256):
        fn = jax.jit(lambda mm, py, po, _l=lanes: reloc_mod.relocalize(
            mm, intr, py, po, level=4, max_kf=_l))
        guess = jnp.asarray(kf_poses[8])
        r = fn(m, pyr, guess)
        jax.block_until_ready(r.pose)
        t0 = time.perf_counter()
        for _ in range(8):
            r = fn(m, pyr, guess)
        jax.block_until_ready(r.pose)
        lane_ms[lanes] = round((time.perf_counter() - t0) / 8 * 1e3, 2)

    # correctness AFTER all timing (transfers poison launch latency)
    res = slam.result()
    states = np.asarray(res.states)
    ok_reloc = bool((states == 2).any())
    stats = jax.local_devices()[0].memory_stats() or {}
    return {
        "serve_compile_s": round(t_compile, 1),
        "serve_reloc_step_ms": round(reloc_ms, 2),
        "serve_steady_step_ms": round(steady_ms, 2),
        "serve_chunked_fps": round(chunk_fps, 1),
        "serve_relocalized": ok_reloc,
        "serve_final_state": res.state_name(),
        "serve_tracked_frames": int((states == 2).sum()),
        "reloc_lane_ms": lane_ms,
        "hbm_in_use_gb": round(
            stats.get("bytes_in_use", 0) / 1e9, 3) or None,
    }


if __name__ == "__main__":
    main()
