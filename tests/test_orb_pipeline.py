"""ORB-gated matching: descriptor path wired through the full pipeline.

All reference dataset presets set ``use_orb: 1`` (config/config_*.cfg), so
the descriptor gate must work end-to-end, not just as an op.
"""

import numpy as np

from sdvl_tpu.io import evaluate
from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.ops import orb
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
from sdvl_tpu.pipeline.sdvl import SDVL, TrackingState


def test_descriptor_gate_keeps_true_matches():
    """Descriptors at the same physical point in two nearby renders must be
    close in Hamming distance; unrelated points far."""
    import jax.numpy as jnp

    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=320, height=240, plane_z=4.0)
    poses = scene.trajectory(4)
    i1 = jnp.asarray(scene.render(poses[0]), jnp.float32)
    i2 = jnp.asarray(scene.render(poses[0]), jnp.float32)  # identical view
    pts = jnp.asarray(np.array([[100.0, 80.0], [200.0, 150.0],
                                [60.0, 200.0]], np.float32))
    d1 = orb.descriptors(i1, pts)
    d2 = orb.descriptors(i2, pts)
    same = np.asarray(orb.hamming(d1, d2))
    assert (same <= 5).all(), same
    cross = np.asarray(orb.hamming(d1[0], d1[1]))
    assert cross > 40, cross


def test_e2e_with_orb_enabled():
    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=320, height=240, plane_z=4.0)
    cfg = Config(
        camera=CameraConfig(width=320, height=240, fx=210.0, fy=210.0,
                            u0=159.5, v0=119.5, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(cell_size=32, min_avg_shift=5.0, max_keyframes=10,
                        min_keyframe_its=5, min_init_corners=30,
                        max_points=512, max_candidates=256, min_matches=15,
                        map_scale=4.0, use_orb=True),
    )
    slam = SDVL(cfg, seed=0)
    poses_gt = scene.trajectory(24)
    infos = [slam.handle_frame(scene.render(p)) for p in poses_gt]
    assert slam.state == TrackingState.RUNNING
    running = [i for i, inf in enumerate(infos) if inf["state"] == "RUNNING"]
    start = running[0]
    # the gate must not starve tracking
    n_matches = np.asarray([infos[i]["n_matches"] for i in running])
    assert (n_matches >= 15).mean() > 0.8, n_matches
    est = np.stack([inf["pose"] for inf in infos[start:]])
    gt = np.stack(poses_gt[start:])
    ate = evaluate.ate_rmse(evaluate.positions_from_poses(est),
                            evaluate.positions_from_poses(gt),
                            with_scale=True)
    extent = float(np.linalg.norm(
        np.ptp(evaluate.positions_from_poses(gt), axis=0)))
    assert ate < 0.05 * max(extent, 1e-6), (ate, extent)
