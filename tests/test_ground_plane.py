"""Initial-map ground-plane alignment (reference Map::TransformInitialMap)."""

import numpy as np

import jax
import jax.numpy as jnp

from sdvl_tpu.core import geometry, se3
from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
from sdvl_tpu.pipeline.sdvl import SDVL, TrackingState


def test_fit_plane_ransac_recovers_plane():
    rng = np.random.default_rng(0)
    n = jnp.asarray([0.0, 1.0, 1.0]) / np.sqrt(2)
    pts_on = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
    pts_on = pts_on - (pts_on @ np.asarray(n))[:, None] * np.asarray(n)
    pts_on = pts_on + np.asarray(n) * 0.5  # plane n.p = 0.5
    outliers = rng.uniform(-3, 3, (60, 3)).astype(np.float32)
    pts = jnp.asarray(np.concatenate([pts_on, outliers]))
    valid = jnp.ones(len(pts), bool)
    (nf, df), inl = geometry.fit_plane_ransac(
        pts, valid, jax.random.PRNGKey(0), thresh=0.05
    )
    align = abs(float(jnp.dot(nf, n)))
    assert align > 0.999, align
    assert abs(abs(float(df)) - 0.5) < 0.02
    assert int(inl.sum()) >= 280


def test_rotation_between_edge_cases():
    e3 = jnp.asarray([0.0, 0.0, 1.0])
    for v in ([0, 0, 1.0], [0, 0, -1.0], [1.0, 0, 0], [0.6, -0.8, 0.0]):
        a = jnp.asarray(v, jnp.float32)
        a = a / jnp.linalg.norm(a)
        R = geometry.rotation_between(a, e3)
        np.testing.assert_allclose(np.asarray(R @ a), [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)


def test_bootstrap_aligns_world_to_plane():
    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=320, height=240, plane_z=4.0)
    cfg = Config(
        camera=CameraConfig(width=320, height=240, fx=210.0, fy=210.0,
                            u0=159.5, v0=119.5, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(min_avg_shift=5.0, max_keyframes=10,
                        min_keyframe_its=5, min_init_corners=30,
                        max_points=512, max_candidates=256, map_scale=4.0,
                        align_ground_plane=True),
    )
    slam = SDVL(cfg, seed=0)
    for p in scene.trajectory(8):
        info = slam.handle_frame(scene.render(p))
        if slam.state == TrackingState.RUNNING:
            break
    assert slam.state == TrackingState.RUNNING

    pts = np.asarray(slam.m.pt_pos)[np.asarray(slam.m.pt_valid)]
    # scene points all lie on one plane -> aligned map must put them at z~0
    assert abs(np.median(pts[:, 2])) < 0.15, np.median(pts[:, 2])
    assert np.percentile(np.abs(pts[:, 2]), 80) < 0.5
    # cameras above the plane (+z side), at roughly map_scale height
    centers = np.asarray(se3.translation(se3.inverse(slam.m.kf_pose)))
    kf = np.asarray(slam.m.kf_valid)
    assert (centers[kf][:, 2] > 1.0).all(), centers[kf]
