"""Tests for camera model and geometry vs cv2/numpy oracles."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from sdvl_tpu.core import camera, geometry, se3


INTR = camera.Intrinsics.create(
    fx=525.0, fy=525.0, cx=319.5, cy=239.5,
    dist=[0.1, -0.05, 0.001, 0.002, 0.01], width=640, height=480,
)


def test_project_unproject_roundtrip(rng):
    pts = rng.uniform([-2, -2, 1], [2, 2, 8], size=(128, 3)).astype(np.float32)
    px = camera.project(INTR, jnp.asarray(pts))
    bearings = camera.unproject(INTR, px)
    # bearing * depth should reconstruct the point
    depth = np.linalg.norm(pts, axis=1)
    rec = np.asarray(bearings) * depth[:, None]
    np.testing.assert_allclose(rec, pts, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(bearings), axis=1), 1.0, atol=1e-5
    )


def test_distortion_matches_opencv(rng):
    uv = rng.uniform(-0.4, 0.4, size=(64, 2)).astype(np.float32)
    ours = np.asarray(camera.distort_unit_plane(INTR, jnp.asarray(uv)))
    # OpenCV oracle: projectPoints of unit-plane 3D points with K=I
    obj = np.concatenate([uv, np.ones((64, 1), np.float32)], axis=1)
    dist = np.asarray(INTR.dist, np.float64)
    img, _ = cv2.projectPoints(
        obj.astype(np.float64), np.zeros(3), np.zeros(3), np.eye(3), dist
    )
    np.testing.assert_allclose(ours, img[:, 0, :], rtol=1e-4, atol=1e-5)


def test_undistort_map_matches_opencv():
    K = np.array(
        [[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]], np.float64
    )
    dist = np.asarray(INTR.dist, np.float64)
    mapx, mapy = cv2.initUndistortRectifyMap(
        K, dist, None, K, (640, 480), cv2.CV_32FC1
    )
    ours = np.asarray(camera.undistort_map(INTR))
    # Compare on the interior (OpenCV extrapolates at borders the same way,
    # but keep a margin for safety).
    np.testing.assert_allclose(ours[20:-20, 20:-20, 0], mapx[20:-20, 20:-20], atol=0.05)
    np.testing.assert_allclose(ours[20:-20, 20:-20, 1], mapy[20:-20, 20:-20], atol=0.05)


def test_jacobian_unit_plane_finite_diff(rng):
    pts = rng.uniform([-1, -1, 2], [1, 1, 6], size=(16, 3)).astype(np.float32)
    pose = se3.identity((16,))
    J = np.asarray(geometry.jacobian_unit_plane(jnp.asarray(pts)))
    eps = 1e-4
    for k in range(6):
        xi = np.zeros((16, 6), np.float32)
        xi[:, k] = eps
        pose_pert = se3.boxplus(pose, jnp.asarray(xi))
        p_pert = se3.transform(pose_pert, jnp.asarray(pts))
        uv0 = camera.project_unit_plane(jnp.asarray(pts))
        uv1 = camera.project_unit_plane(p_pert)
        fd = (np.asarray(uv1) - np.asarray(uv0)) / eps
        np.testing.assert_allclose(J[:, :, k], fd, atol=5e-3, rtol=5e-3)


def test_triangulation_consistency(rng):
    # Ground-truth 3D points seen from two cameras
    pts_w = rng.uniform([-2, -2, 3], [2, 2, 10], size=(64, 3)).astype(np.float32)
    pose_a = se3.identity()
    xi = jnp.asarray(np.array([0.3, 0.05, 0.02, 0.01, -0.04, 0.02]), jnp.float32)
    pose_b = se3.exp(xi)

    p_a = se3.transform(pose_a, jnp.asarray(pts_w))
    p_b = se3.transform(pose_b, jnp.asarray(pts_w))
    uv_a = camera.project_unit_plane(p_a)
    uv_b = camera.project_unit_plane(p_b)

    # DLT triangulation recovers world points
    rec = geometry.triangulate_dlt(
        jnp.broadcast_to(pose_a, (64, 7)), jnp.broadcast_to(pose_b, (64, 7)),
        uv_a, uv_b,
    )
    np.testing.assert_allclose(np.asarray(rec), pts_w, rtol=1e-2, atol=1e-2)

    # depth_from_triangulation recovers depth along ref bearing
    b_a = p_a / jnp.linalg.norm(p_a, axis=-1, keepdims=True)
    b_b = p_b / jnp.linalg.norm(p_b, axis=-1, keepdims=True)
    rel = se3.compose(pose_b, se3.inverse(pose_a))  # a->b
    d = geometry.depth_from_triangulation(
        jnp.broadcast_to(rel, (64, 7)), b_a, b_b
    )
    np.testing.assert_allclose(
        np.asarray(d), np.linalg.norm(np.asarray(p_a), axis=1), rtol=1e-2
    )

    # midpoint triangulation in cur frame
    mid = geometry.triangulate_midpoint(jnp.broadcast_to(rel, (64, 7)), b_a, b_b)
    np.testing.assert_allclose(np.asarray(mid), np.asarray(p_b), rtol=1e-2, atol=1e-2)


def test_masked_median():
    v = jnp.asarray([5.0, 1.0, 3.0, 100.0, 2.0, 4.0])
    mask = jnp.asarray([True, True, True, False, True, True])
    med = geometry.masked_median(v, mask)
    assert float(med) == 3.0
    # empty mask -> 0
    assert float(geometry.masked_median(v, jnp.zeros(6, bool))) == 0.0


def test_parallax_cosine():
    p = jnp.asarray([0.0, 0.0, 5.0])
    ca = jnp.asarray([0.0, 0.0, 0.0])
    cb = jnp.asarray([1.0, 0.0, 0.0])
    cos = geometry.parallax_cosine(p, ca, cb)
    expected = np.dot([0, 0, -5], [-1, 0, -5]) / (5 * np.sqrt(26))
    np.testing.assert_allclose(float(cos), expected, rtol=1e-5)


def test_in_bounds_levels():
    px = jnp.asarray([[10.0, 10.0], [635.0, 100.0], [100.0, 2.0]])
    assert np.asarray(camera.in_bounds(INTR, px, margin=5.0)).tolist() == [
        True, False, False,
    ]
    # at level 3 the image is 80x60
    px2 = jnp.asarray([[600.0, 400.0]])
    assert bool(camera.in_bounds(INTR, px2, margin=2.0, level=3)[0])
