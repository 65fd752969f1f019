"""Tests for solvers: LK, image alignment, pose IRLS, homography, BA.

Synthetic-scene oracles: render a textured plane / random point cloud with
known poses, perturb, and check recovery — the "fake backend" strategy from
SURVEY.md §4.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvl_tpu.core import camera, geometry, se3
from sdvl_tpu.ops import interp, pyramid
from sdvl_tpu.solvers import ba, homography, image_align, lk, pose

INTR = camera.Intrinsics.create(420.0, 420.0, 319.5, 239.5, width=640, height=480)


def make_textured_image(seed=0, shape=(480, 640)):
    rs = np.random.default_rng(seed)
    img = rs.uniform(0, 255, size=shape).astype(np.float32)
    return cv2.GaussianBlur(img, (9, 9), 3.0)


def test_lk_recovers_shift():
    img = make_textured_image(1)
    jimg = jnp.asarray(img)
    rs = np.random.default_rng(2)
    true_xy = rs.uniform([30, 30], [600, 440], size=(64, 2)).astype(np.float32)
    patches = interp.extract_patches(jimg, jnp.asarray(true_xy), half=4)
    init = true_xy + rs.uniform(-3, 3, size=(64, 2)).astype(np.float32)
    res = lk.align_patches(jimg, patches, jnp.asarray(init),
                           jnp.ones(64, bool), iters=20)
    conv = np.asarray(res.converged)
    err = np.linalg.norm(np.asarray(res.xy) - true_xy, axis=1)
    assert conv.mean() > 0.9
    assert np.median(err[conv]) < 0.1, f"median err {np.median(err[conv])}"


def _render_view(img_ref, pose_ref, pose_cur, depth_plane_z=5.0):
    """Warp a reference image to a new view assuming a fronto-parallel plane
    at z=depth_plane_z in the ref camera (homography render)."""
    K = np.array([[420.0, 0, 319.5], [0, 420.0, 239.5], [0, 0, 1]])
    rel = se3.compose(pose_cur, se3.inverse(pose_ref))
    R = np.asarray(se3.rotation(rel))
    t = np.asarray(se3.translation(rel))
    n = np.array([0.0, 0.0, 1.0])
    H = K @ (R + np.outer(t, n) / depth_plane_z) @ np.linalg.inv(K)
    # forward map: dst(H x) = src(x) -> cur(y) = ref(H^{-1} y)
    return cv2.warpPerspective(
        img_ref, H.astype(np.float64), (640, 480), flags=cv2.INTER_LINEAR,
    )


def test_image_align_recovers_pose():
    img_ref = make_textured_image(3)
    pose_ref = se3.identity()
    xi_true = jnp.asarray([0.05, -0.03, 0.02, 0.004, -0.006, 0.003], jnp.float32)
    pose_cur = se3.exp(xi_true)
    img_cur = _render_view(img_ref, pose_ref, pose_cur)

    pyr_ref = pyramid.build_pyramid(jnp.asarray(img_ref), levels=5)
    pyr_cur = pyramid.build_pyramid(jnp.asarray(img_cur), levels=5)

    # features on the z=5 plane
    rs = np.random.default_rng(4)
    px = rs.uniform([60, 60], [580, 420], size=(128, 2)).astype(np.float32)
    bearings = camera.unproject(INTR, jnp.asarray(px))
    pts_w = bearings * (5.0 / bearings[:, 2:3])

    res = image_align.compute_pose(
        pyr_ref, pyr_cur, INTR, pts_w, jnp.ones(128, bool),
        pose_ref, se3.identity(), max_level=4, min_level=1, iters=15,
    )
    err = np.asarray(se3.log(se3.compose(res.pose, se3.inverse(pose_cur))))
    assert np.abs(err).max() < 5e-3, f"pose err {err}"


def test_image_align_affine_illumination():
    """Gain/bias drift breaks brightness-constancy alignment; the affine
    photometric model (beyond the reference — image_align.cc has none)
    recovers both the pose and the illumination parameters."""
    img_ref = make_textured_image(7)
    pose_ref = se3.identity()
    xi_true = jnp.asarray([0.04, -0.02, 0.015, 0.003, -0.005, 0.002],
                          jnp.float32)
    pose_cur = se3.exp(xi_true)
    gain, bias = 1.35, 18.0
    img_cur = np.clip(gain * _render_view(img_ref, pose_ref, pose_cur) + bias,
                      0, 255)

    pyr_ref = pyramid.build_pyramid(jnp.asarray(img_ref), levels=5)
    pyr_cur = pyramid.build_pyramid(jnp.asarray(img_cur), levels=5)

    rs = np.random.default_rng(8)
    px = rs.uniform([60, 60], [580, 420], size=(128, 2)).astype(np.float32)
    bearings = camera.unproject(INTR, jnp.asarray(px))
    pts_w = bearings * (5.0 / bearings[:, 2:3])

    kw = dict(max_level=4, min_level=1, iters=15)
    plain = image_align.compute_pose(
        pyr_ref, pyr_cur, INTR, pts_w, jnp.ones(128, bool),
        pose_ref, se3.identity(), **kw)
    affine = image_align.compute_pose(
        pyr_ref, pyr_cur, INTR, pts_w, jnp.ones(128, bool),
        pose_ref, se3.identity(), affine_illum=True, **kw)

    err_plain = np.abs(np.asarray(
        se3.log(se3.compose(plain.pose, se3.inverse(pose_cur))))).max()
    err_affine = np.abs(np.asarray(
        se3.log(se3.compose(affine.pose, se3.inverse(pose_cur))))).max()
    assert err_affine < 5e-3, f"affine pose err {err_affine}"
    assert err_affine < err_plain, (err_affine, err_plain)
    a, b = np.asarray(affine.illum)
    assert abs((1.0 + a) - gain) < 0.05, f"gain estimate {1 + a} vs {gain}"
    assert abs(b - bias) < 5.0, f"bias estimate {b} vs {bias}"
    # the residual with the photometric model must beat brightness-constancy
    assert float(affine.error) < 0.5 * float(plain.error)


def test_pose_irls_with_outliers():
    rs = np.random.default_rng(5)
    pts = rs.uniform([-2, -2, 3], [2, 2, 10], size=(128, 3)).astype(np.float32)
    pose_true = se3.exp(jnp.asarray([0.1, -0.05, 0.02, 0.03, 0.01, -0.02]))
    uv = camera.project_unit_plane(se3.transform(pose_true, jnp.asarray(pts)))
    uv = np.array(uv)
    uv += rs.normal(0, 0.2 / 420.0, size=uv.shape)  # ~0.2px noise
    outliers = rs.random(128) < 0.2
    uv[outliers] += rs.uniform(-0.1, 0.1, size=(outliers.sum(), 2))

    res = pose.optimize(
        se3.identity(), jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
        jnp.ones(128, bool), iters=15, inlier_thresh=2.0 / 420.0,
    )
    err = np.asarray(se3.log(se3.compose(res.pose, se3.inverse(pose_true))))
    assert np.abs(err).max() < 2e-3, f"pose err {err}"
    inl = np.asarray(res.inliers)
    assert inl[~outliers].mean() > 0.9
    assert inl[outliers].mean() < 0.3


def test_homography_ransac_and_decomposition():
    rs = np.random.default_rng(6)
    # plane z=4 in frame a, normal +z
    uv_a = rs.uniform(-0.5, 0.5, size=(96, 2)).astype(np.float32)
    pts_a = np.concatenate([uv_a * 4.0, np.full((96, 1), 4.0)], axis=1)
    xi = jnp.asarray([0.4, 0.05, 0.1, 0.02, -0.15, 0.03], jnp.float32)
    pose_rel = se3.exp(xi)  # a -> b
    pts_b = np.asarray(se3.transform(pose_rel, jnp.asarray(pts_a.astype(np.float32))))
    uv_b = (pts_b[:, :2] / pts_b[:, 2:3]).astype(np.float32)
    # outliers
    uv_b_noisy = uv_b.copy()
    out = rs.random(96) < 0.15
    uv_b_noisy[out] += rs.uniform(-0.2, 0.2, size=(out.sum(), 2))

    H, inl = homography.ransac_homography(
        jnp.asarray(uv_a), jnp.asarray(uv_b_noisy), jnp.ones(96, bool),
        jax.random.PRNGKey(0), thresh=1.5 / 420.0,
    )
    inl = np.asarray(inl)
    assert inl[~out].mean() > 0.9
    assert inl[out].mean() < 0.2

    dec = homography.decompose_homography(H)
    pose_est, votes = homography.choose_decomposition(
        dec, jnp.asarray(uv_a), jnp.asarray(uv_b), jnp.asarray((~out).astype(np.float32))
    )
    # translation direction (up to scale) and rotation should match
    R_est = np.asarray(se3.rotation(pose_est))
    R_true = np.asarray(se3.rotation(pose_rel))
    t_est = np.asarray(se3.translation(pose_est))
    t_true = np.asarray(se3.translation(pose_rel))
    t_true = t_true / np.linalg.norm(t_true)
    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(R_est @ R_true.T) - 1) / 2, -1, 1))
    )
    assert rot_err < 1.0, f"rotation error {rot_err} deg"
    assert np.abs(np.dot(t_est, t_true)) > 0.99, (t_est, t_true)


def _make_ba_problem(rs, K=6, P=128, noise=0.3 / 420.0, drop=0.2):
    pts = rs.uniform([-3, -3, 4], [3, 3, 12], size=(P, 3)).astype(np.float32)
    poses = []
    for k in range(K):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.4 * k / K
        xi[4] = 0.02 * rs.standard_normal()
        poses.append(np.asarray(se3.exp(jnp.asarray(xi))))
    poses = np.stack(poses)
    p_cam = np.asarray(
        se3.transform(jnp.asarray(poses)[None, :, :], jnp.asarray(pts)[:, None, :])
    )
    uv = p_cam[..., :2] / p_cam[..., 2:3]
    mask = rs.random((P, K)) > drop
    mask[:, 0] = True
    uv_noisy = uv + rs.normal(0, noise, size=uv.shape)
    return pts, poses, uv_noisy.astype(np.float32), mask


def test_ba_reduces_error_and_respects_fixed():
    rs = np.random.default_rng(7)
    # low measurement noise so the monocular depth noise-floor stays well
    # under the recovery thresholds asserted below
    pts, poses_true, uv, mask = _make_ba_problem(rs, noise=0.05 / 420.0)
    K, P = 6, 128
    # perturb initial estimates
    poses0 = np.array(
        se3.compose(
            jax.vmap(se3.exp)(jnp.asarray(rs.normal(0, 0.01, (K, 6)), jnp.float32)),
            jnp.asarray(poses_true),
        )
    )
    # two fixed cameras pin the full 7-dof monocular gauge incl. scale
    poses0[0] = poses_true[0]
    poses0[1] = poses_true[1]
    pts0 = pts + rs.normal(0, 0.05, pts.shape).astype(np.float32)

    problem = ba.BAProblem(
        poses=jnp.asarray(poses0),
        fixed=jnp.asarray([True, True] + [False] * (K - 2)),
        points=jnp.asarray(pts0),
        obs_uv=jnp.asarray(uv),
        obs_mask=jnp.asarray(mask),
    )
    res = ba.solve(problem, huber=jnp.sqrt(5.991) / 420.0,
                   gate_thresh=np.sqrt(5.991) / 420.0 * 2)

    # fixed pose unchanged
    np.testing.assert_allclose(np.asarray(res.poses)[0], poses_true[0], atol=1e-6)

    # pose error reduced vs initial perturbation
    def pose_errs(ps):
        d = se3.log(se3.compose(jnp.asarray(ps), se3.inverse(jnp.asarray(poses_true))))
        return np.abs(np.asarray(d)).max(axis=1)

    err0 = pose_errs(poses0)[2:].mean()
    err1 = pose_errs(np.asarray(res.poses))[2:].mean()
    assert err1 < err0 * 0.5, (err0, err1)

    # reprojection residual small
    r = np.asarray(res.points) - pts
    assert np.abs(r).mean() < 0.05


def test_ba_gates_outlier_observations():
    rs = np.random.default_rng(8)
    pts, poses_true, uv, mask = _make_ba_problem(rs, noise=0.2 / 420.0)
    # corrupt 5% of observations badly
    P, K = mask.shape
    bad = (rs.random((P, K)) < 0.05) & mask
    uv[bad] += 0.1
    problem = ba.BAProblem(
        poses=jnp.asarray(poses_true),
        fixed=jnp.asarray([True] + [False] * (K - 1)),
        points=jnp.asarray(pts + rs.normal(0, 0.02, pts.shape).astype(np.float32)),
        obs_uv=jnp.asarray(uv),
        obs_mask=jnp.asarray(mask),
    )
    res = ba.solve(problem, huber=np.sqrt(5.991) / 420.0)
    inl = np.asarray(res.inlier_mask)
    assert inl[bad].mean() < 0.2, f"outliers kept: {inl[bad].mean()}"
    assert inl[mask & ~bad].mean() > 0.9


def test_pose_ransac_rejects_gross_outliers():
    """Vmapped 5-point RANSAC (reference SelectInliers,
    feature_align.cc:152-216) recovers the pose when 30% of matches are
    garbage — the case plain IRLS can be dragged away by."""
    import jax

    from sdvl_tpu.core import camera as cam
    from sdvl_tpu.core import se3
    from sdvl_tpu.solvers import pose as pose_opt

    rs = np.random.default_rng(3)
    N = 120
    pts = jnp.asarray(rs.uniform([-2, -2, 3], [2, 2, 8], (N, 3)),
                      jnp.float32)
    pose_true = se3.exp(jnp.asarray([0.08, -0.05, 0.02, 0.01, -0.02, 0.015],
                                    jnp.float32))
    uv = cam.project_unit_plane(se3.transform(pose_true, pts))
    # 30% gross outliers
    n_out = N * 3 // 10
    uv = uv.at[:n_out].add(
        jnp.asarray(rs.uniform(0.05, 0.3, (n_out, 2)) *
                    rs.choice([-1, 1], (n_out, 2)), jnp.float32)
    )
    valid = jnp.ones(N, bool)
    pose_r = pose_opt.ransac(
        se3.identity(), pts, uv, valid, jax.random.PRNGKey(0),
        inlier_thresh=2.0 / 500.0,
    )
    # consensus pose classifies the outliers correctly
    p_cam = se3.transform(pose_r, pts)
    r = jnp.linalg.norm(uv - cam.project_unit_plane(p_cam), axis=-1)
    inl = r < 2.0 / 500.0
    assert not bool(inl[:n_out].any()), "outliers accepted"
    assert float(inl[n_out:].mean()) > 0.95
    err = np.linalg.norm(np.asarray(se3.log(
        se3.compose(pose_r, se3.inverse(pose_true)))))
    assert err < 5e-3, err
