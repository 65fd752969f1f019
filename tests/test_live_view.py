"""Live-viewer rendering paths, exercised headless.

The interactive windows (reference ui/ui.cc + Pangolin drawscene.cc) can't
open in CI; everything that draws is a pure array->array function, so the
scene renderer, the orbit camera, and the follow-mode retarget are tested
directly. Window plumbing is gated behind LiveUI.available().
"""

import jax.numpy as jnp
import numpy as np

from sdvl_tpu.core import se3
from sdvl_tpu.state.map_state import empty_map
from sdvl_tpu.viz.live import (LiveUI, Viewpoint, _frustum_corners,
                               project_view, render_scene_view)


def _toy_map():
    m = empty_map(n_kf=3, n_pts=64, n_cand=16, img_shape=(64, 96), levels=3)
    rs = np.random.default_rng(0)
    pts = jnp.asarray(rs.uniform([-2, -2, 1], [2, 2, 5],
                                 (64, 3)).astype(np.float32))
    pose1 = se3.exp(jnp.asarray([0.4, 0, 0, 0, 0.1, 0], jnp.float32))
    m = m._replace(
        pt_pos=pts, pt_valid=jnp.ones(64, bool),
        kf_valid=m.kf_valid.at[:2].set(True),
        kf_pose=m.kf_pose.at[1].set(pose1),
        cand_valid=m.cand_valid.at[:8].set(True),
        cand_bearing=m.cand_bearing.at[:].set(
            jnp.asarray([0.0, 0.0, 1.0], jnp.float32)),
        cand_rho=m.cand_rho.at[:].set(0.3),
        cand_sigma2=m.cand_sigma2.at[:].set(0.01),
    )
    return m


def test_render_scene_view_draws_geometry():
    m = _toy_map()
    traj = [(i, np.asarray(se3.exp(jnp.asarray(
        [0.1 * i, 0, 0, 0, 0, 0], jnp.float32)))) for i in range(5)]
    img = render_scene_view(m, traj, Viewpoint(), cur_pose=traj[-1][1])
    assert img.shape == (480, 640, 3) and img.dtype == np.uint8
    # something was drawn over the background (points, frusta, grid)
    background = np.full(3, 18, np.uint8)
    assert (img != background).any(axis=-1).mean() > 0.005


def test_viewpoint_orbit_and_projection():
    vp = Viewpoint(target=(0, 0, 2), dist=5.0, yaw=0.0, pitch=0.0)
    px, front = project_view(vp, np.array([[0.0, 0.0, 2.0]]))
    assert front[0]
    # the target projects to the image center
    np.testing.assert_allclose(px[0], [320, 240], atol=1)
    # yawing moves the projection; zooming keeps the target centered
    vp.yaw = 0.5
    px2, _ = project_view(vp, np.array([[1.0, 0.0, 2.0]]))
    assert (px2[0] != px[0]).any()
    vp.dist = 2.0
    px3, front3 = project_view(vp, np.array([[0.0, 0.0, 2.0]]))
    assert front3[0] and abs(int(px3[0][0]) - 320) <= 1


def test_follow_mode_retargets_to_camera():
    m = _toy_map()
    vp = Viewpoint(target=(99.0, 99.0, 99.0))
    pose = se3.exp(jnp.asarray([1.0, 2.0, 0.5, 0, 0, 0], jnp.float32))
    render_scene_view(m, None, vp, cur_pose=np.asarray(pose))
    cam = -np.asarray(pose)[4:]  # identity rotation: center = -t
    np.testing.assert_allclose(vp.target, cam, atol=1e-5)


def test_frustum_glyph_is_anchored_at_camera_center():
    pose = se3.exp(jnp.asarray([0.3, -0.2, 0.1, 0, 0, 0], jnp.float32))
    fr = _frustum_corners(np.asarray(pose))
    assert fr.shape == (5, 3)
    np.testing.assert_allclose(fr[0], -np.asarray(pose)[4:], atol=1e-5)
    # image-plane corners sit in front of the center along the optical axis
    assert (np.linalg.norm(fr[1:] - fr[0], axis=-1) > 0.1).all()


def test_liveui_unavailable_headless(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    assert LiveUI.available() is False
