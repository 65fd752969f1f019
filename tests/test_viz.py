"""Headless visualization tests (reference UI equivalent)."""

import numpy as np

from sdvl_tpu.viz import draw_frame_overlay, plot_map, plot_trajectory


def test_overlay_colors_and_tint():
    img = np.full((120, 160), 100.0, np.float32)
    px = np.array([[40.0, 30.0], [80.0, 60.0], [150.0, 110.0]])
    ok = np.array([True, False, True])
    rgb = draw_frame_overlay(img, px, ok, quality="GOOD")
    assert rgb.shape == (120, 160, 3) and rgb.dtype == np.uint8
    # green ring around the matched feature, red around the missed one
    assert (rgb[30, 37] == [0, 255, 0]).all()
    assert (rgb[60, 77] == [255, 0, 0]).all()
    tinted = draw_frame_overlay(img, px, ok, quality="BAD")
    assert tinted[..., 0].mean() > rgb[..., 0].mean()
    # near-border feature must not crash and must draw its in-bounds ring
    assert (rgb[110, 153] == [0, 255, 0]).all()


def test_overlay_skips_unattempted():
    img = np.zeros((50, 50), np.float32)
    px = np.array([[25.0, 25.0]])
    rgb = draw_frame_overlay(img, px, np.array([True]),
                             attempted=np.array([False]))
    assert (rgb == 0).all()


def test_scene_plots_write_files(tmp_path):
    from sdvl_tpu.io.synthetic import PlaneScene
    from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
    from sdvl_tpu.pipeline.sdvl import SDVL

    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=320, height=240, plane_z=4.0)
    cfg = Config(
        camera=CameraConfig(width=320, height=240, fx=210.0, fy=210.0,
                            u0=159.5, v0=119.5, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(min_avg_shift=5.0, max_keyframes=10,
                        min_keyframe_its=5, min_init_corners=30,
                        max_points=512, max_candidates=256, map_scale=4.0),
    )
    slam = SDVL(cfg, seed=0)
    poses = scene.trajectory(10)
    for p in poses:
        slam.handle_frame(scene.render(p))

    mp = tmp_path / "map.png"
    plot_map(slam.m, slam.trajectory, path=str(mp))
    assert mp.exists() and mp.stat().st_size > 2000

    tp = tmp_path / "traj.png"
    est = [p for _, p in slam.trajectory]
    plot_trajectory(est, gt_poses_wc=poses, path=str(tp))
    assert tp.exists() and tp.stat().st_size > 2000


def test_recorder_in_loop(tmp_path):
    from sdvl_tpu.io.synthetic import PlaneScene
    from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
    from sdvl_tpu.pipeline.sdvl import SDVL
    from sdvl_tpu.viz import VizRecorder

    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=320, height=240, plane_z=4.0)
    cfg = Config(
        camera=CameraConfig(width=320, height=240, fx=210.0, fy=210.0,
                            u0=159.5, v0=119.5, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(min_avg_shift=5.0, max_keyframes=10,
                        min_keyframe_its=5, min_init_corners=30,
                        max_points=512, max_candidates=256, map_scale=4.0),
    )
    slam = SDVL(cfg, seed=0)
    rec = VizRecorder(str(tmp_path), every=4)
    for p in scene.trajectory(12):
        img = scene.render(p)
        info = slam.handle_frame(img)
        rec.record(slam, img, info)
    overlays = list(tmp_path.glob("frame_*.png"))
    maps = list(tmp_path.glob("map_*.png"))
    assert maps, "no map figures written"
    assert overlays, "no overlays written (RUNNING frames hit the cadence)"


def test_render_stream_session(tmp_path):
    """Post-run renderer for the device-FSM stream driver."""
    import numpy as np

    from sdvl_tpu.io.synthetic import PlaneScene
    from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
    from sdvl_tpu.pipeline.stream import SdvlStream
    from sdvl_tpu.viz import render_stream_session

    scene = PlaneScene(fx=120.0, fy=120.0, cx=79.5, cy=63.5,
                       width=160, height=128, plane_z=4.0)
    cfg = Config(
        camera=CameraConfig(width=160, height=128, fx=120.0, fy=120.0,
                            u0=79.5, v0=63.5, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(cell_size=16, min_avg_shift=3.0, max_keyframes=6,
                        min_keyframe_its=5, min_init_corners=15,
                        min_matches=8, max_points=256, max_candidates=64,
                        map_scale=4.0),
    )
    frames = [scene.render(p)
              for p in scene.trajectory(14, translation_amp=1.2)]
    st = SdvlStream(cfg, seed=0)
    for f in frames:
        st.feed(f)
    r = st.result()
    out = str(tmp_path / "viz")
    render_stream_session(st, r, frames, out_dir=out, every=5)
    import os

    names = sorted(os.listdir(out))
    assert "trajectory.png" in names and "map_final.png" in names
    assert any(n.startswith("frame_") for n in names)
