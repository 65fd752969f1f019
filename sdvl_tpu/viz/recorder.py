"""Session recorder: dump overlays + map figures while a run progresses.

The async, snapshot-under-lock UI thread of the reference (ui/ui.cc:49-85
at 10 Hz) becomes a simple cadence recorder — pure host-side work on data
the FSM already pulled, zero device round-trips added.
"""

from __future__ import annotations

import os

import numpy as np

from .overlay import draw_frame_overlay
from .scene import plot_map


class VizRecorder:
    """Attach to an SDVL session loop; writes PNGs every ``every`` frames."""

    def __init__(self, out_dir: str, every: int = 10, overlays: bool = True,
                 maps: bool = True):
        self.out_dir = out_dir
        self.every = max(1, every)
        self.overlays = overlays
        self.maps = maps
        os.makedirs(out_dir, exist_ok=True)

    def record(self, slam, img: np.ndarray, info: dict) -> None:
        fid = info["frame_id"]
        if fid % self.every:
            return
        if self.overlays and info.get("match_px") is not None:
            rgb = draw_frame_overlay(
                img[: slam.crop_h, : slam.crop_w],
                info["match_px"], info["match_ok"],
                attempted=info.get("match_attempted"),
                quality=slam.quality.name,
            )
            self._save_png(os.path.join(self.out_dir,
                                        f"frame_{fid:06d}.png"), rgb)
        if self.maps:
            plot_map(slam.m, slam.trajectory,
                     path=os.path.join(self.out_dir, f"map_{fid:06d}.png"))

    @staticmethod
    def _save_png(path: str, rgb: np.ndarray) -> None:
        try:
            import cv2

            cv2.imwrite(path, rgb[..., ::-1])
        except ImportError:  # matplotlib fallback
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.imsave(path, rgb)


def render_stream_session(stream, result, frames=None, out_dir: str = "viz",
                          every: int = 10) -> None:
    """Post-run visualization for a device-FSM stream session.

    The stream driver never pulls per-frame data mid-run (that would poison
    the TPU runtime's launch latency — pipeline/device_fsm.py), so instead
    of recording live like :class:`VizRecorder`, this renders everything
    after :meth:`SdvlStream.result`:

      * ``trajectory.png`` + ``map_final.png`` from the final MapState,
      * per-frame overlays every ``every`` frames (if the original frames
        are provided) with the final map points reprojected through each
        recorded pose — the post-hoc equivalent of DrawImage's live feature
        dots (ui/drawimage.cc:53-94).
    """
    import numpy as np

    from ..core import se3
    from .scene import plot_map, plot_trajectory

    os.makedirs(out_dir, exist_ok=True)
    traj = [(i, result.trajectory[i]) for i in range(result.n_frames)]
    plot_trajectory(result.trajectory,
                    path=os.path.join(out_dir, "trajectory.png"))
    plot_map(stream.m, traj, path=os.path.join(out_dir, "map_final.png"))

    if frames is None:
        return
    pts = np.asarray(stream.m.pt_pos)[np.asarray(stream.m.pt_valid)]
    if not len(pts):
        return
    import jax.numpy as jnp

    from ..pipeline.config import intrinsics

    intr = intrinsics(stream.cfg)
    fx, fy = float(intr.fx), float(intr.fy)
    cx, cy = float(intr.cx), float(intr.cy)
    for i in range(0, min(len(frames), result.n_frames), max(1, every)):
        if result.states[i] != 2:
            continue
        pose = np.asarray(result.trajectory[i], np.float64)
        w, x, y, z = pose[:4] / np.linalg.norm(pose[:4])
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        p_cam = pts @ R.T + pose[4:]
        zok = p_cam[:, 2] > 1e-3
        px = np.stack([
            fx * p_cam[:, 0] / np.maximum(p_cam[:, 2], 1e-6) + cx,
            fy * p_cam[:, 1] / np.maximum(p_cam[:, 2], 1e-6) + cy,
        ], -1)
        H, W = stream.crop_h, stream.crop_w
        inb = zok & (px[:, 0] >= 0) & (px[:, 0] < W) & (px[:, 1] >= 0) & (px[:, 1] < H)
        rgb = draw_frame_overlay(
            np.asarray(frames[i])[:H, :W], px[inb],
            np.ones(int(inb.sum()), bool),
        )
        VizRecorder._save_png(
            os.path.join(out_dir, f"frame_{i:06d}.png"), rgb
        )
