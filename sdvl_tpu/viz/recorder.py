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
