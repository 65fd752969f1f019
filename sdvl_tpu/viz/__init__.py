"""Headless visualization (reference layer L6 UI equivalent).

The reference ships an interactive OpenCV window + Pangolin 3D viewer
(reference ui/ui.{h,cc}, ui/drawimage.{h,cc}, ui/drawscene.{h,cc}); a
TPU-serving deployment is headless, so the equivalent here renders to
files: per-frame feature overlays, and map/trajectory figures.
"""

from .overlay import draw_frame_overlay  # noqa: F401
from .scene import plot_map, plot_trajectory  # noqa: F401
from .recorder import VizRecorder, render_stream_session  # noqa: F401
from .live import LiveUI, Viewpoint, render_scene_view  # noqa: F401
