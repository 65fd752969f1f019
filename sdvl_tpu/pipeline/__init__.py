"""Pipeline orchestration (reference layer L5: sdvl, map; plus matcher and
homography glue). Host FSM over jitted MapState transformers."""

from .config import Config, SdvlConfig, CameraConfig, load_cfg  # noqa: F401
from .sdvl import SDVL, TrackingState, TrackingQuality  # noqa: F401
