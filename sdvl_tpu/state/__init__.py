"""Fixed-capacity masked SoA state (reference layer L3: frame, feature,
point, map stores). Pytrees with static shapes; no pointer graphs."""

from .map_state import MapState, FrameState, alloc_slots  # noqa: F401
