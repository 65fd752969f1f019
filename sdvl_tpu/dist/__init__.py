"""Distribution layer: device meshes, sharded/distributed BA, stream-parallel
tracking. No reference analogue (the reference is single-process, §2.3)."""

from . import mesh, ba_sharded  # noqa: F401
