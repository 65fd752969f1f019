"""Math & geometry primitives (reference layer L0/L1: extra/se3, extra/utils,
camera). Pure-functional, batched, vmappable."""

from . import se3, camera, geometry  # noqa: F401
