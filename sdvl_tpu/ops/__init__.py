"""Image-processing kernels (reference layer L2: fast_detector, orb_detector,
pyramid/undistort, patch warp/score). Dense, batched, XLA/Pallas-compiled."""

from . import interp, pyramid, fast, patch, orb  # noqa: F401
