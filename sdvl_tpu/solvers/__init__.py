"""Estimation algorithms (reference layer L4: image_align, feature_align,
matcher's LK, homography_init, bundle+g2o). Batched GN/LM/IRLS/RANSAC."""

from . import lk, image_align, pose, ba, homography  # noqa: F401
