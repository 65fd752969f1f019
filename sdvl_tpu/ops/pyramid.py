"""Image pyramid construction as XLA convolutions.

TPU-native replacement for the reference's per-frame ``cv::pyrDown`` loop
(reference frame.cc:114-120: 5 half-resolution levels). One separable 5-tap
binomial blur + 2x decimation per level, expressed as depthwise convs so XLA
fuses and pipelines them; no host round-trips.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# Binomial 5-tap kernel — the same kernel cv::pyrDown uses.
_K5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0


def _blur_downsample(img: jnp.ndarray) -> jnp.ndarray:
    """Gaussian blur + take every 2nd pixel, mirroring pyrDown semantics
    (REFLECT_101 borders, even output size = ceil(n/2))."""
    f = img[None, None, :, :]  # NCHW
    pad = [(0, 0), (0, 0), (2, 2), (2, 2)]
    f = jnp.pad(f, pad, mode="reflect")
    kv = _K5.reshape(1, 1, 5, 1)
    kh = _K5.reshape(1, 1, 1, 5)
    f = jax.lax.conv_general_dilated(
        f, kv, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    f = jax.lax.conv_general_dilated(
        f, kh, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return f[0, 0, ::2, ::2]


def build_pyramid(img: jnp.ndarray, levels: int = 5) -> list:
    """Return ``levels`` images, level 0 = input (H, W) f32.

    Shapes halve exactly per level; callers must supply H, W divisible by
    ``2**(levels-1)`` (the pipeline crops frames once at ingest to guarantee
    it — static shapes are what keep everything jittable).
    """
    out = [img.astype(jnp.float32)]
    for _ in range(1, levels):
        out.append(_blur_downsample(out[-1]))
    return out


def gradient(img: jnp.ndarray):
    """Central-difference gradients (dx, dy), same shape as img, via convs.

    Replaces the reference's per-pixel half-sample differences
    (image_align.cc:240-255) when a dense gradient image is cheaper than
    scattered sampling (e.g. Shi-Tomasi maps).
    """
    f = img[None, None].astype(jnp.float32)
    kx = jnp.array([[-0.5, 0.0, 0.5]], jnp.float32).reshape(1, 1, 1, 3)
    ky = jnp.array([[-0.5], [0.0], [0.5]], jnp.float32).reshape(1, 1, 3, 1)
    fp = jnp.pad(f, [(0, 0), (0, 0), (0, 0), (1, 1)], mode="edge")
    dx = jax.lax.conv_general_dilated(
        fp, kx, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    fp = jnp.pad(f, [(0, 0), (0, 0), (1, 1), (0, 0)], mode="edge")
    dy = jax.lax.conv_general_dilated(
        fp, ky, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return dx[0, 0], dy[0, 0]
