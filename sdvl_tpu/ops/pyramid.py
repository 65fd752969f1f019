"""Image pyramid construction as shift-add stencils on the VPU.

TPU-native replacement for the reference's per-frame ``cv::pyrDown`` loop
(reference frame.cc:114-120: 5 half-resolution levels). One separable 5-tap
binomial blur + 2x decimation per level.

Implementation note: these stencils are written as padded-slice shift-adds
with *Python-scalar* taps, NOT ``lax.conv`` with a device-array kernel.
Root cause (established by controlled bisect): jitted programs that
closure-capture a DEVICE-resident array (as the old module-level
``jnp.asarray`` kernel was) poison this TPU runtime session-wide into a
~30 ms/launch synchronous mode and can take minutes to compile; numpy/
Python constants trace to inlined HLO literals and are clean. Shift-adds
with scalar weights are also simply the right shape for the VPU — a C=1
stencil has nothing for the MXU to contract.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# Binomial 5-tap kernel — the same kernel cv::pyrDown uses.
_K5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _sep_filter(img: jnp.ndarray, taps, mode: str = "reflect") -> jnp.ndarray:
    """Separable odd-length filter via padded slices (no conv)."""
    r = len(taps) // 2
    H, W = img.shape
    p = jnp.pad(img, ((r, r), (0, 0)), mode=mode)
    v = sum(w * p[i : i + H] for i, w in enumerate(taps))
    p = jnp.pad(v, ((0, 0), (r, r)), mode=mode)
    return sum(w * p[:, i : i + W] for i, w in enumerate(taps))


def _blur_downsample(img: jnp.ndarray) -> jnp.ndarray:
    """Gaussian blur + take every 2nd pixel, mirroring pyrDown semantics
    (REFLECT_101 borders, even output size = ceil(n/2))."""
    return _sep_filter(img, _K5)[::2, ::2]


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
    """Central-difference gradients (dx, dy), same shape as img.

    Replaces the reference's per-pixel half-sample differences
    (image_align.cc:240-255) when a dense gradient image is cheaper than
    scattered sampling (e.g. Shi-Tomasi maps). Shift-add, not conv — see
    module docstring.
    """
    f = img.astype(jnp.float32)
    H, W = f.shape
    px = jnp.pad(f, ((0, 0), (1, 1)), mode="edge")
    dx = 0.5 * (px[:, 2:] - px[:, :-2])
    py = jnp.pad(f, ((1, 1), (0, 0)), mode="edge")
    dy = 0.5 * (py[2:] - py[:-2])
    return dx, dy
