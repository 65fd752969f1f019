"""ORB-style rotated-BRIEF descriptors and Hamming matching, batched.

TPU-native replacement for the reference's ORBDetector (reference
extra/orb_detector.{h,cc}): intensity-centroid orientation over a 31px
circular patch (orb_detector.cc:412-437), a 256-pair rotated binary test
(orb_detector.cc:350-395) and SWAR-popcount Hamming distance
(orb_detector.cc:398-410).

Design departures (deliberate — behavioral parity, not bit parity):
  * The reference embeds OpenCV's learned 256-pair table. We generate our own
    deterministic Gaussian pair pattern (classic BRIEF construction, seeded)
    at import time; descriptors only ever match against descriptors produced
    by this module, so self-consistency is what matters.
  * Descriptors are (N, 256) bit tensors packed as (N, 8) uint32 lanes;
    Hamming distance is a popcount-matmul over candidate pairs instead of a
    byte-wise scalar loop.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import interp

PATCH_RADIUS = 15  # 31x31 patch, as the reference (Config::ORBSize = 31)
N_BITS = 256


@functools.lru_cache(maxsize=8)
def _make_pattern(radius: int = PATCH_RADIUS, seed: int = 7) -> np.ndarray:
    """(256, 4) float32 of (x1, y1, x2, y2) test pairs, N(0, (r/5)^2)
    clipped to the patch — the original BRIEF-II sampling scheme. Cached
    per radius (``SDVL.orb_size`` knob, config.cc orb_size_)."""
    rs = np.random.RandomState(seed)
    sigma = radius / 5.0 * 2.0
    pts = rs.normal(0.0, sigma, size=(N_BITS, 4))
    return np.clip(pts, -radius + 1, radius - 1).astype(np.float32)


# In-circle offsets for the orientation moments (the reference's u_max rows,
# orb_detector.cc:45-60, enumerate exactly these pixels). Static host table:
# only ~72% of the bounding square is inside the circle — gathering just the
# in-circle taps saves 28% of the dominant gather cost.
# Host (numpy) constants: these are closed over by jitted code, and
# closure-captured DEVICE arrays poison this TPU runtime (they also traced
# to separate executable-attached buffers; numpy traces to HLO literals).
@functools.lru_cache(maxsize=8)
def _circle_offsets(r: int) -> np.ndarray:
    d = np.arange(-r, r + 1)
    oy, ox = np.meshgrid(d, d, indexing="ij")
    keep = (ox * ox + oy * oy) <= r * r
    return np.stack([ox[keep], oy[keep]], axis=-1).astype(np.float32)


def orientations(img: jnp.ndarray, centers: jnp.ndarray,
                 radius: int = PATCH_RADIUS) -> jnp.ndarray:
    """Intensity-centroid orientation (radians) at each center (N, 2).

    Mirrors reference GetOrientation (orb_detector.cc:412-437): moments m01,
    m10 over the circular ``2*radius+1`` px patch; angle = atan2(m01, m10).
    Taps are integer pixels (one flat gather), exactly like the reference's
    ``at<uchar>`` reads.
    """
    circle = _circle_offsets(radius)
    pos = centers[:, None, :] + circle[None]           # (N, M, 2)
    vals = interp.nearest(img, pos)                    # (N, M)
    m10 = vals @ circle[:, 0]
    m01 = vals @ circle[:, 1]
    return jnp.arctan2(m01, m10)


def descriptors(img: jnp.ndarray, centers: jnp.ndarray,
                angles: jnp.ndarray | None = None,
                radius: int = PATCH_RADIUS) -> jnp.ndarray:
    """Rotated-BRIEF descriptors, (N, 8) uint32 (256 bits).

    Test pairs are rotated by the patch orientation (steered BRIEF,
    reference orb_detector.cc:350-395) and read at integer pixels — one flat
    gather over both endpoints of all 256 tests, matching the reference's
    rounded ``at<uchar>`` reads. ``radius`` = ``orb_size // 2``.
    """
    if angles is None:
        angles = orientations(img, centers, radius=radius)
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    pts = _make_pattern(radius).reshape(N_BITS * 2, 2)  # both endpoints
    x = pts[None, :, 0] * ca[:, None] - pts[None, :, 1] * sa[:, None]
    y = pts[None, :, 0] * sa[:, None] + pts[None, :, 1] * ca[:, None]
    pos = centers[:, None, :] + jnp.stack([x, y], axis=-1)  # (N, 512, 2)
    v = interp.nearest(img, pos).reshape(-1, N_BITS, 2)
    bits = (v[..., 0] < v[..., 1]).astype(jnp.uint32)  # (N, 256)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, 8, 32) << shifts[None, None, :]
    return jnp.sum(words, axis=-1).astype(jnp.uint32)


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """Branch-free SWAR popcount on uint32 lanes (the reference does the
    same trick per byte-pair, orb_detector.cc:398-410)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise-broadcast Hamming distance between (…, 8) uint32 descriptors."""
    return jnp.sum(_popcount32(jnp.bitwise_xor(a, b)), axis=-1)


def hamming_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(Na, Nb) all-pairs Hamming distances."""
    return hamming(a[:, None, :], b[None, :, :])
