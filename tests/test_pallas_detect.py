"""Pallas fused detect kernel vs the XLA reference implementation.

Runs in interpreter mode on the CPU test backend; the compiled path is
exercised on TPU by the verify drives/bench.
"""

import numpy as np

import jax.numpy as jnp

from sdvl_tpu.ops import fast as fast_ops
from sdvl_tpu.ops.pallas.detect import fast_shi_tomasi_map


def _image(seed=0, shape=(120, 160)):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 50, shape).astype(np.float32)
    # blocky structure for real corners
    for _ in range(40):
        y, x = rng.integers(10, shape[0] - 20), rng.integers(10, shape[1] - 20)
        img[y:y + rng.integers(4, 12), x:x + rng.integers(4, 12)] += rng.uniform(60, 150)
    return np.clip(img, 0, 255)


def test_matches_xla_path_interior():
    img = jnp.asarray(_image())
    got = np.asarray(fast_shi_tomasi_map(img, 10.0, 50.0, interpret=True))

    corner = np.asarray(fast_ops.fast_corner_mask(img, 10.0))
    score = np.asarray(fast_ops.shi_tomasi(img))
    want = np.where(corner & (score > 50.0), score, -np.inf)

    B = 4  # compare interior only (border semantics differ by design)
    g, w = got[B:-B, B:-B], want[B:-B, B:-B]
    mask_agree = (np.isfinite(g) == np.isfinite(w))
    assert mask_agree.mean() > 0.995, mask_agree.mean()
    both = np.isfinite(g) & np.isfinite(w)
    if both.any():
        np.testing.assert_allclose(g[both], w[both], rtol=1e-4, atol=1e-2)


def test_border_is_invalid():
    img = jnp.asarray(_image(1))
    got = np.asarray(fast_shi_tomasi_map(img, 10.0, 50.0, interpret=True))
    assert not np.isfinite(got[:3, :]).any()
    assert not np.isfinite(got[:, -3:]).any()


def test_grid_selection_equivalent():
    """End-to-end: per-cell winners from the pallas map match the XLA
    detect_level winners on interior cells."""
    img = jnp.asarray(_image(2))
    ref = fast_ops.detect_level(img, 0, cell=32, fast_threshold=10.0,
                                st_threshold=50.0)
    smap = fast_shi_tomasi_map(img, 10.0, 50.0, interpret=True)
    xy, best, valid = fast_ops._grid_best(smap, jnp.isfinite(smap), 32)
    valid = np.asarray(valid & (best > 50.0))
    ref_valid = np.asarray(ref.valid)
    agree = (valid == ref_valid)
    assert agree.mean() > 0.9, agree.mean()
    same = valid & ref_valid
    if same.any():
        d = np.linalg.norm(np.asarray(xy)[same] - np.asarray(ref.xy)[same],
                           axis=-1)
        assert (d < 4.0).mean() > 0.9, d
