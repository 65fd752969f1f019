"""Tests for the C++ prefetching frame loader (ctypes boundary)."""

import os

import cv2
import numpy as np
import pytest

from sdvl_tpu.io import native_loader


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rs = np.random.default_rng(0)
    paths = []
    for i in range(12):
        img = rs.integers(0, 255, (48, 64), dtype=np.uint8)
        ext = ["png", "jpg", "pgm"][i % 3]
        p = str(d / f"frame_{i:03d}.{ext}")
        cv2.imwrite(p, img)
        paths.append((p, img))
    return paths


def test_builds():
    assert native_loader.ensure_built(), "native lib failed to build"


def test_decodes_all_formats_correctly(image_dir):
    paths = [p for p, _ in image_dir]
    loader = native_loader.NativeFrameLoader(paths, width=64, height=48)
    frames = list(loader)
    assert len(frames) == 12
    for (p, orig), got in zip(image_dir, frames):
        assert got.shape == (48, 64)
        if p.endswith(".jpg"):
            # lossy: statistically close
            assert np.abs(got - orig.astype(np.float32)).mean() < 6.0, p
        else:
            np.testing.assert_allclose(got, orig.astype(np.float32),
                                       atol=1.0, err_msg=p)


def test_skips_undecodable(image_dir, tmp_path):
    bad = str(tmp_path / "garbage.png")
    with open(bad, "wb") as f:
        f.write(b"not an image at all")
    paths = [image_dir[0][0], bad, image_dir[3][0]]
    loader = native_loader.NativeFrameLoader(paths, width=64, height=48)
    frames = list(loader)
    assert len(frames) == 2


def test_prefetch_depth_smaller_than_sequence(image_dir):
    paths = [p for p, _ in image_dir]
    loader = native_loader.NativeFrameLoader(
        paths, width=64, height=48, prefetch_depth=3, n_threads=3
    )
    assert len(list(loader)) == 12
