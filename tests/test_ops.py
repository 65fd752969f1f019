"""Tests for sdvl_tpu.ops against OpenCV/NumPy oracles."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvl_tpu.ops import fast, interp, orb, patch, pyramid


@pytest.fixture(scope="module")
def test_img(rng=None):
    rs = np.random.default_rng(3)
    img = rs.uniform(0, 64, size=(128, 160)).astype(np.float32)
    # add some blobs/corners for structure
    for (y, x) in [(30, 40), (60, 100), (90, 30), (40, 130)]:
        img[y : y + 12, x : x + 12] += 150.0
    return cv2.GaussianBlur(img, (5, 5), 1.0)


def test_bilinear_matches_cv2_remap(test_img):
    rs = np.random.default_rng(1)
    xy = rs.uniform([1, 1], [159 - 2, 127 - 2], size=(256, 2)).astype(np.float32)
    ours = np.asarray(interp.bilinear(jnp.asarray(test_img), jnp.asarray(xy)))
    mapx = xy[:, 0].reshape(-1, 1)
    mapy = xy[:, 1].reshape(-1, 1)
    oracle = cv2.remap(test_img, mapx, mapy, cv2.INTER_LINEAR)[:, 0]
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-2)


def test_pyramid_matches_cv2_pyrdown(test_img):
    pyr = pyramid.build_pyramid(jnp.asarray(test_img), levels=3)
    l1 = cv2.pyrDown(test_img)
    l2 = cv2.pyrDown(l1)
    np.testing.assert_allclose(np.asarray(pyr[1]), l1, atol=0.6)
    np.testing.assert_allclose(np.asarray(pyr[2]), l2, atol=1.0)


def test_fast_mask_matches_opencv(test_img):
    thresh = 20
    mask = np.asarray(fast.fast_corner_mask(jnp.asarray(test_img), float(thresh)))
    img8 = np.clip(test_img, 0, 255).astype(np.uint8)
    detector = cv2.FastFeatureDetector_create(
        threshold=thresh, nonmaxSuppression=False
    )
    kps = detector.detect(img8)
    oracle = np.zeros_like(mask)
    for kp in kps:
        x, y = int(round(kp.pt[0])), int(round(kp.pt[1]))
        oracle[y, x] = True
    # Compare away from the border (OpenCV skips a 3px margin; we clamp-pad).
    inner = (slice(4, -4), slice(4, -4))
    ours_in, oracle_in = mask[inner], oracle[inner]
    # float-vs-uint8 rounding makes exact parity impossible; demand >95% IoU
    inter = np.sum(ours_in & oracle_in)
    union = np.sum(ours_in | oracle_in)
    assert union > 0
    assert inter / union > 0.9, f"FAST IoU {inter/union}"


def test_shi_tomasi_ranks_corners(test_img):
    st = np.asarray(fast.shi_tomasi(jnp.asarray(test_img)))
    oracle = cv2.cornerMinEigenVal(test_img, blockSize=4, ksize=3)
    # correlation of rankings over interior pixels
    a = st[5:-5, 5:-5].ravel()
    b = oracle[5:-5, 5:-5].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.85, f"Shi-Tomasi corr {corr}"


def test_detect_pyramid_shapes_and_validity(test_img):
    pyr = pyramid.build_pyramid(jnp.asarray(test_img), levels=3)
    corners = fast.detect_pyramid(pyr, levels=2, cell=32, fast_threshold=15.0,
                                  st_threshold=20.0)
    n0 = (128 // 32) * (160 // 32)
    n1 = (64 // 32) * (80 // 32)
    assert corners.xy.shape == (n0 + n1, 2)
    v = np.asarray(corners.valid)
    assert v.sum() >= 4  # finds the synthetic blobs
    # level-1 corners reported in level-0 coords
    lvl = np.asarray(corners.level)
    xy = np.asarray(corners.xy)
    assert xy[v].max() < 160
    assert (lvl[: n0] == 0).all() and (lvl[n0:] == 1).all()


def test_occupied_cells():
    xy = jnp.asarray([[5.0, 5.0], [100.0, 40.0]])
    valid = jnp.asarray([True, False])
    occ = fast.occupied_cells(xy, valid, height=128, width=160, cell=32)
    occ = np.asarray(occ).reshape(4, 5)
    assert occ[0, 0] and occ.sum() == 1


def test_occupied_cells_border_remnant_locks_nothing():
    """A 240px-tall image with cell=32 has a 224px grid: a feature at
    y=230 sits in the uncovered remnant and must NOT lock the last grid
    row (round-4 advisor: clipping suppressed detectable corners there)."""
    xy = jnp.asarray([[50.0, 230.0], [310.0, 100.0], [-3.0, 10.0]])
    valid = jnp.asarray([True, True, True])
    occ = fast.occupied_cells(xy, valid, height=240, width=320, cell=32)
    occ = np.asarray(occ).reshape(7, 10)
    # only the genuinely in-grid feature (310, 100) locks its cell
    assert occ.sum() == 1 and occ[100 // 32, 310 // 32]


def test_zmssd_prefers_true_match(test_img):
    img = jnp.asarray(test_img)
    ref = interp.extract_patches(img, jnp.asarray([[40.0, 33.0]]), half=4)[0]
    candidates = jnp.asarray([[40.0, 33.0], [42.0, 35.0], [80.0, 90.0]])
    cur = interp.extract_patches(img, candidates, half=4)
    scores = np.asarray(patch.zmssd(ref[None], cur))
    assert scores[0] < scores[1] < scores[2]
    assert scores[0] < 1e-3


def test_warp_patch_identity(test_img):
    img = jnp.asarray(test_img)
    A = jnp.eye(2)[None]
    center = jnp.asarray([[50.0, 60.0]])
    warped = patch.warp_patch(img, A, center, half=4)
    direct = interp.extract_patches(img, center, half=4)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(direct), atol=1e-4)


def test_orb_orientation_tracks_rotation():
    # Structured patch: bright blob right of center -> orientation ~0.
    img = np.zeros((128, 160), np.float32)
    img[60:68, 90:100] = 200.0  # blob to the right of (80, 64)
    img[50:80, 70:74] = 80.0    # vertical bar for texture
    img = cv2.GaussianBlur(img, (7, 7), 2.0)
    c = jnp.asarray([[80.0, 64.0]])
    a0 = float(orb.orientations(jnp.asarray(img), c)[0])
    assert abs(np.degrees(a0)) < 25, f"expected ~0 deg, got {np.degrees(a0)}"
    rot = cv2.getRotationMatrix2D((80, 64), 30.0, 1.0)
    img_rot = cv2.warpAffine(img, rot, (160, 128))
    a1 = float(orb.orientations(jnp.asarray(img_rot), c)[0])
    delta = np.degrees(a1 - a0)
    assert abs(abs(delta) - 30.0) < 10, f"delta {delta}"


def test_orb_rotation_invariance():
    # Rich structured texture around the keypoint so the intensity-centroid
    # orientation is well defined (pure noise has no stable orientation).
    img = np.zeros((128, 160), np.float32)
    img[56:72, 84:104] = 180.0
    img[40:50, 60:80] = 120.0
    img[70:90, 60:70] = 90.0
    img = cv2.GaussianBlur(img, (5, 5), 1.5)
    center = jnp.asarray([[80.0, 64.0]])
    rot = cv2.getRotationMatrix2D((80, 64), 30.0, 1.0)
    img_rot = cv2.warpAffine(img, rot, (160, 128))
    d0 = orb.descriptors(jnp.asarray(img), center)
    d1 = orb.descriptors(jnp.asarray(img_rot), center)
    dist_rot = int(orb.hamming(d0, d1)[0])
    # distance to an unrelated point should be much larger
    d_other = orb.descriptors(jnp.asarray(img), jnp.asarray([[45.0, 45.0]]))
    dist_other = int(orb.hamming(d0, d_other)[0])
    assert dist_rot < 60, f"rotated self-distance {dist_rot}"
    assert dist_other > dist_rot + 20, (dist_rot, dist_other)


def test_hamming_matrix():
    rs = np.random.default_rng(0)
    a = jnp.asarray(rs.integers(0, 2**32, size=(4, 8), dtype=np.uint32))
    m = np.asarray(orb.hamming_matrix(a, a))
    assert (np.diag(m) == 0).all()
    assert (m >= 0).all() and (m <= 256).all()
    np.testing.assert_array_equal(m, m.T)


def test_detect_pyramid_cell_locking_shifts_budget(test_img):
    """Steady-state cell locking (fast_detector.cc:48-56): corners in cells
    holding tracked features are suppressed, and a max_features budget is
    respent on uncovered regions instead of re-detecting tracked ones."""
    pyr = pyramid.build_pyramid(jnp.asarray(test_img), levels=3)
    base = fast.detect_pyramid(pyr, levels=2, cell=32, fast_threshold=15.0,
                               st_threshold=20.0)
    bxy = np.asarray(base.xy)
    bvalid = np.asarray(base.valid)
    assert bvalid.sum() >= 2
    # lock the cell of the globally best corner (the max_features winner)
    best = int(np.argmax(np.where(bvalid, np.asarray(base.score), -np.inf)))
    lock_xy = jnp.asarray(bxy[best][None])
    locked = fast.detect_pyramid(pyr, levels=2, cell=32, fast_threshold=15.0,
                                 st_threshold=20.0,
                                 lock_xy=lock_xy,
                                 lock_valid=jnp.asarray([True]))
    lvalid = np.asarray(locked.valid)
    assert not lvalid[best]              # tracked cell suppressed
    # lock granularity is LEVEL-0 cells (the reference's single grid,
    # fast_detector.cc:48-56): every newly-suppressed corner's level-0
    # position falls in the locked level-0 cell, whatever its level
    lost = np.flatnonzero(bvalid & ~lvalid)
    assert best in lost
    for i in lost:
        assert (np.asarray(bxy[i]) // 32 ==
                np.asarray(bxy[best]) // 32).all()
    # corners elsewhere are untouched
    kept = bvalid & lvalid
    assert kept.sum() == bvalid.sum() - len(lost)

    # budget respends: with max_features=1 the winner moves elsewhere
    top1 = fast.detect_pyramid(pyr, levels=2, cell=32, fast_threshold=15.0,
                               st_threshold=20.0, max_features=1)
    top1_locked = fast.detect_pyramid(
        pyr, levels=2, cell=32, fast_threshold=15.0, st_threshold=20.0,
        max_features=1, lock_xy=lock_xy, lock_valid=jnp.asarray([True]))
    assert np.asarray(top1.valid).any()
    if np.asarray(top1_locked.valid).any():
        assert not np.allclose(np.asarray(top1.xy[0]),
                               np.asarray(top1_locked.xy[0]))
