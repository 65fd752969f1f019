"""Config-knob sensitivity: every reference preset knob must reach the code.

VERDICT r1 item 8: 11 reference knobs were parsed by ``load_cfg`` but never
read, so loading a preset silently ignored a third of its tuning surface.
These tests pin that each knob now changes the shape or the arithmetic of
the stage it tunes (reference ``Config`` getters, config.h:64-104).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvl_tpu.core import camera, se3
from sdvl_tpu.ops import fast as fast_ops
from sdvl_tpu.ops import orb, pyramid
from sdvl_tpu.pipeline import matcher, tracker
from sdvl_tpu.solvers import image_align
from sdvl_tpu.state.map_state import empty_map, store_pyramid


@pytest.fixture(scope="module")
def tiny_world():
    rs = np.random.default_rng(3)
    H, W, levels = 96, 128, 4
    intr = camera.Intrinsics.create(100.0, 100.0, W / 2 - 0.5, H / 2 - 0.5,
                                    width=W, height=H)
    img = jnp.asarray(rs.uniform(0, 255, (H, W)).astype(np.float32))
    pyr = tuple(pyramid.build_pyramid(img, levels))
    m = empty_map(4, 128, 32, (H, W), levels)
    pts = jnp.asarray(rs.uniform([-2, -2, 3], [2, 2, 8],
                                 (128, 3)).astype(np.float32))
    kf_pyr = tuple(
        lvl.at[0].set(p) for lvl, p in zip(m.kf_pyr, store_pyramid(pyr))
    )
    m = m._replace(
        kf_valid=m.kf_valid.at[0].set(True),
        kf_pose=m.kf_pose.at[0].set(se3.identity()),
        kf_pyr=kf_pyr,
        pt_pos=pts,
        pt_valid=jnp.ones(128, bool),
        obs_mask=m.obs_mask.at[0].set(True),
        obs_px=m.obs_px.at[0].set(camera.project(intr, pts)),
    )
    return intr, m, pyr


def test_num_features_caps_detector(tiny_world):
    """SDVL.num_features -> detect_pyramid max_features (reference
    fast_detector.cc:108-151 retainBest budget)."""
    _, _, pyr = tiny_world
    full = fast_ops.detect_pyramid(pyr, levels=2, cell=16)
    capped = fast_ops.detect_pyramid(pyr, levels=2, cell=16, max_features=10)
    assert full.xy.shape[0] > 10
    assert capped.xy.shape[0] == 10
    # the survivors are the best-scoring valid corners
    if bool(capped.valid.any()):
        worst_kept = float(jnp.min(jnp.where(capped.valid, capped.score,
                                             jnp.inf)))
        dropped = ~jnp.isin(full.score, capped.score)
        best_dropped = jnp.where(full.valid & dropped, full.score, -jnp.inf)
        assert worst_kept >= float(jnp.max(best_dropped)) - 1e-3


def test_max_matches_caps_match_lanes(tiny_world):
    """SDVL.max_matches -> match attempt budget (feature_align.cc:119)."""
    intr, m, pyr = tiny_world
    pose = se3.identity()
    full = jax.eval_shape(
        lambda m: matcher.match_map_points(m, intr, pyr, pose, cell=16), m
    )
    capped = jax.eval_shape(
        lambda m: matcher.match_map_points(m, intr, pyr, pose, cell=16,
                                           max_matches=9), m
    )
    assert full.pt_idx.shape[0] > 9
    assert capped.pt_idx.shape[0] == 9


def test_patch_and_align_knobs_change_program(tiny_world):
    """patch_size / search_size / max_align_its / align_patch_size reach the
    matcher and the direct aligner (they alter the traced program)."""
    intr, m, pyr = tiny_world
    pose = se3.identity()

    def jaxpr_of(**kw):
        return str(jax.make_jaxpr(
            lambda m: matcher.match_map_points(m, intr, pyr, pose, cell=16,
                                               **kw)
        )(m))

    base = jaxpr_of()
    assert jaxpr_of(half=2) != base          # PatchSize
    assert jaxpr_of(lk_iters=3) != base      # MaxAlignIts
    assert jaxpr_of(reproj_px=1.0) != base   # SearchSize

    pts = m.pt_pos[:16]
    ok = jnp.ones(16, bool)

    def align_jaxpr(ph):
        return str(jax.make_jaxpr(
            lambda p: image_align.compute_pose(
                pyr, pyr, intr, p, ok, se3.identity(), se3.identity(),
                max_level=2, min_level=1, iters=2, patch_half=ph,
            )
        )(pts))

    assert align_jaxpr(1) != align_jaxpr(3)  # AlignPatchSize


def test_ransac_knobs_reach_pose_stage(tiny_world):
    """max_ransac_its / max_ransac_points -> hypothesis lanes and minimal
    set size of the pose RANSAC (feature_align.cc:152-216)."""
    intr, m, pyr = tiny_world
    key = jax.random.PRNGKey(0)
    idx = jnp.arange(16, dtype=jnp.int32)
    ok = jnp.ones(16, bool)

    def jaxpr_of(n_hyp, n_pts):
        return str(jax.make_jaxpr(
            lambda m: tracker.track_frame(
                m, intr, pyr, idx, ok, se3.identity(), pyr, se3.identity(),
                cell=16, align_max_level=1, align_min_level=1,
                align_iters=1, pose_iters=1, ransac_key=key,
                ransac_hypotheses=n_hyp, ransac_points=n_pts,
            )
        )(m))

    assert jaxpr_of(8, 5) != jaxpr_of(16, 5)
    assert jaxpr_of(8, 5) != jaxpr_of(8, 6)


def test_orb_size_changes_descriptor_taps():
    """SDVL.orb_size -> orientation/descriptor patch radius
    (orb_detector.cc:412-437 31px circular patch)."""
    rs = np.random.default_rng(0)
    img = jnp.asarray(rs.uniform(0, 255, (64, 64)).astype(np.float32))
    centers = jnp.asarray([[32.0, 32.0], [20.0, 40.0]])
    d31 = orb.descriptors(img, centers, radius=15)
    d15 = orb.descriptors(img, centers, radius=7)
    assert d31.shape == d15.shape == (2, 8)
    assert bool(jnp.any(d31 != d15))


def test_all_parsed_knobs_are_read():
    """grep-clean guarantee: every SdvlConfig field that load_cfg can fill
    from a preset is referenced outside config.py."""
    import dataclasses
    import pathlib
    import re

    from sdvl_tpu.pipeline.config import SdvlConfig

    root = pathlib.Path(matcher.__file__).resolve().parent.parent
    src = "\n".join(
        p.read_text() for p in root.rglob("*.py")
        if p.name != "config.py"
    )
    missing = [
        f.name for f in dataclasses.fields(SdvlConfig)
        if not re.search(rf"\.{f.name}\b", src)
    ]
    assert not missing, f"parsed but unread config knobs: {missing}"
