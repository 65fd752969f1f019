"""Unit tests for pipeline building blocks on tiny synthetic maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvl_tpu.core import camera, se3
from sdvl_tpu.ops import pyramid
from sdvl_tpu.pipeline import depth_filter, matcher
from sdvl_tpu.pipeline.config import Config, load_cfg
from sdvl_tpu.state.map_state import (MapState, alloc_slots, covisibility,
                                      empty_map)

INTR = camera.Intrinsics.create(200.0, 200.0, 79.5, 59.5, width=160, height=120)


def test_alloc_slots_basic():
    free = jnp.asarray([False, True, False, True, True])
    incoming = jnp.asarray([True, True, True, True])  # 4 wanted, 3 free
    slots, ok = alloc_slots(free, incoming)
    assert np.asarray(ok).tolist() == [True, True, True, False]
    assert sorted(np.asarray(slots)[:3].tolist()) == [1, 3, 4]
    # rejected slot is out of range for mode=drop scatters
    assert int(slots[3]) == 5


def test_alloc_slots_respects_invalid_incoming():
    free = jnp.ones(8, bool)
    incoming = jnp.asarray([False, True, False, True])
    slots, ok = alloc_slots(free, incoming)
    assert np.asarray(ok).tolist() == [False, True, False, True]
    assert int(slots[1]) == 0 and int(slots[3]) == 1


def test_covisibility_matmul():
    m = empty_map(n_kf=3, n_pts=8, n_cand=4, img_shape=(32, 32), levels=2)
    obs = jnp.zeros((3, 8), bool)
    obs = obs.at[0, :4].set(True).at[1, 2:6].set(True).at[2, 6:8].set(True)
    m = m._replace(obs_mask=obs, kf_valid=jnp.ones(3, bool))
    cov = np.asarray(covisibility(m))
    assert cov[0, 1] == 2 and cov[1, 2] == 0 and cov[0, 0] == 0


def test_grid_select():
    cell_id = jnp.asarray([0, 0, 1, 3, 3, 3])
    score = jnp.asarray([1.0, 5.0, 2.0, 7.0, 9.0, 8.0])
    valid = jnp.asarray([True, True, True, True, False, True])
    sel, ok = matcher.grid_select(cell_id, score, valid, n_cells=4)
    assert np.asarray(ok).tolist() == [True, True, False, True]
    assert int(sel[0]) == 1  # score 5 beats 1
    assert int(sel[3]) == 5  # 9 is invalid, 8 wins


def test_vogiatzis_update_converges():
    # repeated consistent measurements shrink variance toward truth
    rho = jnp.asarray([0.5])
    sigma2 = jnp.asarray([0.25])
    a = jnp.asarray([10.0])
    b = jnp.asarray([10.0])
    true_rho = 0.25
    rs = np.random.default_rng(0)
    for _ in range(40):
        x = jnp.asarray([true_rho + rs.normal(0, 0.01)])
        rho, sigma2, a, b = depth_filter.vogiatzis_update(
            rho, sigma2, a, b, x, jnp.asarray([1e-4]), jnp.asarray([1.0])
        )
    assert abs(float(rho[0]) - true_rho) < 0.02
    assert float(sigma2[0]) < 1e-3
    assert float(a[0]) / float(a[0] + b[0]) > 0.7


def test_vogiatzis_rejects_outliers():
    rho = jnp.asarray([0.5])
    sigma2 = jnp.asarray([0.01])
    a = jnp.asarray([10.0])
    b = jnp.asarray([10.0])
    rs = np.random.default_rng(1)
    for _ in range(30):
        x = jnp.asarray([rs.uniform(0.1, 2.0)])  # junk measurements
        rho, s2_new, a, b = depth_filter.vogiatzis_update(
            rho, sigma2, a, b, x, jnp.asarray([1e-4]), jnp.asarray([2.0])
        )
    # inlier probability collapses
    assert float(a[0]) / float(a[0] + b[0]) < 0.45


def test_candidate_aging_deletes_stale_invisible():
    """Candidates invisible from the current frame whose anchor keyframe is
    >= stale_kf_window keyframes old age out (reference map.cc:413,438-442:
    min_kf_id = last KF id - 2*MaxSearchKeyframes); fresh-anchored or
    visible candidates survive."""
    H, W, levels = 128, 160, 3
    m = empty_map(n_kf=16, n_pts=16, n_cand=8, img_shape=(H, W),
                  levels=levels)
    intr = camera.Intrinsics.create(200.0, 200.0, 79.5, 63.5,
                                    width=W, height=H)
    m = m._replace(
        kf_valid=m.kf_valid.at[:12].set(True),
        kf_frame_id=m.kf_frame_id.at[:12].set(
            jnp.arange(12, dtype=jnp.int32)),
    )
    behind = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)   # never projects
    ahead = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    m = m._replace(
        cand_valid=m.cand_valid.at[:3].set(True),
        # A: stale anchor (kf 0, 11 newer) + invisible -> deleted
        # B: fresh anchor (kf 11) + invisible -> kept
        # C: stale anchor but visible -> kept
        cand_kf=m.cand_kf.at[0].set(0).at[1].set(11).at[2].set(0),
        cand_bearing=m.cand_bearing.at[0].set(behind).at[1].set(behind)
                                   .at[2].set(ahead),
        cand_px=m.cand_px.at[:3].set(jnp.asarray([79.5, 63.5])),
        cand_rho=m.cand_rho.at[:3].set(0.25),
        cand_sigma2=m.cand_sigma2.at[:3].set(0.01),
        cand_a=m.cand_a.at[:3].set(10.0),
        cand_b=m.cand_b.at[:3].set(10.0),
    )
    pyr = tuple(jnp.zeros((H >> l, W >> l), jnp.float32)
                for l in range(levels))
    m2 = depth_filter.update_candidates(
        m, intr, pyr, se3.identity(), n_samples=8, stale_kf_window=10
    )
    valid = np.asarray(m2.cand_valid)
    assert not valid[0], "stale invisible candidate must age out"
    assert valid[1], "fresh invisible candidate must survive"
    assert valid[2], "visible candidate must survive"


def test_compute_tau_positive_and_scales():
    t = jnp.asarray([[0.3, 0.0, 0.0]])
    bearing = jnp.asarray([[0.0, 0.0, 1.0]])
    z = jnp.asarray([4.0])
    angle = jnp.asarray(1.0 / 400.0)
    tau = depth_filter.compute_tau(t, bearing, z, angle)
    assert float(tau[0]) > 0
    tau_far = depth_filter.compute_tau(t, bearing, jnp.asarray([8.0]), angle)
    assert float(tau_far[0]) > float(tau[0])  # farther -> worse conditioning


def test_load_reference_config():
    cfg = load_cfg("/root/reference/config/config_tum_f1.cfg")
    assert cfg.camera.width == 640
    assert abs(cfg.camera.fx - 517.3) < 1e-6
    assert cfg.sdvl.cell_size == 32
    assert cfg.sdvl.use_orb  # dataset presets enable ORB
    assert cfg.video.type == 1


def test_seed_and_promote_candidates():
    m = empty_map(n_kf=4, n_pts=16, n_cand=8, img_shape=(128, 160), levels=3)
    pyr = tuple(jnp.zeros((128 >> l, 160 >> l)) for l in range(3))
    from sdvl_tpu.state.map_state import store_pyramid
    kf_pyr = tuple(
        lvl.at[0].set(img)
        for lvl, img in zip(m.kf_pyr, store_pyramid(pyr))
    )
    m = m._replace(
        kf_valid=m.kf_valid.at[0].set(True),
        kf_pose=m.kf_pose.at[0].set(se3.identity()),
        kf_pyr=kf_pyr,
    )
    intr = camera.Intrinsics.create(200.0, 200.0, 79.5, 59.5,
                                    width=160, height=128)
    corners = (
        jnp.asarray([[40.0, 40.0], [100.0, 80.0]]),
        jnp.zeros(2, jnp.int32),
        jnp.ones(2, bool),
    )
    m, new_mask = depth_filter.seed_candidates(
        m, intr, pyr, corners, jnp.asarray(0), jnp.asarray(4.0), cell=32
    )
    assert int(m.cand_valid.sum()) == 2
    assert int(new_mask.sum()) == 2
    assert bool(jnp.all(new_mask == m.cand_valid))
    np.testing.assert_allclose(float(m.cand_rho[0]), 0.25, rtol=1e-5)

    # force convergence and promote
    m = m._replace(
        cand_sigma2=jnp.where(m.cand_valid, 1e-8, m.cand_sigma2),
        cand_a=jnp.where(m.cand_valid, 50.0, m.cand_a),
        cand_b=jnp.where(m.cand_valid, 1.0, m.cand_b),
    )
    m2 = depth_filter.promote_converged(m)
    assert int(m2.cand_valid.sum()) == 0
    assert int(m2.pt_valid.sum()) == 2
    assert int(m2.obs_mask[0].sum()) == 2
    # promoted world point sits at depth 4 along the bearing
    p = np.asarray(m2.pt_pos[np.asarray(m2.pt_valid)])
    assert np.all(np.abs(p[:, 2] - 4.0) < 0.2)


def test_sample_without_replacement_distinct():
    """RANSAC minimal sets must have distinct, valid indices (VERDICT r1:
    categorical draws allowed duplicates -> rank-deficient hypotheses)."""
    from sdvl_tpu.core import geometry

    valid = jnp.asarray([True] * 6 + [False] * 10)
    seen = set()
    sample = jax.jit(geometry.sample_without_replacement,
                     static_argnums=(2,))
    for i in range(40):
        idx = np.asarray(sample(jax.random.PRNGKey(i), valid, 5))
        assert len(set(idx.tolist())) == 5, idx
        assert all(bool(valid[j]) for j in idx), idx
        seen.update(idx.tolist())
    assert seen == set(range(6))  # every valid index gets sampled


def test_add_keyframe_preserves_match_level():
    """The level a match was made at must land in obs_level (VERDICT r1:
    it was hardcoded 0, so anchor warping treated every keyframe-matched
    anchor as level-0)."""
    from sdvl_tpu.pipeline import mapper

    m = empty_map(n_kf=4, n_pts=16, n_cand=8, img_shape=(128, 160), levels=3)
    # two live points to observe
    m = m._replace(
        pt_valid=m.pt_valid.at[3].set(True).at[7].set(True),
        pt_pos=m.pt_pos.at[3].set(jnp.asarray([0.0, 0.0, 4.0]))
                       .at[7].set(jnp.asarray([0.5, 0.2, 5.0])),
    )
    pyr = tuple(jnp.zeros((128 >> l, 160 >> l)) for l in range(3))
    match_idx = jnp.asarray([3, 7, 0], jnp.int32)
    match_px = jnp.asarray([[40.0, 40.0], [100.0, 80.0], [0.0, 0.0]])
    match_ok = jnp.asarray([True, True, False])
    match_level = jnp.asarray([2, 1, 0], jnp.int32)
    corners = (jnp.zeros((2, 2)), jnp.zeros(2, jnp.int32),
               jnp.zeros(2, bool))
    m2, slot = mapper.add_keyframe(
        m, INTR, pyr, se3.identity(), jnp.asarray(5, jnp.int32),
        match_idx, match_px, match_ok, match_level,
        corners[0], corners[1], corners[2], cell=32,
    )
    slot = int(slot)
    assert bool(m2.obs_mask[slot, 3]) and bool(m2.obs_mask[slot, 7])
    assert int(m2.obs_level[slot, 3]) == 2
    assert int(m2.obs_level[slot, 7]) == 1
    assert not bool(m2.obs_mask[slot, 0])
