"""Repetitive-texture robustness (round-3 review item: the reference
restricts epipolar candidates to detected corners, matcher.cc:123-230,
and our fixed-sample redesign was untested on periodic texture).

Measured findings, pinned here:

1. On an exactly-periodic texture, a SINGLE-pair epipolar search aliases:
   a rho +- 2 sigma segment spanning more than one texture period admits
   ZMSSD-perfect twins, and a real fraction of matches triangulates to a
   wrong period.
2. The corner gate (epipolar_corner_gate) does NOT reduce period-twin
   aliases — the aliases sit on corner twins, which pass any
   image-structure test. The reference's corner-restricted search has the
   same exposure (its candidate corners repeat every period too). What
   the gate does is restrict matches to corner-like structure, mirroring
   the reference's search space.
3. The layer that actually kills aliases is the Bayesian depth filter
   (point.cc:63-100 Vogiatzis model): a period twin is only
   geometrically consistent for one specific pair geometry, so across
   frames with varying baselines the wrong-depth hypothesis stops being
   re-found and the filter never converges it. Zero bad depths survive to
   convergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvl_tpu.core import camera as cam
from sdvl_tpu.io.synthetic import (PlaneScene, _np_se3_exp, _np_se3_inverse,
                                   make_periodic_texture)
from sdvl_tpu.ops import fast as fast_ops
from sdvl_tpu.ops import pyramid
from sdvl_tpu.pipeline import depth_filter, matcher
from sdvl_tpu.pipeline.config import CameraConfig, Config, intrinsics
from sdvl_tpu.state.map_state import empty_map, store_pyramid

LEVELS = 5
PLANE_Z = 4.0


@pytest.fixture(scope="module")
def periodic_setup():
    tex = make_periodic_texture(1024, period=64, seed=1)
    scene = PlaneScene(fx=210.0, fy=210.0, cx=159.5, cy=119.5,
                       width=320, height=240, plane_z=PLANE_Z, texture=tex)
    cfg = Config(camera=CameraConfig(width=320, height=240, fx=210.0,
                                     fy=210.0, u0=159.5, v0=119.5,
                                     dist=(0, 0, 0, 0, 0)))
    intr = intrinsics(cfg)
    pose0 = np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32)
    pyr0 = tuple(pyramid.build_pyramid(
        jnp.asarray(scene.render(pose0)), LEVELS))
    corners = fast_ops.detect_pyramid(pyr0, levels=1, cell=16,
                                      fast_threshold=10.0,
                                      st_threshold=50.0)
    C = corners.xy.shape[0]
    m = empty_map(n_kf=2, n_pts=8, n_cand=C, img_shape=(240, 320),
                  levels=LEVELS)
    m = m._replace(
        kf_pose=m.kf_pose.at[0].set(jnp.asarray(pose0)),
        kf_valid=m.kf_valid.at[0].set(True),
        kf_frame_id=m.kf_frame_id.at[0].set(0),
        kf_pyr=tuple(lvl.at[0].set(p) for lvl, p in
                     zip(m.kf_pyr, store_pyramid(pyr0))),
        cand_valid=corners.valid,
        cand_kf=jnp.zeros(C, jnp.int32),
        cand_px=corners.xy,
        cand_level=jnp.zeros(C, jnp.int32),
        cand_bearing=cam.unproject(intr, corners.xy),
        # wide prior: the +-2 sigma segment spans > 1 image period
        cand_rho=jnp.full(C, 0.25),
        cand_sigma2=jnp.full(C, 0.1 ** 2),
        cand_a=jnp.full(C, 10.0),
        cand_b=jnp.full(C, 10.0),
    )
    z_true = PLANE_Z / np.asarray(m.cand_bearing)[:, 2]
    return scene, intr, m, z_true


def _pose_at(x, y=0.0):
    return _np_se3_inverse(_np_se3_exp(np.array([x, y, 0, 0, 0, 0],
                                                np.float32)))


def test_single_pair_epipolar_aliases_and_gate_scope(periodic_setup):
    scene, intr, m, z_true = periodic_setup
    pose1 = jnp.asarray(_pose_at(0.6))
    pyr1 = tuple(pyramid.build_pyramid(
        jnp.asarray(scene.render(np.asarray(pose1))), LEVELS))

    stats = {}
    for gate in (False, True):
        res = matcher.epipolar_search(m, intr, pyr1, pose1, n_samples=32,
                                      corner_gate=gate)
        ok = np.asarray(res.ok)
        rel = np.abs(np.asarray(res.depth_anchor) - z_true) / z_true
        stats[gate] = (int(ok.sum()), int((ok & (rel > 0.15)).sum()),
                       int((ok & (rel < 0.05)).sum()))

    n_ok, n_alias, n_good = stats[False]
    # finding 1: the failure mode is real — a solid alias fraction
    assert n_ok > 150 and n_good > 100
    assert n_alias >= 0.05 * n_ok, stats
    # finding 2: the gate keeps the good matches but cannot remove
    # period-twin aliases (they are corners too — reference-equivalent)
    g_ok, g_alias, g_good = stats[True]
    assert g_good >= 0.9 * n_good, stats
    assert g_alias >= 0.5 * n_alias, stats  # still aliased, by design


def test_depth_filter_rejects_period_aliases(periodic_setup):
    """Finding 3: across varied baselines nothing wrong survives to
    convergence — the Vogiatzis filter is the anti-alias layer."""
    scene, intr, m, z_true = periodic_setup

    upd = jax.jit(lambda m, pyr, pose: depth_filter.update_candidates(
        m, intr, pyr, pose, n_samples=32, map_scale=PLANE_Z))
    for k in range(12):
        pose = jnp.asarray(_pose_at(0.25 + 0.05 * k, 0.1 * np.sin(k)))
        pyr = tuple(pyramid.build_pyramid(
            jnp.asarray(scene.render(np.asarray(pose))), LEVELS))
        m = upd(m, pyr, pose)

    rho = np.asarray(m.cand_rho)
    sig = np.sqrt(np.asarray(m.cand_sigma2))
    a, b = np.asarray(m.cand_a), np.asarray(m.cand_b)
    converged = (np.asarray(m.cand_valid) & (a / (a + b) > 0.6)
                 & (2 * sig / np.maximum(rho, 1e-9) < 0.1))
    assert converged.sum() > 100
    rel = np.abs(1.0 / np.maximum(rho, 1e-9) - z_true) / z_true
    assert (converged & (rel > 0.15)).sum() == 0, \
        f"{(converged & (rel > 0.15)).sum()} aliased depths converged"
    assert (converged & (rel < 0.05)).mean() > 0.0  # plenty accurate


def test_no_point_decay_while_lost(periodic_setup):
    """feature_align.cc:128,141: nothing is promoted or unpromoted while
    relocalizing. A LOST stretch (e.g. covered lens) must not decay the
    map the relocalizer depends on — measured regression: an ungated
    stats fold deleted an entire 900-point map in max_failed frames."""
    import numpy as np

    from sdvl_tpu.pipeline import tracker

    scene, intr, m, _ = periodic_setup
    P = m.pt_valid.shape[0]
    n = min(64, P)
    # one failed attempt away from deletion (pt_fail > max_failed kills)
    m = m._replace(pt_valid=jnp.ones(P, bool),
                   pt_fail=jnp.full(P, 15, jnp.int32))

    class TR:  # minimal TrackResult stand-in
        match_pt_idx = jnp.arange(n, dtype=jnp.int32)
        match_ok = jnp.zeros(n, bool)
        match_attempted = jnp.ones(n, bool)

    gated = tracker.update_point_stats(m, TR, max_failed=15,
                                       enabled=jnp.asarray(False))
    assert int(np.asarray(gated.pt_valid).sum()) == P  # untouched
    ungated = tracker.update_point_stats(m, TR, max_failed=15,
                                         enabled=jnp.asarray(True))
    assert int(np.asarray(ungated.pt_valid).sum()) == P - n  # would decay
