"""Full-map bundle adjustment + trajectory rebase.

The reference's BA never exceeds an 11-keyframe local window
(reference map.cc:848-851); global_ba refines every keyframe and point at
once and, with a mesh, shards the point blocks across devices. These tests
check (a) a perturbed map snaps back to ground truth, (b) the sharded
solve matches the single-device one, (c) keyframe corrections propagate
to a full trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvl_tpu.core import camera, se3
from sdvl_tpu.io.evaluate import rebase_trajectory
from sdvl_tpu.pipeline import mapper
from sdvl_tpu.state.map_state import empty_map


K, P = 6, 256
H, W = 64, 96


def _gt_map(seed=0):
    """MapState whose observations are exact projections of a GT scene."""
    rs = np.random.default_rng(seed)
    intr = camera.Intrinsics.create(90.0, 90.0, W / 2 - 0.5, H / 2 - 0.5,
                                    width=W, height=H)
    pts = jnp.asarray(
        rs.uniform([-2.5, -2.0, 4.0], [2.5, 2.0, 9.0], (P, 3)), jnp.float32)
    # keyframes strafe along x with slight yaw
    poses = jnp.stack([
        se3.exp(jnp.asarray([0.3 * k, 0.05 * k, 0.0,
                             0.0, 0.02 * k, 0.0], jnp.float32))
        for k in range(K)
    ])
    p_cam = se3.transform(poses[:, None, :], pts[None, :, :])
    px = jax.vmap(lambda pc: camera.project(intr, pc))(p_cam)   # (K, P, 2)
    inb = ((px[..., 0] >= 1) & (px[..., 0] <= W - 2)
           & (px[..., 1] >= 1) & (px[..., 1] <= H - 2)
           & (p_cam[..., 2] > 0.1))

    m = empty_map(n_kf=K, n_pts=P, n_cand=8, img_shape=(H, W), levels=2)
    m = m._replace(
        kf_valid=jnp.ones(K, bool),
        kf_pose=poses,
        kf_frame_id=jnp.arange(K, dtype=jnp.int32) * 10,
        pt_pos=pts,
        pt_valid=jnp.ones(P, bool),
        obs_mask=inb,
        obs_px=px,
    )
    return intr, m, poses, pts


def _perturb(m, seed=1, pose_mag=0.03, pt_mag=0.15):
    rs = np.random.default_rng(seed)
    xi = jnp.asarray(rs.normal(0, pose_mag, (K, 6)), jnp.float32)
    xi = xi.at[:2].set(0.0)  # two oldest keyframes pin the gauge
    dpt = jnp.asarray(rs.normal(0, pt_mag, (P, 3)), jnp.float32)
    return m._replace(
        kf_pose=jax.vmap(se3.boxplus)(m.kf_pose, xi),
        pt_pos=m.pt_pos + dpt,
    )


def test_global_ba_recovers_map():
    intr, m_gt, poses_gt, pts_gt = _gt_map()
    m0 = _perturb(m_gt)

    err_pose0 = float(jnp.abs(m0.kf_pose[2:, 4:] - poses_gt[2:, 4:]).max())
    err_pt0 = float(jnp.abs(m0.pt_pos - pts_gt).max())

    m1 = mapper.global_ba(m0, intr, stage_iters=(10, 10))
    err_pose1 = float(jnp.abs(m1.kf_pose[2:, 4:] - poses_gt[2:, 4:]).max())
    med_pt1 = float(jnp.median(jnp.linalg.norm(m1.pt_pos - pts_gt, axis=-1)))

    assert err_pose1 < 1e-3, (err_pose0, err_pose1)
    assert med_pt1 < 5e-3, (err_pt0, med_pt1)


def test_global_ba_sharded_matches_single_device():
    from sdvl_tpu.dist.mesh import make_mesh

    intr, m_gt, _, _ = _gt_map(seed=2)
    m0 = _perturb(m_gt, seed=3)

    m_single = mapper.global_ba(m0, intr, stage_iters=(6, 6))
    mesh = make_mesh(len(jax.devices()), axis="point")
    m_shard = mapper.global_ba(m0, intr, mesh=mesh, stage_iters=(6, 6))

    np.testing.assert_allclose(np.asarray(m_shard.kf_pose),
                               np.asarray(m_single.kf_pose),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(m_shard.pt_pos),
                               np.asarray(m_single.pt_pos),
                               atol=2e-3)


def test_rebase_trajectory_propagates_kf_corrections():
    rs = np.random.default_rng(7)

    def rand_pose():
        return np.asarray(
            se3.exp(jnp.asarray(rs.normal(0, 0.2, 6), jnp.float32)))

    traj = np.stack([rand_pose() for _ in range(5)])
    kf_old = np.stack([traj[0], traj[2], rand_pose()])
    dq = [np.asarray(se3.exp(jnp.asarray(rs.normal(0, 0.1, 6), jnp.float32)))
          for _ in range(2)]
    kf_new = np.stack([
        np.asarray(se3.compose(jnp.asarray(kf_old[0]), jnp.asarray(dq[0]))),
        np.asarray(se3.compose(jnp.asarray(kf_old[1]), jnp.asarray(dq[1]))),
        kf_old[2],  # invalid slot: must be ignored
    ])

    out = rebase_trajectory(
        traj, frame_ids=np.arange(5),
        kf_frame_ids=np.asarray([0, 2, 99]),
        kf_old=kf_old, kf_new=kf_new,
        kf_valid=np.asarray([True, True, False]),
    )

    for f in range(5):
        k = 0 if f < 2 else 1
        expect = np.asarray(se3.compose(
            se3.compose(jnp.asarray(traj[f]),
                        se3.inverse(jnp.asarray(kf_old[k]))),
            jnp.asarray(kf_new[k]),
        ))
        np.testing.assert_allclose(out[f], expect, atol=1e-5)


def test_cli_global_ba(tmp_path):
    """CLI wiring: --global-ba refines the final map and still writes a
    finite trajectory."""
    import os
    import subprocess
    import sys

    out_file = tmp_path / "traj.txt"
    out = subprocess.run(
        [sys.executable, "-m", "sdvl_tpu.cli.run", "--synthetic", "16",
         "--quiet", "--global-ba", "--output", str(out_file)],
        capture_output=True, text=True, timeout=900, check=True,
        env={**os.environ, "SDVL_PLATFORM": "cpu"},
    )
    assert "global BA over" in out.stdout, out.stdout + out.stderr
    traj = np.loadtxt(out_file)
    assert traj.shape[0] == 16 and np.isfinite(traj).all()


def test_rebase_trajectory_no_keyframes_is_identity():
    traj = np.zeros((3, 7), np.float32)
    traj[:, 0] = 1.0
    out = rebase_trajectory(traj, np.arange(3), np.asarray([-1]),
                            np.zeros((1, 7)), np.zeros((1, 7)),
                            np.asarray([False]))
    np.testing.assert_array_equal(out, traj)
