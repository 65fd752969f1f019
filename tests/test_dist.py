"""Distributed-path tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvl_tpu.core import se3
from sdvl_tpu.dist import ba_sharded, mesh as mesh_mod
from sdvl_tpu.solvers import ba


def _problem(rs, K=4, P=256, noise=0.05 / 420.0):
    pts = rs.uniform([-3, -3, 4], [3, 3, 12], size=(P, 3)).astype(np.float32)
    poses = np.stack([
        np.asarray(se3.exp(jnp.asarray([0.4 * k / K, 0, 0, 0, 0.01 * k, 0],
                                       jnp.float32)))
        for k in range(K)
    ])
    p_cam = np.asarray(
        se3.transform(jnp.asarray(poses)[None], jnp.asarray(pts)[:, None])
    )
    uv = (p_cam[..., :2] / p_cam[..., 2:3]).astype(np.float32)
    uv = uv + rs.normal(0, noise, uv.shape).astype(np.float32)
    mask = rs.random((P, K)) > 0.15
    return ba.BAProblem(
        poses=jnp.asarray(poses),
        fixed=jnp.asarray([True, True] + [False] * (K - 2)),
        points=jnp.asarray(pts + rs.normal(0, 0.05, pts.shape).astype(np.float32)),
        obs_uv=jnp.asarray(uv),
        obs_mask=jnp.asarray(mask),
    )


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8
    m = mesh_mod.make_mesh()
    assert m.devices.size == 8


def test_sharded_ba_matches_single_device():
    rs = np.random.default_rng(11)
    problem = _problem(rs)
    huber = float(np.sqrt(5.991) / 420.0)

    res_single = ba.solve(problem, huber=huber)
    m = mesh_mod.make_mesh()
    res_shard = ba_sharded.solve_sharded(problem, m, huber=huber)

    # same optimization semantics -> same result up to f32 reduce order
    np.testing.assert_allclose(
        np.asarray(res_shard.poses), np.asarray(res_single.poses), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_shard.points), np.asarray(res_single.points), atol=5e-3
    )
    assert abs(float(res_shard.chi2) - float(res_single.chi2)) < 1e-3 * max(
        float(res_single.chi2), 1.0
    )


def test_sharded_ba_improves_poses():
    rs = np.random.default_rng(12)
    problem = _problem(rs)
    # perturb non-fixed poses
    noise = jax.vmap(se3.exp)(
        jnp.asarray(rs.normal(0, 0.01, (4, 6)), jnp.float32)
    )
    poses0 = se3.compose(noise, problem.poses)
    poses0 = jnp.where(problem.fixed[:, None], problem.poses, poses0)
    true_poses = problem.poses
    problem = problem._replace(poses=poses0)

    m = mesh_mod.make_mesh()
    res = ba_sharded.solve_sharded(problem, m, huber=float(np.sqrt(5.991) / 420.0))

    def pose_err(ps):
        d = se3.log(se3.compose(jnp.asarray(ps), se3.inverse(true_poses)))
        return np.abs(np.asarray(d)).max()

    assert pose_err(res.poses) < pose_err(poses0) * 0.5


def test_sharded_ba_cg_matches_dense():
    """The matrix-free PCG path (Zurich-scale maps: never materializes the
    (6K, 6K) reduced system, one (K, 6) psum per CG iteration) must agree
    with the replicated dense Cholesky path on the same sharded problem."""
    rs = np.random.default_rng(14)
    problem = _problem(rs)
    huber = float(np.sqrt(5.991) / 420.0)
    m = mesh_mod.make_mesh()

    res_chol = ba_sharded.solve_sharded(problem, m, huber=huber,
                                        method="chol")
    res_cg = ba_sharded.solve_sharded(problem, m, huber=huber, method="cg")

    np.testing.assert_allclose(
        np.asarray(res_cg.poses), np.asarray(res_chol.poses), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_cg.points), np.asarray(res_chol.points), atol=5e-3
    )
    assert abs(float(res_cg.chi2) - float(res_chol.chi2)) < 1e-3 * max(
        float(res_chol.chi2), 1.0
    )


def test_sharded_ba_under_jit():
    rs = np.random.default_rng(13)
    problem = _problem(rs)
    m = mesh_mod.make_mesh()
    f = jax.jit(
        lambda p: ba_sharded.solve_sharded(p, m, huber=float(np.sqrt(5.991) / 420.0))
    )
    res = f(problem)
    assert np.isfinite(float(res.chi2))
