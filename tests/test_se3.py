"""Unit tests for sdvl_tpu.core.se3 against scipy/numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from sdvl_tpu.core import se3


def random_poses(rng, n):
    rot = ScipyRot.random(n, random_state=np.random.RandomState(42))
    q_xyzw = rot.as_quat()  # scipy: x,y,z,w
    q = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, :3]], axis=1)
    t = rng.normal(size=(n, 3))
    return jnp.asarray(np.concatenate([q, t], axis=1), jnp.float32)


def test_identity_roundtrip():
    p = se3.identity((4,))
    assert p.shape == (4, 7)
    np.testing.assert_allclose(se3.log(p), np.zeros((4, 6)), atol=1e-6)


def test_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(scale=0.8, size=(64, 6)), jnp.float32)
    back = se3.log(se3.exp(xi))
    np.testing.assert_allclose(back, xi, atol=2e-5, rtol=2e-5)


def test_exp_small_angle(rng):
    xi = jnp.asarray(rng.normal(scale=1e-5, size=(16, 6)), jnp.float32)
    back = se3.log(se3.exp(xi))
    np.testing.assert_allclose(back, xi, atol=1e-7)


def test_exp_matches_scipy_rotation(rng):
    omega = rng.normal(scale=1.0, size=(32, 3)).astype(np.float32)
    xi = jnp.concatenate(
        [jnp.zeros((32, 3), jnp.float32), jnp.asarray(omega)], axis=1
    )
    R_ours = np.asarray(se3.rotation(se3.exp(xi)))
    R_scipy = ScipyRot.from_rotvec(omega).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)


def test_compose_matches_matrix(rng):
    a = random_poses(rng, 32)
    b = random_poses(rng, 32)
    c = se3.compose(a, b)
    Ra, ta = np.asarray(se3.rotation(a)), np.asarray(se3.translation(a))
    Rb, tb = np.asarray(se3.rotation(b)), np.asarray(se3.translation(b))
    Rc = np.asarray(se3.rotation(c))
    tc = np.asarray(se3.translation(c))
    np.testing.assert_allclose(Rc, Ra @ Rb, atol=1e-5)
    np.testing.assert_allclose(tc, np.einsum("nij,nj->ni", Ra, tb) + ta, atol=1e-5)


def test_inverse(rng):
    p = random_poses(rng, 32)
    ident = se3.compose(p, se3.inverse(p))
    np.testing.assert_allclose(
        np.abs(np.asarray(ident[:, 0])), np.ones(32), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(ident[:, 1:]), 0, atol=1e-5)


def test_transform_matches_matrix(rng):
    p = random_poses(rng, 8)
    pts = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    out = se3.transform(p, pts)
    R = np.asarray(se3.rotation(p))
    t = np.asarray(se3.translation(p))
    expected = np.einsum("nij,nj->ni", R, np.asarray(pts)) + t
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    p = random_poses(rng, 64)
    q = p[:, :4]
    q2 = se3.quat_from_matrix(se3.matrix_from_quat(q))
    # sign-canonicalized comparison
    qn = np.asarray(q)
    qn = np.where(qn[:, :1] < 0, -qn, qn)
    np.testing.assert_allclose(np.asarray(q2), qn, atol=1e-5)


def test_boxplus_left_multiplicative(rng):
    p = random_poses(rng, 4)
    xi = jnp.asarray(rng.normal(scale=0.1, size=(4, 6)), jnp.float32)
    out = se3.boxplus(p, xi)
    expected = se3.compose(se3.exp(xi), p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_vmap_and_jit(rng):
    p = random_poses(rng, 16)
    f = jax.jit(jax.vmap(se3.log))
    np.testing.assert_allclose(
        np.asarray(f(p)), np.asarray(se3.log(p)), atol=1e-6
    )
