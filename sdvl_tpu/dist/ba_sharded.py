"""Distributed Schur-complement bundle adjustment over a device mesh.

The TPU-native answer to the scaling axis the reference cannot touch
(SURVEY.md §5 "long-context": map size is bounded in the reference by local
BA <= 11 keyframes, map.cc:848-851). Here the BA observation grid (P points
x K cameras) shards its POINT dimension across the mesh: every device
linearizes and eliminates its own point blocks (V, W stay fully local —
point elimination is embarrassingly parallel), and only the tiny reduced
camera system (6K x 6K) plus its rhs are ``psum``-ed over ICI. Per LM
iteration the wire cost is O(K^2 * 36) floats — independent of P, so point
capacity scales linearly with devices.

The math is sdvl_tpu.solvers.ba's; this module wraps it in ``shard_map``
with the three collective points (U, S_cross, rhs, chi2) reduced over the
``point`` axis. Cameras are replicated — K is small (a local window or a
pose-graph backbone), points are the big dimension, exactly like the
reference's marginalized VertexSBAPointXYZ blocks (bundle.cc:156).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import se3
from ..solvers import ba as ba_mod
from ..solvers.ba import BAProblem, BAResult


def _lm_iteration(poses, points, obs_uv, w_mask, fixed, lam, prev_chi2,
                  huber, axis: str | None, method: str = "chol"):
    """One damped GN step with point-sharded Schur elimination.

    ``method``: "chol" psums the full (K, K, 6, 6) reduced camera system and
    Cholesky-factorizes it replicated on every device; "cg" never forms it —
    ba._schur_solve_cg runs matrix-free with one (K, 6) psum per CG
    iteration, the only option at Zurich-scale keyframe counts
    (reference config_zurich.cfg max_keyframes 1000 -> S would be 36 M
    floats per LM step on the wire).
    """
    def psum(x):
        return jax.lax.psum(x, axis) if axis else x

    r, _, w0 = ba_mod._residuals(poses, points, obs_uv, w_mask)
    w = ba_mod._robust_weights(r, w0, huber)
    U, V, Wm, b_c, b_p = ba_mod._build_system(poses, points, r, w)

    if method == "cg":
        # _schur_solve_cg psums U/b_c and the point contractions itself
        dc, dp = ba_mod._schur_solve_cg(U, V, Wm, b_c, b_p, fixed, lam,
                                        axis=axis)
    else:
        # U and b_c sum over ALL points -> cross-device reduce
        U = psum(U)
        b_c = psum(b_c)

        K = U.shape[0]
        eye3 = jnp.eye(3, dtype=V.dtype)
        eye6 = jnp.eye(6, dtype=U.dtype)
        Vinv = jnp.linalg.inv(V + (lam + 1e-8) * eye3[None])
        WVinv = jnp.einsum("pkij,pjl->pkil", Wm, Vinv)
        S_cross = psum(jnp.einsum("pkil,pmjl->kmij", WVinv, Wm))
        rhs = b_c - psum(jnp.einsum("pkil,pl->ki", WVinv, b_p))

        S = -S_cross
        S = S.at[jnp.arange(K), jnp.arange(K)].add(U + lam * eye6[None])
        free = (~fixed).astype(S.dtype)
        S = S * free[:, None, None, None] * free[None, :, None, None]
        S = S.at[jnp.arange(K), jnp.arange(K)].add(
            (1.0 - free)[:, None, None] * eye6[None]
        )
        rhs = rhs * free[:, None]

        S_full = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        L = jnp.linalg.cholesky(
            S_full + 1e-8 * jnp.eye(K * 6, dtype=S.dtype)
        )
        dc = jax.scipy.linalg.cho_solve(
            (L, True), rhs.reshape(K * 6)
        ).reshape(K, 6)

        t = b_p - jnp.einsum("pkij,ki->pj", Wm, dc)
        dp = jnp.einsum("pij,pj->pi", Vinv, t)

    new_poses = se3.boxplus(poses, -dc)
    new_points = points - dp
    r2, _, w2 = ba_mod._residuals(new_poses, new_points, obs_uv, w_mask)
    chi2 = psum(
        ba_mod._robust_chi2(r2, ba_mod._robust_weights(r2, w2, huber), huber)
    )
    accept = chi2 < prev_chi2
    poses = jnp.where(accept, new_poses, poses)
    points = jnp.where(accept, new_points, points)
    lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e3)
    prev_chi2 = jnp.where(accept, chi2, prev_chi2)
    return poses, points, lam, prev_chi2


def _solve_sharded_body(poses, fixed, points, obs_uv, obs_mask, huber,
                        stage_iters, gate_scale, axis, method):
    """Runs on each device over its point shard."""
    def psum(x):
        return jax.lax.psum(x, axis) if axis else x

    def lm_run(poses, points, w_mask, iters):
        r0, _, w0 = ba_mod._residuals(poses, points, obs_uv, w_mask)
        chi0 = psum(ba_mod._robust_chi2(
            r0, ba_mod._robust_weights(r0, w0, huber), huber))
        lam0 = jnp.asarray(1e-4, jnp.float32)

        def body2(_, carry):
            poses, points, lam, chi2 = carry
            return _lm_iteration(poses, points, obs_uv, w_mask, fixed,
                                 lam, chi2, huber, axis, method)

        poses, points, _, chi2 = jax.lax.fori_loop(
            0, iters, body2, (poses, points, lam0, chi0)
        )
        return poses, points, chi2

    w_mask = obs_mask.astype(jnp.float32)
    poses, points, _ = lm_run(poses, points, w_mask, stage_iters[0])

    r, p_cam, _ = ba_mod._residuals(poses, points, obs_uv, w_mask)
    err2 = jnp.sum(r * r, axis=-1)
    gate = huber * gate_scale
    keep = (err2 < gate * gate) & (p_cam[..., 2] > 1e-4)
    w_mask2 = w_mask * keep

    poses, points, chi2 = lm_run(poses, points, w_mask2, stage_iters[1])
    return BAResult(poses=poses, points=points, chi2=chi2,
                    inlier_mask=(w_mask2 > 0) & obs_mask)


def solve_sharded(problem: BAProblem, mesh: Mesh, huber: float,
                  stage_iters=(5, 10), gate_scale: float = 1.0,
                  axis: str = "point",
                  method: str | None = None) -> BAResult:
    """Distributed two-stage LM over ``mesh`` with points sharded on
    ``axis``. Point count must divide the axis size. Semantics match
    sdvl_tpu.solvers.ba.solve (same two-stage gating as bundle.cc:192-209),
    including the method auto-pick: dense Cholesky up to
    ``ba.CG_KF_THRESHOLD`` keyframe slots, matrix-free PCG beyond.
    """
    if method is None:
        method = ("cg" if problem.poses.shape[0] > ba_mod.CG_KF_THRESHOLD
                  else "chol")
    fn = functools.partial(
        _solve_sharded_body, huber=huber,
        stage_iters=tuple(stage_iters), gate_scale=gate_scale, axis=axis,
        method=method,
    )
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=BAResult(poses=P(), points=P(axis), chi2=P(),
                           inlier_mask=P(axis)),
    )
    return sharded(problem.poses, problem.fixed, problem.points,
                   problem.obs_uv, problem.obs_mask)
