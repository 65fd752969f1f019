"""Bundle adjustment via Schur complement — the g2o replacement.

TPU-native replacement for the reference's entire BA stack: the front-end
``Bundle::Local`` (reference extra/bundle.cc:65-224) and everything it uses
from vendored g2o (~16k LoC: SparseOptimizer + BlockSolver_6_3 +
LinearSolverEigen with marginalized point blocks + Levenberg-Marquardt +
RobustKernelHuber + EdgeSE3ProjectXYZ, see SURVEY.md §2.2).

Design: the observation structure is a *dense* (P, K) grid — P point slots x
K camera slots with a validity mask — instead of g2o's pointer-graph. For
local BA, K <= 16 and P <= a few thousand, so dense blocks are small, every
contraction is an einsum the MXU eats, and the Schur trick is three batched
matmuls:

    S  = U - W V^{-1} W^T        (reduced camera system, (6K, 6K) dense)
    dc = chol_solve(S, b)        (camera updates)
    dp = V^{-1} (b_p - W^T dc)   (point back-substitution)

Huber weights on unit-plane residuals mirror bundle.cc:176-178; the
two-stage outlier gating (optimize 5, drop chi2>5.991 edges, optimize 10,
bundle.cc:192-209) is the ``stage_iters``/``gate`` schedule below.
Levenberg damping with accept/reject is a functional carry, not a branch.

The multi-device version (points sharded over a mesh, psum on the reduced
camera system) lives in sdvl_tpu.dist.ba_sharded and reuses these kernels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import geometry, se3


class BAProblem(NamedTuple):
    """Fixed-capacity local BA problem.

    poses:     (K, 7) world->cam keyframe poses
    fixed:     (K,) bool — poses held constant (fixed vertices, bundle.cc:130)
    points:    (P, 3) world points
    obs_uv:    (P, K, 2) unit-plane measurements
    obs_mask:  (P, K) bool — observation exists
    """

    poses: jnp.ndarray
    fixed: jnp.ndarray
    points: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_mask: jnp.ndarray


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    chi2: jnp.ndarray          # final robust cost
    inlier_mask: jnp.ndarray   # (P, K) observations that survived gating


# chi2 gate: 5.991 is the 95% quantile of chi2(2dof) on *pixel* residuals
# (bundle.cc:197); we work on the unit plane so callers scale by focal.
# Python float, NOT jnp: a module-level device op would initialize the
# backend at import (breaking jax.distributed.initialize ordering) and is a
# tunnel-poisoning hazard on the axon runtime.
DEFAULT_HUBER = 5.991 ** 0.5


def _residuals(poses, points, obs_uv, w_mask):
    """r (P,K,2), p_cam (P,K,3), front-of-camera mask folded into w."""
    p_cam = se3.transform(poses[None, :, :], points[:, None, :])
    uv = cam.project_unit_plane(p_cam)
    r = obs_uv - uv
    w = w_mask * (p_cam[..., 2] > 1e-4)
    return r, p_cam, w.astype(jnp.float32)


def _robust_weights(r, w, huber):
    """Huber IRLS weights per observation."""
    n = jnp.linalg.norm(r, axis=-1)
    scale = jnp.where(n <= huber, 1.0, huber / jnp.maximum(n, 1e-12))
    return w * scale


def _build_system(poses, points, r, w):
    """Assemble U, V, W, b_c, b_p for the current linearization."""
    p_cam = se3.transform(poses[None, :, :], points[:, None, :])
    Jc = -geometry.jacobian_unit_plane(p_cam)                  # (P,K,2,6)
    Jp = -geometry.jacobian_point(poses[None, :, :4], p_cam)   # (P,K,2,3)

    U = jnp.einsum("pkri,pkrj,pk->kij", Jc, Jc, w)             # (K,6,6)
    V = jnp.einsum("pkri,pkrj,pk->pij", Jp, Jp, w)             # (P,3,3)
    Wm = jnp.einsum("pkri,pkrj,pk->pkij", Jc, Jp, w)           # (P,K,6,3)
    b_c = jnp.einsum("pkri,pkr,pk->ki", Jc, r, w)              # (K,6)
    b_p = jnp.einsum("pkri,pkr,pk->pi", Jp, r, w)              # (P,3)
    return U, V, Wm, b_c, b_p


def _schur_solve(U, V, Wm, b_c, b_p, fixed, lam):
    """Solve the damped normal equations by marginalizing point blocks."""
    K = U.shape[0]
    P = V.shape[0]
    eye3 = jnp.eye(3, dtype=V.dtype)
    eye6 = jnp.eye(6, dtype=U.dtype)

    V_d = V + (lam + 1e-8) * eye3[None]
    Vinv = jnp.linalg.inv(V_d)                                 # (P,3,3)

    # S_kl = delta_kl (U_k + lam I) - sum_p W_pk Vinv_p W_pl^T
    WVinv = jnp.einsum("pkij,pjl->pkil", Wm, Vinv)             # (P,K,6,3)
    S_cross = jnp.einsum("pkil,pmjl->kmij", WVinv, Wm)         # (K,K,6,6)
    S = -S_cross
    S = S.at[jnp.arange(K), jnp.arange(K)].add(U + lam * eye6[None])

    rhs = b_c - jnp.einsum("pkil,pl->ki", WVinv, b_p)          # (K,6)

    # Gauge/fixed handling: zero rows+cols of fixed cameras, identity diag.
    free = (~fixed).astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, :, None, None]
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        (1.0 - free)[:, None, None] * eye6[None]
    )
    rhs = rhs * free[:, None]

    S_full = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    L = jnp.linalg.cholesky(S_full + 1e-8 * jnp.eye(K * 6, dtype=S.dtype))
    dc = jax.scipy.linalg.cho_solve((L, True), rhs.reshape(K * 6))
    dc = dc.reshape(K, 6)

    # back-substitute points: dp = Vinv (b_p - sum_k W_pk^T dc_k)
    t = b_p - jnp.einsum("pkij,ki->pj", Wm, dc)
    dp = jnp.einsum("pij,pj->pi", Vinv, t)
    return dc, dp


def _schur_solve_cg(U, V, Wm, b_c, b_p, fixed, lam,
                    cg_iters: int | None = None,
                    axis: str | None = None):
    """Matrix-free PCG on the reduced camera system — the large-map path.

    The dense Cholesky in :func:`_schur_solve` materializes S as a
    (6K, 6K) matrix via an O(P*K^2) einsum; past a couple hundred keyframe
    slots that einsum dominates both FLOPs and HBM. Here S is never formed:
    each CG iteration applies

        y_k = (U_k + lam I) x_k - sum_p W_pk V^-1_p (sum_m W_pm^T x_m)

    as three O(P*K) einsums, preconditioned by the exact 6x6 block diagonal
    of S (block-Jacobi). ``cg_iters`` is the static upper bound (defaults to
    ~K: long camera chains need iterations proportional to the graph
    diameter; an under-converged stage-1 solve makes the outlier gate drop
    good observations). The loop exits early once the preconditioned
    residual has dropped 12 orders of magnitude below its start OR after
    ``6 * n_free`` iterations for ``n_free`` FREE cameras — at
    max_keyframes=1000 slot capacity with a handful of valid keyframes the
    solve costs a few dozen matvecs, not 1000. This is what replaces g2o's
    sparse-CG solvers (linear_solver_pcg.h) for the TPU: batched einsum
    matvecs instead of sparse triplet walks.

    ``axis``: name of a mesh axis the POINT dimension is sharded over
    (dist.ba_sharded). When set, ``U``/``b_c`` and every point-contracted
    term are partial sums over the local point shard and get ``psum``-ed;
    the per-CG-iteration wire cost is one (K, 6) reduce — independent of
    both P and K^2, unlike the dense path's (K, K, 6, 6) S_cross psum.
    """
    K = U.shape[0]
    if cg_iters is None:
        cg_iters = max(64, K)

    def psum(x):
        return jax.lax.psum(x, axis) if axis else x

    eye3 = jnp.eye(3, dtype=V.dtype)
    eye6 = jnp.eye(6, dtype=U.dtype)
    free = (~fixed).astype(U.dtype)

    V_d = V + (lam + 1e-8) * eye3[None]
    Vinv = jnp.linalg.inv(V_d)                                 # (P,3,3)
    WVinv = jnp.einsum("pkij,pjl->pkil", Wm, Vinv)             # (P,K,6,3)

    rhs = psum(b_c - jnp.einsum("pkil,pl->ki", WVinv, b_p)) * free[:, None]

    U_d = psum(U) + (lam + 1e-8) * eye6[None]

    def matvec(x):                                             # x (K,6)
        x = x * free[:, None]
        t = jnp.einsum("pkij,ki->pj", Wm, x)                   # (P,3)
        y = jnp.einsum("kij,kj->ki", U_d, x)
        y = y - psum(jnp.einsum("pkil,pl->ki", WVinv, t))
        # fixed cameras act as identity rows (keeps the operator PD)
        return y * free[:, None] + x * (1.0 - free)[:, None]

    # block-Jacobi preconditioner: exact 6x6 diagonal blocks of S
    D = U_d - psum(jnp.einsum("pkil,pkjl->kij", WVinv, Wm))    # (K,6,6)
    D = D * free[:, None, None] + eye6[None] * (1.0 - free)[:, None, None]
    Dinv = jnp.linalg.inv(D + 1e-8 * eye6[None])

    def precond(r):
        return jnp.einsum("kij,kj->ki", Dinv, r)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs  # b - A@0
    z0 = precond(r0)
    rz0 = jnp.sum(r0 * z0)

    # dynamic bound: graph-diameter heuristic on FREE cameras only; the
    # static cg_iters stays the compile-time ceiling
    n_free = jnp.sum(free).astype(jnp.int32)
    max_it = jnp.minimum(jnp.asarray(cg_iters, jnp.int32),
                         jnp.maximum(6 * n_free, 16))
    tol = 1e-12 * jnp.maximum(rz0, 1e-30)

    def cond(carry):
        _, _, _, _, rz, i = carry
        return (i < max_it) & (rz > tol)

    def body(carry):
        x, r, z, p, rz, i = carry
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, z, p, rz_new, i + 1

    x, *_ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, rz0, jnp.asarray(0, jnp.int32))
    )
    dc = x * free[:, None]

    t = b_p - jnp.einsum("pkij,ki->pj", Wm, dc)
    dp = jnp.einsum("pij,pj->pi", Vinv, t)
    return dc, dp


# keyframe-slot count above which solve() switches the reduced camera
# system from dense Cholesky to matrix-free PCG (static shape decision)
CG_KF_THRESHOLD = 200


def _robust_chi2(r, w, huber):
    n2 = jnp.sum(r * r, axis=-1)
    n = jnp.sqrt(jnp.maximum(n2, 0.0))
    rho = jnp.where(n <= huber, n2, 2.0 * huber * n - huber * huber)
    return jnp.sum(rho * w)


def solve(problem: BAProblem, huber: float, stage_iters=(5, 10),
          gate_thresh: float | None = None,
          method: str | None = None,
          cg_iters: int | None = None) -> BAResult:
    """Two-stage Levenberg-Marquardt with Schur elimination.

    ``huber`` and ``gate_thresh`` are in unit-plane units (pixels / focal).
    Stage 1 optimizes with all observations; observations whose squared
    error exceeds ``gate_thresh**2`` (or with negative depth) are then
    removed, and stage 2 re-optimizes — mirroring bundle.cc:192-209.

    ``method``: "chol" (dense Cholesky on the (6K,6K) reduced system) or
    "cg" (matrix-free block-Jacobi PCG, :func:`_schur_solve_cg`). Default
    picks by the static keyframe capacity: Cholesky up to
    ``CG_KF_THRESHOLD`` slots, CG beyond — so Zurich-scale maps
    (max_keyframes up to 1000, reference config_zurich.cfg) never build
    the dense reduced system.
    """
    if gate_thresh is None:
        gate_thresh = huber
    if method is None:
        method = "cg" if problem.poses.shape[0] > CG_KF_THRESHOLD else "chol"
    if method == "chol":
        schur = _schur_solve
    else:
        schur = functools.partial(_schur_solve_cg, cg_iters=cg_iters)

    def lm_run(poses, points, w_mask, iters):
        def body(_, carry):
            poses, points, lam, prev_chi2 = carry
            r, _, w0 = _residuals(poses, points, problem.obs_uv, w_mask)
            w = _robust_weights(r, w0, huber)
            U, V, Wm, b_c, b_p = _build_system(poses, points, r, w)
            dc, dp = schur(U, V, Wm, b_c, b_p, problem.fixed, lam)
            new_poses = se3.boxplus(poses, -dc)
            new_points = points - dp
            r2, _, w2 = _residuals(new_poses, new_points, problem.obs_uv, w_mask)
            chi2 = _robust_chi2(r2, _robust_weights(r2, w2, huber), huber)
            accept = chi2 < prev_chi2
            poses = jnp.where(accept, new_poses, poses)
            points = jnp.where(accept, new_points, points)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-9, 1e3)
            prev_chi2 = jnp.where(accept, chi2, prev_chi2)
            return poses, points, lam, prev_chi2

        r0, _, w0 = _residuals(poses, points, problem.obs_uv, w_mask)
        chi0 = _robust_chi2(r0, _robust_weights(r0, w0, huber), huber)
        lam0 = jnp.asarray(1e-4, jnp.float32)
        poses, points, _, chi2 = jax.lax.fori_loop(
            0, iters, body, (poses, points, lam0, chi0)
        )
        return poses, points, chi2

    w_mask = problem.obs_mask.astype(jnp.float32)
    poses, points, _ = lm_run(problem.poses, problem.points, w_mask,
                              stage_iters[0])

    # outlier gating between stages (bundle.cc:192-209)
    r, p_cam, w = _residuals(poses, points, problem.obs_uv, w_mask)
    err2 = jnp.sum(r * r, axis=-1)
    keep = (err2 < gate_thresh * gate_thresh) & (p_cam[..., 2] > 1e-4)
    w_mask2 = w_mask * keep

    poses, points, chi2 = lm_run(poses, points, w_mask2, stage_iters[1])

    return BAResult(
        poses=poses, points=points, chi2=chi2,
        inlier_mask=(w_mask2 > 0) & problem.obs_mask,
    )
