"""Sparse direct image alignment (SVO-style), batched and jitted.

TPU-native replacement for the reference's ImageAlign (reference
image_align.{h,cc}): coarse-to-fine inverse-compositional Gauss-Newton on the
6-DoF pose with 4x4 intensity patches around tracked features
(image_align.cc:46-267). The reference walks features and patch pixels in
scalar loops per GN iteration; here residuals for all N features x 16 pixels
are one batched gather, the normal equations one einsum, and the whole
coarse-to-fine schedule a single XLA program.

Rollback-on-chi2-increase (image_align.cc:109-111) is expressed as carrying
the best-so-far pose through the iteration loop instead of branching.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core import geometry, se3
from ..ops import interp

PATCH_HALF = 2  # 4x4 patches, reference Config::AlignPatchSize = 4 default


class ImageAlignResult(NamedTuple):
    pose: jnp.ndarray       # (7,) refined world->cam pose of current frame
    error: jnp.ndarray      # () final mean squared residual (intensity^2)
    n_used: jnp.ndarray     # () number of features contributing
    illum: jnp.ndarray      # (2,) affine illumination (gain-1, bias); zeros
                            # unless affine_illum was enabled


def _level_align(pyr_ref_l: jnp.ndarray, pyr_cur_l: jnp.ndarray, intr,
                 level: int, pts_w: jnp.ndarray, valid: jnp.ndarray,
                 pose_ref: jnp.ndarray, pose_init: jnp.ndarray,
                 iters: int, patch_half: int = PATCH_HALF,
                 affine_illum: bool = False,
                 illum_init: jnp.ndarray | None = None):
    """One pyramid level of inverse-compositional GN.

    Returns (pose, chi2, n, illum). With ``affine_illum`` the photometric
    model gains two dof, r = cur - ((1+a)*ref + b) — beyond the reference
    (image_align.cc assumes constant brightness; only its patch LK has a
    mean-brightness dof, matcher.cc:359-445). Both appearance Jacobians
    (-ref, -1) are constant under the inverse-compositional trick, so the
    8x8 normal matrix stays precomputed like the 6x6 one.
    """
    scale = 1.0 / (1 << level)
    N = pts_w.shape[0]
    PATCH_HALF = patch_half  # reference Config::AlignPatchSize // 2
    s = 2 * PATCH_HALF

    # --- Precompute reference patches + Jacobians (image_align.cc:208-267) ---
    p_ref = se3.transform(pose_ref, pts_w)              # (N,3) ref-cam coords
    px_ref = cam.project(intr, p_ref) * scale            # level coords
    ok = valid & (p_ref[..., 2] > 1e-3)
    ok = ok & cam.in_bounds(intr, px_ref / scale, margin=(PATCH_HALF + 2) / scale,
                            level=0)

    d = jnp.arange(s, dtype=jnp.float32) - PATCH_HALF
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([ox, oy], axis=-1).reshape(s * s, 2)

    pos_ref = px_ref[:, None, :] + offs[None]
    ref_val, ref_grad = interp.bilinear_with_grad(pyr_ref_l, pos_ref)  # (N,P),(N,P,2)

    # d(pixel@level)/d(twist) = scale * [fx 0; 0 fy] @ d(unitplane)/d(twist)
    J_uplane = geometry.jacobian_unit_plane(p_ref)       # (N,2,6)
    focal = jnp.stack([intr.fx * scale, intr.fy * scale])
    J_px = focal[None, :, None] * J_uplane               # (N,2,6)
    # inverse-compositional: J = grad_ref @ J_px, fixed across iterations
    J = jnp.einsum("npk,nkj->npj", ref_grad, J_px)       # (N,P,6)
    if affine_illum:
        # append d r / d a = -ref, d r / d b = -1 (both iteration-constant)
        J = jnp.concatenate([
            J,
            -ref_val[..., None],
            -jnp.ones(ref_val.shape + (1,), ref_val.dtype),
        ], axis=-1)                                      # (N,P,8)
    dof = J.shape[-1]
    w = ok.astype(jnp.float32)[:, None]                  # (N,1)
    Hmat = jnp.einsum("npi,npj,np->ij", J, J, jnp.broadcast_to(w, J.shape[:2]))
    Hmat = Hmat + 1e-6 * jnp.eye(dof, dtype=Hmat.dtype)

    # T_cur_ref parameterization: pose_cur = T_cr * pose_ref
    T_cr0 = se3.compose(pose_init, se3.inverse(pose_ref))
    ab0 = (jnp.zeros(2, jnp.float32) if illum_init is None
           else illum_init.astype(jnp.float32))

    def residuals(T_cr, ab):
        p_cur = se3.transform(T_cr, p_ref)
        px_cur = cam.project(intr, p_cur) * scale
        pos = px_cur[:, None, :] + offs[None]
        cur_val = interp.bilinear(pyr_cur_l, pos)
        inb = cam.in_bounds(intr, px_cur / scale,
                            margin=(PATCH_HALF + 2) / scale, level=0)
        m = (ok & inb & (p_cur[..., 2] > 1e-3)).astype(jnp.float32)[:, None]
        model = (1.0 + ab[0]) * ref_val + ab[1] if affine_illum else ref_val
        r = (cur_val - model) * m
        return r, m

    def _chi2(r, m):
        # a pose that throws (almost) every point out of the current view
        # must score as bad, not as a perfect zero-residual fit — otherwise
        # rollback (and relocalization lane selection) prefers garbage
        n_eff = jnp.sum(m)
        raw = jnp.sum(r * r) / jnp.maximum(n_eff, 1.0)
        return jnp.where(n_eff >= 5.0, raw, jnp.inf)

    def cond(carry):
        k, _T, _ab, _bT, _bab, _bchi, stop = carry
        return (k < iters) & ~stop

    def body(carry):
        k, T_cr, ab, best_T, best_ab, best_chi2, _ = carry
        r, m = residuals(T_cr, ab)
        chi2 = _chi2(r, m)
        # keep the best pose seen so far (functional rollback)
        better = chi2 < best_chi2
        best_T = jnp.where(better, T_cr, best_T)
        best_ab = jnp.where(better, ab, best_ab)
        best_chi2 = jnp.where(better, chi2, best_chi2)
        g = jnp.einsum("npj,np->j", J, r)
        dx = jnp.linalg.solve(Hmat, g[:, None])[:, 0]
        # early exit like the reference (image_align.cc:109-122): stop on a
        # chi2 increase (after the rollback is banked) or a ~zero update —
        # at steady state the motion-model prediction converges in a few
        # steps, and the GN chain is the tracker's latency bottleneck
        stop = ~better | (jnp.max(jnp.abs(dx[:6])) < 1e-7)
        # inverse-compositional update: T <- T * exp(dx)^-1
        T_cr = se3.compose(T_cr, se3.inverse(se3.exp(dx[:6])))
        if affine_illum:
            # GN step x <- x - H^-1 J^T r with J_a = -ref, J_b = -1 (the
            # pose block does the same through the exp(.)^-1 composition)
            ab = ab - dx[6:]
        return k + 1, T_cr, ab, best_T, best_ab, best_chi2, stop

    init = (jnp.asarray(0, jnp.int32), T_cr0, ab0, T_cr0, ab0,
            jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(False))
    _, T_cr, ab, best_T, best_ab, best_chi2, stop = jax.lax.while_loop(
        cond, body, init)
    # last evaluation to possibly accept the final iterate (best-so-far
    # semantics: accepting a coincidentally better post-stop pose is safe)
    r, m = residuals(T_cr, ab)
    chi2 = _chi2(r, m)
    better = chi2 < best_chi2
    best_T = jnp.where(better, T_cr, best_T)
    best_ab = jnp.where(better, ab, best_ab)
    best_chi2 = jnp.where(better, chi2, best_chi2)

    pose = se3.compose(best_T, pose_ref)
    return pose, best_chi2, jnp.sum(ok), best_ab


def compute_pose(pyr_ref: Sequence[jnp.ndarray], pyr_cur: Sequence[jnp.ndarray],
                 intr, pts_w: jnp.ndarray, valid: jnp.ndarray,
                 pose_ref: jnp.ndarray, pose_init: jnp.ndarray,
                 max_level: int = 4, min_level: int = 2,
                 iters: int = 10,
                 patch_half: int = PATCH_HALF,
                 affine_illum: bool = False) -> ImageAlignResult:
    """Coarse-to-fine direct alignment (reference image_align.cc:46-84:
    levels 4..2, 30 GN iterations; we default to 10 per level which matches
    its practical convergence).

    ``pts_w``: (N,3) world points of the reference frame's tracked features;
    ``pose_init``: motion-model prediction for the current frame.
    ``affine_illum`` adds a per-frame gain/bias photometric model (capability
    the reference lacks; its direct tracker assumes constant brightness);
    the estimate is carried coarse-to-fine like the pose.
    """
    pose = pose_init
    chi2 = jnp.asarray(0.0, jnp.float32)
    n = jnp.asarray(0, jnp.int32)
    illum = jnp.zeros(2, jnp.float32)
    for level in range(max_level, min_level - 1, -1):
        pose, chi2, n, illum = _level_align(
            pyr_ref[level], pyr_cur[level], intr, level,
            pts_w, valid, pose_ref, pose, iters, patch_half=patch_half,
            affine_illum=affine_illum, illum_init=illum,
        )
    return ImageAlignResult(pose=pose, error=chi2, n_used=n, illum=illum)
