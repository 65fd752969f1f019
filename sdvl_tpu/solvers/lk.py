"""Inverse-compositional Lucas-Kanade patch alignment, batched over features.

TPU-native replacement for the reference Matcher's subpixel refinement
(reference matcher.cc:359-445 AlignPatch: 8x8 patch + mean-brightness dof,
inverse-compositional updates, SSE-aligned scalar loops). Here every feature
is a batch lane: one jitted program aligns N patches in parallel with a fixed
iteration count and convergence masks instead of early exits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import interp


class AlignResult(NamedTuple):
    xy: jnp.ndarray         # (N, 2) refined positions (same level as input)
    converged: jnp.ndarray  # (N,) bool
    error: jnp.ndarray      # (N,) final mean abs residual


def align_patches(img: jnp.ndarray, ref_patches: jnp.ndarray,
                  init_xy: jnp.ndarray, valid: jnp.ndarray,
                  iters: int = 10, tol: float = 0.03,
                  max_shift: float = 16.0) -> AlignResult:
    """Align reference patches to ``img`` starting from ``init_xy``.

    ``ref_patches`` is (N, s, s); positions are in the pixel coords of
    ``img``. Estimates per-feature [dx, dy, d_brightness] like the
    reference's 3-dof inverse-compositional LK (matcher.cc:359-445).

    The Hessian is precomputed from reference-patch gradients (the
    inverse-compositional trick the reference also uses); each of ``iters``
    steps is a gather + three reductions. Features whose update diverges
    beyond ``max_shift`` px or leaves the image are marked unconverged.
    """
    N, s, _ = ref_patches.shape
    H_img, W_img = img.shape
    half = s // 2

    # Reference gradients via central differences inside the patch.
    gx = 0.5 * (jnp.roll(ref_patches, -1, axis=2) - jnp.roll(ref_patches, 1, axis=2))
    gy = 0.5 * (jnp.roll(ref_patches, -1, axis=1) - jnp.roll(ref_patches, 1, axis=1))
    # Border rolls wrap; zero them so they don't pollute the normal matrix.
    edge = jnp.zeros((s, s), bool).at[1:-1, 1:-1].set(True)
    gx = gx * edge
    gy = gy * edge

    ones = jnp.ones_like(gx)
    J = jnp.stack([gx, gy, ones], axis=-1).reshape(N, s * s, 3)
    Hmat = jnp.einsum("npi,npj->nij", J, J)  # (N,3,3)
    Hmat = Hmat + 1e-4 * jnp.eye(3, dtype=Hmat.dtype)
    Hinv = jnp.linalg.inv(Hmat)

    d = jnp.arange(s, dtype=jnp.float32) - half
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([ox, oy], axis=-1).reshape(s * s, 2)

    ref_flat = ref_patches.reshape(N, s * s)

    def body(_, carry):
        xy, beta, active = carry
        pos = xy[:, None, :] + offs[None, :, :]
        cur = interp.bilinear(img, pos)  # (N, s*s)
        r = cur - ref_flat + beta[:, None]
        g = jnp.einsum("npi,np->ni", J, r)
        dx = jnp.einsum("nij,nj->ni", Hinv, g)
        # inverse-compositional: subtract the update
        step = jnp.where(active[:, None], dx, 0.0)
        xy = xy - step[:, :2]
        beta = beta - step[:, 2]
        active = active & (jnp.abs(step[:, 0]) + jnp.abs(step[:, 1]) > tol)
        return xy, beta, active

    xy0 = init_xy.astype(jnp.float32)
    beta0 = jnp.zeros((N,), jnp.float32)
    xy, beta, _ = jax.lax.fori_loop(0, iters, body, (xy0, beta0, valid))

    pos = xy[:, None, :] + offs[None, :, :]
    cur = interp.bilinear(img, pos)
    err = jnp.mean(jnp.abs(cur - ref_flat + beta[:, None]), axis=-1)

    shift = jnp.linalg.norm(xy - xy0, axis=-1)
    inb = (
        (xy[:, 0] >= half) & (xy[:, 1] >= half)
        & (xy[:, 0] < W_img - half - 1) & (xy[:, 1] < H_img - half - 1)
    )
    converged = valid & inb & (shift < max_shift)
    return AlignResult(xy=xy, converged=converged, error=err)


def align_patches_pyramid(pyr, level: jnp.ndarray, ref_patches: jnp.ndarray,
                          init_xy_l0: jnp.ndarray, valid: jnp.ndarray,
                          iters: int = 10, max_shift: float = 16.0
                          ) -> AlignResult:
    """Per-lane dynamic-level LK: each feature aligns at its own pyramid
    level (the reference picks a search level per feature from the warp
    determinant, matcher.cc:314-323, then aligns there).

    One LK loop for all lanes: positions are carried in level-0 coords,
    per-lane steps/offsets are scaled by 2^level, and sampling goes through
    the flat-pyramid gather (4 taps per sample at the lane's own level).
    This replaces the old run-LK-at-every-level-then-select structure,
    which cost levels x the gathers AND levels x the iterations.
    """
    import numpy as np

    N, s, _ = ref_patches.shape
    half = s // 2
    lvl = level.astype(jnp.int32)
    scale = jnp.exp2(lvl.astype(jnp.float32))  # (N,) level->l0 pixel scale

    gx = 0.5 * (jnp.roll(ref_patches, -1, axis=2) - jnp.roll(ref_patches, 1, axis=2))
    gy = 0.5 * (jnp.roll(ref_patches, -1, axis=1) - jnp.roll(ref_patches, 1, axis=1))
    edge = jnp.zeros((s, s), bool).at[1:-1, 1:-1].set(True)
    gx = gx * edge
    gy = gy * edge
    ones = jnp.ones_like(gx)
    J = jnp.stack([gx, gy, ones], axis=-1).reshape(N, s * s, 3)
    Hmat = jnp.einsum("npi,npj->nij", J, J) + 1e-4 * jnp.eye(3)
    Hinv = jnp.linalg.inv(Hmat)

    d = jnp.arange(s, dtype=jnp.float32) - half
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([ox, oy], axis=-1).reshape(s * s, 2)
    ref_flat = ref_patches.reshape(N, s * s)

    def sample(xy_l0):
        pos = xy_l0[:, None, :] + offs[None] * scale[:, None, None]
        return interp.bilinear_pyramid(pyr, lvl[:, None], pos)

    def body(_, carry):
        xy, beta, active = carry  # xy in level-0 coords
        cur = sample(xy)
        r = cur - ref_flat + beta[:, None]
        g = jnp.einsum("npi,np->ni", J, r)
        dx = jnp.einsum("nij,nj->ni", Hinv, g)  # step in LEVEL pixels
        step = jnp.where(active[:, None], dx, 0.0)
        xy = xy - step[:, :2] * scale[:, None]
        beta = beta - step[:, 2]
        active = active & (jnp.abs(step[:, 0]) + jnp.abs(step[:, 1]) > 0.03)
        return xy, beta, active

    xy0 = init_xy_l0.astype(jnp.float32)
    beta0 = jnp.zeros((N,), jnp.float32)
    xy, beta, _ = jax.lax.fori_loop(0, iters, body, (xy0, beta0, valid))

    err = jnp.mean(jnp.abs(sample(xy) - ref_flat + beta[:, None]), axis=-1)

    # in-bounds in each lane's own level frame (numpy tables: see
    # interp._pyr_meta for why these must not be device constants)
    Hs = np.asarray([p.shape[0] for p in pyr], np.int32)
    Ws = np.asarray([p.shape[1] for p in pyr], np.int32)
    Hl = jnp.take(Hs, lvl).astype(jnp.float32)
    Wl = jnp.take(Ws, lvl).astype(jnp.float32)
    xl = xy[:, 0] / scale
    yl = xy[:, 1] / scale
    inb = (
        (xl >= half) & (yl >= half)
        & (xl < Wl - half - 1) & (yl < Hl - half - 1)
    )
    shift = jnp.linalg.norm(xy - xy0, axis=-1)
    converged = valid & inb & (shift < max_shift)
    return AlignResult(xy=xy, converged=converged, error=err)
