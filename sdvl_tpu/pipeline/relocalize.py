"""Relocalization: coarse direct alignment against all keyframes at once.

TPU-native replacement for SDVL::Relocalize (reference sdvl.cc:205-238):
the reference walks keyframes newest-to-oldest, running a "fast" coarse
image alignment per keyframe and stopping at the first acceptable error.
Serial early-exit is exactly what a TPU shouldn't do — instead every valid
keyframe is a vmap lane of ONE coarse alignment program, and the best lane
wins. The caller then re-tracks from the winning pose and applies the usual
match-count acceptance (sdvl.cc:225-231).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..solvers import image_align
from ..state.map_state import MapState


class RelocResult(NamedTuple):
    pose: jnp.ndarray   # (7,) best aligned pose
    error: jnp.ndarray  # () its residual
    kf: jnp.ndarray     # () winning keyframe slot


def relocalize(m: MapState, intr, cur_pyr, pose_guess: jnp.ndarray,
               level: int = 4, iters: int = 8,
               max_points: int = 256) -> RelocResult:
    """Coarse align the current frame against every keyframe; best wins.

    Each lane aligns on pyramid level ``level`` only (the reference's
    ``fast`` mode quits above the coarse levels too, image_align.cc:73-76),
    using up to ``max_points`` of that keyframe's observed points.
    """
    K, P, _ = m.capacities

    # per-KF point subset: top max_points observed slots (static shape)
    obs = m.obs_mask & m.pt_valid[None, :] & m.kf_valid[:, None]
    order = jnp.argsort(~obs, axis=1)[:, :max_points]        # (K, Mp)
    sel_ok = jnp.take_along_axis(obs, order, axis=1)
    pts = m.pt_pos[order]                                     # (K, Mp, 3)

    def one(kf_pyr_l, kf_pose, pts_k, ok_k):
        # each lane starts from ITS OWN keyframe pose (the reference aligns
        # kf -> current per keyframe, sdvl.cc:217-222); the caller's global
        # pose guess is typically garbage by the time tracking is lost
        res = image_align._level_align(
            kf_pyr_l, cur_pyr[level], intr, level,
            pts_k, ok_k, kf_pose, kf_pose, iters,
        )
        pose, chi2, n, _illum = res
        chi2 = jnp.where(n > 10, chi2, jnp.inf)
        return pose, chi2

    poses, errs = jax.vmap(one)(m.kf_pyr[level], m.kf_pose, pts, sel_ok)
    errs = jnp.where(m.kf_valid, errs, jnp.inf)
    best = jnp.argmin(errs)
    return RelocResult(pose=poses[best], error=errs[best],
                       kf=best.astype(jnp.int32))
