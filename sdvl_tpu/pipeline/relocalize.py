"""Relocalization: coarse direct alignment against candidate keyframes.

TPU-native replacement for SDVL::Relocalize (reference sdvl.cc:205-238):
the reference walks keyframes newest-to-oldest, running a "fast" coarse
image alignment per keyframe and stopping at the first acceptable error.
Serial early-exit is exactly what a TPU shouldn't do — instead candidate
keyframes become vmap lanes of ONE coarse alignment program, and the best
lane wins. The caller then re-tracks from the winning pose and applies the
usual match-count acceptance (sdvl.cc:225-231).

The fan-out is BOUNDED: at Zurich capacity (max_keyframes=1000) an
all-keyframe sweep would compile a 1000-lane program with a (K, P)
argsort into every localize-serving step. ``max_kf`` lanes are selected by
proximity of each keyframe's camera centre to the pose guess (newest-first
tie-break — the reference's walk order): O(K) distance work per call,
O(max_kf) everything else. Serving relocalizes from the last tracked pose,
where the spatial prior is exactly right. When the guess is genuinely
garbage (kidnapped robot / teleport), both drivers ESCALATE to a
``max_kf=K`` all-keyframe sweep after ``Config.reloc_escalate_after``
consecutive failed LOST frames (device_fsm.do_reloc, sdvl.handle_frame) —
the reference's global walk, paid for only when the prior has failed.
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
               max_points: int = 256, max_kf: int = 64) -> RelocResult:
    """Coarse align the current frame against candidate keyframes.

    Each lane aligns on pyramid level ``level`` only (the reference's
    ``fast`` mode quits above the coarse levels too, image_align.cc:73-76),
    starting from ITS OWN keyframe pose (the reference aligns kf -> current
    per keyframe, sdvl.cc:217-222 — the caller's global pose guess is often
    stale by the time tracking is lost), using up to ``max_points`` of that
    keyframe's observed points.
    """
    K, P, _ = m.capacities
    n_lanes = min(max_kf, K)

    if n_lanes < K:
        centers = se3.translation(se3.inverse(m.kf_pose))
        guess_c = se3.translation(se3.inverse(pose_guess))
        d = jnp.linalg.norm(centers - guess_c, axis=-1)
        # nearest keyframes first; newest wins ties (reference walk order)
        key = jnp.where(
            m.kf_valid,
            -d + 1e-6 * m.kf_frame_id.astype(jnp.float32),
            -jnp.inf,
        )
        _, sel = jax.lax.top_k(key, n_lanes)
        sel = sel.astype(jnp.int32)
    else:
        sel = jnp.arange(K, dtype=jnp.int32)

    kf_pyr_l = m.kf_pyr[level][sel]                 # (n, H/2^l, W/2^l)
    kf_pose = m.kf_pose[sel]
    kf_ok = m.kf_valid[sel]

    # per-KF point subset: top max_points observed slots (static shape)
    obs = (m.obs_mask[sel] & m.pt_valid[None, :] & kf_ok[:, None])
    order = jnp.argsort(~obs, axis=1)[:, :max_points]        # (n, Mp)
    sel_ok = jnp.take_along_axis(obs, order, axis=1)
    pts = m.pt_pos[order]                                     # (n, Mp, 3)

    def one(kf_pyr_k, kf_pose_k, pts_k, ok_k):
        res = image_align._level_align(
            kf_pyr_k, cur_pyr[level], intr, level,
            pts_k, ok_k, kf_pose_k, kf_pose_k, iters,
        )
        pose, chi2, n, _illum = res
        chi2 = jnp.where(n > 10, chi2, jnp.inf)
        return pose, chi2

    poses, errs = jax.vmap(one)(kf_pyr_l, kf_pose, pts, sel_ok)
    errs = jnp.where(kf_ok, errs, jnp.inf)
    best = jnp.argmin(errs)
    return RelocResult(pose=poses[best], error=errs[best],
                       kf=sel[best])
