"""Map and trajectory figures (reference DrawScene equivalent).

The reference's Pangolin 3D view (ui/drawscene.cc:30-128) shows the camera
frustum trail, the point cloud, and depth-uncertainty segments for
unconverged candidates (fed from sdvl.cc:291-321). Headless equivalent:
matplotlib figures written to files.
"""

from __future__ import annotations

import numpy as np


def _cam_centers(poses_wc: np.ndarray) -> np.ndarray:
    """World camera centers from world->cam poses via the library SE3."""
    import jax.numpy as jnp

    from ..core import se3

    inv = np.asarray(se3.inverse(jnp.asarray(np.asarray(poses_wc,
                                                        np.float32))))
    return inv[..., 4:]


def plot_trajectory(poses_wc, gt_poses_wc=None, path: str | None = None,
                    ax=None):
    """Top-down (x-z) trajectory plot; optionally overlays ground truth."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    own = ax is None
    if own:
        _, ax = plt.subplots(figsize=(6, 6))
    c = _cam_centers(np.stack(poses_wc))
    ax.plot(c[:, 0], c[:, 2], "-", lw=1.2, label="estimate")
    if gt_poses_wc is not None:
        g = _cam_centers(np.stack(gt_poses_wc))
        ax.plot(g[:, 0], g[:, 2], "--", lw=1.0, label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    if own and path:
        plt.savefig(path, dpi=120, bbox_inches="tight")
        plt.close()
    return ax


def plot_map(m, trajectory=None, path: str | None = None,
             max_uncertainty_segments: int = 200):
    """3D-ish map figure: points, keyframe centers, camera trail, and
    rho +- 2 sigma depth-uncertainty segments for live candidates
    (drawscene.cc:103-121)."""
    import matplotlib

    matplotlib.use("Agg")
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from ..core import se3

    fig, ax = plt.subplots(figsize=(7, 7))
    pts = np.asarray(m.pt_pos)[np.asarray(m.pt_valid)]
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=2, c="#444444", label="points")

    kf_valid = np.asarray(m.kf_valid)
    kf_centers = _cam_centers(np.asarray(m.kf_pose))[kf_valid]
    if len(kf_centers):
        ax.scatter(kf_centers[:, 0], kf_centers[:, 2], marker="s", s=28,
                   c="tab:blue", label="keyframes")

    if trajectory is not None and len(trajectory):
        c = _cam_centers(np.stack([p for _, p in trajectory]))
        ax.plot(c[:, 0], c[:, 2], "-", lw=1.0, c="tab:green", label="trail")

    # candidate depth-uncertainty segments in world frame
    cand_valid = np.asarray(m.cand_valid)
    n = int(cand_valid.sum())
    if n:
        idx = np.nonzero(cand_valid)[0][:max_uncertainty_segments]
        rho = np.asarray(m.cand_rho)[idx]
        sig = np.sqrt(np.asarray(m.cand_sigma2))[idx]
        z_near = 1.0 / np.maximum(rho + 2 * sig, 1e-6)
        z_far = 1.0 / np.maximum(rho - 2 * sig, 1e-6)
        bear = np.asarray(m.cand_bearing)[idx]
        T_w_a = np.asarray(
            se3.inverse(jnp.asarray(np.asarray(m.kf_pose)[
                np.asarray(m.cand_kf)[idx]
            ]))
        )
        for k in range(len(idx)):
            pn = _apply(T_w_a[k], bear[k] * z_near[k])
            pf = _apply(T_w_a[k], bear[k] * np.minimum(z_far[k], 10 / max(rho[k], 1e-6)))
            ax.plot([pn[0], pf[0]], [pn[2], pf[2]], "-", lw=0.5,
                    c="tab:orange", alpha=0.5)

    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    if path:
        plt.savefig(path, dpi=120, bbox_inches="tight")
        plt.close()
    return ax


def _apply(pose7: np.ndarray, p: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    from ..core import se3

    return np.asarray(se3.transform(jnp.asarray(pose7), jnp.asarray(
        p.astype(np.float32))))
