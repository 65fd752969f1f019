"""Pinhole camera model with radial-tangential distortion, fully batched.

TPU-native replacement for the reference's Camera class (reference
camera.{h,cc}): project/unproject (camera.cc:69-98), full-image undistortion
(camera.cc:100-105), per-level bounds tests (camera.h:93-98) and the one-pixel
error angle feeding the depth-filter tau (camera.h:104-107).

Differences from the reference, by design:
  * intrinsics are a plain pytree (``Intrinsics``) passed explicitly — no
    singleton Config; everything vmaps over both points and cameras.
  * undistortion is a precomputed dense remap grid sampled with our bilinear
    kernel (one XLA gather) instead of per-frame ``cv::undistort``.
  * the reference only enables distortion when d0 != 0 (camera.cc:46 checks
    ``d0_`` five times — a quirk SURVEY.md flags); we check all coefficients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Static camera parameters. All fields are f32 scalars/arrays."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # (5,) = k1, k2, p1, p2, k3  (OpenCV order)
    width: int  # static python ints: shapes must stay static under jit
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, dist=None, width=640, height=480) -> "Intrinsics":
        # Leaves are HOST (numpy) values on purpose: an Intrinsics is
        # routinely closed over by jitted functions, and closure-captured
        # *device* arrays poison this TPU runtime into a ~30 ms/launch
        # synchronous mode (see ops/pyramid.py docstring). Numpy leaves
        # trace to inlined HLO literals, which are clean.
        import numpy as np

        if dist is None:
            dist = np.zeros(5, np.float32)
        return Intrinsics(
            fx=np.float32(fx), fy=np.float32(fy),
            cx=np.float32(cx), cy=np.float32(cy),
            dist=np.asarray(dist, np.float32),
            width=int(width), height=int(height),
        )


def project(intr: Intrinsics, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D points ``(...,3)`` -> pixel coords ``(...,2)`` (x, y).

    Assumes the image has already been undistorted (the pipeline undistorts
    once per frame, mirroring reference main.cc:133), so no distortion here.
    Points behind the camera produce garbage coordinates; callers mask on
    ``pts_cam[...,2] > 0`` exactly like reference visibility tests.
    """
    z = pts_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = intr.fx * pts_cam[..., 0] / safe_z + intr.cx
    v = intr.fy * pts_cam[..., 1] / safe_z + intr.cy
    return jnp.stack([u, v], axis=-1)


def unproject(intr: Intrinsics, px: jnp.ndarray) -> jnp.ndarray:
    """Pixels ``(...,2)`` -> unit bearing vectors ``(...,3)``.

    Reference camera.cc:69-98 normalizes the unprojected ray; we do too since
    depth-filter geometry (tau computation) relies on unit bearings.
    """
    x = (px[..., 0] - intr.cx) / intr.fx
    y = (px[..., 1] - intr.cy) / intr.fy
    ray = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


def project_unit_plane(pts_cam: jnp.ndarray) -> jnp.ndarray:
    """3D point -> unit-plane (normalized) coords ``(...,2)``.

    Static helper mirroring reference camera.h:110-116; the robust pose
    optimizer and homography both work on the unit plane.
    """
    z = pts_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    return pts_cam[..., :2] / safe_z[..., None]


def unit_plane_to_pixel(intr: Intrinsics, uv: jnp.ndarray) -> jnp.ndarray:
    u = intr.fx * uv[..., 0] + intr.cx
    v = intr.fy * uv[..., 1] + intr.cy
    return jnp.stack([u, v], axis=-1)


def pixel_error_angle(intr: Intrinsics) -> jnp.ndarray:
    """Angle subtended by one pixel; feeds depth-filter tau.

    Reference camera.h:104-107: ``atan(1/(2 fx)) * 2``.
    """
    return 2.0 * jnp.arctan(1.0 / (2.0 * intr.fx))


def in_bounds(intr: Intrinsics, px: jnp.ndarray, margin: float = 0.0,
              level: int = 0) -> jnp.ndarray:
    """Bounds test at a pyramid level (reference camera.h:93-98)."""
    scale = 1.0 / (1 << level)
    w = intr.width * scale
    h = intr.height * scale
    x, y = px[..., 0] * scale, px[..., 1] * scale
    return (x >= margin) & (y >= margin) & (x < w - margin) & (y < h - margin)


def distort_unit_plane(intr: Intrinsics, uv: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion on the unit plane (OpenCV model)."""
    k1, k2, p1, p2, k3 = (intr.dist[i] for i in range(5))
    x, y = uv[..., 0], uv[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xy = x * y
    xd = x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
    return jnp.stack([xd, yd], axis=-1)


def undistort_map(intr: Intrinsics) -> jnp.ndarray:
    """Dense remap grid ``(H, W, 2)``: for each undistorted output pixel the
    (x, y) source position in the distorted input image.

    Computed once at startup and closed over by the jitted per-frame
    preprocessing (the reference instead calls ``cv::undistort`` per frame,
    camera.cc:100-105, recomputing the same map implicitly).
    """
    ys = jnp.arange(intr.height, dtype=jnp.float32)
    xs = jnp.arange(intr.width, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    u = (grid_x - intr.cx) / intr.fx
    v = (grid_y - intr.cy) / intr.fy
    uv = jnp.stack([u, v], axis=-1)
    uvd = distort_unit_plane(intr, uv)
    src_x = uvd[..., 0] * intr.fx + intr.cx
    src_y = uvd[..., 1] * intr.fy + intr.cy
    return jnp.stack([src_x, src_y], axis=-1)


def has_distortion(intr) -> bool:
    """Host-side check (not jittable) used when building the pipeline."""
    import numpy as np

    return bool(np.any(np.abs(np.asarray(intr.dist)) > 1e-12))
