"""Pinhole camera model: batched projection / unprojection, mono + stereo.

Replaces the projection math scattered through the reference (Frame::isInFrustum
include/Frame.h:85, Frame::UnprojectStereo include/Frame.h:100, the reprojection
edges in src/Optimizer.cc, and radial-tangential undistortion in
Frame::UndistortKeyPoints). Stereo follows the reference's rectified convention:
a right-image x coordinate u_r = u - bf / z (src/Frame.cc ComputeStereoMatches).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import se3


class Intrinsics(NamedTuple):
    """Static per-camera parameters (from the YAML config, src/Tracking.cc:53-101)."""
    fx: float
    fy: float
    cx: float
    cy: float
    bf: float = 0.0           # baseline * fx (stereo/RGB-D); 0 for mono
    width: int = 640
    height: int = 480
    # radial-tangential distortion (k1, k2, p1, p2, k3)
    dist: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)

    @property
    def K(self):
        return jnp.array([[self.fx, 0.0, self.cx],
                          [0.0, self.fy, self.cy],
                          [0.0, 0.0, 1.0]])

    @property
    def baseline(self):
        return self.bf / self.fx


def project(cam: Intrinsics, pc):
    """Camera-frame points [..., 3] -> pixel coords [..., 2] (no distortion:
    the pipeline works on undistorted keypoints, as the reference does)."""
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pc[..., 0] * inv_z + cam.cx
    v = cam.fy * pc[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: Intrinsics, pc):
    """Camera-frame points -> (u, v, u_right) [..., 3]."""
    uv = project(cam, pc)
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - cam.bf * inv_z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def project_world(cam: Intrinsics, q_cw, t_cw, pw):
    """World points through pose Tcw -> pixels; also returns depth."""
    pc = se3.apply(q_cw, t_cw, pw)
    return project(cam, pc), pc[..., 2]


def backproject(cam: Intrinsics, uv, depth):
    """Pixels [..., 2] + depth [...] -> camera-frame points [..., 3]."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def unproject_world(cam: Intrinsics, q_cw, t_cw, uv, depth):
    """Pixels+depth -> world points via Twc (reference Frame::UnprojectStereo)."""
    pc = backproject(cam, uv, depth)
    q_wc, t_wc = se3.inverse(q_cw, t_cw)
    return se3.apply(q_wc, t_wc, pc)


def in_image(cam: Intrinsics, uv, margin=0.0):
    return ((uv[..., 0] >= margin) & (uv[..., 0] < cam.width - margin)
            & (uv[..., 1] >= margin) & (uv[..., 1] < cam.height - margin))


def distort(cam: Intrinsics, xy_norm):
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    k1, k2, p1, p2, k3 = cam.dist
    x, y = xy_norm[..., 0], xy_norm[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Intrinsics, uv, iters: int = 5):
    """Iteratively invert the distortion model (reference uses
    cv::undistortPoints in Frame::UndistortKeyPoints; same fixed-point scheme).
    Returns undistorted pixel coordinates."""
    if all(d == 0.0 for d in cam.dist):
        return uv
    x0 = (uv[..., 0] - cam.cx) / cam.fx
    y0 = (uv[..., 1] - cam.cy) / cam.fy
    xy0 = jnp.stack([x0, y0], axis=-1)
    xy = xy0
    for _ in range(iters):
        d = distort(cam, xy) - xy
        xy = xy0 - d
    u = xy[..., 0] * cam.fx + cam.cx
    v = xy[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)
