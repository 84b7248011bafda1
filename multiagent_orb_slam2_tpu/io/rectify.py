"""Stereo undistort-rectify for EuRoC-style raw camera pairs.

The reference's EuRoC drivers build per-camera rectification maps from the
LEFT./RIGHT. K, D, R, P YAML matrices with cv::initUndistortRectifyMap and
cv::remap every frame (Examples/MultiAgent/euroc_two_seq.cc:66-112,
Examples/Stereo/stereo_euroc.cc). Here the inverse maps are precomputed once
on host (numpy) and the per-frame remap is a jitted bilinear gather — a pure
VPU op that XLA fuses with the downstream pyramid build.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rectify_map(K, D, R, P, width: int, height: int) -> np.ndarray:
    """Build the dst->src sampling map (equivalent to
    cv::initUndistortRectifyMap with CV_32FC2 output).

    For each destination pixel: back-rotate through R and the new projection
    P[:3,:3], apply the radial-tangential distortion model (k1,k2,p1,p2[,k3]),
    and project through the original K. Returns [H, W, 2] float32 (x, y)
    source coordinates.
    """
    K = np.asarray(K, np.float64).reshape(3, 3)
    D = np.asarray(D, np.float64).ravel()
    k1, k2, p1, p2 = D[0], D[1], D[2], D[3]
    k3 = D[4] if D.size > 4 else 0.0
    R = np.asarray(R, np.float64).reshape(3, 3)
    P = np.asarray(P, np.float64)
    Knew = P[:3, :3]

    u, v = np.meshgrid(np.arange(width, dtype=np.float64),
                       np.arange(height, dtype=np.float64))
    ones = np.ones_like(u)
    pix = np.stack([u, v, ones], axis=-1)          # [H,W,3]
    # x_h = R^-1 @ Knew^-1 @ [u v 1]
    M = np.linalg.inv(R) @ np.linalg.inv(Knew)
    xyz = pix @ M.T
    x = xyz[..., 0] / xyz[..., 2]
    y = xyz[..., 1] / xyz[..., 2]

    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    x_d = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    y_d = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y

    map_x = K[0, 0] * x_d + K[0, 1] * y_d + K[0, 2]
    map_y = K[1, 1] * y_d + K[1, 2]
    return np.stack([map_x, map_y], axis=-1).astype(np.float32)


@jax.jit
def remap_bilinear(img, mapping):
    """Bilinear sample img [H,W] at mapping [H',W',2] (x, y); out-of-range
    samples produce 0 (cv::remap BORDER_CONSTANT)."""
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape
    x = mapping[..., 0]
    y = mapping[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        val = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(ok, val, 0.0)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return out


class StereoRectifier:
    """Per-sequence rectifier built from LEFT./RIGHT. settings matrices
    (euroc_two_seq.cc:66-112). Callable on a (left, right) uint8/float pair."""

    def __init__(self, settings: dict):
        wl = int(settings.get("LEFT.width", settings.get("Camera.width", 752)))
        hl = int(settings.get("LEFT.height",
                              settings.get("Camera.height", 480)))
        wr = int(settings.get("RIGHT.width", wl))
        hr = int(settings.get("RIGHT.height", hl))
        self.map_l = jnp.asarray(rectify_map(
            settings["LEFT.K"], settings["LEFT.D"], settings["LEFT.R"],
            settings["LEFT.P"], wl, hl))
        self.map_r = jnp.asarray(rectify_map(
            settings["RIGHT.K"], settings["RIGHT.D"], settings["RIGHT.R"],
            settings["RIGHT.P"], wr, hr))

    @staticmethod
    def available(settings: dict) -> bool:
        return all(f"{side}.{m}" in settings for side in ("LEFT", "RIGHT")
                   for m in ("K", "D", "R", "P"))

    def __call__(self, left, right):
        return (remap_bilinear(jnp.asarray(left), self.map_l),
                remap_bilinear(jnp.asarray(right), self.map_r))
