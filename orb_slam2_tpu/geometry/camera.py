"""Pinhole camera model with radial-tangential distortion, in JAX.

Covers what the reference gets from OpenCV: projection, unprojection,
iterative undistortion of keypoints (ref: src/Frame.cc:404 UndistortKeyPoints
via cv::undistortPoints), image-bounds computation (src/Frame.cc:436), and
stereo rectification map generation (Examples/Stereo/stereo_euroc.cc:97-137
via cv::initUndistortRectifyMap).  All functions are batched over points.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Intrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @classmethod
    def from_settings(cls, s):
        f32 = lambda v: jnp.float32(v)  # noqa: E731
        return cls(f32(s.fx), f32(s.fy), f32(s.cx), f32(s.cy))

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


def project(pts_cam: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """Camera-frame 3D points (...,3) -> pixel coords (...,2).  No checks."""
    z = pts_cam[..., 2]
    inv_z = 1.0 / z
    u = intr.fx * pts_cam[..., 0] * inv_z + intr.cx
    v = intr.fy * pts_cam[..., 1] * inv_z + intr.cy
    return jnp.stack([u, v], -1)


def project_stereo(pts_cam: jnp.ndarray, intr: Intrinsics, bf) -> jnp.ndarray:
    """(...,3) -> (u_left, v, u_right) like the reference's stereo residuals
    (ref: src/Optimizer.cc stereo edges use [u, v, u - bf/z])."""
    uv = project(pts_cam, intr)
    ur = uv[..., 0] - bf / pts_cam[..., 2]
    return jnp.concatenate([uv, ur[..., None]], -1)


def backproject(uv: jnp.ndarray, depth: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """Pixels (...,2) + depth (...) -> camera-frame 3D (...,3)
    (ref: Frame::UnprojectStereo src/Frame.cc:666)."""
    x = (uv[..., 0] - intr.cx) / intr.fx * depth
    y = (uv[..., 1] - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], -1)


def distort_normalized(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply (k1,k2,p1,p2,k3) to normalized coords (...,2) — OpenCV model."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], -1)


def undistort_points(
    uv: jnp.ndarray, intr: Intrinsics, dist: jnp.ndarray, iters: int = 8
) -> jnp.ndarray:
    """Iterative undistortion, matching cv::undistortPoints' fixed-point
    scheme (ref usage: src/Frame.cc:404-434).  (...,2) pixels -> pixels."""
    x0 = (uv[..., 0] - intr.cx) / intr.fx
    y0 = (uv[..., 1] - intr.cy) / intr.fy
    xy0 = jnp.stack([x0, y0], -1)
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xn = (xy0[..., 0] - dx) / radial
        yn = (xy0[..., 1] - dy) / radial
        return jnp.stack([xn, yn], -1)

    import jax

    xy = jax.lax.fori_loop(0, iters, body, xy0)
    u = xy[..., 0] * intr.fx + intr.cx
    v = xy[..., 1] * intr.fy + intr.cy
    return jnp.stack([u, v], -1)


def compute_image_bounds(width, height, intr: Intrinsics, dist) -> np.ndarray:
    """Undistorted image bounds [minX, maxX, minY, maxY]
    (ref: Frame::ComputeImageBounds src/Frame.cc:436-464)."""
    if dist is None or float(np.abs(np.asarray(dist)).sum()) == 0.0:
        return np.array([0.0, float(width), 0.0, float(height)], np.float32)
    corners = jnp.array(
        [[0.0, 0.0], [width, 0.0], [0.0, height], [width, height]], jnp.float32
    )
    und = np.asarray(undistort_points(corners, intr, jnp.asarray(dist, jnp.float32)))
    return np.array(
        [
            min(und[0, 0], und[2, 0]),
            max(und[1, 0], und[3, 0]),
            min(und[0, 1], und[1, 1]),
            max(und[2, 1], und[3, 1]),
        ],
        np.float32,
    )


def rectify_maps(rect) -> tuple:
    """Build left/right remap grids from a RectificationParams block,
    equivalent to cv::initUndistortRectifyMap (ref: stereo_euroc.cc:97-137).

    Returns ((map_xl, map_yl), (map_xr, map_yr)) as float32 numpy arrays of
    shape (H, W): for each rectified pixel, the source pixel to sample.
    """
    H, W = rect.height, rect.width
    out = []
    for K, D, R, P in ((rect.K_l, rect.D_l, rect.R_l, rect.P_l),
                       (rect.K_r, rect.D_r, rect.R_r, rect.P_r)):
        fx_p, fy_p = P[0, 0], P[1, 1]
        cx_p, cy_p = P[0, 2], P[1, 2]
        u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64))
        x = (u - cx_p) / fx_p
        y = (v - cy_p) / fy_p
        ones = np.ones_like(x)
        rays = np.stack([x, y, ones], -1) @ np.linalg.inv(R).T
        xn = rays[..., 0] / rays[..., 2]
        yn = rays[..., 1] / rays[..., 2]
        d = np.zeros(5)
        d[: len(np.ravel(D))] = np.ravel(D)[:5]
        k1, k2, p1, p2, k3 = d
        r2 = xn * xn + yn * yn
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
        yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
        map_x = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
        map_y = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
        out.append((map_x, map_y))
    return out[0], out[1]


def remap_bilinear(img: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear remap (cv::remap INTER_LINEAR equivalent) on device."""
    H, W = img.shape
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    wx = map_x - x0
    wy = map_y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    f = img.astype(jnp.float32)
    v00 = f[y0i, x0i]
    v01 = f[y0i, x1i]
    v10 = f[y1i, x0i]
    v11 = f[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    inb = (map_x >= 0) & (map_x <= W - 1) & (map_y >= 0) & (map_y <= H - 1)
    return jnp.where(inb, out, 0.0)
