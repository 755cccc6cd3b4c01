"""Synthetic scene rendering for integration tests.

Renders a tilted textured plane from arbitrary camera poses via exact
plane-induced homographies H = K (R - t n^T / d) K^-1 — ground-truth
camera trajectories with realistic trackable texture, no datasets needed
(SURVEY §4: the reference has no tests; this is our synthetic-geometry
integration layer)."""

from __future__ import annotations

import numpy as np


def make_texture(h: int, w: int, seed: int = 7) -> np.ndarray:
    """High-contrast blob texture with corners at many scales."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    # multi-scale random rectangles give FAST corners at all octaves
    for size, count in ((64, 40), (32, 120), (16, 300), (8, 600)):
        for _ in range(count):
            y = rng.integers(0, h - size)
            x = rng.integers(0, w - size)
            val = rng.uniform(40, 255)
            img[y : y + size // 2, x : x + size // 2] = val
            img[y + size // 2 : y + size, x + size // 2 : x + size] = (
                255 - val
            )
    # mild smoothing to avoid aliasing
    k = np.array([0.25, 0.5, 0.25], np.float32)
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)
    return np.clip(img, 0, 255)


class PlaneScene:
    """A textured plane observed by a pinhole camera.

    The texture is the image of the plane seen from the reference camera
    at identity; any other view is an exact homography warp of it.
    """

    def __init__(self, K: np.ndarray, h: int, w: int,
                 n=(0.0, 0.25, 1.0), d: float = 3.0, seed: int = 7):
        self.K = np.asarray(K, np.float64)
        self.Kinv = np.linalg.inv(self.K)
        n = np.asarray(n, np.float64)
        self.n = n / np.linalg.norm(n)
        self.d = d
        self.h, self.w = h, w
        self.tex = make_texture(h, w, seed)

    def homography(self, Tcw: np.ndarray) -> np.ndarray:
        """H mapping reference-image pixels -> current-view pixels.

        For the plane n^T X = d (reference-camera frame) and points
        X_cur = R X_ref + t, H = K (R + t n^T / d) K^-1."""
        R = Tcw[:3, :3]
        t = Tcw[:3, 3]
        H = self.K @ (R + np.outer(t, self.n) / self.d) @ self.Kinv
        return H / H[2, 2]

    def render(self, Tcw: np.ndarray) -> np.ndarray:
        """Inverse-warp the texture into the view at Tcw."""
        H = self.homography(Tcw)
        Hinv = np.linalg.inv(H)
        u, v = np.meshgrid(
            np.arange(self.w, dtype=np.float64),
            np.arange(self.h, dtype=np.float64),
        )
        ones = np.ones_like(u)
        pts = np.stack([u, v, ones], -1) @ Hinv.T
        mx = (pts[..., 0] / pts[..., 2]).astype(np.float32)
        my = (pts[..., 1] / pts[..., 2]).astype(np.float32)
        # texture tiles: the plane is effectively infinite, so long
        # trajectories never run out of trackable structure
        x0 = np.floor(mx).astype(np.int64)
        y0 = np.floor(my).astype(np.int64)
        wx = mx - x0
        wy = my - y0
        x0 %= self.w
        y0 %= self.h
        x1 = (x0 + 1) % self.w
        y1 = (y0 + 1) % self.h
        f = self.tex
        out = (
            f[y0, x0] * (1 - wx) * (1 - wy)
            + f[y0, x1] * wx * (1 - wy)
            + f[y1, x0] * (1 - wx) * wy
            + f[y1, x1] * wx * wy
        )
        behind = pts[..., 2] <= 1e-9
        return np.where(behind, 0.0, out).astype(np.float32)

    def depth_at(self, Tcw: np.ndarray) -> np.ndarray:
        """Per-pixel depth of the plane in the given view (for RGB-D)."""
        R = Tcw[:3, :3]
        t = Tcw[:3, 3]
        # plane in current camera frame: n_c^T X = d_c
        n_c = R @ self.n
        d_c = self.d - self.n @ (-R.T @ t)
        u, v = np.meshgrid(
            np.arange(self.w, dtype=np.float64),
            np.arange(self.h, dtype=np.float64),
        )
        rays = np.stack(
            [(u - self.K[0, 2]) / self.K[0, 0],
             (v - self.K[1, 2]) / self.K[1, 1],
             np.ones_like(u)], -1)
        denom = rays @ n_c
        z = d_c / np.maximum(denom, 1e-9)
        return z.astype(np.float32)


def stereo_sequence(K, h, w, baseline: float, poses) -> list:
    """Render (left, right) pairs for a list of Tcw poses."""
    scene = PlaneScene(K, h, w)
    out = []
    Trl = np.eye(4)
    Trl[0, 3] = -baseline      # right camera: x shifted by +b in world
    for Tcw in poses:
        left = scene.render(Tcw)
        right = scene.render(Trl @ Tcw)
        out.append((left, right))
    return scene, out


def straight_trajectory(n: int, step: float = 0.02,
                        yaw_step: float = 0.001) -> list:
    """Camera translating along +x with slight yaw; returns list of Tcw."""
    poses = []
    for i in range(n):
        yaw = yaw_step * i
        c, s = np.cos(yaw), np.sin(yaw)
        Rwc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        twc = np.array([step * i, 0.0, 0.0])
        Tcw = np.eye(4)
        Tcw[:3, :3] = Rwc.T
        Tcw[:3, 3] = -Rwc.T @ twc
        poses.append(Tcw.astype(np.float32))
    return poses
