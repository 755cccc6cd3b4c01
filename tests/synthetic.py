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
    # multi-scale random rectangles give FAST corners at all octaves;
    # counts were tuned for h=512 and scale with extra height so feature
    # density stays constant (h=512 keeps the exact historical rng
    # sequence — golden trajectories depend on it)
    for size, count in ((64, 40), (32, 120), (16, 300), (8, 600)):
        count = int(round(count * h / 512))
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
                 n=(0.0, 0.25, 1.0), d: float = 3.0, seed: int = 7,
                 wrap: bool = True, tex_scale: int = 1):
        """tex_scale > 1 gives the plane a texture `tex_scale` times
        larger than one view, centred on the reference view — long
        trajectories see unique structure (needed for loop-closure tests
        where a tiling period shorter than the excursion would alias)."""
        self.wrap = wrap
        self.K = np.asarray(K, np.float64)
        self.Kinv = np.linalg.inv(self.K)
        n = np.asarray(n, np.float64)
        self.n = n / np.linalg.norm(n)
        self.d = d
        self.h, self.w = h, w
        self.th, self.tw = h * tex_scale, w * tex_scale
        self.off_y = (self.th - h) // 2
        self.off_x = (self.tw - w) // 2
        self.tex = make_texture(self.th, self.tw, seed)

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
        # wrap=True tiles the texture (infinite plane, never runs out of
        # structure); wrap=False clamps + blanks outside (unique texture,
        # needed for place-recognition tests where tiling would alias)
        mx = mx + self.off_x
        my = my + self.off_y
        x0 = np.floor(mx).astype(np.int64)
        y0 = np.floor(my).astype(np.int64)
        wx = mx - x0
        wy = my - y0
        if self.wrap:
            x0 %= self.tw
            y0 %= self.th
            x1 = (x0 + 1) % self.tw
            y1 = (y0 + 1) % self.th
        else:
            inside = (
                (mx >= 0) & (mx <= self.tw - 1)
                & (my >= 0) & (my <= self.th - 1)
            )
            x0 = np.clip(x0, 0, self.tw - 1)
            y0 = np.clip(y0, 0, self.th - 1)
            x1 = np.clip(x0 + 1, 0, self.tw - 1)
            y1 = np.clip(y0 + 1, 0, self.th - 1)
        f = self.tex
        out = (
            f[y0, x0] * (1 - wx) * (1 - wy)
            + f[y0, x1] * wx * (1 - wy)
            + f[y1, x0] * (1 - wx) * wy
            + f[y1, x1] * wx * wy
        )
        behind = pts[..., 2] <= 1e-9
        if not self.wrap:
            out = np.where(inside, out, 0.0)
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


class CylinderScene:
    """Camera orbiting inside a textured cylinder — the canonical
    loop-closure scenario: a 360-degree circuit returns to the start with
    accumulated drift, and the revisit is NOT covisibility-connected.

    World: cylinder of radius R around the y-axis, texture wrapping in
    azimuth (seam at theta = pi) and tiling vertically.
    """

    def __init__(self, K: np.ndarray, h: int, w: int, radius: float = 6.0,
                 px_per_m: float = 120.0, seed: int = 11,
                 tex_h: int = 512):
        self.K = np.asarray(K, np.float64)
        self.h, self.w = h, w
        self.R = radius
        self.px_per_m = px_per_m
        circumference = 2 * np.pi * radius
        tw = int(round(circumference * px_per_m))
        # tex_h sets the VERTICAL texture period (tex_h / px_per_m
        # meters).  The 512 default repeats every 4.27 m — at far-wall
        # depths the camera's vertical FOV spans more than one period,
        # so identical texture appears at two image heights (descriptor
        # aliasing: consistent-but-wrong matches, BoW place confusion).
        # Pass tex_h large enough that the visible span never wraps
        # (e.g. 2048 for the KITTI-geometry bench).
        self.tex = make_texture(tex_h, tw, seed)

    def _trace(self, Tcw: np.ndarray):
        """Per-pixel ray-cylinder hit: returns (theta, y, depth)."""
        R_cw = Tcw[:3, :3]
        t = Tcw[:3, 3]
        C = -R_cw.T @ t                       # camera center (world)
        u, v = np.meshgrid(np.arange(self.w, dtype=np.float64),
                           np.arange(self.h, dtype=np.float64))
        rays_c = np.stack(
            [(u - self.K[0, 2]) / self.K[0, 0],
             (v - self.K[1, 2]) / self.K[1, 1],
             np.ones_like(u)], -1)
        rays_w = rays_c @ R_cw                # R_cw^T applied row-wise
        # |C_xz + s * d_xz|^2 = R^2, take the positive root
        dx, dz = rays_w[..., 0], rays_w[..., 2]
        cx_, cz_ = C[0], C[2]
        a = dx * dx + dz * dz
        b = 2 * (cx_ * dx + cz_ * dz)
        c = cx_ * cx_ + cz_ * cz_ - self.R * self.R
        disc = np.maximum(b * b - 4 * a * c, 0.0)
        s = (-b + np.sqrt(disc)) / np.maximum(2 * a, 1e-12)
        hit = C[None, None, :] + s[..., None] * rays_w
        theta = np.arctan2(hit[..., 0], hit[..., 2])
        y = hit[..., 1]
        return theta, y, s

    def render(self, Tcw: np.ndarray) -> np.ndarray:
        theta, y, s = self._trace(Tcw)
        tw = self.tex.shape[1]
        th_ = self.tex.shape[0]
        mx = (theta + np.pi) / (2 * np.pi) * tw
        my = y * self.px_per_m
        x0 = np.floor(mx).astype(np.int64) % tw
        y0 = np.floor(my).astype(np.int64) % th_
        x1 = (x0 + 1) % tw
        y1 = (y0 + 1) % th_
        wx = (mx - np.floor(mx))
        wy = (my - np.floor(my))
        f = self.tex
        out = (
            f[y0, x0] * (1 - wx) * (1 - wy)
            + f[y0, x1] * wx * (1 - wy)
            + f[y1, x0] * (1 - wx) * wy
            + f[y1, x1] * wx * wy
        )
        return out.astype(np.float32)

    def depth_at(self, Tcw: np.ndarray) -> np.ndarray:
        _, _, s = self._trace(Tcw)
        # depth = z-component of the hit in camera frame = s (rays have
        # z=1 in camera frame before rotation) -> depth = s
        return s.astype(np.float32)


def circle_trajectory(n: int, orbit_r: float = 2.0,
                      total_angle: float = 2 * np.pi) -> list:
    """Camera positions on a circle, looking radially outward."""
    poses = []
    for i in range(n):
        phi = total_angle * i / n
        Cw = np.array([orbit_r * np.sin(phi), 0.0, orbit_r * np.cos(phi)])
        # camera z looks outward (radial), x tangent, y down-ish
        z_axis = np.array([np.sin(phi), 0.0, np.cos(phi)])
        x_axis = np.array([np.cos(phi), 0.0, -np.sin(phi)])
        y_axis = np.cross(z_axis, x_axis)
        Rwc = np.stack([x_axis, y_axis, z_axis], -1)
        Tcw = np.eye(4)
        Tcw[:3, :3] = Rwc.T
        Tcw[:3, 3] = -Rwc.T @ Cw
        poses.append(Tcw.astype(np.float32))
    return poses


def build_ring_map(K: int, pts_per_kf: int, span: int, n_feat: int,
                   drift_per_kf: float = 0.0, seed: int = 3):
    """Synthetic reference-scale map: K keyframes on a big ring, each
    spawning pts_per_kf world points observed by `span` consecutive
    keyframes (covisibility weight between neighbors ~ (span-1) *
    pts_per_kf, so strong >= 100 essential-graph edges exist).  With
    drift_per_kf > 0 the stored poses accumulate translational drift
    around the ring while points stay attached to their birth keyframe's
    drifted frame — the classic pre-loop-closure state.

    Returns (store, true_poses[K]).  Scale-test harness, not a renderer:
    feature slots carry random descriptors and on-ring pixel coords.
    """
    import numpy as np

    from orb_slam2_tpu.slam.map_store import FrameFeatures, MapStore

    rng = np.random.default_rng(seed)
    ring_r = 30.0
    store = MapStore(n_feat, kf_cap=K + 8,
                     pt_cap=max(1 << 12, 2 * K * pts_per_kf))
    true_poses = []
    drift = np.zeros(3)
    drifted = []
    for k in range(K):
        phi = 2 * np.pi * k / K
        Cw = np.array([ring_r * np.sin(phi), 0.0, ring_r * np.cos(phi)])
        z = np.array([np.sin(phi), 0.0, np.cos(phi)])
        x = np.array([np.cos(phi), 0.0, -np.sin(phi)])
        y = np.cross(z, x)
        Rwc = np.stack([x, y, z], -1)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc.T
        T[:3, 3] = -Rwc.T @ Cw
        true_poses.append(T.copy())
        Td = T.copy()
        Td[:3, 3] = -Rwc.T.astype(np.float32) @ (Cw + drift)
        drifted.append(Td)
        drift = drift + np.array([drift_per_kf, 0.0, drift_per_kf * 0.5])

    def feats():
        n = n_feat
        return FrameFeatures(
            xy=rng.uniform(0, 200, (n, 2)).astype(np.float32),
            xy_raw=np.zeros((n, 2), np.float32),
            ur=np.full(n, 1.0, np.float32),
            depth=np.full(n, 5.0, np.float32),
            octave=np.zeros(n, np.int32),
            angle=np.zeros(n, np.float32),
            desc=rng.integers(0, 2**32, (n, 8), dtype=np.uint32),
            valid=np.ones(n, bool),
            node=np.full(n, -1, np.int32),
            word=np.full(n, -1, np.int32),
        )

    kf_ids = [store.add_keyframe(feats(), drifted[k], float(k), k)
              for k in range(K)]
    # points born at each keyframe, in front of its drifted camera,
    # observed by the next `span` keyframes
    next_slot = np.zeros(K, np.int64)
    for k in range(K):
        Td = drifted[k]
        Cw = -Td[:3, :3].T @ Td[:3, 3]
        outward = Td[:3, :3].T @ np.array([0, 0, 1.0])
        for _ in range(pts_per_kf):
            p = (Cw + outward * rng.uniform(4, 8)
                 + rng.normal(0, 1.0, 3))
            pid = store.add_point(p.astype(np.float32), kf_ids[k],
                                  rng.integers(0, 2**32, 8,
                                               dtype=np.uint32))
            for d in range(span):
                ko = k + d
                if ko >= K:
                    break
                slot = int(next_slot[ko])
                if slot >= n_feat:
                    continue
                next_slot[ko] += 1
                store.add_observation(pid, kf_ids[ko], slot)
    for k in range(K):
        store.update_connections(kf_ids[k])
    return store, true_poses
