"""AR demo support: plane detection from map points + virtual cube overlay.

TPU-native equivalent of the reference's AR example (ref:
Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.cc:642 `DetectPlane`,
`Plane::Recompute`, and ros_mono_ar.cc:169): the reference RANSACs a
plane from the current frame's tracked map points (50 iterations, 3-point
hypotheses, octave-scaled inlier tolerance) and anchors a virtual cube on
it.  Here every RANSAC hypothesis is evaluated at once as one batched
device computation (hypothesis generation, inlier voting and the
least-squares refit are a single jitted call), and the overlay rendering
stays on host.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PlaneFit(NamedTuple):
    normal: jnp.ndarray     # (3,) unit plane normal
    d: jnp.ndarray          # () offset: n.x + d = 0
    n_inliers: jnp.ndarray  # () int32
    inliers: jnp.ndarray    # (N,) bool
    ok: jnp.ndarray         # () bool


@functools.partial(jax.jit, static_argnames=("th",))
def fit_plane(points, mask, tol, samples, th: float = 3.0) -> PlaneFit:
    """Batched RANSAC plane fit.

    points: (N, 3) candidate world points (padded); mask: (N,) valid flags;
    tol: (N,) per-point inlier tolerance (the reference scales by the
    observation octave's sigma); samples: (S, 3) int32 pre-drawn triples
    (host-seeded like the reference's DUtils random).  All S hypotheses
    are scored in one (S, N) masked distance matrix, then the winner is
    refined by an eigendecomposition least-squares fit on its inliers.
    """
    p0 = points[samples[:, 0]]                       # (S, 3)
    p1 = points[samples[:, 1]]
    p2 = points[samples[:, 2]]
    n = jnp.cross(p1 - p0, p2 - p0)                  # (S, 3)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    degenerate = norm[:, 0] < 1e-9
    n = n / jnp.maximum(norm, 1e-9)
    d = -jnp.einsum("si,si->s", n, p0)               # (S,)

    dist = jnp.abs(jnp.einsum("si,ni->sn", n, points) + d[:, None])
    good = (dist < th * tol[None, :]) & mask[None, :]
    votes = jnp.where(degenerate, -1, good.sum(-1))  # (S,)
    best = jnp.argmax(votes)

    inl = good[best]                                 # (N,)
    w = inl.astype(points.dtype)[:, None]
    centroid = jnp.sum(points * w, 0) / jnp.maximum(w.sum(), 1.0)
    centered = (points - centroid) * w
    C = centered.T @ centered                        # (3, 3)
    _, vecs = jnp.linalg.eigh(C)
    n_ref = vecs[:, 0]                               # smallest eigenvector
    # keep the RANSAC winner's orientation
    n_ref = jnp.where(jnp.dot(n_ref, n[best]) < 0, -n_ref, n_ref)
    d_ref = -jnp.dot(n_ref, centroid)

    dist_ref = jnp.abs(points @ n_ref + d_ref)
    inl_ref = (dist_ref < th * tol) & mask
    return PlaneFit(
        normal=n_ref, d=d_ref,
        n_inliers=inl_ref.sum().astype(jnp.int32),
        inliers=inl_ref,
        ok=votes[best] > 0,
    )


def plane_pose(normal: np.ndarray, d: float,
               cam_center: np.ndarray) -> np.ndarray:
    """Tpw: plane frame -> world, z along the normal oriented toward the
    camera, origin at the camera's foot point on the plane (ref:
    ViewerAR.cc Plane::Recompute)."""
    n = np.asarray(normal, np.float64)
    n = n / max(np.linalg.norm(n), 1e-12)
    # orient toward the camera
    if np.dot(n, cam_center) + d < 0:
        n, d = -n, -d
    origin = cam_center - (np.dot(n, cam_center) + d) * n
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(up, n)) > 0.95:
        up = np.array([1.0, 0.0, 0.0])
    x = np.cross(up, n)
    x /= max(np.linalg.norm(x), 1e-12)
    y = np.cross(n, x)
    T = np.eye(4, dtype=np.float32)
    T[:3, 0] = x
    T[:3, 1] = y
    T[:3, 2] = n
    T[:3, 3] = origin
    return T


_CUBE_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0),
               (4, 5), (5, 7), (7, 6), (6, 4),
               (0, 4), (1, 5), (2, 6), (3, 7)]


def cube_corners(size: float) -> np.ndarray:
    """8 corners of a cube of side `size` resting on the plane (z in
    [0, size] in the plane frame)."""
    h = size / 2.0
    c = []
    for z in (0.0, size):
        for yy in (-h, h):
            for xx in (-h, h):
                c.append((xx, yy, z))
    return np.array(c, np.float32)


def draw_cube(img: np.ndarray, Tcw: np.ndarray, K: np.ndarray,
              Tpw: np.ndarray, size: float = 0.2,
              color=(0, 255, 255)) -> np.ndarray:
    """Project the virtual cube into the image and draw its wireframe
    (ref: ViewerAR.cc DrawCube)."""
    import cv2

    if img.ndim == 2:
        out = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_GRAY2BGR)
    else:
        out = img.copy()
    pw = cube_corners(size)
    pw_h = np.concatenate([pw, np.ones((8, 1), np.float32)], 1)
    pc = (Tcw @ Tpw @ pw_h.T).T[:, :3]
    z = pc[:, 2]
    uv = (K @ pc.T).T
    uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-9)
    for a, b in _CUBE_EDGES:
        if z[a] <= 0.05 or z[b] <= 0.05:
            continue
        cv2.line(out, (int(uv[a, 0]), int(uv[a, 1])),
                 (int(uv[b, 0]), int(uv[b, 1])), color, 2)
    return out


class ARViewer:
    """Headless AR overlay driver (ref: ros_mono_ar.cc + ViewerAR.cc):
    detect a dominant plane from the current frame's tracked map points,
    anchor a cube, and draw it into subsequent frames."""

    def __init__(self, system, cube_size: float = 0.2,
                 ransac_iters: int = 50, seed: int = 0):
        self.system = system
        self.cube_size = cube_size
        self.ransac_iters = ransac_iters
        self.rng = np.random.default_rng(seed)
        self.Tpw: Optional[np.ndarray] = None

    def _tracked_points(self):
        tracker = self.system.tracker
        frame = tracker.current
        if frame is None or tracker.state.name != "OK":
            return None, None
        store = self.system.store
        pids = frame.bindings[(frame.bindings >= 0) & frame.feats.valid]
        pids = pids[store.pt_valid[pids]]
        if len(pids) == 0:
            return None, None
        octaves = np.zeros(len(pids), np.int32)
        pts = store.pt_pos[pids]
        return pts, octaves

    def detect_plane(self, min_points: int = 20) -> bool:
        """RANSAC a plane from currently tracked points; anchors the cube
        (ref: ViewerAR::DetectPlane requires >= 20 tracked points)."""
        pts, octaves = self._tracked_points()
        if pts is None or len(pts) < min_points:
            return False
        sf = self.system.settings.scale_factor ** octaves
        med = np.median(np.linalg.norm(
            pts - np.median(pts, 0)[None, :], axis=1))
        tol = (0.02 * max(med, 1e-3) * sf).astype(np.float32)
        N = len(pts)
        samples = self.rng.integers(0, N, (self.ransac_iters, 3)).astype(
            np.int32)
        fit = fit_plane(
            jnp.asarray(pts.astype(np.float32)),
            jnp.ones(N, bool), jnp.asarray(tol), jnp.asarray(samples))
        if not bool(fit.ok) or int(fit.n_inliers) < min_points // 2:
            return False
        frame = self.system.tracker.current
        Tcw = frame.Tcw
        C = -Tcw[:3, :3].T @ Tcw[:3, 3]
        self.Tpw = plane_pose(np.asarray(fit.normal),
                              float(fit.d), C.astype(np.float64))
        return True

    def draw(self, img: np.ndarray) -> np.ndarray:
        """Overlay the cube on the current frame (detects a plane on
        first use)."""
        frame = self.system.tracker.current
        if frame is None or frame.Tcw is None:
            return img
        if self.Tpw is None and not self.detect_plane():
            return img
        return draw_cube(img, frame.Tcw, self.system.settings.K,
                         self.Tpw, self.cube_size)
