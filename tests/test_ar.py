"""AR plane detection + overlay tests (ref: ViewerAR.cc DetectPlane)."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.viz import ar


class TestFitPlane:
    def _cloud(self, rng, n_in=120, n_out=40):
        # plane: z = 0.3 x - 0.2 y + 1.5  ->  n ~ (-0.3, 0.2, 1)
        xy = rng.uniform(-2, 2, (n_in, 2))
        z = 0.3 * xy[:, 0] - 0.2 * xy[:, 1] + 1.5
        inliers = np.column_stack([xy, z + rng.normal(0, 0.005, n_in)])
        outliers = rng.uniform(-3, 3, (n_out, 3))
        pts = np.concatenate([inliers, outliers]).astype(np.float32)
        n_true = np.array([-0.3, 0.2, 1.0])
        n_true /= np.linalg.norm(n_true)
        d_true = -1.5 * n_true[2]
        return pts, n_true, d_true, n_in

    def test_recovers_plane_under_outliers(self):
        rng = np.random.default_rng(3)
        pts, n_true, d_true, n_in = self._cloud(rng)
        N = len(pts)
        samples = rng.integers(0, N, (100, 3)).astype(np.int32)
        fit = ar.fit_plane(
            jnp.asarray(pts), jnp.ones(N, bool),
            jnp.full(N, 0.02, jnp.float32), jnp.asarray(samples))
        assert bool(fit.ok)
        n = np.asarray(fit.normal)
        if np.dot(n, n_true) < 0:
            n, d = -n, -float(fit.d)
        else:
            d = float(fit.d)
        assert abs(np.dot(n, n_true)) > 0.999, n
        assert abs(d - d_true) < 0.02
        assert int(fit.n_inliers) > 0.9 * n_in

    def test_masked_points_ignored(self):
        rng = np.random.default_rng(4)
        pts, n_true, _, n_in = self._cloud(rng, n_in=60, n_out=0)
        # append garbage marked invalid
        junk = rng.uniform(10, 20, (50, 3)).astype(np.float32)
        allp = np.concatenate([pts, junk])
        mask = np.concatenate([np.ones(len(pts), bool),
                               np.zeros(len(junk), bool)])
        samples = rng.integers(0, len(pts), (80, 3)).astype(np.int32)
        fit = ar.fit_plane(
            jnp.asarray(allp), jnp.asarray(mask),
            jnp.full(len(allp), 0.02, jnp.float32), jnp.asarray(samples))
        assert bool(fit.ok)
        assert int(fit.n_inliers) <= len(pts)
        n = np.asarray(fit.normal)
        assert abs(np.dot(n, n_true)) > 0.995


class TestPlanePose:
    def test_orthonormal_and_oriented(self):
        n = np.array([0.1, -0.9, 0.3])
        n /= np.linalg.norm(n)
        d = -0.7
        cam = np.array([0.0, -3.0, 0.0])
        T = ar.plane_pose(n, d, cam)
        R = T[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99
        # origin lies on the plane
        o = T[:3, 3]
        z = R[:, 2]
        assert abs(np.dot(z, o) + (d if np.dot(n, cam) + d >= 0
                                   else -d)) < 1e-5
        # z axis points toward the camera side
        assert np.dot(z, cam - o) > 0


class TestDrawCube:
    def test_overlay_modifies_image(self):
        img = np.zeros((120, 160), np.uint8)
        K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
        Tcw = np.eye(4, dtype=np.float32)
        # plane 2m ahead facing the camera
        Tpw = np.eye(4, dtype=np.float32)
        Tpw[:3, 2] = [0, 0, -1]
        Tpw[:3, 0] = [1, 0, 0]
        Tpw[:3, 1] = [0, -1, 0]
        Tpw[:3, 3] = [0, 0, 2.0]
        out = ar.draw_cube(img, Tcw, K, Tpw, size=0.5)
        assert out.shape == (120, 160, 3)
        assert out.sum() > 0
