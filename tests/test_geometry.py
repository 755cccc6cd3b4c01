"""SE3/Sim3/camera unit tests against closed-form and scipy references."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from orb_slam2_tpu.geometry import camera, se3, sim3


def rand_rot(rng, n=()):
    return Rotation.random(int(np.prod(n)) if n else None, random_state=rng)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        xi = jnp.asarray(rng.normal(0, 0.8, (64, 6)), jnp.float32)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)

    def test_exp_matches_scipy_rotation(self):
        rng = np.random.default_rng(1)
        w = rng.normal(0, 1.0, (32, 3))
        R_ours = np.asarray(se3.exp_so3(jnp.asarray(w, jnp.float32)))
        R_scipy = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)

    def test_log_so3_matches_scipy(self):
        rng = np.random.default_rng(2)
        R = Rotation.random(32, random_state=rng)
        w_ours = np.asarray(se3.log_so3(jnp.asarray(R.as_matrix(), jnp.float32)))
        w_scipy = R.as_rotvec()
        np.testing.assert_allclose(w_ours, w_scipy, atol=1e-4)

    def test_log_so3_near_pi(self):
        w = np.array([[np.pi - 1e-4, 0, 0], [0, 0, np.pi - 1e-4]])
        R = Rotation.from_rotvec(w).as_matrix()
        w2 = np.asarray(se3.log_so3(jnp.asarray(R, jnp.float32)))
        np.testing.assert_allclose(np.abs(w2), np.abs(w), atol=1e-2)

    def test_inverse_compose(self):
        rng = np.random.default_rng(3)
        xi = jnp.asarray(rng.normal(0, 0.5, (16, 6)), jnp.float32)
        T = se3.exp(xi)
        eye = np.asarray(se3.compose(T, se3.inverse(T)))
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5
        )

    def test_transform_and_center(self):
        rng = np.random.default_rng(4)
        R = Rotation.random(random_state=rng).as_matrix()
        t = rng.normal(0, 1, 3)
        T = se3.make_T(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
        p = rng.normal(0, 1, (10, 3))
        out = np.asarray(se3.transform(T, jnp.asarray(p, jnp.float32)))
        np.testing.assert_allclose(out, p @ R.T + t, atol=1e-5)
        c = np.asarray(se3.camera_center(T))
        np.testing.assert_allclose(c, -R.T @ t, atol=1e-5)

    def test_quaternion_roundtrip(self):
        rng = np.random.default_rng(5)
        R = Rotation.random(64, random_state=rng)
        q = np.asarray(se3.quat_from_rotation(jnp.asarray(R.as_matrix(), jnp.float32)))
        q_scipy = R.as_quat()  # also (x,y,z,w)
        # quaternions are sign-ambiguous
        dot = np.abs(np.sum(q * q_scipy, -1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-4)
        R2 = np.asarray(se3.rotation_from_quat(jnp.asarray(q, jnp.float32)))
        np.testing.assert_allclose(R2, R.as_matrix(), atol=1e-4)


class TestSim3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(6)
        xi = np.concatenate(
            [rng.normal(0, 0.5, (32, 6)), rng.normal(0, 0.3, (32, 1))], -1
        )
        S = sim3.exp(jnp.asarray(xi, jnp.float32))
        xi2 = np.asarray(sim3.log(S))
        np.testing.assert_allclose(xi2, xi, atol=3e-4)

    def test_exp_log_roundtrip_small_magnitudes(self):
        """Regression: the closed-form V coefficients had a f32 hole for
        theta, sigma in (1e-5, 1e-4) (safe-denominator substitution without
        a matching Taylor branch) producing NaN from log(exp(xi))."""
        rng = np.random.default_rng(8)
        for mag in (1e-3, 3e-4, 1e-4, 3e-5, 1e-5, 1e-6):
            xi = rng.normal(0, mag, (256, 7))
            S = sim3.exp(jnp.asarray(xi, jnp.float32))
            xi2 = np.asarray(sim3.log(S))
            assert np.isfinite(xi2).all(), mag
            # atol bounded by XLA f32 exp/log ULP error near s = 1
            np.testing.assert_allclose(xi2, xi, atol=1e-5)

    def test_sigma_zero_matches_se3(self):
        rng = np.random.default_rng(7)
        xi6 = rng.normal(0, 0.5, (8, 6))
        xi7 = np.concatenate([xi6, np.zeros((8, 1))], -1)
        R, t, s = sim3.exp(jnp.asarray(xi7, jnp.float32))
        T = np.asarray(se3.exp(jnp.asarray(xi6, jnp.float32)))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), T[:, :3, :3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), T[:, :3, 3], atol=1e-4)

    def test_compose_inverse(self):
        rng = np.random.default_rng(8)
        xi = jnp.asarray(
            np.concatenate(
                [rng.normal(0, 0.5, (8, 6)), rng.normal(0, 0.3, (8, 1))], -1
            ),
            jnp.float32,
        )
        S = sim3.exp(xi)
        I = sim3.compose(S, sim3.inverse(S))
        np.testing.assert_allclose(
            np.asarray(I[0]), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(I[1]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I[2]), 1.0, atol=1e-5)

    def test_apply_scaling(self):
        S = sim3.make(jnp.eye(3), jnp.zeros(3), 2.0)
        p = jnp.array([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(np.asarray(sim3.apply(S, p)), [[2, 4, 6]])

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(9)
        xi = jnp.asarray(
            np.concatenate(
                [rng.normal(0, 0.5, (8, 6)), rng.normal(0, 0.3, (8, 1))], -1
            ),
            jnp.float32,
        )
        S = sim3.exp(xi)
        S2 = sim3.from_matrix(sim3.matrix(S))
        for a, b in zip(S, S2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestCamera:
    def _intr(self):
        return camera.Intrinsics(
            jnp.float32(520.0), jnp.float32(521.0),
            jnp.float32(320.0), jnp.float32(240.0),
        )

    def test_project_backproject(self):
        rng = np.random.default_rng(10)
        intr = self._intr()
        pts = rng.uniform([-2, -2, 1], [2, 2, 10], (100, 3)).astype(np.float32)
        uv = camera.project(jnp.asarray(pts), intr)
        back = np.asarray(camera.backproject(uv, jnp.asarray(pts[:, 2]), intr))
        np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-5)

    def test_undistort_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(11)
        intr = self._intr()
        dist = np.array([0.26, -0.57, 0.0005, -0.0002, 0.5], np.float32)
        K = np.array(
            [[520.0, 0, 320.0], [0, 521.0, 240.0], [0, 0, 1]], np.float64
        )
        uv = rng.uniform([100, 100], [540, 380], (200, 2)).astype(np.float32)
        ours = np.asarray(
            camera.undistort_points(jnp.asarray(uv), intr, jnp.asarray(dist), iters=10)
        )
        cv = cv2.undistortPoints(
            uv.reshape(-1, 1, 2), K, dist.astype(np.float64), P=K
        ).reshape(-1, 2)
        np.testing.assert_allclose(ours, cv, atol=0.08)

    def test_distort_undistort_roundtrip(self):
        rng = np.random.default_rng(12)
        intr = self._intr()
        dist = jnp.array([0.1, -0.2, 0.001, 0.001, 0.0], jnp.float32)
        xy = rng.uniform(-0.4, 0.4, (100, 2)).astype(np.float32)
        xyd = camera.distort_normalized(jnp.asarray(xy), dist)
        uv_d = jnp.stack(
            [xyd[:, 0] * intr.fx + intr.cx, xyd[:, 1] * intr.fy + intr.cy], -1
        )
        uv_u = np.asarray(camera.undistort_points(uv_d, intr, dist, iters=12))
        expected = np.stack(
            [xy[:, 0] * 520.0 + 320.0, xy[:, 1] * 521.0 + 240.0], -1
        )
        np.testing.assert_allclose(uv_u, expected, atol=0.05)

    def test_stereo_projection(self):
        intr = self._intr()
        bf = jnp.float32(40.0)
        p = jnp.array([[0.5, 0.2, 4.0]])
        uvr = np.asarray(camera.project_stereo(p, intr, bf))
        assert uvr.shape == (1, 3)
        np.testing.assert_allclose(uvr[0, 2], uvr[0, 0] - 40.0 / 4.0, rtol=1e-6)

    def test_remap_identity(self):
        rng = np.random.default_rng(13)
        img = jnp.asarray(rng.uniform(0, 255, (48, 64)).astype(np.float32))
        ys, xs = np.mgrid[0:48, 0:64].astype(np.float32)
        out = np.asarray(camera.remap_bilinear(img, jnp.asarray(xs), jnp.asarray(ys)))
        np.testing.assert_allclose(out, np.asarray(img), atol=1e-4)


class TestTrajectoryMetrics:
    def test_ate_invariant_to_rigid_motion(self):
        from scipy.spatial.transform import Rotation

        from orb_slam2_tpu.io.trajectory import ate_rmse

        rng = np.random.default_rng(0)
        gt = rng.normal(0, 3, (40, 3))
        R = Rotation.from_euler("xyz", [0.3, -0.2, 0.9]).as_matrix()
        est = gt @ R.T + np.array([4.0, -2.0, 1.0])
        assert ate_rmse(est, gt) < 1e-6
        noisy = est + rng.normal(0, 0.05, est.shape)
        e = ate_rmse(noisy, gt)
        assert 0.02 < e < 0.12

    def test_rpe_zero_for_identical_and_drift_sensitive(self):
        from orb_slam2_tpu.io.trajectory import rpe_rmse

        n = 30
        T = np.tile(np.eye(4), (n, 1, 1))
        for i in range(n):
            T[i, 0, 3] = 0.1 * i
        t_e, r_e = rpe_rmse(T, T, delta=1)
        assert t_e < 1e-9 and r_e < 1e-6
        # per-frame drift of 1 mm -> RPE ~ 1 mm
        est = T.copy()
        for i in range(n):
            est[i, 0, 3] += 0.001 * i
        t_e, r_e = rpe_rmse(est, T, delta=1)
        assert abs(t_e - 0.001) < 1e-4
