"""Estimator tests on synthetic camera-point worlds with known optima."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from orb_slam2_tpu.geometry import se3
from orb_slam2_tpu.solvers import epnp, horn, initializer, pose_lm, sim3_solver
from orb_slam2_tpu.solvers.triangulation import triangulate_dlt

FX, FY, CX, CY = 520.0, 520.0, 320.0, 240.0
K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)


def make_world(rng, n=200, depth=(4.0, 10.0)):
    pts = np.stack(
        [
            rng.uniform(-3, 3, n),
            rng.uniform(-2, 2, n),
            rng.uniform(*depth, n),
        ],
        -1,
    ).astype(np.float32)
    return pts


def project(pts_c):
    z = pts_c[:, 2]
    return np.stack(
        [FX * pts_c[:, 0] / z + CX, FY * pts_c[:, 1] / z + CY], -1
    )


def cam_pose(rng, rot_deg=5.0, trans=0.3):
    R = Rotation.from_rotvec(
        rng.normal(0, np.radians(rot_deg), 3)
    ).as_matrix()
    t = rng.normal(0, trans, 3)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


class TestPoseLM:
    def test_converges_from_perturbed_pose(self):
        rng = np.random.default_rng(0)
        pts = make_world(rng)
        T_true = cam_pose(rng)
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        uv = project(pc) + rng.normal(0, 0.5, (len(pts), 2))
        obs = pose_lm.PoseObs(
            pts_w=jnp.asarray(pts),
            uv=jnp.asarray(
                np.concatenate([uv, -np.ones((len(pts), 1))], -1), jnp.float32
            ),
            inv_sigma2=jnp.ones(len(pts)),
            mask=jnp.ones(len(pts), bool),
        )
        T0 = cam_pose(rng, rot_deg=3.0, trans=0.15) @ T_true
        T_opt, inliers, n = pose_lm.optimize_pose(
            jnp.asarray(T0), obs, FX, FY, CX, CY, 40.0
        )
        T_opt = np.asarray(T_opt)
        err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(T_true) @ T_opt)))
        assert np.abs(err).max() < 0.01, err
        assert int(n) > 180

    def test_rejects_outliers(self):
        rng = np.random.default_rng(1)
        pts = make_world(rng)
        T_true = cam_pose(rng)
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        uv = project(pc) + rng.normal(0, 0.3, (len(pts), 2))
        # corrupt 25%
        n_out = 50
        uv[:n_out] += rng.uniform(20, 80, (n_out, 2))
        obs = pose_lm.PoseObs(
            pts_w=jnp.asarray(pts),
            uv=jnp.asarray(
                np.concatenate([uv, -np.ones((len(pts), 1))], -1), jnp.float32
            ),
            inv_sigma2=jnp.ones(len(pts)),
            mask=jnp.ones(len(pts), bool),
        )
        T0 = cam_pose(rng, rot_deg=1.5, trans=0.08) @ T_true
        T_opt, inliers, n = pose_lm.optimize_pose(
            jnp.asarray(T0), obs, FX, FY, CX, CY, 40.0
        )
        inl = np.asarray(inliers)
        assert inl[:n_out].sum() < 5           # outliers rejected
        assert inl[n_out:].sum() > 130
        err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(T_opt))))
        assert np.abs(err).max() < 0.02, err

    def test_stereo_observations(self):
        rng = np.random.default_rng(2)
        bf = 40.0
        pts = make_world(rng)
        T_true = cam_pose(rng)
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        uv = project(pc)
        ur = uv[:, 0] - bf / pc[:, 2]
        obs = pose_lm.PoseObs(
            pts_w=jnp.asarray(pts),
            uv=jnp.asarray(np.concatenate([uv, ur[:, None]], -1), jnp.float32),
            inv_sigma2=jnp.ones(len(pts)),
            mask=jnp.ones(len(pts), bool),
        )
        T0 = cam_pose(rng, rot_deg=4.0, trans=0.2) @ T_true
        T_opt, _, n = pose_lm.optimize_pose(
            jnp.asarray(T0), obs, FX, FY, CX, CY, bf
        )
        err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(T_opt))))
        assert np.abs(err).max() < 1e-3, err
        assert int(n) == len(pts)


class TestTriangulation:
    def test_exact_recovery(self):
        rng = np.random.default_rng(3)
        pts = make_world(rng, 50)
        T1 = np.eye(4, dtype=np.float32)
        T2 = cam_pose(rng, rot_deg=3, trans=0.5)
        P1 = (K @ T1[:3]).astype(np.float32)
        P2 = (K @ T2[:3]).astype(np.float32)
        uv1 = project(pts)
        pc2 = pts @ T2[:3, :3].T + T2[:3, 3]
        uv2 = project(pc2)
        X = np.asarray(
            triangulate_dlt(
                jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1), jnp.asarray(uv2)
            )
        )
        np.testing.assert_allclose(X, pts, atol=5e-2)

    def test_degenerate_pairs_fail_new_point_gates(self):
        """The inhomogeneous DLT (w=1) differs from the reference's SVD
        null-vector exactly for near-infinite / parallel-ray systems;
        the fast path's correctness rests on CreateNewMapPoints' gates
        rejecting those — pin that invariant (ref: src/LocalMapping.cc:
        288-431 depth/parallax/chi2 gates)."""
        from orb_slam2_tpu.solvers.triangulation import triangulate_and_gate

        n = 8
        rng = np.random.default_rng(11)
        T1 = np.eye(4, dtype=np.float32)

        def gate(T2, xy1, xy2):
            res = triangulate_and_gate(
                jnp.asarray(T1), jnp.asarray(T2.astype(np.float32)),
                jnp.asarray(xy1.astype(np.float32)),
                jnp.asarray(xy2.astype(np.float32)),
                jnp.full(n, -1.0, jnp.float32), jnp.full(n, -1.0, jnp.float32),
                jnp.full(n, -1.0, jnp.float32), jnp.full(n, -1.0, jnp.float32),
                jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
                jnp.ones(n, bool),
                jnp.float32(K[0, 0]), jnp.float32(K[1, 1]),
                jnp.float32(K[0, 2]), jnp.float32(K[1, 2]), jnp.float32(10.0),
                jnp.asarray(1.2 ** np.arange(8, dtype=np.float32)),
                jnp.asarray(1.44 ** np.arange(8, dtype=np.float32)),
            )
            return np.asarray(res.good)

        # (a) pure rotation: identical camera centers -> parallel rays,
        # singular normal equations; every candidate must be rejected
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = Rotation.from_euler("y", 2, degrees=True).as_matrix()
        pts = make_world(rng, n)
        uv1 = project(pts)
        uv2 = project(pts @ T2[:3, :3].T + T2[:3, 3])
        assert not gate(T2, uv1, uv2).any()

        # (b) near-zero parallax (mono): tiny baseline, far points —
        # cos(rays) > 0.9998 and no stereo fallback -> rejected
        T2 = np.eye(4, dtype=np.float32)
        T2[0, 3] = 1e-4
        far = pts * np.array([1, 1, 500], np.float32)
        uv1 = project(far)
        uv2 = project(far @ T2[:3, :3].T + T2[:3, 3])
        assert not gate(T2, uv1, uv2).any()

        # control: a well-conditioned pair passes for most candidates
        T2 = cam_pose(rng, rot_deg=3, trans=0.5)
        uv1 = project(pts)
        uv2 = project(pts @ T2[:3, :3].T + T2[:3, 3])
        assert gate(T2, uv1, uv2).sum() >= n - 2


class TestHorn:
    def test_rigid_recovery(self):
        rng = np.random.default_rng(4)
        p1 = rng.normal(0, 2, (30, 3)).astype(np.float32)
        R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
        t = rng.normal(0, 1, 3).astype(np.float32)
        p2 = p1 @ R.T + t
        R2, t2, s2 = horn.horn_align(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(30), with_scale=False
        )
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-4)

    def test_scale_recovery(self):
        rng = np.random.default_rng(5)
        p1 = rng.normal(0, 2, (30, 3)).astype(np.float32)
        R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
        t = rng.normal(0, 1, 3).astype(np.float32)
        s = 1.7
        p2 = s * (p1 @ R.T) + t
        R2, t2, s2 = horn.horn_align(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(30), with_scale=True
        )
        assert abs(float(s2) - s) < 1e-3
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)

    def test_weighted_ignores_outliers(self):
        rng = np.random.default_rng(6)
        p1 = rng.normal(0, 2, (30, 3)).astype(np.float32)
        R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
        p2 = p1 @ R.T
        p2[:5] += 10.0
        w = np.ones(30, np.float32)
        w[:5] = 0.0
        R2, t2, _ = horn.horn_align(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(w), with_scale=False
        )
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)


class TestInitializer:
    def _run(self, planar: bool, rng):
        n = 150
        if planar:
            pts = np.stack(
                [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, 6.0)],
                -1,
            ).astype(np.float32)
        else:
            pts = make_world(rng, n)
        T2 = cam_pose(rng, rot_deg=4, trans=0.0)
        T2[:3, 3] = np.array([0.6, 0.05, 0.02])  # sideways baseline
        uv1 = project(pts) + rng.normal(0, 0.4, (n, 2))
        pc2 = pts @ T2[:3, :3].T + T2[:3, 3]
        uv2 = project(pc2) + rng.normal(0, 0.4, (n, 2))
        inb = (
            (uv1[:, 0] > 0) & (uv1[:, 0] < 640) & (uv1[:, 1] > 0) & (uv1[:, 1] < 480)
            & (uv2[:, 0] > 0) & (uv2[:, 0] < 640) & (uv2[:, 1] > 0) & (uv2[:, 1] < 480)
        )
        samples = initializer.make_ransac_samples(n, rng)
        res = initializer.initialize(
            jnp.asarray(uv1, jnp.float32),
            jnp.asarray(uv2, jnp.float32),
            jnp.asarray(inb),
            jnp.asarray(K),
            jnp.asarray(samples),
        )
        return res, T2, pts

    def test_general_scene_uses_fundamental(self):
        rng = np.random.default_rng(7)
        res, T2, pts = self._run(planar=False, rng=rng)
        assert bool(res.success)
        assert not bool(res.used_homography)
        R_est = np.asarray(res.R21)
        t_est = np.asarray(res.t21)
        np.testing.assert_allclose(R_est, T2[:3, :3], atol=5e-3)
        t_true = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
        cos = abs(np.dot(t_est / np.linalg.norm(t_est), t_true))
        assert cos > 0.999, cos
        # triangulated structure should match up to global scale
        good = np.asarray(res.good_mask)
        scale = np.median(pts[good, 2] / np.asarray(res.points3d)[good, 2])
        err = np.abs(np.asarray(res.points3d)[good] * scale - pts[good])
        assert np.percentile(err, 95) < 0.3, np.percentile(err, 95)
        assert err.max() < 1.0, err.max()

    def test_planar_scene_uses_homography(self):
        rng = np.random.default_rng(8)
        res, T2, pts = self._run(planar=True, rng=rng)
        assert bool(res.used_homography)
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.R21), T2[:3, :3], atol=1e-2)

    def test_pure_rotation_fails(self):
        rng = np.random.default_rng(9)
        n = 150
        pts = make_world(rng, n)
        T2 = cam_pose(rng, rot_deg=5, trans=0.0)
        T2[:3, 3] = 0.0
        uv1 = project(pts)
        pc2 = pts @ T2[:3, :3].T
        uv2 = project(pc2)
        samples = initializer.make_ransac_samples(n, rng)
        res = initializer.initialize(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.ones(n, dtype=bool), jnp.asarray(K), jnp.asarray(samples),
        )
        assert not bool(res.success)  # no parallax -> must reject


class TestEPnP:
    def test_recovers_pose_with_outliers(self):
        rng = np.random.default_rng(10)
        n = 120
        pts = make_world(rng, n)
        T_true = cam_pose(rng, rot_deg=25, trans=1.0)
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        keep = pc[:, 2] > 0.5
        uv = project(pc) + rng.normal(0, 0.5, (n, 2))
        n_out = 30
        uv[:n_out] = rng.uniform([0, 0], [640, 480], (n_out, 2))
        samples = np.stack(
            [rng.choice(n, epnp.MIN_SET, replace=False) for _ in range(300)]
        ).astype(np.int32)
        res = epnp.solve_pnp_ransac(
            jnp.asarray(pts), jnp.asarray(uv, jnp.float32),
            jnp.full(n, 5.991, jnp.float32) * 4.0,
            jnp.asarray(keep), jnp.asarray(samples),
            FX, FY, CX, CY,
        )
        assert bool(res.success)
        T_est = np.asarray(res.Tcw)
        err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(T_true) @ T_est)))
        assert np.abs(err).max() < 0.05, err
        inl = np.asarray(res.inliers)
        assert inl[:n_out].mean() < 0.2
        assert inl[n_out:][keep[n_out:]].mean() > 0.85

    def test_planar_scene_beta_cases(self):
        """Degenerate/planar configurations are where the reference's
        find_betas_approx_2/3 seeds matter (ref: src/PnPsolver.cc:
        693-755): with all world points on one plane the 4th control
        point collapses onto the others and the N=1 seed alone lands in
        the wrong Gauss-Newton basin.  Sweep plane orientations + noise
        and require consistent recovery."""
        rng = np.random.default_rng(17)
        n = 100
        fails = 0
        for trial in range(8):
            # points on a tilted plane, plus pixel noise
            basis = Rotation.random(random_state=rng).as_matrix()
            pts = (np.concatenate(
                [rng.uniform(-3, 3, (n, 2)), np.zeros((n, 1))], 1
            ) @ basis.T).astype(np.float32)
            T_true = cam_pose(rng, rot_deg=20, trans=0.8)
            pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
            dz = max(0.0, 2.0 - float(pc[:, 2].min()))  # keep in front
            pc[:, 2] += dz
            T_true = T_true.copy()
            T_true[2, 3] += dz
            uv = project(pc) + rng.normal(0, 0.7, (n, 2))
            samples = np.stack([
                rng.choice(n, epnp.MIN_SET, replace=False)
                for _ in range(200)
            ]).astype(np.int32)
            res = epnp.solve_pnp_ransac(
                jnp.asarray(pts), jnp.asarray(uv, jnp.float32),
                jnp.full(n, 5.991, jnp.float32) * 4.0,
                jnp.ones(n, bool), jnp.asarray(samples),
                FX, FY, CX, CY,
            )
            T_est = np.asarray(res.Tcw)
            err = np.asarray(
                se3.log(jnp.asarray(np.linalg.inv(T_true) @ T_est)))
            if not (bool(res.success) and np.abs(err).max() < 0.08):
                fails += 1
        assert fails == 0, f"{fails}/8 planar configurations failed"

    def test_near_minimal_inliers(self):
        """Relocalization's last resort: barely more inliers than the
        acceptance floor, rest gross outliers."""
        rng = np.random.default_rng(23)
        n = 50
        n_in = 20
        pts = make_world(rng, n)
        T_true = cam_pose(rng, rot_deg=15, trans=0.6)
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        uv = project(pc) + rng.normal(0, 0.4, (n, 2))
        uv[n_in:] = rng.uniform([0, 0], [640, 480], (n - n_in, 2))
        # 40% inliers with 6-point min sets: P(clean) ~ 0.4^6 = 4e-3,
        # 2000 hypotheses give ~8 expected clean samples
        samples = np.stack([
            rng.choice(n, epnp.MIN_SET, replace=False) for _ in range(2000)
        ]).astype(np.int32)
        res = epnp.solve_pnp_ransac(
            jnp.asarray(pts), jnp.asarray(uv, jnp.float32),
            jnp.full(n, 5.991, jnp.float32) * 4.0,
            jnp.ones(n, bool), jnp.asarray(samples),
            FX, FY, CX, CY, min_inliers=10,
        )
        assert bool(res.success)
        T_est = np.asarray(res.Tcw)
        err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(T_true) @ T_est)))
        assert np.abs(err).max() < 0.1, err


class TestSim3:
    def test_recovers_similarity(self):
        rng = np.random.default_rng(11)
        n = 80
        pts2 = make_world(rng, n)
        R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
        # keep points in front of both cameras: mild rotation instead
        R = Rotation.from_rotvec(rng.normal(0, 0.1, 3)).as_matrix().astype(np.float32)
        t = np.array([0.4, -0.2, 0.3], np.float32)
        s = 1.3
        pts1 = s * (pts2 @ R.T) + t
        uv1 = project(pts1) + rng.normal(0, 0.3, (n, 2))
        uv2 = project(pts2) + rng.normal(0, 0.3, (n, 2))
        # corrupt 20 correspondences
        pts2_c = pts2.copy()
        pts2_c[:20] += rng.uniform(1, 3, (20, 3))
        samples = np.stack(
            [rng.choice(n, 3, replace=False) for _ in range(200)]
        ).astype(np.int32)
        res = sim3_solver.solve_sim3_ransac(
            jnp.asarray(pts1), jnp.asarray(pts2_c),
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.full(n, 9.21 * 4), jnp.full(n, 9.21 * 4),
            jnp.ones(n, bool), jnp.asarray(samples),
            FX, FY, CX, CY,
        )
        assert bool(res.success)
        assert abs(float(res.s12) - s) < 0.02
        np.testing.assert_allclose(np.asarray(res.R12), R, atol=0.02)
        np.testing.assert_allclose(np.asarray(res.t12), t, atol=0.05)
        assert np.asarray(res.inliers)[:20].mean() < 0.3

    def test_refine_survives_outlier_majority(self):
        """refine_sim3 must hold the RANSAC estimate when the
        SearchBySim3 extension floods it with wrong matches — the
        reference puts Huber kernels on every Sim3 edge
        (src/Optimizer.cc:1148-1171), so a ~75% outlier fraction cannot
        drag the optimum away before the chi2 gate runs.  Regression for
        the loop_ate loops=0 failure (unrobust GN collapsed to ~12
        inliers from 141 extended matches)."""
        rng = np.random.default_rng(13)
        n_in, n_out = 35, 105
        n = n_in + n_out
        pts2 = make_world(rng, n)
        R = Rotation.from_rotvec(
            rng.normal(0, 0.1, 3)).as_matrix().astype(np.float32)
        t = np.array([0.3, -0.1, 0.2], np.float32)
        s = 1.0
        pts1 = s * (pts2 @ R.T) + t
        uv1 = project(pts1) + rng.normal(0, 0.3, (n, 2))
        uv2 = project(pts2) + rng.normal(0, 0.3, (n, 2))
        # wrong matches: shuffle the tail's side-2 points so the pair
        # geometry is inconsistent (what a bad guided projection yields)
        perm = n_in + rng.permutation(n_out)
        pts2_c = pts2.copy()
        pts2_c[n_in:] = pts2[perm]
        uv2_c = uv2.copy()
        uv2_c[n_in:] = uv2[perm]

        # slightly perturbed start (a decent RANSAC estimate)
        R0 = (Rotation.from_rotvec(rng.normal(0, 0.02, 3)).as_matrix()
              @ R).astype(np.float32)
        t0 = t + rng.normal(0, 0.05, 3).astype(np.float32)
        R12, t12, s12, inl, n_inl = sim3_solver.refine_sim3(
            jnp.asarray(pts1), jnp.asarray(pts2_c),
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2_c, jnp.float32),
            jnp.full(n, 1.0, jnp.float32), jnp.full(n, 1.0, jnp.float32),
            jnp.ones(n, bool),
            jnp.asarray(R0), jnp.asarray(t0), jnp.float32(1.0),
            FX, FY, CX, CY, fix_scale=True,
        )
        assert int(n_inl) >= int(0.8 * n_in), int(n_inl)
        np.testing.assert_allclose(np.asarray(R12), R, atol=0.01)
        np.testing.assert_allclose(np.asarray(t12), t, atol=0.05)
        inl = np.asarray(inl)
        assert inl[:n_in].mean() > 0.8       # true matches kept
        assert inl[n_in:].mean() < 0.15      # wrong matches rejected

    def test_fix_scale(self):
        rng = np.random.default_rng(12)
        n = 50
        pts2 = make_world(rng, n)
        R = Rotation.from_rotvec(rng.normal(0, 0.1, 3)).as_matrix().astype(np.float32)
        t = np.array([0.2, 0.1, -0.1], np.float32)
        pts1 = pts2 @ R.T + t
        uv1 = project(pts1)
        uv2 = project(pts2)
        samples = np.stack(
            [rng.choice(n, 3, replace=False) for _ in range(100)]
        ).astype(np.int32)
        res = sim3_solver.solve_sim3_ransac(
            jnp.asarray(pts1), jnp.asarray(pts2),
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.full(n, 9.21 * 4), jnp.full(n, 9.21 * 4),
            jnp.ones(n, bool), jnp.asarray(samples),
            FX, FY, CX, CY, fix_scale=True,
        )
        assert bool(res.success)
        assert float(res.s12) == 1.0
        np.testing.assert_allclose(np.asarray(res.R12), R, atol=1e-3)
