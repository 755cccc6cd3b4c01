"""Bundle adjustment and pose-graph tests on synthetic worlds."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from orb_slam2_tpu.geometry import se3, sim3
from orb_slam2_tpu.solvers import ba, pose_graph

FX, FY, CX, CY = 520.0, 520.0, 320.0, 240.0


def build_problem(rng, n_cams=6, n_pts=300, noise=0.5, stereo=False,
                  pt_noise=0.05, pose_noise=0.02):
    pts = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts),
         rng.uniform(6, 14, n_pts)], -1).astype(np.float32)
    cams = []
    for k in range(n_cams):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rotation.from_rotvec(rng.normal(0, 0.03, 3)).as_matrix()
        T[:3, 3] = [0.4 * k - 1.0, rng.normal(0, 0.1), rng.normal(0, 0.1)]
        cams.append(T)
    cams = np.stack(cams)

    edge_cam, edge_pt, edge_uv = [], [], []
    bf = 40.0
    for k in range(n_cams):
        pc = pts @ cams[k, :3, :3].T + cams[k, :3, 3]
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        vis = (u > 20) & (u < 620) & (v > 20) & (v < 460) & (pc[:, 2] > 1)
        for p in np.nonzero(vis)[0]:
            un = u[p] + rng.normal(0, noise)
            vn = v[p] + rng.normal(0, noise)
            if stereo:
                ur = un - bf / pc[p, 2] + rng.normal(0, noise)
            else:
                ur = -1.0
            edge_cam.append(k)
            edge_pt.append(p)
            edge_uv.append([un, vn, ur])

    E = len(edge_cam)
    # perturb initial estimates
    cams_init = cams.copy()
    for k in range(1, n_cams):
        dT = np.eye(4, dtype=np.float32)
        dT[:3, :3] = Rotation.from_rotvec(rng.normal(0, pose_noise, 3)).as_matrix()
        dT[:3, 3] = rng.normal(0, pose_noise * 5, 3)
        cams_init[k] = dT @ cams[k]
    pts_init = pts + rng.normal(0, pt_noise, pts.shape).astype(np.float32)

    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    prob = ba.BAProblem(
        cam_T=jnp.asarray(cams_init),
        cam_fixed=jnp.asarray(fixed),
        cam_mask=jnp.ones(n_cams, bool),
        pts=jnp.asarray(pts_init),
        pt_mask=jnp.ones(n_pts, bool),
        edge_cam=jnp.asarray(np.array(edge_cam, np.int32)),
        edge_pt=jnp.asarray(np.array(edge_pt, np.int32)),
        edge_uv=jnp.asarray(np.array(edge_uv, np.float32)),
        edge_inv_sigma2=jnp.ones(E),
        edge_mask=jnp.ones(E, bool),
    )
    return prob, cams, pts, bf


def pose_errors(cam_T, cams_true):
    errs = []
    for k in range(len(cams_true)):
        d = np.linalg.inv(cams_true[k]) @ np.asarray(cam_T[k])
        errs.append(np.abs(np.asarray(se3.log(jnp.asarray(d)))).max())
    return np.array(errs)


class TestBA:
    def test_dense_mono_converges(self):
        rng = np.random.default_rng(0)
        prob, cams, pts, bf = build_problem(rng, noise=0.3)
        cam_T, pts_o, err = ba.optimize(prob, FX, FY, CX, CY, bf, iters=15)
        e0 = pose_errors(prob.cam_T, cams)
        e1 = pose_errors(cam_T, cams)
        assert e1.max() < e0.max() * 0.5
        assert e1.max() < 0.015, e1

    def test_dense_stereo_converges(self):
        rng = np.random.default_rng(1)
        prob, cams, pts, bf = build_problem(rng, noise=0.3, stereo=True)
        cam_T, pts_o, err = ba.optimize(prob, FX, FY, CX, CY, bf, iters=20)
        e1 = pose_errors(cam_T, cams)
        # noise-limited: the optimized total error falls below the error at
        # ground truth, so remaining pose distance is absorbed noise.
        assert e1.max() < 0.02, e1
        # structure improves too
        d0 = np.abs(np.asarray(prob.pts) - pts).mean()
        d1 = np.abs(np.asarray(pts_o) - pts).mean()
        assert d1 < d0 * 0.7

    def test_cg_matches_dense(self):
        rng = np.random.default_rng(2)
        prob, cams, pts, bf = build_problem(rng, noise=0.3)
        Td, _, _ = ba.optimize(prob, FX, FY, CX, CY, bf, iters=10, mode="dense")
        Tc, _, _ = ba.optimize(
            prob, FX, FY, CX, CY, bf, iters=10, mode="cg", cg_iters=80
        )
        ed = pose_errors(Td, cams)
        ec = pose_errors(Tc, cams)
        assert ec.max() < max(ed.max() * 3, 0.01), (ed, ec)

    def test_outlier_classification(self):
        rng = np.random.default_rng(3)
        prob, cams, pts, bf = build_problem(rng, noise=0.3)
        uv = np.array(prob.edge_uv)
        n_bad = 40
        bad_idx = rng.choice(len(uv), n_bad, replace=False)
        uv[bad_idx, :2] += rng.uniform(15, 40, (n_bad, 2))
        prob = prob._replace(edge_uv=jnp.asarray(uv))
        cam_T, pts_o, _ = ba.optimize(prob, FX, FY, CX, CY, bf, iters=10)
        prob2 = prob._replace(cam_T=cam_T, pts=pts_o)
        out = np.asarray(ba.classify_outliers(prob2, FX, FY, CX, CY, bf))
        assert out[bad_idx].mean() > 0.9
        good = np.ones(len(uv), bool)
        good[bad_idx] = False
        assert out[good].mean() < 0.1
        # second stage without outliers stays at the noise-limited
        # optimum (same bound as the inlier-only test above; the exact
        # value is host-numerics dependent — 0.009 on one CPU, 0.016 on
        # another — so don't assert below the noise floor)
        prob3 = prob2._replace(edge_mask=jnp.asarray(~out))
        cam_T2, _, _ = ba.optimize(prob3, FX, FY, CX, CY, bf, iters=10)
        e2 = pose_errors(cam_T2, cams)
        assert e2.max() < 0.02, e2

    def test_fixed_cameras_stay_fixed(self):
        rng = np.random.default_rng(4)
        prob, cams, pts, bf = build_problem(rng)
        cam_T, _, _ = ba.optimize(prob, FX, FY, CX, CY, bf, iters=5)
        np.testing.assert_array_equal(
            np.asarray(cam_T[0]), np.asarray(prob.cam_T[0])
        )

    def test_padded_slots_untouched(self):
        rng = np.random.default_rng(5)
        prob, cams, pts, bf = build_problem(rng, n_cams=4, n_pts=100)
        # pad with 2 dummy cams and 20 dummy points
        camT = np.concatenate([np.asarray(prob.cam_T),
                               np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))])
        prob = prob._replace(
            cam_T=jnp.asarray(camT),
            cam_fixed=jnp.concatenate([prob.cam_fixed, jnp.zeros(2, bool)]),
            cam_mask=jnp.concatenate([prob.cam_mask, jnp.zeros(2, bool)]),
            pts=jnp.concatenate([prob.pts, jnp.zeros((20, 3))]),
            pt_mask=jnp.concatenate([prob.pt_mask, jnp.zeros(20, bool)]),
        )
        cam_T, pts_o, _ = ba.optimize(prob, FX, FY, CX, CY, bf, iters=5)
        np.testing.assert_array_equal(np.asarray(cam_T[4:]),
                                      np.tile(np.eye(4), (2, 1, 1)))
        np.testing.assert_array_equal(np.asarray(pts_o[100:]), 0.0)


class TestPoseGraph:
    def test_loop_correction(self):
        """Classic drifted-loop: chain of keyframes, drift accumulates, a
        loop edge to the start pulls everything back."""
        rng = np.random.default_rng(6)
        K = 20
        # ground truth: poses around a circle
        R_true, t_true = [], []
        for k in range(K):
            th = 2 * np.pi * k / K
            Rw = Rotation.from_euler("y", th).as_matrix().astype(np.float32)
            C = np.array([5 * np.sin(th), 0.0, 5 - 5 * np.cos(th)], np.float32)
            R_true.append(Rw.T)
            t_true.append(-Rw.T @ C)
        R_true = np.stack(R_true)
        t_true = np.stack(t_true)

        # odometry measurements: perfect relative + small noise; vertex
        # initial estimates: integrate noisy odometry -> drift
        R_est = [R_true[0]]
        t_est = [t_true[0]]
        edges = []
        for k in range(1, K):
            R_rel = R_true[k] @ R_true[k - 1].T
            t_rel = t_true[k] - R_rel @ t_true[k - 1]
            dR = Rotation.from_rotvec(rng.normal(0, 0.01, 3)).as_matrix()
            R_n = (dR @ R_rel).astype(np.float32)
            t_n = (t_rel + rng.normal(0, 0.02, 3)).astype(np.float32)
            edges.append((k - 1, k, R_n, t_n, 1.0))
            R_est.append(R_n @ R_est[-1])
            t_est.append(R_n @ t_est[-1] + t_n)
        # loop edge: exact relative pose between last and first
        R_rel = R_true[0] @ R_true[K - 1].T
        t_rel = t_true[0] - R_rel @ t_true[K - 1]
        edges.append((K - 1, 0, R_rel.astype(np.float32), t_rel, 1.0))

        R_est = np.stack(R_est)
        t_est = np.stack(t_est)
        drift0 = np.linalg.norm(t_est[-1] - t_true[-1])
        assert drift0 > 0.05  # meaningful drift

        E = len(edges)
        prob = pose_graph.PoseGraphProblem(
            R=jnp.asarray(R_est), t=jnp.asarray(t_est),
            s=jnp.ones(K),
            fixed=jnp.asarray(np.arange(K) == 0),
            vmask=jnp.ones(K, bool),
            edge_i=jnp.asarray(np.array([e[0] for e in edges], np.int32)),
            edge_j=jnp.asarray(np.array([e[1] for e in edges], np.int32)),
            meas_R=jnp.asarray(np.stack([e[2] for e in edges])),
            meas_t=jnp.asarray(np.stack([e[3] for e in edges])),
            meas_s=jnp.ones(E),
            emask=jnp.ones(E, bool),
        )
        R_o, t_o, s_o = pose_graph.optimize(prob, iters=25)
        # loop closure should distribute drift: end pose error shrinks
        err_end = np.linalg.norm(np.asarray(t_o[-1]) - t_true[-1])
        assert err_end < drift0 * 0.5, (drift0, err_end)
        # scales should stay ~1 for rigid odometry
        np.testing.assert_allclose(np.asarray(s_o), 1.0, atol=0.05)

    def test_exact_measurements_converge_to_zero(self):
        """With exact relative measurements a drifted loop must converge to
        the exact ground truth (regression: f32 instability in sim3 log/exp
        left a residual plateau)."""
        K = 30
        th = 2 * np.pi * np.arange(K) / K
        Cs = np.stack([8 * np.cos(th), 8 * np.sin(th), np.zeros(K)], -1)
        Rw = Rotation.from_euler("z", th[:, None]).as_matrix()
        R_true = Rw.transpose(0, 2, 1).astype(np.float32)
        t_true = -np.einsum("kij,kj->ki", R_true, Cs).astype(np.float32)

        # drifted initial estimates
        R_est, t_est, s_est = R_true.copy(), t_true.copy(), np.ones(K)
        accR = np.eye(3)
        acct = np.zeros(3)
        accs = 1.0
        dR = Rotation.from_euler("z", 0.015).as_matrix()
        for k in range(K):
            R_est[k] = R_true[k] @ accR.T
            t_est[k] = t_true[k] - R_true[k] @ accR.T @ acct
            s_est[k] = accs
            accR = accR @ dR
            acct = acct + np.array([0.03, 0.0, 0.015])
            accs *= 1.003

        def rel(i, j):
            Rr = R_true[j] @ R_true[i].T
            return Rr, t_true[j] - Rr @ t_true[i], 1.0

        edges = [rel(k, (k + 1) % K) for k in range(K)]
        ei = np.array([k for k in range(K)], np.int32)
        ej = np.array([(k + 1) % K for k in range(K)], np.int32)
        prob = pose_graph.PoseGraphProblem(
            R=jnp.asarray(R_est), t=jnp.asarray(t_est),
            s=jnp.asarray(s_est.astype(np.float32)),
            fixed=jnp.asarray(np.arange(K) == 0), vmask=jnp.ones(K, bool),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            meas_R=jnp.asarray(np.stack([e[0] for e in edges]).astype(np.float32)),
            meas_t=jnp.asarray(np.stack([e[1] for e in edges]).astype(np.float32)),
            meas_s=jnp.ones(K), emask=jnp.ones(K, bool),
        )
        R_o, t_o, s_o = pose_graph.optimize(prob, iters=20)
        C_o = -np.einsum("kji,kj->ki", np.asarray(R_o), np.asarray(t_o)) \
            / np.asarray(s_o)[:, None]
        err_init = np.linalg.norm(
            -np.einsum("kji,kj->ki", R_est, t_est) / s_est[:, None] - Cs,
            axis=1).max()
        err = np.linalg.norm(C_o - Cs, axis=1).max()
        assert err_init > 1.0
        assert err < 5e-3, (err_init, err)

    def test_cg_mode_matches_dense(self):
        """Matrix-free PCG essential-graph solve converges to the same
        solution as the dense 7Kx7K path (large-map mode)."""
        K = 40
        th = 2 * np.pi * np.arange(K) / K
        Cs = np.stack([6 * np.cos(th), 6 * np.sin(th), np.zeros(K)], -1)
        Rw = Rotation.from_euler("z", th[:, None]).as_matrix()
        R_true = Rw.transpose(0, 2, 1).astype(np.float32)
        t_true = -np.einsum("kij,kj->ki", R_true, Cs).astype(np.float32)
        # drift the initial estimates
        R_est, t_est = R_true.copy(), t_true.copy()
        accR, acct = np.eye(3), np.zeros(3)
        dR = Rotation.from_euler("z", 0.012).as_matrix()
        for k in range(K):
            R_est[k] = R_true[k] @ accR.T
            t_est[k] = t_true[k] - R_true[k] @ accR.T @ acct
            accR = accR @ dR
            acct = acct + np.array([0.02, 0.01, 0.0])

        def rel(i, j):
            Rr = R_true[j] @ R_true[i].T
            return Rr, t_true[j] - Rr @ t_true[i]

        # ring + a few chords (covisibility-style extra edges)
        pairs = [(k, (k + 1) % K) for k in range(K)]
        pairs += [(k, (k + 5) % K) for k in range(0, K, 4)]
        E = len(pairs)
        prob = pose_graph.PoseGraphProblem(
            R=jnp.asarray(R_est), t=jnp.asarray(t_est),
            s=jnp.ones(K, jnp.float32),
            fixed=jnp.asarray(np.arange(K) == 0), vmask=jnp.ones(K, bool),
            edge_i=jnp.asarray(np.array([p[0] for p in pairs], np.int32)),
            edge_j=jnp.asarray(np.array([p[1] for p in pairs], np.int32)),
            meas_R=jnp.asarray(np.stack(
                [rel(*p)[0] for p in pairs]).astype(np.float32)),
            meas_t=jnp.asarray(np.stack(
                [rel(*p)[1] for p in pairs]).astype(np.float32)),
            meas_s=jnp.ones(E, jnp.float32), emask=jnp.ones(E, bool),
        )
        Rd, td, sd = pose_graph.optimize(prob, iters=20, mode="dense")
        Rc, tc, sc = pose_graph.optimize(prob, iters=20, mode="cg")

        def centers(R, t, s):
            return -np.einsum("kji,kj->ki", np.asarray(R),
                              np.asarray(t)) / np.asarray(s)[:, None]

        err_d = np.linalg.norm(centers(Rd, td, sd) - Cs, axis=1).max()
        err_c = np.linalg.norm(centers(Rc, tc, sc) - Cs, axis=1).max()
        assert err_d < 5e-3, err_d
        assert err_c < 5e-3, err_c

    def test_scale_drift_correction(self):
        """Monocular-style scale drift absorbed by Sim3 vertices."""
        rng = np.random.default_rng(7)
        K = 10
        t_true = np.stack(
            [np.array([k, 0, 0], np.float32) for k in range(K)]
        )
        R_true = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        # estimates with growing scale drift in translation
        t_est = t_true * (1.0 + 0.05 * np.arange(K)[:, None].astype(np.float32))
        edges = []
        for k in range(1, K):
            edges.append((k - 1, k, np.eye(3, dtype=np.float32),
                          (t_true[k] - t_true[k - 1]), 1.0))
        edges.append((K - 1, 0, np.eye(3, dtype=np.float32),
                      (t_true[0] - t_true[K - 1]), 1.0))
        E = len(edges)
        prob = pose_graph.PoseGraphProblem(
            R=jnp.asarray(R_true), t=jnp.asarray(t_est), s=jnp.ones(K),
            fixed=jnp.asarray(np.arange(K) == 0),
            vmask=jnp.ones(K, bool),
            edge_i=jnp.asarray(np.array([e[0] for e in edges], np.int32)),
            edge_j=jnp.asarray(np.array([e[1] for e in edges], np.int32)),
            meas_R=jnp.asarray(np.stack([e[2] for e in edges])),
            meas_t=jnp.asarray(np.stack([e[3] for e in edges])),
            meas_s=jnp.ones(E),
            emask=jnp.ones(E, bool),
        )
        R_o, t_o, s_o = pose_graph.optimize(prob, iters=30)
        err0 = np.abs(t_est - t_true).max()
        err1 = np.abs(np.asarray(t_o) - t_true).max()
        assert err1 < err0 * 0.5, (err0, err1)
