"""Reference-scale map tests (VERDICT r2 missing #2 / next #3).

The reference routinely runs KITTI-00 maps: 1300+ keyframes through
loop correction, essential-graph optimization, and GBA
(src/Optimizer.cc:781-1044 operates on the full map).  Round 2 never
exercised more than ~80 keyframes.  These tests build a synthetic
ring map at hundreds of keyframes and drive the actual loop-closure
machinery; scripts/scale_soak.py runs the same paths at 1000+ KFs
with recorded timings.
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.slam.map_store import MapStore
from orb_slam2_tpu.solvers import pose_graph

from synthetic import build_ring_map


def make_settings(n_feat=256):
    return Settings(
        fx=260.0, fy=260.0, cx=160.0, cy=120.0, bf=26.0,
        width=320, height=240, n_features=n_feat, fps=5.0, th_depth=60.0,
    )


class TestPoseGraphAtScale:
    def test_cg_1000_keyframes(self):
        """The matrix-free PCG essential-graph path at reference map
        size: 1000 Sim3 vertices, ring + chord edges, accumulated
        drift corrected through one loop edge."""
        K = 1000
        th = 2 * np.pi * np.arange(K) / K
        Cs = np.stack([30 * np.cos(th), 30 * np.sin(th),
                       np.zeros(K)], -1)
        Rw = Rotation.from_euler("z", th[:, None]).as_matrix()
        R_true = Rw.transpose(0, 2, 1).astype(np.float32)
        t_true = -np.einsum("kij,kj->ki", R_true, Cs).astype(np.float32)
        R_est, t_est = R_true.copy(), t_true.copy()
        accR, acct = np.eye(3), np.zeros(3)
        dR = Rotation.from_euler("z", 0.0008).as_matrix()
        for k in range(K):
            R_est[k] = R_true[k] @ accR.T
            t_est[k] = t_true[k] - R_true[k] @ accR.T @ acct
            accR = accR @ dR
            acct = acct + np.array([0.004, 0.002, 0.0])

        def rel(i, j):
            Rr = R_true[j] @ R_true[i].T
            return Rr, t_true[j] - Rr @ t_true[i]

        pairs = [(k, (k + 1) % K) for k in range(K)]
        pairs += [(k, (k + 7) % K) for k in range(0, K, 5)]
        E = len(pairs)
        prob = pose_graph.PoseGraphProblem(
            R=jnp.asarray(R_est), t=jnp.asarray(t_est),
            s=jnp.ones(K, jnp.float32),
            fixed=jnp.asarray(np.arange(K) == 0),
            vmask=jnp.ones(K, bool),
            edge_i=jnp.asarray(np.array([p[0] for p in pairs], np.int32)),
            edge_j=jnp.asarray(np.array([p[1] for p in pairs], np.int32)),
            meas_R=jnp.asarray(np.stack(
                [rel(*p)[0] for p in pairs]).astype(np.float32)),
            meas_t=jnp.asarray(np.stack(
                [rel(*p)[1] for p in pairs]).astype(np.float32)),
            meas_s=jnp.ones(E, jnp.float32), emask=jnp.ones(E, bool),
        )
        drift0 = np.linalg.norm(
            -np.einsum("kji,kj->ki", R_est, t_est) - Cs, axis=1).max()
        t0 = time.perf_counter()
        Rc, tc, sc = pose_graph.optimize(prob, iters=20, mode="cg")
        dt = time.perf_counter() - t0
        centers = (-np.einsum("kji,kj->ki", np.asarray(Rc),
                              np.asarray(tc))
                   / np.asarray(sc)[:, None])
        err = np.linalg.norm(centers - Cs, axis=1).max()
        # drift of several meters must collapse to centimeters
        assert drift0 > 1.0, drift0
        assert err < 0.15, (err, drift0)
        assert dt < 600, f"CG at K=1000 took {dt:.1f}s"


class TestLoopClosureAtScale:
    @pytest.fixture(scope="class")
    def big_map(self):
        settings = make_settings()
        store, true_poses = build_ring_map(
            K=300, pts_per_kf=30, span=5, n_feat=settings.n_features,
            drift_per_kf=0.004)
        return settings, store, true_poses

    def _closer(self, settings, store):
        from orb_slam2_tpu.slam.loop_closing import LoopCloser

        return LoopCloser(settings, Sensor.STEREO, store,
                          kf_database=None, local_mapper=None)

    def test_correct_loop_and_essential_graph(self, big_map):
        """_correct_loop + _optimize_essential_graph on a 300-KF map:
        the vectorized window remap, SearchAndFuse dispatches, bulk
        edge assembly, and CG pose graph must complete in bounded time
        and leave a consistent map."""
        settings, store, true_poses = big_map
        lc = self._closer(settings, store)
        kf = int(store.n_kf - 1)
        cand = 0
        # corrected Sim3 for kf = its TRUE pose (undo accumulated drift)
        T_true = true_poses[kf]
        Scw_R = T_true[:3, :3].astype(np.float64)
        Scw_t = T_true[:3, 3].astype(np.float64)
        loop_pts = store.kf_obs[cand][store.kf_obs[cand] >= 0][:64]
        pre_pts = store.pt_pos.copy()
        n_pts_before = int(store.pt_valid.sum())

        t0 = time.perf_counter()
        lc._correct_loop(kf, cand, None, None, 1.0,
                         Scw_R, Scw_t, 1.0, np.asarray(loop_pts))
        dt = time.perf_counter() - t0

        # every keyframe pose finite, loop edge recorded
        kfs = store.valid_kf_ids()
        assert np.isfinite(store.kf_pose[kfs]).all()
        assert cand in store.kf_loop_edges.get(kf, set())
        # points were remapped (window points must move with their KFs)
        moved = np.abs(store.pt_pos - pre_pts).max()
        assert np.isfinite(store.pt_pos[store.pt_valid[:store.n_pt]
                           .nonzero()[0]]).all()
        assert moved > 0, "loop correction moved no points"
        # the essential graph pulled the drifted tail toward truth:
        # keyframe centers near the loop keyframe should now be close
        # to their true centers
        def center(T):
            return -T[:3, :3].T @ T[:3, 3]
        tail_err = np.linalg.norm(
            center(store.kf_pose[kf]) - center(true_poses[kf]))
        assert tail_err < 1.0, tail_err
        # no mass point deletion
        assert int(store.pt_valid.sum()) > 0.9 * n_pts_before
        # generous CI bound — catches O(K*P) Python blowups, not jitter
        assert dt < 300, f"loop correction at K=300 took {dt:.1f}s"
