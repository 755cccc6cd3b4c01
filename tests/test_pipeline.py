"""Integration tests: full SLAM pipeline on synthetic scenes.

The reference has no test suite (SURVEY §4); these are the
"multi-node-without-a-cluster" style deterministic integration tests the
survey prescribes: synchronous scheduler, synthetic plane scene with
exact ground truth."""

import time

import numpy as np
import pytest

from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.system import System

from synthetic import PlaneScene, stereo_sequence, straight_trajectory

H, W = 240, 320
FX = FY = 260.0
BASELINE = 0.1


def make_settings(**kw):
    base = dict(
        fx=FX, fy=FY, cx=W / 2, cy=H / 2, bf=FX * BASELINE,
        width=W, height=H, n_features=800, fps=10.0, th_depth=40.0,
    )
    base.update(kw)
    return Settings(**base)


def center_of(T):
    return -T[:3, :3].T @ T[:3, 3]


@pytest.fixture(scope="module")
def stereo_run():
    settings = make_settings()
    poses = straight_trajectory(10, step=0.03, yaw_step=0.002)
    scene, pairs = stereo_sequence(settings.K, H, W, BASELINE, poses)
    sys_ = System(settings, Sensor.STEREO)
    est = []
    for i, (l, r) in enumerate(pairs):
        T = sys_.track_stereo(l, r, i * 0.1)
        est.append(None if T is None else T.copy())
    return sys_, poses, est


class TestStereoPipeline:
    def test_initializes_first_frame(self, stereo_run):
        sys_, poses, est = stereo_run
        assert est[0] is not None
        assert int(sys_.map.kf_valid.sum()) >= 1
        assert int(sys_.map.pt_valid.sum()) > 300

    def test_tracks_all_frames(self, stereo_run):
        sys_, poses, est = stereo_run
        assert all(T is not None for T in est)
        assert sys_.tracking_state().name == "OK"

    def test_trajectory_accuracy(self, stereo_run):
        sys_, poses, est = stereo_run
        errs = [
            np.linalg.norm(center_of(T) - center_of(G))
            for T, G in zip(est, poses) if T is not None
        ]
        assert max(errs) < 0.06, f"max position error {max(errs):.3f} m"

    def test_trajectory_writers(self, stereo_run, tmp_path):
        sys_, _, _ = stereo_run
        tum = tmp_path / "traj_tum.txt"
        kitti = tmp_path / "traj_kitti.txt"
        kf = tmp_path / "kf_tum.txt"
        sys_.save_trajectory_tum(str(tum))
        sys_.save_trajectory_kitti(str(kitti))
        sys_.save_keyframe_trajectory_tum(str(kf))
        rows = np.loadtxt(tum)
        assert rows.shape[1] == 8
        rows_k = np.loadtxt(kitti)
        assert rows_k.shape[1] == 12
        # first pose ~ identity (world = first camera)
        np.testing.assert_allclose(
            rows_k[0].reshape(3, 4)[:, :3], np.eye(3), atol=1e-3
        )

    def test_map_save_load_roundtrip(self, stereo_run, tmp_path):
        sys_, _, _ = stereo_run
        from orb_slam2_tpu.slam.map_store import MapStore

        path = tmp_path / "map.bin"
        sys_.map.save(str(path))
        m2 = MapStore.load(str(path))
        assert m2.n_kf == sys_.map.n_kf
        assert m2.n_pt == sys_.map.n_pt
        np.testing.assert_array_equal(
            m2.pt_pos[: m2.n_pt], sys_.map.pt_pos[: sys_.map.n_pt]
        )
        np.testing.assert_array_equal(m2.kf_obs, sys_.map.kf_obs)

    def test_map_point_export(self, stereo_run, tmp_path):
        sys_, _, _ = stereo_run
        p = tmp_path / "pts.obj"
        sys_.save_map_points_obj(str(p))
        lines = open(p).read().strip().splitlines()
        assert len(lines) == int(sys_.map.pt_valid.sum())
        assert all(ln.startswith("v ") for ln in lines)


class TestRGBDPipeline:
    def test_rgbd_tracks(self):
        settings = make_settings()
        poses = straight_trajectory(6, step=0.03, yaw_step=0.002)
        scene = PlaneScene(settings.K, H, W)
        sys_ = System(settings, Sensor.RGBD)
        est = []
        for i, T in enumerate(poses):
            img = scene.render(T)
            depth = scene.depth_at(T)
            Te = sys_.track_rgbd(img, depth, i * 0.1)
            est.append(Te)
        assert est[-1] is not None
        err = np.linalg.norm(center_of(est[-1]) - center_of(poses[-1]))
        assert err < 0.06
        # RGB-D steady frames ride the fused fast step (one dispatch)
        assert sys_.tracker.timers.counts.get("fast_step", 0) >= 2

    def test_rgbd_pipelined_tracks(self):
        """RGB-D rides the pipelined chain step too (r5: parity with
        mono/stereo — the depth image flows through the chained kernel's
        img_r slot, ref Frame.cc ComputeStereoFromRGBD semantics)."""
        settings = make_settings()
        settings.pipelined = True
        poses = straight_trajectory(10, step=0.03, yaw_step=0.002)
        scene = PlaneScene(settings.K, H, W)
        sys_ = System(settings, Sensor.RGBD)
        for i, T in enumerate(poses):
            sys_.track_rgbd(scene.render(T), scene.depth_at(T), i * 0.1)
        # drain in-flight chain results for the authoritative poses
        t0 = time.time()
        while sys_.tracker._pending and time.time() - t0 < 30:
            sys_.poll()
            time.sleep(0.01)
        assert sys_.tracker.state.name == "OK"
        assert sys_.tracker.timers.counts.get("pipelined_step", 0) >= 2
        Te = sys_.tracker.last_frame.Tcw
        err = np.linalg.norm(center_of(Te) - center_of(poses[-1]))
        assert err < 0.08, err

    def test_rgbd_fast_path_matches_modular(self):
        """The fused RGB-D step (depth sampled in-graph) must land on the
        same trajectory as the modular path within tracking noise."""
        settings = make_settings()
        poses = straight_trajectory(8, step=0.03, yaw_step=0.002)
        scene = PlaneScene(settings.K, H, W)

        def run(fast):
            sys_ = System(settings, Sensor.RGBD)
            sys_.tracker.use_fast_path = fast
            out = []
            for i, T in enumerate(poses):
                out.append(sys_.track_rgbd(
                    scene.render(T), scene.depth_at(T), i * 0.1))
            return out

        fast = run(True)
        slow = run(False)
        for Tf, Ts in zip(fast[2:], slow[2:]):
            assert Tf is not None and Ts is not None
            d = np.linalg.norm(center_of(Tf) - center_of(Ts))
            assert d < 0.02, d


class TestMonoSystemSettings:
    def test_mono_copy_doubles_bucket_and_demotes_pipelined(self):
        """System(MONOCULAR) works on a per-System settings COPY: the
        local candidate block doubles (revisit windows hold old+new
        points; the stereo-sized cap truncated half of it — the r5
        bench LOST cluster at frames 294-317), pipelined demotes to the
        re-anchoring fast path (measured 10-20x map-quality gap on the
        chain), and the CALLER's settings object — including
        dynamically-set attributes — is untouched."""
        settings = make_settings()
        settings.pipelined = True
        base_bucket = settings.bucket_local
        sys_ = System(settings, Sensor.MONOCULAR)
        assert sys_.settings.bucket_local == 2 * base_bucket
        assert sys_.settings.pipelined is False
        # caller's object untouched (co-resident stereo systems keep
        # their compiled shapes)
        assert settings.bucket_local == base_bucket
        assert settings.pipelined is True
        # stereo/RGB-D share the caller's settings unmodified
        sys_st = System(settings, Sensor.STEREO)
        assert sys_st.settings.bucket_local == base_bucket
        assert sys_st.settings.pipelined is True


class TestLocalizationMode:
    def test_localization_tracks_without_new_keyframes(self):
        """ref: System::ActivateLocalizationMode (src/System.cc:126-135) +
        Tracking's mbOnlyTracking branch: map frozen, tracking continues,
        no keyframes added."""
        settings = make_settings()
        poses = straight_trajectory(14, step=0.03, yaw_step=0.002)
        scene, pairs = stereo_sequence(settings.K, H, W, BASELINE, poses)
        sys_ = System(settings, Sensor.STEREO)
        for i, (l, r) in enumerate(pairs[:9]):
            sys_.track_stereo(l, r, i * 0.1)
        n_kf = int(sys_.map.kf_valid.sum())
        n_pt = int(sys_.map.pt_valid.sum())
        sys_.activate_localization_mode()
        est = []
        for i, (l, r) in enumerate(pairs[9:], start=9):
            T = sys_.track_stereo(l, r, i * 0.1)
            est.append((i, T))
        assert int(sys_.map.kf_valid.sum()) == n_kf       # map frozen
        assert sys_.tracking_state().name == "OK"
        # localization mode rides the fused fast step too (no KF side
        # effects; ref: Tracking.cc:328-392)
        assert sys_.tracker.timers.counts.get("fast_step", 0) >= 2
        T0 = poses[0]
        for i, T in est:
            assert T is not None
            Tg = poses[i] @ np.linalg.inv(T0)
            assert np.linalg.norm(center_of(T) - center_of(Tg)) < 0.1
        sys_.deactivate_localization_mode()
        for i, (l, r) in enumerate(pairs[9:], start=9):
            sys_.track_stereo(l, r, (5 + i) * 0.1)
        # mapping resumed: temporal VO points cleaned, KFs can grow again
        assert not sys_.tracker.only_tracking


class TestRectification:
    def test_identity_rectification_roundtrip(self):
        """rectify_maps + remap with R=I, P=K, D=0 must be the identity
        (sanity for the EuRoC stereo path, ref: stereo_euroc.cc:97-137)."""
        import jax.numpy as jnp

        from orb_slam2_tpu.config import RectificationParams
        from orb_slam2_tpu.geometry import camera as cam

        K = np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1]], np.float64)
        rect = RectificationParams(
            K_l=K, K_r=K, D_l=np.zeros(5), D_r=np.zeros(5),
            R_l=np.eye(3), R_r=np.eye(3),
            P_l=np.hstack([K, np.zeros((3, 1))]),
            P_r=np.hstack([K, np.zeros((3, 1))]),
            width=W, height=H,
        )
        (mxl, myl), (mxr, myr) = cam.rectify_maps(rect)
        gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        np.testing.assert_allclose(mxl, gx, atol=1e-3)
        np.testing.assert_allclose(myl, gy, atol=1e-3)
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (H, W)).astype(np.float32)
        out = np.asarray(cam.remap_bilinear(
            jnp.asarray(img), jnp.asarray(mxl), jnp.asarray(myl)))
        np.testing.assert_allclose(out, img, atol=0.5)

    def test_distorted_rectification_straightens_rows(self):
        """A radially distorted stereo rig: after rectification a world
        point must land on the same row in both images (epipolar
        alignment) for points across the field of view."""
        import cv2

        from orb_slam2_tpu.config import RectificationParams
        from orb_slam2_tpu.geometry import camera as cam

        h, w = 240, 320
        K = np.array([[260.0, 0, w / 2], [0, 260.0, h / 2], [0, 0, 1]])
        D = np.array([-0.28, 0.07, 0.0002, 0.00002, 0.0])
        # slight relative rotation between the cameras
        R_rel, _ = cv2.Rodrigues(np.array([0.004, -0.01, 0.002]))
        T_rel = np.array([-0.11, 0.0005, 0.001]).reshape(3, 1)
        R1, R2, P1, P2, Q, _, _ = cv2.stereoRectify(
            K, D, K, D, (w, h), R_rel, T_rel, alpha=0)
        rect = RectificationParams(
            K_l=K, K_r=K, D_l=D, D_r=D, R_l=R1, R_r=R2,
            P_l=P1, P_r=P2, width=w, height=h)
        (mxl, myl), (mxr, myr) = cam.rectify_maps(rect)
        # golden maps from OpenCV
        gxl, gyl = cv2.initUndistortRectifyMap(
            K, D, R1, P1, (w, h), cv2.CV_32FC1)
        gxr, gyr = cv2.initUndistortRectifyMap(
            K, D, R2, P2, (w, h), cv2.CV_32FC1)
        np.testing.assert_allclose(mxl, gxl, atol=0.05)
        np.testing.assert_allclose(myl, gyl, atol=0.05)
        np.testing.assert_allclose(mxr, gxr, atol=0.05)
        np.testing.assert_allclose(myr, gyr, atol=0.05)


class TestPipelinedMode:
    def test_pipelined_tracks_close_to_sequential(self):
        """Frame-pipelined (chained device state) tracking must stay
        within a small factor of sequential accuracy on a moderate
        trajectory (regression: velocity-chain drift + ref-KF mismatch
        made it diverge by metres)."""
        settings = make_settings()
        poses = straight_trajectory(14, step=0.03, yaw_step=0.002)
        scene, pairs = stereo_sequence(settings.K, H, W, BASELINE, poses)

        def run(pipelined):
            s = make_settings()
            s.pipelined = pipelined
            sys_ = System(s, Sensor.STEREO)
            for i, (l, r) in enumerate(pairs):
                sys_.track_stereo(l, r, i * 0.1)
            sys_.tracker._flush_pipeline()
            # authoritative per-frame poses: recompose trajectory entries
            # exactly like SaveTrajectoryTUM (Tcr @ ref-KF pose) — with
            # pipelining, several frames may be applied inside one call,
            # so sampling last_frame per call would miss frames
            applied = {}
            store = sys_.store
            for e in sys_.tracker.trajectory:
                if e.lost or not store.kf_valid[e.ref_kf]:
                    continue
                applied[round(e.timestamp / 0.1)] = (
                    e.Tcr @ store.kf_pose[e.ref_kf])
            return applied

        seq = run(False)
        pipe = run(True)
        T0 = poses[0]

        def err(T, i):
            Tg = poses[i] @ np.linalg.inv(T0)
            return np.linalg.norm(center_of(T) - center_of(Tg))

        e_seq = [err(T, i) for i, T in seq.items()]
        e_pipe = [err(T, i) for i, T in pipe.items()]
        assert len(e_pipe) >= len(pairs) - 2
        # pipelined max error bounded: no metre-scale divergence, and
        # within 3x + 1cm of the sequential worst case
        assert max(e_pipe) < max(max(e_seq) * 3.0 + 0.01, 0.05), (
            max(e_seq), max(e_pipe))


class TestCullingPolicies:
    """Pin the reference's two culling policies, which until now only ran
    implicitly inside e2e circuits."""

    def _world(self, n_feat=32, n_kf=5, n_pt=20, depth=5.0):
        from orb_slam2_tpu.slam.local_mapping import LocalMapper
        from orb_slam2_tpu.slam.map_store import FrameFeatures, MapStore

        rng = np.random.default_rng(3)
        store = MapStore(n_feat, kf_cap=8, pt_cap=64)
        kfs = []
        for k in range(n_kf):
            ff = FrameFeatures(
                xy=rng.uniform(0, 100, (n_feat, 2)).astype(np.float32),
                xy_raw=np.zeros((n_feat, 2), np.float32),
                ur=np.full(n_feat, -1.0, np.float32),
                depth=np.full(n_feat, depth, np.float32),
                octave=np.zeros(n_feat, np.int32),
                angle=np.zeros(n_feat, np.float32),
                desc=rng.integers(0, 2 ** 32, (n_feat, 8)).astype(np.uint32),
                valid=np.ones(n_feat, bool),
                node=np.full(n_feat, -1, np.int32),
                word=np.full(n_feat, -1, np.int32),
            )
            kfs.append(store.add_keyframe(
                ff, np.eye(4, dtype=np.float32), float(k), k))
        pts = [store.add_point(rng.normal(0, 1, 3), kfs[0],
                               rng.integers(0, 2 ** 32, 8).astype(np.uint32))
               for _ in range(n_pt)]
        lm = LocalMapper(make_settings(th_depth=60.0), Sensor.STEREO, store)
        return store, lm, kfs, pts

    def test_map_point_culling_thresholds(self):
        """ref: LocalMapping::MapPointCulling (src/LocalMapping.cc:170-204):
        found-ratio < 0.25 kills at any age; <= th_obs observations after
        2 keyframes kills; surviving 3 keyframes leaves probation."""
        store, lm, kfs, pts = self._world()
        bad_ratio, few_obs, good, released = pts[:4]
        for p in (bad_ratio, few_obs, good, released):
            for k in kfs[:4]:
                store.add_observation(p, k, p)   # w=1 each (ur<0)
        # found-ratio 0.2 < 0.25
        store.pt_visible[bad_ratio] = 5
        store.pt_found[bad_ratio] = 1
        # few_obs: exactly th_obs (stereo: 3) observations
        store.erase_observation(few_obs, kfs[3])
        assert store.pt_n_obs[few_obs] == 3
        store.pt_first_kf[released] = -1   # age 3 at kf 2 -> released

        lm.recent_points = [bad_ratio, few_obs, good, released]
        cur = kfs[2]           # age 2 for points born at kf 0
        lm._cull_map_points(cur)
        assert not store.pt_valid[bad_ratio]
        assert not store.pt_valid[few_obs]
        assert store.pt_valid[good]
        # good (age 2, enough obs) stays in probation
        assert lm.recent_points == [good]
        # ... and leaves it at age >= 3
        lm._cull_map_points(kfs[3])
        assert store.pt_valid[good]
        assert lm.recent_points == []

    def test_keyframe_culling_90pct_redundancy(self):
        """ref: LocalMapping::KeyFrameCulling (src/LocalMapping.cc:632-703):
        a covisible keyframe whose valid points are >= 90% observed by
        >= 3 other keyframes at the same/finer octave is erased; the
        greedy sweep stops culling once observer counts drop."""
        store, lm, kfs, pts = self._world()
        for p in pts:
            for k in kfs:
                store.add_observation(p, k, p)
        for k in kfs:
            store.update_connections(k)
        n0 = int(store.kf_valid.sum())
        assert n0 == 5
        lm._cull_keyframes(kfs[-1])
        alive = [k for k in kfs if store.kf_valid[k]]
        # origin and the current keyframe are never culled; every point
        # starts with 4 other observers, so exactly two of the middle
        # keyframes are redundant before observer counts fall below 3
        assert kfs[0] in alive and kfs[-1] in alive
        assert len(alive) == 3, alive
        # points survive the erasures
        assert all(store.pt_valid[p] for p in pts)


class TestStaleMapGuard:
    """Local mapping waits for device results OUTSIDE store.lock; results
    dispatched before a loop correction / GBA / reset must be discarded
    at apply time (the map gauge changed under them)."""

    def _lm(self):
        from orb_slam2_tpu.slam.local_mapping import LocalMapper
        from orb_slam2_tpu.slam.map_store import MapStore

        store = MapStore(8, kf_cap=4, pt_cap=16)
        return LocalMapper(make_settings(), Sensor.STEREO, store), store

    def test_triangulate_apply_discards_on_big_change(self):
        lm, store = self._lm()
        pend = {"use": [], "packed": None, "B": 0, "guard": lm._map_guard()}
        store.big_change_idx += 1       # loop correction happened
        n_before = store.n_pt
        lm._triangulate_apply(0, pend)  # must not touch pend["packed"]
        assert store.n_pt == n_before

    def test_triangulate_apply_discards_on_reset(self):
        from orb_slam2_tpu.slam.map_store import MapStore

        lm, store = self._lm()
        pend = {"use": [], "packed": None, "B": 0, "guard": lm._map_guard()}
        lm.store = MapStore(8, kf_cap=4, pt_cap=16)   # reset swapped it
        lm._triangulate_apply(0, pend)
        assert lm.store.n_pt == 0

    def test_fuse_apply_discards_but_still_refreshes(self):
        lm, store = self._lm()
        from orb_slam2_tpu.slam.map_store import FrameFeatures

        n = 8
        ff = FrameFeatures(
            xy=np.zeros((n, 2), np.float32),
            xy_raw=np.zeros((n, 2), np.float32),
            ur=np.full(n, -1.0, np.float32),
            depth=np.full(n, -1.0, np.float32),
            octave=np.zeros(n, np.int32),
            angle=np.zeros(n, np.float32),
            desc=np.random.default_rng(0).integers(
                0, 2 ** 32, (n, 8)).astype(np.uint32),
            valid=np.ones(n, bool),
            node=np.full(n, -1, np.int32),
            word=np.full(n, -1, np.int32),
        )
        k = store.add_keyframe(ff, np.eye(4, dtype=np.float32), 0.0, 0)
        pend = {"targets": [k], "fwd": None, "rev": None,
                "guard": lm._map_guard()}
        store.big_change_idx += 1
        lm._fuse_neighbors_apply(k, pend)   # no crash, no fusion applied


class TestMapStore:
    def _store(self):
        from orb_slam2_tpu.slam.map_store import FrameFeatures, MapStore

        n = 8
        m = MapStore(n, kf_cap=4, pt_cap=16)
        ff = FrameFeatures(
            xy=np.zeros((n, 2), np.float32),
            xy_raw=np.zeros((n, 2), np.float32),
            ur=np.full(n, -1.0, np.float32),
            depth=np.full(n, -1.0, np.float32),
            octave=np.zeros(n, np.int32),
            angle=np.zeros(n, np.float32),
            desc=np.random.default_rng(0).integers(
                0, 2 ** 32, (n, 8)).astype(np.uint32),
            valid=np.ones(n, bool),
            node=np.full(n, -1, np.int32),
            word=np.full(n, -1, np.int32),
        )
        return m, ff

    def test_observation_lifecycle(self):
        m, ff = self._store()
        k0 = m.add_keyframe(ff, np.eye(4, dtype=np.float32), 0.0, 0)
        k1 = m.add_keyframe(ff, np.eye(4, dtype=np.float32), 1.0, 1)
        p = m.add_point(np.zeros(3), k0, ff.desc[0])
        m.add_observation(p, k0, 0)
        m.add_observation(p, k1, 3)
        assert m.pt_n_obs[p] == 2
        assert m.kf_obs[k0, 0] == p and m.kf_obs[k1, 3] == p
        m.erase_observation(p, k0)
        # <= 2 obs -> point dies (mono counting)
        assert not m.pt_valid[p]
        assert m.kf_obs[k1, 3] == -1

    def test_replace_point(self):
        m, ff = self._store()
        k0 = m.add_keyframe(ff, np.eye(4, dtype=np.float32), 0.0, 0)
        k1 = m.add_keyframe(ff, np.eye(4, dtype=np.float32), 1.0, 1)
        k2 = m.add_keyframe(ff, np.eye(4, dtype=np.float32), 2.0, 2)
        a = m.add_point(np.zeros(3), k0, ff.desc[0])
        b = m.add_point(np.ones(3), k0, ff.desc[1])
        for kf, feat in ((k0, 0), (k1, 1), (k2, 2)):
            m.add_observation(a, kf, feat)
        m.add_observation(b, k0, 5)
        m.replace_point(b, a)
        assert not m.pt_valid[b]
        assert m.resolve_replaced(b) == a
        # k0 already observes `a` at feature 0, so the duplicate slot is
        # cleared rather than rebound (ref: MapPoint::Replace
        # src/MapPoint.cc:177-240 IsInKeyFrame branch)
        assert m.kf_obs[k0, 5] == -1
        assert m.obs.find(a, k0) == 0

    def test_batched_point_update_matches_scalar(self):
        """update_points_batch == per-point update_normal_and_depth +
        update_scale_band on a randomized multi-KF map."""
        from orb_slam2_tpu.slam.map_store import FrameFeatures, MapStore

        rng = np.random.default_rng(7)
        n_feat, n_kf, n_pt = 32, 5, 20
        m = MapStore(n_feat, kf_cap=8, pt_cap=64)
        scale_factors = 1.2 ** np.arange(8)
        kfs = []
        for k in range(n_kf):
            ff = FrameFeatures(
                xy=rng.uniform(0, 100, (n_feat, 2)).astype(np.float32),
                xy_raw=np.zeros((n_feat, 2), np.float32),
                ur=np.full(n_feat, -1.0, np.float32),
                depth=np.full(n_feat, -1.0, np.float32),
                octave=rng.integers(0, 8, n_feat).astype(np.int32),
                angle=np.zeros(n_feat, np.float32),
                desc=rng.integers(0, 2 ** 32, (n_feat, 8)).astype(np.uint32),
                valid=np.ones(n_feat, bool),
                node=np.full(n_feat, -1, np.int32),
                word=np.full(n_feat, -1, np.int32),
            )
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = rng.normal(0, 2, 3)
            kfs.append(m.add_keyframe(ff, T, float(k), k))
        pids = []
        feat_next = {k: 0 for k in kfs}
        for i in range(n_pt):
            ref = kfs[rng.integers(0, n_kf)]
            p = m.add_point(rng.normal(0, 5, 3).astype(np.float32), ref,
                            np.zeros(8, np.uint32))
            obs_kfs = rng.permutation(kfs)[:rng.integers(1, n_kf + 1)]
            for k in obs_kfs:
                m.add_observation(p, int(k), feat_next[int(k)])
                feat_next[int(k)] += 1
            pids.append(p)
        pids = np.array(pids)
        # scalar reference values
        for pid in pids:
            m.update_normal_and_depth(int(pid))
            m.update_scale_band(int(pid), scale_factors)
        ref_normal = m.pt_normal[pids].copy()
        ref_max = m.pt_max_dist[pids].copy()
        ref_min = m.pt_min_dist[pids].copy()
        # perturb then batch-update
        m.pt_normal[pids] = 0
        m.pt_max_dist[pids] = -1
        m.pt_min_dist[pids] = -1
        m.update_points_batch(pids, scale_factors)
        np.testing.assert_allclose(m.pt_normal[pids], ref_normal,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(m.pt_max_dist[pids], ref_max, rtol=1e-5)
        np.testing.assert_allclose(m.pt_min_dist[pids], ref_min, rtol=1e-5)

    def test_covisibility_and_spanning_tree(self):
        m, ff = self._store()
        k0 = m.add_keyframe(ff, np.eye(4, dtype=np.float32), 0.0, 0)
        k1 = m.add_keyframe(ff, np.eye(4, dtype=np.float32), 1.0, 1)
        m.origin_kf = k0
        for i in range(6):
            p = m.add_point(np.zeros(3), k0, ff.desc[i])
            m.add_observation(p, k0, i)
            m.add_observation(p, k1, i)
        m.update_connections(k1, min_weight=3)
        assert m.covis[k1][k0] == 6
        assert m.covis[k0][k1] == 6
        assert m.kf_parent[k1] == k0
        assert k1 in m.kf_children[k0]


class TestDriftGate:
    """Pin the pipelined innovation gate's thresholds to the measured
    scenarios that shaped them (see tracking.drift_gate docstring)."""

    TH = 7.0  # stereo matching window

    def test_healthy_post_anchor_jitter_passes(self):
        # measured: 5-15 px innovation with hundreds of inliers right
        # after keyframe re-anchors — must NOT reject (the round-3
        # misfire cost three spurious map resets)
        from orb_slam2_tpu.slam.tracking import drift_gate
        soft, reject = drift_gate(12.7, self.TH, inl1=400.0, n_vis=498.0)
        assert soft and not reject

    def test_small_innovation_is_clean(self):
        from orb_slam2_tpu.slam.tracking import drift_gate
        soft, reject = drift_gate(2.5, self.TH, inl1=800.0, n_vis=900.0)
        assert not soft and not reject

    def test_true_divergence_rejects(self):
        # measured divergence trace: innovation grows past several
        # windows while first-solve support collapses
        from orb_slam2_tpu.slam.tracking import drift_gate
        soft, reject = drift_gate(46.9, self.TH, inl1=40.0, n_vis=240.0)
        assert soft and reject

    def test_huge_innovation_rejects_even_with_support(self):
        # repetitive texture aliases into consistent-but-wrong solves:
        # 124 'inliers' on a 1.5 m-wrong pose — the hard cap catches it
        from orb_slam2_tpu.slam.tracking import drift_gate
        soft, reject = drift_gate(155.7, self.TH, inl1=96.0, n_vis=133.0)
        assert soft and reject

    def test_strong_drift_correction_passes(self):
        # measured (paced bench circuit): the first solve after a new
        # keyframe's points enter the chain corrects ~90 px of blind-
        # extrapolation drift with 145/203 support — a recovery, not a
        # divergence; must NOT reject (rejecting it caused LOST + 22
        # failed relocalizations)
        from orb_slam2_tpu.slam.tracking import drift_gate
        soft, reject = drift_gate(90.1, self.TH, inl1=145.0, n_vis=203.0,
                                  drot_deg=5.2)
        assert soft and not reject

    def test_implausible_strong_solve_rejects(self):
        # measured aliasing incident (debug probe f106): a 2.2 m / 24 deg
        # 'correction' (innov 631 px) with 112/175 support on a collapsed
        # visible set passed the strong-support test, became a wrong-pose
        # keyframe, and nearly diverged tracking.  No honest window-
        # biased match set can produce a 90-window / 24-degree solve —
        # the physical-plausibility caps must reject it regardless of
        # support (each cap must fire on its own).
        from orb_slam2_tpu.slam.tracking import drift_gate
        _, reject = drift_gate(631.5, self.TH, inl1=112.0, n_vis=175.0,
                               drot_deg=24.2)
        assert reject
        _, reject = drift_gate(631.5, self.TH, inl1=112.0, n_vis=175.0,
                               drot_deg=0.0)
        assert reject  # 20-window innovation cap alone
        # rotation cap alone — support below the DECISIVE bar (2x
        # strong floor) so the cap applies (r5: decisive solves
        # override the caps, see drift_gate docstring)
        _, reject = drift_gate(60.0, self.TH, inl1=150.0, n_vis=500.0,
                               drot_deg=24.2)
        assert reject

    def test_map_moved_in_flight_keeps_plausible_solve(self):
        # measured (debug probe f180): local BA + fusion at the revisit
        # snapped the drifted section 0.4 m toward the old map while the
        # frame was in flight; the solve followed the moved points
        # (innov 96.3 px, 132/737 support — 'weak' because the widened
        # window cannot span a 36 px map shift).  With map_moved the
        # gate must keep the solve (re-anchor via soft), NOT reject it:
        # rejecting cost a LOST and the loop never closed.
        from orb_slam2_tpu.slam.tracking import drift_gate
        soft, reject = drift_gate(96.3, self.TH, inl1=132.0, n_vis=737.0,
                                  drot_deg=2.89, map_moved=True)
        assert soft and not reject
        # same solve without the in-flight map move: divergence, reject
        _, reject = drift_gate(96.3, self.TH, inl1=132.0, n_vis=737.0,
                               drot_deg=2.89, map_moved=False)
        assert reject
        # map_moved only LOOSENS: implausible corrections still reject,
        # and support below 50 still rejects
        _, reject = drift_gate(631.5, self.TH, inl1=112.0, n_vis=175.0,
                               drot_deg=24.2, map_moved=True)
        assert reject
        _, reject = drift_gate(96.3, self.TH, inl1=40.0, n_vis=737.0,
                               drot_deg=2.89, map_moved=True)
        assert reject
        # ... and never tightens a frame the plain gate accepts
        _, reject = drift_gate(2.0, self.TH, inl1=40.0, n_vis=100.0,
                               map_moved=True)
        assert not reject

    def test_moderate_innovation_with_support_passes(self):
        # the damped velocity model lags real accelerations by design;
        # a supported solve 3-8 windows out re-anchors but is kept
        from orb_slam2_tpu.slam.tracking import drift_gate
        soft, reject = drift_gate(35.0, self.TH, inl1=300.0, n_vis=500.0)
        assert soft and not reject

    def test_innovation_px_formula(self):
        from orb_slam2_tpu.slam.tracking import innovation_px
        import numpy as np
        # 0.043 m at 6 m depth + 0.5 deg, fx=718: ~11.4 px
        v = innovation_px(718.0, 0.043, 0.5, 6.0)
        assert abs(v - (718.0 * (0.043 / 6.0 + np.radians(0.5)))) < 1e-6
        # without a depth estimate the translation term is unknowable
        # but the rotation term needs no depth — it must survive so the
        # drift gate stays active for monocular chained tracking
        # (round-3 advisor finding)
        v0 = innovation_px(718.0, 1.0, 1.0, 0.0)
        assert abs(v0 - 718.0 * np.radians(1.0)) < 1e-6


class TestGateParamsDerivation:
    """GateParams.from_settings must reproduce the bench-regime
    constants exactly and stay coherent across randomized regimes
    (VERDICT r4 #5: the gate must be robust beyond one bench)."""

    def test_bench_regime_reproduces_round4_constants(self):
        from orb_slam2_tpu.config import Settings
        from orb_slam2_tpu.slam.tracking import GateParams
        s = Settings(fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                     bf=386.1448, width=1240, height=376,
                     n_features=2000, fps=10.0)
        p = GateParams.from_settings(s, chain_max_age=4)
        assert p.nonstrong_w == 8.0
        assert p.implausible_w == 20.0
        assert abs(p.rot_cap_deg - 14.9) < 0.1
        assert p.weak_floor == 30.0
        assert p.strong_floor == 100.0
        assert p.moved_floor == 50.0

    def test_randomized_regimes_no_misclassification(self):
        """20 seeded regimes (feature budget, frame rate, chain length,
        velocity): honest corrections generated by the gate's own
        physical model must never reject; divergences must always
        reject."""
        from orb_slam2_tpu.slam.tracking import GateParams, drift_gate

        class S:       # minimal settings stand-in
            def __init__(self, nf, fps):
                self.n_features = nf
                self.fps = fps

        rng = np.random.default_rng(7)
        for trial in range(20):
            nf = int(rng.integers(600, 4000))
            fps = float(rng.choice([5.0, 10.0, 20.0, 30.0]))
            age = int(rng.choice([2, 4, 6]))
            th = float(rng.choice([7.0, 15.0]))
            p = GateParams.from_settings(S(nf, fps), chain_max_age=age)

            for _ in range(50):
                n_vis = float(rng.integers(max(60, nf // 10), nf))
                # HONEST correction: within the trusted-strong window,
                # support above the strong bar, rotation from a real
                # pan (<=0.6 rad/s) over the chain
                innov = float(rng.uniform(0, p.nonstrong_w * th))
                inl = float(max(p.strong_floor,
                                p.strong_frac * n_vis) + 1)
                drot = float(np.degrees(
                    rng.uniform(0, 0.6) * age / fps))
                _, reject = drift_gate(innov, th, inl, n_vis,
                                       drot_deg=drot, params=p)
                assert not reject, (trial, innov, inl, n_vis, drot)

                # HONEST small correction with modest support
                innov = float(rng.uniform(0, p.weak_w * th))
                inl = float(max(p.weak_floor, p.weak_frac * n_vis) + 1)
                _, reject = drift_gate(innov, th, inl, n_vis, params=p)
                assert not reject, (trial, innov, inl, n_vis)

                # DIVERGENCE: implausible correction with sub-DECISIVE
                # support must reject (decisive solves override the
                # caps by design — the reference accepts any >=30-
                # inlier solve, Tracking.cc:968)
                innov = float(rng.uniform(p.implausible_w * th * 1.01,
                                          p.implausible_w * th * 30))
                inl = float(min(2.0 * p.strong_floor - 1,
                                p.weak_frac * n_vis))
                _, reject = drift_gate(innov, th, inl, n_vis, params=p)
                assert reject, (trial, innov, inl, n_vis)

                # DIVERGENCE: moderate innovation with collapsed
                # support must reject
                innov = float(rng.uniform(p.weak_w * th * 1.01,
                                          p.nonstrong_w * th))
                inl = float(rng.uniform(0, p.weak_floor - 1))
                _, reject = drift_gate(innov, th, inl, n_vis, params=p)
                assert reject, (trial, innov, inl, n_vis)

                # DIVERGENCE: rotation beyond any physical pan for this
                # regime must reject at sub-decisive support
                drot = float(p.rot_cap_deg * rng.uniform(1.05, 3.0))
                inl = float(min(2.0 * p.strong_floor - 1,
                                p.weak_frac * n_vis))
                _, reject = drift_gate(1.0, th, inl, n_vis,
                                       drot_deg=drot, params=p)
                assert reject, (trial, drot)

    def test_loop_correction_jump_with_decisive_support_passes(self):
        # r5 measured: a loop correction moved the map while a frame was
        # in flight; the solve followed it (innov 305.5 px, 636 inliers
        # on ~700 visible).  With map_moved, decisive support must
        # override the plausibility caps — rejecting cost a LOST at the
        # revisit.
        from orb_slam2_tpu.slam.tracking import drift_gate
        TH = 7.0
        soft, reject = drift_gate(305.5, TH, inl1=636.0,
                                  n_vis=700.0, map_moved=True)
        assert soft and not reject
        # DECISIVE support also overrides the caps without a map move:
        # the first revisit solve corrects a full orbit of accumulated
        # drift (r5 measured: 154.7 px on 574 inliers, map unmoved)
        soft, reject = drift_gate(154.7, TH, inl1=574.0, n_vis=900.0,
                                  map_moved=False)
        assert soft and not reject
        # ... but the same innovation with sub-decisive support rejects
        _, reject = drift_gate(305.5, TH, inl1=150.0, n_vis=700.0,
                               map_moved=False)
        assert reject
