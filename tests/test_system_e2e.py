"""CI-sized end-to-end System tests for the paths round 1 left to manual
soak scripts (VERDICT Weak #4): loop closing, relocalization, reset
wiring, and the monocular pipeline.

All runs use the synchronous deterministic scheduler on synthetic scenes
(SURVEY §4 test pyramid item 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.ops import frontend
from orb_slam2_tpu.places.vocabulary import Vocabulary
from orb_slam2_tpu.system import System

from synthetic import (
    CylinderScene, PlaneScene, circle_trajectory, stereo_sequence,
    straight_trajectory,
)

H, W = 240, 320
FX = FY = 260.0
BASELINE = 0.1


def make_settings(**kw):
    base = dict(
        fx=FX, fy=FY, cx=W / 2, cy=H / 2, bf=FX * BASELINE,
        width=W, height=H, n_features=600, fps=5.0, th_depth=60.0,
    )
    base.update(kw)
    return Settings(**base)


def center_of(T):
    return -T[:3, :3].T @ T[:3, 3]


def kf_ate(store, poses, dt):
    """RMSE of keyframe centers vs ground truth (same gauge: both are
    relative to the first pose at identity)."""
    T0 = poses[0].copy()
    errs = []
    for k in store.valid_kf_ids():
        k = int(k)
        fi = int(round(store.kf_timestamp[k] / dt))
        Tg = poses[fi] @ np.linalg.inv(T0)
        errs.append(np.linalg.norm(center_of(store.kf_pose[k])
                                   - center_of(Tg)))
    errs = np.asarray(errs)
    return float(np.sqrt((errs ** 2).mean()))


@pytest.fixture(scope="module")
def cylinder_world():
    """Shared cylinder scene + toy vocabulary for loop/reloc tests."""
    settings = make_settings()
    scene = CylinderScene(settings.K, H, W)
    # vocab trained on a handful of views around the orbit
    probe = circle_trajectory(12, orbit_r=2.0, total_angle=2 * np.pi)
    descs = []
    for T in probe:
        f = frontend.extract(jnp.asarray(scene.render(T)), n_features=600)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)
    return settings, scene, voc


def run_circuit(settings, scene, voc, n_frames, total_angle, disable_loop):
    sys_ = System(settings, Sensor.STEREO, vocabulary=voc)
    if disable_loop:
        sys_.loop_closer.insert_keyframe = lambda kf: None
    poses = circle_trajectory(n_frames, orbit_r=2.0,
                              total_angle=total_angle)
    Trl = np.eye(4, dtype=np.float32)
    Trl[0, 3] = -BASELINE
    for i, T in enumerate(poses):
        sys_.track_stereo(scene.render(T), scene.render(Trl @ T), i * 0.2)
    return sys_, poses


class TestLoopClosing:
    @pytest.mark.slow
    def test_loop_closes_and_improves_ate(self, cylinder_world):
        # two full sync circuits (~227 s CPU) — slow tier; the default
        # suite keeps loop-closing covered via TestLoopClosureAtScale
        # and the verify drive (scripts/loop_ate.py) runs it end-to-end
        settings, scene, voc = cylinder_world
        n, ang = 80, 2 * np.pi * 1.25
        sys_on, poses = run_circuit(settings, scene, voc, n, ang,
                                    disable_loop=False)
        assert sys_on.loop_closer.loops_closed >= 1
        assert sys_on.loop_closer.loop_detected  # fork Monopub flag
        ate_on = kf_ate(sys_on.map, poses, 0.2)

        sys_off, _ = run_circuit(settings, scene, voc, n, ang,
                                 disable_loop=True)
        ate_off = kf_ate(sys_off.map, poses, 0.2)
        assert ate_on < ate_off, (ate_on, ate_off)


class TestRelocalization:
    def test_lost_then_relocalizes(self, cylinder_world):
        settings, scene, voc = cylinder_world
        sys_ = System(settings, Sensor.STEREO, vocabulary=voc)
        poses = circle_trajectory(40, orbit_r=2.0,
                                  total_angle=np.pi * 0.8)
        Trl = np.eye(4, dtype=np.float32)
        Trl[0, 3] = -BASELINE
        T0 = poses[0].copy()
        for i, T in enumerate(poses):
            sys_.track_stereo(scene.render(T), scene.render(Trl @ T),
                              i * 0.2)
        assert sys_.tracker.state.name == "OK"

        # kill tracking with blank frames
        blank = np.zeros((H, W), np.float32)
        for j in range(3):
            sys_.track_stereo(blank, blank, 100 + j * 0.2)
        assert sys_.tracker.state.name == "LOST"

        # revisit a mapped pose -> BoW reloc -> EPnP -> guided rounds
        T = poses[10]
        Te = None
        for j in range(3):
            Te = sys_.track_stereo(scene.render(T),
                                   scene.render(Trl @ T), 200 + j * 0.2)
        assert sys_.tracker.state.name == "OK"
        Tg = T @ np.linalg.inv(T0)
        err = np.linalg.norm(center_of(Te) - center_of(Tg))
        assert err < 0.1, f"reloc pose error {err:.3f} m"


class TestReset:
    def test_reset_rebinds_every_subsystem(self, cylinder_world):
        settings, scene, voc = cylinder_world
        sys_ = System(settings, Sensor.STEREO, vocabulary=voc)
        poses = circle_trajectory(8, orbit_r=2.0, total_angle=0.4)
        Trl = np.eye(4, dtype=np.float32)
        Trl[0, 3] = -BASELINE
        for i, T in enumerate(poses):
            sys_.track_stereo(scene.render(T), scene.render(Trl @ T),
                              i * 0.2)
        old_store = sys_.store
        assert int(old_store.kf_valid.sum()) >= 1

        sys_.reset()
        # every subsystem must point at the fresh store
        # (ref: Tracking::Reset clears ALL threads, src/Tracking.cc:1505)
        assert sys_.store is sys_.tracker.store
        assert sys_.store is not old_store
        assert sys_.local_mapper.store is sys_.store
        assert sys_.loop_closer.store is sys_.store
        assert sys_.tracker.relocalizer.store is sys_.store
        assert int(sys_.store.kf_valid.sum()) == 0
        # erase hooks (KeyFrameDatabase) survive onto the new store
        assert any(getattr(h, "__self__", None) is sys_.kf_database
                   for h in sys_.store.erase_hooks)

        # and the system re-initializes + tracks + reloc/loop paths run
        # against the NEW map without touching stale ids
        for i, T in enumerate(poses):
            Te = sys_.track_stereo(scene.render(T),
                                   scene.render(Trl @ T), 50 + i * 0.2)
        assert sys_.tracker.state.name == "OK"
        assert Te is not None
        assert int(sys_.store.kf_valid.sum()) >= 1


class TestGlobalBA:
    """Reference background-GBA protocol (src/LoopClosing.cc:646-757):
    abortable runs, and spanning-tree correction of keyframes/points
    created while GBA was in flight."""

    def _build(self, cylinder_world, n_first, n_total):
        settings, scene, voc = cylinder_world
        sys_ = System(settings, Sensor.STEREO, vocabulary=voc)
        poses = circle_trajectory(n_total, orbit_r=2.0,
                                  total_angle=np.pi * 0.9)
        Trl = np.eye(4, dtype=np.float32)
        Trl[0, 3] = -BASELINE
        for i in range(n_first):
            T = poses[i]
            sys_.track_stereo(scene.render(T), scene.render(Trl @ T),
                              i * 0.2)
        return sys_, scene, poses, Trl

    def test_mid_gba_keyframes_follow_spanning_tree(self, cylinder_world):
        from orb_slam2_tpu.slam.global_ba import GlobalBA, _Run

        sys_, scene, poses, Trl = self._build(cylinder_world, 28, 44)
        store = sys_.store
        assert int(store.kf_valid.sum()) >= 3

        gba = GlobalBA(sys_.local_mapper)
        snap = gba._snapshot(loop_kf=0, iters=10,
                             fixed_kf=store.origin_kf)
        assert snap is not None
        snap_kfs = set(snap["cam_index"])
        snap_pts = set(int(p) for p in snap["pids"])

        # keyframes + points born "while GBA runs"
        for i in range(28, 44):
            T = poses[i]
            sys_.track_stereo(scene.render(T), scene.render(Trl @ T),
                              i * 0.2)
        born = [int(k) for k in store.valid_kf_ids()
                if int(k) not in snap_kfs]
        assert born, "no keyframe was created after the snapshot"
        pre = {int(k): store.kf_pose[int(k)].copy()
               for k in store.valid_kf_ids()}

        r = _Run()
        gba._run(snap, r)
        assert gba.runs_finished == 1

        # born keyframes moved WITH their spanning-tree parent: the
        # relative pose to the parent is preserved by the correction
        for k in born:
            p = int(store.kf_parent[k])
            assert p >= 0
            rel_before = pre[k] @ np.linalg.inv(pre[p])
            rel_after = store.kf_pose[k] @ np.linalg.inv(store.kf_pose[p])
            np.testing.assert_allclose(rel_after, rel_before,
                                       atol=5e-3)
        # born points moved too (tracked via their reference keyframe)
        new_pts = [int(p) for p in store.valid_pt_ids()
                   if int(p) not in snap_pts]
        assert all(np.isfinite(store.pt_pos[new_pts]).all()
                   for _ in [0]) if new_pts else True

    def test_stop_discards_results(self, cylinder_world):
        from orb_slam2_tpu.slam.global_ba import GlobalBA, _Run

        sys_, _, _, _ = self._build(cylinder_world, 20, 20)
        store = sys_.store
        gba = GlobalBA(sys_.local_mapper)
        snap = gba._snapshot(loop_kf=0, iters=10,
                             fixed_kf=store.origin_kf)
        pre = {int(k): store.kf_pose[int(k)].copy()
               for k in store.valid_kf_ids()}
        r = _Run()
        r.stop = True      # killed before the first chunk (mbStopGBA)
        gba._run(snap, r)
        assert gba.runs_aborted == 1 and gba.runs_finished == 0
        for k, T in pre.items():
            np.testing.assert_array_equal(store.kf_pose[k], T)

    def test_background_thread_applies(self, cylinder_world):
        from orb_slam2_tpu.slam.global_ba import GlobalBA

        sys_, _, _, _ = self._build(cylinder_world, 20, 20)
        store = sys_.store
        gba = GlobalBA(sys_.local_mapper)
        ok = gba.launch(loop_kf=0, iters=10,
                        fixed_kf=store.origin_kf, background=True)
        assert ok
        gba.wait()
        assert gba.runs_finished == 1
        assert not gba.running


class TestMonocular:
    @pytest.mark.slow
    def test_mono_end_to_end(self):
        # ~120 s CPU (mono-init compile dominated) — slow tier with the
        # mono circuit test; default suite keeps mono init covered via
        # the initializer RANSAC units (test_solvers)
        settings = make_settings(n_features=800, fps=10.0, th_depth=40.0)
        scene = PlaneScene(settings.K, H, W)
        # enough sideways translation for H/F initialization parallax
        poses = straight_trajectory(25, step=0.06, yaw_step=0.002)
        sys_ = System(settings, Sensor.MONOCULAR)
        est = []
        for i, T in enumerate(poses):
            Te = sys_.track_monocular(scene.render(T), i * 0.1)
            est.append(None if Te is None else Te.copy())
        # init must have happened and tracking survived to the end
        assert sys_.tracker.state.name == "OK"
        assert int(sys_.map.kf_valid.sum()) >= 2
        assert int(sys_.map.pt_valid.sum()) > 50
        n_tracked = sum(T is not None for T in est)
        assert n_tracked >= len(poses) // 2

        # scale-aligned trajectory accuracy (mono scale is arbitrary:
        # align with the ratio of median displacements)
        T0 = next(i for i, T in enumerate(est) if T is not None)
        gt = np.array([center_of(poses[i] @ np.linalg.inv(poses[T0]))
                       for i, T in enumerate(est) if T is not None])
        ee = np.array([center_of(T) for T in est if T is not None])
        num = np.linalg.norm(gt, axis=1)
        den = np.linalg.norm(ee, axis=1)
        s = np.median(num[den > 1e-6] / den[den > 1e-6])
        errs = np.linalg.norm(gt - s * ee, axis=1)
        # mono accumulates scale drift; the bound reflects ~10% of the
        # 1.5 m excursion plus alignment slack
        assert errs.max() < 0.3, f"scaled ATE max {errs.max():.3f} m"
        assert np.median(errs) < 0.1, f"scaled ATE median {np.median(errs):.3f} m"


class TestChangeCalibration:
    def test_hot_swap_rebuilds_steps_and_keeps_tracking(
            self, cylinder_world, tmp_path):
        """ref: Tracking::ChangeCalibration (src/Tracking.cc:1553-1584)
        swaps intrinsics mid-run and re-triggers the one-time frame
        computations; here the camera-dependent compiled steps must be
        dropped and tracking must survive on the live map."""
        settings, scene, voc = cylinder_world
        sys_ = System(settings, Sensor.STEREO, vocabulary=voc)
        poses = circle_trajectory(10, orbit_r=2.0, total_angle=0.5)
        Trl = np.eye(4, dtype=np.float32)
        Trl[0, 3] = -BASELINE
        for i, T in enumerate(poses[:6]):
            sys_.track_stereo(scene.render(T), scene.render(Trl @ T),
                              i * 0.2)
        assert sys_.tracker.state.name == "OK"
        old_step = sys_.tracker._fast_step

        # near-identical calibration (a hot-swap, not a scene change)
        yaml = tmp_path / "recal.yaml"
        yaml.write_text(
            "%YAML:1.0\n"
            f"Camera.fx: {FX * 1.001}\nCamera.fy: {FY}\n"
            f"Camera.cx: {W / 2}\nCamera.cy: {H / 2}\n"
            f"Camera.bf: {FX * BASELINE * 1.001}\n"
        )
        sys_.change_calibration(str(yaml))
        assert abs(sys_.settings.fx - FX * 1.001) < 1e-6
        assert sys_.tracker._fast_step is None or \
            sys_.tracker._fast_step is not old_step

        for j, T in enumerate(poses[6:]):
            sys_.track_stereo(scene.render(T), scene.render(Trl @ T),
                              2.0 + j * 0.2)
        assert sys_.tracker.state.name == "OK"


class TestMonocularLoopClosing:
    """Free-scale Sim3 loop closing (the reference's monocular path:
    Sim3Solver bFixScale=false, src/LoopClosing.cc:272, then the 7-DoF
    essential graph src/Optimizer.cc:781).  Every other loop test runs
    stereo, which fixes scale — this pins the s != 1 estimation and the
    scale-drift correction end-to-end."""

    @pytest.mark.slow
    def test_mono_circuit_closes_loop(self, cylinder_world):
        settings, scene, voc = cylinder_world
        sys_ = System(settings, Sensor.MONOCULAR, vocabulary=voc)
        poses = circle_trajectory(140, orbit_r=2.0,
                                  total_angle=2 * np.pi * 1.3)
        for i, T in enumerate(poses):
            sys_.track_monocular(scene.render(T), i * 0.2)
        assert sys_.tracker.state.name == "OK"
        assert sys_.loop_closer.loops_closed >= 1
        st = sys_.map
        assert int(st.kf_valid.sum()) >= 20

        # scale-aligned ATE (mono scale is arbitrary)
        T0 = poses[0].copy()
        C, G = [], []
        for k in st.valid_kf_ids():
            k = int(k)
            fi = int(round(st.kf_timestamp[k] / 0.2))
            Tg = poses[fi] @ np.linalg.inv(T0)
            C.append(center_of(st.kf_pose[k]))
            G.append(center_of(Tg))
        C, G = np.array(C), np.array(G)
        nc = np.linalg.norm(C, axis=1)
        ng = np.linalg.norm(G, axis=1)
        s = np.median(ng[nc > 1e-6] / nc[nc > 1e-6])
        errs = np.linalg.norm(s * C - G, axis=1)
        rmse = float(np.sqrt((errs ** 2).mean()))
        # probe run measured 0.051 on a 2 m-radius orbit; leave slack
        assert rmse < 0.2, f"mono loop-closed scaled ATE {rmse:.3f}"


class TestPipelinedLoopCircuit:
    """Pipelined-vs-sequential accuracy on the turning, keyframe-and-
    loop-producing circuit (VERDICT r3 #7): the straight-line pipelined
    test bounds per-frame jitter, but the drift gate's END-TO-END cost
    (re-anchors, rejected solves, suppressed keyframes) only shows on a
    circuit that turns, creates keyframes, and closes a loop.  Ref
    behavior being preserved: motion-model tracking accuracy
    (src/Tracking.cc:868-930)."""

    @pytest.mark.slow
    def test_pipelined_loop_ate_close_to_sequential(self, cylinder_world):
        settings, scene, voc = cylinder_world
        poses = circle_trajectory(120, orbit_r=2.0,
                                  total_angle=2 * np.pi * 1.3)
        Trl = np.eye(4, dtype=np.float32)
        Trl[0, 3] = -BASELINE

        def run(pipelined):
            s = make_settings()
            s.pipelined = pipelined
            sys_ = System(s, Sensor.STEREO, vocabulary=voc)
            for i, T in enumerate(poses):
                sys_.track_stereo(scene.render(T), scene.render(Trl @ T),
                                  i * 0.2)
            sys_.tracker._flush_pipeline()
            sys_.local_mapper.spin()
            if sys_.loop_closer is not None:
                sys_.loop_closer.spin()
            return (kf_ate(sys_.map, poses, 0.2),
                    sys_.loop_closer.loops_closed, sys_.tracker)

        ate_seq, loops_seq, _ = run(False)
        ate_pipe, loops_pipe, tr = run(True)
        assert loops_seq >= 1, "sequential pass failed to close the loop"
        assert loops_pipe >= 1, "pipelined pass failed to close the loop"
        assert tr.state.name == "OK" and tr.resets == 0
        # within 1.5x of sequential (+5 cm absolute floor for tiny-ATE
        # noise on the toy scene)
        assert ate_pipe <= max(1.5 * ate_seq, ate_seq + 0.05), (
            f"pipelined ATE {ate_pipe:.3f} vs sequential {ate_seq:.3f}")


class TestAsyncScheduler:
    """The reference's runtime thread topology (src/System.cc:85-104):
    tracking on the caller thread, LocalMapping and LoopClosing each on
    their own thread, GBA spawned in the background by LoopClosing."""

    @pytest.mark.slow
    def test_async_circuit_closes_loop(self, cylinder_world):
        import time

        settings, scene, voc = cylinder_world
        sys_ = System(settings, Sensor.STEREO, vocabulary=voc,
                      scheduler="async")
        assert len(sys_._workers) == 2          # mapping + loop threads
        assert sys_.loop_closer.background_gba
        poses = circle_trajectory(80, orbit_r=2.0,
                                  total_angle=2 * np.pi * 1.25)
        Trl = np.eye(4, dtype=np.float32)
        Trl[0, 3] = -BASELINE
        lc = sys_.loop_closer

        def drain(limit):
            # wait for true quiescence: queues popped-before-processing
            # means `not queue` alone is NOT idle (LocalMapper.idle)
            t0 = time.time()
            while time.time() - t0 < limit:
                if sys_.local_mapper.idle() and lc.idle():
                    return True
                time.sleep(0.02)
            return False

        for i, T in enumerate(poses):
            sys_.track_stereo(scene.render(T), scene.render(Trl @ T),
                              i * 0.2)
            # real-time pacing: a 5 fps camera gives the mapping/loop
            # threads the inter-frame budget; the CI box has 2 cores so
            # an unpaced feed starves them (the reference assumes the
            # same — mapping keeps up with the camera rate)
            drain(30.0)
        assert drain(120.0)
        assert lc.loops_closed >= 1
        if lc.gba is not None:
            assert lc.gba.runs_finished + lc.gba.runs_aborted >= 1
        ate = kf_ate(sys_.map, poses, 0.2)
        assert ate < 1.2, f"async-mode loop-closed ATE {ate:.2f}"

        # the background-GBA pose jump may cost tracking (the reference
        # has the same exposure, src/Tracking.cc:274-317) — revisiting
        # mapped territory must recover via relocalization
        for j, T in enumerate(poses[8:20]):
            sys_.track_stereo(scene.render(T), scene.render(Trl @ T),
                              100 + j * 0.2)
            drain(30.0)
        assert sys_.tracker.state.name == "OK"
        sys_.shutdown()
        for w in sys_._workers:
            assert not w.is_alive()

    @pytest.mark.slow
    def test_async_soak_concurrent(self, cylinder_world):
        """Genuinely concurrent soak (VERDICT r2 next #4): 200 frames
        paced at camera fps ONLY — no per-frame quiescence drain — so
        tracking, mapping, loop closing, and background GBA actually
        overlap.  Asserts no deadlock, store invariants, >= 1 loop, a
        recovered tracking state, and that overlap really happened."""
        import time

        settings, scene, voc = cylinder_world
        sys_ = System(settings, Sensor.STEREO, vocabulary=voc,
                      scheduler="async")
        n_frames = 200
        poses = circle_trajectory(n_frames, orbit_r=2.0,
                                  total_angle=2 * np.pi * 1.6)
        Trl = np.eye(4, dtype=np.float32)
        Trl[0, 3] = -BASELINE
        lc = sys_.loop_closer
        period = 1.0 / settings.fps
        overlap_mapper = 0
        overlap_gba = 0
        t_next = time.time()
        for i, T in enumerate(poses):
            # render outside the pace window (host-side scene cost is
            # not part of the camera period)
            left, right = scene.render(T), scene.render(Trl @ T)
            now = time.time()
            if now < t_next:
                time.sleep(t_next - now)
            t_next = max(t_next + period, time.time())
            sys_.track_stereo(left, right, i * period)
            if not sys_.local_mapper.idle() or not lc.idle():
                overlap_mapper += 1
            if lc.gba is not None and lc.gba.running:
                overlap_gba += 1

        # quiescence within a bounded wait = no deadlock
        t0 = time.time()
        while time.time() - t0 < 300:
            if sys_.local_mapper.idle() and lc.idle() and (
                    lc.gba is None or not lc.gba.running):
                break
            time.sleep(0.05)
        else:
            raise AssertionError("workers never quiesced (deadlock?)")

        # overlap really happened: this test is worthless if the
        # threads only ever ran while tracking slept
        assert overlap_mapper > 10, overlap_mapper
        assert lc.loops_closed >= 1
        if lc.gba is not None and lc.gba.runs_finished > 0:
            assert overlap_gba > 0, \
                "GBA finished but never overlapped a tracked frame"

        # store invariants under the lock
        store = sys_.map
        with store.lock:
            kfs = store.valid_kf_ids()
            assert np.isfinite(store.kf_pose[kfs]).all()
            rows = store.kf_obs[kfs]
            bound = rows[rows >= 0]
            assert (bound < store.n_pt).all(), "out-of-range pid bound"
            pids = store.valid_pt_ids()
            assert np.isfinite(store.pt_pos[pids]).all()
            # every observation-engine entry is mirrored in kf_obs
            idx, okfs, ofeats = store.obs.dump(pids)
            mirrored = store.kf_obs[okfs, ofeats] == pids[idx]
            assert mirrored.all(), (
                f"{int((~mirrored).sum())} engine entries not mirrored")

        # tracking must end OK or recover on already-mapped ground
        if sys_.tracker.state.name != "OK":
            for j, T in enumerate(poses[:30]):
                sys_.track_stereo(scene.render(T), scene.render(Trl @ T),
                                  1000 + j * period)
                if sys_.tracker.state.name == "OK":
                    break
        assert sys_.tracker.state.name == "OK"
        sys_.shutdown()
        for w in sys_._workers:
            assert not w.is_alive()
