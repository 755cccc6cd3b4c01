"""Benchmark: stereo SLAM tracking FPS on a KITTI-shaped synthetic circuit.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference must keep up with KITTI's 10 fps dataset rate
(BASELINE.md; Examples/Stereo/KITTI00-02.yaml:22) on an i7-class CPU;
the rebuild's north star is >30 FPS on one TPU chip (BASELINE.json).
vs_baseline is measured FPS / 30 (the north-star target, not the
easier 10 fps dataset rate).

Round-3 shape (VERDICT r2 next #2): 100 frames of a textured-cylinder
circuit at KITTI geometry (1240x376, 2000 ORB features) that creates
keyframes continuously and CLOSES ONE LOOP inside the timed window, so
keyframe-dense stretches, loop correction, and background GBA land in
the measurement.  Reported beyond the median: p90, worst frame, keyframe
count, loop count, and mapping keep-up (max queue depth + mean per-KF
mapping time) — a 30 fps median that hides 500 ms keyframe hiccups is
not real-time (the reference paces every frame at the dataset rate,
Examples/Stereo/stereo_kitti.cc:100-107).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

import numpy as np  # noqa: E402


def main():
    # wedged/absent TPU tunnel: fall back to CPU so the bench still
    # reports a number instead of hanging the driver (a wedged axon
    # tunnel blocks jax.devices() forever; sitecustomize overrides
    # JAX_PLATFORMS, so only the in-process config update works)
    from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache

    platform = ensure_live_backend()
    setup_compile_cache(platform)
    backend_note = ("" if platform != "cpu"
                    else " [CPU FALLBACK: TPU tunnel unavailable]")

    import jax.numpy as jnp  # noqa: E402

    from orb_slam2_tpu.config import Sensor, Settings
    from orb_slam2_tpu.ops import frontend
    from orb_slam2_tpu.places.vocabulary import Vocabulary
    from orb_slam2_tpu.system import System
    from synthetic import CylinderScene, circle_trajectory

    # KITTI-00 stereo geometry (Examples/Stereo/KITTI00-02.yaml)
    H, W = 376, 1240
    FX = FY = 718.856
    CX, CY = 607.19, 185.22
    BF = 386.1448
    # th_depth is a per-dataset knob in the reference (every yaml sets
    # its own ThDepth; KITTI00-02.yaml:35 uses 35 for KITTI's deep
    # outdoor scenes).  The synthetic cylinder's depth band is ~5.5-11 m;
    # 35*baseline = 18.8 m classifies EVERY point "close", so the
    # keyframe policy's need-close trigger (Tracking.cc:1470-1484) never
    # fires and the map starves (17 KFs, no loop).  9.5*baseline = 5.1 m
    # splits the band the way 35 splits KITTI's.
    settings = Settings(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        n_features=2000, fps=10.0, th_depth=9.5,
    )
    # deep-pipelined tracking: up to pipeline_depth frames in flight,
    # results drained as the tunnel delivers them — hides the d2h RTT
    # that otherwise floors every frame (accuracy parity pinned by
    # tests/test_pipeline.py::TestPipelinedMode)
    settings.pipelined = True

    n_frames = int(os.environ.get("BENCH_FRAMES", "240"))
    # tex_h=2048: vertical texture period 17 m > the visible span at
    # far-wall depth, so no repeated-texture descriptor aliasing (the
    # 512 default repeats every 4.27 m — real scenes don't tile)
    scene = CylinderScene(settings.K, H, W, radius=8.0, tex_h=2048)
    # 1.5 orbits over 240 frames = 2.25 deg/frame yaw (KITTI-00 turns
    # peak ~3 deg/frame at 10 fps); the revisit starts at frame ~160,
    # leaving ~80 frames (≈7 keyframes) past it — comfortably enough for
    # the loop detector's 3-consecutive covisibility-consistency vote
    poses = circle_trajectory(n_frames, orbit_r=3.0,
                              total_angle=2 * np.pi * 1.5)
    baseline_m = BF / FX
    Trl = np.eye(4, dtype=np.float32)
    Trl[0, 3] = -baseline_m
    pairs = [(scene.render(T), scene.render(Trl @ T)) for T in poses]

    # tiny BoW vocabulary so loop closing runs (the full ORBvoc.txt is
    # not in the image; the detector only needs discriminative words)
    probe = circle_trajectory(10, orbit_r=3.0, total_angle=2 * np.pi)
    descs = []
    for T in probe:
        f = frontend.extract(jnp.asarray(scene.render(T)), n_features=800)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)

    def run_once(scheduler):
        """One tracked pass; returns (times, keepup stats, healthy).

        The next frame's images are prefetched right after each track
        call — the driver's dead time between frames (dataset pacing /
        camera period) overlaps the h2d image transfer, as a real
        capture pipeline does; only the track call itself is timed."""
        s = System(settings, Sensor.STEREO, vocabulary=voc,
                   scheduler=scheduler)
        times = []
        max_queue = 0
        # frames arrive at the DATASET rate, exactly like the reference
        # driver (stereo_kitti.cc:100-107 sleeps to the 10 fps KITTI
        # timestamp grid); the timed quantity is the track call itself.
        # Unpaced slamming would starve the concurrent mapping thread of
        # its inter-frame budget — something no real camera does.
        period = 1.0 / settings.fps
        t_next = time.perf_counter()
        for i, (l, r) in enumerate(pairs):
            now = time.perf_counter()
            if now < t_next:
                time.sleep(t_next - now)
            t_next = max(t_next + period, time.perf_counter())
            t0 = time.perf_counter()
            s.track_stereo(l, r, i * 0.1)
            times.append(time.perf_counter() - t0)
            if i + 1 < len(pairs):
                s.prefetch(*pairs[i + 1])
            max_queue = max(max_queue, len(s.local_mapper.queue))
        # bounded post-run drain (untimed): let mapping/loop-closing
        # finish the keyframes queued near the end of the sequence so a
        # loop detected on the final keyframes is counted — the
        # reference's threads likewise finish their queues while the
        # driver computes statistics (stereo_kitti.cc:124-141)
        t_drain = time.perf_counter()
        while time.perf_counter() - t_drain < 20.0:
            if s.local_mapper.idle() and (
                    s.loop_closer is None or s.loop_closer.idle()):
                break
            time.sleep(0.02)
        ok = (s.tracker.state.name == "OK"
              and int(s.map.kf_valid.sum()) >= 3
              and s.tracker.resets == 0)
        stats = {
            "n_keyframes": int(s.map.kf_valid.sum()),
            "loops_closed": int(s.loop_closer.loops_closed
                                if s.loop_closer else 0),
            "max_queue": max_queue,
            "n_resets": s.tracker.resets,
            "relocalizations": s.tracker.relocalizations,
        }
        # mean mapping time per processed keyframe (keep-up: must stay
        # under the keyframe interval for mapping to not fall behind).
        # lm/ba_{gather,device,writeback} are NESTED inside lm/local_ba
        # (local_mapping.py:190,649-671) — summing them too would double-
        # count the BA stage.
        lm = s.local_mapper.timers
        n_kf_proc = max(lm.counts.get("lm/process_new_kf", 1), 1)
        stats["mapper_ms_per_kf"] = round(
            sum(v for k, v in lm.totals.items()
                if not k.startswith("lm/ba_")) / n_kf_proc * 1e3, 1)
        if scheduler == "async":
            s.shutdown()
        return times, stats, ok

    # warmup passes: drive every shape bucket through compilation (the
    # axon tunnel does not serve the persistent compile cache, so cold
    # XLA compiles otherwise land inside the timed region).  Warm under
    # the SAME scheduler as the timed pass — async-mode thread timing
    # reaches different shape buckets than sync (round-3 profiling
    # caught 26-35s compiles inside the timed window when warmup ran
    # sync-only).  TWO passes: multi-second cold compiles stall the
    # paced pipeline enough to change the run's whole keyframe/loop
    # layout (measured: the cold pass goes LOST in the revisit window
    # and never reaches the buckets the healthy pass needs — an 11.6 s
    # compile then landed inside the timed window); pass 2 runs nearly
    # warm, follows the healthy trajectory, and fills in the rest.
    sched = "async"
    run_once(sched)
    run_once(sched)

    # timed pass (in-process jit caches stay hot) under the REFERENCE's
    # thread topology: mapping + loop closing on their own threads, the
    # timed Track* call is tracking only — exactly what the reference's
    # stereo_kitti median measures (Examples/Stereo/stereo_kitti.cc:
    # 80-122 times TrackStereo while LocalMapping runs concurrently).
    times, stats, ok = run_once(sched)
    if not ok:
        # async degraded tracking on this host — report the sequential
        # deterministic mode instead (slower but always healthy)
        sched = "sync"
        run_once(sched)
        times, stats, _ = run_once(sched)

    # steady-state stats over the full run past init
    steady = sorted(times[3:])
    median = steady[len(steady) // 2]
    p90 = steady[int(len(steady) * 0.9)]
    fps = 1.0 / median
    out = {
        "metric": "kitti_shape_stereo_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/sec (median, 1240x376 stereo, 2000 ORB "
                f"features, {n_frames}-frame loop circuit, {sched} "
                "scheduler)" + backend_note,
        # vs the >30 fps single-chip north star (BASELINE.json), not the
        # 10 fps KITTI dataset rate
        "vs_baseline": round(fps / 30.0, 3),
        "p50_ms": round(median * 1e3, 1),
        "p90_ms": round(p90 * 1e3, 1),
        "worst_ms": round(steady[-1] * 1e3, 1),
        "n_frames": n_frames,
    }
    out.update(stats)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
