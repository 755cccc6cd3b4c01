"""Mapping keep-up profile at reference keyframe density (VERDICT r3 #3).

The reference's LocalMapping sustains KITTI-00's ~1 keyframe per 3.5
frames (~0.35 s at 10 fps) on an i7 (src/LocalMapping.cc:47-112; KF
policy src/Tracking.cc:1029-1038).  BENCH_r03 measured 702 ms per
keyframe — 2x too slow at that density.  This probe runs the bench
circuit with the keyframe policy forced to reference density
(tracker.max_frames=4 makes condition c1a fire every 4 frames) and
prints the per-stage LocalMapper timer split per processed keyframe,
plus queue depth over time — the data for cutting the per-KF cost.

Usage: python scripts/mapper_profile.py [n_frames] [--kf-every N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache

_platform = ensure_live_backend()
setup_compile_cache(_platform)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from orb_slam2_tpu.config import Sensor, Settings
    from orb_slam2_tpu.ops import frontend
    from orb_slam2_tpu.places.vocabulary import Vocabulary
    from orb_slam2_tpu.system import System
    from synthetic import CylinderScene, circle_trajectory

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    kf_every = 4
    if "--kf-every" in sys.argv:
        kf_every = int(sys.argv[sys.argv.index("--kf-every") + 1])

    H, W = 376, 1240
    FX = 718.856
    settings = Settings(
        fx=FX, fy=FX, cx=607.19, cy=185.22, bf=386.1448, width=W, height=H,
        n_features=2000, fps=10.0, th_depth=9.5,
    )
    settings.pipelined = True
    scene = CylinderScene(settings.K, H, W, radius=8.0, tex_h=2048)
    poses = circle_trajectory(n_frames, orbit_r=3.0,
                              total_angle=2 * np.pi * 1.5 * n_frames / 240)
    Trl = np.eye(4, dtype=np.float32)
    Trl[0, 3] = -settings.bf / FX
    pairs = [(scene.render(T), scene.render(Trl @ T)) for T in poses]

    probe = circle_trajectory(10, orbit_r=3.0, total_angle=2 * np.pi)
    descs = []
    for T in probe:
        f = frontend.extract(jnp.asarray(scene.render(T)), n_features=800)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)

    s = System(settings, Sensor.STEREO, vocabulary=voc, scheduler="async")
    t0 = time.perf_counter()
    s.precompile()
    print(f"precompile: {time.perf_counter() - t0:.1f}s", flush=True)

    # force reference keyframe density.  max_frames=kf_every only arms
    # condition c1a — c2 (tracked-vs-reference ratio) still suppresses
    # on a well-tracked synthetic circuit (measured: 15 KFs over 160
    # frames with kf_every=4).  --hard bypasses the policy entirely so
    # the mapper sees a GUARANTEED KF every kf_every frames — the
    # keep-up stress the reference's densest KITTI-00 stretches apply.
    s.tracker.max_frames = kf_every
    if "--hard" in sys.argv:
        tr = s.tracker
        tr._need_new_keyframe = (
            lambda: tr.current.frame_id >= tr.last_kf_frame_id + kf_every)

    period = 1.0 / settings.fps
    t_next = time.perf_counter()
    queue_trace = []
    times = []
    for i, (left, right) in enumerate(pairs):
        while True:
            now = time.perf_counter()
            if now >= t_next:
                break
            s.poll()
            time.sleep(min(0.002, max(t_next - now, 0.0)))
        t_next = max(t_next + period, time.perf_counter())
        t0 = time.perf_counter()
        s.track_stereo(left, right, i * 0.1)
        times.append(time.perf_counter() - t0)
        if i + 1 < len(pairs):
            s.prefetch(*pairs[i + 1])
        queue_trace.append(len(s.local_mapper.queue))
    t_drain = time.perf_counter()
    while time.perf_counter() - t_drain < 30.0:
        if s.local_mapper.idle() and (
                s.loop_closer is None or s.loop_closer.idle()):
            break
        time.sleep(0.02)

    lm = s.local_mapper.timers
    n_kf = max(lm.counts.get("lm/process_new_kf", 1), 1)
    print(f"\nstate={s.tracker.state.name} kfs={int(s.map.kf_valid.sum())} "
          f"points={len(s.map.valid_pt_ids())} "
          f"loops={s.loop_closer.loops_closed if s.loop_closer else 0} "
          f"max_queue={max(queue_trace)} "
          f"resets={s.tracker.resets}")
    print(f"\nper-KF mapping stages (n={n_kf} keyframes processed):")
    total = 0.0
    for k in sorted(lm.totals, key=lambda k: -lm.totals[k]):
        per = lm.totals[k] / n_kf * 1e3
        if not k.startswith("lm/ba_"):
            total += per
        print(f"  {k:28s} {per:8.1f} ms/kf   (count {lm.counts[k]})")
    print(f"  {'TOTAL (non-nested)':28s} {total:8.1f} ms/kf "
          f"(budget {kf_every * 100:.0f} ms at 10 fps)")
    ts = sorted(times[3:])
    print(f"\ntrack dispatch p50={ts[len(ts) // 2] * 1e3:.1f}ms "
          f"p90={ts[int(len(ts) * .9)] * 1e3:.1f}ms "
          f"worst={ts[-1] * 1e3:.1f}ms")
    tt = s.tracker.timers
    print("tracker stages (ms/frame over counted calls):")
    for k in sorted(tt.totals, key=lambda k: -tt.totals[k])[:12]:
        n = max(tt.counts[k], 1)
        print(f"  {k:24s} {tt.totals[k] / n * 1e3:8.2f} ms x{tt.counts[k]}")
    qt = np.asarray(queue_trace)
    print(f"queue depth: mean={qt.mean():.2f} p90="
          f"{np.percentile(qt, 90):.0f} max={qt.max()}")
    s.shutdown()


if __name__ == "__main__":
    main()
