"""Census of XLA compiles landing inside a cold bench-circuit run.

Round-4 (VERDICT #1): BENCH_r03 had a 22.2 s frame inside the timed
window — a cold compile.  This probe runs ONE cold pass of the exact
bench circuit with jax compile logging captured and per-frame wall
times recorded, then prints:

  1. every compile event (name, duration, wall-clock offset),
  2. every frame slower than 300 ms, with the compiles that overlapped it,
  3. a summary: total compile seconds, #compiles, worst frame.

Use it to decide what System.precompile() must cover.

Usage: python scripts/compile_census.py [n_frames]
"""

import logging
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache

_platform = ensure_live_backend()  # wedged-tunnel guard: falls back to CPU
setup_compile_cache(_platform)     # AFTER the platform is pinned

import jax  # noqa: E402

jax.config.update("jax_log_compiles", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class CompileLog(logging.Handler):
    """Capture 'Finished XLA compilation of <name> in <secs> sec' events."""

    RX = re.compile(r"Finished XLA compilation of (.+?) in ([0-9.eE+-]+) sec")

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.events = []          # (t_end, name, dur_s)

    def emit(self, record):
        try:
            msg = record.getMessage()
        except Exception:
            return
        m = self.RX.search(msg)
        if m:
            self.events.append(
                (time.perf_counter(), m.group(1), float(m.group(2))))


def main():
    handler = CompileLog()
    for name in ("jax._src.interpreters.pxla", "jax._src.dispatch",
                 "jax._src.compiler", "jax"):
        lg = logging.getLogger(name)
        lg.addHandler(handler)
        lg.setLevel(logging.DEBUG)

    from orb_slam2_tpu.config import Sensor, Settings
    from orb_slam2_tpu.ops import frontend
    from orb_slam2_tpu.places.vocabulary import Vocabulary
    from orb_slam2_tpu.system import System
    from synthetic import CylinderScene, circle_trajectory

    H, W = 376, 1240
    FX = 718.856
    settings = Settings(
        fx=FX, fy=FX, cx=607.19, cy=185.22, bf=386.1448, width=W, height=H,
        n_features=2000, fps=10.0, th_depth=9.5,
    )
    settings.pipelined = True

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("BENCH_FRAMES", "240"))
    scene = CylinderScene(settings.K, H, W, radius=8.0, tex_h=2048)
    poses = circle_trajectory(n_frames, orbit_r=3.0,
                              total_angle=2 * np.pi * 1.5)
    Trl = np.eye(4, dtype=np.float32)
    Trl[0, 3] = -settings.bf / FX
    pairs = [(scene.render(T), scene.render(Trl @ T)) for T in poses]

    probe = circle_trajectory(10, orbit_r=3.0, total_angle=2 * np.pi)
    descs = []
    for T in probe:
        f = frontend.extract(jnp.asarray(scene.render(T)), n_features=800)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)

    # CENSUS_SENSOR=mono|rgbd|stereo: which bench pass to census
    # (r5: the mono pass showed a 12.8 s mid-run compile)
    sensor_name = os.environ.get("CENSUS_SENSOR", "stereo")
    sensor = {"stereo": Sensor.STEREO, "mono": Sensor.MONOCULAR,
              "rgbd": Sensor.RGBD}[sensor_name]
    if sensor == Sensor.RGBD:
        frames = [(l, scene.depth_at(T).astype(np.float32))
                  for (l, _), T in zip(pairs, poses)]
    elif sensor == Sensor.MONOCULAR:
        frames = [(l,) for l, _ in pairs]
    else:
        frames = pairs

    s = System(settings, sensor, vocabulary=voc, scheduler="async")
    track = {Sensor.STEREO: s.track_stereo,
             Sensor.MONOCULAR: s.track_monocular,
             Sensor.RGBD: s.track_rgbd}[sensor]
    if os.environ.get("CENSUS_PRECOMPILE", "0") == "1":
        t0 = time.perf_counter()
        s.precompile()
        print(f"precompile took {time.perf_counter() - t0:.1f}s "
              f"({len(handler.events)} compiles)", flush=True)

    t_start = time.perf_counter()
    frame_spans = []          # (t0, t1)
    period = 1.0 / settings.fps
    t_next = time.perf_counter()
    for i, frame in enumerate(frames):
        now = time.perf_counter()
        if now < t_next:
            time.sleep(t_next - now)
        t_next = max(t_next + period, time.perf_counter())
        t0 = time.perf_counter()
        track(*frame, i * 0.1)
        t1 = time.perf_counter()
        frame_spans.append((t0, t1))
        if i + 1 < len(frames):
            s.prefetch(*frames[i + 1])
    # drain
    t_drain = time.perf_counter()
    while time.perf_counter() - t_drain < 30.0:
        if s.local_mapper.idle() and (
                s.loop_closer is None or s.loop_closer.idle()):
            break
        time.sleep(0.02)
    state = s.tracker.state.name
    n_kf = int(s.map.kf_valid.sum())
    loops = int(s.loop_closer.loops_closed if s.loop_closer else 0)
    s.shutdown()

    events = sorted(handler.events)
    print("\n=== compile census ===")
    total_compile = sum(d for _, _, d in events)
    print(f"{len(events)} compiles, {total_compile:.1f}s total "
          f"compile time")
    for t_end, name, dur in events:
        off = t_end - t_start
        print(f"  t+{off:8.2f}s  {dur:7.2f}s  {name}")

    print("\n=== slow frames (>300ms) ===")
    durs = [(t1 - t0) for t0, t1 in frame_spans]
    for i, (t0, t1) in enumerate(frame_spans):
        d = t1 - t0
        if d <= 0.3:
            continue
        over = [(n, cd) for te, n, cd in events if t0 <= te <= t1 + 0.5]
        names = ", ".join(f"{n}({cd:.1f}s)" for n, cd in over) or "-"
        print(f"  frame {i:4d}: {d * 1e3:8.1f} ms   compiles: {names}")

    sd = sorted(durs[3:])
    print(f"\nstate={state} kfs={n_kf} loops={loops} "
          f"p50={sd[len(sd) // 2] * 1e3:.1f}ms "
          f"p90={sd[int(len(sd) * 0.9)] * 1e3:.1f}ms "
          f"worst={sd[-1] * 1e3:.1f}ms")


if __name__ == "__main__":
    main()
