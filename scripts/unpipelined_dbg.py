"""Replicate the bench's UNPIPELINED pass standalone with per-frame
timing, to attribute multi-second worst frames (run with
JAX_LOG_COMPILES=1 to catch mid-run XLA compiles).

Usage: JAX_LOG_COMPILES=1 python scripts/unpipelined_dbg.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache
platform = ensure_live_backend()
setup_compile_cache(platform)

import numpy as np
import jax.numpy as jnp
from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.ops import frontend
from orb_slam2_tpu.places.vocabulary import Vocabulary
from orb_slam2_tpu.system import System
from synthetic import CylinderScene, circle_trajectory

H, W = 376, 1240
FX = 718.856
settings = Settings(fx=FX, fy=FX, cx=607.19, cy=185.22, bf=386.1448,
                    width=W, height=H, n_features=2000, fps=10.0,
                    th_depth=9.5)
settings.pipelined = False
scene = CylinderScene(settings.K, H, W, radius=8.0, tex_h=2048)
n_frames = int(os.environ.get("BENCH_FRAMES", "240"))
poses = circle_trajectory(n_frames, orbit_r=3.0,
                          total_angle=2 * np.pi * 1.5)
Trl = np.eye(4, dtype=np.float32)
Trl[0, 3] = -settings.bf / FX
pairs = [(scene.render(T), scene.render(Trl @ T)) for T in poses]

probe = circle_trajectory(30, orbit_r=3.0, total_angle=2 * np.pi)
descs = []
for T in probe:
    f = frontend.extract(jnp.asarray(scene.render(T)), n_features=2000)
    descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
voc = Vocabulary.train(np.concatenate(descs), k=10, L=4, levels_up=1)

s = System(settings, Sensor.STEREO, vocabulary=voc, scheduler="async")
s.precompile()
print("precompiled", flush=True)

period = 1.0 / settings.fps
t_next = time.perf_counter()
times = []
for i, (l, r) in enumerate(pairs):
    while True:
        now = time.perf_counter()
        if now >= t_next:
            break
        s.poll()
        time.sleep(min(0.002, max(t_next - now, 0.0)))
    t_next = max(t_next + period, time.perf_counter())
    t0 = time.perf_counter()
    s.track_stereo(l, r, i * 0.1)
    dt = time.perf_counter() - t0
    times.append(dt)
    if dt > 0.5:
        print(f"[slow] frame {i}: {dt * 1e3:.0f} ms "
              f"(wall {time.strftime('%H:%M:%S')})", flush=True)
    if i + 1 < len(pairs):
        s.prefetch(*pairs[i + 1])

t_drain = time.perf_counter()
while time.perf_counter() - t_drain < 20.0:
    if s.local_mapper.idle() and (s.loop_closer is None
                                  or s.loop_closer.idle()):
        break
    time.sleep(0.02)
ts = sorted(times[3:])
print(f"state={s.tracker.state.name} kfs={int(s.map.kf_valid.sum())} "
      f"loops={s.loop_closer.loops_closed} resets={s.tracker.resets}",
      flush=True)
print(f"p50={ts[len(ts)//2]*1e3:.1f}ms p90={ts[int(len(ts)*.9)]*1e3:.1f}ms "
      f"worst={ts[-1]*1e3:.1f}ms at frame "
      f"{int(np.argmax(times[3:])) + 3}", flush=True)
s.shutdown()
