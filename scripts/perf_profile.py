"""Per-stage timing breakdown of the KITTI-shaped bench run.

Prints tracker + local-mapper stage timers after a warm run, so the
perf work targets the real bottleneck rather than a guess.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache
_platform = ensure_live_backend()  # wedged-tunnel guard: falls back to CPU
setup_compile_cache(_platform)     # AFTER the platform is pinned

import numpy as np  # noqa: E402

from orb_slam2_tpu.config import Sensor, Settings  # noqa: E402
from orb_slam2_tpu.system import System  # noqa: E402
from synthetic import stereo_sequence, straight_trajectory  # noqa: E402

H, W = 376, 1240
FX = FY = 718.856
BF = 386.1448
settings = Settings(
    fx=FX, fy=FY, cx=607.19, cy=185.22, bf=BF, width=W, height=H,
    n_features=2000, fps=10.0, th_depth=35.0,
)
n_frames = 20
poses = straight_trajectory(n_frames, step=0.8, yaw_step=0.002)
scene, pairs = stereo_sequence(settings.K, H, W, BF / FX, poses)

warm = System(settings, Sensor.STEREO)
for i, (l, r) in enumerate(pairs):
    warm.track_stereo(l, r, i * 0.1)

sys_ = System(settings, Sensor.STEREO)
times = []
for i, (l, r) in enumerate(pairs):
    t0 = time.perf_counter()
    sys_.track_stereo(l, r, i * 0.1)
    times.append(time.perf_counter() - t0)
    if i + 1 < len(pairs):
        sys_.prefetch(*pairs[i + 1])

print("per-frame ms:", " ".join(f"{t*1e3:.0f}" for t in times))
steady = sorted(times[3:])
print(f"median steady: {steady[len(steady)//2]*1e3:.1f} ms "
      f"({1.0/steady[len(steady)//2]:.1f} fps)")
print("\n--- tracker timers ---")
print(sys_.tracker.timers.report())
print("\n--- local mapper timers ---")
print(sys_.local_mapper.timers.report())
