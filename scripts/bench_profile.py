"""Per-stage breakdown of the EXACT bench.py configuration (async +
pipelined) on whatever backend is live, plus per-frame wall times.

Round-3 perf work: find what still serializes the pipelined tracker
(re-anchor cadence, in-lock prep, keyframe stalls) before touching code.
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
print("platform:", platform)

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
settings.pipelined = True
settings.pipeline_depth = int(os.environ.get("BP_DEPTH", "3"))
settings.chain_max_age = int(os.environ.get("BP_AGE", "4"))
n_frames = int(os.environ.get("BP_FRAMES", "20"))
poses = straight_trajectory(n_frames, step=0.8, yaw_step=0.002)
scene, pairs = stereo_sequence(settings.K, H, W, BF / FX, poses)

sched = os.environ.get("BP_SCHED", "async")


def run(scheduler, report=False):
    s = System(settings, Sensor.STEREO, scheduler=scheduler)
    times = []
    for i, (l, r) in enumerate(pairs):
        t0 = time.perf_counter()
        s.track_stereo(l, r, i * 0.1)
        times.append(time.perf_counter() - t0)
        if i + 1 < len(pairs):
            s.prefetch(*pairs[i + 1])
    if report:
        print("per-frame ms:", " ".join(f"{t*1e3:.0f}" for t in times))
        steady = sorted(times[3:])
        print(f"median steady: {steady[len(steady)//2]*1e3:.1f} ms "
              f"({1.0/steady[len(steady)//2]:.1f} fps)  "
              f"p90: {steady[int(len(steady)*0.9)]*1e3:.1f} ms  "
              f"worst: {steady[-1]*1e3:.1f} ms")
        print("\n--- tracker timers ---")
        print(s.tracker.timers.report())
        print("\n--- local mapper timers ---")
        print(s.local_mapper.timers.report())
        print("\nkfs:", int(s.map.kf_valid.sum()),
              "state:", s.tracker.state.name)
    if scheduler == "async":
        s.shutdown()


run("sync")            # warmup/compile
run(sched, report=True)
