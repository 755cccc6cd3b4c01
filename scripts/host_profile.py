"""Profile host-side per-frame overhead of the tracking fast path.

Runs a KITTI-shaped stereo sequence on the CPU backend and dumps the
StageTimers breakdown plus per-frame wall times.  On CPU the device
compute is slow, so the interesting columns are the pure-host stages
(fast/prep, fast/apply, frame_build host side) and the dispatch counts —
those are backend-independent and bound the achievable TPU fps.

Usage: python scripts/host_profile.py [n_frames] [--pipelined]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")   # sitecustomize override
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from orb_slam2_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache("cpu")   # AFTER the platform is pinned

import numpy as np


def main():
    from orb_slam2_tpu.config import Sensor, Settings
    from orb_slam2_tpu.system import System
    from synthetic import stereo_sequence, straight_trajectory

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    pipelined = "--pipelined" in sys.argv

    H, W = 376, 1240
    FX = FY = 718.856
    BF = 386.1448
    settings = Settings(
        fx=FX, fy=FY, cx=607.19, cy=185.22, bf=BF, width=W, height=H,
        n_features=2000, fps=10.0, th_depth=35.0,
    )
    settings.pipelined = pipelined
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

    print(f"\nmode={'pipelined' if pipelined else 'sequential'} "
          f"frames={n_frames}")
    print("per-frame ms:", " ".join(f"{t*1e3:.0f}" for t in times))
    st = sorted(times[3:])
    print(f"median {st[len(st)//2]*1e3:.1f} ms")
    print("\ntracker stages (median ms over calls):")
    print(sys_.tracker.timers.report())
    print("\nlocal mapper stages:")
    print(sys_.local_mapper.timers.report())


if __name__ == "__main__":
    main()
