"""Diagnose the 100-frame circuit bench: per-frame time, fast-path use,
tracking state, loop detection."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache

if os.environ.get("CP_CPU", "0") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    platform = "cpu"
else:
    platform = ensure_live_backend()
setup_compile_cache(platform)
print("platform:", platform)

if os.environ.get("CP_LOOPDBG", "0") == "1":
    import logging

    from orb_slam2_tpu import logs

    logs.set_verbose(logging.DEBUG)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from orb_slam2_tpu.config import Sensor, Settings  # noqa: E402
from orb_slam2_tpu.ops import frontend  # noqa: E402
from orb_slam2_tpu.places.vocabulary import Vocabulary  # noqa: E402
from orb_slam2_tpu.system import System  # noqa: E402
from synthetic import CylinderScene, circle_trajectory  # noqa: E402

H, W = 376, 1240
FX = FY = 718.856
BF = 386.1448
settings = Settings(
    fx=FX, fy=FY, cx=607.19, cy=185.22, bf=BF, width=W, height=H,
    n_features=2000, fps=10.0,
    th_depth=float(os.environ.get("CP_THDEPTH", "35.0")),
)
settings.pipelined = os.environ.get("CP_PIPE", "1") == "1"

n_frames = int(os.environ.get("CP_FRAMES", "60"))
orbits = float(os.environ.get("CP_ORBITS", "1.25"))
orbit_r = float(os.environ.get("CP_R", "3.0"))
cyl_r = float(os.environ.get("CP_CYL", "8.0"))
tex_h = int(os.environ.get("CP_TEXH", "2048"))
scene = CylinderScene(settings.K, H, W, radius=cyl_r, tex_h=tex_h)
poses = circle_trajectory(n_frames, orbit_r=orbit_r,
                          total_angle=2 * np.pi * orbits)
Trl = np.eye(4, dtype=np.float32)
Trl[0, 3] = -BF / FX
_cache = (f"/tmp/cp_frames_{n_frames}_{orbits}_{orbit_r}_{cyl_r}"
          f"_{H}x{W}_t{tex_h}.npz")
if os.path.exists(_cache):
    print("loading cached frames...")
    _z = np.load(_cache)
    pairs = list(zip(_z["left"], _z["right"]))
else:
    print("rendering...")
    pairs = [(scene.render(T), scene.render(Trl @ T)) for T in poses]
    np.savez(_cache, left=np.stack([p[0] for p in pairs]),
             right=np.stack([p[1] for p in pairs]))

voc = None
if os.environ.get("CP_VOC", "1") == "1":
    probe = circle_trajectory(10, orbit_r=orbit_r, total_angle=2 * np.pi)
    descs = []
    for T in probe:
        f = frontend.extract(jnp.asarray(scene.render(T)), n_features=800)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)
    print("vocab trained")


def run(report=False):
    s = System(settings, Sensor.STEREO, vocabulary=voc,
               scheduler=os.environ.get("CP_SCHED", "async"))
    tr = s.tracker
    times = []
    pace = os.environ.get("CP_PACE", "0") == "1"
    period = 1.0 / settings.fps
    t_next = time.perf_counter()
    for i, (l, r) in enumerate(pairs):
        if pace:
            now = time.perf_counter()
            if now < t_next:
                time.sleep(t_next - now)
            t_next = max(t_next + period, time.perf_counter())
        fast = tr._can_fast()
        t0 = time.perf_counter()
        s.track_stereo(l, r, i * 0.1)
        dt = time.perf_counter() - t0
        times.append(dt)
        if report:
            fb = getattr(tr, "_fallback_used", False)
            print(f"f{i:03d} {dt*1e3:7.1f}ms fast={int(fast)} "
                  f"fb={int(fb)} state={tr.state.name} "
                  f"inl={tr.n_inliers} kfs={int(s.map.kf_valid.sum())} "
                  f"q={len(s.local_mapper.queue)}")
    if report:
        st = sorted(times[3:])
        print(f"median {st[len(st)//2]*1e3:.1f}ms p90 "
              f"{st[int(len(st)*0.9)]*1e3:.1f}ms")
        print("loops:", s.loop_closer.loops_closed if s.loop_closer else 0)
        print(tr.timers.report())
        print("--- mapper ---")
        print(s.local_mapper.timers.report())
    s.shutdown()


run()
print("--- timed ---")
run(report=True)
