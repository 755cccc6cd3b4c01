"""Diagnostic: why does the bench's PIPELINED+kidnap pass close no loop
while the unpipelined pass on the same circuit does?

Replicates bench.py's pipelined pass (KITTI-shaped 240-frame circuit,
5-frame kidnap at 60, async scheduler, 10 fps pacing) with DEBUG logging
on the loop closer + a per-KF detection trace.  Run on the TPU with a
warm compile cache (bench.py first) so the pass itself is fast.

Env:
  BENCH_KIDNAP=0     disable the kidnap (isolate kidnap vs pipelining)
  BENCH_PIPELINED=0  unpipelined pass (the control)
  BENCH_SENSOR=mono|rgbd|stereo   which sensor pipeline to drive
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache
_platform = ensure_live_backend()
setup_compile_cache(_platform)
print("platform:", _platform, flush=True)
import jax.numpy as jnp, numpy as np
import logging
logging.basicConfig(level=logging.DEBUG,
                    format="%(name)s %(levelname)s %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.ops import frontend
from orb_slam2_tpu.places.vocabulary import Vocabulary
from orb_slam2_tpu.system import System
from synthetic import CylinderScene, circle_trajectory

H, W = 376, 1240
FX = FY = 718.856
settings = Settings(fx=FX, fy=FY, cx=607.19, cy=185.22, bf=386.1448,
                    width=W, height=H, n_features=2000, fps=10.0,
                    th_depth=9.5)
settings.pipelined = os.environ.get("BENCH_PIPELINED", "1") == "1"
kidnap = os.environ.get("BENCH_KIDNAP", "1") == "1"

n_frames = int(os.environ.get("BENCH_FRAMES", "240"))
kidnap_at, kidnap_len = min(60, n_frames // 3), 5
scene = CylinderScene(settings.K, H, W, radius=8.0, tex_h=2048)
poses = circle_trajectory(n_frames, orbit_r=3.0,
                          total_angle=2 * np.pi * 1.5)
baseline_m = 386.1448 / FX
Trl = np.eye(4, dtype=np.float32)
Trl[0, 3] = -baseline_m
pairs = [(scene.render(T), scene.render(Trl @ T)) for T in poses]
black = np.zeros((H, W), np.uint8)

probe = circle_trajectory(10, orbit_r=3.0, total_angle=2 * np.pi)
descs = []
for T in probe:
    f = frontend.extract(jnp.asarray(scene.render(T)), n_features=800)
    descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)

sensor = {"stereo": Sensor.STEREO, "mono": Sensor.MONOCULAR,
          "rgbd": Sensor.RGBD}[os.environ.get("BENCH_SENSOR", "stereo")]
if sensor == Sensor.MONOCULAR:
    # mirror bench.py's mono pass: same loop at half the angular rate
    poses = circle_trajectory(2 * n_frames, orbit_r=3.0,
                              total_angle=2 * np.pi * 1.5)
    pairs = [(scene.render(T), None) for T in poses]
s = System(settings, sensor, vocabulary=voc, scheduler="async")
s.precompile()
print("precompiled", flush=True)

# count point-culling churn (mono starvation-spiral hypothesis)
_cull_n = [0]
_orig_bad = s.map.set_point_bad
def _bad_counted(pid):
    _cull_n[0] += 1
    return _orig_bad(pid)
s.map.set_point_bad = _bad_counted

# cull-reason breakdown per mapper pass
_orig_cull = s.local_mapper._cull_map_points
def _cull_logged(kf):
    store = s.local_mapper.store
    pids = np.asarray(s.local_mapper.recent_points, np.int64)
    if len(pids):
        pids = pids[store.pt_valid[pids]]
    if len(pids):
        age = kf - store.pt_first_kf[pids]
        ratio = (store.pt_found[pids]
                 / np.maximum(store.pt_visible[pids], 1.0))
        bad_r = ratio < 0.25
        bad_o = (age >= 2) & (store.pt_n_obs[pids] <= 2)
        print(f"[cull] kf={kf} recent={len(pids)} "
              f"bad_ratio={int(bad_r.sum())} "
              f"bad_obs_only={int((bad_o & ~bad_r).sum())} "
              f"med_vis={float(np.median(store.pt_visible[pids])):.1f} "
              f"med_found={float(np.median(store.pt_found[pids])):.1f}",
              flush=True)
    return _orig_cull(kf)
s.local_mapper._cull_map_points = _cull_logged

# wrap the loop closer's detection so every processed KF logs its verdict
lc = s.loop_closer
orig_detect = lc._detect_loop
def detect_logged(kf):
    cand = orig_detect(kf)
    print(f"[loopdbg] kf={kf} nkf={int(s.map.kf_valid.sum())} "
          f"cand={cand} groups={len(lc._consistent_groups)}", flush=True)
    return cand
lc._detect_loop = detect_logged

period = 1.0 / settings.fps
t_next = time.perf_counter()
for i, (left, right) in enumerate(pairs):
    while True:
        now = time.perf_counter()
        if now >= t_next:
            break
        s.poll()
        time.sleep(min(0.002, max(t_next - now, 0.0)))
    t_next = max(t_next + period, time.perf_counter())
    if kidnap and kidnap_at <= i < kidnap_at + kidnap_len:
        left = right = black
    if sensor == Sensor.MONOCULAR:
        s.track_monocular(left, i * 0.1)
    elif sensor == Sensor.RGBD:
        s.track_rgbd(left, right, i * 0.1)
    else:
        s.track_stereo(left, right, i * 0.1)
    if i + 1 < len(pairs):
        s.prefetch(*pairs[i + 1])

t_drain = time.perf_counter()
while time.perf_counter() - t_drain < 20.0:
    s.poll()
    if (not s.tracker._pending and s.local_mapper.idle()
            and (s.loop_closer is None or s.loop_closer.idle())):
        break
    time.sleep(0.002)

print("state:", s.tracker.state.name,
      "kfs:", int(s.map.kf_valid.sum()),
      "loops:", lc.loops_closed,
      "relocs:", s.tracker.relocalizations,
      "resets:", s.tracker.resets,
      "culled:", _cull_n[0],
      "pts:", int(s.map.pt_valid.sum()), flush=True)

tt = s.tracker.timers
for k in sorted(tt.totals, key=lambda k: -tt.totals[k]):
    print(f"[timer] {k:28s} n={tt.counts[k]:4d} "
          f"total={tt.totals[k]*1e3:8.1f}ms "
          f"mean={tt.totals[k]/max(tt.counts[k],1)*1e3:6.1f}ms",
      flush=True)
lm_t = s.local_mapper.timers
for k in sorted(lm_t.totals, key=lambda k: -lm_t.totals[k])[:8]:
    print(f"[lmtimer] {k:26s} n={lm_t.counts[k]:4d} "
          f"total={lm_t.totals[k]*1e3:8.1f}ms", flush=True)

# per-KF camera-center error vs ground truth: a mis-anchored post-reloc
# segment shows up as a step change in err at the reloc frame
st = s.map
T0 = poses[0].copy()
for k in st.valid_kf_ids():
    k = int(k)
    ts_ = st.kf_timestamp[k]
    fi = int(round(ts_ / 0.1))
    Tg = poses[fi] @ np.linalg.inv(T0)
    Te = st.kf_pose[k]
    C = -Te[:3, :3].T @ Te[:3, 3]
    G = -Tg[:3, :3].T @ Tg[:3, 3]
    print(f"[kfgt] kf={k} frame={fi} err={np.linalg.norm(C - G):.2f}m "
          f"C=({C[0]:.1f},{C[2]:.1f}) G=({G[0]:.1f},{G[2]:.1f})",
          flush=True)
s.shutdown()
