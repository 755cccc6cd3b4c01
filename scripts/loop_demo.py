import sys, time
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), "..")); sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), "..", "tests"))
import jax
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache
_platform = ensure_live_backend()  # wedged-tunnel guard: falls back to CPU
setup_compile_cache(_platform)     # AFTER the platform is pinned
import jax.numpy as jnp, numpy as np
from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.system import System
from orb_slam2_tpu.ops import frontend
from orb_slam2_tpu.places.vocabulary import Vocabulary
from synthetic import CylinderScene, circle_trajectory

H, W = 240, 320
settings = Settings(fx=260., fy=260., cx=W/2, cy=H/2, bf=260.*0.1,
                    width=W, height=H, n_features=600, fps=5.0, th_depth=60.0)
scene = CylinderScene(settings.K, H, W)
n_frames = 140
poses = circle_trajectory(n_frames, orbit_r=2.0, total_angle=2*np.pi*1.3)

descs = []
for T in poses[::12]:
    f = frontend.extract(jnp.asarray(scene.render(T)), n_features=600)
    descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)
print("vocab:", voc.n_words)

sys_ = System(settings, Sensor.STEREO, vocabulary=voc)
T0 = poses[0].copy()
import orb_slam2_tpu.slam.loop_closing as lcm
orig = lcm.LoopCloser._detect_loop
def dbg(self, kf):
    r = orig(self, kf)
    if self.store.n_kf >= 10:
        print(f"   detect kf={kf} -> {r} groups={[(min(g), c) for g, c in self._consistent_groups][:5]}")
    return r
lcm.LoopCloser._detect_loop = dbg
b = 0.1
errs = []
for i, T in enumerate(poses):
    Trl = np.eye(4, dtype=np.float32); Trl[0, 3] = -b
    l = scene.render(T); r = scene.render(Trl @ T)
    Te = sys_.track_stereo(l, r, i * 0.2)
    e = None
    if Te is not None:
        Tg = T @ np.linalg.inv(T0)   # gt in SLAM world (= first camera)
        C = -Te[:3,:3].T@Te[:3,3]; G = -Tg[:3,:3].T@Tg[:3,3]
        e = float(np.linalg.norm(C-G)); errs.append(e)
    if i % 10 == 0 or sys_.loop_closer.loops_closed:
        print(i, sys_.tracker.state.name, "kf", int(sys_.map.kf_valid.sum()),
              "loops", sys_.loop_closer.loops_closed,
              "err", None if e is None else round(e,3))
print("loops closed:", sys_.loop_closer.loops_closed)
print("err before loop area (frame 95):", round(errs[95],3) if len(errs)>95 else "-")
print("final err:", round(errs[-1],3))
