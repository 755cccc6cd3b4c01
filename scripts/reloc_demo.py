import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
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
poses = circle_trajectory(40, orbit_r=2.0, total_angle=np.pi*0.8)

descs = []
for T in poses[::8]:
    f = frontend.extract(jnp.asarray(scene.render(T)), n_features=600)
    descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)
sys_ = System(settings, Sensor.STEREO, vocabulary=voc)

b = 0.1
Trl = np.eye(4, dtype=np.float32); Trl[0,3] = -b
T0 = poses[0].copy()
for i, T in enumerate(poses):
    sys_.track_stereo(scene.render(T), scene.render(Trl @ T), i*0.2)
print("mapped:", sys_.tracker.state.name, "kf", int(sys_.map.kf_valid.sum()))

# kill tracking with blank frames
blank = np.zeros((H, W), np.float32)
for j in range(3):
    sys_.track_stereo(blank, blank, 100 + j*0.2)
print("after blanks:", sys_.tracker.state.name)

# return to a previously-mapped pose (frame 10)
T = poses[10]
for j in range(3):
    Te = sys_.track_stereo(scene.render(T), scene.render(Trl @ T), 200 + j*0.2)
print("after revisit:", sys_.tracker.state.name)
if Te is not None:
    Tg = T @ np.linalg.inv(T0)
    C = -Te[:3,:3].T@Te[:3,3]; G = -Tg[:3,:3].T@Tg[:3,3]
    print("reloc pose err:", round(float(np.linalg.norm(C-G)),4))
