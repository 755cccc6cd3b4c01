import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
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
import orb_slam2_tpu.slam.loop_closing as lcm

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
sys_ = System(settings, Sensor.STEREO, vocabulary=voc)
T0 = poses[0].copy()

def kf_ate(store, label):
    errs = []
    for k in store.valid_kf_ids():
        k = int(k)
        fi = int(round(store.kf_timestamp[k] / 0.2))
        Tg = poses[fi] @ np.linalg.inv(T0)
        Te = store.kf_pose[k]
        C = -Te[:3, :3].T @ Te[:3, 3]; G = -Tg[:3, :3].T @ Tg[:3, 3]
        errs.append(np.linalg.norm(C - G))
    errs = np.array(errs)
    print(f"  [{label}] KF ATE rmse={np.sqrt((errs**2).mean()):.3f} max={errs.max():.3f}")

orig_corr = lcm.LoopCloser._correct_loop
def dbg_correct(self, kf, cand, R12, t12, s12, Scw_R, Scw_t, Scw_s, loop_pts):
    st = self.store
    kf_ate(st, "pre-correct")
    # loop constraint quality: compare Scw (sim3 of current kf in world of cand side) vs GT
    fi_kf = int(round(st.kf_timestamp[kf] / 0.2)); fi_c = int(round(st.kf_timestamp[cand] / 0.2))
    Tg_kf = poses[fi_kf] @ np.linalg.inv(T0)
    # corrected pose for kf from Scw:
    Tn = np.eye(4, dtype=np.float32); Tn[:3,:3] = Scw_R; Tn[:3,3] = Scw_t / Scw_s
    Ck = -Tn[:3,:3].T@Tn[:3,3]; Gk = -Tg_kf[:3,:3].T@Tg_kf[:3,3]
    print(f"  loop kf={kf} cand={cand} s12={s12:.4f}: corrected-kf center err {np.linalg.norm(Ck-Gk):.3f} "
          f"(old err {np.linalg.norm(-st.kf_pose[kf][:3,:3].T@st.kf_pose[kf][:3,3]-Gk):.3f})")
    r = orig_corr(self, kf, cand, R12, t12, s12, Scw_R, Scw_t, Scw_s, loop_pts)
    kf_ate(st, "post-all")
    return r

orig_eg = lcm.LoopCloser._optimize_essential_graph
def dbg_eg(self, *a, **kw):
    kf_ate(self.store, "pre-essential")
    r = orig_eg(self, *a, **kw)
    kf_ate(self.store, "post-essential")
    return r
lcm.LoopCloser._correct_loop = dbg_correct
lcm.LoopCloser._optimize_essential_graph = dbg_eg

import orb_slam2_tpu.slam.local_mapping as lmm
orig_gba = lmm.LocalMapper.global_bundle_adjustment
def dbg_gba(self, **kw):
    r = orig_gba(self, **kw)
    kf_ate(self.store, "post-GBA")
    return r
lmm.LocalMapper.global_bundle_adjustment = dbg_gba

b = 0.1
for i, T in enumerate(poses):
    Trl = np.eye(4, dtype=np.float32); Trl[0, 3] = -b
    sys_.track_stereo(scene.render(T), scene.render(Trl @ T), i * 0.2)
kf_ate(sys_.map, "final")
print("loops:", sys_.loop_closer.loops_closed)
