"""Quantify loop-closing benefit: KF ATE vs ground truth under three modes.

Modes: no-loop (loop closer disabled), essential-only (GBA skipped), full.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import jax
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

def run(mode):
    sys_ = System(settings, Sensor.STEREO, vocabulary=voc)
    if mode == "noloop":
        sys_.loop_closer.insert_keyframe = lambda kf: None
    elif mode == "essential":
        lm = sys_.local_mapper
        lm.global_bundle_adjustment = lambda **kw: None
    T0 = poses[0].copy()
    b = 0.1
    for i, T in enumerate(poses):
        Trl = np.eye(4, dtype=np.float32); Trl[0, 3] = -b
        sys_.track_stereo(scene.render(T), scene.render(Trl @ T), i * 0.2)
    st = sys_.map
    errs = []
    for k in st.valid_kf_ids():
        k = int(k)
        ts = st.kf_timestamp[k]
        fi = int(round(ts / 0.2))
        Tg = poses[fi] @ np.linalg.inv(T0)
        Te = st.kf_pose[k]
        C = -Te[:3, :3].T @ Te[:3, 3]
        G = -Tg[:3, :3].T @ Tg[:3, 3]
        errs.append(np.linalg.norm(C - G))
    errs = np.array(errs)
    print(f"{mode:10s}: loops={sys_.loop_closer.loops_closed} "
          f"KFs={len(errs)} ATE rmse={np.sqrt((errs**2).mean()):.3f} "
          f"max={errs.max():.3f} last5_mean={errs[-5:].mean():.3f}")
    return errs

for mode in ("noloop", "essential", "full"):
    run(mode)
