"""Probe: monocular loop closing (free-scale Sim3, 7-DoF essential graph).

All committed loop tests run stereo (fix_scale=True).  The reference's
monocular path estimates loop Sim3 WITH scale (Sim3Solver bFixScale=false,
LoopClosing.cc:272) and corrects scale drift through the 7-DoF essential
graph (Optimizer.cc:781).  This script checks the mono System closes a
loop on the cylinder orbit and improves scale-aligned ATE.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import jax
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache
_platform = ensure_live_backend()  # wedged-tunnel guard: falls back to CPU
setup_compile_cache(_platform)     # AFTER the platform is pinned
import logging
logging.basicConfig(level=logging.INFO, format="%(name)s %(message)s")
import jax.numpy as jnp, numpy as np
from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.system import System
from orb_slam2_tpu.ops import frontend
from orb_slam2_tpu.places.vocabulary import Vocabulary
from synthetic import CylinderScene, circle_trajectory

H, W = 240, 320
settings = Settings(fx=260., fy=260., cx=W/2, cy=H/2, bf=260.*0.1,
                    width=W, height=H, n_features=600, fps=5.0,
                    th_depth=60.0)
scene = CylinderScene(settings.K, H, W)
n_frames = 140
poses = circle_trajectory(n_frames, orbit_r=2.0, total_angle=2*np.pi*1.3)

descs = []
for T in poses[::12]:
    f = frontend.extract(jnp.asarray(scene.render(T)), n_features=600)
    descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)


def run(disable_loop):
    sys_ = System(settings, Sensor.MONOCULAR, vocabulary=voc)
    if disable_loop:
        sys_.loop_closer.insert_keyframe = lambda kf: None
    for i, T in enumerate(poses):
        sys_.track_monocular(scene.render(T), i * 0.2)
    st = sys_.map
    T0 = poses[0].copy()
    C, G = [], []
    for k in st.valid_kf_ids():
        k = int(k)
        fi = int(round(st.kf_timestamp[k] / 0.2))
        Tg = poses[fi] @ np.linalg.inv(T0)
        Te = st.kf_pose[k]
        C.append(-Te[:3, :3].T @ Te[:3, 3])
        G.append(-Tg[:3, :3].T @ Tg[:3, 3])
    C, G = np.array(C), np.array(G)
    # mono scale is arbitrary: similarity-align (scale-only + no rot,
    # median ratio) before ATE
    nc = np.linalg.norm(C, axis=1); ng = np.linalg.norm(G, axis=1)
    s = np.median(ng[nc > 1e-6] / nc[nc > 1e-6])
    errs = np.linalg.norm(s * C - G, axis=1)
    lc = sys_.loop_closer
    print(f"disable_loop={disable_loop}: loops={lc.loops_closed} "
          f"KFs={len(C)} state={sys_.tracker.state.name} "
          f"scale={s:.3f} ATE rmse={np.sqrt((errs**2).mean()):.3f} "
          f"max={errs.max():.3f}")
    return errs


run(disable_loop=True)
run(disable_loop=False)
