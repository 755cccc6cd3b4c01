"""Diagnostic: per-KF loop-detection internals on the loop_ate scene.

Prints, for every keyframe the loop closer processes: the candidate the
database+consistency vote produced (or None), the live consistency
groups, and — via DEBUG logging — which Sim3 gate rejected a candidate
(BoW count / RANSAC / refine inliers / 40-match acceptance).  Use when
loop_ate.py reports loops=0."""
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
import logging
logging.basicConfig(level=logging.DEBUG,
                    format="%(name)s %(levelname)s %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

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

orig_detect = lcm.LoopCloser._detect_loop
def dbg_detect(self, kf):
    st = self.store
    out = orig_detect(self, kf)
    groups = [(sorted(g)[:4], c) for g, c in self._consistent_groups]
    ts = st.kf_timestamp[kf]
    print(f"KF {kf:3d} t={ts:6.1f} n_kf={st.n_kf:3d} -> cand={out} "
          f"groups={groups[:5]}", flush=True)
    return out
lcm.LoopCloser._detect_loop = dbg_detect

orig_sim3 = lcm.LoopCloser._compute_sim3_and_correct
def dbg_sim3(self, kf, cand):
    ok = orig_sim3(self, kf, cand)
    print(f"  SIM3 kf={kf} cand={cand} -> {ok}", flush=True)
    return ok
lcm.LoopCloser._compute_sim3_and_correct = dbg_sim3

Trl = np.eye(4, dtype=np.float32); Trl[0, 3] = -0.1
for i, T in enumerate(poses):
    sys_.track_stereo(scene.render(T), scene.render(Trl @ T), i * 0.2)
print("loops_closed =", sys_.loop_closer.loops_closed)
print("KFs =", int(sys_.map.kf_valid.sum()))
