import sys, os, pickle
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
from orb_slam2_tpu.solvers import pose_graph

H, W = 240, 320
settings = Settings(fx=260., fy=260., cx=W/2, cy=H/2, bf=260.*0.1,
                    width=W, height=H, n_features=600, fps=5.0, th_depth=60.0)
scene = CylinderScene(settings.K, H, W)
poses = circle_trajectory(140, orbit_r=2.0, total_angle=2*np.pi*1.3)
descs = []
for T in poses[::12]:
    f = frontend.extract(jnp.asarray(scene.render(T)), n_features=600)
    descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)
sys_ = System(settings, Sensor.STEREO, vocabulary=voc)
T0 = poses[0].copy()

orig_opt = pose_graph.optimize
def dump_opt(prob, iters=20, **kw):
    st = sys_.map
    gt = {}
    for k in st.valid_kf_ids():
        k = int(k)
        fi = int(round(st.kf_timestamp[k] / 0.2))
        gt[k] = poses[fi] @ np.linalg.inv(T0)
    with open("/tmp/eg_prob.pkl", "wb") as f:
        pickle.dump({"prob": jax.tree.map(np.asarray, prob),
                     "kfs": [int(k) for k in st.valid_kf_ids()],
                     "gt": gt}, f)
    print("dumped essential-graph problem")
    return orig_opt(prob, iters=iters, **kw)
pose_graph.optimize = dump_opt

b = 0.1
for i, T in enumerate(poses):
    Trl = np.eye(4, dtype=np.float32); Trl[0, 3] = -b
    sys_.track_stereo(scene.render(T), scene.render(Trl @ T), i * 0.2)
print("loops:", sys_.loop_closer.loops_closed)
