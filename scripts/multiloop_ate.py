"""Multi-loop soak: 2.6 orbits -> two loop closures -> aligned KF ATE.

Regression scene for the outlier-gated global bundle adjustment: without
the chi2 gate before GBA, wrong cross-seam fusions drag the map and the
second closure lands on a corrupted map (ATE 1.36); with it the two
closures compound (ATE ~0.17 vs ~1.2 with loop closing disabled).

Run: python scripts/multiloop_ate.py          (~4 min on the TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import jax

from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache
_platform = ensure_live_backend()  # wedged-tunnel guard: falls back to CPU
setup_compile_cache(_platform)     # AFTER the platform is pinned
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.io.trajectory import ate_rmse
from orb_slam2_tpu.ops import frontend
from orb_slam2_tpu.places.vocabulary import Vocabulary
from orb_slam2_tpu.system import System
from synthetic import CylinderScene, circle_trajectory

H, W = 240, 320
settings = Settings(fx=260., fy=260., cx=W / 2, cy=H / 2, bf=26.,
                    width=W, height=H, n_features=600, fps=5.0,
                    th_depth=60.0)
scene = CylinderScene(settings.K, H, W)
n_frames = 300
poses = circle_trajectory(n_frames, orbit_r=2.0, total_angle=2 * np.pi * 2.6)

descs = []
for T in poses[::25]:
    f = frontend.extract(jnp.asarray(scene.render(T)), n_features=600)
    descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
voc = Vocabulary.train(np.concatenate(descs), k=10, L=3, levels_up=1)


def run(loop: bool) -> None:
    sys_ = System(settings, Sensor.STEREO, vocabulary=voc)
    if not loop:
        sys_.loop_closer.insert_keyframe = lambda kf: None
    T0 = poses[0].copy()
    t_start = time.time()
    for i, T in enumerate(poses):
        Trl = np.eye(4, dtype=np.float32)
        Trl[0, 3] = -0.1
        sys_.track_stereo(scene.render(T), scene.render(Trl @ T), i * 0.2)
    st = sys_.map
    est, gt = [], []
    for k in st.valid_kf_ids():
        k = int(k)
        fi = int(round(st.kf_timestamp[k] / 0.2))
        Tg = poses[fi] @ np.linalg.inv(T0)
        Te = st.kf_pose[k]
        est.append(-Te[:3, :3].T @ Te[:3, 3])
        gt.append(-Tg[:3, :3].T @ Tg[:3, 3])
    ate = ate_rmse(np.array(est), np.array(gt))
    print(f"loop={loop}: loops={sys_.loop_closer.loops_closed} "
          f"KFs={len(est)} aligned_ATE={ate:.3f} "
          f"wall={time.time() - t_start:.0f}s")


if __name__ == "__main__":
    run(False)   # expect ~1.2 (drift control)
    run(True)    # expect 2 loops, ~0.17
