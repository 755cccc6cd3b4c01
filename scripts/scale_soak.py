"""Reference-scale soak: loop-closure machinery on a 1000-keyframe map.

KITTI-00 runs ~1300 keyframes through CorrectLoop / OptimizeEssentialGraph
/ GBA (src/Optimizer.cc:781-1044).  This script builds a drifted ring map
at that scale and records wall times for every stage of the loop-closure
path, so host-loop blowups show up as numbers instead of stalls:

    python scripts/scale_soak.py [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache

platform = ensure_live_backend()
setup_compile_cache(platform)

import numpy as np  # noqa: E402

from orb_slam2_tpu.config import Sensor, Settings  # noqa: E402
from orb_slam2_tpu.slam.loop_closing import LoopCloser  # noqa: E402

from synthetic import build_ring_map  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
N_FEAT = 256

settings = Settings(
    fx=260.0, fy=260.0, cx=160.0, cy=120.0, bf=26.0,
    width=320, height=240, n_features=N_FEAT, fps=5.0, th_depth=60.0,
)

print(f"platform={platform}  K={K}")
t0 = time.perf_counter()
store, true_poses = build_ring_map(
    K=K, pts_per_kf=30, span=5, n_feat=N_FEAT, drift_per_kf=0.004)
print(f"build_ring_map: {time.perf_counter()-t0:.1f}s  "
      f"kfs={int(store.kf_valid.sum())} pts={int(store.pt_valid.sum())}")

lc = LoopCloser(settings, Sensor.STEREO, store, kf_database=None,
                local_mapper=None)
kf = int(store.n_kf - 1)
cand = 0
T_true = true_poses[kf]
loop_pts = store.kf_obs[cand][store.kf_obs[cand] >= 0][:128]

# instrument the two sub-stages by monkey-timing
orig_fuse = lc._search_and_fuse
orig_eg = lc._optimize_essential_graph
stage = {}


def fuse(*a, **k):
    t = time.perf_counter()
    r = orig_fuse(*a, **k)
    stage["search_and_fuse"] = time.perf_counter() - t
    return r


def eg(*a, **k):
    t = time.perf_counter()
    r = orig_eg(*a, **k)
    stage["essential_graph"] = time.perf_counter() - t
    return r


lc._search_and_fuse = fuse
lc._optimize_essential_graph = eg

t0 = time.perf_counter()
lc._correct_loop(kf, cand, None, None, 1.0,
                 T_true[:3, :3].astype(np.float64),
                 T_true[:3, 3].astype(np.float64), 1.0,
                 np.asarray(loop_pts))
total = time.perf_counter() - t0

kfs = store.valid_kf_ids()
assert np.isfinite(store.kf_pose[kfs]).all()


def center(T):
    return -T[:3, :3].T @ T[:3, 3]


errs = [np.linalg.norm(center(store.kf_pose[int(k)])
                       - center(true_poses[int(k)])) for k in kfs]
print(f"correct_loop TOTAL: {total:.1f}s")
print(f"  search_and_fuse:  {stage.get('search_and_fuse', 0):.1f}s")
print(f"  essential_graph:  {stage.get('essential_graph', 0):.1f}s")
print(f"  window/remap etc: "
      f"{total - sum(stage.values()):.1f}s")
print(f"post-correction center error: max {max(errs):.3f} "
      f"median {sorted(errs)[len(errs)//2]:.3f}")
