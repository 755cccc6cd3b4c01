"""Interactive smoke test: stereo SLAM on the synthetic plane scene."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache
_platform = ensure_live_backend()  # wedged-tunnel guard: falls back to CPU
setup_compile_cache(_platform)     # AFTER the platform is pinned

import numpy as np

from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.system import System
from synthetic import stereo_sequence, straight_trajectory

H, W = 240, 320
FX = FY = 260.0
CX, CY = W / 2, H / 2
BASELINE = 0.1

settings = Settings(
    fx=FX, fy=FY, cx=CX, cy=CY, bf=FX * BASELINE,
    width=W, height=H, n_features=800, fps=10.0,
    th_depth=40.0,
)
K = settings.K
poses = straight_trajectory(10, step=0.03, yaw_step=0.002)
scene, pairs = stereo_sequence(K, H, W, BASELINE, poses)

sys_ = System(settings, Sensor.STEREO)
est = []
for i, (l, r) in enumerate(pairs):
    T = sys_.track_stereo(l, r, i * 0.1)
    state = sys_.tracking_state()
    n_kf = int(sys_.map.kf_valid.sum())
    n_pt = int(sys_.map.pt_valid.sum())
    print(f"frame {i}: nvalid={int(np.sum(sys_.tracker.current.feats.valid))} state={state.name} kf={n_kf} pts={n_pt} "
          f"inliers={sys_.tracker.n_inliers}")
    est.append(T.copy() if T is not None else None)

# trajectory error
errs = []
for T, Tgt in zip(est, poses):
    if T is None:
        continue
    C_est = -T[:3, :3].T @ T[:3, 3]
    C_gt = -Tgt[:3, :3].T @ Tgt[:3, 3]
    errs.append(np.linalg.norm(C_est - C_gt))
print("position errors:", np.round(errs, 4))
print("max err:", max(errs) if errs else None)
print(sys_.tracker.timers.report())
