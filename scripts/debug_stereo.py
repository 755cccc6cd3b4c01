"""Debug the stereo matcher on the synthetic scene."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache
_platform = ensure_live_backend()  # wedged-tunnel guard: falls back to CPU
setup_compile_cache(_platform)     # AFTER the platform is pinned

import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.ops import frontend, stereo
from synthetic import stereo_sequence, straight_trajectory

H, W = 240, 320
FX = FY = 260.0
CX, CY = W / 2, H / 2
BASELINE = 0.1

settings = Settings(
    fx=FX, fy=FY, cx=CX, cy=CY, bf=FX * BASELINE,
    width=W, height=H, n_features=800, fps=10.0, th_depth=40.0,
)
poses = straight_trajectory(3, step=0.03, yaw_step=0.002)
scene, pairs = stereo_sequence(settings.K, H, W, BASELINE, poses)
l, r = pairs[0]

fl = frontend.extract(jnp.asarray(l), n_features=800)
fr = frontend.extract(jnp.asarray(r), n_features=800)
print("valid L:", int(np.sum(np.asarray(fl.valid))),
      "valid R:", int(np.sum(np.asarray(fr.valid))))

sf = jnp.asarray(settings.scale_factors().astype(np.float32))
m = stereo.match(
    fl.xy, fl.octave, fl.desc, fl.valid,
    fr.xy, fr.octave, fr.desc, fr.valid,
    jnp.asarray(l, jnp.float32), jnp.asarray(r, jnp.float32),
    sf, settings.bf, 0.0, settings.bf / 2.0,
)
d = np.asarray(m.depth)
print("matched pre-filter:", int((d > 0).sum()))
m2 = stereo.median_sad_filter(m)
d2 = np.asarray(m2.depth)
print("matched post-filter:", int((d2 > 0).sum()))
print("depth range:", d2[d2 > 0][:10] if (d2 > 0).any() else "none")

# expected disparity for plane points
xy = np.asarray(fl.xy)
v = np.asarray(fl.valid)
zmap = scene.depth_at(poses[0])
zz = zmap[np.clip(xy[v][:, 1].astype(int), 0, H - 1),
          np.clip(xy[v][:, 0].astype(int), 0, W - 1)]
print("expected disparities:", (settings.bf / zz)[:10])
