"""orb_slam2_tpu — a TPU-native visual SLAM framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of ORB-SLAM2
(abhineet123 fork): monocular / stereo / RGB-D tracking, loop closing,
relocalization, SLAM/localization modes, and 2D occupancy-grid mapping.

Architecture: functional core, imperative shell.  All per-frame compute is
pure JAX over fixed-shape padded tensors (compile once, reuse); the map is a
host-side struct-of-arrays store with validity masks.  See SURVEY.md for the
reference analysis this build follows.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry and normal-equation solves need genuine f32 accumulation; the
# TPU default of bf16-input matmuls destroys Schur-complement conditioning.
# SLAM's FLOPs are dominated by elementwise vision ops, so this is cheap.
_jax.config.update("jax_default_matmul_precision", "highest")

from orb_slam2_tpu.config import Settings, Sensor  # noqa: F401

__all__ = ["Settings", "Sensor", "__version__"]


def __getattr__(name):
    # Lazy import of the heavyweight System facade so that importing the
    # package for a single kernel does not pull in the whole SLAM stack.
    if name == "System":
        from orb_slam2_tpu.slam.system import System

        return System
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
