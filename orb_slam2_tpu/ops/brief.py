"""Rotated BRIEF (rBRIEF) 256-bit descriptors, batched.

TPU-native replacement for computeOrbDescriptor
(ref: src/ORBextractor.cc:108-147): each bit compares two blurred-image
samples at pattern offsets rotated by the keypoint angle and rounded to
integer pixels; 256 bits are packed into (N, 8) uint32.

The default tap table is the published learned ``bit_pattern_31_``
constant (ops/orb_pattern.py; ref: src/ORBextractor.cc:150-408) so
descriptors are comparable with OpenCV ORB / ORB-SLAM2 and the public
ORBvoc.txt vocabulary.  `generate_pattern` still provides the
deterministic G-II Gaussian alternative (Calonder et al. sampling:
p ~ N(0, (S/5)^2), q ~ N(p, (S/10)^2)); install it with `set_pattern`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.ops.orb_pattern import BIT_PATTERN_31

PATTERN_BITS = 256
_CLIP = 13  # keep taps within the 31x31 patch under rotation margin


def generate_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 4) int32 rows [x0, y0, x1, y1], G-II localized Gaussian."""
    rng = np.random.default_rng(seed)
    s = 31.0
    pairs = []
    seen = set()
    while len(pairs) < PATTERN_BITS:
        p = rng.normal(0.0, s / 5.0, 2)
        q = rng.normal(p, s / 10.0, 2)
        p = np.clip(np.rint(p), -_CLIP, _CLIP).astype(np.int32)
        q = np.clip(np.rint(q), -_CLIP, _CLIP).astype(np.int32)
        if (p == q).all():
            continue
        key = (p[0], p[1], q[0], q[1])
        if key in seen:
            continue
        seen.add(key)
        pairs.append([p[0], p[1], q[0], q[1]])
    return np.array(pairs, np.int32)


_PATTERN = BIT_PATTERN_31


def set_pattern(pattern: np.ndarray) -> None:
    """Install a custom (256, 4) [x0, y0, x1, y1] tap pattern."""
    global _PATTERN
    assert pattern.shape == (PATTERN_BITS, 4)
    _PATTERN = pattern.astype(np.int32)


def get_pattern() -> np.ndarray:
    return _PATTERN.copy()


def describe(
    blurred: jnp.ndarray,
    xy: jnp.ndarray,
    angles_deg: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Compute (N, 8) uint32 packed descriptors.

    blurred: (H, W) float32 blurred level image.
    xy: (N, 2) int32 keypoint centers (level coords).
    angles_deg: (N,) orientation in degrees.
    """
    h, w = blurred.shape
    n = xy.shape[0]
    pat = jnp.asarray(_PATTERN, jnp.float32)          # (256, 4)
    px = jnp.concatenate([pat[:, 0], pat[:, 2]])       # (512,) x offsets
    py = jnp.concatenate([pat[:, 1], pat[:, 3]])       # (512,) y offsets

    a = jnp.cos(jnp.radians(angles_deg))[:, None]      # (N, 1)
    b = jnp.sin(jnp.radians(angles_deg))[:, None]
    # reference GET_VALUE rotation: x' = round(x cos - y sin),
    # y' = round(x sin + y cos)   (ref: src/ORBextractor.cc:115-117)
    rx = jnp.rint(px[None] * a - py[None] * b).astype(jnp.int32)  # (N, 512)
    ry = jnp.rint(px[None] * b + py[None] * a).astype(jnp.int32)

    cx = jnp.clip(xy[:, 1:2] + ry, 0, h - 1)           # rows
    cyx = jnp.clip(xy[:, 0:1] + rx, 0, w - 1)          # cols
    flat = blurred.reshape(-1)
    taps = flat[cx * w + cyx]                          # (N, 512)

    t0 = taps[:, :PATTERN_BITS]
    t1 = taps[:, PATTERN_BITS:]
    bits = (t0 < t1).astype(jnp.uint32)                # (N, 256)

    bits = bits.reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    return jnp.where(valid[:, None], packed, jnp.zeros_like(packed))
