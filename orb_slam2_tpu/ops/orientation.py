"""Intensity-centroid keypoint orientation (IC_Angle), batched.

TPU-native replacement for IC_Angle (ref: src/ORBextractor.cc:77-104):
moments m10, m01 over a discrete circular patch of radius 15 around each
keypoint, angle = atan2(m01, m10).  The discrete circle uses the same
u_max table construction as the reference ctor (cvRound(sqrt(r^2 - v^2))
with the symmetry fix, ref: src/ORBextractor.cc:452-469), computed here
numerically rather than copied.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

HALF_PATCH = 15


def _umax_table() -> np.ndarray:
    """Max |x| per |y| row of the discrete circle, radius HALF_PATCH."""
    umax = np.zeros(HALF_PATCH + 1, np.int32)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(np.rint(np.sqrt(hp2 - v * v)))
    # ensure symmetry (the reference's second loop)
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


def circular_mask() -> np.ndarray:
    """(31, 31) float mask of the discrete circle used by IC_Angle."""
    umax = _umax_table()
    size = 2 * HALF_PATCH + 1
    mask = np.zeros((size, size), np.float32)
    for v in range(-HALF_PATCH, HALF_PATCH + 1):
        u_lim = umax[abs(v)]
        mask[v + HALF_PATCH, HALF_PATCH - u_lim : HALF_PATCH + u_lim + 1] = 1.0
    return mask


_MASK = circular_mask()
_DX = (np.arange(31) - HALF_PATCH).astype(np.float32)


def ic_angles(
    img: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Angles in degrees [0, 360) for keypoints at integer coords.

    img: (H, W) float32 level image.  xy: (N, 2) int32 (x, y) level coords.
    Keypoints are assumed >= HALF_PATCH from the border (the detector's
    EDGE_THRESHOLD margin guarantees this); invalid ones get angle 0.
    """
    h, w = img.shape
    x = jnp.clip(xy[:, 0], HALF_PATCH, w - 1 - HALF_PATCH)
    y = jnp.clip(xy[:, 1], HALF_PATCH, h - 1 - HALF_PATCH)
    dy = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)
    rows = y[:, None] + dy[None, :]                  # (N, 31)
    cols = x[:, None] + dy[None, :]                  # (N, 31)
    patches = img[rows[:, :, None], cols[:, None, :]]  # (N, 31, 31)

    mask = jnp.asarray(_MASK)
    dxs = jnp.asarray(_DX)
    m10 = jnp.einsum("nij,j,ij->n", patches, dxs, mask)
    m01 = jnp.einsum("nij,i,ij->n", patches, dxs, mask)
    ang = jnp.degrees(jnp.arctan2(m01, m10))
    ang = jnp.where(ang < 0, ang + 360.0, ang)
    return jnp.where(valid, ang, 0.0)
