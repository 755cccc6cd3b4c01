"""Batched DLT triangulation.

TPU-native equivalent of the SVD triangulation in
LocalMapping::CreateNewMapPoints (ref: src/LocalMapping.cc:322-331) and
Initializer::Triangulate (ref: src/Initializer.cc:734-754), vectorized over
all candidate pairs at once.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray
) -> jnp.ndarray:
    """DLT triangulation.

    P1, P2: (..., 3, 4) projection matrices.
    xy1, xy2: (..., N, 2) pixel (or normalized) coords in each view.
    Returns (..., N, 3) world points (NaN-free; w==0 gives large values).
    """
    x1, y1 = xy1[..., 0], xy1[..., 1]
    x2, y2 = xy2[..., 0], xy2[..., 1]

    def row(coef, P, r):
        # coef * P[2] - P[r], broadcast over points
        return coef[..., None] * P[..., 2:3, :] - P[..., r : r + 1, :]

    P1b = P1[..., None, :, :]
    P2b = P2[..., None, :, :]
    A = jnp.concatenate(
        [
            x1[..., None] * P1b[..., 2, :] - P1b[..., 0, :],
            y1[..., None] * P1b[..., 2, :] - P1b[..., 1, :],
            x2[..., None] * P2b[..., 2, :] - P2b[..., 0, :],
            y2[..., None] * P2b[..., 2, :] - P2b[..., 1, :],
        ],
        -1,
    ).reshape(xy1.shape[:-1] + (4, 4))
    del row
    # null vector of A = right singular vector of smallest singular value
    _, _, vt = jnp.linalg.svd(A)
    X = vt[..., 3, :]
    w = X[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / w_safe[..., None]
