"""Sim3 RANSAC for loop closure (Horn closed form, batched hypotheses).

TPU-native replacement for Sim3Solver (ref: src/Sim3Solver.cc): instead of
iterating 3-point minimal sets sequentially with early exit, all hypotheses
are solved at once with the batched Horn alignment and inliers are counted
by both-direction reprojection (< 9.210 * sigma^2 per octave, ref :87-88,
:340-365).  Scale is fixed to 1 for stereo/RGB-D (bFixScale, ref ctor).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.solvers.horn import horn_align


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    R12: jnp.ndarray     # (3,3)
    t12: jnp.ndarray     # (3,)
    s12: jnp.ndarray     # ()
    inliers: jnp.ndarray # (N,)
    n_inliers: jnp.ndarray


def _project(p, fx, fy, cx, cy):
    z = jnp.maximum(p[..., 2], 1e-6)
    return jnp.stack(
        [fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], -1
    )


@functools.partial(jax.jit, static_argnames=("fix_scale",))
def solve_sim3_ransac(
    pts1: jnp.ndarray,       # (N, 3) camera-1-frame 3D points
    pts2: jnp.ndarray,       # (N, 3) matched camera-2-frame 3D points
    uv1: jnp.ndarray,        # (N, 2) observed pixels in camera 1
    uv2: jnp.ndarray,        # (N, 2) observed pixels in camera 2
    max_err1: jnp.ndarray,   # (N,) chi2 thresholds in image 1
    max_err2: jnp.ndarray,   # (N,) chi2 thresholds in image 2
    mask: jnp.ndarray,       # (N,)
    sample_idx: jnp.ndarray, # (S, 3)
    fx, fy, cx, cy,
    min_inliers: int = 20,
    fix_scale: bool = False,
):
    """Estimate S12 mapping camera-2 coords into camera-1 coords."""
    p1s = pts1[sample_idx]                        # (S, 3, 3)
    p2s = pts2[sample_idx]
    w = mask[sample_idx].astype(pts1.dtype)

    # T12 transforms pts2 -> pts1 frame
    R, t, s = horn_align(p2s, p1s, w, with_scale=not fix_scale)

    # check both directions (ref CheckInliers :340-365)
    p1_from_2 = s[:, None, None] * jnp.einsum(
        "sij,nj->sni", R, pts2
    ) + t[:, None]
    uv1_hat = _project(p1_from_2, fx, fy, cx, cy)
    err1 = jnp.sum((uv1_hat - uv1[None]) ** 2, -1)

    s_inv = 1.0 / jnp.maximum(s, 1e-12)
    Rt = jnp.swapaxes(R, -1, -2)
    p2_from_1 = s_inv[:, None, None] * jnp.einsum(
        "sij,snj->sni", Rt, pts1[None] - t[:, None]
    )
    uv2_hat = _project(p2_from_1, fx, fy, cx, cy)
    err2 = jnp.sum((uv2_hat - uv2[None]) ** 2, -1)

    inl = (err1 < max_err1[None]) & (err2 < max_err2[None]) & mask[None]
    counts = jnp.sum(inl, -1)
    best = jnp.argmax(counts)

    # refit on all inliers of the winner for accuracy
    w_best = inl[best].astype(pts1.dtype)
    R2, t2, s2 = horn_align(pts2, pts1, w_best, with_scale=not fix_scale)
    p1h = s2 * (pts2 @ R2.T) + t2
    uv1h = _project(p1h, fx, fy, cx, cy)
    e1 = jnp.sum((uv1h - uv1) ** 2, -1)
    p2h = (1.0 / jnp.maximum(s2, 1e-12)) * ((pts1 - t2) @ R2)
    uv2h = _project(p2h, fx, fy, cx, cy)
    e2 = jnp.sum((uv2h - uv2) ** 2, -1)
    inl2 = (e1 < max_err1) & (e2 < max_err2) & mask
    n2 = jnp.sum(inl2)

    better = n2 >= counts[best]
    R_out = jnp.where(better, R2, R[best])
    t_out = jnp.where(better, t2, t[best])
    s_out = jnp.where(better, s2, s[best])
    inliers = jnp.where(better, inl2, inl[best])
    n_out = jnp.maximum(n2, counts[best])

    return Sim3Result(
        n_out >= min_inliers, R_out, t_out, s_out, inliers, n_out
    )
