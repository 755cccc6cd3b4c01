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


@functools.partial(jax.jit, static_argnames=("fix_scale", "iters"))
def refine_sim3(
    pts1: jnp.ndarray,       # (N, 3) camera-1-frame 3D points
    pts2: jnp.ndarray,       # (N, 3) matched camera-2-frame points
    uv1: jnp.ndarray,        # (N, 2)
    uv2: jnp.ndarray,        # (N, 2)
    inv_sigma2_1: jnp.ndarray,  # (N,)
    inv_sigma2_2: jnp.ndarray,
    mask: jnp.ndarray,       # (N,)
    R12, t12, s12,
    fx, fy, cx, cy,
    fix_scale: bool = False,
    iters: int = 10,
    chi2_th: float = 10.0,
):
    """Gauss-Newton refinement of S12 with both-direction projection
    residuals + Huber (IRLS), the TPU equivalent of
    Optimizer::OptimizeSim3 (ref: src/Optimizer.cc:1046-1241:
    EdgeSim3ProjectXYZ both ways, RobustKernelHuber delta=sqrt(th2) on
    every edge :1148-1171, 5 iters -> drop chi2 > th2 outliers ->
    reoptimize).  The Huber weights are essential: the match set coming
    in includes the SearchBySim3 extension, which is outlier-rich —
    unrobust GN lets those matches destroy the RANSAC estimate before
    the chi2 gate can run.

    Returns (R12, t12, s12, inlier_mask, n_inliers)."""
    from orb_slam2_tpu.geometry import sim3

    delta = jnp.sqrt(jnp.asarray(chi2_th, pts1.dtype))

    def residuals(S12, active):
        S21 = sim3.inverse(S12)
        p1 = sim3.apply(S12, pts2)          # cam2 pts -> cam1 frame
        p2 = sim3.apply(S21, pts1)
        e1 = (_project(p1, fx, fy, cx, cy) - uv1) * jnp.sqrt(
            inv_sigma2_1)[:, None]
        e2 = (_project(p2, fx, fy, cx, cy) - uv2) * jnp.sqrt(
            inv_sigma2_2)[:, None]
        r = jnp.concatenate([e1, e2], -1)   # (N, 4)
        return jnp.where(active[:, None], r, 0.0)

    def huber_w(r):
        """sqrt of the IRLS Huber weight per direction-edge, expanded
        back to the (N, 4) residual layout."""
        n1 = jnp.sqrt(jnp.sum(r[:, :2] ** 2, -1) + 1e-12)
        n2 = jnp.sqrt(jnp.sum(r[:, 2:] ** 2, -1) + 1e-12)
        w1 = jnp.sqrt(jnp.minimum(1.0, delta / n1))
        w2 = jnp.sqrt(jnp.minimum(1.0, delta / n2))
        return jnp.stack([w1, w1, w2, w2], -1)

    def gn_iter(carry, _):
        R, t, s, active = carry
        S0 = (R, t, s)
        # IRLS: Huber weights frozen at the current iterate
        W = huber_w(residuals(S0, active))

        def err_from_xi(xi):
            if fix_scale:
                xi = xi.at[6].set(0.0)
            S = sim3.compose(sim3.exp(xi), S0)
            return (residuals(S, active) * W).reshape(-1)

        xi0 = jnp.zeros(7, pts1.dtype)
        J = jax.jacfwd(err_from_xi)(xi0)        # (4N, 7)
        r = err_from_xi(xi0)
        H = J.T @ J + 1e-6 * jnp.eye(7, dtype=J.dtype)
        g = J.T @ r
        xi = -jnp.linalg.solve(H, g)
        if fix_scale:
            xi = xi.at[6].set(0.0)
        S_new = sim3.compose(sim3.exp(xi), S0)
        better = jnp.sum(err_from_xi(xi) ** 2) < jnp.sum(r ** 2) + 1e-12
        R_n, t_n, s_n = S_new
        R = jnp.where(better, R_n, R)
        t = jnp.where(better, t_n, t)
        s = jnp.where(better, s_n, s)
        return (R, t, s, active), None

    active = mask
    (R, t, s, _), _ = jax.lax.scan(
        gn_iter, (R12, t12, s12, active), None, length=iters // 2
    )
    # outlier rejection at chi2 > 10 per direction (ref :1189-1206)
    r = residuals((R, t, s), mask)
    chi1 = jnp.sum(r[:, :2] ** 2, -1)
    chi2_ = jnp.sum(r[:, 2:] ** 2, -1)
    active = mask & (chi1 <= chi2_th) & (chi2_ <= chi2_th)
    (R, t, s, _), _ = jax.lax.scan(
        gn_iter, (R, t, s, active), None, length=iters - iters // 2
    )
    r = residuals((R, t, s), active)
    chi1 = jnp.sum(r[:, :2] ** 2, -1)
    chi2_ = jnp.sum(r[:, 2:] ** 2, -1)
    inl = active & (chi1 <= chi2_th) & (chi2_ <= chi2_th)
    return R, t, s, inl, jnp.sum(inl)
