"""Pose-only Levenberg-Marquardt optimization, fully on device.

TPU-native replacement for Optimizer::PoseOptimization
(ref: src/Optimizer.cc:239-451): a single SE3 vertex with unary mono
(EdgeSE3ProjectXYZOnlyPose) and stereo edges, Huber kernel with
delta = sqrt(5.991) mono / sqrt(7.815) stereo, optimized in 4 rounds of
10 iterations with chi^2 inlier/outlier reclassification between rounds
and the robust kernel dropped from round 3 (ref :367-442).

Here the N observations are a fixed-shape batch; each LM iteration builds
the 6x6 normal system with one fused einsum and solves densely.  Analytic
Jacobians follow the same projection chain rule as the reference's
types_six_dof_expmap.cpp but for a left-multiplicative update
T <- exp(xi) * T with xi = [rho, omega].
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.geometry import se3

CHI2_MONO = 5.991    # ref: src/Optimizer.cc deltaMono^2
CHI2_STEREO = 7.815  # ref: deltaStereo^2


class PoseObs(NamedTuple):
    """Fixed-shape observation set for pose optimization."""

    pts_w: jnp.ndarray      # (N, 3) world points
    uv: jnp.ndarray         # (N, 3) observed [u, v, u_right]; u_right<0 = mono
    inv_sigma2: jnp.ndarray # (N,) 1/sigma^2 per observation (octave-based)
    mask: jnp.ndarray       # (N,) bool valid


def _residual_jacobian(Tcw, obs: PoseObs, fx, fy, cx, cy, bf):
    """Residuals (N,3), Jacobians (N,3,6), stereo row masked for mono."""
    pc = se3.transform(Tcw, obs.pts_w)                   # (N, 3)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z = jnp.maximum(z, 1e-6)
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z

    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    ur = u - bf * inv_z

    is_stereo = obs.uv[:, 2] >= 0
    r = jnp.stack(
        [obs.uv[:, 0] - u, obs.uv[:, 1] - v,
         jnp.where(is_stereo, obs.uv[:, 2] - ur, 0.0)], -1)

    # d(pc)/dxi for left-multiplicative exp update: [I | -hat(pc)]
    N = pc.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (N, 3, 3))
    dpc = jnp.concatenate([eye, -se3.hat(pc)], -1)       # (N, 3, 6)

    # projection Jacobians wrt pc
    zero = jnp.zeros_like(x)
    Ju = jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], -1)
    Jv = jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], -1)
    Jur = jnp.stack([fx * inv_z, zero, -fx * x * inv_z2 + bf * inv_z2], -1)
    Jproj = jnp.stack([Ju, Jv, Jur], 1)                  # (N, 3, 3)

    J = -jnp.einsum("nij,njk->nik", Jproj, dpc)          # (N, 3, 6)
    row_mask = jnp.stack(
        [jnp.ones(N, bool), jnp.ones(N, bool), is_stereo], -1
    )
    behind = pc[:, 2] <= 0.05
    ok = obs.mask & ~behind
    row_mask = row_mask & ok[:, None]
    return r, J, row_mask, is_stereo


def _chi2(r, row_mask, inv_sigma2):
    return jnp.sum(r * r * row_mask, -1) * inv_sigma2


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def optimize_pose(
    Tcw0: jnp.ndarray,
    obs: PoseObs,
    fx, fy, cx, cy, bf,
    rounds: int = 4,
    iters: int = 10,
):
    """Returns (Tcw_opt (4,4), inlier_mask (N,), n_inliers ())."""
    delta_mono = jnp.sqrt(CHI2_MONO)
    delta_stereo = jnp.sqrt(CHI2_STEREO)

    def total_error(T, active, use_kernel):
        r, _, row_mask, is_st = _residual_jacobian(T, obs, fx, fy, cx, cy, bf)
        chi2 = _chi2(r, row_mask, obs.inv_sigma2)
        delta = jnp.where(is_st, delta_stereo, delta_mono)
        rho = jnp.where(
            use_kernel & (chi2 > delta * delta),
            2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - delta * delta,
            chi2,
        )
        return jnp.sum(jnp.where(active & row_mask[:, 0], rho, 0.0))

    def lm_iter(carry, _):
        T, lam, active, use_kernel = carry
        r, J, row_mask, is_st = _residual_jacobian(T, obs, fx, fy, cx, cy, bf)
        chi2 = _chi2(r, row_mask, obs.inv_sigma2)
        delta = jnp.where(is_st, delta_stereo, delta_mono)
        # Huber IRLS weight rho'(chi2)
        w_huber = jnp.where(
            use_kernel & (chi2 > delta * delta),
            delta / jnp.sqrt(jnp.maximum(chi2, 1e-12)),
            1.0,
        )
        w = obs.inv_sigma2 * w_huber * active
        w_row = w[:, None] * row_mask                     # (N, 3)
        H = jnp.einsum("nik,ni,nij->kj", J, w_row, J)     # (6, 6)
        g = jnp.einsum("nik,ni,ni->k", J, w_row, r)       # J^T W r

        # minimize ||r + J d||^2 -> d = -(J^T W J)^-1 J^T W r
        step = jnp.linalg.solve(H + lam * jnp.eye(6, dtype=H.dtype), -g)
        T_new = se3.exp(step) @ T
        err_old = total_error(T, active, use_kernel)
        err_new = total_error(T_new, active, use_kernel)
        accept = err_new < err_old
        T = jnp.where(accept, T_new, T)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (T, lam, active, use_kernel), err_new

    T = Tcw0
    active = obs.mask
    for rnd in range(rounds):
        use_kernel = jnp.asarray(rnd < 2)  # ref drops kernel after 2 rounds
        (T, _, _, _), _ = jax.lax.scan(
            lm_iter, (T, jnp.float32(1e-3), active, use_kernel), None,
            length=iters,
        )
        # reclassify: a point is an outlier for the next round if chi2 > th
        r, _, row_mask, is_st = _residual_jacobian(T, obs, fx, fy, cx, cy, bf)
        chi2 = _chi2(r, row_mask, obs.inv_sigma2)
        th = jnp.where(is_st, CHI2_STEREO, CHI2_MONO)
        active = obs.mask & (chi2 <= th) & row_mask[:, 0]

    inliers = active
    return T, inliers, jnp.sum(inliers)
