"""EPnP inside batched RANSAC for relocalization.

TPU-native replacement for PnPsolver (ref: src/PnPsolver.cc): the
reference runs EPnP (4 control points, barycentric coordinates, 12x12
M^T M eigendecomposition, beta cases + Gauss-Newton) on one RANSAC
minimal set at a time; here ALL RANSAC hypotheses are solved
simultaneously via vmapped linear algebra, inliers are counted densely,
and the best hypothesis is refined on its full inlier set.

Deviation from the reference: beta cases N=2/3 are replaced by the N=1
seed + Gauss-Newton on the four betas (5 iterations), which in practice
recovers the same solutions; minimal sets use 6 points rather than 4 for
numerical headroom (all hypotheses run in parallel on TPU anyway).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.solvers.horn import horn_align

MIN_SET = 6


class PnPResult(NamedTuple):
    success: jnp.ndarray
    Tcw: jnp.ndarray         # (4, 4)
    inliers: jnp.ndarray     # (N,) bool
    n_inliers: jnp.ndarray


def _control_points(pw: jnp.ndarray, w: jnp.ndarray):
    """Centroid + PCA control points (ref choose_control_points :375-409).

    pw: (..., N, 3), w: (..., N) weights.  Returns (..., 4, 3).
    """
    wn = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)
    c0 = jnp.sum(pw * wn[..., None], -2)
    centered = (pw - c0[..., None, :]) * jnp.sqrt(wn)[..., None]
    cov = jnp.einsum("...ni,...nj->...ij", centered, centered)
    evals, evecs = jnp.linalg.eigh(cov)
    sig = jnp.sqrt(jnp.maximum(evals, 1e-12))
    axes = evecs * sig[..., None, :]            # columns scaled
    c1 = c0 + axes[..., :, 2]
    c2 = c0 + axes[..., :, 1]
    c3 = c0 + axes[..., :, 0]
    return jnp.stack([c0, c1, c2, c3], -2)


def _barycentric(pw: jnp.ndarray, cw: jnp.ndarray):
    """alphas such that pw = sum alpha_j cw_j, sum alpha = 1
    (ref compute_barycentric_coordinates :411-434)."""
    ones_p = jnp.ones(pw.shape[:-1] + (1,), pw.dtype)
    ones_c = jnp.ones(cw.shape[:-1] + (1,), cw.dtype)
    Cm = jnp.concatenate([cw, ones_c], -1)       # (..., 4, 4)
    P = jnp.concatenate([pw, ones_p], -1)        # (..., N, 4)
    # solve Cm^T alpha = p  for each point
    CmT = jnp.swapaxes(Cm, -1, -2)
    alphas = jnp.linalg.solve(
        jnp.broadcast_to(CmT[..., None, :, :], P.shape[:-1] + (4, 4)),
        P[..., None],
    )[..., 0]
    return alphas                                 # (..., N, 4)


def _build_MtM(alphas, uv, fx, fy, cx, cy, w):
    """M^T M (12x12) from the 2N x 12 EPnP system (ref fill_M :436-460)."""
    u, v = uv[..., 0], uv[..., 1]
    a = alphas                                    # (..., N, 4)
    zero = jnp.zeros_like(a)
    # row u: [a*fx, 0, a*(cx-u)] per control point
    r1 = jnp.concatenate(
        [a * fx, zero, a * (cx - u)[..., None]], -1
    )  # (..., N, 12) -- but interleaved layout needed: [fx*ai, 0, (cx-u)ai]*4
    # build properly: for each control j: columns 3j..3j+2
    def rows(coef_x, coef_y, coef_z):
        cols = []
        for j in range(4):
            cols.append(a[..., j : j + 1] * coef_x[..., None])
            cols.append(a[..., j : j + 1] * coef_y[..., None])
            cols.append(a[..., j : j + 1] * coef_z[..., None])
        return jnp.concatenate(cols, -1)          # (..., N, 12)

    Mu = rows(fx * jnp.ones_like(u), jnp.zeros_like(u), cx - u)
    Mv = rows(jnp.zeros_like(v), fy * jnp.ones_like(v), cy - v)
    del r1, zero
    ww = w[..., None]
    MtM = jnp.einsum("...ni,...nj->...ij", Mu * ww, Mu) + jnp.einsum(
        "...ni,...nj->...ij", Mv * ww, Mv
    )
    return MtM


def _dist2(x):
    """Pairwise squared distances of 4 control points -> (..., 6)."""
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    return jnp.stack(
        [jnp.sum((x[..., i, :] - x[..., j, :]) ** 2, -1) for i, j in pairs], -1
    )


def _betas_gauss_newton(V, rho, beta0, iters: int = 5):
    """Refine betas so sum_k beta_k v_k reproduces control distances
    (ref gauss_newton :840-907).  V: (..., 12, 4) basis (columns =
    eigenvectors for the 4 smallest eigenvalues), rho: (..., 6)."""
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    Vc = V.reshape(V.shape[:-2] + (4, 3, 4))       # (..., ctrl, xyz, basis)

    def body(_, beta):
        x = jnp.einsum("...cxk,...k->...cx", Vc, beta)   # ctrl pts in cam
        diffs = jnp.stack(
            [x[..., i, :] - x[..., j, :] for i, j in pairs], -2
        )                                          # (..., 6, 3)
        dv = jnp.stack(
            [Vc[..., i, :, :] - Vc[..., j, :, :] for i, j in pairs], -3
        )                                          # (..., 6, 3, 4)
        f = jnp.sum(diffs * diffs, -1) - rho       # (..., 6)
        J = 2.0 * jnp.einsum("...pi,...pik->...pk", diffs, dv)  # (..., 6, 4)
        JtJ = jnp.einsum("...pi,...pj->...ij", J, J)
        Jtf = jnp.einsum("...pi,...p->...i", J, f)
        eye = jnp.eye(4, dtype=J.dtype) * 1e-9
        step = jnp.linalg.solve(JtJ + eye, -Jtf[..., None])[..., 0]
        return beta + step

    return jax.lax.fori_loop(0, iters, body, beta0)


def _epnp_solve(pw, uv, w, fx, fy, cx, cy):
    """Solve one (possibly batched) EPnP instance with weights w.

    Returns (R, t) world->camera.
    """
    cw = _control_points(pw, w)
    alphas = _barycentric(pw, cw)
    MtM = _build_MtM(alphas, uv, fx, fy, cx, cy, w)
    evals, evecs = jnp.linalg.eigh(MtM)
    V = evecs[..., :, :4]                          # 4 smallest (..., 12, 4)

    rho = _dist2(cw)

    # beta seed: case N=1 (ref find_betas_approx_1 :667-688 analog):
    # x = beta * v0 with v0 = smallest eigenvector
    v0 = V[..., :, 0].reshape(V.shape[:-2] + (4, 3))
    d_v0 = _dist2(v0)
    beta1 = jnp.sum(d_v0 * rho, -1) / jnp.maximum(jnp.sum(d_v0 * d_v0, -1), 1e-12)
    beta1 = jnp.sqrt(jnp.maximum(beta1, 1e-12))
    beta0 = jnp.stack(
        [beta1, jnp.zeros_like(beta1), jnp.zeros_like(beta1),
         jnp.zeros_like(beta1)], -1,
    )
    betas = _betas_gauss_newton(V, rho, beta0)

    cc = jnp.einsum("...ik,...k->...i", V, betas).reshape(
        V.shape[:-2] + (4, 3)
    )                                              # camera-frame ctrl pts
    pc = jnp.einsum("...nj,...jx->...nx", alphas, cc)  # (..., N, 3)

    # fix sign: average depth must be positive
    mean_z = jnp.sum(pc[..., 2] * w, -1) / jnp.maximum(jnp.sum(w, -1), 1e-12)
    flip = jnp.where(mean_z < 0, -1.0, 1.0)
    pc = pc * flip[..., None, None]

    R, t, _ = horn_align(pw, pc, w, with_scale=False)
    return R, t


def _reproj_chi2(R, t, pw, uv, fx, fy, cx, cy):
    pc = jnp.einsum("...ij,...nj->...ni", R, pw) + t[..., None, :]
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = fx * pc[..., 0] / z + cx
    v = fy * pc[..., 1] / z + cy
    return (u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2


@functools.partial(jax.jit, static_argnames=())
def solve_pnp_ransac(
    pts_w: jnp.ndarray,        # (N, 3)
    uv: jnp.ndarray,           # (N, 2)
    max_err2: jnp.ndarray,     # (N,) per-point chi2 threshold (octave-scaled,
                               #  ref: PnPsolver ctor mvMaxError sigma2*5.991)
    mask: jnp.ndarray,         # (N,)
    sample_idx: jnp.ndarray,   # (S, MIN_SET) int32
    fx, fy, cx, cy,
    min_inliers: int = 10,
):
    """All-hypotheses-at-once EPnP RANSAC + full-inlier refinement."""
    S = sample_idx.shape[0]
    pw_s = pts_w[sample_idx]                       # (S, 6, 3)
    uv_s = uv[sample_idx]
    w_s = mask[sample_idx].astype(pts_w.dtype)

    R, t = _epnp_solve(pw_s, uv_s, w_s, fx, fy, cx, cy)   # (S,3,3),(S,3)

    chi2 = _reproj_chi2(R, t, pts_w[None], uv[None], fx, fy, cx, cy)  # (S,N)
    inl = (chi2 <= max_err2[None]) & mask[None]
    counts = jnp.sum(inl, -1)
    best = jnp.argmax(counts)

    # refine on the best hypothesis's inliers (ref Refine :260-306)
    w_ref = inl[best].astype(pts_w.dtype)
    R2, t2 = _epnp_solve(pts_w, uv, w_ref, fx, fy, cx, cy)
    chi2_r = _reproj_chi2(R2, t2, pts_w, uv, fx, fy, cx, cy)
    inl_r = (chi2_r <= max_err2) & mask
    n_r = jnp.sum(inl_r)

    use_refined = n_r >= counts[best]
    R_out = jnp.where(use_refined, R2, R[best])
    t_out = jnp.where(use_refined, t2, t[best])
    inliers = jnp.where(use_refined, inl_r, inl[best])
    n_out = jnp.maximum(n_r, counts[best])

    T = jnp.eye(4, dtype=pts_w.dtype)
    T = T.at[:3, :3].set(R_out).at[:3, 3].set(t_out)
    return PnPResult(n_out >= min_inliers, T, inliers, n_out)
