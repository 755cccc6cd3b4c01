"""EPnP inside batched RANSAC for relocalization.

TPU-native replacement for PnPsolver (ref: src/PnPsolver.cc): the
reference runs EPnP (4 control points, barycentric coordinates, 12x12
M^T M eigendecomposition, beta cases + Gauss-Newton) on one RANSAC
minimal set at a time; here ALL RANSAC hypotheses are solved
simultaneously via vmapped linear algebra, inliers are counted densely,
and the best hypothesis is refined on its full inlier set.

All three of the reference's closed-form beta seeds (find_betas_approx_
1/2/3, ref: src/PnPsolver.cc:667-761) feed Gauss-Newton in parallel and
the lowest-reprojection-error case wins, exactly like compute_pose
(ref: :565-661).  Deviation: minimal sets use 6 points rather than 4
for numerical headroom (all hypotheses run in parallel on TPU anyway).
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


_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _L6x10(V):
    """The reference's L matrix (ref compute_L_6x10 :760-800): for each
    control-point pair p, quadratic-form coefficients of the 4 betas over
    the basis-vector differences dv_k[p].  Column order
    [B11 B12 B22 B13 B23 B33 B14 B24 B34 B44]."""
    Vc = V.reshape(V.shape[:-2] + (4, 3, 4))       # (..., ctrl, xyz, basis)
    dv = jnp.stack(
        [Vc[..., i, :, :] - Vc[..., j, :, :] for i, j in _PAIRS], -3
    )                                              # (..., 6, 3, 4)
    d = jnp.einsum("...pxi,...pxj->...pij", dv, dv)  # (..., 6, 4, 4)
    cols = [d[..., 0, 0], 2 * d[..., 0, 1], d[..., 1, 1],
            2 * d[..., 0, 2], 2 * d[..., 1, 2], d[..., 2, 2],
            2 * d[..., 0, 3], 2 * d[..., 1, 3], 2 * d[..., 2, 3],
            d[..., 3, 3]]
    return jnp.stack(cols, -1)                     # (..., 6, 10)


def _lsq(A, b):
    """Batched small least squares via ridge-stabilized normal equations
    (jnp.linalg.lstsq does not batch; systems here are 6x3..6x5)."""
    AtA = jnp.einsum("...pi,...pj->...ij", A, A)
    Atb = jnp.einsum("...pi,...p->...i", A, b)
    eye = jnp.eye(A.shape[-1], dtype=A.dtype) * 1e-9
    return jnp.linalg.solve(AtA + eye, Atb[..., None])[..., 0]


def _betas_approx_1(L, rho):
    """betas_approx_1 = [B11 B12 B13 B14] (ref :667-688)."""
    b4 = _lsq(L[..., (0, 1, 3, 6)], rho)
    neg = b4[..., 0] < 0
    s = jnp.where(neg, -1.0, 1.0)
    b0 = jnp.sqrt(jnp.maximum(s * b4[..., 0], 1e-12))
    rest = s[..., None] * b4[..., 1:] / b0[..., None]
    return jnp.concatenate([b0[..., None], rest], -1)


def _betas_approx_2(L, rho):
    """betas_approx_2 = [B11 B12 B22] (ref :693-719)."""
    b3 = _lsq(L[..., (0, 1, 2)], rho)
    neg = b3[..., 0] < 0
    s = jnp.where(neg, -1.0, 1.0)
    b0 = jnp.sqrt(jnp.maximum(s * b3[..., 0], 1e-12))
    # beta2 = sqrt(b22) only when b22 has the same sign as b11
    same = s * b3[..., 2] > 0
    b1 = jnp.where(same, jnp.sqrt(jnp.maximum(s * b3[..., 2], 1e-12)), 0.0)
    b0 = jnp.where(b3[..., 1] < 0, -b0, b0)
    zero = jnp.zeros_like(b0)
    return jnp.stack([b0, b1, zero, zero], -1)


def _betas_approx_3(L, rho):
    """betas_approx_3 = [B11 B12 B22 B13 B23] (ref :724-755)."""
    b5 = _lsq(L[..., (0, 1, 2, 3, 4)], rho)
    neg = b5[..., 0] < 0
    s = jnp.where(neg, -1.0, 1.0)
    b0 = jnp.sqrt(jnp.maximum(s * b5[..., 0], 1e-12))
    same = s * b5[..., 2] > 0
    b1 = jnp.where(same, jnp.sqrt(jnp.maximum(s * b5[..., 2], 1e-12)), 0.0)
    b0 = jnp.where(b5[..., 1] < 0, -b0, b0)
    b2 = b5[..., 3] / b0
    zero = jnp.zeros_like(b0)
    return jnp.stack([b0, b1, b2, zero], -1)


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

    # the reference's three closed-form beta seeds, each refined by
    # Gauss-Newton, lowest reprojection error wins (ref compute_pose
    # :565-661 keeps the best of cases 1/2/3)
    L = _L6x10(V)
    beta0 = jnp.stack([_betas_approx_1(L, rho),
                       _betas_approx_2(L, rho),
                       _betas_approx_3(L, rho)], -2)        # (..., 3, 4)
    Vb = jnp.broadcast_to(V[..., None, :, :],
                          V.shape[:-2] + (3,) + V.shape[-2:])
    rhob = jnp.broadcast_to(rho[..., None, :],
                            rho.shape[:-1] + (3,) + rho.shape[-1:])
    betas = _betas_gauss_newton(Vb, rhob, beta0)            # (..., 3, 4)

    cc = jnp.einsum("...ik,...ck->...ci", V, betas).reshape(
        V.shape[:-2] + (3, 4, 3)
    )                                       # camera-frame ctrl pts per case
    pc = jnp.einsum("...nj,...cjx->...cnx", alphas, cc)     # (..., 3, N, 3)

    # fix sign: average depth must be positive
    wb = w[..., None, :]
    mean_z = (jnp.sum(pc[..., 2] * wb, -1)
              / jnp.maximum(jnp.sum(wb, -1), 1e-12))
    flip = jnp.where(mean_z < 0, -1.0, 1.0)
    pc = pc * flip[..., None, None]

    pwb = jnp.broadcast_to(pw[..., None, :, :], pc.shape)
    R, t, _ = horn_align(pwb, pc, jnp.broadcast_to(wb, pc.shape[:-1]),
                         with_scale=False)                  # (..., 3, 3, 3)

    chi2 = _reproj_chi2(R, t, pwb, uv[..., None, :, :], fx, fy, cx, cy)
    err = (jnp.sum(chi2 * wb, -1)
           / jnp.maximum(jnp.sum(wb, -1), 1e-12))           # (..., 3)
    case = jnp.argmin(err, -1)
    R = jnp.take_along_axis(R, case[..., None, None, None], -3)[..., 0, :, :]
    t = jnp.take_along_axis(t, case[..., None, None], -2)[..., 0, :]
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
