"""Monocular map initialization: batched H/F RANSAC + reconstruction.

TPU-native replacement for Initializer (ref: src/Initializer.cc): the
reference races a homography thread against a fundamental thread over 200
pre-sampled 8-point sets; here both models are estimated for ALL 200 sets
simultaneously as one batched SVD, scored densely over all matches, the
model is chosen by RH = SH/(SH+SF) > 0.40 (ref :112-118), and all 12
candidate motions (8 from Faugeras homography decomposition, 4 from the
essential matrix) are cheirality-checked in one batch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.geometry import se3
from orb_slam2_tpu.solvers.triangulation import triangulate_dlt

SIGMA = 1.0
CHI2_H = 5.991
CHI2_F = 3.841
SCORE_TH = 5.991  # both checks accumulate against 5.991 (ref :305-468)
N_RANSAC = 200    # ref: mMaxIterations = 200 (src/Initializer.cc:41)


class InitResult(NamedTuple):
    success: jnp.ndarray     # () bool
    R21: jnp.ndarray         # (3, 3)
    t21: jnp.ndarray         # (3,)
    points3d: jnp.ndarray    # (N, 3) in camera-1 frame
    good_mask: jnp.ndarray   # (N,) bool triangulated inliers
    used_homography: jnp.ndarray  # () bool


def _normalize(xy: jnp.ndarray, mask: jnp.ndarray):
    """Mean/abs-dev normalization (ref: Initializer::Normalize :694-731)."""
    m = mask.astype(xy.dtype)[:, None]
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(xy * m, 0) / n
    dev = jnp.sum(jnp.abs(xy - mean) * m, 0) / n
    s = 1.0 / jnp.maximum(dev, 1e-9)
    xyn = (xy - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]],
         [0.0, s[1], -mean[1] * s[1]],
         [0.0, 0.0, 1.0]], xy.dtype,
    )
    return xyn, T


def _homography_dlt(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """(S, 8, 2) x2 -> (S, 3, 3) H mapping p1 -> p2 (ref ComputeH21 :226)."""
    u1, v1 = p1[..., 0], p1[..., 1]
    u2, v2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], -1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], -1)
    A = jnp.concatenate([r1, r2], -2)             # (S, 16, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[..., 8, :].reshape(p1.shape[:-2] + (3, 3))


def _fundamental_8pt(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """(S, 8, 2) x2 -> (S, 3, 3) F with rank-2 (ref ComputeF21 :268)."""
    u1, v1 = p1[..., 0], p1[..., 1]
    u2, v2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], -1
    )                                              # (S, 8, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    Fpre = vt[..., 8, :].reshape(p1.shape[:-2] + (3, 3))
    u, s, vt2 = jnp.linalg.svd(Fpre)
    s = s.at[..., 2].set(0.0)
    return u @ (s[..., None] * vt2)


def _refit_h(xy1n, xy2n, w):
    """Weighted DLT homography over all inliers (refinement the reference
    lacks — the minimal 8-point model is noisy; a full-inlier least-squares
    refit before decomposition measurably improves R, t)."""
    u1, v1 = xy1n[:, 0], xy1n[:, 1]
    u2, v2 = xy2n[:, 0], xy2n[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], -1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], 0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[8].reshape(3, 3)


def _refit_f(xy1n, xy2n, w):
    """Weighted 8-point fundamental over all inliers with rank-2 projection."""
    u1, v1 = xy1n[:, 0], xy1n[:, 1]
    u2, v2 = xy2n[:, 0], xy2n[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], -1
    ) * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    Fpre = vt[8].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(Fpre)
    s = s.at[2].set(0.0)
    return u @ (s[:, None] * vt2)


def _score_h(H21, H12, xy1, xy2, mask, sigma2):
    """Symmetric transfer score (ref CheckHomography :305-388)."""
    ones = jnp.ones(xy1.shape[:-1] + (1,), xy1.dtype)
    p1 = jnp.concatenate([xy1, ones], -1)          # (N, 3)
    p2 = jnp.concatenate([xy2, ones], -1)

    q2 = jnp.einsum("sij,nj->sni", H21, p1)
    q2 = q2[..., :2] / q2[..., 2:3]
    chi2_21 = jnp.sum((xy2[None] - q2) ** 2, -1) / sigma2

    q1 = jnp.einsum("sij,nj->sni", H12, p2)
    q1 = q1[..., :2] / q1[..., 2:3]
    chi2_12 = jnp.sum((xy1[None] - q1) ** 2, -1) / sigma2

    in1 = chi2_12 < CHI2_H
    in2 = chi2_21 < CHI2_H
    score = jnp.where(in1, SCORE_TH - chi2_12, 0.0) + jnp.where(
        in2, SCORE_TH - chi2_21, 0.0
    )
    score = jnp.sum(score * mask[None], -1)        # (S,)
    inlier = in1 & in2 & mask[None]
    return score, inlier


def _score_f(F21, xy1, xy2, mask, sigma2):
    """Epipolar-distance score (ref CheckFundamental :390-468)."""
    ones = jnp.ones(xy1.shape[:-1] + (1,), xy1.dtype)
    p1 = jnp.concatenate([xy1, ones], -1)
    p2 = jnp.concatenate([xy2, ones], -1)

    l2 = jnp.einsum("sij,nj->sni", F21, p1)        # epiline in img2
    num2 = jnp.einsum("ni,sni->sn", p2, l2)
    den2 = l2[..., 0] ** 2 + l2[..., 1] ** 2
    chi2_1 = num2 * num2 / jnp.maximum(den2, 1e-12) / sigma2

    l1 = jnp.einsum("sji,nj->sni", F21, p2)        # F^T p2: line in img1
    num1 = jnp.einsum("ni,sni->sn", p1, l1)
    den1 = l1[..., 0] ** 2 + l1[..., 1] ** 2
    chi2_2 = num1 * num1 / jnp.maximum(den1, 1e-12) / sigma2

    in1 = chi2_1 < CHI2_F
    in2 = chi2_2 < CHI2_F
    score = jnp.where(in1, SCORE_TH - chi2_1, 0.0) + jnp.where(
        in2, SCORE_TH - chi2_2, 0.0
    )
    score = jnp.sum(score * mask[None], -1)
    inlier = in1 & in2 & mask[None]
    return score, inlier


def _decompose_E(E: jnp.ndarray):
    """E -> 4 (R, t) candidates (ref DecomposeE :909-931)."""
    u, _, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)

    def fix(R):
        return jnp.where(jnp.linalg.det(R) < 0, -R, R)

    R1 = fix(u @ W @ vt)
    R2 = fix(u @ W.T @ vt)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_H(A: jnp.ndarray):
    """Faugeras SVD decomposition of calibrated homography -> 8 (R, t, valid).

    (ref ReconstructH :572-731).  A = K^-1 H K.
    """
    U, d, Vt = jnp.linalg.svd(A)
    V = jnp.swapaxes(Vt, -1, -2)
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = d[0], d[1], d[2]
    ok = (d1 / d2 > 1.00001) & (d2 / d3 > 1.00001)

    eps = 1e-12
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs_list = []
    ts_list = []

    # case d' = d2
    aux_st = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, eps)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    st_signs = jnp.array([1.0, -1.0, -1.0, 1.0]) * aux_st
    for i in range(4):
        st = st_signs[i]
        Rp = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], A.dtype
        )
        Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st)
        Rp = Rp.at[2, 0].set(st).at[2, 2].set(ct)
        R = s * (U @ Rp @ Vt)
        tp = jnp.stack([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        Rs_list.append(R)
        ts_list.append(t / jnp.maximum(jnp.linalg.norm(t), eps))

    # case d' = -d2
    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, eps)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    sp_signs = jnp.array([1.0, -1.0, -1.0, 1.0]) * aux_sp
    for i in range(4):
        sp = sp_signs[i]
        Rp = jnp.zeros((3, 3), A.dtype)
        Rp = Rp.at[0, 0].set(cp).at[0, 2].set(sp)
        Rp = Rp.at[1, 1].set(-1.0)
        Rp = Rp.at[2, 0].set(sp).at[2, 2].set(-cp)
        R = s * (U @ Rp @ Vt)
        tp = jnp.stack([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        Rs_list.append(R)
        ts_list.append(t / jnp.maximum(jnp.linalg.norm(t), eps))

    return jnp.stack(Rs_list), jnp.stack(ts_list), ok


def _check_rt(Rs, ts, xy1, xy2, mask, K, th2):
    """Batched CheckRT (ref :798-907): triangulate under each hypothesis,
    count cheirality+reprojection inliers, measure parallax.

    Rs: (M, 3, 3), ts: (M, 3). Returns (n_good (M,), parallax_deg (M,),
    good (M, N), pts3d (M, N, 3)).
    """
    M = Rs.shape[0]
    P1 = jnp.concatenate([K, jnp.zeros((3, 1), K.dtype)], -1)
    P1 = jnp.broadcast_to(P1, (M, 3, 4))
    Rt = jnp.concatenate([Rs, ts[..., None]], -1)   # (M, 3, 4)
    P2 = K[None] @ Rt

    pts1 = triangulate_dlt(P1, P2, jnp.broadcast_to(xy1, (M,) + xy1.shape),
                           jnp.broadcast_to(xy2, (M,) + xy2.shape))  # (M,N,3)
    finite = jnp.all(jnp.isfinite(pts1), -1)

    O2 = -jnp.einsum("mij,mi->mj", Rs, ts)          # camera-2 center
    n1 = pts1
    n2 = pts1 - O2[:, None]
    d1 = jnp.linalg.norm(n1, axis=-1)
    d2n = jnp.linalg.norm(n2, axis=-1)
    cos_par = jnp.sum(n1 * n2, -1) / jnp.maximum(d1 * d2n, 1e-12)

    z1 = pts1[..., 2]
    pc2 = jnp.einsum("mij,mnj->mni", Rs, pts1) + ts[:, None]
    z2 = pc2[..., 2]
    cheir = ((z1 > 0) & (z2 > 0)) | (cos_par >= 0.99998)

    # reprojection errors
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u1 = fx * pts1[..., 0] / jnp.maximum(z1, 1e-9) + cx
    v1 = fy * pts1[..., 1] / jnp.maximum(z1, 1e-9) + cy
    e1 = (u1 - xy1[None, :, 0]) ** 2 + (v1 - xy1[None, :, 1]) ** 2
    u2 = fx * pc2[..., 0] / jnp.maximum(z2, 1e-9) + cx
    v2 = fy * pc2[..., 1] / jnp.maximum(z2, 1e-9) + cy
    e2 = (u2 - xy2[None, :, 0]) ** 2 + (v2 - xy2[None, :, 1]) ** 2

    good = (
        finite & mask[None] & cheir & (z1 > 0) & (z2 > 0)
        & (e1 < th2) & (e2 < th2) & (cos_par < 0.99998)
    )
    n_good = jnp.sum(good, -1)

    # parallax: ref takes the 50th-smallest angle among good points
    cp = jnp.where(good, cos_par, -1.0)             # good sorted descending
    cp_sorted = jnp.sort(cp, -1)[:, ::-1]
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    cos_at = jnp.take_along_axis(cp_sorted, idx[:, None], -1)[:, 0]
    parallax = jnp.degrees(jnp.arccos(jnp.clip(cos_at, -1.0, 1.0)))
    parallax = jnp.where(n_good > 0, parallax, 0.0)
    return n_good, parallax, good, pts1


@functools.partial(jax.jit, static_argnames=())
def initialize(
    xy1: jnp.ndarray,          # (N, 2) undistorted px coords in ref frame
    xy2: jnp.ndarray,          # (N, 2) matched coords in current frame
    mask: jnp.ndarray,         # (N,) bool valid matches
    K: jnp.ndarray,            # (3, 3)
    sample_idx: jnp.ndarray,   # (200, 8) int32 RANSAC minimal sets
    sigma: float = 1.0,
) -> InitResult:
    sigma2 = sigma * sigma
    xy1n, T1 = _normalize(xy1, mask)
    xy2n, T2 = _normalize(xy2, mask)
    T2inv = jnp.linalg.inv(T2)

    p1 = xy1n[sample_idx]                           # (S, 8, 2)
    p2 = xy2n[sample_idx]

    # --- homography model -------------------------------------------------
    Hn = _homography_dlt(p1, p2)                    # (S, 3, 3)
    H21 = T2inv[None] @ Hn @ T1[None]
    H12 = jnp.linalg.inv(H21)
    score_h, inlier_h = _score_h(H21, H12, xy1, xy2, mask, sigma2)
    best_h = jnp.argmax(score_h)
    SH = score_h[best_h]
    inliers_h = inlier_h[best_h]
    Hn_ref = _refit_h(xy1n, xy2n, inliers_h.astype(xy1.dtype))
    H_best = T2inv @ Hn_ref @ T1

    # --- fundamental model ------------------------------------------------
    Fn = _fundamental_8pt(p1, p2)
    F21 = jnp.swapaxes(T2, -1, -2)[None] @ Fn @ T1[None]
    score_f, inlier_f = _score_f(F21, xy1, xy2, mask, sigma2)
    best_f = jnp.argmax(score_f)
    SF = score_f[best_f]
    inliers_f = inlier_f[best_f]
    Fn_ref = _refit_f(xy1n, xy2n, inliers_f.astype(xy1.dtype))
    F_best = jnp.swapaxes(T2, -1, -2) @ Fn_ref @ T1

    rh = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = rh > 0.40                               # ref :118

    # --- motion hypotheses: 8 from H, 4 from E ----------------------------
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H_best @ K
    Rs_h, ts_h, h_ok = _decompose_H(A)
    E = K.T @ F_best @ K
    Rs_f, ts_f = _decompose_E(E)

    Rs = jnp.concatenate([Rs_h, Rs_f])              # (12, 3, 3)
    ts = jnp.concatenate([ts_h, ts_f])
    th2 = 4.0 * sigma2
    model_inliers = jnp.where(use_h, inliers_h, inliers_f)
    n_good, parallax, good, pts = _check_rt(Rs, ts, xy1, xy2, model_inliers, K, th2)

    is_h = jnp.arange(12) < 8
    hyp_valid = jnp.where(is_h, use_h & h_ok, ~use_h)
    scores = jnp.where(hyp_valid, n_good, -1)

    best = jnp.argmax(scores)
    n_best = scores[best]
    # second best among valid hypotheses
    scores2 = scores.at[best].set(-1)
    n_second = jnp.max(scores2)

    n_inliers = jnp.sum(model_inliers)
    min_good = jnp.maximum(
        0.9 * n_inliers, jnp.where(use_h, 50.0, 0.5 * n_inliers)
    )
    # ref ReconstructF: nGood > 0.9*N, unique winner (secondBest < 0.75 best
    # in ReconstructH; ReconstructF requires nsimilar <= 1), parallax > 1 deg
    min_good = jnp.where(use_h, jnp.maximum(0.9 * n_inliers, 50.0),
                         jnp.maximum(0.9 * n_inliers, 50.0))
    ok = (
        (n_best >= min_good)
        & (n_second < 0.75 * n_best)
        & (parallax[best] > 1.0)
    )

    return InitResult(
        success=ok,
        R21=Rs[best],
        t21=ts[best],
        points3d=pts[best],
        good_mask=good[best],
        used_homography=use_h,
    )


def make_ransac_samples(n_matches: int, rng, n_sets: int = N_RANSAC):
    """Host-side seeded 8-point set sampling (ref uses DUtils::Random with
    SeedRandOnce(0), src/Initializer.cc:78-97).  rng: np.random.Generator."""
    import numpy as np

    sets = np.empty((n_sets, 8), np.int32)
    for s in range(n_sets):
        sets[s] = rng.choice(n_matches, size=8, replace=False)
    return sets
