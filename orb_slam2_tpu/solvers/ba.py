"""Bundle adjustment: Schur-complement Levenberg-Marquardt on TPU.

TPU-native replacement for Optimizer::{BundleAdjustment,
LocalBundleAdjustment} (ref: src/Optimizer.cc:49-237, 453-780), which the
reference delegates to g2o's BlockSolver_6_3 with point marginalization.

Design: the optimization problem is a fixed-shape edge list
(camera_idx, point_idx, observation).  Each LM iteration:
  1. residuals + analytic Jacobians for all edges in one batch,
  2. Hcc (K,6,6), Hpp (P,3,3), Hcp, gradients via segment-sums,
  3. marginalize points: batched 3x3 inverses of Hpp,
  4. reduced camera system S dc = rhs solved either
       - densely (6K x 6K) for local-BA-sized windows — lands on the MXU,
       - or by preconditioned conjugate gradients with implicit edge-wise
         matvecs for global BA (memory O(E), no dense (K,P) coupling),
  5. back-substitute point updates.

The robust kernel, chi2 thresholds (5.991 mono / 7.815 stereo), and the
two-stage optimize -> drop outliers -> reoptimize flow mirror the
reference's LocalBundleAdjustment (ref :660-707).  An abort flag
equivalent (mbAbortBA) is handled by the caller between stages.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.geometry import se3

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAProblem(NamedTuple):
    cam_T: jnp.ndarray       # (K, 4, 4) Tcw
    cam_fixed: jnp.ndarray   # (K,) bool — gauge/fixed cameras
    cam_mask: jnp.ndarray    # (K,) bool — padded slots
    pts: jnp.ndarray         # (P, 3)
    pt_mask: jnp.ndarray     # (P,) bool
    edge_cam: jnp.ndarray    # (E,) int32
    edge_pt: jnp.ndarray     # (E,) int32
    edge_uv: jnp.ndarray     # (E, 3) [u, v, ur] (ur < 0 => mono)
    edge_inv_sigma2: jnp.ndarray  # (E,)
    edge_mask: jnp.ndarray   # (E,) bool


def _edge_terms(prob: BAProblem, cam_T, pts, fx, fy, cx, cy, bf):
    """Residuals r (E,3), Jc (E,3,6), Jp (E,3,3), row_mask (E,3)."""
    Tc = cam_T[prob.edge_cam]                     # (E, 4, 4)
    pw = pts[prob.edge_pt]                        # (E, 3)
    pc = se3.transform(Tc, pw)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_safe = jnp.maximum(z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    ur = u - bf * inv_z

    uv = prob.edge_uv
    is_stereo = uv[:, 2] >= 0
    r = jnp.stack(
        [uv[:, 0] - u, uv[:, 1] - v,
         jnp.where(is_stereo, uv[:, 2] - ur, 0.0)], -1)

    E = pc.shape[0]
    zero = jnp.zeros_like(x)
    Ju = jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], -1)
    Jv = jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], -1)
    Jur = jnp.stack([fx * inv_z, zero, -fx * x * inv_z2 + bf * inv_z2], -1)
    Jproj = jnp.stack([Ju, Jv, Jur], 1)           # (E, 3, 3)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (E, 3, 3))
    dpc_dxi = jnp.concatenate([eye, -se3.hat(pc)], -1)   # (E, 3, 6)
    Jc = -jnp.einsum("eij,ejk->eik", Jproj, dpc_dxi)      # (E, 3, 6)
    R = Tc[:, :3, :3]
    Jp = -jnp.einsum("eij,ejk->eik", Jproj, R)            # (E, 3, 3)

    behind = z <= 1e-3
    ok = (
        prob.edge_mask
        & prob.cam_mask[prob.edge_cam]
        & prob.pt_mask[prob.edge_pt]
        & ~behind
    )
    row_mask = jnp.stack(
        [jnp.ones(E, bool), jnp.ones(E, bool), is_stereo], -1
    ) & ok[:, None]
    # fixed cameras contribute to point estimation but have zero cam Jacobian
    Jc = jnp.where(prob.cam_fixed[prob.edge_cam][:, None, None], 0.0, Jc)
    return r, Jc, Jp, row_mask, is_stereo


def _chi2(r, row_mask, inv_sigma2):
    return jnp.sum(r * r * row_mask, -1) * inv_sigma2


def edge_chi2(prob: BAProblem, fx, fy, cx, cy, bf):
    """Per-edge chi2 and stereo flags under current estimates."""
    r, _, _, row_mask, is_st = _edge_terms(
        prob, prob.cam_T, prob.pts, fx, fy, cx, cy, bf
    )
    return _chi2(r, row_mask, prob.edge_inv_sigma2), is_st, row_mask[:, 0]


def _inv3x3(A):
    """Batched closed-form (adjugate) 3x3 inverse.

    jnp.linalg.inv lowers tiny batched inverses to an LU loop that is
    op-latency-bound on TPU; the adjugate is a handful of fused
    elementwise ops.  Callers guarantee invertibility (Hpp blocks are
    damped SPD)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A21 = f * g - d * i
    A31 = d * h - e * g
    det = a * A11 + b * A21 + c * A31
    s = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    rows = jnp.stack([
        jnp.stack([A11, c * h - b * i, b * f - c * e], -1),
        jnp.stack([A21, a * i - c * g, c * d - a * f], -1),
        jnp.stack([A31, b * g - a * h, a * e - b * d], -1),
    ], -2)
    return rows * s[..., None, None]


def _onehots(prob: BAProblem, K: int, P: int):
    """One-hot edge->camera (E,K) and edge->point (E,P) matrices.

    Segment reductions over the edge list become matmuls on these —
    TPU scatters serialize, MXU matmuls don't.  Only materialized for
    local-window problems (dense mode), where E*P stays ~10^7."""
    Ck = jax.nn.one_hot(prob.edge_cam, K, dtype=jnp.float32)
    Pm = jax.nn.one_hot(prob.edge_pt, P, dtype=jnp.float32)
    return Ck, Pm


def _seg_sum(values, onehot, seg_ids, num_segments):
    """Segment-sum as one-hot matmul when available, scatter otherwise.

    values: (E, ...) — flattened to (E, D) for the matmul."""
    if onehot is None:
        return jax.ops.segment_sum(values, seg_ids,
                                   num_segments=num_segments)
    E = values.shape[0]
    flat = values.reshape(E, -1)
    out = onehot.T @ flat                      # (S, D) on the MXU
    return out.reshape((num_segments,) + values.shape[1:])


def _huber_weights(chi2, is_stereo, use_kernel):
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    w = jnp.where(
        use_kernel & (chi2 > delta2),
        jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)),
        1.0,
    )
    return w


def _assemble(prob, cam_T, pts, fx, fy, cx, cy, bf, use_kernel,
              onehots=None):
    """Build all blocks of the normal equations."""
    K = cam_T.shape[0]
    P = pts.shape[0]
    r, Jc, Jp, row_mask, is_st = _edge_terms(
        prob, cam_T, pts, fx, fy, cx, cy, bf
    )
    chi2 = _chi2(r, row_mask, prob.edge_inv_sigma2)
    w_h = _huber_weights(chi2, is_st, use_kernel)
    w = prob.edge_inv_sigma2 * w_h                        # (E,)
    wr = w[:, None] * row_mask                            # (E, 3)

    JcW = Jc * wr[:, :, None]                             # (E, 3, 6)
    JpW = Jp * wr[:, :, None]

    Hcc_e = jnp.einsum("eik,eij->ekj", JcW, Jc)           # (E, 6, 6)
    Hpp_e = jnp.einsum("eik,eij->ekj", JpW, Jp)           # (E, 3, 3)
    Hcp_e = jnp.einsum("eik,eij->ekj", JcW, Jp)           # (E, 6, 3)
    gc_e = jnp.einsum("eik,ei->ek", JcW, r)               # (E, 6)
    gp_e = jnp.einsum("eik,ei->ek", JpW, r)               # (E, 3)

    Ck, Pm = onehots if onehots is not None else (None, None)
    Hcc = _seg_sum(Hcc_e, Ck, prob.edge_cam, K)
    Hpp = _seg_sum(Hpp_e, Pm, prob.edge_pt, P)
    gc = _seg_sum(gc_e, Ck, prob.edge_cam, K)
    gp = _seg_sum(gp_e, Pm, prob.edge_pt, P)

    err = jnp.sum(
        jnp.where(
            use_kernel,
            _huber_rho(chi2, is_st),
            chi2,
        ) * row_mask[:, 0]
    )
    return Hcc, Hpp, Hcp_e, gc, gp, err


def _huber_rho(chi2, is_stereo):
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    delta = jnp.sqrt(delta2)
    return jnp.where(
        chi2 > delta2,
        2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - delta2,
        chi2,
    )


def _total_error(prob, cam_T, pts, fx, fy, cx, cy, bf, use_kernel):
    r, _, _, row_mask, is_st = _edge_terms(prob, cam_T, pts, fx, fy, cx, cy, bf)
    chi2 = _chi2(r, row_mask, prob.edge_inv_sigma2)
    rho = jnp.where(use_kernel, _huber_rho(chi2, is_st), chi2)
    return jnp.sum(rho * row_mask[:, 0])


def _solve_cameras_dense(Hcc, Hcp_e, Hpp_inv, gc, gp, prob, lam,
                         onehots=None):
    """Dense Schur solve for local-BA-sized problems.

    Materializes W (K, P, 6, 3) = sum of Hcp blocks — use only when
    K * P is small (local window).
    """
    K = Hcc.shape[0]
    P = Hpp_inv.shape[0]
    if onehots is not None:
        Ck, Pm = onehots
        E = Hcp_e.shape[0]
        # W[k,p] = sum_e 1[cam=k] 1[pt=p] Hcp_e: expand the (tiny) cam
        # one-hot into the values, then ONE (P,E)@(E,K*18) MXU matmul
        tmp = (Ck[:, :, None] * Hcp_e.reshape(E, 1, 18)).reshape(E, K * 18)
        W = (Pm.T @ tmp).reshape(P, K, 6, 3).transpose(1, 0, 2, 3)
    else:
        flat_idx = prob.edge_cam * P + prob.edge_pt
        W = jax.ops.segment_sum(Hcp_e, flat_idx, num_segments=K * P)
        W = W.reshape(K, P, 6, 3)
    Y = jnp.einsum("kpab,pbc->kpac", W, Hpp_inv)
    S = -jnp.einsum("kpac,lpbc->klab", Y, W)              # (K, K, 6, 6)
    diag = jnp.arange(K)
    S = S.at[diag, diag].add(Hcc)
    rhs = gc - jnp.einsum("kpab,pb->ka", Y, gp)           # (K, 6)

    Sm = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    # damping + fixed/padded camera regularization
    Sm = Sm + lam * jnp.eye(6 * K, dtype=Sm.dtype)
    dc = jnp.linalg.solve(Sm, -rhs.reshape(-1))
    return dc.reshape(K, 6)


def _solve_cameras_cg(
    Hcc, Hcp_e, Hpp_inv, gc, gp, prob, lam, iters: int = 60
):
    """Matrix-free PCG on the Schur complement for global BA.

    S x = Hcc x - W Hpp^-1 W^T x with W^T x accumulated edge-wise.
    Preconditioner: block-Jacobi with the damped Hcc diagonal blocks.
    """
    K = Hcc.shape[0]
    P = Hpp_inv.shape[0]
    lamI = lam * jnp.eye(6, dtype=Hcc.dtype)

    def S_matvec(x):                                      # x: (K, 6)
        hx = jnp.einsum("kab,kb->ka", Hcc, x) + lam * x
        wtx_e = jnp.einsum("eab,ea->eb", Hcp_e, x[prob.edge_cam])  # (E, 3)
        wtx = jax.ops.segment_sum(wtx_e, prob.edge_pt, num_segments=P)
        z = jnp.einsum("pab,pb->pa", Hpp_inv, wtx)        # (P, 3)
        wz_e = jnp.einsum("eab,eb->ea", Hcp_e, z[prob.edge_pt])    # (E, 6)
        wz = jax.ops.segment_sum(wz_e, prob.edge_cam, num_segments=K)
        return hx - wz

    rhs_p = jnp.einsum("pab,pb->pa", Hpp_inv, gp)
    rhs_c_e = jnp.einsum("eab,eb->ea", Hcp_e, rhs_p[prob.edge_pt])
    rhs = -(gc - jax.ops.segment_sum(rhs_c_e, prob.edge_cam, num_segments=K))

    Minv = jnp.linalg.inv(Hcc + lamI[None])

    def precond(r):
        return jnp.einsum("kab,kb->ka", Minv, r)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs - S_matvec(x0)
    z0 = precond(r0)

    def body(carry, _):
        x, r, z, p = carry
        Sp = S_matvec(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-20)
        x = x + alpha * p
        r_new = r - alpha * Sp
        z_new = precond(r_new)
        beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-20)
        p_new = z_new + beta * p
        return (x, r_new, z_new, p_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, z0, z0), None, length=iters)
    return x


@functools.partial(
    jax.jit, static_argnames=("iters", "use_kernel", "mode", "cg_iters")
)
def optimize(
    prob: BAProblem,
    fx, fy, cx, cy, bf,
    iters: int = 5,
    use_kernel: bool = True,
    mode: str = "dense",
    cg_iters: int = 60,
):
    """Run `iters` LM iterations; returns updated (cam_T, pts, final_err)."""
    # the one-hot reduction matrices are iteration-invariant: build once.
    # Local-window sizes only — the (E,P) matrix is E*P*4 bytes, so gate
    # on ~50M entries (200MB); past that (global BA) keep the scatters.
    E_n = prob.edge_cam.shape[0]
    P_n = prob.pts.shape[0]
    onehots = (_onehots(prob, prob.cam_T.shape[0], P_n)
               if mode == "dense" and E_n * P_n <= 50_000_000 else None)

    def lm_iter(carry, _):
        cam_T, pts, lam = carry
        Hcc, Hpp, Hcp_e, gc, gp, err_old = _assemble(
            prob, cam_T, pts, fx, fy, cx, cy, bf, use_kernel,
            onehots=onehots,
        )
        lamI3 = lam * jnp.eye(3, dtype=pts.dtype)
        # regularize padded points so inversion stays sane
        Hpp_d = Hpp + lamI3[None] + (~prob.pt_mask)[:, None, None] * jnp.eye(
            3, dtype=pts.dtype
        )
        Hpp_inv = _inv3x3(Hpp_d)

        if mode == "dense":
            dc = _solve_cameras_dense(Hcc, Hcp_e, Hpp_inv, gc, gp, prob,
                                      lam, onehots=onehots)
        else:
            dc = _solve_cameras_cg(
                Hcc, Hcp_e, Hpp_inv, gc, gp, prob, lam, iters=cg_iters
            )
        dc = jnp.where(
            (prob.cam_fixed | ~prob.cam_mask)[:, None], 0.0, dc
        )

        # back-substitute points: dp = -Hpp^-1 (gp + W^T dc)
        wtd_e = jnp.einsum("eab,ea->eb", Hcp_e, dc[prob.edge_cam])
        wtd = _seg_sum(
            wtd_e, onehots[1] if onehots is not None else None,
            prob.edge_pt, pts.shape[0]
        )
        dp = -jnp.einsum("pab,pb->pa", Hpp_inv, gp + wtd)
        dp = jnp.where(prob.pt_mask[:, None], dp, 0.0)

        cam_T_new = se3.exp(dc) @ cam_T
        pts_new = pts + dp
        err_new = _total_error(
            prob, cam_T_new, pts_new, fx, fy, cx, cy, bf, use_kernel
        )
        accept = err_new < err_old
        cam_T = jnp.where(accept, cam_T_new, cam_T)
        pts = jnp.where(accept, pts_new, pts)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        # report the ACCEPTED state's error, not the proposal's — a
        # rejected final step would otherwise return an arbitrarily bad
        # number for a perfectly good state
        return (cam_T, pts, lam), jnp.where(accept, err_new, err_old)

    # NOTE: fixed-length scan, deliberately NOT an early-exit while_loop:
    # LM can accept a near-zero-improvement step early (lambda still
    # adapting) and then make large progress once the trust region grows;
    # first-tiny-improvement stopping measurably degraded post-loop GBA
    # (ATE 0.73 -> 0.95 on the loop_ate circuit).
    (cam_T, pts, _), errs = jax.lax.scan(
        lm_iter, (prob.cam_T, prob.pts, jnp.float32(1e-3)), None, length=iters
    )
    return cam_T, pts, errs[-1]


@jax.jit
def classify_outliers(prob: BAProblem, fx, fy, cx, cy, bf):
    """Edge outlier mask: chi2 > threshold or positive-depth violation
    (ref: src/Optimizer.cc:672-689, 718-739)."""
    chi2, is_st, ok = edge_chi2(prob, fx, fy, cx, cy, bf)
    th = jnp.where(is_st, CHI2_STEREO, CHI2_MONO)
    return (chi2 > th) | ~ok


@functools.partial(
    jax.jit, static_argnames=("iters1", "iters2", "mode", "second_round")
)
def local_ba_chain(
    prob: BAProblem, fx, fy, cx, cy, bf,
    iters1: int = 5, iters2: int = 10, mode: str = "dense",
    second_round: bool = True,
):
    """The full LocalBundleAdjustment device chain in ONE dispatch
    (ref: src/Optimizer.cc:453-780): 5 Huber-kernel LM iterations, edge
    outlier classification, re-optimize the inlier set 10 iterations
    without the kernel, final outlier classification.  Fusing the chain
    avoids 3 extra host<->device round trips per keyframe.

    Returns (cam_T, pts, final_bad_mask, post_round1_edge_mask).
    """
    cam_T, pts, _ = optimize(
        prob, fx, fy, cx, cy, bf, iters=iters1, use_kernel=True, mode=mode
    )
    if not second_round:
        prob1 = prob._replace(cam_T=cam_T, pts=pts)
        bad = classify_outliers(prob1, fx, fy, cx, cy, bf)
        return cam_T, pts, bad, prob.edge_mask
    prob1 = prob._replace(cam_T=cam_T, pts=pts)
    bad1 = classify_outliers(prob1, fx, fy, cx, cy, bf)
    mask2 = prob.edge_mask & ~bad1
    prob2 = prob1._replace(edge_mask=mask2)
    cam_T, pts, _ = optimize(
        prob2, fx, fy, cx, cy, bf, iters=iters2, use_kernel=False, mode=mode
    )
    # final erase pass re-checks ALL original edges under the converged
    # state (ref: Optimizer.cc:718-760 loops every edge, so round-1
    # outliers that stay bad are erased too, not just silently excluded)
    prob3 = prob2._replace(cam_T=cam_T, pts=pts, edge_mask=prob.edge_mask)
    bad = classify_outliers(prob3, fx, fy, cx, cy, bf)
    return cam_T, pts, bad, prob.edge_mask
