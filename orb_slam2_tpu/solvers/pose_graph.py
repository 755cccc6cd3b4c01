"""Sim3 pose-graph (essential graph) optimization.

TPU-native replacement for Optimizer::OptimizeEssentialGraph
(ref: src/Optimizer.cc:781-1044): one VertexSim3Expmap per keyframe (loop
keyframe fixed), EdgeSim3 over loop edges, spanning-tree edges, prior loop
edges and strong-covisibility edges (weight >= 100), optimized with LM.

Design: vertices are Sim3 triples (R (K,3,3), t (K,3), s (K,)); edges are
index pairs with Sim3 measurements.  The edge error is
log(S_meas^-1 * S_j * S_i^-1) in sim(3); Jacobians w.r.t. the two local
7-dim perturbations are computed by forward-mode autodiff (exact, batched),
and the normal system is assembled dense (7K x 7K) — a 200-keyframe map is
a 1400x1400 solve, ideal MXU work.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.geometry import sim3


class PoseGraphProblem(NamedTuple):
    R: jnp.ndarray          # (K, 3, 3) Siw rotations
    t: jnp.ndarray          # (K, 3)
    s: jnp.ndarray          # (K,)
    fixed: jnp.ndarray      # (K,) bool
    vmask: jnp.ndarray      # (K,) bool
    edge_i: jnp.ndarray     # (E,) int32
    edge_j: jnp.ndarray     # (E,) int32
    meas_R: jnp.ndarray     # (E, 3, 3) measured S_ji = S_j * S_i^-1
    meas_t: jnp.ndarray     # (E, 3)
    meas_s: jnp.ndarray     # (E,)
    emask: jnp.ndarray      # (E,) bool


def _edge_error(xi_i, xi_j, Si, Sj, Sm_inv):
    """Residual for one edge with local perturbations applied."""
    Si_p = sim3.compose(sim3.exp(xi_i), Si)
    Sj_p = sim3.compose(sim3.exp(xi_j), Sj)
    rel = sim3.compose(Sj_p, sim3.inverse(Si_p))
    return sim3.log(sim3.compose(Sm_inv, rel))


def _edge_residual_jacobians(prob: PoseGraphProblem):
    Si = (prob.R[prob.edge_i], prob.t[prob.edge_i], prob.s[prob.edge_i])
    Sj = (prob.R[prob.edge_j], prob.t[prob.edge_j], prob.s[prob.edge_j])
    Sm_inv = sim3.inverse((prob.meas_R, prob.meas_t, prob.meas_s))

    zeros = jnp.zeros((prob.edge_i.shape[0], 7), prob.t.dtype)

    def err_fn(xi_i, xi_j, si_r, si_t, si_s, sj_r, sj_t, sj_s, smr, smt, sms):
        return _edge_error(
            xi_i, xi_j, (si_r, si_t, si_s), (sj_r, sj_t, sj_s),
            (smr, smt, sms),
        )

    batched = jax.vmap(err_fn)
    r = batched(
        zeros, zeros, Si[0], Si[1], Si[2], Sj[0], Sj[1], Sj[2],
        Sm_inv[0], Sm_inv[1], Sm_inv[2],
    )
    Ji = jax.vmap(jax.jacfwd(err_fn, argnums=0))(
        zeros, zeros, Si[0], Si[1], Si[2], Sj[0], Sj[1], Sj[2],
        Sm_inv[0], Sm_inv[1], Sm_inv[2],
    )
    Jj = jax.vmap(jax.jacfwd(err_fn, argnums=1))(
        zeros, zeros, Si[0], Si[1], Si[2], Sj[0], Sj[1], Sj[2],
        Sm_inv[0], Sm_inv[1], Sm_inv[2],
    )
    return r, Ji, Jj


@functools.partial(jax.jit, static_argnames=("iters", "mode", "cg_iters"))
def optimize(prob: PoseGraphProblem, iters: int = 20, mode: str = "dense",
             cg_iters: int | None = None):
    """Returns optimized (R, t, s) per keyframe.

    mode="dense" materializes the 7K x 7K normal matrix (one MXU solve,
    right for the <= a-few-hundred-KF maps); mode="cg" runs block-Jacobi
    preconditioned conjugate gradients with a matrix-free matvec over the
    per-edge 7x7 blocks — O(E) memory, the path for 1000+ keyframe
    essential graphs.  cg_iters defaults to 2K: with a block-Jacobi
    preconditioner a correction propagates ~1 vertex per CG step, so a
    K-ring (the dominant structure of an odometry pose graph) needs
    O(K) iterations — 100 fixed iterations silently under-converges a
    1000-KF loop closure (measured: err 20.7m at 300 iters vs 9mm at
    2000 iters on a 1000-KF drifted ring)."""
    K = prob.R.shape[0]
    if cg_iters is None:
        cg_iters = max(100, 2 * K)

    def total_error(R, t, s):
        p = prob._replace(R=R, t=t, s=s)
        r, _, _ = _edge_residual_jacobians(p)
        w = p.emask.astype(r.dtype)
        return jnp.sum(jnp.sum(r * r, -1) * w)

    def lm_iter(carry, _):
        R, t, s, lam = carry
        p = prob._replace(R=R, t=t, s=s)
        r, Ji, Jj = _edge_residual_jacobians(p)
        w = p.emask.astype(r.dtype)[:, None, None]
        freeze = prob.fixed | ~prob.vmask
        # frozen vertices contribute constraints but receive no update:
        # zero their Jacobians BEFORE assembly so the solve stays consistent
        Ji = Ji * w * ~freeze[prob.edge_i][:, None, None]
        Jj = Jj * w * ~freeze[prob.edge_j][:, None, None]
        rw = r * p.emask.astype(r.dtype)[:, None]

        # per-edge normal-equation blocks
        Hii = jnp.einsum("eai,eaj->eij", Ji, Ji)
        Hjj = jnp.einsum("eai,eaj->eij", Jj, Jj)
        Hij = jnp.einsum("eai,eaj->eij", Ji, Jj)
        gi = jnp.einsum("eai,ea->ei", Ji, rw)
        gj = jnp.einsum("eai,ea->ei", Jj, rw)
        g = jnp.zeros((K, 7), r.dtype)
        g = g.at[prob.edge_i].add(gi)
        g = g.at[prob.edge_j].add(gj)

        # block diagonal (shared by the dense path and the preconditioner)
        Hdiag = jnp.zeros((K, 7, 7), r.dtype)
        Hdiag = Hdiag.at[prob.edge_i].add(Hii)
        Hdiag = Hdiag.at[prob.edge_j].add(Hjj)
        # Marquardt damping scaled by the diagonal keeps step sizes sane
        # across the mixed rotation/translation/scale parametrization.
        ddiag = jnp.diagonal(Hdiag, axis1=1, axis2=2)         # (K, 7)
        damp = lam * jnp.maximum(ddiag, 1e-6) + 1e-8

        if mode == "dense":
            flat_ij = prob.edge_i * K + prob.edge_j
            flat_ji = prob.edge_j * K + prob.edge_i
            H = jnp.zeros((K * K, 7, 7), r.dtype)
            H = H.at[flat_ij].add(Hij)
            H = H.at[flat_ji].add(Hij.transpose(0, 2, 1))
            H = H.reshape(K, K, 7, 7)
            H = H.at[jnp.arange(K), jnp.arange(K)].add(Hdiag)
            H = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
            H = H + jnp.diag(damp.reshape(-1))
            dx = jnp.linalg.solve(H, -g.reshape(-1)).reshape(K, 7)
        else:
            dx = _solve_pcg(prob, Hdiag, Hij, damp, -g, iters=cg_iters)
        dx = jnp.where(freeze[:, None], 0.0, dx)

        dS = sim3.exp(dx)
        R_new, t_new, s_new = sim3.compose(dS, (R, t, s))
        err_old = total_error(R, t, s)
        err_new = total_error(R_new, t_new, s_new)
        accept = err_new < err_old
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        s = jnp.where(accept, s_new, s)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (R, t, s, lam), err_new

    init = (prob.R, prob.t, prob.s, jnp.float32(1e-6))
    (R, t, s, _), _ = jax.lax.scan(lm_iter, init, None, length=iters)
    return R, t, s


def _solve_pcg(prob, Hdiag, Hij, damp, b, iters: int = 100):
    """Block-Jacobi PCG on the damped normal equations, matrix-free: the
    matvec scatters per-edge off-diagonal 7x7 blocks with segment sums,
    so memory is O(K + E) instead of O(K^2)."""
    Hd = Hdiag + jax.vmap(jnp.diag)(damp)
    Minv = jnp.linalg.inv(
        Hd + 1e-6 * jnp.eye(7, dtype=Hd.dtype)[None]
    )

    def matvec(x):                                           # x: (K, 7)
        y = jnp.einsum("kij,kj->ki", Hd, x)
        xi = x[prob.edge_i]
        xj = x[prob.edge_j]
        y = y.at[prob.edge_i].add(jnp.einsum("eij,ej->ei", Hij, xj))
        y = y.at[prob.edge_j].add(
            jnp.einsum("eji,ej->ei", Hij, xi))
        return y

    def precond(r):
        return jnp.einsum("kij,kj->ki", Minv, r)

    x0 = jnp.zeros_like(b)
    r0 = b - matvec(x0)
    z0 = precond(r0)

    def body(carry, _):
        x, r, z, p = carry
        Ap = matvec(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
        x = x + alpha * p
        r_new = r - alpha * Ap
        z_new = precond(r_new)
        beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-20)
        p = z_new + beta * p
        return (x, r_new, z_new, p), None

    (x, _, _, _), _ = jax.lax.scan(
        body, (x0, r0, z0, z0), None, length=iters
    )
    return x
