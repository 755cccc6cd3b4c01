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


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize(prob: PoseGraphProblem, iters: int = 20):
    """Returns optimized (R, t, s) per keyframe."""
    K = prob.R.shape[0]

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

        # assemble dense (K, K, 7, 7) via flat scatter
        Hii = jnp.einsum("eai,eaj->eij", Ji, Ji)
        Hjj = jnp.einsum("eai,eaj->eij", Jj, Jj)
        Hij = jnp.einsum("eai,eaj->eij", Ji, Jj)
        gi = jnp.einsum("eai,ea->ei", Ji, rw)
        gj = jnp.einsum("eai,ea->ei", Jj, rw)

        flat_ii = prob.edge_i * K + prob.edge_i
        flat_jj = prob.edge_j * K + prob.edge_j
        flat_ij = prob.edge_i * K + prob.edge_j
        flat_ji = prob.edge_j * K + prob.edge_i
        H = jnp.zeros((K * K, 7, 7), r.dtype)
        H = H.at[flat_ii].add(Hii)
        H = H.at[flat_jj].add(Hjj)
        H = H.at[flat_ij].add(Hij)
        H = H.at[flat_ji].add(Hij.transpose(0, 2, 1))
        g = jnp.zeros((K, 7), r.dtype)
        g = g.at[prob.edge_i].add(gi)
        g = g.at[prob.edge_j].add(gj)

        H = H.reshape(K, K, 7, 7).transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        # Marquardt damping scaled by the diagonal keeps step sizes sane
        # across the mixed rotation/translation/scale parametrization.
        diag = jnp.diagonal(H)
        H = H + jnp.diag(lam * jnp.maximum(diag, 1e-6) + 1e-8)
        dx = jnp.linalg.solve(H, -g.reshape(-1)).reshape(K, 7)
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
