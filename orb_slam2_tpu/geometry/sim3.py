"""Sim(3) operations in JAX.

Functional equivalent of g2o::Sim3 (ref: Thirdparty/g2o/g2o/types/sim3.h)
used by loop closing and essential-graph optimization.  A Sim3 element is
represented as a (,8) vector [rho(3), omega(3), sigma(1), pad(1)] in tangent
space or as (R, t, s) triples / 4x4-with-scale matrices in the group.

Group action: p' = s * R @ p + t.
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam2_tpu.geometry import se3

_EPS = 1e-8


def make(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray):
    """Pack (R, t, s) into a pytree tuple; s may be scalar or (...,)."""
    s = jnp.asarray(s, dtype=R.dtype)
    return (R, t, jnp.broadcast_to(s, R.shape[:-2]))


def identity(dtype=jnp.float32, batch=()):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    t = jnp.zeros(batch + (3,), dtype)
    s = jnp.ones(batch, dtype)
    return (R, t, s)


def from_se3(T: jnp.ndarray, s=1.0):
    return make(T[..., :3, :3], T[..., :3, 3], jnp.asarray(s, T.dtype))


def to_se3(S) -> jnp.ndarray:
    """[R, t/s] — the reference's recovery of SE3 from an optimized Sim3
    (ref: src/Optimizer.cc:991-1010 and src/LoopClosing.cc:500)."""
    R, t, s = S
    return se3.make_T(R, t / s[..., None])


def apply(S, p: jnp.ndarray) -> jnp.ndarray:
    R, t, s = S
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def compose(A, B):
    """A ∘ B : (s_a R_a (s_b R_b p + t_b) + t_a)."""
    Ra, ta, sa = A
    Rb, tb, sb = B
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return (R, t, sa * sb)


def inverse(S):
    R, t, s = S
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return (Rt, t_inv, s_inv)


def _phi1_V(w: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """V(w, sigma) = integral_0^1 e^{sigma u} exp(u*hat(w)) du = phi1(G)
    with G = sigma*I + hat(w)  (sigma*I commutes with hat(w)).

    Evaluated branch-free by scaling-and-squaring on the doubling identity
    phi1(2A) = (e^A + I)/2 * phi1(A),  e^{2A} = (e^A)^2, with a short Taylor
    series at the scaled-down argument.  Uniformly accurate in f32 for
    |w| <= pi + |sigma| <= ~8 (the closed-form coefficient formulas suffer
    catastrophic cancellation for small theta/sigma in f32), and exact to
    machine eps under forward/reverse autodiff — required by the pose-graph
    Jacobians (ref semantics: Thirdparty/g2o/g2o/types/sim3.h ctor).
    """
    G = se3.hat(w) + sigma[..., None, None] * jnp.broadcast_to(
        jnp.eye(3, dtype=w.dtype), w.shape[:-1] + (3, 3)
    )
    SQUARINGS = 7  # handles ||G|| up to ~8 with scaled norm <= 1/16
    A = G * (1.0 / (1 << SQUARINGS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), G.shape)
    # phi1(A) = I + A/2! + A^2/3! + ... ; e^A = I + A*phi1(A)
    P = eye / 5040.0
    for k in (720.0, 120.0, 24.0, 6.0, 2.0, 1.0):
        P = eye / k + A @ P
    E = eye + A @ P
    for _ in range(SQUARINGS):
        P = 0.5 * (E + eye) @ P
        E = E @ E
    return P


def exp(xi: jnp.ndarray):
    """sim(3) exp: (...,7) [rho, omega, sigma] -> (R, t, s).

    Same semantics as g2o's Sim3 7-vector ctor (sim3.h); t = V(w,sigma) rho
    with V evaluated by the branch-free phi1 scheme above.
    """
    rho, w, sigma = xi[..., 0:3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.exp_so3(w)
    V = _phi1_V(w, sigma)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return (R, t, s)


def log(S) -> jnp.ndarray:
    """(R, t, s) -> (...,7) [rho, omega, sigma] via Newton-free closed form.

    We invert the V matrix from `exp` numerically (3x3 solve) — cheap and
    robust for the magnitudes seen in pose graphs.
    """
    R, t, s = S
    w = se3.log_so3(R)
    sigma = jnp.log(s)
    V = _phi1_V(w, sigma)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, w, sigma[..., None]], -1)


def matrix(S) -> jnp.ndarray:
    """(R, t, s) -> (...,4,4) with sR in the rotation block."""
    R, t, s = S
    return se3.make_T(s[..., None, None] * R, t)


def from_matrix(M: jnp.ndarray):
    """Inverse of `matrix`: recover s = det(sR)^(1/3)."""
    A = M[..., :3, :3]
    s = jnp.cbrt(jnp.linalg.det(A))
    return (A / s[..., None, None], M[..., :3, 3], s)
