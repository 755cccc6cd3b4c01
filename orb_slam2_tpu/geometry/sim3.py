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


def exp(xi: jnp.ndarray):
    """sim(3) exp: (...,7) [rho, omega, sigma] -> (R, t, s).

    Uses the closed-form W matrix of Sim(3) (as in g2o sim3.h ctor from a
    7-vector), series-expanded near sigma=0 / theta=0.
    """
    rho, w, sigma = xi[..., 0:3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.exp_so3(w)
    theta2 = jnp.sum(w * w, -1)
    W = se3.hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    sig = sigma
    s_ = s
    near_sig = jnp.abs(sig) < 1e-5
    near_th = theta2 < 1e-10

    # double-where: substitute safe values BEFORE any division so autodiff
    # through theta = 0 / sigma = 0 stays NaN-free.
    sig_safe = jnp.where(near_sig, 1.0, sig)
    theta2_safe = jnp.where(near_th, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)

    # coefficients A, B, C of V = C*I + A*W + B*W^2 (Strasdat's Sim3 exp)
    C = jnp.where(near_sig, 1.0 + 0.5 * sig, (s_ - 1.0) / sig_safe)

    a = s_ * jnp.sin(theta)
    b = s_ * jnp.cos(theta)
    t2s2 = theta2_safe + sig * sig
    safe_t2s2 = jnp.where(t2s2 < _EPS, 1.0, t2s2)

    A_gen = (a * sig + (1.0 - b) * theta) / (theta * safe_t2s2)
    B_gen = (C - ((b - 1.0) * sig + a * theta) / safe_t2s2) / theta2_safe

    # sigma -> 0 limits
    A_sig0 = (1.0 - jnp.cos(theta)) / theta2_safe
    B_sig0 = (theta - jnp.sin(theta)) / (theta2_safe * theta)
    # theta -> 0 limits
    A_th0 = jnp.where(
        near_sig, 0.5 + sig / 3.0,
        ((sig - 1.0) * s_ + 1.0) / (sig_safe * sig_safe),
    )
    B_th0 = jnp.where(
        near_sig, 1.0 / 6.0 + sig / 8.0,
        (s_ * (0.5 * sig * sig - sig + 1.0) - 1.0)
        / (sig_safe * sig_safe * sig_safe),
    )

    A = jnp.where(near_th, A_th0, jnp.where(near_sig, A_sig0, A_gen))
    B = jnp.where(near_th, B_th0, jnp.where(near_sig, B_sig0, B_gen))

    V = C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2
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
    xi_ws = jnp.concatenate([jnp.zeros_like(w), w, sigma[..., None]], -1)
    # Rebuild V by calling exp with rho = e_i basis — or directly recompute
    # the same A,B,C coefficients; easiest is to reuse exp's V via linearity:
    e = jnp.eye(3, dtype=R.dtype)
    cols = []
    for i in range(3):
        rho_i = jnp.broadcast_to(e[i], w.shape)
        _, t_i, _ = exp(jnp.concatenate([rho_i, w, sigma[..., None]], -1))
        cols.append(t_i)
    V = jnp.stack(cols, -1)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    del xi_ws
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
