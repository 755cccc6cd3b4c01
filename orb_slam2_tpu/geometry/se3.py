"""SE(3) Lie-group operations in JAX.

Functional equivalents of the semantics the reference gets from
g2o::SE3Quat (ref: Thirdparty/g2o/g2o/types/se3quat.h) — exponential /
logarithm maps, composition, inversion — written batch-first so they vmap
and jit cleanly.  Poses are (4,4) row-major world-to-camera matrices Tcw,
the reference's convention throughout (ref: include/Frame.h mTcw).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (...,3) -> (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation.

    All small-angle branches use the double-where pattern (substitute a
    safe denominator BEFORE dividing) so autodiff through theta = 0 stays
    NaN-free — required by the pose-graph Jacobians.
    """
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    near = theta2 < _EPS
    theta2_safe = jnp.where(near, 1.0, theta2)
    theta = jnp.sqrt(jnp.where(near, 1.0, theta2))
    W = hat(w)
    W2 = W @ W
    a = jnp.where(near, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(near, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) rotation -> (...,3) axis-angle.

    theta via atan2 (differentiable at identity, unlike arccos) and the
    double-where pattern on the sin division.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_skew = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    skew2 = jnp.sum(w_skew * w_skew, -1)
    sin_t = 0.5 * jnp.sqrt(skew2 + _EPS * _EPS)
    theta = jnp.arctan2(sin_t, cos_t)
    small = sin_t < 1e-5
    sin_safe = jnp.where(small, 1.0, sin_t)
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * sin_safe),
    )
    w = scale[..., None] * w_skew
    # near theta = pi the skew part vanishes; recover axis from diagonal
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis2 = jnp.clip((diag + 1.0) * 0.5, 0.0, 1.0)
    axis = jnp.sqrt(axis2)
    signs = jnp.stack(
        [
            jnp.ones_like(theta),
            jnp.where(R[..., 0, 1] + R[..., 1, 0] >= 0, 1.0, -1.0),
            jnp.where(R[..., 0, 2] + R[..., 2, 0] >= 0, 1.0, -1.0),
        ],
        -1,
    )
    w_pi = theta[..., None] * axis * signs
    return jnp.where(near_pi[..., None], w_pi, w)


def _left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J(w): (...,3) -> (...,3,3).  NaN-safe autodiff."""
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    near = theta2 < _EPS
    theta2_safe = jnp.where(near, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    W = hat(w)
    W2 = W @ W
    b = jnp.where(near, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(near, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2_safe * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b * W + c * W2


def _left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    near = theta2 < _EPS
    theta2_safe = jnp.where(near, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    W = hat(w)
    W2 = W @ W
    half_t = 0.5 * theta
    cot = jnp.cos(half_t) / jnp.maximum(jnp.sin(half_t), _EPS)
    k = jnp.where(near, 1.0 / 12.0 + theta2 / 720.0,
                  (1.0 - half_t * cot) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + k * W2


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp: (...,6) [rho, w] (translation first) -> (...,4,4).

    Matches g2o's SE3Quat::exp convention used by VertexSE3Expmap updates
    (ref: types_six_dof_expmap.h oplusImpl: update is [omega, upsilon] —
    we standardize on [upsilon, omega] = [t, r] ordering internally).
    """
    rho, w = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(w), rho)
    return make_T(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """(...,4,4) -> (...,6) [rho, w]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = log_so3(R)
    rho = jnp.einsum("...ij,...j->...i", _left_jacobian_inv(w), t)
    return jnp.concatenate([rho, w], -1)


def make_T(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (...,4,4) from (...,3,3) and (...,3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], -2)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse (no linear solve)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_T(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def transform(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (...,4,4) to points (...,3)."""
    return (
        jnp.einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]
    )


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def camera_center(Tcw: jnp.ndarray) -> jnp.ndarray:
    """Ow = -Rcw^T tcw (ref: KeyFrame::GetCameraCenter semantics)."""
    R, t = Tcw[..., :3, :3], Tcw[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)


def normalize_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation onto SO(3) via SVD (drift cleanup)."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None],
         det[..., None]], -1,
    )
    return (u * fix[..., None, :]) @ vt


def quat_from_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> unit quaternion (x,y,z,w), TUM trajectory order.

    Branch-free Shepperd's method via jnp.where — jit/vmap safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # four candidate constructions; pick the numerically largest pivot
    qw0 = safe_sqrt(1.0 + tr) * 0.5
    c0 = jnp.stack(
        [(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
         (m10 - m01) / (4 * qw0), qw0], -1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) * 0.5
    c1 = jnp.stack(
        [qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1),
         (m21 - m12) / (4 * qx1)], -1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) * 0.5
    c2 = jnp.stack(
        [(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2),
         (m02 - m20) / (4 * qy2)], -1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) * 0.5
    c3 = jnp.stack(
        [(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3,
         (m10 - m01) / (4 * qz3)], -1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None], c0,
        jnp.where(cond1[..., None], c1, jnp.where(cond2[..., None], c2, c3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotation_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (x,y,z,w) -> (...,3,3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                       2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                       2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                       1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )
