"""Horn 1987 closed-form absolute orientation (batched).

The quaternion-eigenvector method used by Sim3Solver::ComputeSim3
(ref: src/Sim3Solver.cc:226-337) and by EPnP's final R,t estimation
(ref: src/PnPsolver.cc:569-613, which uses the SVD variant).  Batched over
leading dims; weights allow masked/padded point sets.
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam2_tpu.geometry import se3


def horn_align(
    p1: jnp.ndarray, p2: jnp.ndarray, w: jnp.ndarray, with_scale: bool
):
    """Find (R, t, s) minimizing sum w_i || p2_i - (s R p1_i + t) ||^2.

    p1, p2: (..., N, 3); w: (..., N) nonnegative weights.
    Returns R (...,3,3), t (...,3), s (...).  With with_scale=False s = 1.
    Scale uses the reference's asymmetric formula s = <pr2, R pr1>/|R pr1|^2
    (ref: src/Sim3Solver.cc:292-309).
    """
    wn = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)
    c1 = jnp.sum(p1 * wn[..., None], -2)
    c2 = jnp.sum(p2 * wn[..., None], -2)
    q1 = (p1 - c1[..., None, :]) * w[..., None]
    q2 = p2 - c2[..., None, :]

    # M = sum w q1 q2^T  (correlation; with the N-matrix below the max-
    # eigenvalue quaternion gives R such that p2 ~ s R p1 + t)
    M = jnp.einsum("...ni,...nj->...ij", q1, q2)

    # N matrix (4x4 symmetric), eigenvector of max eigenvalue = quaternion
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]

    N11 = Sxx + Syy + Szz
    N12 = Syz - Szy
    N13 = Szx - Sxz
    N14 = Sxy - Syx
    N22 = Sxx - Syy - Szz
    N23 = Sxy + Syx
    N24 = Szx + Sxz
    N33 = -Sxx + Syy - Szz
    N34 = Syz + Szy
    N44 = -Sxx - Syy + Szz

    Nm = jnp.stack(
        [
            jnp.stack([N11, N12, N13, N14], -1),
            jnp.stack([N12, N22, N23, N24], -1),
            jnp.stack([N13, N23, N33, N34], -1),
            jnp.stack([N14, N24, N34, N44], -1),
        ],
        -2,
    )
    evals, evecs = jnp.linalg.eigh(Nm)
    q = evecs[..., :, -1]                      # max eigenvalue eigenvector
    # q = (w, x, y, z) in Horn's convention -> (x, y, z, w)
    quat = jnp.stack([q[..., 1], q[..., 2], q[..., 3], q[..., 0]], -1)
    R = se3.rotation_from_quat(
        quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    )

    if with_scale:
        rp1 = jnp.einsum("...ij,...nj->...ni", R, p1 - c1[..., None, :])
        num = jnp.sum(q2 * rp1 * w[..., None], (-1, -2))
        den = jnp.sum(rp1 * rp1 * w[..., None], (-1, -2))
        s = num / jnp.maximum(den, 1e-12)
    else:
        s = jnp.ones(R.shape[:-2], R.dtype)

    t = c2 - s[..., None] * jnp.einsum("...ij,...j->...i", R, c1)
    return R, t, s
