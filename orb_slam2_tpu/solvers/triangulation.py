"""Batched DLT triangulation + the reference's new-point validity gates.

TPU-native equivalent of the SVD triangulation in
LocalMapping::CreateNewMapPoints (ref: src/LocalMapping.cc:322-331) and
Initializer::Triangulate (ref: src/Initializer.cc:734-754), vectorized over
all candidate pairs at once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray
) -> jnp.ndarray:
    """DLT triangulation.

    P1, P2: (..., 3, 4) projection matrices.
    xy1, xy2: (..., N, 2) pixel (or normalized) coords in each view.
    Returns (..., N, 3) world points (NaN-free; w==0 gives large values).
    """
    x1, y1 = xy1[..., 0], xy1[..., 1]
    x2, y2 = xy2[..., 0], xy2[..., 1]

    def row(coef, P, r):
        # coef * P[2] - P[r], broadcast over points
        return coef[..., None] * P[..., 2:3, :] - P[..., r : r + 1, :]

    P1b = P1[..., None, :, :]
    P2b = P2[..., None, :, :]
    A = jnp.concatenate(
        [
            x1[..., None] * P1b[..., 2, :] - P1b[..., 0, :],
            y1[..., None] * P1b[..., 2, :] - P1b[..., 1, :],
            x2[..., None] * P2b[..., 2, :] - P2b[..., 0, :],
            y2[..., None] * P2b[..., 2, :] - P2b[..., 1, :],
        ],
        -1,
    ).reshape(xy1.shape[:-1] + (4, 4))
    del row
    # Inhomogeneous DLT: fix the homogeneous scale w=1 and solve the
    # 4x3 least-squares A[:, :3] X = -A[:, 3] via 3x3 normal equations.
    # Equivalent to the reference's SVD null-vector for finite points
    # (points at infinity blow up and are rejected by the depth/parallax
    # gates downstream), and ~30x faster on TPU: batched tiny SVDs lower
    # to sequential QR-iteration loops, while batched 3x3 solves are one
    # fused LU over the whole batch.
    M = A[..., :, :3]                                  # (..., 4, 3)
    b = -A[..., :, 3]                                  # (..., 4)
    MtM = jnp.einsum("...ki,...kj->...ij", M, M)       # (..., 3, 3)
    Mtb = jnp.einsum("...ki,...k->...i", M, b)
    # tiny diagonal ridge keeps degenerate (parallel-ray) systems finite;
    # their solutions fail the reprojection gates anyway
    tr = jnp.trace(MtM, axis1=-2, axis2=-1)[..., None, None]
    ridge = 1e-9 * jnp.maximum(tr, 1e-12) * jnp.eye(3, dtype=A.dtype)
    return jnp.linalg.solve(MtM + ridge, Mtb[..., None])[..., 0]


class NewPoints(NamedTuple):
    pts_w: jnp.ndarray     # (N, 3) world points
    good: jnp.ndarray      # (N,) bool — passed all gates


@functools.partial(jax.jit, static_argnames=())
def triangulate_and_gate(
    T1w: jnp.ndarray, T2w: jnp.ndarray,
    xy1: jnp.ndarray, xy2: jnp.ndarray,          # (N, 2) matched pairs
    ur1: jnp.ndarray, ur2: jnp.ndarray,          # (N,) right-u; <0 mono
    depth1: jnp.ndarray, depth2: jnp.ndarray,    # (N,) stereo depth; <0 none
    octave1: jnp.ndarray, octave2: jnp.ndarray,  # (N,)
    mask: jnp.ndarray,                           # (N,) candidate valid
    fx, fy, cx, cy, bf,
    scale_factors: jnp.ndarray,
    level_sigma2: jnp.ndarray,
) -> NewPoints:
    """Triangulate matched keypoint pairs between two keyframes and apply
    the reference's acceptance gates (ref: src/LocalMapping.cc:288-431):
    parallax-based DLT-vs-stereo-unprojection choice, positive depth in
    both views, per-view chi2 reprojection bounds (5.991 mono / 7.8
    stereo), and scale-consistency of the distance ratio."""
    R1, t1 = T1w[:3, :3], T1w[:3, 3]
    R2, t2 = T2w[:3, :3], T2w[:3, 3]
    O1 = -R1.T @ t1
    O2 = -R2.T @ t2
    baseline = jnp.linalg.norm(O2 - O1)

    # normalized rays in world frame
    xn1 = jnp.stack(
        [(xy1[:, 0] - cx) / fx, (xy1[:, 1] - cy) / fy,
         jnp.ones_like(xy1[:, 0])], -1)
    xn2 = jnp.stack(
        [(xy2[:, 0] - cx) / fx, (xy2[:, 1] - cy) / fy,
         jnp.ones_like(xy2[:, 0])], -1)
    ray1 = xn1 @ R1                      # R1^T @ xn1 rowwise
    ray2 = xn2 @ R2
    cos_rays = jnp.sum(ray1 * ray2, -1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1),
        1e-12,
    )

    has_s1 = depth1 > 0
    has_s2 = depth2 > 0
    cos_s1 = jnp.where(
        has_s1, jnp.cos(2.0 * jnp.arctan2(baseline / 2.0,
                                          jnp.maximum(depth1, 1e-9))), 2.0)
    cos_s2 = jnp.where(
        has_s2, jnp.cos(2.0 * jnp.arctan2(baseline / 2.0,
                                          jnp.maximum(depth2, 1e-9))), 2.0)
    cos_stereo = jnp.minimum(cos_s1, cos_s2)

    use_dlt = (
        (cos_rays < cos_stereo) & (cos_rays > 0)
        & (has_s1 | has_s2 | (cos_rays < 0.9998))
    )
    use_s1 = ~use_dlt & has_s1 & (cos_s1 < cos_s2)
    use_s2 = ~use_dlt & ~use_s1 & has_s2

    # DLT triangulation with projective P = K [R|t]
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]],
                  xy1.dtype)
    P1 = K @ T1w[:3, :]
    P2 = K @ T2w[:3, :]
    pts_dlt = triangulate_dlt(P1, P2, xy1, xy2)

    # stereo unprojection fallbacks
    z1 = jnp.maximum(depth1, 1e-9)
    pc1 = jnp.stack(
        [(xy1[:, 0] - cx) / fx * z1, (xy1[:, 1] - cy) / fy * z1, z1], -1)
    pw_s1 = (pc1 - t1) @ R1              # R1^T (pc - t)
    z2 = jnp.maximum(depth2, 1e-9)
    pc2s = jnp.stack(
        [(xy2[:, 0] - cx) / fx * z2, (xy2[:, 1] - cy) / fy * z2, z2], -1)
    pw_s2 = (pc2s - t2) @ R2

    pts = jnp.where(use_s1[:, None], pw_s1,
                    jnp.where(use_s2[:, None], pw_s2, pts_dlt))

    # gates
    pc1_all = pts @ R1.T + t1
    pc2_all = pts @ R2.T + t2
    z1a, z2a = pc1_all[:, 2], pc2_all[:, 2]
    pos = (z1a > 0) & (z2a > 0)

    s2_1 = level_sigma2[octave1]
    s2_2 = level_sigma2[octave2]

    def reproj_err(pc, xy, ur, s2):
        zs = jnp.maximum(pc[:, 2], 1e-9)
        u = fx * pc[:, 0] / zs + cx
        v = fy * pc[:, 1] / zs + cy
        e_mono = ((u - xy[:, 0]) ** 2 + (v - xy[:, 1]) ** 2) / s2
        urp = u - bf / zs
        e_st = e_mono + (urp - ur) ** 2 / s2
        return e_mono, e_st

    e1m, e1s = reproj_err(pc1_all, xy1, ur1, s2_1)
    e2m, e2s = reproj_err(pc2_all, xy2, ur2, s2_2)
    chi_ok1 = jnp.where(has_s1, e1s <= 7.8, e1m <= 5.991)
    chi_ok2 = jnp.where(has_s2, e2s <= 7.8, e2m <= 5.991)

    d1 = jnp.linalg.norm(pts - O1, axis=-1)
    d2 = jnp.linalg.norm(pts - O2, axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-12)
    ratio_oct = scale_factors[octave1] / scale_factors[octave2]
    scale_ok = (
        (ratio_dist * 1.5 > ratio_oct) & (ratio_dist < ratio_oct * 1.5)
        & (d1 > 1e-9) & (d2 > 1e-9)
    )

    good = mask & (use_dlt | use_s1 | use_s2) & pos \
        & chi_ok1 & chi_ok2 & scale_ok
    return NewPoints(pts, good)


def fundamental_from_poses(T1w, T2w, K1, K2):
    """F12 = K1^-T [t12]x R12 K2^-1 (ref: LocalMapping::ComputeF12
    src/LocalMapping.cc:536-554)."""
    R1, t1 = T1w[:3, :3], T1w[:3, 3]
    R2, t2 = T2w[:3, :3], T2w[:3, 3]
    R12 = R1 @ R2.T
    t12 = -R12 @ t2 + t1
    tx = jnp.array(
        [[0.0, -t12[2], t12[1]],
         [t12[2], 0.0, -t12[0]],
         [-t12[1], t12[0], 0.0]], T1w.dtype)
    return jnp.linalg.inv(K1).T @ tx @ R12 @ jnp.linalg.inv(K2)


def _triangulate_core(
    T1w,
    xy1, ur1, depth1, octave1, desc1, node1, angle1, free1,   # (N,...)
    T2w_b,                     # (B,4,4) neighbor poses
    xy2_b, ur2_b, depth2_b, octave2_b, desc2_b, node2_b, angle2_b,
    free2_b,                   # (B,N,...)
    nb_mask,                   # (B,) bool valid neighbors
    fx, fy, cx, cy, bf,
    scale_factors, level_sigma2,
):
    """CreateNewMapPoints over ALL covisible neighbors in one program:
    per neighbor, compute F12 + epipole on device, run the epipolar
    search, triangulate and gate.  Returns a packed f32 buffer
    [idx (B*N), ok (B*N), pts (B*N*3)]."""
    from orb_slam2_tpu.ops import matching

    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]],
                  xy1.dtype)
    R1, t1 = T1w[:3, :3], T1w[:3, 3]
    O1 = -R1.T @ t1

    def one(T2w, xy2, ur2, depth2, octave2, desc2, node2, angle2, free2,
            ok_nb):
        F12 = fundamental_from_poses(T1w, T2w, K, K)
        pc = T2w[:3, :3] @ O1 + T2w[:3, 3]
        z = jnp.maximum(pc[2], 1e-9)
        epipole = jnp.stack([fx * pc[0] / z + cx, fy * pc[1] / z + cy])
        m = matching.search_for_triangulation.__wrapped__(
            xy1, ur1, octave1, desc1, node1, angle1, free1 & ok_nb,
            xy2, ur2, octave2, desc2, node2, angle2, free2,
            F12, epipole, scale_factors, level_sigma2,
        )
        res = triangulate_and_gate.__wrapped__(
            T1w, T2w, xy1, xy2[m.idx], ur1, ur2[m.idx],
            depth1, depth2[m.idx], octave1, octave2[m.idx],
            m.ok, fx, fy, cx, cy, bf, scale_factors, level_sigma2,
        )
        return m.idx, res.good & ok_nb, res.pts_w

    idx, good, pts = jax.vmap(one)(
        T2w_b, xy2_b, ur2_b, depth2_b, octave2_b, desc2_b, node2_b,
        angle2_b, free2_b, nb_mask,
    )
    return jnp.concatenate([
        idx.astype(jnp.float32).reshape(-1),
        good.astype(jnp.float32).reshape(-1),
        pts.reshape(-1),
    ])


@functools.partial(jax.jit, static_argnames=())
def triangulate_batch(
    T1w,                       # (4,4) current keyframe pose
    xy1, ur1, depth1, octave1, desc1, node1, angle1, free1,   # (N,...)
    T2w_b,                     # (B,4,4) neighbor poses
    xy2_b, ur2_b, depth2_b, octave2_b, desc2_b, node2_b, angle2_b,
    free2_b,                   # (B,N,...)
    nb_mask,                   # (B,) bool valid neighbors
    fx, fy, cx, cy, bf,
    scale_factors, level_sigma2,
):
    """Stacked-array entry point (legacy / mirror-overflow path)."""
    return _triangulate_core(
        T1w, xy1, ur1, depth1, octave1, desc1, node1, angle1, free1,
        T2w_b, xy2_b, ur2_b, depth2_b, octave2_b, desc2_b, node2_b,
        angle2_b, free2_b, nb_mask, fx, fy, cx, cy, bf,
        scale_factors, level_sigma2,
    )


@functools.partial(jax.jit, static_argnames=())
def triangulate_gather(
    T1w, T2w_b,                # (4,4) current pose, (B,4,4) neighbors
    kf1, ids_b,                # scalar i32 + (B,) i32 mirror row ids
    node1,                     # (N,) i32 current-KF BoW nodes — passed
                               # explicitly so the mapper can chain the
                               # vocabulary descend's device output in
                               # without a host sync (the mirror row may
                               # hold stale/unassigned nodes at dispatch)
    mir_f32, mir_i32, mir_desc,   # kf_mirror.KfFeatureMirror fields
    free1, free2_b,            # (N,), (B,N) host masks (obs-dependent)
    nb_mask,                   # (B,)
    fx, fy, cx, cy, bf,
    scale_factors, level_sigma2,
):
    """Mirror entry point: gathers the per-keyframe feature blocks from
    the device-resident mirror inside the program — the host uploads only
    poses, index vectors, and the free-slot masks (one dispatch instead
    of ~20 eager stack/upload ops, see slam/kf_mirror.py)."""
    f1 = mir_f32[kf1]
    f2 = mir_f32[ids_b]
    i2 = mir_i32[ids_b]
    return _triangulate_core(
        T1w,
        f1[:, 0:2], f1[:, 2], f1[:, 3], mir_i32[kf1][:, 0], mir_desc[kf1],
        node1, f1[:, 4], free1,
        T2w_b,
        f2[..., 0:2], f2[..., 2], f2[..., 3], i2[..., 0], mir_desc[ids_b],
        i2[..., 1], f2[..., 4], free2_b, nb_mask,
        fx, fy, cx, cy, bf, scale_factors, level_sigma2,
    )


def unpack_triangulate_batch(packed, B, N):
    import numpy as np

    buf = np.asarray(packed)
    idx = buf[: B * N].reshape(B, N).astype(np.int32)
    good = buf[B * N: 2 * B * N].reshape(B, N) > 0.5
    pts = buf[2 * B * N:].reshape(B, N, 3)
    return idx, good, pts
