"""Batched descriptor matching: every ORBmatcher mode as one fused op.

TPU-native replacement for ORBmatcher (ref: src/ORBmatcher.cc, 1665 LoC,
9 public entry points listed in include/ORBmatcher.h:44-83).  The
reference walks per-keypoint grid cells; here every mode is a masked
(Q, T) packed-Hamming distance matrix (XLA popcount + matmul-shaped
reductions) with window / octave / epipolar compatibility masks, a
row-wise (best, second) reduction, the reference's ratio test, and the
rotation-histogram consistency filter.  Duplicate assignments (several
queries claiming one target feature) are resolved by a scatter-min,
which strictly dominates the reference's last-writer-wins overwrite.

All functions take fixed-shape padded tensors + validity masks and are
jit-safe (no data-dependent shapes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.ops import hamming

TH_LOW = hamming.TH_LOW     # 50,  ref: src/ORBmatcher.cc:38
TH_HIGH = hamming.TH_HIGH   # 100, ref: src/ORBmatcher.cc:37


class Matches(NamedTuple):
    """Query-side match result (fixed shape Q)."""

    idx: jnp.ndarray     # (Q,) int32 target feature index (valid iff ok)
    dist: jnp.ndarray    # (Q,) int32 Hamming distance
    ok: jnp.ndarray      # (Q,) bool


def resolve_duplicates(idx: jnp.ndarray, dist: jnp.ndarray, ok: jnp.ndarray,
                       n_targets: int) -> jnp.ndarray:
    """Keep, per target feature, only the lowest-distance claiming query.

    Returns the filtered `ok` mask.  Ties break by query index
    (deterministic).  Replaces the reference's overwrite semantics when
    several map points select the same keypoint.
    """
    q = idx.shape[0]
    big = jnp.int32(2147483647)
    key = dist.astype(jnp.int32) * q + jnp.arange(q, dtype=jnp.int32)
    key = jnp.where(ok, key, big)
    best_key = jnp.full((n_targets,), big, jnp.int32).at[idx].min(key)
    return ok & (best_key[idx] == key)


def _best_two(dist, compat):
    """Row-wise (best_idx, best, second_best) over a masked distance matrix."""
    d = jnp.where(compat, dist, hamming.MAX_DIST)
    best_idx = jnp.argmin(d, 1).astype(jnp.int32)
    best = jnp.min(d, 1)
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(hamming.MAX_DIST)
    second = jnp.min(d2, 1)
    return best_idx, best, second


# ---------------------------------------------------------------------------
# Frustum projection of map points into a frame (device part of
# Tracking::SearchLocalPoints / Frame::isInFrustum, ref: src/Frame.cc:269-325)
# ---------------------------------------------------------------------------

class Projection(NamedTuple):
    uv: jnp.ndarray          # (M, 2) projected pixel coords
    ur: jnp.ndarray          # (M,) right-view u (valid only for stereo)
    depth: jnp.ndarray       # (M,) camera-frame z
    dist: jnp.ndarray        # (M,) distance to camera center
    view_cos: jnp.ndarray    # (M,) cos(angle to mean viewing ray)
    level: jnp.ndarray       # (M,) int32 predicted octave
    in_frustum: jnp.ndarray  # (M,) bool


@functools.partial(jax.jit, static_argnames=("n_levels",))
def project_points(
    pts_w: jnp.ndarray, normals: jnp.ndarray,
    min_dist: jnp.ndarray, max_dist: jnp.ndarray,
    mask: jnp.ndarray,
    Tcw: jnp.ndarray,
    fx, fy, cx, cy, bf,
    bounds: jnp.ndarray,          # [minX, maxX, minY, maxY]
    log_scale_factor: float,
    n_levels: int,
    view_cos_limit: float = 0.5,
) -> Projection:
    """Batched Frame::isInFrustum (ref: src/Frame.cc:269-325).

    Checks positive depth, image bounds, the scale-invariance distance
    band [0.8*minDist, 1.2*maxDist], and viewing angle < 60deg; predicts
    the octave as ceil(log(maxDist/dist)/logScaleFactor)
    (ref: MapPoint::PredictScale src/MapPoint.cc:385-400).
    """
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = pts_w @ R.T + t
    z = pc[:, 2]
    z_safe = jnp.maximum(z, 1e-6)
    u = fx * pc[:, 0] / z_safe + cx
    v = fy * pc[:, 1] / z_safe + cy
    ur = u - bf / z_safe

    Ow = -R.T @ t
    po = pts_w - Ow
    dist = jnp.linalg.norm(po, axis=1)
    dist_safe = jnp.maximum(dist, 1e-9)
    view_cos = jnp.sum(po * normals, 1) / dist_safe

    ratio = jnp.maximum(max_dist, 1e-9) / dist_safe
    level = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale_factor)
    level = jnp.clip(level, 0, n_levels - 1).astype(jnp.int32)

    ok = (
        mask
        & (z > 0)
        & (u >= bounds[0]) & (u < bounds[1])
        & (v >= bounds[2]) & (v < bounds[3])
        & (dist >= 0.8 * min_dist) & (dist <= 1.2 * max_dist)
        & (view_cos > view_cos_limit)
    )
    return Projection(jnp.stack([u, v], -1), ur, z, dist, view_cos, level, ok)


# ---------------------------------------------------------------------------
# SearchByProjection — track local map (ref: src/ORBmatcher.cc:45-129)
# ---------------------------------------------------------------------------

@jax.jit
def search_local_points(
    proj: Projection,
    pt_desc: jnp.ndarray,        # (M, 8) representative descriptors
    feat_xy: jnp.ndarray,        # (N, 2)
    feat_ur: jnp.ndarray,        # (N,) right u, <0 for mono features
    feat_octave: jnp.ndarray,    # (N,)
    feat_desc: jnp.ndarray,      # (N, 8)
    feat_free: jnp.ndarray,      # (N,) bool: not already bound to a point
    scale_factors: jnp.ndarray,  # (L,)
    th: float,
    ratio: float = 0.8,
) -> Matches:
    """Match frustum-visible map points to free frame keypoints.

    Window radius is 2.5 px when viewCos > 0.998 else 4.0, times `th`,
    times the predicted-level scale factor (ref :84-90); candidate octaves
    are [pred-1, pred]; the 0.8 ratio test applies only when best and
    second-best live in the same octave (ref :117-120); accept at
    dist <= TH_HIGH.
    """
    r0 = jnp.where(proj.view_cos > 0.998, 2.5, 4.0)
    radius = r0 * th * scale_factors[proj.level]            # (M,)

    du = jnp.abs(proj.uv[:, 0:1] - feat_xy[None, :, 0])
    dv = jnp.abs(proj.uv[:, 1:2] - feat_xy[None, :, 1])
    window = (du < radius[:, None]) & (dv < radius[:, None])

    oct_ok = (
        (feat_octave[None, :] >= proj.level[:, None] - 1)
        & (feat_octave[None, :] <= proj.level[:, None])
    )
    # stereo right-coordinate gate (ref :91-96)
    has_r = feat_ur[None, :] >= 0
    er = jnp.abs(proj.ur[:, None] - feat_ur[None, :])
    r_ok = ~has_r | (er < radius[:, None])

    compat = (
        window & oct_ok & r_ok
        & proj.in_frustum[:, None] & feat_free[None, :]
    )
    dist = hamming.distance_matrix(pt_desc, feat_desc)
    best_idx, best, second = _best_two(dist, compat)

    lvl_best = feat_octave[best_idx]
    d2 = jnp.where(compat, dist, hamming.MAX_DIST)
    d2 = d2.at[jnp.arange(d2.shape[0]), best_idx].set(hamming.MAX_DIST)
    second_idx = jnp.argmin(d2, 1)
    same_level = lvl_best == feat_octave[second_idx]
    ratio_ok = ~same_level | (best.astype(jnp.float32)
                              <= ratio * second.astype(jnp.float32))

    ok = proj.in_frustum & (best <= TH_HIGH) & ratio_ok
    ok = ok & resolve_duplicates(best_idx, best, ok, feat_xy.shape[0])
    return Matches(best_idx, best, ok)


# ---------------------------------------------------------------------------
# SearchByProjection — motion model (ref: src/ORBmatcher.cc:1328-1470)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("forward", "backward", "check_rotation"))
def search_last_frame(
    last_pts_w: jnp.ndarray,     # (N, 3) world points bound to last frame
    last_has_pt: jnp.ndarray,    # (N,) bool
    last_octave: jnp.ndarray,    # (N,)
    last_desc: jnp.ndarray,      # (N, 8) point descriptors
    last_angle: jnp.ndarray,     # (N,) keypoint angles (deg)
    Tcw: jnp.ndarray,
    feat_xy: jnp.ndarray, feat_ur: jnp.ndarray, feat_octave: jnp.ndarray,
    feat_desc: jnp.ndarray, feat_angle: jnp.ndarray, feat_valid: jnp.ndarray,
    fx, fy, cx, cy, bf,
    bounds: jnp.ndarray,
    scale_factors: jnp.ndarray,
    th: float,
    forward: bool = False,
    backward: bool = False,
    check_rotation: bool = True,
) -> Matches:
    """Project last frame's map points into the current frame and match.

    Octave gating follows the reference's forward/backward motion logic
    (ref :1381-1401): forward -> octave >= last octave; backward ->
    octave <= last; else +/-1 band.  Stereo gate |ur - ur_pred| < r.
    Accept at TH_HIGH, then rotation-histogram filter.
    """
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = last_pts_w @ R.T + t
    z = pc[:, 2]
    z_safe = jnp.maximum(z, 1e-6)
    u = fx * pc[:, 0] / z_safe + cx
    v = fy * pc[:, 1] / z_safe + cy
    ur = u - bf / z_safe

    vis = (
        last_has_pt & (z > 0)
        & (u >= bounds[0]) & (u < bounds[1])
        & (v >= bounds[2]) & (v < bounds[3])
    )
    radius = th * scale_factors[last_octave]                 # (N,)

    du = jnp.abs(u[:, None] - feat_xy[None, :, 0])
    dv = jnp.abs(v[:, None] - feat_xy[None, :, 1])
    window = (du < radius[:, None]) & (dv < radius[:, None])

    lo = last_octave[:, None]
    fo = feat_octave[None, :]
    if forward:
        oct_ok = fo >= lo
    elif backward:
        oct_ok = fo <= lo
    else:
        oct_ok = (fo >= lo - 1) & (fo <= lo + 1)

    has_r = feat_ur[None, :] >= 0
    r_ok = ~has_r | (jnp.abs(ur[:, None] - feat_ur[None, :])
                     < radius[:, None])

    compat = window & oct_ok & r_ok & vis[:, None] & feat_valid[None, :]
    dist = hamming.distance_matrix(last_desc, feat_desc)
    best_idx, best, _ = _best_two(dist, compat)
    ok = vis & (best <= TH_HIGH)

    if check_rotation:
        ok = hamming.rotation_histogram_filter(
            last_angle, feat_angle[best_idx], ok
        )
    ok = ok & resolve_duplicates(best_idx, best, ok, feat_xy.shape[0])
    return Matches(best_idx, best, ok)


# ---------------------------------------------------------------------------
# SearchByProjection — relocalization (ref: src/ORBmatcher.cc:1472-1599)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_levels", "check_rotation"))
def search_reloc_points(
    pts_w: jnp.ndarray,          # (M, 3) keyframe map points
    pt_mask: jnp.ndarray,        # (M,) valid & not already found
    pt_desc: jnp.ndarray,
    pt_min_dist: jnp.ndarray, pt_max_dist: jnp.ndarray,
    kf_angle: jnp.ndarray,       # (M,) angle of the point's KF keypoint
    Tcw: jnp.ndarray,
    feat_xy: jnp.ndarray, feat_octave: jnp.ndarray,
    feat_desc: jnp.ndarray, feat_angle: jnp.ndarray, feat_free: jnp.ndarray,
    fx, fy, cx, cy,
    bounds: jnp.ndarray,
    scale_factors: jnp.ndarray,
    log_scale_factor: float,
    n_levels: int,
    th: float,
    orb_dist: int = 100,
    check_rotation: bool = True,
) -> Matches:
    """Guided reprojection for relocalization: project the candidate KF's
    points with the hypothesised pose, search a th-scaled window at the
    predicted octave +/-1, accept at `orb_dist` (ref :1472-1599)."""
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = pts_w @ R.T + t
    z = pc[:, 2]
    z_safe = jnp.maximum(z, 1e-6)
    u = fx * pc[:, 0] / z_safe + cx
    v = fy * pc[:, 1] / z_safe + cy

    Ow = -R.T @ t
    dist3d = jnp.linalg.norm(pts_w - Ow, axis=1)
    ratio = jnp.maximum(pt_max_dist, 1e-9) / jnp.maximum(dist3d, 1e-9)
    level = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale_factor)
    level = jnp.clip(level, 0, n_levels - 1).astype(jnp.int32)

    vis = (
        pt_mask & (z > 0)
        & (u >= bounds[0]) & (u < bounds[1])
        & (v >= bounds[2]) & (v < bounds[3])
        & (dist3d >= 0.8 * pt_min_dist) & (dist3d <= 1.2 * pt_max_dist)
    )
    radius = th * scale_factors[level]

    du = jnp.abs(u[:, None] - feat_xy[None, :, 0])
    dv = jnp.abs(v[:, None] - feat_xy[None, :, 1])
    window = (du < radius[:, None]) & (dv < radius[:, None])
    oct_ok = (
        (feat_octave[None, :] >= level[:, None] - 1)
        & (feat_octave[None, :] <= level[:, None] + 1)
    )
    compat = window & oct_ok & vis[:, None] & feat_free[None, :]
    dist = hamming.distance_matrix(pt_desc, feat_desc)
    best_idx, best, _ = _best_two(dist, compat)
    ok = vis & (best <= orb_dist)
    if check_rotation:
        ok = hamming.rotation_histogram_filter(
            kf_angle, feat_angle[best_idx], ok
        )
    ok = ok & resolve_duplicates(best_idx, best, ok, feat_xy.shape[0])
    return Matches(best_idx, best, ok)


# ---------------------------------------------------------------------------
# SearchByBoW (ref: src/ORBmatcher.cc:159-288 and :522-655)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("check_rotation",))
def search_by_nodes(
    desc_q: jnp.ndarray, node_q: jnp.ndarray, valid_q: jnp.ndarray,
    angle_q: jnp.ndarray,
    desc_t: jnp.ndarray, node_t: jnp.ndarray, valid_t: jnp.ndarray,
    angle_t: jnp.ndarray,
    ratio: float = 0.7,
    check_rotation: bool = True,
) -> Matches:
    """Vocabulary-node-aligned brute force: candidates share the same BoW
    node id (the FeatureVector alignment of the reference); TH_LOW accept,
    mNNratio test, rotation histogram.  With node ids all zero this
    degrades gracefully to full brute-force matching."""
    compat = (
        (node_q[:, None] == node_t[None, :])
        & valid_q[:, None] & valid_t[None, :]
    )
    dist = hamming.distance_matrix(desc_q, desc_t)
    best_idx, best, second = _best_two(dist, compat)
    ok = (
        valid_q & (best <= TH_LOW)
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    )
    if check_rotation:
        ok = hamming.rotation_histogram_filter(angle_q, angle_t[best_idx], ok)
    ok = ok & resolve_duplicates(best_idx, best, ok, desc_t.shape[0])
    return Matches(best_idx, best, ok)


# ---------------------------------------------------------------------------
# SearchForInitialization (ref: src/ORBmatcher.cc:405-520)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("check_rotation",))
def search_for_initialization(
    xy1: jnp.ndarray, desc1: jnp.ndarray, octave1: jnp.ndarray,
    angle1: jnp.ndarray, valid1: jnp.ndarray,
    xy2: jnp.ndarray, desc2: jnp.ndarray, octave2: jnp.ndarray,
    angle2: jnp.ndarray, valid2: jnp.ndarray,
    window: float = 100.0,
    ratio: float = 0.9,
    check_rotation: bool = True,
) -> Matches:
    """Windowed level-0 matching for the monocular initializer
    (ref :405-520): both keypoints at octave 0, |dxy| < window, TH_LOW,
    ratio, rotation histogram."""
    du = jnp.abs(xy1[:, 0:1] - xy2[None, :, 0])
    dv = jnp.abs(xy1[:, 1:2] - xy2[None, :, 1])
    compat = (
        (du < window) & (dv < window)
        & (octave1[:, None] == 0) & (octave2[None, :] == 0)
        & valid1[:, None] & valid2[None, :]
    )
    dist = hamming.distance_matrix(desc1, desc2)
    best_idx, best, second = _best_two(dist, compat)
    ok = (
        valid1 & (best <= TH_LOW)
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    )
    if check_rotation:
        ok = hamming.rotation_histogram_filter(angle1, angle2[best_idx], ok)
    ok = ok & resolve_duplicates(best_idx, best, ok, xy2.shape[0])
    return Matches(best_idx, best, ok)


# ---------------------------------------------------------------------------
# SearchForTriangulation (ref: src/ORBmatcher.cc:657-823)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("both_stereo_margin", "check_rotation"))
def search_for_triangulation(
    xy1: jnp.ndarray, ur1: jnp.ndarray, octave1: jnp.ndarray,
    desc1: jnp.ndarray, node1: jnp.ndarray, angle1: jnp.ndarray,
    free1: jnp.ndarray,
    xy2: jnp.ndarray, ur2: jnp.ndarray, octave2: jnp.ndarray,
    desc2: jnp.ndarray, node2: jnp.ndarray, angle2: jnp.ndarray,
    free2: jnp.ndarray,
    F12: jnp.ndarray,
    epipole2: jnp.ndarray,       # (2,) epipole of cam1 center in image 2
    scale_factors: jnp.ndarray,
    level_sigma2: jnp.ndarray,
    both_stereo_margin: bool = False,
    check_rotation: bool = True,
) -> Matches:
    """Epipolar-constrained matching of unbound keypoints between two
    keyframes for triangulation: node-aligned candidates, epipolar
    distance < 3.84 * sigma^2 at kp2's octave (ref CheckDistEpipolarLine
    :140-157), epipole proximity reject for mono kps (ref :743-749),
    TH_LOW, rotation histogram."""
    compat = (
        (node1[:, None] == node2[None, :])
        & free1[:, None] & free2[None, :]
    )

    # epipolar line of kp1 in image 2: l = F12^T x1  (a,b,c)
    ones = jnp.ones((xy1.shape[0], 1), xy1.dtype)
    x1h = jnp.concatenate([xy1, ones], 1)                   # (N1, 3)
    lines = x1h @ F12                                       # (N1, 3)
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    num = a * xy2[None, :, 0] + b * xy2[None, :, 1] + c
    den = a * a + b * b
    dsq = num * num / jnp.maximum(den, 1e-12)
    epi_ok = dsq < 3.84 * level_sigma2[octave2][None, :]

    # mono-mono pairs near the epipole are degenerate (ref :743-749)
    both_mono = (ur1[:, None] < 0) & (ur2[None, :] < 0)
    de = xy2 - epipole2[None, :]
    dist_ex = jnp.sum(de * de, 1)                            # (N2,)
    epi_far = dist_ex[None, :] >= 100.0 * scale_factors[octave2][None, :] ** 2
    if both_stereo_margin:
        near_reject = both_mono & ~epi_far
    else:
        near_reject = both_mono & ~epi_far

    compat = compat & epi_ok & ~near_reject
    dist = hamming.distance_matrix(desc1, desc2)
    best_idx, best, _ = _best_two(dist, compat)
    ok = free1 & (best <= TH_LOW)
    if check_rotation:
        ok = hamming.rotation_histogram_filter(angle1, angle2[best_idx], ok)
    ok = ok & resolve_duplicates(best_idx, best, ok, xy2.shape[0])
    return Matches(best_idx, best, ok)


# ---------------------------------------------------------------------------
# Fuse (ref: src/ORBmatcher.cc:825-975) and Sim3 variants
# ---------------------------------------------------------------------------

class FuseMatches(NamedTuple):
    idx: jnp.ndarray    # (M,) best feature index in the target keyframe
    dist: jnp.ndarray   # (M,)
    ok: jnp.ndarray     # (M,)


@functools.partial(jax.jit, static_argnames=("n_levels", "use_stereo_residual"))
def fuse_points(
    pts_w: jnp.ndarray, pt_mask: jnp.ndarray, pt_desc: jnp.ndarray,
    pt_normal: jnp.ndarray, pt_min_dist: jnp.ndarray, pt_max_dist: jnp.ndarray,
    Tcw: jnp.ndarray,
    feat_xy: jnp.ndarray, feat_ur: jnp.ndarray, feat_octave: jnp.ndarray,
    feat_desc: jnp.ndarray, feat_valid: jnp.ndarray,
    fx, fy, cx, cy, bf,
    bounds: jnp.ndarray,
    scale_factors: jnp.ndarray,
    level_sigma2: jnp.ndarray,
    log_scale_factor: float,
    n_levels: int,
    th: float = 3.0,
    use_stereo_residual: bool = True,
    view_cos_limit: float = 0.5,
) -> FuseMatches:
    """Project map points into a keyframe and find the best keypoint within
    a chi2-gated window for fusion (ref Fuse :825-975): frustum + distance
    band + view angle, radius th*sf[pred], octave band [pred-1, pred],
    reprojection chi2 < 5.99 (mono) / 7.8 (stereo) at the feature's octave,
    TH_LOW accept.  The caller decides replace-vs-add-observation."""
    proj = project_points(
        pts_w, pt_normal, pt_min_dist, pt_max_dist, pt_mask, Tcw,
        fx, fy, cx, cy, bf, bounds, log_scale_factor, n_levels,
        view_cos_limit,
    )
    radius = th * scale_factors[proj.level]

    du = proj.uv[:, 0:1] - feat_xy[None, :, 0]
    dv = proj.uv[:, 1:2] - feat_xy[None, :, 1]
    window = (jnp.abs(du) < radius[:, None]) & (jnp.abs(dv) < radius[:, None])
    oct_ok = (
        (feat_octave[None, :] >= proj.level[:, None] - 1)
        & (feat_octave[None, :] <= proj.level[:, None])
    )
    inv_s2 = 1.0 / level_sigma2[feat_octave]                 # (N,)
    has_r = feat_ur[None, :] >= 0
    if use_stereo_residual:
        der = proj.ur[:, None] - feat_ur[None, :]
        e2_st = (du * du + dv * dv + der * der) * inv_s2[None, :]
        e2_mo = (du * du + dv * dv) * inv_s2[None, :]
        chi_ok = jnp.where(has_r, e2_st <= 7.8, e2_mo <= 5.99)
    else:
        chi_ok = (du * du + dv * dv) * inv_s2[None, :] <= 5.99

    compat = window & oct_ok & chi_ok & proj.in_frustum[:, None] \
        & feat_valid[None, :]
    dist = hamming.distance_matrix(pt_desc, feat_desc)
    best_idx, best, _ = _best_two(dist, compat)
    ok = proj.in_frustum & (best <= TH_LOW)
    return FuseMatches(best_idx, best, ok)


@functools.partial(jax.jit, static_argnames=("n_levels",))
def search_by_sim3_projection(
    pts_w: jnp.ndarray, pt_mask: jnp.ndarray, pt_desc: jnp.ndarray,
    pt_min_dist: jnp.ndarray, pt_max_dist: jnp.ndarray,
    Scw_R: jnp.ndarray, Scw_t: jnp.ndarray, Scw_s: jnp.ndarray,
    feat_xy: jnp.ndarray, feat_octave: jnp.ndarray,
    feat_desc: jnp.ndarray, feat_free: jnp.ndarray,
    fx, fy, cx, cy,
    bounds: jnp.ndarray,
    scale_factors: jnp.ndarray,
    log_scale_factor: float,
    n_levels: int,
    th: float = 10.0,
    accept_dist: int = TH_LOW,
) -> Matches:
    """SearchByProjection with a Sim3 camera pose (ref :290-403), used to
    attach loop-map points to the current keyframe.  The scale s divides
    out of the projection; the distance band uses the descaled center."""
    pc = (pts_w @ Scw_R.T) * Scw_s + Scw_t[None, :]
    z = pc[:, 2]
    z_safe = jnp.maximum(z, 1e-6)
    u = fx * pc[:, 0] / z_safe + cx
    v = fy * pc[:, 1] / z_safe + cy

    Ow = -(Scw_R.T @ Scw_t) / jnp.maximum(Scw_s, 1e-12)
    dist3d = jnp.linalg.norm(pts_w - Ow[None, :], axis=1)
    ratio = jnp.maximum(pt_max_dist, 1e-9) / jnp.maximum(dist3d, 1e-9)
    level = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale_factor)
    level = jnp.clip(level, 0, n_levels - 1).astype(jnp.int32)

    vis = (
        pt_mask & (z > 0)
        & (u >= bounds[0]) & (u < bounds[1])
        & (v >= bounds[2]) & (v < bounds[3])
        & (dist3d >= pt_min_dist) & (dist3d <= pt_max_dist)
    )
    radius = th * scale_factors[level]
    du = jnp.abs(u[:, None] - feat_xy[None, :, 0])
    dv = jnp.abs(v[:, None] - feat_xy[None, :, 1])
    window = (du < radius[:, None]) & (dv < radius[:, None])
    oct_ok = (
        (feat_octave[None, :] >= level[:, None] - 1)
        & (feat_octave[None, :] <= level[:, None] + 1)
    )
    compat = window & oct_ok & vis[:, None] & feat_free[None, :]
    dist = hamming.distance_matrix(pt_desc, feat_desc)
    best_idx, best, _ = _best_two(dist, compat)
    ok = vis & (best <= accept_dist)
    ok = ok & resolve_duplicates(best_idx, best, ok, feat_xy.shape[0])
    return Matches(best_idx, best, ok)


@functools.partial(jax.jit, static_argnames=("n_levels",))
def search_by_sim3_mutual(
    pts1_w: jnp.ndarray, mask1: jnp.ndarray, desc1: jnp.ndarray,
    min1: jnp.ndarray, max1: jnp.ndarray, octave1: jnp.ndarray,
    xy1: jnp.ndarray,
    pts2_w: jnp.ndarray, mask2: jnp.ndarray, desc2: jnp.ndarray,
    min2: jnp.ndarray, max2: jnp.ndarray, octave2: jnp.ndarray,
    xy2: jnp.ndarray,
    T1w: jnp.ndarray, T2w: jnp.ndarray,
    S12_R: jnp.ndarray, S12_t: jnp.ndarray, S12_s: jnp.ndarray,
    fx, fy, cx, cy,
    bounds: jnp.ndarray,
    scale_factors: jnp.ndarray,
    log_scale_factor: float,
    n_levels: int,
    th: float = 7.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SearchBySim3 (ref :1102-1326): project KF1 points into KF2 via
    S21 and KF2 points into KF1 via S12; keep agreements.  Returns
    (match12 (N1,) int32 index into KF2 or -1, ok (N1,) bool)."""
    s21 = 1.0 / jnp.maximum(S12_s, 1e-12)
    R21 = S12_R.T
    t21 = -s21 * (R21 @ S12_t)

    def project_side(pts_w, Tw, Rrel, trel, srel, min_d, max_d,
                     feat_xy, feat_oct, mask):
        pc_own = pts_w @ Tw[:3, :3].T + Tw[:3, 3]
        pc = (pc_own @ Rrel.T) * srel + trel[None, :]
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        dist3d = jnp.linalg.norm(pc, axis=1)
        ratio = jnp.maximum(max_d, 1e-9) / jnp.maximum(dist3d, 1e-9)
        level = jnp.ceil(
            jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale_factor
        )
        level = jnp.clip(level, 0, n_levels - 1).astype(jnp.int32)
        vis = (
            mask & (pc[:, 2] > 0)
            & (u >= bounds[0]) & (u < bounds[1])
            & (v >= bounds[2]) & (v < bounds[3])
            & (dist3d >= min_d) & (dist3d <= max_d)
        )
        radius = th * scale_factors[level]
        du = jnp.abs(u[:, None] - feat_xy[None, :, 0])
        dv = jnp.abs(v[:, None] - feat_xy[None, :, 1])
        window = (du < radius[:, None]) & (dv < radius[:, None])
        oct_ok = (
            (feat_oct[None, :] >= level[:, None] - 1)
            & (feat_oct[None, :] <= level[:, None] + 1)
        )
        return window & oct_ok & vis[:, None], vis

    compat12, vis1 = project_side(
        pts1_w, T1w, R21, t21, s21, min1, max1, xy2, octave2, mask1
    )
    compat21, vis2 = project_side(
        pts2_w, T2w, S12_R, S12_t, S12_s, min2, max2, xy1, octave1, mask2
    )

    dist = hamming.distance_matrix(desc1, desc2)
    compat12 = compat12 & mask2[None, :]
    compat21 = compat21 & mask1[None, :]
    idx12, best12, _ = _best_two(dist, compat12)
    idx21, best21, _ = _best_two(dist.T, compat21)

    ok12 = vis1 & (best12 <= TH_HIGH)
    ok21 = vis2 & (best21 <= TH_HIGH)
    # mutual agreement (ref :1296-1306)
    agree = ok12 & ok21[idx12] & (idx21[idx12] == jnp.arange(idx12.shape[0]))
    return jnp.where(agree, idx12, -1), agree


def to_host(m: Matches):
    """Pull a Matches result with ONE device->host transfer (the tunnel
    to a remote TPU makes each pull latency-bound; pack then split)."""
    import numpy as np

    packed = jnp.concatenate(
        [m.idx.astype(jnp.int32), m.dist.astype(jnp.int32),
         m.ok.astype(jnp.int32)]
    )
    arr = np.asarray(packed)
    q = arr.shape[0] // 3
    return arr[:q], arr[q:2 * q], arr[2 * q:] > 0


# ---------------------------------------------------------------------------
# Batched-over-keyframes variants: local mapping issues one device call
# for ALL covisible neighbors instead of one per neighbor (each separate
# dispatch costs a host<->device round trip).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_levels",))
def fuse_points_batch(
    pts_w, pt_mask, pt_desc, pt_normal, pt_min_dist, pt_max_dist,
    Tcw_b,                      # (B, 4, 4) target keyframe poses
    feat_xy_b, feat_ur_b, feat_octave_b, feat_desc_b, feat_valid_b,
    kf_mask_b,                  # (B,) bool valid targets
    fx, fy, cx, cy, bf,
    bounds, scale_factors, level_sigma2,
    log_scale_factor, n_levels,
    th=3.0,
):
    """vmap of fuse_points over B target keyframes; one dispatch."""

    def one(Tcw, feat_xy, feat_ur, feat_octave, feat_desc, feat_valid,
            kf_ok):
        fm = fuse_points.__wrapped__(
            pts_w, pt_mask & kf_ok, pt_desc, pt_normal,
            pt_min_dist, pt_max_dist,
            Tcw, feat_xy, feat_ur, feat_octave, feat_desc, feat_valid,
            fx, fy, cx, cy, bf, bounds, scale_factors, level_sigma2,
            log_scale_factor, n_levels, th,
        )
        return fm.idx, fm.dist, fm.ok & kf_ok

    idx, dist, ok = jax.vmap(one)(
        Tcw_b, feat_xy_b, feat_ur_b, feat_octave_b, feat_desc_b,
        feat_valid_b, kf_mask_b,
    )
    packed = jnp.concatenate(
        [idx.astype(jnp.float32).reshape(-1),
         ok.astype(jnp.float32).reshape(-1)]
    )
    return packed


@functools.partial(jax.jit, static_argnames=("n_levels",))
def fuse_points_gather(
    pts_w, pt_mask, pt_desc, pt_normal, pt_min_dist, pt_max_dist,
    Tcw_b,                      # (B, 4, 4) target keyframe poses
    ids_b,                      # (B,) i32 mirror row ids of the targets
    mir_f32, mir_i32, mir_desc, mir_valid,   # slam/kf_mirror fields
    kf_mask_b,                  # (B,) bool valid targets
    fx, fy, cx, cy, bf,
    bounds, scale_factors, level_sigma2,
    log_scale_factor, n_levels,
    th=3.0,
):
    """fuse_points_batch with target feature blocks gathered from the
    device-resident keyframe mirror inside the program — the host
    uploads the candidate-point blocks, poses, and a (B,) index vector
    instead of stacking 5 feature fields per target chunk."""
    f2 = mir_f32[ids_b]
    return fuse_points_batch.__wrapped__(
        pts_w, pt_mask, pt_desc, pt_normal, pt_min_dist, pt_max_dist,
        Tcw_b,
        f2[..., 0:2], f2[..., 2], mir_i32[ids_b][..., 0],
        mir_desc[ids_b], mir_valid[ids_b], kf_mask_b,
        fx, fy, cx, cy, bf, bounds, scale_factors, level_sigma2,
        log_scale_factor, n_levels, th,
    )


def unpack_fuse_batch(packed, B, M):
    import numpy as np

    buf = np.asarray(packed)
    idx = buf[: B * M].reshape(B, M).astype(np.int32)
    ok = buf[B * M:].reshape(B, M) > 0.5
    return idx, ok
