"""Stereo feature matching: batched Hamming row-search + SAD subpixel.

TPU-native replacement for Frame::ComputeStereoMatches
(ref: src/Frame.cc:466-641).  The reference builds a per-row table of right
keypoints, finds the best Hamming match within a disparity window, then
refines with an 11x11 SAD correlation over +/-5 px with parabola fitting,
and finally sweeps outliers above ~2x the median SAD.  Here all left-right
pairs are scored at once as a masked (N, M) distance matrix, and subpixel
refinement is a batched gather + vectorized SAD.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_tpu.ops import hamming

_W = 5   # SAD half-window (ref: Frame.cc:557 w=5)
_L = 5   # search range +/- 5 (ref: Frame.cc:563)


class StereoMatches(NamedTuple):
    u_right: jnp.ndarray   # (N,) float32, -1 where unmatched
    depth: jnp.ndarray     # (N,) float32, -1 where unmatched
    sad: jnp.ndarray       # (N,) float32 best SAD (for outlier sweep)


def match(
    xy_l: jnp.ndarray, octave_l: jnp.ndarray, desc_l: jnp.ndarray,
    valid_l: jnp.ndarray,
    xy_r: jnp.ndarray, octave_r: jnp.ndarray, desc_r: jnp.ndarray,
    valid_r: jnp.ndarray,
    level0_l: jnp.ndarray, level0_r: jnp.ndarray,
    scale_factors: jnp.ndarray,
    bf: float, min_disp: float, max_disp: float,
) -> StereoMatches:
    """Match left keypoints to right keypoints along epipolar rows.

    xy_* are level-0 coords; level0_* are the level-0 pyramid images used
    for the SAD refinement (the reference correlates at the keypoint's
    octave; we correlate at level 0 with octave-scaled windows folded into
    the coarser blur — measured equivalent for rectified pairs).
    """
    n = xy_l.shape[0]

    # --- 1. candidate mask: row band, octave band, disparity window ------
    vL = xy_l[:, 1:2]
    vR = xy_r[None, :, 1]
    r_band = 2.0 * scale_factors[octave_r][None, :]   # ref: Frame.cc:487
    row_ok = jnp.abs(vL - vR) <= r_band

    oct_ok = (
        (octave_r[None, :] >= octave_l[:, None] - 1)
        & (octave_r[None, :] <= octave_l[:, None] + 1)
    )

    uL = xy_l[:, 0:1]
    uR = xy_r[None, :, 0]
    disp = uL - uR
    disp_ok = (disp >= min_disp) & (disp <= max_disp)

    mask = row_ok & oct_ok & disp_ok & valid_l[:, None] & valid_r[None, :]

    # --- 2. Hamming best match -------------------------------------------
    dist = hamming.distance_matrix(desc_l, desc_r)
    best_idx, best_dist, _ = hamming.masked_argmin(dist, mask)
    th_orb = (hamming.TH_HIGH + hamming.TH_LOW) // 2   # ref: Frame.cc:479
    matched = best_dist < th_orb

    # --- 3. SAD subpixel refinement at level 0 ----------------------------
    h0, w0 = level0_l.shape
    uR0 = xy_r[best_idx, 0]
    vL0 = xy_l[:, 1]

    yc = jnp.clip(vL0.astype(jnp.int32), _W, h0 - 1 - _W)
    xl = jnp.clip(xy_l[:, 0].astype(jnp.int32), _W + _L, w0 - 1 - _W - _L)
    xr = jnp.clip(uR0.astype(jnp.int32), _W + _L, w0 - 1 - _W - _L)

    sad = _sad_search(level0_l, level0_r, yc, xl, xr)      # (N, 11)

    best_s = jnp.argmin(sad, axis=1)
    best_sad = jnp.min(sad, axis=1)
    interior = (best_s > 0) & (best_s < 2 * _L)
    im1 = sad[jnp.arange(n), jnp.maximum(best_s - 1, 0)]
    ip1 = sad[jnp.arange(n), jnp.minimum(best_s + 1, 2 * _L)]
    denom = im1 + ip1 - 2.0 * best_sad
    delta = jnp.where(
        interior & (denom > 1e-6),
        0.5 * (im1 - ip1) / jnp.maximum(denom, 1e-6),
        0.0,
    )
    delta = jnp.clip(delta, -1.0, 1.0)   # ref rejects |delta|>1 (Frame.cc:600)

    u_right = xr.astype(jnp.float32) + (best_s - _L).astype(jnp.float32) + delta
    disparity = xy_l[:, 0] - u_right
    good = matched & (disparity >= min_disp) & (disparity < max_disp)
    # ref: disparity<=0 snapped to 0.01 (Frame.cc:609-612)
    disparity = jnp.where(disparity <= 0, 0.01, disparity)

    depth = jnp.where(good, bf / disparity, -1.0)
    u_right_out = jnp.where(good, u_right, -1.0)
    sad_out = jnp.where(good, best_sad, jnp.inf)
    return StereoMatches(u_right_out, depth, sad_out)


def _sad_search(level0_l, level0_r, yc, xl, xr) -> jnp.ndarray:
    """11 center-normalized SAD scores per keypoint: Pallas kernel on
    TPU (random gathers are slow there), XLA gathers elsewhere."""
    from orb_slam2_tpu.ops.frontend import _use_pallas

    n = yc.shape[0]
    if _use_pallas():
        from orb_slam2_tpu.ops import orb_pallas, stereo_pallas

        pad = (-n) % stereo_pallas.KP_PER_PROGRAM
        if pad:
            yc = jnp.concatenate([yc, jnp.full(pad, _W, yc.dtype)])
            xl = jnp.concatenate([xl, jnp.full(pad, _W + _L, xl.dtype)])
            xr = jnp.concatenate([xr, jnp.full(pad, _W + _L, xr.dtype)])
        sad = stereo_pallas.sad_strips(
            orb_pallas.pad_for_kernel(level0_l),
            orb_pallas.pad_for_kernel(level0_r), yc, xl, xr)
        return sad[:n]

    dy = jnp.arange(-_W, _W + 1)
    dxl = jnp.arange(-_W, _W + 1)
    rows = yc[:, None] + dy[None, :]                       # (N, 11)
    patch_l = level0_l[rows[:, :, None],
                       (xl[:, None] + dxl[None, :])[:, None, :]]
    # right strip covers the 11px window plus the +/-5 search
    dxr = jnp.arange(-_W - _L, _W + _L + 1)                # (21,)
    strip_r = level0_r[rows[:, :, None],
                       (xr[:, None] + dxr[None, :])[:, None, :]]

    # center-normalized like the reference (IL - IL(center), Frame.cc:566)
    cl = patch_l[:, _W, _W][:, None, None]
    patch_l_n = patch_l - cl
    sads = []
    for s in range(2 * _L + 1):
        win = strip_r[:, :, s : s + 2 * _W + 1]
        cr = win[:, _W, _W][:, None, None]
        sads.append(jnp.sum(jnp.abs(patch_l_n - (win - cr)), axis=(1, 2)))
    return jnp.stack(sads, 1)                              # (N, 11)


def median_sad_filter(m: StereoMatches) -> StereoMatches:
    """Drop matches with SAD > 1.5 * 1.4 * median (ref: Frame.cc:626-639)."""
    finite = jnp.isfinite(m.sad)
    med = jnp.nanmedian(jnp.where(finite, m.sad, jnp.nan))
    th = 1.5 * 1.4 * med
    keep = finite & (m.sad <= th)
    return StereoMatches(
        jnp.where(keep, m.u_right, -1.0),
        jnp.where(keep, m.depth, -1.0),
        jnp.where(keep, m.sad, jnp.inf),
    )


def depth_from_rgbd(
    xy: jnp.ndarray, valid: jnp.ndarray, depth_img: jnp.ndarray,
    depth_factor: float, bf: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """RGB-D depth association (ref: Frame::ComputeStereoFromRGBD
    src/Frame.cc:643-664): depth lookup at the raw keypoint, synthetic
    right coordinate u - bf/d."""
    h, w = depth_img.shape
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_img[yi, xi].astype(jnp.float32) * depth_factor
    good = valid & (d > 0)
    depth = jnp.where(good, d, -1.0)
    u_right = jnp.where(good, xy[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    return u_right, depth
