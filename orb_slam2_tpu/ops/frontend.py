"""Fused ORB feature-extraction frontend.

The TPU-native equivalent of ORBextractor::operator()
(ref: src/ORBextractor.cc:1043-1105): one jitted function per image shape
that computes the pyramid, detects FAST corners with threshold fallback,
selects a spatially-uniform per-level budget, computes orientations,
blurs, samples rBRIEF descriptors, and returns level-0 coordinates —
all as fixed-shape padded tensors.

Per-level feature budgets follow the reference's geometric split
(factor 1/scale, ref: src/ORBextractor.cc:436-446).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.ops import brief, fast, gaussian, orientation, pyramid

EDGE_THRESHOLD = 19  # ref: src/ORBextractor.cc:74


@functools.lru_cache(maxsize=1)
def _use_pallas() -> bool:
    """The fused Pallas angle+descriptor kernel runs on real TPUs
    (including the axon tunnel); CPU test runs use the XLA path."""
    import jax

    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


class Features(NamedTuple):
    """Fixed-shape extraction result; level-0 (unscaled) coordinates."""

    xy: jnp.ndarray        # (N, 2) float32, level-0 pixel coords
    response: jnp.ndarray  # (N,) float32 FAST score
    octave: jnp.ndarray    # (N,) int32 pyramid level
    angle: jnp.ndarray     # (N,) float32 degrees
    desc: jnp.ndarray      # (N, 8) uint32 packed 256-bit rBRIEF
    valid: jnp.ndarray     # (N,) bool

    @property
    def n(self):
        return self.xy.shape[0]


def level_budgets(n_features: int, n_levels: int, scale_factor: float) -> list:
    """Per-level keypoint budgets (ref: src/ORBextractor.cc:436-446)."""
    factor = 1.0 / scale_factor
    n_first = n_features * (1 - factor) / (1 - factor ** n_levels)
    budgets = []
    acc = 0
    for l in range(n_levels - 1):
        b = int(round(n_first * factor ** l))
        budgets.append(b)
        acc += b
    budgets.append(max(n_features - acc, 0))
    return budgets


def padded_total(n_features: int, n_levels: int, scale_factor: float) -> int:
    """Total padded keypoint count, rounded up to a multiple of 128."""
    total = sum(level_budgets(n_features, n_levels, scale_factor))
    return -(-total // 128) * 128


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_features", "n_levels", "scale_factor", "ini_th", "min_th", "cell"
    ),
)
def extract(
    img: jnp.ndarray,
    n_features: int = 1000,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    ini_th: int = 20,
    min_th: int = 7,
    cell: int = 24,
) -> Features:
    """(H, W) u8/f32 image -> Features with fixed shape.

    All shapes are static given (H, W, config): compile once per dataset.
    """
    levels = pyramid.compute_pyramid(img, n_levels, scale_factor)
    budgets = level_budgets(n_features, n_levels, scale_factor)
    n_total = padded_total(n_features, n_levels, scale_factor)

    border = EDGE_THRESHOLD - 3  # FAST margin; ref ComputeKeyPointsOctTree
    outs = {"xy": [], "resp": [], "oct": [], "ang": [], "desc": [], "valid": []}

    use_pallas = _use_pallas()
    for l, lvl in enumerate(levels):
        if use_pallas:
            from orb_slam2_tpu.ops import fast_pallas

            score = fast_pallas.detect_with_fallback(
                lvl, ini_th, min_th, border)
        else:
            score = fast.detect_with_fallback(lvl, ini_th, min_th, border)
        xy, resp, valid = fast.select_topk_grid(score, budgets[l], cell)
        blurred = gaussian.blur7x7(lvl)
        if use_pallas:
            from orb_slam2_tpu.ops import orb_pallas

            pad = (-budgets[l]) % orb_pallas.KP_PER_PROGRAM
            xy_p = jnp.concatenate(
                [xy, jnp.full((pad, 2), EDGE_THRESHOLD, xy.dtype)]
            ) if pad else xy
            valid_p = jnp.concatenate(
                [valid, jnp.zeros(pad, bool)]) if pad else valid
            ang_p, desc_p = orb_pallas.describe_oriented(
                orb_pallas.pad_for_kernel(lvl),
                orb_pallas.pad_for_kernel(blurred),
                xy_p, valid_p,
            )
            ang = ang_p[: budgets[l]]
            desc = desc_p[: budgets[l]]
        else:
            ang = orientation.ic_angles(lvl, xy, valid)
            desc = brief.describe(blurred, xy, ang, valid)
        scale = jnp.float32(scale_factor ** l)
        outs["xy"].append(xy.astype(jnp.float32) * scale)
        outs["resp"].append(resp)
        outs["oct"].append(jnp.full((budgets[l],), l, jnp.int32))
        outs["ang"].append(ang)
        outs["desc"].append(desc)
        outs["valid"].append(valid)

    xy = jnp.concatenate(outs["xy"])
    resp = jnp.concatenate(outs["resp"])
    octv = jnp.concatenate(outs["oct"])
    ang = jnp.concatenate(outs["ang"])
    desc = jnp.concatenate(outs["desc"])
    valid = jnp.concatenate(outs["valid"])

    pad = n_total - xy.shape[0]
    if pad > 0:
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), xy.dtype)])
        resp = jnp.concatenate([resp, jnp.zeros(pad, resp.dtype)])
        octv = jnp.concatenate([octv, jnp.zeros(pad, octv.dtype)])
        ang = jnp.concatenate([ang, jnp.zeros(pad, ang.dtype)])
        desc = jnp.concatenate([desc, jnp.zeros((pad, 8), desc.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return Features(xy, resp, octv, ang, desc, valid)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_features", "n_levels", "scale_factor", "ini_th", "min_th", "cell"
    ),
)
def extract_stereo_pair(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    scale_factors: jnp.ndarray,
    bf: float,
    max_disp: float,
    n_features: int = 1000,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    ini_th: int = 20,
    min_th: int = 7,
    cell: int = 24,
):
    """Fused stereo frame construction: both ORB extractions + row-search
    stereo matching + SAD subpixel + median sweep in ONE compiled call.

    The reference runs left/right extraction on two threads then matches
    (ref: src/Frame.cc:78-81, 466-641); on TPU one fused graph avoids all
    intermediate host round-trips.
    """
    from orb_slam2_tpu.ops import stereo as stereo_ops

    fl = extract.__wrapped__(
        img_l, n_features, n_levels, scale_factor, ini_th, min_th, cell
    )
    fr = extract.__wrapped__(
        img_r, n_features, n_levels, scale_factor, ini_th, min_th, cell
    )
    m = stereo_ops.match(
        fl.xy, fl.octave, fl.desc, fl.valid,
        fr.xy, fr.octave, fr.desc, fr.valid,
        img_l.astype(jnp.float32), img_r.astype(jnp.float32),
        scale_factors, bf, 0.0, max_disp,
    )
    m = stereo_ops.median_sad_filter(m)
    return fl, m
