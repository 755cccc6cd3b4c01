"""Pallas TPU kernel: fused FAST-9/16 score + 3x3 NMS over row strips.

TPU-native replacement for the XLA formulation in ops/fast.py (itself
the dense equivalent of the per-cell cv::FAST calls in
ORBextractor::ComputeKeyPointsOctTree, ref: src/ORBextractor.cc:765-853).
The XLA path materializes the (16, H, W) ring-difference stack and the
doubling sliding-min stages in HBM; per pyramid level that is dozens of
full-image HBM round trips.  This kernel keeps one (S+8, W) image strip
resident in VMEM and computes the 16 ring taps, the bright/dark 9-arc
sliding minima, the OpenCV score, 3x3 NMS, and the border/threshold
masks entirely on the VPU — HBM traffic drops to one image read + one
score-map write.

All shifts are pltpu.roll on the strip; the circular wrap only touches
the 4-row / 4-column halo whose outputs are discarded, so results are
identical to the XLA path everywhere the detector's border mask keeps
(verified exactly in tests/test_frontend.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam2_tpu.ops.fast import CIRCLE

_S = 32        # output rows per grid program
_HALO = 4      # 3 (ring radius) + 1 (NMS radius)


def _kernel(img_hbm, out_ref, strip, sem, *, h, w, min_th, border):
    i = pl.program_id(0)

    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * _S, _S + 2 * _HALO), :], strip, sem,
    )
    dma.start()
    dma.wait()

    T = strip[:]                               # (S+8, Wp) f32, rows i*S-4..

    def roll2(x, dy, dx):
        # x shifted so value at (r, c) = x[r+dy, c+dx]; pltpu.roll wants
        # non-negative shifts, so normalize modulo the axis size (the
        # circular wrap only touches the discarded halo)
        sy = (-dy) % x.shape[0]
        sx = (-dx) % x.shape[1]
        if sy:
            x = pltpu.roll(x, sy, axis=0)
        if sx:
            x = pltpu.roll(x, sx, axis=1)
        return x

    def tap(dy, dx):
        return roll2(T, dy, dx)

    # center >> ring --> bright corner; ring >> center --> dark corner
    dark = [tap(dy, dx) - T for dy, dx in CIRCLE]        # 16 x (S+8, Wp)
    bright = [-d for d in dark]

    def arc_scores(d):
        # max over the 16 circular 9-arcs of (min over the arc), via the
        # doubling sliding-min (same math as fast.raw_score_map, but the
        # "ring axis" is a Python list so the rolls are free re-indexing)
        m2 = [jnp.minimum(d[s], d[(s + 1) % 16]) for s in range(16)]
        m4 = [jnp.minimum(m2[s], m2[(s + 2) % 16]) for s in range(16)]
        m8 = [jnp.minimum(m4[s], m4[(s + 4) % 16]) for s in range(16)]
        m9 = [jnp.minimum(m8[s], d[(s + 8) % 16]) for s in range(16)]
        v = m9[0]
        for s in range(1, 16):
            v = jnp.maximum(v, m9[s])
        return v

    score = jnp.maximum(arc_scores(bright), arc_scores(dark)) - 1.0

    # 3x3 NMS with the same deterministic tie-break as fast.nms3x3:
    # strictly greater than raster-earlier neighbors, >= later ones.
    def sshift(dy, dx):
        return roll2(score, dy, dx)

    earlier = jnp.maximum(
        jnp.maximum(sshift(-1, -1), sshift(-1, 0)),
        jnp.maximum(sshift(-1, 1), sshift(0, -1)),
    )
    later = jnp.maximum(
        jnp.maximum(sshift(0, 1), sshift(1, -1)),
        jnp.maximum(sshift(1, 0), sshift(1, 1)),
    )
    keep = (score > earlier) & (score >= later) & (score >= min_th)

    # shift the (image-coord) result out of the halo: out[r, c] holds
    # image pixel (i*S + r, c) which sits at strip position (r+4, c+4)
    kept = jnp.where(keep, score, 0.0)
    kept = roll2(kept, _HALO, _HALO)
    kept = kept[:_S, :]

    # detector border mask in image coordinates (also kills the wrapped
    # roll columns: they land at c >= w - 4 + ... >= w - border)
    s_p, wp = kept.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (s_p, wp), 0) + i * _S
    xx = jax.lax.broadcasted_iota(jnp.int32, (s_p, wp), 1)
    valid = (
        (yy >= border) & (yy < h - border)
        & (xx >= border) & (xx < w - border)
    )
    out_ref[:] = jnp.where(valid, kept, 0.0)


@functools.partial(
    jax.jit, static_argnames=("min_threshold", "border", "interpret")
)
def nms_score_map(
    img: jnp.ndarray,
    min_threshold: float,
    border: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused border-masked `nms3x3(fast_score_map(img, min_threshold))`.

    Returns an (H, W) f32 map equal to the XLA path's low-threshold NMS
    map inside the border (the border region is zero in both).
    """
    h, w = img.shape
    f = img.astype(jnp.float32)
    pad = jnp.pad(f, _HALO, mode="edge")       # ring taps use edge clamp
    n_strips = -(-h // _S)
    rows_p = n_strips * _S + 2 * _HALO
    wp = -(-(w + 2 * _HALO) // 128) * 128
    padded = jnp.pad(
        pad, ((0, rows_p - pad.shape[0]), (0, wp - pad.shape[1]))
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, h=h, w=w, min_th=float(min_threshold), border=border
        ),
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_S, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_strips * _S, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_S + 2 * _HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)
    return out[:h, :w]


def detect_with_fallback(
    img: jnp.ndarray,
    ini_threshold: float,
    min_threshold: float,
    border: int,
    cell: int = 30,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for fast.detect_with_fallback with the fused kernel.

    Same per-cell threshold-fallback semantics (ref: src/ORBextractor.cc:
    809-816): keep low-threshold corners only in cells where the high
    threshold found nothing.
    """
    lo = nms_score_map(img, min_threshold, border, interpret=interpret)
    hi = jnp.where(lo >= ini_threshold, lo, 0.0)

    h, w = img.shape
    ch = -(-h // cell)
    cw = -(-w // cell)
    hi_pad = jnp.pad(hi, ((0, ch * cell - h), (0, cw * cell - w)))
    cell_has_hi = (
        hi_pad.reshape(ch, cell, cw, cell).max(axis=(1, 3)) > 0
    )
    per_pixel_hi = jnp.repeat(
        jnp.repeat(cell_has_hi, cell, axis=0), cell, axis=1
    )[:h, :w]
    return jnp.where(per_pixel_hi, hi, lo)
