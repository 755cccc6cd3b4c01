"""Pallas TPU kernel: batched 11x11 SAD strip correlation for stereo
subpixel refinement.

Replaces the XLA gather formulation in ops/stereo.py step 3 (ref:
Frame::ComputeStereoMatches src/Frame.cc:551-622, the +/-5 px SAD search
with an 11x11 center-normalized window).  XLA lowers the (N, 11, 21)
patch gathers to scalar gathers; here each keypoint's left window and
right search strip are read as aligned VMEM lane slices and positioned
with one-hot MXU matmuls (same trick as orb_pallas.py), and the 11 SAD
scores come out as one (N, 128) block (first 11 lanes valid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KP_PER_PROGRAM = 8
_W = 5            # SAD half-window (ref: Frame.cc:557)
_L = 5            # search range +/- 5 (ref: Frame.cc:563)
_ROWS = 24        # 11-row window + 8-row alignment slack


def _make_kernel():
    n_shifts = 2 * _L + 1      # 11
    win = 2 * _W + 1           # 11

    def kernel(yc_ref, xl_ref, xr_ref, img_l_ref, img_r_ref, sad_ref):
        i = pl.program_id(0)
        w = img_l_ref.shape[1]

        # masks shared by all keypoints in the program
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
        winmask = ((row_ids < win) & (col_ids < win)).astype(jnp.float32)
        c_l = ((row_ids == _W) & (col_ids == _W)).astype(jnp.float32)

        for k in range(KP_PER_PROGRAM):
            idx = i * KP_PER_PROGRAM + k
            yc = yc_ref[idx]
            xl = xl_ref[idx]
            xr = xr_ref[idx]
            y0 = yc - _W
            ya = pl.multiple_of((y0 // 8) * 8, 8)
            dy0 = y0 - ya

            def lane_block(img_ref, xc, half):
                xa = pl.multiple_of(
                    jnp.clip(((xc - half) // 128) * 128, 0, w - 256), 128)
                lx = xc - xa
                rows = img_ref[pl.ds(ya, _ROWS), pl.ds(xa, 256)]  # (24,256)
                # col j of the block <- rows col (lx - half + j)
                src = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
                dst = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
                width = 2 * half + 1
                selC = ((src == dst + (lx - half))
                        & (dst < width)).astype(jnp.float32)
                block = jnp.dot(rows, selC,
                                preferred_element_type=jnp.float32)
                # select window rows dy0..dy0+10 into rows 0..10
                sel_r = jax.lax.broadcasted_iota(jnp.int32, (16, _ROWS), 1)
                out_r = jax.lax.broadcasted_iota(jnp.int32, (16, _ROWS), 0)
                selR = ((sel_r == out_r + dy0)
                        & (out_r < win)).astype(jnp.float32)
                return jnp.dot(selR, block,
                               preferred_element_type=jnp.float32)  # (16,128)

            patch_l = lane_block(img_l_ref, xl, _W)       # cols 0..10
            strip_r = lane_block(img_r_ref, xr, _W + _L)  # cols 0..20

            cl = jnp.sum(patch_l * c_l)
            patch_ln = (patch_l - cl) * winmask

            sads = []
            for s in range(n_shifts):
                # align window cols s..s+10 of the strip to lanes 0..10
                src = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                dst = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                selS = ((src == dst + s)
                        & (dst < win)).astype(jnp.float32)
                w_s = jnp.dot(strip_r, selS,
                              preferred_element_type=jnp.float32)
                cr = jnp.sum(w_s * c_l)
                diff = jnp.abs(patch_ln - (w_s - cr) * winmask)
                sads.append(jnp.sum(diff * winmask))
            lane = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
            out = jnp.zeros((128,), jnp.float32)
            for s in range(n_shifts):
                out = out + jnp.where(lane == s, sads[s], 0.0)
            sad_ref[k, :] = out

    return kernel


def sad_strips(img_l: jnp.ndarray, img_r: jnp.ndarray,
               yc: jnp.ndarray, xl: jnp.ndarray, xr: jnp.ndarray):
    """11 center-normalized SAD scores per keypoint.

    img_*: (H, W) float32 with W % 128 == 0, W >= 256, and >= 8 rows of
    bottom slack (use orb_pallas.pad_for_kernel).  yc/xl/xr: (N,) int32
    pre-clipped so the windows stay in bounds; N % 8 == 0.
    Returns (N, 11) float32.
    """
    n = yc.shape[0]
    assert n % KP_PER_PROGRAM == 0
    h, w = img_l.shape
    assert w % 128 == 0 and w >= 256

    n_programs = n // KP_PER_PROGRAM
    kernel = _make_kernel()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # img_l
            pl.BlockSpec(memory_space=pltpu.VMEM),   # img_r
        ],
        out_specs=pl.BlockSpec(
            (KP_PER_PROGRAM, 128), lambda i, yc, xl, xr: (i, 0),
            memory_space=pltpu.VMEM),
    )
    sad = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        grid_spec=grid_spec,
    )(yc.astype(jnp.int32), xl.astype(jnp.int32), xr.astype(jnp.int32),
      img_l.astype(jnp.float32), img_r.astype(jnp.float32))
    return sad[:, : 2 * _L + 1]
