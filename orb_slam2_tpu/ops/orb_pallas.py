"""Pallas TPU kernel: fused IC-angle + rBRIEF for a batch of keypoints.

Replaces the XLA gather formulation of orientation.ic_angles +
brief.describe (ref: src/ORBextractor.cc IC_Angle :77-104 and
computeOrbDescriptor :108-147).  XLA lowers per-keypoint patch gathers
to slow scalar gathers (~6-12 ms per level); this kernel reads each
keypoint's patch with dynamic VMEM slices and turns all random access
into MXU matmuls with one-hot selectors:

  per keypoint:
    rows  = img[y-19 : y+21, xa : xa+256]          (aligned lane slice)
    patch = rows @ onehot(cols)                     (40,256)x(256,128) MXU
    m10/m01 = <patch, const moment kernels>         VPU reduce -> angle
    rot. offsets (rx, ry) from angle                VPU
    V     = onehot(rows) @ patch_blur               (512,40)x(40,128) MXU
    taps  = sum(V * onehot(cols), axis=1)           VPU reduce
    bits  = taps[:256] < taps[256:]

Requirements: image width padded to a multiple of 128 and >= 256; the
detector's EDGE_THRESHOLD border guarantees patches stay in bounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam2_tpu.ops import brief as brief_mod
from orb_slam2_tpu.ops import orientation as orient_mod

KP_PER_PROGRAM = 8
_ROWS = 48          # 39-row descriptor window + 8-row alignment slack
_PAD = 19           # max |rotated offset| = ceil(13 * sqrt(2)) = 19
_MOFF = _PAD - orient_mod.HALF_PATCH   # moment window row/col offset (4)


def _moment_kernels():
    """(8, 48, 128) moment kernels, one per sublane alignment residue:
    the row slice must start on a multiple of 8, so the patch sits at a
    dynamic row offset dy0 in [0, 8) — select the pre-shifted kernel."""
    k10 = np.zeros((8, _ROWS, 128), np.float32)
    k01 = np.zeros((8, _ROWS, 128), np.float32)
    mask = orient_mod._MASK                      # (31, 31)
    dxs = orient_mod._DX                         # (31,)
    for d in range(8):
        r0 = d + _MOFF
        k10[d, r0:r0 + 31, _MOFF:_MOFF + 31] = dxs[None, :] * mask
        k01[d, r0:r0 + 31, _MOFF:_MOFF + 31] = dxs[:, None] * mask
    return k10, k01


_K10, _K01 = _moment_kernels()


def _make_kernel(n_programs: int):
    def kernel(xs_ref, ys_ref, px_ref, py_ref, k10_ref, k01_ref,
               img_ref, blur_ref, m10_ref, m01_ref, bits_ref):
        i = pl.program_id(0)
        w = img_ref.shape[1]
        px_c = px_ref[:]                 # (512, 1)
        py_c = py_ref[:]

        for k in range(KP_PER_PROGRAM):
            x = xs_ref[i * KP_PER_PROGRAM + k]
            y = ys_ref[i * KP_PER_PROGRAM + k]
            y0 = y - _PAD
            ya = pl.multiple_of((y0 // 8) * 8, 8)
            dy0 = y0 - ya                                 # in [0, 8)
            # aligned 256-wide lane slice containing [x-19, x+19]
            xa_raw = ((x - _PAD) // 128) * 128
            xa = pl.multiple_of(
                jnp.clip(xa_raw, 0, w - 256), 128)
            lx = x - xa                                   # in [19, 237)

            rows = img_ref[pl.ds(ya, _ROWS), pl.ds(xa, 256)]   # (48, 256)
            rows_b = blur_ref[pl.ds(ya, _ROWS), pl.ds(xa, 256)]

            # column selector: patch col w <- rows col (lx - 19 + w)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
            win_ids = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1) \
                + (lx - _PAD)
            selC = (col_ids == win_ids).astype(jnp.float32)    # (256, 128)

            patch = jnp.dot(rows, selC,
                            preferred_element_type=jnp.float32)  # (40, 128)
            patch_b = jnp.dot(rows_b, selC,
                              preferred_element_type=jnp.float32)

            m10 = jnp.sum(patch * k10_ref[dy0])
            m01 = jnp.sum(patch * k01_ref[dy0])
            # rotation without trig: cos = m10/r, sin = m01/r
            # (atan2 is only needed for the reported angle — done outside)
            r = jnp.sqrt(m10 * m10 + m01 * m01)
            r_safe = jnp.where(r > 1e-9, r, 1.0)
            ca = jnp.where(r > 1e-9, m10 / r_safe, 1.0)
            sa = jnp.where(r > 1e-9, m01 / r_safe, 0.0)
            rx = jnp.round(px_c * ca - py_c * sa).astype(jnp.int32)
            ry = jnp.round(px_c * sa + py_c * ca).astype(jnp.int32)

            # row selector (512, 48): tap j reads patch row ry_j+19+dy0
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (512, _ROWS), 1)
            selR = (row_ids == (ry + _PAD + dy0)).astype(jnp.float32)
            V = jnp.dot(selR, patch_b,
                        preferred_element_type=jnp.float32)   # (512, 128)
            tap_cols = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
            onC = (tap_cols == (rx + _PAD)).astype(jnp.float32)
            taps = jnp.sum(V * onC, axis=1)               # (512,)

            bits = (taps[:256] < taps[256:]).astype(jnp.float32)
            bits_ref[k, :] = bits
            m10_ref[k, :] = jnp.full((128,), m10, jnp.float32)
            m01_ref[k, :] = jnp.full((128,), m01, jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=())
def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) {0,1} -> (N, 8) u32 packed little-endian per 32-bit lane."""
    n = bits.shape[0]
    b = bits.astype(jnp.uint32).reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def describe_oriented(img: jnp.ndarray, img_blur: jnp.ndarray,
                      xy: jnp.ndarray, valid: jnp.ndarray):
    """Fused angle + descriptor for one pyramid level.

    img, img_blur: (H, W) float32 with W % 128 == 0 and W >= 256 (caller
    pads).  xy: (N, 2) int32 level coords with N % 8 == 0.
    Returns (angles_deg (N,) f32, desc (N, 8) u32).
    """
    h, w = img.shape
    n = xy.shape[0]
    assert w % 128 == 0 and w >= 256 and n % KP_PER_PROGRAM == 0

    x = jnp.clip(xy[:, 0], _PAD, w - 1 - _PAD).astype(jnp.int32)
    y = jnp.clip(xy[:, 1], _PAD, h - 1 - _PAD).astype(jnp.int32)

    n_programs = n // KP_PER_PROGRAM
    kernel = _make_kernel(n_programs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # px
            pl.BlockSpec(memory_space=pltpu.VMEM),   # py
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k10
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k01
            pl.BlockSpec(memory_space=pltpu.VMEM),   # img
            pl.BlockSpec(memory_space=pltpu.VMEM),   # blur
        ],
        out_specs=(
            pl.BlockSpec((KP_PER_PROGRAM, 128),
                         lambda i, xs, ys: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP_PER_PROGRAM, 128),
                         lambda i, xs, ys: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP_PER_PROGRAM, 256),
                         lambda i, xs, ys: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    pat = brief_mod.get_pattern().astype(np.float32)     # (256, 4)
    px = np.concatenate([pat[:, 0], pat[:, 2]]).reshape(512, 1)
    py = np.concatenate([pat[:, 1], pat[:, 3]]).reshape(512, 1)
    m10, m01, bits = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 256), jnp.float32),
        ),
        grid_spec=grid_spec,
    )(x, y, jnp.asarray(px), jnp.asarray(py),
      jnp.asarray(_K10), jnp.asarray(_K01),
      img.astype(jnp.float32), img_blur.astype(jnp.float32))

    ang = jnp.degrees(jnp.arctan2(m01[:, 0], m10[:, 0]))
    ang = jnp.where(ang < 0, ang + 360.0, ang)
    angles = jnp.where(valid, ang, 0.0)
    desc = _pack_bits(bits)
    desc = jnp.where(valid[:, None], desc, 0)
    return angles, desc


def pad_for_kernel(img: jnp.ndarray) -> jnp.ndarray:
    """Pad width to a multiple of 128 (>= 256) and height by 8 rows of
    slack so every aligned 48-row slice stays in bounds."""
    h, w = img.shape
    wp = max(-(-w // 128) * 128, 256)
    hp = -(-(h + 9) // 8) * 8
    if wp == w and hp == h:
        return img
    return jnp.pad(img, ((0, hp - h), (0, wp - w)))


# back-compat alias
pad_width_to_128 = pad_for_kernel
