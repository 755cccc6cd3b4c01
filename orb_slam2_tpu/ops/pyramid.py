"""Image pyramid with OpenCV INTER_LINEAR resize semantics.

TPU-native replacement for ORBextractor::ComputePyramid
(ref: src/ORBextractor.cc:1107-1132): 8 levels, scale factor 1.2, each level
resized from the previous one.  Resize uses half-pixel-center alignment
(src = (dst + 0.5) * scale - 0.5) to match cv::resize INTER_LINEAR so that
descriptors computed on our pyramid agree with OpenCV-derived ones.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def level_sizes(
    height: int, width: int, n_levels: int, scale_factor: float
) -> List[Tuple[int, int]]:
    """Per-level (H, W), matching cvRound(size / scale^l) in the reference."""
    sizes = []
    for l in range(n_levels):
        inv = 1.0 / (scale_factor ** l)
        # cvRound: round-half-to-even; numpy's rint matches.
        sizes.append(
            (int(np.rint(height * inv)), int(np.rint(width * inv)))
        )
    return sizes


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv::resize(..., INTER_LINEAR) equivalent for a single-channel image."""
    in_h, in_w = img.shape
    scale_y = in_h / out_h
    scale_x = in_w / out_w
    # half-pixel centers, clamped like OpenCV (border replicate at edges)
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * scale_y - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * scale_x - 0.5
    ys = jnp.clip(ys, 0.0, in_h - 1.0)
    xs = jnp.clip(xs, 0.0, in_w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, in_h - 1)
    x1i = jnp.minimum(x0i + 1, in_w - 1)
    f = img.astype(jnp.float32)
    # separable gather: rows then columns
    r0 = f[y0i, :]
    r1 = f[y1i, :]
    rows = r0 * (1.0 - wy) + r1 * wy          # (out_h, in_w)
    c0 = rows[:, x0i]
    c1 = rows[:, x1i]
    return c0 * (1.0 - wx) + c1 * wx          # (out_h, out_w)


@functools.partial(
    __import__("jax").jit, static_argnames=("n_levels", "scale_factor")
)
def compute_pyramid(
    img: jnp.ndarray, n_levels: int = 8, scale_factor: float = 1.2
) -> Tuple[jnp.ndarray, ...]:
    """image (H, W) u8/f32 -> tuple of n_levels float32 images.

    Level l is resized from level l-1 (not from level 0), matching the
    reference's accumulation of interpolation (ref: ORBextractor.cc:1118).
    """
    h, w = img.shape
    sizes = level_sizes(h, w, n_levels, scale_factor)
    levels = [img.astype(jnp.float32)]
    for l in range(1, n_levels):
        lh, lw = sizes[l]
        levels.append(resize_bilinear(levels[-1], lh, lw))
    return tuple(levels)
