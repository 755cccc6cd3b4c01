"""Separable Gaussian blur matching cv::GaussianBlur(7x7, sigma=2).

Used before descriptor sampling (ref: src/ORBextractor.cc:1086 blurs each
pyramid level with GaussianBlur(ksize=7, sigma=2, BORDER_REFLECT_101)).
jnp.pad(mode='reflect') is exactly BORDER_REFLECT_101.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def gaussian_kernel_1d(ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    """Same formula as cv::getGaussianKernel for sigma > 0."""
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


_K7 = gaussian_kernel_1d(7, 2.0)


def blur7x7(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) float32 -> blurred float32, BORDER_REFLECT_101."""
    k = jnp.asarray(_K7)
    r = 3
    p = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    h, w = img.shape
    out = jnp.zeros_like(img)
    for i in range(7):
        out = out + k[i] * p[i : i + h, :]
    p2 = jnp.pad(out, ((0, 0), (r, r)), mode="reflect")
    out2 = jnp.zeros_like(img)
    for i in range(7):
        out2 = out2 + k[i] * p2[:, i : i + w]
    return out2
