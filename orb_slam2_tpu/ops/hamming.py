"""Packed 256-bit Hamming distance as XLA popcount reductions.

TPU-native replacement for ORBmatcher::DescriptorDistance
(ref: src/ORBmatcher.cc:1647-1663, the 8x32-bit XOR-popcount loop) —
batched into full distance matrices so every matcher mode is one fused op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DIST = 256  # all-ones distance used for masked-out entries
TH_LOW = 50     # ref: src/ORBmatcher.cc:38
TH_HIGH = 100   # ref: src/ORBmatcher.cc:37
HISTO_LENGTH = 30  # rotation-consistency bins, ref: src/ORBmatcher.cc:39


def distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance of packed descriptors.

    a, b: (..., 8) uint32 -> (...) int32 in [0, 256].
    """
    x = jax.lax.population_count(jnp.bitwise_xor(a, b))
    return jnp.sum(x, axis=-1).astype(jnp.int32)


def unpack_bits(a: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 packed descriptors -> (N, 256) int8 bit vectors."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (a[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(a.shape[0], 256).astype(jnp.int8)


def distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) uint32 -> (N, M) int32 distance matrix.

    MXU formulation: Hamming(a, b) = pop(a) + pop(b) - 2 <bits_a, bits_b>,
    so the (N, M) matrix is one int8 matmul on the systolic array instead
    of 8 XOR+popcount lanes on the VPU.  Bit-exact vs the packed path.
    """
    pa = jnp.sum(jax.lax.population_count(a), -1).astype(jnp.int32)
    pb = jnp.sum(jax.lax.population_count(b), -1).astype(jnp.int32)
    inner = jax.lax.dot_general(
        unpack_bits(a), unpack_bits(b),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return pa[:, None] + pb[None, :] - 2 * inner


def masked_argmin(
    dist: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row-wise best match under a mask.

    Returns (best_idx (N,), best_dist (N,), second_dist (N,)) where masked
    entries count as MAX_DIST; second_dist supports the reference's ratio
    test (bestDist < ratio * secondDist).
    """
    d = jnp.where(mask, dist, MAX_DIST)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.min(d, axis=1)
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(MAX_DIST)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second


def rotation_histogram_filter(
    angle_q: jnp.ndarray,
    angle_t: jnp.ndarray,
    matched: jnp.ndarray,
    n_keep: int = 3,
) -> jnp.ndarray:
    """Keep matches whose angle difference falls in the 3 dominant bins.

    Equivalent to the rot-histogram + ComputeThreeMaxima pattern used by
    every matcher (ref: src/ORBmatcher.cc:1601-1645).  Returns a bool mask
    over matches.  Bins with < 0.1 * max1 count are dropped like the
    reference.
    """
    rot = angle_q - angle_t
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    bin_idx = jnp.floor(rot * (HISTO_LENGTH / 360.0)).astype(jnp.int32)
    bin_idx = jnp.where(bin_idx == HISTO_LENGTH, 0, bin_idx)
    counts = jnp.zeros(HISTO_LENGTH, jnp.int32).at[bin_idx].add(
        matched.astype(jnp.int32)
    )
    top3_val, top3_idx = jax.lax.top_k(counts, n_keep)
    keep_bin = jnp.zeros(HISTO_LENGTH, bool)
    thresh = (0.1 * top3_val[0]).astype(top3_val.dtype)
    for i in range(n_keep):
        keep_bin = keep_bin.at[top3_idx[i]].set(top3_val[i] > thresh)
    return matched & keep_bin[bin_idx]
