"""Device-resident mirror of the map-point store.

The host `MapStore` owns the map; this mirror keeps the point fields the
per-frame step needs (position, normal, scale band, descriptor, validity)
resident in HBM.  Mutations are batched: the store records dirty point
ids, and `flush()` uploads one packed delta + runs one scatter before
the next frame dispatch.

This is what makes frame pipelining sound: the chained step carries
point IDS and gathers positions from the mirror at execution time, so
bundle-adjustment updates reach in-flight frames instead of the chain
riding a stale snapshot (see tracking.py pipelined notes).
"""

from __future__ import annotations

import functools
from typing import Set

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _apply_delta(f32_block, desc_block, pids, delta_f32, delta_desc):
    """Scatter one packed update batch into the mirror.

    f32_block: (P, 9) [pos3, normal3, min, max, valid]; desc: (P, 8) u32.
    pids rows with -1 are padding (scattered to a dump row).

    NO buffer donation: an in-flight pipelined dispatch may still be
    reading the previous mirror buffers."""
    P = f32_block.shape[0]
    idx = jnp.where(pids >= 0, pids, P)   # P = dump row via drop mode
    f32_block = f32_block.at[idx].set(delta_f32, mode="drop")
    desc_block = desc_block.at[idx].set(delta_desc, mode="drop")
    return f32_block, desc_block


class DeviceMap:
    def __init__(self, store, cap: int = 1 << 15):
        self.store = store
        self.cap = cap
        self.f32 = jnp.zeros((cap, 9), jnp.float32)
        self.desc = jnp.zeros((cap, 8), jnp.uint32)
        self.dirty: Set[int] = set()
        store.dirty_sinks.append(self.dirty)

    def _grow(self, need: int):
        new_cap = self.cap
        while new_cap < need:
            new_cap *= 2
        pad = new_cap - self.cap
        self.f32 = jnp.concatenate(
            [self.f32, jnp.zeros((pad, 9), jnp.float32)])
        self.desc = jnp.concatenate(
            [self.desc, jnp.zeros((pad, 8), jnp.uint32)])
        self.cap = new_cap

    def flush(self):
        """Upload all dirty point rows in one batched scatter."""
        if not self.dirty:
            return
        store = self.store
        pids = np.fromiter(self.dirty, np.int64, len(self.dirty))
        self.dirty.clear()
        if store.n_pt > self.cap:
            self._grow(store.n_pt)
        pids = pids[pids < self.cap]
        n = len(pids)
        if n == 0:
            return
        n_pad = max(256, 1 << int(np.ceil(np.log2(max(n, 2)))))
        idx = np.full(n_pad, -1, np.int32)
        idx[:n] = pids
        delta = np.zeros((n_pad, 9), np.float32)
        delta[:n, 0:3] = store.pt_pos[pids]
        delta[:n, 3:6] = store.pt_normal[pids]
        delta[:n, 6] = store.pt_min_dist[pids]
        delta[:n, 7] = store.pt_max_dist[pids]
        delta[:n, 8] = store.pt_valid[pids]
        ddesc = np.zeros((n_pad, 8), np.uint32)
        ddesc[:n] = store.pt_desc[pids]
        self.f32, self.desc = _apply_delta(
            self.f32, self.desc, jnp.asarray(idx),
            jnp.asarray(delta), jnp.asarray(ddesc),
        )
