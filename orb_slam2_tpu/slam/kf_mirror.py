"""Device-resident keyframe feature mirror for the mapping pipeline.

The mapper's batched device programs (epipolar triangulation over ~10
covisible neighbors, two-way fusion over ~30 covisible targets) need the
feature blocks of MANY keyframes per dispatch.  Stacking per-keyframe
device arrays eagerly (`jnp.stack` over 7 fields x B keyframes + the
dispatch itself) costs ~20 tunneled op dispatches per stage — measured
at ~50 ms per triangulation and ~35 ms per fuse pass on the 1-core host,
all under `store.lock` where the tracking thread contends.

Keyframe features are IMMUTABLE after insertion (ref: KeyFrame.h — the
keypoint/descriptor members are const; only pose and connections
change), so they belong in one fixed-capacity device SoA uploaded once
per keyframe.  Batched programs then receive the whole mirror plus a
small (B,) index vector and gather rows ON DEVICE inside the jitted
program: one dispatch, no stacking, nothing re-uploaded.

Fields are packed to minimize op count per insertion:
  f32  (cap, N, 5)  — xy(2), ur, depth, angle
  i32  (cap, N, 2)  — octave, node
  desc (cap, N, 8)  — u32 rBRIEF descriptors
  valid(cap, N)     — bool feature-slot validity

Capacity is FIXED at construction (settings.mirror_kf_cap): a growth
step would recompile every gather program mid-run, exactly the
multi-second stall the precompile registry exists to prevent.  Keyframes
with ids beyond the capacity simply report absent and callers fall back
to the legacy stacking path (correctness is never capacity-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _mirror_set(f32, i32, desc, valid, idx, f32_r, i32_r, desc_r, valid_r):
    return (f32.at[idx].set(f32_r), i32.at[idx].set(i32_r),
            desc.at[idx].set(desc_r), valid.at[idx].set(valid_r))


class KfFeatureMirror:
    def __init__(self, n_feat: int, cap: int):
        self.n_feat = int(n_feat)
        self.cap = int(cap)
        self._present = np.zeros(self.cap, bool)
        # per-row generation counter, bumped by node_dirty: ensure()
        # only marks a row present if its generation is unchanged across
        # the host-array snapshot -> device upload window, so a BoW
        # assignment landing mid-upload (set_kf_bow runs on the tracking
        # thread WITHOUT store.lock, tracking.py _ensure_kf_bow) cannot
        # have its invalidation overwritten (ADVICE r4 medium)
        self._gen = np.zeros(self.cap, np.int64)
        self.f32 = jnp.zeros((self.cap, self.n_feat, 5), jnp.float32)
        self.i32 = jnp.zeros((self.cap, self.n_feat, 2), jnp.int32)
        self.desc = jnp.zeros((self.cap, self.n_feat, 8), jnp.uint32)
        self.valid = jnp.zeros((self.cap, self.n_feat), bool)

    def clear(self):
        """Map reset: keyframe ids restart from 0 in a fresh store."""
        self._present[:] = False
        self._gen += 1

    def node_dirty(self, kf: int):
        """Invalidate a row whose BoW nodes were assigned after insertion
        (the i32 field holds node ids); the next ensure() re-uploads."""
        if 0 <= kf < self.cap:
            self._present[kf] = False
            self._gen[kf] += 1

    def ensure(self, store, kfs) -> bool:
        """Upload any missing keyframe rows from the store's host arrays.

        Returns False when any requested id is beyond capacity — the
        caller must use the legacy stacking path for this dispatch."""
        kfs = np.asarray(kfs, np.int64)
        if len(kfs) == 0:
            return True
        if kfs.max() >= self.cap:
            return False
        missing = kfs[~self._present[kfs]]
        if len(missing) == 0:
            return True
        missing = np.unique(missing)
        # snapshot generations BEFORE reading the store's host arrays:
        # if node_dirty fires concurrently (between this read and the
        # _present write below) the generation moves and the row stays
        # absent, forcing a re-upload on the next ensure()
        gen_before = self._gen[missing].copy()
        U = 1
        while U < len(missing):
            U *= 2
        pad = np.concatenate(
            [missing, np.full(U - len(missing), missing[0], np.int64)])
        f32_r = np.zeros((U, self.n_feat, 5), np.float32)
        f32_r[:, :, 0:2] = store.kf_xy[pad]
        f32_r[:, :, 2] = store.kf_ur[pad]
        f32_r[:, :, 3] = store.kf_depth[pad]
        f32_r[:, :, 4] = store.kf_angle[pad]
        i32_r = np.stack([store.kf_octave[pad], store.kf_node[pad]],
                         -1).astype(np.int32)
        self.f32, self.i32, self.desc, self.valid = _mirror_set(
            self.f32, self.i32, self.desc, self.valid,
            jnp.asarray(pad.astype(np.int32)),
            jnp.asarray(f32_r), jnp.asarray(i32_r),
            jnp.asarray(store.kf_desc[pad]),
            jnp.asarray(store.kf_feat_valid[pad]),
        )
        unchanged = self._gen[missing] == gen_before
        self._present[missing[unchanged]] = True
        return True
