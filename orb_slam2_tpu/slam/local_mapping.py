"""Local mapping: keyframe processing, triangulation, fusion, local BA.

Host-side equivalent of LocalMapping (ref: src/LocalMapping.cc, 760 LoC).
The reference runs this as a thread polling a keyframe queue; here the
pipeline scheduler invokes `process_one` either synchronously after each
keyframe insertion (deterministic mode, SURVEY §4.4) or from a worker
thread (async mode).  All geometry (epipolar matching, triangulation
gates, fuse projection, Schur-complement BA) is batched on device.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import threading

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.ops import matching
from orb_slam2_tpu.slam.map_store import MapStore
from orb_slam2_tpu.solvers import ba
from orb_slam2_tpu.solvers import triangulation as tri
from orb_slam2_tpu.utils import (
    StageTimers, StickyBuckets, bucket_size, fetch_async, pad_rows,
)


class LocalMapper:
    def __init__(self, settings: Settings, sensor: Sensor, store: MapStore,
                 loop_closer=None, vocabulary=None):
        self.s = settings
        self.sensor = sensor
        self.store = store
        self.loop_closer = loop_closer
        self.vocabulary = vocabulary
        # device-resident keyframe feature mirror: tri/fuse dispatches
        # gather neighbor blocks on device instead of stacking eager
        # per-keyframe arrays (slam/kf_mirror.py)
        cap_mir = int(getattr(settings, "mirror_kf_cap", 0))
        self.kf_mirror = None
        if cap_mir > 0:
            from orb_slam2_tpu.slam.kf_mirror import KfFeatureMirror
            self.kf_mirror = KfFeatureMirror(store.n_feat, cap_mir)
            store.bow_hooks.append(self.kf_mirror.node_dirty)
        self.queue: List[int] = []
        self.recent_points: List[int] = []
        self.abort_ba = False
        self._accepting = True
        # True while a keyframe is being processed (popped but not done)
        # — lets callers observe quiescence (ref: the tracking thread
        # reads LocalMapping::AcceptKeyFrames, src/LocalMapping.cc:734)
        self.processing = False
        # System.shutdown raises this to stop the drain loop promptly
        # (ref: LocalMapping::RequestFinish, src/LocalMapping.cc:705)
        self.finish_requested = False
        self.scale_factors = settings.scale_factors().astype(np.float32)
        self.level_sigma2 = settings.level_sigma2().astype(np.float32)
        self.log_scale = float(np.log(settings.scale_factor))
        self._sf_dev = jnp.asarray(self.scale_factors)
        self._ls2_dev = jnp.asarray(self.level_sigma2)
        w, h = settings.width, settings.height
        self.bounds = np.array([0.0, w, 0.0, h], np.float32)
        self._bounds_dev = jnp.asarray(self.bounds)
        self.current_kf = -1
        self._spin_lock = threading.Lock()
        self._buckets = StickyBuckets(
            fuse=settings.bucket_fuse, K=settings.bucket_ba_cams,
            P=settings.bucket_ba_pts, E=settings.bucket_ba_edges,
            nb=settings.bucket_nb)
        # per-processed-keyframe callbacks (Monopub stream contract)
        self.on_keyframe: List = []
        self.timers = StageTimers()

    # -- queue / thread-protocol surface (ref: LocalMapping.h:50-68) ----
    def insert_keyframe(self, kf: int):
        self.queue.append(kf)
        self.abort_ba = True

    def queue_size(self) -> int:
        return len(self.queue)

    def accepting_keyframes(self) -> bool:
        return self._accepting and not self.queue

    def idle(self) -> bool:
        """True when the queue is drained AND no keyframe is mid-flight
        (the queue is popped before processing, so `not queue` alone is
        not quiescence)."""
        return not self.queue and not self.processing

    def interrupt_ba(self):
        self.abort_ba = True

    def request_finish(self):
        self.finish_requested = True
        self.abort_ba = True

    def reset(self, store: MapStore):
        # kill any in-flight global BA BEFORE swapping the store: the
        # stop flag is set first, so a dying run that observes the NEW
        # store also observes stop (re-checked under store.lock in
        # _apply) and discards its result; one that already latched the
        # old store writes only to the discarded map.  No join — reset
        # can be reached while holding store.lock (auto-reset in the
        # fast path) and joining would deadlock against _apply.
        if (self.loop_closer is not None
                and self.loop_closer.gba is not None):
            self.loop_closer.gba.request_stop()
        self.abort_ba = True
        # swap under the OLD store's lock (RLock — safe when the caller
        # already holds it): process_one's stages each run under that
        # lock and re-check `self.store is not store` at every stage
        # boundary, so holding it for the swap guarantees no stage can
        # capture the new store while still holding the old store's lock
        with self.store.lock:
            self.store = store
        self.queue.clear()
        self.recent_points.clear()
        if self.kf_mirror is not None:
            # keyframe ids restart in the fresh store
            self.kf_mirror.clear()
            store.bow_hooks.append(self.kf_mirror.node_dirty)
        # cascade so the loop closer never holds a discarded map
        # (ref: Tracking::Reset clears LoopClosing too,
        # src/Tracking.cc:1524-1529)
        if self.loop_closer is not None:
            self.loop_closer.reset(store)

    def spin(self, block: bool = True):
        """Drain the keyframe queue (ref: LocalMapping::Run loop).

        Only one thread drains at a time.  With block=False the call
        returns immediately if another thread (the async worker) is
        already draining — the reference's tracking thread never waits
        for LocalMapping either."""
        if not self._spin_lock.acquire(blocking=block):
            return
        try:
            while self.queue and not self.finish_requested:
                self.process_one()
        finally:
            self._spin_lock.release()

    # ------------------------------------------------------------------
    def process_one(self):
        """One pass of the mapping loop (ref: src/LocalMapping.cc:47-112)."""
        if not self.queue:
            return
        self.processing = True
        try:
            kf = self.queue.pop(0)
            self.current_kf = kf
            self.abort_ba = False
            # snapshot the store: Tracker.reset swaps self.store under a
            # mid-flight pass.  The swap itself happens while HOLDING the
            # old store's lock (see reset()), so checking `self.store is
            # store` while we hold that lock is authoritative — if it
            # still matches, no swap can land until the stage releases
            # the lock, and every stage helper's own `self.store` read
            # then sees the store whose lock we hold.  On a mismatch the
            # pass bails; its earlier writes went to the discarded map.
            store = self.store
            lock = store.lock
            # BoW assignment for keyframes inserted without it (ref:
            # KeyFrame::ComputeBoW in LocalMapping::ProcessNewKeyFrame —
            # the reference also computes BoW on the mapping thread, not
            # the tracking thread).  The descend is DISPATCHED here
            # without a wait; its device node output chains straight into
            # the triangulation dispatch and the host result lands with
            # the triangulation pull (one sync for both).
            pend_bow = None
            if self.vocabulary is not None:
                with lock:
                    if self.store is not store:
                        return
                    need_bow = (store.kf_valid[kf]
                                and not store.kf_bow_assigned(kf))
                    if need_bow:
                        desc = store.kf_desc[kf].copy()
                        fv = store.kf_feat_valid[kf].copy()
                if need_bow:
                    with self.timers("lm/bow_dispatch"):
                        pend_bow = self.vocabulary.assign_nodes_async(
                            desc, fv)
            with lock, self.timers("lm/process_new_kf"):
                if self.store is not store:
                    return
                self._process_new_keyframe(kf)
            with lock, self.timers("lm/cull_points"):
                if self.store is not store:
                    return
                self._cull_map_points(kf)
            # triangulation/fusion: gather + dispatch under the lock,
            # WAIT for the device outside it (the tunnel wait is the
            # stage's dominant cost and the tracking thread needs the
            # lock every frame), re-validate + apply under the lock
            with lock, self.timers("lm/triangulate"):
                if self.store is not store:
                    return
                pend_tri = self._triangulate_dispatch(kf, pend_bow)
            if pend_tri is not None or pend_bow is not None:
                with self.timers("lm/triangulate_wait"):
                    fetch_async((pend_tri["packed"]
                                 if pend_tri is not None else None,
                                 pend_bow))
            if pend_bow is not None:
                node, word = self.vocabulary.finalize_nodes(*pend_bow)
                with lock, self.timers("lm/bow_apply"):
                    if self.store is not store:
                        return
                    # the tracking thread's lazy _ensure_kf_bow can win
                    # the race while the descend was in flight
                    if store.kf_valid[kf] \
                            and not store.kf_bow_assigned(kf):
                        store.set_kf_bow(kf, node, word)
            if pend_tri is not None:
                with lock, self.timers("lm/triangulate_apply"):
                    if self.store is not store:
                        return
                    self._triangulate_apply(kf, pend_tri)
            if not self.queue:
                with lock, self.timers("lm/fuse_neighbors"):
                    if self.store is not store:
                        return
                    pend_fuse = self._fuse_neighbors_dispatch(kf)
                if pend_fuse is not None:
                    with self.timers("lm/fuse_wait"):
                        if pend_fuse["fwd"] is not None:
                            fetch_async(
                                [p for _, p in pend_fuse["fwd"][1]])
                        if pend_fuse["rev"] is not None:
                            fetch_async(pend_fuse["rev"][1])
                with lock, self.timers("lm/fuse_apply"):
                    if self.store is not store:
                        return
                    self._fuse_neighbors_apply(kf, pend_fuse)
            if not self.queue and not self.abort_ba:
                if int(store.kf_valid.sum()) > 2:
                    with self.timers("lm/local_ba"):
                        self.local_bundle_adjustment(kf)
                with lock, self.timers("lm/cull_keyframes"):
                    if self.store is not store:
                        return
                    self._cull_keyframes(kf)
            if self.store is not store:
                return
            if self.loop_closer is not None:
                self.loop_closer.insert_keyframe(kf)
            for cb in self.on_keyframe:
                cb(kf)
        finally:
            self.processing = False

    # ------------------------------------------------------------------
    def _process_new_keyframe(self, kf: int):
        """ref: LocalMapping::ProcessNewKeyFrame (src/LocalMapping.cc:128).
        Observations were registered at insertion; refresh point stats and
        covisibility, and enroll tracking-born points for culling."""
        store = self.store
        row = store.kf_obs[kf]
        pids = row[row >= 0]
        pids = pids[store.pt_valid[pids]]
        store.compute_distinctive_batch(pids)
        store.update_points_batch(pids, self.scale_factors)
        self.recent_points.extend(
            int(p) for p in pids[store.pt_first_kf[pids] == kf])
        store.update_connections(kf)

    def _cull_map_points(self, kf: int):
        """ref: LocalMapping::MapPointCulling (src/LocalMapping.cc:170-204):
        drop points with found-ratio < 0.25, or too few observations within
        2 keyframes of creation; release survivors after 3 keyframes."""
        store = self.store
        th_obs = 2 if self.sensor == Sensor.MONOCULAR else 3
        pids = np.asarray(self.recent_points, np.int64)
        if len(pids) == 0:
            return
        pids = pids[store.pt_valid[pids]]
        age = kf - store.pt_first_kf[pids]
        ratio = (store.pt_found[pids].astype(np.float64)
                 / np.maximum(store.pt_visible[pids], 1.0))
        bad = (ratio < 0.25) | ((age >= 2)
                                & (store.pt_n_obs[pids] <= th_obs))
        for pid in pids[bad]:
            store.set_point_bad(int(pid))
        self.recent_points = pids[~bad & (age < 3)].tolist()

    # ------------------------------------------------------------------
    def _map_guard(self):
        """Snapshot for stale-result detection across an unlocked device
        wait: the store object (reset swaps it) and big_change_idx (loop
        correction / GBA pose remaps bump it under store.lock)."""
        return (id(self.store), self.store.big_change_idx)

    def _create_new_map_points(self, kf: int):
        """ref: LocalMapping::CreateNewMapPoints (src/LocalMapping.cc:207).
        Synchronous wrapper over the dispatch/apply halves (see
        process_one, which releases store.lock for the device wait)."""
        pend = self._triangulate_dispatch(kf)
        if pend is not None:
            self._triangulate_apply(kf, pend)

    def _triangulate_dispatch(self, kf: int, pend_bow=None):
        """Epipolar-search + triangulate against the top covisible
        keyframes, with the reference's baseline gates.  Gathers store
        state and dispatches ONE batched device call (no pull) — call
        under store.lock; returns a pending dict or None.

        `pend_bow` is the in-flight vocabulary descend for `kf` (device
        (node_mid, leaf) pair): its node output feeds the dispatch
        directly so triangulation never waits on a separate BoW sync."""
        store = self.store
        nn = 10 if self.sensor != Sensor.MONOCULAR else 20
        neighbors = store.best_covisibles(kf, nn)
        if not neighbors:
            return None
        T1 = store.kf_pose[kf]
        O1 = store.camera_center(kf)
        free1 = store.kf_feat_valid[kf] & (store.kf_obs[kf] < 0)
        baseline_own = self.s.baseline

        # baseline gates on host (ref :244-261), then ONE batched device
        # call across all surviving neighbors (per-neighbor dispatches
        # each cost a host<->device round trip)
        use = []
        for kf2 in neighbors:
            O2 = store.camera_center(kf2)
            baseline = float(np.linalg.norm(O2 - O1))
            if self.sensor != Sensor.MONOCULAR:
                if baseline < baseline_own:       # ref :244-250
                    continue
            else:
                med = store.scene_median_depth(kf2, 2)
                if med <= 0 or baseline / med < 0.01:   # ref :252-261
                    continue
            use.append(kf2)
        if not use:
            return None
        B = self._buckets("nb", len(use))

        with self.timers("lm/tri_gather"):
            T2_b = np.stack([store.kf_pose[k2] for k2 in use]
                            + [np.eye(4, dtype=np.float32)]
                            * (B - len(use)))
            free2 = np.stack(
                [store.kf_feat_valid[k2] & (store.kf_obs[k2] < 0)
                 for k2 in use]
                + [np.zeros(store.n_feat, bool)] * (B - len(use)))
            nb_mask = np.zeros(B, bool)
            nb_mask[: len(use)] = True

        node1 = (pend_bow[0] if pend_bow is not None
                 else store.kf_device(kf, "node"))
        mir = self.kf_mirror
        if mir is not None and mir.ensure(store, [kf] + use):
            ids = np.full(B, use[-1], np.int32)
            ids[: len(use)] = use
            packed = tri.triangulate_gather(
                jnp.asarray(T1), jnp.asarray(T2_b),
                jnp.int32(kf), jnp.asarray(ids), node1,
                mir.f32, mir.i32, mir.desc,
                jnp.asarray(free1), jnp.asarray(free2),
                jnp.asarray(nb_mask),
                jnp.float32(self.s.fx), jnp.float32(self.s.fy),
                jnp.float32(self.s.cx), jnp.float32(self.s.cy),
                jnp.float32(self.s.bf),
                self._sf_dev, self._ls2_dev,
            )
        else:
            # legacy stacking path (mirror off or id beyond capacity)
            def stack(key):
                hs = [store.kf_device(k2, key) for k2 in use]
                hs += [hs[-1]] * (B - len(use))
                return jnp.stack(hs)

            packed = tri.triangulate_batch(
                jnp.asarray(T1),
                store.kf_device(kf, "xy"), store.kf_device(kf, "ur"),
                store.kf_device(kf, "depth"),
                store.kf_device(kf, "octave"),
                store.kf_device(kf, "desc"), node1,
                store.kf_device(kf, "angle"), jnp.asarray(free1),
                jnp.asarray(T2_b),
                stack("xy"), stack("ur"), stack("depth"), stack("octave"),
                stack("desc"), stack("node"), stack("angle"),
                jnp.asarray(free2), jnp.asarray(nb_mask),
                jnp.float32(self.s.fx), jnp.float32(self.s.fy),
                jnp.float32(self.s.cx), jnp.float32(self.s.cy),
                jnp.float32(self.s.bf),
                self._sf_dev, self._ls2_dev,
            )
        return {"use": use, "packed": packed, "B": B,
                "guard": self._map_guard()}

    def _triangulate_apply(self, kf: int, pend) -> None:
        """Host half: pull proposals and bind new points — call under
        store.lock.  Stale results (map reset / loop-corrected poses
        since dispatch) are discarded; the per-slot kf_obs re-checks make
        concurrent bind races impossible anyway."""
        store = self.store
        if pend["guard"] != self._map_guard() or not store.kf_valid[kf]:
            return
        idx_b, good_b, pts_b = tri.unpack_triangulate_batch(
            pend["packed"], pend["B"], store.n_feat)

        all_born = []
        for bi, kf2 in enumerate(pend["use"]):
            if not store.kf_valid[kf2]:
                continue
            # batched within this neighbor: unclaimed slots on both
            # sides, first proposal per duplicate right-feature wins;
            # cross-neighbor claims resolve through kf_obs, which the
            # previous neighbor's batch already updated
            i = np.nonzero(good_b[bi])[0]
            if len(i) == 0:
                continue
            j = idx_b[bi][i].astype(np.int64)
            free = (store.kf_obs[kf, i] < 0) & (store.kf_obs[kf2, j] < 0)
            i, j = i[free], j[free]
            _, first = np.unique(j, return_index=True)
            i, j = i[np.sort(first)], j[np.sort(first)]
            if len(i) == 0:
                continue
            born = store.add_points_batch(
                pts_b[bi][i].astype(np.float32), kf, store.kf_desc[kf, i])
            store.add_observations_batch(born, kf, i)
            store.add_observations_batch(born, kf2, j)
            all_born.append(born)
        if all_born:
            born = np.concatenate(all_born)
            store.compute_distinctive_batch(born)
            store.update_points_batch(born, self.scale_factors)
            self.recent_points.extend(int(p) for p in born)

    # ------------------------------------------------------------------
    def _fuse_into_kf_dispatch(self, target_kf: int, pids: np.ndarray):
        """Device half of reverse fusion: project `pids` into
        `target_kf` for merge/add (device Fuse + host replace, ref
        ORBmatcher::Fuse src/ORBmatcher.cc:825-975).  Returns
        (pids, FuseMatches) or None, WITHOUT pulling — so multiple
        fusions can fly together."""
        store = self.store
        pids = pids[store.pt_valid[pids]]
        # skip points already observed by the target
        seen = store.kf_obs[target_kf]
        pids = pids[~np.isin(pids, seen[seen >= 0])]
        if len(pids) == 0:
            return None
        M = self._buckets("fuse", len(pids))
        mask = pad_rows(np.ones(len(pids), bool), M, False)
        fm = matching.fuse_points(
            jnp.asarray(pad_rows(store.pt_pos[pids], M)),
            jnp.asarray(mask),
            jnp.asarray(pad_rows(store.pt_desc[pids], M)),
            jnp.asarray(pad_rows(store.pt_normal[pids], M)),
            jnp.asarray(pad_rows(store.pt_min_dist[pids], M)),
            jnp.asarray(pad_rows(store.pt_max_dist[pids], M)),
            jnp.asarray(store.kf_pose[target_kf]),
            store.kf_device(target_kf, "xy"),
            store.kf_device(target_kf, "ur"),
            store.kf_device(target_kf, "octave"),
            store.kf_device(target_kf, "desc"),
            store.kf_device(target_kf, "valid"),
            jnp.float32(self.s.fx), jnp.float32(self.s.fy),
            jnp.float32(self.s.cx), jnp.float32(self.s.cy),
            jnp.float32(self.s.bf),
            self._bounds_dev, self._sf_dev, self._ls2_dev,
            self.log_scale, self.s.n_levels,
        )
        return pids, fm

    def _fuse_into_kf_apply(self, target_kf: int, dispatched) -> int:
        """Host half of reverse fusion: pull + merge."""
        if dispatched is None:
            return 0
        pids, fm = dispatched
        store = self.store
        ok = np.asarray(fm.ok)[: len(pids)]
        idx = np.asarray(fm.idx)[: len(pids)]
        return self._apply_fuse_rows(target_kf, pids, idx, ok)

    def _apply_fuse_rows(self, target_kf: int, pids, idx, ok) -> int:
        """Merge device Fuse proposals into one keyframe, batched: the
        conflict-free adds go through the batched observation engine;
        only genuine replace merges (ref ORBmatcher::Fuse :925-934)
        walk Python."""
        store = self.store
        rows = np.nonzero(ok)[0]
        if len(rows) == 0:
            return 0
        p = pids[rows].astype(np.int64)
        f = idx[rows].astype(np.int64)
        live = store.pt_valid[p]
        p, f = p[live], f[live]
        if len(p) == 0:
            return 0
        # first proposal per target feature wins (sequential semantics)
        _, first = np.unique(f, return_index=True)
        keep = np.sort(first)
        p, f = p[keep], f[keep]
        existing = store.kf_obs[target_kf, f]
        conflict = (existing >= 0) & store.pt_valid[np.maximum(existing, 0)]
        add_p, add_f = p[~conflict], f[~conflict]
        n_merged = 0
        if len(add_p):
            added = store.add_observations_batch(add_p, target_kf, add_f)
            n_merged += int(added.sum())
        for pid, feat, ex in zip(p[conflict], f[conflict],
                                 existing[conflict]):
            pid, ex = int(pid), int(ex)
            if not store.pt_valid[pid] or not store.pt_valid[ex]:
                continue
            # keep the point with more observations (ref :925-934)
            if store.pt_n_obs[ex] > store.pt_n_obs[pid]:
                store.replace_point(pid, ex)
            else:
                store.replace_point(ex, pid)
            n_merged += 1
        return n_merged

    def _fuse_into_kfs_batch_dispatch(self, targets, pids: np.ndarray):
        """Device half of forward fusion: project the current keyframe's
        points into ALL neighbor keyframes with one batched Fuse
        dispatch, no pull."""
        store = self.store
        pids = pids[store.pt_valid[pids]]
        if len(pids) == 0 or not targets:
            return None
        M = self._buckets("fuse", len(pids))
        # FIXED batch width (fixed-shape story): more targets than the
        # bucket are processed in chunks through the SAME compiled
        # program — a grown batch width would both recompile mid-run and
        # blow up the (B, M, N) distance-matrix footprint (second-order
        # neighborhoods reach ~60 keyframes on mature maps)
        B = self.s.bucket_nb
        mask = pad_rows(np.ones(len(pids), bool), M, False)
        pts_dev = jnp.asarray(pad_rows(store.pt_pos[pids], M))
        mask_dev = jnp.asarray(mask)
        desc_dev = jnp.asarray(pad_rows(store.pt_desc[pids], M))
        normal_dev = jnp.asarray(pad_rows(store.pt_normal[pids], M))
        mind_dev = jnp.asarray(pad_rows(store.pt_min_dist[pids], M))
        maxd_dev = jnp.asarray(pad_rows(store.pt_max_dist[pids], M))

        mir = self.kf_mirror
        use_mir = mir is not None and mir.ensure(store, targets)
        chunks = []
        for c0 in range(0, len(targets), B):
            chunk = targets[c0:c0 + B]
            Tcw_b = np.stack([store.kf_pose[t] for t in chunk]
                             + [np.eye(4, dtype=np.float32)]
                             * (B - len(chunk)))
            kf_mask = np.zeros(B, bool)
            kf_mask[: len(chunk)] = True

            if use_mir:
                ids = np.full(B, chunk[-1], np.int32)
                ids[: len(chunk)] = chunk
                packed = matching.fuse_points_gather(
                    pts_dev, mask_dev, desc_dev, normal_dev,
                    mind_dev, maxd_dev,
                    jnp.asarray(Tcw_b), jnp.asarray(ids),
                    mir.f32, mir.i32, mir.desc, mir.valid,
                    jnp.asarray(kf_mask),
                    jnp.float32(self.s.fx), jnp.float32(self.s.fy),
                    jnp.float32(self.s.cx), jnp.float32(self.s.cy),
                    jnp.float32(self.s.bf),
                    self._bounds_dev, self._sf_dev, self._ls2_dev,
                    self.log_scale, self.s.n_levels,
                )
            else:
                def stack(key):
                    hs = [store.kf_device(t, key) for t in chunk]
                    hs += [hs[-1]] * (B - len(chunk))
                    return jnp.stack(hs)

                packed = matching.fuse_points_batch(
                    pts_dev, mask_dev, desc_dev, normal_dev,
                    mind_dev, maxd_dev,
                    jnp.asarray(Tcw_b),
                    stack("xy"), stack("ur"), stack("octave"),
                    stack("desc"), stack("valid"), jnp.asarray(kf_mask),
                    jnp.float32(self.s.fx), jnp.float32(self.s.fy),
                    jnp.float32(self.s.cx), jnp.float32(self.s.cy),
                    jnp.float32(self.s.bf),
                    self._bounds_dev, self._sf_dev, self._ls2_dev,
                    self.log_scale, self.s.n_levels,
                )
            chunks.append((chunk, packed))
        return pids, chunks, B, M

    def _fuse_into_kfs_batch_apply(self, targets, dispatched):
        if dispatched is None:
            return
        pids, chunks, B, M = dispatched
        store = self.store
        for chunk, packed in chunks:
            idx_b, ok_b = matching.unpack_fuse_batch(packed, B, M)
            for bi, t in enumerate(chunk):
                if not store.kf_valid[t]:
                    continue
                ok = ok_b[bi][: len(pids)].copy()
                # drop points this keyframe already observes (kf_obs
                # mirrors the observation engine: membership is one isin)
                row_t = store.kf_obs[t]
                ok &= ~np.isin(pids, row_t[row_t >= 0])
                self._apply_fuse_rows(t, pids, idx_b[bi][: len(pids)], ok)

    def _search_in_neighbors(self, kf: int):
        """ref: LocalMapping::SearchInNeighbors (src/LocalMapping.cc:454):
        two-way fusion with 1st- and 2nd-order covisible neighbors.
        Synchronous wrapper (see process_one for the unlocked wait)."""
        pend = self._fuse_neighbors_dispatch(kf)
        self._fuse_neighbors_apply(kf, pend)

    def _fuse_neighbors_dispatch(self, kf: int):
        """Gather + dispatch both fuse directions without pulling either
        — the device proposals are validated on the host at apply time
        (pt_valid / existing-obs checks), so the reverse pass can fly
        while the forward pass is still in the tunnel.  Call under
        store.lock."""
        store = self.store
        nn = 10 if self.sensor != Sensor.MONOCULAR else 20
        targets = []
        first_order = []
        seen = {kf}
        for nb in store.best_covisibles(kf, nn):
            if nb not in seen:
                targets.append(nb)
                first_order.append(nb)
                seen.add(nb)
                for nb2 in store.best_covisibles(nb, 5):
                    if nb2 not in seen:
                        targets.append(nb2)
                        seen.add(nb2)

        own = store.kf_obs[kf]
        own_pids = own[own >= 0]
        if not targets:
            return None
        d_fwd = self._fuse_into_kfs_batch_dispatch(targets, own_pids)
        fuse_cands = store.points_in_kfs(targets)
        # bound the reverse-fuse candidate block at the precompiled
        # growth step (fixed-shape story): overflow candidates simply
        # wait for a later keyframe's fuse pass, which re-gathers from
        # the same neighborhood
        cap = 2 * self.s.bucket_fuse
        if len(fuse_cands) > cap:
            # relevance-ranked truncation (ADVICE r4): gather candidates
            # target-by-target — first-order neighbors in descending
            # covisibility weight before their second-order extensions —
            # so the dropped tail is the least-relevant, mirroring the
            # local-map point cap's ordering (not points_in_kfs's
            # arbitrary np.unique order)
            ranked = first_order + [t for t in targets
                                    if t not in set(first_order)]
            out = np.zeros(0, np.int64)
            for t in ranked:
                if len(out) >= cap:
                    break
                row = store.kf_obs[t]
                p = row[row >= 0]
                p = p[store.pt_valid[p]]
                p = p[~np.isin(p, out)]
                out = np.concatenate([out, p])
            fuse_cands = out[:cap]
        d_rev = self._fuse_into_kf_dispatch(kf, fuse_cands)
        return {"targets": targets, "fwd": d_fwd, "rev": d_rev,
                "guard": self._map_guard()}

    def _fuse_neighbors_apply(self, kf: int, pend) -> None:
        """Pull + merge both fuse directions, then refresh point stats +
        connections (ref :536-553).  Call under store.lock."""
        store = self.store
        if pend is not None and pend["guard"] == self._map_guard() \
                and store.kf_valid[kf]:
            # targets must keep dispatch order (batch rows align);
            # invalidated ones are skipped inside the apply
            with self.timers("lm/fuse_apply_fwd"):
                self._fuse_into_kfs_batch_apply(pend["targets"],
                                                pend["fwd"])
            with self.timers("lm/fuse_apply_rev"):
                self._fuse_into_kf_apply(kf, pend["rev"])
        if not store.kf_valid[kf]:
            return
        with self.timers("lm/fuse_refresh"):
            row = store.kf_obs[kf]
            pids = row[row >= 0]
            store.compute_distinctive_batch(pids)
            store.update_points_batch(pids, self.scale_factors)
            store.update_connections(kf)

    # ------------------------------------------------------------------
    def _gather_ba_problem(
        self, cams: List[int], fixed: List[int], pids: np.ndarray,
        store: Optional[MapStore] = None, buckets=None,
    ) -> Tuple[ba.BAProblem, Dict[int, int], np.ndarray, list]:
        """Pack a window into a fixed-shape BAProblem (bucketed padding).

        `store` lets local_bundle_adjustment keep the whole pass on the
        store it captured before a concurrent reset swap.  `buckets`
        overrides the local-BA sticky buckets — global BA packs the
        WHOLE map, and letting it grow the shared buckets would leave
        every subsequent local BA padded to global size (at reference
        scale: a 2048-camera pad on a 16-camera window)."""
        store = self.store if store is None else store
        buckets = self._buckets if buckets is None else buckets
        all_cams = list(cams) + list(fixed)
        cam_index = {c: i for i, c in enumerate(all_cams)}
        K = buckets("K", len(all_cams))
        P = buckets("P", max(len(pids), 1))

        cam_T = pad_rows(store.kf_pose[all_cams], K)
        cam_T[len(all_cams):] = np.eye(4, dtype=np.float32)
        cam_fixed = pad_rows(
            np.array([c in set(fixed) for c in all_cams], bool), K, True
        )
        if len(cams) > 0 and not fixed:
            cam_fixed[cam_index[cams[0]]] = True   # gauge freedom
        cam_mask = pad_rows(np.ones(len(all_cams), bool), K, False)
        pts = pad_rows(store.pt_pos[pids], P)
        pt_mask = pad_rows(np.ones(len(pids), bool), P, False)

        # vectorized edge-list assembly: one native bulk dump of every
        # observation, then numpy filtering — the per-obs Python loop
        # used to cost more than the whole device solve
        idxs, kfs_e, feats_e = store.obs.dump(pids)
        cam_lut = np.full(store.kf_cap, -1, np.int32)
        for c, i in cam_index.items():
            cam_lut[c] = i
        keep_e = (cam_lut[kfs_e] >= 0) & store.kf_valid[kfs_e]
        idxs, kfs_e, feats_e = idxs[keep_e], kfs_e[keep_e], feats_e[keep_e]
        e_cam_a = cam_lut[kfs_e]
        e_uv_a = np.concatenate([
            store.kf_xy[kfs_e, feats_e],
            store.kf_ur[kfs_e, feats_e][:, None]], 1).astype(np.float32)
        e_is2_a = (1.0 / self.level_sigma2[
            store.kf_octave[kfs_e, feats_e]]).astype(np.float32)
        e_feat = list(zip(kfs_e.tolist(), feats_e.tolist()))
        E = buckets("E", max(len(e_cam_a), 1))
        edge_cam = pad_rows(e_cam_a.astype(np.int32), E)
        edge_pt = pad_rows(idxs.astype(np.int32), E)
        edge_uv = pad_rows(e_uv_a.reshape(-1, 3), E)
        edge_is2 = pad_rows(e_is2_a, E)
        edge_mask = pad_rows(np.ones(len(e_cam_a), bool), E, False)

        prob = ba.BAProblem(
            jnp.asarray(cam_T), jnp.asarray(cam_fixed), jnp.asarray(cam_mask),
            jnp.asarray(pts), jnp.asarray(pt_mask),
            jnp.asarray(edge_cam), jnp.asarray(edge_pt), jnp.asarray(edge_uv),
            jnp.asarray(edge_is2), jnp.asarray(edge_mask),
        )
        return prob, cam_index, pids, e_feat

    def _intrinsics(self):
        return (jnp.float32(self.s.fx), jnp.float32(self.s.fy),
                jnp.float32(self.s.cx), jnp.float32(self.s.cy),
                jnp.float32(self.s.bf))

    def local_bundle_adjustment(self, kf: int):
        """ref: Optimizer::LocalBundleAdjustment (src/Optimizer.cc:453-780):
        optimize the 1-ring covisible window + its points, others fixed;
        5 iterations, outlier pass, 10 more, erase outlier observations."""
        # capture store ONCE: a concurrent Tracker.reset swaps self.store,
        # and mixing the pre-swap store with post-swap self.store reads
        # acquires one store's lock and releases the other's (observed as
        # 'cannot release un-acquired lock' killing the mapping thread).
        # Running wholly on the old store is safe — reset discards it.
        store = self.store
        lock = store.lock
        cams = [kf] + [c for c in store.ordered_covisibles(kf)]
        cams = [c for c in cams if store.kf_valid[c]]
        pids = store.points_in_kfs(cams)
        if len(pids) == 0 or len(cams) < 2:
            return
        cam_set = set(cams)
        # all out-of-window observers, via one native bulk query (the
        # per-point items() loop was pure-Python per-observation cost)
        obs_kfs, _ = store.obs.observers_of(pids)
        fixed = sorted(
            int(c) for c in obs_kfs
            if int(c) not in cam_set and store.kf_valid[c])
        # the origin keyframe is ALWAYS held fixed when it appears in the
        # window (ref: src/Optimizer.cc:505 vSE3->setFixed(mnId==0));
        # without this the early map's gauge drifts off the origin every
        # local BA until enough out-of-window observers exist
        origin = store.origin_kf
        if origin in cam_set:
            cams = [c for c in cams if c != origin]
            cam_set.discard(origin)
            fixed = sorted(set(fixed) | {origin})
        # gauge: fix origin / first keyframe if present (ref :471-475)
        with lock, self.timers("lm/ba_gather"):
            prob, cam_index, pids, e_feat = self._gather_ba_problem(
                cams, fixed, pids, store=store
            )
        fx, fy, cx, cy, bf = self._intrinsics()
        # one fused device dispatch for the whole 5-iter / outlier /
        # 10-iter / classify chain, one packed pull of the results
        with self.timers("lm/ba_device"):
            cam_T, pts, bad, valid_e = jax.device_get(ba.local_ba_chain(
                prob, fx, fy, cx, cy, bf, iters1=5, iters2=10, mode="dense",
                second_round=not self.abort_ba,
            ))

        with lock:
            # erase outlier observations (ref :718-760)
            for e in np.nonzero(bad & valid_e)[0]:
                c, feat = e_feat[e]
                pid = int(store.kf_obs[c, feat])
                if pid >= 0:
                    store.erase_observation(pid, c)

            # write back (ref :760-779)
            with self.timers("lm/ba_writeback"):
                fixed_set = set(fixed)
                for c, i in cam_index.items():
                    if c not in fixed_set:
                        store.kf_pose[c] = cam_T[i]
                live = store.pt_valid[pids]
                store.pt_pos[pids[live]] = pts[:len(pids)][live]
                store.update_points_batch(pids, self.scale_factors)
                store.geo_epoch += 1
                store.mark_dirty(pids)

    def global_bundle_adjustment(self, iters: int = 20,
                                 fixed_kf: Optional[int] = None,
                                 loop_kf: int = 0,
                                 background: bool = False, gba=None):
        """ref: Optimizer::GlobalBundleAdjustemnt (src/Optimizer.cc:41-237)
        with the reference's background/abort/mid-run-correction protocol
        (src/LoopClosing.cc:646-757) — see slam/global_ba.GlobalBA."""
        from orb_slam2_tpu.slam.global_ba import GlobalBA

        runner = gba if gba is not None else GlobalBA(self)
        return runner.launch(loop_kf, iters=iters, fixed_kf=fixed_kf,
                             background=background)

    # ------------------------------------------------------------------
    def _cull_keyframes(self, kf: int):
        """ref: LocalMapping::KeyFrameCulling (src/LocalMapping.cc:632-703):
        erase covisible keyframes whose map points are >=90% seen by >=3
        other keyframes at the same or finer scale."""
        store = self.store
        th_obs = 3
        # per-candidate loop stays sequential (an erase changes pt_n_obs
        # and covisibility for later candidates, matching the reference's
        # in-order walk); the per-feature x per-observation inner loops
        # are one bulk obs dump + numpy per candidate
        for cand in store.ordered_covisibles(kf):
            if cand == store.origin_kf or not store.kf_valid[cand]:
                continue
            row = store.kf_obs[cand]
            feats = np.nonzero(row >= 0)[0]
            pids = row[feats]
            live = store.pt_valid[pids]
            feats, pids = feats[live], pids[live]
            if self.sensor != Sensor.MONOCULAR:
                d = store.kf_depth[cand, feats]
                near = (d >= 0) & (d <= self.s.depth_threshold)
                feats, pids = feats[near], pids[near]
            n_pts = len(pids)
            if n_pts == 0:
                continue
            maybe = store.pt_n_obs[pids] > th_obs
            if not maybe.any():
                continue
            # count, per maybe-point, the OTHER observations at the same
            # or finer scale (ref :659-683: scaleLevel <= level+1)
            idxs, okfs, ofeats = store.obs.dump(pids[maybe])
            level = store.kf_octave[cand, feats[maybe]]
            fine = ((okfs != cand) & store.kf_valid[okfs]
                    & (store.kf_octave[okfs, ofeats] <= level[idxs] + 1))
            counts = np.bincount(idxs[fine], minlength=int(maybe.sum()))
            n_redundant = int((counts >= th_obs).sum())
            if n_redundant > 0.9 * n_pts:
                store.erase_keyframe(cand)
