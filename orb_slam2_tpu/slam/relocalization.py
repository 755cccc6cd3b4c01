"""Relocalization: recover a lost camera from the BoW database.

Equivalent of Tracking::Relocalization (ref: src/Tracking.cc:1342-1503):
BoW candidate retrieval, node-aligned matching (>=15), EPnP RANSAC,
pose optimization (>=10 inliers), and up to two guided-reprojection
rounds until >=50 inliers.
"""

from __future__ import annotations

import os as _os

import jax.numpy as jnp
import numpy as np

_DEBUG_TRACK = _os.environ.get("ORB_DEBUG_TRACK", "0") == "1"

from orb_slam2_tpu.config import Settings
from orb_slam2_tpu.ops import matching
from orb_slam2_tpu.slam.map_store import MapStore
from orb_slam2_tpu.solvers import epnp
from orb_slam2_tpu.utils import bucket_size, pad_rows


class Relocalizer:
    def __init__(self, settings: Settings, store: MapStore, kf_database):
        self.s = settings
        self.store = store
        self.db = kf_database
        self.level_sigma2 = settings.level_sigma2().astype(np.float32)
        self.scale_factors = settings.scale_factors().astype(np.float32)
        self.log_scale = float(np.log(settings.scale_factor))
        w, h = settings.width, settings.height
        self.bounds = np.array([0.0, w, 0.0, h], np.float32)
        self.rng = np.random.default_rng(0)

    def relocalize(self, frame, tracker) -> bool:
        store = self.store
        tracker._assign_frame_bow(frame)
        if not (frame.feats.word >= 0).any():
            return False
        candidates = self.db.detect_reloc_candidates(
            frame.feats.word, store)
        if _DEBUG_TRACK:
            print(f"[dbg]   reloc f{frame.frame_id} candidates="
                  f"{candidates[:8]}", flush=True)
        if not candidates:
            return False

        for kf in candidates[:8]:
            if not store.kf_valid[kf]:
                continue
            kf_bind = store.kf_obs[kf]
            kf_has = (kf_bind >= 0)
            kf_pids = np.where(kf_has, kf_bind, 0)
            kf_has = kf_has & store.pt_valid[kf_pids]
            m = matching.search_by_nodes(
                store.kf_device(kf, "desc"), store.kf_device(kf, "node"),
                jnp.asarray(kf_has), store.kf_device(kf, "angle"),
                frame.feats.device("desc"), frame.feats.device("node"),
                frame.feats.device("valid"), frame.feats.device("angle"),
                ratio=0.75,
            )
            idx, dist, ok = matching.to_host(m)
            ok = ok & kf_has
            if _DEBUG_TRACK:
                print(f"[dbg]   reloc kf={kf} bow={int(ok.sum())}",
                      flush=True)
            if int(ok.sum()) < 15:
                continue

            # EPnP RANSAC on the 3D-2D matches (ref: PnPsolver)
            rows = np.nonzero(ok)[0]
            # hard-cap at the top of the precompiled bucket ladder
            # (2x bucket_reloc, precompile.py), keeping the best-scoring
            # matches: match counts past the ladder would trigger a
            # multi-second mid-run XLA compile exactly while tracking is
            # LOST (ADVICE r4 low)
            cap = 2 * self.s.bucket_reloc
            if len(rows) > cap:
                rows = rows[np.argsort(dist[rows], kind="stable")[:cap]]
            pts_w = store.pt_pos[kf_pids[rows]]
            uv = frame.feats.xy[idx[rows]]
            oct_f = frame.feats.octave[idx[rows]]
            max_err2 = (5.991 * self.level_sigma2[oct_f]).astype(np.float32)
            n = len(rows)
            # pinned bucket (Settings.bucket_reloc): most reloc attempts
            # carry well under 256 BoW matches, so the PnP RANSAC
            # compiles once — precompilable by System.precompile()
            n_pad = bucket_size(n, self.s.bucket_reloc)
            pad = n_pad - n

            def padr(a, fill=0.0):
                return np.concatenate(
                    [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]
                ) if pad else a

            mask = padr(np.ones(n, bool), False)
            sample = self.rng.integers(0, n, (128, 6)).astype(np.int32)
            res = epnp.solve_pnp_ransac(
                jnp.asarray(padr(pts_w.astype(np.float32))),
                jnp.asarray(padr(uv.astype(np.float32))),
                jnp.asarray(padr(max_err2)),
                jnp.asarray(mask),
                jnp.asarray(sample),
                jnp.float32(self.s.fx), jnp.float32(self.s.fy),
                jnp.float32(self.s.cx), jnp.float32(self.s.cy),
            )
            if not bool(res.success):
                if _DEBUG_TRACK:
                    print(f"[dbg]   reloc kf={kf} ransac FAILED", flush=True)
                continue
            frame.Tcw = np.asarray(res.Tcw, np.float32)
            frame.bindings[:] = -1
            inl = np.asarray(res.inliers)[:n]
            frame.bindings[idx[rows[inl]]] = kf_pids[rows[inl]]

            n_good = tracker._optimize_pose(frame)
            if n_good < 10:
                continue
            tracker._discard_outliers(frame)

            # guided reprojection rounds (ref :1434-1483)
            for round_th, round_dist in ((10.0, 100), (3.0, 64)):
                if n_good >= 50:
                    break
                already = set(
                    int(p) for p in frame.bindings[frame.bindings >= 0])
                cand_rows = np.nonzero(kf_has)[0]
                cand_rows = np.array(
                    [r for r in cand_rows
                     if int(kf_pids[r]) not in already], np.int64)
                if len(cand_rows) == 0:
                    break
                pid_c = kf_pids[cand_rows]
                free = frame.feats.valid & (frame.bindings < 0)
                # pad to the keyframe feature capacity: cand_rows is
                # bounded by it, so this is ONE precompilable shape (an
                # unpadded or freely-bucketed shape would compile a
                # fresh XLA program mid-relocalization — measured 3-5 s
                # per shape on the TPU tunnel, while tracking is LOST)
                C = store.n_feat
                cmask = pad_rows(np.ones(len(cand_rows), bool), C, False)
                m2 = matching.search_reloc_points(
                    jnp.asarray(pad_rows(
                        store.pt_pos[pid_c].astype(np.float32), C)),
                    jnp.asarray(cmask),
                    jnp.asarray(pad_rows(store.pt_desc[pid_c], C)),
                    jnp.asarray(pad_rows(store.pt_min_dist[pid_c], C)),
                    jnp.asarray(pad_rows(store.pt_max_dist[pid_c], C)),
                    jnp.asarray(pad_rows(store.kf_angle[kf][cand_rows], C)),
                    jnp.asarray(frame.Tcw),
                    frame.feats.device("xy"), frame.feats.device("octave"),
                    frame.feats.device("desc"), frame.feats.device("angle"),
                    jnp.asarray(free),
                    jnp.float32(self.s.fx), jnp.float32(self.s.fy),
                    jnp.float32(self.s.cx), jnp.float32(self.s.cy),
                    jnp.asarray(self.bounds),
                    jnp.asarray(self.scale_factors),
                    self.log_scale, self.s.n_levels,
                    jnp.float32(round_th), orb_dist=round_dist,
                )
                idx2, _, ok2 = matching.to_host(m2)
                for r in np.nonzero(ok2[: len(cand_rows)])[0]:
                    frame.bindings[idx2[r]] = pid_c[r]
                n_good = tracker._optimize_pose(frame)
                tracker._discard_outliers(frame)

            if _DEBUG_TRACK:
                print(f"[dbg]   reloc kf={kf} n_good={n_good}", flush=True)
            if n_good >= 50:
                return True
        return False
