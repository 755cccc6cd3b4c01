"""The fused per-frame tracking step: ONE compiled XLA program.

The reference spreads per-frame work over dozens of sequential calls
(extract, stereo match, SearchByProjection, PoseOptimization x2,
SearchLocalPoints...; SURVEY §3.2).  Every separate device call costs a
host<->device round trip — fatal over a remote-TPU tunnel and still
wasteful locally.  Here the WHOLE steady-state tracking step is one
jitted graph:

    images -> ORB extract (+stereo match) -> motion-model matching
    against the last frame's points -> pose LM (4x10, Huber, chi2) ->
    frustum projection + window matching of the local-map candidates ->
    pose LM again -> packed outputs

One dispatch, one device->host sync per frame.  Host keeps only
decisions (keyframe policy, fallbacks) and map bookkeeping.

The local-map candidate set is prepared by the host from the PREVIOUS
frame's local map (one frame stale).  The reference recomputes the local
window mid-frame from the motion-model matches (src/Tracking.cc:1232);
with covisibility-stable motion the stale window is near-identical, and
the host refreshes it right after each frame.  Fallback paths
(reference-KF tracking, relocalization, initialization) stay on the
modular slow path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.ops import frontend, hamming
from orb_slam2_tpu.solvers import pose_lm


class TrackOut(NamedTuple):
    """Device outputs of one fused tracking step: everything float-packable
    in one array (single d2h sync) plus the u32 descriptors."""

    f32_pack: jnp.ndarray     # see unpack_track_out for layout
    desc: jnp.ndarray         # (N,8) u32


class TrackResult(NamedTuple):
    """Host-side unpacked result."""

    Tcw: np.ndarray
    xy: np.ndarray
    angle: np.ndarray
    octave: np.ndarray
    valid: np.ndarray
    ur: np.ndarray
    depth: np.ndarray
    response: np.ndarray
    assign: np.ndarray        # (N,) i32: -1 | [0,L) last slot | [L,L+M) local
    inlier: np.ndarray        # (N,) bool
    vis_local: np.ndarray     # (M,) bool
    n_matches_mm: int
    n_inliers: int


def _octave_compat(last_oct, feat_oct, fwd, bwd):
    """Traced forward/backward octave gate (ref: src/ORBmatcher.cc:1381)."""
    lo = last_oct[:, None]
    fo = feat_oct[None, :]
    band = (fo >= lo - 1) & (fo <= lo + 1)
    return jnp.where(fwd, fo >= lo, jnp.where(bwd, fo <= lo, band))


def _sensor_mode(sensor_stereo) -> str:
    """Accept the legacy bool (True=stereo) or a mode string."""
    if isinstance(sensor_stereo, str):
        return sensor_stereo
    return "stereo" if sensor_stereo else "mono"


def _step_cache_key(s, mode: str):
    """Every settings field the compiled step closes over."""
    return (float(s.fx), float(s.fy), float(s.cx), float(s.cy),
            float(s.bf), int(s.n_features), int(s.n_levels),
            float(s.scale_factor), int(s.ini_th_fast), int(s.min_th_fast),
            int(s.width), int(s.height), str(mode),
            float(getattr(s, "depth_map_factor", 1.0)))


_STEP_CACHE = {}


def build_track_step(settings, sensor_stereo):
    """Memoized on the settings values: a fresh System/Tracker with the
    same configuration reuses the already-traced (and XLA-compiled) step
    instead of re-tracing a new jit wrapper.  (The axon tunnel does not
    serve JAX's persistent compile cache, so without this every System
    instance pays the full 9-40s compile again.)

    `sensor_stereo`: "stereo" | "mono" | "rgbd" (bool accepted: True=
    stereo).  For rgbd the step's img_r input is the FLOAT depth image."""
    mode = _sensor_mode(sensor_stereo)
    key = ("fast",) + _step_cache_key(settings, mode)
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = _build_track_step(settings, mode)
    return _STEP_CACHE[key]


def _build_track_step(settings, mode: str):
    """Returns a jitted step(img_l, img_r, T_pred, last block, local block,
    fwd, bwd) -> TrackOut closure for fixed shapes."""
    s = settings
    sensor_stereo = mode == "stereo"
    fx, fy = np.float32(s.fx), np.float32(s.fy)
    cx, cy = np.float32(s.cx), np.float32(s.cy)
    bf = np.float32(s.bf)
    # NOTE: closure constants must be NUMPY, never jnp — a jnp closure
    # constant permanently downgrades the axon runtime to synchronous
    # ~25ms dispatches (see memory: axon-jnp-closure-constants)
    sf = s.scale_factors().astype(np.float32)
    ls2 = s.level_sigma2().astype(np.float32)
    bounds = np.array([0.0, s.width, 0.0, s.height], np.float32)
    log_sf = float(np.log(s.scale_factor))
    n_levels = s.n_levels
    th_mm = 7.0 if sensor_stereo else 15.0   # ref: Tracking.cc:880
    # RGB-D depth scaling (ref: Frame RGB-D ctor src/Frame.cc:119-171)
    dfac = float(getattr(s, "depth_map_factor", 1.0))
    if abs(dfac - 1.0) > 1e-9 and dfac != 0:
        dfac = 1.0 / dfac

    @jax.jit
    def step(
        img_l, img_r,
        scal,                         # (20,) f32 packed host scalars
        last_f32,                     # (L, 4) [pts xyz, has]
        last_desc,                    # (L, 8) u32 point descriptors
        last_oct, last_angle,         # (L,) device-cached feature fields
        loc_f32,                      # (M, 8) [pts xyz, normal xyz, min, max]
        loc_desc,                     # (M, 8) u32
        loc_excl=None,                # (M,) u8: 1 = skip this candidate
                                      # (bound in last frame / gone bad);
                                      # lets the big loc blocks stay cached
                                      # on device across frames
    ):
        # numpy closures -> traced constants (inlined, axon-safe)
        sf_c = jnp.asarray(sf)
        ls2_c = jnp.asarray(ls2)
        bounds_c = jnp.asarray(bounds)

        # unpack the scalar block (packed on host into ONE upload)
        T_pred = scal[:16].reshape(4, 4)
        fwd = scal[16] > 0.5
        bwd = scal[17] > 0.5
        th_local = scal[18]
        n_cand = scal[19].astype(jnp.int32)
        last_pts = last_f32[:, :3]
        last_has = last_f32[:, 3] > 0.5
        loc_pts = loc_f32[:, :3]
        loc_normal = loc_f32[:, 3:6]
        loc_min = loc_f32[:, 6]
        loc_max = loc_f32[:, 7]
        loc_mask = (jnp.arange(loc_f32.shape[0]) < n_cand)
        if loc_excl is not None:
            loc_mask = loc_mask & (loc_excl == 0)

        # ---- 1. frontend ------------------------------------------------
        if mode == "stereo":
            feats, sm = frontend.extract_stereo_pair(
                img_l, img_r, sf, bf, np.float32(s.fx),
                n_features=s.n_features, n_levels=n_levels,
                scale_factor=s.scale_factor, ini_th=s.ini_th_fast,
                min_th=s.min_th_fast,
            )
            ur, depth = sm.u_right, sm.depth
        elif mode == "rgbd":
            from orb_slam2_tpu.ops import stereo as stereo_ops

            feats = frontend.extract(
                img_l, n_features=s.n_features, n_levels=n_levels,
                scale_factor=s.scale_factor, ini_th=s.ini_th_fast,
                min_th=s.min_th_fast,
            )
            # img_r carries the float depth image; depth lookup at raw
            # keypoints + synthetic right coord (ref: Frame.cc:643-664)
            ur, depth = stereo_ops.depth_from_rgbd(
                feats.xy, feats.valid, img_r, dfac, bf)
        else:
            feats = frontend.extract(
                img_l, n_features=s.n_features, n_levels=n_levels,
                scale_factor=s.scale_factor, ini_th=s.ini_th_fast,
                min_th=s.min_th_fast,
            )
            ur = -jnp.ones(feats.xy.shape[0], jnp.float32)
            depth = -jnp.ones(feats.xy.shape[0], jnp.float32)

        N = feats.xy.shape[0]
        L = last_pts.shape[0]
        M = loc_pts.shape[0]
        f_xy = feats.xy
        f_oct = feats.octave
        f_desc = feats.desc
        f_ang = feats.angle
        f_val = feats.valid

        # ---- 2. motion-model matching (ref SearchByProjection last) -----
        R, t = T_pred[:3, :3], T_pred[:3, 3]
        pc = last_pts @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        urp = u - bf / z
        vis = (
            last_has & (pc[:, 2] > 0)
            & (u >= bounds_c[0]) & (u < bounds_c[1])
            & (v >= bounds_c[2]) & (v < bounds_c[3])
        )
        oct_ok = _octave_compat(last_oct, f_oct, fwd, bwd)
        has_r = ur[None, :] >= 0
        dmat = hamming.distance_matrix(last_desc, f_desc)

        def mm_match(th):
            radius = th * sf_c[last_oct]
            du = jnp.abs(u[:, None] - f_xy[None, :, 0])
            dv = jnp.abs(v[:, None] - f_xy[None, :, 1])
            window = (du < radius[:, None]) & (dv < radius[:, None])
            r_ok = ~has_r | (jnp.abs(urp[:, None] - ur[None, :])
                             < radius[:, None])
            compat = window & oct_ok & r_ok & vis[:, None] & f_val[None, :]
            d = jnp.where(compat, dmat, hamming.MAX_DIST)
            idx = jnp.argmin(d, 1).astype(jnp.int32)
            best = jnp.min(d, 1)
            ok = vis & (best <= hamming.TH_HIGH)
            ok = hamming.rotation_histogram_filter(
                last_angle, f_ang[idx], ok)
            # scatter-min duplicate resolution
            big = jnp.int32(2147483647)
            key = best.astype(jnp.int32) * L \
                + jnp.arange(L, dtype=jnp.int32)
            key = jnp.where(ok, key, big)
            bk = jnp.full((N,), big, jnp.int32).at[idx].min(key)
            ok = ok & (bk[idx] == key)
            return idx, best, ok

        idx1, _, ok1 = mm_match(th_mm)
        n1 = jnp.sum(ok1)
        idx2, _, ok2 = mm_match(2.0 * th_mm)
        use2 = n1 < 20
        mm_idx = jnp.where(use2, idx2, idx1)
        mm_ok = jnp.where(use2, ok2, ok1)
        n_mm = jnp.sum(mm_ok)

        # per-feature binding after motion match: slot in [0, L)
        assign = jnp.full((N,), -1, jnp.int32)
        assign = assign.at[jnp.where(mm_ok, mm_idx, N)].set(
            jnp.arange(L, dtype=jnp.int32), mode="drop")

        # ---- 3. pose optimization 1 -------------------------------------
        def pose_obs(assign_slots, src_pts):
            bound = assign_slots >= 0
            slots = jnp.maximum(assign_slots, 0)
            pts = src_pts[slots]
            uv = jnp.stack([f_xy[:, 0], f_xy[:, 1], ur], -1)
            inv_s2 = 1.0 / ls2_c[f_oct]
            return pose_lm.PoseObs(pts, uv, inv_s2, bound & f_val)

        all_pts_1 = last_pts
        obs1 = pose_obs(assign, all_pts_1)
        T1, inl1, _ = pose_lm.optimize_pose.__wrapped__(
            T_pred, obs1, fx, fy, cx, cy, bf, 4, 10)
        # drop outlier bindings (ref: Tracking.cc:905-918)
        assign = jnp.where(inl1 | (assign < 0), assign, -1)

        # ---- 4. local-map candidates: frustum + window match ------------
        Rl, tl = T1[:3, :3], T1[:3, 3]
        pcl = loc_pts @ Rl.T + tl
        zl = jnp.maximum(pcl[:, 2], 1e-6)
        ul = fx * pcl[:, 0] / zl + cx
        vl = fy * pcl[:, 1] / zl + cy
        url = ul - bf / zl
        Ow = -Rl.T @ tl
        po = loc_pts - Ow
        dist = jnp.linalg.norm(po, axis=1)
        dist_s = jnp.maximum(dist, 1e-9)
        view_cos = jnp.sum(po * loc_normal, 1) / dist_s
        ratio = jnp.maximum(loc_max, 1e-9) / dist_s
        level = jnp.clip(
            jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_sf),
            0, n_levels - 1).astype(jnp.int32)
        vis_l = (
            loc_mask & (pcl[:, 2] > 0)
            & (ul >= bounds_c[0]) & (ul < bounds_c[1])
            & (vl >= bounds_c[2]) & (vl < bounds_c[3])
            & (dist >= 0.8 * loc_min) & (dist <= 1.2 * loc_max)
            & (view_cos > 0.5)
        )
        r0 = jnp.where(view_cos > 0.998, 2.5, 4.0)
        radius = r0 * th_local * sf_c[level]
        du = jnp.abs(ul[:, None] - f_xy[None, :, 0])
        dv = jnp.abs(vl[:, None] - f_xy[None, :, 1])
        window = (du < radius[:, None]) & (dv < radius[:, None])
        oct_ok_l = (
            (f_oct[None, :] >= level[:, None] - 1)
            & (f_oct[None, :] <= level[:, None])
        )
        has_r2 = ur[None, :] >= 0
        r_ok2 = ~has_r2 | (jnp.abs(url[:, None] - ur[None, :])
                           < radius[:, None])
        free = f_val & (assign < 0)
        compat = window & oct_ok_l & r_ok2 & vis_l[:, None] & free[None, :]
        dmat_l = hamming.distance_matrix(loc_desc, f_desc)
        d = jnp.where(compat, dmat_l, hamming.MAX_DIST)
        lidx = jnp.argmin(d, 1).astype(jnp.int32)
        lbest = jnp.min(d, 1)
        d2 = d.at[jnp.arange(M), lidx].set(hamming.MAX_DIST)
        lsecond = jnp.min(d2, 1)
        same_lvl = f_oct[lidx] == f_oct[jnp.argmin(d2, 1)]
        ratio_ok = ~same_lvl | (
            lbest.astype(jnp.float32) <= 0.8 * lsecond.astype(jnp.float32))
        lok = vis_l & (lbest <= hamming.TH_HIGH) & ratio_ok
        big = jnp.int32(2147483647)
        key = lbest.astype(jnp.int32) * M + jnp.arange(M, dtype=jnp.int32)
        key = jnp.where(lok, key, big)
        bk = jnp.full((N,), big, jnp.int32).at[lidx].min(key)
        lok = lok & (bk[lidx] == key)

        assign = assign.at[jnp.where(lok, lidx, N)].set(
            L + jnp.arange(M, dtype=jnp.int32), mode="drop")

        # ---- 5. pose optimization 2 -------------------------------------
        all_pts = jnp.concatenate([last_pts, loc_pts], 0)   # (L+M, 3)
        obs2 = pose_obs(assign, all_pts)
        T2, inl2, n_in = pose_lm.optimize_pose.__wrapped__(
            T1, obs2, fx, fy, cx, cy, bf, 4, 10)

        # ---- 6. pack outputs (ONE f32 buffer = one d2h sync; the u32
        # descriptors ride along bitcast to f32 — a d2h pull is a plain
        # memcpy, so the bit patterns survive) ----------------------------
        f32_pack = jnp.concatenate([
            T2.reshape(-1),                              # 16
            jnp.stack([n_mm.astype(jnp.float32),
                       n_in.astype(jnp.float32)]),       # 2
            f_xy.reshape(-1),                            # 2N
            f_ang,                                       # N
            f_oct.astype(jnp.float32),                   # N
            f_val.astype(jnp.float32),                   # N
            ur, depth,                                   # 2N
            feats.response,                              # N
            assign.astype(jnp.float32),                  # N
            (inl2 & (assign >= 0)).astype(jnp.float32),  # N
            vis_l.astype(jnp.float32),                   # M
            jax.lax.bitcast_convert_type(
                f_desc, jnp.float32).reshape(-1),        # 8N
        ])
        return TrackOut(f32_pack, f_desc)

    return step


# number of trailing diagnostic floats in the CHAINED step's pack
# (n_th, n_vis, widened, inl1, |dt| of solve-vs-prediction correction,
# rot-angle deg of that correction) — drives the host innovation gate
N_DIAG = 6


def unpack_track_out(out: TrackOut, n: int, m: int,
                     buf: Optional[np.ndarray] = None) -> TrackResult:
    """One blocking pull of the packed buffer, then split on host.

    Returns the result with `desc` recovered from the bitcast tail —
    the separate TrackOut.desc device array is never pulled.  Pass a
    pre-pulled `buf` to avoid a second host copy when the caller also
    reads the diagnostic tail."""
    if buf is None:
        buf = np.asarray(out.f32_pack)
    Tcw = buf[:16].reshape(4, 4).astype(np.float32)
    n_mm = int(buf[16])
    n_in = int(buf[17])
    o = 18
    xy = buf[o:o + 2 * n].reshape(n, 2); o += 2 * n
    angle = buf[o:o + n]; o += n
    octave = buf[o:o + n].astype(np.int32); o += n
    valid = buf[o:o + n] > 0.5; o += n
    ur = buf[o:o + n]; o += n
    depth = buf[o:o + n]; o += n
    response = buf[o:o + n]; o += n
    assign = buf[o:o + n].astype(np.int32); o += n
    inlier = buf[o:o + n] > 0.5; o += n
    vis_local = buf[o:o + m] > 0.5; o += m
    desc = buf[o:o + 8 * n].view(np.uint32).reshape(n, 8)
    return TrackResult(
        Tcw, xy.astype(np.float32), angle.astype(np.float32), octave,
        valid, ur.astype(np.float32), depth.astype(np.float32),
        response.astype(np.float32), assign, inlier, vis_local,
        n_mm, n_in,
    ), desc


# ---------------------------------------------------------------------------
# Chained (pipelined) variant: the step consumes the PREVIOUS step's
# device-resident outputs and gathers point data from the DEVICE MAP
# MIRROR at execution time (slam/device_map.py).  Frame t+1 is dispatched
# before frame t's results are pulled; because positions come from the
# mirror (which the host flushes after every map mutation), bundle
# adjustment reaches in-flight frames and the chain never goes stale.
# The step outputs per-feature POINT IDS directly, so the host does no
# slot bookkeeping at all.
# ---------------------------------------------------------------------------

class ChainState(NamedTuple):
    """Device-resident per-frame state threaded between steps."""

    xy: jnp.ndarray          # (N, 2)
    ur: jnp.ndarray          # (N,)
    octave: jnp.ndarray      # (N,)
    angle: jnp.ndarray       # (N,)
    desc: jnp.ndarray        # (N, 8) u32
    pid: jnp.ndarray         # (N,) i32 bound map-point id or -1
    T_cur: jnp.ndarray       # (4, 4)
    velocity: jnp.ndarray    # (4, 4) T_cur @ inv(T_prev); carried directly
                             # (recomputing it via a double closed-form
                             # inverse loses ~3 cm to f32 non-orthogonality,
                             # a full matching window)


def build_track_step_chained(settings, sensor_stereo):
    """Memoized like build_track_step (same rationale).  All three
    sensors: for rgbd the step's img_r input is the FLOAT depth image
    (same contract as the fast step)."""
    mode = _sensor_mode(sensor_stereo)
    key = ("chain",) + _step_cache_key(settings, mode)
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = _build_track_step_chained(settings, mode)
    return _STEP_CACHE[key]


def _build_track_step_chained(settings, mode):
    """Returns step(img_l, img_r, chain, mir_f32, mir_desc, cand_pids,
    scal) -> (TrackOut, ChainState)."""
    s = settings
    sensor_stereo = _sensor_mode(mode) == "stereo"
    mode = _sensor_mode(mode)
    fx, fy = np.float32(s.fx), np.float32(s.fy)
    cx, cy = np.float32(s.cx), np.float32(s.cy)
    bf = np.float32(s.bf)
    sf = s.scale_factors().astype(np.float32)
    ls2 = s.level_sigma2().astype(np.float32)
    bounds = np.array([0.0, s.width, 0.0, s.height], np.float32)
    log_sf = float(np.log(s.scale_factor))
    n_levels = s.n_levels
    th_mm = 7.0 if sensor_stereo else 15.0
    baseline = np.float32(s.baseline)
    # RGB-D depth scaling (ref: Frame RGB-D ctor src/Frame.cc:119-171)
    dfac = float(getattr(s, "depth_map_factor", 1.0))
    if abs(dfac - 1.0) > 1e-9 and dfac != 0:
        dfac = 1.0 / dfac

    @jax.jit
    def step(img_l, img_r, chain: ChainState, mir_f32, mir_desc,
             cand_pids, scal):
        sf_c = jnp.asarray(sf)
        ls2_c = jnp.asarray(ls2)
        bounds_c = jnp.asarray(bounds)

        th_local = scal[0]

        # gather chained + candidate point data from the mirror
        cpid = jnp.maximum(chain.pid, 0)
        last_rows = mir_f32[cpid]                       # (L, 9)
        last_pts = last_rows[:, 0:3]
        last_has = (chain.pid >= 0) & (last_rows[:, 8] > 0.5)

        qpid = jnp.maximum(cand_pids, 0)
        loc_rows = mir_f32[qpid]                        # (M, 9)
        loc_pts = loc_rows[:, 0:3]
        loc_normal = loc_rows[:, 3:6]
        loc_min = loc_rows[:, 6]
        loc_max = loc_rows[:, 7]
        loc_desc = mir_desc[qpid]
        # a candidate is usable if it exists, is alive, and is not
        # already carried by the chain (device-side exclusion)
        carried = jnp.any(
            (cand_pids[:, None] == chain.pid[None, :])
            & last_has[None, :], axis=1)
        loc_mask = (cand_pids >= 0) & (loc_rows[:, 8] > 0.5) & ~carried

        import orb_slam2_tpu.geometry.se3 as se3_geo

        velocity = chain.velocity
        T_pred = velocity @ chain.T_cur
        # relative z-motion gate uses inv(velocity)'s z-translation
        vel_inv = se3_geo.inverse(velocity)
        fwd = jnp.logical_and(sensor_stereo, vel_inv[2, 3] > baseline)
        bwd = jnp.logical_and(sensor_stereo, -vel_inv[2, 3] > baseline)

        # ---- frontend -----------------------------------------------------
        if sensor_stereo:
            feats, sm = frontend.extract_stereo_pair(
                img_l, img_r, sf, bf, np.float32(s.fx),
                n_features=s.n_features, n_levels=n_levels,
                scale_factor=s.scale_factor, ini_th=s.ini_th_fast,
                min_th=s.min_th_fast,
            )
            ur, depth = sm.u_right, sm.depth
        elif mode == "rgbd":
            from orb_slam2_tpu.ops import stereo as stereo_ops

            feats = frontend.extract(
                img_l, n_features=s.n_features, n_levels=n_levels,
                scale_factor=s.scale_factor, ini_th=s.ini_th_fast,
                min_th=s.min_th_fast,
            )
            # img_r carries the float depth image (same contract as the
            # fast step; ref: Frame.cc ComputeStereoFromRGBD)
            ur, depth = stereo_ops.depth_from_rgbd(
                feats.xy, feats.valid, img_r, dfac, bf)
        else:
            feats = frontend.extract(
                img_l, n_features=s.n_features, n_levels=n_levels,
                scale_factor=s.scale_factor, ini_th=s.ini_th_fast,
                min_th=s.min_th_fast,
            )
            ur = -jnp.ones(feats.xy.shape[0], jnp.float32)
            depth = -jnp.ones(feats.xy.shape[0], jnp.float32)

        N = feats.xy.shape[0]
        L = last_pts.shape[0]
        M = loc_pts.shape[0]
        f_xy, f_oct, f_desc = feats.xy, feats.octave, feats.desc
        f_ang, f_val = feats.angle, feats.valid

        # ---- motion-model matching ---------------------------------------
        R, t = T_pred[:3, :3], T_pred[:3, 3]
        pc = last_pts @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        urp = u - bf / z
        vis = (
            last_has & (pc[:, 2] > 0)
            & (u >= bounds_c[0]) & (u < bounds_c[1])
            & (v >= bounds_c[2]) & (v < bounds_c[3])
        )
        oct_ok = _octave_compat(chain.octave, f_oct, fwd, bwd)
        has_r = ur[None, :] >= 0
        dmat = hamming.distance_matrix(chain.desc, f_desc)

        def mm_match(th):
            radius = th * sf_c[chain.octave]
            du = jnp.abs(u[:, None] - f_xy[None, :, 0])
            dv = jnp.abs(v[:, None] - f_xy[None, :, 1])
            window = (du < radius[:, None]) & (dv < radius[:, None])
            r_ok = ~has_r | (jnp.abs(urp[:, None] - ur[None, :])
                             < radius[:, None])
            compat = window & oct_ok & r_ok & vis[:, None] & f_val[None, :]
            d = jnp.where(compat, dmat, hamming.MAX_DIST)
            idx = jnp.argmin(d, 1).astype(jnp.int32)
            best = jnp.min(d, 1)
            ok = vis & (best <= hamming.TH_HIGH)
            ok = hamming.rotation_histogram_filter(
                chain.angle, f_ang[idx], ok)
            big = jnp.int32(2147483647)
            key = best.astype(jnp.int32) * L \
                + jnp.arange(L, dtype=jnp.int32)
            key = jnp.where(ok, key, big)
            bk = jnp.full((N,), big, jnp.int32).at[idx].min(key)
            ok = ok & (bk[idx] == key)
            return idx, best, ok

        idx1, _, ok1 = mm_match(th_mm)
        n1 = jnp.sum(ok1)
        idx2, _, ok2 = mm_match(2.0 * th_mm)
        # Widen when matches are weak in ABSOLUTE terms (ref:
        # Tracking.cc:842-847 does th -> 2*th below 20 matches) or
        # RELATIVE to how many carried points project in-frustum: a
        # blind pipelined frame whose prediction has drifted loses
        # matches long before the absolute floor (699 -> 276 in the
        # divergence trace), and the 2x window is the only mechanism
        # that can still see the true correspondences at that point.
        n_vis = jnp.sum(vis)
        use2 = (2 * n1 < n_vis) | (n1 < 20)
        mm_idx = jnp.where(use2, idx2, idx1)
        mm_ok = jnp.where(use2, ok2, ok1)
        n_mm = jnp.sum(mm_ok)

        # per-feature slot + pid after motion match
        assign = jnp.full((N,), -1, jnp.int32)
        assign = assign.at[jnp.where(mm_ok, mm_idx, N)].set(
            jnp.arange(L, dtype=jnp.int32), mode="drop")

        def pose_obs(assign_slots, src_pts):
            bound = assign_slots >= 0
            slots = jnp.maximum(assign_slots, 0)
            pts = src_pts[slots]
            uv = jnp.stack([f_xy[:, 0], f_xy[:, 1], ur], -1)
            inv_s2 = 1.0 / ls2_c[f_oct]
            return pose_lm.PoseObs(pts, uv, inv_s2, bound & f_val)

        obs1 = pose_obs(assign, last_pts)
        T1, inl1, _ = pose_lm.optimize_pose.__wrapped__(
            T_pred, obs1, fx, fy, cx, cy, bf, 4, 10)
        assign = jnp.where(inl1 | (assign < 0), assign, -1)

        # ---- local-map candidates ------------------------------------------
        Rl, tl = T1[:3, :3], T1[:3, 3]
        pcl = loc_pts @ Rl.T + tl
        zl = jnp.maximum(pcl[:, 2], 1e-6)
        ul = fx * pcl[:, 0] / zl + cx
        vl = fy * pcl[:, 1] / zl + cy
        url = ul - bf / zl
        Ow = -Rl.T @ tl
        po = loc_pts - Ow
        dist = jnp.linalg.norm(po, axis=1)
        dist_s = jnp.maximum(dist, 1e-9)
        view_cos = jnp.sum(po * loc_normal, 1) / dist_s
        ratio = jnp.maximum(loc_max, 1e-9) / dist_s
        level = jnp.clip(
            jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_sf),
            0, n_levels - 1).astype(jnp.int32)
        vis_l = (
            loc_mask & (pcl[:, 2] > 0)
            & (ul >= bounds_c[0]) & (ul < bounds_c[1])
            & (vl >= bounds_c[2]) & (vl < bounds_c[3])
            & (dist >= 0.8 * loc_min) & (dist <= 1.2 * loc_max)
            & (view_cos > 0.5)
        )
        r0 = jnp.where(view_cos > 0.998, 2.5, 4.0)
        radius = r0 * th_local * sf_c[level]
        du = jnp.abs(ul[:, None] - f_xy[None, :, 0])
        dv = jnp.abs(vl[:, None] - f_xy[None, :, 1])
        window = (du < radius[:, None]) & (dv < radius[:, None])
        oct_ok_l = (
            (f_oct[None, :] >= level[:, None] - 1)
            & (f_oct[None, :] <= level[:, None])
        )
        has_r2 = ur[None, :] >= 0
        r_ok2 = ~has_r2 | (jnp.abs(url[:, None] - ur[None, :])
                           < radius[:, None])
        free = f_val & (assign < 0)
        compat = window & oct_ok_l & r_ok2 & vis_l[:, None] & free[None, :]
        dmat_l = hamming.distance_matrix(loc_desc, f_desc)
        d = jnp.where(compat, dmat_l, hamming.MAX_DIST)
        lidx = jnp.argmin(d, 1).astype(jnp.int32)
        lbest = jnp.min(d, 1)
        d2 = d.at[jnp.arange(M), lidx].set(hamming.MAX_DIST)
        lsecond = jnp.min(d2, 1)
        same_lvl = f_oct[lidx] == f_oct[jnp.argmin(d2, 1)]
        ratio_ok = ~same_lvl | (
            lbest.astype(jnp.float32) <= 0.8 * lsecond.astype(jnp.float32))
        lok = vis_l & (lbest <= hamming.TH_HIGH) & ratio_ok
        big = jnp.int32(2147483647)
        key = lbest.astype(jnp.int32) * M + jnp.arange(M, dtype=jnp.int32)
        key = jnp.where(lok, key, big)
        bk = jnp.full((N,), big, jnp.int32).at[lidx].min(key)
        lok = lok & (bk[lidx] == key)
        assign = assign.at[jnp.where(lok, lidx, N)].set(
            L + jnp.arange(M, dtype=jnp.int32), mode="drop")

        all_pts = jnp.concatenate([last_pts, loc_pts], 0)
        obs2 = pose_obs(assign, all_pts)
        T2, inl2, n_in = pose_lm.optimize_pose.__wrapped__(
            T1, obs2, fx, fy, cx, cy, bf, 4, 10)

        inlier = inl2 & (assign >= 0)
        # resolve per-feature point ids directly on device
        all_pids = jnp.concatenate([chain.pid, cand_pids], 0)
        feat_pid = jnp.where(
            assign >= 0, all_pids[jnp.maximum(assign, 0)], -1)

        f32_pack = jnp.concatenate([
            T2.reshape(-1),                              # 16
            jnp.stack([n_mm.astype(jnp.float32),
                       n_in.astype(jnp.float32)]),       # 2
            f_xy.reshape(-1),                            # 2N
            f_ang,                                       # N
            f_oct.astype(jnp.float32),                   # N
            f_val.astype(jnp.float32),                   # N
            ur, depth,                                   # 2N
            feats.response,                              # N
            feat_pid.astype(jnp.float32),                # N  (pid, not slot)
            inlier.astype(jnp.float32),                  # N
            vis_l.astype(jnp.float32),                   # M
            jax.lax.bitcast_convert_type(
                f_desc, jnp.float32).reshape(-1),        # 8N
            # trailing diagnostics (always pulled, drive the host
            # innovation gate + ORB_DEBUG_TRACK traces): th-window
            # matches, carried points visible, widened-window used?,
            # inliers after the first (motion-only) solve, |t| and
            # rot-angle of the correction the solve applied to the
            # prediction
            jnp.stack([
                n1.astype(jnp.float32),
                n_vis.astype(jnp.float32),
                use2.astype(jnp.float32),
                jnp.sum(inl1 & obs1.mask).astype(jnp.float32),
                jnp.linalg.norm(
                    (T2 @ se3_geo.inverse(T_pred))[:3, 3]),
                jnp.degrees(jnp.arccos(jnp.clip(
                    (jnp.trace((T2 @ se3_geo.inverse(T_pred))[:3, :3])
                     - 1.0) / 2.0, -1.0, 1.0))),
            ]),                                          # N_DIAG
        ])
        # chain-poisoning guard: a weak pose solve (few inliers) must not
        # become the next frame's anchor — carry the motion-model
        # prediction and the previous velocity instead, and drop the
        # feature->point bindings so the next motion match can't lock
        # onto a wrong geometry.  The host sees the weak n_in and runs
        # its fallback; the chain stays on the motion-model rail until
        # a confident solve or a host re-anchor.
        trust = n_in >= 30
        T_next = jnp.where(trust, T2, T_pred)
        # Damped velocity update.  The raw update V = T2 inv(T_prev)
        # folds the full solve innovation into the next prediction:
        # with pose error e(t) the blind CV prediction error becomes
        # 2e(t) - e(t-1), which DOUBLES every frame once window-biased
        # matching can no longer pull the solve all the way back
        # (measured: dt 0.015 -> 1.5 m over 6 blind frames).  Letting
        # only half the innovation enter the velocity
        # (V' = exp(0.5 log(V_meas inv(V))) V) keeps the loop stable
        # while still tracking real accelerations with ~1-frame lag.
        # The host re-anchors with its exact velocity every refresh,
        # so the lag never accumulates.
        v_meas = T2 @ se3_geo.inverse(chain.T_cur)
        dv = se3_geo.log(v_meas @ se3_geo.inverse(velocity))
        v_damped = se3_geo.exp(0.5 * dv) @ velocity
        new_chain = ChainState(
            xy=f_xy, ur=ur, octave=f_oct, angle=f_ang, desc=f_desc,
            pid=jnp.where(trust & inlier, feat_pid, -1),
            T_cur=T_next,
            velocity=jnp.where(trust, v_damped, velocity),
        )
        return TrackOut(f32_pack, f_desc), new_chain

    return step
