"""Tracking: the per-frame front-end state machine.

Host-side equivalent of Tracking (ref: src/Tracking.cc, 1593 LoC): frame
construction, monocular/stereo initialization, pose tracking via motion
model / reference keyframe / relocalization, local-map tracking, the
keyframe decision, localization-mode visual odometry, and trajectory
bookkeeping.  All heavy math (matching, frustum culling, pose LM) runs
as fixed-shape jitted ops; this module owns only control flow and the
map bookkeeping, which is exactly the split SURVEY.md §7 prescribes
("decisions on host, inner math on device").
"""

from __future__ import annotations

import enum
import os as _os
from dataclasses import dataclass, field
from typing import ClassVar, List, Optional

import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu import logs
from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.ops import matching
from orb_slam2_tpu.slam import track_step as ts
from orb_slam2_tpu.slam.frame import Frame, FrameBuilder
from orb_slam2_tpu.slam.map_store import FrameFeatures, MapStore
from orb_slam2_tpu.solvers import initializer as mono_init
from orb_slam2_tpu.solvers import pose_lm
from orb_slam2_tpu.utils import StageTimers, StickyBuckets, bucket_size, pad_rows


# per-frame tracking diagnostics (ORB_DEBUG_TRACK=1): match counts,
# fallback triggers, chain re-anchors — for perf/robustness triage
_DEBUG_TRACK = _os.environ.get("ORB_DEBUG_TRACK", "0") == "1"


def innovation_px(fx: float, dt_m: float, drot_deg: float,
                  zmed_m: float) -> float:
    """Solve-vs-prediction correction expressed in image pixels.

    A translation error dt at the scene median depth moves features by
    ~fx*dt/z; a rotation error moves them by ~fx*angle (small-angle).
    The sum is directly comparable to the matching window th_mm.

    Without a depth estimate (monocular chains before the first anchor,
    zmed<=0) the translation term is unknowable but the rotation term
    needs no depth — keep it so the drift gate stays active for mono
    chained tracking instead of degrading to the bare 15-degree cap."""
    if zmed_m <= 0:
        return float(fx) * float(np.radians(drot_deg))
    return float(fx) * (dt_m / zmed_m + float(np.radians(drot_deg)))


@dataclass(frozen=True)
class GateParams:
    """Drift-gate thresholds, DERIVED from the camera/feature regime
    instead of hard-coded to the bench circuit (VERDICT r4 #5).

    Derivation model: the pipelined chain extrapolates blind for at
    most `chain_max_age` frames, and window-biased matching can absorb
    at most ~1-2 matching windows of prediction error per solve before
    it stops being unbiased.  So every threshold is a multiple of the
    window (th_mm) scaled by the chain length, and every inlier floor
    is a fraction of the feature budget:

      nonstrong_w   = 2 * chain_max_age   (8 windows at the default 4):
                      past this, only a STRONG solve is trusted — an
                      honest velocity-lag correction accumulates ~2
                      windows per blind frame at worst.
      implausible_w = 5 * chain_max_age   (20 windows): no window-
                      biased match set can honestly produce this on any
                      camera motion (measured: a 90-window aliased solve
                      with 112/175 'support').
      rot_cap_deg   = MAX_ANG_VEL * chain_max_age / fps: the largest
                      rotation the velocity model can lag behind in one
                      chain; 0.65 rad/s (fast handheld pan) over 0.4 s
                      at 10 fps = ~15 deg, the measured cap.
      weak/strong/moved floors scale with n_features (2000-feature
      baseline: 30 / 100 / 50 — the aliasing trace peaked at 96
      'inliers', i.e. 4.8% of budget, so strong is 5%).

    The defaults reproduce the round-4 constants exactly at the bench
    regime (2000 features, 10 fps, chain_max_age 4); the pinned cases
    in tests/test_pipeline.py TestDriftGate hold for them."""

    soft_w: float = 1.5
    weak_w: float = 3.0
    nonstrong_w: float = 8.0
    implausible_w: float = 20.0
    rot_cap_deg: float = 15.0
    weak_floor: float = 30.0
    strong_floor: float = 100.0
    moved_floor: float = 50.0
    weak_frac: float = 0.25
    strong_frac: float = 0.5

    MAX_ANG_VEL: ClassVar[float] = 0.65   # rad/s, fast handheld pan

    @classmethod
    def from_settings(cls, settings, chain_max_age: int = 4):
        nf = float(getattr(settings, "n_features", 2000))
        fps = float(getattr(settings, "fps", 10.0) or 10.0)
        rot_cap = np.degrees(cls.MAX_ANG_VEL * chain_max_age / fps)
        return cls(
            nonstrong_w=2.0 * chain_max_age,
            implausible_w=5.0 * chain_max_age,
            rot_cap_deg=float(max(10.0, rot_cap)),
            weak_floor=max(15.0, 0.015 * nf),
            strong_floor=max(50.0, 0.05 * nf),
            moved_floor=max(25.0, 0.025 * nf),
        )


def drift_gate(innov_px_: float, th_mm: float, inl1: float,
               n_vis: float, drot_deg: float = 0.0,
               map_moved: bool = False,
               params: GateParams = GateParams()):
    """Pipelined blind-extrapolation drift gate -> (soft, reject).

    soft   — correction beyond 1.5 matching windows: the prediction is
             drifting; re-anchor the chain from host state.  Healthy
             solves right after keyframe re-anchors show 5-15 px with
             hundreds of inliers (measured), so the threshold is loose.
    reject — the device pose itself is untrustworthy: far outside the
             window AND first-solve support collapsed (true divergence
             measured 699 -> 276 matches), or so large that no in-window
             match set could honestly have produced it.

    STRONG solves (>=100 inliers covering >=50% of the visible
    candidates) are trusted past the 8-window cap: a solve with that
    support is usually a legitimate drift CORRECTION, not divergence —
    measured on the paced bench circuit, the first solve after a
    keyframe's points enter the chain corrects ~90 px of accumulated
    blind-extrapolation drift with 145/203 support; rejecting it (as the
    old unconditional 8-window cap did) turned a recovery into LOST.
    Texture-aliased wrong-but-consistent solves stay out: the measured
    aliasing trace peaked at 96 'inliers' (below the 100 floor) on a
    1.5 m-wrong pose.

    ... but only within a PHYSICALLY PLAUSIBLE correction.  The chain
    extrapolates blind for at most chain_max_age (4) frames, so a
    genuine drift correction is bounded by a few frames of velocity-
    model lag; a correction beyond 20 matching windows or 15 degrees of
    rotation cannot be honest window-biased matching on any real camera
    motion.  Measured incident: an aliased solve jumped 2.2 m / 24 deg
    (innov 631 px) with 112/175 'support' on a collapsed visible set —
    the support test passed it, it became a wrong-pose keyframe, and
    tracking nearly diverged.  The good 90-px correction above stays
    comfortably inside both caps.

    map_moved — the map's EXISTING geometry moved while this frame was
    in flight (store.geo_epoch changed between dispatch and pull: local
    BA writeback, fusion replacement, loop correction, GBA apply).  The
    solve then tracked the MOVED points, so a large innovation vs the
    dispatch-time prediction is expected, and collapsed narrow-window
    support likewise (a 0.4 m fusion snap ~ 36 px at 8 m — beyond even
    the widened window for fine octaves).  Measured incident (revisit,
    probe f180): local BA+fusion pulled the drifted section 0.4 m
    toward the old map; the solve followed with 132/737 support, the
    plain gate read it as divergence, re-track failed, tracking went
    LOST and the loop never closed.  With map_moved, trust any solve
    holding >=50 inliers within the plausibility caps."""
    p = params
    weak = inl1 < max(p.weak_floor, p.weak_frac * n_vis)
    strong = inl1 >= max(p.strong_floor, p.strong_frac * n_vis)
    # DECISIVE: 2x the strong floor AND the strong fraction.  A solve
    # with that support is accepted even past the plausibility caps —
    # the reference itself has no such caps (it never extrapolates
    # blind; any >=30-inlier pose-opt result is accepted,
    # Tracking.cc:968), so the caps exist only to police the pipelined
    # chain's window-biased matching, and a decisive match set cannot
    # be window aliasing (measured aliased incidents peaked at 112/175
    # and 96/133 — far below 2x floor).  Measured r5 incidents that
    # decisive acceptance fixes: a loop correction landing as a 305 px
    # innovation on 636 inliers (map_moved), and the first revisit
    # solve correcting a full orbit of accumulated drift — 154.7 px on
    # 574 inliers with the map NOT moved.
    decisive = (inl1 >= 2.0 * p.strong_floor
                and inl1 >= p.strong_frac * n_vis)
    soft = innov_px_ > p.soft_w * th_mm
    implausible = (innov_px_ > p.implausible_w * th_mm
                   or drot_deg > p.rot_cap_deg) and not decisive
    reject = (innov_px_ > p.weak_w * th_mm and weak) or (
        innov_px_ > p.nonstrong_w * th_mm and not strong) or implausible
    if map_moved and reject and not implausible \
            and inl1 >= p.moved_floor:
        reject = False   # loosen only: the solve followed the moved map
    return soft, reject


class State(enum.Enum):
    """ref: include/Tracking.h:82-88 eTrackingState."""

    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclass
class TrajectoryEntry:
    """Per-frame relative pose record (ref: src/Tracking.cc:489-505)."""

    Tcr: np.ndarray          # frame pose relative to its reference KF
    ref_kf: int
    timestamp: float
    lost: bool


class Tracker:
    def __init__(
        self,
        settings: Settings,
        sensor: Sensor,
        store: MapStore,
        builder: FrameBuilder,
        local_mapper=None,
        kf_database=None,
        relocalizer=None,
    ):
        self.s = settings
        self.sensor = sensor
        self.store = store
        self.builder = builder
        self.local_mapper = local_mapper
        self.kf_database = kf_database
        self.relocalizer = relocalizer

        self.state = State.NO_IMAGES_YET
        self.velocity: Optional[np.ndarray] = None
        self.last_frame: Optional[Frame] = None
        self.current: Optional[Frame] = None
        self.ref_kf: int = -1
        self.local_kfs: List[int] = []
        self.local_pts: np.ndarray = np.zeros(0, np.int64)
        self.last_kf_frame_id = 0
        self.last_reloc_frame_id = -1000
        self.trajectory: List[TrajectoryEntry] = []
        self.only_tracking = False      # localization mode
        self.vo_flag = False            # mbVO (ref: include/Tracking.h)
        self.temporal_points: List[int] = []

        # mono initialization state
        self._init_frame: Optional[Frame] = None
        self._init_prev_matched: Optional[np.ndarray] = None
        self._init_matches: Optional[np.ndarray] = None

        self.min_frames = 0
        self.max_frames = int(settings.fps)
        self.timers = StageTimers()
        self.n_inliers = 0
        self.log = logs.get("tracking")
        self.resets = 0
        self.relocalizations = 0

        self.scale_factors = builder.scale_factors
        self.level_sigma2 = builder.level_sigma2
        self.log_scale = float(np.log(settings.scale_factor))
        self.bounds = np.asarray(builder.bounds, np.float32)

        # device constants
        self._sf_dev = jnp.asarray(self.scale_factors)
        self._bounds_dev = jnp.asarray(self.bounds)

        # fused one-dispatch-per-frame fast path (track_step.py)
        self.use_fast_path = True
        self._fast_step = None
        self._buckets = StickyBuckets(local=settings.bucket_local)
        self._seen_replace_epoch = 0
        self._frames_since_map_refresh = 0
        # device-side cache of the local-candidate block (see _fast_prep)
        self._loc_cache = None
        self._local_window_epoch = 0

        # frame pipelining: dispatch frame t+1 before pulling frame t
        # (results delayed by one frame).  The chained step gathers point
        # data from the device map mirror (slam/device_map.py) and is
        # verified equivalent to the fast step when serialized; TRUE
        # 1-frame-lag pipelining still destabilizes keyframe-heavy
        # sequences because a dispatch issued in the same call as a
        # keyframe insertion cannot see its new points.  Round-2 plan:
        # one-frame keyframe lookahead.  Default OFF.
        self.pipelined = bool(getattr(settings, "pipelined", False))
        # how many dispatched-but-unpulled frames may be in flight: depth
        # d hides the device->host RTT behind d frames of host work
        # (results drain opportunistically as they become ready)
        self.pipeline_depth = int(getattr(settings, "pipeline_depth", 3))
        # re-anchor the chain from host state at least every N frames
        self.chain_max_age = int(getattr(settings, "chain_max_age", 4))
        # drift-gate thresholds derived from the camera/feature regime
        # (VERDICT r4 #5; see GateParams.from_settings)
        self.gate_params = GateParams.from_settings(settings,
                                                    self.chain_max_age)
        self._chain_step = None
        self._chain = None            # device ChainState
        self._pending = []            # FIFO of (TrackOut, meta dict)

    def refresh_calibration(self):
        """Rebuild every camera-dependent cache after a calibration
        hot-swap (ref: Tracking::ChangeCalibration src/Tracking.cc:1553
        sets Frame::mbInitialComputations; here the compiled fast/chained
        steps close over intrinsics, so they are dropped and re-traced)."""
        self.builder.refresh_calibration()
        self.bounds = np.asarray(self.builder.bounds, np.float32)
        self._bounds_dev = jnp.asarray(self.bounds)
        self._fast_step = None
        self._chain_step = None
        self._chain = None
        self._pending = []
        self._loc_cache = None

    # ------------------------------------------------------------------
    # fused fast path: ONE compiled step + ONE sync per steady frame
    # ------------------------------------------------------------------
    def _can_fast(self) -> bool:
        # all three sensors ride the fused step; localization mode does
        # too unless the VO flag is up (the reference then runs motion
        # model + relocalization side by side, src/Tracking.cc:345-390 —
        # that stays on the modular path)
        return (
            self.use_fast_path
            and self.state == State.OK
            and self.velocity is not None
            and not (self.only_tracking and self.vo_flag)
            and len(self.local_pts) > 0
            and self.last_frame is not None
            and (self.current is None or
                 self.current.frame_id >= self.last_reloc_frame_id + 2)
        )

    def _step_mode(self) -> str:
        return {Sensor.STEREO: "stereo", Sensor.RGBD: "rgbd"}.get(
            self.sensor, "mono")

    def _get_fast_step(self):
        if self._fast_step is None:
            self._fast_step = ts.build_track_step(self.s, self._step_mode())
        return self._fast_step

    def _track_fast(self, img_l, img_r, timestamp) -> Optional[np.ndarray]:
        store = self.store
        last = self.last_frame
        with store.lock, self.timers("fast/prep"):
            (scal, last_f32, last_desc, cand, last_pids,
             loc_f32_dev, loc_desc_dev, excl) = self._fast_prep(last)
        step = self._get_fast_step()
        with self.timers("fast/dispatch"):
            img_l_d = self.builder._upload(img_l)
            if img_r is None:
                img_r_d = img_l_d
            elif self.sensor == Sensor.RGBD:
                img_r_d = self.builder._upload_depth(img_r)
            else:
                img_r_d = self.builder._upload(img_r)
            out = step(
                img_l_d, img_r_d, jnp.asarray(scal),
                jnp.asarray(last_f32), jnp.asarray(last_desc),
                last.feats.device("octave"), last.feats.device("angle"),
                loc_f32_dev, loc_desc_dev, jnp.asarray(excl),
            )
            out.f32_pack.copy_to_host_async()  # overlap pull w/ host prep
        return self._fast_finish(out, last, cand, last_pids, timestamp,
                                 len(excl))

    def _fast_prep(self, last):
        """Host-side input assembly for the fused step (under store.lock)."""
        store = self.store
        self._replace_updated_points(last)
        self._update_last_frame()
        T_pred = (self.velocity @ last.Tcw).astype(np.float32)

        # last-frame point block (slots aligned with last frame features)
        bind = last.bindings
        pids = np.where(bind >= 0, bind, 0)
        has = (bind >= 0) & store.pt_valid[pids] & ~last.outlier
        last_pts = store.pt_pos[pids].astype(np.float32)
        last_desc = store.pt_desc[pids]
        last_pids = pids

        # stale local-map candidate BLOCK, cached on device: the ~256KB
        # loc arrays only change when the local window or the point data
        # does (epoch check), so steady frames upload just a tiny
        # per-frame exclusion mask instead of re-shipping the block over
        # the tunnel
        epoch = (self._local_window_epoch, store.map_epoch)
        cache = self._loc_cache
        if cache is None or cache["epoch"] != epoch:
            lp = self.local_pts
            cand = lp[store.pt_valid[lp]]
            M = self._buckets("local", max(len(cand), 1))
            nc = len(cand)
            loc_f32 = np.zeros((M, 8), np.float32)
            loc_f32[:nc, :3] = store.pt_pos[cand]
            loc_f32[:nc, 3:6] = store.pt_normal[cand]
            loc_f32[:nc, 6] = store.pt_min_dist[cand]
            loc_f32[:nc, 7] = store.pt_max_dist[cand]
            cache = dict(
                epoch=epoch, cand=cand, nc=nc, M=M,
                f32=jnp.asarray(loc_f32),
                desc=jnp.asarray(pad_rows(store.pt_desc[cand], M)),
            )
            self._loc_cache = cache
        cand, nc, M = cache["cand"], cache["nc"], cache["M"]
        loc_f32_dev, loc_desc_dev = cache["f32"], cache["desc"]
        # per-frame exclusion: candidates bound in the last frame (they
        # are matched through the last block) or since gone bad
        excl = np.zeros(M, np.uint8)
        if nc:
            excl[:nc] = (~store.pt_valid[cand]
                         | np.isin(cand, pids[has])).astype(np.uint8)

        tlc = last.Tcw @ np.linalg.inv(T_pred)
        mono = self.sensor == Sensor.MONOCULAR
        fwd = bool((not mono) and tlc[2, 3] > self.s.baseline)
        bwd = bool((not mono) and -tlc[2, 3] > self.s.baseline)
        th_local = 3.0 if self.sensor == Sensor.RGBD else 1.0

        scal = np.zeros(20, np.float32)
        scal[:16] = T_pred.reshape(-1)
        scal[16] = fwd
        scal[17] = bwd
        scal[18] = th_local
        scal[19] = nc
        last_f32 = np.concatenate(
            [last_pts, has[:, None].astype(np.float32)], 1)
        return (scal, last_f32, last_desc, cand, last_pids,
                loc_f32_dev, loc_desc_dev, excl)

    def _fast_finish(self, out, last, cand, last_pids, timestamp, M):
        store = self.store
        from orb_slam2_tpu.ops.frontend import padded_total

        n_feat = padded_total(
            self.s.n_features, self.s.n_levels, self.s.scale_factor
        )
        with self.timers("fast/pull"):
            res, desc_np = ts.unpack_track_out(out, n_feat, M)
        # the fast path re-anchors from host state every frame — blind-
        # extrapolation drift cannot exist; clear any stale pipelined flags
        self._drift_soft = self._drift_reject = False
        self._drift_salvaged = False

        # build the Frame from the step outputs (no second extraction)
        ff = FrameFeatures(
            xy=res.xy, xy_raw=res.xy, ur=res.ur, depth=res.depth,
            octave=res.octave, angle=res.angle,
            desc=desc_np, valid=res.valid,
            node=np.full(n_feat, -1, np.int32),
            word=np.full(n_feat, -1, np.int32),
            dev={"desc": out.desc},
        )
        frame = Frame(
            frame_id=self.builder._next_id, timestamp=timestamp, feats=ff
        )
        self.builder._next_id += 1
        self.current = frame
        frame.Tcw = res.Tcw
        frame.ref_kf = self.ref_kf

        # map assignment slots back to map-point ids
        L = len(last_pids)
        a = res.assign
        bindings = np.full(n_feat, -1, np.int64)
        from_last = (a >= 0) & (a < L)
        bindings[from_last] = last_pids[a[from_last]]
        from_local = a >= L
        loc_slots = a[from_local] - L
        in_range = loc_slots < len(cand)
        rows = np.nonzero(from_local)[0][in_range]
        bindings[rows] = cand[loc_slots[in_range]]
        frame.bindings = bindings
        frame.outlier = (bindings >= 0) & ~res.inlier

        store.lock.acquire()
        try:
            with self.timers("fast/apply"):
                return self._apply_fast_result(frame, last, res, cand,
                                               last_pids, bindings)
        finally:
            store.lock.release()

    def _apply_fast_result(self, frame, last, res, cand, last_pids,
                           bindings):
        store = self.store
        # innovation gate (pipelined only — _fast_finish clears the
        # flags): a device solve whose correction to the blind prediction
        # exceeds the matching window cannot be trusted, because the
        # window itself biased the matches; discard it and re-track
        # through the modular reference-KF path below.
        drift_reject = getattr(self, "_drift_reject", False)
        ok = (res.n_matches_mm >= 20) and not drift_reject
        if _DEBUG_TRACK and drift_reject:
            print(f"[dbg] f{frame.frame_id} DRIFT-REJECT "
                  f"innov={self._innov_px:.1f}px", flush=True)
        if _DEBUG_TRACK:
            nb = int((bindings >= 0).sum())
            print(f"[dbg] f{frame.frame_id} mm={res.n_matches_mm} "
                  f"dev_in={res.n_inliers} bound={nb} "
                  f"cand={int((cand >= 0).sum())} "
                  f"kfs={int(store.kf_valid.sum())}", flush=True)
        if ok:
            # visibility / found statistics (ref: SearchLocalPoints +
            # TrackLocalMap tail)
            vis_ids = cand[res.vis_local[: len(cand)]]
            store.pt_visible[vis_ids] += 1
            bound_now = bindings[bindings >= 0]
            store.pt_visible[np.unique(bound_now)] += 1
            inl_ids = bindings[(bindings >= 0) & res.inlier]
            store.pt_found[inl_ids] += 1
            n_obs_matches = int(np.sum(store.pt_n_obs[inl_ids] >= 1))
            if self.only_tracking:
                # ref: Tracking.cc:388-392 mbVO; :961-970 counts every
                # inlier match (temporal VO points included)
                self.vo_flag = n_obs_matches < 10
                n_map = len(inl_ids)
            else:
                n_map = n_obs_matches
            self.n_inliers = n_map
            ok = n_map >= 30
        self._fallback_used = not ok
        if not ok:
            # fall back to the modular path (reference-KF tracking)
            saved = (None if frame.Tcw is None else frame.Tcw.copy(),
                     frame.bindings.copy(), frame.outlier.copy())
            self._assign_frame_bow(frame)
            ok = self._track_reference_keyframe()
            if ok:
                ok = self._track_local_map()
            if (not ok and drift_reject and saved[0] is not None
                    and self._innov_px < 4.0 * self._th_mm_gate):
                # the innovation gate fired but the modular re-track also
                # failed: the device solve — which still carried matches —
                # is the best pose available.  Accept it conservatively
                # (forced chain re-anchor via _fallback_used, no keyframe
                # via _drift_soft) rather than declaring LOST: a spurious
                # reset throws the whole map away.  Only within ~4 match
                # windows though — beyond that the matches behind the
                # solve were found around a prediction too wrong to trust
                # (repetitive texture aliases into a consistent-but-wrong
                # pose; measured 124 'inliers' on a 1.5 m-wrong solve),
                # and accepting would poison last_frame/velocity.  LOST →
                # relocalization is the honest recovery there.
                frame.Tcw, frame.bindings, frame.outlier = saved
                inl_ids = frame.bindings[(frame.bindings >= 0)
                                         & ~frame.outlier]
                self.n_inliers = int(np.sum(store.pt_n_obs[inl_ids] >= 1))
                self._drift_salvaged = True
                ok = self.n_inliers >= 30
                if ok:
                    # the frame's bindings/inliers are accepted, so the
                    # visible/found statistics must count them like the
                    # normal path above — salvaged stretches would
                    # otherwise bias found_ratio downward and push healthy
                    # points toward the <0.25 culling threshold.
                    vis_ids = cand[res.vis_local[: len(cand)]]
                    store.pt_visible[vis_ids] += 1
                    bound_now = frame.bindings[frame.bindings >= 0]
                    store.pt_visible[np.unique(bound_now)] += 1
                    store.pt_found[inl_ids] += 1
                if _DEBUG_TRACK:
                    print(f"[dbg] f{frame.frame_id} SALVAGE dev pose "
                          f"n_map={self.n_inliers} -> "
                          f"{'ok' if ok else 'FAIL'}", flush=True)

        if _DEBUG_TRACK and self._fallback_used:
            print(f"[dbg] f{frame.frame_id} FALLBACK -> "
                  f"{'ok' if ok else 'FAIL'} inl={self.n_inliers}",
                  flush=True)
        if not ok:
            # mirror the modular path's LOST warning (tracking.py _track)
            # — without it a pipelined-path LOST is invisible in logs
            self.log.warning(
                "tracking LOST at frame %d (fast path: innov=%.1fpx "
                "inliers=%d)", frame.frame_id,
                getattr(self, "_innov_px", 0.0), self.n_inliers)
        if ok:
            self.state = State.OK
            self.velocity = frame.Tcw @ np.linalg.inv(last.Tcw)
            # drop bindings to zero-observation (pure-VO) points
            # (ref: Tracking.cc:412-420 Observations()<1); vectorized —
            # pt_n_obs>=1 iff the point has at least one KF observation
            bound = np.nonzero(frame.bindings >= 0)[0]
            pids_b = frame.bindings[bound]
            drop = store.pt_valid[pids_b] & (store.pt_n_obs[pids_b] < 1)
            frame.bindings[bound[drop]] = -1
            # delete temporal VO points (ref :441-448; created by
            # _update_last_frame in localization mode)
            if self.temporal_points:
                for pid in self.temporal_points:
                    store.set_point_bad(pid)
                self.temporal_points.clear()
            # a SALVAGED frame (gate fired AND the modular re-track
            # failed) carries a pose good enough to keep but not good
            # enough to freeze into the map as a keyframe.  Soft drift
            # alone must NOT suppress keyframes: weak tracking raises
            # innovation, and blocking the keyframe the ref policy wants
            # starves the local map — measured as a death spiral
            # (matches 532 -> 103 over 7 suppressed frames).
            if (self._need_new_keyframe()
                    and not getattr(self, "_drift_salvaged", False)):
                # keyframe BoW is deferred to the mapping thread
                # (LocalMapper.process_one, ref: KeyFrame::ComputeBoW in
                # LocalMapping::ProcessNewKeyFrame) — the ~30 ms device
                # descend does not belong on the per-frame critical path
                with self.timers("create_keyframe"):
                    self._create_new_keyframe()
            out_mask = frame.outlier & (frame.bindings >= 0)
            frame.bindings[out_mask] = -1
            frame.outlier[:] = False
            # refresh the local window for the next frame's candidates;
            # the window changes slowly, so refresh on keyframe insertion
            # or every few frames rather than every frame
            self._frames_since_map_refresh += 1
            if (self.last_kf_frame_id == frame.frame_id
                    or self._frames_since_map_refresh >= 4):
                self._update_local_map()
                self._frames_since_map_refresh = 0
        else:
            self.state = State.LOST

        if frame.Tcw is not None and self.ref_kf >= 0:
            # sync frame.ref_kf with the stored Tcr (see _track's append)
            frame.ref_kf = self.ref_kf
            Trw = store.kf_pose[self.ref_kf]
            self.trajectory.append(TrajectoryEntry(
                frame.Tcw @ np.linalg.inv(Trw), self.ref_kf,
                frame.timestamp, self.state == State.LOST))

        if self.state == State.LOST and store.kf_valid.sum() <= 5:
            self.log.warning(
                "track lost soon after initialisation (frame %d, "
                "%d kfs) — resetting", frame.frame_id,
                int(store.kf_valid.sum()))
            self.reset()
            return None
        self.last_frame = frame
        return frame.Tcw if self.state == State.OK else None

    # ------------------------------------------------------------------
    # frame pipelining: dispatch t+1 before pulling t (one-frame latency,
    # ~2x throughput over a high-RTT device link)
    # ------------------------------------------------------------------
    def _local_block(self, exclude_pids=None):
        """Local-candidate block from the latest processed host state.

        `exclude_pids` must be exactly the points the motion-model
        (chain) block carries — excluding anything more makes those
        points invisible to tracking (e.g. keyframe-born points bound
        on the host AFTER the chain was formed on device)."""
        store = self.store
        if exclude_pids is None:
            last = self.last_frame
            bind = last.bindings
            pids = np.where(bind >= 0, bind, 0)
            exclude_pids = pids[(bind >= 0) & store.pt_valid[pids]]
        lp = self.local_pts
        keep = store.pt_valid[lp] & ~np.isin(lp, exclude_pids)
        cand = lp[keep]
        M = self._buckets("local", max(len(cand), 1))
        loc_f32 = np.zeros((M, 8), np.float32)
        nc = len(cand)
        loc_f32[:nc, :3] = store.pt_pos[cand]
        loc_f32[:nc, 3:6] = store.pt_normal[cand]
        loc_f32[:nc, 6] = store.pt_min_dist[cand]
        loc_f32[:nc, 7] = store.pt_max_dist[cand]
        loc_desc = pad_rows(store.pt_desc[cand], M)
        return cand, loc_f32, loc_desc, M, nc

    def _get_chain_step(self):
        if self._chain_step is None:
            self._chain_step = ts.build_track_step_chained(
                self.s, self._step_mode())
        return self._chain_step

    def _get_device_map(self):
        if getattr(self, "_device_map", None) is None or \
                self._device_map.store is not self.store:
            from orb_slam2_tpu.slam.device_map import DeviceMap

            self._device_map = DeviceMap(
                self.store, cap=int(getattr(self.s, "device_map_cap",
                                            1 << 17)))
            # seed: everything currently in the map is dirty
            self._device_map.dirty.update(
                int(p) for p in self.store.valid_pt_ids())
        return self._device_map

    def _bootstrap_chain(self):
        """Build the device ChainState from the last processed frame."""
        store = self.store
        # refresh the last frame's pose from its (possibly BA-moved)
        # reference keyframe and redirect fused/replaced point bindings,
        # like the fast path does every frame (ref: CheckReplacedInLastFrame
        # + UpdateLastFrame)
        self._replace_updated_points(self.last_frame)
        self._update_last_frame()
        last = self.last_frame
        bind = last.bindings.astype(np.int32)
        pid = np.where(
            (bind >= 0) & store.pt_valid[np.maximum(bind, 0)]
            & ~last.outlier, bind, -1).astype(np.int32)
        T_cur = last.Tcw.astype(np.float32)
        return ts.ChainState(
            xy=last.feats.device("xy"), ur=last.feats.device("ur"),
            octave=last.feats.device("octave"),
            angle=last.feats.device("angle"),
            desc=last.feats.device("desc"),
            pid=jnp.asarray(pid),
            T_cur=jnp.asarray(T_cur),
            velocity=jnp.asarray(self.velocity.astype(np.float32)),
        )

    def _drain_one_pending(self) -> Optional[np.ndarray]:
        """Pull + apply the OLDEST in-flight frame.  Returns its pose and
        updates the chain-health flags; on tracking failure the whole
        pipeline (chain + remaining in-flight frames, which extend the
        failed state) is dropped."""
        pending = self._pending.pop(0)
        with self.timers("pipe/process"):
            pose = self._process_pulled(*pending)
        if self.state != State.OK or self.last_frame is None:
            self._pending = []
            self._chain = None
            return pose
        if self.last_kf_frame_id == self.last_frame.frame_id:
            # KF/BA ran: serialize until tracking re-anchors to the
            # updated map (in-flight dispatches cannot see its points)
            self._chain_dirty = 2
        elif (self.n_inliers < 60 or getattr(self, "_fallback_used", False)
              or getattr(self, "_drift_soft", False)):
            # weak tracking, the host DISCARDED the device pose via the
            # modular fallback, or the innovation gate flagged blind-
            # extrapolation drift: the chain in flight extends a pose
            # the host does not trust — force a re-anchor before it can
            # corrupt the map
            self._chain_dirty = 2
        return pose

    def _track_pipelined(self, img_l, img_r, timestamp):
        store = self.store
        dmap = self._get_device_map()

        # The chain's poses still ride the map frame from dispatch time;
        # point data comes fresh from the device mirror.  Re-anchor the
        # chain from host state every `chain_max_age` frames and after
        # keyframes/weak frames (chain_dirty); between anchors, frames
        # are dispatched blind (device trust gate bounds drift) and up
        # to `pipeline_depth` results stay in flight, draining whenever
        # the tunnel delivers them — the RTT disappears behind host work.
        self._chain_age = getattr(self, "_chain_age", 0) + 1
        refresh = (self._chain is None
                   or self._chain_age >= self.chain_max_age
                   or getattr(self, "_chain_dirty", 0) > 0)
        pose_pre = None
        if refresh:
            while self._pending:
                pose_pre = self._drain_one_pending()
                if self.state != State.OK or self.last_frame is None:
                    return pose_pre
            # drain mapping BEFORE re-anchoring so the fresh chain and
            # candidate list see the newest triangulations/BA (exact
            # fast-path parity on refresh frames).  ONLY when mapping is
            # inline (sync scheduler): with a dedicated mapping thread,
            # spin(block=False) can still win the race against the
            # worker waking up and then runs the WHOLE ~0.5-1 s keyframe
            # pass on the tracking thread — measured as the 600-900 ms
            # worst frames.  The reference's tracking thread never does
            # LocalMapping work (src/System.cc:85-104).
            if (self.local_mapper is not None
                    and not getattr(self.local_mapper, "async_worker",
                                    False)):
                with self.timers("pipe/mapper_spin"):
                    self.local_mapper.spin(block=False)
            with store.lock, self.timers("pipe/anchor"):
                self._update_local_map()
                self._frames_since_map_refresh = 0
                self._chain = self._bootstrap_chain()
            self._chain_age = 0
            self._chain_dirty = max(
                getattr(self, "_chain_dirty", 0) - 1, 0)
            if _DEBUG_TRACK:
                nc = int(np.sum(self._chain.pid >= 0))
                print(f"[dbg] ANCHOR at last_frame="
                      f"{self.last_frame.frame_id} carried={nc} "
                      f"local={len(self.local_pts)} "
                      f"dirty={self._chain_dirty}", flush=True)

        with store.lock:
            # candidate pid list only — the step gathers the data from
            # the mirror and excludes chain-carried pids on device
            geo_epoch = store.geo_epoch
            lp = self.local_pts
            cand = lp[store.pt_valid[lp]].astype(np.int32)
            M = self._buckets("local", max(len(cand), 1))
            cand_pids = np.full(M, -1, np.int32)
            cand_pids[: len(cand)] = cand
            # flush the mirror ONLY when the chain was just re-anchored:
            # between refreshes the in-flight chain pose rides the
            # pre-BA map frame, and scattering BA-moved points under it
            # makes the blind frame solve against inconsistent geometry
            # (pose vs points from different gauge) — the source of the
            # 0.3-1.5m pipelined pose jumps around keyframes.
            if refresh:
                dmap.flush()
        th_local = 3.0 if self.sensor == Sensor.RGBD else 1.0
        scal = np.array([th_local, 0.0], np.float32)

        step = self._get_chain_step()
        img_l_d = self.builder._upload(img_l)
        if img_r is None:
            img_r_d = img_l_d
        elif self.sensor == Sensor.RGBD:
            img_r_d = self.builder._upload_depth(img_r)
        else:
            img_r_d = self.builder._upload(img_r)
        out, new_chain = step(
            img_l_d, img_r_d, self._chain, dmap.f32, dmap.desc,
            jnp.asarray(cand_pids), jnp.asarray(scal),
        )
        out.f32_pack.copy_to_host_async()
        self._pending.append(
            (out, dict(timestamp=timestamp, M=M, cand=cand_pids,
                       geo_epoch=geo_epoch)))
        self._chain = new_chain

        # opportunistic drain: process whatever the tunnel has already
        # delivered; block only when the pipeline is over depth
        pose = pose_pre
        while self._pending and (
                len(self._pending) > self.pipeline_depth
                or self._pending[0][0].f32_pack.is_ready()):
            pose = self._drain_one_pending()
            if self.state != State.OK or self.last_frame is None:
                return pose
            if getattr(self, "_chain_dirty", 0) > 0:
                break    # next call re-anchors; drain the rest there
        # The freshly dispatched frames' poses are not on host yet.
        # Return the motion-model PREDICTION for the current frame
        # (velocity composed over the unprocessed lag) so callers get a
        # pose aligned with THIS timestamp; the authoritative trajectory
        # entries are written when each frame is pulled.
        if (self.state == State.OK and self.last_frame is not None
                and self.velocity is not None
                and self.last_frame.Tcw is not None):
            lag = max(len(self._pending), 1)
            pred = np.linalg.matrix_power(self.velocity, lag)
            return (pred @ self.last_frame.Tcw).astype(np.float32)
        return pose

    def _process_pulled(self, out, meta):
        """Pull + apply a previously dispatched pipelined step (this is
        frame t-1 relative to the latest dispatch).  The step reports
        per-feature POINT IDS directly — no slot bookkeeping."""
        store = self.store
        from orb_slam2_tpu.ops.frontend import padded_total

        n_feat = padded_total(
            self.s.n_features, self.s.n_levels, self.s.scale_factor)
        with self.timers("pipe/unpack"):
            buf = np.asarray(out.f32_pack)
            res, desc_np = ts.unpack_track_out(
                out, n_feat, meta["M"], buf=buf)
        diag = buf[-ts.N_DIAG:]

        # ---- innovation gate -------------------------------------------
        # The chain step reports the correction its solve applied to the
        # constant-velocity prediction.  Expressed in PIXELS at the scene
        # median depth it is directly comparable to the matching window
        # th_mm: corrections beyond ~half the window mean the blind
        # extrapolation is drifting (window-biased matching can no longer
        # be assumed unbiased), so re-anchor the chain from host state
        # and don't let this frame spawn a keyframe; corrections beyond
        # the window itself mean even the solve is suspect — reject the
        # device pose and re-track through the modular fallback.
        dt_m, drot_deg = float(diag[4]), float(diag[5])
        zd = res.depth[res.valid & (res.depth > 0)]
        if len(zd) >= 30:
            zmed = float(np.median(zd))
            self._anchor_zmed = zmed
        else:
            zmed = getattr(self, "_anchor_zmed", 0.0)
        th_mm = 7.0 if self.sensor == Sensor.STEREO else 15.0
        innov_px = innovation_px(self.s.fx, dt_m, drot_deg, zmed)
        self._innov_px = innov_px
        inl1, n_vis = float(diag[3]), float(diag[1])
        self._th_mm_gate = th_mm
        # did existing geometry move while this frame was in flight?
        # (int read is atomic under the GIL; the apply below re-enters
        # the lock anyway)
        map_moved = store.geo_epoch != meta.get("geo_epoch",
                                                store.geo_epoch)
        self._drift_soft, self._drift_reject = drift_gate(
            innov_px, th_mm, inl1, n_vis, drot_deg=drot_deg,
            map_moved=map_moved, params=self.gate_params)
        self._drift_salvaged = False

        if _DEBUG_TRACK:
            d = diag
            print(f"[dbg]   chain-diag n_th={int(d[0])} vis={int(d[1])} "
                  f"wide={int(d[2])} inl1={int(d[3])} dt={d[4]:.3f}m "
                  f"drot={d[5]:.2f}deg innov={innov_px:.1f}px "
                  f"map_moved={int(map_moved)}",
                  flush=True)
        last = self.last_frame
        cand = meta["cand"]

        ff = FrameFeatures(
            xy=res.xy, xy_raw=res.xy, ur=res.ur, depth=res.depth,
            octave=res.octave, angle=res.angle,
            desc=desc_np, valid=res.valid,
            node=np.full(n_feat, -1, np.int32),
            word=np.full(n_feat, -1, np.int32),
            dev={"desc": out.desc},
        )
        frame = Frame(
            frame_id=self.builder._next_id, timestamp=meta["timestamp"],
            feats=ff,
        )
        self.builder._next_id += 1
        self.current = frame
        frame.Tcw = res.Tcw
        frame.ref_kf = self.ref_kf

        # res.assign carries pids; validate against the live map and
        # follow Replace() chains (vectorized)
        pid = res.assign.astype(np.int64)
        ok = (pid >= 0) & (pid < store.n_pt)
        resolved = np.where(ok, pid, -1)
        for _ in range(4):
            rep = store.pt_replaced_by[np.maximum(resolved, 0)]
            step_mask = (resolved >= 0) & (rep >= 0)
            if not step_mask.any():
                break
            resolved = np.where(step_mask, rep, resolved)
        valid = (resolved >= 0) & store.pt_valid[np.maximum(resolved, 0)]
        bindings = np.where(ok & valid, resolved, -1)
        frame.bindings = bindings
        frame.outlier = (bindings >= 0) & ~res.inlier
        last_pids = np.where(last.bindings >= 0, last.bindings, 0)

        with store.lock, self.timers("pipe/apply"):
            # re-check the epoch under the lock: if this drain blocked on
            # a BA/fusion writeback that held the lock (and bumped
            # geo_epoch) while we computed the gate above, the moved-map
            # loosening must cover that window too — recompute the gate
            # with map_moved set.
            if not map_moved and store.geo_epoch != meta.get(
                    "geo_epoch", store.geo_epoch):
                self._drift_soft, self._drift_reject = drift_gate(
                    innov_px, th_mm, inl1, n_vis, drot_deg=drot_deg,
                    map_moved=True, params=self.gate_params)
            return self._apply_fast_result(
                frame, last, res, cand, last_pids, bindings)

    def poll(self) -> int:
        """Drain in-flight pipelined results the device has ALREADY
        delivered, without blocking.  Call between frames (while the
        driver paces to the camera period) so authoritative poses land
        as soon as the tunnel delivers them instead of at the next
        track call — this is what makes solved-pose latency ~RTT-bound
        rather than frame-period-bound.  Returns frames drained."""
        n = 0
        while (self._pending
               and self._pending[0][0].f32_pack.is_ready()):
            self._drain_one_pending()
            n += 1
            if self.state != State.OK or self.last_frame is None:
                break
            if getattr(self, "_chain_dirty", 0) > 0:
                break       # next track call re-anchors first
        return n

    def _flush_pipeline(self):
        while self._pending:
            pending = self._pending.pop(0)
            self._process_pulled(*pending)
            if self.state != State.OK or self.last_frame is None:
                self._pending = []
                break
        self._chain = None

    def _assign_frame_bow(self, frame: Frame):
        if (self.builder.vocabulary is not None
                and not (frame.feats.node >= 0).any()):
            node, word = self.builder.vocabulary.assign_nodes(
                frame.feats.desc, frame.feats.valid)
            frame.feats.node[:] = node
            frame.feats.word[:] = word

    def _ensure_kf_bow(self, kf: int):
        """Lazy keyframe BoW for fallbacks that race the mapping
        thread's ComputeBoW: a reference keyframe created this frame may
        not have been processed by the mapper yet (the reference
        computes KF BoW on the mapping thread too,
        src/LocalMapping.cc:128-137 — its TrackReferenceKeyFrame only
        needs the FRAME's BoW because KeyFrame::ComputeBoW already ran;
        here the store-side assignment is made idempotent instead)."""
        store = self.store
        voc = self.builder.vocabulary
        if voc is None or not store.kf_valid[kf] \
                or store.kf_bow_assigned(kf):
            return
        node, word = voc.assign_nodes(store.kf_desc[kf],
                                      store.kf_feat_valid[kf])
        store.set_kf_bow(kf, node, word)

    # ------------------------------------------------------------------
    # public per-frame entries (ref: GrabImage* src/Tracking.cc:168-266)
    # ------------------------------------------------------------------
    def grab_monocular(self, img: np.ndarray, timestamp: float) -> Optional[np.ndarray]:
        if self._can_fast():
            if self.pipelined:
                with self.timers("pipelined_step"):
                    return self._track_pipelined(img, None, timestamp)
            with self.timers("fast_step"):
                return self._track_fast(img, None, timestamp)
        self._flush_pipeline()
        boost = self.state in (State.NO_IMAGES_YET, State.NOT_INITIALIZED)
        with self.timers("frame_build"):
            frame = self.builder.monocular(img, timestamp, init_boost=boost)
        return self._track(frame)

    def grab_stereo(self, img_l, img_r, timestamp: float) -> Optional[np.ndarray]:
        if self._can_fast():
            if self.pipelined:
                with self.timers("pipelined_step"):
                    return self._track_pipelined(img_l, img_r, timestamp)
            with self.timers("fast_step"):
                return self._track_fast(img_l, img_r, timestamp)
        self._flush_pipeline()
        with self.timers("frame_build"):
            frame = self.builder.stereo_pair(img_l, img_r, timestamp)
        return self._track(frame)

    def grab_rgbd(self, img, depth, timestamp: float) -> Optional[np.ndarray]:
        if self._can_fast():
            if self.pipelined:
                with self.timers("pipelined_step"):
                    return self._track_pipelined(img, depth, timestamp)
            with self.timers("fast_step"):
                return self._track_fast(img, depth, timestamp)
        self._flush_pipeline()
        with self.timers("frame_build"):
            frame = self.builder.rgbd(img, depth, timestamp)
        return self._track(frame)

    # ------------------------------------------------------------------
    # main state machine (ref: Tracking::Track src/Tracking.cc:268-507)
    # ------------------------------------------------------------------
    def _track(self, frame: Frame) -> Optional[np.ndarray]:
        self.current = frame
        if self.state == State.NO_IMAGES_YET:
            self.state = State.NOT_INITIALIZED

        if self.state == State.NOT_INITIALIZED:
            if self.sensor == Sensor.MONOCULAR:
                self._monocular_initialization()
            else:
                self._stereo_initialization()
            if self.state != State.OK:
                self.last_frame = frame
                return None
            ok = True
        else:
            ok = self._track_current_frame()

        # record pose / bookkeeping
        if ok:
            if self.state == State.LOST:
                self.log.info("tracking recovered (frame %d)",
                              frame.frame_id)
            self.state = State.OK
        elif self.state == State.OK:
            self.state = State.LOST
            self.log.warning("tracking LOST at frame %d", frame.frame_id)

        if frame.Tcw is not None and self.ref_kf >= 0:
            # keep the frame's reference in lockstep with the stored Tcr:
            # UpdateLastFrame recomposes Tcr @ kf_pose[frame.ref_kf], so a
            # stale frame.ref_kf silently shifts the pose by the KF gap
            # (ref: Tracking.cc:775-780 sets mpReferenceKF before storing)
            frame.ref_kf = self.ref_kf
            Trw = self.store.kf_pose[self.ref_kf]
            Tcr = frame.Tcw @ np.linalg.inv(Trw)
            self.trajectory.append(
                TrajectoryEntry(Tcr, self.ref_kf, frame.timestamp,
                                self.state == State.LOST)
            )
        elif self.trajectory:
            prev = self.trajectory[-1]
            self.trajectory.append(
                TrajectoryEntry(prev.Tcr, prev.ref_kf, frame.timestamp, True)
            )

        if self.state == State.LOST and self.store.kf_valid.sum() <= 5:
            self.log.warning(
                "lost with only %d keyframes — resetting (ref: "
                "Tracking.cc:431-437)", int(self.store.kf_valid.sum()))
            self.reset()
            return None

        self.last_frame = frame
        return frame.Tcw

    def _track_current_frame(self) -> bool:
        frame = self.current
        store = self.store
        ok = False

        if self.state == State.OK:
            self._replace_updated_points(self.last_frame)
            if not self.only_tracking:
                if (self.velocity is None
                        or frame.frame_id < self.last_reloc_frame_id + 2):
                    with self.timers("track_ref_kf"):
                        ok = self._track_reference_keyframe()
                else:
                    with self.timers("track_motion"):
                        ok = self._track_with_motion_model()
                    if not ok:
                        with self.timers("track_ref_kf"):
                            ok = self._track_reference_keyframe()
            else:
                ok = self._track_localization_mode()
        else:
            with self.timers("relocalize"):
                ok = self._relocalization()

        if frame.ref_kf < 0:
            frame.ref_kf = self.ref_kf

        if ok and not (self.only_tracking and self.vo_flag):
            with self.timers("track_local_map"):
                ok = self._track_local_map()

        if ok:
            # update motion model (ref :418-426)
            if self.last_frame is not None and self.last_frame.Tcw is not None:
                self.velocity = frame.Tcw @ np.linalg.inv(self.last_frame.Tcw)
            else:
                self.velocity = None
            # clean VO matches: unbind points with no observations
            # (ref :430-438)
            for i in np.nonzero(frame.bindings >= 0)[0]:
                pid = int(frame.bindings[i])
                if store.pt_valid[pid] and store.obs.count(pid) == 0:
                    frame.outlier[i] = False
                    frame.bindings[i] = -1
            # delete temporal VO points (ref :441-448)
            for pid in self.temporal_points:
                store.set_point_bad(pid)
            self.temporal_points.clear()

            if self._need_new_keyframe():
                with self.timers("create_keyframe"):
                    self._create_new_keyframe()
            # drop outlier bindings so they aren't inherited (ref :461-466)
            out = frame.outlier & (frame.bindings >= 0)
            frame.bindings[out] = -1
            frame.outlier[:] = False
        return ok

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def _stereo_initialization(self):
        """ref: Tracking::StereoInitialization (src/Tracking.cc:510-562)."""
        frame = self.current
        if int(np.sum(frame.feats.valid)) < 500:
            return
        frame.Tcw = np.eye(4, dtype=np.float32)
        store = self.store
        kf = store.add_keyframe(
            frame.feats, frame.Tcw, frame.timestamp, frame.frame_id
        )
        store.origin_kf = kf
        depth = frame.feats.depth
        born = []
        for i in np.nonzero((depth > 0) & frame.feats.valid)[0]:
            pos = self._unproject(frame, int(i))
            pid = store.add_point(pos, kf, frame.feats.desc[i])
            store.add_observation(pid, kf, int(i))
            frame.bindings[i] = pid
            born.append(pid)
        if born:
            born = np.array(born, np.int64)
            store.compute_distinctive_batch(born)
            store.update_points_batch(born, self.scale_factors)
        self.ref_kf = kf
        frame.ref_kf = kf
        self.last_kf_frame_id = frame.frame_id
        self.local_kfs = [kf]
        self.local_pts = store.valid_pt_ids()
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kf)
        self.state = State.OK

    def _monocular_initialization(self):
        """ref: Tracking::MonocularInitialization (src/Tracking.cc:564-636)."""
        frame = self.current
        n_valid = int(np.sum(frame.feats.valid))
        if self._init_frame is None:
            if n_valid > 100:
                self._init_frame = frame
                self._init_prev_matched = frame.feats.xy.copy()
            return
        if n_valid <= 100:
            self._init_frame = None
            return

        f0, f1 = self._init_frame.feats, frame.feats
        m = matching.search_for_initialization(
            f0.device("xy"), f0.device("desc"),
            f0.device("octave"), f0.device("angle"), f0.device("valid"),
            f1.device("xy"), f1.device("desc"),
            f1.device("octave"), f1.device("angle"), f1.device("valid"),
            window=100.0, ratio=0.9,
        )
        idx, _, ok = matching.to_host(m)
        if int(ok.sum()) < 100:
            self._init_frame = None
            return

        rows = np.nonzero(ok)[0]
        rng = np.random.default_rng(0)  # seeded like DUtils SeedRandOnce(0)
        sets = mono_init.make_ransac_samples(len(rows), rng)
        sample_idx = rows[sets].astype(np.int32)
        res = mono_init.initialize(
            jnp.asarray(f0.xy), jnp.asarray(f1.xy[idx]),
            jnp.asarray(ok),
            jnp.asarray(self.s.K, jnp.float32),
            jnp.asarray(sample_idx),
        )
        if not bool(res.success):
            return
        good = np.asarray(res.good_mask) & ok
        if int(good.sum()) < 80:
            return
        R21 = np.asarray(res.R21)
        t21 = np.asarray(res.t21)
        pts3d = np.asarray(res.points3d)
        self._create_initial_map_monocular(frame, idx, good, R21, t21, pts3d)

    def _create_initial_map_monocular(self, frame, idx, good, R21, t21, pts3d):
        """ref: Tracking::CreateInitialMapMonocular (src/Tracking.cc:638-756):
        two keyframes, triangulated points, 20-iteration global BA, then
        median-depth normalization to unit scale."""
        store = self.store
        f0 = self._init_frame
        T0 = np.eye(4, dtype=np.float32)
        T1 = np.eye(4, dtype=np.float32)
        T1[:3, :3] = R21
        T1[:3, 3] = t21
        f0.Tcw = T0
        frame.Tcw = T1

        kf0 = store.add_keyframe(f0.feats, T0, f0.timestamp, f0.frame_id)
        store.origin_kf = kf0
        kf1 = store.add_keyframe(frame.feats, T1, frame.timestamp,
                                 frame.frame_id)
        born = []
        for i in np.nonzero(good)[0]:
            j = int(idx[i])
            pid = store.add_point(pts3d[i], kf1, frame.feats.desc[j])
            store.add_observation(pid, kf0, int(i))
            store.add_observation(pid, kf1, j)
            f0.bindings[i] = pid
            frame.bindings[j] = pid
            born.append(pid)
        if born:
            born = np.array(born, np.int64)
            store.compute_distinctive_batch(born)
            store.update_points_batch(born, self.scale_factors)
        store.update_connections(kf0)
        store.update_connections(kf1)

        # global BA on the 2-view map (ref :687)
        if self.local_mapper is not None:
            self.local_mapper.global_bundle_adjustment(iters=20)

        # median-depth normalization (ref :690-713)
        med_depth = store.scene_median_depth(kf0, 2)
        if med_depth <= 0 or store.tracked_points_in_kf(kf1, 1) < 100:
            self.reset()
            return
        inv_med = 1.0 / med_depth
        T1s = store.kf_pose[kf1].copy()
        T1s[:3, 3] *= inv_med
        store.kf_pose[kf1] = T1s
        pids = store.valid_pt_ids()
        store.pt_pos[pids] *= inv_med
        store.mark_dirty(pids)
        store.update_points_batch(pids, self.scale_factors)
        frame.Tcw = store.kf_pose[kf1].copy()

        self.ref_kf = kf1
        frame.ref_kf = kf1
        self.last_kf_frame_id = frame.frame_id
        self.local_kfs = [kf0, kf1]
        self.local_pts = store.valid_pt_ids()
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kf0)
            self.local_mapper.insert_keyframe(kf1)
        self._init_frame = None
        self.state = State.OK

    # ------------------------------------------------------------------
    # pose tracking
    # ------------------------------------------------------------------
    def _replace_updated_points(self, frame: Optional[Frame]):
        """ref: Tracking::CheckReplacedInLastFrame (src/Tracking.cc:741-756).
        Skipped entirely when no Replace() happened since the last sweep
        (the common case — fusion only runs on keyframe insertion)."""
        if frame is None:
            return
        if self.store.replace_epoch == self._seen_replace_epoch:
            return
        self._seen_replace_epoch = self.store.replace_epoch
        for i in np.nonzero(frame.bindings >= 0)[0]:
            pid = self.store.resolve_replaced(int(frame.bindings[i]))
            frame.bindings[i] = pid if self.store.pt_valid[pid] else -1

    def _pose_observations(self, frame: Frame):
        """Build the fixed-shape PoseObs block from current bindings."""
        store = self.store
        n = frame.n_feat
        bind = frame.bindings
        has = bind >= 0
        pids = np.where(has, bind, 0)
        pts_w = store.pt_pos[pids]
        ur = frame.feats.ur
        uv = np.stack(
            [frame.feats.xy[:, 0], frame.feats.xy[:, 1], ur], -1
        ).astype(np.float32)
        inv_sigma2 = (1.0 / self.level_sigma2[frame.feats.octave]).astype(
            np.float32
        )
        mask = has & frame.feats.valid & store.pt_valid[pids]
        return pose_lm.PoseObs(
            jnp.asarray(pts_w), jnp.asarray(uv),
            jnp.asarray(inv_sigma2), jnp.asarray(mask),
        ), mask

    def _optimize_pose(self, frame: Frame) -> int:
        obs, mask = self._pose_observations(frame)
        if int(mask.sum()) < 3:
            return 0
        T, inliers, n_in = pose_lm.optimize_pose(
            jnp.asarray(frame.Tcw), obs,
            jnp.float32(self.s.fx), jnp.float32(self.s.fy),
            jnp.float32(self.s.cx), jnp.float32(self.s.cy),
            jnp.float32(self.s.bf),
        )
        # single packed device->host pull (tunnel-latency-bound)
        packed = np.asarray(jnp.concatenate(
            [T.reshape(-1), inliers.astype(jnp.float32)]
        ))
        frame.Tcw = packed[:16].reshape(4, 4).astype(np.float32)
        inl = packed[16:] > 0.5
        frame.outlier = mask & ~inl
        return int(inl.sum())

    def _discard_outliers(self, frame: Frame) -> int:
        """Unbind outliers; return inlier matches that are map points
        (ref: TrackWithMotionModel tail, src/Tracking.cc:905-926)."""
        n_map = 0
        for i in np.nonzero(frame.bindings >= 0)[0]:
            pid = int(frame.bindings[i])
            if frame.outlier[i]:
                frame.bindings[i] = -1
                frame.outlier[i] = False
            elif self.store.pt_n_obs[pid] >= 1:
                n_map += 1
        return n_map

    def _track_with_motion_model(self) -> bool:
        """ref: Tracking::TrackWithMotionModel (src/Tracking.cc:868-929)."""
        frame = self.current
        last = self.last_frame
        store = self.store
        self._update_last_frame()
        frame.Tcw = (self.velocity @ last.Tcw).astype(np.float32)

        bind = last.bindings
        has = bind >= 0
        pids = np.where(has, bind, 0)
        has = has & store.pt_valid[pids]
        th = 7.0 if self.sensor == Sensor.STEREO else 15.0
        n_matches, m_idx, m_pid = self._match_last(frame, last, pids, has, th)
        if n_matches < 20:
            n_matches, m_idx, m_pid = self._match_last(
                frame, last, pids, has, 2 * th
            )
        if n_matches < 20:
            return False
        frame.bindings[:] = -1
        frame.bindings[m_idx] = m_pid

        self._optimize_pose(frame)
        n_map = self._discard_outliers(frame)
        if self.only_tracking:
            self.vo_flag = n_map < 10
            return n_matches > 20
        return n_map >= 10

    def _match_last(self, frame, last, pids, has, th):
        # z-motion octave gating (ref: src/ORBmatcher.cc:1352-1360):
        # forward if the camera advanced by more than the stereo baseline
        tlc = last.Tcw @ np.linalg.inv(frame.Tcw)
        mono = self.sensor == Sensor.MONOCULAR
        forward = (not mono) and tlc[2, 3] > self.s.baseline
        backward = (not mono) and -tlc[2, 3] > self.s.baseline
        fv = frame.feats
        m = matching.search_last_frame(
            jnp.asarray(self.store.pt_pos[pids]),
            jnp.asarray(has),
            last.feats.device("octave"),
            jnp.asarray(self.store.pt_desc[pids]),
            last.feats.device("angle"),
            jnp.asarray(frame.Tcw),
            fv.device("xy"), fv.device("ur"),
            fv.device("octave"), fv.device("desc"),
            fv.device("angle"), fv.device("valid"),
            jnp.float32(self.s.fx), jnp.float32(self.s.fy),
            jnp.float32(self.s.cx), jnp.float32(self.s.cy),
            jnp.float32(self.s.bf),
            self._bounds_dev, self._sf_dev,
            th, forward=forward, backward=backward,
        )
        idx, _, ok = matching.to_host(m)
        rows = np.nonzero(ok)[0]
        return len(rows), idx[rows], pids[rows]

    def _track_reference_keyframe(self) -> bool:
        """ref: Tracking::TrackReferenceKeyFrame (src/Tracking.cc:758-800)."""
        frame = self.current
        store = self.store
        kf = self.ref_kf
        if kf < 0 or not store.kf_valid[kf]:
            return False
        self._ensure_kf_bow(kf)
        kf_bind = store.kf_obs[kf]
        kf_has = kf_bind >= 0
        kf_pids = np.where(kf_has, kf_bind, 0)
        kf_has = kf_has & store.pt_valid[kf_pids]

        m = matching.search_by_nodes(
            store.kf_device(kf, "desc"), store.kf_device(kf, "node"),
            jnp.asarray(kf_has), store.kf_device(kf, "angle"),
            frame.feats.device("desc"), frame.feats.device("node"),
            frame.feats.device("valid"), frame.feats.device("angle"),
            ratio=0.7,
        )
        idx, _, ok = matching.to_host(m)
        ok = ok & kf_has
        if _DEBUG_TRACK:
            print(f"[dbg]   track_ref_kf kf={kf} bow_matches="
                  f"{int(ok.sum())}", flush=True)
        if int(ok.sum()) < 15:
            return False
        frame.bindings[:] = -1
        frame.bindings[idx[ok]] = kf_pids[ok]
        frame.Tcw = (
            self.last_frame.Tcw.copy() if self.last_frame.Tcw is not None
            else np.eye(4, np.float32)
        )
        self._optimize_pose(frame)
        n_map = self._discard_outliers(frame)
        if _DEBUG_TRACK:
            print(f"[dbg]   track_ref_kf n_map={n_map}", flush=True)
        return n_map >= 10

    def _update_last_frame(self):
        """ref: Tracking::UpdateLastFrame (src/Tracking.cc:802-866):
        refresh last-frame pose from its reference KF; in localization
        mode create temporal VO points from close stereo depth."""
        last = self.last_frame
        if self.trajectory:
            entry = self.trajectory[-1]
            # recompose against the entry's OWN reference (it may differ
            # from last.ref_kf if the local-map refresh moved the
            # reference after the frame was built), and only when the
            # entry actually belongs to the last frame
            if (entry.ref_kf >= 0 and self.store.kf_valid[entry.ref_kf]
                    and entry.timestamp == last.timestamp):
                last.Tcw = (entry.Tcr
                            @ self.store.kf_pose[entry.ref_kf]).astype(
                    np.float32
                )
        if (not self.only_tracking or self.sensor == Sensor.MONOCULAR
                or last.frame_id == self.last_kf_frame_id):
            return
        depth = last.feats.depth
        cand = np.nonzero((depth > 0) & last.feats.valid)[0]
        if len(cand) == 0:
            return
        order = cand[np.argsort(depth[cand])]
        n_pts = 0
        for i in order:
            i = int(i)
            pid = int(last.bindings[i])
            need = pid < 0 or self.store.pt_n_obs[pid] < 1
            if need:
                pos = self._unproject(last, i)
                new_pid = self.store.add_point(pos, -1, last.feats.desc[i])
                last.bindings[i] = new_pid
                self.temporal_points.append(new_pid)
            n_pts += 1
            if depth[i] > self.s.depth_threshold and n_pts > 100:
                break

    def _track_localization_mode(self) -> bool:
        """ref: src/Tracking.cc:328-392: in localization mode run both a
        motion-model track and (if VO-drifting) relocalization."""
        frame = self.current
        if self.state == State.LOST:
            return self._relocalization()
        if not self.vo_flag:
            if self.velocity is not None:
                return self._track_with_motion_model()
            return self._track_reference_keyframe()
        # mbVO: few map matches — try both motion model and reloc
        ok_mm = False
        if self.velocity is not None:
            ok_mm = self._track_with_motion_model()
        saved = (frame.Tcw.copy() if frame.Tcw is not None else None,
                 frame.bindings.copy(), frame.outlier.copy())
        ok_reloc = self._relocalization()
        if ok_reloc:
            self.vo_flag = False
            return True
        if ok_mm:
            frame.Tcw, frame.bindings, frame.outlier = saved
            if self.vo_flag:
                for i in np.nonzero(frame.bindings >= 0)[0]:
                    if not frame.outlier[i]:
                        self.store.pt_found[int(frame.bindings[i])] += 1
            return True
        return False

    # ------------------------------------------------------------------
    # local map tracking
    # ------------------------------------------------------------------
    def _track_local_map(self) -> bool:
        """ref: Tracking::TrackLocalMap (src/Tracking.cc:931-976)."""
        self._update_local_map()
        self._search_local_points()
        n_in = self._optimize_pose(self.current)
        frame = self.current
        store = self.store
        n_map = 0
        for i in np.nonzero(frame.bindings >= 0)[0]:
            pid = int(frame.bindings[i])
            if not frame.outlier[i]:
                store.pt_found[pid] += 1
                if self.only_tracking or store.pt_n_obs[pid] >= 1:
                    n_map += 1
            elif self.sensor == Sensor.STEREO:
                frame.bindings[i] = -1
        self.n_inliers = n_map
        if (frame.frame_id < self.last_reloc_frame_id + self.max_frames
                and n_map < 50):
            return False
        return n_map >= 30

    def _update_local_map(self):
        """ref: UpdateLocalKeyFrames/UpdateLocalPoints
        (src/Tracking.cc:1232-1330, :1206-1230)."""
        frame = self.current
        store = self.store
        bound = frame.bindings[frame.bindings >= 0]
        bound = bound[store.pt_valid[bound]]
        kfs, _counts = store.obs.observers_of(bound)
        local = [int(k) for k in kfs if store.kf_valid[k]]
        if not local:
            return
        seen = set(local)
        best_kf = local[0]
        # neighbors: covisible, children, parent (cap 80, ref :1286)
        for kf in list(local):
            if len(local) > 80:
                break
            for nb in store.best_covisibles(kf, 10):
                if nb not in seen and store.kf_valid[nb]:
                    local.append(nb)
                    seen.add(nb)
                    break
            for ch in store.kf_children.get(kf, set()):
                if ch not in seen and store.kf_valid[ch]:
                    local.append(ch)
                    seen.add(ch)
                    break
            par = int(store.kf_parent[kf])
            if par >= 0 and par not in seen and store.kf_valid[par]:
                local.append(par)
                seen.add(par)
        self.local_kfs = local[:80]
        self.ref_kf = best_kf
        frame.ref_kf = best_kf
        # local candidate points in WINDOW-RELEVANCE order (best-KF
        # points first), hard-capped at the pinned bucket size: the
        # reference bounds its local map by keyframes (cap 80,
        # src/Tracking.cc:1286) but not by points; a fixed-shape device
        # pipeline must bound the candidate block too, or the matching
        # programs recompile mid-run when the map outgrows the bucket
        # (measured: a 30-50 s chain-step compile at frame 10 when the
        # early map crossed 2048 points).  Relevance order makes the
        # truncation drop the least-covisible window's points first.
        rows = store.kf_obs[np.asarray(self.local_kfs, np.int64)]
        flat = rows.ravel()
        pids_f = flat[flat >= 0]
        uniq, first = np.unique(pids_f, return_index=True)
        pids = uniq[np.argsort(first)]
        pids = pids[store.pt_valid[pids]]
        cap = self.s.bucket_local
        if len(pids) > cap:
            pids = pids[:cap]
        self.local_pts = pids
        self._local_window_epoch += 1

    def _search_local_points(self):
        """ref: Tracking::SearchLocalPoints (src/Tracking.cc:1144-1204)."""
        frame = self.current
        store = self.store
        already = set(
            int(p) for p in frame.bindings[frame.bindings >= 0]
        )
        for pid in already:
            if store.pt_valid[pid]:
                store.pt_visible[pid] += 1
        cand = np.array(
            [p for p in self.local_pts if int(p) not in already], np.int64
        )
        if len(cand) == 0:
            return
        M = self._buckets("local", len(cand))
        pts = pad_rows(store.pt_pos[cand], M)
        normals = pad_rows(store.pt_normal[cand], M)
        min_d = pad_rows(store.pt_min_dist[cand], M)
        max_d = pad_rows(store.pt_max_dist[cand], M)
        desc = pad_rows(store.pt_desc[cand], M)
        mask = pad_rows(np.ones(len(cand), bool), M, False)

        proj = matching.project_points(
            jnp.asarray(pts), jnp.asarray(normals),
            jnp.asarray(min_d), jnp.asarray(max_d), jnp.asarray(mask),
            jnp.asarray(frame.Tcw),
            jnp.float32(self.s.fx), jnp.float32(self.s.fy),
            jnp.float32(self.s.cx), jnp.float32(self.s.cy),
            jnp.float32(self.s.bf),
            self._bounds_dev, self.log_scale, self.s.n_levels,
        )
        in_f = np.asarray(proj.in_frustum)
        vis_ids = cand[in_f[: len(cand)]]
        store.pt_visible[vis_ids] += 1
        if len(vis_ids) == 0:
            return

        th = 1.0
        if self.sensor == Sensor.RGBD:
            th = 3.0
        if frame.frame_id < self.last_reloc_frame_id + 2:
            th = 5.0
        free = frame.feats.valid & (frame.bindings < 0)
        m = matching.search_local_points(
            proj, jnp.asarray(desc),
            frame.feats.device("xy"), frame.feats.device("ur"),
            frame.feats.device("octave"), frame.feats.device("desc"),
            jnp.asarray(free),
            self._sf_dev, th,
        )
        idx, _, ok = matching.to_host(m)
        idx, ok = idx[: len(cand)], ok[: len(cand)]
        for row in np.nonzero(ok)[0]:
            frame.bindings[idx[row]] = cand[row]

    # ------------------------------------------------------------------
    # keyframe decision / creation
    # ------------------------------------------------------------------
    def _need_new_keyframe(self) -> bool:
        """ref: Tracking::NeedNewKeyFrame (src/Tracking.cc:978-1062)."""
        if self.only_tracking:
            return False
        store = self.store
        frame = self.current
        n_kfs = int(store.kf_valid.sum())
        if (frame.frame_id < self.last_reloc_frame_id + self.max_frames
                and n_kfs > self.max_frames):
            return False
        min_obs = 3 if n_kfs > 2 else 2
        ref_matches = store.tracked_points_in_kf(self.ref_kf, min_obs)
        idle = (self.local_mapper is None
                or self.local_mapper.accepting_keyframes())

        n_tracked_close = 0
        n_nontracked_close = 0
        if self.sensor != Sensor.MONOCULAR:
            depth = frame.feats.depth
            close = (depth > 0) & (depth < self.s.depth_threshold)
            bound = (frame.bindings >= 0) & ~frame.outlier
            n_tracked_close = int(np.sum(close & bound))
            n_nontracked_close = int(np.sum(close & ~bound))
        need_close = n_tracked_close < 100 and n_nontracked_close > 70

        th_ref = 0.75
        if n_kfs < 2:
            th_ref = 0.4
        if self.sensor == Sensor.MONOCULAR:
            th_ref = 0.9

        c1a = frame.frame_id >= self.last_kf_frame_id + self.max_frames
        c1b = (frame.frame_id >= self.last_kf_frame_id + self.min_frames
               and idle)
        c1c = (self.sensor != Sensor.MONOCULAR
               and (self.n_inliers < ref_matches * 0.25 or need_close))
        c2 = ((self.n_inliers < ref_matches * th_ref or need_close)
              and self.n_inliers > 15)
        if _DEBUG_TRACK and (c1a or c1b or c1c) and not c2:
            print(f"[dbg]   need_kf DENIED c2: inl={self.n_inliers} "
                  f"ref_matches={ref_matches} th={th_ref} "
                  f"close={n_tracked_close}/{n_nontracked_close}",
                  flush=True)
        if (c1a or c1b or c1c) and c2:
            if idle:
                return True
            if self.local_mapper is not None:
                self.local_mapper.interrupt_ba()
                if self.sensor != Sensor.MONOCULAR:
                    return self.local_mapper.queue_size() < 3
            return False
        return False

    def _unproject(self, frame: Frame, i: int) -> np.ndarray:
        """ref: Frame::UnprojectStereo (src/Frame.cc:666-682)."""
        z = float(frame.feats.depth[i])
        u, v = frame.feats.xy[i]
        x = (u - self.s.cx) * z / self.s.fx
        y = (v - self.s.cy) * z / self.s.fy
        pc = np.array([x, y, z, 1.0], np.float32)
        Twc = np.linalg.inv(frame.Tcw)
        return (Twc @ pc)[:3]

    def _create_new_keyframe(self):
        """ref: Tracking::CreateNewKeyFrame (src/Tracking.cc:1064-1142)."""
        frame = self.current
        store = self.store
        with self.timers("ckf/insert"):
            kf = store.add_keyframe(
                frame.feats, frame.Tcw, frame.timestamp, frame.frame_id,
                bindings=np.where(frame.outlier, -1, frame.bindings),
            )
        self.ref_kf = kf
        frame.ref_kf = kf
        if self.sensor != Sensor.MONOCULAR:
          with self.timers("ckf/birth"):
            # vectorized CreateNewKeyFrame point birth (ref src/Tracking
            # .cc:1078-1133): depth-sorted candidates, create where the
            # binding is missing/bad/observation-less, stop after the
            # first candidate beyond ThDepth once >100 processed
            depth = frame.feats.depth
            cand = np.nonzero((depth > 0) & frame.feats.valid)[0]
            order = cand[np.argsort(depth[cand])]
            stop = (depth[order] > self.s.depth_threshold) & (
                np.arange(len(order)) + 1 > 100)
            first_stop = np.argmax(stop) if stop.any() else len(order) - 1
            order = order[: first_stop + 1] if len(order) else order
            pid = store.resolve_replaced_batch(frame.bindings[order])
            create = ((pid < 0) | ~store.pt_valid[np.maximum(pid, 0)]
                      | (store.pt_n_obs[np.maximum(pid, 0)] < 1))
            rows = order[create]
            if len(rows):
                # batched stereo unprojection (ref Frame::UnprojectStereo)
                z = depth[rows].astype(np.float32)
                u = frame.feats.xy[rows, 0]
                v = frame.feats.xy[rows, 1]
                pc = np.stack([
                    (u - self.s.cx) * z / self.s.fx,
                    (v - self.s.cy) * z / self.s.fy,
                    z, np.ones_like(z)], -1)
                Twc = np.linalg.inv(frame.Tcw)
                pos = (pc @ Twc.T)[:, :3].astype(np.float32)
                born = store.add_points_batch(pos, kf,
                                              frame.feats.desc[rows])
                store.add_observations_batch(born, kf, rows)
                frame.bindings[rows] = born
                store.compute_distinctive_batch(born)
                store.update_points_batch(born, self.scale_factors)
        self.last_kf_frame_id = frame.frame_id
        if _DEBUG_TRACK:
            print(f"[dbg] f{frame.frame_id} KF kf={kf}", flush=True)
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kf)

    # ------------------------------------------------------------------
    # relocalization (wired to the BoW database when available)
    # ------------------------------------------------------------------
    def _relocalization(self) -> bool:
        """ref: Tracking::Relocalization (src/Tracking.cc:1342-1503)."""
        if self.relocalizer is None:
            return False
        ok = self.relocalizer.relocalize(self.current, self)
        if ok:
            self.last_reloc_frame_id = self.current.frame_id
            self.relocalizations += 1
            self.log.info("relocalized at frame %d (total %d)",
                          self.current.frame_id, self.relocalizations)
        return ok

    # ------------------------------------------------------------------
    def reset(self):
        """ref: Tracking::Reset (src/Tracking.cc:1505-1551) — clears ALL
        threads' state: local mapping, loop closing (via the mapper's
        cascade), the BoW database, and the relocalizer all rebind to
        the fresh map."""
        n_resets = self.resets + 1
        self.log.info("system reset #%d: clearing map and all subsystems",
                      n_resets)
        store = self.store
        new_store = MapStore(store.n_feat)
        # keep cross-component erase hooks (e.g. KeyFrameDatabase.erase)
        # wired to the live store
        new_store.erase_hooks = store.erase_hooks
        self.__init__(
            self.s, self.sensor,
            new_store, self.builder,
            local_mapper=self.local_mapper,
            kf_database=self.kf_database,
            relocalizer=self.relocalizer,
        )
        if self.local_mapper is not None:
            self.local_mapper.reset(self.store)
        if self.kf_database is not None:
            self.kf_database.clear()
        if self.relocalizer is not None:
            self.relocalizer.store = self.store
        self.resets = n_resets

    def set_localization_mode(self, on: bool):
        """ref: System::{Activate,Deactivate}LocalizationMode
        (src/System.cc:126-158)."""
        self.only_tracking = on
        if not on:
            self.vo_flag = False
