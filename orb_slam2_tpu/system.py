"""System: the public API facade.

Equivalent of ORB_SLAM2::System (ref: src/System.cc:33-678 /
include/System.h:61-136): builds the map, frame builder, tracker, local
mapper and loop closer, wires them together, exposes per-frame Track*
entries, the SLAM/localization mode switch, reset/shutdown, and all the
trajectory / map savers including the fork's grid-map outputs.

Scheduling: the reference spawns LocalMapping/LoopClosing/Viewer
threads (src/System.cc:85-104); here `scheduler="sync"` (default) runs
mapping + loop closing deterministically inline after each keyframe —
the testing mode SURVEY §4.4 calls for — and `scheduler="async"` moves
them to a worker thread with the same queue semantics.
"""

from __future__ import annotations

import copy
import threading
from typing import Optional

import numpy as np

from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.io import trajectory as traj_io
from orb_slam2_tpu.slam.frame import FrameBuilder
from orb_slam2_tpu.slam.local_mapping import LocalMapper
from orb_slam2_tpu.slam.map_store import MapStore
from orb_slam2_tpu.slam.tracking import State, Tracker


class System:
    def __init__(
        self,
        settings: Settings,
        sensor: Sensor,
        vocabulary=None,
        scheduler: Optional[str] = None,
        use_viewer: bool = False,
        viewer_port: Optional[int] = 0,
    ):
        if isinstance(settings, str):
            settings = Settings.from_yaml(settings)
        if sensor == Sensor.MONOCULAR:
            # mono local maps outgrow the stereo-tuned candidate block:
            # the init-boosted 2x feature budget triangulates 3k+ live
            # points into a tracking neighborhood, and a point past the
            # cap can never be bound, fails MapPointCulling's
            # >=3-observation rule, and churns (r5 measured on the mono
            # bench circuit: 7,938 of ~11k created points culled, bound
            # count decaying ~8%/frame between chain anchors — the
            # reference caps nothing in SearchLocalPoints).  Double the
            # block on a per-System COPY so co-resident stereo/RGB-D
            # systems keep their compiled shapes.  copy.copy, NOT
            # dataclasses.replace: replace() rebuilds from fields only
            # and silently drops dynamically-set attributes (measured:
            # a caller's settings.pipelined=True vanished, demoting the
            # bench mono pass to the synchronous fast path).
            settings = copy.copy(settings)
            settings.bucket_local *= 2
            # Mono always re-anchors from host state every frame (the
            # fused fast path) instead of the pipelined velocity-chain:
            # without per-frame depth, chain extrapolation between
            # anchors compounds into scale drift that no drift gate can
            # see (r5 measured on the full 480-frame bench circuit:
            # chain path map radial error p50 1.4-2.7 m with scale
            # drifting 6.8->7.3, vs 0.02 m and stable scale on the fast
            # path — a 10-20x map-quality gap for the same frames).  The
            # reference tracks mono synchronously for the same reason
            # (TrackWithMotionModel re-anchors on mLastFrame every
            # frame, src/Tracking.cc:853-899).
            if getattr(settings, "pipelined", False):
                settings.pipelined = False
        self.settings = settings
        self.sensor = sensor
        self.vocabulary = vocabulary

        self.builder = FrameBuilder(settings, vocabulary)
        n_pad = self._padded_features()
        self.store = MapStore(n_pad)

        self.kf_database = None
        self.loop_closer = None
        if vocabulary is not None:
            from orb_slam2_tpu.places.database import KeyFrameDatabase
            from orb_slam2_tpu.slam.loop_closing import LoopCloser

            self.kf_database = KeyFrameDatabase(vocabulary)
            self.store.erase_hooks.append(self.kf_database.erase)
            self.loop_closer = LoopCloser(
                settings, sensor, self.store, self.kf_database,
            )
        self.local_mapper = LocalMapper(
            settings, sensor, self.store, loop_closer=self.loop_closer,
            vocabulary=vocabulary,
        )
        if self.loop_closer is not None:
            self.loop_closer.local_mapper = self.local_mapper

        relocalizer = None
        if self.kf_database is not None:
            from orb_slam2_tpu.slam.relocalization import Relocalizer

            relocalizer = Relocalizer(settings, self.store, self.kf_database)

        self.tracker = Tracker(
            settings, sensor, self.store, self.builder,
            local_mapper=self.local_mapper,
            kf_database=self.kf_database,
            relocalizer=relocalizer,
        )

        # live viewer thread (ref: src/System.cc:99-103 spawns Viewer;
        # here it is an HTTP panel + optional local window, viz/live.py)
        self.viewer = None
        if use_viewer:
            from orb_slam2_tpu.viz.live import LiveViewer

            self.viewer = LiveViewer(self, http_port=viewer_port)

        self.scheduler = scheduler or settings.scheduler
        self._shutdown = False
        self._workers: list = []
        self._work_event = threading.Event()
        self._loop_event = threading.Event()
        if self.scheduler == "async":
            # reference thread topology (src/System.cc:85-104): tracking
            # on the caller's thread, LocalMapping and LoopClosing each
            # on their own, GBA spawned by LoopClosing (background_gba)
            # (flag lives on the mapper so it survives Tracker.reset)
            self.local_mapper.async_worker = True
            self._workers.append(threading.Thread(
                target=self._mapping_loop, daemon=True))
            if self.loop_closer is not None:
                self.loop_closer.background_gba = True
                self._workers.append(threading.Thread(
                    target=self._loop_closing_loop, daemon=True))
            for w in self._workers:
                w.start()

    def _padded_features(self) -> int:
        from orb_slam2_tpu.ops.frontend import padded_total

        n = padded_total(
            self.settings.n_features * 2,   # mono-init boost headroom
            self.settings.n_levels, self.settings.scale_factor,
        )
        n_plain = padded_total(
            self.settings.n_features,
            self.settings.n_levels, self.settings.scale_factor,
        )
        return n if self.sensor == Sensor.MONOCULAR else n_plain

    def precompile(self, stages=None, verbose: bool = False) -> dict:
        """Compile every shape-bucketed device program before the first
        frame (see precompile.py).  Without this, each program's first
        call pays a 1-50 s XLA compile wherever it lands in the run —
        the reference has no equivalent cost (its CPU kernels are
        precompiled by definition), so a real-time claim requires the
        compiles to happen here, not mid-circuit."""
        from orb_slam2_tpu.precompile import precompile

        return precompile(self, stages=stages, verbose=verbose)

    # ------------------------------------------------------------------
    # per-frame entries (ref: System::Track* src/System.cc:117-283)
    # ------------------------------------------------------------------
    def track_monocular(self, img: np.ndarray, timestamp: float):
        T = self.tracker.grab_monocular(img, timestamp)
        if self.viewer is not None:
            self.viewer.push_frame(img)
        self._pump()
        return T

    def track_stereo(self, img_l, img_r, timestamp: float):
        T = self.tracker.grab_stereo(img_l, img_r, timestamp)
        if self.viewer is not None:
            self.viewer.push_frame(img_l)
        self._pump()
        return T

    def track_rgbd(self, img, depth, timestamp: float):
        T = self.tracker.grab_rgbd(img, depth, timestamp)
        if self.viewer is not None:
            self.viewer.push_frame(img)
        self._pump()
        return T

    def prefetch(self, *imgs) -> None:
        """Start async device uploads for the NEXT frame's images.

        Call between frames (e.g. while the driver paces to the dataset
        frame rate) to overlap the host->device image transfer with idle
        time — the equivalent of a camera pipeline DMA-ing the next frame
        while the current one is processed.  Safe no-op if the images
        passed later differ.  For RGB-D pass (rgb, depth)."""
        if self.sensor == Sensor.RGBD and len(imgs) == 2:
            self.builder.prefetch(imgs[0], depth=imgs[1])
        else:
            self.builder.prefetch(*imgs)

    def poll(self) -> int:
        """Non-blocking drain of delivered pipelined results (see
        Tracker.poll).  Safe no-op outside pipelined mode."""
        n = self.tracker.poll()
        if n:
            self._pump()
        return n

    def _pump(self):
        if self.store is not self.tracker.store:
            # tracker reset swapped in a fresh map
            self.store = self.tracker.store
        if self.scheduler == "sync":
            self.local_mapper.spin()
            if self.loop_closer is not None:
                self.loop_closer.spin()
        else:
            self._work_event.set()

    def _mapping_loop(self):
        while not self._shutdown:
            self._work_event.wait(timeout=0.003)
            self._work_event.clear()
            self.local_mapper.spin()
            if self.loop_closer is not None and self.loop_closer.queue:
                self._loop_event.set()

    def _loop_closing_loop(self):
        while not self._shutdown:
            self._loop_event.wait(timeout=0.003)
            self._loop_event.clear()
            self.loop_closer.spin()

    # ------------------------------------------------------------------
    # mode switches / state (ref: src/System.cc:126-158, 286-303, 655-676)
    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        self.tracker.set_localization_mode(True)

    def deactivate_localization_mode(self):
        self.tracker.set_localization_mode(False)

    def map_changed(self) -> bool:
        idx = self.store.big_change_idx
        changed = getattr(self, "_last_big_change", 0) < idx
        self._last_big_change = idx
        return changed

    def reset(self):
        self.tracker.reset()
        self.store = self.tracker.store

    def shutdown(self):
        self._shutdown = True
        if self.viewer is not None:
            # ref: src/System.cc:305-317 waits for the viewer to finish
            self.viewer.close()
        # stop the mapping worker's drain loop and interrupt a local BA
        # in flight (ref: LocalMapping::RequestFinish + Optimizer
        # setForceStopFlag, src/LocalMapping.cc:705-757)
        self.local_mapper.request_finish()
        lc = self.loop_closer
        if lc is not None and lc.gba is not None and lc.gba.running:
            lc.gba.request_stop()
            lc.gba.wait()
        self._work_event.set()
        self._loop_event.set()
        for w in self._workers:
            w.join(timeout=60.0)

    def tracking_state(self) -> State:
        return self.tracker.state

    def stats(self) -> dict:
        """Counters for observability (SURVEY §5.5): map size, loop and
        GBA lifecycle, resets, relocalizations.  The reference exposes
        these only through scattered couts; here they are one queryable
        surface."""
        lc = self.loop_closer
        gba = lc.gba if lc is not None else None
        return {
            "keyframes": int(self.store.kf_valid.sum()),
            "map_points": int(len(self.store.valid_pt_ids())),
            "frames_tracked": len(self.tracker.trajectory),
            "big_change_idx": self.store.big_change_idx,
            "loops_closed": lc.loops_closed if lc is not None else 0,
            "gba_runs_finished": gba.runs_finished if gba is not None else 0,
            "gba_runs_aborted": gba.runs_aborted if gba is not None else 0,
            "resets": self.tracker.resets,
            "relocalizations": self.tracker.relocalizations,
        }

    def get_tracked_map_points(self) -> np.ndarray:
        f = self.tracker.current
        if f is None:
            return np.zeros(0, np.int64)
        return f.bindings[f.bindings >= 0]

    def get_tracked_keypoints_un(self) -> np.ndarray:
        """Undistorted keypoints of the current frame, (N, 2) float32
        (ref: System::GetTrackedKeyPointsUn src/System.cc:672-676)."""
        f = self.tracker.current
        if f is None:
            return np.zeros((0, 2), np.float32)
        return f.feats.xy[f.feats.valid]

    def change_calibration(self, path: str):
        """Hot-swap camera intrinsics/distortion/baseline from a settings
        file (ref: Tracking::ChangeCalibration src/Tracking.cc:1553-1584;
        the reference re-triggers Frame::mbInitialComputations — here the
        camera-dependent compiled steps and undistortion state are
        rebuilt)."""
        from orb_slam2_tpu.config import _parse_opencv_yaml

        with open(path, "r") as f:
            d = _parse_opencv_yaml(f.read())
        s = self.settings

        def g(key, cur):
            return float(d.get(key, cur))

        s.fx = g("Camera.fx", s.fx)
        s.fy = g("Camera.fy", s.fy)
        s.cx = g("Camera.cx", s.cx)
        s.cy = g("Camera.cy", s.cy)
        s.k1 = g("Camera.k1", 0.0)
        s.k2 = g("Camera.k2", 0.0)
        s.p1 = g("Camera.p1", 0.0)
        s.p2 = g("Camera.p2", 0.0)
        s.k3 = g("Camera.k3", 0.0)
        s.bf = g("Camera.bf", s.bf)
        self.tracker.refresh_calibration()

    # ------------------------------------------------------------------
    # savers (ref: src/System.cc:326-653)
    # ------------------------------------------------------------------
    def save_trajectory_tum(self, path: str):
        traj_io.save_trajectory_tum(self.store, self.tracker.trajectory, path)

    def save_keyframe_trajectory_tum(self, path: str):
        traj_io.save_keyframe_trajectory_tum(self.store, path)

    def save_trajectory_kitti(self, path: str):
        traj_io.save_trajectory_kitti(self.store, self.tracker.trajectory, path)

    def save_map_points_obj(self, path: str):
        self.store.export_points_obj(path)

    def save_map_with_timestamps(self, path: str):
        self.store.export_points_with_timestamps(path)

    def save_map_with_pose(self, path: str):
        """Fork feature (ref: Map::SaveWithPose src/Map.cc:169-186 — its
        body is identical to SaveWithTimestamps: point position followed
        by observing-keyframe timestamps)."""
        self.store.export_points_with_timestamps(path)

    def save_grid_map_tum(self, path: str):
        """Fork feature — exact port of System::SaveGridMapTUM
        (ref: src/System.cc:481-629): fixed 450x300 grid, cell-for-cell
        comparable output. For the configurable Monosub-style grid use
        `mapping2d.gridmap.save_grid_map_pgm`."""
        from orb_slam2_tpu.mapping2d.gridmap import save_grid_map_tum

        save_grid_map_tum(self.store, path)

    def save_2d_map_points_tum(self, path: str, x: int = 0, y: int = 2):
        """Fork feature (ref: System::Save2dMapPointsTUM src/System.cc:631).

        (x, y) select which world-coordinate axes land in the two file
        columns, like the reference's ``const int x, const int y``
        parameters (it indexes the position Mat directly); the defaults
        give the usual ground-plane (x, z) projection.  Format matches
        the reference: leading space, fixed 7-decimal floats.
        """
        with open(path, "w") as f:
            for pid in self.store.valid_pt_ids():
                pos = self.store.pt_pos[pid]
                f.write(f" {pos[x]:.7f} {pos[y]:.7f}\n")

    def save_map(self, path: str):
        self.store.save(path)

    @property
    def map(self) -> MapStore:
        return self.store
