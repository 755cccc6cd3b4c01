"""Frame construction: device feature extraction + per-sensor association.

Host-side equivalent of the three Frame constructors
(ref: src/Frame.cc:61-228): run the fused ORB frontend on device,
undistort keypoints, stereo-match or associate RGB-D depth, and land a
fixed-shape FrameFeatures block plus per-frame tracking state.  The
reference's 64x48 feature grid (src/Frame.cc:230) is unnecessary here:
window membership tests happen inside the batched matchers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import Settings
from orb_slam2_tpu.geometry import camera as cam
from orb_slam2_tpu.ops import frontend, stereo
from orb_slam2_tpu.slam.map_store import FrameFeatures


@dataclass
class Frame:
    """Per-frame tracking state (ref: include/Frame.h:43)."""

    frame_id: int
    timestamp: float
    feats: FrameFeatures
    Tcw: Optional[np.ndarray] = None          # (4,4) f32; None = untracked
    bindings: np.ndarray = None               # (N,) i64 map-point id or -1
    outlier: np.ndarray = None                # (N,) bool pose-opt outliers
    ref_kf: int = -1

    def __post_init__(self):
        n = self.feats.n
        if self.bindings is None:
            self.bindings = np.full(n, -1, np.int64)
        if self.outlier is None:
            self.outlier = np.zeros(n, bool)

    @property
    def n_feat(self) -> int:
        return self.feats.n

    def camera_center(self) -> np.ndarray:
        T = self.Tcw
        return -T[:3, :3].T @ T[:3, 3]


class FrameBuilder:
    """Builds Frames for a given Settings (one compiled pipeline per
    image shape x config)."""

    def __init__(self, settings: Settings, vocabulary=None):
        self.s = settings
        self.vocabulary = vocabulary
        self.intr = cam.Intrinsics(
            jnp.float32(settings.fx), jnp.float32(settings.fy),
            jnp.float32(settings.cx), jnp.float32(settings.cy),
        )
        self.dist = (
            jnp.asarray(settings.dist_coeffs, jnp.float32)
            if settings.has_distortion else None
        )
        self.bounds = cam.compute_image_bounds(
            settings.width, settings.height, self.intr,
            settings.dist_coeffs if settings.has_distortion else None,
        )
        self.scale_factors = settings.scale_factors().astype(np.float32)
        self.level_sigma2 = settings.level_sigma2().astype(np.float32)
        self._next_id = 0
        # EuRoC-style rectification maps (ref: stereo_euroc.cc:97-137)
        self._rect = None
        if settings.rectification is not None:
            self._rect = cam.rectify_maps(settings.rectification)

    def refresh_calibration(self):
        """Re-derive intrinsics/distortion/bounds from the (mutated)
        Settings (ref: Tracking::ChangeCalibration)."""
        s = self.s
        self.intr = cam.Intrinsics(
            jnp.float32(s.fx), jnp.float32(s.fy),
            jnp.float32(s.cx), jnp.float32(s.cy),
        )
        self.dist = (
            jnp.asarray(s.dist_coeffs, jnp.float32)
            if s.has_distortion else None
        )
        self.bounds = cam.compute_image_bounds(
            s.width, s.height, self.intr,
            s.dist_coeffs if s.has_distortion else None,
        )

    def prefetch(self, *imgs: np.ndarray, depth: np.ndarray = None) -> None:
        """Start async uploads for images that will be tracked NEXT.

        A real-time driver has dead time between frames (camera period /
        dataset pacing); issuing the uint8 image upload there takes the
        h2d transfer off the tracked frame's critical path — over the
        remote-TPU tunnel that transfer is the single biggest per-frame
        cost.  Keyed by object identity; consumed by the next _upload of
        the same array.  `depth` is uploaded float32 (RGB-D)."""
        self._prefetched = {
            id(im): jnp.asarray(
                im if im.dtype == np.uint8
                else np.clip(im, 0, 255).astype(np.uint8))
            for im in imgs if im is not None
        }
        if depth is not None:
            self._prefetched[id(depth)] = jnp.asarray(
                depth if depth.dtype == np.float32
                else depth.astype(np.float32))

    def _take_prefetched(self, img):
        pre = getattr(self, "_prefetched", None)
        if pre:
            dev = pre.pop(id(img), None)
            if dev is not None and dev.shape == img.shape:
                return dev
        return None

    def _upload(self, img: np.ndarray) -> jnp.ndarray:
        """Host->device image upload as uint8 (4x less tunnel traffic than
        f32; the frontend casts on device)."""
        dev = self._take_prefetched(img)
        if dev is not None and dev.dtype == jnp.uint8:
            return dev
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        return jnp.asarray(img)

    def _upload_depth(self, img: np.ndarray) -> jnp.ndarray:
        """Float32 upload for RGB-D depth images (no uint8 quantization)."""
        dev = self._take_prefetched(img)
        if dev is not None and dev.dtype == jnp.float32:
            return dev
        if img.dtype != np.float32:
            img = img.astype(np.float32)
        return jnp.asarray(img)

    def _extract(self, img: np.ndarray, n_features: int):
        return frontend.extract(
            self._upload(img),
            n_features=n_features,
            n_levels=self.s.n_levels,
            scale_factor=self.s.scale_factor,
            ini_th=self.s.ini_th_fast,
            min_th=self.s.min_th_fast,
        )

    def _base_features(self, feats, n: int, ur_dev=None,
                       depth_dev=None) -> FrameFeatures:
        xy_dev = feats.xy.astype(jnp.float32)
        if self.dist is not None:
            xy_dev = cam.undistort_points(xy_dev, self.intr, self.dist)
        dev = {
            "xy": xy_dev,
            "octave": feats.octave,
            "angle": feats.angle,
            "desc": feats.desc,
            "valid": feats.valid,
        }
        # pack every float-compatible field into ONE device->host pull
        # (remote-TPU tunnels are latency-bound per transfer)
        parts = [
            xy_dev.reshape(-1),
            feats.xy.astype(jnp.float32).reshape(-1),
            feats.angle.astype(jnp.float32),
            feats.octave.astype(jnp.float32),
            feats.valid.astype(jnp.float32),
        ]
        if ur_dev is not None:
            dev["ur"] = ur_dev
            dev["depth"] = depth_dev
            parts += [ur_dev.astype(jnp.float32),
                      depth_dev.astype(jnp.float32)]
        packed = np.asarray(jnp.concatenate(parts))
        xy = packed[:2 * n].reshape(n, 2)
        xy_raw = packed[2 * n:4 * n].reshape(n, 2)
        angle = packed[4 * n:5 * n]
        octave = packed[5 * n:6 * n].astype(np.int32)
        valid = packed[6 * n:7 * n] > 0.5
        if ur_dev is not None:
            ur = packed[7 * n:8 * n].astype(np.float32)
            depth = packed[8 * n:9 * n].astype(np.float32)
        else:
            ur = np.full(n, -1.0, np.float32)
            depth = np.full(n, -1.0, np.float32)
        return FrameFeatures(
            xy=xy.astype(np.float32),
            xy_raw=xy_raw.astype(np.float32),
            ur=ur,
            depth=depth,
            octave=octave,
            angle=angle.astype(np.float32),
            desc=np.asarray(feats.desc, np.uint32),
            valid=valid,
            node=np.full(n, -1, np.int32),
            word=np.full(n, -1, np.int32),
            dev=dev,
        )

    def _assign_bow(self, ff: FrameFeatures):
        if self.vocabulary is not None:
            node, word = self.vocabulary.assign_nodes(ff.desc, ff.valid)
            ff.node[:] = node
            ff.word[:] = word

    def _make(self, ff: FrameFeatures, timestamp: float) -> Frame:
        fid = self._next_id
        self._next_id += 1
        return Frame(frame_id=fid, timestamp=timestamp, feats=ff)

    # ------------------------------------------------------------------
    def monocular(self, img: np.ndarray, timestamp: float,
                  init_boost: bool = False) -> Frame:
        """ref: Frame mono ctor (src/Frame.cc:174-228); the initializer
        doubles the feature budget (ref: src/Tracking.cc:121-126)."""
        n_features = self.s.n_features * (2 if init_boost else 1)
        feats = self._extract(img, n_features)
        ff = self._base_features(feats, feats.n)
        self._assign_bow(ff)
        return self._make(ff, timestamp)

    def stereo_pair(self, img_l: np.ndarray, img_r: np.ndarray,
                    timestamp: float) -> Frame:
        """ref: Frame stereo ctor (src/Frame.cc:61-117) — the reference
        spawns two extraction threads; here both images run back-to-back
        on the same chip (still one compiled kernel each)."""
        if self._rect is not None:
            (mxl, myl), (mxr, myr) = self._rect
            img_l = np.asarray(cam.remap_bilinear(
                jnp.asarray(img_l), jnp.asarray(mxl), jnp.asarray(myl)))
            img_r = np.asarray(cam.remap_bilinear(
                jnp.asarray(img_r), jnp.asarray(mxr), jnp.asarray(myr)))
        fl, matches = frontend.extract_stereo_pair(
            self._upload(img_l), self._upload(img_r),
            jnp.asarray(self.scale_factors),
            # maxD = bf / minZ with minZ = baseline (ref: Frame.cc:475-477)
            jnp.float32(self.s.bf), jnp.float32(self.s.fx),
            n_features=self.s.n_features,
            n_levels=self.s.n_levels,
            scale_factor=self.s.scale_factor,
            ini_th=self.s.ini_th_fast,
            min_th=self.s.min_th_fast,
        )
        ff = self._base_features(fl, fl.n, ur_dev=matches.u_right,
                                 depth_dev=matches.depth)
        self._assign_bow(ff)
        return self._make(ff, timestamp)

    def rgbd(self, img: np.ndarray, depth_img: np.ndarray,
             timestamp: float) -> Frame:
        """ref: Frame RGB-D ctor (src/Frame.cc:119-171)."""
        feats = self._extract(img, self.s.n_features)
        factor = self.s.depth_map_factor
        if abs(factor - 1.0) > 1e-9 and factor != 0:
            factor = 1.0 / factor
        ur, depth = stereo.depth_from_rgbd(
            feats.xy, feats.valid, jnp.asarray(depth_img),
            factor, self.s.bf,
        )
        ff = self._base_features(feats, feats.n, ur_dev=ur, depth_dev=depth)
        self._assign_bow(ff)
        return self._make(ff, timestamp)
