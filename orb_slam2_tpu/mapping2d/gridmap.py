"""2D occupancy-grid mapping — the abhineet123 fork's headline feature.

Host-side equivalent of the fork's grid-map stack:
  - Monosub's live grid builder (ref: Examples/ROS/ORB_SLAM2/src/
    ros_mono_sub.cc:219-425): per-keyframe point projection onto the
    x-z plane, per-cell occupied counters, Bresenham visited-ray
    counting from the keyframe cell, optional local-counter saturation,
    occupancy = 1 - occupied/visited thresholded to free/unknown/
    occupied, and a full rebuild on loop closure (:342-399).
  - System::SaveGridMapTUM's direct PGM export (ref: src/System.cc:
    481-629, fixed 450x300 grid with Bresenham ray casting).
  - the offline pointCloudToGridMap2D.py pipeline (same counters from a
    timestamped point export).

Bresenham is vectorized: every (keyframe-cell -> point-cell) ray is
sampled at max-axis resolution and accumulated with np.add.at.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class GridParams:
    """Monosub's tunables (ref: ros_mono_sub.cc:25-38, steps:76-78)."""

    scale_factor: float = 10.0       # cells per meter
    cloud_min_x: float = -20.0
    cloud_max_x: float = 20.0
    cloud_min_z: float = -20.0
    cloud_max_z: float = 20.0
    free_thresh: float = 0.55
    occupied_thresh: float = 0.50
    visit_thresh: int = 0
    use_local_counters: bool = False

    @property
    def shape(self) -> Tuple[int, int]:
        h = int(round((self.cloud_max_z - self.cloud_min_z)
                      * self.scale_factor))
        w = int(round((self.cloud_max_x - self.cloud_min_x)
                      * self.scale_factor))
        return h, w


def _rays_accumulate(visited, occupied, start_cell, pt_cells, params):
    """Vectorized Bresenham: increment visited along each ray and
    occupied at each endpoint (ref: processMapPt ros_mono_sub.cc:219)."""
    h, w = visited.shape
    if len(pt_cells) == 0:
        return
    d = pt_cells - start_cell[None, :]
    n_steps = np.maximum(np.abs(d[:, 0]), np.abs(d[:, 1])).max()
    n_steps = int(max(n_steps, 1))
    ts = np.linspace(0.0, 1.0, n_steps + 1)
    # (P, S, 2) sampled cells along each ray
    pts = start_cell[None, None, :] + d[:, None, :] * ts[None, :, None]
    cells = np.round(pts).astype(np.int64)
    # per-ray valid length: only steps up to its own endpoint
    own_len = np.maximum(np.abs(d[:, 0]), np.abs(d[:, 1]))
    step_ok = ts[None, :] * n_steps <= own_len[:, None] + 1e-9
    cx = cells[..., 0]
    cz = cells[..., 1]
    ok = step_ok & (cx >= 0) & (cx < w) & (cz >= 0) & (cz < h)
    # dedup consecutive duplicates is skipped: counters tolerate it the
    # same way the reference's per-cell increments do
    np.add.at(visited, (cz[ok], cx[ok]), 1)
    np.add.at(occupied, (pt_cells[:, 1], pt_cells[:, 0]), 1)


class GridMapper:
    """Live occupancy grid fed by the keyframe/point stream
    (Monosub equivalent)."""

    def __init__(self, store, params: Optional[GridParams] = None):
        self.store = store
        self.p = params or GridParams()
        h, w = self.p.shape
        self.visited = np.zeros((h, w), np.float32)
        self.occupied = np.zeros((h, w), np.float32)
        self._processed: List[int] = []

    # ------------------------------------------------------------------
    def _to_cell(self, x: np.ndarray, z: np.ndarray) -> np.ndarray:
        cx = ((x - self.p.cloud_min_x) * self.p.scale_factor)
        cz = ((z - self.p.cloud_min_z) * self.p.scale_factor)
        return np.stack([np.round(cx), np.round(cz)], -1).astype(np.int64)

    def _kf_points(self, kf: int) -> np.ndarray:
        row = self.store.kf_obs[kf]
        pids = row[row >= 0]
        pids = pids[self.store.pt_valid[pids]]
        return self.store.pt_pos[pids]

    def update_keyframe(self, kf: int):
        """Incremental update from one keyframe (ref: updateGridMap
        ros_mono_sub.cc:308-340)."""
        store = self.store
        if not store.kf_valid[kf]:
            return
        C = store.camera_center(kf)
        pts = self._kf_points(kf)
        if len(pts) == 0:
            return
        h, w = self.visited.shape
        start = self._to_cell(np.array([C[0]]), np.array([C[2]]))[0]
        start = np.clip(start, [0, 0], [w - 1, h - 1])
        cells = self._to_cell(pts[:, 0], pts[:, 2])
        inb = ((cells[:, 0] >= 0) & (cells[:, 0] < w)
               & (cells[:, 1] >= 0) & (cells[:, 1] < h))
        cells = cells[inb]
        if self.p.use_local_counters:
            # local counters saturate per-update (ref: processMapPts
            # :276-300): occupied cells count once per keyframe
            local_v = np.zeros_like(self.visited)
            local_o = np.zeros_like(self.occupied)
            _rays_accumulate(local_v, local_o, start, cells, self.p)
            pt_mask = local_o > 0
            local_v[pt_mask] = np.maximum(local_v[pt_mask], 1)
            local_o[pt_mask] = local_v[pt_mask]
            self.visited += local_v
            self.occupied += local_o
        else:
            _rays_accumulate(self.visited, self.occupied, start, cells,
                             self.p)
        self._processed.append(kf)

    def rebuild(self):
        """Full rebuild from every valid keyframe — invoked on loop
        closure (ref: resetGridMap ros_mono_sub.cc:342-399)."""
        self.visited[:] = 0
        self.occupied[:] = 0
        self._processed.clear()
        for kf in self.store.valid_kf_ids():
            self.update_keyframe(int(kf))

    # ------------------------------------------------------------------
    def occupancy(self) -> np.ndarray:
        """Free/unknown/occupied grid as u8 {255, 128, 0}
        (ref: getGridMap ros_mono_sub.cc:402-425)."""
        with np.errstate(divide="ignore", invalid="ignore"):
            p_free = np.where(self.visited > self.p.visit_thresh,
                              1.0 - self.occupied / np.maximum(
                                  self.visited, 1e-9),
                              -1.0)
        out = np.full(self.visited.shape, 128, np.uint8)
        out[p_free >= self.p.free_thresh] = 255
        out[(p_free >= 0) & (p_free < self.p.occupied_thresh)] = 0
        return out

    def ros_occupancy_data(self) -> np.ndarray:
        """nav_msgs/OccupancyGrid-style data: (1 - p_free) * 100, -1
        unknown (ref: :418-424)."""
        with np.errstate(divide="ignore", invalid="ignore"):
            p_free = np.where(self.visited > self.p.visit_thresh,
                              1.0 - self.occupied / np.maximum(
                                  self.visited, 1e-9),
                              np.nan)
        data = np.where(np.isnan(p_free), -1,
                        ((1.0 - p_free) * 100).astype(np.int64))
        return data.astype(np.int8)

    def save_pgm(self, path: str):
        save_pgm(self.occupancy(), path)


# ---------------------------------------------------------------------------
def save_pgm(grid: np.ndarray, path: str):
    """ASCII P2 PGM like the reference's savers (ref: src/System.cc:615)."""
    h, w = grid.shape
    with open(path, "w") as f:
        f.write(f"P2\n{w} {h}\n255\n")
        for row in grid:
            f.write(" ".join(str(int(v)) for v in row) + "\n")


def save_grid_map_pgm(store, path: str,
                      params: Optional[GridParams] = None):
    """One-shot export from the in-memory map (ref: System::SaveGridMapTUM
    src/System.cc:481-629, which ray-casts the full map into a fixed
    grid and writes PGM)."""
    m = GridMapper(store, params)
    m.rebuild()
    m.save_pgm(path)


def save_grid_map_tum(store, path: str):
    """Exact behavioral port of the fork's System::SaveGridMapTUM
    (ref: src/System.cc:481-629): fixed 450x300 grid over the camera
    x-y plane, upper-left corner (-1.5, -2.5), 10 mm cells, one
    occupied count per in-range map point, integer-error Bresenham
    visit rays from every observing keyframe, and the same ASCII P2
    grey mapping (unvisited=230, grey = occup/visit*255 boosted by
    +100 when nonzero, written as 255-grey).

    Two reference quirks are reproduced so outputs stay comparable
    cell-for-cell:

    - the endpoint-exchange branch (System.cc `if (x0 > x1)`) assigns
      the *_grid_y / *_grid_x values unconditionally, which for
      non-steep rays mixes the x and y grid coordinates;
    - the resulting out-of-range second index in `grid_visit[x][y]`
      aliases into subsequent rows of the contiguous [450][300]
      buffer, which we emulate by flat indexing (writes that would
      land beyond the whole buffer — C UB — are dropped).

    The Bresenham error loop is vectorized across all rays: each
    numpy step replays one `for (x = x0; x <= x1; x++)` iteration of
    every ray simultaneously with identical integer/double semantics.
    """
    ul_x, ul_y = -1.5, -2.5
    res = 10
    w_, h_ = 450, 300

    occup = np.zeros(w_ * h_, np.float64)   # flat [x][y] like the C arrays
    visit = np.zeros(w_ * h_, np.float64)

    def cells_of(px, py):
        # C: ((int)((p - ul) * 1000)) / 10 — both steps truncate toward 0
        gx = np.trunc(np.trunc((px - ul_x) * 1000.0) / res).astype(np.int64)
        gy = np.trunc(np.trunc((py - ul_y) * 1000.0) / res).astype(np.int64)
        return gx, gy

    pts = store.valid_pt_ids()
    if len(pts) == 0:
        grid = np.full((h_, w_), 230, np.int64)
        _write_p2(grid, path)
        return

    pos = store.pt_pos[pts].astype(np.float32)
    mp_gx, mp_gy = cells_of(pos[:, 0].astype(np.float64),
                            pos[:, 1].astype(np.float64))
    inb = (mp_gx >= 0) & (mp_gx < w_) & (mp_gy >= 0) & (mp_gy < h_)

    rays = []  # (okf_gx, okf_gy, mp_gx, mp_gy)
    kf_cell_cache: dict = {}
    for pid, gx, gy, ok in zip(pts, mp_gx, mp_gy, inb):
        if not ok:
            continue
        occup[int(gx) * h_ + int(gy)] += 1.0
        for kf, _feat in store.obs.items(int(pid)):
            if not store.kf_valid[kf]:
                continue
            c = kf_cell_cache.get(kf)
            if c is None:
                cc = store.camera_center(kf)
                kx, ky = cells_of(np.float64(cc[0]), np.float64(cc[1]))
                c = (int(kx), int(ky),
                     0 <= kx < w_ and 0 <= ky < h_)
                kf_cell_cache[kf] = c
            if c[2]:
                rays.append((c[0], c[1], int(gx), int(gy)))

    if rays:
        r = np.asarray(rays, np.int64)
        okx, oky, mpx, mpy = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
        steep = np.abs(mpy - oky) > np.abs(mpx - okx)
        x0 = np.where(steep, oky, okx)
        y0 = np.where(steep, okx, oky)
        x1 = np.where(steep, mpy, mpx)
        y1 = np.where(steep, mpx, mpy)
        swap = x0 > x1
        # reference quirk: the exchange uses *_grid_y / *_grid_x
        # regardless of `steep` (System.cc:576-583)
        x0 = np.where(swap, mpy, x0)
        x1 = np.where(swap, oky, x1)
        y0 = np.where(swap, mpx, y0)
        y1 = np.where(swap, okx, y1)
        deltax = x1 - x0
        deltay = np.abs(y1 - y0)
        with np.errstate(divide="ignore", invalid="ignore"):
            deltaerr = deltay.astype(np.float64) / deltax.astype(np.float64)
        ystep = np.where(y0 < y1, 1, -1).astype(np.int64)
        err = np.zeros(len(r), np.float64)
        y = y0.copy()
        n_steps = int(max(deltax.max(), 0))
        for i in range(n_steps + 1):
            act = i <= deltax                       # x = x0+i <= x1
            x = x0 + i
            fidx = np.where(steep, y * h_ + x, x * h_ + y)
            sel = act & (fidx >= 0) & (fidx < w_ * h_)
            np.add.at(visit, fidx[sel], 1.0)
            err = err + deltaerr
            dec = err >= 0.5                        # NaN compares False
            y = y + ystep * np.where(act & dec, 1, 0)
            err = err - np.where(dec, 1.0, 0.0)

    occ2 = occup.reshape(w_, h_)
    vis2 = visit.reshape(w_, h_)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = occ2 / vis2
    grey = np.trunc(np.where(vis2 == 0, 0.0, ratio) * 255).astype(np.int64)
    grey = np.where(grey > 0, grey + 100, grey)
    grey = np.minimum(grey, 255)
    out = np.where(vis2 == 0, 230, 255 - grey)      # [x][y]
    _write_p2(out.T, path)                          # rows over y, cols x


def _write_p2(grid: np.ndarray, path: str):
    """Reference's exact P2 writer: value + trailing space per cell,
    newline per row (ref: src/System.cc:605-625)."""
    h, w = grid.shape
    with open(path, "w") as f:
        f.write(f"P2\n{w} {h}\n255\n")
        for row in grid:
            f.write("".join(f"{int(v)} " for v in row) + "\n")


def grid_from_timestamped_points(points_path: str,
                                 params: Optional[GridParams] = None,
                                 kf_trajectory_path: Optional[str] = None
                                 ) -> np.ndarray:
    """Offline pipeline from Map::SaveWithTimestamps output — the port of
    the fork's pointCloudToGridMap2D.py (ref: :7-54, 97-120): each point
    line is `x y z ts...` where ts are the observing keyframes'
    timestamps; keyframe positions come from the TUM keyframe trajectory.
    Rays run from each observing keyframe to the point."""
    p = params or GridParams()
    h, w = p.shape
    visited = np.zeros((h, w), np.float32)
    occupied = np.zeros((h, w), np.float32)

    kf_pos: Dict[float, np.ndarray] = {}
    if kf_trajectory_path:
        for line in open(kf_trajectory_path):
            v = line.split()
            if len(v) >= 4:
                kf_pos[round(float(v[0]), 4)] = np.array(
                    [float(v[1]), float(v[2]), float(v[3])])

    def cell_of(x, z):
        return (int(round((x - p.cloud_min_x) * p.scale_factor)),
                int(round((z - p.cloud_min_z) * p.scale_factor)))

    starts, ends = [], []
    for line in open(points_path):
        v = line.split()
        if len(v) < 3:
            continue
        x, _, z = float(v[0]), float(v[1]), float(v[2])
        exz = cell_of(x, z)
        if not (0 <= exz[0] < w and 0 <= exz[1] < h):
            continue
        for ts in v[3:]:
            pos = kf_pos.get(round(float(ts), 4))
            if pos is None:
                continue
            sxz = cell_of(pos[0], pos[2])
            starts.append(sxz)
            ends.append(exz)
    if starts:
        starts = np.array(starts, np.int64)
        ends = np.array(ends, np.int64)
        for s in np.unique(starts, axis=0):
            sel = (starts == s[None]).all(1)
            _rays_accumulate(visited, occupied, s, ends[sel], p)

    with np.errstate(divide="ignore", invalid="ignore"):
        p_free = np.where(visited > p.visit_thresh,
                          1.0 - occupied / np.maximum(visited, 1e-9), -1.0)
    out = np.full((h, w), 128, np.uint8)
    out[p_free >= p.free_thresh] = 255
    out[(p_free >= 0) & (p_free < p.occupied_thresh)] = 0
    return out
