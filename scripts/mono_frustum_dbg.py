"""Mono starvation diagnostic: WHY are local-map candidates invisible?

Runs the bench mono regime (pipelined, KITTI-shaped, half angular rate)
and, every few frames, recomputes the frustum sub-checks host-side for
the tracker's candidate block:
  - in-image projection
  - distance band [0.8*min_dist, 1.2*max_dist]
  - viewing angle cos(normal, view) >= 0.5
plus the GEOMETRIC quality of map points: after a median-ratio scale
alignment of KF poses to ground truth, a cylinder-surface point must sit
at radius ~8 from the y-axis; the radial residual is the triangulation
error in GT units.

Usage: [MFD_FRAMES=160] python scripts/mono_frustum_dbg.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache
platform = ensure_live_backend()
setup_compile_cache(platform)

import jax.numpy as jnp
from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.ops import frontend
from orb_slam2_tpu.places.vocabulary import Vocabulary
from orb_slam2_tpu.system import System
from synthetic import CylinderScene, circle_trajectory

H, W = 376, 1240
FX = FY = 718.856
CX, CY = 607.19, 185.22
settings = Settings(fx=FX, fy=FY, cx=CX, cy=CY, bf=386.1448,
                    width=W, height=H, n_features=2000, fps=10.0,
                    th_depth=9.5)
settings.pipelined = True
scene = CylinderScene(settings.K, H, W, radius=8.0, tex_h=2048)

n_frames = int(os.environ.get("MFD_FRAMES", "160"))
poses = circle_trajectory(2 * 240, orbit_r=3.0,
                          total_angle=2 * np.pi * 1.5)[:n_frames]

probe = circle_trajectory(30, orbit_r=3.0, total_angle=2 * np.pi)
descs = []
for T in probe:
    f = frontend.extract(jnp.asarray(scene.render(T)), n_features=2000)
    descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
voc = Vocabulary.train(np.concatenate(descs), k=10, L=4, levels_up=1)

s = System(settings, Sensor.MONOCULAR, vocabulary=voc, scheduler="async")
s.precompile()
print("precompiled", flush=True)

store = s.map
tr = s.tracker


def diag(fi):
    pids = np.asarray(tr.local_pts, np.int64)
    if len(pids) == 0 or tr.current is None or tr.current.Tcw is None:
        return
    pids = pids[store.pt_valid[pids]]
    Tcw = tr.current.Tcw
    Rm, t = Tcw[:3, :3], Tcw[:3, 3]
    P = store.pt_pos[pids]
    pc = P @ Rm.T + t
    z = pc[:, 2]
    front = z > 0
    u = FX * pc[:, 0] / np.maximum(z, 1e-9) + CX
    v = FY * pc[:, 1] / np.maximum(z, 1e-9) + CY
    in_img = front & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    C = -Rm.T @ t
    PO = P - C
    dist = np.linalg.norm(PO, axis=-1)
    band = (dist >= 0.8 * store.pt_min_dist[pids]) & \
           (dist <= 1.2 * store.pt_max_dist[pids])
    nrm = store.pt_normal[pids]
    cosv = np.sum(PO * nrm, -1) / np.maximum(dist, 1e-9)
    view_ok = cosv >= 0.5
    allok = in_img & band & view_ok
    # geometric quality: align KF trajectory to GT (similarity: scale by
    # median centroid-distance ratio, then Procrustes on centered sets)
    kfs = np.nonzero(store.kf_valid)[0]
    if len(kfs) >= 3:
        Ck = []
        Gk = []
        for k in kfs:
            Tk = store.kf_pose[k]
            Ck.append(-Tk[:3, :3].T @ Tk[:3, 3])
            fid = int(store.kf_frame_id[k]) if hasattr(store, "kf_frame_id") \
                else None
            if fid is None or fid >= len(poses):
                Gk.append(None)
            else:
                Tg = poses[fid]
                Gk.append(-Tg[:3, :3].T @ Tg[:3, 3])
        keep = [i for i, g in enumerate(Gk) if g is not None]
        Ck = np.array([Ck[i] for i in keep])
        Gk = np.array([Gk[i] for i in keep])
        mc, mg = Ck.mean(0), Gk.mean(0)
        Cc, Gc = Ck - mc, Gk - mg
        sc = (np.median(np.linalg.norm(Gc, axis=-1))
              / max(np.median(np.linalg.norm(Cc, axis=-1)), 1e-9))
        U, _, Vt = np.linalg.svd(Cc.T @ Gc)
        Ra = (U @ Vt).T
        if np.linalg.det(Ra) < 0:
            U[:, -1] *= -1
            Ra = (U @ Vt).T
        Pg = (P - mc) @ Ra.T * sc + mg
        rad = np.sqrt(Pg[:, 0] ** 2 + Pg[:, 2] ** 2)
        rad_err = np.abs(rad - 8.0)
        q = np.percentile(rad_err, [50, 90])
    else:
        q = (np.nan, np.nan)
        sc = np.nan
    print(f"[frustum] f{fi} cand={len(pids)} front={int(front.sum())} "
          f"in_img={int(in_img.sum())} band={int(band.sum())} "
          f"view={int(view_ok.sum())} ALL={int(allok.sum())} "
          f"rad_err_p50={q[0]:.2f} p90={q[1]:.2f} scale={sc:.2f}",
          flush=True)
    # failure attribution among in-image points
    ii = in_img
    if ii.sum():
        print(f"          of_in_img: band_fail={int((ii & ~band).sum())} "
              f"view_fail={int((ii & ~view_ok).sum())} "
              f"both={int((ii & ~band & ~view_ok).sum())}", flush=True)


t0 = time.perf_counter()
for i, T in enumerate(poses):
    s.track_monocular(scene.render(T), i * 0.1)
    if i % 8 == 0 and i > 20:
        diag(i)
    time.sleep(max(0.0, (i + 1) * 0.1 - (time.perf_counter() - t0)))

print("state:", tr.state.name, "kfs:", int(store.kf_valid.sum()),
      "relocs:", tr.relocalizations, "resets:", tr.resets,
      "pts:", int(store.pt_valid.sum()), flush=True)
s.shutdown()
