"""Ahead-of-time compilation of every shape-bucketed device program.

The reference's CPU kernels need no compilation, so its worst frame is
bounded by actual work (Examples/Stereo/stereo_kitti.cc:100-122 paces a
loop that never stalls).  Under XLA, the first call at each padded shape
pays a 1-50 s compile — and a compile landing mid-run (or worse, while
the loop closer holds store.lock) turns a real-time system into one with
multi-second frames.

Every dynamically sized device program in this package pads its data
dimensions to bucket minimums pinned in Settings (bucket_* fields), so
the full set of (program, shape) pairs a run needs is ENUMERABLE from
the configuration alone.  `precompile(system)` walks that registry and
compiles each one with dummy inputs before the first frame; afterwards a
run whose live sizes stay under the pins never compiles on the hot path.

Compile results also land in JAX's persistent compile cache
(utils.setup_compile_cache), so later processes pay only executable
deserialization, not compilation.

Usage:
    system = System(settings, Sensor.STEREO, vocabulary=voc)
    system.precompile()          # seconds per program via the return dict
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_tpu.config import Sensor
from orb_slam2_tpu.ops import matching
from orb_slam2_tpu.ops.frontend import padded_total
from orb_slam2_tpu.slam import track_step as ts
from orb_slam2_tpu.solvers import ba, epnp, pose_graph, pose_lm
from orb_slam2_tpu.solvers import sim3_solver
from orb_slam2_tpu.solvers import triangulation as tri
from orb_slam2_tpu.utils import bucket_size


def _block(x):
    jax.block_until_ready(x)


def precompile(system, stages: Optional[List[str]] = None,
               verbose: bool = False) -> Dict[str, float]:
    """Compile every device program the given System can dispatch.

    stages: subset of {"frontend", "track", "modular", "mapping",
    "reloc", "loop", "gba"}; default = all that apply to the sensor and
    configuration (reloc/loop only when a vocabulary is present).
    Returns {program_name: seconds} (compile+execute of the dummy call;
    warm persistent-cache entries deserialize in a fraction of the cold
    compile time).
    """
    s = system.settings
    sensor = system.sensor
    mono = sensor == Sensor.MONOCULAR
    have_voc = system.vocabulary is not None
    if stages is None:
        stages = ["frontend", "track", "modular", "mapping"]
        if have_voc:
            stages += ["reloc", "loop"]
        stages += ["gba"]
    rng = np.random.default_rng(0)

    H, W = s.height, s.width
    n_feat = padded_total(s.n_features, s.n_levels, s.scale_factor)
    n_levels = s.n_levels
    sf = jnp.asarray(s.scale_factors().astype(np.float32))
    ls2 = jnp.asarray(s.level_sigma2().astype(np.float32))
    bounds = jnp.asarray(np.array([0.0, W, 0.0, H], np.float32))
    log_sf = float(np.log(s.scale_factor))
    fx, fy = jnp.float32(s.fx), jnp.float32(s.fy)
    cx, cy = jnp.float32(s.cx), jnp.float32(s.cy)
    bf = jnp.float32(s.bf)

    # dummy per-frame feature blocks at the compiled frame shape
    def feat_block(n):
        return dict(
            xy=jnp.asarray(rng.uniform(0, min(H, W), (n, 2))
                           .astype(np.float32)),
            ur=jnp.asarray(np.full(n, -1.0, np.float32)),
            depth=jnp.asarray(np.full(n, -1.0, np.float32)),
            octave=jnp.zeros(n, jnp.int32),
            angle=jnp.zeros(n, jnp.float32),
            desc=jnp.zeros((n, 8), jnp.uint32),
            node=jnp.zeros(n, jnp.int32),
            valid=jnp.zeros(n, bool),
        )

    fb = feat_block(n_feat)
    img_u8 = rng.integers(0, 255, (H, W), np.uint8)
    eye4 = jnp.asarray(np.eye(4, dtype=np.float32))

    items: List[Tuple[str, str, Callable]] = []

    def add(stage, name, fn):
        items.append((stage, name, fn))

    # ------------------------------------------------------------------
    # frontend: the builder's extraction paths (modular frames + init)
    # ------------------------------------------------------------------
    def _frontend_frames():
        frames = []
        if sensor == Sensor.STEREO:
            frames.append(system.builder.stereo_pair(img_u8, img_u8, 0.0))
        elif sensor == Sensor.RGBD:
            depth = np.full((H, W), 5.0, np.float32)
            frames.append(system.builder.rgbd(img_u8, depth, 0.0))
        else:
            frames.append(system.builder.monocular(img_u8, 0.0,
                                                   init_boost=True))
            frames.append(system.builder.monocular(img_u8, 0.0,
                                                   init_boost=False))
        for f in frames:
            if have_voc:
                system.tracker._assign_frame_bow(f)
        return frames

    add("frontend", "builder+bow", _frontend_frames)

    # ------------------------------------------------------------------
    # track: the fused fast step and the pipelined chain step
    # ------------------------------------------------------------------
    M_loc = s.bucket_local
    cap = int(getattr(s, "device_map_cap", 1 << 17))

    def _fast_step():
        step = system.tracker._get_fast_step()
        img_l = system.builder._upload(img_u8)
        if sensor == Sensor.RGBD:
            img_r = system.builder._upload_depth(
                np.full((H, W), 5.0, np.float32))
        else:
            img_r = img_l
        scal = np.zeros(20, np.float32)
        scal[:16] = np.eye(4, dtype=np.float32).reshape(-1)
        scal[18] = 1.0
        out = step(
            img_l, img_r, jnp.asarray(scal),
            jnp.zeros((n_feat, 4), jnp.float32),
            jnp.zeros((n_feat, 8), jnp.uint32),
            fb["octave"], fb["angle"],
            jnp.zeros((M_loc, 8), jnp.float32),
            jnp.zeros((M_loc, 8), jnp.uint32),
            jnp.zeros(M_loc, jnp.uint8),
        )
        _block(out.f32_pack)
        ts.unpack_track_out(out, n_feat, M_loc)

    add("track", "fast_step", _fast_step)

    if True:   # all sensors ride the pipelined chain step (r5: + rgbd)
        def _chain_step():
            step = system.tracker._get_chain_step()
            img_l = system.builder._upload(img_u8)
            if sensor == Sensor.RGBD:
                img_r = system.builder._upload_depth(
                    np.full((H, W), 5.0, np.float32))
            else:
                img_r = img_l
            chain = ts.ChainState(
                xy=fb["xy"], ur=fb["ur"], octave=fb["octave"],
                angle=fb["angle"], desc=fb["desc"],
                pid=jnp.full(n_feat, -1, jnp.int32),
                T_cur=eye4, velocity=eye4,
            )
            out, new_chain = step(
                img_l, img_r, chain,
                jnp.zeros((cap, 9), jnp.float32),
                jnp.zeros((cap, 8), jnp.uint32),
                jnp.full(M_loc, -1, jnp.int32),
                jnp.asarray(np.array([1.0, 0.0], np.float32)),
            )
            _block(out.f32_pack)
            ts.unpack_track_out(out, n_feat, M_loc)

        add("track", "chain_step", _chain_step)

        def _mirror_deltas():
            from orb_slam2_tpu.slam.device_map import _apply_delta
            f32 = jnp.zeros((cap, 9), jnp.float32)
            desc = jnp.zeros((cap, 8), jnp.uint32)
            n_pad = 256
            while n_pad <= 16384:
                f32, desc = _apply_delta(
                    f32, desc, jnp.full(n_pad, -1, jnp.int32),
                    jnp.zeros((n_pad, 9), jnp.float32),
                    jnp.zeros((n_pad, 8), jnp.uint32))
                n_pad *= 2
            _block(f32)

        add("track", "mirror_deltas", _mirror_deltas)

    # ------------------------------------------------------------------
    # modular tracking path (fallbacks: ref-KF tracking, local map)
    # ------------------------------------------------------------------
    def _optimize_pose():
        obs = pose_lm.PoseObs(
            jnp.zeros((n_feat, 3), jnp.float32),
            jnp.zeros((n_feat, 3), jnp.float32),
            jnp.ones(n_feat, jnp.float32),
            jnp.zeros(n_feat, bool),
        )
        T, inl, n_in = pose_lm.optimize_pose(eye4, obs, fx, fy, cx, cy, bf)
        # the host pulls T+inliers as ONE packed array (tracking.py)
        _block(jnp.concatenate([T.reshape(-1), inl.astype(jnp.float32)]))

    add("modular", "optimize_pose", _optimize_pose)

    if have_voc:
        def _search_by_nodes():
            for ratio in (0.7, 0.75):   # traced; one compile, two runs
                m = matching.search_by_nodes(
                    fb["desc"], fb["node"], fb["valid"], fb["angle"],
                    fb["desc"], fb["node"], fb["valid"], fb["angle"],
                    ratio=ratio,
                )
                matching.to_host(m)

        add("modular", "search_by_nodes", _search_by_nodes)

    def _local_points():
        proj = matching.project_points(
            jnp.zeros((M_loc, 3), jnp.float32),
            jnp.zeros((M_loc, 3), jnp.float32),
            jnp.zeros(M_loc, jnp.float32), jnp.ones(M_loc, jnp.float32),
            jnp.zeros(M_loc, bool), eye4,
            fx, fy, cx, cy, bf, bounds, log_sf, n_levels,
        )
        m = matching.search_local_points(
            proj, jnp.zeros((M_loc, 8), jnp.uint32),
            fb["xy"], fb["ur"], fb["octave"], fb["desc"], fb["valid"],
            sf, 1.0,
        )
        matching.to_host(m)

    add("modular", "project+search_local", _local_points)

    def _search_last():
        variants = [(False, False)]
        if not mono:
            variants += [(True, False), (False, True)]
        for fwd, bwd in variants:
            m = matching.search_last_frame(
                jnp.zeros((n_feat, 3), jnp.float32),
                jnp.zeros(n_feat, bool), fb["octave"],
                fb["desc"], fb["angle"], eye4,
                fb["xy"], fb["ur"], fb["octave"], fb["desc"],
                fb["angle"], fb["valid"],
                fx, fy, cx, cy, bf, bounds, sf,
                7.0, forward=fwd, backward=bwd,
            )
            matching.to_host(m)

    add("modular", "search_last_frame", _search_last)

    # ------------------------------------------------------------------
    # local mapping: triangulation, fusion, local BA
    # ------------------------------------------------------------------
    B = s.bucket_nb
    B_tri = bucket_size(20 if mono else 10, s.bucket_nb)
    M_fuse = s.bucket_fuse
    # mapper programs run on store-shaped keyframe rows, which for mono
    # carry the 2x init-boost feature width (System._padded_features)
    n_feat_s = system.store.n_feat
    fbs = fb if n_feat_s == n_feat else feat_block(n_feat_s)
    mir = system.local_mapper.kf_mirror

    if have_voc and n_feat_s != n_feat:
        # the mapper's deferred keyframe BoW descends store-width rows
        # (mono keeps the 2x init-boost width); the frontend entry only
        # covered frame width
        def _kf_bow():
            system.vocabulary.assign_nodes(
                np.zeros((n_feat_s, 8), np.uint32),
                np.zeros(n_feat_s, bool))

        add("mapping", "kf_bow_descend", _kf_bow)

    if mir is not None:
        def _kf_mirror_set():
            from orb_slam2_tpu.slam.kf_mirror import _mirror_set
            for U in (1, 2, 4):
                mir.f32, mir.i32, mir.desc, mir.valid = _mirror_set(
                    mir.f32, mir.i32, mir.desc, mir.valid,
                    jnp.zeros(U, jnp.int32),
                    jnp.zeros((U, n_feat_s, 5), jnp.float32),
                    jnp.zeros((U, n_feat_s, 2), jnp.int32),
                    jnp.zeros((U, n_feat_s, 8), jnp.uint32),
                    jnp.zeros((U, n_feat_s), bool),
                )
            _block(mir.f32)
            # the warmup zeroed row 0 of the LIVE mirror: invalidate it
            # so a precompile() issued after frames were tracked cannot
            # leave keyframe 0 present-but-zeroed (ADVICE r4 low)
            mir.node_dirty(0)

        add("mapping", "kf_mirror_set", _kf_mirror_set)

        def _triangulate_gather():
            packed = tri.triangulate_gather(
                eye4, jnp.broadcast_to(eye4[None], (B_tri, 4, 4)),
                jnp.int32(0), jnp.zeros(B_tri, jnp.int32),
                jnp.zeros(n_feat_s, jnp.int32),
                mir.f32, mir.i32, mir.desc,
                fbs["valid"], jnp.zeros((B_tri, n_feat_s), bool),
                jnp.zeros(B_tri, bool),
                fx, fy, cx, cy, bf, sf, ls2,
            )
            _block(packed)
            tri.unpack_triangulate_batch(packed, B_tri, n_feat_s)

        add("mapping", "triangulate_gather", _triangulate_gather)

        def _fuse_gather():
            for M in (M_fuse, 2 * M_fuse):
                packed = matching.fuse_points_gather(
                    jnp.zeros((M, 3), jnp.float32),
                    jnp.zeros(M, bool),
                    jnp.zeros((M, 8), jnp.uint32),
                    jnp.zeros((M, 3), jnp.float32),
                    jnp.zeros(M, jnp.float32), jnp.ones(M, jnp.float32),
                    jnp.broadcast_to(eye4[None], (B, 4, 4)),
                    jnp.zeros(B, jnp.int32),
                    mir.f32, mir.i32, mir.desc, mir.valid,
                    jnp.zeros(B, bool),
                    fx, fy, cx, cy, bf, bounds, sf, ls2, log_sf,
                    n_levels,
                )
                _block(packed)
                matching.unpack_fuse_batch(packed, B, M)

        add("mapping", "fuse_points_gather", _fuse_gather)
    else:
        def _triangulate():
            def stack(a):
                return jnp.broadcast_to(a[None], (B_tri,) + a.shape)

            packed = tri.triangulate_batch(
                eye4,
                fbs["xy"], fbs["ur"], fbs["depth"], fbs["octave"],
                fbs["desc"], fbs["node"], fbs["angle"], fbs["valid"],
                jnp.broadcast_to(eye4[None], (B_tri, 4, 4)),
                stack(fbs["xy"]), stack(fbs["ur"]), stack(fbs["depth"]),
                stack(fbs["octave"]), stack(fbs["desc"]),
                stack(fbs["node"]), stack(fbs["angle"]),
                stack(fbs["valid"]),
                jnp.zeros(B_tri, bool),
                fx, fy, cx, cy, bf, sf, ls2,
            )
            _block(packed)
            tri.unpack_triangulate_batch(packed, B_tri, n_feat_s)

        add("mapping", "triangulate_batch", _triangulate)

        def _fuse_batch():
            def stack(a):
                return jnp.broadcast_to(a[None], (B,) + a.shape)

            for M in (M_fuse, 2 * M_fuse):
                packed = matching.fuse_points_batch(
                    jnp.zeros((M, 3), jnp.float32),
                    jnp.zeros(M, bool),
                    jnp.zeros((M, 8), jnp.uint32),
                    jnp.zeros((M, 3), jnp.float32),
                    jnp.zeros(M, jnp.float32), jnp.ones(M, jnp.float32),
                    jnp.broadcast_to(eye4[None], (B, 4, 4)),
                    stack(fbs["xy"]), stack(fbs["ur"]),
                    stack(fbs["octave"]), stack(fbs["desc"]),
                    stack(fbs["valid"]),
                    jnp.zeros(B, bool),
                    fx, fy, cx, cy, bf, bounds, sf, ls2, log_sf,
                    n_levels,
                )
                _block(packed)
                matching.unpack_fuse_batch(packed, B, M)

        add("mapping", "fuse_points_batch", _fuse_batch)

    def _fuse():
        # reverse fuse into the new keyframe (fuse candidates can
        # outgrow the pin once the map matures — cover one growth step)
        for M in (M_fuse, 2 * M_fuse):
            fm = matching.fuse_points(
                jnp.zeros((M, 3), jnp.float32),
                jnp.zeros(M, bool),
                jnp.zeros((M, 8), jnp.uint32),
                jnp.zeros((M, 3), jnp.float32),
                jnp.zeros(M, jnp.float32), jnp.ones(M, jnp.float32),
                eye4,
                fbs["xy"], fbs["ur"], fbs["octave"], fbs["desc"],
                fbs["valid"],
                fx, fy, cx, cy, bf, bounds, sf, ls2, log_sf, n_levels,
            )
            _block(fm.ok)

    add("mapping", "fuse_points", _fuse)

    K, P, E = s.bucket_ba_cams, s.bucket_ba_pts, s.bucket_ba_edges

    def _ba_problem(K, P, E):
        cam_T = jnp.broadcast_to(eye4[None], (K, 4, 4))
        cam_fixed = jnp.asarray(
            np.concatenate([[True], np.zeros(K - 1, bool)]))
        return ba.BAProblem(
            cam_T, cam_fixed, jnp.ones(K, bool),
            jnp.asarray(rng.normal(0, 1, (P, 3)).astype(np.float32) +
                        np.array([0, 0, 5], np.float32)),
            jnp.ones(P, bool),
            jnp.asarray((np.arange(E) % K).astype(np.int32)),
            jnp.asarray((np.arange(E) % P).astype(np.int32)),
            jnp.zeros((E, 3), jnp.float32).at[:, 2].set(-1.0),
            jnp.ones(E, jnp.float32),
            jnp.ones(E, bool),
        )

    def _local_ba():
        # pin + the first growth rung: at reference keyframe density the
        # local window's points cross the P bucket and K crosses the pin
        # (JAX_LOG_COMPILES at forced density: local_ba_chain compiled
        # mid-run at (2K, 2P, 2E) — same GIL stall as the GBA rungs)
        # dims grow independently here too (shared mapper StickyBuckets):
        # the E bucket lags P when points double at ~2.4 obs/point
        for Kl, Pl, El in ((K, P, E), (K, 2 * P, E),
                           (2 * K, 2 * P, E), (2 * K, 2 * P, 2 * E)):
            prob = _ba_problem(Kl, Pl, El)
            for second in (True, False):
                out = ba.local_ba_chain(prob, fx, fy, cx, cy, bf,
                                        iters1=5, iters2=10, mode="dense",
                                        second_round=second)
                _block(out[0])

    add("mapping", "local_ba_chain", _local_ba)

    # ------------------------------------------------------------------
    # relocalization (EPnP RANSAC + guided reprojection)
    # ------------------------------------------------------------------
    if have_voc:
        def _pnp():
            # BoW match counts land in [15, ~500]: two bucket shapes
            for Mr in (s.bucket_reloc, 2 * s.bucket_reloc):
                res = epnp.solve_pnp_ransac(
                    jnp.asarray(rng.normal(0, 1, (Mr, 3))
                                .astype(np.float32)),
                    jnp.zeros((Mr, 2), jnp.float32),
                    jnp.ones(Mr, jnp.float32),
                    jnp.zeros(Mr, bool),
                    jnp.asarray(rng.integers(0, Mr, (128, 6))
                                .astype(np.int32)),
                    fx, fy, cx, cy,
                )
                _block(res.Tcw)

        add("reloc", "solve_pnp_ransac", _pnp)

        def _reloc_search():
            # guided reprojection pads candidates to the KF feature
            # capacity (relocalization.py) — one shape per orb_dist round
            Mr = system.store.n_feat
            for orb_dist in (100, 64):      # static per round
                m = matching.search_reloc_points(
                    jnp.zeros((Mr, 3), jnp.float32),
                    jnp.zeros(Mr, bool),
                    jnp.zeros((Mr, 8), jnp.uint32),
                    jnp.zeros(Mr, jnp.float32), jnp.ones(Mr, jnp.float32),
                    jnp.zeros(Mr, jnp.float32),
                    eye4,
                    fb["xy"], fb["octave"], fb["desc"], fb["angle"],
                    fb["valid"],
                    fx, fy, cx, cy, bounds, sf, log_sf, n_levels,
                    jnp.float32(10.0), orb_dist=orb_dist,
                )
                matching.to_host(m)

        add("reloc", "search_reloc_points", _reloc_search)

    # ------------------------------------------------------------------
    # loop closing: Sim3 solve/refine, guided projection, pose graph
    # ------------------------------------------------------------------
    if have_voc:
        fix_scale = sensor != Sensor.MONOCULAR
        M_lp = s.bucket_loop_pts

        def _sim3_ladder():
            # BoW match counts (RANSAC) and Sim3-extended counts (refine)
            # land in [20, ~512] on real circuits
            for n_pad in (s.bucket_sim3, 2 * s.bucket_sim3,
                          4 * s.bucket_sim3):
                pts = jnp.asarray(
                    rng.normal(0, 1, (n_pad, 3)).astype(np.float32))
                uv = jnp.zeros((n_pad, 2), jnp.float32)
                mk = jnp.zeros(n_pad, bool)
                res = sim3_solver.solve_sim3_ransac(
                    pts, pts, uv, uv,
                    jnp.ones(n_pad, jnp.float32),
                    jnp.ones(n_pad, jnp.float32),
                    mk,
                    jnp.asarray(rng.integers(0, n_pad, (128, 3))
                                .astype(np.int32)),
                    fx, fy, cx, cy, fix_scale=fix_scale,
                )
                _block(res.R12)
                out = sim3_solver.refine_sim3(
                    pts, pts, uv, uv,
                    jnp.ones(n_pad, jnp.float32),
                    jnp.ones(n_pad, jnp.float32),
                    mk, res.R12, res.t12, res.s12,
                    fx, fy, cx, cy, fix_scale=fix_scale,
                )
                _block(out[0])

        add("loop", "sim3_solve+refine", _sim3_ladder)

        def _sim3_mutual():
            nf = system.store.n_feat
            z3 = jnp.zeros((nf, 3), jnp.float32)
            zb = jnp.zeros(nf, bool)
            zf = jnp.zeros(nf, jnp.float32)
            zi = jnp.zeros(nf, jnp.int32)
            z2 = jnp.zeros((nf, 2), jnp.float32)
            zd = jnp.zeros((nf, 8), jnp.uint32)
            idx12, agree = matching.search_by_sim3_mutual(
                z3, zb, zd, zf, jnp.ones(nf, jnp.float32), zi, z2,
                z3, zb, zd, zf, jnp.ones(nf, jnp.float32), zi, z2,
                eye4, eye4,
                jnp.asarray(np.eye(3, dtype=np.float32)),
                jnp.zeros(3, jnp.float32), jnp.float32(1.0),
                fx, fy, cx, cy, bounds, sf, log_sf, n_levels, th=7.5,
            )
            _block(agree)

        add("loop", "search_by_sim3_mutual", _sim3_mutual)

        def _sim3_projection():
            # th=10 (acceptance count) and th=4 (SearchAndFuse) are
            # traced scalars — one compile
            m = matching.search_by_sim3_projection(
                jnp.zeros((M_lp, 3), jnp.float32),
                jnp.zeros(M_lp, bool),
                jnp.zeros((M_lp, 8), jnp.uint32),
                jnp.zeros(M_lp, jnp.float32), jnp.ones(M_lp, jnp.float32),
                jnp.asarray(np.eye(3, dtype=np.float32)),
                jnp.zeros(3, jnp.float32), jnp.float32(1.0),
                fb["xy"], fb["octave"], fb["desc"], fb["valid"],
                fx, fy, cx, cy, bounds, sf, log_sf, n_levels,
                jnp.float32(10.0),
            )
            matching.to_host(m)

        add("loop", "search_by_sim3_projection", _sim3_projection)

        def _sim3_host_ops():
            # eager host-side Sim3 composition at loop-correction time
            # (geometry/sim3 compose/inverse on (3,3) device arrays)
            from orb_slam2_tpu.geometry import sim3 as sim3_geo
            eye3 = jnp.asarray(np.eye(3, dtype=np.float32))
            S = (eye3, jnp.zeros(3, jnp.float32), jnp.float32(1.0))
            out = sim3_geo.compose(S, sim3_geo.inverse(S))
            _block(out[0])
            np.asarray(out[0]), np.asarray(out[1]), np.asarray(out[2])

        add("loop", "sim3_host_ops", _sim3_host_ops)

        def _pose_graph():
            Kp, Ep = s.bucket_pg_cams, s.bucket_pg_edges
            eye3 = np.eye(3, dtype=np.float32)
            prob = pose_graph.PoseGraphProblem(
                jnp.broadcast_to(jnp.asarray(eye3)[None], (Kp, 3, 3)),
                jnp.zeros((Kp, 3), jnp.float32),
                jnp.ones(Kp, jnp.float32),
                jnp.asarray(np.concatenate([[True],
                                            np.zeros(Kp - 1, bool)])),
                jnp.ones(Kp, bool),
                jnp.asarray((np.arange(Ep) % Kp).astype(np.int32)),
                jnp.asarray(((np.arange(Ep) + 1) % Kp).astype(np.int32)),
                jnp.broadcast_to(jnp.asarray(eye3)[None], (Ep, 3, 3)),
                jnp.zeros((Ep, 3), jnp.float32),
                jnp.ones(Ep, jnp.float32),
                jnp.ones(Ep, bool),
            )
            mode = "dense" if Kp <= 256 else "cg"
            R_o, t_o, s_o = pose_graph.optimize(prob, iters=20, mode=mode)
            _block(s_o)

        add("loop", "pose_graph", _pose_graph)

    # ------------------------------------------------------------------
    # global BA (background thread; chunked LM + outlier pass)
    # ------------------------------------------------------------------
    def _gba():
        # GBA packs ALL keyframes; its buckets outgrow the local-BA pins
        # as the map grows, and a first-encounter shape compiles ON THE
        # GBA THREAD mid-run — which, on a single-core host, stalls the
        # tracker through the GIL for the whole trace+compile (measured:
        # an 11.5 s worst frame in the unpipelined bench pass, and
        # 11.4 s at forced keyframe density, both attributed via
        # JAX_LOG_COMPILES to jit(optimize) at an unwarmed rung).  Warm
        # the growth rungs real regimes reach: points cross the P bucket
        # by ~15 keyframes (before the first loop), K crosses 2K around
        # 32 keyframes (soak), and forced reference density doubles both
        # again.  Rungs match the StickyBuckets pow2 ladder in
        # global_ba.py.
        # The three dims grow INDEPENDENTLY (StickyBuckets): measured
        # real shapes include (32, 8192, 16384) — P doubled while E did
        # not (edges/point ~2.4, so the E bucket lags P's) — which a
        # jointly-scaled ladder misses.  Warm the reachable lattice:
        # K in {2K, 4K} (dense mode caps at 64 cams, global_ba.py
        # _snapshot), P in {P, 2P, 4P}, E/P in {2, 4} (every point
        # carries 2-4 observations in practice; E below 2P needs
        # majority single-observation points, which MapPointCulling
        # removes).
        rungs = []
        for Kg in (2 * K, 4 * K):
            for Pg in (P, 2 * P, 4 * P):
                for Eg in (2 * Pg, 4 * Pg):
                    # E's sticky minimum is the configured edge bucket —
                    # shapes below it are unreachable
                    Eg = max(Eg, E)
                    if (Kg, Pg, Eg) not in rungs:
                        rungs.append((Kg, Pg, Eg))
        for Kg, Pg, Eg in rungs:
            prob = _ba_problem(Kg, Pg, Eg)
            cam_T, pts, _ = ba.optimize(prob, fx, fy, cx, cy, bf,
                                        iters=5, use_kernel=True,
                                        mode="dense")
            _block(cam_T)
            bad = ba.classify_outliers(prob, fx, fy, cx, cy, bf)
            _block(bad)
            # the eager outlier-mask update between GBA passes
            # (global_ba.py: prob.edge_mask & ~bad)
            _block(prob.edge_mask & ~bad)

    add("gba", "global_ba", _gba)

    # ------------------------------------------------------------------
    out: Dict[str, float] = {}
    for stage, name, fn in items:
        if stage not in stages:
            continue
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        out[f"{stage}/{name}"] = round(dt, 2)
        if verbose:
            print(f"precompile {stage}/{name}: {dt:.1f}s", flush=True)
    return out
