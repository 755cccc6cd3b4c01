"""Multi-chip dry run body: executed in a subprocess whose environment
forces the CPU backend with a virtual n-device mesh
(JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=N), so the
sharded program compiles and runs without N real chips — and without
ever initializing a TPU client (round-1 failure mode: the driver env had
a mismatched libtpu and `device_put` crashed before any sharded code
ran).

Exercises the three §5.8 sharded paths:
  1. frame-parallel fused ORB extraction (one frame per device),
  2. edge-parallel global bundle adjustment (edges sharded, psum
     assembly over the mesh),
  3. the FULL fused tracking step (frontend + matching + 2x pose LM)
     one-frame-per-device.
"""

from __future__ import annotations

import sys

import numpy as np


def main(n_devices: int) -> None:
    import jax

    devs = jax.devices()
    assert len(devs) >= n_devices, (
        f"need {n_devices} devices, have {len(devs)} ({devs}); "
        "run via __graft_entry__.dryrun_multichip which forces the "
        "virtual CPU mesh"
    )

    from orb_slam2_tpu.parallel import multichip

    mesh = multichip.make_mesh(n_devices)

    # frame-parallel extraction: one tiny frame per device, with a
    # CORRECTNESS gate — sharded descriptors must equal the unsharded
    # frontend's bit-for-bit (an ok:true dryrun certifies parity, not
    # just "it ran")
    imgs = np.random.default_rng(0).uniform(
        0, 255, (n_devices, 96, 128)
    ).astype(np.float32)
    feats = multichip.extract_batch_sharded(
        mesh, imgs, n_features=128, n_levels=3
    )
    desc = np.asarray(feats.desc)
    from orb_slam2_tpu.ops import frontend

    f0 = frontend.extract(imgs[0], 128, 3, 1.2, 20, 7, 24)
    assert (np.asarray(f0.desc) == desc[0]).all(), \
        "sharded extraction != single-device extraction"
    np.testing.assert_allclose(np.asarray(f0.xy),
                               np.asarray(feats.xy)[0], rtol=1e-5)

    # edge-parallel BA: edges sharded over the mesh — sharded result
    # must match the single-device optimizer (psum reduction order only
    # perturbs f32 rounding, so approximate parity + tight cost match)
    from orb_slam2_tpu.solvers import ba

    prob, (fx, fy, cx, cy, bf) = multichip.synthetic_ba_problem(
        n_cams=4, n_pts=64, n_edges=64 * n_devices
    )
    cam_T, pts, err = multichip.optimize_sharded(
        mesh, prob, fx, fy, cx, cy, bf, iters=2, mode="cg"
    )
    jax.block_until_ready(cam_T)
    assert np.isfinite(np.asarray(err))
    cam_1, pts_1, err_1 = ba.optimize(
        prob, fx, fy, cx, cy, bf, iters=2, use_kernel=True, mode="cg"
    )
    np.testing.assert_allclose(np.asarray(cam_T), np.asarray(cam_1),
                               rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(pts_1),
                               rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(float(err), float(err_1), rtol=1e-2)

    # frame-parallel FULL tracking step (frontend + matching + 2x pose
    # LM in one compiled program), one tiny stereo frame per device
    from orb_slam2_tpu.config import Settings
    from orb_slam2_tpu.ops.frontend import padded_total

    rng = np.random.default_rng(1)
    B = n_devices
    H, W = 96, 128
    settings = Settings(fx=100.0, fy=100.0, cx=W / 2, cy=H / 2, bf=10.0,
                        width=W, height=H, n_features=64, n_levels=3,
                        fps=10.0, th_depth=40.0)
    L = padded_total(settings.n_features, settings.n_levels,
                     settings.scale_factor)
    M = 32
    scal = np.zeros((B, 20), np.float32)
    scal[:, :16] = np.eye(4, dtype=np.float32).reshape(-1)
    scal[:, 19] = M
    last_f32 = np.concatenate([
        rng.normal(0, 2, (B, L, 3)).astype(np.float32)
        + np.array([0, 0, 8], np.float32),
        np.ones((B, L, 1), np.float32)], -1)
    loc_f32 = np.zeros((B, M, 8), np.float32)
    loc_f32[:, :, :3] = rng.normal(0, 2, (B, M, 3)) + np.array([0, 0, 8])
    loc_f32[:, :, 5] = -1.0
    loc_f32[:, :, 6] = 1.0
    loc_f32[:, :, 7] = 50.0
    out = multichip.track_step_sharded(
        mesh, settings,
        rng.uniform(0, 255, (B, H, W)).astype(np.float32),
        rng.uniform(0, 255, (B, H, W)).astype(np.float32),
        scal, last_f32,
        rng.integers(0, 2 ** 32, (B, L, 8), dtype=np.uint64).astype(
            np.uint32),
        rng.integers(0, 3, (B, L)).astype(np.int32),
        rng.uniform(0, 360, (B, L)).astype(np.float32),
        loc_f32,
        rng.integers(0, 2 ** 32, (B, M, 8), dtype=np.uint64).astype(
            np.uint32),
    )
    jax.block_until_ready(out)
    arr = np.asarray(out)
    # the pack's tail is u32 descriptors BITCAST to f32 (can legally be
    # NaN bit patterns); check the numeric prefix only
    assert np.isfinite(arr[:, : arr.shape[1] - 8 * L]).all()
    print(f"dryrun_multichip OK: {n_devices} devices, "
          f"platform={devs[0].platform}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
