"""Device-utilization breakdown of the fused tracking step (VERDICT r3 #6).

"8.6 ms median" says nothing about whether the chip computes or idles.
This probe separates the three components of a tracked frame on the
real TPU:

  1. T_dev    — pure device execution time of the fused step (blocked
                back-to-back runs, input reuse; no tunnel transfers),
  2. T_rtt    — tunnel round-trip floor (trivial op dispatch+pull),
  3. T_frame  — end-to-end per-frame time through the System fast path
                (upload + dispatch + pull + host bookkeeping).

and reports an MFU-style accounting from the compiled step's own cost
analysis: FLOPs and HBM bytes per step, achieved FLOP/s and bytes/s
against the chip's peaks — naming which resource bounds the step and
what fraction of the frame the device actually computes
(device_busy_frac = T_dev / T_frame).

Usage: python scripts/device_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

from orb_slam2_tpu.utils import ensure_live_backend, setup_compile_cache

_platform = ensure_live_backend()
setup_compile_cache(_platform)

import jax  # noqa: E402
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# TPU v5e (lite) single-chip peaks (public spec): 197 TFLOP/s bf16,
# 394 TOP/s int8, ~819 GB/s HBM bandwidth
PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_GBS = 819.0


def main():
    from orb_slam2_tpu.config import Sensor, Settings
    from orb_slam2_tpu.ops.frontend import padded_total
    from orb_slam2_tpu.slam import track_step as ts

    H, W = 376, 1240
    FX = 718.856
    s = Settings(
        fx=FX, fy=FX, cx=607.19, cy=185.22, bf=386.1448, width=W, height=H,
        n_features=2000, fps=10.0, th_depth=9.5,
    )
    n_feat = padded_total(s.n_features, s.n_levels, s.scale_factor)
    M = s.bucket_local
    cap = s.device_map_cap
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (H, W), np.uint8))

    # ---- tunnel RTT floor ------------------------------------------------
    one = jnp.float32(1.0)
    for _ in range(3):
        float(one + 1.0)
    t0 = time.perf_counter()
    n_rtt = 20
    for _ in range(n_rtt):
        float(one + 1.0)        # dispatch + pull one scalar
    t_rtt = (time.perf_counter() - t0) / n_rtt

    # ---- chained step: pure device time ---------------------------------
    step = ts.build_track_step_chained(s, True)
    chain = ts.ChainState(
        xy=jnp.asarray(rng.uniform(0, 300, (n_feat, 2)).astype(np.float32)),
        ur=jnp.full(n_feat, -1.0, jnp.float32),
        octave=jnp.zeros(n_feat, jnp.int32),
        angle=jnp.zeros(n_feat, jnp.float32),
        desc=jnp.asarray(rng.integers(0, 2 ** 32, (n_feat, 8),
                                      dtype=np.uint32)),
        pid=jnp.full(n_feat, -1, jnp.int32),
        T_cur=jnp.eye(4), velocity=jnp.eye(4),
    )
    mir_f32 = jnp.zeros((cap, 9), jnp.float32)
    mir_desc = jnp.zeros((cap, 8), jnp.uint32)
    cand = jnp.full(M, -1, jnp.int32)
    scal = jnp.asarray(np.array([1.0, 0.0], np.float32))

    out, new_chain = step(img, img, chain, mir_f32, mir_desc, cand, scal)
    jax.block_until_ready(out.f32_pack)
    t0 = time.perf_counter()
    n_it = 20
    for _ in range(n_it):
        out, _ = step(img, img, chain, mir_f32, mir_desc, cand, scal)
        jax.block_until_ready(out.f32_pack)
    t_step_blocked = (time.perf_counter() - t0) / n_it
    t_dev = max(t_step_blocked - t_rtt, 1e-9)

    # ---- compiled-step cost analysis ------------------------------------
    lowered = jax.jit(step.__wrapped__).lower(
        img, img, chain, mir_f32, mir_desc, cand, scal)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
    except Exception:
        ca = {}
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # ---- end-to-end frame time through the System fast path -------------
    from orb_slam2_tpu.system import System
    from synthetic import CylinderScene, circle_trajectory

    scene = CylinderScene(s.K, H, W, radius=8.0, tex_h=2048)
    poses = circle_trajectory(40, orbit_r=3.0,
                              total_angle=2 * np.pi * 1.5 * 40 / 240)
    Trl = np.eye(4, dtype=np.float32)
    Trl[0, 3] = -s.bf / FX
    pairs = [(scene.render(T), scene.render(Trl @ T)) for T in poses]
    s2 = Settings(**{k: getattr(s, k) for k in (
        "fx", "fy", "cx", "cy", "bf", "width", "height", "n_features",
        "fps", "th_depth")})
    sys_ = System(s2, Sensor.STEREO)      # unpipelined: per-call = solve
    sys_.precompile(stages=["frontend", "track", "modular", "mapping"])
    times = []
    for i, (left, right) in enumerate(pairs):
        t0 = time.perf_counter()
        sys_.track_stereo(left, right, i * 0.1)
        times.append(time.perf_counter() - t0)
        if i + 1 < len(pairs):
            sys_.prefetch(*pairs[i + 1])
    t_frame = float(np.median(sorted(times[5:])))

    print("\n=== device utilization (fused chained step, "
          f"{W}x{H}, {s.n_features} features, M={M}) ===")
    print(f"tunnel RTT floor        : {t_rtt * 1e3:8.2f} ms")
    print(f"step blocked (RTT incl.): {t_step_blocked * 1e3:8.2f} ms")
    print(f"step device time T_dev  : {t_dev * 1e3:8.2f} ms")
    print(f"frame end-to-end (sync) : {t_frame * 1e3:8.2f} ms (median, "
          "unpipelined System fast path)")
    print(f"device_busy_frac        : {t_dev / t_frame:8.2%} of the "
          "synchronous frame")
    if flops:
        print(f"step FLOPs              : {flops / 1e9:8.2f} GFLOP")
        print(f"achieved FLOP/s         : {flops / t_dev / 1e12:8.3f} "
              f"TFLOP/s ({flops / t_dev / PEAK_FLOPS_BF16:.2%} of bf16 "
              "peak)")
    if bytes_acc:
        gbs = bytes_acc / t_dev / 1e9
        print(f"step HBM bytes          : {bytes_acc / 1e6:8.1f} MB")
        print(f"achieved bytes/s        : {gbs:8.1f} GB/s "
              f"({gbs / PEAK_HBM_GBS:.2%} of HBM peak)")
        print("bound by                :",
              "HBM bandwidth" if gbs / PEAK_HBM_GBS >
              (flops / t_dev / PEAK_FLOPS_BF16 if flops else 0)
              else "compute/latency")
    print(f"\nnon-device share of a synchronous frame: "
          f"{(t_frame - t_dev) * 1e3:.2f} ms "
          "(tunnel RTT + uploads + host bookkeeping)")


if __name__ == "__main__":
    main()
