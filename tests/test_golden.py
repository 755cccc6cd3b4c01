"""Golden-trajectory regression + driver smoke test.

Pins tracking accuracy to a recorded run (VERDICT round-1 item 10:
"add a golden-trajectory regression ... so accuracy is pinned, not just
bounded") and exercises the run_slam driver end-to-end on an on-disk
KITTI-format miniature dataset, so the moment real TUM/KITTI/EuRoC data
is mounted the ATE-vs-reference experiment is one command away
(BASELINE.md procedure).

Regenerate the golden after an INTENTIONAL accuracy change:
    python tests/test_golden.py --regen
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam2_tpu.config import Sensor, Settings  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "data", "golden_stereo_traj.npz")

H, W = 240, 320
FX = FY = 260.0
BASELINE = 0.12


def _settings():
    return Settings(
        fx=FX, fy=FY, cx=W / 2, cy=H / 2, bf=FX * BASELINE,
        width=W, height=H, n_features=800, fps=10.0, th_depth=40.0,
    )


def _run_trajectory():
    """Deterministic stereo run; returns (timestamps, camera centers)."""
    from orb_slam2_tpu.system import System
    from synthetic import stereo_sequence, straight_trajectory

    s = _settings()
    poses = straight_trajectory(16, step=0.05, yaw_step=0.004)
    scene, pairs = stereo_sequence(s.K, H, W, BASELINE, poses)
    sys_ = System(s, Sensor.STEREO)
    for i, (l, r) in enumerate(pairs):
        sys_.track_stereo(l, r, i * 0.1)
    store = sys_.store
    ts, centers = [], []
    for e in sys_.tracker.trajectory:
        if e.lost or not store.kf_valid[e.ref_kf]:
            continue
        T = e.Tcr @ store.kf_pose[e.ref_kf]
        ts.append(e.timestamp)
        centers.append(-T[:3, :3].T @ T[:3, 3])
    return np.array(ts), np.array(centers, np.float32)


class TestGoldenTrajectory:
    def test_trajectory_matches_recorded_golden(self):
        """Camera centers must stay within 5 mm of the recorded run —
        catches silent accuracy regressions that bounded-ATE tests
        would wave through."""
        if not os.path.exists(GOLDEN):
            pytest.skip("golden not recorded (run tests/test_golden.py "
                        "--regen)")
        g = np.load(GOLDEN)
        ts, centers = _run_trajectory()
        assert len(ts) == len(g["ts"]), (len(ts), len(g["ts"]))
        np.testing.assert_allclose(ts, g["ts"], atol=1e-9)
        dev = np.linalg.norm(centers - g["centers"], axis=1)
        assert dev.max() < 5e-3, (
            f"max deviation {dev.max():.4f} m from golden at frame "
            f"{int(dev.argmax())}")


class TestDriverSmoke:
    def test_run_slam_stereo_kitti_end_to_end(self, tmp_path):
        """run_slam driver on a miniature on-disk KITTI-format dataset:
        loader -> System -> trajectory/stat outputs (ref driver:
        Examples/Stereo/stereo_kitti.cc)."""
        import cv2

        from orb_slam2_tpu.apps import run_slam
        from synthetic import stereo_sequence, straight_trajectory

        s = _settings()
        poses = straight_trajectory(8, step=0.05, yaw_step=0.002)
        scene, pairs = stereo_sequence(s.K, H, W, BASELINE, poses)

        seq = tmp_path / "00"
        (seq / "image_0").mkdir(parents=True)
        (seq / "image_1").mkdir()
        for i, (l, r) in enumerate(pairs):
            cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), l)
            cv2.imwrite(str(seq / "image_1" / f"{i:06d}.png"), r)
        (seq / "times.txt").write_text(
            "".join(f"{i * 0.1:.6e}\n" for i in range(len(pairs))))
        yaml = tmp_path / "settings.yaml"
        yaml.write_text(f"""%YAML:1.0
Camera.fx: {FX}
Camera.fy: {FY}
Camera.cx: {W / 2}
Camera.cy: {H / 2}
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: {W}
Camera.height: {H}
Camera.fps: 10.0
Camera.bf: {FX * BASELINE}
ThDepth: 40.0
ORBextractor.nFeatures: 800
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
        out = tmp_path / "result"
        run_slam.main([
            "stereo_kitti", str(yaml), str(seq), "--out", str(out),
        ])
        traj = (str(out) + "_CameraTrajectory_TUM.txt")
        assert os.path.exists(traj)
        rows = [l.split() for l in open(traj) if l.strip()]
        assert len(rows) >= len(pairs) - 2
        assert all(len(r) == 8 for r in rows)   # TUM: ts tx ty tz qxyzw


if __name__ == "__main__":
    if "--regen" in sys.argv:
        # record under the SAME backend/config the test suite runs with
        # (conftest.py forces CPU + highest matmul precision; a golden
        # recorded on the TPU backend would drift numerically)
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
        from orb_slam2_tpu.utils import setup_compile_cache

        setup_compile_cache("cpu")
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        ts, centers = _run_trajectory()
        np.savez(GOLDEN, ts=ts, centers=centers)
        print(f"golden recorded: {GOLDEN} ({len(ts)} frames)")
