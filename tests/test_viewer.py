"""Live viewer: render correctness + HTTP menu protocol.

The reference's Viewer thread renders the map and frame at camera rate
with menu toggles (ref: src/Viewer.cc:54-170); here the same loop is a
software renderer behind an HTTP panel (orb_slam2_tpu/viz/live.py).
"""

import json
import time
import urllib.request

import numpy as np
import pytest

from orb_slam2_tpu.config import Sensor, Settings
from orb_slam2_tpu.system import System
from synthetic import stereo_sequence, straight_trajectory

H, W = 240, 320
FX = FY = 260.0
BASE = 0.1


def _settings():
    return Settings(
        fx=FX, fy=FY, cx=W / 2, cy=H / 2, bf=FX * BASE, width=W, height=H,
        n_features=800, fps=10.0, th_depth=40.0,
    )


@pytest.fixture(scope="module")
def tracked_system():
    settings = _settings()
    poses = straight_trajectory(6, step=0.03, yaw_step=0.002)
    _, pairs = stereo_sequence(settings.K, H, W, BASE, poses)
    sys_ = System(settings, Sensor.STEREO, use_viewer=True, viewer_port=0)
    for i, (l, r) in enumerate(pairs):
        sys_.track_stereo(l, r, i * 0.1)
    yield sys_
    sys_.shutdown()


def _get(port, path, timeout=5.0):
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=timeout) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


class TestLiveViewer:
    def test_map_render_draws_content(self, tracked_system):
        from orb_slam2_tpu.viz.live import MapRenderer

        img = MapRenderer(tracked_system).render()
        assert img.shape == (768, 1024, 3)
        # points + frusta must have been drawn over the white canvas
        assert (img < 250).any(axis=2).sum() > 100

    def test_follow_camera_centers_current_pose(self, tracked_system):
        from orb_slam2_tpu.viz.live import MapRenderer

        r = MapRenderer(tracked_system)
        follow = r.render(follow=True)
        # green current-camera frustum visible near image center
        g = (follow[:, :, 1].astype(int) - follow[:, :, 0] > 60)
        ys, xs = np.nonzero(g)
        assert len(xs) > 0
        assert abs(xs.mean() - 512) < 200 and abs(ys.mean() - 389) < 200

    def test_http_state_and_streams(self, tracked_system):
        port = tracked_system.viewer.port
        status, body = _get(port, "/state")
        assert status == 200
        st = json.loads(body)
        assert st["menu"]["follow_camera"] is True
        assert st["state"] == "OK"
        # wait for the render loop to publish a frame
        deadline = time.time() + 5.0
        while time.time() < deadline:
            status, jpg = _get(port, "/map.jpg")
            if len(jpg) > 0:
                break
            time.sleep(0.05)
        assert status == 200 and jpg[:2] == b"\xff\xd8"   # JPEG SOI
        status, page = _get(port, "/")
        assert status == 200 and b"orb_slam2_tpu viewer" in page

    def test_http_menu_toggle_applies(self, tracked_system):
        port = tracked_system.viewer.port
        _get(port, "/menu?localization_mode=1")
        deadline = time.time() + 5.0
        while time.time() < deadline:
            if tracked_system.tracker.only_tracking:
                break
            time.sleep(0.02)
        assert tracked_system.tracker.only_tracking
        _get(port, "/menu?localization_mode=0")
        deadline = time.time() + 5.0
        while time.time() < deadline:
            if not tracked_system.tracker.only_tracking:
                break
            time.sleep(0.02)
        assert not tracked_system.tracker.only_tracking
        status, _ = _get(port, "/menu?bogus=1")
        assert status == 404


def test_orbit_camera(tracked_system):
    """Free-orbit navigation (Pangolin non-follow parity): /view deltas
    rotate/zoom/pan the non-follow camera and change the rendered map."""
    from orb_slam2_tpu.viz.live import MapRenderer

    r = MapRenderer(tracked_system)
    base = r.render(follow=False)
    r.orbit_update(daz=1.2, delv=0.2)
    turned = r.render(follow=False)
    assert (base != turned).any(), "orbit rotation changed nothing"
    r.orbit_update(dr=0.5)
    zoomed = r.render(follow=False)
    assert (turned != zoomed).any(), "orbit zoom changed nothing"
    az0 = r.orbit["az"]
    r.orbit_update(dx=0.1, dy=-0.05)
    assert r.orbit["az"] == az0
    assert np.linalg.norm(r.orbit_target) > 0
