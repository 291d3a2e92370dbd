"""HTTP viewer: frame serving, orbit camera math, error surfacing."""

import json
import urllib.request

import numpy as np

from gaussianmesh_tpu.viewer import ViewerServer, encode_png, orbit_camera


def _gradient_render(cam):
    h, w = cam.height, cam.width
    v = np.linspace(0.0, 1.0, h)[:, None] * np.ones((1, w))
    u = np.ones((h, 1)) * np.linspace(0.0, 1.0, w)[None, :]
    return np.stack([u, v, 0.5 * (u + v)])


def test_viewer_serves_png_and_state():
    server = ViewerServer(_gradient_render, width=64, height=48,
                          port=0).start()
    try:
        base = f"http://{server.host}:{server.port}"
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"orbit" in page or b"/frame" in page

        frame = urllib.request.urlopen(
            base + "/frame?theta=0.4&phi=0.2&r=3.5", timeout=30).read()
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"

        state = json.loads(urllib.request.urlopen(
            base + "/state", timeout=10).read())
        assert state["frames_served"] == 1
    finally:
        server.stop()


def test_viewer_reports_render_errors():
    def boom(cam):
        raise RuntimeError("render exploded")

    server = ViewerServer(boom, width=8, height=8, port=0).start()
    try:
        base = f"http://{server.host}:{server.port}"
        try:
            urllib.request.urlopen(base + "/frame", timeout=10)
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert b"render exploded" in e.read()
    finally:
        server.stop()


def test_orbit_camera_looks_at_center():
    cam = orbit_camera(0.7, 0.3, 5.0, 128, 96, center=(1.0, 2.0, 3.0))
    # camera is `radius` away from center and its forward axis points at it
    cc = cam.camera_center
    d = np.asarray([1.0, 2.0, 3.0]) - cc
    assert abs(np.linalg.norm(d) - 5.0) < 1e-6
    fwd = cam.R[:, 2]
    assert np.dot(fwd, d / np.linalg.norm(d)) > 0.999


def test_encode_png_roundtrip():
    img = _gradient_render(orbit_camera(0.0, 0.0, 1.0, 32, 16))
    data = encode_png(img)
    import imageio.v2 as imageio
    back = imageio.imread(data)
    assert back.shape == (16, 32, 3)
    np.testing.assert_allclose(back / 255.0, img.transpose(1, 2, 0),
                               atol=1 / 255.0 + 1e-6)
