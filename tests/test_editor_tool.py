"""Interactive editor tool (tools/editor.py): the ImGui-editor
substitute (reference Source/ImGui.cpp:124-700). Drives the
EditorSession object directly and once end-to-end over HTTP on a
loopback socket: state JSON, material/light/camera edits resetting the
accumulation, progressive preview PNG bytes."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from directcomputeraytracing_tpu.scene.presets import cornell_box
from directcomputeraytracing_tpu.tools.editor import (
    EditorSession,
    _png_bytes,
    serve,
)


@pytest.fixture(scope="module")
def session():
    # one shared session: every test would otherwise recompile the
    # preview program; edits reset the film so tests stay independent
    scene, cam = cornell_box(light="area")
    return EditorSession(scene, cam, width=64, height=64,
                         preview_scale=4, max_bounce=1)


def test_png_encoder_roundtrip():
    img = np.random.default_rng(0).uniform(size=(5, 7, 3))
    data = _png_bytes(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data[:40] and data[-8:-4] == b"IEND"
    # PIL (already a dependency via utils.image) decodes it back
    from PIL import Image
    import io

    back = np.asarray(Image.open(io.BytesIO(data)))
    assert back.shape == (5, 7, 3)
    np.testing.assert_allclose(
        back, np.clip(img * 255 + 0.5, 0, 255).astype(np.uint8))


def test_state_lists_scene_objects(session):
    s = session
    st = s.state()
    assert st["materials"] and st["lights"] or st["emitters"]
    assert len(st["instances"]) == len(s.scene.instances)
    assert st["spp"] == 0
    assert st["camera"]["fov_x_deg"] > 0


def test_edit_resets_accumulation_and_changes_image(session):
    s = session
    a = s.preview_step(spp=1).copy()
    assert s._spp == 1
    s.edit_material(0, albedo=(0.9, 0.05, 0.05))
    assert s._spp == 0          # film reset on edit
    b = s.preview_step(spp=1)
    assert not np.allclose(a, b)
    assert s.state()["materials"][0]["albedo"][0] == 0.9


def test_camera_move_changes_state_and_resets(session):
    s = session
    eye0 = s.state()["camera"]["position"]
    s.preview_step(spp=1)
    s.move_camera(forward=0.5)
    assert s._spp == 0
    eye1 = s.state()["camera"]["position"]
    assert not np.allclose(eye0, eye1)
    # explicit placement
    s.set_camera(eye=[0, 1, -4], target=[0, 1, 0], fov_x_deg=60.0)
    st = s.state()["camera"]
    np.testing.assert_allclose(st["position"], [0, 1, -4], atol=1e-5)
    np.testing.assert_allclose(st["fov_x_deg"], 60.0, atol=0.1)


def test_http_roundtrip(session):
    s = session
    started = threading.Event()
    th = threading.Thread(target=serve, args=(s, 0), daemon=True,
                          kwargs={"started": started})
    th.start()
    assert started.wait(10)
    port = started.server.server_address[1]
    base = f"http://127.0.0.1:{port}"

    st = json.loads(urllib.request.urlopen(base + "/state").read())
    assert st["materials"]

    req = urllib.request.Request(
        base + "/edit",
        data=json.dumps({"kind": "material", "index": 0,
                         "fields": {"roughness": 0.2}}).encode(),
        method="POST")
    assert json.loads(urllib.request.urlopen(req).read())["ok"]
    st = json.loads(urllib.request.urlopen(base + "/state").read())
    assert abs(st["materials"][0]["roughness"] - 0.2) < 1e-6

    png = urllib.request.urlopen(base + "/preview?spp=1").read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    page = urllib.request.urlopen(base + "/").read()
    assert b"dcrt-tpu editor" in page
    started.server.shutdown()
