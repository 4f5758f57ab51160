"""Live view + edit server (serve.py — the ImguiScreen/two-tree analog).

Drives the real HTTP surface end-to-end on a tiny Cornell render: progressive
frames, pause/resume, a live emitter-radiance edit that restarts accumulation
without a process restart (the restartRender contract, render.cpp:180-191),
and a clean stop.
"""

import dataclasses
import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

from optix_renderer_tpu.scene.presets import make_cornell_box
from optix_renderer_tpu.serve import LiveRenderer, ThreadingHTTPServer, _make_handler


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _get(port, path):
    with urllib.request.urlopen(f"http://localhost:{port}{path}", timeout=30) as r:
        return r.read()


def _post(port, path, body: bytes):
    req = urllib.request.Request(
        f"http://localhost:{port}{path}", data=body, method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read()


@pytest.mark.heavy
def test_live_view_edit_loop():
    scene, config, _ = make_cornell_box(width=16, height=12, spp=1)
    config = dataclasses.replace(config, max_depth=2)

    live = LiveRenderer(scene, config, spp=400)  # big budget; we stop it
    port = _free_port()
    httpd = ThreadingHTTPServer(("localhost", port), _make_handler(live))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    result = {}
    t = threading.Thread(target=lambda: result.update(live.run()), daemon=True)
    t.start()

    try:
        # progressive frames appear
        deadline = time.time() + 300
        while time.time() < deadline:
            st = json.loads(_get(port, "/status"))
            if st["spp_done"] >= 2:
                break
            time.sleep(0.3)
        assert st["spp_done"] >= 2, st
        frame = _get(port, "/frame")
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"
        page = _get(port, "/")
        assert b"live view" in page or b"optix_renderer_tpu" in page

        # pause stops progress
        _post(port, "/control", b"pause")
        time.sleep(1.0)
        a = json.loads(_get(port, "/status"))
        time.sleep(1.5)
        b = json.loads(_get(port, "/status"))
        assert a["status"] == "paused" and b["spp_done"] == a["spp_done"]

        # live edit restarts accumulation (spp counter resets) and the new
        # radiance actually changes the image
        frame_before = _get(port, "/frame")
        _post(
            port,
            "/edit",
            json.dumps(
                {"kind": "emitter_radiance", "index": 0, "value": [40.0, 2.0, 2.0]}
            ).encode(),
        )
        _post(port, "/control", b"resume")
        # the generation counter observes the restart even when subsequent
        # rounds outrun this poll loop's cadence
        deadline = time.time() + 300
        saw_reset = False
        while time.time() < deadline:
            st = json.loads(_get(port, "/status"))
            if st["generation"] >= 1 and st["spp_done"] >= 2:
                saw_reset = True
                break
            time.sleep(0.2)
        assert saw_reset, "accumulation never restarted after the edit"
        frame_after = _get(port, "/frame")
        assert frame_after != frame_before

        # bad edit rejected
        with pytest.raises(urllib.error.HTTPError):
            _post(port, "/edit", b'{"kind": "nope", "index": 0, "value": [1]}')
    finally:
        _post(port, "/control", b"stop")
        t.join(timeout=120)
        httpd.shutdown()

    assert result.get("spp_done", 0) >= 0
    assert np.isfinite(result["composite"]).all()


def test_edit_tables_apply():
    """_apply_edits swaps table rows functionally without retracing."""
    scene, config, _ = make_cornell_box(width=8, height=6, spp=1)
    live = LiveRenderer(scene, config, spp=1)
    assert live.edit("emitter_radiance", 0, [5.0, 6.0, 7.0])
    assert live._apply_edits()
    rad = np.asarray(live.scene.emitters.radiance)[0]
    np.testing.assert_allclose(rad, [5.0, 6.0, 7.0])
    # scalar tables broadcast
    if np.asarray(live.scene.bsdfs.alpha).shape[0] > 0:
        assert live.edit("bsdf_alpha", 0, [0.42])
        assert live._apply_edits()
        assert abs(float(np.asarray(live.scene.bsdfs.alpha)[0]) - 0.42) < 1e-6
    # out-of-range index is rejected at the API boundary (HTTP 400), before
    # it can reach the render loop
    assert not live.edit("emitter_radiance", 999, [1, 1, 1])
    # short/mismatched values are rejected too (advisor round-3 finding):
    # a 2-element value cannot fill a 3-vector row
    assert not live.edit("emitter_radiance", 0, [1.0, 2.0])
    # a scalar broadcasts
    assert live.edit("emitter_radiance", 0, [2.5])
    assert live._apply_edits()
    np.testing.assert_allclose(
        np.asarray(live.scene.emitters.radiance)[0], [2.5, 2.5, 2.5]
    )
    assert not live._apply_edits()
