"""Interactive viewer server (pagnerf_tpu/app/viewer_server.py) and the
--render-views CLI path: channel frames, click-to-embedding-distance, and
train-while-viewing — HTTP equivalents of the reference SemanticApp interaction
loop (app/app.py:79-136, 276-309)."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from tests.test_train_e2e import make_trainer


@pytest.fixture(scope="module")
def viewer():
    trainer, ds = make_trainer(epochs=3)
    from pagnerf_tpu.app.viewer_server import make_server
    server, state = make_server(trainer, host="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", state
    server.shutdown()
    server.server_close()


def _get(url, timeout=300):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_index_page(viewer):
    base, _ = viewer
    code, ctype, body = _get(base + "/")
    assert code == 200 and "text/html" in ctype
    assert b"pagnerf_tpu viewer" in body


def test_info_lists_views_and_channels(viewer):
    base, state = viewer
    code, _, body = _get(base + "/api/info")
    info = json.loads(body)
    assert code == 200
    assert info["views"] == state.views and len(info["views"]) >= 2
    assert "rgb" in info["channels"] and "instance" in info["channels"]
    assert info["training"] is False


def test_frame_channels_return_png(viewer):
    base, state = viewer
    view = state.views[0]
    for channel in ("rgb", "depth", "semantics", "instance"):
        code, ctype, body = _get(f"{base}/api/frame?view={view}&channel={channel}")
        assert code == 200 and ctype == "image/png", channel
        assert body[:8] == b"\x89PNG\r\n\x1a\n", channel
    # second fetch hits the cache (same bytes, no re-render)
    code, _, body2 = _get(f"{base}/api/frame?view={view}&channel=rgb")
    assert code == 200


def test_click_embedding_distance(viewer):
    base, state = viewer
    view = state.views[0]
    code, ctype, body = _get(f"{base}/api/click?view={view}&y=5&x=7")
    assert code == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_train_while_viewing(viewer):
    base, state = viewer
    epoch_before = int(state.trainer.epoch)
    req = urllib.request.Request(base + "/api/train?epochs=1", method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert json.loads(r.read())["started"]
    state._train_thread.join(timeout=600)
    assert not state.training
    assert int(state.trainer.epoch) == epoch_before + 1
    assert state.last_losses and all(np.isfinite(v)
                                     for v in state.last_losses.values())
    # frames render fine against the newly trained params (cache was invalidated)
    code, ctype, body = _get(f"{base}/api/frame?view={state.views[0]}&channel=rgb")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_render_views_cli(tmp_path):
    """--render-views drives the offline orbit renderer through the real CLI."""
    import main as headless
    import main_interactive
    main_interactive.register_all()
    frames = headless.main([
        "--config", "configs/synthetic/tiny.yaml",
        "--render-views", "--render-views-dir", str(tmp_path),
        "--epochs", "1", "--log-dir", str(tmp_path / "logs"),
    ])
    assert "rgb" in frames and len(frames["rgb"]) >= 1
    pngs = list(tmp_path.glob("rgb_*.png"))
    assert pngs, "expected rgb PNG frames on disk"
    # mp4s are written when ffmpeg is available; write_video falls back to PNG
    # strips otherwise, so only the PNG frames are asserted here


def test_free_camera_frames(viewer):
    """Free-viewpoint camera (reference wisp interactive camera,
    app/app.py:276-309): arbitrary orbit poses render across channels, distinct
    poses give distinct frames, repeated poses hit the cache."""
    base, state = viewer
    code, ctype, body = _get(f"{base}/api/free_frame?az=0&el=20&r=2.2&channel=rgb")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
    code, _, body2 = _get(f"{base}/api/free_frame?az=90&el=-10&r=1.5&channel=rgb")
    assert code == 200 and body2 != body
    code, _, body3 = _get(f"{base}/api/free_frame?az=0&el=20&r=2.2&channel=depth")
    assert code == 200
    # cache hit: same pose+channel returns identical bytes
    _, _, body4 = _get(f"{base}/api/free_frame?az=0&el=20&r=2.2&channel=rgb")
    assert body4 == body


def test_pose_from_orbit_look_at():
    from pagnerf_tpu.app.orbit_renderer import pose_from_orbit

    c2w = pose_from_orbit(30.0, 15.0, 2.0)
    eye = c2w[:3, 3]
    assert abs(np.linalg.norm(eye) - 2.0) < 1e-6
    # -z column points from eye toward the target (origin)
    fwd = -c2w[:3, 2]
    np.testing.assert_allclose(fwd, -eye / np.linalg.norm(eye), atol=1e-6)
    # orthonormal rotation
    R = c2w[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
