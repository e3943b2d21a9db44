"""Web studio tests: dispatcher + HTTP server driven end-to-end in-process."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tests.test_api import StubTokenizer
from unimoe_audio_tpu.api import UniMoEAudio
from unimoe_audio_tpu.apps.web_demo import StudioServer
from unimoe_audio_tpu.config import tiny_test_config


@pytest.fixture(scope="module")
def studio(tmp_path_factory):
    cfg = tiny_test_config()
    model = UniMoEAudio(None, allow_random=True, config=cfg,
                        tokenizer=StubTokenizer(cfg), max_tokens=14, min_tokens=4)
    out = str(tmp_path_factory.mktemp("studio"))
    return StudioServer(model, output_dir=out, batch_requests=False)


def test_generate_dispatcher_music(studio):
    out = studio.generate({"mode": "music", "text": "gentle piano"})
    assert out["audio"].startswith("/audio/")
    assert out["seconds"] > 0


def test_generate_dispatcher_bad_mode(studio):
    with pytest.raises(ValueError):
        studio.generate({"mode": "nope", "text": "x"})


def test_generate_stream_music_status_stages(studio):
    """Music mode streams live per-stage progress (reference's studio
    yields status text per stage, web_demo.py:829-841): preprocess →
    ≥1 decoding update with a growing frame count → writing → done with
    a playable wav url."""
    import os

    stages = list(studio.generate_stream({"mode": "music", "text": "soft pad"}))
    names = [s["status"] for s in stages]
    assert names[0] == "preprocess"
    assert "decoding" in names and "writing" in names
    assert names[-1] == "done"
    decs = [s for s in stages if s["status"] == "decoding"]
    assert all(d["frames"] >= 1 for d in decs)
    assert [d["frames"] for d in decs] == sorted(d["frames"] for d in decs)
    done = stages[-1]
    assert done["audio"].startswith("/audio/")
    assert os.path.isfile(
        os.path.join(studio.output_dir, os.path.basename(done["audio"])))


def test_generate_stream_other_modes_coarse_stages(studio):
    stages = list(studio.generate_stream({
        "mode": "tts_preset", "text": "hello", "voice": "en_female"}))
    # Preset wav fixtures do not exist in CI, so this may error — but it
    # must do so through the status protocol, not an exception.
    names = [s["status"] for s in stages]
    assert names[0] == "preprocess"
    assert names[-1] in ("done", "error") or "generating" in names


def test_format_status_lines():
    from unimoe_audio_tpu.apps.web_demo import format_status

    assert "Preprocessing" in format_status({"status": "preprocess"})
    line = format_status({"status": "decoding", "frames": 25, "of": 100,
                          "audio_seconds": 0.5})
    assert "25/100" in line and "0.5" in line
    assert "Done in 3.0 s" == format_status({"status": "done", "seconds": 3.0})


def test_http_stream_endpoint_ndjson(studio):
    import socket
    import time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    th = threading.Thread(
        target=lambda: studio.serve(host="127.0.0.1", port=port), daemon=True
    )
    th.start()
    for _ in range(50):
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/generate_stream",
        data=json.dumps({"mode": "music", "text": "bass"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    lines = [json.loads(ln) for ln in
             urllib.request.urlopen(req, timeout=300).read().splitlines() if ln]
    assert lines[0]["status"] == "preprocess"
    assert lines[-1]["status"] == "done"
    assert any(l["status"] == "decoding" for l in lines)


def test_http_server_round_trip(studio):
    import http.server
    import socket

    # Find a free port, serve in a thread.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    th = threading.Thread(
        target=lambda: studio.serve(host="127.0.0.1", port=port), daemon=True
    )
    th.start()
    import time

    for _ in range(50):
        try:
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=1).read().decode()
            break
        except Exception:
            time.sleep(0.1)
    assert "UniMoE-Audio" in page

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/generate",
        data=json.dumps({"mode": "music", "text": "drums"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
    assert resp["audio"].startswith("/audio/")
    wav = urllib.request.urlopen(
        f"http://127.0.0.1:{port}{resp['audio']}", timeout=10).read()
    assert wav[:4] == b"RIFF"
