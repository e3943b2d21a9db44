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
