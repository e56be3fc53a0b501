"""HTTP serving endpoint test: live socket round trip with the tiny model."""

import base64
import io
import json
import urllib.request

import numpy as np
import pytest

import jax

from teochat_tpu.config import tiny_test_config
from teochat_tpu.data.processing import ImageProcessor
from teochat_tpu.models.teochat import TEOChat, init_teochat
from teochat_tpu.serve.chat import Chat
from teochat_tpu.serve.server import ChatServer
from tests.test_eval_e2e import MockTokenizer


def _b64_image(seed):
    from PIL import Image

    arr = np.random.RandomState(seed).randint(0, 255, (40, 40, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def server():
    cfg = tiny_test_config(vocab_size=128)
    tok = MockTokenizer()
    model = TEOChat(cfg, init_teochat(jax.random.PRNGKey(0), cfg), tokenizer=tok)
    chat = Chat(model_bundle=(tok, model, ImageProcessor(size=28)))
    srv = ChatServer(chat, host="127.0.0.1", port=0)  # port 0 -> ephemeral
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(srv, payload):
    port = srv._httpd.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    port = server._httpd.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as r:
        assert json.loads(r.read()) == {"status": "ok"}


def test_generate_round_trip(server):
    code, out = _post(
        server,
        {
            "prompt": "What changed between these images?",
            "images": [_b64_image(0), _b64_image(1)],
            "timestamps": ["2020-01-01", "2020-02-01"],
            "temperature": 0.0,
            "max_new_tokens": 4,
        },
    )
    assert code == 200
    assert isinstance(out["response"], str)
    assert isinstance(out["bboxes"], list)


def test_generate_missing_prompt(server):
    code, out = _post(server, {"images": []})
    assert code == 400
    assert "prompt" in out["error"]


def test_unknown_route(server):
    port = server._httpd.server_address[1]
    try:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=10)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_stats_endpoint(server):
    port = server._httpd.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=30) as r:
        assert r.status == 200
        stats = json.loads(r.read())
    assert stats["mode"] == "session"  # no engine attached in this fixture
