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


def _post_path(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_multi_session_routing(server):
    """Distinct session_ids keep independent conversation state; /reset
    clears one; the default session is untouched."""
    port = server._httpd.server_address[1]
    s, r = _post_path(port, "/generate", {
        "prompt": "First question .", "images": [], "temperature": 0.0,
        "max_new_tokens": 3, "session_id": "alice",
    })
    assert s == 200 and isinstance(r["response"], str)
    s, _ = _post_path(port, "/generate", {
        "prompt": "Other conversation .", "images": [], "temperature": 0.0,
        "max_new_tokens": 3, "session_id": "bob",
    })
    assert s == 200
    alice = server._sessions["alice"]
    bob = server._sessions["bob"]
    assert alice is not bob
    assert len(alice.history) == 1 and len(bob.history) == 1
    assert alice.history[0][0] != bob.history[0][0]

    s, r = _post_path(port, "/reset", {"session_id": "alice"})
    assert s == 200 and r["status"] == "reset"
    assert server._sessions["alice"].history == []
    assert len(server._sessions["bob"].history) == 1  # untouched


def test_session_lru_eviction(server):
    port = server._httpd.server_address[1]
    server.max_sessions = 3  # default "" + 2 conversations
    for name in ("c1", "c2", "c3"):
        s, _ = _post_path(port, "/generate", {
            "prompt": f"Hello {name} .", "images": [], "temperature": 0.0,
            "max_new_tokens": 2, "session_id": name,
        })
        assert s == 200
    assert "" in server._sessions  # default never evicted
    assert len(server._sessions) <= 3
    assert "c3" in server._sessions  # most recent survives
