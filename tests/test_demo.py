"""Gradio demo wiring, exercised against a minimal in-process gradio stub.

gradio is not a baked dependency, so the Blocks graph had never executed.
The stub records component construction and event bindings; the tests then
invoke the bound callbacks directly, validating the wiring to Chat.generate,
mask2bbox/draw_bboxes, the example gallery, and the maptiles panel —
everything short of gradio's own rendering.
"""

import sys
import types

import numpy as np
import pytest

from teochat_tpu.serve import demo as demo_mod


# ------------------------------------------------------------- gradio stub


class _Component:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.clicks = []

    def click(self, fn, inputs=None, outputs=None):
        self.clicks.append((fn, inputs or [], outputs or []))

    def change(self, fn, inputs=None, outputs=None):
        self.clicks.append((fn, inputs or [], outputs or []))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _make_stub():
    gr = types.ModuleType("gradio")
    created = {"components": [], "examples": []}

    def component(name):
        def make(*args, **kwargs):
            c = _Component(*args, **kwargs)
            c.type_name = name
            created["components"].append(c)
            return c

        return make

    for name in ("Blocks", "Markdown", "Row", "Column", "Gallery", "Image",
                 "Textbox", "Slider", "Chatbot", "Button", "State", "Number",
                 "Dropdown", "Plot"):
        setattr(gr, name, component(name))

    def examples(*args, **kwargs):
        created["examples"].append(kwargs if kwargs else args)
        return _Component()

    gr.Examples = examples
    gr._created = created
    return gr


class FakeChat:
    def __init__(self):
        self.calls = []
        self.reset_calls = 0

    def generate(self, message, images, timestamps=(), bbox=None,
                 temperature=0.2, max_new_tokens=256):
        self.calls.append(dict(message=message, n_images=len(images),
                               timestamps=list(timestamps), bbox=bbox))
        return {"response": "two buildings changed [10, 20, 30, 40]",
                "bboxes": [[10, 20, 30, 40]]}

    def reset(self):
        self.reset_calls += 1


@pytest.fixture
def stub_gradio(monkeypatch):
    gr = _make_stub()
    monkeypatch.setitem(sys.modules, "gradio", gr)
    return gr


def _find(gr, type_name, label=None):
    out = [
        c for c in gr._created["components"]
        if getattr(c, "type_name", None) == type_name
        and (label is None or c.kwargs.get("label") == label
             or (c.args and c.args[0] == label))
    ]
    return out


def test_import_error_without_gradio(monkeypatch):
    monkeypatch.setitem(sys.modules, "gradio", None)
    # None in sys.modules makes `import gradio` raise ImportError
    with pytest.raises(ImportError, match="gradio"):
        demo_mod.build_demo(chat=FakeChat())


def test_blocks_graph_builds_and_respond_wires_to_chat(stub_gradio):
    chat = FakeChat()
    demo_mod.build_demo(chat=chat)

    buttons = _find(stub_gradio, "Button")
    send = next(b for b in buttons if b.args and b.args[0] == "Send")
    clear = next(b for b in buttons if b.args and b.args[0] == "New session")
    assert send.clicks and clear.clicks

    respond, inputs, outputs = send.clicks[0]
    assert len(inputs) == 7 and len(outputs) == 2

    img = np.zeros((32, 32, 3), np.uint8)
    mask = np.zeros((32, 32), np.uint8)
    mask[4:12, 8:20] = 255
    history, overlays = respond(
        [img, img], mask, "2023-01-01, 2023-06-01", "what changed?",
        0.0, 64, [],
    )
    assert chat.calls and chat.calls[0]["message"] == "what changed?"
    assert chat.calls[0]["n_images"] == 2
    assert chat.calls[0]["timestamps"] == ["2023-01-01", "2023-06-01"]
    assert chat.calls[0]["bbox"] is not None  # mask2bbox engaged
    assert history[-1][1].startswith("two buildings changed")
    assert len(overlays) == 2  # bbox overlays drawn per input image

    reset_fn, _, _ = clear.clicks[0]
    assert reset_fn() == ([], [])
    assert chat.reset_calls == 1


def test_timestamp_count_mismatch_dropped(stub_gradio):
    chat = FakeChat()
    demo_mod.build_demo(chat=chat)
    send = next(b for b in _find(stub_gradio, "Button")
                if b.args and b.args[0] == "Send")
    respond = send.clicks[0][0]
    img = np.zeros((8, 8, 3), np.uint8)
    respond([img, img], None, "2023-01-01", "q", 0.2, 32, None)
    assert chat.calls[0]["timestamps"] == []  # 1 ts for 2 images -> dropped


def test_example_gallery_ports_reference_data(stub_gradio):
    demo_mod.build_demo(chat=FakeChat(), example_dir="/data/examples")
    ex = stub_gradio._created["examples"]
    labels = [e.get("label") for e in ex]
    assert "Single Image Examples" in labels and "Temporal Image Examples" in labels
    single = next(e for e in ex if e.get("label") == "Single Image Examples")
    assert len(single["examples"]) == 4
    assert single["examples"][0][0] == ["/data/examples/rqa.png"]
    temporal = next(e for e in ex if e.get("label") == "Temporal Image Examples")
    assert len(temporal["examples"]) == 5
    # the QFabric example carries all five frames
    assert len(temporal["examples"][-1][0]) == 5


def test_map_panel_renders_from_canned_tiles(stub_gradio):
    fetched = []

    def fetcher(url):
        fetched.append(url)
        return np.full((256, 256, 3), 9, np.uint8)

    demo_mod.build_demo(chat=FakeChat(), tile_fetcher=fetcher,
                        planet_api_key="K")
    buttons = _find(stub_gradio, "Button")
    single = next(b for b in buttons if b.args and b.args[0] == "Use map image")
    temporal = next(b for b in buttons
                    if b.args and b.args[0] == "Use temporal map sequence")

    view, gallery = single.clicks[0][0](37.77, -122.42, 15, "Google Maps")
    assert view.shape == (512, 512, 3) and (view == 9).all()
    assert len(gallery) == 1
    assert fetched and all("mt0.google.com" in u for u in fetched)

    fetched.clear()
    view, gallery = temporal.clicks[0][0](37.77, -122.42, 15)
    assert len(gallery) == 4  # the 4-quarter PlanetScope sequence
    assert all("planet.com" in u and "api_key=K" in u for u in fetched)


def test_demo_without_gradio_is_guarded_not_crashing():
    """Module import itself must never require gradio."""
    assert hasattr(demo_mod, "SINGLE_IMAGE_EXAMPLES")
    assert len(demo_mod.TEMPORAL_EXAMPLES) == 5
