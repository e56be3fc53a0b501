"""Prompt-rendering tests: golden strings + byte-parity vs the reference package."""

import os
import sys

import pytest

from teochat_tpu.conversation import SeparatorStyle, conv_templates

from tests.ref_loader import HAS_REFERENCE, load_ref_module


def test_v1_prompt_golden():
    conv = conv_templates["v1"].copy()
    conv.append_message(conv.roles[0], "What changed? <image>")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt == (
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's "
        "questions. USER: What changed? <image> ASSISTANT:"
    )


def test_v1_multi_turn_sep2():
    conv = conv_templates["v1"].copy()
    conv.append_message(conv.roles[0], "q1")
    conv.append_message(conv.roles[1], "a1")
    conv.append_message(conv.roles[0], "q2")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert "ASSISTANT: a1</s>" in prompt
    assert prompt.endswith("USER: q2 ASSISTANT:")


def test_copy_is_deep_for_messages():
    conv = conv_templates["v1"].copy()
    conv.append_message(conv.roles[0], "hello")
    conv2 = conv.copy()
    conv2.append_message(conv.roles[1], "resp")
    assert len(conv.messages) == 1
    assert len(conv2.messages) == 2


def test_template_registry_contract():
    for name in ["v1", "llama_2", "plain", "mpt", "llava_v1", "llava_llama_2"]:
        assert name in conv_templates
    assert conv_templates["v1"].sep_style == SeparatorStyle.TWO
    assert conv_templates["v1"].sep2 == "</s>"


def _render_pairs():
    cases = []
    # full turn pairs
    cases.append([("u", "Describe <image> please."), ("a", "A field.")])
    # generation-ready (None assistant)
    cases.append([("u", "Q?"), ("a", None)])
    # multi-turn
    cases.append([("u", "q1"), ("a", "a1"), ("u", "q2"), ("a", None)])
    return cases


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
@pytest.mark.parametrize("name", ["v1", "llava_v1", "llama_2", "llava_llama_2", "mpt"])
def test_parity_with_reference(name):
    ref_templates = load_ref_module("videollava/conversation.py", "videollava.conversation").conv_templates

    for msgs in _render_pairs():
        ours = conv_templates[name].copy()
        ref = ref_templates[name].copy()
        for role_idx, (_, text) in enumerate(msgs):
            ours.append_message(ours.roles[role_idx % 2], text)
            ref.append_message(ref.roles[role_idx % 2], text)
        assert ours.get_prompt() == ref.get_prompt(), (name, msgs)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_plain_single_message_parity():
    # sep2 is None on the plain template; the reference renderer only supports a
    # single message there (a second one would concatenate None) — match that.
    ref_templates = load_ref_module(
        "videollava/conversation.py", "videollava.conversation"
    ).conv_templates
    ours = conv_templates["plain"].copy()
    ref = ref_templates["plain"].copy()
    ours.append_message(ours.roles[0], "<image>\ncaption")
    ref.append_message(ref.roles[0], "<image>\ncaption")
    assert ours.get_prompt() == ref.get_prompt()


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_tuple_first_message_parity():
    ref_templates = load_ref_module("videollava/conversation.py", "videollava.conversation").conv_templates

    ours = conv_templates["v1"].copy()
    ref = ref_templates["v1"].copy()
    msg = ("here is <image> a scene", "fake_image", "Default")
    ours.append_message(ours.roles[0], msg)
    ref.append_message(ref.roles[0], msg)
    ours.append_message(ours.roles[1], None)
    ref.append_message(ref.roles[1], None)
    assert ours.get_prompt() == ref.get_prompt()


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
@pytest.mark.parametrize("name", ["default", "v0"])
def test_seeded_v0_byte_parity(name):
    """'default'/'v0' map to conv_vicuna_v0, which ships SEEDED with a one-shot
    transcript (reference conversation.py:220-251) — prompts must match byte
    for byte including the transcript and offset=2."""
    ref_templates = load_ref_module(
        "videollava/conversation.py", "videollava.conversation"
    ).conv_templates
    ours = conv_templates[name].copy()
    ref = ref_templates[name].copy()
    assert ours.offset == ref.offset == 2
    assert ours.get_prompt() == ref.get_prompt()  # seeded transcript alone
    for i, text in enumerate(["hi <image>", "hello back", "more?", None]):
        ours.append_message(ours.roles[i % 2], text)
        ref.append_message(ref.roles[i % 2], text)
    assert ours.get_prompt() == ref.get_prompt()


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
@pytest.mark.parametrize("name", ["llava_v0", "v0_mmtag"])
def test_v0_family_parity(name):
    ref_templates = load_ref_module(
        "videollava/conversation.py", "videollava.conversation"
    ).conv_templates
    ours = conv_templates[name].copy()
    ref = ref_templates[name].copy()
    for i, text in enumerate(["hi <image>", "hello back", "more?", None]):
        ours.append_message(ours.roles[i % 2], text)
        ref.append_message(ref.roles[i % 2], text)
    assert ours.get_prompt() == ref.get_prompt()
