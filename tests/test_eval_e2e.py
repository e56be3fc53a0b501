"""End-to-end eval harness test: tiny model, synthetic dataset, cached results."""

import json
import types

import numpy as np
import pytest

import jax

from teochat_tpu.config import tiny_test_config
from teochat_tpu.data.processing import ImageProcessor
from teochat_tpu.eval.eval import eval as eval_fn
from teochat_tpu.eval.inference import run_inference, run_inference_single
from teochat_tpu.models.teochat import TEOChat, init_teochat


class MockTokenizer:
    bos_token_id = 1
    eos_token_id = 2

    def __init__(self):
        self.vocab = {"<s>": 1, "</s>": 2}
        self.rev = {1: "<s>", 2: "</s>"}

    def __call__(self, text):
        ids = [1]
        for w in text.split():
            if w not in self.vocab:
                idx = len(self.vocab) + 10
                self.vocab[w] = idx
                self.rev[idx] = w
            ids.append(self.vocab[w])
        return types.SimpleNamespace(input_ids=ids)

    def decode(self, ids):
        return " ".join(self.rev.get(int(i), f"tok{int(i) % 50}") for i in ids)

    def batch_decode(self, ids_batch, skip_special_tokens=True):
        return [self.decode(ids) for ids in ids_batch]


@pytest.fixture(scope="module")
def bundle():
    cfg = tiny_test_config(vocab_size=128)
    tok = MockTokenizer()
    model = TEOChat(cfg, init_teochat(jax.random.PRNGKey(0), cfg), tokenizer=tok)
    # tiny tower wants 28x28 inputs
    processor = ImageProcessor(size=28)
    return tok, model, processor


def _image(seed):
    return np.random.RandomState(seed).randint(0, 255, (40, 52, 3), np.uint8)


def _dataset(n=3, frames=2):
    examples = []
    for i in range(n):
        examples.append(
            {
                "conversations": [
                    {"value": "These are images taken at different times: <video> What changed?"},
                    {"value": "residential"},
                ],
                "video": [_image(i * 10 + j) for j in range(frames)],
                "timestamp": ["2020-01-02", "2020-01-01"][:frames],
                "task": "classification",
            }
        )
    return examples


def test_run_inference_single(bundle):
    tok, model, processor = bundle
    out = run_inference_single(
        model, processor, tok,
        "Images: <video> What changed?",
        [_image(1), _image(2)],
        timestamps=["2020-05-01", "2020-04-01"],
        temperature=0.0, max_new_tokens=4,
    )
    assert isinstance(out, str)
    assert "</s>" not in out


def test_run_inference_loop_and_batched_agree(bundle):
    tok, model, processor = bundle
    ds = _dataset(3)
    common = dict(
        prompt_strategy="interleave", chronological_prefix=True,
        conv_mode="v1", temperature=0.0, max_new_tokens=4, progress=False,
    )
    single = run_inference(ds, model, tok, processor, **common)
    batched = run_inference(ds, model, tok, processor, batch_size=2, **common)
    assert [o["response"] for o in single] == [o["response"] for o in batched]
    assert all(o["ground_truth"] == "residential" for o in single)


def test_eval_driver_with_cache(bundle, tmp_path):
    tok, model, processor = bundle
    ds = _dataset(2)
    metrics = eval_fn(
        "fmow_high_res", model_path="tiny/test-model",
        out_dir=str(tmp_path), temperature=0.0, max_new_tokens=4,
        dataset=ds, model_bundle=(tok, model, processor),
    )
    # reference quirk preserved: tasks with zero true positives are absent
    # from the metrics dict, so a random model may yield {}
    assert isinstance(metrics, dict)
    cached = list((tmp_path / "fmow_high_res").glob("*.json"))
    assert len(cached) == 1
    with open(cached[0]) as f:
        saved = json.load(f)
    assert len(saved) == 2

    # second call must hit the cache (no model bundle provided at all)
    metrics2 = eval_fn(
        "fmow_high_res", model_path="tiny/test-model",
        out_dir=str(tmp_path), dataset=None, model_bundle=None,
    )
    assert metrics2 == metrics


def test_eval_driver_rejects_unknown_dataset(bundle, tmp_path):
    tok, model, processor = bundle
    with pytest.raises(ValueError):
        eval_fn("not_a_dataset", model_path="x", out_dir=str(tmp_path))
