"""Training data pipeline tests: preprocessing, masking, dataset, collator, sampler."""

import types

import numpy as np
import pytest

from teochat_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from teochat_tpu.data.dataset import (
    DataArguments,
    LazySupervisedDataset,
    TEOChatCollator,
    preprocess,
    preprocess_multimodal,
    preprocess_v1,
)
from teochat_tpu.data.sampler import (
    LengthGroupedSampler,
    get_modality_length_grouped_indices,
    split_to_even_chunks,
)


class MockTokenizer:
    """SentencePiece-like mock: BOS prepended, '</s>' is one token, a trailing
    space yields its own token — the properties the reference's v1 masking
    arithmetic (instruction_len - 2, round splitting on sep2) relies on."""

    bos_token_id = 1
    pad_token_id = 0
    model_max_length = 2048
    SPACE_ID = 3

    def __init__(self):
        self.vocab = {"<s>": 1, "</s>": 2}

    def __call__(self, text):
        trailing_space = text.endswith(" ") and text.strip() != ""
        words = text.replace("</s>", " </s> ").split()
        ids = [1]
        for w in words:
            if w not in self.vocab:
                self.vocab[w] = len(self.vocab) + 10
            ids.append(self.vocab[w])
        if trailing_space:
            ids.append(self.SPACE_ID)
        return types.SimpleNamespace(input_ids=ids)


def _convs(q="Shown are images taken at different times: <video> What changed?",
           a="New buildings were constructed."):
    return [{"from": "human", "value": q}, {"from": "gpt", "value": a}]


def test_preprocess_multimodal_interleave():
    args = DataArguments()
    srcs = preprocess_multimodal([_convs()], args, num_video_images=3)
    v = srcs[0][0]["value"]
    assert "<video>" not in v
    assert v.count("<image>") == 3
    assert "Image 2: <image>" in v
    assert "times in chronological order:" in v


def test_preprocess_multimodal_image_clamp():
    args = DataArguments()
    q = "<image>" * 40 + "\ndescribe"
    srcs = preprocess_multimodal([[{"from": "human", "value": q}]], args, 0)
    # clamp to MAX_IMAGE_LENGTH=16, then "Image: <image>" expansion per tag
    assert srcs[0][0]["value"].count("<image>") == 16


def test_preprocess_v1_masks_instruction_spans():
    tok = MockTokenizer()
    srcs = preprocess_multimodal([_convs()], DataArguments(), 2)
    out = preprocess_v1(srcs, tok, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert len(ids) == len(labels)
    assert ids.count(IMAGE_TOKEN_INDEX) == 2
    # instruction tokens masked, answer tokens kept
    n_kept = sum(1 for l in labels if l != IGNORE_INDEX)
    assert 0 < n_kept < len(labels)
    # all image sentinels must be masked
    for i, t in enumerate(ids):
        if t == IMAGE_TOKEN_INDEX:
            assert labels[i] == IGNORE_INDEX
    # kept tokens are exactly the answer suffix tokens
    kept = [l for l in labels if l != IGNORE_INDEX]
    answer_ids = tok("New buildings were constructed.</s>").input_ids[1:]
    assert kept == answer_ids


def test_preprocess_dispatcher_v1_default():
    tok = MockTokenizer()
    out = preprocess([_convs("just text", "answer")], tok, has_image=False)
    assert len(out["input_ids"]) == 1


def _raw_example(n_frames=2, seed=0):
    return {
        "conversations": _convs(),
        "video": [
            np.random.RandomState(seed + j).randint(0, 255, (30, 30, 3), np.uint8)
            for j in range(n_frames)
        ],
        "timestamp": [f"2021-0{n_frames - j}-01" for j in range(n_frames)],
        "task": "classification",
    }


class TinyProcessor:
    image_mean = (0.5, 0.5, 0.5)

    def preprocess(self, image, return_tensors=None):
        arr = np.asarray(image, np.float32) / 255.0
        arr = arr[:28, :28].transpose(2, 0, 1)
        return {"pixel_values": [arr]}


def test_lazy_dataset_getitem():
    tok = MockTokenizer()
    args = DataArguments(image_processor=TinyProcessor())
    ds = LazySupervisedDataset(tok, args, dataset=[_raw_example(), _raw_example(3, 5)])
    item = ds[0]
    assert item["input_ids"].count(IMAGE_TOKEN_INDEX) == 2
    assert len(item["image"]) == 2
    item2 = ds[1]
    assert len(item2["image"]) == 3
    assert len(ds.modality_lengths) == 2
    assert all(l > 0 for l in ds.modality_lengths)


def test_lazy_dataset_error_resamples():
    tok = MockTokenizer()
    args = DataArguments(image_processor=TinyProcessor())
    bad = {"conversations": _convs(), "video": "not-a-list", "timestamp": []}
    ds = LazySupervisedDataset(tok, args, dataset=[bad, _raw_example()])
    item = ds[0]  # resamples until it hits the good example
    assert "input_ids" in item


def test_collator_builds_plan():
    tok = MockTokenizer()
    args = DataArguments(image_processor=TinyProcessor())
    ds = LazySupervisedDataset(tok, args, dataset=[_raw_example(), _raw_example(1, 7)])
    collator = TEOChatCollator(tok, tokens_per_frame=4, seq_buckets=(64, 128))
    plan, pixels = collator([ds[0], ds[1]])
    assert plan.text_ids.shape[0] == 2
    assert pixels.shape[0] in (4, 8)  # 3 frames bucketed up
    assert plan.labels.shape == plan.attention_mask.shape
    # vision positions all masked in labels
    assert np.all(np.asarray(plan.labels)[np.asarray(plan.is_vision)] == IGNORE_INDEX)


def test_split_to_even_chunks():
    chunks = split_to_even_chunks(list(range(8)), [5, 1, 1, 1, 4, 4, 1, 1], 2)
    assert sorted(sum(chunks, [])) == list(range(8))
    assert all(len(c) == 4 for c in chunks)


def test_modality_grouped_sampler():
    lengths = [10, 12, -5, -6, 9, -4, 11, 8]
    rng = np.random.default_rng(0)
    idx = get_modality_length_grouped_indices(lengths, batch_size=2, world_size=1, generator=rng)
    assert sorted(idx) == list(range(8))
    sampler = LengthGroupedSampler(2, 1, lengths=lengths, group_by_modality=True,
                                   generator=np.random.default_rng(1))
    assert sorted(iter(sampler)) == list(range(8))
    with pytest.raises(ValueError):
        LengthGroupedSampler(2, 1, lengths=None)


def test_load_frames_pad_aspect_ratio(tmp_path):
    """image_aspect_ratio='pad' square-pads with the CLIP mean color before
    resize (reference train.py:724-725) — a non-square frame padded to square
    must differ from the unpadded pipeline and match mm_utils' pad path."""
    import numpy as np
    from PIL import Image

    from teochat_tpu.data.dataset import DataArguments, LazySupervisedDataset
    from teochat_tpu.data.processing import ImageProcessor
    from teochat_tpu.mm_utils import expand2square

    f = tmp_path / "rect.png"
    arr = (np.random.RandomState(0).rand(40, 80, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(f)

    proc = ImageProcessor(size=28)
    da_pad = DataArguments(image_aspect_ratio="pad", image_processor=proc)
    da_sq = DataArguments(image_aspect_ratio="square", image_processor=proc)
    ds_pad = LazySupervisedDataset.__new__(LazySupervisedDataset)
    ds_pad.data_args = da_pad
    ds_sq = LazySupervisedDataset.__new__(LazySupervisedDataset)
    ds_sq.data_args = da_sq

    out_pad = ds_pad._load_frames([str(f)])[0]
    out_sq = ds_sq._load_frames([str(f)])[0]
    assert out_pad.shape == out_sq.shape == (3, 28, 28)
    assert np.abs(out_pad - out_sq).max() > 1e-3

    background = tuple(int(x * 255) for x in proc.image_mean)
    expected = proc.preprocess(
        expand2square(Image.fromarray(arr), background)
    )["pixel_values"][0]
    np.testing.assert_array_equal(out_pad, expected)
