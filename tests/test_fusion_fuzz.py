"""Property/fuzz tests: fusion-plan invariants and batched-generate consistency."""

import numpy as np
import pytest

import jax

from teochat_tpu.config import GenerationConfig, tiny_test_config
from teochat_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from teochat_tpu.models.fusion import build_fusion_plan, count_frames
from teochat_tpu.models.teochat import TEOChat, init_teochat


@pytest.mark.parametrize("seed", range(6))
def test_fusion_plan_invariants_fuzz(seed):
    rs = np.random.RandomState(seed)
    tpf = int(rs.randint(2, 9))
    b = int(rs.randint(1, 5))
    rows = []
    for _ in range(b):
        n = int(rs.randint(1, 30))
        row = rs.randint(3, 100, n).tolist()
        for _ in range(int(rs.randint(0, 4))):
            row.insert(int(rs.randint(0, len(row) + 1)), IMAGE_TOKEN_INDEX)
        rows.append(row)
    max_len = int(rs.randint(16, 96))
    plan = build_fusion_plan(rows, tokens_per_frame=tpf, max_length=max_len)

    total_frames = count_frames(rows)
    att = np.asarray(plan.attention_mask)
    isv = np.asarray(plan.is_vision)
    vg = np.asarray(plan.vis_gather)
    tg = np.asarray(plan.text_gather)
    lab = np.asarray(plan.labels)
    pos = np.asarray(plan.position_ids)
    lens = np.asarray(plan.seq_lens)

    # lengths respect truncation
    assert (lens <= max_len).all()
    # valid positions form a prefix (right padding)
    for r in range(b):
        assert att[r, : lens[r]].all() and not att[r, lens[r]:].any()
        # position ids are 0..len-1 on the valid prefix
        np.testing.assert_array_equal(pos[r, : lens[r]], np.arange(lens[r]))
    # vision gathers stay within the flat frame-token buffer
    if total_frames:
        assert vg[isv].max() < total_frames * tpf
        assert vg[isv].min() >= 0
    # every vision position is label-masked
    assert (lab[isv] == IGNORE_INDEX).all()
    # text gathers stay within each row's text ids
    assert tg.max() < np.asarray(plan.text_ids).shape[1]


def test_batched_generate_matches_singles_fuzz():
    cfg = tiny_test_config()
    model = TEOChat(cfg, init_teochat(jax.random.PRNGKey(0), cfg))
    rs = np.random.RandomState(7)
    rows, frame_counts = [], []
    for _ in range(3):
        n = int(rs.randint(2, 10))
        row = [1] + rs.randint(3, 100, n).tolist()
        k = int(rs.randint(0, 3))
        for _ in range(k):
            row.insert(int(rs.randint(1, len(row) + 1)), IMAGE_TOKEN_INDEX)
        rows.append(row)
        frame_counts.append(k)
    total = sum(frame_counts)
    frames = rs.randn(max(total, 1), 3, 28, 28).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=4, do_sample=False, temperature=0.0)

    batched = model.generate(rows, frames[:total] if total else None, gen)
    off = 0
    for i, row in enumerate(rows):
        f = frames[off : off + frame_counts[i]] if frame_counts[i] else None
        off += frame_counts[i]
        single = model.generate([row], f, gen)[0]
        assert batched[i] == single, f"row {i} diverged"
