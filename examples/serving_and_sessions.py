"""Serving-stack tour: multi-turn sessions, continuous batching, speculation.

Runs on CPU or TPU with a tiny random model (no checkpoints needed — swap the
tiny-model block for `teochat_tpu.eval.eval.load_model(path, load_8bit=True)`
to serve real weights). Demonstrates the three serving modes this framework
adds over the reference's one-request-at-a-time gradio demo:

1. incremental multi-turn Chat (per-conversation KV cache; each turn prefills
   only its suffix — serve/session.py);
2. the continuous-batching engine (per-request KV slots, concurrent HTTP-style
   submissions — serve/engine.py), with prompt-lookup speculation enabled;
3. speculative generate on the raw model API (greedy token-identical;
   temperature sampling distribution-exact).
"""

import threading

import numpy as np

import jax

from teochat_tpu.config import GenerationConfig, tiny_test_config
from teochat_tpu.data.processing import ImageProcessor
from teochat_tpu.models.teochat import TEOChat, init_teochat
from teochat_tpu.serve.chat import Chat
from teochat_tpu.serve.engine import BatchEngine

from minimal_inference import WordTokenizer


def main():
    print(f"backend: {jax.default_backend()}")
    cfg = tiny_test_config(vocab_size=512)
    tokenizer = WordTokenizer()
    model = TEOChat(cfg, init_teochat(jax.random.PRNGKey(0), cfg),
                    tokenizer=tokenizer)
    processor = ImageProcessor(size=cfg.vision.image_size)

    # -- 1. incremental multi-turn chat ------------------------------------
    chat = Chat(model_bundle=(tokenizer, model, processor),
                incremental=True, session_max_len=2048)
    frames = [np.random.RandomState(i).randint(0, 255, (96, 96, 3), np.uint8)
              for i in range(2)]
    r1 = chat.generate("What changed between the images?", frames,
                       temperature=0.0, max_new_tokens=8)
    r2 = chat.generate("Where exactly?", [], temperature=0.0, max_new_tokens=8)
    s = chat._session.stats
    print(f"turn 1: {r1['response']!r}")
    print(f"turn 2: {r2['response']!r}")
    print(f"session reuse: {s['reused_tokens']} tokens reused, "
          f"{s['prefilled_tokens']} prefilled across {s['turns']} turns")

    # -- 2. continuous batching with speculation ---------------------------
    engine = BatchEngine(model, max_slots=4, max_len=256, chunk=2,
                         speculative_k=4).start()
    gen = GenerationConfig(max_new_tokens=10, temperature=0.0,
                           do_sample=False, stop_strings=())
    prompts = [
        tokenizer(f"Request {i}: describe the area .").input_ids
        for i in range(4)
    ]
    results = [None] * len(prompts)
    threads = [
        threading.Thread(
            target=lambda i=i: results.__setitem__(
                i, engine.submit(prompts[i], None, gen))
        )
        for i in range(len(prompts))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    engine.shutdown()
    print(f"engine served {engine.stats['requests']} concurrent requests "
          f"(max concurrent {engine.stats['max_concurrent']}); "
          f"outputs: {[tokenizer.decode(r) for r in results][:2]} ...")

    # -- 3. speculative generate on the model API --------------------------
    ids = [tokenizer("The bounding boxes are [10, 20, 30, 40] and").input_ids]
    greedy = GenerationConfig(max_new_tokens=12, temperature=0.0,
                              do_sample=False, stop_strings=())
    spec = GenerationConfig(max_new_tokens=12, temperature=0.0,
                            do_sample=False, stop_strings=(), speculative_k=6)
    base = model.generate(ids, None, greedy)
    fast = model.generate(ids, None, spec)
    assert base == fast, "speculation must be token-identical for greedy"
    st = model.last_spec_stats
    print(f"speculative greedy: {st['tokens']} tokens in {st['steps']} steps "
          f"({st['drafts_accepted']} drafts accepted) — identical output")


if __name__ == "__main__":
    main()
