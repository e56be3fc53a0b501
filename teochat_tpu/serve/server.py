"""Dependency-free HTTP serving endpoint.

The reference serves through Gradio-on-FastAPI (teochat_demo.py:914-943);
neither is in this stack's baked environment, so the production endpoint is a
stdlib ThreadingHTTPServer speaking JSON:

    POST /generate {"prompt": str, "images": [base64 PNG/JPEG, ...],
                    "timestamps": [...], "bbox": [x1,y1,x2,y2] | null,
                    "temperature": float, "max_new_tokens": int,
                    "session_id": str | null}
      -> {"response": str, "bboxes": [[x1,y1,x2,y2], ...]}
    POST /reset {"session_id": str | null} -> {"status": "reset"}
    GET /health -> {"status": "ok"}
    GET /stats -> engine/session counters

    `session_id` gives each conversation its own multi-turn state (history,
    accumulated frames, incremental KV session) — omitted/null uses the
    default session, matching the reference demo's single-session behavior.
    Stale sessions are evicted LRU beyond `max_sessions`.

Two execution modes:
- default: requests funnel through one worker thread over a stateful Chat
  session (matches the reference demo's single-session behavior);
- `engine=BatchEngine(...)`: requests are handled CONCURRENTLY — each HTTP
  handler thread builds a stateless first-turn prompt and submits to the
  continuous-batching engine, which multiplexes decode across per-request KV
  slots (serve/engine.py). Aggregate tokens/s grows with concurrency because
  batched decode shares each weight read.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def _decode_images(b64_list):
    from PIL import Image

    images = []
    for b in b64_list:
        raw = base64.b64decode(b)
        images.append(np.asarray(Image.open(io.BytesIO(raw)).convert("RGB")))
    return images


class ChatServer:
    """Wraps a serve.chat.Chat (or compatible) behind HTTP."""

    def __init__(self, chat, host: str = "127.0.0.1", port: int = 7860,
                 engine=None, max_sessions: int = 4, session_factory=None):
        self.chat = chat  # default session ("" id)
        self.host = host
        self.port = port
        self.engine = engine  # serve.engine.BatchEngine (already started)
        # NOTE on sizing: a 7B / 4096-slot bf16 KV session is ~2.1 GB of HBM
        # once its first turn allocates it — max_sessions bounds peak cache
        # memory at roughly max_sessions x that (idle sessions cost nothing,
        # allocation is lazy). 4 live sessions + weights fits a 16 GB v5e.
        self.max_sessions = max_sessions
        self._session_factory = session_factory or self._clone_default_chat
        # per-conversation Chat sessions keyed by session_id; insertion order
        # doubles as LRU order (move-to-end on use)
        self._sessions = {"": chat}
        self._jobs: "queue.Queue" = queue.Queue()
        self._httpd: Optional[ThreadingHTTPServer] = None

    def _clone_default_chat(self):
        """New per-conversation Chat mirroring the default one's config
        (incremental mode + session max_len included). Servers wrapping a
        Chat subclass with a different __init__ pass `session_factory`."""
        kw = dict(
            model_bundle=(
                self.chat.tokenizer, self.chat.model, self.chat.processor
            ),
            conv_mode=self.chat.conv_mode,
            incremental=self.chat._session is not None,
        )
        if self.chat._session is not None:
            kw["session_max_len"] = self.chat._session.max_len
        return type(self.chat)(**kw)

    def _session_for(self, session_id: str):
        """Fetch-or-create the Chat for a session id (worker thread only)."""
        chat = self._sessions.pop(session_id, None)
        if chat is None:
            chat = self._session_factory()
            while len(self._sessions) >= self.max_sessions:
                it = iter(self._sessions)
                evicted = next(it)
                if evicted == "":  # never evict the default session
                    evicted = next(it, None)
                    if evicted is None:
                        break
                self._sessions.pop(evicted)
        self._sessions[session_id] = chat  # (re)insert at LRU tail
        return chat

    def _engine_generate(self, payload):
        """Stateless per-request path through the continuous-batching engine.
        Runs on the HTTP handler thread; concurrency = concurrent requests."""
        from teochat_tpu.config import GenerationConfig
        from teochat_tpu.eval.inference import extract_bboxes
        from teochat_tpu.serve.chat import build_request

        images = _decode_images(payload.get("images", []))
        input_ids, pixel_values, stop_str, _ = build_request(
            payload["prompt"], images, self.chat.tokenizer, self.chat.processor,
            conv_mode=self.chat.conv_mode,
            timestamps=payload.get("timestamps", []),
            bbox=payload.get("bbox"),
            mm_use_im_start_end=getattr(
                getattr(self.chat.model, "cfg", None), "mm_use_im_start_end", False
            ),
        )
        temperature = float(payload.get("temperature", 0.2))
        gen = GenerationConfig(
            max_new_tokens=int(payload.get("max_new_tokens", 256)),
            temperature=temperature,
            do_sample=temperature > 0,
            stop_strings=(stop_str,),
        )
        toks = self.engine.submit(input_ids, pixel_values, gen,
                                  adapter=int(payload.get("adapter", -1)))
        response = self.chat.tokenizer.decode(toks).replace("</s>", "").strip()
        return {"response": response, "bboxes": extract_bboxes(response)}

    def _worker(self):
        while True:
            job = self._jobs.get()
            if job is None:
                return
            payload, done = job
            try:
                sid = str(payload.get("session_id") or "")
                if payload.get("_reset"):
                    # resetting an unknown/evicted session is a NO-OP — it
                    # must not allocate a fresh session (or evict a live one)
                    existing = self._sessions.get(sid)
                    if existing is not None:
                        existing.reset()
                    done["result"] = {"status": "reset"}
                    continue
                chat = self._session_for(sid)
                images = _decode_images(payload.get("images", []))
                result = chat.generate(
                    payload["prompt"],
                    images,
                    timestamps=payload.get("timestamps", []),
                    bbox=payload.get("bbox"),
                    temperature=float(payload.get("temperature", 0.2)),
                    max_new_tokens=int(payload.get("max_new_tokens", 256)),
                    speculative_k=int(payload.get("speculative_k", 0)),
                )
                done["result"] = result
            except Exception as e:  # surfaced as HTTP 400
                done["error"] = str(e)
            finally:
                done["event"].set()

    def make_handler(server):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_sse(self, payload):
                """Server-sent events: one `data:` event per decode chunk with
                the fresh token ids + full text so far, then `data: [DONE]`.
                Only available in engine mode (the chunked decode loop yields
                tokens incrementally; the single-program while_loop cannot)."""
                from teochat_tpu.config import GenerationConfig
                from teochat_tpu.serve.chat import build_request

                chat = server.chat
                try:
                    images = _decode_images(payload.get("images", []))
                    input_ids, pixel_values, stop_str, _ = build_request(
                        payload["prompt"], images, chat.tokenizer,
                        chat.processor, conv_mode=chat.conv_mode,
                        timestamps=payload.get("timestamps", []),
                        bbox=payload.get("bbox"),
                        mm_use_im_start_end=getattr(
                            getattr(chat.model, "cfg", None),
                            "mm_use_im_start_end", False
                        ),
                    )
                except Exception as e:  # noqa: BLE001 — HTTP 400
                    return self._send(400, {"error": str(e)})
                temperature = float(payload.get("temperature", 0.2))
                gen = GenerationConfig(
                    max_new_tokens=int(payload.get("max_new_tokens", 256)),
                    temperature=temperature,
                    do_sample=temperature > 0,
                    stop_strings=(stop_str,),
                )
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                tokens = []
                try:
                    for fresh in server.engine.submit_stream(
                        input_ids, pixel_values, gen,
                        adapter=int(payload.get("adapter", -1)),
                    ):
                        tokens.extend(fresh)
                        event = {
                            "token_ids": fresh,
                            "text": chat.tokenizer.decode(tokens)
                            .replace("</s>", "").strip(),
                        }
                        self.wfile.write(
                            f"data: {json.dumps(event)}\n\n".encode()
                        )
                        self.wfile.flush()
                    self.wfile.write(b"data: [DONE]\n\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client went away; engine still drains the request
                except RuntimeError as e:
                    self.wfile.write(
                        f"data: {json.dumps({'error': str(e)})}\n\n".encode()
                    )

            def do_GET(self):
                if self.path == "/health":
                    self._send(200, {"status": "ok"})
                elif self.path == "/stats":
                    stats = dict(server.engine.stats) if server.engine else {}
                    stats["mode"] = (
                        "continuous_batching" if server.engine else "session"
                    )
                    if stats.get("spec_iterations"):
                        stats["spec_mean_tokens_per_step"] = round(
                            stats["spec_tokens"] / stats["spec_iterations"], 3
                        )
                    self._send(200, stats)
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path not in ("/generate", "/reset"):
                    return self._send(404, {"error": "not found"})
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    if self.path == "/generate" and "prompt" not in payload:
                        return self._send(400, {"error": "missing 'prompt'"})
                except (ValueError, json.JSONDecodeError) as e:
                    return self._send(400, {"error": f"bad request: {e}"})
                if self.path == "/reset":
                    payload["_reset"] = True
                # requests carrying a session_id key are stateful multi-turn
                # conversations -> the per-session worker path (explicit ""
                # means the default session in EVERY mode); the engine
                # handles stateless requests concurrently
                # absent/null session_id = stateless; ANY string (incl. "",
                # the default session) = stateful, identically in both modes
                stateful = (
                    payload.get("session_id") is not None
                    or payload.get("_reset")
                )
                if stateful and payload.get("stream"):
                    return self._send(400, {
                        "error": "streaming requires a stateless request "
                                 "(engine mode, no session_id)"
                    })
                if server.engine is not None and not stateful:
                    if payload.get("stream"):
                        return self._send_sse(payload)
                    try:
                        return self._send(200, server._engine_generate(payload))
                    except Exception as e:  # noqa: BLE001 — HTTP 400
                        return self._send(400, {"error": str(e)})
                done = {"event": threading.Event()}
                server._jobs.put((payload, done))
                done["event"].wait()
                if "error" in done:
                    return self._send(400, {"error": done["error"]})
                return self._send(200, done["result"])

        return Handler

    def serve_forever(self):
        threading.Thread(target=self._worker, daemon=True).start()
        self._httpd = ThreadingHTTPServer((self.host, self.port), self.make_handler())
        self._httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        import time

        for _ in range(100):
            if self._httpd is not None:
                break
            time.sleep(0.05)
        return self

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()
        self._jobs.put(None)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="TEOChat JSON serving endpoint")
    p.add_argument("--model_path", required=True)
    p.add_argument("--vision_path", default=None)
    p.add_argument("--load_8bit", action="store_true", default=True)
    p.add_argument("--quantize_vision", action="store_true",
                   help="w8a8 int8 vision tower: +19% encode throughput on "
                        "v5e (metric-parity, not bit-parity)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--continuous_batching", action="store_true",
                   help="multiplex concurrent requests over per-request KV slots")
    p.add_argument("--max_slots", type=int, default=4)
    p.add_argument("--max_len", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=8,
                   help="decode chunk: jitted steps between host scheduling "
                        "points (engine mode only). Small chunks minimize "
                        "admission latency; larger ones amortize dispatch "
                        "overhead (r4 sweep: throughput is flat 8..64, "
                        "~335-350 tok/s over 8 streams, then falls off)")
    p.add_argument("--prefill_chunk", type=int, default=None,
                   help="chunked prefill: commit long-prompt K/V in pieces of "
                        "this many fused tokens, one piece per decode chunk, "
                        "bounding admission stall on running streams "
                        "(engine mode only; default monolithic)")
    p.add_argument("--prefix_cache_slots", type=int, default=0,
                   help="automatic prefix caching: pool this many extra KV "
                        "rows; requests sharing a leading text run (e.g. the "
                        "system prompt) seed their KV from the pool and "
                        "prefill only the suffix (engine mode only; 0 = off)")
    p.add_argument("--prefix_min_tokens", type=int, default=256,
                   help="only pool text prefixes at least this many tokens")
    p.add_argument("--speculative_k", type=int, default=0,
                   help="verify k prompt-lookup drafts per decode step "
                        "(engine mode only; greedy rows are token-exact, "
                        "temperature>0 rows use distribution-exact "
                        "speculative sampling — same distribution, not the "
                        "same seeded draw as the plain path)")
    p.add_argument("--lora_paths", default=None,
                   help="comma-separated peft adapter dirs for multi-LoRA "
                        "serving: adapters stay UNMERGED over the shared "
                        "(possibly quantized) backbone and requests pick one "
                        "via the JSON 'adapter' field (index into this list; "
                        "-1/absent = base model)")
    args = p.parse_args(argv)

    from teochat_tpu.serve.chat import Chat

    chat = Chat(args.model_path, load_8bit=args.load_8bit,
                vision_path=args.vision_path,
                quantize_vision=args.quantize_vision)
    if args.lora_paths:
        from teochat_tpu.builder import load_multi_lora

        chat.model = load_multi_lora(
            chat.model, [d for d in args.lora_paths.split(",") if d]
        )
    engine = None
    if args.continuous_batching:
        from teochat_tpu.serve.engine import BatchEngine

        engine = BatchEngine(
            chat.model, max_slots=args.max_slots, max_len=args.max_len,
            chunk=args.chunk,
            speculative_k=args.speculative_k,
            prefill_chunk=args.prefill_chunk,
            prefix_cache_slots=args.prefix_cache_slots,
            prefix_min_tokens=args.prefix_min_tokens,
        ).start()
    print(f"serving on {args.host}:{args.port}"
          + (" (continuous batching)" if engine else ""))
    ChatServer(chat, args.host, args.port, engine=engine).serve_forever()


if __name__ == "__main__":
    main()
