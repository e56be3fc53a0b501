"""Dependency-free HTTP serving endpoint.

The reference serves through Gradio-on-FastAPI (teochat_demo.py:914-943);
neither is in this stack's baked environment, so the production endpoint is a
stdlib ThreadingHTTPServer speaking JSON:

    POST /generate {"prompt": str, "images": [base64 PNG/JPEG, ...],
                    "timestamps": [...], "bbox": [x1,y1,x2,y2] | null,
                    "temperature": float, "max_new_tokens": int}
      -> {"response": str, "bboxes": [[x1,y1,x2,y2], ...]}
    GET /health -> {"status": "ok"}

Requests are funneled through a single worker thread: the TPU generate path is
a single-stream resource (batching across requests is the eval harness's job;
request-level continuous batching is future work).
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

    def __init__(self, chat, host: str = "127.0.0.1", port: int = 7860):
        self.chat = chat
        self.host = host
        self.port = port
        self._jobs: "queue.Queue" = queue.Queue()
        self._httpd: Optional[ThreadingHTTPServer] = None

    def _worker(self):
        while True:
            job = self._jobs.get()
            if job is None:
                return
            payload, done = job
            try:
                images = _decode_images(payload.get("images", []))
                result = self.chat.generate(
                    payload["prompt"],
                    images,
                    timestamps=payload.get("timestamps", []),
                    bbox=payload.get("bbox"),
                    temperature=float(payload.get("temperature", 0.2)),
                    max_new_tokens=int(payload.get("max_new_tokens", 256)),
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

            def do_GET(self):
                if self.path == "/health":
                    self._send(200, {"status": "ok"})
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/generate":
                    return self._send(404, {"error": "not found"})
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    if "prompt" not in payload:
                        return self._send(400, {"error": "missing 'prompt'"})
                except (ValueError, json.JSONDecodeError) as e:
                    return self._send(400, {"error": f"bad request: {e}"})
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
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)

    from teochat_tpu.serve.chat import Chat

    chat = Chat(args.model_path, load_8bit=args.load_8bit, vision_path=args.vision_path)
    print(f"serving on {args.host}:{args.port}")
    ChatServer(chat, args.host, args.port).serve_forever()


if __name__ == "__main__":
    main()
