"""Gradio web demo shell (reference videollava/serve/teochat_demo.py).

The reference serves a Gradio-on-FastAPI app with temporal image upload, a
brush-mask -> bbox tool, and cv2 bbox overlays (teochat_demo.py:549-943).
gradio is not part of this deployment's baked dependencies, so this module is
import-guarded: `build_demo()` constructs the full Blocks app when gradio is
installed and raises a clear ImportError otherwise. The dependency-free
serving path is teochat_tpu/serve/server.py (JSON over HTTP) + serve/chat.py.

Omitted relative to the reference demo (both need egress, unavailable here):
Planet/Google/USGS map-tile fetch (teochat_demo.py:549-627) and the OpenAI
moderation hook (already dead code in the reference).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from teochat_tpu.serve.chat import Chat, draw_bboxes, mask2bbox

EXAMPLE_PROMPTS = [
    "Describe the changes between these images.",
    "Were any buildings damaged? Answer with Yes or No.",
    "Identify all new buildings. Output bounding boxes as [x1, y1, x2, y2].",
    "Classify the level of damage experienced by the building at location "
    "[bbox] in the second image. Choose from: No damage, Minor Damage, "
    "Major Damage, Destroyed.",
]


def build_demo(
    model_path: Optional[str] = None,
    vision_path: Optional[str] = None,
    load_8bit: bool = True,
    chat: Optional[Chat] = None,
):
    """Construct the Gradio Blocks app. Requires the optional gradio extra."""
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "the web demo requires gradio (not in this deployment's baked "
            "dependencies); use teochat_tpu.serve.server (JSON HTTP endpoint) "
            "or serve.chat.Chat programmatically instead"
        ) from e

    if chat is None:
        chat = Chat(model_path, load_8bit=load_8bit, vision_path=vision_path)

    def respond(images, mask_image, timestamps_text, message, temperature,
                max_new_tokens, history):
        history = history or []
        image_list: List[np.ndarray] = [np.asarray(im) for im in (images or [])]
        bbox = mask2bbox(np.asarray(mask_image)) if mask_image is not None else None
        timestamps = [t.strip() for t in (timestamps_text or "").split(",") if t.strip()]
        if timestamps and len(timestamps) != len(image_list):
            timestamps = []
        result = chat.generate(
            message, image_list, timestamps=timestamps, bbox=bbox,
            temperature=float(temperature), max_new_tokens=int(max_new_tokens),
        )
        history = history + [(message, result["response"])]
        overlays = []
        if result["bboxes"] and image_list:
            overlays = [
                draw_bboxes(im.copy(), result["bboxes"]) for im in image_list
            ]
        return history, overlays

    def reset():
        chat.reset()
        return [], []

    with gr.Blocks(title="TEOChat (TPU)") as demo:
        gr.Markdown(
            "# TEOChat — temporal earth observation assistant (TPU-native)\n"
            "Upload a chronological sequence of satellite images and ask "
            "questions about change, damage, or objects."
        )
        with gr.Row():
            with gr.Column():
                images = gr.Gallery(label="Image sequence (chronological)",
                                    type="numpy")
                mask_image = gr.Image(label="Optional region brush (bbox)",
                                      type="numpy")
                timestamps_text = gr.Textbox(
                    label="Timestamps (comma-separated YYYY-MM-DD, optional)"
                )
                temperature = gr.Slider(0.0, 1.0, value=0.2, label="temperature")
                max_new_tokens = gr.Slider(16, 1024, value=256, step=16,
                                           label="max new tokens")
            with gr.Column():
                chatbot = gr.Chatbot(label="TEOChat")
                message = gr.Textbox(label="Message")
                overlays = gr.Gallery(label="Detections")
                send = gr.Button("Send")
                clear = gr.Button("New session")
        gr.Examples(examples=[[p] for p in EXAMPLE_PROMPTS], inputs=[message])
        state = gr.State([])
        send.click(
            respond,
            [images, mask_image, timestamps_text, message, temperature,
             max_new_tokens, state],
            [chatbot, overlays],
        )
        clear.click(reset, [], [chatbot, overlays])
    return demo


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="TEOChat gradio demo")
    p.add_argument("--model_path", required=True)
    p.add_argument("--vision_path", default=None)
    p.add_argument("--load_8bit", action="store_true", default=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)
    demo = build_demo(args.model_path, args.vision_path, args.load_8bit)
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
