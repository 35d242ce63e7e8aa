"""HTTP captioning service over the continuous-batching DecodeServer.

A deployment surface the reference does not have: POST images, get
dropout-decoded captions; concurrent requests share decode steps through
engine/serving.DecodeServer.

  python -m dropoutdecoding_tpu.cli.serve \
      --model-path /ckpts/llava-1.5-7b-hf --port 8000 [--fused-step True]

  curl -X POST localhost:8000/caption \
      -d '{"image_path": "/data/img.jpg", "prompt": "Describe the image."}'

Stdlib-only (http.server + threads): handlers enqueue requests; one worker
thread owns the device, submitting into free slots and stepping the server
until requests finish.
"""
from __future__ import annotations

import argparse
import json
import queue
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class CaptionService:
    def __init__(self, engine, processor, model: str, n_slots: int = 8,
                 step_chunk: int = 8):
        from ..engine.serving import DecodeServer

        self.engine = engine
        self.processor = processor
        self.model = model
        self.step_chunk = max(int(step_chunk), 1)
        self.server = DecodeServer(engine=engine, n_slots=n_slots)
        self.inbox: "queue.Queue" = queue.Queue()
        self.events: dict = {}
        self.results: dict = {}
        self.worker = threading.Thread(target=self._loop, daemon=True)
        self.worker.start()

    def caption(self, image, prompt: str, timeout: float = 300.0) -> str:
        rid = uuid.uuid4().hex
        ev = threading.Event()
        self.events[rid] = ev
        self.inbox.put((rid, image, prompt))
        if not ev.wait(timeout):
            raise TimeoutError(rid)
        tokens = self.results.pop(rid)
        self.events.pop(rid, None)
        return self.processor.decode(tokens).strip()

    def _loop(self):
        pending = []
        while True:
            # pick up new requests (block only when idle)
            block = not pending and self.server.active() == 0
            try:
                while True:
                    pending.append(self.inbox.get(block=block, timeout=0.5))
                    block = False
            except queue.Empty:
                pass
            free = self.server.free_slots()
            if pending and free:
                # all waiting requests join in one batched prefill
                # dispatch (serving.submit_many); requests join decode on
                # step_chunk boundaries
                take = [
                    pending.pop(0)
                    for _ in range(min(len(free), len(pending)))
                ]
                items = []
                for rid, image, prompt in take:
                    inputs = self.processor(prompt, image)
                    items.append(
                        (rid, (inputs["input_ids"], inputs["pixel_values"]))
                    )
                if self.model == "llava-1.5":
                    self.server.submit_many(items)
                else:
                    for rid, args in items:
                        self.server.submit(rid, *args)
            if self.server.active():
                # chunked dispatch: one host round-trip per step_chunk
                # decode steps (engine/serving.py step(n))
                self.server.step(self.step_chunk)
                for rid, tokens in self.server.harvest().items():
                    self.results[rid] = tokens
                    ev = self.events.get(rid)
                    if ev:
                        ev.set()


def make_handler(service: CaptionService, default_prompt: str):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/caption":
                self.send_error(404)
                return
            try:
                body = json.loads(
                    self.rfile.read(int(self.headers.get("Content-Length", 0)))
                )
                from PIL import Image

                image = Image.open(body["image_path"]).convert("RGB")
                prompt = body.get("prompt_template") or default_prompt
                text = service.caption(image, prompt)
                payload = json.dumps({"caption": text}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(payload)
            except Exception as e:  # surface errors to the client
                self.send_response(500)
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())

        def log_message(self, fmt, *args):
            print("[serve]", fmt % args)

    return Handler


def main(args):
    from .chair_test import PROMPTS, make_engine, str2bool

    engine, processor = make_engine(args)
    if args.model != "llava-1.5":
        raise SystemExit("serving currently supports llava-1.5")
    service = CaptionService(
        engine, processor, args.model, n_slots=args.slots,
        step_chunk=args.step_chunk,
    )
    handler = make_handler(service, PROMPTS[args.model])
    httpd = ThreadingHTTPServer(("0.0.0.0", args.port), handler)
    print(f"serving on :{args.port} with {args.slots} decode slots")
    httpd.serve_forever()


def build_parser():
    from .chair_test import str2bool

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llava-1.5")
    p.add_argument("--model-path", required=True)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--step-chunk", type=int, default=8,
                   help="decode steps per device dispatch (latency vs "
                   "join-granularity trade; 2.07x sequential at 8)")
    p.add_argument("--original", type=str2bool, default=False)
    p.add_argument("--opera", type=str2bool, default=False)
    p.add_argument("--vcd", type=str2bool, default=False)
    p.add_argument("--num-beams", type=int, default=None)
    p.add_argument("--avg", type=str2bool, default=False)
    p.add_argument("--voting-numbers", type=int, default=3)
    p.add_argument("--use_random", type=str2bool, default=False)
    p.add_argument("--seed", type=int, default=None)
    # sampling (HF warper semantics; per-request-deterministic draws —
    # the slot layer preserves rng_id so placement never changes tokens)
    p.add_argument("--do-sample", type=str2bool, default=False)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--fused-step", type=str2bool, default=True)
    p.add_argument(
        "--quantize", type=str, default=None, choices=[None, "int8", "w8a8", "int4"]
    )
    p.add_argument("--int8-kv", type=str2bool, default=False,
                   help="int8-quantized KV cache for the slot pool")
    p.add_argument("--fuse-proj", type=str2bool, default=True,
                   help="fuse qkv/gate+up weight leaves on single-device "
                   "runs (identical outputs; tests/test_fused_proj.py)")
    p.add_argument("--w8a8-decode", type=str2bool, default=False,
                   help="int8-MXU decode projections — the many-slot "
                   "serving configs run compute-bound projections where "
                   "this is step time off the top (needs --quantize "
                   "int8/w8a8; drift: fused_gap --study w8a8decode)")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
