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
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class CaptionService:
    def __init__(self, engine, processor, model: str, n_slots: int = 8,
                 step_chunk: int = 8, chunked_prefill: int | None = None,
                 batched_submit: bool = False):
        from ..engine.serving import DecodeServer

        self.engine = engine
        self.processor = processor
        self.model = model
        self.step_chunk = max(int(step_chunk), 1)
        # chunked_prefill = C: joining requests prefill in C-token
        # dispatches with decode steps pumped between them, bounding how
        # long active streams starve (serving.submit_chunked)
        self.chunked_prefill = chunked_prefill
        # batched_submit: route plain same-budget LLaVA-1.5 groups through
        # ONE prefill dispatch (serving.submit_many).  Opt-in: it wins only
        # when per-dispatch latency dominates (remote-attached
        # accelerators); measured 0.9x the per-request async path on a
        # locally-driven chip at full depth (STATUS round 3), so the
        # default submits per request.
        self.batched_submit = batched_submit
        self.server = DecodeServer(engine=engine, n_slots=n_slots)
        self.inbox: "queue.Queue" = queue.Queue()
        self.events: dict = {}
        self.results: dict = {}
        self.streams: dict = {}  # rid -> queue of text deltas (SSE)
        self._t0 = time.time()
        self._done = 0
        self._tokens_out = 0
        self._starts: dict = {}  # rid -> submit-to-loop timestamp
        from collections import deque

        self._lat = deque(maxlen=512)  # recent request latencies (s)
        self.worker = threading.Thread(target=self._loop, daemon=True)
        self.worker.start()

    def caption(self, image, prompt: str, timeout: float = 300.0,
                max_new_tokens: int | None = None) -> str:
        rid = uuid.uuid4().hex
        ev = threading.Event()
        self.events[rid] = ev
        self.inbox.put((rid, image, prompt, max_new_tokens))
        if not ev.wait(timeout):
            raise TimeoutError(rid)
        tokens = self.results.pop(rid)
        self.events.pop(rid, None)
        return self.processor.decode(tokens).strip()

    def caption_stream(self, image, prompt: str, timeout: float = 300.0,
                       max_new_tokens: int | None = None):
        """Generator of text deltas as the request decodes (one delta per
        step chunk) — the serving loop publishes newly generated tokens
        after every dispatch."""
        rid = uuid.uuid4().hex
        q: "queue.Queue" = queue.Queue()
        self.streams[rid] = q
        self.inbox.put((rid, image, prompt, max_new_tokens))
        try:
            while True:
                item = q.get(timeout=timeout)
                if item is None:  # request finished
                    return
                yield item
        finally:
            self.streams.pop(rid, None)

    def stats(self) -> dict:
        el = max(time.time() - self._t0, 1e-9)
        lat = sorted(self._lat)
        pct = lambda p: round(lat[int(p * (len(lat) - 1))], 3) if lat else None
        return {
            "active_slots": self.server.active(),
            "n_slots": self.server.n_slots,
            "pending": self.inbox.qsize(),
            "requests_done": self._done,
            "tokens_generated": self._tokens_out,
            "uptime_s": round(el, 1),
            "requests_per_s": round(self._done / el, 3),
            "tokens_per_s": round(self._tokens_out / el, 2),
            "latency_p50_s": pct(0.5),
            "latency_p95_s": pct(0.95),
        }

    def _publish_stream_deltas(self):
        """Push newly decoded tokens of streaming requests (one small
        host fetch per serving loop iteration)."""
        live = [
            (slot, rid)
            for slot, rid in enumerate(self.server._requests)
            if rid in self.streams
        ]
        if not live:
            return
        import numpy as np

        steps = np.asarray(self.server._carry["steps"])
        bufs = np.asarray(self.server._carry["tokens_buf"])
        for slot, rid in live:
            q = self.streams.get(rid)
            if q is None:
                continue
            n = int(steps[slot])
            sent = getattr(q, "_sent", 0)
            if n > sent:
                text = self.processor.decode(bufs[slot][sent:n])
                q._sent = n
                if text:
                    q.put(text)

    def _submit(self, rid, args, max_new):
        if self.chunked_prefill and self.model in ("llava-1.5", "llava-next"):
            self.server.submit_chunked(
                rid, *args, chunk=self.chunked_prefill,
                pump_steps=self.step_chunk, max_new_tokens=max_new,
            )
        else:
            self.server.submit(rid, *args, max_new_tokens=max_new)

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
                for rid, image, prompt, max_new in take:
                    self._starts[rid] = time.time()
                    if self.model == "llava-next":
                        from .chair_test import next_image_prep

                        tiles, orig = next_image_prep(self.engine)(image)
                        ids = self.processor(prompt)["input_ids"]
                        args = (ids, tiles, orig)
                    else:
                        inputs = self.processor(prompt, image)
                        args = (inputs["input_ids"], inputs["pixel_values"])
                    items.append((rid, args, max_new))
                plain = (
                    self.batched_submit
                    and self.model == "llava-1.5"
                    and not self.chunked_prefill
                    and all(m is None for _, _, m in items)
                )
                if plain:
                    self.server.submit_many([(r, a) for r, a, _ in items])
                else:
                    for rid, args, max_new in items:
                        self._submit(rid, args, max_new)
            if self.server.active():
                # chunked dispatch: one host round-trip per step_chunk
                # decode steps (engine/serving.py step(n))
                self.server.step(self.step_chunk)
                self._publish_stream_deltas()
                for rid, tokens in self.server.harvest().items():
                    self._done += 1
                    self._tokens_out += len(tokens)
                    t0 = self._starts.pop(rid, None)
                    if t0 is not None:
                        self._lat.append(time.time() - t0)
                    self.results[rid] = tokens
                    ev = self.events.get(rid)
                    if ev:
                        ev.set()
                    sq = self.streams.get(rid)
                    if sq is not None:
                        # flush any tail the last publish missed
                        sent = getattr(sq, "_sent", 0)
                        if len(tokens) > sent:
                            sq.put(self.processor.decode(tokens[sent:]))
                        sq.put(None)


def make_handler(service: CaptionService, default_prompt: str):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != "/stats":
                self.send_error(404)
                return
            payload = json.dumps(service.stats()).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        def do_POST(self):
            if self.path not in ("/caption", "/caption_stream"):
                self.send_error(404)
                return
            try:
                body = json.loads(
                    self.rfile.read(int(self.headers.get("Content-Length", 0)))
                )
                from PIL import Image

                image = Image.open(body["image_path"]).convert("RGB")
                prompt = body.get("prompt_template") or default_prompt
                max_new = body.get("max_new_tokens")
                if self.path == "/caption_stream":
                    # server-sent events: one `data:` line per step chunk
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()
                    for delta in service.caption_stream(
                        image, prompt, max_new_tokens=max_new
                    ):
                        self.wfile.write(
                            f"data: {json.dumps({'delta': delta})}\n\n".encode()
                        )
                        self.wfile.flush()
                    self.wfile.write(b"data: [DONE]\n\n")
                    return
                text = service.caption(image, prompt, max_new_tokens=max_new)
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
    if args.model not in ("llava-1.5", "llava-next"):
        raise SystemExit(
            "serving supports llava-1.5 and llava-next (InstructBLIP's "
            "question-dependent visual tokens make per-request prompts "
            "incompatible with the shared caption template)"
        )
    service = CaptionService(
        engine, processor, args.model, n_slots=args.slots,
        step_chunk=args.step_chunk,
        chunked_prefill=getattr(args, "chunked_prefill", None),
        batched_submit=getattr(args, "batched_submit", False),
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
    p.add_argument("--batched-submit", type=str2bool, default=False,
                   help="batch plain same-budget llava-1.5 groups into one "
                   "prefill dispatch (serving.submit_many); wins only when "
                   "per-dispatch latency dominates (remote-attached "
                   "accelerators) — measured 0.9x per-request submit on a "
                   "locally-driven chip, so off by default")
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
    p.add_argument("--chunked-prefill", type=int, default=None,
                   help="prefill joining requests in N-token dispatches "
                   "with decode steps pumped between them — bounds how "
                   "long active streams starve during a long prefill "
                   "(engine.prefill_chunked; biggest effect at "
                   "LLaVA-NeXT's ~3k-token prompts)")
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
