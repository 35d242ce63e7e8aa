"""Serving stall probe: how long does an ACTIVE decode stream starve
while a long-prompt request prefills and joins?

Runs the REAL LLaVA-NeXT engine (5-tile anyres image -> ~2.9k merged
tokens, Mistral-GQA tower with synthetic int8 weights, full depth) under
the continuous-batching DecodeServer and measures the longest interval
during which an already-decoding stream makes no progress, for

  - one-shot submit (the whole prefill queues ahead of every decode step)
  - chunked prefill (DecodeServer.submit_chunked: decode steps pumped
    between C-token prefill dispatches — engine.prefill_chunked)

Measured 2026-08-18 (1x v5e over the axon tunnel, 32 layers):

    one-shot:          max stream stall 1405 ms
    chunked c=512:     max stream stall  334 ms   (4.2x better tail)
    chunked c=1024:    max stream stall  630 ms

Usage (real TPU):
    python -m dropoutdecoding_tpu.cli.stall_probe [--layers 32]

The reference has no serving tier at all (SURVEY.md: one image decoded
to completion at a time, chair_test.py:274-346).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=32)
    ap.add_argument("--pump-steps", type=int, default=4)
    ap.add_argument("--chunks", type=int, nargs="*", default=[512, 1024])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..engine.llavanext_engine import LlavaNextEngine
    from ..engine.serving import DecodeServer
    from ..models import llavanext as next_mod
    from ..models.llavanext import LlavaNextParams
    from ..utils.config import (
        EnsembleConfig,
        GenerationConfig,
        LlamaConfig,
        LlavaNextConfig,
    )
    from ..utils.synthetic import synthetic_int8_lm

    cfg = LlavaNextConfig(
        text=LlamaConfig(
            num_key_value_heads=8,
            intermediate_size=14336,
            rope_theta=1000000.0,
            num_hidden_layers=args.layers,
        ),
    )
    lm = synthetic_int8_lm(cfg.text, jax.random.key(0))
    proto = next_mod.init_params(
        LlavaNextConfig(text=cfg.text.__class__(num_hidden_layers=1)),
        jax.random.key(6),
        jnp.bfloat16,
    )
    params = LlavaNextParams(
        vision=proto.vision,
        projector=proto.projector,
        image_newline=proto.image_newline,
        lm=lm,
    )
    T = args.tokens
    eng = LlavaNextEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(fused_step=True),
        gen=GenerationConfig(max_new_tokens=T, eos_token_id=-1, pad_token_id=0),
        max_len=next_mod.max_image_tokens(cfg) + 64,
        ensemble=True,
        seed=506,
        int8_kv=True,
    )
    jax.block_until_ready(params.lm["norm"])

    rng = np.random.default_rng(0)
    geo = next_mod.image_geometry((600, 800), cfg)
    nt = geo["n_tiles"]

    def make_req():
        row = [1] + list(rng.integers(4, 1000, 26)) + [2]
        row[3] = cfg.image_token_index
        ids = np.asarray([row], np.int32)
        tiles = rng.normal(size=(nt, 3, 336, 336)).astype(np.float32)
        return ids, tiles, (600, 800)

    def sync(srv):
        np.asarray(srv._carry["steps"])

    def run_case(chunk):
        """chunk=None -> one-shot submit."""
        srv = DecodeServer(engine=eng, n_slots=2)
        a, b = make_req(), make_req()
        # warm every program this case dispatches
        srv.submit("w1", *a)
        if chunk:
            srv.submit_chunked(
                "w2", *b, chunk=chunk, pump_steps=args.pump_steps
            )
        else:
            srv.submit("w2", *b)
        while srv.active():
            srv.step(4)
            srv.harvest()
        sync(srv)

        # measured run: stream A decodes, then B joins
        srv.submit("a", *a)
        srv.step(4)
        sync(srv)
        stamps = [time.perf_counter()]
        srv.step(4)
        sync(srv)
        stamps.append(time.perf_counter())
        if chunk:
            # submit_chunked's pump, instrumented: sync after every pump
            # so the host records stream A's actual progress timestamps
            def pump():
                srv.step(args.pump_steps)
                sync(srv)
                stamps.append(time.perf_counter())

            ps = eng.prefill_chunked(*b, chunk=chunk, pump=pump)
            ps = ps._replace(uncertainty={})
            slot = srv.free_slots()[0]
            srv._place(ps, slot, "b")
            srv._budgets[slot] = T
        else:
            srv.submit("b", *b)
        srv.step(4)
        sync(srv)
        stamps.append(time.perf_counter())
        while srv.active():
            srv.step(4)
            srv.harvest()
        sync(srv)
        gaps = np.diff(stamps)
        name = f"chunked(c={chunk},pump={args.pump_steps})" if chunk else "one-shot"
        print(
            f"{name}: max stream-A stall {gaps.max() * 1e3:.0f} ms "
            f"(gaps ms: {[int(g * 1e3) for g in gaps]})",
            file=sys.stderr,
            flush=True,
        )
        return float(gaps.max())

    base = run_case(None)
    best = min(run_case(c) for c in args.chunks)
    import json

    print(
        json.dumps(
            {
                "metric": "serving_max_stall_ms",
                "one_shot": round(base * 1e3, 1),
                "chunked_best": round(best * 1e3, 1),
                "improvement": round(base / best, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
