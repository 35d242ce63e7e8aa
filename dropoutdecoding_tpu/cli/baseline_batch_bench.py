"""Measure the batched baseline paths (--vcd / --num-beams with
--batch-size) against serial per-image runs at 7B shape on the real chip.

The reference runs both baselines strictly one caption at a time
(chair_test.py:274 loop; vcd_sample.py is a B=1 monkey-patch); this tool
records what the batched programs buy.  Synthetic int8 weights + synthetic
post-prefill states (bench.build_state) isolate the decode loops — the
prefill side is shared with every other engine path and benched separately.

Usage:  python -m dropoutdecoding_tpu.cli.baseline_batch_bench \
            [--layers 32] [--batch 8] [--tokens 32] [--beam-batch 4]
"""
from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "ddtpu_bench",
        os.path.join(os.path.dirname(__file__), "..", "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--batch", type=int, default=4, help="VCD batch size")
    p.add_argument("--beam-batch", type=int, default=2)
    p.add_argument("--tokens", type=int, default=32)
    p.add_argument("--num-beams", type=int, default=3)
    args = p.parse_args(argv)

    bench = _load_bench()
    import jax
    import jax.numpy as jnp

    from dropoutdecoding_tpu.engine.baselines import beam_generate, vcd_generate
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.models.llava import LlavaParams
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        EnsembleConfig,
        GenerationConfig,
        LlavaConfig,
    )
    from dropoutdecoding_tpu.utils.synthetic import synthetic_int8_lm

    cfg = LlavaConfig(
        text=LlavaConfig().text.__class__(num_hidden_layers=args.layers),
        vision=ClipVisionConfig(),
    )
    key = jax.random.key(0)
    lm = synthetic_int8_lm(cfg.text, key)
    from dropoutdecoding_tpu.models import llava as llava_mod

    proto = llava_mod.init_params(
        LlavaConfig(
            text=cfg.text.__class__(num_hidden_layers=1), vision=cfg.vision
        ),
        jax.random.key(1),
        jnp.bfloat16,
    )
    params = LlavaParams(vision=proto.vision, projector=proto.projector, lm=lm)

    T = args.tokens

    def mk(use_cd):
        return LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(
                max_new_tokens=T, eos_token_id=-1, pad_token_id=0, use_cd=use_cd
            ),
            max_len=bench.PROMPT_LEN + T,
            ensemble=False,
        )

    def states(engine, B, seed):
        return bench.build_state(engine, cfg, jax.random.key(seed), B=B)

    def timed(fn, warm=1, reps=2):
        for _ in range(warm):
            fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    results = {}

    # ---- VCD ----
    B = args.batch
    evcd = mk(True)
    st_b = (states(evcd, B, 2), states(evcd, B, 3))
    st_1 = (states(evcd, 1, 2), states(evcd, 1, 3))
    t_b = timed(lambda: vcd_generate(evcd, states=st_b, seed=7))
    t_1 = timed(lambda: vcd_generate(evcd, states=st_1, seed=7))
    agg_b = B * T / t_b
    agg_1 = T / t_1
    results["vcd"] = dict(
        batch=B,
        batched_tok_s=round(agg_b, 1),
        serial_tok_s=round(agg_1, 1),
        speedup=round(agg_b / agg_1, 2),
    )
    print(
        f"VCD decode: batch{B} {agg_b:.1f} tok/s aggregate vs serial "
        f"{agg_1:.1f} tok/s ({agg_b / agg_1:.2f}x)",
        flush=True,
    )
    del evcd, st_b, st_1
    jax.clear_caches()

    # ---- beam ----
    Bb = args.beam_batch
    ebeam = mk(False)
    sb = states(ebeam, Bb, 4)
    s1 = states(ebeam, 1, 4)

    def run_b():
        return beam_generate(ebeam, state=sb, num_beams=args.num_beams)

    def run_1():
        return beam_generate(ebeam, state=s1, num_beams=args.num_beams)

    t_b = timed(run_b)
    t_1 = timed(run_1)
    agg_b = Bb * T / t_b
    agg_1 = T / t_1
    results["beam"] = dict(
        batch=Bb,
        num_beams=args.num_beams,
        batched_tok_s=round(agg_b, 1),
        serial_tok_s=round(agg_1, 1),
        speedup=round(agg_b / agg_1, 2),
    )
    print(
        f"beam-{args.num_beams} decode: batch{Bb} {agg_b:.1f} tok/s "
        f"aggregate vs serial {agg_1:.1f} tok/s ({agg_b / agg_1:.2f}x)",
        flush=True,
    )
    import json

    print(json.dumps({"layers": args.layers, "tokens": T, **results}))
    return results


if __name__ == "__main__":
    # exit code reflects the bench's purpose: batched paths must not lose
    # to serial (ADVICE r3: the old `0 if main() else 1` was dead — main
    # always returned a truthy dict)
    res = main()
    ok = all(v["speedup"] >= 1.0 for v in res.values())
    sys.exit(0 if ok else 1)
