"""Device-time profile of the large-batch fused decode step.

Times the donated production decode dispatch at a stretch config and
prints an op-level device-time breakdown parsed from the trace-viewer
JSON jax.profiler emits (the tensorboard_plugin_profile xplane pipeline
is not importable in minimal images, so the breakdown reads
``*.trace.json.gz`` directly).

History (batch-16 x K=8 fused LLaVA-1.5 stretch, full 32-layer int8):
the round-2 path measured 554 tok/s aggregate at ~45% of its HBM byte
roofline; this tool's breakdown attributed the gap to per-layer cache
slice copies, f32 score/prob HBM round-trips, per-step scale/cache
relayout copies, and non-donated dispatch entry copies — all removed in
round 3 (layered Pallas attention + cache layouts chosen for the decode
reader + aliased row-append + donated dispatch), landing at 739 tok/s.

Usage (real TPU):
    python -m dropoutdecoding_tpu.cli.profile_stretch --config llava16
    python -m dropoutdecoding_tpu.cli.profile_stretch --config gqa8
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time


def trace_op_table(log_dir: str, top: int = 25):
    """Aggregate device-op self times from the newest trace.json.gz under
    ``log_dir``; returns [(total_us, count, name, hlo_long_name)], hottest
    first."""
    paths = sorted(
        glob.glob(
            os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.Counter()
    cnt = collections.Counter()
    long_names = {}
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
            if e["name"] not in long_names and "args" in e:
                long_names[e["name"]] = e["args"].get("long_name", "")
    return [
        (us, cnt[name], name, long_names.get(name, ""))
        for name, us in agg.most_common(top)
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["llava16", "gqa8", "int4"],
                    default="llava16")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=16)
    ap.add_argument("--keep-trace", default=None,
                    help="directory to keep the trace in (default: tmp)")
    ap.add_argument("--w8a8-decode", action="store_true",
                    help="profile the int8-MXU decode-projection feed")
    ap.add_argument("--fuse-proj", action="store_true",
                    help="profile with fused qkv/gate_up weight leaves")
    args = ap.parse_args()

    import jax

    from bench import K8_PROBS, PROMPT_LEN, build_state, _fetch  # repo root
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.models.llava import LlavaParams
    from dropoutdecoding_tpu.models import llava as llava_mod
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        EnsembleConfig,
        GenerationConfig,
        LlamaConfig,
        LlavaConfig,
    )
    from dropoutdecoding_tpu.utils.synthetic import (
        synthetic_int4_lm,
        synthetic_int8_lm,
    )

    import jax.numpy as jnp

    if args.config == "int4":
        # single-stream greedy decode over the packed-int4 tower (the
        # bench "int4 greedy" line) — where does its 17 ms/token go?
        cfg = LlavaConfig(
            text=LlamaConfig(num_hidden_layers=args.layers),
            vision=ClipVisionConfig(),
        )
        B, prompt = 1, PROMPT_LEN
    elif args.config == "llava16":
        cfg = LlavaConfig(
            text=LlamaConfig(num_hidden_layers=args.layers),
            vision=ClipVisionConfig(),
        )
        B, prompt = 16, PROMPT_LEN
    else:
        cfg = LlavaConfig(
            text=LlamaConfig(
                num_key_value_heads=8,
                intermediate_size=14336,
                num_hidden_layers=args.layers,
            ),
            vision=ClipVisionConfig(image_size=756),
        )
        B, prompt = 8, cfg.vision.num_patches + 28

    if args.config == "int4":
        lm = synthetic_int4_lm(cfg.text, jax.random.key(0))
    else:
        lm = synthetic_int8_lm(cfg.text, jax.random.key(0))
    if args.fuse_proj:
        from dropoutdecoding_tpu.utils.quantize import fuse_projections

        lm = fuse_projections(lm)
    proto = llava_mod.init_params(
        LlavaConfig(text=cfg.text.__class__(num_hidden_layers=1),
                    vision=cfg.vision),
        jax.random.key(1), jnp.bfloat16,
    )
    params = LlavaParams(vision=proto.vision, projector=proto.projector, lm=lm)
    eng = LlavaEngine(
        cfg=cfg,
        params=params,
        ens=(EnsembleConfig() if args.config == "int4"
             else EnsembleConfig(voting_probs=K8_PROBS, fused_step=True)),
        gen=GenerationConfig(max_new_tokens=args.tokens, eos_token_id=-1,
                             pad_token_id=0),
        max_len=prompt + args.tokens,
        ensemble=args.config != "int4",
        seed=24,
        int8_kv=True,
        w8a8_decode=args.w8a8_decode,
    )
    state = build_state(eng, cfg, jax.random.key(2), B=B, prompt_len=prompt)
    _fetch(state.first_token)

    # the donated production dispatch (cache aliased in place)
    rest = state._replace(cache=None)
    tokens, _, fc = eng._decode_d(params, state.cache, rest)  # compile+warm
    _fetch(tokens[:, -1])
    t0 = time.perf_counter()
    tokens, _, fc = eng._decode_d(params, fc, rest)
    _fetch(tokens[:, -1])
    wall = time.perf_counter() - t0
    n_steps = args.tokens - 1
    print(f"wall {wall * 1000:.1f} ms for {n_steps} steps x {B} rows "
          f"=> {B * n_steps / wall:.1f} tok/s aggregate", file=sys.stderr)

    log_dir = args.keep_trace or tempfile.mkdtemp(prefix="ddtpu_prof_")
    with jax.profiler.trace(log_dir):
        tokens, _, fc = eng._decode_d(params, fc, rest)
        _fetch(tokens[:, -1])
    print(f"trace: {log_dir}", file=sys.stderr)

    print("== device op profile (total ms / exec count / op) ==")
    for us, n, name, long_name in trace_op_table(log_dir):
        print(f"{us / 1e3:9.2f} ms  x{n:5d}  {name[:60]}")
        if long_name:
            print(f"             {long_name[:140]}")


if __name__ == "__main__":
    main()
