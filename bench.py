"""Headline benchmark: LLaVA-1.5-7B dropout-decoding throughput on TPU.

Prints ONE JSON line:
  {"metric": "k3_ensemble_decode_tokens_per_sec", "value": ..., "unit":
   "tokens/s", "vs_baseline": ...}

vs_baseline = (our batched-ensemble decode throughput) / (throughput of the
reference's execution strategy emulated on the SAME hardware: K+1
sequential single-member forwards per token plus two full-KV-cache
materialized copies per step, mirroring reference llava.py:292,343's
``copy.deepcopy(past_key_values)``).  The reference itself records no
latency numbers (SURVEY.md §6), so its own strategy-on-TPU is the baseline.

Weights are synthetic (no checkpoints in this environment) at the real
LLaVA-1.5-7B architecture; layer count is reduced automatically if the
chip's HBM cannot hold full 7B bf16 + caches (the ratio metric is
depth-invariant: every strategy runs the same tower).
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def build(n_layers: int):
    import jax
    import jax.numpy as jnp

    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.models import llava as llava_mod
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        EnsembleConfig,
        GenerationConfig,
        LlamaConfig,
        LlavaConfig,
    )

    cfg = LlavaConfig(
        text=LlamaConfig(num_hidden_layers=n_layers),
        vision=ClipVisionConfig(),
    )
    params = llava_mod.init_params(cfg, jax.random.key(0), jnp.bfloat16)

    def mk(ensemble):
        return LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),  # K=3 (0.3, 0.5, 0.7)
            gen=GenerationConfig(max_new_tokens=DECODE_TOKENS, eos_token_id=-1,
                                 pad_token_id=0),
            max_len=576 + 64 + DECODE_TOKENS,
            ensemble=ensemble,
            seed=24,
        )

    return cfg, params, mk


DECODE_TOKENS = 32


def _fetch(x):
    """Force real execution: block_until_ready does not reliably block over
    the axon TPU tunnel, so timing must pull a value to the host."""
    return np.asarray(x)


def time_decode(engine, state, params, repeats=2):
    # warmup/compile + first (cold) execution
    tokens, _ = engine._decode(params, state)
    _fetch(tokens[:, -1])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        tokens, _ = engine._decode(params, state)
        _fetch(tokens[:, -1])
        best = min(best, time.perf_counter() - t0)
    return DECODE_TOKENS / best  # tokens/sec


def reference_style_step(engine, params, state):
    """One decode step the reference's way: K+1 sequential M=1 forwards,
    each preceded by a full cache copy (2 deepcopy equivalents per step:
    original + per-member, reference llava.py:292,343)."""
    import jax
    import jax.numpy as jnp

    from dropoutdecoding_tpu.models import llama as llama_mod

    cfg = engine.cfg
    K = engine.ens.k

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def step(params, cache_k, cache_v, cur_len, token):
        cache = llama_mod.KVCache(cache_k, cache_v)
        x = llama_mod.embed(params.lm, token)
        Smax = cache_k.shape[2]
        base = (jnp.arange(Smax)[None, :] < cur_len[:, None])[:, None, :]
        # "original_past_key_values = deepcopy(...)" — materialize a copy
        orig_k = cache_k + 0
        orig_v = cache_v + 0
        h0, k0, v0 = llama_mod.decode_step(params.lm, cfg.text, x[:, None], cur_len, cache, base)
        logits = llama_mod.lm_head(params.lm, h0)[:, 0]
        outs = [logits]
        for m in range(K):
            # per-member deepcopy + sequential forward
            ck = orig_k + 0
            cv = orig_v + 0
            member_cache = llama_mod.KVCache(ck, cv)
            hm, km, vm = llama_mod.decode_step(
                params.lm, cfg.text, x[:, None], cur_len, member_cache, base
            )
            outs.append(llama_mod.lm_head(params.lm, hm)[:, 0])
        nk = cache_k.at[:, jnp.arange(1), cur_len].set(km[:, :, 0])
        nv = cache_v.at[:, jnp.arange(1), cur_len].set(vm[:, :, 0])
        return nk, nv, jnp.argmax(outs[-1], -1).astype(jnp.int32)

    return step


def run_once(n_layers):
    cfg, params, mk = build(n_layers)
    input_ids = np.array(
        [[1] + list(range(4, 20)) + [cfg.image_token_index] + list(range(20, 36))],
        np.int32,
    )
    pixels = np.random.default_rng(0).normal(size=(1, 3, 336, 336)).astype(np.float32)

    greedy_engine = mk(False)
    state = greedy_engine.prefill(input_ids, pixels)
    _fetch(state.first_token)
    greedy_tps = time_decode(greedy_engine, state, params)
    print(f"greedy: {greedy_tps:.2f} t/s", file=sys.stderr, flush=True)
    del greedy_engine

    ens_engine = mk(True)
    ens_tps = time_decode(ens_engine, state, params)
    print(f"ensemble K=3: {ens_tps:.2f} t/s", file=sys.stderr, flush=True)

    # reference-style sequential emulation
    step = reference_style_step(ens_engine, params, state)
    ck, cv = state.cache.k + 0, state.cache.v + 0
    cur = state.cur_len
    tok = state.first_token
    ck, cv, tok = step(params, ck, cv, cur, tok)  # compile + cold run
    _fetch(tok)
    t0 = time.perf_counter()
    n_steps = 4
    for i in range(n_steps):
        ck, cv, tok = step(params, ck, cv, cur + 1 + i, tok)
        _fetch(tok)
    ref_tps = n_steps / (time.perf_counter() - t0)
    print(f"reference-style: {ref_tps:.2f} t/s", file=sys.stderr, flush=True)
    return greedy_tps, ens_tps, ref_tps


def main():
    import gc

    import jax

    n_layers = 32
    result = None
    while n_layers >= 4:
        try:
            result = run_once(n_layers)
            break
        except Exception as e:  # OOM fallback: halve depth
            if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
                print(
                    f"OOM at {n_layers} layers; retrying with {n_layers // 2}",
                    file=sys.stderr, flush=True,
                )
                n_layers //= 2
                # drop device buffers still referenced by the exception
                # frames / jit caches before retrying
                jax.clear_caches()
                gc.collect()
                continue
            raise
    if result is None:
        raise RuntimeError("could not fit model")
    greedy_tps, ens_tps, ref_tps = result

    ratio_vs_greedy = ens_tps / greedy_tps
    print(
        f"layers={n_layers} greedy={greedy_tps:.2f} t/s "
        f"ensembleK3={ens_tps:.2f} t/s (={ratio_vs_greedy:.2f}x greedy) "
        f"reference-style={ref_tps:.2f} t/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "k3_ensemble_decode_tokens_per_sec",
                "value": round(ens_tps, 3),
                "unit": "tokens/s",
                "vs_baseline": round(ens_tps / ref_tps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
