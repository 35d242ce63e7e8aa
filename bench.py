"""Headline benchmark: LLaVA-1.5-7B dropout-decoding throughput on TPU.

Prints ONE JSON line:
  {"metric": "k3_ensemble_decode_tokens_per_sec", "value": ..., "unit":
   "tokens/s", "vs_baseline": ...}

vs_baseline = (our batched-ensemble decode throughput) / (throughput of the
reference's execution strategy emulated on the SAME hardware and weights:
K+1 sequential single-member forwards per token plus two full-KV-cache
materialized copies per step, mirroring reference llava.py:292,343's
``copy.deepcopy(past_key_values)``).  The reference records no latency
numbers (SURVEY.md §6), so its own strategy-on-TPU is the baseline.

Configuration (round 2): FULL 7B depth (BENCH_LAYERS=32 default) with
int8 weights + int8 KV cache — the deployment config that fits a 16 GB
v5e chip (bf16 7B weights alone are ~13.5 GB).  All compared strategies
(greedy / exact K=3 / fused K=3 / reference-style) run the identical
int8 tower, so ratios compare execution strategies, not precisions.

Method notes for this environment:
- weights are synthetic (no checkpoints in the container) at exact
  LLaVA-1.5-7B shapes; int8 weights are generated directly in int8 so the
  bf16 tower never materializes in HBM;
- the benchmark state (prompt KV cache, uncertainty, projection tables) is
  constructed directly so only the decode-path programs compile; prefill
  (vision tower + merge + LM + uncertainty kernel) is timed separately in
  the default run, which also gives the POPE fast path (answer = argmax of
  the prompt's last logits, reference pope_test.py:239-242);
- `block_until_ready` does not reliably block over the tunnel, so timings
  force a host fetch;
- rates are steady-state: one whole-decode dispatch (64 tokens in a single
  while_loop program) minus the measured fixed dispatch+fetch round-trip
  (~20 ms over the tunnel; linearity of wall time vs token count verified
  separately — intercept == the trivial-program round-trip);
- roofline: decode at B<=K+1 is HBM-bound; speed-of-light tokens/s =
  HBM_BW / bytes_streamed_per_token (weights + cache per compiled step
  program).  v5e assumed: 819 GB/s HBM, 197 TFLOP/s bf16 (override with
  BENCH_HBM_GBPS / BENCH_PEAK_TFLOPS).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

T_START = time.perf_counter()
DECODE_TOKENS = int(os.environ.get("BENCH_DECODE_TOKENS", "64"))
PROMPT_LEN = 576 + 32  # visual span + text
K = 3
K8_PROBS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)
HBM_BW = float(os.environ.get("BENCH_HBM_GBPS", "819")) * 1e9
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12

# Wall-clock budget (round-4 verdict item 1b): the headline block always
# runs; every section after it first checks the remaining budget against
# its own worst-case COLD cost and prints "<name> skipped: budget"
# instead of risking the driver's timeout.  With the persistent
# compilation cache warm (below) the whole file fits comfortably.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))


def _elapsed():
    return time.perf_counter() - T_START


_CACHE_DIR = os.environ.get(
    "BENCH_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)


def _fingerprint(n_layers: int) -> str:
    return f"L{n_layers}-T{DECODE_TOKENS}"


def _cache_warm(n_layers: int) -> bool:
    """True when the persistent XLA compile cache plausibly covers this
    file's programs AT THIS CONFIGURATION (round-5 verdict item 1b: the
    cold-cost estimates were stale on a warm cache and budget-starved
    exactly the family-coverage sections).  Entry count alone is not
    enough: a cache populated at BENCH_LAYERS=32 does not cover a
    BENCH_LAYERS=16 run (or main()'s OOM-fallback halving), and admitting
    sections at warm cost while every program compiles cold overruns the
    budget — the fingerprint file written after each successful run keys
    warmth to (n_layers, decode_tokens)."""
    try:
        if len(os.listdir(_CACHE_DIR)) < 40:
            return False
        with open(os.path.join(_CACHE_DIR, "BENCH_FPR")) as f:
            return f.read().strip() == _fingerprint(n_layers)
    except OSError:
        return False


def _mark_cache_warm(n_layers: int):
    try:
        with open(os.path.join(_CACHE_DIR, "BENCH_FPR"), "w") as f:
            f.write(_fingerprint(n_layers))
    except OSError:
        pass


# set per-configuration in main(); module default is the conservative one
WARM = False


def _need(name: str, cold_s: float, warm_s: float | None = None):
    """Raise (caught by the section's except) when the remaining budget
    cannot cover the section's cost.  ``warm_s`` is the measured cost with
    the persistent compile cache populated (compile ~1 s/program instead
    of ~30 s); used whenever the cache dir looks warm."""
    s = warm_s if (WARM and warm_s is not None) else cold_s
    if _elapsed() + s > BUDGET_S:
        raise RuntimeError(
            f"budget ({_elapsed():.0f}s elapsed + ~{s:.0f}s > {BUDGET_S:.0f}s)"
        )

def _enable_compile_cache():
    """Persistent XLA compilation cache: over the axon tunnel the FIRST
    trivial program costs 70-260 s (backend/program init) and every
    whole-decode program ~30 s; with the disk cache both are ~1 s on any
    later cold process.  Measured 2026-08-19: first-program 262 s -> 1.4 s.
    Harmless if unsupported."""
    import jax

    try:
        cache_dir = _CACHE_DIR
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        print(f"compile cache unavailable: {e}", file=sys.stderr)


def _fetch(x):
    return np.asarray(x)


# synthetic production-shape weights live in the package (shared with
# cli/fused_gap.py's 7B-shape study)
from dropoutdecoding_tpu.utils.synthetic import synthetic_int8_lm  # noqa: E402


def build_state(engine, cfg, key, B=1, prompt_len=None):
    """Synthetic post-prefill state with realistic shapes/dtypes.

    One jitted program per (B, shape) config: the round-3 op-by-op
    construction paid a compile + tunnel dispatch per leaf (~40 s at the
    7B shape)."""
    import jax
    import jax.numpy as jnp

    from dropoutdecoding_tpu.engine.generate import PrefillState
    from dropoutdecoding_tpu.models import llama as llama_mod

    if prompt_len is None:
        prompt_len = PROMPT_LEN
    N = cfg.vision.num_patches
    V = cfg.text.vocab_size
    Smax = engine.max_len
    shape = (
        cfg.text.num_hidden_layers, B, Smax,
        cfg.text.num_key_value_heads, cfg.text.head_dim,
    )
    int8_kv = engine.int8_kv

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 6)
        if int8_kv:
            # generate the synthetic cache directly in int8 layout: no bf16
            # transient (at B=16 x 7B the bf16 K+V would be ~5 GB)
            def leaf(k):
                # int8 cache layout (models/llama.KVCache): q head-flattened
                # [L,B,S,KH*D], scales head-major [L,B,KH,S]
                return {
                    "q": jax.lax.bitcast_convert_type(
                        jax.random.bits(
                            k, shape[:3] + (shape[3] * shape[4],), jnp.uint8
                        ),
                        jnp.int8,
                    ),
                    "s": jnp.full(
                        (shape[0], shape[1], shape[3], shape[2]),
                        1.0 / 127,
                        jnp.float32,
                    ),
                }

            cache = llama_mod.KVCache(leaf(ks[0]), leaf(ks[1]))
        else:
            cache = llama_mod.KVCache(
                jax.random.normal(ks[0], shape, jnp.bfloat16),
                jax.random.normal(ks[1], shape, jnp.bfloat16),
            )
        return PrefillState(
            cache=cache,
            cur_len=jnp.full((B,), prompt_len, jnp.int32),
            last_logits=jax.random.normal(ks[2], (B, V), jnp.float32),
            first_token=jnp.full((B,), 7, jnp.int32),
            epis=jax.random.gamma(ks[3], 2.0, (B, N)).astype(jnp.float32),
            topk_ids=jax.random.randint(ks[4], (B, N, 5), 0, V),
            # [B, N, 1] stub mirrors engine.kl_logits_or_stub for
            # non-epis_kl policies (the full [B, N, V] fp32 buffer is
            # 1.2 GB at B=16)
            image_logits=jnp.zeros((B, N, 1), jnp.float32),
            image_pos=jnp.full((B,), 5, jnp.int32),
            visual_mask=jnp.ones((B, N), bool),
            probe_ids=jnp.full((B, 8), -1, jnp.int32),
            rng_id=jnp.arange(B, dtype=jnp.int32),
            uncertainty={},
        )

    return gen(key)


def measure_dispatch_overhead():
    """Fixed per-dispatch cost (program launch + host fetch).  Over the
    axon tunnel this is ~20 ms — material against a decode window, so the
    steady-state rates subtract it.  Measured with a trivial program whose
    device time is ~0."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8,), jnp.float32)
    _fetch(tiny(z))  # compile
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        _fetch(tiny(z))
        best = min(best, time.perf_counter() - t0)
    return best


def time_decode(engine, state, params, overhead=0.0, repeats=2):
    """Steady-state decode tokens/s: wall time for one whole-decode
    program (DECODE_TOKENS steps in a single while_loop dispatch) minus
    the fixed dispatch overhead.  Linearity checked empirically: decode
    wall time vs token count fits a + b*T with a == the trivial-program
    round-trip measured above (see DESIGN.md round-2 notes)."""
    # the donated entry (the production generate() path): the cache input
    # buffer aliases the returned final cache instead of being copied at
    # dispatch entry (8.2 ms + 5.4 GB at the batch-16 int8 stretch shape).
    # Donate a working COPY of the cache (one-time cost, outside the timed
    # window) so the caller's state stays reusable across engines, and
    # thread the returned final cache into the next timing rep.
    import jax

    rest = state._replace(cache=None)
    fc = jax.tree.map(lambda a: a.copy(), state.cache)
    tokens, _, fc = engine._decode_d(params, fc, rest)
    _fetch(tokens[:, -1])  # cold run
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        tokens, _, fc = engine._decode_d(params, fc, rest)
        _fetch(tokens[:, -1])
        best = min(best, time.perf_counter() - t0)
    del fc
    # The dispatch runs max_new_tokens-1 decode steps: tokens_buf[:, 0] is
    # the prefill's argmax and the while_loop starts at step index 1
    # (engine/generate.py:472-486).  Divide by the steps actually timed.
    n_tokens = engine.gen.max_new_tokens - 1
    ov = min(overhead, best / 2)  # never correct away >half the window
    return n_tokens / (best - ov)


def reference_style_step(engine, params):
    """One decode step the reference's way: K+1 sequential M=1 forwards,
    each preceded by a full cache copy (2 deepcopy equivalents per step,
    reference llava.py:292,343).  Runs the same int8 weights; the copied
    caches are the bf16 layout the reference deepcopies.

    The emulation must stay un-optimizable, or the baseline silently
    measures OUR fused strategy instead of the reference's: the
    reference's K member forwards run DIFFERENT masked embeddings, so
    each member here multiplies x by a distinct per-member factor (K
    identical pure forwards would CSE into one — observed once the
    layered-attention rework made decode_step CSE-friendly: the
    "emulation" jumped 9.4 -> 55 t/s), every member's logits feed the
    output (the reference votes over all of them; dead logits would DCE
    the forwards), and the deepcopy copies sit behind
    ``optimization_barrier`` (a copy only ever read would otherwise be
    elided into an alias, costing nothing)."""
    import jax
    import jax.numpy as jnp

    from dropoutdecoding_tpu.models import llama as llama_mod

    cfg = engine.cfg

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def step(params, cache_k, cache_v, cur_len, token):
        cache = llama_mod.KVCache(cache_k, cache_v)
        x = llama_mod.embed(params.lm, token)
        Smax = cache_k.shape[2]
        base = (jnp.arange(Smax)[None, :] < cur_len[:, None])[:, None, :]
        # "original_past_key_values = deepcopy(...)"
        orig_k = jax.lax.optimization_barrier(cache_k + 0)
        orig_v = jax.lax.optimization_barrier(cache_v + 0)
        h0, _, _ = llama_mod.decode_step(
            params.lm, cfg.text, x[:, None], cur_len, cache, base
        )
        # the unmasked logits build the mask in the reference — live
        logits_sum = llama_mod.lm_head(params.lm, h0)[:, 0]
        km = vm = None
        for m in range(K):
            ck = jax.lax.optimization_barrier(orig_k + 0)  # member deepcopy
            cv = jax.lax.optimization_barrier(orig_v + 0)
            member_cache = llama_mod.KVCache(ck, cv)
            # distinct member input (the reference zeroes a per-member
            # set of visual-token embeddings)
            xm = x * jnp.asarray(1.0 - 1e-3 * (m + 1), x.dtype)
            hm, km, vm = llama_mod.decode_step(
                params.lm, cfg.text, xm[:, None], cur_len, member_cache, base
            )
            logits = llama_mod.lm_head(params.lm, hm)[:, 0]
            logits_sum = logits_sum + logits  # every member is voted over
        nk = cache_k.at[:, jnp.arange(1), cur_len].set(km[:, :, 0])
        nv = cache_v.at[:, jnp.arange(1), cur_len].set(vm[:, :, 0])
        # aggregate over ALL member logits (reference select_by_average):
        # every forward's result is genuinely live in the output token
        return nk, nv, jnp.argmax(logits_sum, -1).astype(jnp.int32)

    return step


def _tree_bytes(tree):
    import jax

    return sum(x.nbytes for x in jax.tree.leaves(tree))


def roofline_report(params, cache, greedy_tps, ens_tps, fused_tps, n_layers):
    """HBM roofline + MFU for the measured decode modes (v5e defaults)."""
    lm = params.lm
    stream_w = _tree_bytes(lm) - lm["embed_tokens"].nbytes  # embed: 1-row gather
    cache_b = _tree_bytes(cache)
    # weight params actually multiplied per member-forward (for FLOPs)
    n_wparams = sum(
        np.prod(w["q"].shape) if isinstance(w, dict) else np.prod(w.shape)
        for name, w in list(lm["layers"].items()) + [("lm_head", lm["lm_head"])]
        if name not in ("input_ln", "post_attn_ln")
    )
    modes = {
        # (tps, programs-per-token, members-per-program)
        "greedy": (greedy_tps, 1, 1),
        "exactK3": (ens_tps, 2, (1, K)),
        "fusedK3": (fused_tps, 1, K + 1),
    }
    lines = []
    for name, (tps, progs, members) in modes.items():
        bytes_tok = progs * (stream_w + cache_b)
        sol = HBM_BW / bytes_tok
        m_total = sum(members) if isinstance(members, tuple) else members
        flops_tok = 2.0 * n_wparams * m_total
        mfu = tps * flops_tok / PEAK_FLOPS
        lines.append(
            f"{name}: {tps:.1f} t/s = {100 * tps / sol:.0f}% of HBM roofline "
            f"({sol:.1f} t/s @ {bytes_tok / 1e9:.2f} GB/token), "
            f"MFU {100 * mfu:.2f}%"
        )
    print(
        f"roofline (layers={n_layers}, BW={HBM_BW / 1e9:.0f} GB/s, "
        f"peak={PEAK_FLOPS / 1e12:.0f} TFLOP/s):\n  " + "\n  ".join(lines),
        file=sys.stderr, flush=True,
    )


def run_once(n_layers):
    import jax
    import jax.numpy as jnp

    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.models.llava import LlavaParams
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        EnsembleConfig,
        GenerationConfig,
        LlavaConfig,
    )

    cfg = LlavaConfig(
        text=LlavaConfig().text.__class__(num_hidden_layers=n_layers),
        vision=ClipVisionConfig(),
    )
    key = jax.random.key(0)
    lm = synthetic_int8_lm(cfg.text, key)
    from dropoutdecoding_tpu.models import llava as llava_mod

    # vision + projector stay bf16 (one prefill pass; tiny next to the
    # LM).  jit the whole init into ONE program: op-by-op it pays a
    # compile + tunnel dispatch per leaf (~88 s in round 3).
    proto_cfg = LlavaConfig(
        text=cfg.text.__class__(num_hidden_layers=1), vision=cfg.vision
    )
    proto = jax.jit(
        lambda k: llava_mod.init_params(proto_cfg, k, jnp.bfloat16)
    )(jax.random.key(1))
    params = LlavaParams(vision=proto.vision, projector=proto.projector, lm=lm)
    _fetch(params.lm["norm"])
    print(f"setup done at {_elapsed():.0f}s", file=sys.stderr, flush=True)

    def mk(ensemble, tokens=DECODE_TOKENS, **kw):
        e = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(
                max_new_tokens=tokens, eos_token_id=-1, pad_token_id=0
            ),
            max_len=PROMPT_LEN + tokens,
            ensemble=ensemble,
            seed=24,
            int8_kv=True,
            **kw,
        )
        return e

    ens_engine = mk(True)
    state = build_state(ens_engine, cfg, jax.random.key(1))
    _fetch(state.first_token)

    ov = measure_dispatch_overhead()
    print(f"dispatch overhead: {ov * 1000:.1f} ms", file=sys.stderr, flush=True)

    greedy_engine = mk(False)
    greedy_tps = time_decode(greedy_engine, state, params, ov)
    print(f"int8 greedy: {greedy_tps:.2f} t/s", file=sys.stderr, flush=True)

    ens_tps = time_decode(ens_engine, state, params, ov)
    print(
        f"int8 ensemble K=3 (exact): {ens_tps:.2f} t/s "
        f"(={greedy_tps / ens_tps:.2f}x greedy latency)",
        file=sys.stderr, flush=True,
    )

    # reference-style emulation (same int8 weights, bf16 cache copies)
    step = reference_style_step(ens_engine, params)
    ck = jax.random.normal(
        jax.random.key(9),
        (n_layers, 1, PROMPT_LEN + DECODE_TOKENS,
         cfg.text.num_key_value_heads, cfg.text.head_dim),
        jnp.bfloat16,
    )
    cv = ck + 0
    cur = state.cur_len
    tok = state.first_token
    ck, cv, tok = step(params, ck, cv, cur, tok)  # compile + cold run
    _fetch(tok)
    # the reference-style loop pays one dispatch per step; subtract the
    # tunnel's fixed cost from each so the ratio reflects device time.
    # Per-step timing over the tunnel is noisy (one RTT per sample), so
    # take the best of several 4-step windows rather than one shot.
    n_steps = 4
    best_ref = float("inf")
    pos = 0
    for _rep in range(3):
        t0 = time.perf_counter()
        for i in range(n_steps):
            ck, cv, tok = step(params, ck, cv, cur + 1 + pos, tok)
            _fetch(tok)
            pos += 1
        best_ref = min(best_ref, time.perf_counter() - t0)
    ref_tps = n_steps / max(best_ref - n_steps * ov, best_ref / 2)
    del ck, cv
    print(f"reference-style: {ref_tps:.2f} t/s", file=sys.stderr, flush=True)

    # HEADLINE JSON goes out as soon as the core three measurements exist,
    # so a driver-side timeout during the extras below cannot lose it.
    # main() RE-prints the same line as the very last output: BENCH_r04's
    # `parsed` was null because ~25 section lines followed this one and the
    # driver extracts the JSON from the captured tail (round-5 item 1a).
    headline = {
        "metric": "k3_ensemble_decode_tokens_per_sec",
        "value": round(ens_tps, 3),
        "unit": "tokens/s",
        "vs_baseline": round(ens_tps / ref_tps, 3),
        "decode_tokens": DECODE_TOKENS,
        "dispatch_overhead_ms": round(ov * 1000, 1),
    }
    if os.environ.get("BENCH_FORCE_CPU"):
        # a structural smoke's numbers are host-CPU rates — mark them
        # in-band so a tail-parsing driver can never mistake them for an
        # on-chip record (symmetric with the stale-emission marker)
        headline["force_cpu"] = True
    print(json.dumps(headline), flush=True)

    # fused single-stream mode (lagged overlap; EnsembleConfig.fused_step)
    from dropoutdecoding_tpu.utils.config import EnsembleConfig as _EC

    fused_engine = mk(True)
    fused_engine.ens = _EC(fused_step=True)
    fused_engine.__post_init__()
    fused_tps = time_decode(fused_engine, state, params, ov)
    print(
        f"int8 ensemble K=3 (fused): {fused_tps:.2f} t/s "
        f"(={fused_tps / greedy_tps:.2f}x greedy throughput)",
        file=sys.stderr, flush=True,
    )

    roofline_report(params, state.cache, greedy_tps, ens_tps, fused_tps, n_layers)

    # K=8 SINGLE-STREAM lines (BASELINE.json #5 is phrased in this exact
    # config: "K=8 ... <= 1.5x vanilla greedy latency per caption").
    # Same B=1 state as the headline K=3 lines, K=8 prob ladder; latency
    # ratio = greedy_tps / k8_tps (per-token steady state).
    try:
        _need("K=8 single-stream", 80, 35)
        k8e = mk(True)
        k8e.ens = _EC(voting_probs=K8_PROBS, fused_step=False)
        k8e.__post_init__()
        k8_exact_tps = time_decode(k8e, state, params, ov)
        print(
            f"K=8 single-stream exact: {k8_exact_tps:.2f} t/s "
            f"(= {greedy_tps / k8_exact_tps:.2f}x greedy latency)",
            file=sys.stderr, flush=True,
        )
        del k8e
        k8f = mk(True)
        k8f.ens = _EC(voting_probs=K8_PROBS, fused_step=True)
        k8f.__post_init__()
        k8_fused_tps = time_decode(k8f, state, params, ov)
        print(
            f"K=8 single-stream fused: {k8_fused_tps:.2f} t/s "
            f"(= {greedy_tps / k8_fused_tps:.2f}x greedy latency)",
            file=sys.stderr, flush=True,
        )
        del k8f
    except Exception as e:
        print(f"K=8 single-stream skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    # int4 weight-only deployment (--quantize int4): group-wise (g=128)
    # packed 4-bit projections, int8 lm_head + int8 KV.  Decode is HBM-bound on
    # the weight stream, so halving the int8 stream again is the single
    # biggest remaining decode lever (~3.5 GB/token vs 6.8).  Runs last:
    # the int4 tower replaces the freed int8/Mistral weights on the chip.
    try:
        _need("int4 tier", 110, 50)
        from dropoutdecoding_tpu.utils.synthetic import synthetic_int4_lm

        # fused qkv/gate_up leaves (generated directly in fused layout —
        # no concat transient): 4 layered-kernel calls per layer instead
        # of 7, each ~5 us of per-call overhead at 0.3-1.4 ms of stream
        # (cli/int4_probe.py round-5 measurements)
        lm4 = synthetic_int4_lm(cfg.text, jax.random.key(12), fused=True)
        proto4 = jax.jit(
            lambda k: llava_mod.init_params(proto_cfg, k, jnp.bfloat16)
        )(jax.random.key(13))
        params4 = LlavaParams(
            vision=proto4.vision, projector=proto4.projector, lm=lm4
        )
        _fetch(params4.lm["norm"])

        def mk4(ensemble, tokens=DECODE_TOKENS, **kw):
            return LlavaEngine(
                cfg=cfg,
                params=params4,
                ens=EnsembleConfig(),
                gen=GenerationConfig(
                    max_new_tokens=tokens, eos_token_id=-1, pad_token_id=0
                ),
                max_len=PROMPT_LEN + tokens,
                ensemble=ensemble,
                seed=24,
                int8_kv=True,
                **kw,
            )

        g4 = mk4(False)
        state4 = build_state(g4, cfg, jax.random.key(14))
        _fetch(state4.first_token)
        greedy4_tps = time_decode(g4, state4, params4, ov)
        print(
            f"int4 greedy: {greedy4_tps:.2f} t/s "
            f"(= {greedy4_tps / greedy_tps:.2f}x int8 greedy)",
            file=sys.stderr, flush=True,
        )
        del g4

        f4 = mk4(True)
        f4.ens = _EC(fused_step=True)
        f4.__post_init__()
        fused4_tps = time_decode(f4, state4, params4, ov)
        print(
            f"int4 ensemble K=3 (fused): {fused4_tps:.2f} t/s "
            f"(= {greedy4_tps / fused4_tps:.2f}x int4 greedy latency)",
            file=sys.stderr, flush=True,
        )
        del f4

        k8f4 = mk4(True)
        k8f4.ens = _EC(voting_probs=K8_PROBS, fused_step=True)
        k8f4.__post_init__()
        k8_fused4_tps = time_decode(k8f4, state4, params4, ov)
        print(
            f"int4 K=8 single-stream fused: {k8_fused4_tps:.2f} t/s "
            f"(= {greedy4_tps / k8_fused4_tps:.2f}x int4 greedy latency; "
            f"{greedy_tps / k8_fused4_tps:.2f}x int8 greedy latency)",
            file=sys.stderr, flush=True,
        )
        del k8f4

        # int4 roofline: packed weights = 0.5 B/param + fp32 group scales
        lm_b = _tree_bytes(lm4) - lm4["embed_tokens"].nbytes
        cache_b = _tree_bytes(state4.cache)
        sol4 = HBM_BW / (lm_b + cache_b)
        print(
            f"int4 roofline: greedy {greedy4_tps:.1f} t/s = "
            f"{100 * greedy4_tps / sol4:.0f}% of {sol4:.1f} t/s "
            f"(@ {(lm_b + cache_b) / 1e9:.2f} GB/token)",
            file=sys.stderr, flush=True,
        )
        import gc

        del state4, params4, lm4, proto4
        gc.collect()
    except Exception as e:
        print(f"int4 section skipped: {type(e).__name__}: {e}", file=sys.stderr)
    # speculative greedy with the NGRAM (prompt-lookup) draft: zero extra
    # weight streams — cycle cost is ONE verify extend (~= one greedy
    # step at B=1), so any bigram-repeat acceptance beats greedy, and the
    # output is exactly the greedy sequence (engine/speculative.py;
    # round-4 verdict item 5).  Greedy decode on this tower loops, as
    # greedy captioning does; alpha is workload-dependent and reported.
    try:
        _need("speculative ngram", 70, 40)
        from dropoutdecoding_tpu.engine.speculative import SpeculativeGreedy

        GAM = 4
        spec_eng = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(
                max_new_tokens=DECODE_TOKENS, eos_token_id=-1, pad_token_id=0
            ),
            # verify appends GAM rows past prompt+T (_check_headroom)
            max_len=PROMPT_LEN + DECODE_TOKENS + GAM + 1,
            ensemble=False,
            seed=24,
            int8_kv=True,
        )
        spec = SpeculativeGreedy(
            engine=spec_eng, draft_lm=None, gamma=GAM, draft="ngram"
        )
        fused_ng = jax.jit(
            spec._generate_fused_ngram_impl, donate_argnums=(1, 4)
        )
        st_ng = build_state(spec_eng, cfg, jax.random.key(21))
        buf0 = jnp.full((DECODE_TOKENS + GAM + 1,), 0, jnp.int32)
        buf0 = buf0.at[0].set(st_ng.first_token[0])

        def run_ng():
            fc = jax.tree.map(lambda a: a.copy(), st_ng.cache)
            t0 = time.perf_counter()
            buf, n_out, iters, _ = fused_ng(
                params, fc, st_ng.cur_len, st_ng.first_token, buf0 + 0
            )
            n, it = int(_fetch(n_out)), int(_fetch(iters))
            return n, it, time.perf_counter() - t0

        run_ng()  # compile + cold
        n_tok, n_cyc, wall = min(
            (run_ng() for _ in range(2)), key=lambda r: r[2]
        )
        ng_tps = n_tok / max(wall - ov, wall / 2)
        print(
            f"speculative ngram-draft gamma={GAM} (worst case: random "
            f"tower, no stream repetition): {ng_tps:.2f} t/s "
            f"(= {ng_tps / greedy_tps:.2f}x greedy throughput, "
            f"{n_tok / max(n_cyc, 1):.2f} tok/cycle over {n_cyc} cycles; "
            f"exact greedy output)",
            file=sys.stderr, flush=True,
        )

        # STRUCTURED-REPETITION workload (round-5 verdict item 4): same
        # full 7B int8 verify tower and unchanged speculative machinery,
        # but greedy decode on THIS tower is engineered to be periodic —
        # each cycle token's embedding row is overwritten with a large
        # multiple of the NEXT cycle token's lm_head column, so the
        # pre-norm residual stream stays dominated by the embedding and
        # greedy argmax walks the period-8 cycle deterministically.  This
        # is the honest analogue of captioning text repeating n-grams
        # (vLLM's ngram speculator wins on exactly such streams); the line
        # above is the adversarial zero-repetition floor.  Output remains
        # exactly this tower's greedy sequence.
        CYC = jnp.arange(100, 108)

        @jax.jit
        def engineer(emb, head):
            nxt = jnp.roll(CYC, -1)
            cols = head["q"][:, nxt].astype(jnp.float32).T
            cols = cols * head["s"][0, nxt][:, None]
            cols = cols / jnp.linalg.norm(cols, axis=1, keepdims=True)
            return emb.at[CYC].set((3000.0 * cols).astype(emb.dtype))

        lm_rep = dict(params.lm)
        lm_rep["embed_tokens"] = engineer(
            params.lm["embed_tokens"], params.lm["lm_head"]
        )
        params_rep = LlavaParams(
            vision=params.vision, projector=params.projector, lm=lm_rep
        )
        first_rep = jnp.full((1,), int(CYC[0]), jnp.int32)
        buf_rep = buf0.at[0].set(first_rep[0])

        def run_rep():
            fc = jax.tree.map(lambda a: a.copy(), st_ng.cache)
            t0 = time.perf_counter()
            buf, n_out, iters, _ = fused_ng(
                params_rep, fc, st_ng.cur_len, first_rep, buf_rep + 0
            )
            n, it = int(_fetch(n_out)), int(_fetch(iters))
            return n, it, time.perf_counter() - t0

        run_rep()  # warm (identical program shapes: no recompile)
        n_tok, n_cyc, wall = min(
            (run_rep() for _ in range(2)), key=lambda r: r[2]
        )
        rep_tps = n_tok / max(wall - ov, wall / 2)
        print(
            f"speculative ngram-draft gamma={GAM}, repeat-structured "
            f"workload (synthetic period-8 stream, full 7B verify tower): "
            f"{rep_tps:.2f} t/s (= {rep_tps / greedy_tps:.2f}x greedy "
            f"throughput, {n_tok / max(n_cyc, 1):.2f} tok/cycle over "
            f"{n_cyc} cycles)",
            file=sys.stderr, flush=True,
        )
        del params_rep, lm_rep
        del spec, spec_eng, st_ng, fused_ng
    except Exception as e:
        print(f"speculative ngram skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    # GQA long-context decode (LLaVA-NeXT semantics: Mistral-7B tower with
    # KH=8, ~2.9k visual tokens, continuous-batching batch of 8) — the
    # path served by the fused Pallas int8 ensemble attention
    # (ops/pallas_decode_attention.py; XLA's repeat_kv would expand the
    # int8 cache 4x in bf16 every layer here).
    # free EVERYTHING llava-sized before the Mistral-shaped sections —
    # both 7B weight sets never coexist on the 16 GB chip.  (exec/del
    # tricks don't touch function locals; spell the dels out.)  This and
    # the shared tower build live OUTSIDE the section tries so the NeXT
    # POPE block still runs when the GQA decode section is budget-skipped.
    import gc

    del state, greedy_engine, ens_engine, fused_engine, params, lm
    del proto
    try:
        del step
    except NameError:
        pass
    try:
        del k8e  # K=8 single-stream engine (state16/k8 are stretch-only,
        # defined AFTER this point)
    except NameError:
        pass
    # (st/stq/e8 belong to the prefill/POPE and serving sections, which
    # now run AFTER this point — round-5 family-first reorder)
    # spec/int4 locals survive their sections when those raised mid-way
    # (the in-section dels never ran); drop them here or the Mistral
    # tower build below can OOM against a stranded cache/tower
    # per-name try-dels: `del a, b` aborts at the first unbound name,
    # which would strand the later ones after a mid-section exception
    # (and exec("del x") cannot touch function locals — see above)
    try:
        del spec
    except NameError:
        pass
    try:
        del spec_eng
    except NameError:
        pass
    try:
        del st_ng
    except NameError:
        pass
    try:
        del fused_ng
    except NameError:
        pass
    try:
        del params_rep
    except NameError:
        pass
    try:
        del lm_rep
    except NameError:
        pass
    try:
        del state4
    except NameError:
        pass
    try:
        del params4
    except NameError:
        pass
    try:
        del lm4
    except NameError:
        pass
    try:
        del proto4
    except NameError:
        pass
    gc.collect()

    from dropoutdecoding_tpu.utils.config import LlamaConfig as _LC

    ncfg = LlavaConfig(
        text=_LC(
            num_key_value_heads=8,
            intermediate_size=14336,
            num_hidden_layers=n_layers,
        ),
        vision=ClipVisionConfig(image_size=756),  # 54x54 = 2916 patches
    )
    # shared Mistral-GQA int8 tower (the NeXT LM: identical shapes;
    # rope_theta is runtime, not a weight) — built once for BOTH the GQA
    # decode and NeXT POPE sections (round-4 verdict 1c: one tower, not
    # two)
    nlm = None
    if _elapsed() + (20 if WARM else 60) <= BUDGET_S:
        nlm = synthetic_int8_lm(ncfg.text, jax.random.key(3))

    try:
        _need("llavanext-shape config", 90, 40)
        if nlm is None:
            raise RuntimeError("budget (no tower)")
        nproto = jax.jit(
            lambda k: llava_mod.init_params(
                LlavaConfig(
                    text=ncfg.text.__class__(num_hidden_layers=1),
                    vision=ncfg.vision,
                ),
                k,
                jnp.bfloat16,
            )
        )(jax.random.key(4))
        nparams = LlavaParams(
            vision=nproto.vision, projector=nproto.projector, lm=nlm
        )
        _fetch(nparams.lm["norm"])
        T_next = 16
        B_next = 8
        prompt_next = ncfg.vision.num_patches + 28
        eng = LlavaEngine(
            cfg=ncfg,
            params=nparams,
            ens=_EC(voting_probs=K8_PROBS, fused_step=True),
            gen=GenerationConfig(
                max_new_tokens=T_next, eos_token_id=-1, pad_token_id=0
            ),
            max_len=prompt_next + T_next,
            ensemble=True,
            seed=506,
            int8_kv=True,
        )
        nstate = build_state(
            eng, ncfg, jax.random.key(5), B=B_next, prompt_len=prompt_next
        )
        _fetch(nstate.first_token)
        per_stream = time_decode(eng, nstate, nparams, ov)
        print(
            f"llavanext-shape batch{B_next} x K=8 fused (Mistral GQA, "
            f"S={prompt_next}): {per_stream * B_next:.2f} total tokens/s "
            f"({per_stream:.2f} t/s per caption stream)",
            file=sys.stderr, flush=True,
        )
    except Exception as e:
        print(
            f"llavanext-shape config skipped: {type(e).__name__}: {e}",
            file=sys.stderr,
        )

    # batched POPE at the REAL LLaVA-NeXT shape (round-3 verdict item 3:
    # a batched line per family): LlavaNextEngine.probe — anyres tiles,
    # w8a8 prefill, 8 var-len questions, 2 unique images (tile ViT +
    # packing deduped via image_index).
    try:
        _need("llava-next POPE block", 130, 55)
        import gc

        try:
            del nstate, eng
        except NameError:
            pass
        gc.collect()

        from dropoutdecoding_tpu.engine.llavanext_engine import LlavaNextEngine
        from dropoutdecoding_tpu.models import llavanext as next_mod
        from dropoutdecoding_tpu.models.llavanext import LlavaNextParams
        from dropoutdecoding_tpu.utils.config import (
            LlamaConfig as _LC2,
            LlavaNextConfig,
        )

        xcfg = LlavaNextConfig(
            text=_LC2(
                num_key_value_heads=8,
                intermediate_size=14336,
                rope_theta=1000000.0,
                num_hidden_layers=n_layers,
            ),
        )
        if nlm is None:
            raise RuntimeError("budget (no tower)")
        xproto = jax.jit(
            lambda k: next_mod.init_params(
                LlavaNextConfig(
                    text=xcfg.text.__class__(num_hidden_layers=1)
                ),
                k,
                jnp.bfloat16,
            )
        )(jax.random.key(6))
        # the shared Mistral int8 tower doubles as the NeXT LM
        xparams = LlavaNextParams(
            vision=xproto.vision,
            projector=xproto.projector,
            image_newline=xproto.image_newline,
            lm=nlm,
        )
        xeng = LlavaNextEngine(
            cfg=xcfg,
            params=xparams,
            ens=_EC(),
            gen=GenerationConfig(
                max_new_tokens=1, eos_token_id=-1, pad_token_id=0
            ),
            max_len=next_mod.max_image_tokens(xcfg) + 64,
            ensemble=True,
            seed=506,
            int8_kv=True,
        )
        xeng.w8a8_prefill = True
        xeng.__post_init__()

        rngx = np.random.default_rng(7)
        geo = next_mod.image_geometry((600, 800), xcfg)
        nt = geo["n_tiles"]
        u_tiles = [
            rngx.normal(size=(nt, 3, 336, 336)).astype(np.float32)
            for _ in range(2)
        ]
        u_sizes = [(600, 800), (600, 800)]
        img_idx = np.array([0] * 6 + [1] * 2, np.int32)
        qlens = rngx.integers(24, 30, 8)
        idsx = np.zeros((8, 32), np.int32)
        for i, L in enumerate(qlens):
            row = [1] + list(rngx.integers(4, 1000, L - 2)) + [2]
            row[3] = xcfg.image_token_index
            idsx[i, :L] = row
        lensx = qlens.astype(np.int32)

        r = xeng.probe(
            idsx, u_tiles, u_sizes, text_lens=lensx, image_index=img_idx
        )
        _fetch(r.first_token)
        bestx = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r = xeng.probe(
                idsx, u_tiles, u_sizes, text_lens=lensx, image_index=img_idx
            )
            _fetch(r.first_token)
            bestx = min(bestx, time.perf_counter() - t0)
        bestx = max(bestx - ov, bestx / 2)
        print(
            f"batched POPE llava-next shape (w8a8 probe, batch 8, "
            f"{nt}-tile anyres, 2 unique images): {bestx * 1000:.1f} ms "
            f"=> {8 / bestx:.1f} questions/s/chip",
            file=sys.stderr, flush=True,
        )

        # prefix-cached POPE at NeXT shape: the [text-prefix + packed
        # anyres tiles] span is ~2,900 of the ~2,930 merged tokens, so 1
        # prefix prefill + 1 batched ~32-token extend per image replaces
        # 6 full 2.9k-token prefills (cli/pope_test.py --prefix-cache).
        prefix_ids_x = np.zeros((1, 8), np.int32)
        prefix_ids_x[0] = [1] + list(rngx.integers(4, 1000, 7))
        prefix_ids_x[0, 3] = xcfg.image_token_index
        tails_x = rngx.integers(4, 1000, (8, 32)).astype(np.int32)
        tlens_x = rngx.integers(26, 33, 8).astype(np.int32)
        hx = xeng.probe_prefix(prefix_ids_x, u_tiles[0], u_sizes[0])
        rx = xeng.probe_extend(hx, tails_x, tlens_x)
        _fetch(rx.first_token)
        bestpx = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            hx = xeng.probe_prefix(prefix_ids_x, u_tiles[0], u_sizes[0])
            rx = xeng.probe_extend(hx, tails_x, tlens_x)
            _fetch(rx.first_token)
            bestpx = min(bestpx, time.perf_counter() - t0)
        bestpx = max(bestpx - ov, bestpx / 2)
        print(
            f"prefix-cached POPE llava-next shape (w8a8, 1 prefix + 6 "
            f"questions/image): {bestpx * 1000:.1f} ms/image => "
            f"{6 / bestpx:.1f} questions/s/chip",
            file=sys.stderr, flush=True,
        )
        del hx, rx
        del xeng, xparams, xproto, r
        nlm = None
        try:
            del nparams, nproto
        except NameError:
            pass
        gc.collect()
    except Exception as e:
        print(
            f"llava-next POPE line skipped: {type(e).__name__}: {e}",
            file=sys.stderr,
        )
    # unconditional Mistral/NeXT cleanup: a budget-skip or mid-section
    # raise above must not strand the ~7 GB tower (or the B=8 K=8
    # ensemble caches) into the EVA/llava sections — the in-section dels
    # only run on full success (r5 self-review finding)
    nlm = None
    try:
        del nparams
    except NameError:
        pass
    try:
        del nproto
    except NameError:
        pass
    try:
        del eng
    except NameError:
        pass
    try:
        del nstate
    except NameError:
        pass
    try:
        del xeng
    except NameError:
        pass
    try:
        del xparams
    except NameError:
        pass
    try:
        del xproto
    except NameError:
        pass
    gc.collect()

    # batched POPE at the REAL InstructBLIP shape: EVA-ViT-g + Q-Former +
    # int8 Vicuna tower; per-row instruction ids (the Q-Former reads the
    # question), ViT deduped across the batch's 2 unique images.
    try:
        _need("instructblip POPE block", 120, 50)
        from dropoutdecoding_tpu.engine.instructblip_engine import (
            InstructBlipEngine,
        )
        from dropoutdecoding_tpu.models import instructblip as ib_mod
        from dropoutdecoding_tpu.models.instructblip import InstructBlipParams
        from dropoutdecoding_tpu.utils.config import InstructBlipConfig

        icfg = InstructBlipConfig(
            text=InstructBlipConfig().text.__class__(
                vocab_size=32001, num_hidden_layers=n_layers
            ),
        )
        iproto = jax.jit(
            lambda k: ib_mod.init_params(
                InstructBlipConfig(
                    text=icfg.text.__class__(
                        vocab_size=32001, num_hidden_layers=1
                    ),
                ),
                k,
                jnp.bfloat16,
            )
        )(jax.random.key(8))
        ilm = synthetic_int8_lm(icfg.text, jax.random.key(9))
        iparams = InstructBlipParams(
            vision=iproto.vision,
            qformer=iproto.qformer,
            projection=iproto.projection,
            lm=ilm,
        )
        _fetch(iparams.lm["norm"])
        ieng = InstructBlipEngine(
            cfg=icfg,
            params=iparams,
            ens=_EC(mask_policy="epis_quantile", mask_accumulate=False,
                    topk=10),
            gen=GenerationConfig(
                max_new_tokens=1, eos_token_id=-1, pad_token_id=0
            ),
            max_len=icfg.num_query_tokens + 96,
            ensemble=True,
            seed=5217,
            int8_kv=True,
        )
        ieng.w8a8_prefill = True
        ieng.__post_init__()

        rngi = np.random.default_rng(11)
        sz_i = icfg.vision.image_size
        u_px = rngi.normal(size=(2, 3, sz_i, sz_i)).astype(np.float32)
        img_idx = np.array([0] * 6 + [1] * 2, np.int32)
        qlens = rngi.integers(24, 30, 8)
        idsi = np.zeros((8, 32), np.int32)
        qidsi = np.zeros((8, 32), np.int32)
        qmask = np.zeros((8, 32), np.int32)
        for i, L in enumerate(qlens):
            idsi[i, :L] = [1] + list(rngi.integers(4, 30000, L - 1))
            qidsi[i, :L] = [2] + list(rngi.integers(4, 30000, L - 1))
            qmask[i, :L] = 1
        lensi = qlens.astype(np.int32)

        r = ieng.probe(
            idsi, u_px, qidsi, text_lens=lensi,
            qformer_attention_mask=qmask, image_index=img_idx,
        )
        _fetch(r.first_token)
        besti = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r = ieng.probe(
                idsi, u_px, qidsi, text_lens=lensi,
                qformer_attention_mask=qmask, image_index=img_idx,
            )
            _fetch(r.first_token)
            besti = min(besti, time.perf_counter() - t0)
        besti = max(besti - ov, besti / 2)
        print(
            f"batched POPE instructblip shape (w8a8 probe, batch 8, "
            f"EVA-ViT-g, 2 unique images): {besti * 1000:.1f} ms "
            f"=> {8 / besti:.1f} questions/s/chip",
            file=sys.stderr, flush=True,
        )
        # free the Vicuna tower (~7 GB) before the llava rebuild below
        del ieng, iparams, ilm, iproto, r
        import gc as _gci

        _gci.collect()
    except Exception as e:
        print(
            f"instructblip POPE line skipped: {type(e).__name__}: {e}",
            file=sys.stderr,
        )
    # unconditional EVA/Vicuna cleanup before the llava rebuild (same
    # stranding hazard as the Mistral block above)
    try:
        del ieng
    except NameError:
        pass
    try:
        del iparams
    except NameError:
        pass
    try:
        del ilm
    except NameError:
        pass
    try:
        del iproto
    except NameError:
        pass
    gc.collect()

    # ------------------------------------------------------------------
    # Remaining llava-family sections (prefill/POPE, serving, stretch)
    # run LAST: they rank below family coverage in the budget order
    # (round-5 verdict item 1b; BENCH_r04 budget-starved exactly the
    # family sections).  The family sections above freed the llava int8
    # tower to fit the Mistral/EVA towers, so rebuild it — one
    # cached-program generation (~5 s warm).
    try:
        _need("llava tower rebuild", 60, 20)
        lm = synthetic_int8_lm(cfg.text, jax.random.key(0))
        proto = jax.jit(
            lambda k: llava_mod.init_params(proto_cfg, k, jnp.bfloat16)
        )(jax.random.key(1))
        params = LlavaParams(
            vision=proto.vision, projector=proto.projector, lm=lm
        )
        _fetch(params.lm["norm"])
        ens_engine = mk(True)
    except Exception as e:
        print(f"llava rebuild skipped: {type(e).__name__}: {e}",
              file=sys.stderr)
        return greedy_tps, ens_tps, fused_tps, ref_tps, headline

    # prefill latency (vision tower + merge + LM + fused uncertainty
    # kernel) + the POPE fast path: a POPE answer is the argmax at the
    # prompt's last position (max_new_tokens=1, reference
    # pope_test.py:239-242), i.e. PrefillState.first_token directly.
    try:
        _need("prefill/POPE block", 150, 60)
        ids = np.array(
            [[1] + list(range(4, 20)) + [cfg.image_token_index]
             + list(range(20, 36))],
            np.int32,
        )
        px = np.random.default_rng(0).normal(size=(1, 3, 336, 336)).astype(
            np.float32
        )
        st = ens_engine.prefill(ids, px)
        _fetch(st.first_token)  # cold
        best = float("inf")
        for _ in range(5):  # single-dispatch timing: tunnel jitter is
            # +-tens of ms, so take min over more repeats
            t0 = time.perf_counter()
            st = ens_engine.prefill(ids, px)
            _fetch(st.first_token)
            best = min(best, time.perf_counter() - t0)
        best = max(best - ov, best / 2)  # one dispatch: same correction
        print(
            f"prefill (608 tok + ViT-L/336): {best * 1000:.1f} ms  "
            f"=> POPE fast path {1.0 / best:.1f} questions/s/chip",
            file=sys.stderr, flush=True,
        )

        # w8a8 prefill (int8-MXU projections, --quantize w8a8): profiled
        # device time 42.9 vs 60.5 ms at this config (1.41x); the wall
        # delta over the tunnel is smaller because ~35 ms of per-dispatch
        # state-buffer overhead is fixed.
        e8 = mk(True)
        e8.w8a8_prefill = True
        e8.__post_init__()
        st = e8.prefill(ids, px)
        _fetch(st.first_token)
        best8 = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            st = e8.prefill(ids, px)
            _fetch(st.first_token)
            best8 = min(best8, time.perf_counter() - t0)
        best8 = max(best8 - ov, best8 / 2)
        print(
            f"prefill w8a8: {best8 * 1000:.1f} ms  "
            f"=> POPE fast path {1.0 / best8:.1f} questions/s/chip",
            file=sys.stderr, flush=True,
        )

        # batched POPE, probe path (cli/pope_test.py --batch-size): 8
        # variable-length questions, right-padded with per-row text_lens,
        # run through engine.probe — the 1-token fast path that skips the
        # [B, N, V] visual-logits table, uncertainty, top-k, and the KV
        # cache materialization (none can affect the first token) — with
        # the batch's UNIQUE images deduped via image_index (POPE asks 6
        # consecutive questions per image => 2 unique images per batch-8
        # group), so the ViT runs twice, not 8 times (round-2 verdict
        # weak #2: the batched path must win on device, not just on
        # dispatch amortization).
        Bq = 8
        rngq = np.random.default_rng(1)
        qlens = rngq.integers(28, 34, Bq)
        Sq = 40
        idsq = np.zeros((Bq, Sq), np.int32)
        for i, L in enumerate(qlens):
            row = [1] + list(rngq.integers(4, 1000, L - 2)) + [2]
            row[3] = cfg.image_token_index
            idsq[i, :L] = row
        pxu = rngq.normal(size=(2, 3, 336, 336)).astype(np.float32)
        img_idx = np.array([0, 0, 0, 0, 0, 0, 1, 1], np.int32)
        lensq = qlens.astype(np.int32)
        stq = e8.probe(idsq, pxu, text_lens=lensq, image_index=img_idx)
        _fetch(stq.first_token)
        bestq = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            stq = e8.probe(idsq, pxu, text_lens=lensq, image_index=img_idx)
            _fetch(stq.first_token)
            bestq = min(bestq, time.perf_counter() - t0)
        bestq = max(bestq - ov, bestq / 2)
        print(
            f"batched POPE (w8a8 probe, batch {Bq}, var-len, 2 unique "
            f"images): {bestq * 1000:.1f} ms => "
            f"{Bq / bestq:.1f} questions/s/chip",
            file=sys.stderr, flush=True,
        )
        # prefix-cached POPE (cli/pope_test.py --prefix-cache): the
        # shared [text-prefix + image] span (~583 of ~615 merged tokens)
        # prefills ONCE per image; each question is a ~32-token
        # prefill_extend over the cached KV.  Steady state = 1 prefix +
        # 1 extend (6 real questions padded to 8 rows) per image.
        prefix_ids = np.zeros((1, 8), np.int32)
        prefix_ids[0] = [1] + list(rngq.integers(4, 1000, 7))
        prefix_ids[0, 3] = cfg.image_token_index
        tails = rngq.integers(4, 1000, (8, 32)).astype(np.int32)
        tlens = rngq.integers(26, 33, 8).astype(np.int32)
        kvp = e8.probe_prefix(prefix_ids, pxu[:1])
        rp = e8.probe_extend(kvp, tails, tlens)
        _fetch(rp.first_token)
        bestp = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            kvp = e8.probe_prefix(prefix_ids, pxu[:1])
            rp = e8.probe_extend(kvp, tails, tlens)
            _fetch(rp.first_token)
            bestp = min(bestp, time.perf_counter() - t0)
        bestp = max(bestp - ov, bestp / 2)
        print(
            f"prefix-cached POPE (w8a8, 1 prefix + 6 questions/image): "
            f"{bestp * 1000:.1f} ms/image => {6 / bestp:.1f} questions/s/chip",
            file=sys.stderr, flush=True,
        )

        # free the prefill-block state BEFORE the stretch config — stq's
        # B=8 cache (~1.4 GB) plus e8's programs tipped the 16 GB chip
        # over once the stretch engine allocated its 16 caches
        import gc as _gc

        del st, stq, e8, kvp, rp
        _gc.collect()
    except Exception as e:
        print(f"prefill bench skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # serving: continuous-batching DecodeServer (n_slots=8, fused K=3,
    # caption workload: 16 requests x 16 tokens), chunked dispatch — 8
    # decode steps per host round-trip (engine/serving.py step(n)) so the
    # ~30 ms per-dispatch cost is paid per 8 tokens, not per token.
    # Baseline: per-request sequential generation (prefill + whole-loop
    # decode each).
    try:
        _need("serving", 90, 40)
        from dropoutdecoding_tpu.engine.serving import DecodeServer

        srv_eng = mk(True, tokens=16)
        srv_eng.ens = _EC(fused_step=True)
        srv_eng.__post_init__()
        rngs = np.random.default_rng(5)
        sreqs = {}
        for i in range(16):
            L = int(rngs.integers(28, 34))
            row = [1] + list(rngs.integers(4, 1000, L - 2)) + [2]
            row[3] = cfg.image_token_index
            sreqs[f"r{i}"] = (
                np.asarray([row], np.int32),
                rngs.normal(size=(1, 3, 336, 336)).astype(np.float32),
            )
        ids4 = list(sreqs.items())[:4]
        for _, a in ids4:
            srv_eng.generate(*a)  # warm every prompt-length program
        t0 = time.perf_counter()
        for _, a in ids4:
            srv_eng.generate(*a)
        seq_rps = 4 / (time.perf_counter() - t0)
        srv = DecodeServer(engine=srv_eng, n_slots=8)
        srv.run(list(sreqs), lambda r: sreqs[r],
                batch_prefill=False, step_chunk=8)  # warm
        best_serve = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = srv.run(list(sreqs), lambda r: sreqs[r],
                          batch_prefill=False, step_chunk=8)
            best_serve = min(best_serve, time.perf_counter() - t0)
            assert len(out) == len(sreqs)
        serve_rps = len(sreqs) / best_serve
        print(
            f"serving n_slots=8 (fused K=3, 16 tok): {serve_rps:.2f} req/s "
            f"(= {serve_rps / seq_rps:.2f}x per-request sequential "
            f"{seq_rps:.2f} req/s)",
            file=sys.stderr, flush=True,
        )
        del srv, srv_eng, sreqs
        import gc as _gc2

        _gc2.collect()
    except Exception as e:
        print(f"serving bench skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    # stretch config (BASELINE.json #5): batch 16 images x K=8 max-vote.
    # Its own 16-token window: the B=16 cache at a 64-token window tips the
    # 16 GB chip over (weights 6.8 GB + 16 caches + the [16, N, V] state).
    try:
        _need("stretch config", 60, 30)
        k8 = mk(True, tokens=16)
        k8.ens = _EC(voting_probs=K8_PROBS, fused_step=True)
        k8.__post_init__()
        state16 = build_state(k8, cfg, jax.random.key(2), B=16)
        _fetch(state16.first_token)
        per_stream = time_decode(k8, state16, params, ov)
        print(
            f"batch16 x K=8 fused: {per_stream * 16:.2f} total tokens/s "
            f"({per_stream:.2f} t/s per caption stream; "
            f"{per_stream / greedy_tps:.2f}x single-stream greedy rate)",
            file=sys.stderr, flush=True,
        )
    except Exception as e:
        print(f"stretch config skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # free the stretch tier's B=16 cache (~2.6 GB) + engine before OPERA
    # allocates its beam cache — same stranding hazard as the tower
    # handoffs above
    try:
        del k8
    except NameError:
        pass
    try:
        del state16
    except NameError:
        pass
    gc.collect()

    # OPERA beam-3 decode at 7B shape (the round-4 native implementation
    # had no driver-captured perf line): beam search + over-trust penalty
    # + retrospection-rollback in one compiled while_loop program
    # (engine/opera.py; reference chair_test.py:312-323 kwargs).  Lowest
    # budget priority — runs only after every other section fit.
    try:
        # measured cold compile+run 21.4 s at 7B once the runner threads
        # lm params as an argument (closure capture had baked 6.88 GB of
        # constants into the program and compiled >18 min)
        _need("opera beam", 90, 35)
        from dropoutdecoding_tpu.engine.opera import opera_generate

        op_eng = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(
                max_new_tokens=DECODE_TOKENS, eos_token_id=-1, pad_token_id=0
            ),
            max_len=PROMPT_LEN + DECODE_TOKENS + 1,
            ensemble=False,
            seed=31,
            int8_kv=True,
        )
        op_state = build_state(op_eng, cfg, jax.random.key(33))

        def run_op():
            t0 = time.perf_counter()
            r = opera_generate(
                op_eng, state=op_state, num_beams=3, scale_factor=50.0,
                threshold=15, num_attn_candidates=5, penalty_weights=1.0,
            )
            return int(r.num_tokens[0]), time.perf_counter() - t0

        run_op()  # compile + cold
        n_op, wall_op = min((run_op() for _ in range(2)), key=lambda r: r[1])
        op_tps = n_op / max(wall_op - ov, wall_op / 2)
        print(
            f"OPERA beam-3 (nc=5, retrospection on, int8 7B): "
            f"{op_tps:.2f} t/s (= {op_tps / greedy_tps:.2f}x greedy "
            f"throughput; {n_op} tokens)",
            file=sys.stderr, flush=True,
        )
        del op_eng, op_state
    except Exception as e:
        print(f"opera bench skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    return greedy_tps, ens_tps, fused_tps, ref_tps, headline


_LAST_GOOD = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_last_good.json"
)


def _record_last_good(headline: dict):
    """Persist the completed run's headline so a later invocation on a
    DEAD tunnel (the axon execute leg drops out for hours at a time —
    observed 2026-08-20/21) can still emit a parseable, honestly-labeled
    record instead of only a diagnostic."""
    try:
        import subprocess

        commit = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        commit = None
    try:
        with open(_LAST_GOOD, "w") as f:
            json.dump(
                {
                    "headline": headline,
                    "recorded_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%S", time.localtime()
                    ),
                    "recorded_commit": commit,
                    "config": {
                        "layers": int(os.environ.get("BENCH_LAYERS", "32")),
                        "decode_tokens": DECODE_TOKENS,
                    },
                },
                f,
            )
    except OSError as e:  # best-effort
        print(f"last-good record failed: {e}", file=sys.stderr)


def _emit_stale_and_exit(reason: str):
    """On an infrastructure-dead tunnel: print the last successful run's
    headline JSON as the final line, with an explicit ``stale`` marker and
    the failure reason, then exit 0 (the measurement is real — it is just
    not from THIS invocation; the JSON says so in-band).  With no prior
    good run on disk, exit 3 with only the diagnostic."""
    try:
        with open(_LAST_GOOD) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        os._exit(3)
    headline = dict(rec.get("headline") or {})
    if not headline:
        os._exit(3)
    headline["stale"] = True
    headline["recorded_at"] = rec.get("recorded_at")
    headline["recorded_commit"] = rec.get("recorded_commit")
    headline["recorded_config"] = rec.get("config")
    headline["stale_reason"] = reason
    try:
        import subprocess

        cur = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if cur and rec.get("recorded_commit") and cur != rec["recorded_commit"]:
            headline["stale_commit_mismatch"] = cur
    except Exception:
        pass
    print(
        "NOTE: emitting the last successful on-chip run's headline below, "
        "marked stale=true — the tunnel is dead NOW but the recorded "
        "measurement was a healthy-run artifact.",
        file=sys.stderr,
        flush=True,
    )
    print(json.dumps(headline), flush=True)
    os._exit(0)


def _preflight_tunnel(deadline_s: float):
    """Fail FAST and LOUDLY if the TPU execute path is dead.

    The axon tunnel can enter a state where device enumeration and
    dispatch succeed instantly but the first execute/fetch round-trip
    never returns (observed 2026-08-20: a trivial 128x128 matmul fetch
    blocked >570 s; the same program costs ~1-13 s on a healthy tunnel,
    70-260 s on a cold-backend one).  Without this guard the driver's
    bench run times out with rc=124 and an EMPTY tail — the round-3
    failure mode.  A daemon thread runs the trivial program; if it does
    not complete inside ``deadline_s`` we print a diagnostic (the driver
    records the tail) and exit 3 immediately rather than hanging.  On a
    healthy tunnel this doubles as the backend/first-program warmup the
    benchmark pays anyway.
    """
    import threading

    import jax

    done = threading.Event()
    err: list = []

    def probe():
        try:
            x = jax.numpy.zeros((128, 128), jax.numpy.bfloat16)
            _fetch(x @ x)
        except Exception as e:  # surfaced below
            err.append(e)
        finally:
            done.set()

    t0 = time.perf_counter()
    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(deadline_s):
        print(
            f"PREFLIGHT FAILED: TPU tunnel execute leg is dead — a trivial "
            f"128x128 matmul fetch did not return within {deadline_s:.0f}s "
            f"(healthy: ~1-13 s warm, 70-260 s cold backend).  This is "
            f"infrastructure, not the benchmark: device enumeration and "
            f"dispatch succeed but no execute round-trip completes.  "
            f"Exiting instead of hanging to the driver timeout.",
            file=sys.stderr,
            flush=True,
        )
        _emit_stale_and_exit(f"execute-leg hang > {deadline_s:.0f}s")
    if err:
        # a crashing probe (e.g. FailedPrecondition while the tunnel's
        # backend is sick — observed 2026-08-20) is the same
        # infrastructure failure as a hang: diagnostic line + exit 3,
        # not a raw traceback the driver's tail parser trips over
        print(
            f"PREFLIGHT FAILED: TPU probe raised "
            f"{type(err[0]).__name__}: {str(err[0])[:300]} — "
            f"infrastructure, not the benchmark.  Exiting.",
            file=sys.stderr,
            flush=True,
        )
        _emit_stale_and_exit(
            f"probe crash: {type(err[0]).__name__}: {str(err[0])[:120]}"
        )
    print(
        f"preflight: trivial-program round-trip "
        f"{time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
        flush=True,
    )


def main():
    import gc

    import jax

    if os.environ.get("BENCH_FORCE_CPU"):
        # structural smoke mode: run the whole section flow on the host
        # CPU (tiny BENCH_LAYERS/BENCH_DECODE_TOKENS recommended).  The
        # container force-registers the axon TPU plugin, so this must be
        # a config update, not JAX_PLATFORMS; no tunnel preflight.
        jax.config.update("jax_platforms", "cpu")
    else:
        _enable_compile_cache()
        _preflight_tunnel(float(os.environ.get("BENCH_PREFLIGHT_S", "450")))
    n_layers = int(os.environ.get("BENCH_LAYERS", "32"))
    result = None
    while n_layers >= 2:
        try:
            globals()["WARM"] = _cache_warm(n_layers)
            result = run_once(n_layers)
            if not os.environ.get("BENCH_FORCE_CPU"):
                # a CPU smoke compiled no TPU programs — it must not
                # write (or clobber) the TPU cache-warmth fingerprint
                _mark_cache_warm(n_layers)
            break
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
                print(
                    f"OOM at {n_layers} layers; retrying with {n_layers // 2}",
                    file=sys.stderr, flush=True,
                )
                n_layers //= 2
                jax.clear_caches()
                gc.collect()
                continue
            raise
    if result is None:
        raise RuntimeError("could not fit model")
    greedy_tps, ens_tps, fused_tps, ref_tps, headline = result

    print(
        f"layers={n_layers} int8: greedy={greedy_tps:.2f} t/s "
        f"ensembleK3={ens_tps:.2f} t/s (={ens_tps / greedy_tps:.2f}x greedy) "
        f"fusedK3={fused_tps:.2f} t/s "
        f"reference-style={ref_tps:.2f} t/s",
        file=sys.stderr,
    )
    # the driver extracts `parsed` from the END of the captured output:
    # re-print the same headline JSON (already printed right after the
    # core measurements) as the final line — belt and braces
    if not os.environ.get("BENCH_FORCE_CPU"):
        # a forced-CPU structural smoke must not poison the on-chip
        # last-good record the stale-emission path replays
        _record_last_good(headline)
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
