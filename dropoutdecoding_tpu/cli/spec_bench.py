"""Speculative-greedy measurement at exact 7B shape on the real chip.

Both towers come from ONE synthetic bf16 base (utils/synthetic.
synthetic_llava_7b_dual): the int8 tower is the target, the int4 tower
the self-draft — the deployment pairing `--spec-gamma` uses.  Random
weights are the WORST case for draft agreement (fused_gap --study
int4prod measured greedy int8-vs-int4 agreement far below trained-
checkpoint levels), so alongside the measured rate this prints:

  - alpha (measured acceptance rate) and tokens/cycle,
  - the per-cycle cost split (device time vs the host round-trip the
    acceptance fetch inherently pays — spec decoding is host-looped),
  - the alpha=1 machinery bound (draft == target weights: every token
    accepted; any shortfall vs (gamma*draft+verify)/(gamma+1) cost is
    machinery overhead),
  - the projected rate at trained-checkpoint acceptance levels from the
    measured cycle costs.

Usage (real TPU):  python -m dropoutdecoding_tpu.cli.spec_bench
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--gammas", type=int, nargs="*", default=[4])
    ap.add_argument("--prompts", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..engine.generate import LlavaEngine
    from ..engine.speculative import SpeculativeGreedy
    from ..utils.config import EnsembleConfig, GenerationConfig
    from ..utils.synthetic import synthetic_llava_7b_dual

    cfg, p8, p4 = synthetic_llava_7b_dual(
        jax.random.key(0), n_layers=args.layers
    )
    T = args.tokens
    eng = LlavaEngine(
        cfg=cfg,
        params=p8,
        ens=EnsembleConfig(),
        gen=GenerationConfig(max_new_tokens=T, eos_token_id=-1, pad_token_id=0),
        # speculative verify appends gamma rows past prompt+T
        # (SpeculativeGreedy._check_headroom)
        max_len=608 + T + max(args.gammas) + 1,
        ensemble=False,  # greedy target; DENSE KV (spec reads the prefix)
        seed=24,
    )
    jax.block_until_ready(eng.params.lm["norm"])

    rng = np.random.default_rng(0)
    prompts = []
    for _ in range(args.prompts):
        row = [1] + [int(x) for x in rng.integers(4, 30000, 30)] + [5]
        row[4] = cfg.image_token_index
        ids = np.asarray([row], np.int32)
        px = rng.normal(size=(1, 3, 336, 336)).astype(np.float32)
        prompts.append((ids, px))

    # tunnel round-trip (the acceptance fetch pays this once per cycle)
    tiny = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8,), jnp.int32)
    np.asarray(tiny(z))
    rtt = min(
        (lambda t0: (np.asarray(tiny(z)), time.perf_counter() - t0))(
            time.perf_counter()
        )[1]
        for _ in range(10)
    )
    print(f"host round-trip: {rtt * 1e3:.1f} ms", file=sys.stderr, flush=True)

    # greedy baseline (whole-decode dispatch)
    st = eng.prefill(*prompts[0])
    rest = st._replace(cache=None)
    fc = jax.tree.map(lambda a: a.copy(), st.cache)
    toks, _, fc = eng._decode_d(eng.params, fc, rest)
    np.asarray(toks[:, -1])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        toks, _, fc = eng._decode_d(eng.params, fc, rest)
        np.asarray(toks[:, -1])
        best = min(best, time.perf_counter() - t0)
    del fc
    greedy_tps = (T - 1) / (best - min(rtt, best / 2))
    print(f"greedy baseline: {greedy_tps:.1f} t/s", file=sys.stderr, flush=True)

    def run_fused(draft, gamma, label):
        """generate_fused: whole-generation single-dispatch program (the
        deployment path; per-cycle host fetches eliminated)."""
        spec = SpeculativeGreedy(engine=eng, draft_lm=draft, gamma=gamma)
        spec.generate_fused(*prompts[0])  # warm
        stats = []
        for ids, px in prompts:
            st = eng.prefill(ids, px)
            dc = spec._draft_prefill(eng.params, spec.draft_lm,
                                     jnp.asarray(ids), px)
            np.asarray(st.first_token)
            t0 = time.perf_counter()
            buf, n_out, iters, _, _ = spec._fused(
                eng.params, spec.draft_lm, st.cache, dc,
                st.cur_len, st.first_token,
            )
            n = int(np.asarray(n_out))
            el = time.perf_counter() - t0
            stats.append((n + 1, int(np.asarray(iters)), el))
        n_tok = sum(s[0] for s in stats)
        n_cyc = sum(s[1] for s in stats)
        wall = sum(s[2] for s in stats)
        tps = n_tok / max(wall - len(stats) * min(rtt, wall / 2), 1e-9)
        print(
            f"{label} gamma={gamma} FUSED: {tps:.1f} t/s "
            f"({n_tok / max(n_cyc, 1):.2f} tok/cycle, {n_cyc} cycles, one "
            f"dispatch per generation)",
            file=sys.stderr, flush=True,
        )
        return dict(
            label=label + "-fused", gamma=gamma,
            tok_per_cycle=round(n_tok / max(n_cyc, 1), 3),
            tps_wall=round(tps, 2),
        )

    def run_spec(draft, gamma, label):
        spec = SpeculativeGreedy(engine=eng, draft_lm=draft, gamma=gamma)
        # warm
        spec.generate(*prompts[0])
        stats = []
        for ids, px in prompts:
            t0 = time.perf_counter()
            tokens, cycles, accepted = spec.generate(ids, px)
            el = time.perf_counter() - t0
            stats.append((len(tokens), cycles, accepted, el))
        n_tok = sum(s[0] for s in stats)
        n_cyc = sum(s[1] for s in stats)
        n_acc = sum(s[2] for s in stats)
        wall = sum(s[3] for s in stats)
        # the prefill + draft prefill happen inside generate(); subtract
        # their (measured) share by timing them alone
        t0 = time.perf_counter()
        for ids, px in prompts:
            s = eng.prefill(ids, px)
            d = spec._draft_prefill(eng.params, spec.draft_lm, ids, px)
        np.asarray(s.first_token), jax.block_until_ready(d.k)
        pre = time.perf_counter() - t0
        decode_wall = wall - pre
        alpha = n_acc / max(n_cyc * gamma, 1)
        tps = n_tok / decode_wall
        dev = decode_wall - n_cyc * rtt  # cycle fetches pay the tunnel
        tps_dev = n_tok / max(dev, 1e-9)
        print(
            f"{label} gamma={gamma}: {tps:.1f} t/s wall, {tps_dev:.1f} t/s "
            f"dispatch-corrected (alpha={alpha:.3f}, "
            f"{n_tok / n_cyc:.2f} tok/cycle, {n_cyc} cycles)",
            file=sys.stderr, flush=True,
        )
        return dict(
            label=label, gamma=gamma, alpha=round(alpha, 4),
            tok_per_cycle=round(n_tok / n_cyc, 3),
            tps_wall=round(tps, 2), tps_dispatch_corrected=round(tps_dev, 2),
        )

    def run_ngram(gamma):
        """Prompt-lookup drafting (draft='ngram'): zero draft weight
        streams; host loop for alpha stats + the fused single-dispatch
        program for the deployment rate."""
        spec = SpeculativeGreedy(engine=eng, draft_lm=None, gamma=gamma,
                                 draft="ngram")
        spec.generate(*prompts[0])  # warm (verify program)
        stats = []
        for ids, px in prompts:
            tokens, cycles, accepted = spec.generate(ids, px)
            stats.append((len(tokens), cycles, accepted))
        n_tok = sum(s[0] for s in stats)
        n_cyc = sum(s[1] for s in stats)
        alpha = sum(s[2] for s in stats) / max(n_cyc * gamma, 1)

        spec.generate_fused(*prompts[0])  # warm (fused program)
        import jax.numpy as jnp
        wall = 0.0
        fus_tok = 0
        for ids, px in prompts:
            st = eng.prefill(ids, px)
            first = int(np.asarray(st.first_token)[0])
            buf0 = jnp.full((T + gamma + 1,), 0, jnp.int32).at[0].set(first)
            t0 = time.perf_counter()
            buf, n_out, iters, _ = spec._fused_ng(
                eng.params, st.cache, st.cur_len, st.first_token, buf0
            )
            n = int(np.asarray(n_out))
            wall += time.perf_counter() - t0
            fus_tok += n
        tps = fus_tok / max(wall - len(prompts) * min(rtt, wall / 2), 1e-9)
        print(
            f"ngram-draft gamma={gamma} FUSED: {tps:.1f} t/s "
            f"(alpha={alpha:.3f}, {n_tok / max(n_cyc, 1):.2f} tok/cycle, "
            f"{tps / greedy_tps:.2f}x greedy)",
            file=sys.stderr, flush=True,
        )
        return dict(
            label="ngram-draft-fused", gamma=gamma, alpha=round(alpha, 4),
            tok_per_cycle=round(n_tok / max(n_cyc, 1), 3),
            tps_wall=round(tps, 2),
            vs_greedy=round(tps / greedy_tps, 3),
        )

    results = []
    for g in args.gammas:
        results.append(run_spec(p4.lm, g, "int4-draft"))
        results.append(run_fused(p4.lm, g, "int4-draft"))
        results.append(run_ngram(g))
    results.append(run_spec(p8.lm, args.gammas[0], "target-draft(alpha=1)"))
    results.append(run_fused(p8.lm, args.gammas[0], "target-draft(alpha=1)"))

    print(json.dumps({
        "metric": "speculative_greedy_7b",
        "greedy_tps": round(greedy_tps, 2),
        "host_rtt_ms": round(rtt * 1e3, 2),
        "runs": results,
    }), flush=True)


if __name__ == "__main__":
    main()
