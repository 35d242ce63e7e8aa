"""Microbenchmark for the packed-int4 decode kernel (round-5 verdict
item 3: int4 greedy sits at 63% of its packed-stream roofline while int8
runs at 84-86%).

Times `ops.pallas_int4_matmul.int4_matmul_layered` at the 7B decode
shapes (R=1 row) over full 32-layer stacks — one compiled program per
(matrix, unpack-mode, block_e) running all layers in a fori_loop, so the
tunnel dispatch cost amortizes — and reports achieved HBM GB/s per
configuration against the raw-stream bound (an int8 sum-reduction over
the same stack).  Output drives UNPACK_DEFAULT and the block geometry.

    python -m dropoutdecoding_tpu.cli.int4_probe [--layers 32]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--modes", nargs="*", default=["i32", "mxu3"],
                help="i16/bf16 fail Mosaic legalization on real hardware (arith.shrsi / the bf16 floor path) — interpret-only")
    ap.add_argument("--blocks", nargs="*", type=int, default=[512, 1024])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--fused", action="store_true",
                    help="probe the fuse_projections leaf shapes")
    ap.add_argument(
        "--inner-reps", type=int, default=50,
        help="times the full layer stack is streamed INSIDE one program: "
             "per-stack device time (0.5-1.5 ms at 7B shapes) is far "
             "below the ~25 ms tunnel round-trip, so a single-pass "
             "program measures the tunnel, not the kernel",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dropoutdecoding_tpu.ops.pallas_int4_matmul import int4_matmul_layered

    # persistent compile cache (same dir as bench.py)
    import os

    cache = os.environ.get(
        "BENCH_COMPILE_CACHE",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    L = args.layers
    GROUP = 128
    # 7B decode matrices: (name, D, E)
    if args.fused:
        # fuse_projections layout (qkv / gate_up fused leaves)
        mats = [
            ("qkv", 4096, 12288),
            ("gate_up", 4096, 22016),
            ("o", 4096, 4096),
            ("down", 11008, 4096),
        ]
    else:
        mats = [
            ("qo_proj", 4096, 4096),
            ("gateup", 4096, 11008),
            ("down", 11008, 4096),
        ]

    def fetch(x):
        return np.asarray(x)

    # dispatch overhead
    tiny = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8,), jnp.float32)
    fetch(tiny(z))
    rtt = min(
        (lambda t0: (fetch(tiny(z)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(8)
    )
    print(f"dispatch overhead {rtt * 1000:.1f} ms", file=sys.stderr)

    results = []
    for mi, (name, D, E) in enumerate(mats):
        # fixed per-matrix seed: Python's str hash is salted per process,
        # which would make run-to-run GB/s comparisons non-reproducible
        key = jax.random.key(1000 + mi)

        @jax.jit
        def gen(key, D=D, E=E):
            ks = jax.random.split(key, 2)
            q = jax.lax.bitcast_convert_type(
                jax.random.bits(ks[0], (L, D // 2, E), jnp.uint8), jnp.int8
            )
            s = jnp.full((L, D // GROUP, E), 0.02 / 4.6, jnp.float32)
            x = jax.random.normal(ks[1], (1, D), jnp.bfloat16)
            return q, s, x

        q4, s4, x = gen(key)
        fetch(x)
        stream_gb = q4.nbytes / 1e9

        # raw-stream bound proxy: per-layer int8 -> i32 sums, the stack
        # streamed inner-reps times in ONE program.  The layer index is
        # loop-dependent (lax.rem), so the per-iteration operand differs
        # and XLA cannot hoist the reduction out of the loop.
        R = args.inner_reps

        @jax.jit
        def stream_sum(q):
            def body(i, acc):
                return acc + jnp.sum(q[jax.lax.rem(i, L)].astype(jnp.int32))

            return jax.lax.fori_loop(0, L * R, body, jnp.int32(0))

        fetch(stream_sum(q4))
        best = min(
            (lambda t0: (fetch(stream_sum(q4)),
                         time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(args.repeats)
        )
        bound = R * stream_gb / max(best - rtt, best / 2)
        print(f"{name}: stream-sum bound {bound:.0f} GB/s "
              f"({stream_gb:.2f} GB x {R})", file=sys.stderr, flush=True)

        for mode in args.modes:
            for be in args.blocks:

                @jax.jit
                def run_all(x, q, s, mode=mode, be=be):
                    def body(i, acc):
                        y = int4_matmul_layered(
                            jax.lax.rem(i, L), x, q, s,
                            block_e=be, unpack=mode,
                        )
                        return acc + jnp.sum(y)

                    return jax.lax.fori_loop(0, L * R, body, jnp.float32(0))

                try:
                    fetch(run_all(x, q4, s4))  # compile + cold
                    bt = min(
                        (lambda t0: (fetch(run_all(x, q4, s4)),
                                     time.perf_counter() - t0)[1])(
                            time.perf_counter()
                        )
                        for _ in range(args.repeats)
                    )
                    eff = max(bt - rtt, bt / 2)
                    gbps = R * stream_gb / eff
                    print(
                        f"{name} unpack={mode} block_e={be}: "
                        f"{eff * 1000 / R:.2f} ms/stack = {gbps:.0f} GB/s "
                        f"({100 * gbps / bound:.0f}% of stream bound)",
                        file=sys.stderr, flush=True,
                    )
                    results.append((name, mode, be, round(gbps, 1)))
                except Exception as e:
                    print(
                        f"{name} unpack={mode} block_e={be}: FAILED "
                        f"{type(e).__name__}: {str(e)[:200]}",
                        file=sys.stderr, flush=True,
                    )
        del q4, s4

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
