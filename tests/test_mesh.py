"""In-tree multi-device tests (SURVEY.md §4 multi-device mandate).

Run on the virtual 8-device CPU mesh from conftest.py:

- TP: tensor-parallel sharded prefill + full ensemble generate produce the
  same logits/tokens as the unsharded single-device run (2x4 mesh, fp32).
- Winner-KV scatter: one ensemble decode step on a `shard_cache`-sharded
  cache writes exactly the same K/V rows as the unsharded step.
- DP: batched data-parallel generate (8x1 mesh) == per-row generate.

The reference has no parallelism at all (SURVEY.md §2.5); these tests pin
the TPU-native mesh design (parallel/mesh.py) to the single-device
semantics that are themselves HF-parity-tested elsewhere.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dropoutdecoding_tpu.engine.generate import LlavaEngine, TextMaskState
from dropoutdecoding_tpu.models import llava as llava_mod
from dropoutdecoding_tpu.parallel.mesh import (
    make_mesh,
    shard_cache,
    shard_llava_params,
)
from dropoutdecoding_tpu.utils.config import (
    ClipVisionConfig,
    EnsembleConfig,
    GenerationConfig,
    LlamaConfig,
    LlavaConfig,
)

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
    ),
    pytest.mark.slow,  # excluded from the fast core gate (docs/TESTS.md)
]


def _cfg(vocab=128, n_layers=2, hidden=128, n_heads=8, n_kv=4):
    return LlavaConfig(
        text=LlamaConfig(
            vocab_size=vocab,
            hidden_size=hidden,
            intermediate_size=hidden * 2,
            num_hidden_layers=n_layers,
            num_attention_heads=n_heads,
            num_key_value_heads=n_kv,
            head_dim=hidden // n_heads,
        ),
        vision=ClipVisionConfig(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=28,
            patch_size=14,
        ),
        image_token_index=vocab - 2,
        pad_token_id=vocab - 1,
    )


def _engine(cfg, params, ensemble=True, max_new=6):
    e = LlavaEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(),
        gen=GenerationConfig(
            max_new_tokens=max_new, eos_token_id=2, pad_token_id=2
        ),
        max_len=48,
        ensemble=ensemble,
    )
    e.param_dtype = jnp.float32
    return e


def _inputs(cfg, B, rng_seed=0):
    """B rows with DIFFERENT pixels and image positions (exercises the
    vmapped dynamic-slice merge under sharding)."""
    r = np.random.default_rng(rng_seed)
    img = cfg.image_token_index
    ids = []
    for b in range(B):
        p = 1 + (b % 3)  # image token at position 1/2/3
        row = [1] + [3 + b] * (p - 1) + [img] + [5, 7, 9, 11][: 5 - p]
        ids.append(row[:5])
    input_ids = np.asarray(ids, np.int32)
    pixels = r.normal(size=(B, 3, 28, 28)).astype(np.float32)
    return input_ids, pixels


@pytest.fixture(scope="module")
def tiny():
    cfg = _cfg()
    params = llava_mod.init_params(cfg, jax.random.key(0), jnp.float32)
    return cfg, params


def _sharded_state(engine, mesh, input_ids, pixels):
    ids = jax.device_put(jnp.asarray(input_ids), NamedSharding(mesh, P("data")))
    px = jax.device_put(
        jnp.asarray(pixels), NamedSharding(mesh, P("data", None, None, None))
    )
    state = engine.prefill(ids, px)
    return state._replace(cache=shard_cache(state.cache, mesh))


def test_tp_sharded_generate_matches_single_device(tiny):
    """(2 data x 4 model) TP mesh: prefill logits match the unsharded run
    to fp32 tolerance and the full ensemble generate emits identical
    tokens (parallel/mesh.py TP specs for q/k/v/o + MLP + lm_head)."""
    cfg, params = tiny
    B = 2
    input_ids, pixels = _inputs(cfg, B)

    base = _engine(cfg, params)
    ref_state = base.prefill(input_ids, pixels)
    ref_out = base.generate(input_ids, pixels)

    mesh = make_mesh(n_data=2, n_model=4)
    sp = shard_llava_params(params, mesh)
    eng = _engine(cfg, sp)
    with mesh:
        state = _sharded_state(eng, mesh, input_ids, pixels)
        np.testing.assert_allclose(
            np.asarray(state.last_logits),
            np.asarray(ref_state.last_logits),
            atol=1e-4,
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(state.epis),
            np.asarray(ref_state.epis),
            atol=1e-4,
            rtol=1e-3,
        )
        tokens, _ = eng._decode(eng.params, state)
        tokens = np.asarray(tokens)
    np.testing.assert_array_equal(tokens, ref_out.tokens)


def test_tp_full_model_axis():
    """(1 data x 8 model): the deepest TP split — KV-head axis fully
    sharded (needs n_kv % 8 == 0 for the cache's KH('model') spec);
    generate still matches single-device tokens."""
    cfg = _cfg(n_kv=8)
    params = llava_mod.init_params(cfg, jax.random.key(0), jnp.float32)
    input_ids, pixels = _inputs(cfg, 1)
    ref = _engine(cfg, params).generate(input_ids, pixels)

    mesh = make_mesh(n_data=1, n_model=8)
    eng = _engine(cfg, shard_llava_params(params, mesh))
    with mesh:
        state = _sharded_state(eng, mesh, input_ids, pixels)
        tokens, _ = eng._decode(eng.params, state)
        tokens = np.asarray(tokens)
    np.testing.assert_array_equal(tokens, ref.tokens)


def _one_step_cache(engine, state):
    """Run exactly one ensemble decode step; return (cache, next_token)."""
    B = state.first_token.shape[0]
    T = engine.gen.max_new_tokens
    tm = TextMaskState(
        jnp.zeros((B, T), jnp.float32),
        jnp.zeros((B, T), jnp.float32),
        jnp.zeros((B, T), jnp.float32),
    )
    carry = (
        state.cache,
        state.cur_len,
        state.first_token,
        jnp.ones((B,), jnp.int32),
        jnp.full((B, T), engine.gen.pad_token_id, jnp.int32),
        jnp.zeros((B,), bool),
        tm,
        state.first_token.astype(jnp.int32),
        # lagged-KL logits carry ([B, 1] stub outside fused epis_kl)
        (
            state.last_logits
            if engine._lag_kl
            else jnp.zeros((B, 1), jnp.float32)
        ),
    )
    out = jax.jit(engine._one_step)(engine.params, state, carry)
    return out[0], np.asarray(out[2])


def test_winner_kv_scatter_under_shard_cache(tiny):
    """The winner-KV row written by one ensemble step into a sharded cache
    equals the row written into the unsharded cache (the `.at[].set`
    scatter in engine/generate.py survives the [L,B,S,KH('model'),D]
    sharding)."""
    cfg, params = tiny
    B = 2
    input_ids, pixels = _inputs(cfg, B)

    base = _engine(cfg, params)
    ref_state = base.prefill(input_ids, pixels)
    ref_cache, ref_tok = _one_step_cache(base, ref_state)

    mesh = make_mesh(n_data=2, n_model=4)
    eng = _engine(cfg, shard_llava_params(params, mesh))
    with mesh:
        state = _sharded_state(eng, mesh, input_ids, pixels)
        cache, tok = _one_step_cache(eng, state)
        k, v = np.asarray(cache.k), np.asarray(cache.v)

    np.testing.assert_array_equal(tok, ref_tok)
    cur = np.asarray(ref_state.cur_len)
    for b in range(B):
        s = int(cur[b])
        # the newly scattered row ...
        np.testing.assert_allclose(
            k[:, b, s], np.asarray(ref_cache.k)[:, b, s], atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            v[:, b, s], np.asarray(ref_cache.v)[:, b, s], atol=1e-4, rtol=1e-4
        )
        # ... and the prefill region it must not disturb
        np.testing.assert_allclose(
            k[:, b, :s], np.asarray(ref_cache.k)[:, b, :s], atol=1e-4, rtol=1e-4
        )


def test_dp_batched_generate_equals_per_row(tiny):
    """(8 data x 1 model): batched data-parallel ensemble generate ==
    per-row single-device generate.  Per-row runs pin rng_id to the row
    index (prefill assigns rng_id=arange(B), and mask draws key on
    (seed, step, rng_id) — engine/generate.py _member_drop_slots)."""
    cfg, params = tiny
    B = 8
    input_ids, pixels = _inputs(cfg, B)

    mesh = make_mesh(n_data=8, n_model=1)
    eng = _engine(cfg, shard_llava_params(params, mesh))
    with mesh:
        state = _sharded_state(eng, mesh, input_ids, pixels)
        tokens, _ = eng._decode(eng.params, state)
        batched = np.asarray(tokens)

    solo = _engine(cfg, params)
    for b in range(B):
        st = solo.prefill(input_ids[b : b + 1], pixels[b : b + 1])
        st = st._replace(rng_id=jnp.asarray([b], jnp.int32))
        row, _ = solo._decode(solo.params, st)
        np.testing.assert_array_equal(batched[b], np.asarray(row)[0])


def test_tp_sharded_int8_generate_matches_single_device(tiny):
    """TP sharding of the int8 deployment config: quantized {q,s} weight
    leaves shard with the dense specs (scales follow the output axis),
    int8 KV cache shards on its KH axis — sharded generate == unsharded
    int8 generate (fp32-scale model, 2x4 mesh)."""
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params

    cfg, params = tiny
    qparams = params._replace(lm=quantize_llama_params(params.lm))
    B = 2
    input_ids, pixels = _inputs(cfg, B)

    base = _engine(cfg, qparams)
    base.int8_kv = True
    base.__post_init__()
    ref = base.generate(input_ids, pixels)

    mesh = make_mesh(n_data=2, n_model=4)
    sp = shard_llava_params(qparams, mesh)
    # quantized leaves actually sharded on the model axis
    qp = sp.lm["layers"]["q_proj"]
    assert isinstance(qp, dict)
    assert qp["q"].sharding.spec == P(None, None, "model")
    assert qp["s"].sharding.spec == P(None, None, "model")
    assert sp.lm["layers"]["down_proj"]["s"].sharding.spec == P()

    eng = _engine(cfg, sp)
    eng.int8_kv = True
    eng.__post_init__()
    with mesh:
        state = _sharded_state(eng, mesh, input_ids, pixels)
        tokens, _ = eng._decode(eng.params, state)
        tokens = np.asarray(tokens)
    np.testing.assert_array_equal(tokens, ref.tokens)


def test_tp_decode_collective_budget(tiny):
    """The compiled TP decode program inserts a small, FIXED number of
    collectives (megatron TP needs one all-reduce after o_proj and one
    after down_proj per layer body — and lax.scan compiles the layer body
    ONCE, so the count must not scale with depth or step count).  A spec
    mistake that makes XLA reshard weights or cache inside the loop shows
    up as dozens of collectives; this pins the budget (docs/DESIGN.md
    section 4's cost model rests on it)."""
    import re

    cfg, params = tiny
    B = 2
    input_ids, pixels = _inputs(cfg, B)
    mesh = make_mesh(n_data=2, n_model=4)
    eng = _engine(cfg, shard_llava_params(params, mesh))
    with mesh:
        state = _sharded_state(eng, mesh, input_ids, pixels)
        hlo = eng._decode.lower(eng.params, state).compile().as_text()

    # count instruction DEFINITIONS ("%x = ty all-reduce(...)"), not every
    # textual mention of the op name (each def is referenced many times)
    defs = [
        l
        for l in hlo.splitlines()
        if re.search(
            r"= \S+ (all-reduce|all-gather|collective-permute|all-to-all)"
            r"(-start)?\(",
            l,
        )
    ]
    n_ar = sum(" all-reduce" in l for l in defs)
    # SPMD must actually be active: >= 4 all-reduces (2 scan bodies x
    # {o_proj, down_proj})...
    assert n_ar >= 4, (n_ar, len(defs))
    # ...and bounded: measured 18 defs total (4 megatron ARs + small
    # vote/argmax/top-k gathers over the vocab-sharded lm_head, all on
    # KB-scale operands).  The exact gather count is toolchain-dependent,
    # so this is an order-of-magnitude guard, not a pin: a spec mistake
    # that reshards weights or the cache inside the scan body produces
    # one collective per weight per layer (hundreds), well past 3x the
    # measured count.
    assert len(defs) <= 54, (n_ar, len(defs), defs[:5])


def test_tp_fused_eligible_gqa_shardmap_matches_single_device():
    """TP at PRODUCTION head geometry (Dh=128, GQA H/KH=2): decode_step
    detects the mesh (engine.tp_mesh via parallel/mesh.mesh_of) and runs
    the ensemble attention head-parallel inside shard_map — the wrapper
    that keeps the fused Pallas kernels eligible on multi-device runs
    (models/llama._tp_attend; on this CPU mesh the platform dispatch
    resolves to the XLA op, exercising the same specs/local shapes the
    TPU kernel sees).  Sharded generate must equal the unsharded run."""
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params

    cfg = _cfg(hidden=512, n_heads=4, n_kv=2)
    params = llava_mod.init_params(cfg, jax.random.key(3), jnp.float32)
    qparams = params._replace(lm=quantize_llama_params(params.lm))
    B = 4
    input_ids, pixels = _inputs(cfg, B)

    base = _engine(cfg, qparams)
    base.int8_kv = True
    base.__post_init__()
    assert base.tp_mesh is None  # unsharded params: no wrapper
    ref = base.generate(input_ids, pixels)

    mesh = make_mesh(n_data=4, n_model=2)
    eng = _engine(cfg, shard_llava_params(qparams, mesh))
    eng.int8_kv = True
    eng.__post_init__()
    assert eng.tp_mesh is mesh or eng.tp_mesh.shape == mesh.shape
    with mesh:
        state = _sharded_state(eng, mesh, input_ids, pixels)
        tokens, _ = eng._decode(eng.params, state)
        tokens = np.asarray(tokens)
    np.testing.assert_array_equal(tokens, ref.tokens)


def test_tp_int4_generate_matches_single_device(tiny):
    """int4-packed weights under TP (parallel/mesh._apply_specs {q4,s4}
    handling: column-parallel output-axis sharding, row-parallel
    replication — the packed row axis can't shard coherently): sharded
    ensemble generate == unsharded int4 run."""
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params_int4

    cfg, params = tiny
    qparams = params._replace(lm=quantize_llama_params_int4(params.lm))
    B = 2
    input_ids, pixels = _inputs(cfg, B)

    base = _engine(cfg, qparams)
    ref_out = base.generate(input_ids, pixels)

    mesh = make_mesh(n_data=2, n_model=4)
    sp = shard_llava_params(qparams, mesh)
    # column-parallel q4 sharded on output axis; row-parallel replicated
    assert sp.lm["layers"]["q_proj"]["q4"].sharding.spec[-1] == "model"
    assert sp.lm["layers"]["o_proj"]["q4"].sharding.spec == P()
    eng = _engine(cfg, sp)
    with mesh:
        state = _sharded_state(eng, mesh, input_ids, pixels)
        tokens, _ = eng._decode(eng.params, state)
    np.testing.assert_array_equal(np.asarray(tokens), ref_out.tokens)


def test_tp_decode_server_matches_solo(tiny):
    """Continuous-batching DecodeServer over TP-sharded params (2x4 mesh):
    slot-multiplexed serving tokens == the unsharded solo engine's, so the
    serving layer composes with tensor parallelism (the slot state itself
    is unsharded; GSPMD inserts the reshards at placement and the TP
    collectives inside the step body)."""
    from dropoutdecoding_tpu.engine.serving import DecodeServer

    cfg, params = tiny
    input_ids, pixels = _inputs(cfg, 3)
    reqs = {
        f"r{b}": (input_ids[b : b + 1], pixels[b : b + 1]) for b in range(3)
    }

    solo = _engine(cfg, params)
    expected = {rid: solo.generate(*a).tokens[0] for rid, a in reqs.items()}

    mesh = make_mesh(n_data=2, n_model=4)
    eng = _engine(cfg, shard_llava_params(params, mesh))
    with mesh:
        server = DecodeServer(engine=eng, n_slots=2)
        results = server.run(
            list(reqs), lambda rid: reqs[rid], batch_prefill=False
        )
    assert set(results) == set(reqs)
    for rid in reqs:
        n = len(results[rid])
        np.testing.assert_array_equal(
            results[rid], expected[rid][:n], err_msg=rid
        )
