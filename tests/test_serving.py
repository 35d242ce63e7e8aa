"""Continuous-batching server: outputs must equal per-request engine
generation even with staggered submission (requests joining mid-flight)."""
import numpy as np
import pytest

import jax.numpy as jnp

from dropoutdecoding_tpu.engine.generate import LlavaEngine
from dropoutdecoding_tpu.engine.serving import DecodeServer
from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


def _engine(cfg, params, **kw):
    defaults = dict(
        cfg=cfg,
        params=params,
        gen=GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0),
        max_len=64,
        ensemble=True,
        ens=EnsembleConfig(mask_policy="epis"),
        seed=24,
    )
    defaults.update(kw)
    e = LlavaEngine(**defaults)
    e.param_dtype = jnp.float32
    return e


def _requests(rng, n):
    reqs = {}
    for i in range(n):
        pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
        ids = np.array([[1, 5, 9, 32, 11, 13 + i]])  # vary the prompt tail
        reqs[f"r{i}"] = (ids, pixels)
    return reqs


def test_server_matches_per_request_engine(tiny_llava, rng):
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params)
    reqs = _requests(rng, 3)

    expected = {
        rid: eng.generate(*args).tokens[0] for rid, args in reqs.items()
    }

    server = DecodeServer(engine=eng, n_slots=2)  # fewer slots than requests
    results = server.run(list(reqs), lambda rid: reqs[rid])
    assert set(results) == set(reqs)
    for rid in reqs:
        n = len(results[rid])
        np.testing.assert_array_equal(results[rid], expected[rid][:n], err_msg=rid)
        assert n == 6  # no eos in this tiny model run => full budget


def test_server_staggered_submission(tiny_llava, rng):
    """Submit one request, advance a few steps, then add another — the
    late joiner must still match its solo generation."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params)
    reqs = _requests(rng, 2)
    solo = {rid: eng.generate(*args).tokens[0] for rid, args in reqs.items()}

    server = DecodeServer(engine=eng, n_slots=4)
    server.submit("r0", *reqs["r0"])
    for _ in range(3):
        server.step()
    server.submit("r1", *reqs["r1"])
    results = {}
    for _ in range(12):
        server.step()
        results.update(server.harvest())
        if len(results) == 2:
            break
    np.testing.assert_array_equal(results["r0"], solo["r0"])
    np.testing.assert_array_equal(results["r1"], solo["r1"])


def test_server_fused_mode(tiny_llava, rng):
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params, ens=EnsembleConfig(mask_policy="epis", fused_step=True))
    reqs = _requests(rng, 2)
    solo = {rid: eng.generate(*args).tokens[0] for rid, args in reqs.items()}
    server = DecodeServer(engine=eng, n_slots=2)
    results = server.run(list(reqs), lambda rid: reqs[rid])
    for rid in reqs:
        np.testing.assert_array_equal(results[rid], solo[rid], err_msg=rid)


def test_server_int8_kv(tiny_llava, rng):
    """Continuous batching over an int8-quantized slot cache: server
    results equal the same engine's solo generate (rng_id pinned by
    submit), exercising cache_copy_slot on {"q","s"} leaves."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params, int8_kv=True)
    reqs = _requests(rng, 2)
    solo = {rid: eng.generate(*args).tokens[0] for rid, args in reqs.items()}
    server = DecodeServer(engine=eng, n_slots=2)
    results = server.run(list(reqs), lambda rid: reqs[rid])
    for rid in reqs:
        np.testing.assert_array_equal(results[rid], solo[rid], err_msg=rid)


def test_server_epis_kl(tiny_llava, rng):
    """epis_kl serving (round-1 VERDICT weak #8): the per-slot [N, V]
    image-logits buffer makes the KL keep-set available to the shared
    step program; server results equal solo generates."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params, ens=EnsembleConfig(mask_policy="epis_kl"))
    reqs = _requests(rng, 2)
    solo = {rid: eng.generate(*args).tokens[0] for rid, args in reqs.items()}
    server = DecodeServer(engine=eng, n_slots=2)
    results = server.run(list(reqs), lambda rid: reqs[rid])
    for rid in reqs:
        np.testing.assert_array_equal(results[rid], solo[rid], err_msg=rid)


def test_submit_many_matches_sequential_submit(tiny_llava, rng):
    """One batched prefill dispatch (submit_many, round-2 verdict weak #6)
    must produce token-identical generations to per-request submit(),
    including variable prompt lengths (right-padded + text_lens)."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params)
    reqs = {}
    for i, tail in enumerate([[11, 13], [11], [7, 13, 5]]):
        pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
        ids = np.array([[1, 5, 9, 32] + tail])
        reqs[f"r{i}"] = (ids, pixels)

    seq = DecodeServer(engine=eng, n_slots=4)
    for rid, args in reqs.items():
        seq.submit(rid, *args)
    batched = DecodeServer(engine=eng, n_slots=4)
    batched.submit_many(list(reqs.items()))

    for _ in range(6):
        seq.step()
        batched.step()
    a = seq.harvest()
    b = batched.harvest()
    assert set(a) == set(b) == set(reqs)
    for rid in reqs:
        np.testing.assert_array_equal(a[rid], b[rid], err_msg=rid)


def test_server_fused_epis_kl_lagged(tiny_llava, rng):
    """Fused epis_kl (the lagged-logits variant, round-2 verdict item 9)
    now runs end-to-end: the decode loop and the server carry the previous
    step's unmasked logits for the KL keep-set; server == solo."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(
        cfg, params,
        ens=EnsembleConfig(mask_policy="epis_kl", fused_step=True),
    )
    assert eng._lag_kl
    reqs = _requests(rng, 2)
    solo = {rid: eng.generate(*args).tokens[0] for rid, args in reqs.items()}
    server = DecodeServer(engine=eng, n_slots=2)
    results = server.run(list(reqs), lambda rid: reqs[rid])
    for rid in reqs:
        np.testing.assert_array_equal(results[rid], solo[rid], err_msg=rid)


def test_step_chunk_matches_per_step(tiny_llava, rng):
    """Multi-step dispatch (step(n) fori_loop) must be token-identical to
    n single steps — the dispatch-amortization lever for remote-attached
    accelerators (round-2 verdict weak #6)."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params)
    reqs = _requests(rng, 2)

    a = DecodeServer(engine=eng, n_slots=2)
    b = DecodeServer(engine=eng, n_slots=2)
    for rid, args in reqs.items():
        a.submit(rid, *args)
        b.submit(rid, *args)
    for _ in range(6):
        a.step()
    b.step(3)
    b.step(3)
    ra, rb = a.harvest(), b.harvest()
    assert set(ra) == set(rb) == set(reqs)
    for rid in reqs:
        np.testing.assert_array_equal(ra[rid], rb[rid], err_msg=rid)


def test_server_int4_weights(tiny_llava, rng):
    """int4-packed LM tower through the serving path: server output ==
    per-request generation on the same quantized params (the {q4,s4}
    _mm dispatch inside the server's jitted step/placement programs)."""
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params_int4

    _, cfg, params, _, _, _ = tiny_llava
    qparams = params._replace(lm=quantize_llama_params_int4(params.lm))
    eng = _engine(cfg, qparams, int8_kv=True)
    reqs = _requests(rng, 3)
    expected = {
        rid: eng.generate(*args).tokens[0] for rid, args in reqs.items()
    }
    server = DecodeServer(engine=eng, n_slots=2)
    results = server.run(list(reqs), lambda rid: reqs[rid])
    for rid in reqs:
        np.testing.assert_array_equal(
            results[rid], expected[rid][: len(results[rid])], err_msg=rid
        )


def test_server_do_sample_matches_solo(tiny_llava, rng):
    """Sampled decoding through the server == solo sampled generation:
    the placement program draws the first token from the prompt logits
    with the same (seed, step 0, rng stream) key the solo loop uses, and
    per-step draws key off per-slot steps/rng_id."""
    _, cfg, params, _, _, _ = tiny_llava
    gen_s = GenerationConfig(
        max_new_tokens=6, eos_token_id=-1, pad_token_id=0,
        do_sample=True, temperature=3.0,
    )
    eng = _engine(cfg, params, gen=gen_s)
    reqs = _requests(rng, 3)
    expected = {
        rid: eng.generate(*args).tokens[0] for rid, args in reqs.items()
    }
    server = DecodeServer(engine=eng, n_slots=2)
    results = server.run(list(reqs), lambda rid: reqs[rid])
    for rid in reqs:
        np.testing.assert_array_equal(
            results[rid], expected[rid][: len(results[rid])], err_msg=rid
        )
    # batched placement path too
    server2 = DecodeServer(engine=eng, n_slots=4)
    results2 = server2.run(list(reqs), lambda rid: reqs[rid],
                           batch_prefill=True)
    for rid in reqs:
        np.testing.assert_array_equal(
            results2[rid], expected[rid][: len(results2[rid])], err_msg=rid
        )


def test_per_request_max_new_tokens(tiny_llava, rng):
    """Per-request token budgets: a request submitted with
    max_new_tokens=k is harvested with exactly k tokens that are a
    prefix of its solo generation; other slots keep their full budget."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params)
    reqs = _requests(rng, 2)
    expected = {
        rid: eng.generate(*args).tokens[0] for rid, args in reqs.items()
    }

    server = DecodeServer(engine=eng, n_slots=2)
    server.submit("r0", *reqs["r0"], max_new_tokens=3)
    server.submit("r1", *reqs["r1"])  # full budget (6)
    results = {}
    for _ in range(8):
        server.step()
        results.update(server.harvest())
        if len(results) == 2:
            break
    assert len(results["r0"]) == 3
    np.testing.assert_array_equal(results["r0"], expected["r0"][:3])
    assert len(results["r1"]) == 6
    np.testing.assert_array_equal(results["r1"], expected["r1"])
    # the freed slot is immediately reusable with a fresh budget
    server.submit("r2", *reqs["r0"], max_new_tokens=2)
    for _ in range(4):
        server.step()
        results.update(server.harvest())
        if "r2" in results:
            break
    np.testing.assert_array_equal(results["r2"], expected["r0"][:2])
    # out-of-range budgets rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_new_tokens"):
        server.submit("bad", *reqs["r1"], max_new_tokens=99)


def test_cancel_frees_slot_and_preserves_others(tiny_llava, rng):
    """cancel(): the aborted request's slot frees without disturbing the
    other stream's tokens; unknown ids return False."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params)
    reqs = _requests(rng, 3)
    expected = eng.generate(*reqs["r0"]).tokens[0]

    srv = DecodeServer(engine=eng, n_slots=2)
    srv.submit("r0", *reqs["r0"])
    srv.submit("r1", *reqs["r1"])
    srv.step()
    assert srv.cancel("r1") is True
    assert srv.cancel("nope") is False
    results = {}
    for _ in range(8):
        srv.step()
        results.update(srv.harvest())
        if "r0" in results:
            break
    assert "r1" not in results
    np.testing.assert_array_equal(results["r0"], expected)
    # the freed slot is reusable
    srv.submit("r2", *reqs["r2"])
    assert srv.active() == 1
