"""LLaVA-NeXT parity vs tiny HF models: anyres geometry, spatial_unpad
packing, and end-to-end greedy generate (reference llavanext.py:388-427
pipeline)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dropoutdecoding_tpu.engine.llavanext_engine import LlavaNextEngine
from dropoutdecoding_tpu.models import llavanext as next_mod
from dropoutdecoding_tpu.utils.config import (
    EnsembleConfig,
    GenerationConfig,
    LlavaNextConfig,
)
from dropoutdecoding_tpu.utils.hf_io import state_dict_from_torch_module

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)

PINPOINTS = [[28, 56], [56, 28], [56, 56]]


@pytest.fixture(scope="module")
def tiny_llava_next():
    from transformers import (
        CLIPVisionConfig as HFVCfg,
        LlavaNextConfig as HFCfg,
        LlavaNextForConditionalGeneration,
        MistralConfig as HFMCfg,
    )

    torch.manual_seed(21)
    hf_cfg = HFCfg(
        vision_config=HFVCfg(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            image_size=28,
            patch_size=7,
        ).to_dict(),
        text_config=HFMCfg(
            vocab_size=64,
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
        ).to_dict(),
        image_token_index=32,
        image_grid_pinpoints=PINPOINTS,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        attn_implementation="eager",
    )
    model = LlavaNextForConditionalGeneration(hf_cfg).eval().float()
    d = hf_cfg.to_dict()
    d["text_config"]["num_key_value_heads"] = 2
    cfg = LlavaNextConfig.from_hf_dict(d)
    params = next_mod.params_from_hf(
        cfg, state_dict_from_torch_module(model), jnp.float32
    )
    return model, cfg, params


def test_geometry_matches_hf():
    from transformers.models.llava_next.modeling_llava_next import (
        image_size_to_num_patches,
    )

    cfg = LlavaNextConfig(
        vision=LlavaNextConfig().vision.__class__(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, image_size=28, patch_size=7,
        ),
        image_grid_pinpoints=tuple(tuple(p) for p in PINPOINTS),
    )
    for size in [(40, 50), (50, 40), (100, 30), (28, 28), (333, 444)]:
        geo = next_mod.image_geometry(size, cfg)
        n_tiles_hf = image_size_to_num_patches(list(size), PINPOINTS, 28)
        assert geo["n_tiles"] == n_tiles_hf, (size, geo, n_tiles_hf)


def test_geometry_sweep_vs_hf(rng):
    """Property sweep: tile counts and packed token lengths must match HF
    across 200 random image sizes (host-side geometry only — cheap)."""
    from transformers.models.llava_next.modeling_llava_next import (
        get_anyres_image_grid_shape,
        image_size_to_num_patches,
        unpad_image,
    )
    import torch

    cfg = LlavaNextConfig(
        vision=LlavaNextConfig().vision.__class__(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, image_size=28, patch_size=7,
        ),
        image_grid_pinpoints=tuple(tuple(p) for p in PINPOINTS),
    )
    cells = 4
    for _ in range(200):
        h = int(rng.integers(10, 400))
        w = int(rng.integers(10, 400))
        geo = next_mod.image_geometry((h, w), cfg)
        assert geo["n_tiles"] == image_size_to_num_patches([h, w], PINPOINTS, 28)
        gh, gw = get_anyres_image_grid_shape((h, w), PINPOINTS, 28)
        assert geo["grid"] == (gh, gw), (h, w)
        # packed length == base + unpadded rows x (cols + newline)
        t = torch.zeros(1, gh * cells, gw * cells)
        un = unpad_image(t, (h, w))
        uh, uw = un.shape[1], un.shape[2]
        assert geo["n_tokens"] == 16 + uh * (uw + 1), (h, w, geo)


def test_packing_matches_hf_pack_image_features(tiny_llava_next, rng):
    model, cfg, params, = tiny_llava_next
    for size in [(40, 50), (100, 30), (30, 95)]:
        geo = next_mod.image_geometry(size, cfg)
        n_tiles = geo["n_tiles"]
        feats = rng.normal(size=(n_tiles, 16, 48)).astype(np.float32)

        with torch.no_grad():
            ref, lens = model.model.pack_image_features(
                [torch.from_numpy(feats)],
                image_sizes=torch.tensor([list(size)]),
                vision_feature_select_strategy="default",
                image_newline=model.model.image_newline,
            )
        if isinstance(ref, list):  # newer HF returns a list per image
            ref = ref[0]
        ref = ref.numpy()
        assert int(lens[0]) == geo["n_tokens"]

        gather_idx, valid = next_mod.packing_indices(cfg, geo, next_mod.max_image_tokens(cfg))
        newline = model.model.image_newline.detach().numpy()
        flat = np.concatenate([feats.reshape(-1, 48), newline[None]], 0)
        ours = flat[gather_idx][: geo["n_tokens"]]
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6, err_msg=str(size))


def test_greedy_generate_matches_hf(tiny_llava_next):
    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor

    model, cfg, params = tiny_llava_next
    rng = np.random.default_rng(9)

    # synthetic image 40x50 -> tiles via our anyres preprocessor
    from PIL import Image

    img = Image.fromarray(
        (rng.random((40, 50, 3)) * 255).astype(np.uint8), "RGB"
    )
    prep = LlavaNextImagePreprocessor(PINPOINTS, tile_size=28)
    tiles, orig = prep(img)
    geo = next_mod.image_geometry(orig, cfg)

    input_ids = np.array([[1, 5, 9, 32, 11, 13]])
    hf_ids = np.array([[1, 5, 9] + [32] * geo["n_tokens"] + [11, 13]])
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.from_numpy(hf_ids),
            pixel_values=torch.from_numpy(tiles[None]).float(),
            image_sizes=torch.tensor([list(orig)]),
            attention_mask=torch.ones_like(torch.from_numpy(hf_ids)),
            max_new_tokens=6,
            do_sample=False,
        )
    ref_new = ref[0, hf_ids.shape[1] :].numpy()

    eng = LlavaNextEngine(
        cfg=cfg,
        params=params,
        gen=GenerationConfig(max_new_tokens=6, eos_token_id=63, pad_token_id=63),
        max_len=next_mod.max_image_tokens(cfg) + 32,
        ensemble=False,
    )
    eng.param_dtype = jnp.float32
    out = eng.generate(input_ids, tiles[None] if tiles.ndim == 3 else tiles, orig)
    n = min(len(ref_new), out.num_tokens[0])
    np.testing.assert_array_equal(out.tokens[0, :n], ref_new[:n])


def test_ensemble_runs_with_validity_mask(tiny_llava_next):
    model, cfg, params = tiny_llava_next
    rng = np.random.default_rng(10)
    from PIL import Image

    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor

    img = Image.fromarray((rng.random((30, 95, 3)) * 255).astype(np.uint8), "RGB")
    prep = LlavaNextImagePreprocessor(PINPOINTS, tile_size=28)
    tiles, orig = prep(img)
    eng = LlavaNextEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(mask_policy="epis", mask_accumulate=False, topk=10),
        gen=GenerationConfig(max_new_tokens=4, eos_token_id=63, pad_token_id=63),
        max_len=next_mod.max_image_tokens(cfg) + 32,
        ensemble=True,
        seed=506,
    )
    eng.param_dtype = jnp.float32
    out = eng.generate(np.array([[1, 5, 32, 11]]), tiles, orig)
    assert out.tokens.shape == (1, 4)


def test_batched_generate_equals_per_row(tiny_llava_next):
    """B=3 mixed aspect ratios (different tile counts and image positions)
    through ONE compiled batched prefill == per-row runs (VERDICT round-1
    weak #7: the B=1 restriction is lifted).  Per-row runs pin rng_id to
    the row index (batched prefill assigns rng_id=arange(B))."""
    from PIL import Image

    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor

    model, cfg, params = tiny_llava_next
    rng = np.random.default_rng(11)
    prep = LlavaNextImagePreprocessor(PINPOINTS, tile_size=28)
    sizes = [(40, 50), (30, 95), (64, 40)]
    tiles, origs = [], []
    for hw in sizes:
        img = Image.fromarray(
            (rng.random(hw + (3,)) * 255).astype(np.uint8), "RGB"
        )
        t, o = prep(img)
        tiles.append(t)
        origs.append(o)
    assert len({t.shape[0] for t in tiles}) > 1  # genuinely mixed tile counts

    # image token at different positions per row (same prompt length)
    input_ids = np.array([[1, 5, 32, 11], [1, 32, 9, 11], [32, 5, 9, 11]])

    def eng():
        e = LlavaNextEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(mask_policy="epis", mask_accumulate=False, topk=10),
            gen=GenerationConfig(max_new_tokens=4, eos_token_id=63, pad_token_id=63),
            max_len=next_mod.max_image_tokens(cfg) + 32,
            ensemble=True,
            seed=506,
        )
        e.param_dtype = jnp.float32
        return e

    batched = eng().generate(input_ids, tiles, origs)
    assert batched.tokens.shape == (3, 4)

    solo = eng()
    for b in range(3):
        st = solo.prefill(input_ids[b : b + 1], tiles[b], origs[b])
        st = st._replace(rng_id=jnp.asarray([b], jnp.int32))
        row, _ = solo._decode(solo.params, st)
        np.testing.assert_array_equal(
            batched.tokens[b], np.asarray(row)[0], err_msg=f"row {b}"
        )


def test_variable_length_batched_prefill_equals_per_row(tiny_llava_next):
    """Variable TEXT lengths on top of variable tile counts: right-padded
    rows + text_lens reproduce each row's own unpadded prefill (batched
    POPE for LLaVA-NeXT)."""
    from PIL import Image

    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor

    model, cfg, params = tiny_llava_next
    rng = np.random.default_rng(12)
    prep = LlavaNextImagePreprocessor(PINPOINTS, tile_size=28)
    sizes = [(40, 50), (30, 95), (64, 40)]
    tiles, origs = [], []
    for hw in sizes:
        img = Image.fromarray(
            (rng.random(hw + (3,)) * 255).astype(np.uint8), "RGB"
        )
        t, o = prep(img)
        tiles.append(t)
        origs.append(o)

    rows = [[1, 5, 32, 11, 7], [1, 32, 9], [32, 5, 9, 11]]
    S = max(len(r) for r in rows)
    ids = np.zeros((3, S), np.int32)
    lens = np.array([len(r) for r in rows], np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r

    e = LlavaNextEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(mask_policy="epis", mask_accumulate=False, topk=10),
        gen=GenerationConfig(max_new_tokens=4, eos_token_id=63, pad_token_id=63),
        max_len=next_mod.max_image_tokens(cfg) + 32,
        ensemble=True,
        seed=506,
    )
    e.param_dtype = jnp.float32

    batched = e.prefill(ids, tiles, origs, text_lens=lens)
    for i, r in enumerate(rows):
        single = e.prefill(
            np.asarray([r], np.int32), tiles[i], tuple(origs[i])
        )
        assert int(batched.cur_len[i]) == int(single.cur_len[0]), i
        assert int(batched.first_token[i]) == int(single.first_token[0]), i
        np.testing.assert_allclose(
            np.asarray(batched.last_logits[i]),
            np.asarray(single.last_logits[0]),
            atol=2e-4, rtol=1e-4,
        )


def test_probe_matches_prefill_with_image_dedupe(tiny_llava_next):
    """Lite probe == full prefill first_token/last_logits, incl. anyres
    tile dedupe via image_index (unique images' tile stacks only)."""
    from PIL import Image

    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor

    model, cfg, params = tiny_llava_next
    rng = np.random.default_rng(21)
    prep = LlavaNextImagePreprocessor(PINPOINTS, tile_size=28)
    # 2 unique images (different tile counts) for 4 rows
    sizes = [(40, 50), (30, 95)]
    u_tiles, u_origs = [], []
    for hw in sizes:
        img = Image.fromarray(
            (rng.random(hw + (3,)) * 255).astype(np.uint8), "RGB"
        )
        t, o = prep(img)
        u_tiles.append(t)
        u_origs.append(o)
    image_index = np.array([0, 0, 1, 1], np.int32)
    tiles = [u_tiles[i] for i in image_index]
    origs = [u_origs[i] for i in image_index]

    rows = [[1, 5, 32, 11, 7], [1, 32, 9], [32, 5, 9, 11], [1, 6, 32]]
    S = max(len(r) for r in rows)
    ids = np.zeros((4, S), np.int32)
    lens = np.array([len(r) for r in rows], np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r

    e = LlavaNextEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(mask_policy="epis", mask_accumulate=False, topk=10),
        gen=GenerationConfig(max_new_tokens=4, eos_token_id=63, pad_token_id=63),
        max_len=next_mod.max_image_tokens(cfg) + 32,
        ensemble=True,
        seed=506,
    )
    e.param_dtype = jnp.float32

    ref = e.prefill(ids, tiles, origs, text_lens=lens)
    probe = e.probe(ids, tiles, origs, text_lens=lens)
    np.testing.assert_array_equal(
        np.asarray(probe.first_token), np.asarray(ref.first_token)
    )
    np.testing.assert_allclose(
        np.asarray(probe.last_logits), np.asarray(ref.last_logits),
        atol=1e-5, rtol=1e-5,
    )
    deduped = e.probe(
        ids, u_tiles, u_origs, text_lens=lens, image_index=image_index
    )
    np.testing.assert_array_equal(
        np.asarray(deduped.first_token), np.asarray(ref.first_token)
    )
    np.testing.assert_allclose(
        np.asarray(deduped.last_logits), np.asarray(ref.last_logits),
        atol=1e-5, rtol=1e-5,
    )


def test_int4_weights_generate_matches_fp_structure(tiny_llava_next):
    """int4-quantized Mistral tower (GQA; quantize_llama_params_int4 via
    the shared llama _mm dispatch) through the LLaVA-NeXT engine: the
    ensemble generate runs and the greedy tokens equal a generate on the
    explicitly dequantized dense tower (the dispatch math, not drift)."""
    from dropoutdecoding_tpu.utils.quantize import (
        dequantize_matrix,
        dequantize_matrix_int4,
        quantize_llama_params_int4,
    )

    model, cfg, params = tiny_llava_next
    q4 = quantize_llama_params_int4(params.lm)
    dense_lm = {
        k: (
            {
                n: (
                    dequantize_matrix_int4(w)
                    if isinstance(w, dict) and "q4" in w
                    else dequantize_matrix(w) if isinstance(w, dict) else w
                )
                for n, w in v.items()
            }
            if k == "layers"
            else (
                dequantize_matrix_int4(v)
                if isinstance(v, dict) and "q4" in v
                else dequantize_matrix(v) if isinstance(v, dict) else v
            )
        )
        for k, v in q4.items()
    }
    rng = np.random.default_rng(11)
    from PIL import Image

    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor

    img = Image.fromarray((rng.random((30, 95, 3)) * 255).astype(np.uint8), "RGB")
    tiles, orig = LlavaNextImagePreprocessor(PINPOINTS, tile_size=28)(img)

    def mk(lm):
        e = LlavaNextEngine(
            cfg=cfg,
            params=params._replace(lm=lm),
            ens=EnsembleConfig(),
            gen=GenerationConfig(max_new_tokens=4, eos_token_id=-1, pad_token_id=0),
            max_len=next_mod.max_image_tokens(cfg) + 32,
            ensemble=False,
            seed=506,
        )
        e.param_dtype = jnp.float32
        return e

    ids = np.array([[1, 5, 32, 11]])
    tq = mk(q4).generate(ids, tiles, orig).tokens
    td = mk(dense_lm).generate(ids, tiles, orig).tokens
    np.testing.assert_array_equal(tq, td)


def test_tp_sharded_generate_matches_single_device(tiny_llava_next):
    """LLaVA-NeXT under the (2 data x 4 model) TP mesh
    (parallel/mesh.shard_llavanext_params — CLIP + projector + Mistral
    GQA megatron specs, image_newline replicated): greedy generate with
    sharded params == the unsharded run, GSPMD resolving placement from
    the parameter shardings alone."""
    from dropoutdecoding_tpu.parallel.mesh import (
        make_mesh,
        shard_llavanext_params,
    )

    model, cfg, params = tiny_llava_next
    rng = np.random.default_rng(12)
    from PIL import Image

    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor

    img = Image.fromarray((rng.random((30, 95, 3)) * 255).astype(np.uint8), "RGB")
    tiles, orig = LlavaNextImagePreprocessor(PINPOINTS, tile_size=28)(img)

    def mk(p):
        e = LlavaNextEngine(
            cfg=cfg,
            params=p,
            ens=EnsembleConfig(),
            gen=GenerationConfig(max_new_tokens=5, eos_token_id=-1, pad_token_id=0),
            max_len=next_mod.max_image_tokens(cfg) + 32,
            ensemble=False,
            seed=506,
        )
        e.param_dtype = jnp.float32
        return e

    ids = np.array([[1, 5, 32, 11]])
    ref = mk(params).generate(ids, tiles, orig).tokens

    mesh = make_mesh(n_data=2, n_model=4)
    sp = shard_llavanext_params(params, mesh)
    with mesh:
        tokens = mk(sp).generate(ids, tiles, orig).tokens
    np.testing.assert_array_equal(tokens, ref)


def test_opera_matches_beam_at_zero_penalty(tiny_llava_next):
    """OPERA over the LLaVA-NeXT engine's state (the --opera CLI arm's
    third family): penalty_weights=0 with a full candidate pool must
    equal plain beam search on the same anyres prefill."""
    from PIL import Image

    from dropoutdecoding_tpu.engine.baselines import beam_generate
    from dropoutdecoding_tpu.engine.opera import opera_generate
    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor

    model, cfg, params = tiny_llava_next
    rng = np.random.default_rng(21)
    img = Image.fromarray(
        (rng.random((40, 50, 3)) * 255).astype(np.uint8), "RGB"
    )
    prep = LlavaNextImagePreprocessor(PINPOINTS, tile_size=28)
    tiles, orig = prep(img)
    input_ids = np.array([[1, 5, 9, 32, 11, 13]])
    eng = LlavaNextEngine(
        cfg=cfg,
        params=params,
        gen=GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                             pad_token_id=0, num_beams=2),
        max_len=next_mod.max_image_tokens(cfg) + 32,
        ensemble=False,
    )
    eng.param_dtype = jnp.float32
    state = eng.prefill(
        input_ids, tiles[None] if tiles.ndim == 3 else tiles, orig
    )
    beam = beam_generate(eng, state=state, num_beams=2)
    op = opera_generate(
        eng, state=state, num_beams=2, penalty_weights=0.0,
        num_attn_candidates=4, threshold=10**6,
    )
    np.testing.assert_array_equal(op.tokens, beam.tokens)
