"""Golden tests for the uncertainty math against the reference formulas
(reference models/llava.py:687-776), evaluated with torch on CPU."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dropoutdecoding_tpu.ops.uncertainty import (
    entropy_varentropy,
    kl_to_current,
    lowest_percent_kl_indices_mask,
    topk_token_ids,
    vision_uncertainty,
)


def torch_vision_uncertainty(logits):
    """Verbatim formulas from reference llava.py:710-756."""
    probs = F.softmax(logits, dim=-1)
    variance_per_token = torch.var(probs, dim=-1)
    variance = torch.mean(variance_per_token, dim=-1)
    p_avg = torch.mean(probs, dim=1)
    epi = torch.sum(
        probs * (torch.log(probs + 1e-10) - torch.log(p_avg.unsqueeze(1) + 1e-10)),
        dim=-1,
    )
    alea = -torch.sum(probs * torch.log(probs + 1e-10), dim=-1)
    return {
        "variance_per_token": variance_per_token,
        "epis_uncert_per_token": epi,
        "alea_uncert_per_token": alea,
        "variance": variance,
        "epis_uncert": torch.mean(epi, dim=-1),
        "alea_uncert": torch.mean(alea, dim=-1),
    }


def test_vision_uncertainty_matches_reference_formulas(rng):
    logits = rng.normal(size=(2, 7, 97)).astype(np.float32) * 3.0
    ours = vision_uncertainty(jnp.asarray(logits))
    ref = torch_vision_uncertainty(torch.from_numpy(logits))
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ours[k]), ref[k].numpy(), rtol=1e-4, atol=1e-5, err_msg=k
        )


def test_entropy_varentropy(rng):
    logits = rng.normal(size=(53,)).astype(np.float32) * 2.0
    e, v = entropy_varentropy(jnp.asarray(logits))
    # reference llava.py:687-708
    log_probs = F.log_softmax(torch.from_numpy(logits), dim=-1)
    probs = torch.exp(log_probs)
    ref_e = -torch.sum(probs * log_probs) / np.log(2)
    ref_v = torch.sum(probs * (log_probs / np.log(2) + ref_e) ** 2)
    np.testing.assert_allclose(float(e), float(ref_e), rtol=1e-5)
    np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-4, atol=1e-5)


def test_topk_ids_match_torch(rng):
    logits = rng.normal(size=(1, 11, 31)).astype(np.float32)
    _, ids = topk_token_ids(jnp.asarray(logits), 5)
    _, tids = torch.topk(torch.from_numpy(logits), 5, dim=-1)
    np.testing.assert_array_equal(np.asarray(ids), tids.numpy())


def test_kl_matches_torch_kl_div(rng):
    image_logits = rng.normal(size=(9, 41)).astype(np.float32)
    cur = rng.normal(size=(41,)).astype(np.float32)
    ours = kl_to_current(jnp.asarray(image_logits), jnp.asarray(cur))
    ref = F.kl_div(
        F.log_softmax(torch.from_numpy(image_logits), dim=-1),
        F.softmax(torch.from_numpy(cur), dim=-1).expand(9, 41),
        reduction="none",
    ).sum(dim=-1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_lowest_kl_mask_count(rng):
    image_logits = jnp.asarray(rng.normal(size=(40, 17)).astype(np.float32))
    cur = jnp.asarray(rng.normal(size=(17,)).astype(np.float32))
    mask = lowest_percent_kl_indices_mask(image_logits, cur, percent=0.1)
    assert int(mask.sum()) == 4


def test_exact_top_k_ids_matches_lax_top_k(rng):
    """exact_top_k_ids must reproduce lax.top_k's indices exactly,
    including tie order (lower index first), on random and tied inputs."""
    import jax
    import jax.numpy as jnp

    from dropoutdecoding_tpu.ops.uncertainty import exact_top_k_ids

    x = jnp.asarray(rng.normal(size=(7, 500)).astype(np.float32))
    for k in (1, 5, 10):
        ref = jax.lax.top_k(x, k)[1]
        got = exact_top_k_ids(x, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # ties: repeated values must come out in index order
    t = jnp.asarray(
        np.array([[1.0, 3.0, 3.0, 2.0, 3.0, 0.5]], np.float32)
    )
    ref = jax.lax.top_k(t, 4)[1]
    got = exact_top_k_ids(t, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_vision_uncertainty_valid_mask_equals_compacted(rng):
    """valid-aware uncertainty == running the plain formula on just the
    valid rows (the LLaVA-NeXT statically-padded span case)."""
    from dropoutdecoding_tpu.ops.uncertainty import vision_uncertainty

    logits = jnp.asarray(rng.normal(size=(2, 12, 64)).astype(np.float32) * 2)
    valid = np.zeros((2, 12), bool)
    valid[0, :7] = True
    valid[1, :10] = True

    got = vision_uncertainty(logits, valid=jnp.asarray(valid))
    for b, n in ((0, 7), (1, 10)):
        ref = vision_uncertainty(logits[b : b + 1, :n])
        np.testing.assert_allclose(
            np.asarray(got["epis_uncert_per_token"])[b, :n],
            np.asarray(ref["epis_uncert_per_token"])[0],
            rtol=1e-5, atol=1e-6,
        )
        for k in ("variance", "epis_uncert", "alea_uncert"):
            np.testing.assert_allclose(
                np.asarray(got[k])[b], np.asarray(ref[k])[0],
                rtol=1e-5, atol=1e-6, err_msg=k,
            )
