"""Mask-policy unit tests (reference llava.py:484-685,
instructblip.py:286-508)."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from dropoutdecoding_tpu.decoding.masks import (
    build_member_drop_mask,
    epis_mask_probs,
    overlap_keep_mask,
)


def test_epis_probs_linear_map_matches_torch(rng):
    epis = rng.gamma(2.0, 1.0, size=37).astype(np.float32)
    prob = 0.7
    ours = epis_mask_probs(jnp.asarray(epis), prob, 0.1)
    t = torch.from_numpy(epis)
    q_low = torch.quantile(t, 0.0)
    q_high = torch.quantile(t, 1.0)
    ref = 0.1 + (prob - 0.1) * (t.clamp(min=q_low, max=q_high) - q_low) / (
        q_high - q_low
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_epis_probs_degenerate_masks_nothing():
    probs = epis_mask_probs(jnp.ones(8), 0.7, 0.1)
    key = jax.random.key(0)
    drop = jax.random.uniform(key, (8,)) < probs
    assert not bool(drop.any())


def test_overlap_keep():
    topk = jnp.array([[1, 2, 3], [4, 5, 6], [7, 8, 2]])
    keep = overlap_keep_mask(jnp.asarray(2), topk)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])


def test_overlap_keep_multi():
    from dropoutdecoding_tpu.decoding.masks import overlap_keep_mask_multi

    topk = jnp.array([[1, 2, 3], [4, 5, 6], [7, 8, 2]])
    keep = overlap_keep_mask_multi(jnp.array([5, 3, -1, -1]), topk)
    np.testing.assert_array_equal(np.asarray(keep), [True, True, False])
    # all-padding probes keep nothing
    keep = overlap_keep_mask_multi(jnp.array([-1, -1, -1, -1]), topk)
    assert not bool(keep.any())


def test_extract_probe_ids():
    from dropoutdecoding_tpu.engine.generate import extract_probe_ids

    ids = jnp.array([[5, 727, 9, 11, 2], [5, 6, 7, 8, 9]])
    probes = np.asarray(extract_probe_ids(ids, marker=727, max_probes=4))
    np.testing.assert_array_equal(probes[0], [9, 11, 2, -1])
    np.testing.assert_array_equal(probes[1], [-1, -1, -1, -1])


def test_epis_policy_never_drops_overlap(rng):
    epis = jnp.asarray(rng.gamma(2.0, 1.0, size=64).astype(np.float32))
    overlap = jnp.asarray(rng.random(64) < 0.3)
    drop = build_member_drop_mask(
        jax.random.key(3),
        "epis",
        epis,
        0.9,
        overlap,
        jnp.zeros(64, bool),
        accumulate=True,
    )
    assert not bool((drop & overlap).any())


def test_accumulation_is_monotone(rng):
    """LLaVA-1.5 semantics: member k's drops include member k-1's
    (minus overlap restores) — llava.py:344 (restore commented out)."""
    epis = jnp.asarray(rng.gamma(2.0, 1.0, size=128).astype(np.float32))
    overlap = jnp.zeros(128, bool)
    prev = jnp.zeros(128, bool)
    counts = []
    for m, cap in enumerate([0.3, 0.5, 0.7]):
        prev = build_member_drop_mask(
            jax.random.fold_in(jax.random.key(0), m),
            "epis",
            epis,
            cap,
            overlap,
            prev,
            accumulate=True,
        )
        counts.append(int(prev.sum()))
    assert counts[0] <= counts[1] <= counts[2]


def test_quantile_policy_deterministic_fraction(rng):
    """InstructBLIP's deterministic top-prob-quantile mask
    (instructblip.py:447-460)."""
    epis = jnp.asarray(rng.normal(size=100).astype(np.float32))
    drop = build_member_drop_mask(
        jax.random.key(0),
        "epis_quantile",
        epis,
        0.3,
        jnp.zeros(100, bool),
        jnp.zeros(100, bool),
        accumulate=False,
    )
    # top 30% by epis => ~30 tokens (quantile interpolation boundary ±1)
    assert 29 <= int(drop.sum()) <= 31
    # matches torch.quantile-based reference
    t = torch.from_numpy(np.asarray(epis))
    thr = torch.quantile(t, 1 - 0.3)
    ref = (t >= thr).numpy()
    np.testing.assert_array_equal(np.asarray(drop), ref)


def test_all_image_and_none():
    epis = jnp.ones(16)
    z = jnp.zeros(16, bool)
    assert bool(
        build_member_drop_mask(jax.random.key(0), "all_image", epis, 0.5, z, z, False).all()
    )
    assert not bool(
        build_member_drop_mask(jax.random.key(0), "none", epis, 0.5, z, z, False).any()
    )


def test_aggressive_fixed_count():
    epis = jnp.ones(100)
    z = jnp.zeros(100, bool)
    drop = build_member_drop_mask(
        jax.random.key(0), "aggressive", epis, 0.3, z, z, False
    )
    # int(prob * (N-1)) — reference llava.py:578 counts end-start (excl.)
    assert int(drop.sum()) == int(0.3 * 99)
