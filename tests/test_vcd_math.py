"""VCD math vs the reference formulas (vcd_sample.py:150-153,
vcd_add_noise.py:3-28)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from dropoutdecoding_tpu.decoding.vcd import contrastive_logits, diffusion_noise


def test_contrastive_logits_match_torch_formula(rng):
    l = rng.normal(size=(2, 50)).astype(np.float32)
    l_cd = rng.normal(size=(2, 50)).astype(np.float32)
    alpha, beta = 0.5, 0.1
    ours = np.asarray(contrastive_logits(jnp.asarray(l), jnp.asarray(l_cd), alpha, beta))

    tl, tcd = torch.from_numpy(l), torch.from_numpy(l_cd)
    cutoff = torch.log(torch.tensor(beta)) + tl.max(dim=-1, keepdim=True).values
    diffs = (1 + alpha) * tl - alpha * tcd
    ref = diffs.masked_fill(tl < cutoff, -float("inf")).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    assert np.isinf(ours).any()  # cutoff actually fires


def test_diffusion_noise_schedule_matches_torch():
    """Same alphas_prod scaling factors as the reference schedule."""
    x = jnp.ones((1, 3, 4, 4))
    noised = diffusion_noise(jax.random.key(0), x, 500)
    # torch reference coefficients
    betas = torch.sigmoid(torch.linspace(-6, 6, 1000)) * (0.5e-2 - 1e-5) + 1e-5
    alphas_prod = torch.cumprod(1 - betas, dim=0)
    a_t = float(torch.sqrt(alphas_prod[500]))
    om_t = float(torch.sqrt(1 - alphas_prod[500]))
    # E[noised] = a_t * x; check the deterministic part by averaging noise out
    keys = [jax.random.key(i) for i in range(200)]
    mean = np.mean([np.asarray(diffusion_noise(k, x, 500)) for k in keys])
    np.testing.assert_allclose(mean, a_t, atol=3 * om_t / np.sqrt(200 * 48))
