"""Visual Contrastive Decoding (VCD) baseline.

Port targets: reference models/VCD/vcd_add_noise.py:3-28 (DDPM-style
noising; step 500 used by the harness, test_vcd.py:230) and
vcd_sample.py:142-161 (contrastive logit combination with the adaptive
plausibility cutoff).  Instead of monkey-patching a generate loop, the TPU
engine runs the clean and noised contexts as two batch rows of ONE decode
program (each keeps its own KV cache) and fuses the contrastive combination
into the sampler.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def noise_key(seed: int = 0) -> jax.Array:
    """The canonical VCD noise key: the SAME derivation
    engine/baselines.vcd_generate uses internally (split(key(seed))[0]),
    exposed so every CLI arm — llava-1.5 (via vcd_generate), llava-next,
    instructblip, serial and batched — noises from one convention
    (ADVICE r3: the families used to differ for no documented reason,
    inviting a refactor to silently break one family's serial/batched
    parity)."""
    return jax.random.split(jax.random.key(seed))[0]


def diffusion_noise(key: jax.Array, pixel_values: jax.Array, noise_step: int) -> jax.Array:
    """q(x_t | x_0) forward-diffusion sample at step t.

    Schedule per the reference: betas = sigmoid(linspace(-6, 6, 1000)) *
    (0.5e-2 - 1e-5) + 1e-5 (vcd_add_noise.py:7-8).
    """
    num_steps = 1000
    betas = jax.nn.sigmoid(jnp.linspace(-6.0, 6.0, num_steps)) * (0.5e-2 - 1e-5) + 1e-5
    alphas_prod = jnp.cumprod(1.0 - betas)
    a_t = jnp.sqrt(alphas_prod[noise_step])
    om_t = jnp.sqrt(1.0 - alphas_prod[noise_step])
    noise = jax.random.normal(key, pixel_values.shape, pixel_values.dtype)
    return a_t * pixel_values + om_t * noise


def contrastive_logits(
    logits: jax.Array,
    logits_cd: jax.Array,
    alpha: float = 0.5,
    beta: float = 0.1,
) -> jax.Array:
    """(1+alpha)*l - alpha*l_cd with tokens below the adaptive-plausibility
    cutoff log(beta) + max(l) removed (reference vcd_sample.py:150-153).

    Args:
      logits: [..., V] clean-context next-token logits.
      logits_cd: [..., V] noised-context logits.
    """
    cutoff = jnp.log(beta) + jnp.max(logits, axis=-1, keepdims=True)
    diffs = (1.0 + alpha) * logits - alpha * logits_cd
    return jnp.where(logits < cutoff, -jnp.inf, diffs)
