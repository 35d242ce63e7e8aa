"""Deterministic PRNG policy.

The reference pins *global* torch seeds per model file (llava.py:16-20 seed
24, llavanext.py:18 seed 506, instructblip.py:17 seed 5217) so RNG state
threads implicitly through every mask draw.  On TPU we instead derive an
explicit key per (image, step, member) by folding, which is reproducible,
order-independent, and safe under jit/vmap.  Bitwise RNG streams necessarily
differ from torch; metric parity within run-to-run noise is the target
(BASELINE.md acceptance band).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax


@dataclass(frozen=True)
class PrngPolicy:
    seed: int = 24  # reference LLaVA default seed (llava.py:16)

    def base_key(self) -> jax.Array:
        return jax.random.key(self.seed)

    def image_key(self, image_index: int) -> jax.Array:
        return jax.random.fold_in(self.base_key(), image_index)

    @staticmethod
    def step_key(image_key: jax.Array, step: jax.Array) -> jax.Array:
        return jax.random.fold_in(image_key, step)

    @staticmethod
    def member_key(step_key: jax.Array, member: jax.Array) -> jax.Array:
        return jax.random.fold_in(step_key, member)
