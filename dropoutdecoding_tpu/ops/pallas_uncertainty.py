"""Fused Pallas kernel for visual-token uncertainty.

The jnp reference (ops/uncertainty.vision_uncertainty) materializes
softmax probabilities [L, V] (~74MB fp32 for LLaVA-1.5) plus several
same-shape temporaries in HBM.  This kernel streams V in VMEM tiles and
keeps only O(L) statistics resident, in two passes:

pass 1 (online, flash-style rescaling) per row i:
    m_i   = max_v x_iv
    Z_i   = sum_v e^{x_iv - m_i}
    A_i   = sum_v e^{x_iv - m_i} * x_iv          (for entropy)
    B_i   = sum_v e^{2(x_iv - m_i)}              (for variance)
  =>  alea_i = log Z_i + m_i - A_i / Z_i
      var_i  = (B_i / Z_i^2 - 1/V) / (V - 1)     (Bessel, torch.var)

pass 2 given (m, Z): per V tile t:
    P_t    = e^{x_t - m} / Z                     [L, TV]
    pavg_t = mean_i P_t[i]                       [TV]
    C_i   += sum_v P_t[i, v] * log(pavg_t[v] + 1e-10)
  =>  epis_i = -alea_i - C_i      (KL(p_i || p_avg) with the reference's
                                   +1e-10 inside both logs, llava.py:735)

Padding: V is padded to a multiple of the tile with -inf logits, which
contribute exp(-inf)=0 everywhere; the 1/V and 1/(V-1) factors use the
true V.  Top-k projection tables stay on XLA's top_k (already optimal).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10
_TV = 1024  # V tile ([608, 1024] fp32 ~ 2.4MB; fits VMEM with double buffering)


def _pass1_kernel(x_ref, m_ref, z_ref, a_ref, b_ref):
    t = pl.program_id(0)
    x = x_ref[...]  # [L, TV] fp32

    tile_m = jnp.max(x, axis=-1, keepdims=True)  # [L, 1]

    @pl.when(t == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        z_ref[...] = jnp.zeros_like(z_ref)
        a_ref[...] = jnp.zeros_like(a_ref)
        b_ref[...] = jnp.zeros_like(b_ref)

    m_old = m_ref[...]  # [L, 1]
    m_new = jnp.maximum(m_old, tile_m)
    scale = jnp.exp(m_old - m_new)  # rescale old accumulators
    e = jnp.exp(x - m_new)  # [L, TV] (pad lanes: exp(-inf)=0)
    ex = jnp.where(e > 0, e * x, 0.0)  # avoid 0 * -inf = nan on pads

    m_ref[...] = m_new
    z_ref[...] = z_ref[...] * scale + jnp.sum(e, axis=-1, keepdims=True)
    a_ref[...] = a_ref[...] * scale + jnp.sum(ex, axis=-1, keepdims=True)
    b_ref[...] = b_ref[...] * scale * scale + jnp.sum(e * e, axis=-1, keepdims=True)


def _pass2_kernel(x_ref, m_ref, z_ref, c_ref, *, n_rows: int):
    t = pl.program_id(0)
    x = x_ref[...]  # [L, TV]
    m = m_ref[...]  # [L, 1]
    z = z_ref[...]

    p = jnp.exp(x - m) / z  # [L, TV]; pad lanes 0
    pavg = jnp.sum(p, axis=0, keepdims=True) / float(n_rows)  # [1, TV]
    logpavg = jnp.log(pavg + _EPS)

    @pl.when(t == 0)
    def _():
        c_ref[...] = jnp.zeros_like(c_ref)

    # pad lanes: p=0 but log(pavg+eps)=log(eps) finite => contributes 0
    c_ref[...] += jnp.sum(p * logpavg, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vision_uncertainty_fused(logits: jax.Array, interpret: bool = False) -> dict:
    """Pallas-fused equivalent of ops.uncertainty.vision_uncertainty.

    Args:
      logits: [B, L, V] visual-token logits (any float dtype).
    Returns:
      same dict as the jnp reference.
    """
    B, L, V = logits.shape
    x = logits.astype(jnp.float32)
    Vp = ((V + _TV - 1) // _TV) * _TV
    if Vp != V:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Vp - V)), constant_values=-jnp.inf)
    n_tiles = Vp // _TV

    def per_image(xi):
        m, z, a, b = pl.pallas_call(
            _pass1_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((L, _TV), lambda t: (0, t), memory_space=pltpu.VMEM)
            ],
            out_specs=[
                pl.BlockSpec((L, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
            ]
            * 4,
            out_shape=[jax.ShapeDtypeStruct((L, 1), jnp.float32)] * 4,
            interpret=interpret,
        )(xi)

        (c,) = pl.pallas_call(
            functools.partial(_pass2_kernel, n_rows=L),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((L, _TV), lambda t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((L, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
            ],
            out_shape=[jax.ShapeDtypeStruct((L, 1), jnp.float32)],
            interpret=interpret,
        )(xi, m, z)

        m, z, a, b, c = (v[:, 0] for v in (m, z, a, b, c))
        alea = jnp.log(z) + m - a / z
        var = (b / (z * z) - 1.0 / V) / (V - 1)
        epis = -alea - c
        return epis, alea, var

    epis, alea, var = jax.vmap(per_image)(x)
    return {
        "variance_per_token": var,
        "epis_uncert_per_token": epis,
        "alea_uncert_per_token": alea,
        "variance": jnp.mean(var, axis=-1),
        "epis_uncert": jnp.mean(epis, axis=-1),
        "alea_uncert": jnp.mean(alea, axis=-1),
    }
