"""Fused Pallas kernels for visual-token uncertainty.

The jnp reference (ops/uncertainty.vision_uncertainty) materializes
softmax probabilities [L, V] (~74MB fp32 for LLaVA-1.5, ~375MB for
LLaVA-NeXT) plus several same-shape temporaries in HBM.  These kernels
stream (row, vocab) tiles through VMEM and keep only O(L) + O(V) statistics
resident, in three passes:

pass A (online, flash-style rescaling) per row i:
    m_i   = max_v x_iv
    Z_i   = sum_v e^{x_iv - m_i}
    A_i   = sum_v e^{x_iv - m_i} * x_iv          (for entropy)
    B_i   = sum_v e^{2(x_iv - m_i)}              (for variance)
  =>  alea_i = log Z_i + m_i - A_i / Z_i
      var_i  = (B_i / Z_i^2 - 1/V) / (V - 1)     (Bessel, torch.var)

pass B given (m, Z): accumulate the mean distribution
    pavg_v = (1/L) sum_i e^{x_iv - m_i} / Z_i

pass C per row tile:
    C_i    = sum_v p_iv * log(pavg_v + 1e-10)
  =>  epis_i = -alea_i - C_i      (KL(p_i || p_avg) with the reference's
                                   +1e-10 inside both logs, llava.py:735)

Tiling: rows in _TL=512 blocks, vocab in _TV=1024 blocks — ~2MB fp32 per
VMEM tile, fits every visual-span size (LLaVA-1.5 576 rows, InstructBLIP
32, LLaVA-NeXT ~2.9k).  V is padded with -inf logits (exp -> 0); the 1/V
factors use the true V.  Top-k projection tables stay on XLA's top_k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10
_TV = 1024
_TL = 512


def _pass_a_kernel(x_ref, m_ref, z_ref, a_ref, b_ref):
    vt = pl.program_id(1)
    x = x_ref[...]  # [TL, TV] fp32

    tile_m = jnp.max(x, axis=-1, keepdims=True)  # [TL, 1]

    @pl.when(vt == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        z_ref[...] = jnp.zeros_like(z_ref)
        a_ref[...] = jnp.zeros_like(a_ref)
        b_ref[...] = jnp.zeros_like(b_ref)

    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, tile_m)
    scale = jnp.exp(m_old - m_new)  # rescale old accumulators
    e = jnp.exp(x - m_new)  # pad lanes: exp(-inf) = 0
    ex = jnp.where(e > 0, e * x, 0.0)  # avoid 0 * -inf = nan on pads

    m_ref[...] = m_new
    z_ref[...] = z_ref[...] * scale + jnp.sum(e, axis=-1, keepdims=True)
    a_ref[...] = a_ref[...] * scale + jnp.sum(ex, axis=-1, keepdims=True)
    b_ref[...] = b_ref[...] * scale * scale + jnp.sum(e * e, axis=-1, keepdims=True)


def _pass_b_kernel(x_ref, m_ref, z_ref, w_ref, pavg_ref):
    rt = pl.program_id(1)
    x = x_ref[...]  # [TL, TV]
    z = z_ref[...]
    # padded rows have m = -inf / z = 0 -> NaN; mask them to 0
    p = jnp.where(z > 0, jnp.exp(x - m_ref[...]) / jnp.where(z > 0, z, 1.0), 0.0)

    @pl.when(rt == 0)
    def _():
        pavg_ref[...] = jnp.zeros_like(pavg_ref)

    # w = 1/n_valid at rows in the mean, 0 elsewhere (valid-aware means
    # for statically padded spans; uniform 1/L when no mask)
    pavg_ref[...] += jnp.sum(p * w_ref[...], axis=0, keepdims=True)


def _pass_c_kernel(x_ref, m_ref, z_ref, pavg_ref, c_ref):
    vt = pl.program_id(1)
    x = x_ref[...]
    z = z_ref[...]
    p = jnp.where(z > 0, jnp.exp(x - m_ref[...]) / jnp.where(z > 0, z, 1.0), 0.0)
    logpavg = jnp.log(pavg_ref[...] + _EPS)  # [1, TV]

    @pl.when(vt == 0)
    def _():
        c_ref[...] = jnp.zeros_like(c_ref)

    # pad lanes: p = 0, log(eps) finite => contributes 0
    c_ref[...] += jnp.sum(p * logpavg, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vision_uncertainty_fused(
    logits: jax.Array, valid: jax.Array | None = None, interpret: bool = False
) -> dict:
    """Pallas-fused equivalent of ops.uncertainty.vision_uncertainty.

    Args:
      logits: [B, L, V] visual-token logits (any float dtype).
      valid: optional [B, L] bool — p_avg and the image-level means run
        over valid rows only (LLaVA-NeXT's statically padded spans).
    Returns:
      same dict as the jnp reference.
    """
    B, L, V = logits.shape
    x = logits.astype(jnp.float32)
    Vp = ((V + _TV - 1) // _TV) * _TV
    Lp = ((L + _TL - 1) // _TL) * _TL
    x = jnp.pad(
        x, ((0, 0), (0, Lp - L), (0, Vp - V)), constant_values=-jnp.inf
    )
    if valid is None:
        w = jnp.full((B, Lp, 1), 1.0 / L, jnp.float32)
        w = w.at[:, L:].set(0.0)
        n_valid = jnp.full((B,), float(L), jnp.float32)
    else:
        vf = valid.astype(jnp.float32)  # [B, L]
        n_valid = jnp.maximum(jnp.sum(vf, axis=1), 1.0)
        w = jnp.pad(vf, ((0, 0), (0, Lp - L)))[..., None] / n_valid[:, None, None]
    n_vt = Vp // _TV
    n_rt = Lp // _TL
    vmem = pltpu.VMEM

    def per_image(xi, wi, ni):
        stat_spec = pl.BlockSpec((_TL, 1), lambda rt, vt: (rt, 0), memory_space=vmem)
        x_spec = pl.BlockSpec((_TL, _TV), lambda rt, vt: (rt, vt), memory_space=vmem)
        m, z, a, b = pl.pallas_call(
            _pass_a_kernel,
            grid=(n_rt, n_vt),
            in_specs=[x_spec],
            out_specs=[stat_spec] * 4,
            out_shape=[jax.ShapeDtypeStruct((Lp, 1), jnp.float32)] * 4,
            interpret=interpret,
        )(xi)

        (pavg,) = pl.pallas_call(
            _pass_b_kernel,
            grid=(n_vt, n_rt),  # vt-major so the (vt) output block
            # accumulates across the inner rt steps
            in_specs=[
                pl.BlockSpec((_TL, _TV), lambda vt, rt: (rt, vt), memory_space=vmem),
                pl.BlockSpec((_TL, 1), lambda vt, rt: (rt, 0), memory_space=vmem),
                pl.BlockSpec((_TL, 1), lambda vt, rt: (rt, 0), memory_space=vmem),
                pl.BlockSpec((_TL, 1), lambda vt, rt: (rt, 0), memory_space=vmem),
            ],
            out_specs=[
                pl.BlockSpec((1, _TV), lambda vt, rt: (0, vt), memory_space=vmem)
            ],
            out_shape=[jax.ShapeDtypeStruct((1, Vp), jnp.float32)],
            interpret=interpret,
        )(xi, m, z, wi)

        (c,) = pl.pallas_call(
            _pass_c_kernel,
            grid=(n_rt, n_vt),
            in_specs=[
                x_spec,
                stat_spec,
                stat_spec,
                pl.BlockSpec((1, _TV), lambda rt, vt: (0, vt), memory_space=vmem),
            ],
            out_specs=[stat_spec],
            out_shape=[jax.ShapeDtypeStruct((Lp, 1), jnp.float32)],
            interpret=interpret,
        )(xi, m, z, pavg)

        m, z, a, b, c = (v[:L, 0] for v in (m, z, a, b, c))
        alea = jnp.log(z) + m - a / z
        var = (b / (z * z) - 1.0 / V) / (V - 1)
        epis = -alea - c
        wrow = wi[:L, 0] * ni  # 1.0 at rows in the mean, 0 elsewhere
        mean = lambda v: jnp.sum(v * wrow) / ni
        return epis, alea, var, mean(var), mean(epis), mean(alea)

    epis, alea, var, mvar, mepis, malea = jax.vmap(per_image)(x, w, n_valid)
    return {
        "variance_per_token": var,
        "epis_uncert_per_token": epis,
        "alea_uncert_per_token": alea,
        "variance": mvar,
        "epis_uncert": mepis,
        "alea_uncert": malea,
    }
