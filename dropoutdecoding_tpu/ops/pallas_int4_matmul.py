"""Pallas int4 matmul: y = x @ W for group-wise packed 4-bit weights.

Decode at ensemble widths is HBM-bound on the weight stream
(STATUS.md roofline: int8 7B streams 6.8 GB/token at 85-90% of HBM BW).
Packed int4 halves that stream again, but NO XLA-level formulation
reaches packed-rate streaming on TPU (measured at 7B decode vs int8
weights: operand-side dequant 2.2x SLOWER, post-dot group scaling 2.4x,
native S4 einsum 5.2x — XLA either materializes the dequantized matrix
or scalarizes the S4 unpack).  This kernel streams the packed bytes from
HBM exactly once, sign-extends both nibble planes with two arithmetic
shifts on the VPU, applies the per-(group, out-channel) scale in VMEM,
and feeds two MXU half-contractions:

    y = x[:, :D/2] @ deq(lo) + x[:, D/2:] @ deq(hi)

Packing (utils/quantize.quantize_matrix_int4): byte d of q4 [D/2, E]
holds contraction rows d (low nibble) and d + D/2 (high nibble); group
scales s4 [N, E] cover rows [0, D/2) in groups [0, N/2) and [D/2, D) in
[N/2, N).  The half-split (not even/odd interleave) is what makes the
kernel's unpack slice-free.

Grid: (ceil(E / block_e), ceil(R / block_r)) — r innermost, so a weight
block is fetched once and reused across all row blocks (matters for
prefill; decode has one row block).  Non-divisible E edges rely on
Pallas block padding (garbage lanes are never stored).

The reference has no analogue (torch fp16 on HF models); this is the
TPU-native deployment tier beyond the reference's scope.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref, *, n2: int):
    # x_ref [BR, D]; q_ref [D2, BE] int8 packed; s_ref [N, BE] f32;
    # o_ref [BR, BE]
    q = q_ref[...]
    D2, BE = q.shape
    # Mosaic does not legalize i8 shifts (arith.shli); unpack in i32:
    # hi = floor(q / 16) == signed high nibble (q = 16*hi + lo_u, arith
    # shift); lo sign-extends via the (x & 15) ^ 8 - 8 identity.
    q32 = q.astype(jnp.int32)
    lo = ((q32 & 15) ^ 8) - 8
    hi = jnp.right_shift(q32, 4)
    s = s_ref[...]
    x = x_ref[...]

    def half(plane, sh, xh):
        w = plane.astype(jnp.bfloat16).reshape(n2, D2 // n2, BE)
        w = (w * sh[:, None, :].astype(jnp.bfloat16)).reshape(D2, BE)
        return jax.lax.dot_general(
            xh.astype(jnp.bfloat16),
            w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    y = half(lo, s[:n2], x[:, :D2]) + half(hi, s[n2:], x[:, D2:])
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_e", "block_r", "out_dtype")
)
def int4_matmul(
    x: jax.Array,
    q4: jax.Array,
    s4: jax.Array,
    block_e: int = 256,
    block_r: int = 256,
    out_dtype=None,
):
    """x @ W for packed int4 W.

    Args:
      x: [..., D] activations (any dtype; computed in bf16).
      q4: [D/2, E] int8, two nibbles per byte (rows d / d + D/2).
      s4: [N, E] f32 group scales (G = D / N).
    Returns:
      [..., E] in ``out_dtype`` (default: x.dtype).
    """
    D2, E = q4.shape
    N = s4.shape[0]
    lead = x.shape[:-1]
    D = x.shape[-1]
    assert D == 2 * D2, (D, D2)
    R = 1
    for d in lead:
        R *= d
    x2 = x.reshape(R, D)
    out_dtype = out_dtype or x.dtype

    br = min(block_r, max(8, -(-R // 8) * 8))
    grid = (-(-E // block_e), -(-R // br))

    out = pl.pallas_call(
        functools.partial(_kernel, n2=N // 2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, D), lambda e, r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (D2, block_e), lambda e, r: (0, e), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (N, block_e), lambda e, r: (0, e), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (br, block_e), lambda e, r: (r, e), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, E), out_dtype),
    )(x2, q4, s4)
    return out.reshape(lead + (E,))
