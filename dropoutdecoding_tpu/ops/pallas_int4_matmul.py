"""Pallas int4 matmul: y = x @ W for group-wise packed 4-bit weights.

Decode at ensemble widths is HBM-bound on the weight stream
(STATUS.md roofline: int8 7B streams 6.8 GB/token at 85-90% of HBM BW).
Packed int4 halves that stream again, but NO XLA-level formulation
reaches packed-rate streaming on TPU (measured at 7B decode vs int8
weights: operand-side dequant 2.2x SLOWER, post-dot group scaling 2.4x,
native S4 einsum 5.2x — XLA either materializes the dequantized matrix
or scalarizes the S4 unpack).  This kernel streams the packed bytes from
HBM exactly once, unpacks one group at a time on the VPU (interleaved
with the MXU dots so unpack(g+1) overlaps dot(g)), and applies the
per-(group, out-channel) scale to the f32 dot results:

    y = sum_g s_g * (x_g @ nibbles_g)   over both half-planes

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


def _unpack_group(qg_i8, unpack: str):
    """One packed group [g, BE] i8 -> (lo, hi) bf16 nibble planes.

    Three equivalent decodes of byte = 16*hi + lo_u (two's-complement
    nibbles) — all BIT-IDENTICAL outputs, different VPU cost profiles:

    - "i32": widen to i32 and use integer shift/mask (shifts only
      legalize at i32 in Mosaic).  Every op runs on 32-bit lanes — 4x
      the register traffic of the byte stream.
    - "i16": same integer identity at i16 — half the lane traffic where
      Mosaic packs 16-bit ops two per 32-bit lane.
    - "bf16": ONE int->float convert, then pure bf16 arithmetic:
      hi = floor(b/16) (exact: |b| <= 128 and the scale is a power of
      two, both exactly representable), lo_u = b - 16*hi, and the sign
      fixup lo = lo_u - 16*(lo_u >= 8).  No shifts at all; bf16 ops run
      on packed 16-bit lanes.

    The winning mode at the 7B decode shape is measured on-chip by
    cli/int4_probe.py and baked in as UNPACK_DEFAULT below.

    HARDWARE STATUS (2026-08-21, v5e via axon): i16 FAILS Mosaic
    legalization (`arith.shrsi` has no i16 lowering) and the bf16 floor
    path crashes the remote compiler; both remain interpret-mode-only,
    pinned bit-identical to i32 in the CPU suite.  On hardware the
    compilable decodes are i32 and the mxu3 form in _kernel.
    """
    if unpack == "i32":
        qg = qg_i8.astype(jnp.int32)
        lo = (((qg & 15) ^ 8) - 8).astype(jnp.bfloat16)
        hi = jnp.right_shift(qg, 4).astype(jnp.bfloat16)
        return lo, hi
    if unpack == "i16":
        qg = qg_i8.astype(jnp.int16)
        lo = (((qg & jnp.int16(15)) ^ jnp.int16(8)) - jnp.int16(8)).astype(
            jnp.bfloat16
        )
        hi = jnp.right_shift(qg, jnp.int16(4)).astype(jnp.bfloat16)
        return lo, hi
    if unpack == "bf16":
        b = qg_i8.astype(jnp.bfloat16)
        hi = jnp.floor(b * jnp.bfloat16(0.0625))
        lo_u = b - jnp.bfloat16(16.0) * hi
        lo = lo_u - jnp.where(
            lo_u >= jnp.bfloat16(8.0), jnp.bfloat16(16.0), jnp.bfloat16(0.0)
        )
        return lo, hi
    raise ValueError(f"unknown unpack mode {unpack!r}")


# on-chip winner at the 7B decode shapes (cli/int4_probe.py, 2026-08-21,
# 50-stack amortized programs): mxu3 + block_e heuristic below beats
# i32 + 512 on every production matrix — qo 406->431 GB/s, gateup
# 475->508, down 511->522.  i16/bf16 FAIL Mosaic compilation on real
# hardware at these shapes (remote-compile crash; they remain
# interpret-mode-verified decodes).  See docs/DESIGN.md §15.
UNPACK_DEFAULT = "mxu3"


def _default_block_e(D2: int, E: int) -> int:
    """Measured block heuristic (cli/int4_probe.py): wide-output matmuls
    (qkv/gate_up, E >= D) stream best at block_e=1024; the tall down
    projection (D > E) at 512 (its [D/2, block] blocks are 2.75 MB at 7B
    — the 1024 block leaves too little VMEM for pipeline depth)."""
    return 512 if 2 * D2 > E else 1024


def _dot_f32(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel(x_ref, q_ref, s_ref, o_ref, *, n2: int, unpack: str):
    # x_ref [BR, D]; q_ref [D2, BE] int8 packed; s_ref [N, BE] f32;
    # o_ref [BR, BE].  Dequant is INTERLEAVED with the dots at group
    # granularity: group gi's dot depends only on group gi's unpack, so
    # Mosaic can software-pipeline the VPU unpack of group gi+1 against
    # the MXU dot of group gi (the whole-block unpack-then-dot form
    # serializes VPU and MXU; measured ~10% slower at the 7B gate_proj
    # shape).  Group scales are applied to the [BR, BE] dot result in
    # f32 — cheaper (BR << g rows) and more accurate than premultiplying
    # the bf16 weight block (rel err vs the dequantized dense product:
    # 2.9e-3 vs 4.2e-3 at 7B shape).
    D2, BE = q_ref.shape
    g = D2 // n2
    xv = x_ref[...].astype(jnp.bfloat16)
    s = s_ref[...]
    acc = jnp.zeros((xv.shape[0], BE), jnp.float32)
    for gi in range(n2):
        qg = q_ref[gi * g : (gi + 1) * g, :]
        x_lo = xv[:, gi * g : (gi + 1) * g]
        x_hi = xv[:, D2 + gi * g : D2 + (gi + 1) * g]
        if unpack == "mxu3":
            # MXU-offloaded decode (round-5 int4 roofline work): at the
            # R=1 decode shape the VPU nibble unpack, not the HBM stream,
            # bounds the kernel — so spend idle MXU instead of VPU lanes.
            # Dot linearity on byte = 16*hi + lo_u gives
            #   x_hi @ hi = (x_hi @ byte - x_hi @ lo_u) / 16
            # and (lo_u ^ 8) == lo + 8 elementwise (two's-complement
            # nibble), so
            #   x_lo @ lo = x_lo @ (lo_u ^ 8) - 8 * sum(x_lo).
            # VPU work per byte: two int8 bitwise ops + three i8->bf16
            # converts — no shifts, no compares, no 32-bit widening.
            # Three [BR,g]x[g,BE] dots instead of two; MXU is ~idle at
            # BR=8, so the trade is VPU-time for free MXU-time.  NOT
            # bit-identical to the nibble-plane variants (different f32
            # summation order); pinned to 5e-3 relative agreement in
            # tests, far under the int4 quantization error itself.
            u = qg & jnp.int8(15)
            ylo = _dot_f32(x_lo, (u ^ jnp.int8(8)).astype(jnp.bfloat16))
            ylo = ylo - 8.0 * jnp.sum(
                x_lo.astype(jnp.float32), axis=1, keepdims=True
            )
            yhi = (
                _dot_f32(x_hi, qg.astype(jnp.bfloat16))
                - _dot_f32(x_hi, u.astype(jnp.bfloat16))
            ) * 0.0625
        else:
            lo, hi = _unpack_group(qg, unpack)
            ylo = _dot_f32(x_lo, lo)
            yhi = _dot_f32(x_hi, hi)
        acc = acc + ylo * s[gi][None, :] + yhi * s[n2 + gi][None, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def _kernel_layered(i_ref, x_ref, q_ref, s_ref, o_ref, *, n2: int,
                    unpack: str):
    # i_ref: [1] scalar-prefetch layer index (consumed by the index maps);
    # q_ref/s_ref carry a leading singleton layer axis — view past it and
    # run the exact same dequant + dot body as the sliced kernel.
    del i_ref
    _kernel(x_ref, q_ref.at[0], s_ref.at[0], o_ref, n2=n2, unpack=unpack)


@functools.partial(
    jax.jit, static_argnames=("block_e", "block_r", "out_dtype", "unpack")
)
def int4_matmul_layered(
    l_idx: jax.Array,
    x: jax.Array,
    q4: jax.Array,
    s4: jax.Array,
    block_e: int | None = None,
    block_r: int = 256,
    out_dtype=None,
    unpack: str | None = None,
):
    """x @ W[l_idx] for a stacked [L, D/2, E] packed-int4 weight.

    The layer-loop form of :func:`int4_matmul`: the FULL packed stack
    stays in HBM and the kernel block-indexes layer ``l_idx`` via scalar
    prefetch, so the per-layer weight slice that ``lax.scan`` over
    stacked params materializes before a ``pallas_call`` (XLA cannot fuse
    a dynamic-slice into a custom call — profiled at 4.6 ms/step of pure
    copy at 7B int4 decode, i.e. the whole weight stream moved twice)
    never exists.  Same math, same block geometry, same VMEM footprint
    as the sliced kernel; only the HBM indexing differs.
    """
    L, D2, E = q4.shape
    N = s4.shape[-2]
    lead = x.shape[:-1]
    D = x.shape[-1]
    assert D == 2 * D2, (D, D2)
    R = 1
    for d in lead:
        R *= d
    x2 = x.reshape(R, D)
    out_dtype = out_dtype or x.dtype
    block_e = block_e or _default_block_e(D2, E)

    br = min(block_r, max(8, -(-R // 8) * 8))
    grid = (-(-E // block_e), -(-R // br))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, D), lambda e, r, li: (r, 0)),
            pl.BlockSpec((1, D2, block_e), lambda e, r, li: (li[0], 0, e)),
            pl.BlockSpec((1, N, block_e), lambda e, r, li: (li[0], 0, e)),
        ],
        out_specs=pl.BlockSpec((br, block_e), lambda e, r, li: (r, e)),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_layered, n2=N // 2, unpack=unpack or UNPACK_DEFAULT
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, E), out_dtype),
    )(jnp.asarray(l_idx, jnp.int32).reshape(1), x2, q4, s4)
    return out.reshape(lead + (E,))


@functools.partial(
    jax.jit, static_argnames=("block_e", "block_r", "out_dtype", "unpack")
)
def int4_matmul(
    x: jax.Array,
    q4: jax.Array,
    s4: jax.Array,
    block_e: int | None = None,
    block_r: int = 256,
    out_dtype=None,
    unpack: str | None = None,
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
    block_e = block_e or _default_block_e(D2, E)

    br = min(block_r, max(8, -(-R // 8) * 8))
    grid = (-(-E // block_e), -(-R // br))

    out = pl.pallas_call(
        functools.partial(_kernel, n2=N // 2, unpack=unpack or UNPACK_DEFAULT),
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
