"""Pallas VMEM bitonic sort for int32 keys — EXPERIMENTAL, NOT WIRED IN.

Round-1 findings (see PLAN.md): the roll-based formulation compiles and
sorts correctly on the v5e but runs ~6x slower than lax.sort (sublane rolls
lower poorly); the hybrid reshape/roll variant below hits multi-minute
Mosaic compiles through the remote tunnel. Kept as the starting point for
the round-2 kernel work; counting uses lax.sort in production.

XLA's TPU sort streams every bitonic stage through HBM; holding blocks in
VMEM across stages removes that traffic. Layout: a block of 2^18 elements
lives as (2048, 128) with element index = lane * 2048 + sublane
(column-major), so the 11 low stride-levels are sublane swaps and only 7
are lane-axis reshapes.

Structure for N = B * 2^18:
1. block kernel: full bitonic network phases 1..18 inside VMEM, direction
   bits from the GLOBAL element index (block offset via program_id)
2. phases p = 19..log2(N): cross-block compare-exchange stages in XLA
   (stride >= block size), then one VMEM "descent" kernel per phase for the
   intra-block strides, direction constant per block (bit p of the global
   index depends only on the block id)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_BITS = 11           # sublane bits
LANE_BITS = 7         # lane bits
BLK_BITS = R_BITS + LANE_BITS  # 18: elements per block
R = 1 << R_BITS       # 2048 sublanes
C = 1 << LANE_BITS    # 128 lanes
BLK = 1 << BLK_BITS


def _stage(x, sbit: int, desc):
    """One compare-exchange stage at stride 2^sbit on an (R, C) col-major
    block, reshape-free (Mosaic rejects lane-axis reshapes): the XOR partner
    x[i ^ s] comes from two circular rolls selected by the stride bit.

    ``desc``: None for all-ascending, a traced int32 scalar (0/1), or a
    bool (R, C) array — True where the pair sorts descending.
    """
    if desc is not None and not (hasattr(desc, "shape") and desc.shape == (R, C)):
        desc = (jnp.zeros((R, C), jnp.int32) + desc) == 1
    if sbit < R_BITS:
        # sublane stride: pair halves via a 4-D reshape (Mosaic handles
        # sublane-axis reshapes; the last dim stays 128)
        s = 1 << sbit
        v = x.reshape(R // (2 * s), 2, s, C)
        lo, hi = v[:, 0], v[:, 1]
        mn, mx = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
        if desc is None:
            lo2, hi2 = mn, mx
        else:
            d = desc.reshape(R // (2 * s), 2, s, C)[:, 0]
            lo2 = jnp.where(d, mx, mn)
            hi2 = jnp.where(d, mn, mx)
        return jnp.stack([lo2, hi2], axis=1).reshape(R, C)
    # lane stride: XOR partner via two lane rolls (lane shuffles are native)
    s = 1 << (sbit - R_BITS)
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    is_lo = (pos & s) == 0
    fwd = pltpu.roll(x, C - s, 1)  # value at lane + s
    bwd = pltpu.roll(x, s, 1)      # value at lane - s
    partner = jnp.where(is_lo, fwd, bwd)
    mn = jnp.minimum(x, partner)
    mx = jnp.maximum(x, partner)
    take_mn = is_lo if desc is None else (is_lo ^ desc)
    return jnp.where(take_mn, mn, mx)


def _desc_mask(phase: int, blk_base):
    """Descending mask: bit ``phase`` of the global element index
    (= blk_base + c*R + r in the column-major block layout)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    idx = blk_base + c * R + r
    return ((idx >> phase) & 1) == 1


def _block_sort_kernel(total_bits: int):
    """Kernel: full bitonic phases 1..BLK_BITS on one VMEM block."""

    def kernel(x_ref, o_ref):
        b = pl.program_id(0)
        blk_base = b * BLK
        x = x_ref[...]
        for phase in range(1, BLK_BITS + 1):
            desc = None if phase >= total_bits else _desc_mask(phase, blk_base)
            for sbit in range(phase - 1, -1, -1):
                x = _stage(x, sbit, desc)
        o_ref[...] = x

    return kernel


def _descent_kernel(phase_bit_of_block: int):
    """Kernel: strides 2^(BLK_BITS-1)..1; direction constant per block."""

    def kernel(x_ref, o_ref):
        b = pl.program_id(0)
        x = x_ref[...]
        for sbit in range(BLK_BITS - 1, -1, -1):
            if phase_bit_of_block < 0:
                x = _stage(x, sbit, None)
            else:
                x = _stage(x, sbit, (b >> phase_bit_of_block) & 1)
        o_ref[...] = x

    return kernel


def _to_blocks(flat, n_blocks):
    # (N,) -> (B, R, C) column-major blocks
    return flat.reshape(n_blocks, C, R).transpose(0, 2, 1)


def _from_blocks(blocks):
    return blocks.transpose(0, 2, 1).reshape(-1)


@functools.partial(jax.jit, static_argnames=("total_bits",))
def _sort_impl(flat, total_bits: int):
    n = flat.shape[0]
    n_blocks = n // BLK
    blocks = _to_blocks(flat, n_blocks)
    grid = (n_blocks,)
    spec = pl.BlockSpec((1, R, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def wrap(kern):
        def k2(x_ref, o_ref):
            # refs are (1, R, C); operate on the (R, C) view
            def inner(x2, o2):
                kern(x2, o2)

            inner(x_ref.at[0], o_ref.at[0])

        return k2

    blocks = pl.pallas_call(
        wrap(_block_sort_kernel(total_bits)),
        out_shape=jax.ShapeDtypeStruct(blocks.shape, blocks.dtype),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
    )(blocks)

    # cross-block phases
    for phase in range(BLK_BITS + 1, total_bits + 1):
        flat2 = _from_blocks(blocks)
        for sbit in range(phase - 1, BLK_BITS - 1, -1):
            s = 1 << sbit
            v = flat2.reshape(n // (2 * s), 2, s)
            lo, hi = v[:, 0], v[:, 1]
            mn, mx = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
            if phase >= total_bits:
                lo2, hi2 = mn, mx
            else:
                blki = jax.lax.broadcasted_iota(jnp.int32, (n // (2 * s), s), 0)
                j = jax.lax.broadcasted_iota(jnp.int32, (n // (2 * s), s), 1)
                idx = blki * 2 * s + j
                d = ((idx >> phase) & 1) == 1
                lo2 = jnp.where(d, mx, mn)
                hi2 = jnp.where(d, mn, mx)
            flat2 = jnp.stack([lo2, hi2], axis=1).reshape(-1)
        blocks = _to_blocks(flat2, n_blocks)
        pbit = -1 if phase >= total_bits else phase - BLK_BITS
        blocks = pl.pallas_call(
            wrap(_descent_kernel(pbit)),
            out_shape=jax.ShapeDtypeStruct(blocks.shape, blocks.dtype),
            grid=grid,
            in_specs=[spec],
            out_specs=spec,
        )(blocks)
    return _from_blocks(blocks)


def pallas_sort(x):
    """Ascending sort of a 1-D int32 array; size must be a power of two
    >= 2^18. Returns the sorted array."""
    n = x.shape[0]
    total_bits = n.bit_length() - 1
    if n != 1 << total_bits or total_bits < BLK_BITS:
        raise ValueError(f"pallas_sort needs a power-of-two size >= {BLK}")
    return _sort_impl(x, total_bits)
