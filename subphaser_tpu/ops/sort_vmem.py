"""Pallas VMEM bitonic sort for int32 keys — EXPERIMENTAL; NOT on the
production path.

Measured verdict (v5e, 2026-08, honest fresh-seed timing): bit-exact at
2^18/2^22/2^25 but 211 M elem/s vs lax.sort's 298 M elem/s at 2^25 —
the masked grid-phase network executes ~324 stages/element at ~8 VPU ops
each and is VPU-bound, while XLA's own sort achieves a lower effective op
count. Counting therefore keeps lax.sort (ops/count.sort_rle). Kept as a
worked kernel + the record of the Mosaic findings below (dynamic vector
shifts, fori temporary summing, grid-revisit residency).

Design: XLA's TPU sort streams stages through HBM; this implementation
holds blocks of 2^BLK_BITS elements in VMEM and runs every intra-block
stage on-chip, so a full sort touches HBM only once per block-level pass:

  1. block-sort kernel: bitonic phases 1..BLK_BITS entirely in VMEM
     (direction bits from the global element index)
  2. per merge level p > BLK_BITS: compare-exchange stages with stride
     >= block size are plain elementwise min/max in XLA (perfectly
     streaming, no shuffles), then ONE descent kernel runs all intra-block
     strides (2^(BLK_BITS-1)..1) in VMEM with a per-block direction scalar.

Layout: a block is (R, 128) row-major (element i at row i//128, lane
i%128). Strides < 128 are lane-axis XOR-partner rolls (pltpu.roll);
strides >= 128 pair sublane halves via a 4-D reshape — both measured
within noise of a passthrough kernel on the v5e (tools/
bench_sort_primitives.py), i.e. the in-VMEM stages are DMA-hidden.

Replaces jellyfish's CPU hash counting sort stand-in (reference
Jellyfish.py:697-703) as the core primitive behind sort_rle/count_tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BITS = 7
C = 1 << LANE_BITS           # 128 lanes
R_BITS = 11                  # sublane bits: block = (2048, 128) = 2^18 int32
R = 1 << R_BITS
BLK_BITS = R_BITS + LANE_BITS
BLK = 1 << BLK_BITS          # 1 MB per block in VMEM


def _lane_stage(x, sbit: int, desc, active=None):
    """Compare-exchange at element stride 2^sbit (sbit < LANE_BITS).

    Partner x[i ^ s] sits s lanes away; fetched with two circular lane
    rolls selected by the stride bit. ``desc``: bool array broadcastable to
    (R, C), True where the pair sorts descending. ``active`` (traced scalar
    bool or None): when False the stage degenerates to identity — folded in
    by substituting the partner with x itself (min = max = x), which keeps
    per-stage VMEM liveness flat (an outer jnp.where(active, y, x) would
    keep BOTH buffers alive and OOM scoped vmem on long kernels).
    """
    s = 1 << sbit
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    is_lo = (pos & s) == 0
    fwd = pltpu.roll(x, C - s, 1)   # value at lane + s
    bwd = pltpu.roll(x, s, 1)       # value at lane - s
    partner = jnp.where(is_lo, fwd, bwd)
    if active is not None:
        partner = jnp.where(active, partner, x)
    mn = jnp.minimum(x, partner)
    mx = jnp.maximum(x, partner)
    take_mn = jnp.logical_xor(is_lo, desc)
    return jnp.where(take_mn, mn, mx)


def _sublane_stage(x, sbit: int, desc, active=None):
    """Compare-exchange at element stride 2^sbit (sbit >= LANE_BITS).

    Sublane stride s = 2^(sbit-7): pair halves via a 4-D reshape (the last
    dim stays 128, which Mosaic lowers as sublane regrouping).
    ``desc``: bool (R, C) array or scalar; ``active`` as in _lane_stage.
    """
    s = 1 << (sbit - LANE_BITS)
    v = x.reshape(R // (2 * s), 2, s, C)
    lo, hi = v[:, 0], v[:, 1]
    mn, mx = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
    if isinstance(desc, bool) or getattr(desc, "ndim", 1) == 0:
        d = desc
    else:
        d = desc.reshape(R // (2 * s), 2, s, C)[:, 0]
    lo2 = jnp.where(d, mx, mn)
    hi2 = jnp.where(d, mn, mx)
    if active is not None:
        lo2 = jnp.where(active, lo2, lo)
        hi2 = jnp.where(active, hi2, hi)
    return jnp.stack([lo2, hi2], axis=1).reshape(R, C)


def _stage(x, sbit: int, desc, active=None):
    if sbit < LANE_BITS:
        if isinstance(desc, bool):
            desc = jnp.full((R, C), desc)
        elif getattr(desc, "ndim", 2) == 0:
            desc = jnp.broadcast_to(desc, (R, C))
        return _lane_stage(x, sbit, desc, active)
    return _sublane_stage(x, sbit, desc, active)


def _block_sort_kernel(total_bits: int):
    """Bitonic phases 1..BLK_BITS on one VMEM block.

    Directions come from the global element index; only the last phase
    (p == BLK_BITS) depends on the block id (bit BLK_BITS of the global
    index == b & 1), earlier phases use local bits only.
    """

    def kernel(x_ref, o_ref):
        b = pl.program_id(0)
        r = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        local = r * C + c
        x = x_ref[0]
        for p in range(1, BLK_BITS + 1):
            if p >= total_bits:
                desc = False  # final phase: everything ascending
            elif p == BLK_BITS:
                desc = ((b & 1) == 1)  # traced scalar bool
                desc = jnp.broadcast_to(desc, (R, C))
            else:
                desc = ((local >> p) & 1) == 1
            for sbit in range(p - 1, -1, -1):
                x = _stage(x, sbit, desc)
        o_ref[0] = x

    return kernel


def _block_sort_kernel_grid(total_bits: int):
    """Compile-friendly block sort: the bitonic PHASE is a grid dimension.

    Grid = (n_blocks, BLK_BITS), phases minor: consecutive steps share the
    same block index, so Pallas keeps the block resident in VMEM across all
    BLK_BITS phases (input DMA'd once, output flushed once per block). Each
    step is ONE masked descent — 18 straight-line stages, which Mosaic
    compiles in seconds and allocates tightly. (A fori_loop over phases
    inside one kernel instead makes Mosaic SUM the 18 stages' temporaries
    in its stack allocation -> scoped-vmem OOM; and fully unrolling all 171
    stages never finished compiling. Measured on v5e.)

    The ~1.9x extra masked compare-exchange work is VMEM-resident and
    hides under the stream.
    """

    def kernel(x_ref, o_ref):
        b = pl.program_id(0)
        p = pl.program_id(1) + 1  # phase 1..BLK_BITS

        @pl.when(p == 1)
        def _():
            o_ref[0] = x_ref[0]

        # phase bit as a SCALAR mask: `local >> p` would be a per-element
        # dynamic shift, which Mosaic lowers catastrophically (25+ min
        # compiles measured); scalar-shift + vector AND is cheap
        pmask = jnp.left_shift(jnp.int32(1), p)
        if BLK_BITS >= total_bits:
            # single-block sort: final phase must be all-ascending
            pmask = jnp.where(p < total_bits, pmask, jnp.int32(0))
        x = o_ref[0]
        for sbit in range(BLK_BITS - 1, -1, -1):
            # direction bits recomputed per stage so nothing but x stays
            # live across stages (scoped-vmem budget)
            r = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
            local = b * BLK + r * C + c
            desc = (local & pmask) != 0
            x = _stage(x, sbit, desc, active=(sbit < p))
        o_ref[0] = x

    return kernel


def _descent_kernel(desc_ref, x_ref, o_ref):
    """Strides 2^(BLK_BITS-1)..1 with a per-block direction scalar.

    desc_ref is a scalar-prefetched int32 (n_blocks,) array: 1 where this
    block's slice of the bitonic sequence sorts descending (0 on the final
    phase). One compile serves every merge level because the level only
    changes the desc input, not the program.
    """
    d = desc_ref[pl.program_id(0)] == 1
    x = x_ref[0]
    desc = jnp.broadcast_to(d, (R, C))
    for sbit in range(BLK_BITS - 1, -1, -1):
        x = _stage(x, sbit, desc)
    o_ref[0] = x


# PrefetchScalarGridSpec index maps get (*grid_indices, *scalar_refs)
_BSPEC = pl.BlockSpec((1, R, C), lambda b, _desc: (b, 0, 0),
                      memory_space=pltpu.VMEM)


def _cross_stage(flat, sbit: int, p: int, total_bits: int):
    """XLA elementwise compare-exchange at stride 2^sbit >= BLK.

    Pure streaming min/max over block-aligned halves — no shuffles, so XLA
    executes it at HBM bandwidth.
    """
    n = flat.shape[0]
    s = 1 << sbit
    v = flat.reshape(n // (2 * s), 2, s)
    lo, hi = v[:, 0], v[:, 1]
    mn, mx = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
    if p >= total_bits:
        lo2, hi2 = mn, mx
    else:
        g = jax.lax.broadcasted_iota(jnp.int32, (n // (2 * s), 1), 0)
        d = ((g >> (p - sbit - 1)) & 1) == 1
        lo2 = jnp.where(d, mx, mn)
        hi2 = jnp.where(d, mn, mx)
    return jnp.stack([lo2, hi2], axis=1).reshape(-1)


@functools.partial(jax.jit, static_argnames=("total_bits",))
def _sort_impl(flat, total_bits: int):
    n_blocks = flat.shape[0] // BLK
    blocks = flat.reshape(n_blocks, R, C)  # row-major: free relayout
    spec2 = pl.BlockSpec((1, R, C), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    blocks = pl.pallas_call(
        _block_sort_kernel_grid(total_bits),
        out_shape=jax.ShapeDtypeStruct(blocks.shape, blocks.dtype),
        grid=(n_blocks, BLK_BITS),
        in_specs=[spec2],
        out_specs=spec2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(blocks)

    for p in range(BLK_BITS + 1, total_bits + 1):
        flat2 = blocks.reshape(-1)
        for sbit in range(p - 1, BLK_BITS - 1, -1):
            flat2 = _cross_stage(flat2, sbit, p, total_bits)
        blocks = flat2.reshape(n_blocks, R, C)
        if p >= total_bits:
            desc = jnp.zeros((n_blocks,), jnp.int32)
        else:
            bi = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, 1), 0)[:, 0]
            desc = (bi >> (p - BLK_BITS)) & 1
        blocks = pl.pallas_call(
            _descent_kernel,
            out_shape=jax.ShapeDtypeStruct(blocks.shape, blocks.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_blocks,),
                in_specs=[_BSPEC],
                out_specs=_BSPEC,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(desc, blocks)
    return blocks.reshape(-1)


def vmem_sort(x: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort of a 1-D int32 array whose size is a power of two
    >= 2^BLK_BITS. Call sites pad with SENTINEL (int32 max) to a power of
    two — the counting path already does (ops/count pow2 buckets)."""
    n = x.shape[0]
    total_bits = n.bit_length() - 1
    if n != 1 << total_bits or total_bits < BLK_BITS:
        raise ValueError(f"vmem_sort needs a power-of-two size >= {BLK}")
    return _sort_impl(x, total_bits)


def supports(n: int) -> bool:
    """True when vmem_sort handles this size on the current default backend."""
    if jax.default_backend() != "tpu":
        return False
    return n >= BLK and (n & (n - 1)) == 0
