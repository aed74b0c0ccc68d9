"""Microbenchmark Mosaic lowering of bitonic-stage primitives on the TPU.

Decides the round-2 Pallas sort design with data: times N-stage Pallas
kernels built from each candidate compare-exchange lowering against
lax.sort and pure-elementwise/HBM bounds, at the bench.py problem size
(33.5M int32 = 128 VMEM blocks of 2^18).

Axon rules (see memory notes): salt inputs every iter, position-weighted
checksum, report median of 5.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 2048, 128          # one block: 2^18 int32 (1 MB) as (sublanes, lanes)
BLK = R * C
N_BLOCKS = 128            # 33.5M total, bench.py size
N_STAGES = 18             # stages per kernel (= one full descent's depth)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------- stage implementations (layout A: i = r*128 + c) ----------


def stage_lane_roll(x, sbit):
    """Element stride 2^sbit, sbit in [0,7): lane-axis XOR partner via rolls."""
    s = 1 << sbit
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    is_lo = (pos & s) == 0
    fwd = pltpu.roll(x, C - s, 1)
    bwd = pltpu.roll(x, s, 1)
    partner = jnp.where(is_lo, fwd, bwd)
    mn = jnp.minimum(x, partner)
    mx = jnp.maximum(x, partner)
    return jnp.where(is_lo, mn, mx)


def stage_sublane_reshape(x, sbit):
    """Element stride 2^sbit, sbit >= 7: sublane pair-halves via 4-D reshape."""
    s = 1 << (sbit - 7)
    v = x.reshape(R // (2 * s), 2, s, C)
    lo, hi = v[:, 0], v[:, 1]
    mn, mx = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
    return jnp.stack([mn, mx], axis=1).reshape(R, C)


def stage_sublane_roll(x, sbit):
    """Element stride 2^sbit, sbit >= 7: sublane XOR partner via rolls."""
    s = 1 << (sbit - 7)
    pos = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    is_lo = (pos & s) == 0
    fwd = pltpu.roll(x, R - s, 0)
    bwd = pltpu.roll(x, s, 0)
    partner = jnp.where(is_lo, fwd, bwd)
    mn = jnp.minimum(x, partner)
    mx = jnp.maximum(x, partner)
    return jnp.where(is_lo, mn, mx)


# ---------------- kernel builders ----------


def make_kernel(body):
    def kernel(x_ref, o_ref):
        o_ref[0] = body(x_ref[0])

    return kernel


def pallas_block_map(body, shape_block):
    spec = pl.BlockSpec((1,) + shape_block, lambda b: (b,) + (0,) * len(shape_block),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            make_kernel(body),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[0],),
            in_specs=[spec],
            out_specs=spec,
        )(x)

    return run


CANDIDATES = {}


def candidate(name):
    def deco(fn):
        CANDIDATES[name] = fn
        return fn

    return deco


@candidate("passthrough")
def _passthrough():
    return pallas_block_map(lambda x: x, (R, C))


@candidate("elementwise30")
def _elementwise():
    def body(x):
        for i in range(30):
            x = jnp.maximum(x, x - 1)
        return x

    return pallas_block_map(body, (R, C))


@candidate("lane_roll_stages")
def _lane():
    def body(x):
        for i in range(N_STAGES):
            x = stage_lane_roll(x, i % 7)
        return x

    return pallas_block_map(body, (R, C))


@candidate("sublane_reshape_vreg")
def _sub_reshape_vreg():
    # sublane strides 8..1024 only (vreg-granular)
    def body(x):
        for i in range(N_STAGES):
            x = stage_sublane_reshape(x, 10 + i % 8)
        return x

    return pallas_block_map(body, (R, C))


@candidate("sublane_reshape_small")
def _sub_reshape_small():
    # sublane strides 1,2,4 (sub-vreg; suspected catastrophic)
    def body(x):
        for i in range(N_STAGES):
            x = stage_sublane_reshape(x, 7 + i % 3)
        return x

    return pallas_block_map(body, (R, C))


@candidate("sublane_roll_stages")
def _sub_roll():
    def body(x):
        for i in range(N_STAGES):
            x = stage_sublane_roll(x, 7 + i % 11)
        return x

    return pallas_block_map(body, (R, C))


@candidate("transpose8")
def _transpose():
    # layout flip A<->B: (16,128,128) batched 128x128 transposes, 8x
    def body(x):
        for _ in range(8):
            x = x.swapaxes(1, 2)
            x = jnp.maximum(x, x - 1)  # prevent folding of transpose pairs
        return x

    return pallas_block_map(body, (16, 128, 128))


@candidate("descent18")
def _descent():
    # one full descent, mixed strategy:
    #  b=17..10 sublane reshape; b=9..7 sublane roll; b=6..0 lane roll
    def body(x):
        for b in range(17, 9, -1):
            x = stage_sublane_reshape(x, b)
        for b in range(9, 6, -1):
            x = stage_sublane_roll(x, b)
        for b in range(6, -1, -1):
            x = stage_lane_roll(x, b)
        return x

    return pallas_block_map(body, (R, C))


def bench(fn, x_base, iters=5, warmup=2):
    w = jnp.arange(x_base.size, dtype=jnp.int32).reshape(x_base.shape) & 1023

    @jax.jit
    def step(x, salt):
        # salt INSIDE the one jitted program (axon caches repeated identical
        # executions; a separate salt-add program does not defeat it)
        y = fn(x ^ salt)
        return jnp.sum((y & 0xFFFF) * w)

    t0 = time.time()
    step(x_base, jnp.int32(0)).block_until_ready()
    compile_s = time.time() - t0
    ts = []
    for i in range(warmup + iters):
        t0 = time.time()
        step(x_base, jnp.int32(i + 1)).block_until_ready()
        ts.append(time.time() - t0)
    return compile_s, float(np.median(ts[warmup:]))


def main():
    names = sys.argv[1:] or list(CANDIDATES)
    rng = np.random.default_rng(0)
    flat = rng.integers(0, 1 << 30, size=N_BLOCKS * BLK, dtype=np.int32)
    dev = jax.devices()[0]
    log(f"device: {dev}, total elems: {flat.size/1e6:.1f}M")

    if "lax_sort" in names or not sys.argv[1:]:
        x = jax.device_put(flat, dev)

        @jax.jit
        def srt(x, salt):
            y = jnp.sort(x ^ salt)
            w = jnp.arange(x.size, dtype=jnp.int32) & 1023
            return jnp.sum((y & 0xFFFF) * w)

        t0 = time.time()
        srt(x, jnp.int32(0)).block_until_ready()
        log(f"lax.sort compile {time.time()-t0:.1f}s")
        ts = []
        for i in range(7):
            t0 = time.time()
            srt(x, jnp.int32(i + 1)).block_until_ready()
            ts.append(time.time() - t0)
        t = float(np.median(ts[2:]))
        log(f"lax.sort: {t*1e3:.1f} ms = {flat.size/t/1e6:.0f} M elem/s")

    for name in names:
        if name == "lax_sort" or name not in CANDIDATES:
            continue
        fn = CANDIDATES[name]()
        if name == "transpose8":
            x = jax.device_put(flat.reshape(N_BLOCKS, 16, 128, 128), dev)
        else:
            x = jax.device_put(flat.reshape(N_BLOCKS, R, C), dev)
        try:
            c, t = bench(fn, x)
            per_stage = t / N_STAGES * 1e3
            log(
                f"{name:24s} compile {c:6.1f}s  run {t*1e3:8.2f} ms "
                f"({flat.size/t/1e6:6.0f} M elem/s; {per_stage:.3f} ms/stage)"
            )
        except Exception as e:  # noqa: BLE001
            log(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()


def _desc_for(b, p, total_bits=25):
    r = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    local = b * (R * C) + r * C + c
    return ((local >> p) & 1) == 1


def _masked_stage(x, sbit, desc, active):
    from subphaser_tpu.ops import sort_vmem as sv
    return sv._stage(x, sbit, desc, active)


@candidate("descent18_masked")
def _descent_masked():
    # 1-D grid, masked stages with per-stage iota desc (no pl.when/2D)
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def body_with_pid(x, b):
        p = jnp.int32(9)
        for sbit in range(17, -1, -1):
            x = _masked_stage(x, sbit, _desc_for(b, p), sbit < p)
        return x

    spec = pl.BlockSpec((1, R, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def kernel(x_ref, o_ref):
        o_ref[0] = body_with_pid(x_ref[0], pl.program_id(0))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[0],),
            in_specs=[spec],
            out_specs=spec,
        )(x)

    return run


@candidate("descent18_grid2d")
def _descent_grid2d():
    # 2-D revisiting grid + pl.when + o_ref read, UNMASKED stages
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    spec = pl.BlockSpec((1, R, C), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM)

    def kernel(x_ref, o_ref):
        p = pl.program_id(1)

        @pl.when(p == 0)
        def _():
            o_ref[0] = x_ref[0]

        x = o_ref[0]
        for i in range(N_STAGES):
            x = stage_lane_roll(x, i % 7) if i % 2 else stage_sublane_reshape(x, 10 + i % 8)
        o_ref[0] = x

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[0], 4),
            in_specs=[spec],
            out_specs=spec,
        )(x)

    return run
