"""Measure candidate mapping-kernel formulations on the real chip.

Sections (select with argv):
  gather   — 1-D gather throughput vs table size (2^14 .. 2^30 int32):
             does a VMEM-resident table beat the 4 GB dense table per lookup?
  parts    — kernel stage decomposition at production shapes:
             codes / +gather / +colsum bins (new) / +contig bins (current)
             / +distinct 1-sort (new) / +distinct 2-sort (current)
  cuckoo   — 2-choice hash membership (two gathers from a 16 MB table +
             compares) vs one gather from the dense 4 GB table

All timings use salted inputs + position-weighted scalar checksums forced
to host every iteration (axon tunnel rules; see bench.py).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 15
TILE_BASES = 1 << 23
N_TILES = 4
BIN_SIZE = 10_000
N_SG = 3
M = 1 << 21


def _time(step, args, label, iters=4):
    import jax.numpy as jnp

    base = int.from_bytes(os.urandom(3), "little")
    t0 = time.time()
    out = int(step(*args, jnp.int32(base)))
    print(f"{label}: compile+first {time.time()-t0:.1f}s", flush=True)
    int(step(*args, jnp.int32(base + 1)))
    t0 = time.time()
    for i in range(iters):
        out = int(step(*args, jnp.int32((out + i) & 0x7FFFFFFF)))
    dt = (time.time() - t0) / iters
    return dt, out


def bench_gather_sizes():
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    n = 1 << 25  # lookups per step
    rng = np.random.default_rng(0)
    idx_base = rng.integers(0, 1 << 30, size=n, dtype=np.int64).astype(np.int32)
    di = jax.device_put(idx_base)

    for logsz in (14, 18, 22, 24, 26, 28, 30):
        size = 1 << logsz
        table = jax.device_put(
            rng.integers(0, 2**31, size=size, dtype=np.int64).astype(np.int32)
        )

        @jax.jit
        def step(tab, ii, salt, _mask=size - 1):
            j = (ii ^ salt) & _mask
            v = tab[j]
            w = jax.lax.iota(jnp.uint32, v.size)
            return jnp.sum(v.astype(jnp.uint32) * w)

        dt, _ = _time(step, (table, di), f"gather 2^{logsz}")
        print(
            f"gather table 2^{logsz} ({size*4/2**20:.0f} MiB): "
            f"{n/dt/1e6:.1f} M lookups/s ({dt*1e3:.0f} ms / {n>>20}M)",
            flush=True,
        )


def _mk_inputs(wheat: bool = False):
    """Uniform-random tiles + random sig set — or a wheat-like setting:
    85%-repetitive sequence (repeat-family library) with the sig set drawn
    from the GENOME's own forward codes so the hit rate matches production
    (~30% of positions hit at wheat scale, PLAN.md)."""
    import jax

    from subphaser_tpu.io.genome import tile_words_for

    rng = np.random.default_rng(0)
    n_words = tile_words_for(TILE_BASES, K)
    if wheat:
        from subphaser_tpu.ltr.native import pack_body
        from subphaser_tpu.ops.kmer import forward_codes as _fc

        fams = ["".join(rng.choice(list("ACGT"), size=5000)) for _ in range(40)]
        words = np.zeros((N_TILES, n_words), np.int32)
        vwords = np.zeros((N_TILES, n_words), np.int32)
        for t in range(N_TILES):
            parts, total = [], 0
            while total < TILE_BASES + 64:
                if rng.random() < 0.85:
                    f = fams[rng.integers(0, len(fams))]
                    # mutated copy
                    b = np.frombuffer(f.encode(), np.uint8).copy()
                    npos = rng.integers(0, 250)
                    b[rng.integers(0, b.size, size=npos)] = ord("A")
                    parts.append(b.tobytes().decode())
                else:
                    parts.append("".join(rng.choice(list("ACGT"), size=5000)))
                total += len(parts[-1])
            raw = np.frombuffer("".join(parts).encode(), np.uint8)
            p, v, _n = pack_body(raw)
            words[t, : min(n_words, p.size)] = p[:n_words]
            vwords[t, : min(n_words, v.size)] = v[:n_words]
        # sig = sampled forward codes from the data itself (+ shared across
        # tiles via families) so hits reach production rates
        import jax.numpy as jnp

        fc = np.asarray(
            _fc(jnp.asarray(words[0]), jnp.asarray(vwords[0]), K,
                TILE_BASES // 16)
        ).reshape(-1)
        fc = fc[fc != (np.int32(np.iinfo(np.int32).max))]
        sig_codes = np.unique(rng.choice(fc, size=M * 2))[:M].astype(np.int32)
        if sig_codes.size < M:
            pad = rng.choice(1 << (2 * K), size=M - sig_codes.size,
                             replace=False).astype(np.int32)
            sig_codes = np.unique(np.concatenate([sig_codes, pad]))[:M]
        hit_rate = np.isin(fc, sig_codes).mean()
        print(f"wheat-mode: hit rate {hit_rate:.1%} of positions", flush=True)
    else:
        words = rng.integers(
            0, 2**32, size=(N_TILES, n_words), dtype=np.uint32
        ).astype(np.int32)
        vwords = np.full((N_TILES, n_words), np.uint32(0xFFFF)).astype(np.int32)
        sig_codes = np.sort(
            rng.choice(1 << (2 * K), size=M, replace=False).astype(np.int32)
        )
    starts = (rng.integers(0, 1 << 22, size=N_TILES, dtype=np.int32) * 16).astype(
        np.int32
    )
    sig_sg = rng.integers(0, N_SG, size=sig_codes.size, dtype=np.int32)
    t_np = np.zeros(1 << (2 * K), np.int32)
    t_np[sig_codes] = ((np.arange(sig_codes.size, dtype=np.int32) + 1) << 4) | sig_sg
    return (
        jax.device_put(words),
        jax.device_put(vwords),
        jax.device_put(starts),
        jax.device_put(t_np),
        sig_codes,
        sig_sg,
    )


def bench_parts(wheat: bool = False):
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.ops.kmer import SENTINEL, forward_codes
    from subphaser_tpu.ops.mapbins import bin_counts_contiguous, nbins_for_tile
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    n_pos_words = TILE_BASES // 16
    nbt = nbins_for_tile(TILE_BASES, BIN_SIZE)
    mask_code = (1 << (2 * K)) - 1
    ws, vs, st, table, _sc, _sg = _mk_inputs(wheat=wheat)

    def colsum_bins(hit, sg, start):
        cpb = BIN_SIZE // 16
        ids = jnp.arange(N_SG, dtype=sg.dtype)[:, None, None]
        onehot = (hit[None] & (sg[None] == ids)).astype(jnp.int32)
        colsum = onehot.sum(axis=1)  # (n_sg, W)
        q = (jnp.asarray(start, jnp.int32) % BIN_SIZE) // 16
        arr = jnp.zeros((N_SG, nbt * cpb), jnp.int32)
        arr = jax.lax.dynamic_update_slice(arr, colsum, (jnp.int32(0), q))
        return arr.reshape(N_SG, nbt, cpb).sum(axis=2).T

    def core(w, v, s, salt, table, *, bins, distinct):
        fcodes = forward_codes(w ^ salt, v, K, n_pos_words)
        vals = table[fcodes.reshape(-1) & mask_code].reshape(fcodes.shape)
        hit = (vals > 0) & (fcodes != SENTINEL)
        idx = jnp.maximum((vals >> 4) - 1, 0)
        sg = vals & 15
        out = jnp.sum(jnp.where(hit, idx, 0).astype(jnp.uint32))
        if bins == "colsum":
            bc = colsum_bins(hit, sg, s)
        elif bins == "contig":
            bc = bin_counts_contiguous(
                hit, sg, s, bin_size=BIN_SIZE, n_sg=N_SG, nbins_tile=nbt
            )
        else:
            bc = None
        if bc is not None:
            out = out + jnp.sum(
                bc.astype(jnp.uint32)
                * jax.lax.iota(jnp.uint32, bc.size).reshape(bc.shape)
            )
        hidx = jnp.where(hit, idx, SENTINEL).reshape(-1)
        return out, hidx

    def make(bins, distinct):
        # table rides as a jit ARGUMENT: a closed-over device array lowers
        # as a 4.3 GB captured constant (one-shot program upload the axon
        # tunnel rejects; same trap as bench.py's iota note)
        @jax.jit
        def step(ws, vs, st, salt, table):
            def one(args):
                w, v, s = args
                return core(w, v, s, salt, table, bins=bins, distinct=distinct)

            outs, hidxs = jax.lax.map(one, (ws, vs, st))
            out = jnp.sum(outs)
            if distinct == "none":
                return out
            s = jnp.sort(hidxs.reshape(-1))
            run_start = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
            keep = run_start & (s != SENTINEL)
            if distinct == "1sort":
                u = jnp.sort(jnp.where(keep, s, SENTINEL))[: M]
            else:  # 2sort: KV compact (current _compact_survivors shape)
                keys = jnp.where(keep, s, SENTINEL)
                vals = keep.astype(jnp.int32)
                sk, sv = jax.lax.sort((keys, vals), num_keys=1)
                u = sk[:M]
            w = jax.lax.iota(jnp.uint32, M)
            return out + jnp.sum(u.astype(jnp.uint32) * w)

        return step

    mbp = N_TILES * TILE_BASES / 1e6
    variants = [
        ("gather only", make(None, "none")),
        ("gather+colsum", make("colsum", "none")),
        ("gather+contig", make("contig", "none")),
        ("g+colsum+d1sort", make("colsum", "1sort")),
        ("g+colsum+d2sort", make("colsum", "2sort")),
        ("g+contig+d2sort(prod)", make("contig", "2sort")),
    ]
    for name, fn in variants:
        dt, out = _time(lambda *a, _f=fn: _f(a[0], a[1], a[2], a[3], table),
                        (ws, vs, st), name)
        print(f"{name}: {mbp/dt:.1f} Mbp/s ({dt*1e3:.0f} ms/batch) chk={out}",
              flush=True)


def bench_cuckoo():
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.ops.kmer import SENTINEL, forward_codes
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    n_pos_words = TILE_BASES // 16
    mask_code = (1 << (2 * K)) - 1
    ws, vs, st, table, sig_codes, sig_sg = _mk_inputs()

    # 2-choice hash table, size 2^23 slots (=2 M entries at 25% load x2 arrays)
    HB = 23
    HSZ = 1 << HB

    def h1(c):
        return ((c * np.uint32(0x9E3779B1)) >> np.uint32(32 - HB)) & (HSZ - 1)

    def h2(c):
        return ((c * np.uint32(0x85EBCA77)) >> np.uint32(32 - HB)) & (HSZ - 1)

    hc = np.full(HSZ, -1, np.int32)  # stored code (-1 empty)
    hv = np.zeros(HSZ, np.int32)
    vals = ((np.arange(M, dtype=np.int32) + 1) << 4) | sig_sg
    c_u = sig_codes.astype(np.uint32)
    placed = np.zeros(M, bool)
    for hf in (h1, h2):
        slots = hf(c_u).astype(np.int64)
        free = ~placed
        # first-come wins per slot
        order = np.flatnonzero(free)
        s_sub = slots[order]
        first = np.unique(s_sub, return_index=True)[1]
        pick = order[first]
        ok = hc[slots[pick]] == -1
        pick = pick[ok]
        hc[slots[pick]] = sig_codes[pick]
        hv[slots[pick]] = vals[pick]
        placed[pick] = True
    rest = int((~placed).sum())
    print(f"cuckoo build: {M - rest}/{M} placed in 2 probes ({rest} overflow)",
          flush=True)
    dhc = jax.device_put(hc)
    dhv = jax.device_put(hv)

    @jax.jit
    def step_hash(ws, vs, st, salt):
        def one(args):
            w, v, s = args
            fcodes = forward_codes(w ^ salt, v, K, n_pos_words)
            c = fcodes.reshape(-1) & mask_code
            cu = c.astype(jnp.uint32)
            j1 = ((cu * jnp.uint32(0x9E3779B1)) >> jnp.uint32(32 - HB)).astype(
                jnp.int32
            ) & (HSZ - 1)
            j2 = ((cu * jnp.uint32(0x85EBCA77)) >> jnp.uint32(32 - HB)).astype(
                jnp.int32
            ) & (HSZ - 1)
            m1 = dhc[j1] == c
            m2 = dhc[j2] == c
            v1 = dhv[j1]
            v2 = dhv[j2]
            val = jnp.where(m1, v1, jnp.where(m2, v2, 0))
            ok = fcodes.reshape(-1) != SENTINEL
            return jnp.sum(jnp.where(ok, val, 0).astype(jnp.uint32))

        return jnp.sum(jax.lax.map(one, (ws, vs, st)))

    @jax.jit
    def step_dense(ws, vs, st, salt, table):
        # table as ARG (a closure would bake a 4.3 GB constant; see make())
        def one(args):
            w, v, s = args
            fcodes = forward_codes(w ^ salt, v, K, n_pos_words)
            c = fcodes.reshape(-1) & mask_code
            val = table[c]
            ok = fcodes.reshape(-1) != SENTINEL
            return jnp.sum(jnp.where(ok, val, 0).astype(jnp.uint32))

        return jnp.sum(jax.lax.map(one, (ws, vs, st)))

    mbp = N_TILES * TILE_BASES / 1e6
    dense = lambda ws, vs, st, salt: step_dense(ws, vs, st, salt, table)  # noqa: E731
    for name, fn in (("dense 4GB 1-gather", dense),
                     ("hash 32MB 4-gather", step_hash)):
        dt, out = _time(fn, (ws, vs, st), name)
        print(f"{name}: {mbp/dt:.1f} Mbp/s ({dt*1e3:.0f} ms/batch) chk={out}",
              flush=True)


def bench_mph():
    """Small-table EXACT membership candidates vs the 4 GiB dense gather.

    a) chd2g  — CHD perfect hash: disp[bucket] gather (2 MiB) + one int64
       gather (32 MiB) storing (code << 32 | composite) so the code IS the
       fingerprint (exact membership, VERDICT r3 'missing' #3 proposal —
       but it needs TWO gathers; this measures whether two small-table
       gathers beat one giant-table gather).
    b) dense8 — direct-address int8 table (1 GiB): value = sg+1 only; the
       distinct-hit statistic then must dedup hit CODES instead of table
       indices (same sort cost). ONE gather, 4x smaller table than int32.
    c) dense32 — the production 4 GiB int32 composite table.

    All variants compute the same checksum sum((sg+1)*w) over hits.
    """
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.ops.kmer import SENTINEL, forward_codes
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    n_pos_words = TILE_BASES // 16
    mask_code = (1 << (2 * K)) - 1
    ws, vs, st, table32, sig_codes, sig_sg = _mk_inputs(wheat="wheat" in sys.argv)

    m = sig_codes.size
    # ---- CHD build (host): bucket by h1, displace into T slots via h2+d
    TB = 22                      # 2^22 slots * 8 B = 32 MiB, load 0.5
    T = 1 << TB
    BB = 19                      # 2^19 buckets * 4 B = 2 MiB disp array
    NB = 1 << BB
    cu = sig_codes.astype(np.uint32)
    K1, K2 = np.uint32(0x9E3779B1), np.uint32(0x85EBCA77)
    bucket = ((cu * K1) >> np.uint32(32 - BB)).astype(np.int64)
    h2 = ((cu * K2) >> np.uint32(32 - TB)).astype(np.int64)
    comp = ((np.arange(m, dtype=np.int64) + 1) << 4) | sig_sg
    val64 = (sig_codes.astype(np.int64) << 32) | comp
    order = np.argsort(np.bincount(bucket, minlength=NB))[::-1]
    by_bucket: dict[int, np.ndarray] = {}
    srt = np.argsort(bucket, kind="stable")
    bs = bucket[srt]
    edges = np.searchsorted(bs, np.arange(NB + 1))
    t0 = time.time()
    slots_used = np.zeros(T, bool)
    disp = np.zeros(NB, np.int32)
    placed_slot = np.empty(m, np.int64)
    for b in order:
        lo, hi = edges[b], edges[b + 1]
        if lo == hi:
            continue
        idxs = srt[lo:hi]
        hh = h2[idxs]
        if np.unique(hh).size != hh.size:
            # intra-bucket h2 collision: displacement cannot separate
            # them; fall back marker (drop to dense for these — count them)
            disp[b] = -1
            placed_slot[idxs] = -1
            continue
        for d in range(1 << 16):
            s = (hh + d) & (T - 1)
            if not slots_used[s].any():
                slots_used[s] = True
                disp[b] = d
                placed_slot[idxs] = s
                break
        else:
            disp[b] = -1
            placed_slot[idxs] = -1
    dropped = int((placed_slot < 0).sum())
    print(f"chd build: {time.time()-t0:.1f}s, {m-dropped}/{m} placed, "
          f"{dropped} dropped (h2 collisions)", flush=True)
    # (T, 2) int32 rows [code, composite]: jax downcasts int64 device
    # arrays without x64, losing the stored code (the first run's chk=0)
    tab2 = np.zeros((T, 2), np.int32)
    ok = placed_slot >= 0
    tab2[placed_slot[ok], 0] = sig_codes[ok]
    tab2[placed_slot[ok], 1] = comp[ok].astype(np.int32)
    tab2[:, 0] = np.where(tab2[:, 1] == 0, -1, tab2[:, 0])  # empty != code 0
    d_disp = jax.device_put(disp)
    d_tab64 = jax.device_put(tab2)

    # ---- int8 dense
    t8 = np.zeros(1 << (2 * K), np.int8)
    t8[sig_codes] = (sig_sg + 1).astype(np.int8)
    d_t8 = jax.device_put(t8)
    # ---- 4-bit packed dense (512 MiB): 8 entries per int32 word
    t4 = np.zeros(1 << (2 * K - 3), np.uint32)
    w_idx = sig_codes >> 3
    sh = (sig_codes & 7) * 4
    np.bitwise_or.at(t4, w_idx, ((sig_sg + 1).astype(np.uint32)) << sh)
    d_t4 = jax.device_put(t4.astype(np.int32))

    def mk_step(body):
        # tables enter as ARGS (t1, t2): a closure over a device array
        # bakes it as a program CONSTANT (4.3 GB program upload through
        # the tunnel never finishes)
        @jax.jit
        def step(ws, vs, st, t1, t2, salt):
            def one(args):
                w, v, s = args
                fcodes = forward_codes(w ^ salt, v, K, n_pos_words)
                c = fcodes.reshape(-1) & mask_code
                sgp1 = body(c, t1, t2)  # (n,) int32: sg+1 on hit, 0 on miss
                okm = fcodes.reshape(-1) != SENTINEL
                wgt = jax.lax.iota(jnp.uint32, c.size)
                return jnp.sum(
                    jnp.where(okm, sgp1, 0).astype(jnp.uint32) * wgt
                )
            return jnp.sum(jax.lax.map(one, (ws, vs, st)))
        return step

    def body_dense32(c, t1, _t2):
        val = t1[c]
        return jnp.where(val > 0, (val & 15) + 1, 0)

    def body_dense8(c, t1, _t2):
        return t1[c].astype(jnp.int32)

    def body_chd(c, t1, t2):
        cu_ = c.astype(jnp.uint32)
        b = ((cu_ * jnp.uint32(0x9E3779B1)) >> jnp.uint32(32 - BB)).astype(jnp.int32)
        h = ((cu_ * jnp.uint32(0x85EBCA77)) >> jnp.uint32(32 - TB)).astype(jnp.int32)
        d = t1[b]
        s = (h + jnp.maximum(d, 0)) & (T - 1)
        e = t2[s]  # (n, 2) rows
        hit = e[:, 0] == c
        return jnp.where(hit, (e[:, 1] & 15) + 1, 0)

    def body_dense4(c, t1, _t2):
        w = t1[c >> 3]
        sh = (c & 7) * 4
        return (w >> sh) & 15

    zero = jax.device_put(np.zeros(8, np.int32))
    mbp = N_TILES * TILE_BASES / 1e6
    for name, body, t1, t2 in (
            ("dense4 512MiB packed", body_dense4, d_t4, zero),
            ("dense8 1GiB", body_dense8, d_t8, zero),
            ("chd 2MiB+32MiB 2-gather", body_chd, d_disp, d_tab64),
            ("dense32 4GiB", body_dense32, table32, zero)):
        fn = mk_step(body)
        dt, out = _time(fn, (ws, vs, st, t1, t2), name)
        print(f"{name}: {mbp/dt:.1f} Mbp/s ({dt*1e3:.0f} ms/batch) chk={out}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "parts"
    if which == "gather":
        bench_gather_sizes()
    elif which == "cuckoo":
        bench_cuckoo()
    elif which == "mph":
        bench_mph()
    else:
        bench_parts(wheat="wheat" in sys.argv)
