"""Profile align_pair stage-by-stage on a synthetic ~26 Mb homoeologous pair.

Stages timed separately: chrom_anchors (device + download), match_anchors
(host), chain_anchors (native), decode, and sp_build_cs (anchor walk +
OpenMP gap DP + text). Drives the REAL align_pair at the end for the
all-in wall clock the round-2 PLAN quotes (~23 s with OpenMP).

Usage: python tools/bench_blocks_pair.py [size_mb] [divergence]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE_MB = float(sys.argv[1]) if len(sys.argv) > 1 else 26.0
DIV = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10


def make_pair(n: int, div: float):
    """Ancestor + two descendants with SNPs and indels (homoeologs)."""
    rng = np.random.default_rng(7)
    anc = rng.integers(0, 4, size=n, dtype=np.int8)

    def mutate(seq, seed):
        r = np.random.default_rng(seed)
        s = seq.copy()
        # SNPs
        nm = int(len(s) * div)
        pos = r.choice(len(s), size=nm, replace=False)
        s[pos] = (s[pos] + r.integers(1, 4, size=nm)) % 4
        # indels: delete and insert short runs every ~5 kb
        out = []
        step = 5000
        i = 0
        while i < len(s):
            j = min(i + step, len(s))
            chunk = s[i:j]
            ev = r.random()
            if ev < 0.3 and j - i > 40:  # deletion of 1-30 bp
                d = int(r.integers(1, 30))
                chunk = chunk[:-d]
            elif ev < 0.6:  # insertion of 1-30 bp
                ins = r.integers(0, 4, size=int(r.integers(1, 30)), dtype=np.int8)
                chunk = np.concatenate([chunk, ins])
            out.append(chunk)
            i = j
        return np.concatenate(out)

    return mutate(anc, 1), mutate(anc, 2)


def to_fasta(path, name, seq):
    b = np.array(list("ACGT"), dtype="U1")[seq]
    with open(path, "w") as f:
        f.write(f">{name}\n")
        s = "".join(b.tolist())
        for i in range(0, len(s), 80):
            f.write(s[i : i + 80] + "\n")


def main():
    from subphaser_tpu.blocks.align import _decode_chrom, _lis_anchors, align_pair
    from subphaser_tpu.io.genome import PackedGenome
    from subphaser_tpu.ltr.native import build_cs_native, chain_anchors
    from subphaser_tpu.ops.anchors import chrom_anchors, match_anchors

    n = int(SIZE_MB * 1e6)
    t0 = time.time()
    sa, sb = make_pair(n, DIV)
    print(f"synthesize: {time.time()-t0:.1f}s ({sa.size/1e6:.1f}+{sb.size/1e6:.1f} Mb)",
          flush=True)
    tmp = "/tmp/bench_blocks"
    os.makedirs(tmp, exist_ok=True)
    fa = os.path.join(tmp, "pair.fa")
    if not os.path.exists(fa + f".{n}.ok"):
        to_fasta(fa, "chrA", sa)
        to_fasta(fa + ".b", "chrB", sb)
        with open(fa + ".b") as f2, open(fa, "a") as f1:
            f1.write(f2.read())
        open(fa + f".{n}.ok", "w").write("1")
    t0 = time.time()
    genome, _renames = PackedGenome.from_fasta_files([fa])
    print(f"pack: {time.time()-t0:.1f}s", flush=True)

    k, mod = 15, 16
    q = genome.chrom("chrA")
    t = genome.chrom("chrB")

    t0 = time.time()
    qc, qp, qs = chrom_anchors(q, k=k, mod=mod)
    t1 = time.time()
    tc, tp, ts = chrom_anchors(t, k=k, mod=mod)
    t2 = time.time()
    print(f"anchors q: {t1-t0:.1f}s ({qc.size} anchors); "
          f"t: {t2-t1:.1f}s ({tc.size})", flush=True)

    t0 = time.time()
    qpos, tpos, rel = match_anchors(qc, qp, qs, tc, tp, ts)
    print(f"match: {time.time()-t0:.1f}s ({qpos.size} pairs)", flush=True)

    t0 = time.time()
    m = rel == 0
    qq, tt = qpos[m], tpos[m]
    alen = np.full(qq.size, k, dtype=np.int32)
    chains = chain_anchors(qq, tt, alen, 1, max_gap=100_000,
                           min_chain_len=20_000, min_chain_anchors=10)
    print(f"chain: {time.time()-t0:.1f}s ({len(chains)} chains)", flush=True)

    t0 = time.time()
    q_codes = _decode_chrom(q)
    t_codes = _decode_chrom(t)
    print(f"decode: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    n_gap_bases = 0
    total_cs = 0
    for c in chains:
        sel = ((qq >= c["q_start"]) & (qq < c["q_end"])
               & (tt >= c["t_start"]) & (tt < c["t_end"]))
        aq_, at_ = qq[sel], tt[sel]
        o = np.lexsort((at_, aq_))
        aq_, at_ = _lis_anchors(aq_[o], at_[o])
        tl0 = time.time()
        cs_text, nmatch, alen_tot = build_cs_native(
            q_codes, t_codes, aq_, at_,
            int(c["q_start"]), int(c["q_end"]),
            int(c["t_start"]), int(c["t_end"]), k, minus=False,
        )
        total_cs += len(cs_text)
        n_gap_bases += int(c["q_end"] - c["q_start"]) - aq_.size * k
    print(f"lis+build_cs: {time.time()-t0:.1f}s "
          f"(~{n_gap_bases/1e6:.1f} Mb gap DP, {total_cs/1e6:.1f} MB cs text)",
          flush=True)

    t0 = time.time()
    recs = align_pair(genome, "chrA", "chrB", k=k, mod=mod)
    print(f"align_pair all-in (cold): {time.time()-t0:.1f}s ({len(recs)} records)",
          flush=True)
    # warm: programs compiled, fresh caches (the per-pair production cost;
    # run_align additionally shares caches across a homoeologous set)
    t0 = time.time()
    recs = align_pair(genome, "chrA", "chrB", k=k, mod=mod)
    print(f"align_pair all-in (warm): {time.time()-t0:.1f}s ({len(recs)} records)",
          flush=True)

    # warm PRODUCTION stage breakdown (the device-join path align_pair uses)
    from subphaser_tpu.ops.anchors import chrom_anchors_dev, match_anchors_dev

    t0 = time.time()
    qa = chrom_anchors_dev(q, k=k, mod=mod)
    t1 = time.time()
    ta_ = chrom_anchors_dev(t, k=k, mod=mod)
    t2 = time.time()
    qpos, tpos, rel = match_anchors_dev(qa, ta_)
    t3 = time.time()
    m = rel == 0
    qq, tt = qpos[m], tpos[m]
    alen = np.full(qq.size, k, dtype=np.int32)
    chains = chain_anchors(qq, tt, alen, 1, max_gap=100_000,
                           min_chain_len=20_000, min_chain_anchors=10)
    t4 = time.time()
    total_cs = 0
    for c in chains:
        sel = ((qq >= c["q_start"]) & (qq < c["q_end"])
               & (tt >= c["t_start"]) & (tt < c["t_end"]))
        aq_, at_ = qq[sel], tt[sel]
        o = np.lexsort((at_, aq_))
        aq_, at_ = _lis_anchors(aq_[o], at_[o])
        cs_text, _nm, _al = build_cs_native(
            q_codes, t_codes, aq_, at_,
            int(c["q_start"]), int(c["q_end"]),
            int(c["t_start"]), int(c["t_end"]), k, minus=False,
        )
        total_cs += len(cs_text)
    t5 = time.time()
    print(f"warm prod stages: anchors_dev {t1-t0:.1f}+{t2-t1:.1f}s, "
          f"match_dev {t3-t2:.1f}s ({qpos.size} pairs), chain {t4-t3:.1f}s, "
          f"lis+cs {t5-t4:.1f}s ({total_cs/1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
