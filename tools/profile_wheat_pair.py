"""Profile ONE real wheat-scale blocks pair (667 Mb chroms) stage-by-stage.

Loads the packed genome from a full-default run's checkpoint
(tmp/genome.packed.npz) instead of re-synthesizing, and times the exact
production stages run_align executes per pair: device anchoring, device
match + tunnel download, chaining, decode, LIS + native cs (OpenMP gap DP).

Usage: python tools/profile_wheat_pair.py /tmp/wheat14/tmp/genome.packed.npz A1 B1
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    npz = sys.argv[1]
    qname, tname = sys.argv[2], sys.argv[3]

    from subphaser_tpu.blocks.align import _decode_chrom, _lis_anchors, align_pair
    from subphaser_tpu.io.genome import PackedGenome
    from subphaser_tpu.ltr.native import build_cs_native, chain_anchors
    from subphaser_tpu.ops.anchors import chrom_anchors_dev, match_anchors_dev

    t0 = time.time()
    genome = PackedGenome.load(npz)
    print(f"load genome: {time.time()-t0:.1f}s ({len(genome.names)} chroms)",
          flush=True)
    k, mod = 15, 16
    q = genome.chrom(qname)
    t = genome.chrom(tname)
    print(f"pair {qname}({q.length/1e6:.0f} Mb) vs {tname}({t.length/1e6:.0f} Mb)",
          flush=True)

    # cold pass compiles the programs; report it but focus on warm numbers
    for label in ("cold", "warm"):
        t0 = time.time()
        qa = chrom_anchors_dev(q, k=k, mod=mod)
        t1 = time.time()
        ta = chrom_anchors_dev(t, k=k, mod=mod)
        t2 = time.time()
        qpos, tpos, rel = match_anchors_dev(qa, ta)
        t3 = time.time()
        print(f"[{label}] anchors_dev {t1-t0:.1f}+{t2-t1:.1f}s "
              f"(q={qa[3]}, t={ta[3]}), match+download {t3-t2:.1f}s "
              f"({qpos.size} pairs, {qpos.size*12/1e6:.0f} MB)", flush=True)

    t0 = time.time()
    m = rel == 0
    qq, tt = qpos[m], tpos[m]
    alen = np.full(qq.size, k, dtype=np.int32)
    chains = chain_anchors(qq, tt, alen, 1, max_gap=100_000,
                           min_chain_len=20_000, min_chain_anchors=10)
    t1 = time.time()
    print(f"chain(+): {t1-t0:.1f}s ({len(chains)} chains, {int(m.sum())} pairs)",
          flush=True)

    t0 = time.time()
    q_codes = _decode_chrom(q)
    t_codes = _decode_chrom(t)
    print(f"decode both: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    n_gap = 0
    total_cs = 0
    t_lis = 0.0
    for c in chains:
        sel = ((qq >= c["q_start"]) & (qq < c["q_end"])
               & (tt >= c["t_start"]) & (tt < c["t_end"]))
        aq_, at_ = qq[sel], tt[sel]
        tl = time.time()
        o = np.lexsort((at_, aq_))
        aq_, at_ = _lis_anchors(aq_[o], at_[o])
        t_lis += time.time() - tl
        cs_text, _nm, _al = build_cs_native(
            q_codes, t_codes, aq_, at_,
            int(c["q_start"]), int(c["q_end"]),
            int(c["t_start"]), int(c["t_end"]), k, minus=False,
        )
        total_cs += len(cs_text)
        n_gap += max(int(c["q_end"] - c["q_start"]) - aq_.size * k, 0)
    print(f"lis+cs (+ strand): {time.time()-t0:.1f}s (lis {t_lis:.1f}s, "
          f"~{n_gap/1e6:.1f} Mb gap DP, {total_cs/1e6:.1f} MB cs)", flush=True)

    # the real per-pair production call, warm, fresh caches
    t0 = time.time()
    recs = align_pair(genome, qname, tname, k=k, mod=mod)
    print(f"align_pair all-in (warm): {time.time()-t0:.1f}s ({len(recs)} records)",
          flush=True)


if __name__ == "__main__":
    main()
