"""Micro-benchmark for the native cs builder's banded gap DP (CPU-only).

Synthesizes a diverged pair with realistic inter-anchor gap structure
(anchors every ~500-1500 bp, 10% SNPs + indels in the gaps) and times
sp_build_cs, which is dominated by banded_align_ops_core. Used to measure
the DP inner-loop restructuring (vectorized nM/nI pass + scalar nD pass).

Usage: python tools/bench_cs_dp.py [size_mb] [reps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

SIZE = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 4_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
K = 15


def make_block(n: int, seed: int = 11):
    """Query/target pair: exact K-mer anchors separated by diverged gaps."""
    rng = np.random.default_rng(seed)
    qs, ts, aq, at = [], [], [], []
    cq = ct = 0
    while cq < n:
        anchor = rng.integers(0, 4, K, dtype=np.uint8)
        aq.append(cq)
        at.append(ct)
        qs.append(anchor)
        ts.append(anchor)
        cq += K
        ct += K
        glen = int(rng.integers(400, 1600))
        anc = rng.integers(0, 4, glen, dtype=np.uint8)
        gq, gt = anc.copy(), anc.copy()
        for g in (gq, gt):
            m = rng.random(glen) < 0.05
            g[m] = (g[m] + rng.integers(1, 4, int(m.sum()))) % 4
        # indel asymmetry: trim a few bases off one side
        d = int(rng.integers(0, 24))
        if rng.random() < 0.5:
            gq = gq[: glen - d]
        else:
            gt = gt[: glen - d]
        qs.append(gq)
        ts.append(gt)
        cq += len(gq)
        ct += len(gt)
    q = np.concatenate(qs)
    t = np.concatenate(ts)
    return q, t, np.array(aq, np.int64), np.array(at, np.int64)


def main():
    from subphaser_tpu.ltr import native

    q, t, aq, at = make_block(SIZE)
    print(f"block: q={q.size} t={t.size} anchors={aq.size}", flush=True)
    best = None
    for _ in range(REPS):
        t0 = time.time()
        cs, nmatch, alen = native.build_cs_native(
            q, t, aq, at, 0, q.size, 0, t.size, K
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"  sp_build_cs {dt:.3f}s  nmatch={nmatch} alen={alen} "
              f"cs_len={len(cs)}", flush=True)
    print(f"best {best:.3f}s -> {q.size / best / 1e6:.1f} Mbp/s "
          f"(gap bases ~{q.size - aq.size * K})")


if __name__ == "__main__":
    main()
