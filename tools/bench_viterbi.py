"""Measure batched profile-Viterbi throughput on the chip.

Pass-1 classification is the wheat-scale dominant phase (PLAN round 4):
~234 elements/s = ~1400 (element, frame) jobs/s at L~1500, P=3..6 profiles.
This measures scores_pos_many jobs/s for realistic shapes to evaluate scan
unroll / batch-size changes.

Usage: python tools/bench_viterbi.py [B] [L]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = int(sys.argv[2]) if len(sys.argv) > 2 else 1024


def main():
    from subphaser_tpu.ltr.classify import ProfileStack, load_hmm_db
    from subphaser_tpu.utils.compcache import enable_compilation_cache

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from make_synthetic import make_hmm_db

    enable_compilation_cache()
    import tempfile

    d = tempfile.mkdtemp()
    p = os.path.join(d, "db.hmm")
    make_hmm_db(p)
    # pad profiles to REXdb-ish length by repeating peptide columns
    profiles = load_hmm_db(p)
    stack = ProfileStack(profiles)
    print(f"profiles: {len(profiles)} x M={stack.ms.shape[1]}", flush=True)

    rng = np.random.default_rng(0)
    nv = np.full(B, L, np.int32)

    t0 = time.time()
    batch = rng.integers(0, 20, size=(B, L)).astype(np.int8)
    s, e = stack.scores_pos_many(batch, nv)
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

    iters = 8
    t0 = time.time()
    chk = 0
    for i in range(iters):
        batch = rng.integers(0, 20, size=(B, L)).astype(np.int8)  # salted
        s, e = stack.scores_pos_many(batch, nv)
        chk += float(s.sum())
    dt = (time.time() - t0) / iters
    print(f"B={B} L={L}: {B/dt:.0f} jobs/s ({dt*1e3:.0f} ms/batch) chk={chk:.1f}",
          flush=True)


if __name__ == "__main__":
    main()
