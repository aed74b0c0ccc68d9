"""Isolate the 667 Mb match_anchors_dev TPU-worker crash step by step.

Builds A1/B1 device anchors from the wheat14 packed-genome checkpoint,
prints array sizes, then executes each component of _match_dev separately
(3-operand sort, keys-only sort, searchsorteds, full join) so the crashing
op is identified instead of inferred.

Usage: python tools/probe_match_crash.py /tmp/wheat14/tmp/genome.packed.npz A1 B1
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.1f}s", flush=True)
    return out


def main():
    npz, qname, tname = sys.argv[1], sys.argv[2], sys.argv[3]
    import jax
    import jax.numpy as jnp

    from subphaser_tpu.io.genome import PackedGenome
    from subphaser_tpu.ops.anchors import chrom_anchors_dev

    genome = step("load", lambda: PackedGenome.load(npz))
    q = genome.chrom(qname)
    t = genome.chrom(tname)

    qa = step("anchors q", lambda: chrom_anchors_dev(q))
    ta = step("anchors t", lambda: chrom_anchors_dev(t))
    qc, qp, qs, nq = qa
    tc, tp, ts, nt = ta
    print(f"q: padded {qc.shape[0]/1e6:.1f}M, real {nq/1e6:.1f}M; "
          f"t: padded {tc.shape[0]/1e6:.1f}M, real {nt/1e6:.1f}M", flush=True)

    # component 1: keys-only sort of q codes
    s1 = step("keys-only sort qc", lambda: np.asarray(
        jax.jit(jnp.sort)(qc)[:4]))
    print("  head:", s1, flush=True)

    # component 2: 3-operand sort of t side (the suspected crasher)
    def sort3():
        f = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1))
        out = f(tc, tp, ts)
        return np.asarray(out[0][:4])

    s2 = step("3-operand sort t", sort3)
    print("  head:", s2, flush=True)

    # component 3: staged count + emit join (the production path)
    from subphaser_tpu.ops.anchors import match_anchors_dev

    def join():
        qpos, tpos, rel = match_anchors_dev(qa, ta)
        return qpos.size

    n = step("staged match_anchors_dev", join)
    print(f"  n_pairs = {n/1e6:.2f}M", flush=True)


if __name__ == "__main__":
    main()
