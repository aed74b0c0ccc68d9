"""LTR detector validation: recall/precision against planted ground truth.

Builds a realistic synthetic chromosome — LTR-RT families at a range of
insertion ages (LTR divergence 0-15%), solo LTRs, nested insertions, and
background tandem repeats — then measures how the native detector's calls
match the planted elements. The reference validates against gt ltrharvest /
ltr_finder output on real genomes (LTR.py:33-61); no external binaries or
real genomes are available in this environment, so planted truth is the
oracle. Results land in PARITY.md.

Run CPU-forced (the detector is identical on any backend):
  JAX_PLATFORMS=cpu python tools/validate_ltr.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def mutate(rng, s, rate):
    if rate <= 0:
        return s
    arr = np.frombuffer(s.encode(), dtype=np.uint8).copy()
    m = rng.random(arr.size) < rate
    repl = rng.integers(0, 4, size=int(m.sum()))
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    arr[m] = lut[repl]
    return arr.tobytes().decode()


def build_chromosome(rng, n_families=6, n_elements=60, length=6_000_000):
    """Returns (seq, truth) where truth = list of (start, end, ltr_len, div)."""
    families = []
    for _ in range(n_families):
        ltr_len = int(rng.integers(150, 1200))
        int_len = int(rng.integers(2000, 8000))
        families.append((rand_seq(rng, ltr_len), rand_seq(rng, int_len)))

    # background with occasional tandem microsatellites
    parts = []
    truth = []
    pos = 0
    gap_mean = max(1, (length - n_elements * 8000) // (n_elements + 1))
    for i in range(n_elements):
        g = rand_seq(rng, int(rng.integers(gap_mean // 2, gap_mean * 3 // 2)))
        if rng.random() < 0.3:  # sprinkle a microsatellite
            unit = rand_seq(rng, int(rng.integers(2, 8)))
            g += unit * int(rng.integers(10, 60))
        parts.append(g)
        pos += len(g)
        fam = families[int(rng.integers(0, n_families))]
        div = float(rng.choice([0.0, 0.02, 0.05, 0.08, 0.12, 0.15]))
        ltr5 = mutate(rng, fam[0], div / 2)
        ltr3 = mutate(rng, fam[0], div / 2)
        inner = mutate(rng, fam[1], div / 2)
        tsd = rand_seq(rng, int(rng.integers(4, 7)))
        if rng.random() < 0.15 and truth:
            # solo LTR (recombination remnant): NOT a true element
            parts.append(tsd + ltr5 + tsd)
            pos += len(tsd) * 2 + len(ltr5)
            continue
        elem = ltr5 + inner + ltr3
        parts.append(tsd + elem + tsd)
        truth.append((pos + len(tsd), pos + len(tsd) + len(elem), len(fam[0]), div))
        pos += len(elem) + 2 * len(tsd)
    parts.append(rand_seq(rng, gap_mean))
    return "".join(parts), truth


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from subphaser_tpu.io.genome import PackedGenome
    from subphaser_tpu.ltr.detect import detect_ltr

    rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 42)
    seq, truth = build_chromosome(rng)
    log(f"chromosome: {len(seq)/1e6:.1f} Mb, {len(truth)} planted elements")
    g = PackedGenome.from_dict({"chr1": seq})
    import time

    t0 = time.time()
    recs = detect_ltr(g)
    dt = time.time() - t0
    log(f"detector: {len(recs)} calls in {dt:.1f}s ({len(seq)/dt/1e6:.2f} Mbp/s)")

    # match calls to truth: a call matches a planted element when both
    # boundaries are within 100 bp (harvest-style slack)
    tol = 100
    matched_truth = set()
    matched_calls = set()
    for ci, r in enumerate(recs):
        for ti, (ts, te, _l, _d) in enumerate(truth):
            if abs((r.start - 1) - ts) <= tol and abs(r.end - te) <= tol:
                matched_truth.add(ti)
                matched_calls.add(ci)
    recall = len(matched_truth) / max(len(truth), 1)
    precision = len(matched_calls) / max(len(recs), 1)
    log(f"recall {recall:.3f} ({len(matched_truth)}/{len(truth)}), "
        f"precision {precision:.3f} ({len(matched_calls)}/{len(recs)})")

    # recall by divergence bucket
    by_div = {}
    for ti, (_s, _e, _l, d) in enumerate(truth):
        by_div.setdefault(d, [0, 0])
        by_div[d][1] += 1
        if ti in matched_truth:
            by_div[d][0] += 1
    for d in sorted(by_div):
        hit, tot = by_div[d]
        log(f"  divergence {d*100:4.0f}%: recall {hit}/{tot}")
    print(f"{recall:.4f} {precision:.4f}")


if __name__ == "__main__":
    main()
