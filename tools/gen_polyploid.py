"""Generate a wheat-style 3-subgenome synthetic genome (~3.4 Gb).

27 chromosomes: 3 subgenomes (A, B, D) x 9 homoeologous sets x 125 Mb.
Homoeologs are diverged copies of a shared ancestor; each subgenome has a
specific repeat family amplified on top (the phasing signal), plus shared
repeats and N runs. Vectorized numpy; writes 60-col FASTA + 3-col config.
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wheat"
CHROM = 125_000_000
N_SETS = 9
SGS = "ABD"

LUT = np.frombuffer(b"ACGT", dtype=np.uint8)


def wrap60(ascii_arr):
    n = ascii_arr.size
    rows = -(-n // 60)
    pad = rows * 60 - n
    buf = np.full(rows * 61, ord("\n"), np.uint8)
    view = buf.reshape(rows, 61)
    padded = np.concatenate([ascii_arr, np.full(pad, ord("\n"), np.uint8)])
    view[:, :60] = padded.reshape(rows, 60)
    # trim trailing pad newlines of last row
    out = buf.tobytes()
    if pad:
        out = out[: rows * 61 - pad - 1] + b"\n"
    return out


def main():
    rng = np.random.default_rng(42)
    t0 = time.time()
    rep = {sg: rng.integers(0, 4, 120, dtype=np.uint8) for sg in SGS}
    shared = rng.integers(0, 4, 120, dtype=np.uint8)
    with open(f"{OUT}/genome_wheat.fa", "wb") as f:
        for i in range(1, N_SETS + 1):
            anc = rng.integers(0, 4, CHROM, dtype=np.uint8)
            for sg in SGS:
                mask = rng.integers(0, 100, CHROM, dtype=np.uint8) < 8
                delta = rng.integers(1, 4, CHROM, dtype=np.uint8)
                chrom = (anc + np.where(mask, delta, 0)) % 4
                for _ in range(CHROM // 2000):
                    p = int(rng.integers(0, CHROM - 130))
                    chrom[p : p + 120] = rep[sg]
                for _ in range(CHROM // 4000):
                    p = int(rng.integers(0, CHROM - 130))
                    chrom[p : p + 120] = shared
                a = LUT[chrom]
                for _ in range(10):
                    p = int(rng.integers(0, CHROM - 60))
                    a[p : p + 50] = ord("N")
                f.write(f">CM{sg}{i}.1\n".encode())
                f.write(wrap60(a))
                print(f"chrom {sg}{i} done {time.time()-t0:.0f}s", flush=True)
    with open(f"{OUT}/sg_wheat.config", "w") as f:
        for i in range(1, N_SETS + 1):
            f.write("\t".join(f"{sg}{i}|CM{sg}{i}.1" for sg in SGS) + "\n")
    print(f"done {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
