"""Generate a realistic-repetitiveness wheat-scale genome (14 Gb).

21 chromosomes: 3 subgenomes (A, B, D) x 7 homoeologous sets x 667 Mb —
the reference's test_wheat.sh shape. Wheat is ~85% repetitive; chromosomes
here are built from repeat libraries (60% shared + 30% subgenome-specific,
copies mutated 0.3%) plus ~5% unique sequence, keeping per-chromosome
distinct k-mer counts (~60M) under the 2^27 low-mem device budget like a
real repeat-dominated genome (a uniform-random synthetic would be
pathologically unique-k-mer-heavy — the opposite of wheat).

Usage: python gen_wheat14.py OUT [n_sets] [chrom_mb] [--one]
  --one generates a single chromosome (dry-run sizing).
"""

import sys
import time

import numpy as np

OUT = sys.argv[1]
N_SETS = int(sys.argv[2]) if len(sys.argv) > 2 else 7
CHROM = int(float(sys.argv[3]) * 1e6) if len(sys.argv) > 3 else 667_000_000
ONE = "--one" in sys.argv
# --sets LO HI: generate only homoeologous sets LO..HI into a per-range
# file (parallel generation; libraries come from a FIXED seed so every
# range shares the same repeat families = the same phasing signal)
SET_LO, SET_HI = 1, N_SETS
if "--sets" in sys.argv:
    i = sys.argv.index("--sets")
    SET_LO, SET_HI = int(sys.argv[i + 1]), int(sys.argv[i + 2])
SGS = "ABD"

SEG = 5000
LUT = np.frombuffer(b"ACGT", dtype=np.uint8)


def wrap60(ascii_arr, f):
    n = ascii_arr.size
    rows = n // 60
    head = ascii_arr[: rows * 60].reshape(rows, 60)
    buf = np.empty((rows, 61), np.uint8)
    buf[:, :60] = head
    buf[:, 60] = ord("\n")
    f.write(buf.tobytes())
    tail = ascii_arr[rows * 60 :]
    if tail.size:
        f.write(tail.tobytes() + b"\n")


def make_library(rng, n_fam, fam_len):
    return rng.integers(0, 4, n_fam * fam_len, dtype=np.uint8).reshape(n_fam, fam_len)


def make_chrom(rng, shared_lib, sg_lib):
    """60% shared repeats + 30% SG repeats + 5% unique, 0.3% point mutation."""
    n_seg = CHROM // SEG
    kinds = rng.random(n_seg)
    fam_shared = rng.integers(0, shared_lib.shape[0], n_seg)
    fam_sg = rng.integers(0, sg_lib.shape[0], n_seg)
    parts = np.empty((n_seg, SEG), dtype=np.uint8)
    shared_mask = kinds < 0.62
    sg_mask = (kinds >= 0.62) & (kinds < 0.95)
    uniq_mask = kinds >= 0.95
    parts[shared_mask] = shared_lib[fam_shared[shared_mask]]
    parts[sg_mask] = sg_lib[fam_sg[sg_mask]]
    n_u = int(uniq_mask.sum())
    parts[uniq_mask] = rng.integers(0, 4, (n_u, SEG), dtype=np.uint8)
    chrom = parts.reshape(-1)
    # 0.3% point mutations: draw only the ~0.003*n mutated POSITIONS
    # instead of two full-length RNG arrays (the full-length draws were
    # ~75% of generation time at 667 Mb chromosomes)
    n_mut = int(chrom.size * 0.003)
    pos = rng.integers(0, chrom.size, n_mut)
    delta = rng.integers(1, 4, n_mut, dtype=np.uint8)
    chrom[pos] = (chrom[pos] + delta) % 4
    return chrom


def main():
    lib_rng = np.random.default_rng(1234)
    rng = np.random.default_rng(9000 + SET_LO)
    t0 = time.time()
    shared_lib = make_library(lib_rng, 120, SEG)        # 600 kb shared library
    sg_libs = {sg: make_library(lib_rng, 60, SEG) for sg in SGS}  # 300 kb each
    fa = (f"{OUT}/genome14_{SET_LO}_{SET_HI}.fa" if not ONE
          else f"{OUT}/chrom1.fa")
    with open(fa, "wb") as f:
        for i in range(SET_LO, (SET_LO + 1 if ONE else SET_HI + 1)):
            for sg in (SGS[:1] if ONE else SGS):
                chrom = make_chrom(rng, shared_lib, sg_libs[sg])
                a = LUT[chrom]
                for _ in range(20):
                    p = int(rng.integers(0, chrom.size - 600))
                    a[p : p + 500] = ord("N")
                f.write(f">CM{sg}{i}.1\n".encode())
                wrap60(a, f)
                print(f"chrom {sg}{i} done {time.time()-t0:.0f}s", flush=True)
    if not ONE and SET_LO == 1:
        with open(f"{OUT}/sg14.config", "w") as f:
            for i in range(1, N_SETS + 1):
                f.write("\t".join(f"{sg}{i}|CM{sg}{i}.1" for sg in SGS) + "\n")
    print(f"done {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
