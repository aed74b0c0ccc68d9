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

import os
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


_B = {"A": 0, "C": 1, "G": 2, "T": 3}
_CODON = {
    "A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA", "F": "TTT", "G": "GGT",
    "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTT", "M": "ATG", "N": "AAT",
    "P": "CCT", "Q": "CAA", "R": "CGT", "S": "TCT", "T": "ACT", "V": "GTT",
    "W": "TGG", "Y": "TAT",
}
_AA = "ACDEFGHIKLMNPQRSTVWY"


def _dna(s: str) -> np.ndarray:
    return np.array([_B[c] for c in s], dtype=np.uint8)


def make_domain_peptides(seed: int = 4242):
    """Fixed-seed RT/INT/RH ancestor peptides shared by the genome's LTR
    families AND the fixture HMM database (--hmm), so the native
    classifier has real targets at wheat scale."""
    rng = np.random.default_rng(seed)
    return {
        dom: "".join(rng.choice(list(_AA), size=n))
        for dom, n in (("RT", 220), ("INT", 160), ("RH", 130))
    }


def make_library(rng, n_fam, fam_len, ltr_frac=0.0, peps=None):
    """Repeat families; a fraction are STRUCTURED LTR retrotransposons:
    4 bp TSD + 800 bp LTR (TG..CA) + internal region carrying
    reverse-translated RT/INT/RH domains + identical LTR + TSD — real
    work for the detectors (TG..CA/TSD) and the domain classifier."""
    lib = rng.integers(0, 4, n_fam * fam_len, dtype=np.uint8).reshape(n_fam, fam_len)
    if ltr_frac <= 0:
        return lib
    n_ltr = int(n_fam * ltr_frac)
    dom_dna = (
        np.concatenate([_dna("".join(_CODON[a] for a in peps[d]))
                        for d in ("INT", "RT", "RH")])
        if peps else np.zeros(0, np.uint8)
    )
    for fi in range(n_ltr):
        tsd = rng.integers(0, 4, 4, dtype=np.uint8)
        L = 800
        ltr = rng.integers(0, 4, L, dtype=np.uint8)
        ltr[0], ltr[1] = _B["T"], _B["G"]
        ltr[-2], ltr[-1] = _B["C"], _B["A"]
        inner_len = fam_len - 2 * L - 8
        inner = rng.integers(0, 4, inner_len, dtype=np.uint8)
        if dom_dna.size and dom_dna.size + 20 < inner_len:
            # per-family mutated domain cassette at a fixed offset
            cas = dom_dna.copy()
            nm = int(cas.size * 0.05)
            p = rng.integers(0, cas.size, nm)
            cas[p] = (cas[p] + rng.integers(1, 4, nm, dtype=np.uint8)) % 4
            inner[10 : 10 + cas.size] = cas
        lib[fi] = np.concatenate([tsd, ltr, inner, ltr, tsd])
    return lib


def make_set_plan(rng):
    """Shared segment plan for one homoeologous set: homoeologs are
    COLINEAR diverged copies of the same ancestor arrangement (like real
    subgenomes), so the blocks stage has genuine synteny to find — segment
    kinds, shared-family ids, and the ancestral unique segments are drawn
    once per set and reused for every subgenome's chromosome."""
    n_seg = CHROM // SEG
    kinds = rng.random(n_seg)
    fam_shared = rng.integers(0, 120, n_seg)
    uniq_mask = kinds >= 0.95
    uniq = rng.integers(0, 4, (int(uniq_mask.sum()), SEG), dtype=np.uint8)
    return kinds, fam_shared, uniq


def make_chrom(rng, shared_lib, sg_lib, plan):
    """60% shared repeats + 30% SG repeats + 5% unique, 0.3% point mutation.

    ``plan`` fixes the ancestral arrangement across the set's subgenomes;
    only the SG-specific family CHOICE and the point mutations differ, so
    homoeologs are ~99%-arrangement-colinear with SG-specific islands."""
    kinds, fam_shared, uniq = plan
    n_seg = kinds.size
    fam_sg = rng.integers(0, sg_lib.shape[0], n_seg)
    parts = np.empty((n_seg, SEG), dtype=np.uint8)
    shared_mask = kinds < 0.62
    sg_mask = (kinds >= 0.62) & (kinds < 0.95)
    uniq_mask = kinds >= 0.95
    parts[shared_mask] = shared_lib[fam_shared[shared_mask] % shared_lib.shape[0]]
    parts[sg_mask] = sg_lib[fam_sg[sg_mask]]
    parts[uniq_mask] = uniq
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
    peps = make_domain_peptides()
    # ~1/3 of families are structured LTR elements (TSD + TG..CA LTR pair +
    # RT/INT/RH domain cassette) so the default pipeline's LTR/classify/
    # tree steps have genuine targets at wheat scale
    shared_lib = make_library(lib_rng, 120, SEG, ltr_frac=0.33, peps=peps)
    sg_libs = {
        sg: make_library(lib_rng, 60, SEG, ltr_frac=0.33, peps=peps)
        for sg in SGS
    }
    if "--hmm" in sys.argv:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from hmm_fixture import profile_from_family, simulate_family, write_hmmer3

        h_rng = np.random.default_rng(77)
        aa_idx = {a: i for i, a in enumerate(_AA)}
        specs = []
        for dom, pep in peps.items():
            anc = np.array([aa_idx[a] for a in pep], dtype=np.int64)
            members = np.tile(anc, (40, 1))
            for i in range(40):
                nm = h_rng.binomial(anc.size, 0.15)
                p = h_rng.choice(anc.size, size=nm, replace=False)
                members[i, p] = h_rng.integers(0, 20, size=nm)
            specs.append({
                "name": f"Class_I/LTR/Ty1_copia/Angela/{dom}",
                "match_probs": profile_from_family(members),
            })
        write_hmmer3(f"{OUT}/wheat_rexdb.hmm", specs)
        print(f"wrote {OUT}/wheat_rexdb.hmm", flush=True)
    fa = (f"{OUT}/genome14_{SET_LO}_{SET_HI}.fa" if not ONE
          else f"{OUT}/chrom1.fa")
    with open(fa, "wb") as f:
        for i in range(SET_LO, (SET_LO + 1 if ONE else SET_HI + 1)):
            # per-set ancestral arrangement, deterministic by SET index so
            # --sets range generation still produces identical genomes
            plan = make_set_plan(np.random.default_rng(5000 + i))
            for sg in (SGS[:1] if ONE else SGS):
                chrom = make_chrom(rng, shared_lib, sg_libs[sg], plan)
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
