"""Generate a synthetic allotetraploid genome for end-to-end tests/verification.

Usage: python tests/make_synthetic.py OUTDIR [n_sets] [chrom_size]

Writes OUTDIR/genome.fa.gz (2 subgenomes x n_sets chromosomes, each carrying
a subgenome-specific repeat family plus shared repeats and N-runs) and
OUTDIR/sg.config using the reference's rename (`new|old`) and comma-group
syntax (reference example_data/Arabidopsis_suecica_sg.config).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def make_genome(outdir: str, n_sets: int = 4, chrom_size: int = 150_000, seed: int = 0,
                with_ltr: bool = False):
    from subphaser_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(seed)

    def rand_seq(n):
        return "".join(rng.choice(list("ACGT"), size=n))

    def mutate(s, rate):
        out = []
        for ch in s:
            if rng.random() < rate:
                out.append(rng.choice([c for c in "ACGT" if c != ch]))
            else:
                out.append(ch)
        return "".join(out)

    rep = {"A": rand_seq(120), "B": rand_seq(120)}
    shared = rand_seq(120)
    # subgenome-specific LTR families: the LTR itself carries SG-specific
    # sequence so phased k-mers map onto the elements
    ltr_fam = {sg: rand_seq(350) for sg in "AB"}
    ltr_int = {sg: rand_seq(2000) for sg in "AB"}

    def ltr_element(sg):
        ltr = mutate(ltr_fam[sg], 0.02)
        tsd = rand_seq(5)
        return tsd + ltr + mutate(ltr_int[sg], 0.02) + mutate(ltr, 0.04) + tsd

    def chrom(sg, ancestor):
        # homoeologs = diverged copies of a shared ancestor (like real
        # subgenomes), plus SG-specific repeat amplification on top
        s = list(mutate(ancestor, 0.08))
        for _ in range(max(20, chrom_size // 2000)):
            p = rng.integers(0, chrom_size - 130)
            s[p : p + 120] = list(rep[sg])
        for _ in range(max(10, chrom_size // 4000)):
            p = rng.integers(0, chrom_size - 130)
            s[p : p + 120] = list(shared)
        for _ in range(10):
            p = rng.integers(0, chrom_size - 60)
            s[p : p + 50] = list("N" * 50)
        if with_ltr:
            n_elem = max(3, chrom_size // 40_000)
            for e in range(n_elem):
                el = ltr_element(sg)
                p = rng.integers(0, chrom_size - len(el) - 1)
                s[p : p + len(el)] = list(el)
        return "".join(s)

    records = []
    for i in range(1, n_sets + 1):
        ancestor = rand_seq(chrom_size)
        records.append((f"CMA{i}.1", chrom("A", ancestor)))
        records.append((f"CMB{i}.1", chrom("B", ancestor)))
    os.makedirs(outdir, exist_ok=True)
    write_fasta(os.path.join(outdir, "genome.fa.gz"), records)

    lines = ["# synthetic homoeologous sets"]
    for i in range(1, n_sets - 1):
        lines.append(f"A{i}|CMA{i}.1\tB{i}|CMB{i}.1")
    # last two sets use comma-grouping, like the Arabidopsis_suecica config
    i, j = n_sets - 1, n_sets
    lines.append(f"A{i}|CMA{i}.1,A{j}|CMA{j}.1\tB{i}|CMB{i}.1,B{j}|CMB{j}.1")
    with open(os.path.join(outdir, "sg.config"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return os.path.join(outdir, "genome.fa.gz"), os.path.join(outdir, "sg.config")


if __name__ == "__main__":
    outdir = sys.argv[1]
    n_sets = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 150_000
    print(make_genome(outdir, n_sets, size))
