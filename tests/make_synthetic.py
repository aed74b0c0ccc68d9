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


# one-codon-per-aa reverse translation for planting domain ORFs
AMINO = "ACDEFGHIKLMNPQRSTVWY"
_CODON = {
    "A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA", "F": "TTT", "G": "GGT",
    "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTT", "M": "ATG", "N": "AAT",
    "P": "CCT", "Q": "CAA", "R": "CGT", "S": "TCT", "T": "ACT", "V": "GTT",
    "W": "TGG", "Y": "TAT",
}


def reverse_translate(pep: str) -> str:
    return "".join(_CODON[a] for a in pep)


def _write_profile(f, name: str, peptide: str) -> None:
    """Minimal HMMER3/f text profile strongly matching ``peptide`` (the
    format subphaser_tpu.ltr.classify.load_hmm_db parses; reference db:
    REXdb via hmmbuild)."""
    import math

    m = len(peptide)
    f.write("HMMER3/f [3.3 | synthetic]\n")
    f.write(f"NAME  {name}\n")
    f.write(f"LENG  {m}\n")
    f.write("ALPH  amino\n")
    syms = " ".join(f"{a:>8}" for a in AMINO)
    f.write(f"HMM      {syms}\n")
    f.write("            m->m     m->i     m->d     i->m     i->i     d->m     d->d\n")
    bg = -math.log(1.0 / 20)
    f.write("  COMPO   " + "  ".join(f"{bg:.5f}" for _ in range(20)) + "\n")
    f.write("          " + "  ".join(f"{bg:.5f}" for _ in range(20)) + "\n")
    t = [0.05129, 3.0, 3.0, 0.61958, 0.77255, 0.0, "*"]
    f.write("          " + "  ".join(str(x) for x in t) + "\n")
    for k in range(1, m + 1):
        aa = peptide[k - 1]
        row = [f"{-math.log(0.7 if a == aa else 0.3 / 19):.5f}" for a in AMINO]
        f.write(f"{k:>7} " + "  ".join(row) + f"  {k} - - - -\n")
        f.write("          " + "  ".join(f"{bg:.5f}" for _ in range(20)) + "\n")
        f.write("          " + "  ".join(str(x) for x in t) + "\n")
    f.write("//\n")


def make_hmm_db(path: str, seed: int = 7) -> dict[str, str]:
    """Write a mini REXdb-style profile db; returns {domain: peptide}."""
    rng = np.random.default_rng(seed)
    peptides = {}
    with open(path, "w") as f:
        for dom in ["GAG", "PROT", "INT", "RT", "RH"]:
            pep = "".join(rng.choice(list(AMINO), size=40))
            peptides[dom] = pep
            _write_profile(f, f"Class_I/LTR/Ty1_copia/Ale/{dom}", pep)
        pep = "".join(rng.choice(list(AMINO), size=40))
        peptides["GYPSY_RT"] = pep
        _write_profile(f, "Class_I/LTR/Ty3_gypsy/Tekay/RT", pep)
    return peptides


def make_genome(outdir: str, n_sets: int = 4, chrom_size: int = 150_000, seed: int = 0,
                with_ltr: bool = False, with_ltr_domains: bool = False):
    from subphaser_tpu.io.fasta import write_fasta

    os.makedirs(outdir, exist_ok=True)
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
    if with_ltr_domains:
        with_ltr = True
        peptides = make_hmm_db(os.path.join(outdir, "rexdb_mini.hmm"))
        orfs = "".join(reverse_translate(peptides[d])
                       for d in ["GAG", "PROT", "INT", "RT", "RH"])
        # SG-specific flanks keep the internal region subgenome-diagnostic
        ltr_int = {sg: rand_seq(400) + orfs + rand_seq(400) for sg in "AB"}
    else:
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
    paths = (os.path.join(outdir, "genome.fa.gz"), os.path.join(outdir, "sg.config"))
    if with_ltr_domains:
        return paths + (os.path.join(outdir, "rexdb_mini.hmm"),)
    return paths


if __name__ == "__main__":
    outdir = sys.argv[1]
    n_sets = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 150_000
    print(make_genome(outdir, n_sets, size))
