"""Progressive multiple alignment of domain peptides + alignment distances.

Replaces the reference's external MSA/phylogeny stack — mafft alignment of
concatenated domain peptides, trimal trimming, FastTree ML with local
supports (reference LTR.py:144-299, run `mafft/trimal/FastTree` at
LTR.py:196-221, api/TEsorter/modules/concatenate_domains.py:10-143) — with:

- a native progressive profile-profile aligner (ltr/_native sp_profile_align,
  Gotoh affine-gap DP over 21-dim column-frequency dot products; guide tree
  by UPGMA over k-mer-sketch distances),
- trimal-style gap-column trimming,
- Kimura-corrected protein distances computed on device (the all-pairs
  match/valid counts are two big one-hot matmuls — MXU work),
- neighbor joining (native sp_nj_tree) with BOOTSTRAP support values from
  column-resampled distance replicates (FastTree's local supports analogue).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from subphaser_tpu.ltr.native import nj_tree, profile_align

AA = "ACDEFGHIKLMNPQRSTVWY"
AA_ORD = {a: i for i, a in enumerate(AA)}
GAP = 20  # gap index in the 21-letter profile alphabet

# BLOSUM62 over the 20 canonical amino acids (order = AA above), public
# constants (Henikoff & Henikoff 1992).
_B62 = """
 4  0 -2 -1 -2  0 -2 -1 -1 -1 -1 -2 -1 -1 -1  1  0  0 -3 -2
 0  9 -3 -4 -2 -3 -3 -1 -3 -1 -1 -3 -3 -3 -3 -1 -1 -1 -2 -2
-2 -3  6  2 -3 -1 -1 -3 -1 -4 -3  1 -1  0 -2  0 -1 -3 -4 -3
-1 -4  2  5 -3 -2  0 -3  1 -3 -2  0 -1  2  0  0 -1 -2 -3 -2
-2 -2 -3 -3  6 -3 -1  0 -3  0  0 -3 -4 -3 -3 -2 -2 -1  1  3
 0 -3 -1 -2 -3  6 -2 -4 -2 -4 -3  0 -2 -2 -2  0 -2 -3 -2 -3
-2 -3 -1  0 -1 -2  8 -3 -1 -3 -2  1 -2  0  0 -1 -2 -3 -2  2
-1 -1 -3 -3  0 -4 -3  4 -3  2  1 -3 -3 -3 -3 -2 -1  3 -3 -1
-1 -3 -1  1 -3 -2 -1 -3  5 -2 -1  0 -1  1  2  0 -1 -2 -3 -2
-1 -1 -4 -3  0 -4 -3  2 -2  4  2 -3 -3 -2 -2 -2 -1  1 -2 -1
-1 -1 -3 -2  0 -3 -2  1 -1  2  5 -2 -2  0 -1 -1 -1  1 -1 -1
-2 -3  1  0 -3  0  1 -3  0 -3 -2  6 -2  0  0  1  0 -3 -4 -2
-1 -3 -1 -1 -4 -2 -2 -3 -1 -3 -2 -2  7 -1 -2 -1 -1 -2 -4 -3
-1 -3  0  2 -3 -2  0 -3  1 -2  0  0 -1  5  1  0 -1 -2 -2 -1
-1 -3 -2  0 -3 -2  0 -3  2 -2 -1  0 -2  1  5 -1 -1 -3 -3 -2
 1 -1  0  0 -2  0 -1 -2  0 -2 -1  1 -1  0 -1  4  1 -2 -3 -2
 0 -1 -1 -1 -2 -2 -2 -1 -1 -1 -1  0 -1 -1 -1  1  5  0 -2 -2
 0 -1 -3 -2 -1 -3 -3  3 -2  1  1 -3 -2 -2 -3 -2  0  4 -3 -1
-3 -2 -4 -3  1 -2 -2 -3 -3 -2 -1 -4 -4 -2 -3 -3 -2 -3 11  2
-2 -2 -3 -2  3 -3  2 -1 -2 -1 -1 -2 -3 -1 -2 -2 -2 -1  2  7
"""


def blosum62_21() -> np.ndarray:
    """(21, 21) float32: BLOSUM62 with a gap row/column.

    Gap-vs-residue scores a mild penalty (the affine open/extend penalties
    carry the real gap cost in the DP); gap-vs-gap is free, as in standard
    profile sum-of-pairs scoring."""
    s = np.array(_B62.split(), dtype=np.float32).reshape(20, 20)
    out = np.full((21, 21), -1.0, dtype=np.float32)
    out[:20, :20] = s
    out[GAP, GAP] = 0.0
    return out


def encode_peptides(peps: list[str]) -> list[np.ndarray]:
    """Peptide strings -> uint8 index arrays (unknown residues dropped)."""
    out = []
    for p in peps:
        idx = np.array([AA_ORD.get(a, -1) for a in p.upper()], dtype=np.int16)
        out.append(idx[idx >= 0].astype(np.uint8))
    return out


def _kmer_profile(seq: np.ndarray, k: int = 3, dim: int = 4096) -> np.ndarray:
    """Hashed k-mer count vector for guide-tree distances (cheap, host)."""
    v = np.zeros(dim, dtype=np.float64)
    n = seq.size - k + 1
    if n <= 0:
        return v
    code = np.zeros(n, dtype=np.int64)
    for j in range(k):
        code = code * 20 + seq[j : j + n]
    np.add.at(v, code % dim, 1.0)
    nrm = np.linalg.norm(v)
    return v / nrm if nrm > 0 else v


def _guide_order(seqs: list[np.ndarray]) -> list[tuple[int, int]]:
    """UPGMA merge schedule over cosine k-mer distances.

    Returns (i, j) merges over cluster ids: leaves are 0..n-1, merge t
    creates cluster n + t."""
    n = len(seqs)
    profs = np.stack([_kmer_profile(s) for s in seqs])
    dm = 1.0 - profs @ profs.T
    np.fill_diagonal(dm, np.inf)
    size = {i: 1 for i in range(n)}
    merges = []
    rows = list(range(n))  # rows[r] = cluster id occupying row r (or None)
    alive = np.ones(n, dtype=bool)
    for t in range(n - 1):
        sub = np.where(alive)[0]
        block = dm[np.ix_(sub, sub)]
        r, c = np.unravel_index(np.argmin(block), block.shape)
        ri, rj = int(sub[r]), int(sub[c])
        ci, cj = rows[ri], rows[rj]
        merges.append((ci, cj))
        new_id = n + t
        si, sj = size[ci], size[cj]
        # UPGMA average-linkage update into row ri
        dm[ri, :] = (si * dm[ri, :] + sj * dm[rj, :]) / (si + sj)
        dm[:, ri] = dm[ri, :]
        dm[ri, ri] = np.inf
        alive[rj] = False
        rows[ri] = new_id
        size[new_id] = si + sj
    return merges


def _profile(block: np.ndarray) -> np.ndarray:
    """(m, L) uint8 aligned block -> (L, 21) float32 column frequencies."""
    m, L = block.shape
    prof = np.zeros((L, 21), dtype=np.float32)
    for a in range(21):
        prof[:, a] = (block == a).sum(axis=0)
    return prof / max(m, 1)


def _apply_ops(b1: np.ndarray, b2: np.ndarray, ops: np.ndarray) -> np.ndarray:
    """Merge two aligned blocks along an (op, len) run list."""
    cols1, cols2 = [], []
    i = j = 0
    for op, ln in ops:
        if op == 0:
            cols1.append(b1[:, i : i + ln]); cols2.append(b2[:, j : j + ln])
            i += ln; j += ln
        elif op == 1:
            cols1.append(b1[:, i : i + ln])
            cols2.append(np.full((b2.shape[0], ln), GAP, np.uint8))
            i += ln
        else:
            cols1.append(np.full((b1.shape[0], ln), GAP, np.uint8))
            cols2.append(b2[:, j : j + ln])
            j += ln
    top = np.concatenate(cols1, axis=1) if cols1 else b1[:, :0]
    bot = np.concatenate(cols2, axis=1) if cols2 else b2[:, :0]
    return np.concatenate([top, bot], axis=0)


def progressive_msa(peptides: list[str], gap_open: float = 11.0,
                    gap_ext: float = 1.0) -> np.ndarray:
    """Align peptides progressively along a UPGMA guide tree.

    Returns (n, L) uint8 with rows in INPUT order (20 = gap). Mirrors the
    role of the reference's mafft run (LTR.py:196-204) with a native
    profile-profile Gotoh aligner per merge."""
    seqs = encode_peptides(peptides)
    n = len(seqs)
    if n == 0:
        return np.zeros((0, 0), dtype=np.uint8)
    if n == 1:
        return seqs[0][None, :]
    S = blosum62_21()
    merges = _guide_order(seqs)
    # cluster id -> (row indices, aligned block)
    clusters: dict[int, tuple[list[int], np.ndarray]] = {
        i: ([i], seqs[i][None, :].astype(np.uint8)) for i in range(n)
    }
    for t, (ci, cj) in enumerate(merges):
        rows1, b1 = clusters.pop(ci)
        rows2, b2 = clusters.pop(cj)
        if b1.shape[1] == 0 or b2.shape[1] == 0:
            # degenerate empty profile: pad the empty one with gaps
            L = max(b1.shape[1], b2.shape[1])
            b1p = np.full((b1.shape[0], L), GAP, np.uint8); b1p[:, : b1.shape[1]] = b1
            b2p = np.full((b2.shape[0], L), GAP, np.uint8); b2p[:, : b2.shape[1]] = b2
            merged = np.concatenate([b1p, b2p], axis=0)
        else:
            p1 = _profile(b1)
            sp2 = _profile(b2) @ S.T
            ops = profile_align(p1, sp2, gap_open=gap_open, gap_ext=gap_ext)
            merged = _apply_ops(b1, b2, ops)
        clusters[n + t] = (rows1 + rows2, merged)
    (rows, block), = clusters.values()
    order = np.argsort(np.asarray(rows))
    return block[order]


def trim_alignment(aln: np.ndarray, min_residue_frac: float = 0.1,
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Drop columns whose non-gap fraction is below ``min_residue_frac``
    (trimal -gt analogue; the reference runs trimal -automated1,
    LTR.py:205-213). Returns (trimmed, kept column indices)."""
    if aln.size == 0:
        return aln, np.zeros(0, np.int64)
    frac = (aln != GAP).mean(axis=0)
    keep = np.flatnonzero(frac >= min_residue_frac)
    if keep.size == 0:  # never trim to nothing
        keep = np.arange(aln.shape[1])
    return aln[:, keep], keep


_MATCH_COUNTS_JIT = None


def _match_counts(aln_dev, w_dev):
    """One jitted call: (valid-pair counts, match counts) — 21 one-hot
    matmuls on the MXU. Jitted once so bootstrap replicates are single
    dispatches (eager per-op round trips through the remote tunnel would
    dominate otherwise)."""
    global _MATCH_COUNTS_JIT
    if _MATCH_COUNTS_JIT is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def fn(a, wj):
            valid = (a != GAP).astype(jnp.float32)
            V = (valid * wj) @ valid.T
            M = jnp.zeros((a.shape[0], a.shape[0]), jnp.float32)
            for c in range(20):
                x = (a == c).astype(jnp.float32)
                M = M + (x * wj) @ x.T
            return V, M

        _MATCH_COUNTS_JIT = fn
    return _MATCH_COUNTS_JIT(aln_dev, w_dev)


def kimura_distances(aln: np.ndarray, weights: np.ndarray | None = None
                     ) -> np.ndarray:
    """Kimura-corrected protein distances from an alignment.

    p = mismatches / mutually-ungapped columns per pair;
    d = -ln(1 - p - 0.2 p^2) (Kimura 1983, the correction FastTree and
    scoredist-style tools apply). The all-pairs match and valid counts are
    20 + 1 one-hot matmuls — device (MXU) work via jnp. ``weights``
    (float per column) supports bootstrap column resampling."""
    import jax.numpy as jnp

    n, L = aln.shape
    if n == 0:
        return np.zeros((0, 0))
    w = np.ones(L, np.float32) if weights is None else weights.astype(np.float32)
    V, M = _match_counts(jnp.asarray(aln), jnp.asarray(w))
    V_np = np.asarray(V, dtype=np.float64)
    M_np = np.asarray(M, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = 1.0 - M_np / V_np
    p = np.clip(np.nan_to_num(p, nan=1.0), 0.0, 0.85)
    d = -np.log(np.maximum(1.0 - p - 0.2 * p * p, 1e-6))
    np.fill_diagonal(d, 0.0)
    return d


def _bipartitions(newick: str) -> set[frozenset[str]]:
    """Non-trivial bipartitions (as the smaller-side leaf set canonicalized
    by the full leaf set) of a newick tree."""
    from subphaser_tpu.ltr.tree import parse_newick

    root = parse_newick(newick)
    all_leaves: set[str] = set()
    parts: list[set[str]] = []

    def walk(n) -> set[str]:
        if not n.children:
            all_leaves.add(n.name)
            return {n.name}
        s: set[str] = set()
        for c in n.children:
            s |= walk(c)
        parts.append(s)
        return s

    walk(root)
    out: set[frozenset[str]] = set()
    for s in parts:
        if 1 < len(s) < len(all_leaves) - 1:
            comp = all_leaves - s
            out.add(frozenset(min(s, comp, key=lambda x: sorted(x))))
    return out


def _annotate_supports(newick: str, support: dict[frozenset[str], int]) -> str:
    """Write integer bootstrap percentages as internal node labels."""
    from subphaser_tpu.ltr.tree import _to_newick, parse_newick

    root = parse_newick(newick)
    all_leaves: set[str] = set()

    def leaves(n) -> set[str]:
        if not n.children:
            all_leaves.add(n.name)
            return {n.name}
        s: set[str] = set()
        for c in n.children:
            s |= leaves(c)
        return s

    leaves(root)

    def walk(n) -> set[str]:
        if not n.children:
            return {n.name}
        s: set[str] = set()
        for c in n.children:
            s |= walk(c)
        if 1 < len(s) < len(all_leaves) - 1:
            key = frozenset(min(s, all_leaves - s, key=lambda x: sorted(x)))
            if key in support:
                n.name = str(support[key])
        return s

    walk(root)
    out = _to_newick(root)
    return out[: out.rfind(":")] + ";"


def nj_with_support(aln: np.ndarray, names: list[str], n_boot: int = 100,
                    seed: int = 0, threads: int = 8) -> str:
    """NJ tree from Kimura distances + bootstrap supports.

    Bootstrap = resample alignment columns (multinomial weights reuse the
    same device matmuls), NJ per replicate (native, GIL released ->
    thread-parallel), support = % of replicates containing each bipartition
    — the role of FastTree's local support values (reference LTR.py:216).
    """
    n, L = aln.shape
    dist = kimura_distances(aln)
    main = nj_tree(dist, names)
    if n_boot <= 0 or n < 4 or L < 2:
        return main
    rng = np.random.default_rng(seed)
    weight_sets = rng.multinomial(L, np.full(L, 1.0 / L), size=n_boot)

    def one(b: int) -> set[frozenset[str]]:
        d = kimura_distances(aln, weights=weight_sets[b])
        return _bipartitions(nj_tree(d, names))

    counts: dict[frozenset[str], int] = {}
    with ThreadPoolExecutor(max_workers=threads) as ex:
        for parts in ex.map(one, range(n_boot)):
            for p in parts:
                counts[p] = counts.get(p, 0) + 1
    support = {p: round(100.0 * c / n_boot) for p, c in counts.items()}
    return _annotate_supports(main, support)


def write_fasta_alignment(path: str, names: list[str], aln: np.ndarray) -> None:
    """MSA -> aligned FASTA ('-' gaps), the reference's .aln artifact."""
    letters = np.array(list(AA + "-"), dtype="U1")
    with open(path, "w") as f:
        for name, row in zip(names, aln):
            f.write(f">{name}\n")
            f.write("".join(letters[row].tolist()) + "\n")
