"""Realistic HMMER3 fixture profiles + a forward-algorithm oracle.

The fixture emits HMMER3/f ASCII with the fields real hmmbuild output
carries (ACC/DESC/LENG/MAXL/ALPH/DATE, STATS LOCAL lines, GA/TC/NC
thresholds, COMPO, MAP/CONS annotation columns) and emission/transition
statistics DERIVED FROM A SIMULATED SEED ALIGNMENT with Dirichlet
pseudocounts — peaked-but-stochastic match emissions and realistic
match-match transition mass, unlike hand-typed toy tables.

The oracle is a numpy FORWARD algorithm (log-sum-exp over the same local
alignment paths the package's Viterbi scores maximize). hmmsearch ranks by
forward-score E-values (reference app.py:719-930 filters TEsorter domtbl
rows by E-value); decision parity between the package's calibrated-Viterbi
accept/reject and a calibrated-forward oracle is the testable equivalent
without network access to real REXdb/hmmer (PLAN.md acknowledges the
container cannot fetch them).
"""

from __future__ import annotations

import numpy as np

AMINO = "ACDEFGHIKLMNPQRSTVWY"
# marginal aa frequencies of the Swiss-Prot background (approx, public)
BG = np.array([
    0.0787, 0.0151, 0.0535, 0.0668, 0.0397, 0.0696, 0.0229, 0.0590,
    0.0519, 0.0962, 0.0219, 0.0429, 0.0461, 0.0344, 0.0512, 0.0682,
    0.0541, 0.0673, 0.0133, 0.0291,
])
BG = BG / BG.sum()


def simulate_family(rng, length: int, n_seqs: int = 40,
                    mut_rate: float = 0.25) -> tuple[np.ndarray, np.ndarray]:
    """Ancestor + mutated members -> (consensus idx, (n, L) member idx)."""
    anc = rng.choice(20, size=length, p=BG)
    members = np.tile(anc, (n_seqs, 1))
    for i in range(n_seqs):
        nm = rng.binomial(length, mut_rate)
        pos = rng.choice(length, size=nm, replace=False)
        members[i, pos] = rng.choice(20, size=nm, p=BG)
    return anc.astype(np.int64), members.astype(np.int64)


def profile_from_family(members: np.ndarray, pseudo: float = 0.5):
    """Column emission probabilities with Dirichlet-background pseudocounts."""
    n, L = members.shape
    probs = np.zeros((L, 20))
    for j in range(L):
        counts = np.bincount(members[:, j], minlength=20).astype(float)
        probs[j] = (counts + pseudo * 20 * BG) / (n + pseudo * 20)
    return probs


def write_hmmer3(path: str, profiles: list[dict]) -> None:
    """profiles: [{name, acc, desc, match_probs (L,20), ga, tc, nc}]."""
    with open(path, "w") as f:
        for p in profiles:
            probs = p["match_probs"]
            L = probs.shape[0]
            rng = np.random.default_rng(abs(hash(p["name"])) % (1 << 31))
            # realistic transitions: high M->M with jittered indel hotspots
            tmi = 10 ** -rng.uniform(1.6, 2.4, size=L)
            tmd = 10 ** -rng.uniform(1.6, 2.4, size=L)
            tmm = 1.0 - tmi - tmd
            tim = np.full(L, 0.5)
            tii = 1.0 - tim
            tdm = np.full(L, 0.7)
            tdd = 1.0 - tdm
            f.write("HMMER3/f [3.3.2 | Nov 2020]\n")
            f.write(f"NAME  {p['name']}\n")
            f.write(f"ACC   {p.get('acc', 'SPT%05d' % (abs(hash(p['name'])) % 99999))}\n")
            f.write(f"DESC  {p.get('desc', 'fixture domain profile')}\n")
            f.write(f"LENG  {L}\n")
            f.write(f"MAXL  {int(L * 1.3) + 8}\n")
            f.write("ALPH  amino\n")
            f.write("RF    no\nMM    no\nCONS  yes\nCS    no\nMAP   yes\n")
            f.write("DATE  Mon Aug 17 12:00:00 2026\n")
            f.write(f"NSEQ  {p.get('nseq', 40)}\n")
            f.write(f"EFFN  {p.get('effn', 3.2):.6f}\n")
            f.write(f"CKSUM {abs(hash(p['name'])) % (1 << 32)}\n")
            ga = p.get("ga", 25.0)
            tc = p.get("tc", ga + 2.0)
            nc = p.get("nc", ga - 3.0)
            f.write(f"GA    {ga:.2f} {ga:.2f}\n")
            f.write(f"TC    {tc:.2f} {tc:.2f}\n")
            f.write(f"NC    {nc:.2f} {nc:.2f}\n")
            f.write(f"STATS LOCAL MSV      {-9.5:8.4f}  0.71888\n")
            f.write(f"STATS LOCAL VITERBI  {-10.1:8.4f}  0.71888\n")
            f.write(f"STATS LOCAL FORWARD  {-3.6:8.4f}  0.71888\n")
            f.write("HMM          " + "        ".join(AMINO) + "\n")
            f.write("            m->m     m->i     m->d     i->m     i->i"
                    "     d->m     d->d\n")
            compo = -np.log(BG)
            f.write("  COMPO   " + " ".join(f"{x:8.5f}" for x in compo) + "\n")
            ins = -np.log(BG)
            f.write("          " + " ".join(f"{x:8.5f}" for x in ins) + "\n")
            t0 = [-np.log(0.98), -np.log(0.01), -np.log(0.01),
                  -np.log(0.5), -np.log(0.5), 0.0, float("inf")]
            f.write("          " + " ".join(
                "*" if not np.isfinite(x) else f"{x:8.5f}" for x in t0) + "\n")
            for k in range(1, L + 1):
                me = -np.log(probs[k - 1])
                cons = AMINO[int(np.argmax(probs[k - 1]))].lower()
                f.write(f"{k:7d}   " + " ".join(f"{x:8.5f}" for x in me)
                        + f" {k:6d} {cons} - - -\n")
                f.write("          " + " ".join(f"{x:8.5f}" for x in ins) + "\n")
                if k == L:
                    trow = [-np.log(tmm[k-1] + tmd[k-1]), -np.log(tmi[k-1]),
                            float("inf"), -np.log(tim[k-1]), -np.log(tii[k-1]),
                            0.0, float("inf")]
                else:
                    trow = [-np.log(tmm[k-1]), -np.log(tmi[k-1]),
                            -np.log(tmd[k-1]), -np.log(tim[k-1]),
                            -np.log(tii[k-1]), -np.log(tdm[k-1]),
                            -np.log(tdd[k-1])]
                f.write("          " + " ".join(
                    "*" if not np.isfinite(x) else f"{x:8.5f}" for x in trow)
                    + "\n")
            f.write("//\n")


def forward_local(seq_idx: np.ndarray, prof) -> float:
    """Log-sum-exp forward score (nats) over the SAME local path space the
    package's viterbi_local maximizes: free entry into any match state,
    free exit from any match state, M/I/D internal transitions.

    ``prof`` is a subphaser_tpu.ltr.classify.Profile (log-odds match
    emissions vs background; transitions in nats)."""
    m = prof.length
    if seq_idx.size == 0 or m == 0:
        return 0.0
    NEG = -1e30
    ms = prof.match_scores
    tmm = np.maximum(prof.tmm, NEG)
    tmi = np.maximum(prof.tmi, NEG)
    tmd = np.maximum(prof.tmd, NEG)
    tim = np.maximum(prof.tim, NEG)
    tii = np.maximum(prof.tii, NEG)
    tdm = np.maximum(prof.tdm, NEG)
    tdd = np.maximum(prof.tdd, NEG)

    lse = np.logaddexp

    fm = np.full(m + 1, NEG)
    fi = np.full(m + 1, NEG)
    total = NEG
    # delete-state prefix recurrence fd[k] = lse(fm[k-1]+tmd[k-1],
    # fd[k-1]+tdd[k-1]) closes to a logaddexp.accumulate after dividing
    # out S = cumsum(tdd) (same telescoping the Viterbi cummax uses)
    s_cum = np.concatenate([[0.0], np.cumsum(tdd[1:m])])  # S over nodes 1..m
    fd = np.full(m + 1, NEG)
    for x in seq_idx:
        emit = ms[1:, x]
        prev_m, prev_i = fm.copy(), fi.copy()
        cand = lse(lse(prev_m[:-1] + tmm[:-1], prev_i[:-1] + tim[:-1]),
                   fd[:-1] + tdm[:-1])
        cand = lse(cand, 0.0)  # local entry (score 0) into any node
        fm = np.concatenate([[NEG], cand + emit])
        fi = lse(prev_m + tmi, prev_i + tii)
        a = fm[:m] + tmd[:m] - np.concatenate([[0.0], s_cum[:-1]])
        fd = np.concatenate(
            [[NEG],
             np.logaddexp.accumulate(a) + np.concatenate([[0.0], s_cum[:-1]])]
        )
        # local exit from any match state after this residue
        hi = float(fm[1:].max())
        row = hi + np.log(np.exp(np.maximum(fm[1:] - hi, -60.0)).sum())
        total = lse(total, row)
    return float(total)
