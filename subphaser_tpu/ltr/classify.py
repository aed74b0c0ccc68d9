"""TE/LTR classification engine (TEsorter-equivalent, database-pluggable).

The reference shells out to `TEsorter` which 6-frame-translates LTR inner
regions and hmmscans them against the REXdb protein-domain profiles
(reference LTR.py:378-401, api/TEsorter/app.py:201-344). This module
implements that engine natively:

- 6-frame translation
- HMMER3 ASCII ``.hmm`` parser (profile match emissions + transitions)
- vectorized plan7 local Viterbi scan (numpy)
- per-element domain aggregation -> order / superfamily / clade,
  ``completed`` = GAG-PROT-INT-RT-RH all present (reference app.py:556-616),
  strand from the best-scoring frame

REXdb itself is distribution-restricted data, not code: point
``db_path`` at any HMMER3 file whose profile names follow the REXdb
convention (e.g. ``Class_I/LTR/Ty3_gypsy/.../RT``). Without a database the
LTR pipeline falls back to using all detected LTRs (`-all_ltr` behavior).
"""

from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass, field

import numpy as np

# standard genetic code, table 1
_CODONS = {}
_BASES = "TCAG"
_AA = (
    "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
)
for _i, _a in enumerate(_AA):
    _CODONS[_BASES[_i // 16] + _BASES[(_i // 4) % 4] + _BASES[_i % 4]] = _a

_COMP = str.maketrans("ACGTN", "TGCAN")
AMINO = "ACDEFGHIKLMNPQRSTVWY"
_AA_IDX = {a: i for i, a in enumerate(AMINO)}


# vectorized translation tables: base byte -> 0..3 (255 = ambiguous),
# codon code -> amino byte
_BASE_LUT = np.full(256, 255, np.uint8)
for _j, _b in enumerate("TCAG"):
    _BASE_LUT[ord(_b)] = _j
    _BASE_LUT[ord(_b.lower())] = _j
_BASE_LUT[ord("U")] = _BASE_LUT[ord("u")] = 0
_AA_LUT = np.frombuffer(_AA.encode(), np.uint8)
# codon code -> AMINO index (-1 = stop), for string-free translation
_CODON_IDX_LUT = np.array(
    [_AA_IDX.get(a, -1) for a in _AA], dtype=np.int16
)
# base-complement LUT on the 0..3 codes (TCAG order: T<->A, C<->G);
# ambiguous stays 255
_COMP_CODE = np.full(256, 255, np.uint8)
_COMP_CODE[:4] = [2, 3, 0, 1]


def translate(seq: str) -> str:
    """Frame-0 translation ('X' for codons with ambiguous bases).

    Vectorized: per-base LUT + codon-code gather (the per-codon dict
    formulation cost hours at wheat scale — 1M+ elements x 6 frames)."""
    n = (len(seq)) // 3
    if n == 0:
        return ""
    b = _BASE_LUT[np.frombuffer(seq.encode(), np.uint8)[: n * 3]].reshape(n, 3)
    code = b[:, 0].astype(np.int32) * 16 + b[:, 1] * 4 + b[:, 2]
    ok = (b < 4).all(axis=1)
    out = np.where(ok, _AA_LUT[np.where(ok, code, 0)], np.uint8(ord("X")))
    return out.tobytes().decode()


def six_frames(seq: str) -> list[tuple[str, int, str]]:
    """[(protein, frame 0..2, strand '+'/'-'), ...] for all 6 frames."""
    seq = seq.upper()
    rc = seq.translate(_COMP)[::-1]
    out = []
    for f in range(3):
        out.append((translate(seq[f:]), f, "+"))
        out.append((translate(rc[f:]), f, "-"))
    return out


def six_frame_jobs(seq: str):
    """String-free six-frame translation for the classifier hot loop.

    Returns [(idx int32 residue indices, pos_map, aa_ascii uint8, strand)]
    — the per-element prep cost rivalled the device Viterbi at wheat scale
    (~374 elements/s host-side), mostly in encode/decode round trips and
    the double LUT pass of translate()+aa re-indexing. One byte pass per
    frame: codon code -> AMINO index directly (_CODON_IDX_LUT); the ASCII
    peptide is materialized lazily per frame only for domain excision of
    HITS (rare next to jobs).
    """
    b = _BASE_LUT[np.frombuffer(seq.upper().encode(), np.uint8)]
    rb = _COMP_CODE[b][::-1]
    out = []
    for src, strand in ((b, "+"), (rb, "-")):
        for f in range(3):
            s = src[f:]
            n = s.size // 3
            if n == 0:
                out.append((np.zeros(0, np.int32), np.zeros(0, np.int64),
                            s[:0], strand))
                continue
            cod = s[: n * 3].reshape(n, 3)
            ok = (cod < 4).all(axis=1)
            code = (cod[:, 0].astype(np.int32) * 16 + cod[:, 1] * 4
                    + cod[:, 2])
            idx = np.where(ok, _CODON_IDX_LUT[np.where(ok, code, 0)],
                           np.int16(-1))
            pos_map = np.flatnonzero(idx >= 0)
            aa = np.where(ok, _AA_LUT[np.where(ok, code, 0)],
                          np.uint8(ord("X")))
            out.append((idx[pos_map].astype(np.int32), pos_map, aa, strand))
    return out


# ---------------------------------------------------------------------------
# HMMER3 profile parsing
# ---------------------------------------------------------------------------
@dataclass
class Profile:
    name: str
    length: int
    match_scores: np.ndarray  # (M+1, 20) log-odds (bits-ish, nat log here)
    tmm: np.ndarray  # (M+1,) log t(Mk -> Mk+1)
    tmi: np.ndarray
    tmd: np.ndarray
    tim: np.ndarray
    tii: np.ndarray
    tdm: np.ndarray
    tdd: np.ndarray
    insert_scores: np.ndarray | None = None


def _parse_logprob(tok: str) -> float:
    if tok == "*":
        return -np.inf
    return -float(tok)  # HMMER stores -ln(p)


def load_hmm_db(path: str) -> list[Profile]:
    """Parse a HMMER3 ASCII file (possibly multi-profile)."""
    profiles = []
    with open(path) as f:
        lines = iter(f)
        for line in lines:
            if not line.startswith("HMMER3"):
                continue
            name = None
            length = 0
            alpha = None
            for line in lines:
                if line.startswith("NAME"):
                    name = line.split()[1]
                elif line.startswith("LENG"):
                    length = int(line.split()[1])
                elif line.startswith("ALPH"):
                    alpha = line.split()[1]
                elif line.startswith("HMM "):
                    break
            header_syms = line.split()[1:]
            next(lines)  # transition header line
            m = length
            match_lp = np.full((m + 1, len(header_syms)), -np.inf)
            trans = np.full((m + 1, 7), -np.inf)
            bg = None
            row = 0
            for line in lines:
                t = line.split()
                if t[0] == "//":
                    break
                if t[0] == "COMPO":
                    bg = np.array([_parse_logprob(x) for x in t[1 : 1 + len(header_syms)]])
                    # next two lines: insert emissions + begin transitions of node 0
                    next(lines)
                    t0 = next(lines).split()
                    trans[0] = [_parse_logprob(x) for x in t0[:7]]
                    continue
                if t[0].isdigit():
                    k = int(t[0])
                    match_lp[k] = [_parse_logprob(x) for x in t[1 : 1 + len(header_syms)]]
                    next(lines)  # insert emissions
                    tk = next(lines).split()
                    trans[k] = [_parse_logprob(x) for x in tk[:7]]
                    row = k
            if bg is None:
                bg = np.log(np.full(len(header_syms), 1.0 / len(header_syms)))
            # log-odds vs background
            lo = match_lp - bg[None, :]
            # map header symbol order to our AMINO order
            order = [header_syms.index(a) for a in AMINO]
            profiles.append(
                Profile(
                    name=name,
                    length=length,
                    match_scores=lo[:, order],
                    tmm=trans[:, 0], tmi=trans[:, 1], tmd=trans[:, 2],
                    tim=trans[:, 3], tii=trans[:, 4],
                    tdm=trans[:, 5], tdd=trans[:, 6],
                )
            )
    return profiles


_NEG = -1e30
# floor for forbidden transitions entering telescoped (shift/unshift)
# recurrences; see ProfileStack.__init__ for why this must be moderate
_TRANS_FLOOR = -100.0


def viterbi_local(seq_idx: np.ndarray, prof: Profile) -> float:
    """Smith-Waterman-flavored local Viterbi score (nats), numpy reference.

    Free entry/exit into any match state (hmmsearch-style local mode,
    simplified). The delete-state column recurrence is closed-form:
    run_k = S[k] + cummax(vm[j-1] + tmd[j-1] - S[j]) with S = cumsum(tdd).
    """
    m = prof.length
    if seq_idx.size == 0 or m == 0:
        return 0.0
    ms = prof.match_scores  # (M+1, 20)
    tmd = np.maximum(prof.tmd, _TRANS_FLOOR)
    tdd = np.maximum(prof.tdd, _TRANS_FLOOR)
    s_cum = np.concatenate([[0.0], np.cumsum(tdd[1:m])])  # S[1..m]-ish
    vm = np.full(m + 1, _NEG)
    vi = np.full(m + 1, _NEG)
    vd = np.full(m + 1, _NEG)
    best = 0.0
    for x in seq_idx:
        emit = ms[1:, x]
        prev_m = vm.copy()
        prev_i = vi.copy()
        cand = np.maximum(
            np.maximum(prev_m[:-1] + prof.tmm[:-1], prev_i[:-1] + prof.tim[:-1]),
            vd[:-1] + prof.tdm[:-1],
        )
        cand = np.maximum(cand, 0.0)  # local start
        vm = np.concatenate([[_NEG], cand + emit])
        vi = np.maximum(prev_m + prof.tmi, prev_i + prof.tii)
        # vd[k] = S[k-1] + max_{j<=k-1}(vm[j] + tmd[j] - S[j-1]) for k>=1
        b = vm[:m] + tmd[:m] - np.concatenate([[0.0], s_cum[:-1]])
        vd = np.concatenate(
            [[_NEG], np.maximum.accumulate(b) + np.concatenate([[0.0], s_cum[:-1]])]
        )
        best = max(best, float(vm.max()))
    return best


def _viterbi_scan_batch():
    """Jitted scan-over-residues Viterbi, vmapped over stacked profiles."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=())
    def run(seq_idx, n_valid, ms, tmm, tmi, tim, tii, tdm, tmd_shift, s_shift):
        # ms: (P, M, 20) match log-odds for nodes 1..M (padded with _NEG)
        # tmd_shift/s_shift: precomputed vm->delete helpers, (P, M)
        p, m, _ = ms.shape

        def step(carry, xi):
            vm, vi, vd, best, bpos = carry
            x, valid, pos = xi
            emit = ms[:, :, x]  # (P, M)
            cand = jnp.maximum(
                jnp.maximum(vm[:, :-1] + tmm[:, :-1], vi[:, :-1] + tim[:, :-1]),
                vd[:, :-1] + tdm[:, :-1],
            )
            cand = jnp.maximum(cand, 0.0)
            new_vm = jnp.concatenate(
                [jnp.full((p, 1), _NEG), cand + emit], axis=1
            )
            new_vi = jnp.maximum(vm + tmi, vi + tii)
            b = new_vm[:, :m] + tmd_shift
            run_ = jax.lax.cummax(b, axis=1) + s_shift
            new_vd = jnp.concatenate([jnp.full((p, 1), _NEG), run_], axis=1)
            col_best = jnp.max(new_vm, axis=1)
            improved = col_best > best
            new_best = jnp.maximum(best, col_best)
            # residue index (filtered coordinates) where the best local
            # alignment ENDS — used to excise domain peptides for trees
            new_bpos = jnp.where(improved, pos, bpos)
            out = jax.tree.map(
                lambda new, old: jnp.where(valid, new, old),
                (new_vm, new_vi, new_vd, new_best, new_bpos),
                (vm, vi, vd, best, bpos),
            )
            return out, None

        init = (
            jnp.full((p, m + 1), _NEG),
            jnp.full((p, m + 1), _NEG),
            jnp.full((p, m + 1), _NEG),
            jnp.zeros(p),
            jnp.zeros(p, jnp.int32),
        )
        l = seq_idx.shape[0]
        valid = jnp.arange(l) < n_valid
        posv = jnp.arange(l, dtype=jnp.int32)
        # unroll: each scan step is a small (P, M) elementwise kernel, so
        # at L ~ 1500 the loop is step-overhead-bound on the TPU; unrolling
        # amortizes the per-iteration cost (measured in tools/bench_viterbi)
        (vm, vi, vd, best, bpos), _ = jax.lax.scan(
            step, init, (seq_idx, valid, posv), unroll=8
        )
        return best, bpos

    return run


def _ssv_scan_batch():
    """Ungapped local (SSV) scan: max over all diagonal runs of summed
    match log-odds — HMMER3's own acceleration pipeline runs exactly this
    shape of filter (MSV/SSV) before Viterbi; here it prunes (element,
    frame) jobs so the full Viterbi only scores survivors. ~4x less work
    per step than the Viterbi scan (no I/D states, no end tracking)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(seq_idx, n_valid, ms):
        p, m, _ = ms.shape

        def step(carry, xi):
            prev, best = carry
            x, valid = xi
            emit = ms[:, :, x]  # (P, M)
            ext = jnp.concatenate(
                [jnp.zeros((p, 1), prev.dtype), prev[:, :-1]], axis=1
            )
            cur = jnp.maximum(ext, 0.0) + emit
            nb = jnp.maximum(best, jnp.max(cur, axis=1))
            out = jax.tree.map(
                lambda n_, o: jnp.where(valid, n_, o), (cur, nb), (prev, best)
            )
            return out, None

        init = (jnp.full((p, m), _NEG, jnp.float32), jnp.zeros(p, jnp.float32))
        l = seq_idx.shape[0]
        valid = jnp.arange(l) < n_valid
        (_cur, best), _ = jax.lax.scan(step, init, (seq_idx, valid), unroll=8)
        return best

    return run


_viterbi_batch_fn = None
_viterbi_vmap_fn = None
_ssv_vmap_fn = None


def _ssv_scan_vmap():
    import jax

    base = _ssv_scan_batch()
    return jax.jit(jax.vmap(base, in_axes=(0, 0, None)))


def _viterbi_scan_vmap():
    """The residue-scan Viterbi vmapped over a SEQUENCE batch axis: one
    dispatch scores (B, L) sequences against all stacked profiles — the
    per-(element, frame) dispatch path costs one tunnel round trip per
    call, which dominates at wheat scale (1M+ elements)."""
    import jax

    base = _viterbi_scan_batch()
    return jax.jit(jax.vmap(
        base, in_axes=(0, 0, None, None, None, None, None, None, None, None)
    ))


class ProfileStack:
    """Profiles padded to a common length for batched device Viterbi."""

    def __init__(self, profiles: list[Profile]):
        self.profiles = profiles
        p = len(profiles)
        m = max(pr.length for pr in profiles)
        self.ms = np.full((p, m, 20), _NEG, dtype=np.float32)
        self.tmm = np.full((p, m + 1), _NEG, np.float32)
        self.tmi = np.full((p, m + 1), _NEG, np.float32)
        self.tim = np.full((p, m + 1), _NEG, np.float32)
        self.tii = np.full((p, m + 1), _NEG, np.float32)
        self.tdm = np.full((p, m + 1), _NEG, np.float32)
        self.tmd_shift = np.full((p, m), _NEG, np.float32)
        self.s_shift = np.zeros((p, m), np.float32)
        for i, pr in enumerate(profiles):
            mm = pr.length
            self.ms[i, :mm] = np.maximum(pr.match_scores[1:], _NEG)
            for name in ("tmm", "tmi", "tim", "tii", "tdm"):
                getattr(self, name)[i, : mm + 1] = np.maximum(
                    getattr(pr, name), _NEG
                )
            # Forbidden (-inf) delete transitions are clamped to a MODERATE
            # floor for the telescoped recurrence: with a -1e30 clamp the
            # cummax shift pair (tmd - s_prev, + s_prev) cancels values of
            # ~1e30 magnitude whose float32 rounding noise (~1e30 * 2^-24)
            # dwarfs real scores — and varies with XLA codegen, so the same
            # profile scored differently under different device configs.
            # -100 nats per step is unbeatable by any real path (match
            # states emit ~2-3 nats) yet keeps |s_cum| <= 100*M, where the
            # telescoping is exact to ~1e-3.
            tmd = np.maximum(pr.tmd, _TRANS_FLOOR)
            tdd = np.maximum(pr.tdd, _TRANS_FLOOR)
            s_cum = np.concatenate([[0.0], np.cumsum(tdd[1:mm])])
            s_prev = np.concatenate([[0.0], s_cum[:-1]])
            self.tmd_shift[i, :mm] = tmd[:mm] - s_prev
            self.s_shift[i, :mm] = s_prev

    def scores(self, seq_idx: np.ndarray, pad_to: int | None = None) -> np.ndarray:
        """Best local Viterbi score of each profile against one sequence."""
        return self.scores_pos(seq_idx, pad_to)[0]

    def scores_pos(
        self, seq_idx: np.ndarray, pad_to: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores, end positions) of each profile's best local alignment.

        End positions are indices into the FILTERED residue array passed in.
        """
        global _viterbi_batch_fn
        if _viterbi_batch_fn is None:
            _viterbi_batch_fn = _viterbi_scan_batch()
        n = seq_idx.size
        if n == 0:
            z = np.zeros(len(self.profiles))
            return z, np.zeros(len(self.profiles), np.int32)
        # pad length to buckets to bound recompilation
        l = pad_to or max(1 << (n - 1).bit_length(), 64)
        idx = np.zeros(l, dtype=np.int32)
        idx[:n] = seq_idx
        out, pos = _viterbi_batch_fn(
            idx, np.int32(n), self.ms, self.tmm, self.tmi, self.tim,
            self.tii, self.tdm, self.tmd_shift, self.s_shift,
        )
        return np.asarray(out), np.asarray(pos)

    def scores_pos_many(
        self, idx_batch: np.ndarray, n_valid: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched scores: (B, L) int32 padded residue batch + per-row
        valid counts -> ((B, P) scores, (B, P) end positions). One device
        dispatch for the whole batch (same kernel as scores_pos, vmapped).
        """
        out, pos = self.scores_pos_many_async(idx_batch, n_valid)
        return np.asarray(out), np.asarray(pos)

    def scores_pos_many_async(
        self, idx_batch: np.ndarray, n_valid: np.ndarray
    ):
        """scores_pos_many returning DEVICE arrays without blocking — the
        classifier queues every batch before collecting so device compute
        overlaps host-side packing (jax async dispatch)."""
        global _viterbi_vmap_fn
        if _viterbi_vmap_fn is None:
            _viterbi_vmap_fn = _viterbi_scan_vmap()
        return _viterbi_vmap_fn(
            idx_batch, n_valid.astype(np.int32), self.ms, self.tmm, self.tmi,
            self.tim, self.tii, self.tdm, self.tmd_shift, self.s_shift,
        )

    def ssv_scores_many_async(self, idx_batch: np.ndarray, n_valid: np.ndarray):
        """(B,) -> (B, P) ungapped SSV filter scores, device arrays."""
        global _ssv_vmap_fn
        if _ssv_vmap_fn is None:
            _ssv_vmap_fn = _ssv_scan_vmap()
        return _ssv_vmap_fn(idx_batch, n_valid.astype(np.int32), self.ms)


# ---------------------------------------------------------------------------
# classification
# ---------------------------------------------------------------------------
DOMAIN_ORDER = ["GAG", "PROT", "INT", "RT", "RH"]  # completeness check


@dataclass
class Classification:
    id: str
    order: str | None = None
    superfamily: str | None = None
    clade: str | None = None
    completed: str | None = "no"
    strand: str | None = "?"
    domains: str | None = None
    score: float = 0.0
    domain_seqs: dict | None = None  # domain -> best-hit peptide (for trees)


def parse_rexdb_name(name: str) -> tuple[str | None, str | None, str | None, str | None]:
    """REXdb profile name -> (order, superfamily, clade, domain).

    e.g. 'Class_I/LTR/Ty1_copia/Ale/RT' or 'Ty3_gypsy/chromovirus/CRM:INT'.
    """
    dom = None
    base = name
    if ":" in name:
        base, dom = name.rsplit(":", 1)
    parts = base.split("/")
    if dom is None and parts and parts[-1].upper() in {
        "GAG", "PROT", "AP", "INT", "RT", "RH", "RNASEH", "ENV", "CHDCR", "CHD"
    }:
        dom = parts.pop()
    order = None
    superfamily = None
    clade = parts[-1] if parts else None
    joined = "/".join(parts)
    if "LTR" in joined or re.search(r"Ty1|copia|Ty3|gypsy|Bel|Pao|Retrovirus", joined, re.I):
        order = "LTR"
    if re.search(r"Ty1|copia", joined, re.I):
        superfamily = "Copia"
    elif re.search(r"Ty3|gypsy", joined, re.I):
        superfamily = "Gypsy"
    elif re.search(r"Bel|Pao", joined, re.I):
        superfamily = "Bel-Pao"
    elif re.search(r"Retrovirus", joined, re.I):
        superfamily = "Retrovirus"
    if dom:
        dom = {"AP": "PROT", "RNASEH": "RH"}.get(dom.upper(), dom.upper())
    return order, superfamily, clade, dom


def calibrate_null_threshold(
    stack: "ProfileStack",
    lengths=(256, 1024, 4096),
    n_samples: int = 12,
    quantile_margin: float = 3.0,
    seed: int = 0,
):
    """Fit a length-dependent score threshold from a random-sequence null.

    Scores the stacked profiles against random i.i.d. peptides and fits
    max-over-profiles null scores to a + b*ln(L) (Gumbel location grows
    logarithmically with search length), returning
    ``fn(L) -> threshold`` = fitted null mean + ``quantile_margin`` null
    standard deviations. Replaces a fixed magic constant with the same
    role E-values play for hmmsearch in the reference's TEsorter
    (app.py:719-930).
    """
    rng = np.random.default_rng([seed, 0xE7A1])  # see calibrate_evalue_model
    xs, mus, sds = [], [], []
    for L in lengths:
        best = []
        for _ in range(n_samples):
            idx = rng.integers(0, 20, size=L).astype(np.int32)
            s, _pos = stack.scores_pos(idx, pad_to=L)
            best.append(float(np.max(s)))
        xs.append(math.log(L))
        mus.append(float(np.mean(best)))
        sds.append(float(np.std(best) + 1e-9))
    b, a = np.polyfit(xs, mus, 1)
    sd = float(np.mean(sds))

    def fn(L: int) -> float:
        return a + b * math.log(max(L, 2)) + quantile_margin * sd

    return fn


def calibrate_evalue_model(
    stack: "ProfileStack",
    L0: int = 1024,
    n_samples: int = 24,
    seed: int = 0,
    kind: str = "viterbi",
) -> "EvalueModel":
    """Per-profile Karlin-Altschul/Gumbel E-value calibration.

    The reference filters hmmsearch domtbl hits on E-value
    (reference api/TEsorter/app.py:93-95, 944-958: ``-eval`` default 1e-3).
    hmmsearch gets its Gumbel parameters from each profile's STATS lines;
    with no hmmer binary here, the same parameters are FIT from the
    package's own Viterbi scores on random i.i.d. peptides: local-alignment
    max scores follow a Gumbel law whose location grows ~ ln(L)/lambda
    (Karlin-Altschul), so sampling at one length L0 and the method of
    moments (lambda = pi/(sd*sqrt(6)), mu = mean - gamma/lambda) gives

        E(s, L) = (L / L0) * exp(-lambda * (s - mu0))

    = the expected number of chance hits scoring >= s in a length-L
    random search, per (profile, frame).
    """
    # seed SEQUENCE: plain default_rng(seed) reproduces the same stream a
    # caller-side default_rng(seed) used to synthesize test profiles, and
    # the "null" samples then contain the planted peptides verbatim
    rng = np.random.default_rng([seed, 0xE7A1])
    idxs = rng.integers(0, 20, size=(n_samples, L0)).astype(np.int32)
    if kind == "ssv":
        samples = np.asarray(stack.ssv_scores_many_async(
            idxs.astype(np.int8), np.full(n_samples, L0, np.int32)))
    else:
        samples = np.stack(
            [stack.scores_pos(row, pad_to=L0)[0] for row in idxs])
    mean = samples.mean(axis=0)
    sd = samples.std(axis=0) + 1e-9
    lam = (math.pi / math.sqrt(6.0)) / sd
    mu0 = mean - 0.5772156649 / lam
    return EvalueModel(lam=lam, mu0=mu0, L0=L0)


@dataclass
class EvalueModel:
    lam: np.ndarray   # (P,) per-profile Gumbel scale
    mu0: np.ndarray   # (P,) per-profile Gumbel location at length L0
    L0: int

    def evalue(self, scores: np.ndarray, L: int) -> np.ndarray:
        """(P,) Viterbi scores on a length-L frame -> (P,) E-values."""
        e = (max(L, 1) / self.L0) * np.exp(-self.lam * (scores - self.mu0))
        return np.minimum(e, 1e30)

    def score_floor(self, max_evalue: float, L: int) -> np.ndarray:
        """(P,) minimum score such that E(s, L) <= max_evalue."""
        return self.mu0 + (
            math.log(max(L, 1) / self.L0) - math.log(max_evalue)
        ) / self.lam

    def score_floor_batch(self, max_evalue: float, L_v: np.ndarray) -> np.ndarray:
        """(B, P) score floors for a batch of frame lengths (one broadcast
        instead of B per-job calls — the per-job loop was measurable at
        wheat scale: ~7M SSV-gated jobs)."""
        L_v = np.maximum(np.asarray(L_v, np.float64), 1.0)
        return self.mu0[None, :] + (
            np.log(L_v / self.L0)[:, None] - math.log(max_evalue)
        ) / self.lam[None, :]


# SSV prefilter P-value gate: HMMER3's MSV filter passes P <= 0.02; jobs
# with no profile reaching this ungapped significance skip the Viterbi.
_SSV_P = 0.02
# deterministic pass-1 work counters (reset per classify_elements call)
PASS1_STATS = {"jobs": 0, "viterbi_jobs": 0}


def _load_ckpt_stream(path: str | None) -> dict:
    """Load a pickle-stream checkpoint (one dict per record, appended).

    Tolerates a truncated final record (process killed mid-write): reads
    dicts until the first decode failure and returns what it has.
    """
    out: dict = {}
    if not path or not os.path.exists(path):
        return out
    import pickle

    with open(path, "rb") as f:
        while True:
            try:
                out.update(pickle.load(f))
            except EOFError:
                break
            except Exception:
                break  # truncated tail from a killed writer
    return out


def _append_ckpt(path: str | None, record: dict) -> None:
    if not path or not record:
        return
    import pickle

    with open(path, "ab") as f:
        pickle.dump(record, f, protocol=pickle.HIGHEST_PROTOCOL)


def classify_elements(
    elements: list[tuple[str, str]],
    db_path: str,
    min_score: float | None = None,
    max_evalue: float | None = 1e-3,
    prefilter: bool = True,
    checkpoint: str | None = None,
) -> dict[str, Classification]:
    """elements: (id, inner_dna_seq). Returns id -> Classification.

    Hit gating reproduces the reference's TEsorter semantics
    (api/TEsorter/app.py:944-958): a domain hit is kept when its E-value
    <= ``max_evalue`` (default 1e-3, the reference default). E-values come
    from a per-profile Gumbel null fit (calibrate_evalue_model). An
    absolute 15-nat floor guards against degenerate profiles whose null
    variance is tiny.

    ``min_score``: explicit local-Viterbi score floor in nats; when given
    it REPLACES the E-value gate (both reference and tests use this to
    pin decisions). ``max_evalue=None`` with ``min_score=None`` falls back
    to the round-2 calibrated mean+3sd threshold (calibrate_null_threshold).

    ``checkpoint``: pickle-stream path; one record per scored chunk is
    appended so a killed run (the axon relay's futex-hang mode) resumes at
    chunk granularity instead of restarting the whole pass (wheat scale:
    ~1.2M elements).
    """
    done = _load_ckpt_stream(checkpoint)
    if done:
        from subphaser_tpu.utils.log import logger as _lg

        elements = [e for e in elements if e[0] not in done]
        _lg.info(
            "Pass-1 checkpoint: resumed %d scored elements, %d remain",
            len(done), len(elements),
        )
    profiles = load_hmm_db(db_path)
    stack = ProfileStack(profiles)
    meta = [parse_rexdb_name(p.name) for p in profiles]
    PASS1_STATS["jobs"] = PASS1_STATS["viterbi_jobs"] = 0
    thresh_fn = None
    ev_model = None
    ssv_model = None
    if min_score is None:
        from subphaser_tpu.utils.log import logger

        if max_evalue is not None:
            ev_model = calibrate_evalue_model(stack)
            if prefilter:
                ssv_model = calibrate_evalue_model(stack, kind="ssv")
            f1k = ev_model.score_floor(max_evalue, 1000)
            logger.info(
                "Classifier E-value calibration: E<=%g floors %.1f-%.1f "
                "nats @1kaa across %d profiles",
                max_evalue, float(f1k.min()), float(f1k.max()), len(profiles),
            )
        else:
            thresh_fn = calibrate_null_threshold(stack)
            logger.info(
                "Classifier null calibration: threshold %.1f nats @1kaa, "
                "%.1f @4kaa", thresh_fn(1000), thresh_fn(4000),
            )
    out: dict[str, Classification] = dict(done)
    # chunk elements (bounds host memory for the translated frames), then
    # score all (element, frame) jobs of a chunk in fixed-size device
    # batches bucketed by padded length — one dispatch per batch instead
    # of one per frame (tunnel round trips dominate at wheat scale)
    CHUNK = 2048
    BATCH = 1024
    import time as _time

    from subphaser_tpu.utils.log import logger as _logger

    t_start = _time.time()
    n_total = len(elements)
    for clo in range(0, len(elements), CHUNK):
        chunk = elements[clo : clo + CHUNK]
        if clo and (clo // CHUNK) % 8 == 0:
            rate = clo / (_time.time() - t_start)
            _logger.info(
                "Classified %d/%d elements (%.0f/s, ETA %.0f min)",
                clo, n_total, rate, (n_total - clo) / max(rate, 1e-9) / 60,
            )
        jobs = []  # (local ei, strand, aa_ascii, pos_map, idx)
        for ei, (eid, seq) in enumerate(chunk):
            for idx, pos_map, aa, strand in six_frame_jobs(seq):
                jobs.append((ei, strand, aa, pos_map, idx))

        def bucketize(job_ids):
            buckets: dict[int, list[int]] = {}
            for j in job_ids:
                l = max(1 << max(jobs[j][4].size - 1, 1).bit_length(), 64)
                buckets.setdefault(l, []).append(j)
            return buckets

        def pack(sel, l):
            # int8 residues (values 0..19): 4x smaller uploads — the
            # 8 MB/batch int32 upload rivaled the batch's device time
            # through the remote tunnel
            arr = np.zeros((BATCH, l), np.int8)
            nv = np.zeros(BATCH, np.int32)
            for r, j in enumerate(sel):
                v = jobs[j][4]
                arr[r, : v.size] = v
                nv[r] = v.size
            return arr, nv

        live = list(range(len(jobs)))
        if ssv_model is not None:
            # SSV prefilter (HMMER3's own MSV/SSV acceleration shape): an
            # ungapped diagonal scan ~4x cheaper than Viterbi prunes jobs
            # whose best SSV hit is not even P <= SSV_P significant for any
            # profile; the full Viterbi scores only the survivors, and the
            # final decision gate (E <= max_evalue) is unchanged for them.
            ssv_pending = []
            for l, idxs in sorted(bucketize(live).items()):
                for blo in range(0, len(idxs), BATCH):
                    sel = idxs[blo : blo + BATCH]
                    arr, nv = pack(sel, l)
                    ssv_pending.append(
                        (sel, stack.ssv_scores_many_async(arr, nv)))
            live = []
            for sel, sv in ssv_pending:
                sv = np.asarray(sv)[: len(sel)]
                L_v = np.maximum([jobs[j][4].size for j in sel], 2)
                flo = ssv_model.score_floor_batch(_SSV_P, L_v)
                keep = (sv >= flo).any(axis=1)
                live.extend(j for r, j in enumerate(sel) if keep[r])
            PASS1_STATS["jobs"] += len(jobs)
            PASS1_STATS["viterbi_jobs"] += len(live)

        j_scores: list = [None] * len(jobs)
        j_ends: list = [None] * len(jobs)
        # two-phase dispatch/collect: jax dispatch is async, so queuing
        # every batch before the first np.asarray lets the device work
        # overlap the host-side packing of later batches
        pending = []
        for l, idxs in sorted(bucketize(live).items()):
            for blo in range(0, len(idxs), BATCH):
                sel = idxs[blo : blo + BATCH]
                arr, nv = pack(sel, l)
                s, e = stack.scores_pos_many_async(arr, nv)
                pending.append((sel, s, e))
        for sel, s, e in pending:
            s, e = np.asarray(s), np.asarray(e)
            for r, j in enumerate(sel):
                j_scores[j] = s[r]
                j_ends[j] = e[r]
        per_el_hits: list[list] = [[] for _ in chunk]
        for j, (ei, strand, prot, pos_map, idx) in enumerate(jobs):
            scores, ends = j_scores[j], j_ends[j]
            if scores is None:
                continue  # pruned by the SSV prefilter
            if min_score is not None:
                floor = min_score
            elif ev_model is not None:
                floor = np.maximum(
                    15.0, ev_model.score_floor(max_evalue, max(idx.size, 2))
                )
            else:
                floor = max(15.0, thresh_fn(max(idx.size, 2)))
            for pi in np.flatnonzero(scores >= floor):
                o, sf, cl, dom = meta[pi]
                pep = None
                if dom and idx.size:
                    # excise the domain peptide around the best local
                    # alignment END (reference concatenate_domains.py:10-143
                    # uses hmmscan envelopes; ~1.2x the profile length back
                    # from the end covers the aligned region)
                    e = min(int(ends[pi]), idx.size - 1)
                    lo = max(0, e - int(1.2 * profiles[pi].length))
                    pep = prot[
                        int(pos_map[lo]) : int(pos_map[e]) + 1
                    ].tobytes().decode()
                per_el_hits[ei].append(
                    (float(scores[pi]), strand, o, sf, cl, dom, pep)
                )
        for ei, (eid, _seq) in enumerate(chunk):
            _decide(out, eid, per_el_hits[ei])
        _append_ckpt(checkpoint, {eid: out[eid] for eid, _s in chunk})
    return out


def _decide(out: dict, eid: str, hits: list) -> None:
    """Per-element decision from its scored frame hits (unchanged logic)."""
    if not hits:
        out[eid] = Classification(id=eid)
        return
    hits.sort(reverse=True, key=lambda h: h[0])
    best = hits[0]
    doms = {h[5] for h in hits if h[5]}
    # clade majority vote among hits agreeing with the best superfamily
    clades = [h[4] for h in hits if h[3] == best[3] and h[4]]
    clade = max(set(clades), key=clades.count) if clades else best[4]
    completed = "yes" if all(d in doms for d in DOMAIN_ORDER) else "no"
    # best peptide per domain among hits of the winning superfamily
    domain_seqs: dict = {}
    for h in hits:
        if h[3] == best[3] and h[5] and h[6] and h[5] not in domain_seqs:
            domain_seqs[h[5]] = h[6]
    out[eid] = Classification(
        id=eid, order=best[2], superfamily=best[3], clade=clade,
        completed=completed, strand=best[1],
        domains=" ".join(sorted(doms)), score=best[0],
        domain_seqs=domain_seqs or None,
    )


def _window_coverage(
    seq: str,
    cand_hashes: np.ndarray,
    sketch_k: int,
    target_window: int = 150,
    max_windows: int = 16,
    min_shared: int = 2,
    hash_pos: tuple[np.ndarray, np.ndarray] | None = None,
) -> float:
    """qcovs-equivalent for sketch-based pass-2 (reference app.py:417-432
    gates the best blast hit on qcovs >= 80).

    Splits the query into up to ``max_windows`` windows of >= ``target_window``
    bases and calls a window covered when it shares >= ``min_shared`` k-mer
    hashes with the candidate's FULL hash set. At 80% identity a 150 bp
    covered window expects ~7 surviving 13-mers (137 * 0.8^13), so genuinely
    aligned windows pass while windows outside the matched region share
    nothing beyond negligible-chance hash collisions.
    """
    from subphaser_tpu.ltr.tree import _sketch_pos

    L = len(seq)
    if L < sketch_k or cand_hashes.size == 0:
        return 0.0
    n_windows = min(max_windows, max(1, L // target_window))
    w = -(-L // n_windows)  # ceil: windows cover the whole query
    # ONE hash pass over the query (the per-window _sketch calls were the
    # pass-2 hot spot: 16 canonical-code scans per query), then one
    # searchsorted into the candidate's sorted full hash set; per-window
    # DISTINCT shared hashes via unique (window, hash) pairs.
    h, pos = hash_pos if hash_pos is not None else _sketch_pos(seq, k=sketch_k)
    if h.size == 0:
        return 0.0
    win = (pos // w).astype(np.uint64)
    i = np.searchsorted(cand_hashes, h)
    i = np.minimum(i, cand_hashes.size - 1)
    m = cand_hashes[i] == h
    total = int(np.unique(win).size)
    if not m.any() or total == 0:
        return 0.0
    wm, hm = win[m], h[m]
    o = np.lexsort((hm, wm))
    wm, hm = wm[o], hm[o]
    new = np.ones(wm.size, bool)
    new[1:] = (wm[1:] != wm[:-1]) | (hm[1:] != hm[:-1])
    _wins, counts = np.unique(wm[new], return_counts=True)
    covered = int((counts >= min_shared).sum())
    return covered / total


def _batched_bottom_s_shared(
    sk: np.ndarray, csks: list[np.ndarray], sketch_s: int
) -> tuple[np.ndarray, np.ndarray]:
    """For each candidate sketch b_i: the Mash bottom-s shared count

        shared_i = |{h in bottom_s(sk ∪ b_i) : h in sk[:s_i] and b_i[:s_i]}|

    with s_i = min(|sk|, |b_i|, sketch_s) — exactly the per-pair
    unique+searchsorted formulation (see test_classify math-parity test),
    computed for ALL candidates at once: pad candidates into a (C, W)
    matrix, ONE searchsorted of all C*W entries into the query sketch,
    then row-wise elementwise math. The per-candidate searchsorted+cumsum
    loop was the pass-2 hot spot (64 tiny GIL-bound numpy calls per
    query); a (C, na+W) batched argsort was tried and measured 1.2x
    SLOWER than the loop — the sort-free searchsorted-from-the-candidate-
    side form below is the one that wins. Returns (shared (C,), s (C,)).

    For a shared hash x at candidate rank m and query rank j, its union
    rank is j + m - (#shared pairs with value < x in this row): each
    earlier shared hash collapsed two merged entries into one.
    """
    C = len(csks)
    na = sk.size
    s_v = np.minimum(
        np.minimum(na, np.array([b.size for b in csks], np.int64)), sketch_s
    )
    if C == 0 or na == 0:
        return np.zeros(C, np.int64), s_v
    W = max(b.size for b in csks)
    if W == 0:
        return np.zeros(C, np.int64), s_v
    MAXU = np.uint64(0xFFFFFFFFFFFFFFFF)
    mat = np.full((C, W), MAXU, np.uint64)
    for i, b in enumerate(csks):
        mat[i, : b.size] = b
    jpos = np.searchsorted(sk, mat.ravel()).reshape(C, W)
    eq = (jpos < na) & (sk[np.minimum(jpos, na - 1)] == mat)
    eq &= mat != MAXU  # pad value: not a real candidate hash
    dups_before = np.cumsum(eq, axis=1) - eq  # exclusive, per row
    m = np.arange(W, dtype=np.int64)[None, :]
    urank = jpos + m - dups_before
    s_col = s_v[:, None]
    shared = (
        eq & (jpos < s_col) & (m < s_col) & (urank < s_col)
    ).sum(axis=1)
    return shared.astype(np.int64), s_v


# Deterministic pass-2 work counters (reset on every classify_pass2 call):
# tests assert on pair_evals instead of wall clock to detect quadratic
# regressions without load-dependent flakes.
PASS2_STATS = {"pair_evals": 0}

# Fork-pool plumbing: the closure over pass-2's frozen index cannot be
# pickled, so it is published module-globally RIGHT BEFORE the fork and the
# children inherit it through copy-on-write; the worker shim is what gets
# pickled (by name).
_P2_SCREEN = None


def _p2_screen_worker(item):
    return _P2_SCREEN(item)


def classify_pass2(
    elements: list[tuple[str, str]],
    d_class: dict[str, Classification],
    min_identity: float = 0.80,
    min_coverage: float = 0.80,
    min_length: int = 80,
    sketch_k: int = 13,
    sketch_s: int = 512,
    shard: tuple[int, int] | None = None,
    checkpoint: str | None = None,
) -> dict[str, Classification]:
    """Pass-2: transfer classifications to unclassified elements by sequence
    similarity against the classified ones.

    Replaces the reference's blast of unclassified-vs-classified elements
    (reference api/TEsorter/app.py:417-432: best hit with pident>=80,
    qcovs>=80, length>=80) with MinHash sketches: candidate pairs share at
    least one of each element's 8 smallest hashes (LSH prefilter), then the
    bottom-s Mash identity estimate gates the transfer at ``min_identity``
    and a windowed-containment coverage estimate gates it at
    ``min_coverage`` (the qcovs >= 80 equivalent — without it a short
    high-identity fragment could transfer a label the reference's blast
    filter would reject). Returns the updated ``d_class`` (order/
    superfamily/clade copied from the best hit; completeness/domains are
    NOT transferred — only pass-1 proves domains).
    """
    from subphaser_tpu.ltr.tree import _sketch, _sketch_pos

    PASS2_STATS["pair_evals"] = 0
    classified = [
        (eid, seq) for eid, seq in elements
        if d_class.get(eid) is not None and d_class[eid].order is not None
    ]
    unclassified = [
        (eid, seq) for eid, seq in elements
        if len(seq) >= min_length
        and (d_class.get(eid) is None or d_class[eid].order is None)
    ]
    if shard is not None:
        # multi-process: this rank screens only its slice of the
        # unclassified set (the classified reference set is replicated);
        # the caller exchanges the transferred entries
        rank, nproc = shard
        unclassified = unclassified[rank::nproc]
    prev = _load_ckpt_stream(checkpoint)  # eid -> best_id|None (screened)
    if prev:
        unclassified = [e for e in unclassified if e[0] not in prev]
        from subphaser_tpu.utils.log import logger as _lg

        _lg.info(
            "Pass-2 checkpoint: resumed %d screened queries, %d remain",
            len(prev), len(unclassified),
        )
        for _eid, _best in prev.items():
            if _best is not None and _best in d_class:
                _src = d_class[_best]
                d_class[_eid] = Classification(
                    id=_eid, order=_src.order, superfamily=_src.superfamily,
                    clade=_src.clade, completed="no", strand="?",
                    domains=None, score=0.0,
                )
    if not classified or not unclassified:
        return d_class

    c_sk = {eid: _sketch(seq, k=sketch_k, s=sketch_s) for eid, seq in classified}
    c_seq = dict(classified)
    c_full: dict[str, np.ndarray] = {}  # full hash sets, built lazily
    # LSH index on the 16 smallest hashes of each classified element.
    # 16 (not 8) so the shared-minima ranking below has enough resolution
    # to break ties before the max_cand cap; candidates tied on all 16
    # minima are near-identical sequences whose labels are interchangeable,
    # and remaining ties resolve lexicographically by id (deterministic).
    # The index is a SORTED (hash, classified-index) table — the dict-of-
    # lists bucket walk cost ~450k dict ops per query on repeat-family
    # genomes (every family member shares every minimum).
    n_minima = 16
    c_ids = [eid for eid, _ in classified]
    id_rank = np.empty(len(c_ids), np.int64)
    id_rank[np.argsort(np.array(c_ids))] = np.arange(len(c_ids))
    mh_parts, mc_parts = [], []
    for i, eid in enumerate(c_ids):
        mm = c_sk[eid][:n_minima]
        mh_parts.append(mm)
        mc_parts.append(np.full(mm.size, i, np.int32))
    all_mh = np.concatenate(mh_parts) if mh_parts else np.zeros(0, np.uint64)
    all_mc = np.concatenate(mc_parts) if mc_parts else np.zeros(0, np.int32)
    o = np.argsort(all_mh, kind="stable")
    all_mh, all_mc = all_mh[o], all_mc[o]

    from subphaser_tpu.utils.log import logger

    logger.info(
        "Pass-2: %d unclassified vs %d classified elements",
        len(unclassified), len(classified),
    )
    n_transfer = 0
    max_cand = 64

    def _screen(item):
        """One query against the classified index -> (eid, best_id|None,
        n_pair_evals). Reads only structures frozen before the loop plus
        the c_full cache; transfers apply afterwards in input order."""
        eid, seq = item
        # ONE canonical-hash pass serves both the sketch and the coverage
        # gate (the gate used to re-hash the query — ~2 scans per query)
        h_all, pos_all = _sketch_pos(seq, k=sketch_k)
        sk = np.unique(h_all)[:sketch_s]
        if sk.size == 0:
            return eid, None, 0
        # Rank candidates by how many of the query's 16 smallest hashes
        # they share and evaluate only the top ``max_cand``: repeat-family
        # genomes put thousands of elements in each LSH bucket, so
        # evaluating every bucket member made pass-2 quadratic (tens of
        # minutes at 22k elements). The best Mash hit shares the most
        # minima with overwhelming probability; the reference's blast
        # pass is likewise top-hit-capped (app.py:417-432 keeps max_target
        # hits only). Ranking is fully vectorized: range lookups into the
        # sorted minima table + one bincount.
        q16 = sk[:n_minima]
        lo = np.searchsorted(all_mh, q16, "left")
        hi = np.searchsorted(all_mh, q16, "right")
        hit_cids = np.concatenate(
            [all_mc[l:h] for l, h in zip(lo, hi)]
        ) if q16.size else np.zeros(0, np.int32)
        if hit_cids.size:
            # count shared minima per candidate by sorting the BUCKET
            # (np.unique), not by bincount over every classified element:
            # bincount(minlength=n_classified) allocated + scanned an
            # 832k-entry array per query at wheat scale (~1/3 of the 33 ms
            # per-query wall); the unique form is O(bucket log bucket) and
            # produces the identical (nz, cnt) ranking inputs
            nz, cnt = np.unique(hit_cids, return_counts=True)
            order = np.lexsort((id_rank[nz], -cnt))[:max_cand]
            cand = [c_ids[i] for i in nz[order]]
        else:
            cand = []
        best_id, best_ident = None, 0.0
        if cand:
            # bottom-s Jaccard on the union's s smallest hashes (Mash):
            # |union_bottom_s ∩ bottom_s(a) ∩ bottom_s(b)| / s, for ALL
            # candidates in one origin-tagged batched sort — the
            # per-candidate unique+searchsorted loop dominated pass-2 at
            # wheat scale (~31 ms/query).
            shared_v, s_v = _batched_bottom_s_shared(
                sk, [c_sk[cid] for cid in cand], sketch_s
            )
            j_v = shared_v / np.maximum(s_v, 1)
            with np.errstate(divide="ignore"):
                ident_v = np.where(
                    j_v > 0,
                    1.0 + np.log(2.0 * j_v / (1.0 + j_v)) / sketch_k,
                    -np.inf,
                )
            bi = int(np.argmax(ident_v))
            if np.isfinite(ident_v[bi]):
                best_ident, best_id = float(ident_v[bi]), cand[bi]
        if best_id is not None and best_ident >= min_identity:
            # qcovs gate (reference app.py:417-432): >= min_coverage of the
            # query's windows must share k-mers with the best hit
            if min_coverage > 0:
                if best_id not in c_full:
                    c_full[best_id] = _sketch(c_seq[best_id], k=sketch_k,
                                              s=1 << 30)
                if _window_coverage(seq, c_full[best_id], sketch_k,
                                    hash_pos=(h_all, pos_all)) < min_coverage:
                    return eid, None, len(cand)
            return eid, best_id, len(cand)
        return eid, None, len(cand)

    # Parallelism: a 4-THREAD pool measured 5.4x SLOWER than the serial
    # loop (31 vs 167 q/s, tools/bench_pass2.py) — per-query numpy ops are
    # too small to release the GIL. Fork PROCESSES sidestep the GIL: the
    # frozen index (c_sk, minima table, id_rank) is inherited copy-on-write
    # and children run pure numpy (never jax), so screening scales with
    # cores (the 14 Gb wheat run measured 30 q/s serial = 3.1 h of pass-2;
    # 4 workers cut it ~4x). imap preserves input order, so checkpoints and
    # transfers are byte-identical to the serial loop. Each child builds
    # its own lazy c_full cache (duplicated work, bounded). Opt out with
    # SUBPHASER_PASS2_PROCS=1 (and the jax.distributed shard= path already
    # divides queries across machines).
    results = []
    ckpt_mark = 0

    def _drain(iterator):
        nonlocal ckpt_mark
        for r in iterator:
            results.append(r)
            if len(results) % 4096 == 0:
                logger.info("Pass-2: %d/%d screened, %d transferred",
                            len(results), len(unclassified),
                            sum(1 for _e, b, _n in results
                                if b is not None))
                _append_ckpt(checkpoint, {
                    e: b for e, b, _n in results[ckpt_mark:]})
                ckpt_mark = len(results)

    n_procs = int(os.environ.get("SUBPHASER_PASS2_PROCS", "0") or 0) \
        or (os.cpu_count() or 1)
    par_min = int(os.environ.get("SUBPHASER_PASS2_PAR_MIN", "4096"))
    n_procs = max(1, min(n_procs, 16))
    if (n_procs > 1 and len(unclassified) >= par_min
            and hasattr(os, "fork")):
        global _P2_SCREEN
        _P2_SCREEN = _screen
        from multiprocessing import get_context

        try:
            with get_context("fork").Pool(n_procs) as pool:
                _drain(pool.imap(_p2_screen_worker, unclassified,
                                 chunksize=256))
        finally:
            _P2_SCREEN = None
    else:
        _drain(_screen(item) for item in unclassified)
    _append_ckpt(checkpoint, {e: b for e, b, _n in results[ckpt_mark:]})
    for eid, best_id, evals in results:
        PASS2_STATS["pair_evals"] += evals
        if best_id is None:
            continue
        src = d_class[best_id]
        d_class[eid] = Classification(
            id=eid, order=src.order, superfamily=src.superfamily,
            clade=src.clade, completed="no", strand="?",
            domains=None, score=0.0,
        )
        n_transfer += 1
    if n_transfer:
        from subphaser_tpu.utils.log import logger

        logger.info(
            "Pass-2: transferred classifications to %d of %d unclassified "
            "elements by sketch similarity (>= %.0f%% identity)",
            n_transfer, len(unclassified), 100 * min_identity,
        )
    return d_class


def write_cls_tsv(d_class: dict[str, Classification], fout) -> None:
    """TEsorter-compatible .cls.tsv (reference app.py writes the same columns)."""
    fout.write("#TE\tOrder\tSuperfamily\tClade\tComplete\tStrand\tDomains\n")
    for eid, c in d_class.items():
        fout.write(
            "\t".join(
                str(v) if v is not None else "none"
                for v in [eid, c.order, c.superfamily, c.clade, c.completed,
                          c.strand, c.domains]
            )
            + "\n"
        )
