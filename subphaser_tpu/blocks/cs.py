"""PAF cs-string emission for native alignment blocks.

The reference consumes minimap2's ``cs:Z:`` short tag to call variants
inside homoeologous blocks (reference Paf.py:155-293, CsBlocks/CsBlock);
the native anchor-chain aligner emits the same tag: anchor runs become
``:n`` matches and the inter-anchor gaps are aligned base-level with the
native banded DP (ltr/_native sp_banded_align_ops), yielding exact
``:``/``*``/``+``/``-`` runs.

Minus-strand blocks are built in mirrored-target space (query forward vs
reverse-complemented target, the same space the chainer uses) and then
transformed to the target-forward orientation minimap2 writes: run order
reversed, per-run sequences reversed and complemented.
"""

from __future__ import annotations

import numpy as np

from subphaser_tpu.ltr import native

_DECODE = np.frombuffer(b"acgtn", dtype=np.uint8)
_COMP = {"a": "t", "c": "g", "g": "c", "t": "a", "n": "n"}

MAX_GAP_DP = 1 << 16    # beyond this, emit raw -/+ runs instead of a DP
MAX_GAP_DIFF = 1 << 12  # beyond this length ASYMMETRY, same (band blowup)


def _seq(codes: np.ndarray, lo: int, hi: int) -> str:
    return _DECODE[np.minimum(codes[lo:hi], 4)].tobytes().decode()


def _emit_diag(ops: list, q: np.ndarray, t: np.ndarray, qpos: int, tpos: int,
               n: int) -> None:
    """Split a diagonal run into ':' matches and '*' substitutions."""
    qs = q[qpos : qpos + n]
    ts = t[tpos : tpos + n]
    eq = (qs == ts) & (qs < 4)
    i = 0
    while i < n:
        j = i
        if eq[i]:
            while j < n and eq[j]:
                j += 1
            _push(ops, (":", j - i))
        else:
            while j < n and not eq[j]:
                j += 1
            for p in range(i, j):
                ops.append(("*", _seq(t, tpos + p, tpos + p + 1)
                            + _seq(q, qpos + p, qpos + p + 1)))
        i = j


def _push(ops: list, op) -> None:
    if op[0] == ":" and ops and ops[-1][0] == ":":
        ops[-1] = (":", ops[-1][1] + op[1])
    else:
        ops.append(op)


def _gap(ops: list, q: np.ndarray, t: np.ndarray, q0: int, q1: int,
         t0: int, t1: int) -> None:
    qlen, tlen = q1 - q0, t1 - t0
    if qlen == 0 and tlen == 0:
        return
    # very asymmetric gaps would need a multi-GB traceback (band >=
    # |qlen - tlen|) — emit raw runs, mirroring the native builder
    if max(qlen, tlen) > MAX_GAP_DP or abs(qlen - tlen) > MAX_GAP_DIFF:
        if tlen:
            ops.append(("-", _seq(t, t0, t1)))
        if qlen:
            ops.append(("+", _seq(q, q0, q1)))
        return
    runs = native.align_ops(
        q[q0:q1], t[t0:t1], band=abs(qlen - tlen) + 32
    )
    qp, tp = q0, t0
    for op, ln in runs:
        ln = int(ln)
        if op == 0:
            _emit_diag(ops, q, t, qp, tp, ln)
            qp += ln
            tp += ln
        elif op == 1:
            ops.append(("+", _seq(q, qp, qp + ln)))
            qp += ln
        else:
            ops.append(("-", _seq(t, tp, tp + ln)))
            tp += ln


def build_cs(
    q: np.ndarray,
    t: np.ndarray,
    aq: np.ndarray,
    at: np.ndarray,
    qstart: int,
    qend: int,
    tstart: int,
    tend: int,
    k: int,
) -> list:
    """cs ops for one block. ``q``/``t`` are uint8 code arrays in the
    alignment's own orientation; anchors (aq, at) are k-mer start pairs
    colinear in that orientation."""
    order = np.argsort(aq, kind="stable")
    aq, at = aq[order], at[order]
    ops: list = []
    cq, ct = qstart, tstart
    for x, y in zip(aq.tolist(), at.tolist()):
        if x < cq or y < ct:
            continue  # overlaps the previous anchor; already covered
        # clamp the anchor match at the block bounds: a terminal anchor may
        # end past ONE boundary, and the other coordinate's residual run
        # must still be emitted (else the cs spans less than the PAF
        # qstart..qend/tstart..tend and cs-walking parsers misplace ends)
        m = min(k, qend - x, tend - y)
        if m <= 0:
            break
        _gap(ops, q, t, cq, x, ct, y)
        _push(ops, (":", m))
        cq, ct = x + m, y + m
        if m < k:
            break
    # residual tail (cq <= qend and ct <= tend hold by the clamp above);
    # one-sided tails come out as raw +/- runs from _gap
    _gap(ops, q, t, cq, qend, ct, tend)
    return ops


def minus_transform(ops: list) -> list:
    """Mirrored-space ops -> target-forward orientation (minimap2 layout):
    reverse run order; reverse + complement every carried sequence."""
    out = []
    for key, val in reversed(ops):
        if key == ":":
            out.append((key, val))
        elif key == "*":
            # payload is (target, query) — complement both, keep the order
            out.append((key, _COMP[val[0]] + _COMP[val[1]]))
        else:
            out.append((key, "".join(_COMP[ch] for ch in reversed(val))))
    return out


def format_cs(ops: list) -> str:
    parts = []
    for key, val in ops:
        parts.append(f":{val}" if key == ":" else f"{key}{val}")
    return "".join(parts)
