"""LTR-RT record model, .scn IO, and overlap resolution.

Reproduces the reference's LTRHarvest record semantics (reference
LTR.py:609-704): 1-based inclusive start/end, id format
``chr:start-end:lltr_e-rltr_s``, JC69 insertion age, and the
completed-beats-longer overlap resolution (reference LTR.py:415-472).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from itertools import groupby


@dataclass
class LTRRecord:
    seq_id: str
    start: int        # 1-based inclusive
    end: int          # 1-based inclusive
    lltr: int         # left LTR length
    rltr: int         # right LTR length
    similarity: float  # percent
    seq_nr: int = 0
    tsd_len: int = 0
    # classification (filled by classify step)
    order: str | None = None
    superfamily: str | None = None
    clade: str | None = None
    completed: str | None = None
    strand: str | None = None
    domains: str | None = None
    sg: str | None = None
    exchange: str | None = None
    # finder-style structural signals (reference LTRFinderRecord carries
    # TSR/PBS/PPT/strand/score columns, LTR.py:715-725)
    score: int | None = None
    motifs: str | None = None  # comma-joined subset of TGCA,TSD,PBS,PPT

    @property
    def element_len(self) -> int:
        return self.end - self.start + 1

    @property
    def lltr_e(self) -> int:
        return self.start + self.lltr - 1

    @property
    def rltr_s(self) -> int:
        return self.end - self.rltr + 1

    @property
    def key(self):
        return (self.seq_id, self.start, self.end, self.lltr_e, self.rltr_s)

    @property
    def id(self) -> str:
        return f"{self.seq_id}:{self.start}-{self.end}:{self.lltr_e}-{self.rltr_s}"

    def __hash__(self):
        return hash(self.key)

    def __eq__(self, other):
        return self.key == other.key

    def to_bed(self):
        return [self.seq_id, self.start, self.end, self.id]

    def overlap(self, other: "LTRRecord") -> float:
        ovl = max(0, min(self.end, other.end) - max(self.start, other.start))
        return 100 * ovl / min(self.element_len, other.element_len)

    def estimate_age(self, mu: float = 7e-9) -> float:
        """JC69 insertion age in years (reference LTR.py:683-689)."""
        div = 1 - self.similarity / 100
        if div >= 0.75:
            dist = div
        else:
            dist = -3 / 4 * math.log(1 - 4 * div / 3)
        return dist / (mu * 2)

    # sequence extraction (0-based python slicing on the 1-based coords,
    # matching reference LTR.py:705-713)
    def get_full_seq(self, seq: str) -> str:
        return seq[self.start : self.end]

    def get_int_seq(self, seq: str) -> str:
        return seq[self.lltr_e : self.rltr_s]

    def scn_line(self) -> str:
        """Modified-harvest .scn format (reference LTR.py:652-661)."""
        vals = [
            self.start, self.end, self.element_len, self.start, self.lltr_e,
            self.lltr, self.rltr_s, self.end, self.rltr, self.similarity,
            self.seq_nr, self.seq_id,
        ]
        return " ".join(str(v) for v in vals)


def parse_scn(path: str) -> list[LTRRecord]:
    with open(path) as f:
        return parse_scn_lines(f)


def parse_scn_lines(lines) -> list[LTRRecord]:
    out = []
    for line in lines:
        if line.startswith("#") or not line.strip():
            continue
        t = line.split()
        out.append(
            LTRRecord(
                seq_id=t[11] if len(t) >= 12 else str(t[10]),
                start=int(t[0]),
                end=int(t[1]),
                lltr=int(t[5]),
                rltr=int(t[8]),
                similarity=float(t[9]),
                seq_nr=int(t[10]),
            )
        )
    return out


def write_scn(records: list[LTRRecord], fout) -> None:
    fout.write("# LTR candidates (modified LTRharvest format)\n")
    fout.write("# s(ret) e(ret) l(ret) s(lLTR) e(lLTR) l(lLTR) s(rLTR) "
               "e(rLTR) l(rLTR) sim(%) seq-nr seq-id\n")
    for r in records:
        fout.write(r.scn_line() + "\n")


def is_completed(ltr: LTRRecord) -> bool:
    return ltr.completed == "yes"


def resolve_overlaps(ltrs: list[LTRRecord], max_ovl: float = 10) -> list[LTRRecord]:
    """Reference resolve_overlaps (LTR.py:422-468): for overlapping pairs,
    completed beats uncompleted; otherwise the longer element wins."""
    last = None
    discards: set[LTRRecord] = set()
    for ltr in sorted(ltrs, key=lambda x: x.start):
        discard = None
        if last is not None:
            both_c = is_completed(ltr) and is_completed(last)
            both_u = not (is_completed(ltr) or is_completed(last))
            if ltr == last:
                pair = (last, ltr)
            elif both_c or both_u:
                if ltr.overlap(last) > max_ovl:
                    if ltr.element_len > last.element_len:
                        pair = (ltr, last)
                    else:
                        pair = (last, ltr)
                else:
                    last = ltr
                    continue
            else:
                if ltr.overlap(last) > max_ovl:
                    pair = (ltr, last) if is_completed(ltr) else (last, ltr)
                else:
                    last = ltr
                    continue
            _retain, discard = pair
            discards.add(discard)
        if last is None or discard is not ltr:
            last = ltr
    return sorted(set(ltrs) - discards, key=lambda x: x.start)


def group_resolve_overlaps(ltrs: list[LTRRecord], max_ovl: float = 10):
    out = []
    for _chrom, items in groupby(ltrs, key=lambda x: x.seq_id):
        out += resolve_overlaps(list(items), max_ovl=max_ovl)
    return out
