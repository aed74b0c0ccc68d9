"""PAF record model (reference Paf.py:5-120 essentials).

Parses/writes PAF lines with SAM-style tags; provides the primary-hit filter
and size/overlap helpers the circos link track needs
(reference Circos.py:654-682).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PafRecord:
    qname: str
    qlen: int
    qstart: int
    qend: int
    strand: str
    tname: str
    tlen: int
    tstart: int
    tend: int
    nmatch: int
    alen: int
    mapq: int
    tags: dict = field(default_factory=dict)

    @classmethod
    def parse(cls, line: str) -> "PafRecord":
        t = line.rstrip("\n").split("\t")
        tags = {}
        for tag in t[12:]:
            parts = tag.split(":", 2)
            if len(parts) == 3:
                name, typ, val = parts
                if typ == "i":
                    val = int(val)
                elif typ == "f":
                    val = float(val)
                tags[name] = val
        return cls(
            qname=t[0], qlen=int(t[1]), qstart=int(t[2]), qend=int(t[3]),
            strand=t[4], tname=t[5], tlen=int(t[6]), tstart=int(t[7]),
            tend=int(t[8]), nmatch=int(t[9]), alen=int(t[10]), mapq=int(t[11]),
            tags=tags,
        )

    def to_line(self) -> str:
        fields = [
            self.qname, self.qlen, self.qstart, self.qend, self.strand,
            self.tname, self.tlen, self.tstart, self.tend, self.nmatch,
            self.alen, self.mapq,
        ]
        out = "\t".join(str(v) for v in fields)
        for name, val in self.tags.items():
            typ = "i" if isinstance(val, int) else "f" if isinstance(val, float) else "A" if len(str(val)) == 1 else "Z"
            out += f"\t{name}:{typ}:{val}"
        return out

    @property
    def is_primary(self) -> bool:
        return self.tags.get("tp", "P") == "P"

    @property
    def qspan(self) -> int:
        return self.qend - self.qstart

    @property
    def tspan(self) -> int:
        return self.tend - self.tstart

    @property
    def identity(self) -> float:
        return self.nmatch / self.alen if self.alen else 0.0

    def qoverlap(self, other: "PafRecord") -> int:
        if self.qname != other.qname:
            return 0
        return max(0, min(self.qend, other.qend) - max(self.qstart, other.qstart))


    def toverlap(self, other: "PafRecord") -> int:
        if self.tname != other.tname:
            return 0
        return max(0, min(self.tend, other.tend) - max(self.tstart, other.tstart))

    def qcontains(self, other: "PafRecord") -> bool:
        return (
            self.qname == other.qname
            and self.qstart <= other.qstart
            and self.qend >= other.qend
        )

    def qcov(self) -> float:
        """Query coverage fraction."""
        return self.qspan / self.qlen if self.qlen else 0.0

    def tcov(self) -> float:
        return self.tspan / self.tlen if self.tlen else 0.0

    # ---- cs-string (minimap2 difference string) ----------------------
    def cs_ops(self):
        """Parse the cs:Z: tag -> [(op, payload)] with op in ':*+-~'.

        ':' exact-match length (int), '*' substitution 'rq' (ref+query
        base), '+' insertion into query (seq), '-' deletion from query
        (seq), '~' intron (raw).
        """
        cs = self.tags.get("cs")
        if not cs:
            return []
        out = []
        for m in _CS_RE.finditer(cs):
            op = m.group(1)
            val = m.group(2)
            out.append((op, int(val) if op == ":" else val))
        return out

    def cs_calls(self):
        """cs-string -> variant calls [(tpos, ref, alt)] in target coords
        (the reference's CsBlocks -> VCF conversion, Paf.py)."""
        tpos = self.tstart
        calls = []
        for op, val in self.cs_ops():
            if op == ":":
                tpos += val
            elif op == "*":
                calls.append((tpos, val[0].upper(), val[1].upper()))
                tpos += 1
            elif op == "-":  # deletion from query = bases present in target
                calls.append((tpos, val.upper(), ""))
                tpos += len(val)
            elif op == "+":  # insertion in query
                calls.append((tpos, "", val.upper()))
            elif op == "~":
                digits = "".join(c for c in val if c.isdigit())
                tpos += int(digits) if digits else 0
        return calls


_CS_RE = __import__("re").compile(r"([:*+\-~])([0-9]+|[a-zA-Z]+)")


def parse_paf(path: str):
    with open(path) as f:
        for line in f:
            if line.strip():
                yield PafRecord.parse(line)


def best_hit(records, by: str = "qname"):
    """Highest-scoring record per query (reference Paf.best_hit): primary
    preferred, then most matching bases."""
    best: dict[str, PafRecord] = {}
    for r in records:
        key = getattr(r, by)
        cur = best.get(key)
        if cur is None:
            best[key] = r
            continue
        if (r.is_primary, r.nmatch) > (cur.is_primary, cur.nmatch):
            best[key] = r
    return best


def primary_blocks(paf_path: str, min_block: int = 100000):
    """Primary records with query span >= min_block (circos link input)."""
    for rec in parse_paf(paf_path):
        if rec.is_primary and rec.qspan >= min_block:
            yield rec
