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


def parse_paf(path: str):
    with open(path) as f:
        for line in f:
            if line.strip():
                yield PafRecord.parse(line)


def primary_blocks(paf_path: str, min_block: int = 100000):
    """Primary records with query span >= min_block (circos link input)."""
    for rec in parse_paf(paf_path):
        if rec.is_primary and rec.qspan >= min_block:
            yield rec
