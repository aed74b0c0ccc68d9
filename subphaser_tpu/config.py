"""Subgenome-set config parsing and id mapping.

Reproduces the reference's SGConfig semantics (reference __main__.py:752-789):
each non-comment line is one homoeologous chromosome set; whitespace-separated
columns are the future subgenomes; a column may group several chromosomes with
commas; ids may be renamed with ``new|old`` (handled at genome-split time via
the targets map, reference Seqs.py:27-46); genome-file prefixes are prepended
to every id component when multiple genomes are given.
"""

from __future__ import annotations

import logging
from collections import Counter, OrderedDict
from dataclasses import dataclass, field

logger = logging.getLogger("subphaser_tpu")


def add_prefix(val: str, prefix: str | None = None, sep: str = "|") -> str:
    if prefix:
        return "".join(f"{prefix}{v}" for v in val.split(sep) if v)
    return val


@dataclass
class SGConfig:
    """One parsed config file.

    ``sgs``: list of homoeologous sets; each set is a list of columns; each
    column is a list of chromosome ids (comma groups).
    """

    sgs: list = field(default_factory=list)
    chrs: list = field(default_factory=list)
    nsg: int = 0

    @classmethod
    def parse(cls, path: str, prefix: str | None = None, sep: str = "|") -> "SGConfig":
        cfg = cls()
        widths = []
        with open(path) as f:
            for line in f:
                tokens = line.split("#")[0].strip().split()
                if not tokens:
                    continue
                row = [
                    [add_prefix(x, prefix=prefix, sep=sep) for x in tok.strip(",").split(",")]
                    for tok in tokens
                ]
                widths.append(len(row))
                if cfg.nsg == 0:
                    cfg.nsg = len(row)
                elif len(row) != cfg.nsg:
                    logger.warning(
                        "Number of columns differs in line %r: %d here vs %d before",
                        tokens, len(row), cfg.nsg,
                    )
                for col in row:
                    cfg.chrs.extend(col)
                cfg.sgs.append(row)
        if widths:
            cfg.nsg = max(widths)
        for chrom, count in Counter(cfg.chrs).items():
            if count > 1:
                logger.warning("Chromosome id %s repeats %d times", chrom, count)
        return cfg


def parse_configs(
    cfg_paths: list[str],
    labels: list[str] | None = None,
    sep: str = "|",
) -> tuple[list, list, int]:
    """Parse several config files -> (sgs, chrs, nsg_sum).

    Prefix labels are applied per-config only when there is one label per
    config file (reference __main__.py:269-279).
    """
    if labels is not None and len(labels) == len(cfg_paths):
        cfg_labels = labels
    else:
        cfg_labels = [None] * len(cfg_paths)
    sgs, chrs, nsg = [], [], 0
    for path, label in zip(cfg_paths, cfg_labels):
        cfg = SGConfig.parse(path, prefix=label, sep=sep)
        sgs += cfg.sgs
        chrs += cfg.chrs
        nsg += cfg.nsg
    return sgs, chrs, nsg


def build_targets(chrs: list[str], sep: str = "|") -> OrderedDict:
    """Config tokens -> id rename map (``new|old`` -> {old: new}).

    Mirrors the implicit map the reference builds in split_genomes
    (reference Seqs.py:30-36): the part after the separator is the id found
    in the FASTA, the part before is the output name.
    """
    targets: OrderedDict[str, str] = OrderedDict()
    for t in chrs:
        parts = t.split(sep, 1)
        targets[parts[-1]] = parts[0]
    return targets


def parse_idmap(path: str | None) -> OrderedDict | None:
    """-target file: 'old_id [new_id]' lines (reference __main__.py:731-745)."""
    if not path:
        return None
    d: OrderedDict[str, str] = OrderedDict()
    with open(path) as f:
        for line in f:
            line = line.strip().split("#")[0]
            if not line:
                continue
            tok = line.split()
            old = tok[0]
            new = tok[1] if len(tok) > 1 else old.split("|")[-1]
            d[old] = new
    return d


def rename_token(token: str, targets: dict[str, str], sep: str = "|") -> str:
    """Map a config token to its final chromosome name."""
    if token in targets:
        return targets[token]
    tail = token.split(sep, 1)[-1]
    return targets.get(tail, tail)


def update_sgs(sgs: list, targets: dict[str, str], sep: str = "|") -> list:
    """Rename every chromosome in the sets per targets (reference __main__.py:298-304)."""
    out = []
    for sg in sgs:
        out.append([[rename_token(c, targets, sep) for c in col] for col in sg])
    return out


def parse_assigned(path: str | None, targets: dict[str, str]) -> dict[str, str]:
    """-sg_assigned file: 'chrom sg' lines (reference __main__.py:305-315)."""
    if not path:
        return {}
    d: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.strip().split()
            if len(parts) < 2:
                continue
            chrom, sg = parts[:2]
            d[targets.get(chrom, chrom)] = sg
    return d


def parse_ordered(path: str | None, targets: dict[str, str]) -> list[str]:
    """-chr_ordered file (reference __main__.py:316-326)."""
    if not path:
        return []
    out = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.strip().split()
            if parts:
                chrom = parts[0]
                out.append(targets.get(chrom, chrom))
    return out


def group_indices(sgs: list, labels: list[str]) -> list[list[list[int]]]:
    """Chromosome names in the sets -> indices into ``labels``.

    Any chromosome missing from ``labels`` is dropped; empty columns are
    dropped; the structure mirrors ``sgs``.
    """
    pos = {name: i for i, name in enumerate(labels)}
    out = []
    for sg in sgs:
        row = []
        for col in sg:
            idx = [pos[c] for c in col if c in pos]
            if idx:
                row.append(idx)
        out.append(row)
    return out
