"""Subgenome color palette (role of reference colors.py:5-73, own palette)."""

from __future__ import annotations

DEFAULT_PALETTE = [
    "#e41a1c", "#377eb8", "#4daf4a", "#984ea3", "#ff7f00", "#a65628",
    "#f781bf", "#999999", "#66c2a5", "#fc8d62", "#8da0cb", "#e78ac3",
    "#a6d854", "#ffd92f", "#e5c494", "#b3b3b3", "#1b9e77", "#d95f02",
    "#7570b3", "#e7298a", "#66a61e", "#e6ab02", "#a6761d", "#666666",
    "#8dd3c7", "#ffffb3", "#bebada", "#fb8072", "#80b1d3", "#fdb462",
    "#b3de69",
]


class SGColors:
    """Maps subgenome names (sorted) to hex colors; '-colors' flag override."""

    def __init__(self, colors: str | list[str] | None = None):
        if isinstance(colors, str):
            self.palette = [c.strip() for c in colors.split(",") if c.strip()]
        elif colors:
            self.palette = list(colors)
        else:
            self.palette = list(DEFAULT_PALETTE)

    def for_names(self, names: list[str]) -> dict[str, str]:
        return {
            name: self.palette[i % len(self.palette)]
            for i, name in enumerate(sorted(names))
        }

    def __getitem__(self, i: int) -> str:
        return self.palette[i % len(self.palette)]
