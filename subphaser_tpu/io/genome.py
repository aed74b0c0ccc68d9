"""Packed genome representation and fixed-shape tiling.

The reference splits genomes into per-chromosome FASTA files and streams 10 Mb
text chunks into worker processes (reference Seqs.py:27-71,121-139). Here the
genome lives as 2-bit packed numpy arrays; the device consumes fixed-size
*tiles* so every pipeline step compiles once (static shapes for XLA).

A tile covers ``n_pos`` k-mer start positions; consecutive tiles overlap by
``k-1`` bases (the same halo the reference uses for its chunking), realized by
giving each tile ``extra`` trailing words beyond ``n_pos`` bases. Positions
whose k-mer would run past the chromosome end or touch an ambiguous base are
masked invalid inside the k-mer kernel.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import numpy as np

from subphaser_tpu.io.encoding import BASES_PER_WORD, encode_bases, pack_words
from subphaser_tpu.io.fasta import iter_fasta_raw

DEFAULT_TILE_BASES = 1 << 23  # 8.4 Mb of k-mer start positions per tile

_native_pack = None  # resolved once; False when the native lib is unavailable


def _get_native_pack():
    global _native_pack
    if _native_pack is None:
        try:
            from subphaser_tpu.ltr import native

            native.load()
            _native_pack = native.pack_body
        except Exception:  # no g++ / load failure: numpy fallback
            _native_pack = False
    return _native_pack


@dataclass
class PackedChromosome:
    name: str
    length: int
    packed: np.ndarray  # int32 (n_words,)
    vmask: np.ndarray  # int32 (n_words,), 16 validity bits used

    @classmethod
    def from_bytes(cls, name: str, seq_bytes: np.ndarray) -> "PackedChromosome":
        codes, valid = encode_bases(seq_bytes)
        packed, vmask = pack_words(codes, valid)
        return cls(name=name, length=int(seq_bytes.shape[0]), packed=packed, vmask=vmask)

    @classmethod
    def from_raw_body(cls, name: str, raw: np.ndarray) -> "PackedChromosome":
        """Pack a RAW record body (newlines/CR still embedded) in one native
        pass (ltr/native.pack_body); numpy fallback strips + packs."""
        pack = _get_native_pack()
        if pack:
            packed, vmask, n = pack(raw)
            return cls(name=name, length=n, packed=packed, vmask=vmask)
        body = raw.tobytes().replace(b"\n", b"").replace(b"\r", b"")
        return cls.from_bytes(name, np.frombuffer(body, dtype=np.uint8))

    @classmethod
    def from_str(cls, name: str, seq: str) -> "PackedChromosome":
        return cls.from_bytes(name, np.frombuffer(seq.encode(), dtype=np.uint8))

    def signature(self) -> str:
        """Content fingerprint for checkpoint keys: lets per-chromosome
        spectra survive changes to the TARGET SET (the reference's
        -re_filter workflow, __main__.py:100-102, 352-354) while
        invalidating when the underlying sequence differs.

        Hashes the FULL packed words AND validity masks (blake2b streams
        ~1 GB/s, ~0.3 s per 667 Mb chromosome): a strided sample would
        silently reuse a stale spectrum after a same-length base edit or a
        re-masking (N changes touch only vmask)."""
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        h.update(str(self.length).encode())
        h.update(np.ascontiguousarray(self.packed).tobytes())
        h.update(np.ascontiguousarray(self.vmask).tobytes())
        return h.hexdigest()

    def to_seq(self) -> str:
        """Reconstruct the sequence (ambiguous bases come back as 'N')."""
        from subphaser_tpu.ltr.native import unpack_codes

        codes = unpack_codes(self.packed, self.vmask, self.length)
        return np.frombuffer(b"ACGTN", dtype=np.uint8)[codes].tobytes().decode()


@dataclass
class Tile:
    """One fixed-shape unit of device work."""

    chrom_index: int
    start: int  # k-mer start offset within the chromosome
    n_pos: int  # number of k-mer start positions covered (== tile_bases)
    words: np.ndarray  # int32 (tile_words,)
    vwords: np.ndarray  # int32 (tile_words,)


def tile_words_for(tile_bases: int, k: int) -> int:
    if tile_bases % BASES_PER_WORD:
        raise ValueError("tile_bases must be a multiple of 16")
    # halo words for the k-1 overlap; the pair-code kernel (k >= 16) reads
    # two words past every start position regardless of ceil((k-1)/16)
    extra = 2 if k >= 16 else 1
    return tile_bases // BASES_PER_WORD + extra


@dataclass
class PackedGenome:
    chroms: list[PackedChromosome] = field(default_factory=list)

    @property
    def names(self) -> list[str]:
        return [c.name for c in self.chroms]

    @property
    def sizes(self) -> dict[str, int]:
        return {c.name: c.length for c in self.chroms}

    def __len__(self) -> int:
        return len(self.chroms)

    def total_bases(self) -> int:
        return sum(c.length for c in self.chroms)

    def chrom(self, name: str) -> PackedChromosome:
        for c in self.chroms:
            if c.name == name:
                return c
        raise KeyError(name)

    # ---- construction -------------------------------------------------
    @classmethod
    def from_fasta_files(
        cls,
        genome_files: list[str],
        prefixes: list[str] | None = None,
        targets: dict[str, str] | None = None,
        chr_mark: str | None = None,
        min_size: int | None = None,
        workers: int | None = None,
    ) -> tuple["PackedGenome", dict[str, str]]:
        """Load (a subset of) chromosomes, mirroring the reference's
        split_genomes selection/renaming semantics (reference Seqs.py:27-71):

        - each genome file gets a prefix label prepended to its sequence ids
        - ``targets`` maps (possibly prefixed) original ids -> output ids;
          when given, only matching sequences are kept, renamed
        - without targets, every sequence (optionally filtered by regex
          ``chr_mark`` / ``min_size``) is kept
        - ``workers``: host threads for 2-bit packing (numpy releases the
          GIL, so packing overlaps parsing/decompression; the reference's
          pool-parallel split is RunCmdsMP-driven, Seqs.py:121-139)

        Returns (genome, got) where got maps original target key -> new id.
        """
        import concurrent.futures as cf

        if prefixes is None:
            prefixes = [""] * len(genome_files)
        g = cls()
        got: dict[str, str] = {}

        def selected():
            # bodies are RAW views (newlines embedded) into one file buffer;
            # the packer skips newline bytes, so true base length for the
            # min_size gate needs the newline count subtracted
            for path, prefix in zip(genome_files, prefixes):
                for rid, _desc, raw in iter_fasta_raw(path):
                    old_id, pref_id = rid, f"{prefix}{rid}"
                    if targets:
                        if pref_id in targets:
                            key = pref_id
                        elif old_id in targets:
                            key = old_id
                        else:
                            continue
                        new_id = targets[key]
                        got[key] = new_id
                    else:
                        if chr_mark and not re.search(chr_mark, rid, re.I):
                            continue
                        if min_size:
                            nl = int(np.count_nonzero(raw == 10)) + int(
                                np.count_nonzero(raw == 13)
                            )
                            if raw.shape[0] - nl < min_size:
                                continue
                        new_id = pref_id
                        got[new_id] = new_id
                    yield new_id, raw

        if workers is None:
            workers = min(os.cpu_count() or 1, 8)
        if workers <= 1:
            for new_id, raw in selected():
                g.chroms.append(PackedChromosome.from_raw_body(new_id, raw))
            return g, got
        # bounded pipeline: keep at most 2*workers raw sequences in flight so
        # peak host memory stays ~O(workers * chrom), not O(genome); the
        # native packer releases the GIL, so threads scale
        pending: list = []
        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            for new_id, raw in selected():
                pending.append(
                    ex.submit(PackedChromosome.from_raw_body, new_id, raw)
                )
                while len(pending) > 2 * workers:
                    g.chroms.append(pending.pop(0).result())
            for fut in pending:
                g.chroms.append(fut.result())
        return g, got

    @classmethod
    def from_dict(cls, seqs: dict[str, str]) -> "PackedGenome":
        g = cls()
        for name, seq in seqs.items():
            g.chroms.append(PackedChromosome.from_str(name, seq))
        return g

    # ---- persistence --------------------------------------------------
    def save(self, path: str) -> None:
        arrs: dict[str, np.ndarray] = {}
        names, lengths = [], []
        for i, c in enumerate(self.chroms):
            names.append(c.name)
            lengths.append(c.length)
            arrs[f"packed_{i}"] = c.packed
            arrs[f"vmask_{i}"] = c.vmask
        arrs["names"] = np.array(names)
        arrs["lengths"] = np.array(lengths, dtype=np.int64)
        np.savez(path, **arrs)

    @classmethod
    def load(cls, path: str) -> "PackedGenome":
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        g = cls()
        names = data["names"]
        lengths = data["lengths"]
        for i, (name, length) in enumerate(zip(names, lengths)):
            g.chroms.append(
                PackedChromosome(
                    name=str(name),
                    length=int(length),
                    packed=data[f"packed_{i}"],
                    vmask=data[f"vmask_{i}"],
                )
            )
        return g

    # ---- tiling -------------------------------------------------------
    def num_tiles(self, tile_bases: int = DEFAULT_TILE_BASES) -> int:
        return sum(-(-c.length // tile_bases) for c in self.chroms)

    def tiles(self, k: int, tile_bases: int = DEFAULT_TILE_BASES):
        """Yield fixed-shape Tiles covering every k-mer start position once."""
        n_words_tile = tile_words_for(tile_bases, k)
        for ci, c in enumerate(self.chroms):
            for start in range(0, c.length, tile_bases):
                w0 = start // BASES_PER_WORD
                words = np.zeros(n_words_tile, dtype=np.int32)
                vwords = np.zeros(n_words_tile, dtype=np.int32)
                avail = min(n_words_tile, c.packed.shape[0] - w0)
                if avail > 0:
                    words[:avail] = c.packed[w0 : w0 + avail]
                    vwords[:avail] = c.vmask[w0 : w0 + avail]
                yield Tile(
                    chrom_index=ci,
                    start=start,
                    n_pos=tile_bases,
                    words=words,
                    vwords=vwords,
                )
