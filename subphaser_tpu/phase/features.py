"""Map significant k-mers onto arbitrary feature sequences (LTRs, custom).

The reference streams every feature sequence through the same Python dict
lookup used for chromosomes (reference Seqs.map_kmer3 with chunk=False,
__main__.py:502-524, 567-578). Here features are concatenated into one
packed pseudo-chromosome with >= k-1 invalid (N) spacer bases between
features, so the existing tile kernel maps everything in a few device calls;
per-feature counts are recovered by summing the fixed-width feature slots.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from subphaser_tpu.io.encoding import encode_bases, pack_words
from subphaser_tpu.io.genome import PackedChromosome, PackedGenome
from subphaser_tpu.ops.mapbins import BinAccumulator, map_tile_bins, nbins_for_tile
from subphaser_tpu.phase.cluster import SigKmers


@dataclass
class FeaturePack:
    genome: PackedGenome          # single concatenated pseudo-chromosome
    names: list[str]
    slot: int                     # bases per slot
    slots_per_feature: np.ndarray  # int (n_features,)
    feature_slot_start: np.ndarray

    # cap per pseudo-chromosome: the tile kernels take int32 tile starts
    # (ops/mapbins map_tile_bins), so ONE concatenated chromosome beyond
    # 2^31 bases overflows to negative device offsets — at wheat scale
    # (490k retained LTRs = 4.6 Gbase of features) this reproducibly
    # wedged the TPU worker mid-phase. Features split across as many
    # <= 2^30-base pseudo-chromosomes as needed; the accumulator is
    # per-chromosome anyway and slots concatenate in order.
    CHROM_CAP = 1 << 30

    @classmethod
    def build(cls, records: list[tuple[str, str]], k: int, slot: int = 256) -> "FeaturePack":
        """records: (name, sequence). slot must be >= k and a multiple of 16."""
        assert slot % 16 == 0 and slot >= k
        names, starts, nslots = [], [], []
        chroms: list[PackedChromosome] = []
        parts_codes, parts_valid = [], []
        cursor = 0          # GLOBAL slot index across all pseudo-chromosomes
        chrom_bases = 0

        def _flush():
            nonlocal parts_codes, parts_valid, chrom_bases
            if not parts_codes:
                return
            all_codes = np.concatenate(parts_codes)
            all_valid = np.concatenate(parts_valid)
            packed, vmask = pack_words(all_codes, all_valid)
            chroms.append(PackedChromosome(
                name=f"__features{len(chroms)}__",
                length=int(all_codes.shape[0]), packed=packed, vmask=vmask,
            ))
            parts_codes, parts_valid, chrom_bases = [], [], 0

        for name, seq in records:
            seq_bytes = np.frombuffer(seq.encode(), dtype=np.uint8)
            codes, valid = encode_bases(seq_bytes)
            n = codes.shape[0]
            ns = max(1, -(-(n + k) // slot))  # k-1+ spacer fits in the padding
            pad = ns * slot - n
            if chrom_bases and chrom_bases + ns * slot > cls.CHROM_CAP:
                _flush()
            parts_codes.append(np.concatenate([codes, np.zeros(pad, np.uint8)]))
            parts_valid.append(np.concatenate([valid, np.zeros(pad, np.uint8)]))
            names.append(name)
            starts.append(cursor)
            nslots.append(ns)
            cursor += ns
            chrom_bases += ns * slot
        _flush()
        if not chroms:
            packed, vmask = pack_words(np.zeros(0, np.uint8), np.zeros(0, np.uint8))
            chroms = [PackedChromosome(name="__features0__", length=0,
                                       packed=packed, vmask=vmask)]
        g = PackedGenome(chroms=chroms)
        return cls(
            genome=g,
            names=names,
            slot=slot,
            slots_per_feature=np.array(nslots, dtype=np.int64),
            feature_slot_start=np.array(starts, dtype=np.int64),
        )

    def map_counts(self, sig: SigKmers, k: int, tile_bases: int = 1 << 22) -> np.ndarray:
        """(n_features, n_sg) significant-k-mer hit counts."""
        n_sg = len(sig.sg_names)
        if k > 15:
            from subphaser_tpu.ops.mapbins_pair import map_genome_bins_pair

            acc = map_genome_bins_pair(
                self.genome, sig.codes, sig.sg, k, tile_bases, self.slot, n_sg
            )
            slots = np.concatenate(acc.per_chrom)
            out = np.zeros((len(self.names), n_sg), dtype=np.int64)
            for i, (s0, ns) in enumerate(
                zip(self.feature_slot_start, self.slots_per_feature)
            ):
                out[i] = slots[s0 : s0 + ns].sum(axis=0)
            return out
        acc = BinAccumulator([c.length for c in self.genome.chroms],
                             self.slot, n_sg)
        nbt = nbins_for_tile(tile_bases, self.slot)
        codes = np.ascontiguousarray(sig.codes)
        sgs = np.ascontiguousarray(sig.sg)
        # dispatch-ahead window: the per-tile calls are tunnel-round-trip
        # bound at wheat scale (~1100 tiles for 4.6 Gbase of features);
        # keeping a few tiles in flight overlaps device compute with the
        # int(fb) sync + host accumulate of earlier tiles
        from collections import deque

        window: deque = deque()

        def _collect():
            ci, bc, fb, hitmask = window.popleft()
            acc.add(ci, np.asarray(bc), int(fb), np.asarray(hitmask))

        for t in self.genome.tiles(k, tile_bases=tile_bases):
            bc, fb, hitmask = map_tile_bins(
                t.words, t.vwords, codes, sgs, np.int32(t.start),
                k=k, n_pos_words=tile_bases // 16, bin_size=self.slot,
                n_sg=n_sg, nbins_tile=nbt,
            )
            window.append((t.chrom_index, bc, fb, hitmask))
            if len(window) >= 4:
                _collect()
        while window:
            _collect()
        # per-chromosome slot arrays concatenate into the global slot index
        # space (every pseudo-chromosome's length is a slot multiple)
        slots = np.concatenate(acc.per_chrom)  # (n_slots, n_sg)
        out = np.zeros((len(self.names), n_sg), dtype=np.int64)
        for i, (s0, ns) in enumerate(zip(self.feature_slot_start, self.slots_per_feature)):
            out[i] = slots[s0 : s0 + ns].sum(axis=0)
        return out
