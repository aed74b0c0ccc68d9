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

    @classmethod
    def build(cls, records: list[tuple[str, str]], k: int, slot: int = 256) -> "FeaturePack":
        """records: (name, sequence). slot must be >= k and a multiple of 16."""
        assert slot % 16 == 0 and slot >= k
        names, starts, nslots = [], [], []
        parts_codes, parts_valid = [], []
        cursor = 0
        for name, seq in records:
            seq_bytes = np.frombuffer(seq.encode(), dtype=np.uint8)
            codes, valid = encode_bases(seq_bytes)
            n = codes.shape[0]
            ns = max(1, -(-(n + k) // slot))  # k-1+ spacer fits in the padding
            pad = ns * slot - n
            parts_codes.append(np.concatenate([codes, np.zeros(pad, np.uint8)]))
            parts_valid.append(np.concatenate([valid, np.zeros(pad, np.uint8)]))
            names.append(name)
            starts.append(cursor)
            nslots.append(ns)
            cursor += ns
        all_codes = (
            np.concatenate(parts_codes) if parts_codes else np.zeros(0, np.uint8)
        )
        all_valid = (
            np.concatenate(parts_valid) if parts_valid else np.zeros(0, np.uint8)
        )
        packed, vmask = pack_words(all_codes, all_valid)
        chrom = PackedChromosome(
            name="__features__", length=int(all_codes.shape[0]), packed=packed, vmask=vmask
        )
        g = PackedGenome(chroms=[chrom])
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
        chrom = self.genome.chroms[0]
        if k > 15:
            from subphaser_tpu.ops.mapbins_pair import map_genome_bins_pair

            acc = map_genome_bins_pair(
                self.genome, sig.codes, sig.sg, k, tile_bases, self.slot, n_sg
            )
            slots = acc.per_chrom[0]
            out = np.zeros((len(self.names), n_sg), dtype=np.int64)
            for i, (s0, ns) in enumerate(
                zip(self.feature_slot_start, self.slots_per_feature)
            ):
                out[i] = slots[s0 : s0 + ns].sum(axis=0)
            return out
        acc = BinAccumulator([chrom.length], self.slot, n_sg)
        nbt = nbins_for_tile(tile_bases, self.slot)
        codes = np.ascontiguousarray(sig.codes)
        sgs = np.ascontiguousarray(sig.sg)
        for t in self.genome.tiles(k, tile_bases=tile_bases):
            bc, fb, hitmask = map_tile_bins(
                t.words, t.vwords, codes, sgs, np.int32(t.start),
                k=k, n_pos_words=tile_bases // 16, bin_size=self.slot,
                n_sg=n_sg, nbins_tile=nbt,
            )
            acc.add(0, bc, int(fb), hitmask)
        slots = acc.per_chrom[0]  # (n_slots, n_sg)
        out = np.zeros((len(self.names), n_sg), dtype=np.int64)
        for i, (s0, ns) in enumerate(zip(self.feature_slot_start, self.slots_per_feature)):
            out[i] = slots[s0 : s0 + ns].sum(axis=0)
        return out
