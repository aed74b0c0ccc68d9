"""Map significant k-mers onto arbitrary feature sequences (LTRs, custom).

The reference streams every feature sequence through the same Python dict
lookup used for chromosomes (reference Seqs.map_kmer3 with chunk=False,
__main__.py:502-524, 567-578). Here features are concatenated into one
packed pseudo-chromosome with >= k-1 invalid (N) spacer bases between
features, so the existing tile kernel maps everything in a few device calls;
per-feature counts are recovered by summing the fixed-width feature slots.
"""

from __future__ import annotations

import os
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
        """(n_features, n_sg) significant-k-mer hit counts.

        k <= 15 runs HOST-side by default (vectorized searchsorted against
        the sorted sig table): the feature sequences are host-resident
        strings, so the device path pays a multi-GB upload plus ~1100
        tunnel-bound tile dispatches at wheat scale — and its 16384-bin
        tile program reproducibly wedged the remote worker on first
        execution during the 14 Gb run (attempts 3-5). The sig table
        (~6 MB sorted int32) is L2-resident, making host searchsorted
        ~30 M probes/s/thread — the whole 4.6 Gbase wheat feature set
        maps in ~3 min across threads with zero device risk.
        SUBPHASER_FEATURE_MAP=device restores the device path.
        """
        n_sg = len(sig.sg_names)
        if k <= 15 and os.environ.get("SUBPHASER_FEATURE_MAP") != "device":
            return self._map_counts_host(sig, k)
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

    def _map_counts_host(self, sig: SigKmers, k: int) -> np.ndarray:
        """Host half of :meth:`map_counts` (k <= 15): per-slot forward-code
        matches against the sorted two-strand sig table, chunked so the
        vector ops run on ~64M-element arrays (GIL released -> threads
        scale) and summed into the global slot space. Chunks are
        slot-aligned and k-mer starts never cross a chunk, so the per-chunk
        slot ranges are disjoint."""
        import threading
        from concurrent.futures import ThreadPoolExecutor

        from subphaser_tpu.ltr.native import unpack_codes

        n_sg = len(sig.sg_names)
        slot = self.slot
        table = sig.codes.astype(np.int64)
        sg_of = sig.sg
        total_slots = int(self.slots_per_feature.sum())
        out_slots = np.zeros((total_slots, n_sg), np.int64)
        lock = threading.Lock()
        CHUNK = 1 << 26  # bases; a multiple of every valid slot (slot % 16 == 0)
        assert CHUNK % slot == 0

        def _chunk(codes: np.ndarray, lo: int, hi: int, slot_base: int):
            seg = codes[lo : min(hi + k - 1, codes.size)].astype(np.int64)
            valid = seg < 4
            seg = np.where(valid, seg, 0)
            n = seg.size - k + 1
            if n <= 0 or table.size == 0:
                return
            code = np.zeros(n, np.int64)
            ok = np.ones(n, bool)
            for j in range(k):
                code = (code << 2) | seg[j : j + n]
                ok &= valid[j : j + n]
            pos = np.flatnonzero(ok)
            if pos.size == 0:
                return
            fc = code[pos]
            i = np.minimum(np.searchsorted(table, fc), table.size - 1)
            m = table[i] == fc
            if not m.any():
                return
            p = pos[m] + lo
            slot_lo = slot_base + lo // slot
            slot_hi = slot_base + (hi + slot - 1) // slot
            local = (p - lo) // slot  # lo is slot-aligned (CHUNK % slot == 0)
            flat = local * n_sg + sg_of[i[m]]
            cnt = np.bincount(
                flat, minlength=(slot_hi - slot_lo) * n_sg
            ).reshape(-1, n_sg)
            with lock:
                out_slots[slot_lo:slot_hi] += cnt

        jobs = []
        slot_base = 0
        for chrom in self.genome.chroms:
            codes = unpack_codes(chrom.packed, chrom.vmask, chrom.length)
            for lo in range(0, chrom.length, CHUNK):
                jobs.append((codes, lo, min(lo + CHUNK, chrom.length),
                             slot_base))
            slot_base += chrom.length // slot
        with ThreadPoolExecutor(max_workers=min(4, os.cpu_count() or 1)) \
                as ex:
            list(ex.map(lambda a: _chunk(*a), jobs))
        out = np.zeros((len(self.names), n_sg), dtype=np.int64)
        for i, (s0, ns) in enumerate(
            zip(self.feature_slot_start, self.slots_per_feature)
        ):
            out[i] = out_slots[s0 : s0 + ns].sum(axis=0)
        return out
