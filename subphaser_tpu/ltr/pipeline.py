"""LTR subsystem pipeline: detect -> classify -> filter -> resolve overlaps.

Mirrors reference LTRpipeline (LTR.py:303-413). Outputs the .scn candidate
file, the inner-region fasta, the TEsorter-style .cls.tsv (when a profile
database is available), and the filtered full-length LTR fasta consumed by
the k-mer enrichment step.
"""

from __future__ import annotations

import os

from subphaser_tpu.io.genome import PackedGenome
from subphaser_tpu.ltr import classify as clsmod
from subphaser_tpu.ltr.detect import detect_ltr
from subphaser_tpu.ltr.records import (
    LTRRecord,
    group_resolve_overlaps,
    parse_scn,
    write_scn,
)
from subphaser_tpu.utils.log import logger


class LTRPipeline:
    def __init__(
        self,
        genome: PackedGenome,
        tmpdir: str,
        harvest_options: str | None = None,
        finder_options: str | None = None,
        detectors: list[str] | None = None,
        hmm_db: str | None = None,
        all_ltr: bool = False,
        intact_ltr: bool = False,
        mu: float = 13e-9,
        overwrite: bool = False,
        tile_bases: int = 1 << 22,
        max_evalue: float = 1e-3,
        pass2_rule: tuple[float, float, int] | None = None,
        pass2_enabled: bool = True,
    ):
        self.genome = genome
        self.d_class: dict = {}
        self.tmpdir = tmpdir
        self.harvest_options = harvest_options
        self.finder_options = finder_options
        self.detectors = detectors
        self.hmm_db = hmm_db
        self.all_ltr = all_ltr
        self.intact_ltr = intact_ltr and not all_ltr
        self.mu = mu
        self.max_evalue = max_evalue
        self.pass2_rule = pass2_rule  # (identity%, coverage%, length)
        self.pass2_enabled = pass2_enabled
        self.overwrite = overwrite
        self.tile_bases = tile_bases
        os.makedirs(tmpdir, exist_ok=True)
        self.prefix = os.path.join(tmpdir, "LTR")
        self.int_seqs = self.prefix + ".inner.fa"

    def run(self) -> tuple[list[LTRRecord], str]:
        scn = self.prefix + ".scn"
        if os.path.exists(scn) and not self.overwrite:
            ltrs = parse_scn(scn)
            logger.info("Loaded %d LTR candidates from checkpoint %s", len(ltrs), scn)
        else:
            ltrs = detect_ltr(
                self.genome, self.harvest_options,
                detectors=self.detectors, finder_options=self.finder_options,
                tile_bases=self.tile_bases,
                checkpoint_prefix=scn,
            )
            with open(scn, "w") as f:
                write_scn(ltrs, f)
            # per-chromosome parts are superseded by the full .scn
            import glob as _glob

            for part in _glob.glob(scn + ".part.*.scn"):
                os.remove(part)
        ltr_count = len(ltrs)
        logger.info("%d LTRs identified", ltr_count)
        if ltr_count == 0:
            return [], ""

        self.d_seqs = d_seqs = {c.name: c.to_seq() for c in self.genome.chroms}
        d_class = self.classify(ltrs, d_seqs)

        filtered: list[LTRRecord] = []
        n_ltr = n_completed = 0
        for ltr in ltrs:
            cls = d_class.get(ltr.id)
            if cls:
                ltr.order = cls.order
                ltr.superfamily = cls.superfamily
                ltr.clade = cls.clade
                ltr.completed = cls.completed
                ltr.strand = cls.strand
                ltr.domains = cls.domains
            if ltr.order == "LTR":
                n_ltr += 1
            if ltr.completed == "yes":
                n_completed += 1
            if self.all_ltr:
                pass
            elif d_class and ltr.order != "LTR":
                continue
            elif self.intact_ltr and ltr.completed != "yes":
                continue
            filtered.append(ltr)
        if d_class:
            logger.info(
                "Classified: %d (%.1f%%) are LTR order, %d intact with complete "
                "protein domains",
                n_ltr, 100.0 * n_ltr / max(ltr_count, 1), n_completed,
            )

        ltrs_resolved = group_resolve_overlaps(filtered)
        logger.info(
            "After filtering, %d / %d (%.1f%%) LTRs retained",
            len(ltrs_resolved), ltr_count, 100.0 * len(ltrs_resolved) / ltr_count,
        )
        ltr_seqs = self.prefix + ".filtered.LTR.fa"
        with open(ltr_seqs, "w") as f:
            for ltr in ltrs_resolved:
                seq = ltr.get_full_seq(d_seqs[ltr.seq_id])
                f.write(f">{ltr.id}\n{seq}\n")
        return ltrs_resolved, ltr_seqs

    def classify(self, ltrs, d_seqs) -> dict:
        """TEsorter-equivalent classification; {} when no profile db.

        Checkpointing (the wheat-scale classification phase runs for tens
        of minutes and the axon relay can die mid-phase): the finished
        result is pickled to ``.cls.pkl`` (full Classification objects incl.
        domain peptides the trees need — the .cls.tsv drops those), and
        both passes stream chunk-level partial checkpoints so a killed run
        resumes mid-pass, not from the phase start.
        """
        import pickle

        cls_pkl = self.int_seqs + ".cls.pkl"
        if os.path.exists(cls_pkl) and not self.overwrite:
            with open(cls_pkl, "rb") as f:
                d_class = pickle.load(f)
            self.d_class = d_class
            logger.info(
                "Loaded classification checkpoint %s (%d elements)",
                cls_pkl, len(d_class),
            )
            return d_class
        with open(self.int_seqs, "w") as f:
            for ltr in ltrs:
                f.write(f">{ltr.id}\n{ltr.get_int_seq(d_seqs[ltr.seq_id])}\n")
        if not self.hmm_db or not os.path.exists(self.hmm_db):
            if not self.all_ltr:
                logger.warning(
                    "No LTR protein-domain HMM database provided (-hmm_db); "
                    "falling back to -all_ltr behavior (all detected LTRs kept). "
                    "Point -hmm_db at a REXdb-style HMMER3 file to enable "
                    "classification."
                )
                self.all_ltr = True
            return {}
        elements = [
            (ltr.id, ltr.get_int_seq(d_seqs[ltr.seq_id])) for ltr in ltrs
        ]
        # multi-process: classification is the wheat-scale hot spot (1M+
        # Viterbi jobs); shard elements round-robin and exchange the
        # per-rank result dicts (reference farms TEsorter over the grid,
        # RunCmdsMP.py:38-152)
        import jax as _jax

        nproc = _jax.process_count()
        rank = _jax.process_index()
        p1_ckpt = self.int_seqs + f".cls.p1.r{rank}.ckpt"
        p2_ckpt = self.int_seqs + f".cls.p2.r{rank}.ckpt"
        if self.overwrite:
            for p in (p1_ckpt, p2_ckpt):
                if os.path.exists(p):
                    os.remove(p)
        if nproc > 1:
            from subphaser_tpu.parallel.distributed import exchange_blobs

            part = clsmod.classify_elements(
                elements[rank::nproc], self.hmm_db,
                max_evalue=self.max_evalue, checkpoint=p1_ckpt,
            )
            merged = exchange_blobs({rank: pickle.dumps(part)}, nproc)
            d_class = {}
            for r in range(nproc):
                d_class.update(pickle.loads(merged[r]))
            logger.info(
                "Sharded classification: rank %d scored %d/%d elements",
                rank, len(part), len(elements),
            )
        else:
            d_class = clsmod.classify_elements(
                elements, self.hmm_db, max_evalue=self.max_evalue,
                checkpoint=p1_ckpt,
            )
        # pass-2: rescue unclassified elements by similarity to classified
        # ones (reference app.py:417-432 blast equivalent)
        if self.pass2_enabled:
            # the inner-sequence strings (6.6 GB at wheat scale) are dead
            # once pass-1 returns; drop them before materializing the full
            # sequences so the two sets never coexist
            del elements
            full = [(ltr.id, ltr.get_full_seq(d_seqs[ltr.seq_id]))
                    for ltr in ltrs]
            p2 = self.pass2_rule or (80.0, 80.0, 80)
            if nproc > 1:
                import pickle

                from subphaser_tpu.parallel.distributed import exchange_blobs

                before = {eid for eid, c in d_class.items()
                          if c is not None and c.order is not None}
                part2 = clsmod.classify_pass2(
                    full, dict(d_class), min_identity=p2[0] / 100.0,
                    min_coverage=p2[1] / 100.0, min_length=int(p2[2]),
                    shard=(rank, nproc), checkpoint=p2_ckpt,
                )
                delta = {
                    eid: c for eid, c in part2.items()
                    if c is not None and c.order is not None
                    and eid not in before
                }
                merged = exchange_blobs({rank: pickle.dumps(delta)}, nproc)
                for r in range(nproc):
                    d_class.update(pickle.loads(merged[r]))
            else:
                d_class = clsmod.classify_pass2(
                    full, d_class, min_identity=p2[0] / 100.0,
                    min_coverage=p2[1] / 100.0, min_length=int(p2[2]),
                    checkpoint=p2_ckpt,
                )
        self.d_class = d_class
        cls_file = self.int_seqs + ".cls.tsv"
        with open(cls_file, "w") as f:
            clsmod.write_cls_tsv(d_class, f)
        tmp = cls_pkl + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(d_class, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, cls_pkl)
        for p in (p1_ckpt, p2_ckpt):
            if os.path.exists(p):
                os.remove(p)
        logger.info("Wrote classification %s", cls_file)
        return d_class
