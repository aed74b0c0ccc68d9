"""Pipeline driver: split -> count -> filter -> cluster -> map -> enrich ->
LTR -> circos, with checkpoint/resume.

Mirrors the reference Pipeline (reference __main__.py:250-729) step for step,
with the compute path on device and files byte-compatible where the reference
formats are deterministic.
"""

from __future__ import annotations

import os
import shutil
from collections import Counter, OrderedDict

import numpy as np

from subphaser_tpu import config as cfgmod
from subphaser_tpu.io.fasta import xopen
from subphaser_tpu.io.genome import DEFAULT_TILE_BASES, PackedGenome
from subphaser_tpu.ops.filter import make_group_spec
from subphaser_tpu.ops.mapbins import BinAccumulator, nbins_for_tile
from subphaser_tpu.phase import enrich as enrichmod
from subphaser_tpu.phase.cluster import PhaseCluster, SigKmers, write_matrix_file
from subphaser_tpu.phase.features import FeaturePack
from subphaser_tpu.phase.filtering import streaming_filter
from subphaser_tpu.phase.spectrum import count_genome
from subphaser_tpu.utils.checkpoint import Checkpoint
from subphaser_tpu.utils.log import logger, setup_logging
from subphaser_tpu.viz.colors import SGColors

BIN_SIZE = 10000  # fine bin for k-mer mapping (reference __main__.py:485)


class Pipeline:
    def __init__(self, genomes, sg_cfgs, labels=None, **kargs):
        setup_logging()
        self.genomes = genomes
        self.sg_cfgs = sg_cfgs
        defaults = dict(
            no_label=False, sep="|", target=None, sg_assigned=None,
            custom_features=None, prefix=None, outdir="phase-results",
            tmpdir="tmp", colors=None, k=15, min_fold=2.0, min_freq=200,
            baseline=1, ratio=1.0, lower_count=3, min_prop=None,
            max_freq=int(1e9), max_prop=None, by_count=False, re_filter=False,
            nsg=None, replicates=1000, jackknife=50, max_pval=0.05,
            test_method="ttest_ind", figfmt="pdf", just_core=False,
            disable_ltr=False, ltr_detectors=["ltr_harvest"], all_ltr=False,
            hmm_db=None,
            intact_ltr=False, exclude_exchanges=False, non_specific=False,
            mu=13e-9, disable_ltrtree=False, subsample=1000,
            ltr_domains=["INT", "RT", "RH"], tree_method="FastTree",
            disable_circos=False, window_size=1000000, disable_blocks=False,
            min_block=100000, alt_cfgs=None, chr_ordered=None,
            cleanup=False, overwrite=False, heatmap_colors=("green", "black", "red"),
            tile_bases=DEFAULT_TILE_BASES, seed=0, low_mem=None, ncpu=None,
            max_memory=None, aligner="native", aligner_options="-x asm20 -n 10",
            ltr_harvest_options=None, ltr_finder_options=None,
            tesorter_options=None, trimal_options=None, tree_options=None,
            ggtree_options=None, heatmap_options=None, trace=None,
            n_devices=None,
        )
        defaults.update(kargs)
        self.__dict__.update(defaults)

        _check_duplicates(genomes)
        if labels is not None:
            _check_duplicates(labels)

        # genome-file prefix labels (reference __main__.py:262-268)
        if labels is None:
            if len(genomes) == 1 or self.no_label:
                self.labels = [""] * len(genomes)
            else:
                self.labels = [f"{i + 1}-" for i in range(len(genomes))]
        else:
            self.labels = labels
        if self.no_label:
            self.labels = [""] * len(genomes)

        self.sgs, self.chrs, _nsg = cfgmod.parse_configs(
            self.sg_cfgs, self.labels, sep=self.sep
        )
        if self.alt_cfgs:
            self.alt_sgs, _, _ = cfgmod.parse_configs(self.alt_cfgs, None, sep=self.sep)
        else:
            self.alt_sgs = self.sgs
        if not self.nsg or self.nsg < 2:
            self.nsg = _nsg
        self.sg_color = SGColors(self.colors)

        if self.aligner in ("minimap2", "unimap"):
            # reference shells out to minimap2/unimap (__main__.py:699-713);
            # this framework ships its own anchor-chain aligner and bundles
            # no external binaries — fail loudly instead of silently
            # substituting (flag default is "native")
            raise ValueError(
                f"-aligner {self.aligner}: external aligners are not bundled "
                "in subphaser_tpu; use -aligner native (anchor-chain aligner "
                "with PAF output)"
            )
        self._warn_compat_flags()

    def _warn_compat_flags(self):
        self._parse_plot_options()
        self._parse_aligner_options()
        self._parse_tool_options()

    def _parse_plot_options(self):
        """Native analogues for -heatmap_options / -ggtree_options.

        The reference forwards these verbatim to R heatmap.2 and ggtree
        (reference __main__.py:123-127, 200-204; Jellyfish.py:525-603);
        the matplotlib backends honor the sub-flags with direct analogues
        (heatmap.2: scale=, main=, xlab=, labCol=, key=; ggtree:
        branch.length=, layout=) and warn-ignore the rest.
        """
        import re

        self.heatmap_kw: dict = {}
        known = {"scale", "main", "xlab", "labCol", "key"}
        if self.heatmap_options:
            for m in re.finditer(
                r"([A-Za-z._]+)\s*=\s*(\"[^\"]*\"|'[^']*'|[^,]+)",
                self.heatmap_options,
            ):
                kname, val = m.group(1), m.group(2).strip().strip("\"'")
                if kname == "scale":
                    if val in ("row", "column", "none"):
                        self.heatmap_kw["scale"] = val
                    else:
                        logger.warning("-heatmap_options scale=%r: unknown "
                                       "(row/column/none); ignored", val)
                elif kname == "main":
                    self.heatmap_kw["title"] = val
                elif kname == "xlab":
                    if val:
                        self.heatmap_kw["xlab"] = val
                elif kname == "labCol":
                    self.heatmap_kw["lab_col"] = val.upper() in ("T", "TRUE")
                elif kname == "key":
                    self.heatmap_kw["key"] = val.upper() in ("T", "TRUE")
                else:
                    logger.warning(
                        "-heatmap_options %s=%r has no native analogue in "
                        "the matplotlib heatmap (honored: %s); ignored",
                        kname, val, ", ".join(sorted(known)))

        self.tree_branch_lengths = False
        if self.ggtree_options:
            for m in re.finditer(
                r"([A-Za-z._]+)\s*=\s*(\"[^\"]*\"|'[^']*'|[^,]+)",
                self.ggtree_options,
            ):
                kname, val = m.group(1), m.group(2).strip().strip("\"'")
                if kname == "branch.length":
                    self.tree_branch_lengths = val != "none"
                elif kname == "layout":
                    if val != "circular":
                        logger.warning(
                            "-ggtree_options layout=%r: the native tree "
                            "plot is circular-only; ignored", val)
                else:
                    logger.warning(
                        "-ggtree_options %s=%r has no native analogue "
                        "(honored: branch.length, layout); ignored",
                        kname, val)

    def _parse_aligner_options(self):
        """-aligner_options sub-flags with native analogues: minimap2
        ``-n`` (min anchors per chain -> min_chain_anchors) and ``-g``
        (max chain gap -> max_gap); ``-x`` presets and the rest are
        warn-ignored (reference passes the string verbatim to minimap2,
        Blocks.py:42-43)."""
        self.block_min_anchors = 10
        self.block_max_gap = 100_000
        t = (self.aligner_options or "").split()
        i = 0
        while i < len(t):
            tok = t[i]
            if tok == "-n" and i + 1 < len(t):
                self.block_min_anchors = max(int(t[i + 1]), 1)
                i += 2
            elif tok == "-g" and i + 1 < len(t):
                self.block_max_gap = int(t[i + 1])
                i += 2
            elif tok == "-x" and i + 1 < len(t):
                if t[i + 1] != "asm20":
                    logger.warning(
                        "-aligner_options -x %s: the native aligner has no "
                        "presets; ignored", t[i + 1])
                i += 2
            else:
                logger.warning(
                    "-aligner_options %r has no native analogue "
                    "(honored: -n, -g); ignored", tok)
                i += 1

    def _parse_tool_options(self):
        """Honor the sub-flags of -tesorter_options / -trimal_options /
        -tree_options that have native analogues; warn-ignore the rest.

        Reference forwards these verbatim to the external tools
        (reference __main__.py:146-227); the native backends expose the
        same knobs: TEsorter -eval/--max-evalue -> E-value gate
        (api/TEsorter/app.py:93-95), -rule/--pass2-rule id-cov-len ->
        pass-2 gates (app.py:118-120), -nodp2 disables pass-2; trimal -gt X
        -> column trim threshold; FastTree/iqtree -b/-B N -> bootstrap
        replicate count.
        """
        self.max_evalue = 1e-3
        self.pass2_rule = (80.0, 80.0, 80)
        self.pass2_enabled = True
        self.trim_gt = None
        self.tree_boot = 1000 if self.tree_method == "iqtree" else 100

        def toks(s):
            return (s or "").split()

        known_defaults = {"-db", "rexdb", "-dp2"}
        t = toks(self.tesorter_options)
        i = 0
        while i < len(t):
            tok = t[i]
            if tok in ("-eval", "--max-evalue") and i + 1 < len(t):
                self.max_evalue = float(t[i + 1])
                i += 2
            elif tok in ("-rule", "--pass2-rule") and i + 1 < len(t):
                parts = t[i + 1].split("-")
                self.pass2_rule = (float(parts[0]), float(parts[1]),
                                   int(parts[2]))
                i += 2
            elif tok in ("-nodp2", "--no-pass2"):
                self.pass2_enabled = False
                i += 1
            elif tok == "-dp2":
                self.pass2_enabled = True
                i += 1
            elif tok == "-db" and i + 1 < len(t):
                if t[i + 1] != "rexdb":
                    logger.warning(
                        "-tesorter_options -db %s: only the -hmm_db path "
                        "selects the database here; ignored", t[i + 1])
                i += 2
            else:
                if tok not in known_defaults:
                    logger.warning(
                        "-tesorter_options %r has no native analogue; "
                        "ignored", tok)
                i += 1

        t = toks(self.trimal_options)
        i = 0
        while i < len(t):
            if t[i] == "-gt" and i + 1 < len(t):
                self.trim_gt = float(t[i + 1])
                i += 2
            elif t[i] == "-automated1":
                i += 1  # the default trim heuristic plays this role
            else:
                logger.warning(
                    "-trimal_options %r has no native analogue; ignored",
                    t[i])
                i += 1

        t = toks(self.tree_options)
        i = 0
        while i < len(t):
            if t[i] in ("-b", "-B", "--boot") and i + 1 < len(t):
                self.tree_boot = int(t[i + 1])
                i += 2
            else:
                logger.warning(
                    "-tree_options %r has no native analogue; ignored", t[i])
                i += 1

    # ------------------------------------------------------------------
    def run(self):
        from subphaser_tpu.utils.profiling import trace

        with trace(self.trace):
            return self._run()

    def _run(self):
        from subphaser_tpu.utils.compcache import enable_compilation_cache

        enable_compilation_cache()
        self.outdir = os.path.realpath(self.outdir)
        self.tmpdir = os.path.realpath(self.tmpdir)
        os.makedirs(self.outdir, exist_ok=True)
        os.makedirs(self.tmpdir, exist_ok=True)
        out_prefix = (self.prefix or "") if self.prefix else ""
        self.ckp = Checkpoint(self.tmpdir)
        if self.overwrite:
            for f in os.listdir(self.tmpdir):
                if f.endswith((".ok.json", ".ok.npz")):
                    os.remove(os.path.join(self.tmpdir, f))

        if not 1 <= self.k <= 31:
            raise ValueError(
                f"k={self.k} unsupported: codes are int32 for k <= 15 and "
                "(hi, lo) int32 pairs for 16 <= k <= 31"
            )
        logger.info("Target chromosomes: %s", self.chrs)
        genome, labels = self._load_genome()
        self.genome = genome
        self.chrom_labels = labels
        self.sgs = cfgmod.update_sgs(self.sgs, self.targets, self.sep)
        self.alt_sgs = cfgmod.update_sgs(self.alt_sgs, self.targets, self.sep)
        self.d_assigned = cfgmod.parse_assigned(self.sg_assigned, self.targets)
        self.chr_order = cfgmod.parse_ordered(self.chr_ordered, self.targets)
        logger.info("Chromosomes: %s", labels)
        logger.info("Chromosome Number: %d", len(labels))
        logger.info("CONFIG: %s", self.sgs)
        genome_size = genome.total_bases()
        logger.info("Genome size: %s bp", f"{genome_size:,}")
        # Device merge budget (entries). The HBM can hold far more than the
        # host link can absorb: a spill transfers the whole padded spectrum
        # through the tunnel, so budgets must stay large enough that only
        # chromosomes beyond ~budget bases ever spill.
        # budget policy is shared with the compile warm-up thread so its
        # shape predictions match production exactly (phase/warmup.py):
        # reference auto-low-memory above 3 Gb (__main__.py:395-398),
        # -max_memory caps the device merge budget (codes int32 + counts
        # int64 per spilled entry)
        from subphaser_tpu.phase.warmup import plan_budgets

        max_mem_bytes = _parse_mem(self.max_memory)
        if max_mem_bytes and self.low_mem is None and genome_size * 3 > max_mem_bytes:
            logger.info(
                "-max_memory %s < ~3x genome size; enabling low-memory mode",
                self.max_memory,
            )
        self.tile_bases, device_budget, low_mem_eff, batch_tiles = plan_budgets(
            genome_size, self.tile_bases, self.low_mem, self.max_memory
        )
        if low_mem_eff:
            self.low_mem = True
            logger.info("Low-memory mode: tile=%d, device_budget=%d",
                        self.tile_bases, device_budget)
        if max_mem_bytes and device_budget < (1 << 27 if low_mem_eff else 1 << 28):
            logger.info("-max_memory %s: device_budget=%d entries",
                        self.max_memory, device_budget)

        # multi-device: data-parallel 1-D mesh over every addressable chip
        # (the reference's process/grid axis, RunCmdsMP.py:38-217, mapped to
        # ICI collectives; host float64 decisions downstream are unchanged)
        import jax as _jax

        self.mesh = None
        devs = _jax.devices()
        want = self.n_devices if self.n_devices else len(devs)
        if _jax.process_count() > 1:
            # multi-PROCESS runs distribute by chromosome inside
            # count_genome (parallel/distributed) instead of a global
            # device mesh: host-local device_put cannot feed a mesh that
            # spans other processes' devices
            want = 1
            logger.info(
                "Multi-process run (%d processes): chromosome-sharded "
                "counting, replicated downstream steps",
                _jax.process_count(),
            )
        if want > 1 and len(devs) > 1:
            from jax.sharding import Mesh as _Mesh

            devs = devs[: min(want, len(devs))]
            self.mesh = _Mesh(np.array(devs), ("data",))
            logger.info(
                "Using %d devices (data-parallel mesh) for counting/mapping",
                len(devs),
            )

        logger.info("###Step: Kmer Count")
        # batch_tiles (from plan_budgets): batching tiles per device call
        # costs one big extra compile (~minutes through the remote tunnel)
        # but removes thousands of dispatches on pod-scale genomes
        spectra = count_genome(
            genome, self.k, lower_count=self.lower_count,
            tile_bases=self.tile_bases, device_budget=device_budget,
            batch_tiles=batch_tiles, checkpoint=self.ckp,
            mesh=self.mesh,
        )

        # differential filter
        self.basename = f"k{self.k}_q{self.min_freq}_f{_num(self.min_fold)}"
        self.para_prefix = os.path.join(self.outdir, out_prefix + self.basename)
        tot_lens = float(sum(s.total for s in spectra))
        min_freq = self.min_prop * tot_lens if self.min_prop is not None else self.min_freq
        max_freq = self.max_prop * tot_lens if self.max_prop is not None else self.max_freq
        if self.min_prop is not None:
            logger.info("Adjust `min_freq` to %s according to `min_prop`", min_freq)
        if max_freq < min_freq:
            raise ValueError(f"`min_freq` ({min_freq}) should be lower than `max_freq` ({max_freq})")
        gi = cfgmod.group_indices(self.sgs, labels)
        spec = make_group_spec(gi, len(labels))
        logger.info("Filtering differential kmers")
        res = streaming_filter(
            spectra, spec,
            min_freq=min_freq, max_freq=max_freq, min_fold=self.min_fold,
            ratio=self.ratio, baseline=self.baseline, by_count=self.by_count,
        )
        if res.n_differential == 0:
            raise ValueError("0 kmer remained after filtering. Please reset the filter options.")
        matfile = self.para_prefix + ".kmer.mat"
        with xopen(matfile, "wt") as f:
            write_matrix_file(res.matrix, self.k, f)
        logger.info("Wrote %s", matfile)
        try:
            from subphaser_tpu.viz.plots import plot_histogram

            histfig = self.para_prefix + ".kmer_freq." + self.figfmt
            plot_histogram(res.fold_tots, histfig)
        except Exception as e:  # plotting must never kill the pipeline
            logger.warning("Histogram plot failed: %s", e)

        # cluster
        logger.info("###Step: Cluster")
        cluster = PhaseCluster(
            res.matrix, n_clusters=self.nsg, sg_assigned=self.d_assigned,
            replicates=self.replicates, jackknife=self.jackknife, seed=self.seed,
        )
        self.cluster = cluster
        self.d_sg = cluster.d_sg
        self.sg_names = cluster.sg_names
        logger.info("Subgenome assignments: %s", dict(cluster.d_sg))
        sg_chrs = self.para_prefix + ".chrom-subgenome.tsv"
        with open(sg_chrs, "w") as f:
            cluster.output_subgenomes(f)
        logger.info("Wrote %s", sg_chrs)

        sg_kmers = self.para_prefix + ".sig.kmer-subgenome.tsv"
        with open(sg_kmers, "w") as f:
            sig = cluster.output_kmers(
                f, self.k, max_pval=self.max_pval, test_method=self.test_method
            )
        logger.info("Wrote %s", sg_kmers)

        if (not self.just_core and self.k <= 15
                and self._map_use_dense(sig) and self.mesh is None):
            # compile the big mapping program WHILE figures render: the
            # remote first-compile otherwise serializes in front of the
            # mapping loop (phase/warmup.py rationale). Mesh runs skip it:
            # they dispatch a data-sharded program with a rounded-up batch,
            # so the single-device warm program would never match.
            from subphaser_tpu.phase.warmup import pad_sig_pow2, start_map_warmup

            codes_p, sgs_p = pad_sig_pow2(sig.codes, sig.sg)
            self._map_warm = start_map_warmup(
                codes_p, sgs_p, self.k, self.tile_bases,
                self._map_batch(), len(self.sg_names),
                nbins_for_tile(self.tile_bases, BIN_SIZE), BIN_SIZE,
                aligned16=BIN_SIZE % 16 == 0 and self.tile_bases % 16 == 0,
            )

        self._plot_core_figures(res, cluster, sig)

        if self.just_core:
            self._final()
            logger.info("Pipeline completed early")
            return self

        # map significant k-mers onto genome bins
        sg_map = self.para_prefix + ".subgenome.bin.count"
        acc = self._map_genome_bins(sig)
        sizes = [c.length for c in genome.chroms]
        with open(sg_map, "w") as f:
            enrichmod.write_bin_counts(f, acc.per_chrom, labels, sizes, BIN_SIZE, self.sg_names)
        logger.info("Wrote %s", sg_map)

        # window enrichment
        logger.info("Enriching subgenome by chromosome window (size: %d)", self.window_size)
        rownames, counts = enrichmod.stack_windows(
            acc.per_chrom, labels, BIN_SIZE, self.window_size
        )
        bin_enrich = self.para_prefix + ".bin.enrich"
        bin_group = self.para_prefix + ".bin.group"
        with open(bin_enrich, "w") as f, open(bin_group, "w") as f2:
            self.sg_lines = enrichmod.enrich_bin(
                f, f2, self.d_sg, counts, self.sg_names, rownames, max_pval=self.max_pval
            )
        logger.info("Output: %s", bin_enrich)

        # custom features
        if self.custom_features:
            self._step_custom(sig)

        # LTR
        ltr_bedlines, enrich_ltr_bedlines = ([], [])
        if not self.disable_ltr:
            try:
                ltr_bedlines, enrich_ltr_bedlines = self._step_ltr(sig)
            except NotImplementedError:
                logger.warning("LTR subsystem not available yet; skipping")

        # circos
        if not self.disable_circos:
            try:
                self._step_circos(acc, ltr_bedlines, enrich_ltr_bedlines)
            except NotImplementedError:
                logger.warning("Circos rendering not available yet; skipping")

        self._final()
        logger.info("Pipeline completed")
        return self

    # ------------------------------------------------------------------
    def _load_genome(self) -> tuple[PackedGenome, list[str]]:
        self.targets = cfgmod.parse_idmap(self.target) or cfgmod.build_targets(
            self.chrs, self.sep
        )
        params = {
            "files": [(g, os.path.getsize(g), os.path.getmtime(g)) for g in self.genomes],
            "targets": list(self.targets.items()),
            "prefixes": self.labels,
        }
        cache = os.path.join(self.tmpdir, "genome.packed.npz")
        if self.ckp.has("genome.packed", params) and os.path.exists(cache):
            genome = PackedGenome.load(cache)
            logger.info("Loaded packed genome checkpoint (%d chromosomes)", len(genome))
            # resume-at-counting: the genome checkpoint short-circuits
            # packing, but if any spectrum is missing the counting programs
            # still need their multi-minute remote first-compile — start
            # the warm-up now so it overlaps the (~1 min/10 Gb) npz load
            # already behind us plus config/figure host work ahead
            # existence heuristic only (a stale-digest checkpoint still
            # recounts; the worst case is one wasted warm-up compile)
            if not all(
                os.path.exists(os.path.join(
                    self.tmpdir, f"spectrum.{name}.ok.json"))
                for name in self.targets.values()
            ):
                from subphaser_tpu.phase.warmup import start_count_warmup

                start_count_warmup(
                    self.genomes, self.labels, self.targets, self.k,
                    self.tile_bases, self.low_mem, self.max_memory,
                    self.lower_count,
                )
        else:
            # compile the big counting programs WHILE the host packs: the
            # remote first-compile (~minutes) hides behind the FASTA parse
            from subphaser_tpu.phase.warmup import start_count_warmup

            start_count_warmup(
                self.genomes, self.labels, self.targets, self.k,
                self.tile_bases, self.low_mem, self.max_memory,
                self.lower_count,
            )
            genome, got = PackedGenome.from_fasta_files(
                self.genomes, self.labels, self.targets, workers=self.ncpu
            )
            missing = set(self.targets) - set(got)
            if missing:
                logger.error("Chromosomes %s are not found in sequences files", missing)
            genome.save(cache)
            self.ckp.save("genome.packed", params)
        # order chromosomes by config/targets order (reference sort_labels)
        order = {name: i for i, name in enumerate(self.targets.values())}
        genome.chroms.sort(key=lambda c: order.get(c.name, 1 << 30))
        if len(genome) == 0:
            raise ValueError("0 chromosome remained after filtering. Please check the inputs.")
        return genome, genome.names

    def _map_use_dense(self, sig=None) -> bool:
        # membership via dense 4^k int8 table only pays off when the
        # genome is large enough to amortize building it (1 GiB at k=15);
        # the sg+1 int8 value caps n_sg at 126 — beyond that the
        # searchsorted path takes over
        if len(self.sg_names) > 126:
            return False
        return self.genome.total_bases() >= 50_000_000

    def _map_batch(self) -> int:
        return 4 if self.genome.total_bases() > 1e9 else 1

    def _map_genome_bins(self, sig: SigKmers) -> BinAccumulator:
        logger.info("Mapping %d subgenome-specific kmers to genome bins", len(sig) // 2)
        n_sg = len(self.sg_names)
        from subphaser_tpu.utils.profiling import Throughput

        meter = Throughput("kmer mapping", unit="Mbp").start()
        if self.k > 15:
            from subphaser_tpu.ops.mapbins_pair import map_genome_bins_pair

            acc = map_genome_bins_pair(
                self.genome, sig.codes, sig.sg, self.k,
                self.tile_bases, BIN_SIZE, n_sg,
            )
            meter.stop(self.genome.total_bases() / 1e6)
            meter.log()
            total = max(len(sig), 1)
            logger.info(
                "Mapped %d kmer hits; %.2f%% of %d subgenome-specific kmers mapped",
                acc.mapped_positions, 100.0 * acc.mapped_kmer_count / total,
                total // 2,
            )
            return acc
        sizes = [c.length for c in self.genome.chroms]
        acc = BinAccumulator(sizes, BIN_SIZE, n_sg)
        nbt = nbins_for_tile(self.tile_bases, BIN_SIZE)
        # pow2-pad the significant-kmer arrays: the map program's shape then
        # depends only on the bucket, not the exact sig count, so one
        # compiled program serves any run (a fresh remote compile per exact
        # m costs ~a minute through the tunnel)
        from subphaser_tpu.phase.warmup import join_map_warmup, pad_sig_pow2

        codes, sgs = pad_sig_pow2(sig.codes, sig.sg)
        n_pos_words = self.tile_bases // 16
        # membership: measured on chip, vectorized searchsorted runs at only
        # ~8 M lookups/s while a direct gather from a dense 4^k table does
        # ~67 M/s — build the (4^k x int32) table when the genome is large
        # enough to amortize its cost (4 GB at k=15)
        use_dense = self._map_use_dense(sig)
        if use_dense:
            from subphaser_tpu.ops.mapbins_dense import (
                build_sig_table,
                map_tiles_batch_dense,
            )

            # the warm-up thread (launched while figures rendered) built
            # the real table already and pre-compiled the map program
            table = join_map_warmup(getattr(self, "_map_warm", None))
            if table is None:
                table = build_sig_table(codes, sgs, self.k)
        else:
            from subphaser_tpu.ops.mapbins import map_tiles_batch
        # tile starts are multiples of the pow2 tile size, so when the bin
        # size is 16-divisible every word-column lands in one bin and the
        # column-sum bin counter applies (ops/mapbins.bin_counts_colsum)
        aligned16 = BIN_SIZE % 16 == 0 and self.tile_bases % 16 == 0
        batch = self._map_batch()
        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            # data-shard the tile batch across the mesh; the membership
            # table/codes stay replicated, so GSPMD partitions the batch
            # axis with no collectives
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            n_dev = mesh.shape["data"]
            batch = max(batch, n_dev)
            batch -= batch % n_dev
            shard_w = NamedSharding(mesh, P("data", None))
            shard_s = NamedSharding(mesh, P("data"))

        # per-chromosome mapping checkpoints (reference checkpoints sg_map
        # after mapping, __main__.py:478-487; here the granularity is one
        # chromosome so a crash mid-mapping resumes without recompute).
        # Params carry a digest of the significant-kmer set: changed filter
        # output invalidates stale bins.
        import hashlib as _hashlib

        from subphaser_tpu.ops.mapbins import HitSet

        sig_digest = _hashlib.sha256(
            np.asarray(sig.codes).tobytes() + np.asarray(sig.sg).tobytes()
        ).hexdigest()[:16]
        # fmt 8: the dense path's distinct-hit payload stores hit CODES
        # (int8 sg table); the searchsorted path stores sig indices —
        # old/mismatched checkpoints must not resume
        map_params = {"k": self.k, "bin": BIN_SIZE, "nsg": n_sg,
                      "tile": self.tile_bases, "sig": sig_digest,
                      "fmt": 8 if use_dense else 1}
        labels = self.chrom_labels
        # multi-process: each rank maps only the chromosomes it owns and
        # the per-chromosome (bins, hits) payloads are exchanged afterwards
        # (reference farms sg_map chunks over the grid, RunCmdsMP.py:38-152)
        import jax as _jax

        nproc = _jax.process_count()
        owned = None
        chrom_snaps: dict[int, np.ndarray] = {}
        if nproc > 1:
            from subphaser_tpu.parallel.distributed import owns_chrom

            owned = {ci for ci in range(len(labels)) if owns_chrom(ci)}
            logger.info(
                "Sharded mapping: rank %d owns %d/%d chromosomes",
                _jax.process_index(), len(owned), len(labels),
            )
        done: set[int] = set()
        for ci, label in enumerate(labels):
            if owned is not None and ci not in owned:
                done.add(ci)  # arrives via the post-loop exchange
                continue
            name = f"map_bins_{label}"
            if self.ckp.has(name, map_params):
                payload = self.ckp.load(name)
                bins = payload.get("bins")
                if bins is None or bins.shape != acc.per_chrom[ci].shape:
                    continue
                acc.per_chrom[ci] = bins.astype(np.int64)
                acc.mapped_positions += int(bins.sum())
                hits = payload.get("hits")
                if hits is not None and hits.size:
                    acc.add(ci, np.zeros((0, n_sg), np.int64), 0, hits)
                chrom_snaps[ci] = hits if hits is not None else np.zeros(0, np.int32)
                done.add(ci)
        n_resumed = len(done) - (len(labels) - len(owned) if owned else 0)
        if n_resumed:
            logger.info("Resumed mapping from checkpoint for %d/%d chromosomes",
                        n_resumed, len(owned) if owned else len(labels))

        # dispatch-ahead window: jax dispatch is async, so keeping a few
        # batches in flight overlaps device compute with the host-side
        # stack/upload of the next batch (the same overlap the counting
        # loop uses; the per-batch np.asarray sync otherwise serializes).
        # Batches never span chromosomes so each chromosome's distinct hits
        # checkpoint exactly when its last batch collects.
        from collections import deque as _deque

        map_window: _deque = _deque()
        chrom_hits: dict[int, HitSet] = {}
        chrom_pending: dict[int, int] = {}
        # the snapshot download (distinct hit list, potentially tens of MB
        # through the tunnel) runs on a worker thread so it overlaps the
        # next chromosome's dispatches; the semaphore bounds in-flight
        # downloads, the lock serializes HitSet mutation on the shared acc
        import threading as _threading

        finish_threads: list = []
        finish_sem = _threading.Semaphore(2)
        hits_lock = _threading.Lock()

        def _finish_chrom(ci: int) -> None:
            hs = chrom_hits.pop(ci)

            def _work():
                try:
                    snap = hs.snapshot()
                    with hits_lock:
                        acc.add(ci, np.zeros((0, n_sg), np.int64), 0, snap)
                        chrom_snaps[ci] = snap
                    self.ckp.save(f"map_bins_{labels[ci]}", map_params,
                                  bins=acc.per_chrom[ci], hits=snap)
                finally:
                    finish_sem.release()

            finish_sem.acquire()
            t = _threading.Thread(target=_work, daemon=True,
                                  name=f"map-ckpt-{labels[ci]}")
            t.start()
            finish_threads.append(t)

        def _collect_map():
            ci, bt_w, bcs_w, hm_w = map_window.popleft()
            bcs_np = np.asarray(bcs_w)
            for i, t in enumerate(bt_w):
                acc.add(t.chrom_index, bcs_np[i], t.start // BIN_SIZE, None)
            chrom_hits.setdefault(ci, HitSet()).add(hm_w)
            chrom_pending[ci] -= 1
            if chrom_pending[ci] == 0:
                _finish_chrom(ci)

        all_tiles = [
            t for t in self.genome.tiles(self.k, tile_bases=self.tile_bases)
            if t.chrom_index not in done
        ]
        from itertools import groupby as _groupby

        chrom_tiles = [
            (ci, list(ts))
            for ci, ts in _groupby(all_tiles, key=lambda t: t.chrom_index)
        ]
        for ci, tiles in chrom_tiles:
            chrom_pending[ci] = -(-len(tiles) // batch)
        for ci, tiles in chrom_tiles:
            for lo in range(0, len(tiles), batch):
                bt = tiles[lo : lo + batch]
                words = np.stack([t.words for t in bt])
                vwords = np.stack([t.vwords for t in bt])
                starts = np.array([t.start for t in bt], dtype=np.int32)
                if len(bt) < batch:
                    pad = batch - len(bt)
                    words = np.concatenate([words, np.zeros((pad,) + words.shape[1:], words.dtype)])
                    vwords = np.concatenate([vwords, np.zeros((pad,) + vwords.shape[1:], vwords.dtype)])
                    starts = np.concatenate([starts, np.zeros(pad, np.int32)])
                if mesh is not None:
                    import jax as _jax

                    words = _jax.device_put(words, shard_w)
                    vwords = _jax.device_put(vwords, shard_w)
                    starts = _jax.device_put(starts, shard_s)
                if use_dense:
                    if batch > 1:
                        w_in, v_in, s_in = words, vwords, starts
                    else:
                        w_in, v_in, s_in = words[0], vwords[0], np.int32(starts[0])
                    bcs, hitmask = map_tiles_batch_dense(
                        w_in, v_in, table, sgs, s_in,
                        k=self.k, n_pos_words=n_pos_words, bin_size=BIN_SIZE,
                        n_sg=n_sg, nbins_tile=nbt, aligned16=aligned16,
                    )
                else:
                    bcs, hitmask = map_tiles_batch(
                        words, vwords, codes, sgs, starts,
                        k=self.k, n_pos_words=n_pos_words, bin_size=BIN_SIZE,
                        n_sg=n_sg, nbins_tile=nbt, aligned16=aligned16,
                    )
                map_window.append((ci, bt, bcs, hitmask))
                while len(map_window) > 2:
                    _collect_map()
        while map_window:
            _collect_map()
        for t in finish_threads:
            t.join()
        if owned is not None:
            # one payload collective completes every rank's accumulator
            # with the chromosomes other ranks mapped (byte-identical to a
            # single-process run: bins and hit lists are deterministic)
            from subphaser_tpu.parallel.distributed import exchange_arrays

            payload = {
                ci: {"bins": acc.per_chrom[ci],
                     "hits": chrom_snaps.get(ci, np.zeros(0, np.int32))}
                for ci in sorted(owned)
            }
            merged = exchange_arrays(payload, len(labels))
            for ci, d in merged.items():
                if ci in owned:
                    continue
                acc.per_chrom[ci] = d["bins"].astype(np.int64)
                acc.mapped_positions += int(d["bins"].sum())
                if d["hits"].size:
                    acc.add(ci, np.zeros((0, n_sg), np.int64), 0,
                            d["hits"].astype(np.int32))
        meter.stop(self.genome.total_bases() / 1e6)
        meter.log()
        total = max(len(sig), 1)
        logger.info(
            "Mapped %d kmer hits; %.2f%% of %d subgenome-specific kmers mapped",
            acc.mapped_positions, 100.0 * acc.mapped_kmer_count / total, total // 2,
        )
        return acc

    def _step_custom(self, sig: SigKmers):
        from subphaser_tpu.io.fasta import iter_fasta

        logger.info("Mapping subgenome-specific kmers to custom features: %s",
                    self.custom_features)
        records = []
        for path in self.custom_features:
            for rid, _d, seq in iter_fasta(path):
                records.append((rid, seq.tobytes().decode()))
        pack = FeaturePack.build(records, self.k)
        counts = pack.map_counts(sig, self.k)
        lens = {name: len(seq) for name, seq in records}
        feat_map = self.para_prefix + ".custom.bin.count"
        with open(feat_map, "w") as f:
            f.write("\t".join(["#chrom", "start", "end"] + self.sg_names) + "\n")
            for name, row in zip(pack.names, counts):
                if row.sum() == 0:
                    continue  # only mapped features are output (reference)
                f.write(f"{name}\t0\t{min(10000000, lens[name])}\t"
                        + "\t".join(str(int(v)) for v in row) + "\n")
        keep = counts.sum(axis=1) > 0
        feat_enrich = self.para_prefix + ".custom.enrich"
        with open(feat_enrich, "w") as f:
            d_enriched, _ = enrichmod.enrich_features(
                f, self.d_sg, counts[keep],
                self.sg_names, [n for n, k_ in zip(pack.names, keep) if k_],
                max_pval=self.max_pval,
            )
        logger.info("Output: %s", feat_enrich)
        logger.info("%d significant subgenome-specific features", len(d_enriched))
        for sg, count in sorted(Counter(d_enriched.values()).items()):
            logger.info("\t%d %s-specific features", count, sg)

    def _step_ltr(self, sig: SigKmers):
        """LTR detection, SG enrichment, insertion-age plots, trees.

        Mirrors reference Pipeline.step_ltr (__main__.py:549-648).
        """
        from subphaser_tpu.ltr.age import plot_insert_age
        from subphaser_tpu.ltr.pipeline import LTRPipeline

        logger.info("###Step: LTR")
        ltr_tmp = os.path.join(self.tmpdir, "LTR")
        lpipe = LTRPipeline(
            self.genome,
            tmpdir=ltr_tmp,
            harvest_options=self.ltr_harvest_options,
            finder_options=self.ltr_finder_options,
            detectors=self.ltr_detectors,
            hmm_db=getattr(self, "hmm_db", None),
            all_ltr=self.all_ltr,
            intact_ltr=self.intact_ltr,
            mu=self.mu,
            overwrite=self.overwrite,
            max_evalue=self.max_evalue,
            pass2_rule=self.pass2_rule if self.pass2_enabled else None,
            pass2_enabled=self.pass2_enabled,
        )
        ltrs, ltr_fa = lpipe.run()
        if not ltrs:
            logger.warning("No LTR-RTs detected; skipping LTR analyses")
            return [], []

        # map SG-specific k-mers onto LTR sequences (reference __main__.py:567-578)
        # reuse the decoded sequences LTRPipeline already built (a second
        # full-genome decode would double peak host memory on Gb genomes)
        d_seqs = getattr(lpipe, "d_seqs", None) or {
            c.name: c.to_seq() for c in self.genome.chroms
        }
        records = [(ltr.id, ltr.get_full_seq(d_seqs[ltr.seq_id])) for ltr in ltrs]
        pack = FeaturePack.build(records, self.k)
        counts = pack.map_counts(sig, self.k)
        lens = {name: len(seq) for name, seq in records}
        ltr_map = self.para_prefix + ".ltr.bin.count"
        with open(ltr_map, "w") as f:
            f.write("\t".join(["#chrom", "start", "end"] + self.sg_names) + "\n")
            for name, row in zip(pack.names, counts):
                if row.sum() == 0:
                    continue  # only mapped LTRs are output (reference)
                f.write(
                    f"{name}\t0\t{min(10000000, lens[name])}\t"
                    + "\t".join(str(int(v)) for v in row) + "\n"
                )
        logger.info("Wrote %s", ltr_map)

        logger.info("Enriching subgenome-specific LTR-RTs")
        keep = counts.sum(axis=1) > 0
        ltr_enrich = self.para_prefix + ".ltr.enrich"
        with open(ltr_enrich, "w") as f:
            d_enriched, d_exchange = enrichmod.enrich_features(
                f, self.d_sg, counts[keep],
                self.sg_names, [n for n, k_ in zip(pack.names, keep) if k_],
                max_pval=self.max_pval,
            )
        logger.info("Output: %s", ltr_enrich)
        logger.info("%d significant subgenome-specific LTR-RTs", len(d_enriched))
        for sg, count in sorted(Counter(d_enriched.values()).items()):
            logger.info("\t%d %s-specific LTR-RTs", count, sg)

        d_colors = self.sg_color.for_names(self.sg_names)
        enrich_ltrs = []
        if d_enriched:
            prefix = self.para_prefix + ".ltr.insert"
            enrich_ltrs = plot_insert_age(
                ltrs, d_enriched, prefix,
                mu=self.mu, exclude_exchanges=self.exclude_exchanges,
                d_exchange=d_exchange, non_specific=self.non_specific,
                figfmt=self.figfmt, d_colors=d_colors,
            )
        else:
            logger.warning(
                "Because of none subgenome-specific LTR-RTs, plots of LTR-RTs "
                "are skipped."
            )

        if not self.disable_ltrtree and enrich_ltrs:
            try:
                from subphaser_tpu.ltr.tree import build_ltr_trees

                build_ltr_trees(
                    enrich_ltrs, d_seqs, self.para_prefix,
                    domains=self.ltr_domains, subsample=self.subsample,
                    exclude_exchanges=self.exclude_exchanges,
                    d_colors=d_colors, figfmt=self.figfmt,
                    d_class=getattr(lpipe, "d_class", None),
                    trim_gt=self.trim_gt, n_boot=self.tree_boot,
                    use_branch_lengths=self.tree_branch_lengths,
                )
            except Exception as e:
                logger.warning("LTR tree step failed: %s", e)

        ltr_bedlines = [ltr.to_bed() for ltr in ltrs]
        d_bed = {}
        for ltr in enrich_ltrs:
            d_bed.setdefault(ltr.sg, []).append(ltr.to_bed())
        enrich_ltr_bedlines = [v for _k, v in sorted(d_bed.items()) if v]
        return ltr_bedlines, enrich_ltr_bedlines

    def _step_circos(self, acc, ltr_bedlines, enrich_ltr_bedlines):
        """Homoeologous blocks + multi-ring circos figure.

        Mirrors reference Pipeline.step_circos/step_blocks
        (__main__.py:679-713).
        """
        from subphaser_tpu.viz.circos import circos_plot

        logger.info("###Step: Circos")
        pafs = []
        if not self.disable_blocks:
            from subphaser_tpu.blocks.align import run_align

            blocks_dir = os.path.join(self.tmpdir, "Blocks")
            pafs, _offsets = run_align(
                self.alt_sgs, self.genome, blocks_dir,
                min_block=self.min_block, k=min(self.k, 15),
                min_anchors=self.block_min_anchors,
                max_gap=self.block_max_gap,
            )

        names = self.chrom_labels
        if self.chr_order:
            names = [c for c in self.chr_order if c in set(self.chrom_labels)]
        chrom_sizes = {n: self.genome.chrom(n).length for n in names}
        d_colors = self.sg_color.for_names(self.sg_names)
        bin_counts = {
            n: acc.per_chrom[self.chrom_labels.index(n)] for n in names
        }
        outfig = self.para_prefix + ".circos." + self.figfmt
        legend = self.para_prefix + ".circos.legend.txt"
        circos_plot(
            chrom_sizes, self.d_sg, self.sg_names, d_colors,
            bin_counts, BIN_SIZE, self.window_size, outfig,
            enrich_lines=getattr(self, "sg_lines", None),
            ltr_bedlines=ltr_bedlines,
            enrich_ltr_bedlines=enrich_ltr_bedlines,
            pafs=pafs, min_block=self.min_block, legend_file=legend,
        )
        logger.info("Wrote %s", outfig)

    def _plot_core_figures(self, res, cluster: PhaseCluster, sig: SigKmers):
        d_colors = self.sg_color.for_names(self.sg_names)
        try:
            from subphaser_tpu.viz.plots import plot_heatmap, plot_pca

            # per-kmer SG for heatmap column colors
            kmer_sg = np.full(res.matrix.codes.size, -1, dtype=np.int64)
            idx = np.searchsorted(res.matrix.codes, sig.canon_codes)
            kmer_sg[idx] = sig.canon_sg
            heatfig = self.para_prefix + ".kmer.mat." + self.figfmt
            plot_heatmap(
                res.matrix.freqs, self.chrom_labels, self.d_sg, kmer_sg,
                self.sg_names, d_colors, heatfig,
                **self.heatmap_kw,
            )
            scores, ratio = cluster.pca(n_components=max(2, self.nsg))
            pcafig = self.para_prefix + ".kmer_pca." + self.figfmt
            plot_pca(scores, ratio, self.chrom_labels, self.d_sg, d_colors, pcafig)
            logger.info("Wrote figures %s, %s", heatfig, pcafig)
        except Exception as e:
            logger.warning("Core figures failed: %s", e)

    def _final(self):
        if self.cleanup:
            logger.info("Cleaning %s", self.tmpdir)
            shutil.rmtree(self.tmpdir, ignore_errors=True)


def _check_duplicates(lst):
    if not lst:
        return
    dup = {v: c for v, c in Counter(lst).items() if c > 1}
    if dup:
        raise ValueError(f"Duplicates detected: {dup}")


def _parse_mem(spec) -> int | None:
    """warmup.parse_mem with a friendly -max_memory error (single parser —
    plan_budgets consumes the same string via warmup.parse_mem)."""
    from subphaser_tpu.phase.warmup import parse_mem

    try:
        return parse_mem(spec)
    except ValueError:
        raise ValueError(f"Cannot parse -max_memory value {spec!r}") from None


def _num(x: float):
    """2.0 -> 2 in file basenames (argparse float defaults)."""
    return int(x) if float(x).is_integer() else x
