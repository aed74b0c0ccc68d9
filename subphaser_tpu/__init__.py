"""SubPhaser-TPU: TPU-native subgenome phasing for allopolyploid genomes.

A ground-up JAX/XLA/Pallas re-design of the SubPhaser pipeline
(reference: zhangrengang/SubPhaser). The reference orchestrates external
CPU binaries (jellyfish, LTRharvest, minimap2, circos, R); this framework
replaces the compute path with on-device TPU kernels:

- k-mer counting: 2-bit packed sequence tiles -> Pallas canonical-code
  kernel -> XLA sort + run-length-encode (replaces jellyfish,
  reference Jellyfish.py:671-704)
- differential k-mer filter: vectorized fold/frequency gates
  (reference Jellyfish.py:462-512,611-648)
- phasing: jit-compiled k-means + vmapped bootstrap + PCA
  (reference Cluster.py:17-143)
- significance: batched t/rank tests, one-sided Fisher exact,
  BH-FDR (reference Cluster.py:151-194, Stats.py:9-199)
- window enrichment + exchange detection (reference Stats.py:75-138)
- multi-chip scaling via jax.sharding.Mesh + shard_map with psum
  merges of partial count matrices (replaces per-process file merges,
  reference RunCmdsMP.py / Jellyfish.py:446-458)
"""

from subphaser_tpu.version import __version__

__all__ = [
    "__version__",
    "Pipeline",
    "PackedGenome",
    "SGConfig",
]


def __getattr__(name):
    # lazy re-exports so `import subphaser_tpu` stays light
    if name == "Pipeline":
        from subphaser_tpu.phase.pipeline import Pipeline

        return Pipeline
    if name == "PackedGenome":
        from subphaser_tpu.io.genome import PackedGenome

        return PackedGenome
    if name == "SGConfig":
        from subphaser_tpu.config import SGConfig

        return SGConfig
    raise AttributeError(name)
