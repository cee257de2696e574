"""LLM-data-pipeline operators: dedup, similarity search, text
analysis, and multimodal column plumbing (SURVEY §7 Phase 6).

Modules:
- :mod:`mpes_spark.extras.text` — language ID, quality scoring, token
  counting, fingerprinting (native Column exprs).
- :mod:`mpes_spark.extras.dedup` — exact (md5 groupBy), MinHash+banded
  LSH, SimHash, blocked n-gram Jaccard.
- :mod:`mpes_spark.extras.similarity` — brute-force cosine top-k and
  hyperplane-LSH bucketed ANN.
- :mod:`mpes_spark.extras.multimodal` — binary asset columns, Arrow
  batch feature extraction (codec calls stubbed; plumbing real).
- :mod:`mpes_spark.extras.curation` — stratified/budget sampling,
  decontamination, chunking, chunk-level dedup, sequence packing.
- :mod:`mpes_spark.extras.pipeline` — :class:`CorpusPipeline`, the
  fluent curation chain (the documents-side EventPipeline).
- :mod:`mpes_spark.extras.registry` — driver-contract queries+oracles.
"""

from mpes_spark.extras.pipeline import CorpusPipeline

__all__ = ["CorpusPipeline"]
