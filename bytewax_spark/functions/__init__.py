"""Beyond-reference analytics (BASELINE.json north star): the
operations a large-scale LLM training-data pipeline needs, absent from
the reference (SURVEY §2.7) and designed here for 100 TB scale.

- :mod:`bytewax_spark.functions.text` — tokenization, language ID,
  quality scoring, token counting, fingerprinting.
- :mod:`bytewax_spark.functions.dedup` — exact, n-gram Jaccard,
  MinHash+LSH, SimHash, embedding-cosine near-dup.
- :mod:`bytewax_spark.functions.similarity` — brute-force cosine
  top-k, IVF-style probed search, random-hyperplane LSH buckets.
- :mod:`bytewax_spark.functions.multimodal` — binary media columns
  with typed metadata; decode/feature/resize/frame-sample plumbing.
- :mod:`bytewax_spark.functions.sampling` — deterministic hash
  sampling, stratified rates, leak-proof train/test splits.

Everything is pure column expressions (codegen, pushdown) except where
vector math forces a Pandas UDF; all hashing is md5-derived so DuckDB
oracles can reproduce results bit-for-bit.
"""

from bytewax_spark.functions import (
    dedup,
    multimodal,
    sampling,
    similarity,
    sketches,
    text,
)

__all__ = ["text", "dedup", "similarity", "multimodal", "sampling", "sketches"]
