"""lucene_spark — a PySpark-native inverted-index + BM25 top-k engine.

A from-scratch reimplementation of the *capabilities* of Apache Lucene's
indexing and retrieval stack (reference: iverase/lucene @ 11.0.0-dev),
re-expressed in idiomatic Spark:

- Index build = a DataFrame pipeline over a transcripts table
  ``(conv_id, turn_idx, role, text, tool, ts)``: per-partition tokenization
  and posting-list construction through vectorized pandas/Arrow kernels,
  followed by a salted, skew-aware shuffle that produces a globally sorted
  term dictionary (Lucene's segment merge, re-thought as a range shuffle).
- Query = DataFrame scans over the postings table with parquet predicate
  pushdown for term seek, per-bucket numpy scoring kernels implementing
  Lucene's BM25 (bit-exact float32, k1=1.2 b=0.75, SmallFloat lossy norms)
  and block-max WAND pruning, finishing in Spark's native top-k.

Layout:
  kernels/    bit-exact numeric kernels (SmallFloat, BM25, tokenizer, codec)
  fixtures/   deterministic synthetic transcript + query-set generators
  index/      build pipeline, table catalog (commit points), invariants
  search/     query AST/parser, exhaustive + pruned executors, numpy oracle
  pipeline/   training-data ops (dedup, similarity search, text stats, media)
  streaming/  near-real-time appends (Structured Streaming foreachBatch)
"""

__version__ = "0.1.0"
