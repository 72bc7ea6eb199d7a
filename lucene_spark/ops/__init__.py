"""Training-data pipeline operators over document corpora.

These are the large-scale data-curation capabilities a 100 TB training
pipeline needs on top of the fulltext engine: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search,
text analysis (token stats, quality scoring, language ID heuristic,
fingerprinting) and multimodal column plumbing.

Design rules:
- hot paths are JVM-side ``pyspark.sql.functions`` / SQL expressions
  (whole-stage codegen) — no Python UDFs;
- the only hash primitive is md5 (bit-identical across engines, so every
  operator here is oracle-checkable against DuckDB);
- shuffles only where semantically required (candidate-pair joins),
  with broadcast for small sides.
"""

from .chunking import chunk_documents, chunk_documents_spans
from .decontaminate import decontaminate
from .redact import redact
from .dedup import (exact_duplicates, jaccard_pairs, minhash_pairs,
                    minhash_signatures, simhash, tokens_expr)
from .sampling import sample_rates_table, stratified_sample
from .similarity import cosine_topk, lsh_cosine_topk
from .textstats import (fingerprint, lang_id, repetition_signals,
                        text_quality, token_stats)

__all__ = [
    "tokens_expr", "exact_duplicates", "minhash_signatures", "minhash_pairs",
    "jaccard_pairs", "simhash", "cosine_topk", "lsh_cosine_topk",
    "token_stats", "text_quality", "lang_id", "fingerprint",
    "decontaminate", "repetition_signals", "stratified_sample",
    "sample_rates_table", "redact", "chunk_documents",
    "chunk_documents_spans",
]
