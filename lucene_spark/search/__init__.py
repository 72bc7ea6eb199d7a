"""Query engine: AST, per-bucket numpy scoring kernels (exhaustive and
block-max-pruned), Spark-distributed searcher, and a brute-force oracle."""

from .query import AndQuery, OrQuery, PhraseQuery, TermQuery, parse_query  # noqa: F401
from .searcher import IndexSearcher  # noqa: F401
