"""Query engine: AST, per-bucket numpy scoring kernels (exhaustive and
block-max-pruned), Spark-distributed searcher, and a brute-force oracle."""

from .query import (AndQuery, MultiPhraseQuery, OrQuery, PhraseQuery,  # noqa: F401
                    TermQuery, parse_query)
from .searcher import IndexSearcher  # noqa: F401
