"""Index build pipeline and table catalog.

The index is a set of columnar tables (Parquet here; Iceberg in
production — the catalog provides the same atomic-commit semantics as
Lucene's ``segments_N`` commit points, core:index/SegmentInfos.java):

- ``docstore``   stored-fields analog: one row per turn, with global
                 ``doc_id``, norm code, token count; partitioned by
                 ``bucket_id`` (Lucene segment analog).
- ``segments``   per-bucket posting chunks straight out of the build
                 kernel (pre-merge Lucene segments).
- ``postings``   the merged index: globally sorted term dictionary,
                 (term, bucket) chunks with block-max metadata.
- ``termstats``  global per-term df/ttf (+ max_score) — the term dict
                 header (BlockTree metadata analog).
- ``norms``      per-bucket packed norm bytes (.nvd analog).
- ``stats``      collection statistics (docCount, sumTotalTermFreq).
- ``lineage``    per-bucket build provenance — checkpoint-resume.
- ``metrics``    per-stage wall/row metrics.
"""

from .add_indexes import add_indexes  # noqa: F401
from .builder import IndexBuilder, build_index  # noqa: F401
from .catalog import IndexCatalog  # noqa: F401
from .splitter import split_index  # noqa: F401
