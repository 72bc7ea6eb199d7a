"""SimpleText codec analog — a human-readable, plain-text dump of a
committed index, independently re-readable.

The reference ships SimpleTextCodec (codecs/src/java/org/apache/lucene/
codecs/simpletext/: SimpleTextFieldsWriter.java writes ``field X /
term Y / doc N / freq F / pos P`` lines; SimpleTextStoredFieldsWriter,
SimpleTextNormsConsumer alongside) for exactly one purpose: "FOR
RECREATIONAL USE ONLY" debugging — anything in the index can be
eyeballed in a text editor, and any independent program can parse it.

This module plays the same role for the parquet index:

- :func:`export_simpletext` writes ``postings.txt`` (the
  SimpleTextFieldsWriter line grammar: ``field`` / `` term`` /
  ``  doc`` / ``   freq`` / ``   pos`` with two-space nesting),
  ``norms.txt``, ``stats.txt`` and ``docstore.txt`` under a directory,
  all deterministically ordered so exports diff cleanly.
- :func:`read_simpletext_postings` is a from-scratch parser of that
  grammar (no engine imports) — the "independent program" leg.
- :func:`verify_simpletext` proves the codec round-trips: it parses
  the text files alone, recomputes BM25 top-k for a query from them
  (pure Python), and compares against the live engine's search — the
  CheckIndex-style cross-reader equivalence the reference gets from
  running TestSimpleTextPostingsFormat against the default codec.

Scale note: this is a DEBUG codec, same as the reference's — the
export collects per-term postings through the engine's pushed-down
decode and writes one local text file per table. Point it at a bucket
subset for big indexes.
"""

from __future__ import annotations

import math
import os
from collections import defaultdict

__all__ = ["export_simpletext", "read_simpletext_postings",
           "verify_simpletext"]


def export_simpletext(searcher, out_dir: str, field: str = "text",
                      max_terms: int | None = None) -> dict:
    """Dump the index's postings / norms / stats / stored fields for
    ``field`` as SimpleText files. Returns {file: line_count}."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    counts = {}

    ts = (searcher._termstats_df(F.col("field") == field)
          .select("term").orderBy("term"))
    if max_terms is not None:
        ts = ts.limit(max_terms)  # cut inside the scan, not the driver
    term_list = [t["term"] for t in ts.collect()]

    # ONE decode job for the whole exported term set (not a job per
    # term): the searcher's batched multi-term decode
    by_term: dict = {}
    for r in searcher.terms_postings(term_list, field).collect():
        by_term.setdefault(r["term"], []).append(
            (int(r["doc_id"]), int(r["tf"])))
    n = 0
    with open(os.path.join(out_dir, "postings.txt"), "w") as fh:
        fh.write(f"field {field}\n")
        n += 1
        for t in term_list:
            fh.write(f"  term {t}\n")
            n += 1
            for doc, tf in sorted(by_term.get(t, [])):
                fh.write(f"    doc {doc}\n")
                fh.write(f"      freq {tf}\n")
                n += 2
        fh.write("END\n")
        n += 1
    counts["postings.txt"] = n

    import numpy as np
    n_norm = 0
    with open(os.path.join(out_dir, "norms.txt"), "w") as fh:
        if field in searcher.keyword_fields:
            # keyword fields omit norms (StringField omitNorms):
            # every doc scores at length 1 -> norm code 1, same as the
            # search path's const_norm handling
            docs = (searcher._read_cached(searcher.docstore_paths)
                    .select("doc_id").orderBy("doc_id").collect())
            for r in docs:
                fh.write(f"doc {int(r['doc_id'])} norm 1\n")
                n_norm += 1
        elif field != searcher.field:
            raise ValueError(
                f"no norms stored for field {field!r} (norms exist for "
                f"the scored field {searcher.field!r}; keyword fields "
                "export constant code 1)")
        else:
            buckets = (searcher._read_cached(searcher.norms_paths)
                       .select("base_doc", "norms").orderBy("base_doc")
                       .collect())
            for b in buckets:
                codes = np.frombuffer(bytes(b["norms"]), dtype=np.uint8)
                base = int(b["base_doc"])
                for off, code in enumerate(codes):
                    fh.write(f"doc {base + off} norm {int(code)}\n")
                    n_norm += 1
    counts["norms.txt"] = n_norm

    dc, sttf = searcher._field_stats(field)
    with open(os.path.join(out_dir, "stats.txt"), "w") as fh:
        fh.write(f"field {field}\ndocCount {dc}\nsumTotalTermFreq "
                 f"{sttf}\n")
    counts["stats.txt"] = 3

    ds = (searcher._read_cached(searcher.docstore_paths)
          .select("doc_id", "text").orderBy("doc_id").collect())
    with open(os.path.join(out_dir, "docstore.txt"), "w") as fh:
        for r in ds:
            one_line = " ".join((r["text"] or "").split())
            fh.write(f"doc {int(r['doc_id'])} text {one_line}\n")
    counts["docstore.txt"] = len(ds)
    return counts


def read_simpletext_postings(path: str) -> dict:
    """Independent parser of the postings.txt grammar — returns
    {term: [(doc_id, freq), ...]}. Deliberately engine-free."""
    out: dict = {}
    term = None
    doc = None
    with open(path) as fh:
        for line in fh:
            s = line.rstrip("\n")
            if s.startswith("      freq "):
                out[term].append((doc, int(s.split()[-1])))
            elif s.startswith("    doc "):
                doc = int(s.split()[-1])
            elif s.startswith("  term "):
                term = s[len("  term "):]
                out[term] = []
            elif s.startswith("field ") or s == "END":
                continue
    return out


def verify_simpletext(export_dir: str, searcher, query_terms: list,
                      k: int = 10, field: str = "text") -> bool:
    """Cross-reader equivalence: score an OR-of-terms BM25 top-k using
    ONLY the text files (pure Python, SmallFloat norm decode included)
    and compare with the engine's search. Raises AssertionError with
    the diff on mismatch; True otherwise."""
    from ..kernels.smallfloat import byte4_to_int
    from ..search.query import OrQuery, PreAnalyzed

    post = read_simpletext_postings(
        os.path.join(export_dir, "postings.txt"))
    norms = {}
    for line in open(os.path.join(export_dir, "norms.txt")):
        p = line.split()
        norms[int(p[1])] = int(p[3])
    stats = {}
    for line in open(os.path.join(export_dir, "stats.txt")):
        p = line.split()
        if len(p) == 2 and p[0] != "field":
            stats[p[0]] = int(p[1])
    dc = stats["docCount"]
    avgdl = stats["sumTotalTermFreq"] / dc

    scores: dict = defaultdict(float)
    import numpy as np
    for t in query_terms:
        plist = post.get(t, [])
        df = len(plist)
        if not df:
            continue
        idf = np.float32(math.log(1 + (dc - df + 0.5) / (df + 0.5)))
        for doc, tf in plist:
            dl = float(byte4_to_int(norms[doc]))
            denom = tf + 1.2 * (0.25 + 0.75 * dl / avgdl)
            scores[doc] += float(np.float32(
                idf * np.float32(tf / denom)))
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    # query_terms are INDEX terms read back from the text dump —
    # PreAnalyzed so a stemming chain doesn't re-stem them (stems are
    # not idempotent) while the file side scores them verbatim
    got = searcher.search(PreAnalyzed(OrQuery(tuple(query_terms),
                                              field)), k=k)
    assert [d for d, _ in got] == [d for d, _ in want], (got, want)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) <= 1e-3 * max(1.0, abs(ws)), (gd, gs, ws)
    return True
