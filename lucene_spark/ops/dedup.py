"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

All hashing is derived from md5 so results are engine-independent and
deterministic (same values in Spark, DuckDB, or any ANSI engine) — no
dependence on Spark's internal Murmur3 seeds.

Scale notes (100 TB): every per-document computation here is a single
projection over arrays (JVM-side, whole-stage codegen, zero shuffle).
The only shuffles are (a) groupBy(hash/bucket) for candidate grouping —
hash keys are uniform by construction so no skew — and (b) the
candidate-pair self-join, whose input is already reduced to colliding
buckets. Pair verification (exact Jaccard) touches only candidates that
share a bucket, never the full cross product.

Caching: minhash_pairs / jaccard_pairs persist() their signature /
shingle frames so the self-join does not duplicate the md5 expression
chains (Catalyst inlines them into both sides otherwise). The cache
lives until Spark evicts it; pipelines iterating many shards in one
session should spark.catalog.clearCache() between shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[0-9a-z]+"


def tokens_expr(col: str = "text") -> F.Column:
    """Analyzer-equivalent token array (lowercase alnum runs), JVM-side."""
    return F.expr(f"regexp_extract_all(lower({col}), '{TOKEN_RE}', 0)")


def _hash64_sql(arg: str) -> str:
    """Deterministic 60-bit integer hash, identical in Spark and DuckDB:
    first 15 hex chars of md5, parsed base-16."""
    return f"cast(conv(substring(md5({arg}), 1, 15), 16, 10) as bigint)"


def shingles_expr(tokens_col: str = "toks", n: int = 3) -> F.Column:
    """n-token shingle strings from a token array column. Guarded against
    Spark's descending sequence(1, 0) when the doc is shorter than n."""
    return F.expr(
        f"if(size({tokens_col}) < {n}, array(), "
        f"transform(sequence(1, size({tokens_col}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({tokens_col}, i, {n}))))")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: md5 over the *normalized token stream* (so
    whitespace/case variants collapse), groups with >1 member.

    Returns (text_hash, n_docs, min_doc_id) — one row per duplicate
    group. Map-side partial aggregation makes this a single cheap
    shuffle on a uniform hash key at any scale.
    """
    h = F.md5(F.concat_ws(" ", tokens_expr(text_col))).alias("text_hash")
    return (df.select(h, F.col(id_col))
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("min_doc_id"))
            .filter(F.col("n_docs") > 1))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# modulus for the seed-mixed hash family: prime < 2^59, so
# (h % P) * (s + 2) stays within int64 for small seed counts — identical
# wrap-free arithmetic in Spark and DuckDB
MINHASH_P = 576460752303423433


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 8,
                       shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: one md5 per distinct shingle, then a
    cheap arithmetic hash family sig[s] = min((h·(s+2) + s) mod P). One
    pure projection — computed entirely inside whole-stage codegen over
    the shingle array; no shuffle, no UDF, md5 cost paid once (not once
    per seed).

    Returns (id_col, sig: array<bigint>) with -1 sentinel for docs with
    no shingles.
    """
    if num_hashes > 14:
        # (MINHASH_P-1) * (s+2) must stay inside int64: s+2 <= 16
        raise ValueError("num_hashes must be <= 14 (int64 overflow in the "
                         "seed-mix hash family beyond s+2 = 16)")
    sh = shingles_expr("toks", shingle_n)
    seeds = ", ".join(str(s) for s in range(num_hashes))
    hs = F.expr(f"transform(sh, x -> {_hash64_sql('x')} % {MINHASH_P})")
    sig = F.expr(
        f"transform(array({seeds}), s -> coalesce(array_min(transform(hs, "
        f"h -> (h * (s + 2) + s) % {MINHASH_P})), -1))")
    return (df.select(F.col(id_col), tokens_expr(text_col).alias("toks"))
            .select(F.col(id_col), F.array_distinct(sh).alias("sh"))
            .select(F.col(id_col), hs.alias("hs"))
            .select(F.col(id_col), sig.alias("sig")))


def minhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  num_hashes: int = 8, bands: int = 4,
                  shingle_n: int = 3) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band bucket.

    band key = (band index, the band's signature slice). Self-join runs
    only within buckets; bucket keys are md5-uniform so the join does
    not skew. The banded frame is persisted so the self-join reads each
    signature once instead of recomputing the hash chain per side.
    Returns distinct (a, b) with a < b.
    """
    rows = num_hashes // bands
    # persist BEFORE the filter/explode: otherwise Catalyst pushes the
    # filter below the projection and duplicates the whole md5 signature
    # expression into an interpreted Filter (observed 7x slowdown)
    sigs = minhash_signatures(df, text_col, id_col, num_hashes,
                              shingle_n).persist()
    band = (sigs
            .filter(F.expr("sig[0] >= 0"))  # docs with no shingles can't pair
            .select(
                F.col(id_col),
                F.explode(F.expr(
                    f"transform(sequence(0, {bands - 1}), b -> struct(b as band, "
                    f"concat_ws(',', slice(sig, b * {rows} + 1, {rows})) as key))"
                )).alias("bk"))
            .select(F.col(id_col), F.col("bk.band"), F.col("bk.key")))
    a = band.alias("a")
    b = band.alias("b")
    return (a.join(b, ["band", "key"])
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("a"),
                    F.col(f"b.{id_col}").alias("b"))
            .distinct())


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------

def jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.8, shingle_n: int = 3,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Near-duplicate pairs by exact n-gram-shingle Jaccard ≥ threshold.

    Candidate generation: docs sharing ≥1 shingle (lossless — Jaccard>0
    implies a shared shingle), or an externally supplied candidate-pair
    frame (e.g. minhash_pairs) for the approximate path. Verification is
    exact set Jaccard via array_intersect/array_union sizes.

    Returns (a, b, jaccard) with a < b.
    """
    # persisted: referenced by the candidate join AND both verify sides —
    # without the cache Catalyst would recompute the shingle sets 3x
    sh = (df.select(F.col(id_col), tokens_expr(text_col).alias("toks"))
          .select(F.col(id_col),
                  F.array_distinct(shingles_expr("toks", shingle_n)).alias("sh"))
          .persist())
    if candidates is None:
        ex = sh.select(F.col(id_col), F.explode("sh").alias("g"))
        cand = (ex.alias("x").join(ex.alias("y"), "g")
                .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
                .select(F.col(f"x.{id_col}").alias("a"),
                        F.col(f"y.{id_col}").alias("b"))
                .distinct())
    else:
        cand = candidates.select("a", "b")
    j = (cand
         .join(sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a")), "a")
         .join(sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b")), "b")
         .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
         .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
         .withColumn("jaccard", F.col("inter") / F.col("uni")))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def jaccard_pairs_lsh(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.8,
                      shingle_n: int = 3, num_hashes: int = 8,
                      bands: int = 4) -> DataFrame:
    """The DOCUMENTED DEFAULT for web-scale corpora: MinHash-LSH band
    buckets generate the candidate pairs, exact shingle Jaccard
    verifies them. The candidate join touches only band-colliding
    pairs — the lossless shared-shingle self-join of ``jaccard_pairs``
    can explode on hot shingles at 100 TB (a shingle appearing in 10^5
    docs contributes 10^10 candidate rows); the LSH buckets are
    md5-uniform and their size is controlled by bands/rows. Recall is
    tunable via bands (more bands = more OR-chances)."""
    cand = minhash_pairs(df, text_col, id_col, num_hashes, bands, shingle_n)
    return jaccard_pairs(df, text_col, id_col, threshold, shingle_n,
                         candidates=cand)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """Per-doc SimHash fingerprint: bit j of the fingerprint is the sign
    of Σ_term tf(term) · (±1 from bit j of hash64(term)).

    Computed as explode→groupBy (tf) then a bit-fold projection — one
    uniform-key shuffle; the 'bits' loop is an array transform, not rows.
    Returns (id_col, simhash: bigint).
    """
    tf = (df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("term"))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf"))
          .withColumn("h", F.expr(_hash64_sql("term"))))
    contrib = F.expr(
        f"transform(sequence(0, {bits - 1}), "
        f"j -> tf * (cast((shiftright(h, j) % 2) as bigint) * 2 - 1))")
    per_doc = (tf.select(F.col(id_col), contrib.alias("c"))
               .groupBy(id_col)
               .agg(F.expr(
                   "aggregate(collect_list(c), "
                   f"cast(array_repeat(0L, {bits}) as array<bigint>), "
                   "(acc, x) -> zip_with(acc, x, (p, q) -> p + q))").alias("s")))
    fp = F.expr(
        f"aggregate(transform(sequence(0, {bits - 1}), "
        f"j -> if(s[j] > 0, shiftleft(1L, j), 0L)), 0L, (a, x) -> a + x)")
    return per_doc.select(F.col(id_col), fp.alias("simhash"))


# ---------------------------------------------------------------------------
# duplicate clustering (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def duplicate_clusters(pairs: DataFrame, a_col: str = "a",
                       b_col: str = "b", max_iter: int = 25) -> DataFrame:
    """Connected components over a near-duplicate pair list ->
    (doc_id, cluster) with cluster = the component's minimum doc id —
    the step a training pipeline runs AFTER pair generation so each
    duplicate GROUP keeps exactly one canonical document (keeping
    min(a,b) per PAIR under-deletes when dups chain: a~b, b~c keeps
    both a and c unless clustering closes the chain).

    Distributed min-label propagation with POINTER JUMPING: each round
    (1) every node takes the min label over its neighbors, then
    (2) every node jumps to its label's label (path doubling). Rounds
    needed are O(log diameter) — a 300-link chain closes in ~8 rounds —
    and each round is two hash-partitioned joins on the label key, no
    driver-side graph (the Kiveris et al. 'Connected Components in
    MapReduce and Beyond' regime; pointer jumping is the classic
    Shiloach-Vishkin step). Lineage is cut per round with
    localCheckpoint so plans stay O(1) deep; at cluster scale point
    spark.sparkContext.setCheckpointDir at a durable path and swap in
    .checkpoint() for executor-loss resilience.

    Only documents that appear in >= 1 pair are returned (singletons
    are their own implicit cluster).
    """
    e = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = (e.unionByName(e.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
             .distinct().localCheckpoint())
    lab = (edges.select(F.col("u").alias("n"))
           .distinct()
           .withColumn("lbl", F.col("n")))
    for _ in range(max_iter):
        # (1) min over neighbors' labels
        nbr = (edges.join(lab.withColumnRenamed("n", "v"), "v")
               .groupBy("u").agg(F.min("lbl").alias("nlbl"))
               .withColumnRenamed("u", "n"))
        stepped = (lab.join(nbr, "n", "left")
                   .select("n", F.least("lbl", F.coalesce("nlbl", "lbl"))
                           .alias("lbl")))
        # (2) pointer jump: lbl <- lbl(lbl)
        parent = (stepped.select(F.col("n").alias("lbl"),
                                 F.col("lbl").alias("plbl")))
        jumped = (stepped.join(parent, "lbl", "left")
                  .select("n", F.coalesce("plbl", "lbl").alias("lbl"))
                  .localCheckpoint())
        changed = (jumped.join(lab.withColumnRenamed("lbl", "old"), "n")
                   .filter(F.col("lbl") != F.col("old")).count())
        lab = jumped
        if changed == 0:
            break
    return lab.select(F.col("n").alias("doc_id"),
                      F.col("lbl").alias("cluster"))


def keep_canonical(df: DataFrame, clusters: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Drop every non-canonical member of each duplicate cluster: keep
    the cluster's min doc id (the cluster label itself) plus all
    unpaired documents. One broadcast-friendly anti-join."""
    losers = clusters.filter(F.col("doc_id") != F.col("cluster")) \
        .select(F.col("doc_id").alias(id_col))
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# exact substring (n-token window) deduplication
# ---------------------------------------------------------------------------

def duplicate_substring_spans(df: DataFrame, window: int = 5,
                              min_count: int = 2, text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Exact substring duplication at TOKEN-window granularity — the
    distributed analog of suffix-array substring dedup (Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better"):
    any ``window``-token sequence occurring >= ``min_count`` times
    across the corpus (including repeats within one document) marks
    its occurrences as duplicated; overlapping/adjacent duplicated
    windows in a document merge into maximal spans. A window length of
    ~50 tokens reproduces the paper's operating point; small windows
    behave like boilerplate detection.

    Returns one row per (doc, merged span): (doc_id, start_tok,
    end_tok, n_windows) with 1-based inclusive token positions over
    the normalized token stream (:func:`tokens_expr`).

    Scale (100 TB): the window explode is O(total tokens) — the same
    cost class as the MinHash shingle stage; the occurrence count is
    one map-side-combined shuffle on an md5-uniform key; the join back
    is a hash join on that key; span merging is a per-document window
    (partition key = doc_id, partition size = doc length, bounded).
    Nothing touches the driver. The windows frame is persisted so the
    count branch and the join branch share one tokenize+explode.
    """
    from pyspark.sql.window import Window

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens_expr(text_col).alias("toks"))
    wins = (base.select("doc_id",
                        F.posexplode(shingles_expr("toks", window))
                        .alias("pos0", "sh"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                    F.md5("sh").alias("wh"))
            .persist())
    dup_wh = (wins.groupBy("wh").agg(F.count("*").alias("n"))
              .filter(F.col("n") >= min_count)
              .select("wh"))
    dup = wins.join(dup_wh, "wh")
    w = Window.partitionBy("doc_id").orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w)
    # a new span starts when the previous duplicated window cannot
    # overlap or touch this one (gap > window)
    spans = (dup.withColumn("_new",
                            F.when(gap.isNull() | (gap > window), 1)
                            .otherwise(0))
             .withColumn("_span", F.sum("_new").over(
                 w.rowsBetween(Window.unboundedPreceding, 0)))
             .groupBy("doc_id", "_span")
             .agg(F.min("pos").alias("start_tok"),
                  (F.max("pos") + window - 1).alias("end_tok"),
                  F.count("*").alias("n_windows"))
             .drop("_span"))
    return spans


def strip_duplicate_substrings(df: DataFrame, window: int = 5,
                               min_count: int = 2, text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """Remove duplicated substrings keeping ONE canonical occurrence
    (the paper's "leave one copy" policy, made deterministic): for
    each duplicated window hash the occurrence at the minimum
    (doc_id, pos) is canonical; every token covered only by
    non-canonical duplicated windows is dropped; the surviving tokens
    are re-joined with single spaces (the token stream is the
    normalized one, so casing/punctuation are already folded — this
    is a TRAINING-DATA transform, not a display transform).

    Returns (id_col, text_col) with the cleaned token stream, one row
    per input document (documents with nothing to strip pass through
    with their normalized token stream).

    Scale: canonical selection is one min-struct aggregate on the
    window-hash key; the removal set explodes w tokens per
    non-canonical duplicated window (bounded fan-out) and the final
    rebuild is a token-position anti-join + per-doc sort — all hash
    shuffles on uniform keys.
    """
    base = (df.select(F.col(id_col).alias("doc_id"),
                      tokens_expr(text_col).alias("toks"))
            .persist())
    wins = (base.select("doc_id",
                        F.posexplode(shingles_expr("toks", window))
                        .alias("pos0", "sh"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                    F.md5("sh").alias("wh"))
            .persist())
    stats = (wins.groupBy("wh")
             .agg(F.count("*").alias("n"),
                  F.min(F.struct("doc_id", "pos")).alias("canon"))
             .filter(F.col("n") >= min_count))
    noncanon = (wins.join(stats, "wh")
                .filter(~((F.col("doc_id") == F.col("canon.doc_id"))
                          & (F.col("pos") == F.col("canon.pos")))))
    # token positions covered by non-canonical duplicated windows
    drop_pos = (noncanon
                .select("doc_id",
                        F.explode(F.sequence(
                            F.col("pos"),
                            F.col("pos") + F.lit(window - 1)))
                        .alias("tpos"))
                .distinct())
    tok_pos = base.select("doc_id",
                          F.posexplode("toks").alias("tpos0", "tok")) \
        .select("doc_id", (F.col("tpos0") + 1).alias("tpos"), "tok")
    kept = (tok_pos.join(drop_pos, ["doc_id", "tpos"], "left_anti")
            .groupBy("doc_id")
            .agg(F.concat_ws(" ", F.array_sort(F.collect_list(
                F.struct("tpos", "tok"))).getField("tok"))
                 .alias("_text")))
    out = (base.select("doc_id").join(kept, "doc_id", "left")
           .select(F.col("doc_id").alias(id_col),
                   F.coalesce("_text", F.lit("")).alias(text_col)))
    return out


# ---------------------------------------------------------------------------
# line-level exact dedup (C4-style)
# ---------------------------------------------------------------------------

def line_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """C4-style LINE-level exact deduplication (Raffel et al. 2020,
    "Exploring the Limits of Transfer Learning..." §2.2 — production
    pipelines drop repeated boilerplate lines corpus-wide, keeping one
    occurrence): every non-blank line whose normalized form
    (trim+lowercase) repeats anywhere in the corpus keeps ONLY its
    first occurrence in (doc_id, line_no) order; blank lines pass
    through (they are structure, not content — deduping them would
    collapse every paragraph break onto one document).

    Returns (id_col, text_col) with the cleaned text, one row per
    input document (a document whose every line was dropped comes back
    as the empty string).

    Scale: explode is O(total lines); keep-first is ONE row_number
    window partitioned by the md5 line key (uniform, no skew beyond
    true duplicate mass); reassembly is a per-doc sort of surviving
    lines. No driver-side state.
    """
    from pyspark.sql.window import Window

    lines = (df.select(F.col(id_col).alias("doc_id"),
                       F.posexplode(F.split(F.col(text_col), "\n"))
                       .alias("ln", "line")))
    h = F.md5(F.trim(F.lower(F.col("line"))))
    w = Window.partitionBy(h).orderBy("doc_id", "ln")
    kept = (lines.withColumn("_rk", F.row_number().over(w))
            .filter((F.trim(F.col("line")) == "") | (F.col("_rk") == 1)))
    out = (kept.groupBy("doc_id")
           .agg(F.concat_ws("\n", F.array_sort(F.collect_list(
               F.struct("ln", "line"))).getField("line")).alias("_t")))
    ids = df.select(F.col(id_col).alias("doc_id")).distinct()
    return (ids.join(out, "doc_id", "left")
            .select(F.col("doc_id").alias(id_col),
                    F.coalesce("_t", F.lit("")).alias(text_col)))
