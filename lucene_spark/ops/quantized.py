"""Int8 scalar-quantized vector search (the Lucene99 scalar
quantization analog, core:codecs/lucene99/
Lucene99ScalarQuantizedVectorsFormat.java + util/quantization/
ScalarQuantizer.java).

Vectors are L2-normalized (the reference's COSINE handling: normalize,
then quantize for dot product) and each component is mapped to a
7-bit code Q in [0, 127]:

    alpha = (hi - lo) / 127
    Q_i   = clip(floor((x_i - lo) / alpha + 0.5), 0, 127)

so x_i ~ lo + alpha * Q_i, and the dot product of two normalized
vectors reconstructs from INT arithmetic plus per-vector corrections:

    dot(u, v) ~ d*lo^2 + lo*alpha*(sumQ_u + sumQ_v) + alpha^2 * (Qu . Qv)

(the reference's ScalarQuantizedVectorSimilarity.DotProduct score
correction, expanded). The quantile bounds [lo, hi]: confidence = 1.0
uses the exact component min/max (ScalarQuantizer.java:confidence
interval 1.0 -> min/max); confidence < 1.0 trims tails with
percentile_approx — the scale path for heavy-tailed embeddings, not
bit-replicable by an external oracle and therefore recall-gated only.

Scale shape (100 TB): quantization is one corpus pass (min/max agg +
a vectorized Arrow map); the search scans int8 codes — 4x less I/O
than float32 — with the query codes broadcast, computes whole-batch
uint8 GEMM per Arrow batch, keeps n_candidates per query, and
re-ranks ONLY the candidates against full-precision vectors (the
reference's re-scoring pattern). No corpus shuffle anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _DOT, _norm_sql

__all__ = ["quantize_params", "quantize_vectors", "quantized_topk"]


def quantize_params(vectors: DataFrame, vec_col: str = "embedding",
                    confidence: float = 1.0) -> tuple:
    """(lo, hi) quantization bounds over the NORMALIZED component
    distribution. confidence=1.0 -> exact min/max (one distributed agg,
    deterministic); confidence<1.0 -> approx quantiles at
    (1-confidence)/2 tails (the ScalarQuantizer confidence-interval
    path)."""
    comp = (vectors
            .select(F.explode(F.expr(
                f"transform({vec_col}, x -> cast(x as double) / "
                f"{_norm_sql(vec_col)})")).alias("c")))
    if confidence >= 1.0:
        row = comp.agg(F.min("c").alias("lo"),
                       F.max("c").alias("hi")).collect()[0]
    else:
        t = (1.0 - confidence) / 2.0
        row = comp.agg(
            F.percentile_approx("c", t, 100000).alias("lo"),
            F.percentile_approx("c", 1.0 - t, 100000).alias("hi")
        ).collect()[0]
    return float(row["lo"]), float(row["hi"])


def _quantize_np(mat: np.ndarray, lo: float, hi: float):
    """(n, d) float64 normalized matrix -> (uint8 codes, int64 sums).
    floor(x + 0.5) rounding (Java Math.round), clipped to [0, 127].
    Degenerate bounds (every component equal -> hi == lo) quantize to
    all-zero codes instead of dividing by zero; the exact re-rank stage
    still orders the survivors correctly."""
    alpha = (hi - lo) / 127.0
    if alpha <= 0.0:
        q = np.zeros(mat.shape, dtype=np.uint8)
        return q, q.sum(axis=1, dtype=np.int64)
    q = np.floor((mat - lo) / alpha + 0.5)
    q = np.clip(q, 0.0, 127.0).astype(np.uint8)
    return q, q.sum(axis=1, dtype=np.int64)


def quantize_vectors(vectors: DataFrame, lo: float, hi: float,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """-> (id, qvec binary int8 codes, qsum) — the quantized corpus.
    One Arrow-batched pass; codes are 1/4 the float32 footprint."""

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            nrm = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
            nrm[nrm == 0.0] = 1.0
            q, s = _quantize_np(mat / nrm, lo, hi)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "qvec": [r.tobytes() for r in q],
                "qsum": s,
            })

    return vectors.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} bigint, qvec binary, qsum bigint")


def quantized_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                   n_candidates: int | None = None,
                   confidence: float = 1.0,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   q_id_col: str = "q_id") -> DataFrame:
    """Approximate cosine top-k through int8 codes + exact re-rank.

    1. bounds from the corpus (one agg), corpus + queries quantized;
    2. query codes broadcast in-closure; each corpus Arrow batch scores
       ALL queries with one uint8->int32 GEMM and the correction terms;
    3. per-query top n_candidates (default 4k) by (approx desc, id);
    4. candidates re-ranked with full-precision cosine, final top-k.

    Returns (q_id, vec_id, cos) — exact cosine values on the survivors,
    like the reference's quantized-then-rescored KNN."""
    n_cand = n_candidates or 4 * k
    lo, hi = quantize_params(vectors, vec_col, confidence)
    alpha = (hi - lo) / 127.0
    qrows = queries.select(q_id_col, vec_col).collect()
    q_ids = np.array([r[q_id_col] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                     for r in qrows])
    qnrm = np.sqrt((qmat * qmat).sum(axis=1, keepdims=True))
    qnrm[qnrm == 0.0] = 1.0
    qq, qsums = _quantize_np(qmat / qnrm, lo, hi)
    dim = qq.shape[1]
    qq_i = qq.astype(np.int32)

    qcorpus = quantize_vectors(vectors, lo, hi, id_col, vec_col)

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            cmat = np.frombuffer(b"".join(pdf["qvec"]),
                                 dtype=np.uint8).reshape(n, dim)
            csum = pdf["qsum"].to_numpy(np.int64)
            dot_q = cmat.astype(np.int32) @ qq_i.T  # (n, m)
            approx = (dim * lo * lo
                      + lo * alpha * (csum[:, None] + qsums[None, :])
                      + alpha * alpha * dot_q)
            ids = pdf[id_col].to_numpy(np.int64)
            # map-side partial top-k: each batch emits only its own top
            # n_cand per query in (approx desc, id asc) order — the
            # shuffle that feeds the global candidate cut carries
            # O(batches * n_cand * |Q|) rows, never O(corpus * |Q|)
            out_q, out_i, out_a = [], [], []
            for j in range(q_ids.size):
                # drop the self vector BEFORE the per-batch cut — it
                # would otherwise consume a candidate slot and push the
                # batch's true n_cand-th candidate out
                keep = ids != q_ids[j]
                bids, bcol = ids[keep], approx[keep, j]
                take = min(n_cand, bids.size)
                if take == 0:
                    continue
                sel = np.lexsort((bids, -bcol))[:take]
                out_q.append(np.full(take, q_ids[j], dtype=np.int64))
                out_i.append(bids[sel])
                out_a.append(bcol[sel])
            if not out_q:
                continue
            yield pd.DataFrame({
                q_id_col: np.concatenate(out_q),
                id_col: np.concatenate(out_i),
                "approx": np.concatenate(out_a),
            })

    scored = (qcorpus.mapInPandas(
        score, f"{q_id_col} bigint, {id_col} bigint, approx double")
        .filter(F.col(id_col) != F.col(q_id_col)))
    w = Window.partitionBy(q_id_col).orderBy(F.col("approx").desc(),
                                             F.col(id_col).asc())
    cands = (scored.withColumn("_rk", F.row_number().over(w))
             .filter(F.col("_rk") <= n_cand)
             .select(q_id_col, id_col))
    # exact re-rank of the candidate set only
    qv = queries.select(F.col(q_id_col), F.col(vec_col).alias("_qv"))
    cv = vectors.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    dot = _DOT.format(a="_cv", b="_qv")
    cos = F.expr(f"{dot} / ({_norm_sql('_cv')} * {_norm_sql('_qv')})")
    rer = (cands.join(F.broadcast(qv), q_id_col).join(cv, id_col)
           .select(q_id_col, id_col, cos.alias("cos")))
    w2 = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(),
                                              F.col(id_col).asc())
    return (rer.withColumn("_rk", F.row_number().over(w2))
            .filter(F.col("_rk") <= k)
            .drop("_rk"))
