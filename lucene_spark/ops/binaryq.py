"""Binary (1-bit) quantized vector search — the Lucene102 binary
quantization analog (core:codecs/lucene102/
Lucene102BinaryQuantizedVectorsFormat.java + util/quantization/
OptimizedScalarQuantizer.java).

The reference stores CENTROID-CENTERED vectors quantized to ONE BIT
per dimension plus per-vector corrective factors, and scores with bit
arithmetic against an asymmetrically quantized query (its format
javadoc). The Spark-first analog keeps the same estimator shape:

    v ~ c + alpha_v * s_v,   s_v = sign(v - c) in {-1, +1}^d
    dot(q, v) ~ dot(q, c) + alpha_v * dot(q, s_v)
    dot(q, s_v) = 2 * sum_{j: bit_j = 1} q_j - sum_j q_j

with alpha_v = mean(|v - c|) — the L2-optimal scale for a 1-bit
quantizer (the LVQ scalar, Aguerrebere et al. 2023, the paper the
reference's javadoc builds on). Deviations from the reference, both
documented: the query side stays full-precision inside the Arrow
kernel (the reference quantizes queries to 4 bits purely so scoring
can be SIMD bit arithmetic; a numpy {0,1}-matrix GEMM is already the
vectorized path here), and one corrective factor is stored instead of
three (the centroid term is recomputed from the shared broadcast
centroid). Both paths re-rank survivors at full precision, so only
RECALL — not final values — depends on the estimator.

Scale shape (100 TB): the centroid is one tree-aggregated pass; the
scan reads d/8 bytes + one float per vector — 32x less I/O than
float32 and 8x less than the int8 path (`ops/quantized.py`); per
Arrow batch one (n, d) x (d, m) GEMM scores every query; map-side
partial top-k bounds the shuffle at O(batches * n_cand * |Q|) rows;
exact re-rank touches candidates only. No corpus shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _DOT, _norm_sql

__all__ = ["corpus_centroid", "binary_quantize", "binary_topk"]


def corpus_centroid(vectors: DataFrame, vec_col: str = "embedding") -> np.ndarray:
    """Mean of the L2-NORMALIZED corpus (the reference normalizes for
    COSINE then centers; one distributed agg, no driver-side data)."""
    # zero-vector guard (the same nrm == 0 -> 1 convention as
    # binary_quantize): an all-zero embedding contributes zeros to the
    # centroid instead of NULLs (or DIVIDE_BY_ZERO under ANSI mode)
    norm = F.expr(f"transform({vec_col}, x -> cast(x as double) / "
                  f"greatest({_norm_sql(vec_col)}, 1e-300))")
    row = (vectors.select(F.posexplode(norm).alias("j", "x"))
           .groupBy("j").agg(F.avg("x").alias("m"))
           .orderBy("j").collect())
    return np.array([r["m"] for r in row], dtype=np.float64)


def binary_quantize(vectors: DataFrame, centroid: np.ndarray,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """-> (id, bvec packed sign bits, alpha float) — d/8 bytes + one
    corrective float per vector (32x under float32). One Arrow pass."""
    c = centroid.copy()

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            nrm = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
            nrm[nrm == 0.0] = 1.0
            r = mat / nrm - c[None, :]
            bits = (r > 0.0).astype(np.uint8)
            alpha = np.abs(r).mean(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "bvec": [np.packbits(b).tobytes() for b in bits],
                "alpha": alpha.astype(np.float32),
            })

    return vectors.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} bigint, bvec binary, alpha float")


def binary_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                n_candidates: int | None = None,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id") -> DataFrame:
    """Approximate cosine top-k through 1-bit codes + exact re-rank.
    Returns (q_id, vec_id, cos) with exact cosine on the survivors —
    the reference's quantize-then-rescore KNN pattern."""
    n_cand = n_candidates or 10 * k
    c = corpus_centroid(vectors, vec_col)
    dim = c.size
    qrows = queries.select(q_id_col, vec_col).collect()
    q_ids = np.array([r[q_id_col] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                     for r in qrows])
    qnrm = np.sqrt((qmat * qmat).sum(axis=1, keepdims=True))
    qnrm[qnrm == 0.0] = 1.0
    qmat = qmat / qnrm                       # (m, d) unit queries
    q_dot_c = qmat @ c                       # (m,) centroid term
    q_sum = qmat.sum(axis=1)                 # (m,) for the sign identity
    qT = qmat.T.astype(np.float64)           # (d, m)

    bq = binary_quantize(vectors, c, id_col, vec_col)
    nbytes = (dim + 7) // 8

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            packed = np.frombuffer(b"".join(pdf["bvec"]),
                                   dtype=np.uint8).reshape(n, nbytes)
            bits = np.unpackbits(packed, axis=1)[:, :dim]  # (n, d) {0,1}
            # dot(q, s) = 2 * (bits @ q) - sum(q)
            dot_s = 2.0 * (bits @ qT) - q_sum[None, :]     # (n, m)
            alpha = pdf["alpha"].to_numpy(np.float64)
            approx = q_dot_c[None, :] + alpha[:, None] * dot_s
            ids = pdf[id_col].to_numpy(np.int64)
            out_q, out_i, out_a = [], [], []
            for j in range(q_ids.size):
                keep = ids != q_ids[j]       # self never takes a slot
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

    scored = bq.mapInPandas(
        score, f"{q_id_col} bigint, {id_col} bigint, approx double")
    w = Window.partitionBy(q_id_col).orderBy(F.col("approx").desc(),
                                             F.col(id_col).asc())
    cands = (scored.withColumn("_rk", F.row_number().over(w))
             .filter(F.col("_rk") <= n_cand)
             .select(q_id_col, id_col))
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
            .select(q_id_col, id_col, "cos"))
