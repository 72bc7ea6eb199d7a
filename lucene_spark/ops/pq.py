"""Product-quantized (PQ) vector search — the IVF-PQ family's code
path (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the quantization layer FAISS-style engines and the
reference's KNN roadmap build on — Lucene ships scalar (Lucene99) and
binary (Lucene102) quantization, see ops/quantized.py and
ops/binaryq.py; PQ completes the standard trio for the 100 TB
embedding-dedup framing).

Cosine handling mirrors the other two quantizers: vectors are
L2-normalized first, then the dimension axis is split into M
contiguous subspaces of dim/M components each; every subspace gets its
own ks-centroid codebook, and a vector's code is the M-byte vector of
nearest-centroid ids. Search uses ADC (asymmetric distance
computation): the float query builds one (M, ks) lookup table of
sub-inner-products against the codebooks, and a corpus vector's
approximate inner product is the sum of M table lookups — no float
reconstruction.

Scale shape (100 TB):
  * training reads a DETERMINISTIC bounded sample (the n smallest
    md5(vec_id) rows via TakeOrderedAndProject — the ivf_train seeding
    pattern) and runs Lloyd per subspace in numpy driver-side: the
    sample is metadata-sized (sample_n x dim floats), which is how
    production PQ trains at any corpus size — codebooks are a few KB
    of model, not a distributed state;
  * encoding is ONE Arrow-batched corpus pass emitting M uint8 codes
    per vector (dim/M x 4-byte floats -> 1 byte: 16x smaller at M=16
    over 64 dims) — the scan that replaces the float scan;
  * search broadcasts the per-query LUTs in-closure, scores each
    corpus batch with vectorized gathers (zero per-row Python), keeps
    only each batch's top n_candidates per query (the shuffle carries
    O(batches x n_cand x |Q|) rows, never corpus x |Q|), and re-ranks
    the survivors at full precision — the same
    quantize-prune-then-rescore pattern as ops/quantized.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _DOT, _norm_sql

__all__ = ["pq_train", "pq_encode", "pq_topk"]


def _sample_matrix(vectors: DataFrame, sample_n: int, id_col: str,
                   vec_col: str) -> np.ndarray:
    """Deterministic (sample_n, dim) float64 L2-normalized training
    sample: the rows with the smallest md5(vec_id) — a distributed
    TakeOrderedAndProject partial top-k, no un-partitioned Window, no
    RNG (the ivf_train seeding discipline)."""
    rows = (vectors
            .select(F.md5(F.col(id_col).cast("string")).alias("_h"),
                    vec_col)
            .orderBy("_h")
            .limit(sample_n)
            .collect())
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                    for r in rows])
    nrm = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    nrm[nrm == 0.0] = 1.0
    return mat / nrm


def pq_train(vectors: DataFrame, m: int = 16, ks: int = 16,
             iters: int = 8, sample_n: int = 4096,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> np.ndarray:
    """Train per-subspace codebooks -> (m, ks, dim//m) float64 array.

    Lloyd's k-means per subspace over the deterministic sample, all
    subspaces updated in lockstep (vectorized). Seeds: the first ks
    sample rows' sub-vectors (the sample is already md5-shuffled, so
    the seeds are a reproducible pseudo-random draw). Empty cells keep
    their previous centroid (the FAISS empty-cell fallback, minus the
    split heuristic — deterministic)."""
    smat = _sample_matrix(vectors, sample_n, id_col, vec_col)
    n, dim = smat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if n < ks:
        raise ValueError(f"sample ({n}) smaller than ks ({ks})")
    dsub = dim // m
    sub = smat.reshape(n, m, dsub)                    # (n, m, dsub)
    books = sub[:ks].transpose(1, 0, 2).copy()        # (m, ks, dsub)
    for _ in range(iters):
        # assign: per subspace squared L2 to each centroid
        # (n, m, ks) = |x|^2 - 2 x.c + |c|^2; argmin over ks
        d2 = (np.einsum("nmd,nmd->nm", sub, sub)[:, :, None]
              - 2.0 * np.einsum("nmd,mkd->nmk", sub, books)
              + np.einsum("mkd,mkd->mk", books, books)[None, :, :])
        assign = d2.argmin(axis=2)                    # (n, m)
        for j in range(m):
            # vectorized per-cell means via bincount over the cell ids
            counts = np.bincount(assign[:, j], minlength=ks)
            sums = np.zeros((ks, dsub))
            np.add.at(sums, assign[:, j], sub[:, j, :])
            nz = counts > 0
            books[j, nz] = sums[nz] / counts[nz, None]
    return books


def pq_encode(vectors: DataFrame, books: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """-> (id, pcode binary: M uint8 codes) — one Arrow-batched pass;
    the codebooks ride the closure (a few KB)."""
    m, ks, dsub = books.shape
    bks = books.copy()
    b_sq = np.einsum("mkd,mkd->mk", bks, bks)         # (m, ks)

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            nrm = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
            nrm[nrm == 0.0] = 1.0
            sub = (mat / nrm).reshape(n, m, dsub)
            d2 = (-2.0 * np.einsum("nmd,mkd->nmk", sub, bks)
                  + b_sq[None, :, :])
            codes = d2.argmin(axis=2).astype(np.uint8)  # (n, m)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "pcode": [r.tobytes() for r in codes],
            })

    return vectors.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} bigint, pcode binary")


def pq_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
            n_candidates: int | None = None, m: int = 16, ks: int = 16,
            iters: int = 8, sample_n: int = 4096,
            books: np.ndarray | None = None,
            id_col: str = "vec_id", vec_col: str = "embedding",
            q_id_col: str = "q_id") -> DataFrame:
    """Approximate cosine top-k through PQ codes + exact re-rank.

    1. codebooks trained on the deterministic sample (or supplied);
    2. corpus encoded to M-byte codes (one pass, 4*dim/M x smaller);
    3. each query builds an (M, ks) inner-product LUT; every corpus
       Arrow batch scores ALL queries with vectorized code gathers and
       emits only its own top n_candidates per query;
    4. global candidate cut, then full-precision cosine re-rank of the
       survivors only — exact values on whatever PQ order surfaces.

    Returns (q_id, vec_id, cos)."""
    n_cand = n_candidates or 4 * k
    if books is None:
        books = pq_train(vectors, m, ks, iters, sample_n, id_col, vec_col)
    m, ks, dsub = books.shape

    qrows = queries.select(q_id_col, vec_col).collect()
    q_ids = np.array([r[q_id_col] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                     for r in qrows])
    qnrm = np.sqrt((qmat * qmat).sum(axis=1, keepdims=True))
    qnrm[qnrm == 0.0] = 1.0
    qsub = (qmat / qnrm).reshape(q_ids.size, m, dsub)
    # ADC lookup tables: (|Q|, m, ks) sub-inner-products
    luts = np.einsum("qmd,mkd->qmk", qsub, books)

    pcodes = pq_encode(vectors, books, id_col, vec_col)
    j_idx = np.arange(m)

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            codes = np.frombuffer(b"".join(pdf["pcode"]),
                                  dtype=np.uint8).reshape(n, m)
            ids = pdf[id_col].to_numpy(np.int64)
            out_q, out_i, out_a = [], [], []
            for qi in range(q_ids.size):
                # gather: approx[n] = sum_j lut[j, codes[:, j]]
                approx = luts[qi][j_idx[None, :], codes].sum(axis=1)
                keep = ids != q_ids[qi]
                bids, bcol = ids[keep], approx[keep]
                take = min(n_cand, bids.size)
                if take == 0:
                    continue
                sel = np.lexsort((bids, -bcol))[:take]
                out_q.append(np.full(take, q_ids[qi], dtype=np.int64))
                out_i.append(bids[sel])
                out_a.append(bcol[sel])
            if not out_q:
                continue
            yield pd.DataFrame({
                q_id_col: np.concatenate(out_q),
                id_col: np.concatenate(out_i),
                "approx": np.concatenate(out_a),
            })

    scored = pcodes.mapInPandas(
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
            .drop("_rk"))
