"""Lucene-compatible BM25 scoring, bit-exact in float32.

Behavior-parity port of
``lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java``:

- ``idf``            (BM25Similarity.java:101-104): double interior math,
  *naive* ``Math.log(1 + x)`` (NOT log1p), cast to float32.
- ``avgFieldLength`` (BM25Similarity.java:106-109): ``(float)(sumTTF/(double)docCount)``.
- norm-inverse cache (BM25Similarity.java:181-187): 256 float32 entries
  ``1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))`` computed in
  float32 arithmetic exactly as Java does.
- score              (BM25Similarity.java:221-237): the *rewritten*
  monotone form ``weight - weight / (1 + freq * normInverse)`` — we
  replicate this form, not the textbook formula, because float32
  rounding differs between the two and rank-identity demands the same
  bits.
- multi-term idf     (BM25Similarity.java:161-170): per-term float32 idfs
  summed in double, cast to float32 (used for phrase/synonym weights).

Defaults k1=1.2, b=0.75, discountOverlaps=true (BM25Similarity.java:84-99).
``computeNorm`` (Similarity.java:153-163) is ``intToByte4(numTerms)`` —
see :mod:`lucene_spark.kernels.smallfloat`.

All functions are numpy-vectorized; executed inside Arrow-batched pandas
kernels on executors (no per-row Python).
"""

from __future__ import annotations

import numpy as np

from .smallfloat import LENGTH_TABLE

__all__ = ["idf", "sum_idf", "avg_field_length", "norm_inverse_cache",
           "bm25_score", "BM25Scorer", "ClassicScorer", "LMDirichletScorer",
           "LMJelinekMercerScorer", "AxiomaticF2EXPScorer",
           "DFRInLH2Scorer", "IBLLDScorer", "DFIScorer", "dfi_scorer",
           "BooleanScorer", "SweetSpotScorer", "sweetspot_scorer",
           "IndriDirichletScorer", "RawTFScorer", "multi_scorer"]

K1_DEFAULT = np.float32(1.2)
B_DEFAULT = np.float32(0.75)


def idf(doc_freq, doc_count) -> np.float32:
    """float32(log(1 + (N - n + 0.5) / (n + 0.5))) with double interior."""
    df = np.asarray(doc_freq, dtype=np.float64)
    n = np.float64(doc_count)
    val = np.log(1.0 + (n - df + 0.5) / (df + 0.5))  # naive log(1+x) like Java
    return np.float32(val) if np.ndim(doc_freq) == 0 else val.astype(np.float32)


def sum_idf(idfs_f32) -> np.float32:
    """Multi-term idf: sum float32 idfs in double, cast to float32
    (BM25Similarity.java:161-170)."""
    total = np.float64(0.0)
    for v in np.asarray(idfs_f32, dtype=np.float32):
        total += np.float64(v)
    return np.float32(total)


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """(float)(sumTotalTermFreq / (double) docCount) (BM25Similarity.java:106-109)."""
    return np.float32(np.float64(sum_total_term_freq) / np.float64(doc_count))


def norm_inverse_cache(avgdl: np.float32, k1=K1_DEFAULT, b=B_DEFAULT) -> np.ndarray:
    """256-entry float32 cache: 1f/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl)).

    Every operation is float32, matching the Java float expression order
    (BM25Similarity.java:185).
    """
    k1 = np.float32(k1)
    b = np.float32(b)
    one = np.float32(1.0)
    avgdl = np.float32(avgdl)
    # Java evaluation order: (1 - b) + b * LENGTH_TABLE[i] / avgdl
    #   => (b * LENGTH_TABLE[i]) / avgdl, then add (1-b), then k1 *, then 1/.
    t = (b * LENGTH_TABLE) / avgdl
    denom = k1 * ((one - b) + t)
    return (one / denom).astype(np.float32)


def bm25_score(freqs, norm_codes, weight: np.float32, cache: np.ndarray) -> np.ndarray:
    """Vectorized BM25Scorer.score (BM25Similarity.java:221-237).

    freqs: int/float array of term frequencies; norm_codes: uint8 norm
    bytes; weight = float32(boost * idf); cache from norm_inverse_cache.
    Returns float32 scores: ``weight - weight / (1 + freq * normInverse)``.
    """
    f = np.asarray(freqs).astype(np.float32)
    ni = cache[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
    one = np.float32(1.0)
    w = np.float32(weight)
    return (w - w / (one + f * ni)).astype(np.float32)


class LMDirichletScorer:
    """LM Dirichlet smoothing scorer (core:search/similarities/
    LMDirichletSimilarity.java:60-79): score = boost * (log(1 + tf /
    (mu * p_col)) + log(mu / (dl + mu))), clamped at 0, where p_col =
    (ttf + 1) / (sum_ttf + 1) (LMSimilarity.java collection model) and
    dl is the decoded SmallFloat length. mu defaults to 2000.

    Needs the term's total term frequency — scorer factories receive
    it via the optional ``ttf`` kwarg (BM25/Classic ignore it)."""

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int,
                 boost: float = 1.0, ttf: int = 0, mu: float = 2000.0):
        self.mu = np.float64(mu)
        self.p_col = np.float64(ttf + 1.0) / np.float64(sum_ttf + 1.0)
        self.boost = np.float32(boost)
        self.idf = np.float32(-np.log(self.p_col))  # for explain()
        self.weight = self.boost
        dl = LENGTH_TABLE.astype(np.float64)
        self.norm_table = np.log(self.mu / (dl + self.mu))

    def score(self, freqs, norm_codes) -> np.ndarray:
        f = np.asarray(freqs, dtype=np.float64)
        ln = self.norm_table[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
        s = np.float64(self.boost) * (np.log1p(f / (self.mu * self.p_col))
                                      + ln)
        return np.maximum(s, 0.0).astype(np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        s = self.score(np.asarray(freqs), np.asarray(norm_codes))
        return np.float32(s.max()) if s.size else np.float32(0.0)


class LMJelinekMercerScorer:
    """LM Jelinek-Mercer smoothing (core:search/similarities/
    LMJelinekMercerSimilarity.java:55-65): score = boost * log(1 +
    ((1 - λ) * tf / dl) / (λ * p_col)) with the LMSimilarity collection
    model p_col = (ttf + 1) / (sum_ttf + 1) and the decoded SmallFloat
    length dl. λ defaults to 0.1 (title-query guidance). Scores are
    always > 0 for tf > 0."""

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int,
                 boost: float = 1.0, ttf: int = 0, lam: float = 0.1):
        self.lam = np.float64(lam)
        self.p_col = np.float64(ttf + 1.0) / np.float64(sum_ttf + 1.0)
        self.boost = np.float32(boost)
        self.idf = np.float32(-np.log(self.p_col))  # for explain()
        self.weight = self.boost
        self.dl_table = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs, norm_codes) -> np.ndarray:
        f = np.asarray(freqs, dtype=np.float64)
        dl = self.dl_table[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
        s = np.float64(self.boost) * np.log1p(
            ((1.0 - self.lam) * f / np.maximum(dl, 1.0))
            / (self.lam * self.p_col))
        return s.astype(np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        s = self.score(np.asarray(freqs), np.asarray(norm_codes))
        return np.float32(s.max()) if s.size else np.float32(0.0)


class AxiomaticF2EXPScorer:
    """Axiomatic F2EXP (core:search/similarities/AxiomaticF2EXP.java):
    score = boost * tf/(tf + s + s*dl/avgdl) * ((N + 1)/df)^k with
    s = 0.5, k = 0.35 — the axiomatic retrieval family's length-
    normalized tf times a power idf. Double interior, float32 out."""

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int,
                 boost: float = 1.0, ttf: int = 0,
                 s: float = 0.5, k: float = 0.35):
        self.s = np.float64(s)
        self.avgdl = np.float64(avg_field_length(sum_ttf, doc_count))
        self.idf = np.float32(
            np.power((doc_count + 1.0) / np.float64(doc_freq), k))
        self.boost = np.float32(boost)
        self.weight = np.float32(np.float32(boost) * self.idf)
        self.dl_table = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs, norm_codes) -> np.ndarray:
        f = np.asarray(freqs, dtype=np.float64)
        dl = self.dl_table[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
        tfn = f / (f + self.s + self.s * dl / self.avgdl)
        return (np.float64(self.weight) * tfn).astype(np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        s = self.score(np.asarray(freqs), np.asarray(norm_codes))
        return np.float32(s.max()) if s.size else np.float32(0.0)


class DFRInLH2Scorer:
    """DFR similarity, BasicModel I(n) + AfterEffect L + Normalization
    H2 (core:search/similarities/DFRSimilarity.java:127-131,
    BasicModelIn.java:34-44, AfterEffectL.java:32 [scoreTimes1pTfn = 1],
    NormalizationH2.java:57): tfn = tf·log2(1 + c·avgdl/dl) with c=1;
    score = boost · log2((N+1)/(df+0.5)) · tfn/(1+tfn). Double interior
    like SimilarityBase, float32 cast at the end."""

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int,
                 boost: float = 1.0, ttf: int = 0, c: float = 1.0):
        self.A = np.float64(np.log2((doc_count + 1.0) / (doc_freq + 0.5)))
        self.avgdl = np.float64(sum_ttf) / np.float64(doc_count)
        self.c = np.float64(c)
        self.boost = np.float32(boost)
        self.idf = np.float32(self.A)  # for explain()
        self.weight = np.float32(np.float32(boost) * self.idf)
        self.dl_table = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs, norm_codes) -> np.ndarray:
        f = np.asarray(freqs, dtype=np.float64)
        dl = self.dl_table[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
        tfn = f * np.log2(1.0 + self.c * self.avgdl / np.maximum(dl, 1.0))
        s = np.float64(self.boost) * self.A * (1.0 - 1.0 / (1.0 + tfn))
        return s.astype(np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        s = self.score(np.asarray(freqs), np.asarray(norm_codes))
        return np.float32(s.max()) if s.size else np.float32(0.0)


class IBLLDScorer:
    """Information-based similarity, Distribution LL + Lambda DF +
    Normalization H2 (core:search/similarities/IBSimilarity.java:115-117,
    DistributionLL.java:33-34, LambdaDF.java:32-39): λ = float32((df+1)/
    (N+1)); tfn = tf·log2(1 + avgdl/dl); score = boost · −ln(λ/(tfn+λ))."""

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int,
                 boost: float = 1.0, ttf: int = 0):
        lam = np.float32((doc_freq + 1.0) / (doc_count + 1.0))
        if lam == np.float32(1.0):
            lam = np.nextafter(lam, np.float32(0.0))
        self.lam = np.float64(lam)
        self.avgdl = np.float64(sum_ttf) / np.float64(doc_count)
        self.boost = np.float32(boost)
        self.idf = np.float32(-np.log(self.lam))  # for explain()
        self.weight = self.boost
        self.dl_table = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs, norm_codes) -> np.ndarray:
        f = np.asarray(freqs, dtype=np.float64)
        dl = self.dl_table[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
        tfn = f * np.log2(1.0 + self.avgdl / np.maximum(dl, 1.0))
        s = np.float64(self.boost) * -np.log(self.lam / (tfn + self.lam))
        return s.astype(np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        s = self.score(np.asarray(freqs), np.asarray(norm_codes))
        return np.float32(s.max()) if s.size else np.float32(0.0)


class ClassicScorer:
    """TF-IDF (ClassicSimilarity) scorer — demonstrates the pluggable
    Similarity extension point (core:search/similarities/
    ClassicSimilarity.java / TFIDFSimilarity): tf = sqrt(freq),
    idf = 1 + ln((docCount+1)/(docFreq+1)), lengthNorm = 1/sqrt(length)
    with the decoded SmallFloat length. Same float32 discipline as the
    BM25 kernel; same (scorer.score(freqs, norm_codes)) interface, so
    every query kernel accepts it unchanged.
    """

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int = 0,
                 boost: float = 1.0, ttf: int = 0):
        idf_d = 1.0 + np.log((doc_count + 1.0) / (doc_freq + 1.0))
        self.idf = np.float32(idf_d)
        self.weight = np.float32(np.float32(boost) * self.idf * self.idf)
        inv_sqrt = 1.0 / np.sqrt(np.maximum(LENGTH_TABLE.astype(np.float64), 1.0))
        self.norm_table = inv_sqrt.astype(np.float32)

    def score(self, freqs, norm_codes) -> np.ndarray:
        tf = np.sqrt(np.asarray(freqs).astype(np.float32))
        ln = self.norm_table[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
        return (self.weight * tf * ln).astype(np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        s = self.score(np.asarray(freqs), np.asarray(norm_codes))
        return np.float32(s.max()) if s.size else np.float32(0.0)


class BM25Scorer:
    """Per-(field, term-set) scorer bound to collection stats, mirroring
    Lucene's Weight/SimScorer binding (TermQuery.java:64-82).

    max_score(freq_cap) gives the same upper bound Lucene derives from
    impacts: score is monotone in freq and in decoded length descending,
    so the bound for an (freq, norm) impact is just bm25_score at it.
    """

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int,
                 k1=K1_DEFAULT, b=B_DEFAULT, boost: float = 1.0,
                 ttf: int = 0):
        self.idf = idf(doc_freq, doc_count)
        self.avgdl = avg_field_length(sum_ttf, doc_count)
        self.cache = norm_inverse_cache(self.avgdl, k1, b)
        self.weight = np.float32(np.float32(boost) * self.idf)

    def score(self, freqs, norm_codes) -> np.ndarray:
        return bm25_score(freqs, norm_codes, self.weight, self.cache)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        """Upper bound over a block's competitive (freq, norm) skyline
        (MaxScoreCache.java:19-159 computes exactly score(freq, norm))."""
        s = self.score(np.asarray(freqs), np.asarray(norm_codes))
        return np.float32(s.max()) if s.size else np.float32(0.0)


class DFIScorer:
    """Divergence from Independence (core:search/similarities/
    DFISimilarity.java:70-81): expected = (ttf + 1) * dl /
    (sum_ttf + 1); score = 0 when freq <= expected, else boost *
    log2(independence(freq, expected) + 1) with the three reference
    measures (IndependenceChiSquared.java:33 (f-e)^2/e,
    IndependenceStandardized.java:33 (f-e)/sqrt(e),
    IndependenceSaturated.java:31 (f-e)/e). Parameter-free; the
    reference javadoc recommends NOT removing stop words with it.
    Double interior like SimilarityBase, float32 cast at the end."""

    MEASURES = ("chi_squared", "standardized", "saturated")

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int,
                 boost: float = 1.0, ttf: int = 0,
                 independence: str = "chi_squared"):
        if independence not in self.MEASURES:
            raise ValueError(f"unknown independence {independence!r}")
        self.independence = independence
        self.exp_per_dl = np.float64(ttf + 1.0) / np.float64(sum_ttf + 1.0)
        self.boost = np.float32(boost)
        self.idf = np.float32(-np.log(self.exp_per_dl))  # for explain()
        self.weight = self.boost
        self.dl_table = LENGTH_TABLE.astype(np.float64)

    def _measure(self, f, e):
        if self.independence == "chi_squared":
            return (f - e) * (f - e) / e
        if self.independence == "standardized":
            return (f - e) / np.sqrt(e)
        return (f - e) / e

    def score(self, freqs, norm_codes) -> np.ndarray:
        f = np.asarray(freqs, dtype=np.float64)
        dl = self.dl_table[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
        e = self.exp_per_dl * dl
        s = np.float64(self.boost) * np.log2(self._measure(f, e) + 1.0)
        return np.where(f <= e, 0.0, s).astype(np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        s = self.score(np.asarray(freqs), np.asarray(norm_codes))
        return np.float32(s.max()) if s.size else np.float32(0.0)


def dfi_scorer(independence: str):
    """Factory-of-factories: IndexSearcher(similarity=
    dfi_scorer("standardized")) — mirrors new DFISimilarity(measure)."""
    def _make(doc_freq, doc_count, sum_ttf, boost=1.0, ttf=0):
        return DFIScorer(doc_freq, doc_count, sum_ttf, boost=boost,
                         ttf=ttf, independence=independence)
    return _make


class BooleanScorer:
    """BooleanSimilarity (core:search/similarities/
    BooleanSimilarity.java:50-52): every match scores exactly the query
    boost — frequency, norms, and collection stats are ignored."""

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int = 0,
                 boost: float = 1.0, ttf: int = 0):
        self.boost = np.float32(boost)
        self.idf = np.float32(1.0)  # for explain()
        self.weight = self.boost

    def score(self, freqs, norm_codes) -> np.ndarray:
        return np.full(np.asarray(freqs).shape, self.boost,
                       dtype=np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        return self.boost if np.asarray(freqs).size else np.float32(0.0)


class SweetSpotScorer:
    """SweetSpotSimilarity (misc:SweetSpotSimilarity.java:111-147): the
    ClassicSimilarity TF-IDF family with a plateau — lengthNorm(dl) =
    1/sqrt(steep*(|dl-ln_min| + |dl-ln_max| - (ln_max-ln_min)) + 1)
    is flat 1.0 inside [ln_min, ln_max], and baselineTf(f) = base for
    0 < f <= tf_min else sqrt(f + base^2 - tf_min). With the defaults
    (ln 1..1 steep .5, tf 0/0) it degrades to ClassicScorer exactly.
    The reference bakes lengthNorm into the index-time norm byte; this
    engine stores SmallFloat length codes, so the same function runs at
    query time over the decoded length — identical up to the shared
    SmallFloat quantization (same trade ClassicScorer documents)."""

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int = 0,
                 boost: float = 1.0, ttf: int = 0,
                 ln_min: int = 1, ln_max: int = 1, steepness: float = 0.5,
                 tf_base: float = 0.0, tf_min: float = 0.0):
        idf_d = 1.0 + np.log((doc_count + 1.0) / (doc_freq + 1.0))
        self.idf = np.float32(idf_d)
        self.weight = np.float32(np.float32(boost) * self.idf * self.idf)
        self.tf_base = np.float64(tf_base)
        self.tf_min = np.float64(tf_min)
        dl = np.maximum(LENGTH_TABLE.astype(np.float64), 1.0)
        raw = (steepness * (np.abs(dl - ln_min) + np.abs(dl - ln_max)
                            - (ln_max - ln_min)) + 1.0)
        self.norm_table = (1.0 / np.sqrt(raw)).astype(np.float32)

    def score(self, freqs, norm_codes) -> np.ndarray:
        f = np.asarray(freqs, dtype=np.float64)
        tf = np.where(f <= self.tf_min, self.tf_base,
                      np.sqrt(np.maximum(
                          f + self.tf_base * self.tf_base - self.tf_min,
                          0.0)))
        tf = np.where(f == 0.0, 0.0, tf).astype(np.float32)
        ln = self.norm_table[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
        return (self.weight * tf * ln).astype(np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        """CONSERVATIVE bound: the plateau makes lengthNorm NON-monotone
        in dl (it rises toward ln_min from below), which violates the
        impact skyline's dominance assumption (scores non-increasing in
        norm — CompetitiveImpactAccumulator's contract); a dominated
        (freq, shorter-doc) pair could out-score every kept pair. Bound
        with the block's max freq times the GLOBAL max lengthNorm —
        looser but always an upper bound, so pruned == exhaustive."""
        f = np.asarray(freqs)
        if not f.size:
            return np.float32(0.0)
        fmax = np.float64(f.max())
        if fmax == 0.0:
            return np.float32(0.0)
        tf = (self.tf_base if fmax <= self.tf_min
              else np.sqrt(max(fmax + self.tf_base * self.tf_base
                               - self.tf_min, 0.0)))
        return np.float32(self.weight * np.float32(tf)
                          * self.norm_table.max())


def sweetspot_scorer(ln_min: int, ln_max: int, steepness: float = 0.5,
                     tf_base: float = 0.0, tf_min: float = 0.0):
    """Factory-of-factories mirroring setLengthNormFactors /
    setBaselineTfFactors: IndexSearcher(similarity=
    sweetspot_scorer(40, 120))."""
    def _make(doc_freq, doc_count, sum_ttf, boost=1.0, ttf=0):
        return SweetSpotScorer(doc_freq, doc_count, sum_ttf, boost=boost,
                               ttf=ttf, ln_min=ln_min, ln_max=ln_max,
                               steepness=steepness, tf_base=tf_base,
                               tf_min=tf_min)
    return _make


class IndriDirichletScorer:
    """Indri's Dirichlet-smoothed query likelihood (core:search/
    similarities/IndriDirichletSimilarity.java:69-73): score = boost *
    log((tf + mu * p_col) / (dl + mu)) with the Indri collection model
    p_col = ttf / sum_ttf (IndriDirichletSimilarity.java:96-100 — NOT
    the (ttf+1)/(sum_ttf+1) default model) and NO zero clamp: scores
    are log-probabilities and normally NEGATIVE. The pruning kernels
    initialize theta at -inf and compare plainly, so block-max pruning
    stays exact (property-tested pruned == exhaustive)."""

    negative_scores = True  # kernels drop the 0.0 window floor

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int,
                 boost: float = 1.0, ttf: int = 0, mu: float = 2000.0):
        self.mu = np.float64(mu)
        self.p_col = np.float64(ttf) / np.float64(max(sum_ttf, 1))
        self.boost = np.float32(boost)
        self.idf = np.float32(-np.log(max(self.p_col, 1e-12)))
        self.weight = self.boost
        self.dl_table = LENGTH_TABLE.astype(np.float64)

    def score(self, freqs, norm_codes) -> np.ndarray:
        f = np.asarray(freqs, dtype=np.float64)
        dl = self.dl_table[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
        s = np.float64(self.boost) * np.log(
            (f + self.mu * self.p_col) / (dl + self.mu))
        return s.astype(np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        s = self.score(np.asarray(freqs), np.asarray(norm_codes))
        return np.float32(s.max()) if s.size else np.float32(-np.inf)


class RawTFScorer:
    """RawTFSimilarity (core:search/similarities/RawTFSimilarity.java):
    score = boost * freq — norms and collection stats ignored."""

    def __init__(self, doc_freq: int, doc_count: int, sum_ttf: int = 0,
                 boost: float = 1.0, ttf: int = 0):
        self.boost = np.float32(boost)
        self.idf = np.float32(1.0)  # for explain()
        self.weight = self.boost

    def score(self, freqs, norm_codes) -> np.ndarray:
        return (self.boost
                * np.asarray(freqs).astype(np.float32)).astype(np.float32)

    def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
        f = np.asarray(freqs)
        return (np.float32(self.boost * np.float32(f.max()))
                if f.size else np.float32(0.0))


def multi_scorer(*factories):
    """MultiSimilarity (core:search/similarities/MultiSimilarity.java:
    47-68): the combined score is the SUM of each sub-similarity's
    score at the same (freq, norm); each sub-scorer is built with the
    same boost and stats. IndexSearcher(similarity=
    multi_scorer(BM25Scorer, ClassicScorer))."""
    if not factories:
        raise ValueError("multi_scorer needs at least one similarity")

    class _Multi:
        def __init__(self, doc_freq, doc_count, sum_ttf, boost=1.0,
                     ttf=0):
            self.subs = [f(doc_freq, doc_count, sum_ttf, boost=boost,
                           ttf=ttf) for f in factories]
            self.idf = np.float32(sum(float(s.idf) for s in self.subs))
            self.weight = np.float32(sum(float(s.weight)
                                         for s in self.subs))
            self.negative_scores = any(
                getattr(s, "negative_scores", False) for s in self.subs)

        def score(self, freqs, norm_codes) -> np.ndarray:
            out = self.subs[0].score(freqs, norm_codes)
            for s in self.subs[1:]:
                out = out + s.score(freqs, norm_codes)
            return out.astype(np.float32)

        def max_score_for_impacts(self, freqs, norm_codes) -> np.float32:
            # sum of per-sub maxima over the same skyline upper-bounds
            # the max of the sum
            return np.float32(sum(
                float(s.max_score_for_impacts(freqs, norm_codes))
                for s in self.subs))

    return _Multi
