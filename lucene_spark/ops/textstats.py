"""Text analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting.

Everything is a single JVM-side projection (whole-stage codegen): at
100 TB these run at parquet-scan speed with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_expr

# tiny function-word list used for the quality/lang heuristics; the test
# corpus vocabulary includes 'the' and 'a'
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc token accounting: analyzer tokens, whitespace tokens,
    character classes. Returns exact integers (oracle-friendly)."""
    toks = tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_ws_tokens"),
        F.length(text_col).alias("n_chars"),
        F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")).alias("n_digit"),
    )


def text_quality(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality signals for corpus filtering: mean token length,
    alpha ratio, stopword ratio, max single-token dominance."""
    stop_arr = "array(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"
    toks = tokens_expr(text_col)
    base = df.select(F.col(id_col), F.col(text_col), toks.alias("toks"))
    return base.select(
        F.col(id_col),
        F.size("toks").alias("n_tokens"),
        F.round(F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
                / F.greatest(F.length(text_col), F.lit(1)), 4).alias("alpha_ratio"),
        F.round(F.expr(
            f"size(filter(toks, t -> array_contains({stop_arr}, t)))")
            / F.greatest(F.size("toks"), F.lit(1)), 4).alias("stopword_ratio"),
        F.round(F.expr(
            "aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x)")
            / F.greatest(F.size("toks"), F.lit(1)), 4).alias("mean_token_len"),
    )


def lang_profiles() -> list:
    """(lang, sorted function words) in deterministic PRIORITY order —
    the analyzer-chain stop sets double as language profiles (the
    classic function-word language-ID approach; a real system would
    add n-gram profiles, but function words alone separate these six
    well). Priority breaks argmax ties ('a' is a stop word in en, es
    and pt — an otherwise-tied doc reads as the earlier language)."""
    from ..kernels.de import GERMAN_STOP_WORDS
    from ..kernels.es import SPANISH_STOP_WORDS
    from ..kernels.fr import FRENCH_STOP_WORDS
    from ..kernels.it import ITALIAN_STOP_WORDS
    from ..kernels.pt import PORTUGUESE_STOP_WORDS
    from ..kernels.stem import ENGLISH_STOP_WORDS
    return [("en", sorted(ENGLISH_STOP_WORDS)),
            ("de", sorted(GERMAN_STOP_WORDS)),
            ("fr", sorted(FRENCH_STOP_WORDS)),
            ("es", sorted(SPANISH_STOP_WORDS)),
            ("pt", sorted(PORTUGUESE_STOP_WORDS)),
            ("it", sorted(ITALIAN_STOP_WORDS))]


def _lang_pred_over(d: DataFrame, keep: list) -> DataFrame:
    """Append a lang_pred column computed from d's `toks` array —
    shared by lang_id and analyze_by_lang (inline column, no join)."""
    counts = []
    for lang, words in lang_profiles():
        arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
        # coalesce: size(filter(NULL, ...)) is -1 under Spark's legacy
        # sizeOfNull, which would tie every count at -1 and classify a
        # NULL-text doc as the first profile instead of 'unk'
        counts.append(F.expr(
            f"size(filter(coalesce(toks, array()), "
            f"t -> array_contains({arr}, t)))")
            .alias(f"_n_{lang}"))
    d = d.select(*keep, *counts)
    m = F.greatest(*[F.col(f"_n_{lang}") for lang, _ in lang_profiles()])
    pred = F.when(m == 0, F.lit("unk"))
    for lang, _ in lang_profiles():
        pred = pred.when(F.col(f"_n_{lang}") == m, F.lit(lang))
    return d.select(*keep, pred.alias("lang_pred"))


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Function-word language ID over six profiles (en/de/fr/es/pt/it,
    the analyzer-chain stop sets): argmax of per-language function-word
    occurrence counts, priority tie-break, 'unk' when no profile hits.
    Pure Catalyst projection — six filter/size passes over the token
    array, no UDF, no shuffle."""
    toks = tokens_expr(text_col)
    d = df.select(F.col(id_col), toks.alias("toks"))
    return _lang_pred_over(d, [id_col])


# GPT-2-style byte-pair pretokenizer pattern, RE2-compatible subset:
# contractions, space-prefixed letter/number/punct runs, whitespace runs.
# The reference GPT-2 pattern's \s+(?!\S) lookahead (split trailing
# whitespace from the space that prefixes the next word) is NOT
# RE2-expressible; this subset merges those whitespace runs — piece
# counts differ from tiktoken by the number of multi-space gaps, which
# is the right trade for an engine-independent (Spark/DuckDB/RE2)
# training-budget estimator.
BPE_PRETOKEN_RE = (r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"
                   r"| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_token_stats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Training-budget token estimation: GPT-2-pretokenizer piece count
    per doc (the standard 'how many BPE tokens is this corpus' proxy —
    real BPE merges only split pieces further, so this lower-bounds the
    piece count and tracks it linearly) plus bytes-per-piece. One
    JVM-side projection, zero shuffle."""
    # DataFrame-API form: the pattern holds quotes/backslashes that a
    # SQL string literal would mangle
    pieces = F.regexp_extract_all(F.col(text_col),
                                  F.lit(BPE_PRETOKEN_RE), F.lit(0))
    return df.select(
        F.col(id_col),
        F.size(pieces).alias("n_pieces"),
        F.length(text_col).alias("n_chars"),
        F.round(F.length(text_col)
                / F.greatest(F.size(pieces), F.lit(1)), 4)
        .alias("chars_per_piece"))


# Gopher rule 'required stop words' list (Rae et al. 2021 A1.1: at
# least 2 of these 8 must appear)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_tokens: int = 50, max_tokens: int = 100_000,
                   min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   min_alpha_word_frac: float = 0.8,
                   min_stopwords: int = 2,
                   max_top2: float = 0.20,
                   max_dup5: float = 0.15) -> DataFrame:
    """Composite Gopher quality-filter verdict (Rae et al. 2021 A1.1
    thresholds as defaults): one boolean per published rule plus the
    conjunction ``keep``. Everything except the two repetition
    fractions is a pure projection; those come from
    ``repetition_signals`` (tf-shaped shuffles)."""
    stop_arr = "array(" + ", ".join(f"'{s}'" for s in GOPHER_STOPS) + ")"
    toks = tokens_expr(text_col)
    base = df.select(F.col(id_col), F.col(text_col), toks.alias("toks"))
    mean_len = (F.expr("aggregate(transform(toks, t -> length(t)), 0L, "
                       "(a, x) -> a + x)")
                / F.greatest(F.size("toks"), F.lit(1)))
    # symbol-to-word numerator: '#' occurrences + '...' occurrences
    n_sym = ((F.length(text_col)
              - F.length(F.regexp_replace(F.col(text_col), "#", "")))
             + (F.length(text_col)
                - F.length(F.regexp_replace(
                    F.col(text_col), r"\.\.\.", ""))) / F.lit(3))
    ws_words = F.split(F.trim(F.col(text_col)), r"\s+")
    alpha_frac = (F.expr("size(filter(split(trim(" + text_col + "), "
                         "'\\\\s+'), w -> w rlike '[A-Za-z]'))")
                  / F.greatest(F.size(ws_words), F.lit(1)))
    n_stop = F.expr(
        f"size(filter(toks, t -> array_contains({stop_arr}, t)))")
    sig = base.select(
        F.col(id_col),
        F.size("toks").alias("n_tokens"),
        (F.size("toks").between(min_tokens, max_tokens)).alias("ok_len"),
        mean_len.between(min_mean_len, max_mean_len).alias("ok_mean_len"),
        ((n_sym / F.greatest(F.size("toks"), F.lit(1)))
         <= max_symbol_ratio).alias("ok_symbols"),
        (alpha_frac >= min_alpha_word_frac).alias("ok_alpha"),
        (n_stop >= min_stopwords).alias("ok_stopwords"))
    rep = repetition_signals(df, text_col, id_col).select(
        id_col,
        (F.col("top_2gram_frac") <= max_top2).alias("ok_top2"),
        (F.col("dup_5gram_frac") <= max_dup5).alias("ok_dup5"))
    out = sig.join(rep, id_col)
    rules = ["ok_len", "ok_mean_len", "ok_symbols", "ok_alpha",
             "ok_stopwords", "ok_top2", "ok_dup5"]
    keep = F.lit(True)
    for r in rules:
        keep = keep & F.col(r)
    return out.select(id_col, "n_tokens", *rules, keep.alias("keep"))


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher/MassiveText-style within-document repetition filters
    (Rae et al. 2021, appendix A1.1 — the published recipe every
    large-scale text pipeline applies before training):

    - ``dup_token_frac``: 1 - distinct_tokens / n_tokens — word-level
      repetitiveness. Pure projection, zero shuffle.
    - ``top_2gram_frac``: character mass (occurrences x gram chars) of
      the heaviest word 2-gram over the total 2-gram character mass.
      (Mass-of-heaviest rather than count-of-argmax sidesteps argmax
      tie ambiguity; the filter thresholds behave the same.)
    - ``dup_5gram_frac``: character mass of 5-grams occurring more
      than once over the total 5-gram character mass.

    The n-gram fractions group the exploded gram stream by
    (doc, gram) — the same map-side-combinable shuffle shape as a tf
    computation, uniform keys, scale-safe. Docs shorter than n tokens
    report 0.0 for that signal.
    """
    from .dedup import shingles_expr
    base = (df.select(F.col(id_col), tokens_expr(text_col).alias("toks"))
            .persist())

    def _gram_frac(n: int, expr_sel, out_name: str) -> DataFrame:
        g = (base.select(id_col,
                         F.explode(shingles_expr("toks", n)).alias("g"))
             .groupBy(id_col, "g").agg(F.count("*").alias("c"))
             .groupBy(id_col)
             .agg(F.round(expr_sel, 4).alias(out_name)))
        return g

    top2 = _gram_frac(
        2, F.max(F.col("c") * F.length("g"))
        / F.sum(F.col("c") * F.length("g")), "top_2gram_frac")
    dup5 = _gram_frac(
        5, F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("g"))
                 .otherwise(F.lit(0)))
        / F.sum(F.col("c") * F.length("g")), "dup_5gram_frac")
    out = (base.select(
        id_col,
        F.size("toks").alias("n_tokens"),
        F.round(F.lit(1.0) - F.size(F.array_distinct("toks"))
                / F.greatest(F.size("toks"), F.lit(1)), 4)
        .alias("dup_token_frac"))
        .join(top2, id_col, "left").join(dup5, id_col, "left")
        .select(id_col, "n_tokens", "dup_token_frac",
                F.coalesce("top_2gram_frac", F.lit(0.0))
                .alias("top_2gram_frac"),
                F.coalesce("dup_5gram_frac", F.lit(0.0))
                .alias("dup_5gram_frac")))
    return out


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Normalized document fingerprint: md5 over the analyzed token
    stream — whitespace/case-insensitive content identity."""
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", tokens_expr(text_col))).alias("fp"))


LANG_CHAINS = {"en": "english", "de": "german", "fr": "french",
               "es": "spanish", "pt": "portuguese", "it": "italian",
               "unk": "standard"}


def analyze_by_lang(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Route every document through ITS language's analyzer chain:
    lang_id picks the profile, then each Arrow batch groups rows by
    predicted language and runs the batch-vectorized chain per group
    (analyze_series factorizes each group's vocabulary once). The
    scale shape: one projection for the language, one mapInPandas for
    the analysis — no shuffle, no per-row Python. This is the
    multilingual normalization pass a mixed-language corpus needs
    before cross-language dedup / fingerprinting (stemmed tokens
    unify inflections within each language).

    Returns (id_col, lang_pred, tokens array<string>).
    """
    import pandas as pd

    from ..kernels.tokenizer import analyze_series

    toks = tokens_expr(text_col)
    with_lang = _lang_pred_over(
        df.select(F.col(id_col), F.col(text_col), toks.alias("toks")),
        [id_col, text_col])

    def run(batches):
        for pdf in batches:
            out = pd.Series([None] * len(pdf), dtype=object)
            for lang, idx in pdf.groupby("lang_pred").groups.items():
                chain = LANG_CHAINS.get(str(lang), "standard")
                toks = analyze_series(pdf.loc[idx, text_col], chain)
                out.loc[idx] = toks.apply(list)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "lang_pred": pdf["lang_pred"],
                                "tokens": out})

    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType)
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("lang_pred", StringType()),
        StructField("tokens", ArrayType(StringType())),
    ])
    return with_lang.mapInPandas(run, schema)
