"""C4 cleaning filters (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning...", section 2.2) — the line- and page-level rules
every C4-style web-corpus pipeline applies before training:

line level (a line survives iff ALL hold):
  * ends in a terminal punctuation mark (. ! ? or a closing quote
    directly after one);
  * contains at least ``min_words`` words (the paper's 5);
  * does not contain the word "javascript" (case-insensitive).

page level (a page survives iff ALL hold):
  * at least ``min_sentences`` retained lines (the paper "discarded any
    page with fewer than 3 sentences"; retained lines end in terminal
    punctuation, so they stand in for sentences — documented
    approximation);
  * does not contain the phrase "lorem ipsum";
  * does not contain a curly bracket ``{``.

The paper's dirty-word-list rule is a lookup against a published list
not shipped here; `banned_words` accepts any list and defaults to
empty. The three-sentence-span dedup the paper applies afterwards is
`ops/dedup.py duplicate_substring_spans`.

Everything is PURE CATALYST: split -> F.filter with a codegen'd lambda
-> array_join; zero Python, zero shuffle — a projection that runs at
parquet-scan speed on any number of executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["c4_clean"]

# terminal punctuation, optionally followed by a closing quote
_TERMINAL_RE = r"""[.!?]["']?\s*$"""


def _line_keep(line, min_words: int):
    return (line.rlike(_TERMINAL_RE)
            & (F.size(F.split(F.trim(line), r"\s+")) >= min_words)
            & ~F.lower(line).contains("javascript"))


def c4_clean(docs: DataFrame, text_col: str = "text",
             min_words: int = 5, min_sentences: int = 3,
             banned_words: list | None = None) -> DataFrame:
    """Apply the C4 rules. Returns the input plus:
    ``clean_text`` (retained lines re-joined), ``n_lines`` /
    ``n_kept`` line counts, and the page verdicts ``has_lorem``,
    ``has_brace``, ``has_banned``, ``keep``."""
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(lines, lambda l: _line_keep(l, min_words))
    low = F.lower(F.col(text_col))
    banned = F.lit(False)
    for w in (banned_words or []):
        banned = banned | low.contains(w.lower())
    return (docs
            .withColumn("n_lines", F.size(lines))
            .withColumn("n_kept", F.size(kept))
            .withColumn("clean_text", F.array_join(kept, "\n"))
            .withColumn("has_lorem", low.contains("lorem ipsum"))
            .withColumn("has_brace", F.col(text_col).contains("{"))
            .withColumn("has_banned", banned)
            .withColumn("keep",
                        (F.col("n_kept") >= min_sentences)
                        & ~F.col("has_lorem") & ~F.col("has_brace")
                        & ~F.col("has_banned")))
