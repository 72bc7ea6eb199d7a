"""PII redaction: the C4/CCNet-style scrub pass every public text
pipeline applies before training.

Four pattern families, each replaced by a typed placeholder token and
counted per document: emails -> <EMAIL>, SSN-shaped ids -> <ID>,
IPv4 addresses -> <IP>, phone-shaped digit runs -> <PHONE>.

Patterns are RE2-compatible (no lookaround, ASCII classes) so the SAME
pattern strings run in Spark (Java regex) and DuckDB (RE2) — the
engine-independence rule every op here follows. Application order
matters and is fixed: email, id, ip, phone — an IPv4 or SSN is also a
"digit run with separators", so the more specific families must
consume their matches before the loose phone family sees the text;
counts are taken on the PROGRESSIVELY redacted text for the same
reason (each family counts only what it actually replaced).

Scale: one JVM-side projection chain (regexp_replace is codegen'd),
zero shuffle, runs at parquet-scan speed.

Recall caveat (documented, inherent to regex PII): obfuscated forms
("user at example dot com") are out of scope, same as the published
C4 scrub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact"]

# (kind, pattern, placeholder) in MANDATORY application order
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("id", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("phone", r"\+?[0-9][0-9\s().\-]{7,}[0-9]", "<PHONE>"),
)


def redact(df: DataFrame, text_col: str = "text",
           id_col: str = "doc_id") -> DataFrame:
    """Per-doc redaction: returns (id, redacted, n_email, n_id, n_ip,
    n_phone) with every PII span replaced by its placeholder."""
    cur = F.col(text_col)
    cols = [F.col(id_col)]
    counts = []
    for kind, pat, token in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(
            cur, F.lit(pat), F.lit(0))).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, F.lit(pat), F.lit(token))
    return df.select(*cols, cur.alias("redacted"), *counts)
