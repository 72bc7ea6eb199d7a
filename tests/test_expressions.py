"""Lucene expressions module compiled to Catalyst SQL.

Reference: expressions/src/java/org/apache/lucene/expressions/js/
Javascript.g4 (grammar), JavascriptCompiler.java (double-only
semantics), JavascriptCompiler.properties (function table).
"""

from __future__ import annotations

import math

import pytest

from lucene_spark.search.expressions import (FUNCTIONS,
                                             JavascriptParseError,
                                             compile_expression)
from lucene_spark.search.query import TermQuery

# (source, expected) — Java-semantics battery evaluated through Spark
CASES = [
    # precedence ladder (Javascript.g4)
    ("1 + 2 * 3", 7.0),
    ("(1 + 2) * 3", 9.0),
    ("2 + 3 << 1", 10.0),            # shift binds looser than addsub
    ("1 | 2 ^ 3 & 2", 1.0),          # 1 | (2 ^ (3 & 2)) = 1 | 0
    ("0x1F + 010", 39.0),            # hex + octal literals
    ("1e2 + .5", 100.5),
    # booleans are 1.0/0.0 doubles; truthiness is != 0
    ("2 < 3", 1.0),
    ("2 < 3 == 1", 1.0),
    ("3 && 0", 0.0),
    ("3 || 0", 1.0),
    ("!0", 1.0),
    ("!2.5", 0.0),
    ("0 ? 5 : 6", 6.0),
    ("1 ? 2 ? 3 : 4 : 5", 3.0),      # right-assoc conditional
    ("2 == 2 ? 10 : 20", 10.0),
    # bitwise on (long) casts, back to double
    ("5 & 3", 1.0),
    ("5 | 2", 7.0),
    ("5 ^ 1", 4.0),
    ("1 << 3", 8.0),
    ("-8 >> 1", -4.0),
    ("-8 >>> 60", 15.0),
    ("~5", -6.0),
    ("1 << 65", 2.0),                # Java masks shift count to 6 bits
    # function table (JavascriptCompiler.properties)
    ("min(4, 2) + max(1, 3)", 5.0),
    ("logn(2, 8)", 3.0),
    ("pow(2, 10)", 1024.0),
    ("sqrt(16)", 4.0),
    ("abs(0 - 7)", 7.0),
    ("ceil(1.2) + floor(1.8)", 3.0),
    ("atan2(1, 1)", math.atan2(1, 1)),
    ("exp(2)", math.exp(2)),
    ("cosh(1) - sinh(1)", math.cosh(1) - math.sinh(1)),
    # Java double edges (ANSI Spark would error / NULL these natively)
    ("1.0 / 0.0", math.inf),
    ("0 - 1.0 / 0.0", -math.inf),
    ("5 % 0", float("nan")),
    ("5.5 % 2", 1.5),
    ("-5 % 3", -2.0),
    ("ln(0)", -math.inf),
    ("ln(-1)", float("nan")),
    ("sqrt(0-1)", float("nan")),
    # (long) cast edges: NaN -> 0, overflow clamps (JLS 5.1.3)
    ("(0.0/0.0) & 1", 0.0),
    ("(1.0e300 * 1.0e300) & 7", 7.0),
    ("--3", 3.0),
    ("-2^1", -1.0),
]


def test_battery_matches_java_semantics(spark):
    exprs = [compile_expression(s) for s, _ in CASES]
    row = spark.sql("SELECT " + ", ".join(
        f"{e} AS c{i}" for i, e in enumerate(exprs))).collect()[0]
    for i, (src, want) in enumerate(CASES):
        got = row[i]
        assert got is not None, src
        if isinstance(want, float) and math.isnan(want):
            assert math.isnan(got), src
        else:
            assert got == pytest.approx(want, rel=1e-12), src


def test_haversin(spark):
    # Berlin -> Paris great-circle ~878 km (exact haversine at the
    # IUGG mean radius; documented deviation from SloppyMath's
    # table approximation, error bound ~40 cm)
    e = compile_expression("haversin(52.52, 13.405, 48.8566, 2.3522)")
    km = spark.sql(f"SELECT {e} AS d").collect()[0][0]
    assert 870 < km < 890
    e2 = compile_expression(
        "haversinMeters(52.52, 13.405, 48.8566, 2.3522)")
    m = spark.sql(f"SELECT {e2} AS d").collect()[0][0]
    assert m == pytest.approx(km * 1000.0, rel=1e-9)


def test_bindings(spark):
    sql = compile_expression("_score * 2 + boost",
                             {"_score": "s", "boost": "b"})
    got = spark.sql(f"SELECT {sql} AS v FROM VALUES (1.5D, 0.25D) "
                    f"t(s, b)").collect()[0][0]
    assert got == 3.25
    # default bindings read same-named columns
    sql = compile_expression("x + y")
    got = spark.sql(f"SELECT {sql} AS v FROM VALUES (1, 2) "
                    f"t(x, y)").collect()[0][0]
    assert got == 3.0


def test_parse_errors():
    for src in ("1 +", "(1", "nosuchfn(1)", "min(1)", "min(1,2,3)",
                "1 2", "?", "a.b"):  # a.b: dotted needs explicit binding
        with pytest.raises(JavascriptParseError):
            compile_expression(src)
    with pytest.raises(JavascriptParseError):
        # bindings provided -> unbound name is an error
        compile_expression("x + y", {"x": "x"})
    # dotted/indexed variables work WITH a binding
    sql = compile_expression("a.b + c['d']",
                             {"a.b": "1.0D", "c['d']": "2.0D"})
    assert sql  # compiles


def test_function_table_is_reference_complete():
    # every name in JavascriptCompiler.properties
    want = {"abs", "acos", "acosh", "asin", "asinh", "atan", "atan2",
            "atanh", "ceil", "cos", "cosh", "exp", "floor", "haversin",
            "haversinMeters", "ln", "log10", "logn", "max", "min",
            "pow", "sin", "sinh", "sqrt", "tan", "tanh"}
    assert set(FUNCTIONS) == want


def test_rescore_with_compiled_expression(spark, small_index):
    """Expression-driven rescoring through the real searcher
    (expressions/ExpressionRescorer path)."""
    from collections import Counter

    from lucene_spark.index.catalog import IndexCatalog
    from lucene_spark.kernels.tokenizer import tokenize_one
    from lucene_spark.search import IndexSearcher
    s = IndexSearcher(spark, small_index)
    cat = IndexCatalog(small_index)
    texts = (spark.read.parquet(cat.table_path("docstore"))
             .select("text").limit(50).toPandas()["text"])
    probe = Counter(t for x in texts for t in tokenize_one(x)) \
        .most_common(1)[0][0]
    top = s.search_df(TermQuery(probe), k=20)
    sql = compile_expression(
        "sqrt(_score) + (token_count > 10 ? 0.5 : 0.0)",
        {"_score": "score", "token_count": "token_count"})
    got = s.rescore(top, sql, k=10).toPandas()
    # recompute driver-side
    base = top.join(s.retrieve(top).select("doc_id", "token_count"),
                    "doc_id").toPandas()
    import numpy as np
    ns = np.sqrt(base["score"].to_numpy(dtype=np.float64)) + \
        np.where(base["token_count"].to_numpy() > 10, 0.5, 0.0)
    base["ns"] = ns
    want = (base.sort_values(["ns", "doc_id"],
                             ascending=[False, True]).head(10))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["new_score"].to_numpy() == pytest.approx(
        want["ns"].to_numpy(), rel=1e-9)
