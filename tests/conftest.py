import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .appName("lucene_spark-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "6g")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_index(spark, tmp_path_factory):
    """A built index over a small deterministic corpus, shared by tests."""
    from lucene_spark.fixtures.transcripts import transcripts_df
    from lucene_spark.index import build_index
    out = str(tmp_path_factory.mktemp("idx"))
    src = transcripts_df(spark, n_convs=150, seed=42, partitions=4)
    build_index(spark, src, out, num_buckets=6)
    return out
