"""Proves the local parity gate is driver-faithful on integer types.

Round 2 shipped two hash_match failures (`split_train_valid_test`,
`pack_token_shards`) whose root cause was oracle-side `SUM(BIGINT)` --
DuckDB widens it to HUGEINT, which materializes as float64 on the
pandas fetch path the driver uses, while Spark emits int64.  The old
`fetchall()`-based harness saw a plain Python int on both sides and
could not distinguish them.  This test pins the failure mode: the gate
must REJECT a bare SUM oracle against an int64 Spark result, and accept
the CAST(... AS BIGINT) form.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_format_in_parquet_benchmark_spark.tables import load_table

from conftest import assert_oracle_match


def _spark_sum(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .agg(F.sum("n_chars").alias("total_chars"))
    )


def test_gate_rejects_hugeint_sum(spark, duck, sf_dir):
    sdf = _spark_sum(spark, sf_dir)
    rel = duck.sql("SELECT SUM(n_chars) AS total_chars FROM documents")
    with pytest.raises(AssertionError, match="dtype-family"):
        assert_oracle_match(sdf, rel, name="hugeint_repro")


def test_gate_accepts_cast_bigint_sum(spark, duck, sf_dir):
    sdf = _spark_sum(spark, sf_dir)
    rel = duck.sql(
        "SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM documents"
    )
    assert_oracle_match(sdf, rel, name="hugeint_fixed")


def test_gate_rejects_value_drift_under_matching_types(spark, duck, sf_dir):
    # The typed gate must not have weakened the value comparison.
    sdf = _spark_sum(spark, sf_dir)
    rel = duck.sql(
        "SELECT CAST(SUM(n_chars) + 1 AS BIGINT) AS total_chars FROM documents"
    )
    with pytest.raises(AssertionError, match="mismatched rows"):
        assert_oracle_match(sdf, rel, name="value_drift")
