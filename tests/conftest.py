"""Shared fixtures: one tuned SparkSession per test run, plus the DuckDB
oracle harness that replicates the driver's correctness gate locally."""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from json_format_in_parquet_benchmark_spark.session import get_spark  # noqa: E402
from json_format_in_parquet_benchmark_spark.tables import TABLES, table_path  # noqa: E402

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="jfipb-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    from json_format_in_parquet_benchmark_spark.operators.dedup import release_caches

    release_caches()
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(TEST_SF_DIR, t)}')"
        )
    yield con
    con.close()


def _norm_value(v):
    """Normalize a cell so Spark and DuckDB results compare exactly."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def normalize_rows(columns, rows):
    """Sort columns by name (like the driver) and rows by total order."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out


def assert_oracle_match(spark_df, duck_rel, name=""):
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_rows = duck_rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    _, sn = normalize_rows(s_cols, s_rows)
    _, dn = normalize_rows(d_cols, d_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
