"""Synthetic events generator (O25, /root/reference/scripts/json-generator.py).

The reference generates NDJSON events with a controlled NDV fraction: a pool
of ceil(ndv * count) distinct values per field, every pool value used at
least once (json-generator.py:26-39), and timestamps unique on every row
(:58-63).  This is the knob its storage results are parameterized by.

Spark-first rewrite: ``spark.range(n)`` plus deterministic md5-derived
expressions -- no Python UDF, no RNG state, perfectly parallel at any scale,
and reproducible cross-engine (the DuckDB oracle generates the identical
corpus from the same seed).

Pool-coverage invariant: row i uses pool index i for i < P (guaranteeing
every value appears) and hash(seed, i) % P afterwards (NDV-respecting
pseudo-random reuse) -- same guarantee the reference enforces by
construction + its ValueError check.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import _check_salt, hash64_sql_duckdb, hash64_sql_spark

# epoch micros of 2024-07-25T00:00:00Z (arbitrary base near the reference's
# sample timestamps, README.md:44-50)
TS_BASE_MICROS = 1_721_865_600_000_000


def _pool_idx_spark(seed: str, pool: int) -> str:
    return (
        f"case when id < {pool} then id"
        f" else {hash64_sql_spark('cast(id as string)', seed + ':idx:')} % {pool} end"
    )


def generate_events(
    spark: SparkSession, n: int, ndv: float, seed: str = "g1"
) -> DataFrame:
    """Events DataFrame (name string, timestamp string, attributes
    struct<event_attributes double>) with the reference's shape and
    NDV/pool/timestamp invariants."""
    _check_salt(seed)  # seed is interpolated into SQL literals below
    pool = max(1, math.ceil(ndv * n))
    idx = _pool_idx_spark(seed, pool)
    name = f"concat('ev_', substr(md5(concat('{seed}:name:', cast(({idx}) as string))), 1, 16))"
    attr = (
        f"cast({hash64_sql_spark(f'cast(({idx}) as string)', seed + ':attr:')} % 1000000"
        f" as double) / 1000.0"
    )
    ts = (
        f"date_format(timestamp_micros({TS_BASE_MICROS} + id),"
        f" \"yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'\")"
    )
    return spark.range(n).select(
        F.expr(name).alias("name"),
        F.expr(ts).alias("timestamp"),
        F.struct(F.expr(attr).alias("event_attributes")).alias("attributes"),
    )


def generate_events_ndjson(spark: SparkSession, n: int, ndv: float, seed: str = "g1") -> DataFrame:
    """The corpus as NDJSON text lines (column ``doc``), feeding the format
    codecs exactly like the reference's generated files feed its benches."""
    df = generate_events(spark, n, ndv, seed)
    return df.select(F.to_json(F.struct("name", "timestamp", "attributes")).alias("doc"))


def generator_oracle_sql(n: int, ndv: float, seed: str = "g1") -> str:
    """DuckDB SQL generating the byte-identical corpus."""
    _check_salt(seed)
    pool = max(1, math.ceil(ndv * n))
    h_idx = hash64_sql_duckdb("CAST(id AS VARCHAR)", f"{seed}:idx:")
    idx = f"CASE WHEN id < {pool} THEN id ELSE {h_idx} % {pool} END"
    h_attr = hash64_sql_duckdb(f"CAST(({idx}) AS VARCHAR)", f"{seed}:attr:")
    return f"""
SELECT 'ev_' || substr(md5('{seed}:name:' || CAST(({idx}) AS VARCHAR)), 1, 16) AS name,
       strftime(make_timestamp({TS_BASE_MICROS} + id), '%Y-%m-%dT%H:%M:%S.%fZ') AS "timestamp",
       CAST({h_attr} % 1000000 AS DOUBLE) / 1000.0 AS event_attributes
FROM range({n}) t(id)
"""
