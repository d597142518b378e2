"""Corpus-property tests for the generator, mirroring the reference's
invariants (scripts/json-generator.py:26-39,58-63 + the empirical check in
SURVEY.md section 5): exact pool-size NDV, full pool coverage, distinct
timestamps, determinism."""

from __future__ import annotations

import json
import math

from pyspark.sql import functions as F

from json_format_in_parquet_benchmark_spark.generator import (
    generate_events,
    generate_events_ndjson,
)

N, NDV = 1024, 0.1


def test_ndv_exact(spark):
    df = generate_events(spark, N, NDV, "t1").persist()
    pool = math.ceil(NDV * N)  # 103, matching the reference's observed count
    row = df.agg(
        F.countDistinct("name").alias("names"),
        F.countDistinct("timestamp").alias("ts"),
        F.countDistinct("attributes.event_attributes").alias("attrs"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row.n == N
    assert row.names == pool  # every pool value used >= once AND no extras
    assert row.attrs == pool
    assert row.ts == N  # timestamps unique per row
    df.unpersist()


def test_deterministic(spark):
    a = sorted(r.name for r in generate_events(spark, 256, 0.3, "s").collect())
    b = sorted(r.name for r in generate_events(spark, 256, 0.3, "s").collect())
    assert a == b
    c = sorted(r.name for r in generate_events(spark, 256, 0.3, "other").collect())
    assert a != c


def test_ndjson_shape(spark):
    doc = json.loads(generate_events_ndjson(spark, 8, 1.0).first().doc)
    # the reference payload shape (examples/events.json, README.md:44-50)
    assert set(doc) == {"name", "timestamp", "attributes"}
    assert set(doc["attributes"]) == {"event_attributes"}
    assert doc["timestamp"].endswith("Z")
