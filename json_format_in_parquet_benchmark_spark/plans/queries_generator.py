"""Generator queries: the NDV-controlled synthetic corpus, cross-checked
against a DuckDB oracle that generates the identical corpus (possible
because all pseudo-randomness is portable md5 arithmetic)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..generator import generate_events, generator_oracle_sql
from .registry import register

GEN_N = 8192
GEN_NDV = 0.1
GEN_SEED = "g1"


@register(
    "generator_events",
    oracle=generator_oracle_sql(GEN_N, GEN_NDV, GEN_SEED),
    doc="O25: NDV-parameterized synthetic events corpus (pool coverage + "
    "distinct timestamps), generated distributively from spark.range -- "
    "byte-identical to the oracle's generation.",
    tags=("generator",),
)
def generator_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generate_events(spark, GEN_N, GEN_NDV, GEN_SEED)
    return df.select(
        "name", "timestamp", F.col("attributes.event_attributes").alias("event_attributes")
    )


@register(
    "generator_ndv_profile",
    oracle=f"""
WITH g AS ({generator_oracle_sql(GEN_N, GEN_NDV, GEN_SEED)})
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT name) AS ndv_name,
       COUNT(DISTINCT "timestamp") AS ndv_ts,
       COUNT(DISTINCT event_attributes) AS ndv_attr
FROM g
""",
    doc="Generator invariants as a query: pool-size distinct names/attrs, "
    "all-distinct timestamps (json-generator.py:26-39,58-63).",
    tags=("generator", "distinct"),
)
def generator_ndv_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generate_events(spark, GEN_N, GEN_NDV, GEN_SEED)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("name").alias("ndv_name"),
        F.countDistinct("timestamp").alias("ndv_ts"),
        F.countDistinct("attributes.event_attributes").alias("ndv_attr"),
    )
