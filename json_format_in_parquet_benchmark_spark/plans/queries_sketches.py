"""Sketch queries: approximate distinct counting with a CROSS-ENGINE-EXACT
HyperLogLog (operators/sketches.py).

Built-in approximate-distinct functions (Spark HLL++, DuckDB HLL) use
engine-private hashes, so their estimates cannot be value-checked across
engines -- the driver could only do a rows-only check.  The portable HLL
is built from the repo's md5 hash with exact integer arithmetic, so even
the ESTIMATE hash-matches the oracle: the sketch itself is under the
correctness gate, not just trusted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import hll_estimate, hll_estimate_duckdb
from ..tables import load_table
from .registry import register

HLL_B = 8  # 256 registers: raw-estimator regime needs ndv >> 2.5 * 256

# (label, spark value expr, duckdb value expr) -- all high-NDV columns of
# lineitem, well above the raw-HLL small-range threshold at sf >= 0.01.
_HLL_COLUMNS = (
    ("l_orderkey", "cast(l_orderkey as string)", "CAST(l_orderkey AS VARCHAR)"),
    ("l_partkey", "cast(l_partkey as string)", "CAST(l_partkey AS VARCHAR)"),
    (
        "l_lineid",
        "concat(cast(l_orderkey as string), '|', cast(l_linenumber as string))",
        "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)",
    ),
)


def _hll_oracle() -> str:
    parts = []
    for label, _spark_expr, duck_expr in _HLL_COLUMNS:
        est = hll_estimate_duckdb("lineitem", duck_expr, b=HLL_B)
        parts.append(f"""
SELECT '{label}' AS column_name,
       e AS est_distinct,
       x AS exact_distinct,
       (e - CAST(x AS DOUBLE)) / CAST(x AS DOUBLE) AS rel_err
FROM (SELECT {est} AS e,
             (SELECT COUNT(DISTINCT {duck_expr}) FROM lineitem) AS x)
""")
    return "\nUNION ALL\n".join(parts)


@register(
    "sketch_hll_ndv",
    oracle=_hll_oracle(),
    doc="Portable HyperLogLog distinct estimates over high-NDV lineitem "
    "columns, with the exact count and relative error alongside.  The "
    "sketch uses only the portable md5 hash + exact integer register "
    "arithmetic (operators/sketches.py), so the ESTIMATE itself is "
    "bit-identical in the DuckDB oracle -- an auditable, mergeable "
    "distinct-count sketch (registers combine with max) for 100 TB "
    "pipelines, unlike the engine-private approx_count_distinct "
    "implementations which cannot be cross-checked.",
    tags=("sketch", "distinct", "custom-operator"),
)
def sketch_hll_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for label, spark_expr, _duck_expr in _HLL_COLUMNS:
        est = hll_estimate(li, spark_expr, b=HLL_B)
        exact = li.agg(
            F.countDistinct(F.expr(spark_expr)).alias("exact_distinct")
        )
        parts.append(
            est.crossJoin(exact).select(
                F.lit(label).alias("column_name"),
                "est_distinct",
                "exact_distinct",
                (
                    (F.col("est_distinct") - F.col("exact_distinct").cast("double"))
                    / F.col("exact_distinct").cast("double")
                ).alias("rel_err"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
