"""UDF/UDAF surface: the one place the engine deliberately crosses into
Python, shown with the fast (Arrow-batched) shapes only.

The reference has no user-defined-function surface (SURVEY.md §2.2: the
codec trait is an internal extension point).  The engine's stance is
"built-ins first" — every scalar expression elsewhere is JVM-side — but the
checklist's UDAF capability is demonstrated here with a pandas grouped-agg
UDAF (Arrow transfer, one Python roundtrip per GROUP, not per row).  The
mapInPandas / applyInPandasWithState shapes live with their operators
(multimodal, streaming sessionization).

At 100 TB: a grouped-agg pandas UDAF ships each group's column slice
through Arrow once; groups here are low-cardinality (event types), so the
Python cost is O(groups), invisible next to the shuffle.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves PEP-563 string hints
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_duckdb
from ..tables import load_table
from .registry import register


@register(
    "udaf_median_value",
    oracle="""
SELECT event_type,
       median(value::DOUBLE) AS median_value
FROM events
GROUP BY 1
""",
    doc="Custom UDAF: per-group median via a pandas grouped-agg UDF "
    "(Arrow-batched, one Python call per group).  numpy's interpolated "
    "median of doubles is bit-identical to DuckDB's median over DOUBLE, so "
    "even the Python path is exactly oracle-checked.",
    tags=("udf", "udaf", "aggregation"),
)
def udaf_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    # Type-hint form (Series -> float == grouped agg).  Under PEP 563 the
    # hints are strings; pandas_udf resolves them via get_type_hints against
    # module globals, hence the module-level ``pd`` import above.
    @F.pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(np.median(v.values))

    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg()
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        median_udaf("value").alias("median_value")
    )


@register(
    "udtf_tokenize_positions",
    oracle=f"""
WITH d AS (
  SELECT doc_id, {tokens_duckdb('text')} AS toks FROM documents WHERE doc_id < 50
),
ex AS (
  SELECT doc_id,
         unnest(list_transform(range(len(toks)),
                i -> struct_pack(token := toks[CAST(i AS INT) + 1],
                                 pos := CAST(i AS INT)))) AS u
  FROM d
)
SELECT doc_id, u.token AS token, u.pos AS pos FROM ex
""",
    doc="Python UDTF (table function): one text row fans out to "
    "(token, position) rows via a lateral join.  Demonstration of the "
    "UDTF surface -- the production path for THIS particular job is "
    "posexplode(split(...)), which stays JVM-side; a real UDTF earns its "
    "keep when the row-expansion logic needs Python libraries.",
    tags=("udf", "udtf"),
)
def udtf_tokenize_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            pos = 0
            for tok in text.split(" "):
                if tok:
                    yield tok, pos
                    pos += 1

    spark.udtf.register("jfipb_tokenize", Tokenize)
    docs = load_table(spark, sf_dir, "documents").where("doc_id < 50")
    docs.createOrReplaceTempView("docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, t.token, t.pos"
        " FROM docs_udtf d, LATERAL jfipb_tokenize(d.text) t"
    )
