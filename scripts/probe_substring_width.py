"""Measure the r12 substring-islands shuffle-narrowing (guide 2.3) at tiers
where the gh semi-join actually SHUFFLES the grams table (at sf0.1 the
duplicated-gram side broadcasts and hides the at-scale path).

Arms (inline copies, independent of repo HEAD so both run in one session):
  wide   -- the r11 shape: per-position rows carry (doc_id i64, n_chars
            i64, pos i64, gh i64) through the semi-join and the window.
  narrow -- the r12 shape: (doc_id i64, pos i32, gh i64) only; n_chars
            re-attached per merged island via a join against the per-doc
            projection (one extra text scan + one doc-dimension exchange).

Span outputs asserted identical; arms interleaved trial-by-trial,
min-of-5, noop sink; exec metrics (shuffle/scan bytes) reported per arm --
the mechanical evidence the wall numbers back up.

Usage: python scripts/probe_substring_width.py [n_docs ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_scale_probe import synth_documents  # noqa: E402

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from json_format_in_parquet_benchmark_spark.functions.hashing import (  # noqa: E402
    hash64_sql_spark,
)
from json_format_in_parquet_benchmark_spark.session import get_spark  # noqa: E402

L = 40


def _grams_base(docs):
    return docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.expr(f"sequence(1L, n_chars - {L} + 1)")).alias("pos"),
        "_t",
    )


def spans_wide(df):
    docs = df.select(
        F.col("doc_id"),
        F.length("text").alias("n_chars"),
        F.col("text").alias("_t"),
    ).where(F.col("n_chars") >= L)
    grams = _grams_base(docs).select(
        "doc_id",
        "n_chars",
        "pos",
        F.expr(hash64_sql_spark(f"substring(_t, cast(pos as int), {L})")).alias("gh"),
    )
    dupg = (
        grams.select("doc_id", "gh").distinct()
        .groupBy("gh").agg(F.count(F.lit(1)).alias("ndocs"))
        .where(F.col("ndocs") >= 2).select("gh")
    )
    hits = grams.join(dupg, "gh", "left_semi").select("doc_id", "n_chars", "pos")
    w_prev = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1)
    w_run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0)
    marked = hits.withColumn(
        "prev_max", F.max(F.col("pos") + L - 1).over(w_prev)
    ).withColumn(
        "new_island",
        F.when(F.col("prev_max").isNull()
               | (F.col("pos") > F.col("prev_max") + 1), 1).otherwise(0),
    )
    islands = marked.withColumn("island_id", F.sum("new_island").over(w_run))
    return islands.groupBy("doc_id", "island_id").agg(
        F.min("n_chars").alias("n_chars"),
        F.min("pos").cast("bigint").alias("s"),
        (F.max("pos") + L - 1).cast("bigint").alias("e"),
    ).select("doc_id", "n_chars", "s", "e")


def spans_narrow(df):
    docs = df.select(
        F.col("doc_id"),
        F.length("text").alias("n_chars"),
        F.col("text").alias("_t"),
    ).where(F.col("n_chars") >= L)
    grams = _grams_base(docs).select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.expr(hash64_sql_spark(f"substring(_t, cast(pos as int), {L})")).alias("gh"),
    )
    dupg = (
        grams.select("doc_id", "gh").distinct()
        .groupBy("gh").agg(F.count(F.lit(1)).alias("ndocs"))
        .where(F.col("ndocs") >= 2).select("gh")
    )
    hits = grams.join(dupg, "gh", "left_semi").select("doc_id", "pos")
    w_prev = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1)
    w_run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0)
    marked = hits.withColumn(
        "prev_max", F.max(F.col("pos").cast("bigint") + L - 1).over(w_prev)
    ).withColumn(
        "new_island",
        F.when(F.col("prev_max").isNull()
               | (F.col("pos") > F.col("prev_max") + 1), 1).otherwise(0),
    )
    islands = marked.withColumn("island_id", F.sum("new_island").over(w_run))
    merged = islands.groupBy("doc_id", "island_id").agg(
        F.min("pos").cast("bigint").alias("s"),
        (F.max(F.col("pos").cast("bigint")) + L - 1).alias("e"),
    )
    return merged.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        "doc_id", "n_chars", "s", "e"
    )


def main() -> None:
    tiers = [int(x) for x in sys.argv[1:]] or [500_000, 2_000_000]
    spark = get_spark(app_name="jfipb-substr-width-probe")
    sc = spark.sparkContext
    import bench  # noqa: E402

    for n in tiers:
        path = f"/tmp/jfipb_substr_probe/docs_{n}.parquet"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            synth_documents(spark, n, path)
        docs = spark.read.parquet(path)

        a = spans_wide(docs)
        b = spans_narrow(docs)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        assert diff == 0, f"span outputs differ on {diff} rows at n={n}"
        print(f"[probe] n={n}: span outputs identical", flush=True)

        arms = {"wide": lambda: spans_wide(docs),
                "narrow": lambda: spans_narrow(docs)}
        best = {k: float("inf") for k in arms}
        metrics = {}
        for t in range(5):
            for name, fn in arms.items():
                sc.setJobDescription(f"substr-width {name} n={n} t{t}")
                df = fn()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if dt < best[name]:
                    best[name] = dt
                    metrics[name] = bench._exec_metrics(df)
        sc.setJobDescription(None)
        for name in arms:
            print(f"[probe] n={n} {name}: {best[name]:.2f}s (min of 5)  "
                  f"{metrics[name]}", flush=True)


if __name__ == "__main__":
    main()
