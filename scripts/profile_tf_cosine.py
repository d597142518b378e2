"""Profile text_tf_cosine_pairs on a VANILLA session (the external driver's
seam) at sf0.01 -- the r11 verdict's item 3: one isolated pass counting
stages/exchanges, then decide from the plan, not from folklore.

Arms (interleaved, min-of-5):
  registered -- the registry form verbatim (two persisted aggregates:
                postings, capped; vocab = groupBy(term) + join-back).
  window_df  -- df attached via COUNT() OVER (PARTITION BY term) on the
                postings frame (the attach-stats-with-a-window recipe):
                drops the vocab aggregate + join-back and ONE of the two
                persisted aggregates; the term partitioning established by
                the window is the same key the dots self-join needs.

Both arms must return identical rows (asserted) -- the oracle is unchanged.

Usage: python scripts/profile_tf_cosine.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("tf-cosine-profile")
        .getOrCreate()
    )
    sc = spark.sparkContext
    from json_format_in_parquet_benchmark_spark.operators.dedup import (
        release_caches,
    )
    from json_format_in_parquet_benchmark_spark.plans import REGISTRY
    from json_format_in_parquet_benchmark_spark.plans.queries_text import (
        COSINE_TOP_PAIRS,
        _COSINE_CAP_SPARK,
        _TOKS_S,
    )
    from json_format_in_parquet_benchmark_spark.tables import load_table

    def registered():
        return REGISTRY["text_tf_cosine_pairs"].fn(spark, SF_DIR)

    def window_df():
        from json_format_in_parquet_benchmark_spark.operators.dedup import (
            _track_persist,
        )

        docs = load_table(spark, SF_DIR, "documents")
        postings = (
            docs.select("doc_id", F.explode(F.expr(_TOKS_S)).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        )
        nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        capped = _track_persist(
            postings.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
            )
            .crossJoin(F.broadcast(nd))
            .where(F.expr(f"df between 2 and {_COSINE_CAP_SPARK}"))
            .select("doc_id", "term", "tf")
        )
        norms = capped.groupBy("doc_id").agg(
            F.expr("cast(sum(tf * tf) as bigint)").alias("norm2")
        )
        x = capped.selectExpr("term", "doc_id AS doc_a", "tf AS tf_a")
        y = capped.selectExpr("term", "doc_id AS doc_b", "tf AS tf_b")
        dots = (
            x.join(y, "term")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.expr("cast(sum(tf_a * tf_b) as bigint)").alias("dot"))
        )
        na = norms.selectExpr("doc_id AS doc_a", "norm2 AS norm2_a")
        nb = norms.selectExpr("doc_id AS doc_b", "norm2 AS norm2_b")
        scored = (
            dots.join(na, "doc_a")
            .join(nb, "doc_b")
            .select(
                "doc_a", "doc_b", "dot", "norm2_a", "norm2_b",
                F.expr(
                    "cast(dot as double)"
                    " / sqrt(cast(norm2_a as double) * cast(norm2_b as double))"
                ).alias("cosine"),
            )
        )
        return scored.orderBy(
            F.col("cosine").desc(), "doc_a", "doc_b"
        ).limit(COSINE_TOP_PAIRS)

    # --- result identity gate ---
    r_reg = [tuple(r) for r in registered().collect()]
    release_caches()
    r_win = [tuple(r) for r in window_df().collect()]
    release_caches()
    assert r_reg == r_win, "window_df arm changed the result!"
    print(f"[profile] results identical ({len(r_reg)} rows)", flush=True)

    import bench  # noqa: E402  (repo-root on path; _exec_metrics walker)

    arms = {"registered": registered, "window_df": window_df}
    best = {name: float("inf") for name in arms}
    metrics = {}
    for trial in range(5):
        for name, fn in arms.items():
            release_caches()
            sc.setJobDescription(f"tf-cosine {name} t{trial}")
            t0 = time.perf_counter()
            df = fn()
            df.collect()
            dt = time.perf_counter() - t0
            if dt < best[name]:
                best[name] = dt
                metrics[name] = bench._exec_metrics(df)
    sc.setJobDescription(None)
    for name in arms:
        print(
            f"[profile] {name}: {best[name]:.2f}s (min of 5)  {metrics[name]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
