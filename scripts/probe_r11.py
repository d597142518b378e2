#!/usr/bin/env python
"""Round-11 scale probes (verdict items 1 and 3 done-criteria).

A. IVF cell-partitioned index WRITE: unhinted dynamic partitionBy vs the
   rebalance-hinted form now in queries_similarity.py -- seconds AND the
   file count (the claim under test: files bounded by ~one per cell
   instead of O(write_tasks x cells)).
B. The two r11 global-window conversions at 5M+ dimension rows:
   events_uplift_deciles' ntile-decile readout and customers_gini_spend's
   rank moment, each timed single-window vs two-phase (identical results
   asserted on the aggregate outputs).

Appends nothing; prints JSON-lines rows in results/scale_probe.txt's
format -- paste the rows + commentary there after review.
"""
from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from json_format_in_parquet_benchmark_spark.session import get_spark  # noqa: E402


def timed(fn, trials: int = 2):
    best, out = float("inf"), None
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2), out


def parquet_files(path: str) -> int:
    return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vecs", type=int, default=2_000_000)
    ap.add_argument("--n-rows", type=int, default=5_000_000)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/jfipb_probe_r11")
    args = ap.parse_args()
    spark = get_spark(app_name="probe-r11")
    os.makedirs(args.workdir, exist_ok=True)

    # ---- A. IVF cell-partitioned write: file count + seconds ----------
    from json_format_in_parquet_benchmark_spark.operators.similarity import (
        ivf_assign,
    )
    from json_format_in_parquet_benchmark_spark.plans.queries_similarity import (
        DIM,
        N_CELLS,
    )

    emb_path = os.path.join(args.workdir, f"emb_{args.n_vecs}")
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        h = "cast(conv(substr(md5(concat(vec_id, '#', j)), 1, 15), 16, 10) as bigint)"
        (
            spark.range(args.n_vecs)
            .selectExpr("id as vec_id")
            .selectExpr(
                "vec_id",
                f"transform(sequence(0, {DIM - 1}), "
                f" j -> cast(({h} % 2001 - 1000) as float) / 1000.0f) as embedding",
            )
            .repartition(spark.sparkContext.defaultParallelism)
            .write.mode("overwrite")
            .parquet(emb_path)
        )
    emb = spark.read.parquet(emb_path)
    assign = ivf_assign(emb, "embedding", "vec_id", N_CELLS, DIM)
    staged = emb.select("vec_id", "embedding").join(assign, "vec_id")
    for hinted in (False, True):
        out = os.path.join(args.workdir, f"ivf_{'hint' if hinted else 'plain'}")

        def write(df=staged, hint=hinted, dest=out):
            shutil.rmtree(dest, ignore_errors=True)
            d = df.hint("rebalance", "cell") if hint else df
            d.write.mode("overwrite").partitionBy("cell").parquet(dest)
            return parquet_files(dest)

        sec, files = timed(write, args.trials)
        print(
            '{"n_docs": %d, "op": "ivf_cell_write_%s", "sec": %s, "rows": %d}'
            % (args.n_vecs, "rebalanced" if hinted else "unhinted", sec, files)
        )

    # ---- B. dimension-rank conversions at n-rows ----------------------
    from pyspark.sql import Window

    from json_format_in_parquet_benchmark_spark.functions.windows import (
        rank_two_phase,
    )

    # Per-user frame shaped like _per_user_pre_post's output: x/y cents.
    hx = "cast(conv(substr(md5(concat('x', id)), 1, 15), 16, 10) as bigint)"
    hy = "cast(conv(substr(md5(concat('y', id)), 1, 15), 16, 10) as bigint)"
    per_user = (
        spark.range(args.n_rows)
        .selectExpr(
            "id as user_id",
            f"146116 + {hx} % 392725 as x",
            f"{hy} % 600000 as y",
        )
        .persist()
    )
    per_user.count()

    ntile_sql = (
        "cast(case when rn <= (n % 10) * ((n div 10) + 1)"
        " then (rn + (n div 10)) div ((n div 10) + 1)"
        " else (n % 10) + (rn - (n % 10) * ((n div 10) + 1)"
        " + (n div 10) - 1) div (n div 10) end as int)"
    )

    def uplift_agg(deciled):
        return (
            deciled.groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_u"), F.sum("y").alias("y_sum"))
            .orderBy("decile")
            .collect()
        )

    def uplift_window():
        w = Window.orderBy(F.desc("x"), F.asc("user_id"))
        return uplift_agg(
            per_user.select(
                "y", F.ntile(10).over(w).cast("int").alias("decile")
            )
        )

    def uplift_two_phase():
        ranked = rank_two_phase(
            per_user.withColumn("_g", F.lit(0)).withColumn(
                "neg_x", (-F.col("x")).cast("bigint")
            ),
            "_g",
            "neg_x",
            order_extra=("user_id",),
            bucket_width=256,
        )
        return uplift_agg(ranked.select("y", F.expr(ntile_sql).alias("decile")))

    sec_w, rows_w = timed(uplift_window, args.trials)
    sec_t, rows_t = timed(uplift_two_phase, args.trials)
    assert rows_w == rows_t, "uplift decile aggregates diverged"
    print('{"n_docs": %d, "op": "uplift_decile_window", "sec": %s, "rows": %d}'
          % (args.n_rows, sec_w, len(rows_w)))
    print('{"n_docs": %d, "op": "uplift_decile_two_phase", "sec": %s, "rows": %d}'
          % (args.n_rows, sec_t, len(rows_t)))

    # Per-customer spend frame shaped like customers_gini_spend's input.
    # Cents capped at 1e5 so sum(rk*cents) stays under 2^63 at 5M+ rows
    # (the registered query's integer budget holds at its own dimension
    # sizes; the probe's is 300x larger).  Bucket width re-sized to the
    # capped range per the helper contract (width ~ range/1500).
    hc = "cast(conv(substr(md5(concat('c', id)), 1, 15), 16, 10) as bigint)"
    spend = (
        spark.range(args.n_rows)
        .selectExpr("id as o_custkey", f"{hc} % 100000 as cents")
        .persist()
    )
    spend.count()

    def gini_moments(ranked):
        return ranked.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("total"),
            F.sum(F.col("rk") * F.col("cents")).cast("bigint").alias("wsum"),
        ).collect()

    def gini_window():
        ranked = spend.select(
            "cents",
            F.row_number()
            .over(Window.orderBy("cents", "o_custkey"))
            .cast("bigint")
            .alias("rk"),
        )
        return gini_moments(ranked)

    def gini_two_phase():
        ranked = rank_two_phase(
            spend.withColumn("_g", F.lit(0)),
            "_g",
            "cents",
            order_extra=("o_custkey",),
            bucket_width=64,
            rn_col="rk",
        ).select("cents", F.col("rk").cast("bigint").alias("rk"))
        return gini_moments(ranked)

    sec_gw, m_w = timed(gini_window, args.trials)
    sec_gt, m_t = timed(gini_two_phase, args.trials)
    assert [tuple(r) for r in m_w] == [tuple(r) for r in m_t], "gini moments diverged"
    print('{"n_docs": %d, "op": "gini_rank_window", "sec": %s, "rows": %d}'
          % (args.n_rows, sec_gw, len(m_w)))
    print('{"n_docs": %d, "op": "gini_rank_two_phase", "sec": %s, "rows": %d}'
          % (args.n_rows, sec_gt, len(m_t)))

    spark.stop()


if __name__ == "__main__":
    main()
