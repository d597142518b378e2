"""Measure the LPA superstep exchange count (guide 2.4): the registered
shape pays TWO exchanges per superstep -- messages by (dst, label) with
map-side combining, then counts by dst for the argmax -- because the
(dst, label) hash partitioning does not satisfy the per-dst aggregation.
Keying the messages exchange on dst ALONE (an explicit repartition on dst,
a subset of the group keys) satisfies BOTH downstream aggregations, so the
superstep drops to ONE exchange -- but loses the map-side combine on the
messages, so raw shuffle rows rise from distinct-(dst,label)-per-partition
to |E|.  Which effect wins depends on how much combining the graph offers;
this probe measures both arms on

  - the deterministic synthetic 4-regular graph (little combining -- each
    node has ~4 neighbors, messages nearly unique), and
  - the REAL registered graph_communities_trading query at sf0.1
    (bipartite supplier-customer multigraph with hubs -- real combining).

Labels asserted identical per arm (LPA here is fully deterministic).
Interleaved min-of-5.

Usage: python scripts/probe_lpa_exchanges.py [n_nodes ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from json_format_in_parquet_benchmark_spark.operators.dedup import (  # noqa: E402
    _track_persist,
    release_caches,
)
from json_format_in_parquet_benchmark_spark.operators.graph import (  # noqa: E402
    _maybe_checkpoint,
)
from json_format_in_parquet_benchmark_spark.session import get_spark  # noqa: E402

N_ITERS = 3


def lpa(edges, shape: str):
    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism
    edges = _track_persist(edges.repartition(par, "src"))
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node").cast("bigint")
    )
    for it in range(N_ITERS):
        msgs = labels.join(edges, labels.node == edges.src)
        if shape == "dst_keyed":
            msgs = msgs.repartition(par, "dst")
        counts = msgs.groupBy(F.col("dst").alias("n2"), "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        labels = (
            counts.groupBy(F.col("n2").alias("node"))
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("neg_label"))
                ).alias("m")
            )
            .select("node", (-F.col("m.neg_label")).cast("bigint").alias("label"))
        )
        labels = _maybe_checkpoint(labels, it, N_ITERS, 5)
    return labels


def main() -> None:
    tiers = [int(x) for x in sys.argv[1:]] or [2_000_000]
    spark = get_spark(app_name="jfipb-lpa-probe")
    sc = spark.sparkContext
    import bench  # noqa: E402

    def run_tier(tag, edges_fn):
        a = lpa(edges_fn(), "current").orderBy("node")
        b = lpa(edges_fn(), "dst_keyed").orderBy("node")
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        release_caches()
        assert diff == 0, f"labels differ on {diff} rows at {tag}"
        print(f"[probe] {tag}: labels identical", flush=True)
        best = {"current": float("inf"), "dst_keyed": float("inf")}
        metrics = {}
        for t in range(5):
            for shape in best:
                release_caches()
                sc.setJobDescription(f"lpa {shape} {tag} t{t}")
                df = lpa(edges_fn(), shape)
                t0 = time.perf_counter()
                n = df.count()
                dt = time.perf_counter() - t0
                if dt < best[shape]:
                    best[shape] = dt
                    metrics[shape] = bench._exec_metrics(df)
        sc.setJobDescription(None)
        release_caches()
        for shape in best:
            print(f"[probe] {tag} {shape}: {best[shape]:.2f}s (min of 5)  "
                  f"{metrics[shape]}", flush=True)

    for n in tiers:
        path = f"/tmp/jfipb_lpa_probe/edges_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            eraw = spark.range(n).selectExpr(
                "id as a",
                f"(id * 7 + 1) % {n} as b",
                f"(id * 13 + 3) % {n} as c",
            )
            (
                eraw.selectExpr("a as src", "b as dst")
                .union(eraw.selectExpr("b", "a"))
                .union(eraw.selectExpr("a", "c"))
                .union(eraw.selectExpr("c", "a"))
                .repartition(sc.defaultParallelism)
                .write.mode("overwrite").parquet(path)
            )
        run_tier(f"synth_{n}", lambda p=path: spark.read.parquet(p))

    # The real registered graph at sf0.1 (bipartite trading multigraph).
    from json_format_in_parquet_benchmark_spark.tables import load_table

    def trading_edges():
        li = load_table(spark, "/root/testdata/sf0.1", "lineitem")
        orders = load_table(spark, "/root/testdata/sf0.1", "orders")
        pairs = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                (F.col("l_suppkey") * 2 + 1).alias("a"),
                (F.col("o_custkey") * 2).alias("b"),
            )
            .distinct()
        )
        return pairs.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))

    run_tier("trading_sf0.1", trading_edges)


if __name__ == "__main__":
    main()
