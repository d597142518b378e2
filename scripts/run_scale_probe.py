"""Scale probe for the dedup/similarity family: measure wall time at
1x / 10x / 100x of the sf0.1 corpus size and show the blocked shapes
(band-blocked SimHash, LSH-banded MinHash, DF-capped n-gram index,
sign-LSH-bucketed embedding pairs) scale near-linearly, not quadratically.

The corpus is synthesized Spark-natively and deterministically (md5-derived
token/vector choice, no RNG) with planted duplicate structure: 5% exact
duplicates (row copies its predecessor) and 5% near-duplicates (copy with
one token / one coordinate perturbed), so every operator has real work to
find at every scale.  Synthesized tables are written to Parquet first and
the operators timed on the read-back, so timings measure the operator, not
the generator.

Usage:
    python scripts/run_scale_probe.py [--sizes 5000,50000,500000]

Prints one JSON line per (size, operator) with seconds + output rows, then
a summary of time growth ratios per 10x of data (quadratic would be ~100x;
the blocked shapes stay near ~10x or below).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from json_format_in_parquet_benchmark_spark.operators import dedup
from json_format_in_parquet_benchmark_spark.operators.semantic import (
    semantic_dup_flags_fast,
)
from json_format_in_parquet_benchmark_spark.operators.graph import (
    label_propagation,
    pagerank,
)
from json_format_in_parquet_benchmark_spark.operators.multimodal import (
    media_table,
    phash_features,
    phash_nearest_neighbor,
)
from json_format_in_parquet_benchmark_spark.operators.similarity import (
    ivf_assign_fast,
    pq_topk,
    topk_ivf,
)
from json_format_in_parquet_benchmark_spark.session import get_spark

VOCAB = 50_000  # large vocab keeps shingle document-frequency low, like real text
DIM = 64


def synth_documents(spark: SparkSession, n: int, out: str) -> None:
    """Deterministic documents table: 5% exact dups, 5% one-token near-dups."""
    h = "cast(conv(substr(md5(concat(src_id, ':', i)), 1, 15), 16, 10) as bigint)"
    (
        spark.range(n)
        .selectExpr(
            "id as doc_id",
            # 19s copy a PLAIN row (16: src=itself) so the copy is exact;
            # 18s copy a plain row and mutate one token (near-dup).
            "case when id % 20 = 19 then id - 3 "
            "     when id % 20 = 18 then id - 2 else id end as src_id",
            "cast(id % 20 = 18 as int) as mutate",
        )
        .selectExpr(
            "doc_id",
            # 20..50 tokens from a 50k vocab, chosen by the doc's SOURCE id so
            # dup rows reproduce their source's text exactly; near-dup rows
            # replace token 2 with a doc-unique token.
            "concat_ws(' ', transform(sequence(1, 20 + cast(src_id % 31 as int)), "
            f" i -> case when mutate = 1 and i = 2 then concat('u', doc_id) "
            f"      else concat('w', {h} % {VOCAB}) end)) as text",
            "concat('l', src_id % 5) as lang",
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .parquet(out)
    )


def synth_embeddings(spark: SparkSession, n: int, out: str) -> None:
    """Deterministic embeddings: 5% near-dups (predecessor's vector, one
    coordinate nudged by 0.01 -- cosine stays ~1)."""
    h = "cast(conv(substr(md5(concat(src_id, '#', j)), 1, 15), 16, 10) as bigint)"
    (
        spark.range(n)
        .selectExpr(
            "id as vec_id",
            "case when id % 20 = 19 then id - 1 else id end as src_id",
            "cast(id % 20 = 19 as int) as nudge",
        )
        .selectExpr(
            "vec_id",
            f"transform(sequence(0, {DIM - 1}), "
            f" j -> cast(({h} % 2001 - 1000) as float) / 1000.0f "
            f"      + cast(case when nudge = 1 and j = 0 then 0.01 else 0.0 end as float)"
            ") as embedding",
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .parquet(out)
    )


def timed_l(label: str, fn) -> tuple[float, int]:
    """timed() with the op name printed up front -- the long tiers need a
    stderr marker saying which operator is currently running."""
    return timed(fn, label)


def timed(fn, label: str = "") -> tuple[float, int]:
    """min-of-2 trials: long-lived local JVMs show multi-x timing noise
    (GC, JIT warmup, lazy cache population racing); the min is the
    reproducible cost of the plan."""
    if label:
        print(f"[probe] start {label}", file=sys.stderr, flush=True)
    best = None
    for _ in range(2):
        t0 = time.time()
        rows = fn()
        secs = round(time.time() - t0, 2)
        # Release the operator's persisted intermediates between trials and
        # measurements: no run should inherit a predecessor's cache, and
        # leaked blocks inflate later timings via memory/GC pressure.
        dedup.release_caches()
        best = secs if best is None else min(best, secs)
    return best, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,50000,500000")
    ap.add_argument("--workdir", default="/tmp/jfipb_scale_probe")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_spark("scale-probe")
    results: dict[int, dict[str, tuple[float, int]]] = {}
    for n in sizes:
        docs_path = os.path.join(args.workdir, f"docs_{n}")
        embs_path = os.path.join(args.workdir, f"embs_{n}")
        n_emb = max(n * 2 // 5, 100)  # embeddings table is 2/5 of docs, like sf0.1
        synth_documents(spark, n, docs_path)
        synth_embeddings(spark, n_emb, embs_path)
        docs = spark.read.parquet(docs_path)
        embs = spark.read.parquet(embs_path)
        # sign-LSH bucket count must grow with N to hold per-bucket occupancy
        # roughly constant (the knob a 100 TB deployment turns): ~2^13
        # buckets at 2k vectors up to 2^19 at 200k.
        n_planes = max(8, (n_emb - 1).bit_length() + 2)
        r: dict[str, tuple[float, int]] = {}
        r["exact_dedup"] = timed_l("exact_dedup", 
            lambda: dedup.exact_dedup(docs, "text", "doc_id").count()
        )
        r["minhash_lsh"] = timed_l("minhash_lsh", 
            lambda: dedup.minhash_lsh_pairs(docs, "text", "doc_id").count()
        )
        r["simhash"] = timed_l("simhash", 
            lambda: dedup.simhash_pairs(docs, "text", "doc_id").count()
        )
        # End-to-end near-dup clustering: minhash pair generation plus
        # connected components.  The pair graph stays tiny relative to the
        # corpus, so CC takes the driver union-find fast path at every one
        # of these sizes; the distributed min-label loop is the >2M-edge
        # fallback.
        r["minhash_clusters"] = timed_l("minhash_clusters", 
            lambda: dedup.connected_components(
                dedup.minhash_lsh_pairs(docs, "text", "doc_id")
            ).count()
        )
        if n == max(sizes):
            # The 100 TB path: force the distributed min-label propagation
            # (driver_max_edges=0 disables the union-find fast path) on the
            # largest probe so the Pregel fallback has a measured number at
            # scale, not just a unit test.
            r["minhash_clusters_distributed"] = timed_l("minhash_clusters_distributed", 
                lambda: dedup.connected_components(
                    dedup.minhash_lsh_pairs(docs, "text", "doc_id"),
                    driver_max_edges=0,
                ).count()
            )
        # Default path since round 4: prefix-bound candidates + DF-cap
        # scope filter (the production route).
        r["ngram_jaccard"] = timed_l("ngram_jaccard",
            lambda: dedup.ngram_jaccard_pairs(docs, "text", "doc_id").count()
        )
        # Comparison arm: the original DF-capped inverted-index self-join
        # (measured 7.2x per 10x data at 500k, the reason prefix became
        # the default).
        r["ngram_index_capped"] = timed_l("ngram_index_capped",
            lambda: dedup.ngram_jaccard_pairs(
                docs, "text", "doc_id", candidates="index"
            ).count()
        )
        r["ngram_prefix"] = timed_l("ngram_prefix",
            lambda: dedup.ngram_jaccard_pairs_prefix(
                docs, "text", "doc_id"
            ).count()
        )
        # Exact-substring spans (round 4): position fan-out is |chars| rows
        # of (doc_id, pos, int64) -- growth must stay ~linear in corpus
        # bytes (two hash shuffles + one doc_id window).
        r["substring_spans"] = timed_l("substring_spans",
            lambda: dedup.substring_dup_spans(
                docs, "text", "doc_id"
            ).count()
        )
        r["embedding_near_dup"] = timed_l("embedding_near_dup", 
            lambda: dedup.embedding_near_dup_pairs(
                embs, "embedding", "vec_id", n_planes=n_planes
            ).count()
        )
        # IVF cell count grows with N to hold per-cell size constant --
        # the same knob a real deployment turns when the corpus grows.
        # The build uses the Arrow-vectorized numpy assignment (the
        # at-scale kernel; the interpreted SQL form is the oracle path).
        n_cells = max(16, n_emb // 500)
        r["ivf_topk"] = timed_l("ivf_topk", 
            lambda: topk_ivf(
                embs, embs.limit(8), "embedding", "vec_id", k=5,
                n_cells=n_cells, dim=DIM,
                assigned=ivf_assign_fast(
                    embs, "embedding", "vec_id", n_cells, DIM
                ).withColumnRenamed("vec_id", "neighbor_id"),
            ).count()
        )
        # SemDeDup: the cluster count is the published scale knob -- grow k
        # with N to hold within-cluster (quadratic) pair work ~ N^2/k linear.
        # The numpy kernels are the at-scale path (the SQL-literal argmin is
        # the oracle form; its expression grows with k*dim).
        r["semantic_dedup"] = timed_l("semantic_dedup", 
            lambda: semantic_dup_flags_fast(
                embs, "embedding", "vec_id", threshold=0.95,
                k=max(8, n_emb // 500), iters=2, dim=DIM,
            ).count()
        )
        # PQ: codebook size is FIXED (compression codebooks do not grow
        # with the corpus); train + encode + ADC-score should therefore
        # scale linearly in N.
        # Gram/moment reduction: THE mergeable-aggregate shape (covariance
        # for whitening/PCA) -- per-batch numpy A^T A partials + integer
        # merge; cost is one map pass, so growth must be ~linear in N and
        # independent of any pair structure.
        from json_format_in_parquet_benchmark_spark.plans.queries_embedding_stats import (
            gram_matrix,
        )
        r["gram_matrix"] = timed_l("gram_matrix", 
            lambda: gram_matrix(embs).count()
        )
        r["pq_topk"] = timed_l("pq_topk", 
            lambda: pq_topk(
                embs, "embedding", "vec_id", n_queries=8, k=5
            ).count()
        )
        # PageRank: deterministic synthetic 4-regular symmetric graph over
        # n nodes; 3 supersteps.  Wall time should track |E| linearly.
        edges_path = os.path.join(args.workdir, f"edges_{n}")
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
            .repartition(spark.sparkContext.defaultParallelism)
            .write.mode("overwrite")
            .parquet(edges_path)
        )
        r["pagerank_3iter"] = timed_l("pagerank_3iter",
            lambda: pagerank(spark.read.parquet(edges_path)).count()
        )
        # LPA communities: same synthetic graph, 3 supersteps of two
        # map-side-combined aggregates each -- |E|-linear like PageRank.
        r["label_prop_3iter"] = timed_l("label_prop_3iter",
            lambda: label_propagation(spark.read.parquet(edges_path)).count()
        )
        # Deep-iteration arms (round-4 verdict task): 10 supersteps with
        # lineage checkpointing every 5 -- per-iteration cost must stay
        # ~flat vs the 3-iter arms (without localCheckpoint the analyzer/
        # optimizer cost compounds with plan depth).
        r["pagerank_10iter"] = timed_l("pagerank_10iter",
            lambda: pagerank(
                spark.read.parquet(edges_path), n_iters=10
            ).count()
        )
        r["label_prop_10iter"] = timed_l("label_prop_10iter",
            lambda: label_propagation(
                spark.read.parquet(edges_path), n_iters=10
            ).count()
        )
        # Perceptual-hash near-dup: Arrow-batched Python pHash stage +
        # banded Hamming join.  The Python md5 kernel dominates and is
        # per-row, so growth must be ~linear; the banded self-join rides
        # bucket occupancy like simhash.
        r["phash_neardup"] = timed_l("phash_neardup",
            lambda: phash_nearest_neighbor(
                phash_features(media_table(docs))
            ).count()
        )
        results[n] = r
        for op, (secs, rows) in r.items():
            print(
                json.dumps({"n_docs": n, "op": op, "sec": secs, "rows": rows}),
                flush=True,
            )

    print("\n# time growth per 10x data (quadratic would be ~100x):")
    for a, b in zip(sizes, sizes[1:]):
        for op in results[a]:
            ta, tb = results[a][op][0], results[b][op][0]
            ratio = round(tb / ta, 1) if ta > 0 else float("inf")
            print(f"  {op}: {a}->{b} rows = {ratio}x time")
    shutil.rmtree(args.workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
