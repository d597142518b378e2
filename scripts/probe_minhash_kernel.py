"""Measure the MinHash signature stage: JVM explode+groupBy (the registered
shape: one codegen md5 per exploded shingle, k=16 universal-hash min
aggregates, one partial-agg-reduced shuffle of one row per doc) vs a
single-pass Arrow kernel (mapInArrow; each task hands whole record batches
to an embedded DuckDB, which computes the identical md5-based h31 and all k
mins per doc natively -- ZERO shuffle, no per-row JVM hash-aggregate
machinery).

Bit-exactness is a hard gate, not an aspiration: the kernel's m0..m15 must
equal the JVM values on every doc (asserted via exceptAll both ways before
any timing is trusted) because the md5-derived signatures are oracle-pinned
through the band hashes and the final pair set.

Arms are INTERLEAVED trial-by-trial and reported min-of-5 (the only A/B
protocol that survives this host's load swings, results/bench_notes.md),
timed with the noop sink (guide 1.4) so the 17-column signature frame is
fully computed but never collected.

Usage: python scripts/probe_minhash_kernel.py [n_docs ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_scale_probe import synth_documents  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from json_format_in_parquet_benchmark_spark.functions.hashing import (  # noqa: E402
    P31,
    hash64_sql_spark,
    perm_consts,
)
from json_format_in_parquet_benchmark_spark.functions.text import (  # noqa: E402
    shingles_spark,
    tokens_spark,
)
from json_format_in_parquet_benchmark_spark.operators.dedup import (  # noqa: E402
    minhash_signatures_arrow,
    release_caches,
)
from json_format_in_parquet_benchmark_spark.session import get_spark  # noqa: E402

K = 16
N_SHINGLE = 3


def main() -> None:
    tiers = [int(x) for x in sys.argv[1:]] or [2_000_000, 5_000_000]
    spark = get_spark(app_name="jfipb-minhash-kernel-probe")
    sc = spark.sparkContext

    for n in tiers:
        path = f"/tmp/jfipb_minhash_probe/docs_{n}.parquet"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            synth_documents(spark, n, path)
        docs = spark.read.parquet(path)
        docsets = docs.select(
            "doc_id",
            F.expr(shingles_spark(tokens_spark("text"), N_SHINGLE)).alias(
                "shset"
            ),
        ).persist()
        docsets.count()  # materialize once; both arms read the same cache

        sh = docsets.select(
            "doc_id", F.explode("shset").alias("sh")
        ).withColumn("h31", F.expr(f"{hash64_sql_spark('sh')} % {P31}"))
        sig_jvm = sh.groupBy("doc_id").agg(
            *[
                F.min(F.expr(f"({a} * h31 + {b}) % {P31}")).alias(f"m{j}")
                for j, (a, b) in enumerate(perm_consts(K))
            ]
        )
        sig_duck = minhash_signatures_arrow(docsets, k=K)

        # --- bit-exactness gate (the exceptAll needs ~2x the tier in
        # execution memory; gate at tiers <= the cap and reuse the result
        # for larger timing-only tiers -- the kernel is deterministic) ---
        if n <= int(os.environ.get("MINHASH_GATE_MAX", "2000000")):
            diff = sig_jvm.exceptAll(sig_duck).count()
            diff += sig_duck.exceptAll(sig_jvm).count()
            assert diff == 0, f"kernel signatures differ on {diff} rows at n={n}"
            print(f"[probe] n={n}: signatures bit-identical", flush=True)

        def _noop(df):
            df.write.format("noop").mode("overwrite").save()

        arms = {
            "jvm_explode_groupby": lambda: _noop(sig_jvm),
            "arrow_duckdb_kernel": lambda: _noop(sig_duck),
        }
        best = {name: float("inf") for name in arms}
        for trial in range(5):
            for name, fn in arms.items():
                sc.setJobDescription(f"minhash-sig {name} n={n} t{trial}")
                t0 = time.perf_counter()
                fn()
                best[name] = min(best[name], time.perf_counter() - t0)
        sc.setJobDescription(None)
        for name, s in best.items():
            print(f"[probe] n={n} {name}: {s:.2f}s (min of 5)", flush=True)
        docsets.unpersist()
        release_caches()


if __name__ == "__main__":
    main()
