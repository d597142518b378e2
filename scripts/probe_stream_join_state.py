"""Measure the streaming state-partition sizing on the DRIVER seam (vanilla
session): stream_stream_join / stream_stream_left_outer walls with the
registered scoped-8 override in _run_to_memory vs the vanilla session's 200
state partitions (override disabled via monkeypatch).

The override has been in the code since round 2; the r11 verdict asked for
the measurement that shows what it is worth on the driver's own session
shape, not for new code.  Each arm also reports the first-run wall
(staging included) and warm re-runs separately, because _staged_events
memoizes the one-file stage per sf_dir.

Usage: python scripts/probe_stream_join_state.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("stream-join-state-probe")
        .getOrCreate()
    )
    from json_format_in_parquet_benchmark_spark.plans import REGISTRY
    from json_format_in_parquet_benchmark_spark.plans import (
        queries_streaming as qs,
    )

    real_run = qs._run_to_memory

    def run_vanilla_partitions(stream_df, name, output_mode):
        """_run_to_memory without the scoped shuffle-partition override."""
        import tempfile

        qs._RUN_SEQ += 1
        unique = f"{name}_v200_{qs._RUN_SEQ}"
        ckpt = tempfile.mkdtemp(prefix=f"jfipb_ckpt_{unique}_")
        q = (
            stream_df.writeStream.format("memory")
            .queryName(unique)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        return stream_df.sparkSession.table(unique)

    for qname in ("stream_stream_join", "stream_stream_left_outer"):
        fn = REGISTRY[qname].fn
        # cold first run (includes one-time staging of the events file)
        t0 = time.perf_counter()
        n_rows = fn(spark, SF_DIR).count()
        cold = time.perf_counter() - t0
        print(f"[probe] {qname}: cold first run {cold:.2f}s ({n_rows} rows)",
              flush=True)
        best = {"scoped_8": float("inf"), "vanilla_200": float("inf")}
        counts = {}
        for trial in range(3):
            for arm in best:
                qs._run_to_memory = (
                    real_run if arm == "scoped_8" else run_vanilla_partitions
                )
                spark.sparkContext.setJobDescription(
                    f"{qname} {arm} t{trial}"
                )
                t0 = time.perf_counter()
                counts[arm] = fn(spark, SF_DIR).count()
                best[arm] = min(best[arm], time.perf_counter() - t0)
        qs._run_to_memory = real_run
        spark.sparkContext.setJobDescription(None)
        assert counts["scoped_8"] == counts["vanilla_200"], counts
        for arm, s in best.items():
            print(f"[probe] {qname} {arm}: {s:.2f}s (min of 3, warm staging)",
                  flush=True)


if __name__ == "__main__":
    main()
