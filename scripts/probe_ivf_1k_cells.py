"""Re-probe the rebalanced dynamic-partition write at a PRODUCTION-shaped
cell count (r11 verdict item 8): thousands of cells instead of the test
corpus's 16, with one deliberately hot cell, to confirm

  (a) the file-count bound: total files ~ number of cells (the r11 fix's
      100 TB claim), not tasks x cells, and
  (b) AQE still SPLITS the oversized cell (REBALANCE_PARTITIONS_BY_COL
      allows splitting skewed groups): the hot cell must land in >1 file
      and the write must show no single-task straggler wall.

The cell values are synthesized directly (deterministic md5-derived, ~20%
of rows forced into cell 0) -- the write wall under test is independent of
HOW cells were assigned, and a 1024-term argmax assignment expression
would only add noise (it exceeds the codegen method limit; the registered
plans use the numpy kernel for big cell counts).

Usage: python scripts/probe_ivf_1k_cells.py [--n-vecs N] [--n-cells C]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_format_in_parquet_benchmark_spark.session import get_spark  # noqa: E402


def parquet_files(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vecs", type=int, default=5_000_000)
    ap.add_argument("--n-cells", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/jfipb_probe_ivf1k")
    args = ap.parse_args()
    spark = get_spark(app_name="probe-ivf-1k")
    os.makedirs(args.workdir, exist_ok=True)

    h = "cast(conv(substr(md5(concat(vec_id, '#', j)), 1, 15), 16, 10) as bigint)"
    ch = "cast(conv(substr(md5(concat('c', vec_id)), 1, 15), 16, 10) as bigint)"
    staged = (
        spark.range(args.n_vecs)
        .selectExpr("id as vec_id")
        .selectExpr(
            "vec_id",
            f"transform(sequence(0, {args.dim - 1}), "
            f" j -> cast(({h} % 2001 - 1000) as float) / 1000.0f) as embedding",
            # ~20% of rows into cell 0 (the hot cell AQE must split);
            # the rest spread over n_cells uniformly.
            f"case when {ch} % 5 = 0 then 0L"
            f"     else {ch} % {args.n_cells} end as cell",
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )

    out = os.path.join(args.workdir, "ivf_1k_rebalanced")
    best = float("inf")
    for t in range(args.trials):
        shutil.rmtree(out, ignore_errors=True)
        spark.sparkContext.setJobDescription(f"ivf-1k rebalanced write t{t}")
        t0 = time.perf_counter()
        (
            staged.hint("rebalance", "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(out)
        )
        best = min(best, time.perf_counter() - t0)
    files = parquet_files(out)
    hot = [f for f in files if f"{os.sep}cell=0{os.sep}" in f]
    n_cells_written = len(
        glob.glob(os.path.join(out, "cell=*"))
    )
    print(
        '{"n_docs": %d, "op": "ivf_1k_cell_write_rebalanced", "sec": %.2f, '
        '"rows": %d}' % (args.n_vecs, best, len(files)),
        flush=True,
    )
    print(
        f"[probe] cells written: {n_cells_written}, total files: "
        f"{len(files)}, hot-cell (20%% of rows) files: {len(hot)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
