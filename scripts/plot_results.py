#!/usr/bin/env python
"""Grouped-bar plots of storage results (O26, reference scripts/plot.py:12-59).

Reads a CSV in the reference's benchmark_results.csv layout (e.g.
results/storage_results.csv) and renders file size + compression ratio per
format, grouped by ndv/num_of_lines -- the same figure the reference
publishes as figures/events.png.  matplotlib is optional in this
environment; without it the script prints an aligned table instead.

Usage: python scripts/plot_results.py [csv_path] [out_png]
"""

from __future__ import annotations

import csv
import sys
from collections import defaultdict


def load(csv_path: str):
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    for r in rows:
        r["parquet_file_size"] = int(r["parquet_file_size"])
        r["compressed_rate"] = float(r["compressed_rate"])
    return rows


def main() -> None:
    csv_path = sys.argv[1] if len(sys.argv) > 1 else "results/storage_results.csv"
    out_png = sys.argv[2] if len(sys.argv) > 2 else "results/storage_results.png"
    rows = load(csv_path)
    groups = sorted({(r["ndv"], r["num_of_lines"]) for r in rows})
    formats = sorted({r["format"] for r in rows})
    by_key = {(r["format"], r["ndv"], r["num_of_lines"]): r for r in rows}

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print(f"{'ndv/rows':>14} | " + " | ".join(f"{f:>10}" for f in formats))
        for metric in ("parquet_file_size", "compressed_rate"):
            print(f"-- {metric} --")
            for g in groups:
                cells = [by_key.get((f, *g)) for f in formats]
                vals = " | ".join(
                    f"{c[metric]:>10}" if c else " " * 10 for c in cells
                )
                print(f"{g[0] + '/' + g[1]:>14} | {vals}")
        return

    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    width = 0.8 / len(formats)
    xs = range(len(groups))
    for ax, metric, title in zip(
        axes,
        ("parquet_file_size", "compressed_rate"),
        ("Parquet file size (bytes)", "Compression ratio (size/original)"),
    ):
        for i, fmt in enumerate(formats):
            vals = [
                by_key[(fmt, *g)][metric] if (fmt, *g) in by_key else 0
                for g in groups
            ]
            ax.bar([x + i * width for x in xs], vals, width, label=fmt)
        ax.set_xticks([x + 0.4 - width / 2 for x in xs])
        ax.set_xticklabels([f"{g[0]}/{g[1]}" for g in groups], rotation=45)
        ax.set_title(title)
        ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    print(f"wrote {out_png}")


if __name__ == "__main__":
    main()
