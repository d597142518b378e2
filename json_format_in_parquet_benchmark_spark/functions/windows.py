"""Shared window recipes with paired Spark/DuckDB forms.

Two boundary-sensitive patterns appear across the text and multimodal
pipelines and must stay bit-identical between the Spark plan and its
oracle:

- **Budget packing**: items pack in order into fixed-budget shards via
  ``shard = floor(preceding-size-sum / budget)`` (token shards, byte
  shards).
- **Exact rank quantile**: the value at rank ``floor(p * (n-1))`` under a
  deterministic (value, id) order -- the engine-exact percentile used for
  adaptive cut bands.

Each recipe has one Spark Column builder and one SQL-snippet builder so
the arithmetic lives in exactly one place; an off-by-one (``p*(n-1)`` vs
``p*n``) or a convention change (preceding vs inclusive cumulative sum)
edits here edits every consumer and its oracle together.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def pack_shard_spark(
    part_col: str, order_col: str, size_col: str, budget: int
) -> Column:
    """Spark: shard id by cumulative-size budget packing within a group."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        F.floor(
            (F.sum(size_col).over(w) - F.col(size_col)) / float(budget)
        ).cast("bigint")
    )


def pack_shard_duck(
    part_col: str, order_col: str, size_col: str, budget: int
) -> str:
    """DuckDB SQL expression computing :func:`pack_shard_spark` exactly."""
    return (
        f"CAST(FLOOR((SUM({size_col}) OVER (PARTITION BY {part_col}"
        f" ORDER BY {order_col} ROWS UNBOUNDED PRECEDING)"
        f" - {size_col}) / {budget}.0) AS BIGINT)"
    )


def rank_cut_spark(rn_col: str, n_col: str, p: float, val_col: str) -> Column:
    """Spark: aggregate arm picking the value at rank floor(p * (n-1)).

    Use inside ``groupBy(part).agg(...)`` over a frame carrying
    ``rn`` = row_number - 1 (ordered by (value, id)) and ``n`` = group
    count: ``F.max(rank_cut_spark("rn", "n", 0.05, "n_chars"))``.
    """
    return F.when(
        F.col(rn_col) == F.floor(p * (F.col(n_col) - 1)).cast("bigint"),
        F.col(val_col),
    )


def rank_cut_duck(rn_col: str, n_col: str, p: float, val_col: str) -> str:
    """DuckDB SQL aggregate arm for :func:`rank_cut_spark` (wrap in MAX)."""
    return (
        f"CASE WHEN {rn_col} = CAST(FLOOR({p} * ({n_col} - 1)) AS BIGINT)"
        f" THEN {val_col} END"
    )
