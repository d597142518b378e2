"""Graph-analytics queries: iterative rank propagation over a graph built
from the relational testdata.

The graph is the supplier<->customer trading network: an undirected edge
links supplier s and customer c whenever s supplied a line of one of c's
orders.  Node ids are disambiguated onto one integer axis (customer k ->
2k, supplier k -> 2k + 1) so the frame stays single-typed.

The PageRank iteration itself is integer-exact (operators/graph.py) so the
DuckDB oracle -- the same three supersteps unrolled as CTEs -- matches
bit-for-bit, sums included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import DAMP_DEN, DAMP_NUM, RANK_SCALE, pagerank
from ..tables import load_table
from .registry import register

PR_ITERS = 3
PR_TOP = 25


def _pagerank_oracle() -> str:
    scale = RANK_SCALE
    residual = scale - scale * DAMP_NUM // DAMP_DEN
    parts = [
        """eraw AS MATERIALIZED (
  SELECT DISTINCT l.l_suppkey * 2 + 1 AS a, o.o_custkey * 2 AS b
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)""",
        "edges AS MATERIALIZED (SELECT a AS src, b AS dst FROM eraw"
        " UNION ALL SELECT b AS src, a AS dst FROM eraw)",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges)",
        # (every node of this undirected graph appears as a src)
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({scale} // nn.n AS BIGINT) AS rank_q"
        " FROM nodes CROSS JOIN nn)",
    ]
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f"""f{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(({DAMP_NUM} * r.rank_q) // ({DAMP_DEN} * d.outdeg))
              AS BIGINT) AS inflow
  FROM {prev} r JOIN deg d ON d.src = r.node
  JOIN edges e ON e.src = r.node
  GROUP BY e.dst
)"""
        )
        parts.append(
            f"""r{i} AS (
  SELECT nd.node,
         CAST({residual} // nn.n + COALESCE(f.inflow, 0) AS BIGINT)
           AS rank_q
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN f{i} f ON f.node = nd.node
)"""
        )
        prev = f"r{i}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node // 2 AS entity_id,
       CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END AS kind,
       rank_q
FROM {prev}
ORDER BY rank_q DESC, node
LIMIT {PR_TOP}
"""
    )


@register(
    "graph_pagerank_trading",
    oracle=_pagerank_oracle(),
    doc=f"PageRank ({PR_ITERS} supersteps, damping {DAMP_NUM}/{DAMP_DEN}) "
    "over the supplier<->customer trading network derived from "
    "lineitem x orders.  Pregel-on-DataFrames: each superstep is one "
    "shuffle (contributions map-side-combined on the destination); the "
    "rank state is |V| rows against |E| edges, so at 100 TB the per-step "
    "join broadcasts ranks when |V| fits and shuffle-joins otherwise (AQE "
    "decides per superstep).  Ranks live on an integer grid with floor "
    "divisions, making every superstep -- and therefore the final ranking "
    "-- bit-identical across engines (operators/graph.py:pagerank).",
    tags=("graph", "pagerank", "iterative"),
    bench=True,
)
def graph_pagerank_trading(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    eraw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2 + 1).alias("a"),
            (F.col("o_custkey") * 2).alias("b"),
        )
        .distinct()
    )
    edges = eraw.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(eraw.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    ranks = pagerank(edges, n_iters=PR_ITERS)
    return (
        ranks.orderBy(F.col("rank_q").desc(), F.col("node"))
        .limit(PR_TOP)
        .select(
            F.expr("node div 2").alias("entity_id"),
            F.expr(
                "case when node % 2 = 1 then 'supplier' else 'customer' end"
            ).alias("kind"),
            "rank_q",
        )
    )
