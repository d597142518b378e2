"""TPC-H completion set: the nine spec queries (Q2, Q4, Q9, Q11, Q12, Q16,
Q19, Q20, Q21) not already covered by ``queries_relational``, adapted to the
testdata schema the same way the existing q13/q22 adaptations are.

The testdata has no ``partsupp`` table and the slim lineitem lacks
commit/receipt dates and ship modes, so:

- the part-supplier relationship is DERIVED from lineitem (a supplier
  "supplies" a part if it ever shipped a line of it), and per-pair unit cost
  is the minimum observed ``l_extendedprice / l_quantity``;
- "late" is expressed against the only dates present: a line is late when it
  ships more than N days after its order date;
- Q12's ship-mode classes become ship-delay buckets;
- Q16's supplier-complaint exclusion becomes a negative-balance exclusion.

Each adaptation keeps the SHAPE the spec query exists to exercise --
correlated scalar-min (Q2), EXISTS semi-join (Q4), multi-way profit rollup
(Q9), scalar-threshold group filter (Q11), CASE-bucketed counts (Q12),
anti-filtered distinct counting (Q16), OR-of-ANDs join predicates (Q19),
nested semi-join chain (Q20), and the sole-late-supplier EXISTS/NOT-EXISTS
pair (Q21) -- so Catalyst faces the same optimization problems.

Cross-engine exactness follows the registry rules: money is quantized to
integer cents from exact decimal sums (or via round() on identical IEEE
doubles), never compared as raw float sums.  Quantities go through
round() before any BIGINT cast: a bare double->BIGINT cast ROUNDS in
DuckDB but TRUNCATES in Spark, a divergence invisible on integral data
and fatal the day the generator emits a fractional quantity.

Scale notes (100 TB): every query here shuffles the fact table at most once
on a natural key; all dimension joins are broadcast-hinted; the Q21
decorrelation trades the spec's two correlated subqueries for one extra
aggregate over the SAME shuffle key (l_orderkey), so the fact scan count
stays at one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import register

# Exact per-line revenue in integer cents: decimal math keeps the product
# exact, the double cast and round() are bit-identical across engines.
_REV_CENTS_D = (
    "CAST(round(CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) * 100.0) AS BIGINT)"
)
_REV_CENTS_S = (
    "cast(round(cast(cast(l_extendedprice as decimal(18,2))"
    " * (1 - cast(l_discount as decimal(18,2))) as double) * 100.0) as bigint)"
)


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH euro_supp AS (
  SELECT s.s_suppkey, s.s_name, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
),
costs AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(MIN(round(l.l_extendedprice / l.l_quantity * 100.0)) AS BIGINT)
           AS unit_cents
  FROM lineitem l
  JOIN euro_supp es ON es.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_size <= 15 AND p.p_type = 'SMALL'
  GROUP BY l.l_partkey, l.l_suppkey
),
best AS (
  SELECT l_partkey, MIN(unit_cents) AS best_cents
  FROM costs GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, es.s_name, es.n_name, c.unit_cents
FROM costs c
JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cents = b.best_cents
JOIN part p ON p.p_partkey = c.l_partkey
JOIN euro_supp es ON es.s_suppkey = c.l_suppkey
ORDER BY c.unit_cents, p.p_partkey, es.s_name
""",
    doc="TPC-H Q2-style minimum-cost supplier, adapted: no partsupp table, "
    "so the part-supplier catalog is derived from lineitem and the "
    "supply cost is the minimum observed unit price (cents, exact).  "
    "Keeps Q2's correlated scalar-min shape: the per-part minimum over "
    "the REGION-RESTRICTED supplier set, then the equality join back to "
    "recover the argmin rows (ties all emitted, per spec).  Supplier/"
    "nation/region are broadcast; lineitem shuffles once on the "
    "(partkey, suppkey) aggregate key; the per-part min is a second "
    "tiny aggregate over already-reduced pairs.",
    tags=("relational", "tpch", "join", "subquery", "aggregation"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
    )
    euro = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    costs = (
        li.join(F.broadcast(euro), li.l_suppkey == euro.s_suppkey)
        .join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.expr(
                "cast(min(round(l_extendedprice / l_quantity * 100.0)) as bigint)"
            ).alias("unit_cents")
        )
    )
    best = costs.groupBy(F.col("l_partkey").alias("bk")).agg(
        F.min("unit_cents").alias("best_cents")
    )
    argmin = costs.join(
        best,
        (costs.l_partkey == F.col("bk"))
        & (costs.unit_cents == F.col("best_cents")),
    )
    return (
        argmin.join(F.broadcast(p), argmin.l_partkey == p.p_partkey)
        .join(F.broadcast(euro), argmin.l_suppkey == euro.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cents")
        .orderBy("unit_cents", "p_partkey", "s_name")
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    doc="TPC-H Q4-style order priority checking, adapted: with no "
    "commit/receipt dates, a 'late' order is one with a line shipping "
    "more than 90 days after the order date.  The EXISTS decorrelates "
    "to a LEFT SEMI join with a mixed equi + non-equi condition -- "
    "Spark hashes on the equi key (one shuffle of the pruned 3-column "
    "lineitem projection) and applies the date predicate as the join "
    "residual, exactly what the spec query is designed to exercise.",
    tags=("relational", "tpch", "semi-join", "aggregation"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + interval 90 days")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q9_product_profit",
    oracle="""
WITH lines AS (
  SELECT ns.n_name AS nation,
         CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
         {rev} AS rev_cents,
         CAST(round(p.p_retailprice * 100.0) AS BIGINT)
           * CAST(round(l.l_quantity) AS BIGINT) AS cost_cents
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%widget%'
)
SELECT nation, o_year,
       CAST(CAST(SUM(rev_cents * 10 - cost_cents * 8) AS DOUBLE)
            / 1000.0 AS DOUBLE) AS sum_profit,
       COUNT(*) AS n_lines
FROM lines
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""".format(rev=_REV_CENTS_D),
    doc="TPC-H Q9-style product type profit, adapted: no partsupp, so the "
    "supply cost is modeled as 80% of the part's retail price per unit.  "
    "Profit is computed entirely in integer tenth-cents "
    "(10*revenue_cents - 8*cost_cents), so the group sums are order-free "
    "integer arithmetic and the final dollars value is one deterministic "
    "IEEE division.  Plan: part/supplier/nation broadcast; the "
    "orders-lineitem fact-fact join shuffles each side once on the "
    "order key; the name LIKE filter prunes parts before the broadcast.",
    tags=("relational", "tpch", "join", "aggregation"),
    bench=True,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    lines = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.expr(_REV_CENTS_S).alias("rev_cents"),
            (
                F.expr("cast(round(p_retailprice * 100.0) as bigint)")
                * F.expr("cast(round(l_quantity) as bigint)")
            ).alias("cost_cents"),
        )
    )
    return (
        lines.groupBy("nation", "o_year")
        .agg(
            (
                F.sum(F.col("rev_cents") * 10 - F.col("cost_cents") * 8)
                .cast("double")
                / F.lit(1000.0)
            ).cast("double").alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_parts",
    oracle="""
WITH ev AS (
  SELECT l.l_partkey AS p_partkey,
         CAST(SUM({rev}) AS BIGINT) AS value_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY l.l_partkey
),
tot AS (
  SELECT CAST(SUM(value_cents) AS BIGINT) AS t, COUNT(*) AS np FROM ev
)
SELECT ev.p_partkey, ev.value_cents
FROM ev CROSS JOIN tot
WHERE CAST(ev.value_cents AS DOUBLE)
      > 1.5 * (CAST(tot.t AS DOUBLE) / tot.np)
ORDER BY ev.value_cents DESC, ev.p_partkey
""".format(rev=_REV_CENTS_D),
    doc="TPC-H Q11-style important stock identification, adapted: with no "
    "partsupp availqty, a part's 'stock value' is the revenue shipped by "
    "EUROPE suppliers, and the importance threshold is scale-free -- "
    "parts worth more than 1.5x the average part value (the spec's "
    "0.0001/SF fraction bakes the scale factor into the query; the "
    "above-average form keeps selectivity stable from sf0.001 to 100 TB).  "
    "Same shape: grouped value, scalar aggregate over the grouped "
    "result, broadcast back as a one-row cross join -- the fact table "
    "is scanned and shuffled exactly once.",
    tags=("relational", "tpch", "aggregation", "subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    euro = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    ev = (
        li.join(F.broadcast(euro), li.l_suppkey == euro.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.expr(f"cast(sum({_REV_CENTS_S}) as bigint)").alias("value_cents"))
    )
    tot = ev.agg(
        F.sum("value_cents").cast("bigint").alias("t"),
        F.count(F.lit(1)).alias("np"),
    )
    return (
        ev.crossJoin(F.broadcast(tot))
        .where(
            F.col("value_cents").cast("double")
            > 1.5 * (F.col("t").cast("double") / F.col("np"))
        )
        .select("p_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "p_partkey")
    )


@register(
    "q12_ship_delay_priority",
    oracle="""
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
            THEN 'fast'
            WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90
            THEN 'normal' ELSE 'slow' END AS delay_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY delay_bucket
ORDER BY delay_bucket
""",
    doc="TPC-H Q12-style shipping priority classes, adapted: no ship modes "
    "in the schema, so lines are classed by ship DELAY bucket "
    "(order-to-ship days: <=30 fast, <=90 normal, else slow) and counted "
    "by order priority -- the same CASE-bucketed conditional-count shape. "
    "The year filter pushes to the lineitem parquet scan; one fact-fact "
    "shuffle on the order key; both counts aggregate in a single pass.",
    tags=("relational", "tpch", "join", "aggregation", "filter"),
)
def q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.when(F.datediff("l_shipdate", "o_orderdate") <= 30, "fast")
        .when(F.datediff("l_shipdate", "o_orderdate") <= 90, "normal")
        .otherwise("slow")
        .alias("delay_bucket"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_high"),
    )
    return (
        joined.groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@register(
    "q16_part_supplier_variety",
    oracle="""
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part p     ON p.p_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND s.s_acctbal >= 0
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    doc="TPC-H Q16-style parts/supplier relationship, adapted: the "
    "part-supplier catalog is the DISTINCT (partkey, suppkey) pairs "
    "observed in lineitem, and the spec's complaint-comment exclusion "
    "becomes a negative-balance exclusion (the only supplier-quality "
    "signal in the slim schema).  Shape preserved: NOT-IN style "
    "exclusions, then COUNT(DISTINCT supplier) per part descriptor.  "
    "The distinct-pairs reduction happens BEFORE the part join, so the "
    "expensive distinct count runs on the reduced catalog, not raw "
    "lineitem; part and the supplier exclusion list broadcast.",
    tags=("relational", "tpch", "aggregation", "distinct"),
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5") & (F.col("p_type") != "PROMO")
    )
    s = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") >= 0
    ).select("s_suppkey")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 50)
""",
    doc="TPC-H Q19-style discounted revenue with disjunctive join "
    "predicates (OR of three brand/size/quantity conjunctions, minus the "
    "container/shipmode terms the schema lacks).  The part-side terms of "
    "each disjunct (brand, size) filter the broadcast build side; the "
    "mixed part+line terms evaluate as the join residual -- the query "
    "exists to verify the optimizer doesn't fall back to a cartesian "
    "plan on OR predicates, and Spark keeps the equi-key hash join with "
    "the disjunction as a post-join filter.",
    tags=("relational", "tpch", "join", "filter", "aggregation"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).where(cond)
    return joined.selectExpr(
        "cast(sum(cast(l_extendedprice as decimal(18,2))"
        " * (1 - cast(l_discount as decimal(18,2)))) as double) as revenue",
        "count(*) as n_lines",
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
WITH sp AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_partkey, l.l_suppkey
),
tot AS (
  SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS total_qty
  FROM sp GROUP BY l_partkey
),
dominant AS (
  SELECT DISTINCT sp.l_suppkey
  FROM sp JOIN tot ON tot.l_partkey = sp.l_partkey
  WHERE CAST(sp.qty AS DOUBLE) > 0.25 * CAST(tot.total_qty AS DOUBLE)
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN dominant d ON d.l_suppkey = s.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY s.s_suppkey
""",
    doc="TPC-H Q20-style potential part promotion, adapted: with no "
    "partsupp availqty, the 'excess' test becomes a dominance test -- "
    "suppliers who shipped more than 25% of a 'small%' part's 1997 "
    "volume.  Shape preserved: a nested chain of reductions (name-"
    "filtered parts -> per-(part,supplier) quantities -> per-part "
    "totals -> qualifying supplier ID list) ending in a SEMI join "
    "against the supplier dimension.  Quantities are exact integers; "
    "the threshold comparison is deterministic IEEE on identical "
    "operands.  The supplier list is tiny and broadcast.",
    tags=("relational", "tpch", "semi-join", "subquery", "aggregation"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.expr("cast(round(l_quantity) as bigint)"))
            .cast("bigint")
            .alias("qty")
        )
    )
    tot = sp.groupBy(F.col("l_partkey").alias("tk")).agg(
        F.sum("qty").cast("bigint").alias("total_qty")
    )
    dominant = (
        sp.join(tot, sp.l_partkey == F.col("tk"))
        .where(
            F.col("qty").cast("double")
            > 0.25 * F.col("total_qty").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(dominant), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH l2 AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM l2
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name,
       COUNT(*) AS numwait
FROM late lt
JOIN supplier s ON s.s_suppkey = lt.l_suppkey
WHERE EXISTS (SELECT 1 FROM l2
              WHERE l2.l_orderkey = lt.l_orderkey
                AND l2.l_suppkey <> lt.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late x
                  WHERE x.l_orderkey = lt.l_orderkey
                    AND x.l_suppkey <> lt.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
    doc="TPC-H Q21-style suppliers who kept orders waiting, adapted: "
    "'late' is shipping >60 days after the order date (no receipt/"
    "commit dates).  The spec's correlated EXISTS + NOT EXISTS pair "
    "(another supplier participated / no other supplier was late) "
    "decorrelates in Spark to per-order distinct-supplier counts over "
    "the SAME l_orderkey shuffle: a late (order, supplier) row "
    "qualifies iff the order has >1 distinct supplier and exactly 1 "
    "distinct LATE supplier -- one fact-fact join, two small "
    "aggregates, zero correlated rescans.  Cites reference parity: the "
    "reference has no relational runtime (SURVEY.md section 2.2); this "
    "completes the derived TPC-H surface.",
    tags=("relational", "tpch", "join", "subquery", "aggregation"),
    bench=True,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")
    l2 = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    late = (
        l2.where(F.expr("l_shipdate > o_orderdate + interval 60 days"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    per_order = l2.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    late_per_order = late.groupBy(F.col("l_orderkey").alias("lk")).agg(
        F.countDistinct("l_suppkey").alias("n_late")
    )
    sole = (
        late.join(per_order, late.l_orderkey == F.col("ok"))
        .join(late_per_order, late.l_orderkey == F.col("lk"))
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
