"""Similarity search over embedding columns.

- :func:`topk_bruteforce` -- exact top-k cosine for a (small, broadcast)
  query set against the full corpus.  At 100 TB the query side is always the
  small side: broadcast it, scan the corpus once, TakeOrdered per query.
- :func:`sign_lsh_buckets` -- random-hyperplane (sign) LSH bucketing, the
  scale path: vectors sharing a bucket are candidate neighbors, so search
  cost drops from O(N) per query to O(N / 2^planes) expected.  Hyperplanes
  are DETERMINISTIC (md5-derived pseudo-random weights), so bucket ids are
  reproducible across runs/engines and oracle-checkable.
- :func:`topk_lsh` -- top-k restricted to LSH bucket collisions (approximate;
  multi-probe = also match buckets at Hamming distance 1).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot_spark, norm_spark

# Per-pair cosine, with each side's norm precomputed in its projection:
# higher-order array expressions (zip_with/aggregate) run interpreted
# (outside whole-stage codegen), so norms are evaluated once per VECTOR and
# only the dot once per pair -- same IEEE ops as the inline form (identical
# sqrt operands, identical division), so oracle exactness is unaffected.
_PAIR_COS = f"{dot_spark('qvec', 'cvec')} / (qnrm * cnrm)"


def _with_norm(df: DataFrame, vec_col: str, id_col: str, side: str) -> DataFrame:
    """Project (id, vec, norm) for one join side (side = 'q' or 'c')."""
    ident = "query_id" if side == "q" else "neighbor_id"
    return df.select(
        F.col(id_col).alias(ident),
        F.col(vec_col).alias(f"{side}vec"),
        F.expr(norm_spark(vec_col)).alias(f"{side}nrm"),
    )


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: weight(j, d) derives from
    md5('pl{j}:{d}'), uniform in [-1, 1] with 3 decimal places (exactly
    representable scale / 1000 keeps the literals engine-portable)."""
    planes = []
    for j in range(n_planes):
        w = []
        for d in range(dim):
            h = int(hashlib.md5(f"pl{j}:{d}".encode()).hexdigest()[:15], 16)
            w.append((h % 2001 - 1000) / 1000.0)
        planes.append(w)
    return planes


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (query side
    broadcast; ties broken by neighbor id for determinism)."""
    q = _with_norm(queries, vec_col, id_col, "q")
    c = _with_norm(corpus, vec_col, id_col, "c")
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.expr(_PAIR_COS).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def bucket_column(vec_col: str, n_planes: int = 8, dim: int = 64):
    """Spark Column: the sign-LSH bucket id in [0, 2^n_planes) of a vector
    column (usable inline in any projection -- no join needed)."""
    bucket = None
    for j, w in enumerate(hyperplanes(n_planes, dim)):
        arr = f"array({', '.join(repr(x) for x in w)})"
        bit = F.when(F.expr(dot_spark(vec_col, arr)) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("bigint")


def sign_lsh_buckets(
    df: DataFrame, vec_col: str, id_col: str, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Assign each vector a sign-LSH bucket id in [0, 2^n_planes)."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        bucket_column(vec_col, n_planes, dim).alias("bucket"),
    )


def bucket_expr_duckdb(vec: str, n_planes: int, dim: int) -> str:
    """DuckDB SQL computing the identical bucket id as
    :func:`sign_lsh_buckets` (hyperplanes are shared md5-derived constants)."""
    from ..functions.vectors import dot_duckdb

    terms = []
    for j, w in enumerate(hyperplanes(n_planes, dim)):
        arr = "[" + ", ".join(repr(x) for x in w) + "]"
        terms.append(
            f"(CASE WHEN {dot_duckdb(vec, arr)} >= 0"
            f" THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)


def centroids(n_cells: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random IVF centroids (same md5 scheme as
    :func:`hyperplanes`, different salt)."""
    cells = []
    for c in range(n_cells):
        w = []
        for d in range(dim):
            h = int(hashlib.md5(f"iv{c}:{d}".encode()).hexdigest()[:15], 16)
            w.append((h % 2001 - 1000) / 1000.0)
        cells.append(w)
    return cells


def _centroids_spark_literal(cells: list[list[float]]) -> str:
    rows = ", ".join(
        "array(" + ", ".join(repr(x) + "D" for x in w) + ")" for w in cells
    )
    return f"array({rows})"


def ivf_assign(
    df: DataFrame, vec_col: str, id_col: str, n_cells: int = 16, dim: int = 64
) -> DataFrame:
    """Coarse-quantize each vector to its best IVF cell (argmax dot against
    the deterministic centroids; ties broken by lowest cell id).

    This is the IVF BUILD step: at 100 TB the (vec_id, cell) assignment is
    computed once and persisted partitioned by cell, so queries touch only
    n_probe/n_cells of the corpus.  Assignment is a single corpus scan
    fanned out n_cells-fold before a per-id argmax — no shuffle wider than
    the id itself.
    """
    cents = _centroids_spark_literal(centroids(n_cells, dim))
    cell_dots = df.select(
        F.col(id_col).alias("vec_id"),
        F.explode(F.expr(f"sequence(0, {n_cells - 1})")).alias("cell"),
        F.col(vec_col).alias("v"),
    ).withColumn(
        "d", F.expr(dot_spark("v", f"element_at({cents}, cell + 1)"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("d"), F.asc("cell"))
    return (
        cell_dots.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


def ivf_assign_fast(
    df: DataFrame, vec_col: str, id_col: str, n_cells: int = 16, dim: int = 64
) -> DataFrame:
    """Arrow-vectorized IVF cell assignment: one numpy matmul
    (batch x dim) @ (dim x n_cells) + argmax per Arrow batch via
    ``mapInPandas``.

    :func:`ivf_assign` expresses the argmax-dot declaratively, but Spark
    evaluates higher-order array expressions INTERPRETED (outside
    whole-stage codegen), so its cost O(N * n_cells * dim) dominates the
    IVF build once n_cells grows with the corpus (measured ~5x the whole
    rest of the pipeline at 200k x 400 cells).  Dense linear algebra is
    exactly the workload where the guidance flips: an Arrow-batched numpy
    kernel does the same flops vectorized, ~10x faster, and shuffles
    nothing (assignment is embarrassingly parallel per partition).

    Trade-off that keeps BOTH implementations: numpy's pairwise float
    summation order differs from the SQL aggregate's left-to-right order,
    so near-tie argmax decisions can differ in the last ulp -- fine for an
    index build (any consistent assignment works; queries probe by the
    same centroids), but not bit-reproducible in a SQL oracle.  The
    oracle-checked registry query therefore uses :func:`ivf_assign`; bench
    and scale paths use this.
    """
    import numpy as np
    import pandas as pd

    from ..session import ship_package

    ship_package(df.sparkSession)
    cents = np.array(centroids(n_cells, dim), dtype=np.float64).T  # dim x cells

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)  # batch x dim
            dots = mat @ cents  # batch x cells
            # argmax with ties to the LOWEST cell id (np.argmax keeps the
            # first maximum, matching ivf_assign's tie-break).
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": dots.argmax(axis=1).astype("int32")}
            )

    src = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    return src.mapInPandas(assign, schema="vec_id long, cell int")


def ivf_probes(
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
) -> DataFrame:
    """(query_id, cell) rows: each query's ``n_probe`` nearest IVF cells by
    centroid dot product (ties to the lowest cell id)."""
    cents = _centroids_spark_literal(centroids(n_cells, dim))
    qd = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.expr(f"sequence(0, {n_cells - 1})")).alias("cell"),
        F.col(vec_col).alias("v"),
    ).withColumn("d", F.expr(dot_spark("v", f"element_at({cents}, cell + 1)")))
    w = Window.partitionBy("query_id").orderBy(F.desc("d"), F.asc("cell"))
    return (
        qd.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "cell")
    )


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: each query probes its ``n_probe`` nearest
    cells and scores only corpus vectors assigned there — expected search
    cost O(N * n_probe / n_cells) per query instead of O(N).

    ``assigned`` optionally supplies a pre-built (neighbor_id, cell)
    assignment — e.g. read back from a cell-partitioned Parquet layout, the
    at-scale deployment shape — otherwise it is computed inline.
    """
    corpus_cells = (
        assigned
        if assigned is not None
        else ivf_assign(corpus, vec_col, id_col, n_cells, dim).withColumnRenamed(
            "vec_id", "neighbor_id"
        )
    )
    probes = ivf_probes(queries, vec_col, id_col, n_cells, n_probe, dim)
    c = _with_norm(corpus, vec_col, id_col, "c").join(corpus_cells, "neighbor_id")
    q = _with_norm(queries, vec_col, id_col, "q").join(probes, "query_id")
    pairs = c.join(F.broadcast(q), "cell").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", F.expr(_PAIR_COS).alias("cos_sim")
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(wr)).where(F.col("rank") <= k)


def knn_graph_ivf(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_cells: int = 64,
    dim: int = 64,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Full k-NN graph: EVERY vector's top-k cosine neighbors among the
    vectors sharing its IVF cell (n_probe=1) -- the all-to-all ANN shape
    behind SemDeDup-style curation and graph-based near-dup clustering.

    Unlike :func:`topk_ivf` (few queries, query side broadcast), here the
    query side IS the corpus, so NEITHER side is broadcast: both sides
    shuffle once on ``cell`` and the candidate join is cell-co-partitioned.
    Per-cell work is occupancy^2, so ``n_cells`` is the scale knob grown
    with N to hold cell occupancy (N/n_cells) constant -- total work
    O(N^2/n_cells) stays linear when n_cells grows linearly, and no
    single-point bottleneck exists anywhere in the plan.
    """
    cells = (
        assigned
        if assigned is not None
        else ivf_assign(df, vec_col, id_col, n_cells, dim)
    )
    q = _with_norm(df, vec_col, id_col, "q").join(
        cells.withColumnRenamed("vec_id", "query_id"), "query_id"
    )
    c = _with_norm(df, vec_col, id_col, "c").join(
        cells.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    )
    pairs = q.join(c, "cell").where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", F.expr(_PAIR_COS).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: only score candidates whose LSH bucket matches the
    query's bucket exactly or at Hamming distance 1 (multi-probe).

    Candidate generation EXPLODES each query into its n_planes + 1 probe
    buckets (its own bucket plus every single-bit flip) and equi-joins the
    corpus on ``bucket`` -- a hash join whose cost is the occupancy of the
    probed buckets, expected O(N * (n_planes + 1) / 2^n_planes) per query.
    This produces the identical candidate set as filtering
    ``bit_count(bucket ^ qbucket) <= 1`` over the cross product (a bucket is
    within Hamming 1 of qbucket iff it IS one of the probes), without the
    O(N * Q) nested-loop scan; the probe buckets are pairwise distinct, so
    no candidate is emitted twice.  tests/test_plans.py pins the plan to a
    broadcast HASH join on bucket, not BroadcastNestedLoopJoin.
    """
    cb = sign_lsh_buckets(corpus, vec_col, id_col, n_planes, dim).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    qb = sign_lsh_buckets(queries, vec_col, id_col, n_planes, dim).withColumnRenamed(
        "vec_id", "query_id"
    )
    c = _with_norm(corpus, vec_col, id_col, "c").join(cb, "neighbor_id")
    probe_arr = F.array(
        F.col("qbucket"),
        *[F.expr(f"qbucket ^ {1 << j}").cast("bigint") for j in range(n_planes)],
    )
    q = (
        _with_norm(queries, vec_col, id_col, "q")
        .join(qb, "query_id")
        .withColumnRenamed("bucket", "qbucket")
        .select("query_id", "qvec", "qnrm", F.explode(probe_arr).alias("bucket"))
    )
    pairs = c.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id", "neighbor_id", F.expr(_PAIR_COS).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
