"""Vector math over ``array<float>`` embedding columns, as built-in
higher-order functions (verified bit-identical to DuckDB's
list_dot_product on the testdata).

Design note for 100 TB: these expressions keep the similarity math
JVM-side and rely on blocking (LSH sign buckets, IVF cells) to bound the
pair count; the brute-force form is only ever applied to a
broadcast-small query set.  Higher-order array expressions evaluate
INTERPRETED (Spark excludes them from whole-stage codegen), so the
operators using them precompute per-VECTOR quantities (norms) in
projections and spend only one dot product per candidate pair -- see
operators/similarity._PAIR_COS.  A vectorized Pandas-UDF path would only
win if we batched into BLAS; for 64-d vectors the join, not the
arithmetic, dominates once per-pair work is a single dot.
"""

from __future__ import annotations


def dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with(cast({a} as array<double>), cast({b} as array<double>),"
        f" (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )


def norm_spark(a: str) -> str:
    return (
        f"sqrt(aggregate(transform(cast({a} as array<double>), x -> x * x),"
        f" 0D, (acc, x) -> acc + x))"
    )


def cosine_spark(a: str, b: str) -> str:
    """Inline one-expression cosine (norms recomputed per evaluation --
    prefer the factored per-side-norm form for per-pair hot paths)."""
    return f"{dot_spark(a, b)} / ({norm_spark(a)} * {norm_spark(b)})"


def dot_duckdb(a: str, b: str) -> str:
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def norm_duckdb(a: str) -> str:
    return f"sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"


def cosine_duckdb(a: str, b: str) -> str:
    return f"{dot_duckdb(a, b)} / ({norm_duckdb(a)} * {norm_duckdb(b)})"
