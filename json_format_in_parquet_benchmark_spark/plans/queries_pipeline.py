"""End-to-end corpus-cleaning pipeline: the composition a training-data
run actually executes, as ONE declarative plan the driver value-checks.

Stages (documents -> clean corpus summary):
1. quality gate        -- deterministic quality score >= threshold
                          (same formula as text_quality_score).
2. exact dedup         -- keep only the min-doc_id representative of each
                          sorted-distinct-tokenset group (word-order
                          shuffles collapse).
3. near-dup clustering -- MinHash-LSH pairs -> connected components; only
                          cluster representatives survive.
4. summary             -- kept docs per (lang, source) with char totals.

Scale shape: stages 1-2 are scan + one groupBy; stage 3 touches only the
candidate-pair subgraph (tiny); the anti-joins broadcast the drop lists.
Nothing here is new machinery -- the point is that the composed pipeline
stays a single Catalyst plan with an exact cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    stopword_count_duckdb,
    stopword_count_spark,
    tokens_duckdb,
    tokens_spark,
)
from ..operators.dedup import connected_components, minhash_lsh_pairs
from ..tables import load_table
from .queries_dedup import (
    MINHASH_BANDS,
    MINHASH_K,
    MINHASH_MAX_BUCKET,
    MINHASH_SHINGLE,
    MINHASH_THRESHOLD,
    _minhash_pairs_cte,
)
from .registry import register

QUALITY_THRESHOLD = 0.68

_TOKS_S = tokens_spark("text")
_TOKS_D = tokens_duckdb("text")

_QUALITY_S = (
    "0.5 * (cast(length(regexp_replace(text, '[^a-z]', '')) as double)"
    " / cast(length(text) as double))"
    f" + 0.3 * (1.0 - cast({stopword_count_spark(_TOKS_S)} as double)"
    f" / cast(size({_TOKS_S}) as double))"
    f" + 0.2 * least(1.0, cast(size({_TOKS_S}) as double) / 100.0)"
)

_QUALITY_D = (
    "0.5 * (CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)"
    " / CAST(length(text) AS DOUBLE))"
    f" + 0.3 * (1.0 - CAST({stopword_count_duckdb(_TOKS_D)} AS DOUBLE)"
    f" / CAST(len({_TOKS_D}) AS DOUBLE))"
    f" + 0.2 * least(1.0, CAST(len({_TOKS_D}) AS DOUBLE) / 100.0)"
)


@register(
    "pipeline_clean_corpus",
    oracle="WITH RECURSIVE "
    + _minhash_pairs_cte()
    + f""",
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach AS (
  SELECT s AS node, s AS label FROM edges
  UNION
  SELECT e.d AS node, r.label FROM reach r JOIN edges e ON e.s = r.node
),
cluster_drop AS (
  SELECT node AS doc_id FROM reach GROUP BY node HAVING node <> MIN(label)
),
exact_keep AS (
  SELECT MIN(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(array_to_string(list_sort(list_distinct({_TOKS_D})), ' '))
),
kept AS (
  SELECT d.doc_id, d.lang, d.source, d.n_chars
  FROM documents d
  JOIN exact_keep k ON k.doc_id = d.doc_id
  WHERE len({_TOKS_D}) > 0
    AND {_QUALITY_D} >= {QUALITY_THRESHOLD}
    AND d.doc_id NOT IN (SELECT doc_id FROM cluster_drop)
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM kept
GROUP BY 1, 2
""",
    doc="End-to-end corpus cleaning: quality gate >= 0.68 -> exact "
    "tokenset dedup (min-id representative) -> MinHash-LSH near-dup "
    "cluster drop (non-representatives removed) -> per-(lang, source) "
    "summary.  One composed Catalyst plan, exact recursive-CTE oracle.",
    tags=("pipeline", "dedup", "text", "quality", "composition"),
    bench=True,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    quality_ok = docs.where(F.expr(f"size({_TOKS_S}) > 0")).where(
        F.expr(_QUALITY_S) >= QUALITY_THRESHOLD
    )

    exact_keep = (
        docs.groupBy(
            F.expr(
                f"md5(concat_ws(' ', array_sort(array_distinct({_TOKS_S}))))"
            ).alias("tokenset_hash")
        )
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )

    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id",
        n=MINHASH_SHINGLE, k=MINHASH_K, bands=MINHASH_BANDS,
        threshold=MINHASH_THRESHOLD,
        max_bucket=MINHASH_MAX_BUCKET,
    )
    cluster_drop = (
        connected_components(pairs)
        .where(F.col("doc_id") != F.col("cluster_rep"))
        .select("doc_id")
    )

    # exact_keep is corpus-sized (one row per distinct tokenset) -> regular
    # shuffle semi-join on doc_id; cluster_drop is only the near-dup subgraph
    # (tiny at any scale) -> broadcast anti-join.
    kept = (
        quality_ok.join(exact_keep, "doc_id", "left_semi")
        .join(F.broadcast(cluster_drop), "doc_id", "left_anti")
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
