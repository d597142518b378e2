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


from .queries_text import (  # noqa: E402  (pipeline reuses the ops' knobs)
    DOMAIN_CAP as PRETRAIN_DOMAIN_CAP,
    LM_QUANT,
    LM_VOCAB_K,
    SHARD_TOKEN_BUDGET as PRETRAIN_SHARD_BUDGET,
)

LM_FLOOR = 0.0115  # char-bigram LM score floor (drops the bottom ~5%)


def _pretrain_oracle() -> str:
    from ..functions.hashing import hash64_sql_duckdb

    cap_h = hash64_sql_duckdb("CAST(doc_id AS VARCHAR)", salt="cap:")
    split_h = hash64_sql_duckdb("CAST(doc_id AS VARCHAR)", salt="split:")
    return f"""
WITH bg AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(range(1, len(text)::BIGINT),
                               i -> substr(text, i::INT, 2))) AS b
  FROM documents WHERE len(text) >= 2
),
cnt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY b),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
vocab AS (
  SELECT b,
         CAST(FLOOR({LM_QUANT} * (CAST(c AS DOUBLE) / CAST(t AS DOUBLE)))
              AS BIGINT) AS pq
  FROM cnt, tot ORDER BY c DESC, b LIMIT {LM_VOCAB_K}
),
lm AS (
  SELECT bg.doc_id,
         CAST(SUM(COALESCE(v.pq, 0)) AS BIGINT) AS score_q,
         COUNT(*) AS nb
  FROM bg LEFT JOIN vocab v USING (b) GROUP BY bg.doc_id
),
gated AS (
  SELECT d.doc_id, d.lang, d.source, d.text
  FROM documents d JOIN lm ON lm.doc_id = d.doc_id
  WHERE CAST(lm.score_q AS DOUBLE)
        / ({LM_QUANT} * CAST(lm.nb AS DOUBLE)) > {LM_FLOOR}
),
capped AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY ({cap_h}), doc_id) AS rk
    FROM gated
  ) WHERE rk <= {PRETRAIN_DOMAIN_CAP}
),
deduped AS (
  SELECT doc_id, lang, text FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY md5(array_to_string(list_sort(list_distinct({_TOKS_D})), ' '))
      ORDER BY doc_id) AS dn
    FROM capped
  ) WHERE dn = 1
),
assigned AS (
  SELECT doc_id, lang,
         CAST(len({_TOKS_D}) AS BIGINT) AS n_tokens,
         CASE WHEN ({split_h}) % 100 < 98 THEN 'train'
              WHEN ({split_h}) % 100 = 98 THEN 'valid'
              ELSE 'test' END AS split
  FROM deduped
),
packed AS (
  SELECT split, lang, doc_id, n_tokens,
         CASE WHEN split = 'train'
              THEN CAST(FLOOR((SUM(n_tokens) OVER (
                     PARTITION BY split, lang ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                   / {PRETRAIN_SHARD_BUDGET}.0) AS BIGINT)
              ELSE -1 END AS shard
  FROM assigned
)
SELECT split, lang, shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM packed
GROUP BY split, lang, shard
"""


@register(
    "pipeline_pretrain_corpus",
    oracle=_pretrain_oracle(),
    doc="Pretraining-corpus materialization pipeline, composed as one plan: "
    "corpus-trained char-bigram LM quality gate (drops improbable text) "
    "-> per-domain cap (hash-ranked, same salt as sample_domain_cap, so "
    "the standalone op and the pipeline agree doc-for-doc) -> exact "
    "tokenset dedup (lowest-id representative) -> deterministic 98/1/1 "
    "split (same salt as split_train_valid_test -- the eval set never "
    "leaks when the pipeline is re-run) -> token-budget shard packing of "
    "the train split.  Emits the shard manifest with id checksums "
    "pinning every per-doc decision.  Everything after the k-bounded LM "
    "vocabulary collect is one Catalyst plan: a scan, three window "
    "passes, and the final rollup.",
    tags=("pipeline", "text", "lm", "dedup", "sampling"),
    bench=True,
)
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.hashing import hash64_sql_spark
    from .queries_text import bigram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    lm = bigram_lm_scores(spark, sf_dir).select("doc_id", "lm_score")
    gated = docs.join(lm, "doc_id").where(F.col("lm_score") > LM_FLOOR)
    cap_h = hash64_sql_spark("cast(doc_id as string)", salt="cap:")
    capped = (
        gated.withColumn("rk_h", F.expr(cap_h))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy("rk_h", "doc_id")
            ),
        )
        .where(F.col("rk") <= PRETRAIN_DOMAIN_CAP)
    )
    th = F.expr(
        f"md5(concat_ws(' ', array_sort(array_distinct({_TOKS_S}))))"
    )
    deduped = (
        capped.withColumn("th", th)
        .withColumn(
            "dn",
            F.row_number().over(Window.partitionBy("th").orderBy("doc_id")),
        )
        .where(F.col("dn") == 1)
    )
    split_h = hash64_sql_spark("cast(doc_id as string)", salt="split:")
    assigned = deduped.select(
        "doc_id",
        "lang",
        F.expr(f"cast(size({_TOKS_S}) as bigint)").alias("n_tokens"),
        F.expr(
            f"case when ({split_h}) % 100 < 98 then 'train'"
            f" when ({split_h}) % 100 = 98 then 'valid' else 'test' end"
        ).alias("split"),
    )
    cum = Window.partitionBy("split", "lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = assigned.withColumn(
        "shard",
        F.when(
            F.col("split") == "train",
            F.floor(
                (F.sum("n_tokens").over(cum) - F.col("n_tokens"))
                / F.lit(PRETRAIN_SHARD_BUDGET)
            ).cast("bigint"),
        ).otherwise(F.lit(-1).cast("bigint")),
    )
    return packed.groupBy("split", "lang", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )
