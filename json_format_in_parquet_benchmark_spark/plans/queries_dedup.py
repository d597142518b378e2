"""Deduplication queries (north-star pipeline operators) with exact oracles.

Every strategy in operators/dedup.py is registered here against the testdata,
and -- because all hashing is the portable md5 scheme -- each one has a FULL
DuckDB oracle, including MinHash-LSH and SimHash (the oracle SQL mirrors the
operator's dataflow: shingle -> signature -> band -> candidate -> verify).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import shingles_duckdb, tokens_duckdb
from ..operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    normalized_dedup,
    simhash_pairs,
)
from ..tables import load_table
from .registry import register

_TOKS_D = tokens_duckdb("text")

MINHASH_K = 16
MINHASH_BANDS = 8
MINHASH_SHINGLE = 3
MINHASH_THRESHOLD = 0.5
NGRAM_N = 4
NGRAM_THRESHOLD = 0.4
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 8
EMBED_THRESHOLD = 0.4


@register(
    "dedup_exact",
    oracle="""
SELECT md5(props) AS value_hash,
       COUNT(*) AS n_copies,
       MIN(event_id) AS rep_id
FROM events
GROUP BY 1
""",
    doc="Exact dedup: hash-groupBy on the raw value (events.props has heavy "
    "duplication); emits copy counts + representative ids.",
    tags=("dedup",),
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "events"), "props", "event_id")


@register(
    "dedup_exact_normalized",
    oracle=f"""
SELECT md5(array_to_string(list_sort(list_distinct({_TOKS_D})), ' ')) AS tokenset_hash,
       COUNT(*) AS n_members,
       MIN(doc_id) AS rep_id
FROM documents
GROUP BY 1
""",
    doc="Normalized exact dedup: canonical sorted distinct-token-set hash "
    "(catches word-order shuffles and repetition).",
    tags=("dedup",),
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalized_dedup(load_table(spark, sf_dir, "documents"), "text", "doc_id")


def _minhash_pairs_cte() -> str:
    """CTE chain (no WITH prefix) ending in the verified near-dup `pairs`
    table -- shared by the pair query and the cluster query's oracle."""
    from ..functions.hashing import minhash_mins_duckdb

    n, k, bands = MINHASH_SHINGLE, MINHASH_K, MINHASH_BANDS
    rows = k // bands
    mins = minhash_mins_duckdb("shset", k)
    sig_cols = ",\n         ".join(f"{m} AS m{j}" for j, m in enumerate(mins))
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_idx, "
        f"concat_ws(',', {', '.join(f'm{b * rows + r}' for r in range(rows))})"
        " AS band_hash FROM sig"
        for b in range(bands)
    )
    return f"""docsets AS (
  SELECT doc_id, {shingles_duckdb(_TOKS_D, n)} AS shset
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(shset) AS sh FROM docsets
),
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM docsets WHERE len(shset) > 0
),
bands AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.sh = b.sh
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) >= {MINHASH_THRESHOLD}
)
"""


def _minhash_oracle() -> str:
    return "WITH " + _minhash_pairs_cte() + "SELECT doc_a, doc_b, jaccard FROM pairs"


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(),
    doc="MinHash + LSH near-dup pairs: 16 portable minhashes over 3-word "
    "shingles, 8 bands x 2 rows candidate generation, exact-Jaccard "
    "verification at 0.5 (operators/dedup.py:minhash_lsh_pairs).",
    tags=("dedup", "minhash", "lsh"),
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        n=MINHASH_SHINGLE,
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=MINHASH_THRESHOLD,
    )


@register(
    "dedup_clusters",
    oracle="WITH RECURSIVE "
    + _minhash_pairs_cte()
    + """,
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach AS (
  SELECT s AS node, s AS label FROM edges
  UNION
  SELECT e.d AS node, r.label FROM reach r JOIN edges e ON e.s = r.node
)
SELECT node AS doc_id, MIN(label) AS cluster_rep
FROM reach GROUP BY node
""",
    doc="Duplicate clusters: connected components over the verified "
    "MinHash-LSH pair graph via iterative min-label propagation "
    "(operators/dedup.py:connected_components) -- the iterative-algorithm "
    "path; the oracle is a recursive CTE computing the same "
    "order-independent fixpoint.",
    tags=("dedup", "clusters", "iterative", "custom-operator"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    pairs = minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        n=MINHASH_SHINGLE,
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=MINHASH_THRESHOLD,
    )
    return connected_components(pairs)


def _simhash_oracle() -> str:
    bits = SIMHASH_BITS
    bit_sums = ",\n         ".join(
        f"SUM(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN s{j} >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        f" * CAST({1 << j} AS BIGINT))"
        for j in range(bits)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(unnest({_TOKS_D})), 1, 15))::BIGINT AS h
  FROM documents
),
sums AS (
  SELECT doc_id, lang,
         {bit_sums}
  FROM tok GROUP BY doc_id, lang
),
sims AS (SELECT doc_id, lang, {sim_expr} AS simhash FROM sums)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sims a JOIN sims b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


@register(
    "dedup_simhash",
    oracle=_simhash_oracle(),
    doc="SimHash near-dup candidates: 32-bit portable simhash over tokens, "
    "language-blocked Hamming join at distance <= 8 "
    "(operators/dedup.py:simhash_pairs).",
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    pairs = simhash_pairs(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        block_col="lang",
        bits=SIMHASH_BITS,
        max_hamming=SIMHASH_MAX_HAMMING,
    )
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


def _ngram_oracle() -> str:
    n = NGRAM_N
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({shingles_duckdb(_TOKS_D, n)}) AS sh
  FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) >= {NGRAM_THRESHOLD}
"""


@register(
    "dedup_ngram_jaccard",
    oracle=_ngram_oracle(),
    doc="Exact n-gram Jaccard dedup: 4-word shingles, inverted-index self-join "
    "(docs only pair when they share a shingle -- the index IS the blocker), "
    "Jaccard >= 0.4.",
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..functions.text import shingles_spark, tokens_spark

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(F.expr(shingles_spark(tokens_spark("text"), NGRAM_N))).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= NGRAM_THRESHOLD)
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
            * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
         AS cos_sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
           * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
      >= {EMBED_THRESHOLD}
""",
    doc="Embedding-cosine near-dup pairs, label-blocked (cosine evaluated in "
    "codegen; bit-identical to the oracle's list_dot_product).",
    tags=("dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        "embedding",
        "vec_id",
        block_col="label",
        threshold=EMBED_THRESHOLD,
    )
