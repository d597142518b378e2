"""Streaming queries over the ``events`` stream table.

Capability parity note: the reference is purely batch (SURVEY.md §2.2 —
"Streaming: None"), but its events corpus is stream-shaped (per-row distinct
timestamps, /root/reference/README.md:47 and scripts/json-generator.py:58-63),
so the engine adds the Structured Streaming surface a production deployment of
that corpus would need: file-source ingestion, watermarked tumbling-window
aggregation, and a custom stateful sessionization operator.

Every streaming query here executes a REAL streaming plan
(``readStream`` → transform → ``writeStream`` with an availableNow trigger
into a memory sink) and returns the sink as a batch DataFrame, so the
driver's DuckDB oracle can value-check the streaming runtime itself — not
just a batch twin.  Batch twins of both transforms are registered alongside,
sharing the identical transform code (streaming_batch parity is additionally
asserted in tests/test_streaming.py).

Determinism: the staged input is written as ONE parquet file so availableNow
processes exactly one micro-batch.  With multiple batches the stateful
operator's output would depend on file boundaries (sessions close as the
stream progresses), which is fine in production but not value-checkable.
The per-batch ordering inside the operator is made total by sorting on
(ts_us, event_id).

Scale notes (100 TB): the session operator shuffles once on user_id (the
natural key, 1 row of state per user, O(1) state per key); the window agg is
partially aggregated map-side by the streaming agg operator; both run on an
incremental state store (RocksDB via
spark.sql.streaming.stateStore.providerClass on a real cluster).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..streaming.events_stream import (
    read_events_stream,
    sessionize_batch,
    sessionize_stream,
    tumbling_event_counts,
    tumbling_event_counts_simple,
)
from ..tables import load_table
from .registry import register

GAP_MINUTES = 480  # ~median inter-event gap in the testdata is ~7.7h
GAP_US = GAP_MINUTES * 60 * 1_000_000

_STAGE_ROOT = os.path.join(tempfile.gettempdir(), "jfipb_stream_stage")

# sf_dir tag -> staged path.  Several registered queries stream the same
# staged input; staging (a coalesce(1) rewrite of events) is done once per
# sf_dir per process, not once per query.
_STAGED: dict[str, str] = {}



def _stage_tag(sf_dir: str) -> str:
    """Collision-safe stage key: basename for readability PLUS a hash of
    the RESOLVED sf_dir -- two roots sharing a basename (e.g. /a/sf0.01
    and /b/sf0.01) must not alias one staged layout (the same rule the
    IVF append sink follows)."""
    import hashlib

    resolved = os.path.realpath(sf_dir.rstrip("/"))
    base = os.path.basename(resolved) or "sf"
    return base + "_" + hashlib.md5(resolved.encode()).hexdigest()[:10]


def _staged_events(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events table as a single-file parquet dir for a file-source
    stream (single file => single availableNow micro-batch => deterministic
    stateful output).  Memoized per sf_dir."""
    tag = _stage_tag(sf_dir)
    if tag in _STAGED:
        return _STAGED[tag]
    out_dir = os.path.join(_STAGE_ROOT, tag)
    events = load_table(spark, sf_dir, "events").coalesce(1)
    events.write.mode("overwrite").parquet(out_dir)
    _STAGED[tag] = out_dir
    return out_dir


_RUN_SEQ = 0


def _run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink and return the sink contents as a batch DataFrame.

    Checkpoint dir and sink name are unique per call: a reused checkpoint
    would mark the staged input files as already-processed and replay prior
    state, silently corrupting a re-run.
    """
    global _RUN_SEQ
    _RUN_SEQ += 1
    unique = f"{name}_{_RUN_SEQ}"
    spark = stream_df.sparkSession
    ckpt = tempfile.mkdtemp(prefix=f"jfipb_ckpt_{unique}_")
    # Streaming state shuffles use spark.sql.shuffle.partitions verbatim (no
    # AQE coalesce in streaming), and the partition count is frozen into the
    # checkpoint.  On a vanilla session that is 200 state-store tasks for a
    # test-scale input; scope a sane width to this run and restore after --
    # on a real cluster the session owner sizes it to the executor count.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(unique)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(unique)


# DuckDB twin of streaming/events_stream.py::sessionize_batch — lag() flags a
# session start when the gap exceeds GAP_US, running sum numbers sessions.
_SESSION_CTE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
),
flagged AS (
  SELECT user_id, ts_us, event_id,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > {GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
),
sessions AS (
  SELECT user_id, session_seq,
         COUNT(*) AS n_events,
         MIN(ts_us) AS start_us,
         MAX(ts_us) AS end_us
  FROM sess
  GROUP BY user_id, session_seq
)
"""

# DuckDB twin of streaming/events_stream.py::tumbling_event_counts.  Spark's
# window('1 hour') is epoch-aligned, identical to date_trunc('hour') for
# whole-hour durations.
_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def _fmt_win_start(df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return df.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "stream_tumbling_window_batch",
    oracle=_TUMBLING_SQL,
    doc="Batch twin of the watermarked tumbling-window aggregation: 1h "
    "epoch-aligned windows x event_type, count + exact-decimal value sum.",
    tags=("streaming", "window", "aggregation"),
)
def stream_tumbling_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return _fmt_win_start(tumbling_event_counts(events, "1 hour"))


# Watermarked append-mode twin: a finite availableNow run ends with
# watermark = max(ts) - 1h (eviction uses the watermark updated with the
# current batch's data), so exactly the windows whose END is at or below
# that mark have been finalized and emitted; the trailing still-open windows
# stay in state.  Spark tracks event-time stats in MILLISECONDS, so the
# oracle compares at ms precision (micros->ms truncation composes with the
# nanos->micros truncation both engines already share).
_TUMBLING_WATERMARKED_SQL = """
WITH wm AS (SELECT epoch_ms(MAX(ts)) - 3600000 AS wm_ms FROM events),
w AS (
  SELECT date_trunc('hour', ts) AS ws,
         event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events
  GROUP BY 1, 2
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, n_events, total_value
FROM w, wm
WHERE epoch_ms(ws + INTERVAL 1 HOUR) <= wm.wm_ms
"""


@register(
    "stream_tumbling_window",
    oracle=_TUMBLING_WATERMARKED_SQL,
    doc="TRUE streaming tumbling-window aggregation WITH WATERMARK: "
    "file-source readStream -> withWatermark(ts, 1h) -> 1h window agg -> "
    "availableNow -> memory sink in APPEND mode -- the bounded-state plan an "
    "unbounded stream needs (late rows beyond the watermark are dropped, "
    "finalized windows are emitted exactly once).  Oracle = every window "
    "except the still-open tail above the final watermark.",
    tags=("streaming", "window", "aggregation", "stateful", "watermark"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events_dir = _staged_events(spark, sf_dir)
    stream = read_events_stream(spark, events_dir)
    agg = tumbling_event_counts(stream, "1 hour", watermark="1 hour")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    sink = _run_to_memory(agg, f"tumbling_wm_{tag}", "append")
    return _fmt_win_start(sink)


@register(
    "stream_stream_join",
    oracle="""
SELECT c.user_id AS c_user,
       c.event_id AS click_id,
       p.event_id AS purchase_id
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND epoch_us(p.ts) >= epoch_us(c.ts)
 AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""",
    doc="TRUE stream-stream join: clicks x purchases of the same user within "
    "1 hour, BOTH sides watermarked (2h) so the join buffers bounded state "
    "-- the attribution join a production pipeline runs forever.  An "
    "availableNow run emits exactly the batch join's pairs (inner-join "
    "matches emit as rows arrive; the watermark only bounds buffered "
    "state), so the oracle is the plain batch join at microsecond "
    "precision.",
    tags=("streaming", "join", "stateful", "watermark"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    events_dir = _staged_events(spark, sf_dir)
    stream = read_events_stream(spark, events_dir)
    clicks = (
        stream.where(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("c_user", "click_id", "purchase_id")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    return _run_to_memory(joined, f"ssjoin_{tag}", "append")


@register(
    "stream_stream_left_outer",
    oracle="""
WITH c AS (
  SELECT user_id AS cu, event_id AS click_id, epoch_us(ts) AS cts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id AS pu, event_id AS purchase_id, epoch_us(ts) AS pts
  FROM events WHERE event_type = 'purchase'
),
wm AS (
  -- NULL-SAFE min of the two per-input watermarks: DuckDB's LEAST
  -- SKIPS nulls, but Spark's global watermark stays 0 while EITHER
  -- withWatermark column has seen no data -- so an empty side must
  -- make wm NULL here (the u-branch predicate then filters every
  -- row, matching the engine's no-null-emission behavior).
  SELECT CASE WHEN mc IS NULL OR mp IS NULL THEN NULL
              ELSE ((LEAST(mc, mp) // 1000) - 7200000) * 1000 END AS wm_us
  FROM (SELECT (SELECT MAX(epoch_us(ts)) FROM events
                WHERE event_type = 'click') AS mc,
               (SELECT MAX(epoch_us(ts)) FROM events
                WHERE event_type = 'purchase') AS mp)
),
m AS (
  SELECT cu, click_id, purchase_id
  FROM c JOIN p
    ON pu = cu AND pts >= cts AND pts <= cts + 3600000000
),
u AS (
  SELECT cu, click_id, CAST(NULL AS BIGINT) AS purchase_id
  FROM c, wm
  WHERE cts + 3600000000 < wm_us
    AND NOT EXISTS (
      SELECT 1 FROM p
      WHERE pu = cu AND pts >= cts AND pts <= cts + 3600000000
    )
)
SELECT cu AS c_user, click_id, purchase_id FROM m
UNION ALL
SELECT cu AS c_user, click_id, purchase_id FROM u
""",
    doc="LEFT OUTER stream-stream join -- the state-EVICTION semantics "
    "the inner join never exercises.  Matched pairs emit as rows "
    "arrive; a never-matched click emits with nulls only when the "
    "global watermark passes its join-window end.  The boundary is "
    "empirically pinned (see test_stream_louter_eviction_boundary): "
    "null-emit iff c_ts + 1h < wm STRICTLY, where wm = min(per-side "
    "max event time, FLOORED TO MILLISECONDS -- Spark tracks event "
    "time in ms) - 2h; at exact equality the row is retained.  The "
    "oracle spells that rule: the batch left join split into the "
    "matched part (unconditional) plus the unmatched part gated on "
    "the watermark predicate.  At 100 TB the state store holds only "
    "rows younger than the watermark on both sides -- bounded by "
    "rate x (2h + 1h window), independent of stream length.",
    tags=("streaming", "join", "stateful", "watermark", "outer"),
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    events_dir = _staged_events(spark, sf_dir)
    stream = read_events_stream(spark, events_dir)
    clicks = (
        stream.where(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select("c_user", "click_id", "purchase_id")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    return _run_to_memory(joined, f"sslouter_{tag}", "append")


@register(
    "stream_static_enrich",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY 1
""",
    doc="TRUE stream-static join: the event stream enriched against the "
    "customer dimension by broadcast INSIDE the streaming plan -- the "
    "dimension needs no watermark (static side is re-broadcast per "
    "micro-batch, how every production enrichment keeps slowly-changing "
    "dims fresh), the stream buffers no join state at all, and append "
    "mode emits enriched rows as they arrive.  The per-segment rollup "
    "happens on the sink output; the oracle is the plain batch "
    "join+aggregate.",
    tags=("streaming", "join", "dimension", "broadcast"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    events_dir = _staged_events(spark, sf_dir)
    stream = read_events_stream(spark, events_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = stream.join(
        F.broadcast(dim), F.col("user_id") == F.col("c_custkey")
    ).select("c_mktsegment", "value")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    sink = _run_to_memory(enriched, f"senrich_{tag}", "append")
    return sink.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("cast(sum(cast(value as decimal(18,2))) as double)").alias(
            "total_value"
        ),
    )


def _staged_events_duplicated(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events table UNIONED WITH ITSELF as one parquet file -- the
    duplicated input the streaming-dedup query must collapse."""
    tag = _stage_tag(sf_dir) + "_dup"
    if tag in _STAGED:
        return _STAGED[tag]
    out_dir = os.path.join(_STAGE_ROOT, tag)
    events = load_table(spark, sf_dir, "events")
    events.unionByName(events).coalesce(1).write.mode("overwrite").parquet(out_dir)
    _STAGED[tag] = out_dir
    return out_dir


@register(
    "stream_dedup_watermarked",
    oracle="SELECT event_id FROM events",
    doc="TRUE streaming exact dedup: the events table staged DUPLICATED "
    "(every row twice), streamed through withWatermark + "
    "dropDuplicatesWithinWatermark(event_id) -- the streaming arm of "
    "dedup_exact, keeping per-key state only until the watermark passes "
    "(bounded state on an unbounded stream).  Output must be exactly one "
    "row per original event.",
    tags=("streaming", "dedup", "stateful", "watermark"),
)
def stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events_stream import EVENTS_SCHEMA

    dup_dir = _staged_events_duplicated(spark, sf_dir)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(dup_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    return _run_to_memory(stream.select("event_id"), f"sdedup_{tag}", "append")


@register(
    "stream_sessionize_batch",
    oracle=_SESSION_CTE + "SELECT * FROM sessions",
    doc="Batch gap-sessionization (8h gap) via lag + running-sum window "
    "functions: one shuffle on user_id, both windows share one sort.",
    tags=("streaming", "session", "window"),
    bench=True,
)
def stream_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sessionize_batch(events, gap_minutes=GAP_MINUTES)


@register(
    "stream_sessionize_stateful",
    oracle=_SESSION_CTE
    + """
SELECT user_id, session_seq, n_events, start_us, end_us
FROM sessions
QUALIFY session_seq < MAX(session_seq) OVER (PARTITION BY user_id)
""",
    doc="TRUE streaming custom stateful operator: gap-sessionization via "
    "applyInPandasWithState (one open session per user in state). A finite "
    "availableNow run closes every session except each user's still-open "
    "last one; the oracle is the batch session set minus each user's "
    "trailing session.",
    tags=("streaming", "session", "stateful", "custom-operator"),
)
def stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    events_dir = _staged_events(spark, sf_dir)
    stream = read_events_stream(spark, events_dir)
    sessions = sessionize_stream(stream, gap_minutes=GAP_MINUTES)
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    return _run_to_memory(sessions, f"sessions_{tag}", "append")


# --- Streaming sketch: windowed HLL distinct users -------------------------

HLL_STREAM_B = 4  # m=16 registers/window: daily distinct users (~134 at
# sf0.01) sit well above the raw-estimator threshold 2.5*m=40.

_HLL_M = 1 << HLL_STREAM_B


def _hll_user_oracle() -> str:
    from ..operators.sketches import alpha_m, hll_bucket_rho_duckdb

    bucket, w, rho = hll_bucket_rho_duckdb("CAST(user_id AS VARCHAR)", HLL_STREAM_B)
    alpha = alpha_m(_HLL_M)
    return f"""
WITH wm AS (SELECT epoch_ms(MAX(ts)) - 86400000 AS wm_ms FROM events),
hx AS (
  SELECT date_trunc('day', ts) AS ws, {bucket} AS bucket, {w} AS w
  FROM events
),
rho AS (SELECT ws, bucket, {rho} AS rho FROM hx),
regs AS (SELECT ws, bucket, MAX(rho) AS M FROM rho GROUP BY 1, 2),
est AS (
  SELECT ws,
         CAST(CAST({alpha!r} AS DOUBLE) * {_HLL_M * _HLL_M}
              * CAST((1::BIGINT << 61) AS DOUBLE)
              / CAST(SUM(CAST((1::BIGINT << (61 - M)) AS DECIMAL(38,0)))
                     + CAST(({_HLL_M} - COUNT(*)) AS DECIMAL(38,0))
                       * CAST((1::BIGINT << 61) AS DECIMAL(38,0)) AS DOUBLE)
         AS DOUBLE) AS est_distinct
  FROM regs GROUP BY ws
),
exact AS (
  SELECT date_trunc('day', ts) AS ws,
         COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT strftime(e.ws, '%Y-%m-%d %H:%M:%S') AS win_start,
       e.est_distinct,
       x.exact_distinct,
       (e.est_distinct - CAST(x.exact_distinct AS DOUBLE))
         / CAST(x.exact_distinct AS DOUBLE) AS rel_err
FROM est e JOIN exact x USING (ws), wm
WHERE epoch_ms(e.ws + INTERVAL 1 DAY) <= wm.wm_ms
"""


@register(
    "stream_hll_distinct_users",
    oracle=_hll_user_oracle(),
    doc="Streaming mergeable sketch: daily distinct-user HyperLogLog over "
    "the watermarked event stream.  The STREAMING side maintains only the "
    "(window, register)->max(rho) state -- m=16 integer registers per open "
    "window, the textbook bounded-state distinct on an unbounded stream -- "
    "and append-emits each window's registers when the 1-day watermark "
    "closes it; the estimate is then computed from the emitted registers "
    "batch-side (exactly how a production pipeline reads sketch state).  "
    "Built on the portable md5 hash + exact integer register arithmetic "
    "(operators/sketches.py), so the ESTIMATE is bit-identical in the "
    "oracle; the exact per-window count and relative error are reported "
    "alongside (raw-estimator accuracy ~1/sqrt(16) ~ 26%).",
    tags=("streaming", "sketch", "distinct", "watermark", "custom-operator"),
)
def stream_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.sketches import alpha_m, hll_bucket_rho_spark

    bucket, w, rho = hll_bucket_rho_spark("cast(user_id as string)", HLL_STREAM_B)
    events_dir = _staged_events(spark, sf_dir)
    stream = read_events_stream(spark, events_dir)
    rows = (
        stream.withWatermark("ts", "1 day")
        .selectExpr("ts", f"{bucket} as bucket", f"{w} as w")
        .selectExpr("ts", "bucket", f"{rho} as rho")
    )
    regs = rows.groupBy(F.window("ts", "1 day").alias("win"), F.col("bucket")).agg(
        F.max("rho").alias("M")
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    sink = _run_to_memory(
        regs.select(F.col("win.start").alias("win_ts"), "bucket", "M"),
        f"hll_users_{tag}",
        "append",
    )
    alpha = alpha_m(_HLL_M)
    est = sink.groupBy("win_ts").agg(
        F.expr(
            f"cast(cast({alpha!r} as double) * {_HLL_M * _HLL_M}"
            " * cast(shiftleft(1L, 61) as double)"
            " / cast(sum(cast(shiftleft(1L, 61 - M) as decimal(38,0)))"
            f"        + cast(({_HLL_M} - count(1)) as decimal(38,0))"
            "          * cast(shiftleft(1L, 61) as decimal(38,0)) as double)"
            " as double)"
        ).alias("est_distinct")
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("win_ts"))
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return est.join(exact, "win_ts").select(
        F.date_format("win_ts", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "est_distinct",
        "exact_distinct",
        (
            (F.col("est_distinct") - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        ).alias("rel_err"),
    )


# Sliding windows: duration 2h, slide 30min => every event belongs to
# EXACTLY dur/slide = 4 windows (epoch-aligned starts every 30 min; an
# event at t with 30-min floor f is inside [f - k*slide, ...+2h) for
# k = 0..3 and no other).  The oracle expands each event into its 4
# window starts with integer microsecond arithmetic.
_SLIDE_US = 30 * 60 * 1_000_000
_SLIDE_K = 4  # duration / slide

_SLIDING_SQL = f"""
WITH e AS (
  SELECT epoch_us(ts) AS us, event_type, value FROM events
), expanded AS (
  SELECT (us - us % {_SLIDE_US}) - k.k * {_SLIDE_US} AS ws_us,
         event_type, value
  FROM e, (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS k) k
)
SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM expanded
GROUP BY 1, 2
"""


@register(
    "stream_sliding_window_batch",
    oracle=_SLIDING_SQL,
    doc="Batch twin of the sliding-window aggregation: 2h windows hopping "
    "every 30 min (4 overlapping windows per event) x event_type, count + "
    "exact-decimal value sum.  The oracle expands each event into its 4 "
    "epoch-aligned window starts with integer microsecond arithmetic.",
    tags=("streaming", "window", "aggregation"),
)
def stream_sliding_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events_stream import sliding_event_counts

    events = load_table(spark, sf_dir, "events")
    return _fmt_win_start(sliding_event_counts(events, "2 hours", "30 minutes"))


_SLIDING_WATERMARKED_SQL = f"""
WITH wm AS (SELECT epoch_ms(MAX(ts)) - 3600000 AS wm_ms FROM events),
e AS (
  SELECT epoch_us(ts) AS us, event_type, value FROM events
), expanded AS (
  SELECT (us - us % {_SLIDE_US}) - k.k * {_SLIDE_US} AS ws_us,
         event_type, value
  FROM e, (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS k) k
), w AS (
  SELECT ws_us, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM expanded
  GROUP BY 1, 2
)
SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, n_events, total_value
FROM w, wm
WHERE (ws_us + {_SLIDE_K * _SLIDE_US}) // 1000 <= wm.wm_ms
"""


@register(
    "stream_sliding_window",
    oracle=_SLIDING_WATERMARKED_SQL,
    doc="TRUE streaming sliding-window aggregation WITH WATERMARK: "
    "readStream -> withWatermark(ts, 1h) -> window(2h, 30min) agg -> "
    "availableNow -> memory sink in APPEND mode.  State holds dur/slide "
    "overlapping open windows per key (constant factor over tumbling, "
    "still bounded); finalized windows emit exactly once.  Oracle = the "
    "expanded-window aggregate minus the still-open tail above the final "
    "watermark.",
    tags=("streaming", "window", "aggregation", "stateful", "watermark"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events_stream import sliding_event_counts

    events_dir = _staged_events(spark, sf_dir)
    stream = read_events_stream(spark, events_dir)
    agg = sliding_event_counts(stream, "2 hours", "30 minutes", watermark="1 hour")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    sink = _run_to_memory(agg, f"sliding_wm_{tag}", "append")
    return _fmt_win_start(sink)


# --- foreachBatch incremental upsert sink -----------------------------------

SPLIT_US = 1_705_363_200_000_000  # 2024-01-16 UTC: the two-file stage split


def _staged_events_two_files(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as TWO chronological parquet files so maxFilesPerTrigger=1
    yields two deterministic micro-batches (modification times pin the
    order).  Used by the incremental-sink query, where the FINAL state must
    be independent of the batch split."""
    import shutil

    tag = "two_" + _stage_tag(sf_dir)
    if tag in _STAGED:
        return _STAGED[tag]
    out_dir = os.path.join(_STAGE_ROOT, tag)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr("cast(floor(value * 1e8) as bigint)").alias("vq"),
    )
    for i, pred in enumerate([f"us < {SPLIT_US}", f"us >= {SPLIT_US}"]):
        tmp = os.path.join(_STAGE_ROOT, f"{tag}_half{i}")
        ev.where(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(out_dir, f"batch-{i:03d}.parquet")
        shutil.copy(os.path.join(tmp, src), dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))
    _STAGED[tag] = out_dir
    return out_dir


@register(
    "stream_upsert_foreachbatch",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1e8) AS BIGINT)) AS BIGINT) AS total_vq,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
FROM events
GROUP BY user_id
""",
    doc="Streaming incremental materialization via foreachBatch: the event "
    "stream arrives as two chronological micro-batches, and each batch "
    "MERGES its per-user partial aggregate into a parquet state table "
    "(read current state -> union -> re-aggregate -> atomic "
    "write-and-swap) -- the CDC upsert-sink pattern used when the target "
    "lacks native MERGE.  The mergeable-aggregate algebra (count/sum/max "
    "over quantized integers) makes the final state provably independent "
    "of the batch split, which is exactly what the oracle checks: a "
    "plain batch aggregate over all events.  At 100 TB the state table "
    "is per-user rows (partitioned, rewritten per micro-batch only where "
    "keys changed on a real table format).",
    tags=("streaming", "sink", "foreachBatch", "upsert"),
)
def stream_upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    events_dir = _staged_events_two_files(spark, sf_dir)
    tag = (os.path.basename(sf_dir.rstrip("/")) or "sf").replace(".", "_")
    state_dir = os.path.join(_STAGE_ROOT, f"upsert_state_{tag}")
    shutil.rmtree(state_dir, ignore_errors=True)
    # A stale tmp from a PREVIOUS run must go too: this run uses a fresh
    # checkpoint (batch ids restart at 0), so the recovery path would
    # otherwise adopt the old run's tmp and its marker would suppress
    # this run's batches (review r10).  Cross-run tmp adoption is only
    # safe when the checkpoint survives with it.
    shutil.rmtree(state_dir + ".tmp", ignore_errors=True)
    ckpt = tempfile.mkdtemp(prefix=f"jfipb_ckpt_upsert_{tag}_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_upsert_stream(spark, events_dir, state_dir, ckpt)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(state_dir)


_APPLIED_MARKER = "_applied_batch"  # underscore-prefixed: invisible to readers


def _read_marker(path: str) -> int | None:
    """Batch id from a marker file, or None when the marker is absent OR
    torn (created but not yet flushed when the process died) -- a torn
    marker must read as absent, never crash the recovery path."""
    if not os.path.isfile(path):
        return None
    with open(path, encoding="utf-8") as fh:
        content = fh.read().strip()
    return int(content) if content.isdigit() else None

# Crash-injection seam for the swap window (rmtree done, rename not yet):
# a no-op in production, monkeypatched by the kill-restart test so the
# recovery path in upsert_merge_batch is exercised against a REAL torn swap.
_SWAP_WINDOW_HOOK = lambda: None  # noqa: E731


def upsert_merge_batch(state_dir: str, batch_df: DataFrame, batch_id: int) -> None:
    """Idempotent per-batch MERGE into the parquet state table.

    foreachBatch delivers AT-LEAST-once: after a crash between this
    function's commit and the engine's checkpoint commit, the same batch is
    REDELIVERED under the same batch_id -- re-merging it would double-count
    every aggregate.  The guard is a marker file recording the last applied
    batch_id, written into the tmp dir BEFORE the atomic rename, so state
    and marker can never disagree: redelivered batch ids <= the marker are
    skipped, making the merge exactly-once end to end
    (tests/test_streaming.py::test_upsert_foreachbatch_restart_exactly_once
    kills the query inside exactly that crash window).

    The swap itself has a SECOND crash window: from the start of
    rmtree(state_dir) until rename(tmp -> state_dir) the state_dir is
    gone or TORN (a crash mid-rmtree leaves a partial directory -- marker
    and/or parquet parts already deleted) while the tmp dir is always
    complete (parquet AND marker are fully written before the rmtree
    starts).  Recovery on entry therefore prefers the tmp dir whenever
    its marker exists and the state marker is missing or carries a batch
    id <= the tmp marker's: discard the (possibly torn) state_dir and
    finish the interrupted rename; the ordinary marker guard then sees
    the recovered batch as applied and skips its redelivery.  The <=
    direction is safe because a tmp for batch N is only ever built FROM
    the state at N-1 (the guard never rebuilds a tmp the state already
    reflects), so a tmp whose marker is >= the state's strictly supersedes
    it (tests/test_streaming.py::test_upsert_foreachbatch_swap_window_recovery
    kills between the rmtree and the rename;
    ::test_upsert_foreachbatch_mid_rmtree_recovery enters with a torn
    state_dir)."""
    import shutil

    from pyspark.sql import functions as F

    tmp_dir = state_dir + ".tmp"
    marker = os.path.join(state_dir, _APPLIED_MARKER)
    tmp_marker = os.path.join(tmp_dir, _APPLIED_MARKER)
    tmp_batch = _read_marker(tmp_marker)
    if tmp_batch is not None:
        # A torn tmp marker (crash mid-write: file exists, contents not
        # yet flushed) parses as None above and is treated as ABSENT --
        # the ordinary merge below rebuilds the tmp with overwrite, as
        # the pre-recovery code did.  Only a complete marker qualifies
        # the tmp as the state of record.
        state_batch = _read_marker(marker)
        if state_batch is None or state_batch <= tmp_batch:
            if os.path.isdir(state_dir):
                # LOUD on failure: if the torn state_dir cannot be fully
                # removed, raising here (tmp intact) beats a swallowed
                # error followed by an opaque ENOTEMPTY from the rename.
                shutil.rmtree(state_dir)
            os.rename(tmp_dir, state_dir)  # finish the interrupted swap
    applied = _read_marker(marker)
    if applied is not None and applied >= batch_id:
        return  # redelivery of an already-applied batch
    partial = batch_df.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("vq").cast("bigint").alias("total_vq"),
        F.max("us").cast("bigint").alias("last_us"),
    )
    if os.path.isdir(state_dir):
        current = batch_df.sparkSession.read.parquet(state_dir)
        merged = (
            current.unionByName(partial)
            .groupBy("user_id")
            .agg(
                F.sum("n_events").cast("bigint").alias("n_events"),
                F.sum("total_vq").cast("bigint").alias("total_vq"),
                F.max("last_us").cast("bigint").alias("last_us"),
            )
        )
    else:
        merged = partial
    merged.write.mode("overwrite").parquet(tmp_dir)
    with open(os.path.join(tmp_dir, _APPLIED_MARKER), "w", encoding="utf-8") as fh:
        fh.write(str(batch_id))
    if os.path.isdir(state_dir):
        shutil.rmtree(state_dir)  # LOUD: a half-removed dir must not reach rename
    _SWAP_WINDOW_HOOK()  # test-only crash injection between rmtree and rename
    os.rename(tmp_dir, state_dir)


def run_upsert_stream(
    spark: SparkSession,
    events_dir: str,
    state_dir: str,
    ckpt: str,
    fail_after_batch: int | None = None,
) -> None:
    """Drive the staged two-file event stream through the foreachBatch
    upsert sink (availableNow, one file per micro-batch).  Restartable: a
    second call with the SAME ckpt resumes from the engine's offsets and
    redelivers any batch whose engine commit is missing.

    ``fail_after_batch`` is crash injection for the restart test: the merge
    APPLIES that batch, then raises before returning -- the engine never
    records the batch as committed, reproducing a crash in the window
    between sink commit and checkpoint commit."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert_merge_batch(state_dir, batch_df, batch_id)
        if fail_after_batch is not None and batch_id == fail_after_batch:
            raise RuntimeError(f"injected crash after batch {batch_id}")

    stream = (
        spark.readStream.schema("user_id long, us long, vq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()


@register(
    "stream_session_window_batch",
    oracle=_SESSION_CTE
    + f"""
SELECT user_id,
       start_us,
       end_us + {GAP_US} AS end_us,
       CAST(n_events AS BIGINT) AS n_events
FROM sessions
""",
    doc="Native session_window sessionization (batch): Spark's built-in "
    "gap-merge operator, window = [first event, last event + gap) per "
    "user -- the declarative twin of the manual lag()-islands "
    "computation (stream_sessionize_batch) and the "
    "applyInPandasWithState path (stream_sessionize_stateful); all "
    "three arms agree on the SAME session boundaries, checked against "
    "the same islands oracle.  One shuffle on user_id; the merge "
    "itself is state local to each key.",
    tags=("streaming", "session", "window"),
    bench=True,
)
def stream_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events_stream import session_window_counts

    events = load_table(spark, sf_dir, "events")
    return session_window_counts(events, gap=f"{GAP_MINUTES} minutes")


@register(
    "stream_session_window",
    oracle=_SESSION_CTE
    + f"""
, wm AS (SELECT epoch_ms(MAX(ts)) - 3600000 AS wm_ms FROM events)
SELECT user_id,
       start_us // 1000 AS start_ms,
       (end_us + {GAP_US}) // 1000 AS end_ms,
       CAST(n_events AS BIGINT) AS n_events
FROM sessions, wm
WHERE (end_us + {GAP_US}) // 1000 <= wm.wm_ms
""",
    doc="TRUE streaming native session windows WITH WATERMARK: file-source "
    "readStream -> withWatermark(ts, 1h) -> session_window(gap 8h) per "
    "user -> availableNow -> memory sink in APPEND mode.  Sessions are "
    "mergeable state (MergingSessionsExec): adjacent-in-gap events "
    "collapse as they arrive, and a session finalizes once the "
    "watermark passes its end (last event + gap) -- so the oracle is "
    "the batch islands result MINUS the per-user trailing sessions "
    "still within an hour+gap of the stream's end, compared at the "
    "watermark's ms precision.",
    tags=("streaming", "session", "window", "stateful", "watermark"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events_stream import (
        read_events_stream,
        session_window_counts,
    )

    events_dir = _staged_events(spark, sf_dir)
    stream = read_events_stream(spark, events_dir)
    agg = session_window_counts(
        stream, gap=f"{GAP_MINUTES} minutes", watermark="1 hour"
    )
    from pyspark.sql import functions as F

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    sink = _run_to_memory(agg, f"session_win_{tag}", "append")
    return sink.select(
        "user_id",
        F.expr("start_us div 1000").alias("start_ms"),
        F.expr("end_us div 1000").alias("end_ms"),
        "n_events",
    )


LATE_Q3_US = 1_706_000_000_000_000  # 2024-01-23 UTC: newest-slice cut


def _staged_events_late_first(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as THREE parquet files in reverse-chronological arrival
    order (newest slice first, oldest last) so the final micro-batch is
    entirely LATE data arriving after the watermark is in force -- the
    arrival pattern that exercises watermark-based dropping
    deterministically."""
    import shutil

    tag = "late_" + _stage_tag(sf_dir)
    if tag in _STAGED:
        return _STAGED[tag]
    out_dir = os.path.join(_STAGE_ROOT, tag)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    # THREE batches, not two: the late-row filter uses the watermark in
    # force DURING the previous batch (a two-batch lag -- verified
    # empirically: with two files, batch 2's filter watermark is still 0
    # and numRowsDroppedByWatermark stays 0), so the newest slice arrives
    # first to SET the watermark, an on-time middle slice burns the lag
    # batch, and only the third, oldest slice lands beyond the now-active
    # filter and is dropped.
    preds = [
        f"unix_micros(ts) >= {LATE_Q3_US}",                    # newest: sets wm
        f"unix_micros(ts) >= {SPLIT_US}"
        f" and unix_micros(ts) < {LATE_Q3_US}",                # on time
        f"unix_micros(ts) < {SPLIT_US}",                       # late: dropped
    ]
    for i, pred in enumerate(preds):
        tmp = os.path.join(_STAGE_ROOT, f"{tag}_half{i}")
        ev.where(F.expr(pred)).coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(out_dir, f"batch-{i:03d}.parquet")
        shutil.copy(os.path.join(tmp, src), dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))
    _STAGED[tag] = out_dir
    return out_dir


@register(
    "stream_late_data_dropped",
    oracle=f"""
WITH wm AS (SELECT epoch_ms(MAX(ts)) - 3600000 AS wm_ms FROM events),
ontime AS (
  SELECT ts, event_type FROM events WHERE epoch_us(ts) >= {SPLIT_US}
),
w AS (
  SELECT date_trunc('hour', ts) AS ws,
         event_type,
         COUNT(*) AS n_events
  FROM ontime GROUP BY 1, 2
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, n_events
FROM w, wm
WHERE epoch_ms(ws + INTERVAL 1 HOUR) <= wm.wm_ms
""",
    doc="Watermark late-data dropping, measured exactly: the stream "
    "arrives as three micro-batches in reverse-chronological order -- "
    "newest slice first (sets the watermark to global-max minus 1h), "
    "an on-time middle slice (absorbs the one-batch lag in the "
    "late-row filter watermark), then the entire older half, which "
    "now lands weeks beyond the active filter watermark and is "
    "DROPPED (numRowsDroppedByWatermark > 0).  The append-mode sink "
    "therefore holds exactly the on-time slices' finalized windows, "
    "which is what the oracle computes: events at or after the split "
    "aggregated and trimmed at the final watermark.  The result "
    "provably differs from the all-data aggregate by the dropped "
    "half -- the state-bounding guarantee an unbounded pipeline "
    "relies on, pinned by value.",
    tags=("streaming", "watermark", "late-data", "stateful"),
)
def stream_late_data_dropped(spark: SparkSession, sf_dir: str) -> DataFrame:
    events_dir = _staged_events_late_first(spark, sf_dir)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    agg = tumbling_event_counts_simple(stream, "1 hour", watermark="1 hour")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    sink = _run_to_memory(agg, f"late_drop_{tag}", "append")
    from pyspark.sql import functions as F

    return sink.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
    )


def _staged_documents_timed(spark: SparkSession, sf_dir: str) -> str:
    """Stage documents as ONE parquet file sorted by doc_id with a synthetic
    event time (epoch + doc_id seconds): a single small file reads as one
    sequential input partition, so 'first arrival' inside the batch is the
    lowest doc_id -- the determinism the dedup gate's oracle pins."""
    tag = _stage_tag(sf_dir) + "_docs_ts"
    if tag in _STAGED:
        return _STAGED[tag]
    out_dir = os.path.join(_STAGE_ROOT, tag)
    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "timestamp_micros(1704067200000000 + doc_id * 1000000) AS ts",
        "text",
    )
    docs.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(out_dir)
    _STAGED[tag] = out_dir
    return out_dir


def _lsh_gate_oracle() -> str:
    from ..functions.hashing import P31, hash64_sql_duckdb, perm_consts
    from ..functions.text import shingles_duckdb, tokens_duckdb

    sig_cols = ",\n         ".join(
        f"MIN(({a} * h + {b}) % {P31}) AS m{j}"
        for j, (a, b) in enumerate(perm_consts(4))
    )
    return f"""
WITH docsets AS (
  SELECT doc_id, {shingles_duckdb(tokens_duckdb('text'), 3)} AS shset
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(shset) AS sh FROM docsets WHERE len(shset) > 0
),
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM (SELECT doc_id, ({hash64_sql_duckdb('sh')}) % {P31} AS h FROM sh)
  GROUP BY doc_id
)
SELECT concat_ws(',', m0, m1, m2, m3) AS band,
       CAST(MIN(doc_id) AS BIGINT) AS doc_id
FROM sig
GROUP BY 1
"""


@register(
    "stream_lsh_dedup_gate",
    oracle=_lsh_gate_oracle(),
    doc="TRUE streaming NEAR-dup gate: documents stream through a "
    "stateless per-row MinHash signature (4 universal-hash permutations "
    "folded over the shingle array with array_min/transform -- no "
    "groupBy, so the only stateful operator is the dedup itself) and "
    "dropDuplicatesWithinWatermark on the single-band signature; docs "
    "agreeing on all 4 minhashes (P = J^4: near-identical text) collapse "
    "to their first arrival, with per-key state held only until the "
    "watermark passes.  The staged input is one file sorted by doc_id, "
    "so first arrival = lowest doc_id -- what the batch oracle's "
    "MIN(doc_id) per band pins.  The streaming arm of minhash_lsh_pairs' "
    "signature machinery (same perm_consts, same md5 base hash).",
    tags=("streaming", "dedup", "minhash", "stateful", "watermark"),
)
def stream_lsh_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..functions.hashing import P31, hash64_sql_spark, perm_consts
    from ..functions.text import shingles_spark, tokens_spark

    docs_dir = _staged_documents_timed(spark, sf_dir)
    h = hash64_sql_spark("s")
    perms = ", ".join(
        f"named_struct('a', {a}L, 'b', {b}L)" for a, b in perm_consts(4)
    )
    # ONE expression computes the whole band key: Catalyst's projection
    # collapse would re-inline the shingle pipeline into EVERY column that
    # references it (the known duplicated-lambda trap), so the md5 hash
    # array is built inside the same transform that folds the 4
    # permutations -- one tokenize + one md5 pass per row, stateless.
    band_expr = (
        "concat_ws(',', transform("
        f"array({perms}), "
        f"p -> cast(array_min(transform("
        f"transform({shingles_spark(tokens_spark('text'), 3)}, "
        f"s -> ({h}) % {P31}), "
        f"x -> (p.a * x + p.b) % {P31})) as string)))"
    )
    stream = (
        spark.readStream.schema("doc_id bigint, ts timestamp, text string")
        .parquet(docs_dir)
        .withWatermark("ts", "1 hour")
        .selectExpr("doc_id", "ts", f"{band_expr} AS band")
        .where(F.expr("band != ''"))
        .dropDuplicatesWithinWatermark(["band"])
        .select("band", "doc_id")
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    return _run_to_memory(stream, f"slshgate_{tag}", "append")


@register(
    "stream_parquet_file_sink",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_type IN ('purchase', 'signup')
GROUP BY 1
""",
    doc="TRUE streaming PARQUET FILE SINK -- the production landing-zone "
    "pattern (writeStream.format('parquet') with a checkpointed "
    "_spark_metadata transaction log, giving exactly-once file commits "
    "where a plain batch write gives none): the events stream is "
    "filtered to purchase/signup rows and landed as parquet files; the "
    "returned frame AGGREGATES A READ-BACK of the landed directory, so "
    "the oracle (the equivalent batch filter+aggregate) checks the "
    "whole write-then-read loop including sink atomicity.  Fresh "
    "output+checkpoint dirs per call -- a reused checkpoint would "
    "mark the staged input as processed and land nothing.",
    tags=("streaming", "sink", "parquet"),
)
def stream_parquet_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    from pyspark.sql import functions as F

    from ..streaming.events_stream import EVENTS_SCHEMA

    events_dir = _staged_events(spark, sf_dir)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .where(F.col("event_type").isin("purchase", "signup"))
        .select("event_id", "event_type", "value")
    )
    out_dir = _tf.mkdtemp(prefix="jfipb_psink_out_")
    ckpt = _tf.mkdtemp(prefix="jfipb_psink_ckpt_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    landed = spark.read.parquet(out_dir)
    return landed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.expr("cast(sum(cast(value as decimal(18,2))) as double)").alias(
            "total_value"
        ),
    )


# --- Streaming windowed heavy hitters ----------------------------------------

_HH_K = 3  # top users per finalized window


@register(
    "stream_topk_heavy_hitters",
    oracle=f"""
WITH wm AS (SELECT epoch_ms(MAX(ts)) - 3600000 AS wm_ms FROM events),
w AS (
  SELECT date_trunc('hour', ts) AS ws, user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
closed AS (
  SELECT ws, user_id, n_events FROM w, wm
  WHERE epoch_ms(ws + INTERVAL 1 HOUR) <= wm.wm_ms
),
ranked AS (
  SELECT ws, user_id, n_events,
         CAST(row_number() OVER (
           PARTITION BY ws ORDER BY n_events DESC, user_id
         ) AS INT) AS rnk
  FROM closed
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
       rnk, user_id, n_events
FROM ranked WHERE rnk <= {_HH_K}
""",
    doc="Streaming WINDOWED HEAVY HITTERS: file-source readStream -> "
    "withWatermark(1h) -> per-(1h window, user_id) streaming count in "
    "APPEND mode (finalized windows emit exactly once, bounded state), "
    f"then the memory-sink rows are ranked to the top-{_HH_K} most "
    "active users per closed window -- the trending/abuse dashboard "
    "every event platform runs forever.  The data-sized work (the "
    "per-key count) happens INSIDE the streaming runtime with map-side "
    "partial aggregation and per-window state eviction; the rank pass "
    "runs on the already-aggregated sink rows, whose size is "
    "windows x active-users-per-window, not events.  Ties break to the "
    "lowest user_id in both engines.  Oracle mirrors the two-phase "
    "shape: closed windows (end <= final watermark at ms precision) "
    "ranked by count.",
    tags=("streaming", "window", "topk", "stateful", "watermark"),
)
def stream_topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    events_dir = _staged_events(spark, sf_dir)
    stream = read_events_stream(spark, events_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"), "user_id", "n_events"
        )
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    sink = _run_to_memory(agg, f"heavy_hitters_{tag}", "append")
    w = Window.partitionBy("win_start").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        sink.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= _HH_K)
        .select(
            F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "rnk",
            "user_id",
            "n_events",
        )
    )


# --- Custom Python STREAMING data source (deterministic replay) ---------------

_REPLAY_LOGS = "/root/reference/json/logs.json"
_REPLAY_CHUNK = 256


@register(
    "stream_pyds_replay",
    oracle=f"""
WITH lines AS (
  SELECT unnest(string_split(content, chr(10))) AS doc
  FROM read_text('{_REPLAY_LOGS}')
)
SELECT COUNT(*) AS n_lines,
       bit_xor(('0x' || substr(md5(doc), 1, 15))::BIGINT) AS line_checksum,
       CAST(SUM(length(doc)) AS BIGINT) AS total_chars
FROM lines WHERE length(doc) > 0
""",
    doc="CUSTOM PYTHON STREAMING SOURCE (Spark 4 "
    "SimpleDataSourceStreamReader): the reference NDJSON corpus "
    f"replayed as a REAL micro-batch stream in {_REPLAY_CHUNK}-line "
    "chunks with checkpointed line-index offsets (restart-exact; "
    "readBetweenOffsets replays any batch byte-identically), "
    "aggregated in complete mode and value-checked against the batch "
    "oracle -- the mergeable count/xor/sum state makes the final "
    "answer batch-split-independent, the same argument as "
    "stream_upsert_foreachbatch.  Empirical API pin: availableNow "
    "commits ONE read() per run for simple stream readers, so the "
    "finite replay runs under a processingTime trigger and stops once "
    "the sink holds every line (bounded poll; 4 deterministic "
    "batches).  sources/py_datasource.py documents the offset "
    "contract.",
    tags=("streaming", "source", "datasource", "python"),
    bench=True,
)
def stream_pyds_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time

    from pyspark.sql import functions as F

    from ..sources.py_datasource import read_ndjson_replay_stream

    with open(_REPLAY_LOGS, "rb") as fh:
        n_expected = len([ln for ln in fh.read().split(b"\n") if ln])

    global _RUN_SEQ
    _RUN_SEQ += 1
    name = f"pyds_replay_{_RUN_SEQ}"
    ckpt = tempfile.mkdtemp(prefix=f"jfipb_ckpt_{name}_")
    stream = read_ndjson_replay_stream(
        spark, _REPLAY_LOGS, chunk=_REPLAY_CHUNK
    )
    agg = stream.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.expr(
            "bit_xor(cast(conv(substr(md5(doc),1,15),16,10) as bigint))"
        ).alias("line_checksum"),
        F.sum(F.length("doc")).cast("bigint").alias("total_chars"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(processingTime="0 seconds")
            .option("checkpointLocation", ckpt)
            .start()
        )
        deadline = time.time() + 300
        while time.time() < deadline:
            rows = spark.table(name).collect()
            if rows and rows[0]["n_lines"] == n_expected:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    rows = spark.table(name).collect()
    assert rows and rows[0]["n_lines"] == n_expected, (
        f"replay did not drain: {rows}"
    )
    return spark.table(name)


@register(
    "stream_pyds_ndjson_sink",
    oracle="SELECT md5(props) AS line_hash FROM events",
    doc="CUSTOM PYTHON STREAMING SINK (Spark 4 DataSourceStreamWriter): "
    "the staged events stream lands in an NDJSON directory through a "
    "from-scratch Python sink whose tasks write one data file each and "
    "whose driver-side commit() appends the batch's file list to a "
    "manifest LAST -- the exactly-once recipe (retried-task orphans "
    "and aborted batches never reach the manifest, so readers that "
    "trust only manifest-listed files cannot observe them; abort() "
    "additionally reclaims orphan files).  The read-back side hashes "
    "every manifest-listed line against the original column, proving "
    "the full write-commit-read loop lossless.  Completes the "
    "connector story: custom batch source, custom streaming source, "
    "custom streaming sink, all in pure Python "
    "(sources/py_datasource.py).",
    tags=("streaming", "sink", "datasource", "python"),
    bench=True,
)
def stream_pyds_ndjson_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from pyspark.sql import functions as F

    from ..sources.py_datasource import committed_files, register_ndjson_sink

    register_ndjson_sink(spark)
    events_dir = _staged_events(spark, sf_dir)
    tag = _stage_tag(sf_dir)
    out = os.path.join(
        tempfile.gettempdir(), "jfipb_pyds_sink", tag
    )
    shutil.rmtree(out, ignore_errors=True)
    global _RUN_SEQ
    _RUN_SEQ += 1
    ckpt = tempfile.mkdtemp(prefix=f"jfipb_ckpt_pyds_sink_{_RUN_SEQ}_")
    stream = read_events_stream(spark, events_dir).select(
        F.col("props").alias("doc")
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.writeStream.format("jfipb_ndjson_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    files = committed_files(out)
    assert files, "sink committed no files"
    back = spark.read.text(files)
    return back.select(F.md5(F.col("value")).alias("line_hash"))
