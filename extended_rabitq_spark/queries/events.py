"""Event-stream analytics queries (batch twins of the streaming operators;
SURVEY §2.9 extension) + multimodal plumbing queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from ..registry import register
from ..tables import read_parquet
from ..streaming.stream_ops import (
    EXACT_VALUE_SUM_SQL,
    batch_windowed_event_counts,
    exact_value_sum,
)

_SUM_VALUE_SQL = EXACT_VALUE_SUM_SQL.format(col="value")

_WINDOW_ORACLE = f"""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       {_SUM_VALUE_SQL} AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


@register("events_windowed", _WINDOW_ORACLE)
def events_windowed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation over events — identical
    expressions run under readStream with a watermark
    (streaming.stream_ops.windowed_event_counts; equivalence is proven in
    tests/test_streaming.py via Trigger.AvailableNow)."""
    return batch_windowed_event_counts(spark, sf_dir)


_SESSION_ORACLE = f"""
WITH g AS (SELECT user_id, event_type, count(*) AS n, {_SUM_VALUE_SQL} AS sum_value
           FROM events GROUP BY user_id, event_type),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS BIGINT)
        AS rnk FROM g)
SELECT user_id, event_type, n, sum_value FROM r WHERE rnk = 1
"""


@register("events_top_type_per_user", _SESSION_ORACLE)
def events_top_type_per_user_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user dominant event type (groupBy + window top-1 — the same
    top-k-per-group primitive as the ANN result pool, on relational data)."""
    from pyspark.sql import Window

    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    g = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n"), exact_value_sum("value")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        g.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("user_id", "event_type", "n", "sum_value")
    )


SESSION_GAP_MIN = 30

_SESSIONS_ORACLE = f"""
WITH o AS (
    SELECT user_id, ts, value, event_id,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     >= INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events
),
s AS (
    SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
    FROM o
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       count(*) AS n_events,
       {_SUM_VALUE_SQL} AS sum_value
FROM s GROUP BY user_id, sid
"""


@register("events_sessions", _SESSIONS_ORACLE)
def events_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization — F.session_window run in BATCH mode: the
    same expression streaming.stream_ops.sessionize_user_activity runs
    under readStream (stateful custom window).  The oracle is the
    classic gaps-and-islands form (lag ≥ gap → break, cumsum → session
    id), proving Spark's session merge semantics ([start, last+gap);
    an event AT prev_end starts a new session) against plain SQL.
    Scale: one shuffle by user_id; state in streaming mode is bounded
    by the watermark."""
    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    g = ev.groupBy(
        F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id"
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        exact_value_sum("value"),
    )
    return g.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        "sum_value",
    )


_MEDIA_META_ORACLE = """
SELECT doc_id AS media_id,
       'fake' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha256,
       CAST(8 AS INT) AS width,
       CAST(8 AS INT) AS height
FROM documents
"""


@register("multimodal_meta", _MEDIA_META_ORACLE)
def multimodal_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only pass over binary media columns — no decode, blob
    column pruned where possible."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return multimodal.media_metadata(multimodal.docs_as_media(docs))


_FRAMES_ORACLE = """
SELECT doc_id AS media_id,
       CAST(unnest(range(0, 1 + n_chars % 7, 2)) AS BIGINT) AS frame_idx,
       CAST(1 + n_chars % 7 AS BIGINT) AS n_frames
FROM documents
"""


@register("multimodal_frames", _FRAMES_ORACLE)
def multimodal_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over fake-video media: every-2nd frame index per
    blob, metadata-only (no decode; blob column pruned).  decode_frames
    materializes features for the sampled set (tests)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return multimodal.sample_frames(multimodal.docs_as_video(docs), every_n=2)


_CHUNK = 128

_AUDIO_ORACLE = f"""
WITH a AS (SELECT doc_id AS media_id,
                  CAST(n_chars AS BIGINT) AS n_samp,
                  CAST(8000 AS BIGINT) AS sr
           FROM documents),
c AS (SELECT media_id, n_samp, sr,
             unnest(range(0, CAST(ceil(n_samp / {_CHUNK}.0) AS BIGINT))) AS ci
      FROM a)
SELECT media_id,
       CAST(ci AS BIGINT) AS chunk_idx,
       CAST(ci * {_CHUNK} AS BIGINT) AS start_samp,
       CAST(least({_CHUNK}, n_samp - ci * {_CHUNK}) AS BIGINT) AS chunk_len,
       CAST(ci * {_CHUNK} * 1000 // sr AS BIGINT) AS start_ms
FROM c
"""


@register("multimodal_audio_chunks", _AUDIO_ORACLE)
def multimodal_audio_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunk plan (fixed sample windows, metadata-only, no decode)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return multimodal.chunk_audio(multimodal.docs_as_audio(docs), chunk_samples=_CHUNK)


@register("multimodal_features")
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas with the deterministic
    fake codec (rows-only: Python stage).  Output feeds build_index —
    exercised end-to-end in tests/test_multimodal.py."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    feats = multimodal.extract_features(multimodal.docs_as_media(docs))
    return feats.select(
        "media_id",
        F.round(F.expr("aggregate(feat, CAST(0.0 AS DOUBLE), (a, v) -> a + v)"), 6).alias(
            "feat_sum_r"
        ),
        F.expr("CAST(size(feat) AS BIGINT)").alias("feat_dim"),
    )


_ASOF_ORACLE = """
WITH l AS (SELECT event_id, user_id, ts FROM events),
r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, r.ts AS asof_ts, r.value AS asof_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@register("events_asof_state", _ASOF_ORACLE)
def events_asof_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: every event annotated with the user's latest
    purchase value at-or-before the event (no future leakage) — the
    feature-lookup primitive, vs DuckDB's native ASOF LEFT JOIN.
    Spark side is the union-tag-window form (operators/asof.py): one
    shuffle by user_id, linear window pass, no range explosion."""
    from ..operators.asof import asof_join
    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    left = ev.select("event_id", "user_id", "ts")
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(left, right, by="user_id").select(
        "event_id", "user_id", "asof_ts", "asof_value"
    )


_FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS t_view
           FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       CASE WHEN p.t_purchase IS NOT NULL THEN 3
            WHEN c.t_click IS NOT NULL THEN 2
            ELSE 1 END AS funnel_depth
FROM v LEFT JOIN c ON c.user_id = v.user_id
       LEFT JOIN p ON p.user_id = v.user_id
"""


@register("events_funnel", _FUNNEL_ORACLE)
def events_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase, strictly
    increasing timestamps): the match_recognize-style sequence query,
    expressed as cascaded conditional min-aggregations — three
    partial-agg groupBys on user_id, dimension-free, one shuffle key
    throughout (co-partitioned joins after the first shuffle)."""
    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, on="user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, on="user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, on="user_id", how="left")
        .join(p, on="user_id", how="left")
        .select(
            "user_id", "t_view", "t_click", "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("funnel_depth"),
        )
    )


_JSON_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       CAST(sum(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0
                END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
"""


@register("events_json_props", _JSON_ORACLE)
def events_json_props_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON processing: parse the events ``props`` JSON
    column with a TYPED schema (``from_json`` — Jackson parse once per
    row, then pure codegen field access; the idiomatic Spark path, NOT
    per-field ``get_json_object`` re-parses) and aggregate exactly.

    At 100 TB: from_json is JVM-side and partial-agg friendly; the parse
    cost is one pass over the blob column, and column pruning still
    drops ``props`` entirely for queries that don't touch it.  All
    aggregates are integer-exact (BIGINT), so cross-engine parity is
    bitwise against DuckDB's json_extract."""
    from ..tables import load_events
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_events(spark, sf_dir)
    schema = StructType([StructField("k", LongType())])
    k = F.from_json(F.col("props"), schema)["k"]
    return (
        ev.withColumn("_k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
            F.sum(F.when(F.col("_k").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing"),
        )
    )


_LEADLAG_ORACLE = """
SELECT event_id, user_id,
       epoch_us(ts) - lag(epoch_us(ts))  OVER w AS prev_gap_us,
       lead(epoch_us(ts)) OVER w - epoch_us(ts) AS next_gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("events_lead_lag", _LEADLAG_ORACLE)
def events_lead_lag_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gaps per user (lag/lead window functions) — integer
    microseconds end-to-end, so parity is exact.  One hash shuffle on
    user_id; the in-partition sort is the window's only cost."""
    from pyspark.sql import Window

    from ..tables import load_events

    ev = load_events(spark, sf_dir).withColumn("_us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("_us") - F.lag("_us").over(w)).alias("prev_gap_us"),
        (F.lead("_us").over(w) - F.col("_us")).alias("next_gap_us"),
    )


_MOVAVG_ORACLE = """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
         / count(*) OVER w / 1000000.0 AS mov_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
"""


@register("events_moving_avg", _MOVAVG_ORACLE)
def events_moving_avg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-event moving average of value per user — a ROWS-frame window
    aggregate.  The frame sum uses the same fixed-point µ-unit BIGINT
    trick as exact_value_sum (a plain double frame-sum is evaluation-
    order dependent between engines), so the rolling mean is bit-exact."""
    from pyspark.sql import Window

    from ..tables import load_events

    ev = load_events(spark, sf_dir).withColumn(
        "_vm", F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum("_vm").over(w).cast("double")
            / F.count("*").over(w)
            / F.lit(1000000.0)
        ).alias("mov_avg"),
    )


_ATTRIBUTION_ORACLE = """
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM events p JOIN events v
  ON v.user_id = p.user_id
 AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
"""


@register("events_attribution", _ATTRIBUTION_ORACLE)
def events_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase attribution: batch twin of the watermarked
    stream-stream interval join (streaming.stream_ops.attribution_join;
    AvailableNow equivalence in tests/test_streaming.py).  Integer-µs
    gap output, so parity is exact."""
    from ..streaming.stream_ops import attribution_join
    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    return attribution_join(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
    )


_PIVOT_ORACLE = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)
            AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)
            AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)
            AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)
            AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""

_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


@register("events_pivot", _PIVOT_ORACLE)
def events_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user activity profile via ``groupBy().pivot()`` — the
    long→wide reshape face of the engine.  The pivot values are pinned
    (no discovery pass), so this stays ONE partial-agg shuffle compiling
    to the same conditional-count plan as the oracle's CASE columns; at
    100 TB an unpinned pivot would need an extra distinct scan first."""
    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("user_id")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
        for t in _EVENT_TYPES
    ]
    return wide.select(*cols)


_RETENTION_ORACLE = """
WITH cohort AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, c.cohort_week,
         CAST(datediff('day', c.cohort_week, date_trunc('week', e.ts)) // 7
              AS BIGINT) AS week_offset
  FROM events e JOIN cohort c ON e.user_id = c.user_id
)
SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
       count(*) AS n_active
FROM activity
GROUP BY 1, 2
"""


@register("events_retention", _RETENTION_ORACLE)
def events_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    once per (cohort, week-offset) cell — the standard cohort-retention
    triangle, and a shape the reference engine has no analog for.

    Plan: one user-keyed partial-agg shuffle for cohort assignment, a
    user-keyed join back (co-partitioned — reuses the same hash
    exchange), then a distinct + count over (cohort, offset, user).
    Both week truncations are Monday-based in Spark and DuckDB, and the
    offset is an exact integer (week starts differ by multiples of 7
    days), so parity is bitwise.  At 100 TB every shuffle key is
    user_id or the tiny (cohort, offset) pair — no skew beyond user
    hot-keys, which partial aggregation absorbs."""
    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    cohort = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = (
        ev.join(cohort, on="user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                .cast("long") / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_week").cast("date").alias("cohort_week"), "week_offset"
    ).agg(F.count("*").alias("n_active"))


_SALTED_ORACLE = """
WITH cohort AS (
  SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT c.cohort_week, e.event_type, count(*) AS n_events
FROM events e JOIN cohort c ON e.user_id = c.user_id
GROUP BY 1, 2
"""


@register("events_salted_cohort_join", _SALTED_ORACLE)
def events_salted_cohort_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew tooling as a checked query: the events fact side joins its
    per-user cohort dim through ``skew.salted_join`` (replicate-small /
    salt-big, n_salts=8), then aggregates.  The oracle is the PLAIN
    join — salting must be row-identical by construction, so this pins
    the skew machinery itself under the driver's hash gate (previously
    unit-test-only; COVERAGE.md "Skew tooling").

    At 100 TB this is the shape for a hot-key fact⋈dim join AQE can't
    split (shuffled-hash / broadcast-ineligible): the hot user's rows
    spread over n_salts tasks at the cost of replicating the dim 8×."""
    from ..operators.skew import salted_join
    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    cohort = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).cast("date").alias("cohort_week")
    )
    joined = salted_join(ev.select("user_id", "event_type"), cohort, on="user_id")
    return joined.groupBy("cohort_week", "event_type").agg(
        F.count("*").alias("n_events")
    )


_LATEST_ORACLE = """
WITH r AS (SELECT user_id, event_id, ts, event_type,
                  CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_fp,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
SELECT user_id, event_id AS last_event_id, ts AS last_ts,
       event_type AS last_type, value_fp AS last_value_fp
FROM r WHERE rn = 1
"""


@register("events_latest_state", _LATEST_ORACLE)
def events_latest_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/upsert view: the latest event per user (latest-wins by
    (ts, event_id) — the materialized form of a keyed compaction /
    SCD-type-1 snapshot).  One hash shuffle on user_id; the window
    compiles to a partial WindowGroupLimit, so each map task keeps one
    candidate row per user before the exchange.  Value in fixed-point
    micros (the repo's exact_value_sum convention) for bitwise parity."""
    from pyspark.sql import Window

    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").alias(
                "last_value_fp"
            ),
        )
    )


_ANOMALY_ORACLE = """
WITH m AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
     w AS (SELECT event_type, hour, cnt,
                  median(cnt) OVER (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS med,
                  CAST(count(cnt) OVER (PARTITION BY event_type ORDER BY hour
                      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS BIGINT)
                      AS nprev
           FROM m)
SELECT event_type, hour, cnt, med,
       CAST(cnt > 3 * med AS BOOLEAN) AS is_spike
FROM w WHERE nprev = 5
"""


@register("events_rate_anomaly", _ANOMALY_ORACLE)
def events_rate_anomaly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate spike detection: hourly counts per event type, each
    compared against the exact MEDIAN of its 5 preceding hours (a
    robust baseline — a single prior spike can't inflate it the way a
    trailing mean would); hours with a full history are emitted with
    the baseline and an ``is_spike`` flag (cnt > 3×median).

    Plan: one partial-agg shuffle for the hourly counts, then one
    window per event_type — the frame is ROWS-bounded so state is O(6)
    per partition.  (Streaming shape: the hourly counts stream as a
    watermarked windowed agg; the trailing-median comparison runs over
    the compacted counts table per micro-batch, or as an
    applyInPandasWithState online variant — ROWS-framed window
    functions themselves are not streamable.)  Cross-engine exactness:
    counts
    are integers, and the exact median of ≤5 integers is x.0 or x.5 —
    representable doubles, so med and the flag hash bitwise (no mean /
    no stddev anywhere)."""
    from pyspark.sql import Window

    from ..tables import load_events

    ev = load_events(spark, sf_dir)
    per_hour = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-5, -1)
    )
    return (
        per_hour.withColumn("med", F.expr("percentile(cnt, 0.5)").over(w))
        .withColumn("nprev", F.count("cnt").over(w).cast("long"))
        .where(F.col("nprev") == 5)
        .select(
            "event_type", "hour", "cnt", "med",
            (F.col("cnt") > 3 * F.col("med")).alias("is_spike"),
        )
    )


@register("multimodal_phash_dedup")  # rows-only: decode seam is Python
def multimodal_phash_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup pairs — the image-side analog of
    the text near-dup family: decode (registry seam, Arrow-batched) →
    64-bit aHash → lossless pigeonhole banding → JVM bit_count Hamming
    verify.  Rows-only (the decoder is the deliberately-stubbed Python
    stage); the banding's losslessness and the hash's numpy parity are
    pinned in tests/test_multimodal.py.

    The fixture has no byte-identical texts, so the first 20 docs are
    replicated under shifted ids (deterministic) — each replica pair
    MUST surface at hamming 0, giving the query a non-trivial stable
    result the driver's rows-only check can count."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    media = multimodal.docs_as_media(docs.unionByName(planted))
    return multimodal.phash_pairs(media, max_hamming=8)


def _zorder_oracle() -> str:
    from ..operators import zorder as Z

    k = Z.d_zorder_key_expr(["user_id", "minute"], bits=21)
    return f"""
WITH raw AS (SELECT event_id, user_id,
                    CAST(epoch_us(ts) // 60000000 AS BIGINT) AS abs_minute
             FROM events),
m AS (SELECT event_id, user_id,
             abs_minute - (SELECT min(abs_minute) FROM raw) AS minute
      FROM raw),
z AS (SELECT event_id, {k} AS zkey FROM m)
SELECT event_id, zkey FROM z
"""


@register("events_zorder_layout", _zorder_oracle())
def events_zorder_layout_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over (user_id, event-minute) —
    the Delta/Iceberg OPTIMIZE ZORDER BY layout primitive: write files
    sorted by this key and min/max zone maps prune scans for filters on
    EITHER column.  Pure integer bit interleave (frozen 21-bit range),
    bitwise cross-engine.  The minute column is normalized by the
    corpus-min minute — a monotone shift (zone maps stay effective)
    that fits any ≤ 2²¹-minute (~4 year) corpus into the bit budget;
    raw epoch-minutes (~28.5M) would silently alias 4 years apart, so
    the key expression RAISES on out-of-range values rather than wrap
    (operators/zorder.py ``check=True``).  zorder_layout applies the
    range-exchange + in-partition sort for the actual write."""
    from ..operators import zorder as Z
    from ..tables import load_events

    raw = load_events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.expr("CAST(unix_micros(ts) div 60000000 AS BIGINT)").alias("abs_minute"),
    )
    m0 = raw.agg(F.min("abs_minute").alias("m0"))
    ev = raw.crossJoin(F.broadcast(m0)).select(
        "event_id", "user_id", (F.col("abs_minute") - F.col("m0")).alias("minute")
    )
    return ev.select(
        "event_id", F.expr(Z.zorder_key_expr(["user_id", "minute"], bits=21)).alias("zkey")
    )


_SCD2_ORACLE = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
o AS (SELECT user_id, event_type, us, event_id,
             lag(event_type) OVER w AS prev_type
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
ch AS (SELECT user_id, event_type, us, event_id FROM o
       WHERE prev_type IS NULL OR prev_type <> event_type),
iv AS (SELECT user_id, event_type AS state, us AS valid_from_us,
              lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us
       FROM ch)
SELECT user_id, state, valid_from_us,
       coalesce(valid_to_us, CAST(9223372036854775807 AS BIGINT)) AS valid_to_us,
       CAST(valid_to_us IS NULL AS BOOLEAN) AS is_current
FROM iv
"""


@register("events_scd2_intervals", _SCD2_ORACLE)
def events_scd2_intervals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: collapse each user's event stream into
    state-validity intervals [valid_from, valid_to) — consecutive
    same-state events merge, the open interval marks the current state.
    The dimension-history shape every warehouse maintains; one hash
    shuffle on user_id serves both windows (lag to detect changes, lead
    to close intervals).  Times in integer epoch-µs for bitwise parity;
    the open end is BIGINT max (NULL would sort engine-differently)."""
    from pyspark.sql import Window

    from ..tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("us").asc(), F.col("event_id").asc())
    ch = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy(F.col("us").asc(), F.col("event_id").asc())
    iv = ch.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w2).alias("valid_to_us"),
    )
    return iv.select(
        "user_id",
        "state",
        "valid_from_us",
        F.coalesce("valid_to_us", F.lit(9223372036854775807).cast("long")).alias("valid_to_us"),
        F.col("valid_to_us").isNull().alias("is_current"),
    )


def _pagerank_oracle() -> str:
    from ..operators import graph

    edges_sql = """
SELECT prev AS src, event_type AS dst, CAST(count(*) AS BIGINT) AS w
FROM (SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             event_type
      FROM events)
WHERE prev IS NOT NULL GROUP BY prev, event_type"""
    pr = graph.d_pagerank(edges_sql, iters=5)
    return f"""
SELECT node AS event_type, score_fix,
       CAST(row_number() OVER (ORDER BY score_fix DESC, node) AS INT) AS rank
FROM ({pr}) pr
"""


@register("pagerank_event_types", _pagerank_oracle())
def pagerank_event_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph centrality (beyond-reference §2.8): weighted
    PageRank over the user-journey transition graph — nodes are event
    types, an edge (a → b) counts how often b immediately follows a in
    some user's stream.  5 exact fixed-point iterations (damping 85/100
    as an integer ratio, contributions integer-divided) so the unrolled
    recursive oracle is bitwise.  The edge build is one lag window per
    user; each iteration is one equi-join + one integer groupBy-sum —
    the same keyed-shuffle shape at any scale."""
    from pyspark.sql import Window

    from ..operators import graph
    from ..tables import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").asc(), F.col("event_id").asc()
    )
    edges = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count("*").cast("long").alias("weight"))
    )
    pr = graph.pagerank(edges, iters=5)
    rw = Window.orderBy(F.col("score_fix").desc(), F.col("node").asc())
    return pr.select(
        F.col("node").alias("event_type"),
        "score_fix",
        F.row_number().over(rw).cast("int").alias("rank"),
    )
