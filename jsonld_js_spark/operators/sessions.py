"""Batch sessionization over the events table: gap-based session
assignment via window functions — the batch counterpart of the
streaming sessionizer (streaming/ingest.py sessionize_stream, which
uses applyInPandasWithState event-time timeouts for the same cut rule
on unbounded input).

Classic two-window plan: lag(ts) per user detects gaps, a running sum
of the gap flags numbers the sessions, then one partial-aggregated
groupBy rolls sessions up. Scale shape (verified via explain): BOTH
windows run off a single Exchange+Sort on user_id (same partition and
sort spec → Spark stacks them with no re-shuffle); the rollup then
pays one more exchange on (user_id, session_idx), but only AFTER
map-side partial combine has collapsed events to ~one row per
session, so the second shuffle moves session-count rows, not event
rows. user_id is uniform (no celebrity-key skew in event streams
keyed by actor; if a bot user appears, AQE skew-split handles the
sort spill), and window state per row is 2 longs. All arithmetic is int64 MICROSECOND epochs
(unix_micros ↔ epoch_us — the event timestamps carry sub-second
components, so second-truncated epochs would cut sessions differently
at gap boundaries; no raw timestamps returned, session TZ pinned UTC).
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

SESSION_GAP_S = 1800  # 30 min inactivity cut
_GAP_US = SESSION_GAP_S * 1_000_000


def sessionize(events, gap_s: int = SESSION_GAP_S):
    """(user_id, ts, event_type, ...) → one row per session:
    (user_id, session_idx, n_events, n_event_types, start_us, end_us,
    duration_us). A session breaks when the gap to the previous event
    of the SAME user exceeds `gap_s` seconds (microsecond-exact).
    Deterministic under equal timestamps via the (ts, event_id)
    compound sort key."""
    gap_us = gap_s * 1_000_000
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    # parquet ts is TIMESTAMP_NTZ; cast to session-TZ timestamp (pinned
    # UTC by the gate) so unix_micros applies — same naive-as-UTC read
    # DuckDB's epoch_us does
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    new_flag = F.when(
        F.lag("ts").over(w).isNull() |
        ((ep - F.unix_micros(F.lag("ts").over(w).cast("timestamp")))
         > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    run = (Window.partitionBy("user_id").orderBy(*order)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    flagged = events.select(
        "user_id", "event_type", ep.alias("us"),
        F.sum(new_flag).over(run).alias("session_idx"))
    return (flagged.groupBy("user_id", "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("event_type").alias("n_event_types"),
                 F.min("us").alias("start_us"),
                 F.max("us").alias("end_us"))
            .withColumn("duration_us",
                        F.col("end_us") - F.col("start_us")))


def q_events_sessionize(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(e).orderBy("user_id", "session_idx")


ORACLE_EVENTS_SESSIONIZE = f"""
WITH lagged AS (
  SELECT user_id, event_id, ts, event_type,
         epoch_us(ts) AS us,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, event_type, us,
         sum(case when prev_ts IS NULL
                   OR us - epoch_us(prev_ts) > {_GAP_US}
             then 1 else 0 end)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM lagged
)
SELECT user_id, cast(session_idx as bigint) AS session_idx,
       cast(count(*) as bigint) AS n_events,
       cast(count(distinct event_type) as bigint) AS n_event_types,
       cast(min(us) as bigint) AS start_us,
       cast(max(us) as bigint) AS end_us,
       cast(max(us) - min(us) as bigint) AS duration_us
FROM flagged GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


QUERIES = {"events_sessionize": q_events_sessionize}
ORACLES = {"events_sessionize": ORACLE_EVENTS_SESSIONIZE}
