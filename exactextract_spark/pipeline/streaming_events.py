"""Event-time windowed aggregation with watermark-gated late data.

The third streaming shape a 100 TB pipeline needs (after the
foreachBatch zonal ingest in streaming.py and the keyed-state dedup in
streaming_dedup.py): a rolling per-day rollup over an event stream
where events can arrive LATE.

    events readStream
      → withWatermark(ts, delay)
      → groupBy(window(ts, "1 day"), event_type).agg(count, exact sum)
      → append mode: a window emits exactly once, when the watermark
        passes its end — late events inside the allowed lateness merge
        into the still-open window state first

The finalized output therefore equals the batch GROUP BY restricted to
windows whose end precedes (max event time − delay): that inequality
is the oracle's WHERE clause, so the driver gate checks the watermark
semantics themselves, not just the arithmetic.

Determinism notes: sums run over DECIMAL(12,2) (exact, order-free —
a float sum would differ between engines in the last ulp depending on
combine order).  Spark requires the event-time column to be TIMESTAMP
(LTZ; TIMESTAMP_NTZ is rejected by withWatermark), and window
boundaries are epoch-aligned — so day windows over naive parquet
timestamps match DuckDB's date_trunc only when the session timezone is
UTC.  Callers pin ``spark.sql.session.timeZone = UTC`` (the entry
query does) — the read-interpretation and date_format render then
cancel and boundaries land on naive midnights.

Scale notes (100 TB): state is O(open windows × event types) — bounded
by the watermark delay, not the stream length; the watermark evicts
window state as it advances.  The only shuffle is the keyed state
exchange on (window, event_type), with partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["EVENTS_SCHEMA", "stream_windowed_rollup", "rollup_snapshot",
           "event_sessions", "stream_sessions", "sessions_snapshot"]

# events.parquet shape (TESTDATA.md)
EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def stream_windowed_rollup(spark: SparkSession, input_glob: str,
                           out_path: str, checkpoint_dir: str,
                           delay: str = "2 days", window: str = "1 day",
                           max_files_per_trigger: int = 1):
    """Run the watermarked rollup stream (availableNow;
    ``max_files_per_trigger`` forces one micro-batch per file so the
    watermark actually advances between batches and late arrivals are
    really late).  Append-mode emissions — finalized windows only —
    land in replay-idempotent per-batch partition directories."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(input_glob))
    rolled = (stream
              .withWatermark("ts", delay)
              .groupBy(F.window("ts", window).alias("w"), "event_type")
              .agg(F.count("*").alias("n"),
                   F.sum(F.col("value").cast("decimal(12,2)")).alias("sv")))

    from ._stream_util import run_to_partition_dirs
    return run_to_partition_dirs(rolled, out_path, checkpoint_dir, "append")


def event_sessions(spark: SparkSession, sf_dir: str,
                   gap: str = "2 hours") -> DataFrame:
    """Sessionization: per-user session windows over the events table
    (``F.session_window`` — sessions merge transitively while
    consecutive gaps are <= ``gap``: a gap of exactly ``gap`` still
    MERGES (measured; the successor's window [t, t+gap) abuts the
    predecessor's inclusive end), so the oracle's island boundary is
    ``diff > gap``).

    The same expression works unchanged on a stream (session_window +
    withWatermark); gated here in batch form because the batch output
    is complete and deterministic — the gaps-and-islands SQL (LAG →
    boundary flag → running sum → per-island agg) is the DuckDB
    oracle.

    Scale shape (100 TB): one keyed shuffle on user_id; session
    merging happens inside the aggregation per key, bounded by a
    single user's activity, never by the table.  Sums over
    DECIMAL(12,2) — exact, combine-order-free."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(12,2)")).alias("sv"))
            .select("user_id",
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                     .alias("session_start"),
                    "n_events",
                    F.col("sv").cast("double").alias("sum_value")))


def rollup_snapshot(spark: SparkSession, out_path: str) -> DataFrame:
    """Finalized windows (each emitted exactly once — no latest-wins
    resolution needed, unlike the update-mode dedup snapshot)."""
    return (spark.read.parquet(out_path)
            .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"),
                    "event_type", "n",
                    F.col("sv").cast("double").alias("sum_value")))


def stream_sessions(spark: SparkSession, input_glob: str, out_path: str,
                    checkpoint_dir: str, gap: str = "2 hours",
                    delay: str = "2 days", max_files_per_trigger: int = 1):
    """Streaming sessionization — the batch ``event_sessions``
    expression run as a stateful stream: ``session_window`` state per
    (user, open session) merges across micro-batches as new events
    extend a session; the watermark finalizes a session once it passes
    the session's end (last event + gap), at which point it is emitted
    exactly once (append mode) and its state evicted.

    Scale shape (100 TB): state is O(open sessions), bounded by the
    watermark delay × active users, not the stream length; one keyed
    exchange on (session_window, user_id) with partial merge map-side."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(input_glob))
    sess = (stream
            .withWatermark("ts", delay)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(12,2)")).alias("sv")))
    from ._stream_util import run_to_partition_dirs
    return run_to_partition_dirs(sess, out_path, checkpoint_dir, "append")


def sessions_snapshot(spark: SparkSession, out_path: str) -> DataFrame:
    """Finalized sessions (append mode — each emitted exactly once),
    rendered in the batch event_sessions shape."""
    return (spark.read.parquet(out_path)
            .select("user_id",
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                     .alias("session_start"),
                    "n_events",
                    F.col("sv").cast("double").alias("sum_value")))


def event_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured enrichment: parse the JSON ``props`` payload
    (get_json_object — Spark's JVM-side JSON path evaluator, no UDF)
    and aggregate the typed property per event type.

    Scale shape: map-only parse fused into the scan stage, one hash
    shuffle on event_type with map-side partial aggregation.  All
    aggregates are integer-exact (BIGINT sum/min/max, exact distinct
    count over a BIGINT key) so the DuckDB oracle is bit-identical
    regardless of partitioning."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.select("event_id", "user_id", "event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"),
                 F.countDistinct("user_id").alias("n_users")))


def event_props_rollup_oracle() -> str:
    return """SELECT event_type,
  COUNT(*) AS n_events,
  SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type"""


def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (P50/P95 of ``value`` per
    event_type) the scale-safe way: groupBy(event_type, value)
    compresses the stream to its per-group value histogram (bounded by
    value variety, not row count), a window cumulates over that COMPACT
    histogram, and percentile_disc(q) = the smallest value whose
    cumulative count reaches ceil(n*q) — the length_percentile_filter
    formula, per group.  No global sort, no per-group row sort: the
    only per-group window ranks distinct values.

    Bit-exact cross-engine: counts are integers; n*num is an exact
    integer in a double, the /den division is correctly rounded in both
    engines, and ceil of the identical quotient matches."""
    from pyspark.sql import Window

    ev = spark.read.schema(EVENTS_SCHEMA).parquet(f"{sf_dir}/events.parquet")
    h = ev.groupBy("event_type", "value").agg(F.count("*").alias("cnt"))
    w = (Window.partitionBy("event_type").orderBy("value")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = h.withColumn("cum", F.sum("cnt").over(w))
    tot = h.groupBy("event_type").agg(F.sum("cnt").alias("n_events"))
    j = cum.join(tot, "event_type")

    def pick(num: int, den: int, name: str) -> DataFrame:
        return (j.where(F.col("cum")
                        >= F.ceil(F.col("n_events") * num / F.lit(float(den))))
                .groupBy("event_type").agg(F.min("value").alias(name)))

    return (tot.join(pick(1, 2, "p50"), "event_type")
            .join(pick(19, 20, "p95"), "event_type"))


def event_value_quantiles_oracle() -> str:
    return """WITH h AS (
  SELECT event_type, value, COUNT(*) AS cnt FROM events
  GROUP BY event_type, value),
cum AS (
  SELECT event_type, value,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY value) AS cum
  FROM h),
tot AS (SELECT event_type, SUM(cnt) AS n_events FROM h GROUP BY event_type),
p50 AS (
  SELECT cum.event_type, MIN(value) AS p50
  FROM cum JOIN tot USING (event_type)
  WHERE cum >= CEIL(n_events * 1 / 2.0) GROUP BY cum.event_type),
p95 AS (
  SELECT cum.event_type, MIN(value) AS p95
  FROM cum JOIN tot USING (event_type)
  WHERE cum >= CEIL(n_events * 19 / 20.0) GROUP BY cum.event_type)
SELECT event_type, n_events, p50, p95
FROM tot JOIN p50 USING (event_type) JOIN p95 USING (event_type)"""
