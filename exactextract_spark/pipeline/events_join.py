"""Temporal joins Spark's DataFrame API lacks: AS-OF and RANGE joins.

Two canonical event-table operators (the shapes kdb/QuestDB/Flink ship
natively and Spark does not):

* ``event_asof_join`` — for every probe event, the single most recent
  build-side event at-or-before it (per key).  Implemented as a tagged
  union + one per-key ordered window (``last(..., ignorenulls)``) — the
  textbook distributed as-of formulation: ONE shuffle on the join key,
  no range explosion, no per-row Python.  The DuckDB oracle is the
  engine's native ``ASOF LEFT JOIN`` — an entirely independent
  implementation of the same semantics.

* ``event_range_join`` — for every probe event, aggregate build-side
  events inside a trailing time window ``(t - W, t]``.  Implemented by
  bucketizing time into W-wide bins: each build row lands in exactly
  one bin, each probe row checks exactly two (its own and the
  previous), so the interval predicate becomes an EQUI-join on
  (key, bin) plus a residual filter — bounded fan-out instead of the
  O(n·m) BroadcastNestedLoopJoin Spark would otherwise plan for the
  inequality condition.  The DuckDB oracle is the raw inequality join
  (DuckDB plans it as an IEJoin).

Determinism: the build side is collapsed to one row per (key, ts)
first (largest event_id wins) so the as-of match is a function, not a
choice; window sums run over DECIMAL(12,2) (exact, combine-order-free)
and lags over integer microseconds.

Scale shape (100 TB): as-of = one hash exchange on user_id with the
per-key sort local to each partition (Spark's window sort spills);
range = one equi-join shuffle on (user_id, bucket) with ≤2× probe
fan-out, then one partial-aggregated rollup — both survive a 1000×
scale-up because no operator's per-task input grows with the table,
only with per-key density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .streaming_events import EVENTS_SCHEMA

__all__ = ["asof_join", "event_asof_join", "event_asof_join_oracle",
           "range_join_agg", "event_range_join", "event_range_join_oracle"]

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_HOUR_US = 3_600_000_000


def asof_join(probe: DataFrame, build: DataFrame, key: str,
              ts_col: str = "ts") -> DataFrame:
    """Generic distributed as-of join (inclusive: a build row at exactly
    the probe timestamp matches).

    ``build`` must be unique per (key, ts); every non-key/ts build
    column comes back NULL-filled when no build row precedes the probe
    (left-outer semantics).  One shuffle: the union is windowed per
    ``key`` ordered by (ts, side) with build rows sorting FIRST at
    equal timestamps, and ``last(..., ignorenulls=True)`` carries the
    latest build payload forward to each probe row.
    """
    bcols = [c for c in build.columns if c not in (key, ts_col)]
    b = build.select(
        F.col(key), F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(F.col(ts_col).alias("_b_ts"),
                 *[F.col(c) for c in bcols]).alias("_payload"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe.columns if c not in (key, ts_col)])
    p = probe.select(
        F.col(key), F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(b.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in probe.columns if c not in (key, ts_col)])
    w = (Window.partitionBy(key).orderBy(ts_col, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    m = (p.unionByName(b)
         .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
         .where(F.col("_side") == 1))
    out = m.select(key, ts_col,
                   *[c for c in probe.columns if c not in (key, ts_col)],
                   F.col("_match._b_ts").alias(f"{ts_col}_matched"),
                   *[F.col(f"_match.{c}").alias(c) for c in bcols])
    return out


def event_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the user's most recent click at-or-before
    it (classic attribution).  Oracle: DuckDB's native ASOF LEFT JOIN.

    The explicit schema pins ``ts`` to TIMESTAMP (the parquet reads
    back as NTZ, which ``unix_micros`` rejects); the read
    interpretation and the ``date_format`` render cancel, and the
    microsecond LAG is a difference, so the result is session-timezone
    independent."""
    ev = spark.read.schema(EVENTS_SCHEMA).parquet(f"{sf_dir}/events.parquet")
    clicks = (ev.where(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("click_id"),
                   F.max_by("value", "event_id").alias("click_value")))
    purch = (ev.where(F.col("event_type") == "purchase")
             .select("event_id", "user_id", "ts"))
    j = asof_join(purch, clicks, key="user_id")
    return j.select(
        "event_id", "user_id",
        F.date_format("ts", _TS_FMT).alias("ts"),
        "click_id",
        F.date_format("ts_matched", _TS_FMT).alias("click_ts"),
        "click_value",
        (F.unix_micros("ts") - F.unix_micros("ts_matched")).alias("lag_us"))


def event_asof_join_oracle() -> str:
    return """WITH c AS (
  SELECT user_id, ts, MAX(event_id) AS click_id,
         arg_max(value, event_id) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
  c.click_id,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
  c.click_value,
  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
WHERE p.event_type = 'purchase'"""


def range_join_agg(probe: DataFrame, build: DataFrame, key: str,
                   window_us: int, aggs: list, ts_col: str = "ts") -> DataFrame:
    """Generic trailing-window range join + aggregate: for each probe
    row, apply ``aggs`` over build rows with the same ``key`` and
    timestamp in ``(probe_ts - window_us, probe_ts]``.

    Bucket width == window width, so a qualifying build row's bucket is
    either the probe's bucket or the one before it: the probe side
    explodes to exactly those two buckets and the interval predicate
    becomes an equi-join + residual filter.  Probes with an empty
    window survive (left join onto the aggregate; callers coalesce).
    """
    b = (build.withColumn("_us", F.unix_micros(ts_col))
         .withColumn("_bucket", F.floor(F.col("_us") / window_us))
         .drop(ts_col))
    p = (probe.withColumn("_p_us", F.unix_micros(ts_col))
         .withColumn("_bucket", F.explode(F.array(
             F.floor(F.col("_p_us") / window_us) - 1,
             F.floor(F.col("_p_us") / window_us)))))
    hits = (p.join(b, [key, "_bucket"])
            .where((F.col("_us") > F.col("_p_us") - window_us)
                   & (F.col("_us") <= F.col("_p_us"))))
    pcols = [c for c in probe.columns if c != key]
    rolled = hits.groupBy(key, *pcols, "_p_us").agg(*aggs)
    return (probe.withColumn("_p_us", F.unix_micros(ts_col))
            .join(rolled, [key, *pcols, "_p_us"], "left")
            .drop("_p_us"))


def event_range_join(spark: SparkSession, sf_dir: str,
                     window_hours: int = 24) -> DataFrame:
    """Per purchase: how many clicks (and how much click value) the
    same user produced in the trailing 24 h — the canonical interval
    join, bucketized to an equi-join.  Oracle: DuckDB IEJoin on the raw
    inequality."""
    ev = spark.read.schema(EVENTS_SCHEMA).parquet(f"{sf_dir}/events.parquet")
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", "ts",
                      F.col("value").cast("decimal(12,2)").alias("v")))
    purch = (ev.where(F.col("event_type") == "purchase")
             .select("event_id", "user_id", "ts"))
    out = range_join_agg(
        purch, clicks, key="user_id", window_us=window_hours * _HOUR_US,
        aggs=[F.count("*").alias("_n"), F.sum("v").alias("_sv")])
    return out.select(
        "event_id", "user_id",
        F.date_format("ts", _TS_FMT).alias("ts"),
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_clicks_24h"),
        F.coalesce(F.col("_sv"), F.lit(0).cast("decimal(12,2)"))
         .cast("double").alias("click_value_24h"))


def event_range_join_oracle() -> str:
    return """SELECT p.event_id, p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
  COUNT(c.user_id) AS n_clicks_24h,
  CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(12,2))), 0) AS DOUBLE)
    AS click_value_24h
FROM events p LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts > p.ts - INTERVAL 24 HOUR AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY 1, 2, 3"""


# --- stream-stream interval join (fifth streaming shape) --------------

def stream_range_join(spark: SparkSession, input_glob: str, out_path: str,
                      checkpoint_dir: str, window_hours: int = 24,
                      delay: str = "2 days",
                      max_files_per_trigger: int = 1):
    """Stream-stream inner join with a time-range condition: purchases
    joined to the same user's clicks in the trailing ``window_hours``,
    both sides read from ONE event stream (filtered per side) with
    watermarks.  The time-range predicate bounds each side's state:
    a click is droppable once the watermark passes click_ts + window,
    a purchase once it passes purchase_ts — Spark derives both from
    the condition, so state is O(window × rate), not stream length.

    Matches emit exactly once as both sides arrive (append mode); a
    late row inside the allowed lateness still joins against retained
    state from earlier micro-batches — the cross-batch evidence the
    gate checks.  With every input inside the lateness bound the final
    output equals the batch inequality join exactly.
    """
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(input_glob))
    purch = (stream.where(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("p_id"), "user_id",
                     F.col("ts").alias("p_ts"))
             .withWatermark("p_ts", delay))
    clicks = (stream.where(F.col("event_type") == "click")
              .select(F.col("event_id").alias("c_id"),
                      F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"),
                      F.col("value").alias("c_value"))
              .withWatermark("c_ts", delay))
    joined = purch.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {window_hours} HOURS"))
        & (F.col("c_ts") <= F.col("p_ts")))
    from ._stream_util import run_to_partition_dirs
    return run_to_partition_dirs(joined, out_path, checkpoint_dir, "append")


def range_join_pairs_snapshot(spark: SparkSession, out_path: str) -> DataFrame:
    """Emitted (purchase, click) pairs in the oracle's column shape."""
    return (spark.read.parquet(out_path)
            .select(F.col("p_id").alias("event_id"), "user_id",
                    F.date_format("p_ts", _TS_FMT).alias("ts"),
                    F.col("c_id").alias("click_id"),
                    F.date_format("c_ts", _TS_FMT).alias("click_ts"),
                    F.col("c_value").alias("click_value")))


def streaming_range_join_oracle() -> str:
    return """SELECT p.event_id, p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
  c.event_id AS click_id,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
  c.value AS click_value
FROM events p JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts > p.ts - INTERVAL 24 HOUR AND c.ts <= p.ts
WHERE p.event_type = 'purchase'"""
