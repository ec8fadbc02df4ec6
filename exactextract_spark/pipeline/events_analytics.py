"""Event-table analytics: funnel, retention cohorts, rolling features.

Three canonical product-analytics operators over the events table, each
a distinct plan shape the engine did not exercise elsewhere:

* ``event_funnel`` — ordered multi-step funnel (view → click →
  purchase) per user.  The textbook formulation needs K passes (step k
  filtered by step k-1's timestamp); here all steps chain inside ONE
  per-user window sort: a running "earliest step-k so-far" column per
  step, each defined over the previous step's running column, then one
  groupBy on the same key.  Catalyst plans a single Exchange + Sort
  with the window operators and the final aggregate stacked on top —
  one shuffle for the whole funnel, any number of steps.

* ``user_retention`` — classic cohort retention: users grouped by
  first-activity day, activity counted per (cohort, day-offset).  Two
  partial-aggregatable shuffles (first-day per user; distinct users
  per cohort cell) plus one equi-join on user_id.

* ``user_rolling_features`` — per-event trailing-window features
  (7-day event count / spend) via a RANGE-frame window on integer
  microseconds — the feature-engineering shape for training-data
  pipelines (no self-join, no explosion; one per-key sort, frames
  evaluated incrementally).  Sums run over DECIMAL(12,2) so the
  sliding-window combine order cannot perturb the result; the mean is
  a single correctly-rounded double division in both engines.

Timestamps: the parquet reads back as TIMESTAMP_NTZ unless pinned;
EVENTS_SCHEMA forces TIMESTAMP and every query sets the session
timezone to UTC so ``unix_micros`` agrees with DuckDB's ``epoch_us``
(naive == UTC).

Scale shape (100 TB): all three operators shuffle on user_id (or the
compact (cohort, offset) key) with map-side partial aggregation; no
operator's per-task input grows with the table — only with per-user
event density, the same bound the as-of join documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .streaming_events import EVENTS_SCHEMA

__all__ = ["funnel", "event_funnel", "event_funnel_oracle",
           "user_retention", "user_retention_oracle",
           "user_rolling_features", "user_rolling_features_oracle",
           "event_user_profile", "event_user_profile_oracle"]

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_DAY_US = 86_400_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.schema(EVENTS_SCHEMA).parquet(f"{sf_dir}/events.parquet")


def funnel(events: DataFrame, steps: list[str], key: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Ordered funnel over arbitrary steps: per ``key``, the earliest
    timestamp (integer µs) of each step that occurs at-or-after the
    previous step's earliest valid occurrence, plus the deepest stage
    reached (0 = none of the steps).

    Same-timestamp semantics are AT-OR-AFTER (a click in the same
    microsecond as the first view counts): the running columns use a
    RANGE frame to current ts, so equal-timestamp rows see each other
    regardless of row order — deterministic without a tiebreaker."""
    d = events.select(F.col(key), F.col(type_col).alias("_et"),
                      F.unix_micros(ts_col).alias("_tsl"))
    w = (Window.partitionBy(key).orderBy("_tsl")
         .rangeBetween(Window.unboundedPreceding, 0))
    prev = None
    valid_cols = []
    for i, step in enumerate(steps):
        cond = F.col("_et") == step
        if prev is not None:
            cond = cond & F.col(prev).isNotNull()
        vc = f"_v{i}"
        d = d.withColumn(vc, F.when(cond, F.col("_tsl")))
        run = f"_r{i}"
        d = d.withColumn(run, F.min(vc).over(w))
        valid_cols.append(vc)
        prev = run
    agg = d.groupBy(key).agg(
        *[F.min(vc).alias(f"t_{step}") for vc, step in zip(valid_cols, steps)])
    stage = F.lit(0)
    for i, step in enumerate(steps):
        stage = F.when(F.col(f"t_{step}").isNotNull(), F.lit(i + 1)) \
                 .otherwise(stage)
    return agg.withColumn("funnel_stage", stage.cast("int"))


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel per user.  Oracle: independent
    chained-CTE formulation (step k = MIN ts joined against step k-1)."""
    return funnel(_events(spark, sf_dir), ["view", "click", "purchase"])


def event_funnel_oracle() -> str:
    return """WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS tsl FROM events),
u AS (SELECT DISTINCT user_id FROM e),
a AS (SELECT user_id, MIN(tsl) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY 1),
b AS (SELECT e.user_id, MIN(e.tsl) AS t_click FROM e
      JOIN a ON e.user_id = a.user_id AND e.tsl >= a.t_view
      WHERE e.event_type = 'click' GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.tsl) AS t_purchase FROM e
      JOIN b ON e.user_id = b.user_id AND e.tsl >= b.t_click
      WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT u.user_id, a.t_view, b.t_click, c.t_purchase,
  CAST(CASE WHEN c.t_purchase IS NOT NULL THEN 3
            WHEN b.t_click IS NOT NULL THEN 2
            WHEN a.t_view IS NOT NULL THEN 1
            ELSE 0 END AS INT) AS funnel_stage
FROM u LEFT JOIN a ON u.user_id = a.user_id
       LEFT JOIN b ON u.user_id = b.user_id
       LEFT JOIN c ON u.user_id = c.user_id"""


def user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: for each first-activity-day cohort,
    how many distinct users were active k days later."""
    ev = _events(spark, sf_dir)
    d = ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
    first = d.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (d.join(first, "user_id")
            .groupBy(F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
                     F.datediff("day", "cohort").cast("int").alias("day_offset"))
            .agg(F.countDistinct("user_id").alias("n_users")))


def user_retention_oracle() -> str:
    return """WITH d AS (
  SELECT user_id, date_trunc('day', ts) AS day FROM events),
f AS (SELECT user_id, MIN(day) AS cohort FROM d GROUP BY 1)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(datediff('day', f.cohort, d.day) AS INT) AS day_offset,
       COUNT(DISTINCT d.user_id) AS n_users
FROM d JOIN f ON d.user_id = f.user_id
GROUP BY 1, 2"""


def rolling_features(events: DataFrame, window_us: int,
                     key: str = "user_id", ts_col: str = "ts",
                     value_col: str = "value") -> DataFrame:
    """Per event: count and exact DECIMAL sum of the same key's events
    in the trailing ``(t - window, t]``, via one RANGE-frame window."""
    d = events.withColumn("_tsl", F.unix_micros(ts_col)) \
              .withColumn("_v", F.col(value_col).cast("decimal(12,2)"))
    w = (Window.partitionBy(key).orderBy("_tsl")
         .rangeBetween(-(window_us - 1), 0))
    return (d.withColumn("_n", F.count("*").over(w))
             .withColumn("_s", F.sum("_v").over(w)))


def user_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day activity features on every event row."""
    out = rolling_features(_events(spark, sf_dir), 7 * _DAY_US)
    return out.select(
        "event_id", "user_id",
        F.date_format("ts", _TS_FMT).alias("ts"),
        F.col("_n").alias("n_7d"),
        F.col("_s").cast("double").alias("sum_7d"),
        (F.col("_s").cast("double") / F.col("_n")).alias("mean_7d"))


def user_rolling_features_oracle() -> str:
    return """WITH e AS (
  SELECT event_id, user_id, ts, epoch_us(ts) AS tsl,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events)
SELECT event_id, user_id,
  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
  COUNT(*) OVER w AS n_7d,
  CAST(SUM(v) OVER w AS DOUBLE) AS sum_7d,
  CAST(SUM(v) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS mean_7d
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY tsl
             RANGE BETWEEN 604799999999 PRECEDING AND CURRENT ROW)"""


def event_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime profile — the feature-store row a training
    pipeline joins onto everything else: first/last activity (integer
    µs), tenure in days, distinct active days, event count, exact
    DECIMAL total spend, top event type (ties → lexicographically
    smallest via min_by on (-count, type) — mirrored in the
    oracle with window ORDER BY count DESC, type ASC).

    One partial-aggregatable shuffle on user_id; distinct-day counting
    rides the same aggregate (count_distinct folds map-side into a
    compact per-task set bounded by tenure, not event count)."""
    ev = _events(spark, sf_dir)
    base = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("first_us"),
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count("*").alias("n_events"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("n_active_days"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
         .alias("total_value"))
    per_type = (ev.groupBy("user_id", "event_type")
                .agg(F.count("*").alias("n"))
                .groupBy("user_id")
                .agg(F.min_by(
                    "event_type",
                    F.struct((-F.col("n")).alias("neg"), "event_type"))
                    .alias("top_type")))
    return (base.join(per_type, "user_id")
            .select("user_id", "first_us", "last_us",
                    ((F.col("last_us") - F.col("first_us"))
                     / F.lit(float(_DAY_US))).alias("tenure_days"),
                    "n_active_days", "n_events", "total_value",
                    "top_type"))


def event_user_profile_oracle() -> str:
    return """WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS tsl,
         date_trunc('day', ts) AS day,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events),
b AS (
  SELECT user_id, MIN(tsl) AS first_us, MAX(tsl) AS last_us,
         COUNT(*) AS n_events,
         COUNT(DISTINCT day) AS n_active_days,
         CAST(SUM(v) AS DOUBLE) AS total_value
  FROM e GROUP BY 1),
t AS (
  SELECT user_id, event_type AS top_type FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type)
             AS rn
    FROM e GROUP BY user_id, event_type)
  WHERE rn = 1)
SELECT b.user_id, b.first_us, b.last_us,
       (b.last_us - b.first_us) / 86400000000.0 AS tenure_days,
       b.n_active_days, b.n_events, b.total_value, t.top_type
FROM b JOIN t ON b.user_id = t.user_id"""
