"""Sequence packing: lay documents out contiguously into fixed-size
shards (the standard LLM-pretraining packing layout — documents
concatenate in a stable order; a shard boundary may fall inside a
document, which then straddles two shards).

For each document (ordered by doc_id):

    start   = exclusive prefix sum of n_chars
    shard   = start // budget
    offset  = start %  budget

The prefix sum is computed DISTRIBUTED, not with a global
single-partition window (which would funnel the whole table through
one sorting task): range-partition by doc_id, per-partition cumulative
sums in parallel, then a tiny per-partition-totals table (one row per
partition) broadcast back as exclusive offsets.  Prefix sum is
associative, so the result is identical for ANY ordered disjoint
range partitioning — the sampled repartitionByRange boundaries don't
affect the output.

Scale shape (100 TB): one range shuffle of (doc_id, n_chars) scalars
(the text itself never moves), per-partition windows bounded by
partition size, and a broadcast of num_partitions rows.  The oracle is
the equivalent global-window SQL (exact integer arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

__all__ = ["pack_documents"]


def pack_documents(spark: SparkSession, sf_dir: str,
                   budget: int = 4096, num_partitions: int = 8) -> DataFrame:
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "n_chars"))
    parts = docs.repartitionByRange(num_partitions, "doc_id") \
                .withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy("doc_id")
    local = parts.withColumn(
        "_local_end", F.sum("n_chars").over(w)).persist()
    # one row per partition: tiny, broadcast back as exclusive offsets
    totals = (local.groupBy("_pid")
              .agg(F.max("_local_end").alias("_ptotal")))
    woff = Window.orderBy("_pid") \
                 .rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_ptotal").over(woff), F.lit(0))
                 .alias("_poffset"))
    packed = (local.join(F.broadcast(offsets), "_pid")
              .withColumn("_start", F.col("_poffset")
                          + F.col("_local_end") - F.col("n_chars"))
              .select("doc_id", "n_chars",
                      F.expr(f"_start div {budget}").alias("shard_id"),
                      (F.col("_start") % budget).alias("shard_offset")))
    return packed
