"""Shared plumbing for the availableNow streaming operators."""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame


def run_to_partition_dirs(updates: DataFrame, out_path: str,
                          checkpoint_dir: str, output_mode: str):
    """Run a streaming DataFrame to completion (availableNow), landing
    each micro-batch's rows in a replay-idempotent partition directory
    ``out_path/batch_seq=<id>`` — a crashed-and-replayed micro-batch
    overwrites its own directory instead of appending a second copy,
    and batch_seq comes back as a partition column on read."""
    def _append(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(f"{out_path}/batch_seq={batch_id}"))

    q = (updates.writeStream.outputMode(output_mode).foreachBatch(_append)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q


def stagger_mtimes(path: str, offset_s: float) -> None:
    """Pin every file under ``path`` to now + ``offset_s`` so the
    FileStreamSource processes a set of staged input files in the
    intended order (it orders by modification time), one per
    micro-batch when maxFilesPerTrigger=1."""
    t = time.time() + offset_s
    for root, _, files in os.walk(path):
        for fn in files:
            os.utime(os.path.join(root, fn), (t, t))
