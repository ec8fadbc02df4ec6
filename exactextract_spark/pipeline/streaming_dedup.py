"""Stateful Structured-Streaming exact dedup.

The batch operator (dedup.exact_dedup) is one digest shuffle; this is
its streaming twin for a pipeline where documents arrive continuously:

    docs readStream
      → groupBy(md5(text))
      → applyInPandasWithState        # per-digest state:
            (running min doc_id,      #   canonical winner so far
             cumulative doc count)    #   how many copies seen
      → update-mode emissions appended per micro-batch
    snapshot() = latest per-digest state joined onto the docs

Because min and count are associative-commutative, the snapshot after
any prefix of micro-batches equals the one-shot batch SQL over the
documents ingested so far — the same exactness contract as
streaming.StreamingZonalWriter, but carried by Spark's keyed state
store instead of parquet partial files.

Scale notes (100 TB): the only shuffle is the keyed state exchange on
the digest — identical shape to the batch groupBy.  State is O(distinct
digests) spread across the state store (RocksDB-backed per executor in
production); a hot digest (billions of empty documents) is a single
state row, not a single giant task.  Update-mode emission is bounded by
the digests *touched in the batch*, not the total state size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

__all__ = ["DOCS_TEXT_SCHEMA", "stream_dedup_exact", "dedup_state_snapshot"]

# documents.parquet shape (TESTDATA.md)
DOCS_TEXT_SCHEMA = ("doc_id long, text string, lang string, "
                    "source string, n_chars long")

_OUT_SCHEMA = "text_hash string, canonical_id long, dup_count long"
_STATE_SCHEMA = "canonical_id long, dup_count long"


def _update_digest_state(key, pdf_iter, state):
    """Per-digest state transition: fold the batch's doc_ids into the
    running (min doc_id, count).  Emits ONE row with the cumulative
    state — later emissions for the same digest supersede earlier ones
    (resolved by batch_seq in the snapshot)."""
    cmin, cnt = state.get if state.exists else (None, 0)
    for pdf in pdf_iter:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            cmin = m if cmin is None else min(cmin, m)
            cnt += len(pdf)
    state.update((cmin, cnt))
    yield pd.DataFrame({"text_hash": [key[0]],
                        "canonical_id": [cmin], "dup_count": [cnt]})


def stream_dedup_exact(spark: SparkSession, input_glob: str, out_path: str,
                       checkpoint_dir: str, max_files_per_trigger: int = 1):
    """Run the stateful dedup stream over a directory of docs parquet
    (availableNow; ``max_files_per_trigger`` forces multiple
    micro-batches so the cross-batch state merge is actually
    exercised).  Each micro-batch's update-mode emissions are appended
    to ``out_path`` stamped with the batch id."""
    stream = (spark.readStream.schema(DOCS_TEXT_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(input_glob))
    digests = stream.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash"))
    updates = digests.groupBy("text_hash").applyInPandasWithState(
        _update_digest_state, _OUT_SCHEMA, _STATE_SCHEMA,
        "update", GroupStateTimeout.NoTimeout)
    from ._stream_util import run_to_partition_dirs
    return run_to_partition_dirs(updates, out_path, checkpoint_dir, "update")


def dedup_state_snapshot(spark: SparkSession, docs: DataFrame,
                         out_path: str) -> DataFrame:
    """Current dedup assignment: the LATEST per-digest emission (the
    cumulative state) joined onto the documents.  Equals the batch
    dedup.exact_dedup over everything ingested — canonical_id and
    dup_count both come from the state store, so the equality also
    proves the cross-batch state accumulation, not just the join."""
    upd = spark.read.parquet(out_path)
    latest = (upd.groupBy("text_hash")
              .agg(F.max_by(F.struct("canonical_id", "dup_count"),
                            "batch_seq").alias("s"))
              .select("text_hash", "s.canonical_id", "s.dup_count"))
    d = docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash"))
    # null-safe join: a NULL text hashes to a NULL digest, which forms
    # its own state group in the stream and its own window partition in
    # the oracle — a plain equi-join would silently drop those rows
    return (d.join(latest, d["text_hash"].eqNullSafe(latest["text_hash"]))
            .select(d["doc_id"], d["text_hash"],
                    latest["canonical_id"], latest["dup_count"],
                    (d["doc_id"] != latest["canonical_id"])
                    .alias("is_duplicate")))
