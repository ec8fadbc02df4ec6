"""SparkSession builder with scale-appropriate defaults, plus a
progress helper (the reference's progress callback analog,
processor.h:124-136 / exact_extract.py:465-491)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def job_progress(spark: SparkSession) -> dict:
    """Snapshot of active-job progress: {job_id: (completed, total)}.
    Poll from a monitoring thread while an action runs."""
    st = spark.sparkContext.statusTracker()
    out = {}
    for jid in st.getActiveJobsIds():
        info = st.getJobInfo(jid)
        if info is None:
            continue
        done = total = 0
        for sid in info.stageIds:
            s = st.getStageInfo(sid)
            if s is not None:
                done += s.numCompletedTasks
                total += s.numTasks
        out[jid] = (done, total)
    return out


def get_spark(app: str = "exactextract-spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    return (SparkSession.builder
            .master(f"local[{cores}]")
            .appName(app)
            .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
            # local-mode JVM = driver + executors in one heap: size it so
            # staged pipeline caches (shingle/band tables) plus 10M-row
            # window state fit without eviction churn (the host has
            # 128 GiB; override via SPARK_DRIVER_MEM for smaller hosts
            # or cluster mode, where executors carry their own memory)
            .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
            .config("spark.ui.enabled", "false")
            .getOrCreate())
