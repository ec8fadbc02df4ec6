"""Multimodal column plumbing: treat image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the decode step is a
clearly-marked STUB (deterministic fake header parse /
NotImplementedError for real decoding).  Everything Spark-side is real
and tested: schema, Arrow-batched mapInPandas, batch shapes,
partitioning."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("fake_width", T.IntegerType()),
    T.StructField("fake_height", T.IntegerType()),
])


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake "decode": header-derived metadata.  A real
    deployment would swap in PIL / libav here."""
    n = len(payload)
    fb = payload[0] if n else 0
    return {"n_bytes": n, "first_byte": fb,
            "fake_width": n % 640, "fake_height": (fb * 7) % 480}


def real_decode(payload: bytes):
    raise NotImplementedError(
        "image/audio decoding is stubbed in this container; install a "
        "codec (PIL/libav) and replace decode_stub")


def binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with a fake binary media payload column (UTF-8 bytes of
    the text — deterministic, no external data)."""
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.encode("text", "UTF-8").alias("payload")))


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode → typed metadata through Arrow-batched mapInPandas
    (the real plumbing; only the decoder itself is a stub)."""
    docs = binary_docs(spark, sf_dir)

    def run(batches):
        for pdf in batches:
            metas = [decode_stub(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out.astype({"n_bytes": np.int32, "first_byte": np.int32,
                              "fake_width": np.int32, "fake_height": np.int32})

    return docs.mapInPandas(run, schema=META_SCHEMA)


N_FRAMES = 3


def frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: slice N_FRAMES
    evenly-spaced byte windows per payload and fingerprint each —
    the decode itself is the stub; batching/schema/partitioning real."""
    docs = binary_docs(spark, sf_dir)

    def run(batches):
        import hashlib
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [],
                   "frame_len": [], "frame_md5": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                flen = max(len(b) // (N_FRAMES + 1), 1)
                for i in range(N_FRAMES):
                    off = i * (len(b) // N_FRAMES) if len(b) >= N_FRAMES else 0
                    chunk = b[off:off + flen]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(i)
                    out["frame_off"].append(off)
                    out["frame_len"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out).astype(
                {"frame_idx": np.int32, "frame_off": np.int32, "frame_len": np.int32})

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_off", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ])
    return docs.mapInPandas(run, schema=schema)


N_BINS = 16
RESIZE_TO = 16


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over the fake-decoded 1-D uint8 signal (real
    numpy math on real Arrow batches; only the codec is fake): mean,
    std (population), and a 16-bin intensity histogram, exploded to
    (doc_id, bin, bin_count) rows plus the scalar moments."""
    docs = binary_docs(spark, sf_dir)

    def run(batches):
        for pdf in batches:
            out = {"doc_id": [], "mean_i": [], "std_i": [],
                   "bin": [], "bin_count": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                sig = np.frombuffer(bytes(payload), dtype=np.uint8)
                if sig.size == 0:
                    continue
                s = sig.astype(np.float64)
                hist = np.bincount(sig // N_BINS, minlength=N_BINS)
                m = float(s.mean())
                sd = float(np.sqrt(np.maximum((s * s).mean() - m * m, 0.0)))
                for b in range(N_BINS):
                    out["doc_id"].append(did)
                    out["mean_i"].append(m)
                    out["std_i"].append(sd)
                    out["bin"].append(b)
                    out["bin_count"].append(int(hist[b]))
            yield pd.DataFrame(out)

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("mean_i", T.DoubleType()),
        T.StructField("std_i", T.DoubleType()),
        T.StructField("bin", T.LongType()),
        T.StructField("bin_count", T.LongType()),
    ])
    return docs.mapInPandas(run, schema=schema)


def media_features_oracle() -> str:
    # ASCII documents: byte i == codepoint of char i.  Mean/std via the
    # same moment formulas; histogram of byte // 16.
    return f"""WITH sig AS (
  SELECT doc_id,
         list_transform(range(1, octet_length(encode(text)) + 1),
                        i -> ascii(substr(text, CAST(i AS INT), 1))) AS s
  FROM documents WHERE octet_length(encode(text)) > 0),
m AS (
  SELECT doc_id, s,
         CAST(list_sum(s) AS DOUBLE) / len(s) AS mean_i,
         SQRT(GREATEST(CAST(list_sum(list_transform(s, v -> v * v)) AS DOUBLE) / len(s)
              - (CAST(list_sum(s) AS DOUBLE) / len(s)) * (CAST(list_sum(s) AS DOUBLE) / len(s)),
              0.0)) AS std_i
  FROM sig),
b AS (SELECT range AS bin FROM range({N_BINS}))
SELECT m.doc_id, m.mean_i, m.std_i, b.bin,
       CAST(len(list_filter(m.s, v -> v // {N_BINS} = b.bin)) AS BIGINT) AS bin_count
FROM m CROSS JOIN b"""


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor "resize" of the byte signal to RESIZE_TO samples
    (the 1-D analog of image resize; integer index arithmetic so the
    oracle reproduces it exactly), exploded to (doc_id, pos, sample)."""
    docs = binary_docs(spark, sf_dir)

    def run(batches):
        for pdf in batches:
            out = {"doc_id": [], "pos": [], "sample": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                sig = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = sig.size
                if n == 0:
                    continue
                idx = (np.arange(RESIZE_TO, dtype=np.int64) * n) // RESIZE_TO
                for p, v in enumerate(sig[idx]):
                    out["doc_id"].append(did)
                    out["pos"].append(p)
                    out["sample"].append(int(v))
            yield pd.DataFrame(out)

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("pos", T.LongType()),
        T.StructField("sample", T.LongType()),
    ])
    return docs.mapInPandas(run, schema=schema)


def media_resize_oracle() -> str:
    return f"""WITH f AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
  WHERE octet_length(encode(text)) > 0),
p AS (SELECT range AS pos FROM range({RESIZE_TO}))
SELECT doc_id, pos,
       CAST(ascii(substr(text, CAST(1 + (pos * n) // {RESIZE_TO} AS INT), 1)) AS BIGINT) AS sample
FROM f CROSS JOIN p"""


def frame_samples_oracle() -> str:
    # documents are ASCII: byte offsets == char offsets; same integer
    # arithmetic as the stub
    return f"""WITH f AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         GREATEST(octet_length(encode(text)) // {N_FRAMES + 1}, 1) AS flen
  FROM documents),
idx AS (SELECT range AS i FROM range({N_FRAMES}))
SELECT doc_id, CAST(i AS INT) AS frame_idx,
  CAST(CASE WHEN n >= {N_FRAMES} THEN i * (n // {N_FRAMES}) ELSE 0 END AS INT) AS frame_off,
  CAST(LEAST(flen, n - (CASE WHEN n >= {N_FRAMES} THEN i * (n // {N_FRAMES}) ELSE 0 END)) AS INT) AS frame_len,
  md5(substr(text, 1 + CASE WHEN n >= {N_FRAMES} THEN i * (n // {N_FRAMES}) ELSE 0 END, flen)) AS frame_md5
FROM f CROSS JOIN idx"""


def media_metadata_oracle() -> str:
    # documents are ASCII, so codepoint == first UTF-8 byte
    return """SELECT doc_id,
  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
  CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
  CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
  CAST((ascii(substr(text, 1, 1)) * 7) % 480 AS INT) AS fake_height
FROM documents"""
