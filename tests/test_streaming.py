"""Streaming ingest: tiles arriving across micro-batches must yield the
same statistics as one batch run; restart resumes from the stream
checkpoint without reprocessing."""

import pytest

from exactextract_spark import io as eio
from exactextract_spark.extract import exact_extract
from exactextract_spark.fixtures import SynthConfig, build_docs
from exactextract_spark.streaming import StreamingZonalWriter, stream_zonal_from_dir

OPS = ["count", "sum", "mean", "min", "max", "variance"]


def test_streaming_matches_batch(spark, tmp_path):
    cfg = SynthConfig(G=128, Z=40)
    docs = build_docs(spark, cfg).cache()
    zones = eio.zones_from_docs(docs)
    meta = {r["raster_id"]: r.asDict()
            for r in eio.raster_meta_from_docs(docs).collect()}
    grid = cfg.grid_dict()
    grid["dtype"] = "float64"

    # batch reference result
    tiles = eio.tiles_from_docs(docs, "r0", meta["r0"])
    want = {r["zone_id"]: r.asDict()
            for r in exact_extract(zones, tiles, OPS, grid=grid).collect()}

    # split the raster docs into two "arrival" files
    rdocs = docs.where(~docs.doc_id.startswith("z") & docs.doc_id.startswith("r0"))
    n = rdocs.count()
    indir = tmp_path / "in"
    indir.mkdir()
    # write-then-read-back: an unordered limit() re-evaluates to a
    # different subset inside subtract(), so split on materialized rows
    rdocs.limit(n // 2).write.parquet(str(indir / "f1.parquet"))
    a = spark.read.parquet(str(indir / "f1.parquet"))
    b = rdocs.join(a.select("doc_id"), "doc_id", "left_anti")

    writer = StreamingZonalWriter(zones, grid, OPS, str(tmp_path / "state"),
                                  "r0", meta["r0"])
    stream_zonal_from_dir(spark, str(indir) + "/*", writer, str(tmp_path / "ck1"))
    m1 = writer.metrics()
    assert m1["tiles_done"] > 0

    b.write.parquet(str(indir / "f2.parquet"))
    stream_zonal_from_dir(spark, str(indir) + "/*", writer, str(tmp_path / "ck1"))
    m2 = writer.metrics()
    assert m2["tiles_done"] >= m1["tiles_done"]

    got = {r["zone_id"]: r.asDict() for r in writer.snapshot().collect()}
    assert set(got) == set(want)
    for z, row in want.items():
        for k, v in row.items():
            if k == "zone_id":
                continue
            if v is None:
                assert got[z][k] is None, (z, k)
            else:
                assert got[z][k] == pytest.approx(v), (z, k)


def test_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch may replay a batch after failure: same batch_id must
    not double-count."""
    from exactextract_spark import io as eio
    from exactextract_spark.fixtures import SynthConfig, build_docs

    cfg = SynthConfig(G=64, Z=20)
    docs = build_docs(spark, cfg).cache()
    zones = eio.zones_from_docs(docs)
    meta = {r["raster_id"]: r.asDict()
            for r in eio.raster_meta_from_docs(docs).collect()}
    grid = cfg.grid_dict()
    grid["dtype"] = "float64"
    rdocs = docs.where(docs.doc_id.startswith("r0"))
    w = StreamingZonalWriter(zones, grid, ["count", "sum"],
                             str(tmp_path / "st"), "r0", meta["r0"])
    w.process_batch(rdocs, 7)
    once = {r["zone_id"]: (r["count"], r["sum"]) for r in w.snapshot().collect()}
    w.process_batch(rdocs, 7)  # replay
    twice = {r["zone_id"]: (r["count"], r["sum"]) for r in w.snapshot().collect()}
    assert once == twice


def test_replay_after_crash_between_appends(spark, tmp_path):
    """Regression (ADVICE r1): a crash AFTER the partials append but
    BEFORE the lineage append, followed by a foreachBatch replay of the
    same batch_id, must not double-count — the replay's partials carry a
    fresh attempt uuid and only lineage-committed attempts are visible."""
    from unittest import mock

    cfg = SynthConfig(G=64, Z=20)
    docs = build_docs(spark, cfg).cache()
    zones = eio.zones_from_docs(docs)
    meta = {r["raster_id"]: r.asDict()
            for r in eio.raster_meta_from_docs(docs).collect()}
    grid = cfg.grid_dict()
    grid["dtype"] = "float64"
    rdocs = docs.where(docs.doc_id.startswith("r0"))

    w = StreamingZonalWriter(zones, grid, ["count", "sum"],
                             str(tmp_path / "st"), "r0", meta["r0"])

    # attempt 1: crash right after the partials append (lineage missing)
    real_writer = type(rdocs.write).parquet

    def crashing_parquet(self, path, *a, **kw):
        real_writer(self, path, *a, **kw)
        if path.endswith("/partials"):
            raise RuntimeError("simulated crash before lineage append")

    with mock.patch.object(type(rdocs.write), "parquet", crashing_parquet):
        with pytest.raises(RuntimeError, match="simulated crash"):
            w.process_batch(rdocs, 3)

    # replay of the same stream batch_id commits cleanly
    w.process_batch(rdocs, 3)
    got = {r["zone_id"]: (r["count"], r["sum"]) for r in w.snapshot().collect()}

    tiles = eio.tiles_from_docs(docs, "r0", meta["r0"])
    want = {r["zone_id"]: (r["count"], r["sum"])
            for r in exact_extract(zones, tiles, ["count", "sum"], grid=grid).collect()}
    assert got == {z: (pytest.approx(c), pytest.approx(s)) for z, (c, s) in want.items()}


def test_streaming_shuffle_strategy_matches_batch(spark, tmp_path, monkeypatch):
    """Above the broadcast zone limit the writer must NOT collect the
    zone geometries to the driver (the batch path's guard,
    extract.py BROADCAST_ZONE_LIMIT): auto falls back to the shuffle
    strategy — (zone_id, geometry) structs ride the per-tile hit-list —
    and the snapshot still equals the batch result."""
    from exactextract_spark import extract as _extract

    cfg = SynthConfig(G=64, Z=20)
    docs = build_docs(spark, cfg).cache()
    zones = eio.zones_from_docs(docs)
    meta = {r["raster_id"]: r.asDict()
            for r in eio.raster_meta_from_docs(docs).collect()}
    grid = cfg.grid_dict()
    grid["dtype"] = "float64"
    rdocs = docs.where(docs.doc_id.startswith("r0"))

    monkeypatch.setattr(_extract, "BROADCAST_ZONE_LIMIT", 5)
    w = StreamingZonalWriter(zones, grid, ["count", "sum", "variance"],
                             str(tmp_path / "st"), "r0", meta["r0"])
    assert w.strategy == "shuffle"
    assert w.geom_lookup is None  # nothing collected to the driver
    assert "zone_structs" in w.pairs_agg.columns
    monkeypatch.undo()

    w.process_batch(rdocs, 0)
    got = {r["zone_id"]: r.asDict() for r in w.snapshot().collect()}

    tiles = eio.tiles_from_docs(docs, "r0", meta["r0"])
    want = {r["zone_id"]: r.asDict()
            for r in exact_extract(zones, tiles, ["count", "sum", "variance"],
                                   grid=grid).collect()}
    assert set(got) == set(want)
    for z, row in want.items():
        for k, v in row.items():
            if k == "zone_id":
                continue
            if v is None:
                assert got[z][k] is None, (z, k)
            else:
                assert got[z][k] == pytest.approx(v), (z, k)


def test_streaming_rejects_unknown_strategy(spark, tmp_path):
    cfg = SynthConfig(G=64, Z=10)
    docs = build_docs(spark, cfg).cache()
    zones = eio.zones_from_docs(docs)
    meta = {r["raster_id"]: r.asDict()
            for r in eio.raster_meta_from_docs(docs).collect()}
    grid = cfg.grid_dict()
    grid["dtype"] = "float64"
    with pytest.raises(ValueError, match="strategy"):
        StreamingZonalWriter(zones, grid, ["count"], str(tmp_path / "st"),
                             "r0", meta["r0"], strategy="bogus")


def test_streaming_weighted_matches_batch(spark, tmp_path):
    """Weighted stats over a STATIC weight raster with streamed value
    tiles (the batch/streaming asymmetry closed in r5): snapshot after
    two micro-batches equals one weighted batch run, including the
    coarse-grid regrid path (wc0 at 4x resolution)."""
    cfg = SynthConfig(G=64, Z=25)
    docs = build_docs(spark, cfg).cache()
    zones = eio.zones_from_docs(docs)
    meta = {r["raster_id"]: r.asDict()
            for r in eio.raster_meta_from_docs(docs).collect()}
    grid = cfg.grid_dict()
    grid["dtype"] = "float64"
    ops = ["count", "weighted_sum", "weighted_mean", "weighted_variance"]

    # wc0 additionally forces the shuffle strategy, covering the
    # weighted x shuffle combination (weight payloads joined onto value
    # tiles whose zone hit-list carries geometry structs)
    for wid, strat in (("w0", "broadcast"), ("wc0", "shuffle")):
        wtiles = eio.tiles_from_docs(docs, wid, meta[wid])
        tiles = eio.tiles_from_docs(docs, "r0", meta["r0"])
        want = {r["zone_id"]: r.asDict()
                for r in exact_extract(zones, tiles, ops, weight_tiles=wtiles,
                                       grid=grid).collect()}

        rdocs = docs.where(docs.doc_id.startswith("r0:"))
        n = rdocs.count()
        half = rdocs.orderBy("doc_id").limit(n // 2)
        rest = rdocs.join(half.select("doc_id"), "doc_id", "left_anti")

        w = StreamingZonalWriter(zones, grid, ops, str(tmp_path / f"st_{wid}"),
                                 "r0", meta["r0"], weight_tiles=wtiles,
                                 strategy=strat)
        assert w.strategy == strat
        w.process_batch(half, 0)
        w.process_batch(rest, 1)
        got = {r["zone_id"]: r.asDict() for r in w.snapshot().collect()}

        assert set(got) == set(want)
        for z, row in want.items():
            for k, v in row.items():
                if k == "zone_id":
                    continue
                if v is None:
                    assert got[z][k] is None, (wid, z, k)
                elif v != v:  # NaN (undefined weight propagation)
                    assert got[z][k] != got[z][k], (wid, z, k)
                else:
                    assert got[z][k] == pytest.approx(v), (wid, z, k)


def test_stream_range_join_cross_batch_match(spark, tmp_path):
    """A purchase in micro-batch 1 must join a click that only arrives
    in micro-batch 2 (retained state), each pair emitted exactly once."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from exactextract_spark.pipeline._stream_util import stagger_mtimes
    from exactextract_spark.pipeline.events_join import (
        range_join_pairs_snapshot, stream_range_join)

    rows1 = [(1, dt.datetime(2024, 1, 5, 12, 0, 0), 7, "purchase", 5.0, "{}"),
             (2, dt.datetime(2024, 1, 5, 11, 0, 0), 7, "click", 1.0, "{}"),
             (9, dt.datetime(2024, 1, 6, 0, 0, 0), 8, "view", 0.0, "{}")]
    # batch 2: a LATE click (within the 2-day watermark) preceding the
    # batch-1 purchase, plus a click outside the 24h window
    rows2 = [(3, dt.datetime(2024, 1, 5, 10, 0, 0), 7, "click", 2.0, "{}"),
             (4, dt.datetime(2024, 1, 4, 10, 0, 0), 7, "click", 3.0, "{}"),
             (5, dt.datetime(2024, 1, 7, 0, 0, 0), 8, "purchase", 9.0, "{}")]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    base = str(tmp_path)
    for k, rows in enumerate((rows1, rows2)):
        p = os.path.join(base, "in", f"f{k}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        stagger_mtimes(p, float(k))
    stream_range_join(spark, base + "/in/*", base + "/out", base + "/ck")
    out = range_join_pairs_snapshot(spark, base + "/out").toPandas()
    pairs = sorted(zip(out["event_id"], out["click_id"]))
    # purchase 1 joins click 2 (same batch) AND late click 3 (cross
    # batch); click 4 is 26h before -> outside window; purchase 5 has
    # no clicks for user 8
    assert pairs == [(1, 2), (1, 3)], pairs
    assert len(out) == len(out.drop_duplicates(["event_id", "click_id"]))
