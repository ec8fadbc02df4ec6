#!/usr/bin/env python3
"""Benchmark harness: headline zonal queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

plus derived polygons/sec and pixels/sec (the BASELINE.json metric).
The fixture scales with sf; a handful of giant zones (25% of the grid
each) are added to exercise the skew path (per-tile fan-out + map-side
partial aggregation)."""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exactextract_spark import io as eio  # noqa: E402
from exactextract_spark.extract import ZonalExtractor, attach_bbox, zone_tile_pairs  # noqa: E402
from exactextract_spark.fixtures import SynthConfig, build_docs  # noqa: E402
from exactextract_spark.session import get_spark  # noqa: E402


def big_zones(spark, cfg, n=8):
    """Giant zones covering ~25% of the grid each — the skew driver
    (FIXTURES.md F9)."""
    G = cfg.G
    rows = []
    for i in range(n):
        w = G // 2
        x0 = (i * 37) % (G - w)
        y0 = (i * 53) % (G - w)
        rows.append((f"big{i}",
                     f"POLYGON (({x0} {y0}, {x0 + w} {y0}, {x0 + w} {y0 + w}, "
                     f"{x0} {y0 + w}, {x0} {y0}))"))
    return spark.createDataFrame(rows, ["zone_id", "geometry"])


def star_zones(spark, cfg, n=2000, verts=12):
    """Irregular (non-rectangle) polygon zones — exercises the general
    scanline path, not the rectangle fast path."""
    import numpy as np

    G = cfg.G
    rng = np.random.default_rng(123)
    rows = []
    for i in range(n):
        m = verts
        ang = (np.arange(m) + rng.uniform(0.05, 0.95, m)) * (2 * np.pi / m)
        rad = rng.uniform(2.0, 14.0, m)
        cx, cy = rng.uniform(16, G - 16, 2)
        xs = np.clip(cx + rad * np.cos(ang), 0, G)
        ys = np.clip(cy + rad * np.sin(ang), 0, G)
        pts = ", ".join(f"{x:.4f} {y:.4f}" for x, y in zip(xs, ys))
        rows.append((f"p{i}", f"POLYGON (({pts}, {xs[0]:.4f} {ys[0]:.4f}))"))
    return spark.createDataFrame(rows, ["zone_id", "geometry"])


def coast_zones(spark, cfg, n=500, verts=800, rad_cells=20.0):
    """Coastline-shaped zones: many short edges, boundary-cell-heavy —
    the antarctica.wkt-shaped workload that exercises the batched
    boundary-cell ring assembly (traversal.grid_cell_chains)."""
    import numpy as np

    G = cfg.G
    rng = np.random.default_rng(7)
    ang = np.linspace(0, 2 * np.pi, verts, endpoint=False)
    rows = []
    for i in range(n):
        rad = (rad_cells + 0.3 * rad_cells * np.sin(5 * ang + i)
               + 0.06 * rad_cells * np.sin(37 * ang)
               + rng.uniform(-0.015 * rad_cells, 0.015 * rad_cells, verts))
        cx, cy = rng.uniform(rad_cells + 2, G - rad_cells - 2, 2)
        xs = cx + rad * np.cos(ang)
        ys = cy + rad * np.sin(ang)
        pts = ", ".join(f"{x:.4f} {y:.4f}" for x, y in zip(xs, ys))
        rows.append((f"c{i}", f"POLYGON (({pts}, {xs[0]:.4f} {ys[0]:.4f}))"))
    return spark.createDataFrame(rows, ["zone_id", "geometry"])


def _best_of(fn, n=2):
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def scale_point_rect(spark):
    """~1.3e9 pixel reads over 50k large rectangle zones — the
    compute-dominated rect path (same shape as BENCH/scaling.py)."""
    G, Z = 4096, 50000
    cfg = SynthConfig(G=G, Z=Z)
    docs = build_docs(spark, cfg)
    meta = {r["raster_id"]: r.asDict()
            for r in eio.raster_meta_from_docs(docs).collect()}
    tiles = eio.tiles_from_docs(docs, "r0", meta["r0"]) \
        .repartition(128).persist()
    tiles.count()
    grid = cfg.grid_dict()
    grid["dtype"] = "float64"
    WQMAX = 512
    zx0 = f"((1103515245*id + 12345) % {4 * G - WQMAX}) / 4.0"
    zy0 = f"((214013*id + 2531011) % {4 * G - WQMAX}) / 4.0"
    zx1 = f"({zx0} + (128 + (69069*id + 7) % 384) / 4.0)"
    zy1 = f"({zy0} + (128 + (48271*id + 11) % 384) / 4.0)"
    wkt = (f"concat('POLYGON ((', {zx0}, ' ', {zy0}, ', ', {zx1}, ' ', {zy0}, ', ', "
           f"{zx1}, ' ', {zy1}, ', ', {zx0}, ' ', {zy1}, ', ', {zx0}, ' ', {zy0}, '))')")
    zones = spark.range(Z).selectExpr("concat('s', id) AS zone_id",
                                      wkt + " AS geometry")
    ext = ZonalExtractor(zones, tiles, grid=grid, strategy="broadcast")
    best = _best_of(lambda: ext.extract(["count", "sum", "mean", "min", "max"])
                    .write.format("noop").mode("overwrite").save())
    pairs = zone_tile_pairs(ext.zones_b, grid, cfg.tile)
    px = tiles.join(F.broadcast(pairs.select("zone_id", "tile_row", "tile_col")),
                    ["tile_row", "tile_col"]) \
        .select(F.sum(F.col("nrows") * F.col("ncols"))).first()[0]
    ext.close()
    tiles.unpersist()
    return {"sec": round(best, 3), "pixels": int(px), "zones": Z,
            "pixels_per_sec": round(px / best, 1),
            "polygons_per_sec": round(Z / best, 1)}


def scale_point_focal(spark):
    """Radius-2 focal statistics over a 4096² raster (16.8M cells,
    64-cell tiles): the halo-exchange stencil end to end — scatter
    strips, one tile-keyed shuffle, vectorized 5×5 window evaluation —
    in cells/s.  Also times the map-only 4× overview on the same
    tiles (zero-shuffle path)."""
    from exactextract_spark.focal import focal_stats
    from exactextract_spark.pyramid import overview

    G = 4096
    cfg = SynthConfig(G=G, Z=1)
    docs = build_docs(spark, cfg)
    meta = {r["raster_id"]: r.asDict()
            for r in eio.raster_meta_from_docs(docs).collect()}
    tiles = eio.tiles_from_docs(docs, "r0", meta["r0"]) \
        .repartition(128).persist()
    tiles.count()
    grid = cfg.grid_dict()
    out = {"cells": G * G}
    best = _best_of(lambda: focal_stats(tiles, radius=2, grid=grid)
                    .write.format("noop").mode("overwrite").save())
    out["focal_sec"] = round(best, 3)
    out["focal_cells_per_sec"] = round(G * G / best, 1)
    best = _best_of(lambda: overview(tiles, factor=4, grid=grid)
                    .write.format("noop").mode("overwrite").save())
    out["overview_sec"] = round(best, 3)
    out["overview_cells_per_sec"] = round(G * G / best, 1)
    tiles.unpersist()
    # raster-in -> raster-out at the production shape (4x the cells,
    # 256-cell tiles): per-tile Python/Arrow overhead amortizes — the
    # cells/s here is ~2x the 64-tile figure above
    from exactextract_spark.focal import focal_raster
    G2 = 8192
    cfg2 = SynthConfig(G=G2, Z=1, tile=256)
    docs2 = build_docs(spark, cfg2)
    meta2 = {r["raster_id"]: r.asDict()
             for r in eio.raster_meta_from_docs(docs2).collect()}
    tiles2 = eio.tiles_from_docs(docs2, "r0", meta2["r0"]) \
        .repartition(128).persist()
    tiles2.count()
    grid2 = cfg2.grid_dict()
    best = _best_of(lambda: focal_raster(tiles2, radius=2, grid=grid2)
                    .write.format("noop").mode("overwrite").save())
    out["raster_out_cells"] = G2 * G2
    out["raster_out_sec"] = round(best, 3)
    out["raster_out_cells_per_sec"] = round(G2 * G2 / best, 1)
    tiles2.unpersist()
    return out


def scale_point_subdivide(spark, cfg, tiles, grid):
    """Interior-dominated subdivide: 2000 ~30-cell-wide polygons →
    ~1M per-cell covered pieces with exact WKT.  Measures the
    vectorized interior/rect paths + Arrow WKT build (pieces/sec)."""
    from exactextract_spark.subdivide import subdivide

    stars = star_zones(spark, cfg, n=2000, verts=10)
    df = subdivide(stars, tiles, grid=grid)
    n = df.count()  # before the timed runs — counting re-executes the pipeline
    best = _best_of(lambda: df.write.format("noop").mode("overwrite").save())
    return {"sec": round(best, 3), "pieces": int(n),
            "pieces_per_sec": round(n / best, 1)}


def scale_point_subdivide_coast(spark, cfg, tiles, grid):
    """Boundary-dominated subdivide: 500 coastline zones (800 short
    edges each) — measures the batched left-hand-rings assembly on the
    shape where round 3 paid an O(edges) numpy scan per boundary
    cell."""
    from exactextract_spark.subdivide import subdivide

    coasts = coast_zones(spark, cfg)
    df = subdivide(coasts, tiles, grid=grid)
    n = df.count()
    best = _best_of(lambda: df.write.format("noop").mode("overwrite").save())
    return {"sec": round(best, 3), "pieces": int(n),
            "pieces_per_sec": round(n / best, 1)}


def scale_point_poly(spark, cfg, tiles, grid):
    """40k irregular 12-vertex polygons over the suite raster — the
    batched scanline path at polygon-heavy scale."""
    stars = star_zones(spark, cfg, n=40000)
    ext = ZonalExtractor(stars, tiles, grid=grid, strategy="broadcast")
    best = _best_of(lambda: ext.extract(["count", "sum", "mean", "min", "max"])
                    .write.format("noop").mode("overwrite").save())
    pairs = zone_tile_pairs(ext.zones_b, grid, cfg.tile)
    px = tiles.join(F.broadcast(pairs.select("zone_id", "tile_row", "tile_col")),
                    ["tile_row", "tile_col"]) \
        .select(F.sum(F.col("nrows") * F.col("ncols"))).first()[0]
    ext.close()
    return {"sec": round(best, 3), "pixels": int(px), "zones": 40000,
            "pixels_per_sec": round(px / best, 1),
            "polygons_per_sec": round(40000 / best, 1)}


def pipeline_point_minhash(spark):
    """Full MinHash near-dup pipeline (shingle -> 16-perm signature ->
    banded LSH join -> exact-Jaccard verify) over 1M synthetic 30-token
    documents with ~2% planted duplicates (id = 1 mod 50 reuses its
    predecessor's token seed) - the canonical 100 TB dedup shape,
    measured end to end in docs/s."""
    import shutil
    import tempfile

    from exactextract_spark.pipeline.dedup import minhash_verified_pairs

    n = 1_000_000
    base = tempfile.mkdtemp(prefix="ee_bench_mh_")
    seed = "CASE WHEN id % 50 = 1 THEN id - 1 ELSE id END"
    # token codes in the engine hash the first two characters + length
    # (text.TOKCODE) — vary the leading characters like natural words
    # or every token collides into a handful of codes and the LSH
    # buckets go hot (first-cut lesson: 'tokN' tokens made 40% of docs
    # share a band key)
    # non-affine per-(seed, i) code (murmur3): affine sequences make
    # aligned seed pairs share whole token RUNS -> quadratic candidates
    code = f"pmod(hash(CAST({seed} AS INT), i), 50021)"
    tok = (f"concat(char(97 + {code} % 26), char(97 + ({code} div 26) % 26),"
           f" 'w', CAST({code} AS STRING))")
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        f"concat_ws(' ', transform(sequence(0, 29), i -> {tok})) AS text",
        "'en' AS lang", "'synth' AS source") \
        .selectExpr("doc_id", "text", "lang", "source",
                    "length(text) AS n_chars")
    docs.write.mode("overwrite").parquet(base + "/documents.parquet")
    t0 = time.time()
    minhash_verified_pairs(spark, base) \
        .write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    shutil.rmtree(base, ignore_errors=True)
    return {"docs": n, "sec": round(dt, 3),
            "docs_per_sec": round(n / dt, 1)}


def pipeline_point_pack(spark):
    """Distributed prefix-sum sequence packing over 10M rows - one
    full-table exchange + per-block windows (pieces/s precedent:
    measures the layout primitive, not the text)."""
    import shutil
    import tempfile

    from exactextract_spark.pipeline.packing import pack_documents

    n = 10_000_000
    base = tempfile.mkdtemp(prefix="ee_bench_pk_")
    spark.range(n).selectExpr(
        "id AS doc_id", "CAST(100 + id % 900 AS BIGINT) AS n_chars",
        "'' AS text", "'en' AS lang", "'synth' AS source") \
        .write.mode("overwrite").parquet(base + "/documents.parquet")
    t0 = time.time()
    pack_documents(spark, base) \
        .write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    shutil.rmtree(base, ignore_errors=True)
    return {"docs": n, "sec": round(dt, 3),
            "docs_per_sec": round(n / dt, 1)}


def pipeline_point_asof(spark):
    """AS-OF + trailing-window range join over 10M synthetic events
    (100k users, 30 days): the two temporal joins Spark lacks, each
    measured end to end in events/s on the same fixture.  as-of = one
    keyed window over the tagged union; range = bucketized equi-join
    (<=2x probe fan-out)."""
    import shutil
    import tempfile

    from exactextract_spark.pipeline.events_join import (event_asof_join,
                                                         event_range_join)

    n = 10_000_000
    base = tempfile.mkdtemp(prefix="ee_bench_asof_")
    spark.range(n).selectExpr(
        "id AS event_id",
        "timestamp_micros(1704067200000000"
        " + (id * 2654435761) % 2592000000000) AS ts",
        "id % 100000 AS user_id",
        "element_at(array('click','purchase','view','signup','error'),"
        " CAST(id % 5 AS INT) + 1) AS event_type",
        "CAST((id * 7) % 1000 AS DOUBLE) / 10 AS value",
        "'{}' AS props") \
        .write.mode("overwrite").parquet(base + "/events.parquet")
    out = {"events": n}
    t0 = time.time()
    event_asof_join(spark, base).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    out["asof_sec"] = round(dt, 3)
    out["asof_events_per_sec"] = round(n / dt, 1)
    t0 = time.time()
    event_range_join(spark, base).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    out["range_sec"] = round(dt, 3)
    out["range_events_per_sec"] = round(n / dt, 1)
    # session-5 event analytics on the same 10M-event fixture: the
    # one-exchange funnel and the RANGE-frame rolling features
    from exactextract_spark.pipeline.events_analytics import (
        event_funnel, user_rolling_features)
    t0 = time.time()
    event_funnel(spark, base).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    out["funnel_sec"] = round(dt, 3)
    out["funnel_events_per_sec"] = round(n / dt, 1)
    t0 = time.time()
    user_rolling_features(spark, base) \
        .write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    out["rolling_sec"] = round(dt, 3)
    out["rolling_events_per_sec"] = round(n / dt, 1)
    shutil.rmtree(base, ignore_errors=True)
    return out


def pipeline_point_stream(spark):
    """Watermarked event-time rollup as a stream (availableNow, 4
    micro-batches over 4 files): 1M synthetic events with ~5% arriving
    one file late - throughput of the keyed-state exchange in events/s.
    Stateful-streaming scale evidence to pair with the batch points."""
    import shutil
    import tempfile

    from exactextract_spark.pipeline.streaming_events import (
        stream_windowed_rollup)

    n = 1_000_000
    base = tempfile.mkdtemp(prefix="ee_bench_st_")
    indir = base + "/in"
    os.makedirs(indir)
    # file f = day f, chronological (each availableNow micro-batch
    # advances the watermark one day and finalizes the previous day's
    # windows); distinct mtimes pin the batch order
    for f in range(4):
        spark.range(f * (n // 4), (f + 1) * (n // 4)).selectExpr(
            "id AS event_id",
            f"timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0,"
            f" {f}, 0, CAST(id % 1440 AS INT), 0) AS ts",
            "id % 9973 AS user_id",
            "CASE id % 3 WHEN 0 THEN 'view' WHEN 1 THEN 'click'"
            " ELSE 'buy' END AS event_type",
            "CAST(id % 100 AS DOUBLE) AS value",
            "'{}' AS props") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{indir}/f{f}.parquet")
        t = 1_700_000_000 + f * 7
        for root, _, files in os.walk(f"{indir}/f{f}.parquet"):
            for fn in files:
                os.utime(os.path.join(root, fn), (t, t))
    t0 = time.time()
    stream_windowed_rollup(spark, indir + "/f*.parquet", base + "/out",
                           base + "/ckpt", delay="1 day")
    dt = time.time() - t0
    out_rows = spark.read.parquet(base + "/out").count()
    shutil.rmtree(base, ignore_errors=True)
    return {"events": n, "sec": round(dt, 3), "emitted_windows": out_rows,
            "events_per_sec": round(n / dt, 1)}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    gmult = float(os.environ.get("SPARK_GRAFT_BENCH_GMULT", "2.0"))

    try:
        # bench-noise protocol (BENCH/BASELINE.md): runs taken at load
        # >2 on this shared host are contaminated — record the load so
        # cross-round comparisons can discard them
        load_start = tuple(round(v, 2) for v in os.getloadavg())
    except OSError:
        load_start = None

    cfg0 = SynthConfig.from_sf_dir(sf_dir)
    cfg = SynthConfig(G=int(cfg0.G * gmult), Z=cfg0.Z * 2, tile=cfg0.tile)

    spark = get_spark(app="exactextract-bench", cores=cores,
                      shuffle_partitions=cores)
    try:
        docs = build_docs(spark, cfg)
        zones = eio.zones_from_docs(docs)
        meta = {r["raster_id"]: r.asDict()
                for r in eio.raster_meta_from_docs(docs).collect()}
        tiles = eio.tiles_from_docs(docs, "r0", meta["r0"]).repartition(cores).persist()
        wtiles = eio.tiles_from_docs(docs, "w0", meta["w0"]).repartition(cores).persist()
        n_tiles = tiles.count()
        wtiles.count()
        grid = cfg.grid_dict()
        grid["dtype"] = "float64"

        zones_all = zones.unionByName(
            big_zones(spark, cfg).withColumn("props", F.lit(None).cast("map<string,string>")))

        # pixels touched per full run = sum of tile cells over joined pairs
        pairs = zone_tile_pairs(attach_bbox(zones_all), grid, cfg.tile)
        joined = tiles.join(F.broadcast(pairs.select("zone_id", "tile_row", "tile_col")),
                            ["tile_row", "tile_col"])
        px = joined.select(F.sum(F.col("nrows") * F.col("ncols"))).first()[0]
        n_zones = zones_all.count()

        # one extractor reused across the suite queries; persist_joined
        # materializes the tile⋈zone-list join once so repeated
        # extract() calls measure kernel+agg, not join rebuild
        ext = ZonalExtractor(zones_all, tiles, grid=grid, strategy="broadcast",
                             persist_joined=True)
        ext_w = ZonalExtractor(zones_all, tiles, weight_tiles=wtiles,
                               grid=grid, strategy="broadcast",
                               persist_joined=True)

        timings = {}
        timings_cold = {}

        def bench(name, fn):
            # first run includes python-worker/codegen warmup; report the
            # best of the following two runs (host timing noise is ~2x)
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            timings_cold[name] = round(time.time() - t0, 3)
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            timings[name] = round(best, 3)

        # one untimed warmup to spin up python workers / codegen
        ext.extract(["count"]).write.format("noop").mode("overwrite").save()

        bench("q_basic", lambda: ext.extract(["count", "sum", "mean", "min", "max"]))
        bench("q_weighted", lambda: ext_w.extract(["weighted_mean", "weighted_sum"]))
        bench("q_hist", lambda: ext.extract(["variety", "majority", "median"]))
        bench("q_variance", lambda: ext.extract(["variance", "stdev"]))
        bench("q_tile_assignment",
              lambda: zone_tile_pairs(attach_bbox(zones_all), grid, cfg.tile)
              .select("zone_id", "tile_row", "tile_col"))

        stars = star_zones(spark, cfg)
        ext_p = ZonalExtractor(stars, tiles, grid=grid, strategy="broadcast")
        bench("q_polygons", lambda: ext_p.extract(
            ["count", "sum", "mean", "min", "max"]))

        # --- compute-dominated scale points (the sf0.1 suite is fixed-
        # cost dominated at ~15M px/run; these make px/s comparable to
        # the reference's 1.3e8 px/s single-node figure).  Suite caches
        # are released first so the scale points measure the engine,
        # not eviction/GC pressure from the persisted suite joins. ---
        scale_points = {}
        if os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1") == "1":
            ext.close()
            ext_w.close()
            ext_p.close()
            wtiles.unpersist()
            scale_points["poly_40k"] = scale_point_poly(spark, cfg, tiles, grid)
            scale_points["subdivide_1m"] = scale_point_subdivide(spark, cfg, tiles, grid)
            scale_points["subdivide_coast"] = scale_point_subdivide_coast(spark, cfg, tiles, grid)
            tiles.unpersist()
            scale_points["rect_1e9"] = scale_point_rect(spark)
            scale_points["focal_17m"] = scale_point_focal(spark)

        # --- training-pipeline scale points (synthetic inputs; sf-
        # independent; reported under their own key so the headline
        # suite wall stays comparable round over round) ---
        pipeline_points = {}
        if os.environ.get("SPARK_GRAFT_BENCH_PIPELINE", "1") == "1":
            pipeline_points["minhash_1m"] = pipeline_point_minhash(spark)
            pipeline_points["pack_10m"] = pipeline_point_pack(spark)
            pipeline_points["stream_1m"] = pipeline_point_stream(spark)
            pipeline_points["asof_10m"] = pipeline_point_asof(spark)

        total = round(sum(timings.values()), 3)
        try:
            load = tuple(round(v, 2) for v in os.getloadavg())
        except OSError:
            load = None
        out = {
            "metric": "zonal-stats suite wall time",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "host_load_start": load_start,
            "host_load_end": load,
            "sf": sf_dir,
            "config": {"grid_cells": cfg.G * cfg.G, "zones": n_zones,
                       "tiles": n_tiles, "cores": cores,
                       "pixels_per_run": int(px)},
            "queries_cold": timings_cold,
            "polygons_per_sec": round(n_zones / timings["q_basic"], 2),
            "pixels_per_sec": round(px / timings["q_basic"], 1),
            "scale_points": scale_points,
            "pipeline_points": pipeline_points,
        }
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
