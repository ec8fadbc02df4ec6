"""Spatial-join primitives beyond zonal stats (BASELINE north rule:
"spatial-join + tiling engine (H3/S2 index, point-in-polygon, kNN,
raster↔vector)"):

- point_in_polygon: points ⋈ zones.  Candidate pruning is a bbox
  equi-range join on the grid-tile key space (the same index the zonal
  join uses); the exact test is a vectorized even-odd ray cast in an
  Arrow kernel (the reference's analog is GEOSPreparedContainsXY inside
  the flood fill, floodfill.cpp:38-50).
- knn_tiles: k nearest raster tiles to each query point by tile-center
  distance — pure JVM expressions (candidate ring explode + window
  rank), no UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from .extract import attach_bbox, zone_tile_pairs
from .geom import Geometry, parse_wkt

__all__ = ["point_in_polygon", "knn_tiles", "points_in_geom"]


def points_in_geom(geom: Geometry, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast (areal geometries; holes handled by
    parity across all rings)."""
    inside = np.zeros(xs.shape, dtype=bool)
    for ring in geom.rings:
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        for i in range(x0.size):
            a0, b0, a1, b1 = x0[i], y0[i], x1[i], y1[i]
            if b0 == b1:
                continue
            crosses = ((b0 > ys) != (b1 > ys)) & \
                      (xs < (a1 - a0) * (ys - b0) / (b1 - b0) + a0)
            inside ^= crosses
    return inside


BROADCAST_ZONE_LIMIT = 200_000


def point_in_polygon(points: DataFrame, zones: DataFrame, *,
                     grid: dict | None = None, tile: int | None = None,
                     broadcast_limit: int = BROADCAST_ZONE_LIMIT) -> DataFrame:
    """(point_id, x, y) ⋈ zones(zone_id, geometry WKT) → one row per
    containing (point, zone) pair (strict-interior even-odd test).

    Scale shape: candidate pruning is an EQUI-join on the containing
    tile key — each point maps to exactly one tile, each zone bbox
    explodes to its covered tile range (zone_tile_pairs), and Spark
    hash-joins on (tile_row, tile_col); never a bbox range condition
    (which would plan as BroadcastNestedLoopJoin, O(points × zones)).
    Below ``broadcast_limit`` zones the exploded zone side is broadcast
    and geometries ride a SparkContext broadcast dict; above it the
    join shuffles both sides by tile key and geometry WKT travels in
    the join (AQE handles skewed tiles).

    ``grid``/``tile``: optional tile lattice (same dict shape as the
    zonal grid); defaults to a ~sqrt(n_zones)-per-side lattice over the
    zones' bounding box."""
    import math

    spark = zones.sparkSession
    zb = attach_bbox(zones)
    n_zones = zb.count()
    if grid is not None:
        t = int(tile or grid.get("tile") or 64)
        gx, gy = float(grid["grid_xmin"]), float(grid["grid_ymax"])
        tw, th = float(grid["dx"]) * t, float(grid["dy"]) * t
        ntr = (int(grid["grid_nrows"]) + t - 1) // t
        ntc = (int(grid["grid_ncols"]) + t - 1) // t
    else:
        b = zb.agg(F.min("xmin"), F.min("ymin"),
                   F.max("xmax"), F.max("ymax")).first()
        x0, y0, x1, y1 = (float(v) for v in b)
        side = max(1, int(math.sqrt(max(n_zones, 1))))
        tw = max((x1 - x0) / side, 1e-12)
        th = max((y1 - y0) / side, 1e-12)
        gx, gy, ntr, ntc = x0, y1, side, side
    lattice = dict(grid_xmin=gx, grid_ymax=gy, dx=tw, dy=th,
                   grid_nrows=ntr, grid_ncols=ntc)

    broadcast_zones = n_zones <= broadcast_limit
    cols = ["zone_id", "xmin", "ymin", "xmax", "ymax"] + \
        ([] if broadcast_zones else ["geometry"])
    zpairs = zone_tile_pairs(zb.select(*dict.fromkeys(cols + ["geometry"])),
                             lattice, 1).select(*cols, "tile_row", "tile_col")
    lookup = None
    if broadcast_zones:
        geoms = {r["zone_id"]: r["geometry"]
                 for r in zb.select("zone_id", "geometry").collect()}
        lookup = spark.sparkContext.broadcast(geoms)
        zpairs = F.broadcast(zpairs)

    p = points.withColumn(
        "tile_row", F.floor((F.lit(gy) - F.col("y")) / th).cast("int")) \
        .withColumn("tile_col", F.floor((F.col("x") - gx) / tw).cast("int"))
    cand = p.join(zpairs, ["tile_row", "tile_col"]) \
        .where((F.col("x") >= F.col("xmin")) & (F.col("x") <= F.col("xmax")) &
               (F.col("y") >= F.col("ymin")) & (F.col("y") <= F.col("ymax"))) \
        .select("point_id", "x", "y", "zone_id",
                *([] if broadcast_zones else ["geometry"]))

    schema = T.StructType([
        T.StructField("point_id", T.LongType()),
        T.StructField("zone_id", T.StringType()),
    ])

    def kernel(batches):
        cache: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_pid, out_zid = [], []
            for zid, grp in pdf.groupby("zone_id", sort=False):
                geom = cache.get(zid)
                if geom is None:
                    wkt = lookup.value[zid] if lookup is not None \
                        else grp["geometry"].iloc[0]
                    if len(cache) > 65536:
                        cache.clear()
                    geom = cache[zid] = parse_wkt(wkt)
                ins = points_in_geom(geom, grp["x"].to_numpy(), grp["y"].to_numpy())
                out_pid.extend(grp["point_id"].to_numpy()[ins])
                out_zid.extend([zid] * int(ins.sum()))
            yield pd.DataFrame({"point_id": out_pid, "zone_id": out_zid})

    return cand.mapInPandas(kernel, schema=schema)


def knn_tiles(points: DataFrame, grid: dict, *, k: int = 4,
              tile: int | None = None) -> DataFrame:
    """k nearest tiles (by tile-center euclidean distance) for each
    (point_id, x, y) row.  Candidate ring around the containing tile is
    exploded JVM-side; guaranteed superset for the k within bounds."""
    tile = tile or grid.get("tile") or 64
    gx, gy = float(grid["grid_xmin"]), float(grid["grid_ymax"])
    dx, dy = float(grid["dx"]), float(grid["dy"])
    ntr = (int(grid["grid_nrows"]) + tile - 1) // tile
    ntc = (int(grid["grid_ncols"]) + tile - 1) // tile
    tw, th = dx * tile, dy * tile
    # candidate ring radius: sqrt(k)+1 suffices on a roomy 2-D lattice,
    # but a thin grid (e.g. a single tile row) needs up to k tiles along
    # one axis — take the max so the ring is a guaranteed superset
    r = max(int(np.ceil(np.sqrt(k))) + 1, int(k))

    p = points.withColumn("_tr", F.floor((gy - F.col("y")) / th).cast("int")) \
              .withColumn("_tc", F.floor((F.col("x") - gx) / tw).cast("int"))
    p = p.withColumn("tile_row", F.explode(F.sequence(
            F.greatest(F.lit(0), F.col("_tr") - r),
            F.least(F.lit(ntr - 1), F.col("_tr") + r)))) \
         .withColumn("tile_col", F.explode(F.sequence(
            F.greatest(F.lit(0), F.col("_tc") - r),
            F.least(F.lit(ntc - 1), F.col("_tc") + r))))
    cx = gx + (F.col("tile_col") + F.lit(0.5)) * tw
    cy = gy - (F.col("tile_row") + F.lit(0.5)) * th
    p = p.withColumn("dist2", (F.col("x") - cx) * (F.col("x") - cx) +
                              (F.col("y") - cy) * (F.col("y") - cy))
    w = Window.partitionBy("point_id").orderBy(
        F.asc("dist2"), F.asc("tile_row"), F.asc("tile_col"))
    return (p.withColumn("rank", F.row_number().over(w))
             .where(F.col("rank") <= k)
             .select("point_id", "tile_row", "tile_col",
                     F.col("rank").cast("int").alias("rank"), "dist2"))
