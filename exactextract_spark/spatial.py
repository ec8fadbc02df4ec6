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

from .extract import attach_bbox
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


def point_in_polygon(points: DataFrame, zones: DataFrame) -> DataFrame:
    """(point_id, x, y) ⋈ zones(zone_id, geometry WKT) → one row per
    containing (point, zone) pair.

    Scale shape: zones (bbox + geometry) broadcast; points stream.  For
    zone tables beyond broadcast size, pre-bucket both sides on the
    quadkey of the containing tile (tiling.quadkey) and equi-join on it
    before the exact test — same pattern as the zonal tile join."""
    spark = zones.sparkSession
    zb = attach_bbox(zones)
    geoms = {r["zone_id"]: r["geometry"]
             for r in zb.select("zone_id", "geometry").collect()}
    lookup = spark.sparkContext.broadcast(geoms)

    cand = points.join(
        F.broadcast(zb.select("zone_id", "xmin", "ymin", "xmax", "ymax")),
        (F.col("x") >= F.col("xmin")) & (F.col("x") <= F.col("xmax")) &
        (F.col("y") >= F.col("ymin")) & (F.col("y") <= F.col("ymax"))) \
        .select("point_id", "x", "y", "zone_id")

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
                    geom = cache[zid] = parse_wkt(lookup.value[zid])
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
    r = int(np.ceil(np.sqrt(k))) + 1  # candidate ring radius in tiles

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
