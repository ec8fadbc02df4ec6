"""Raster overviews: block-aggregate pyramid levels (gdaladdo -r average).

Every raster pipeline that serves tiles or runs multi-resolution
analysis materializes overviews — the f×f block aggregation of a level
into the next (GDAL ``gdaladdo``, COG overview levels, the reference's
RasterView disaggregation in reverse: regrid.py goes fine→coarse for
WEIGHTS by replication; this goes fine→coarse for VALUES by block
statistics).

Distributed shape: when ``factor`` divides the tile size, every coarse
block lies inside exactly one tile, so the whole computation is
**map-only — zero shuffles, zero Exchange in the plan** (asserted in
tests): one Arrow ``mapInPandas`` decodes, block-reduces with a
reshape, and emits either coarse-cell rows or re-encoded coarse tiles.
A factor that does not divide the tile size would put one coarse block
across up to four tiles; rather than silently paying a hidden shuffle,
``overview`` rejects it — re-tile first (the halo machinery in
focal.py is the general answer for cross-tile windows).

Exactness: block sums are ≤ f² small-magnitude doubles (exact for the
integer-valued fixtures under any fold order), count is an integer,
min/max are order-free, mean is one correctly-rounded division —
bit-identical to the DuckDB ``GROUP BY r//f, c//f`` oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

__all__ = ["overview", "overview_tiles", "coarse_grid",
           "raster_histogram"]

_OV_SCHEMA = T.StructType([
    T.StructField("ov_r", T.IntegerType()),
    T.StructField("ov_c", T.IntegerType()),
    T.StructField("n", T.LongType()),
    T.StructField("sum", T.DoubleType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("min", T.DoubleType()),
    T.StructField("max", T.DoubleType()),
])


def coarse_grid(grid: dict, factor: int) -> dict:
    """Grid dict of the overview level: f× larger cells, ceil-divided
    dimensions, same extent origin."""
    f = int(factor)
    out = dict(grid_xmin=float(grid["grid_xmin"]),
               grid_ymax=float(grid["grid_ymax"]),
               dx=float(grid["dx"]) * f, dy=float(grid["dy"]) * f,
               grid_nrows=-(-int(grid["grid_nrows"]) // f),
               grid_ncols=-(-int(grid["grid_ncols"]) // f))
    # propagate the stride only when the source grid declares it —
    # consumers that need one infer or raise (grid.infer_tile_size)
    if grid.get("tile"):
        out["tile"] = int(grid["tile"])
    return out


def _block_reduce(arr: np.ndarray, f: int):
    """Pad to a multiple of f with NaN, reshape to (R, f, C, f) blocks,
    return per-block (n, sum, mean, min, max)."""
    nr, nc = arr.shape
    R, C = -(-nr // f), -(-nc // f)
    pad = np.full((R * f, C * f), np.nan)
    pad[:nr, :nc] = arr
    blocks = pad.reshape(R, f, C, f).transpose(0, 2, 1, 3)
    valid = ~np.isnan(blocks)
    n = valid.sum(axis=(2, 3)).astype(np.int64)
    s = np.where(valid, blocks, 0.0).sum(axis=(2, 3))
    mn = np.where(valid, blocks, np.inf).min(axis=(2, 3))
    mx = np.where(valid, blocks, -np.inf).max(axis=(2, 3))
    empty = n == 0
    s = np.where(empty, np.nan, s)
    mean = np.where(empty, np.nan, s / np.maximum(n, 1))
    mn = np.where(empty, np.nan, mn)
    mx = np.where(empty, np.nan, mx)
    return n, s, mean, mn, mx


def overview(tiles: DataFrame, factor: int = 4, *,
             grid: dict | None = None) -> DataFrame:
    """Coarse-cell statistics of the f×f block aggregation: one row per
    coarse cell — ``(ov_r, ov_c, n, sum, mean, min, max)`` over the
    block's defined (non-nodata) cells; all-nodata blocks keep the row
    with n=0 and NULL stats.  Map-only (no shuffle) — see module doc."""
    from .focal import _decode_masked

    f = int(factor)
    if grid is None:
        grid = tiles.select("grid_xmin", "grid_ymax", "dx", "dy",
                            "grid_nrows", "grid_ncols").first().asDict()
    from .grid import infer_tile_size
    tile = infer_tile_size(grid, tiles)
    if f < 2:
        raise ValueError(f"factor must be >= 2, got {factor}")
    if tile % f != 0:
        raise ValueError(
            f"factor {f} does not divide tile size {tile}: a coarse "
            f"block would span tiles — re-tile the raster first")

    cols = ["tile_row", "tile_col", "row0", "col0", "nrows", "ncols",
            "values", "dtype"]
    if "nodata" in tiles.columns:
        cols.append("nodata")

    def reduce_tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                arr = _decode_masked(row)
                n, s, mean, mn, mx = _block_reduce(arr, f)
                R, C = n.shape
                # row0/col0 are tile-aligned and f | tile, so the
                # block origin maps exactly onto the coarse grid
                orr = int(row.row0) // f
                occ = int(row.col0) // f
                rr = np.arange(orr, orr + R, dtype=np.int64)[:, None]
                cc = np.arange(occ, occ + C, dtype=np.int64)[None, :]
                frames.append(pd.DataFrame({
                    "ov_r": np.broadcast_to(rr, (R, C)).ravel().astype(np.int32),
                    "ov_c": np.broadcast_to(cc, (R, C)).ravel().astype(np.int32),
                    "n": n.ravel(),
                    "sum": s.ravel(),
                    "mean": mean.ravel(),
                    "min": mn.ravel(),
                    "max": mx.ravel(),
                }))
            yield pd.concat(frames) if frames else \
                pd.DataFrame(columns=[x.name for x in _OV_SCHEMA])

    return tiles.select(*cols).mapInPandas(reduce_tiles, schema=_OV_SCHEMA)


def overview_tiles(ov: DataFrame, grid: dict, factor: int = 4, *,
                   column: str = "mean",
                   raster_id: str = "overview") -> DataFrame:
    """Materialize an overview level as a first-class tile table on the
    coarse grid, ready for ``exact_extract`` or another ``overview``
    pass (pyramid chaining).  Undefined coarse cells (all-nodata
    blocks) become NaN, which the kernel masks."""
    from pyspark.sql import functions as F

    from .rasterize import burn_to_tiles

    cg = coarse_grid(grid, factor)
    named = ov.select(
        F.col("ov_r").cast("long").alias("r"),
        F.col("ov_c").cast("long").alias("c"),
        F.coalesce(F.col(column).cast("double"),
                   F.lit(float("nan"))).alias("burn"))
    return burn_to_tiles(named, cg, raster_id=raster_id, column="burn")


_HIST_SCHEMA = T.StructType([
    T.StructField("value", T.DoubleType()),
    T.StructField("n", T.LongType()),
])


def raster_histogram(tiles: DataFrame, *, grid: dict | None = None
                     ) -> DataFrame:
    """Global value histogram of the raster (``gdalinfo -hist``): one
    row per distinct defined value with its cell count.  Each tile
    bincounts locally (``np.unique`` inside the map stage), so the
    shuffle carries one compact (value, count) row per distinct value
    per tile — for categorical/integer rasters that is ~|domain| rows
    per tile regardless of tile size, then one tiny hash aggregate."""
    from .focal import _decode_masked

    cols = ["tile_row", "tile_col", "row0", "col0", "nrows", "ncols",
            "values", "dtype"]
    if "nodata" in tiles.columns:
        cols.append("nodata")

    def local_hist(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                arr = _decode_masked(row)
                v = arr[~np.isnan(arr)]
                if v.size == 0:
                    continue
                uniq, cnt = np.unique(v, return_counts=True)
                frames.append(pd.DataFrame(
                    {"value": uniq, "n": cnt.astype(np.int64)}))
            yield pd.concat(frames) if frames else \
                pd.DataFrame({"value": pd.Series(dtype="float64"),
                              "n": pd.Series(dtype="int64")})

    from pyspark.sql import functions as F
    return (tiles.select(*cols)
            .mapInPandas(local_hist, schema=_HIST_SCHEMA)
            .groupBy("value").agg(F.sum("n").alias("n")))
