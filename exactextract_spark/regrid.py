"""Raster regridding: consume a coarser raster on a finer grid.

The reference reads value/weight rasters of different resolutions
through ``RasterView`` — lazy integer-factor disaggregation onto the
common (finer) grid (/root/reference/src/raster.h:327-395; grid
compatibility rules grid.h:240-305).  Spark-side, the same semantics
become a tile-level operator: each fine-grid tile equi-joins the single
coarse tile covering it ((tr*T)//f // T — exact under shared origin and
equal tile size), and a mapInPandas kernel fancy-indexes the coarse
block with the RasterView index arithmetic (raster.h:365-386:
src_index = floor(dst_index / factor)).

v1 constraints (validated): shared origin, integer resolution factor,
same tile size in cells.  Finer→coarser (aggregation) is out of scope,
as in the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .io import decode_tile, encode_tile

__all__ = ["regrid_to"]


def regrid_to(coarse_tiles: DataFrame, fine_grid: dict, *, tile: int = 64) -> DataFrame:
    """Disaggregate a coarse tile table onto ``fine_grid``'s tiling.
    Returns a standard tile table usable as value or weight tiles."""
    spark = coarse_tiles.sparkSession
    meta = coarse_tiles.select("grid_xmin", "grid_ymax", "dx", "dy", "dtype",
                               "nodata", "grid_nrows", "grid_ncols").first().asDict()
    fdx = meta["dx"] / fine_grid["dx"]
    fdy = meta["dy"] / fine_grid["dy"]
    f = int(round(fdy))
    if abs(fdx - round(fdx)) > 1e-9 or abs(fdy - round(fdy)) > 1e-9 or round(fdx) != f or f < 1:
        raise ValueError(f"incompatible grids: resolution factor must be a "
                         f"positive integer (got dx x{fdx}, dy x{fdy})")
    if abs(meta["grid_xmin"] - fine_grid["grid_xmin"]) > 1e-9 * fine_grid["dx"] or \
       abs(meta["grid_ymax"] - fine_grid["grid_ymax"]) > 1e-9 * fine_grid["dy"]:
        raise ValueError("incompatible grids: origins must coincide")

    g_nrows, g_ncols = int(fine_grid["grid_nrows"]), int(fine_grid["grid_ncols"])
    ntr = (g_nrows + tile - 1) // tile
    ntc = (g_ncols + tile - 1) // tile

    targets = (spark.range(ntr * ntc)
               .select((F.col("id") / ntc).cast("int").alias("tile_row"),
                       (F.col("id") % ntc).cast("int").alias("tile_col"))
               .withColumn("row0", F.col("tile_row") * tile)
               .withColumn("col0", F.col("tile_col") * tile)
               .withColumn("nrows", F.least(F.lit(tile), F.lit(g_nrows) - F.col("row0")))
               .withColumn("ncols", F.least(F.lit(tile), F.lit(g_ncols) - F.col("col0")))
               .withColumn("_wtr", ((F.col("tile_row") * tile).cast("long") / f / tile).cast("int"))
               .withColumn("_wtc", ((F.col("tile_col") * tile).cast("long") / f / tile).cast("int")))

    src = coarse_tiles.select(
        F.col("tile_row").alias("_wtr"), F.col("tile_col").alias("_wtc"),
        F.col("row0").alias("_srow0"), F.col("col0").alias("_scol0"),
        F.col("values").alias("_svalues"))
    j = targets.join(src, ["_wtr", "_wtc"])

    dtype = meta["dtype"]

    def run(batches):
        for pdf in batches:
            out = []
            for r in pdf.to_dict("records"):
                snr = min(tile, meta["grid_nrows"] - r["_srow0"])
                snc = min(tile, meta["grid_ncols"] - r["_scol0"])
                block = decode_tile(r["_svalues"], dtype, snr, snc)
                rows = (np.arange(r["row0"], r["row0"] + r["nrows"]) // f) - r["_srow0"]
                cols = (np.arange(r["col0"], r["col0"] + r["ncols"]) // f) - r["_scol0"]
                fine = block[np.ix_(rows, cols)]
                out.append(dict(raster_id="regrid", band=0,
                                tile_row=r["tile_row"], tile_col=r["tile_col"],
                                row0=r["row0"], col0=r["col0"],
                                nrows=r["nrows"], ncols=r["ncols"],
                                values=encode_tile(fine)))
            yield pd.DataFrame(out) if out else pd.DataFrame(
                columns=["raster_id", "band", "tile_row", "tile_col", "row0",
                         "col0", "nrows", "ncols", "values"])

    schema = T.StructType([
        T.StructField("raster_id", T.StringType()), T.StructField("band", T.IntegerType()),
        T.StructField("tile_row", T.IntegerType()), T.StructField("tile_col", T.IntegerType()),
        T.StructField("row0", T.IntegerType()), T.StructField("col0", T.IntegerType()),
        T.StructField("nrows", T.IntegerType()), T.StructField("ncols", T.IntegerType()),
        T.StructField("values", T.BinaryType()),
    ])
    out = j.mapInPandas(run, schema=schema)
    return (out.withColumn("grid_xmin", F.lit(float(fine_grid["grid_xmin"])))
               .withColumn("grid_ymax", F.lit(float(fine_grid["grid_ymax"])))
               .withColumn("dx", F.lit(float(fine_grid["dx"])))
               .withColumn("dy", F.lit(float(fine_grid["dy"])))
               .withColumn("grid_nrows", F.lit(g_nrows))
               .withColumn("grid_ncols", F.lit(g_ncols))
               .withColumn("dtype", F.lit(dtype))
               .withColumn("nodata", F.lit(meta["nodata"]).cast("double")))
