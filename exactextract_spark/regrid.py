"""Raster regridding: consume a coarser raster on a finer grid.

The reference reads value/weight rasters of different resolutions
through ``RasterView`` — lazy integer-factor disaggregation onto the
common (finer) grid (/root/reference/src/raster.h:327-395), with grid
compatibility defined in grid.h:240-305: resolutions must be integer
multiples and the origins must differ by integer multiples of the finer
resolution.  Spark-side the same semantics become a relational op:

1. every fine-grid target tile computes the (≤ 2×2) coarse tiles its
   window reads from (pure JVM expressions: the RasterView index
   arithmetic src = floor((off + dst) / f) applied to the window
   corners);
2. an equi-join on the coarse tile key ships each coarse payload to the
   targets that need it (a coarse tile fans out to ~ (f·T_f/T_c)² fine
   tiles — Spark's join handles the duplication);
3. groupBy(target tile) + applyInPandas assembles each fine block by
   fancy-indexing the collected coarse blocks.

Fine cells that map outside the coarse extent become nodata (or NaN for
float rasters) — they behave as missing values/weights downstream,
matching the reference's treatment of out-of-extent reads.

``ZonalExtractor`` calls this automatically when a weight raster's grid
differs from the value grid (python exact_extract does the same
implicitly via common_grid, exact_extract.py + grid.h:278-305), so the
canonical population-weighting case (coarse weights × fine values)
needs no manual step.  Finer→coarser (aggregation) is out of scope, as
in the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .io import decode_tile, encode_tile

__all__ = ["regrid_to", "grids_equal"]

_GRID_KEYS = ("grid_xmin", "grid_ymax", "dx", "dy", "grid_nrows", "grid_ncols")


def grids_equal(a: dict, b: dict, tol: float = 1e-9) -> bool:
    return all(abs(float(a[k]) - float(b[k])) <= tol * max(1.0, abs(float(a[k])))
               for k in _GRID_KEYS)


def _int_or_raise(x: float, what: str) -> int:
    r = int(round(x))
    if abs(x - r) > 1e-9:
        # reference wording: Grid::common_grid throws "Incompatible
        # extents." (grid.h:278-282)
        raise ValueError(f"Incompatible extents: {what} must be an integer "
                         f"(got {x!r})")
    return r


def regrid_to(coarse_tiles: DataFrame, fine_grid: dict, *,
              tile: int = 64) -> DataFrame:
    """Disaggregate a coarse tile table onto ``fine_grid``'s tiling.
    Returns a standard tile table usable as value or weight tiles.

    Compatibility (reference grid.h:240-305): the coarse resolution must
    be a positive integer multiple of the fine resolution on both axes,
    and the origins must differ by integer multiples of the fine
    resolution.  Tile sizes of the two tables are independent."""
    meta = coarse_tiles.select("grid_xmin", "grid_ymax", "dx", "dy", "dtype",
                               "nodata", "grid_nrows", "grid_ncols").first().asDict()
    fdx, fdy = float(fine_grid["dx"]), float(fine_grid["dy"])
    f_c = _int_or_raise(meta["dx"] / fdx, "x resolution factor")
    f_r = _int_or_raise(meta["dy"] / fdy, "y resolution factor")
    if f_c < 1 or f_r < 1:
        raise ValueError("incompatible grids: coarse resolution must be a "
                         "positive integer multiple of the fine resolution")
    # origin offsets in fine cells (may be negative; reference allows
    # any integer offset, raster.h:345-360)
    off_c = _int_or_raise((float(fine_grid["grid_xmin"]) - meta["grid_xmin"]) / fdx,
                          "x origin offset in fine cells")
    off_r = _int_or_raise((meta["grid_ymax"] - float(fine_grid["grid_ymax"])) / fdy,
                          "y origin offset in fine cells")

    g_nrows, g_ncols = int(fine_grid["grid_nrows"]), int(fine_grid["grid_ncols"])
    s_nrows, s_ncols = int(meta["grid_nrows"]), int(meta["grid_ncols"])
    ntr = (g_nrows + tile - 1) // tile
    ntc = (g_ncols + tile - 1) // tile
    tc_size = coarse_tiles.select(
        F.max(F.greatest("nrows", "ncols"))).first()[0]

    spark = coarse_tiles.sparkSession
    targets = (spark.range(ntr * ntc)
               .select((F.col("id") / ntc).cast("int").alias("tile_row"),
                       (F.col("id") % ntc).cast("int").alias("tile_col"))
               .withColumn("row0", F.col("tile_row") * tile)
               .withColumn("col0", F.col("tile_col") * tile)
               .withColumn("nrows", F.least(F.lit(tile), F.lit(g_nrows) - F.col("row0")))
               .withColumn("ncols", F.least(F.lit(tile), F.lit(g_ncols) - F.col("col0"))))
    # coarse rows/cols read by this window (floor div handles negatives)
    sr0 = F.floor((F.col("row0") + off_r) / f_r)
    sr1 = F.floor((F.col("row0") + F.col("nrows") - 1 + off_r) / f_r)
    sc0 = F.floor((F.col("col0") + off_c) / f_c)
    sc1 = F.floor((F.col("col0") + F.col("ncols") - 1 + off_c) / f_c)
    # -> coarse TILE range, clamped to the coarse extent
    wtr0 = F.greatest(F.lit(0), (sr0 / tc_size).cast("int"))
    wtr1 = F.least(F.lit((s_nrows - 1) // tc_size), (sr1 / tc_size).cast("int"))
    wtc0 = F.greatest(F.lit(0), (sc0 / tc_size).cast("int"))
    wtc1 = F.least(F.lit((s_ncols - 1) // tc_size), (sc1 / tc_size).cast("int"))
    t = (targets
         .withColumn("_wtr0", wtr0).withColumn("_wtr1", wtr1)
         .withColumn("_wtc0", wtc0).withColumn("_wtc1", wtc1)
         .where((F.col("_wtr1") >= F.col("_wtr0")) &
                (F.col("_wtc1") >= F.col("_wtc0")))
         .withColumn("_wtr", F.explode(F.sequence("_wtr0", "_wtr1")))
         .withColumn("_wtc", F.explode(F.sequence("_wtc0", "_wtc1")))
         .drop("_wtr0", "_wtr1", "_wtc0", "_wtc1"))

    has_mask = "mask_values" in coarse_tiles.columns
    src = coarse_tiles.select(
        F.col("tile_row").alias("_wtr"), F.col("tile_col").alias("_wtc"),
        F.col("row0").alias("_srow0"), F.col("col0").alias("_scol0"),
        F.col("nrows").alias("_snrows"), F.col("ncols").alias("_sncols"),
        F.col("values").alias("_svalues"),
        *([F.col("mask_values").alias("_smask")] if has_mask else []))
    j = t.join(src, ["_wtr", "_wtc"])

    dtype = meta["dtype"]
    nodata = meta["nodata"]
    is_int = np.dtype(dtype).kind in "iu"
    if is_int and nodata is None:
        fill = None  # unmapped cells are an error for int rasters
    else:
        fill = float(nodata) if nodata is not None else np.nan
    out_dtype = dtype

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tr, tc = int(key[0]), int(key[1])
        row0, col0 = tr * tile, tc * tile
        nr = min(tile, g_nrows - row0)
        nc = min(tile, g_ncols - col0)
        if fill is None:
            block = None  # allocate lazily; verify full coverage below
        else:
            block = np.full((nr, nc), fill, dtype=np.dtype(out_dtype))
        # unmapped fine cells of a masked raster come out mask=0
        mblock = np.zeros((nr, nc), dtype=np.uint8) if has_mask else None
        covered = np.zeros((nr, nc), dtype=bool)
        src_r = (np.arange(row0, row0 + nr) + off_r) // f_r
        src_c = (np.arange(col0, col0 + nc) + off_c) // f_c
        for rec in pdf.to_dict("records"):
            snr, snc = int(rec["_snrows"]), int(rec["_sncols"])
            srow0, scol0 = int(rec["_srow0"]), int(rec["_scol0"])
            cblock = decode_tile(rec["_svalues"], dtype, snr, snc)
            rsel = (src_r >= srow0) & (src_r < srow0 + snr)
            csel = (src_c >= scol0) & (src_c < scol0 + snc)
            if not (rsel.any() and csel.any()):
                continue
            if block is None:
                # zeros, not empty: masked-out cells never get written,
                # and uninitialized bytes would make the encoded payload
                # nondeterministic (breaks byte-level reproducibility)
                block = np.zeros((nr, nc), dtype=np.dtype(out_dtype))
            ix = np.ix_(rsel, csel)
            six = np.ix_(src_r[rsel] - srow0, src_c[csel] - scol0)
            block[ix] = cblock[six]
            if has_mask:
                mblock[ix] = decode_tile(rec["_smask"], "uint8", snr, snc)[six]
            covered[ix] = True
        if fill is None and not covered.all() and not has_mask:
            raise ValueError(
                "regrid_to: fine grid extends beyond the coarse raster and "
                "the integer raster has no nodata value to fill with")
        out_row = {
            "raster_id": "regrid", "band": 0,
            "tile_row": tr, "tile_col": tc, "row0": row0, "col0": col0,
            "nrows": nr, "ncols": nc,
            "values": encode_tile(block if block is not None
                                  else np.zeros((nr, nc),
                                                dtype=np.dtype(out_dtype))
                                  if has_mask else
                                  np.full((nr, nc), fill,
                                          dtype=np.dtype(out_dtype))),
        }
        if has_mask:
            out_row["mask_values"] = encode_tile(mblock)
        return pd.DataFrame([out_row])

    schema = T.StructType([
        T.StructField("raster_id", T.StringType()), T.StructField("band", T.IntegerType()),
        T.StructField("tile_row", T.IntegerType()), T.StructField("tile_col", T.IntegerType()),
        T.StructField("row0", T.IntegerType()), T.StructField("col0", T.IntegerType()),
        T.StructField("nrows", T.IntegerType()), T.StructField("ncols", T.IntegerType()),
        T.StructField("values", T.BinaryType()),
        *([T.StructField("mask_values", T.BinaryType())] if has_mask else []),
    ])
    out = j.groupBy("tile_row", "tile_col").applyInPandas(assemble, schema=schema)
    if "scale" in coarse_tiles.columns:
        # the on-read transform is constant per raster — carry it through
        so = coarse_tiles.select("scale", "offset").first()
        out = out.withColumn("scale", F.lit(float(so["scale"]))) \
                 .withColumn("offset", F.lit(float(so["offset"])))
    return (out.withColumn("grid_xmin", F.lit(float(fine_grid["grid_xmin"])))
               .withColumn("grid_ymax", F.lit(float(fine_grid["grid_ymax"])))
               .withColumn("dx", F.lit(fdx))
               .withColumn("dy", F.lit(fdy))
               .withColumn("grid_nrows", F.lit(g_nrows))
               .withColumn("grid_ncols", F.lit(g_ncols))
               .withColumn("dtype", F.lit(out_dtype))
               .withColumn("nodata", F.lit(nodata).cast("double")))
