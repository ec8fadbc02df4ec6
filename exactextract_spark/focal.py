"""Focal (neighborhood) statistics over a tile table via halo exchange.

The reference engine computes per-ZONE statistics from exact coverage
(raster_stats.h); classic map algebra adds the complementary per-CELL
neighborhood operators (ArcGIS "Focal Statistics", GRASS r.neighbors):
for every cell, aggregate the values inside the square window of radius
R centred on it.  A single-node engine slides a window over the full
array; the distributed formulation is a **halo exchange** — the
canonical stencil pattern:

1. *Scatter* (map-only, Arrow ``mapInPandas``): every tile decodes its
   payload once (nodata → NaN), keeps its core block, and addresses up
   to eight boundary strips — ≤ R cells deep — to the neighbor tiles
   that need them.
2. *Gather* (ONE hash shuffle keyed by tile): ``applyInPandas``
   assembles each tile's core plus received strips into a padded array
   (missing halo = outside the raster = NaN) and evaluates every window
   with vectorized numpy — no per-cell Python.

Two output shapes share the exchange:

* :func:`focal_stats` — one row per CELL with all five statistics (the
  analysis/oracle frame);
* :func:`focal_raster` — one row per TILE: the chosen statistic
  re-encoded as a payload, i.e. raster-in → raster-out with no second
  shuffle and no per-cell Arrow transfer (the production smoothing
  shape; ~3 orders of magnitude fewer output rows).

Scale shape (100 TB): the shuffle moves core + halo ≈ ``(1+2R/tile)²``
× the raster — for R=2 on 64-cell tiles a 6% overhead over one full
scan, independent of zone/query count; each task's working set is one
padded tile.  Compare the naive SQL formulation (the oracle): a
self-join fanning every cell out ``(2R+1)²`` times — 25× the raster
for R=2 — through the join shuffle.

Exactness contract: the fixture's values are small integers, so every
window sum (≤ ``(2R+1)²`` terms) is exact in float64 under any fold
order, the count is an integer, min/max are order-free, and the mean is
one correctly-rounded division — bit-identical to the DuckDB oracle
with no tolerance.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .io import decode_tile, encode_tile

__all__ = ["focal_stats", "focal_raster", "focal_convolve",
           "focal_proximity", "focal_gradient", "focal_to_tiles"]

_PART_SCHEMA = T.StructType([
    T.StructField("t_row", T.IntegerType(), False),
    T.StructField("t_col", T.IntegerType(), False),
    T.StructField("is_core", T.BooleanType(), False),
    T.StructField("row0", T.IntegerType(), False),
    T.StructField("col0", T.IntegerType(), False),
    T.StructField("nrows", T.IntegerType(), False),
    T.StructField("ncols", T.IntegerType(), False),
    T.StructField("buf", T.BinaryType(), False),
])

_CELL_SCHEMA = T.StructType([
    T.StructField("cell_id", T.LongType()),
    T.StructField("r", T.IntegerType()),
    T.StructField("c", T.IntegerType()),
    T.StructField("focal_n", T.LongType()),
    T.StructField("focal_sum", T.DoubleType()),
    T.StructField("focal_mean", T.DoubleType()),
    T.StructField("focal_min", T.DoubleType()),
    T.StructField("focal_max", T.DoubleType()),
])

_STATS = ("count", "sum", "mean", "min", "max")

# the eight halo directions (d_tile_row, d_tile_col)
_DIRS = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
         (0, 1), (1, -1), (1, 0), (1, 1)]


def _decode_masked(row) -> np.ndarray:
    """Tile payload → float64 with nodata cells as NaN (the kernel's
    masking convention — io.decode_value_tile semantics without
    scale/offset, which the fixture rasters don't set)."""
    arr = decode_tile(row.values, row.dtype, int(row.nrows),
                      int(row.ncols)).astype(np.float64)
    nodata = getattr(row, "nodata", None)
    if nodata is not None and not pd.isna(nodata):
        arr = np.where(arr == float(nodata), np.nan, arr)
    return arr


def _resolve(tiles: DataFrame, radius: int, grid: dict | None):
    if grid is None:
        grid = dict(tiles.select("grid_xmin", "grid_ymax", "dx", "dy",
                                 "grid_nrows", "grid_ncols").first()
                    .asDict())
    # infer the stride from the tile table when the grid dict lacks
    # 'tile' (a hard-coded 64 mis-addresses halo strips on any other
    # stride with no error — ADVICE r5)
    from .grid import infer_tile_size
    tile = infer_tile_size(grid, tiles)
    rad = int(radius)
    if rad < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    if rad > tile:
        # a strip deeper than one tile would need multi-hop halos;
        # re-tiling to larger blocks is the documented answer, not
        # silent wrong output
        raise ValueError(f"radius {rad} exceeds tile size {tile}")
    return grid, tile, rad


def _halo_parts(tiles: DataFrame, rad: int, tile: int,
                g_nrows: int, g_ncols: int) -> DataFrame:
    """Stage 1: core block + ≤8 boundary strips per tile, addressed to
    the tiles that consume them."""
    n_tr = -(-g_nrows // tile)
    n_tc = -(-g_ncols // tile)
    cols = ["tile_row", "tile_col", "row0", "col0", "nrows", "ncols",
            "values", "dtype"]
    if "nodata" in tiles.columns:
        cols.append("nodata")

    def scatter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                arr = _decode_masked(row)
                nr, nc = arr.shape
                tr, tc = int(row.tile_row), int(row.tile_col)
                row0, col0 = int(row.row0), int(row.col0)
                out.append((tr, tc, True, row0, col0, nr, nc,
                            encode_tile(arr)))
                for di, dj in _DIRS:
                    ntr, ntc = tr + di, tc + dj
                    if not (0 <= ntr < n_tr and 0 <= ntc < n_tc):
                        continue
                    # the slice of MY cells within `rad` of the edge
                    # shared with neighbor (ntr, ntc)
                    rs = slice(0, min(rad, nr)) if di < 0 else \
                        slice(max(0, nr - rad), nr) if di > 0 else \
                        slice(0, nr)
                    cs = slice(0, min(rad, nc)) if dj < 0 else \
                        slice(max(0, nc - rad), nc) if dj > 0 else \
                        slice(0, nc)
                    strip = arr[rs, cs]
                    if strip.size == 0:
                        continue
                    out.append((ntr, ntc, False,
                                row0 + rs.start, col0 + cs.start,
                                strip.shape[0], strip.shape[1],
                                encode_tile(strip)))
            yield pd.DataFrame(out, columns=[f.name for f in _PART_SCHEMA])

    return tiles.select(*cols).mapInPandas(scatter, schema=_PART_SCHEMA)


def _window_stats(pdf: pd.DataFrame, rad: int):
    """Stage 2 core: assemble the padded tile, evaluate every window.
    Returns (c_row0, c_col0, dict of 2-D stat arrays) or None when the
    group holds only halo strips (no core tile)."""
    core = pdf[pdf["is_core"]]
    if core.empty:
        return None
    crow = core.iloc[0]
    c_row0, c_col0 = int(crow["row0"]), int(crow["col0"])
    nr, nc = int(crow["nrows"]), int(crow["ncols"])
    pad = np.full((nr + 2 * rad, nc + 2 * rad), np.nan)
    for p in pdf.itertuples(index=False):
        i = int(p.row0) - c_row0 + rad
        j = int(p.col0) - c_col0 + rad
        pad[i:i + int(p.nrows), j:j + int(p.ncols)] = \
            decode_tile(p.buf, "float64", int(p.nrows), int(p.ncols))
    # separable two-pass window evaluation: a (2R+1)² box reduction is
    # a vertical (2R+1) pass then a horizontal one — 2(2R+1) ops/cell
    # instead of (2R+1)², and temporaries shrink the same way.  Window
    # sums stay exact for integer-valued data (each column partial is
    # an exact small sum); min/max/count are exact for any input.
    W = 2 * rad + 1
    swv = np.lib.stride_tricks.sliding_window_view
    vwin = swv(pad, W, axis=0)                        # (nr, nc+2R, W)
    vvalid = ~np.isnan(vwin)
    vn = vvalid.sum(axis=2)
    vs = np.where(vvalid, vwin, 0.0).sum(axis=2)
    vmn = np.where(vvalid, vwin, np.inf).min(axis=2)
    vmx = np.where(vvalid, vwin, -np.inf).max(axis=2)
    n = swv(vn, W, axis=1).sum(axis=2).astype(np.int64)
    s = swv(vs, W, axis=1).sum(axis=2)
    mn = swv(vmn, W, axis=1).min(axis=2)
    mx = swv(vmx, W, axis=1).max(axis=2)
    empty = n == 0
    # NaN → SQL NULL through Arrow: undefined stats of an all-nodata
    # window come out as NULL, matching the oracle's SUM/MIN/MAX of an
    # empty group
    s = np.where(empty, np.nan, s)
    mean = np.where(empty, np.nan, s / np.maximum(n, 1))
    mn = np.where(empty, np.nan, mn)
    mx = np.where(empty, np.nan, mx)
    return c_row0, c_col0, {"count": n, "sum": s, "mean": mean,
                            "min": mn, "max": mx}


def focal_stats(tiles: DataFrame, radius: int = 2, *,
                grid: dict | None = None) -> DataFrame:
    """Per-cell statistics over the square ``(2·radius+1)²`` window:
    count / sum / mean / min / max of the defined (non-nodata) cells,
    the window clipped at the raster boundary.

    Returns one row per grid cell (cells whose whole window is nodata
    get NULL sum/mean/min/max and ``focal_n = 0``), in the engine's
    (cell_id, r, c) addressing — feed through :func:`focal_to_tiles` to
    get a first-class raster back, or use :func:`focal_raster` to skip
    the per-cell frame entirely."""
    grid, tile, rad = _resolve(tiles, radius, grid)
    g_nrows, g_ncols = int(grid["grid_nrows"]), int(grid["grid_ncols"])
    parts = _halo_parts(tiles, rad, tile, g_nrows, g_ncols)

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = _window_stats(pdf, rad)
        if got is None:
            return pd.DataFrame(columns=[f.name for f in _CELL_SCHEMA])
        c_row0, c_col0, st = got
        nr, nc = st["count"].shape
        rr = np.arange(c_row0, c_row0 + nr, dtype=np.int64)[:, None]
        cc = np.arange(c_col0, c_col0 + nc, dtype=np.int64)[None, :]
        return pd.DataFrame({
            "cell_id": np.broadcast_to(rr * g_ncols + cc, (nr, nc)).ravel(),
            "r": np.broadcast_to(rr, (nr, nc)).ravel().astype(np.int32),
            "c": np.broadcast_to(cc, (nr, nc)).ravel().astype(np.int32),
            "focal_n": st["count"].ravel(),
            "focal_sum": st["sum"].ravel(),
            "focal_mean": st["mean"].ravel(),
            "focal_min": st["min"].ravel(),
            "focal_max": st["max"].ravel(),
        })

    return parts.groupBy("t_row", "t_col").applyInPandas(
        gather, schema=_CELL_SCHEMA)


def focal_raster(tiles: DataFrame, radius: int = 2, *,
                 stat: str = "mean", grid: dict | None = None,
                 raster_id: str = "focal") -> DataFrame:
    """Raster-in → raster-out focal filter: the same halo exchange as
    :func:`focal_stats`, but the gather stage re-encodes the chosen
    statistic as a float64 tile payload directly — one output row per
    TILE, no second shuffle, no per-cell Arrow transfer.  Undefined
    windows (all-nodata) encode as NaN, which every downstream consumer
    (the kernel, another focal pass, an overview) masks.  The result is
    a first-class tile table on the SAME grid."""
    from .rasterize import _TILE_FIELDS

    if stat not in _STATS:
        raise ValueError(f"unknown focal stat {stat!r}; one of {_STATS}")
    grid, tile, rad = _resolve(tiles, radius, grid)
    g_nrows, g_ncols = int(grid["grid_nrows"]), int(grid["grid_ncols"])
    parts = _halo_parts(tiles, rad, tile, g_nrows, g_ncols)

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = _window_stats(pdf, rad)
        if got is None:
            return pd.DataFrame(
                columns=[f.name for f in _TILE_FIELDS])
        c_row0, c_col0, st = got
        arr = st[stat].astype(np.float64)
        nr, nc = arr.shape
        return pd.DataFrame([dict(
            raster_id=raster_id, band=0,
            tile_row=c_row0 // tile, tile_col=c_col0 // tile,
            row0=c_row0, col0=c_col0, nrows=nr, ncols=nc,
            values=encode_tile(arr))])

    t = parts.groupBy("t_row", "t_col").applyInPandas(
        gather, schema=_TILE_FIELDS)
    return (t.withColumn("grid_xmin", F.lit(float(grid["grid_xmin"])))
             .withColumn("grid_ymax", F.lit(float(grid["grid_ymax"])))
             .withColumn("dx", F.lit(float(grid["dx"])))
             .withColumn("dy", F.lit(float(grid["dy"])))
             .withColumn("grid_nrows", F.lit(g_nrows))
             .withColumn("grid_ncols", F.lit(g_ncols))
             .withColumn("dtype", F.lit("float64"))
             .withColumn("nodata", F.lit(None).cast("double")))


_CONV_SCHEMA = T.StructType([
    T.StructField("cell_id", T.LongType()),
    T.StructField("r", T.IntegerType()),
    T.StructField("c", T.IntegerType()),
    T.StructField("wsum", T.LongType()),
    T.StructField("conv", T.DoubleType()),
    T.StructField("smooth", T.DoubleType()),
])


def focal_convolve(tiles: DataFrame, kernel=(1, 4, 6, 4, 1), *,
                   grid: dict | None = None) -> DataFrame:
    """Separable integer-kernel convolution over the raster — the
    kernel-smoothing half of map algebra (a binomial kernel is the
    standard integer Gaussian approximation).  ``kernel`` is the 1-D
    half; the 2-D weight is the outer product ``kernel ⊗ kernel``.

    Per cell: ``wsum`` (total weight over DEFINED cells in the window,
    renormalizing at nodata holes and raster edges the way GDAL/GRASS
    kernel filters do), ``conv`` (Σ w·v, NULL when no defined cell),
    ``smooth`` (conv / wsum).  Integer weights × integer-valued data
    keep every sum exact, so the driver oracle is bit-exact.

    Same halo exchange as :func:`focal_stats`; the evaluation is two
    weighted shift-accumulate passes (vertical then horizontal) —
    2·len(kernel) fused multiply-adds per cell."""
    b = [int(w) for w in kernel]
    if len(b) % 2 != 1 or len(b) < 3:
        raise ValueError(f"kernel length must be odd >= 3, got {len(b)}")
    if any(w < 0 for w in b) or sum(b) == 0:
        raise ValueError("kernel weights must be non-negative, not all 0")
    rad = len(b) // 2
    grid, tile, rad = _resolve(tiles, rad, grid)
    g_nrows, g_ncols = int(grid["grid_nrows"]), int(grid["grid_ncols"])
    parts = _halo_parts(tiles, rad, tile, g_nrows, g_ncols)
    W = len(b)

    def _wslide(a: np.ndarray, axis: int) -> np.ndarray:
        n_out = a.shape[axis] - W + 1
        def sl(k):
            return (slice(k, k + n_out), slice(None)) if axis == 0 \
                else (slice(None), slice(k, k + n_out))
        out = b[0] * a[sl(0)]
        for k in range(1, W):
            out += b[k] * a[sl(k)]
        return out

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        core = pdf[pdf["is_core"]]
        if core.empty:
            return pd.DataFrame(columns=[f.name for f in _CONV_SCHEMA])
        crow = core.iloc[0]
        c_row0, c_col0 = int(crow["row0"]), int(crow["col0"])
        nr, nc = int(crow["nrows"]), int(crow["ncols"])
        pad = np.full((nr + 2 * rad, nc + 2 * rad), np.nan)
        for p in pdf.itertuples(index=False):
            i = int(p.row0) - c_row0 + rad
            j = int(p.col0) - c_col0 + rad
            pad[i:i + int(p.nrows), j:j + int(p.ncols)] = \
                decode_tile(p.buf, "float64", int(p.nrows), int(p.ncols))
        isn = np.isnan(pad)
        az = np.where(isn, 0.0, pad)
        cnt = (~isn).astype(np.float64)
        conv = _wslide(_wslide(az, 0), 1)
        wsum = _wslide(_wslide(cnt, 0), 1)
        empty = wsum == 0
        conv = np.where(empty, np.nan, conv)
        smooth = np.where(empty, np.nan, conv / np.where(empty, 1, wsum))
        rr = np.arange(c_row0, c_row0 + nr, dtype=np.int64)[:, None]
        cc = np.arange(c_col0, c_col0 + nc, dtype=np.int64)[None, :]
        return pd.DataFrame({
            "cell_id": np.broadcast_to(rr * g_ncols + cc, (nr, nc)).ravel(),
            "r": np.broadcast_to(rr, (nr, nc)).ravel().astype(np.int32),
            "c": np.broadcast_to(cc, (nr, nc)).ravel().astype(np.int32),
            "wsum": wsum.ravel().astype(np.int64),
            "conv": conv.ravel(),
            "smooth": smooth.ravel(),
        })

    return parts.groupBy("t_row", "t_col").applyInPandas(
        gather, schema=_CONV_SCHEMA)


_PROX_SCHEMA = T.StructType([
    T.StructField("cell_id", T.LongType()),
    T.StructField("r", T.IntegerType()),
    T.StructField("c", T.IntegerType()),
    T.StructField("d2", T.LongType()),
    T.StructField("dist", T.DoubleType()),
])


def focal_proximity(tiles: DataFrame, radius: int = 8, *,
                    target_min: float, grid: dict | None = None
                    ) -> DataFrame:
    """Bounded-radius proximity raster (``gdal_proximity -maxdist``):
    per cell, the squared Euclidean distance ``d2`` (and ``dist`` =
    √d2) to the nearest TARGET cell — a defined cell with value ≥
    ``target_min`` — within ``radius``; NULL when no target is that
    close.  ``d2`` is an exact integer, so the oracle gate needs no
    tolerance; ``dist`` is one correctly-rounded sqrt in both engines.

    The distance transform is separable (Felzenszwalb & Huttenlocher
    2004): min over the window of dr²+dc²+penalty factorizes into a
    vertical min pass then a horizontal one — 2(2R+1) shift-min ops
    per cell instead of (2R+1)², on the same single halo exchange as
    every focal operator (strips are ``radius`` deep, so radius ≤ tile
    still holds)."""
    grid, tile, rad = _resolve(tiles, radius, grid)
    g_nrows, g_ncols = int(grid["grid_nrows"]), int(grid["grid_ncols"])
    parts = _halo_parts(tiles, rad, tile, g_nrows, g_ncols)
    W = 2 * rad + 1
    off2 = [(k - rad) ** 2 for k in range(W)]
    tmin = float(target_min)

    def _minslide(a: np.ndarray, axis: int) -> np.ndarray:
        n_out = a.shape[axis] - W + 1
        def sl(k):
            return (slice(k, k + n_out), slice(None)) if axis == 0 \
                else (slice(None), slice(k, k + n_out))
        out = a[sl(0)] + off2[0]
        for k in range(1, W):
            np.minimum(out, a[sl(k)] + off2[k], out=out)
        return out

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        core = pdf[pdf["is_core"]]
        if core.empty:
            return pd.DataFrame(columns=[f.name for f in _PROX_SCHEMA])
        crow = core.iloc[0]
        c_row0, c_col0 = int(crow["row0"]), int(crow["col0"])
        nr, nc = int(crow["nrows"]), int(crow["ncols"])
        pad = np.full((nr + 2 * rad, nc + 2 * rad), np.nan)
        for p in pdf.itertuples(index=False):
            i = int(p.row0) - c_row0 + rad
            j = int(p.col0) - c_col0 + rad
            pad[i:i + int(p.nrows), j:j + int(p.ncols)] = \
                decode_tile(p.buf, "float64", int(p.nrows), int(p.ncols))
        # target penalty: 0 at targets, +inf elsewhere (NaN compares
        # False, so nodata cells are never targets; outside-raster halo
        # stays NaN → inf)
        with np.errstate(invalid="ignore"):
            tpen = np.where(pad >= tmin, 0.0, np.inf)
        d2f = _minslide(_minslide(tpen, 0), 1)
        none = ~np.isfinite(d2f)
        d2 = np.where(none, -1, d2f).astype(np.int64)
        dist = np.where(none, np.nan, np.sqrt(d2f))
        rr = np.arange(c_row0, c_row0 + nr, dtype=np.int64)[:, None]
        cc = np.arange(c_col0, c_col0 + nc, dtype=np.int64)[None, :]
        out = pd.DataFrame({
            "cell_id": np.broadcast_to(rr * g_ncols + cc, (nr, nc)).ravel(),
            "r": np.broadcast_to(rr, (nr, nc)).ravel().astype(np.int32),
            "c": np.broadcast_to(cc, (nr, nc)).ravel().astype(np.int32),
            "d2": d2.ravel(),
            "dist": dist.ravel(),
        })
        # -1 sentinel → nullable NULL (NaN-through-Arrow only works for
        # floats; d2 is integral)
        out["d2"] = out["d2"].astype("Int64")
        out.loc[out["d2"] < 0, "d2"] = pd.NA
        return out

    return parts.groupBy("t_row", "t_col").applyInPandas(
        gather, schema=_PROX_SCHEMA)


_GRAD_SCHEMA = T.StructType([
    T.StructField("cell_id", T.LongType()),
    T.StructField("r", T.IntegerType()),
    T.StructField("c", T.IntegerType()),
    T.StructField("gx", T.DoubleType()),
    T.StructField("gy", T.DoubleType()),
    T.StructField("slope_sq", T.DoubleType()),
])


def focal_gradient(tiles: DataFrame, *, grid: dict | None = None
                   ) -> DataFrame:
    """Horn-method surface gradient (the ``gdaldem slope`` core) on the
    radius-1 halo exchange: per cell,

        gx = ((z₋₊ + 2·z₀₊ + z₊₊) − (z₋₋ + 2·z₀₋ + z₊₋)) / (8·dx)
        gy = ((z₊₋ + 2·z₊₀ + z₊₊) − (z₋₋ + 2·z₋₀ + z₋₊)) / (8·dy)

    (subscripts row, col offsets; +row = grid south).  Cells whose 3×3
    window is incomplete — raster edge or any nodata neighbor — return
    NULL, GDAL's default edge/nodata behaviour.  ``slope_sq`` =
    gx²+gy² is the squared slope (rise²/run²); for integer-valued data
    on a unit grid every output is a dyadic rational, so the driver
    oracle is bit-exact.  Angle transforms (atan/degrees) are left to
    the caller: libm rounding is not guaranteed identical across
    engines, so they stay out of the gated columns."""
    grid, tile, rad = _resolve(tiles, 1, grid)
    g_nrows, g_ncols = int(grid["grid_nrows"]), int(grid["grid_ncols"])
    dx, dy = float(grid["dx"]), float(grid["dy"])
    parts = _halo_parts(tiles, 1, tile, g_nrows, g_ncols)

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        core = pdf[pdf["is_core"]]
        if core.empty:
            return pd.DataFrame(columns=[f.name for f in _GRAD_SCHEMA])
        crow = core.iloc[0]
        c_row0, c_col0 = int(crow["row0"]), int(crow["col0"])
        nr, nc = int(crow["nrows"]), int(crow["ncols"])
        pad = np.full((nr + 2, nc + 2), np.nan)
        for p in pdf.itertuples(index=False):
            i = int(p.row0) - c_row0 + 1
            j = int(p.col0) - c_col0 + 1
            pad[i:i + int(p.nrows), j:j + int(p.ncols)] = \
                decode_tile(p.buf, "float64", int(p.nrows), int(p.ncols))

        def z(dr, dc):
            return pad[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]

        gx = ((z(-1, 1) + 2.0 * z(0, 1) + z(1, 1))
              - (z(-1, -1) + 2.0 * z(0, -1) + z(1, -1))) / (8.0 * dx)
        gy = ((z(1, -1) + 2.0 * z(1, 0) + z(1, 1))
              - (z(-1, -1) + 2.0 * z(-1, 0) + z(-1, 1))) / (8.0 * dy)
        # NaN anywhere in the 3x3 (incl. the centre) poisons gx/gy —
        # except the centre itself, which Horn's stencil doesn't read;
        # GDAL nulls those too, so OR it in explicitly
        bad = np.isnan(z(0, 0)) | np.isnan(gx) | np.isnan(gy)
        gx = np.where(bad, np.nan, gx)
        gy = np.where(bad, np.nan, gy)
        slope_sq = np.where(bad, np.nan, gx * gx + gy * gy)
        rr = np.arange(c_row0, c_row0 + nr, dtype=np.int64)[:, None]
        cc = np.arange(c_col0, c_col0 + nc, dtype=np.int64)[None, :]
        return pd.DataFrame({
            "cell_id": np.broadcast_to(rr * g_ncols + cc, (nr, nc)).ravel(),
            "r": np.broadcast_to(rr, (nr, nc)).ravel().astype(np.int32),
            "c": np.broadcast_to(cc, (nr, nc)).ravel().astype(np.int32),
            "gx": gx.ravel(),
            "gy": gy.ravel(),
            "slope_sq": slope_sq.ravel(),
        })

    return parts.groupBy("t_row", "t_col").applyInPandas(
        gather, schema=_GRAD_SCHEMA)


def focal_to_tiles(cells: DataFrame, grid: dict, *,
                   column: str = "focal_mean",
                   raster_id: str = "focal") -> DataFrame:
    """Re-assemble a ``focal_stats`` column into the engine's tile-table
    schema so the smoothed layer feeds straight back into
    ``exact_extract`` (raster→focal→zonal, mirroring
    rasterize.burn_to_tiles' vector→raster→zonal round trip).  Undefined
    cells (NULL ``column``) become NaN, which the kernel masks.  When
    the per-cell frame isn't otherwise needed, :func:`focal_raster`
    produces the same raster without it."""
    from .rasterize import burn_to_tiles

    named = cells.select(
        F.col("r").cast("long").alias("r"),
        F.col("c").cast("long").alias("c"),
        F.coalesce(F.col(column).cast("double"),
                   F.lit(float("nan"))).alias("burn"))
    return burn_to_tiles(named, grid, raster_id=raster_id, column="burn")
