"""The zonal-statistics planner: zones ⋈ tiles → kernel → mergeable
partial states → groupBy(zone).agg → finalize.

This is the Spark-native re-expression of the reference's processors
(/root/reference/src/feature_sequential_processor.cpp:58-125,
raster_parallel_processor.cpp:83-232).  The reference's 5-stage oneTBB
pipeline maps onto the Spark plan one-to-one:

  1. subgrid work list            -> the tile table (one row per tile)
  2. STRtree feature-hit query    -> zone-bbox → tile-range explode +
                                     equi-join on (tile_row, tile_col);
                                     the grid itself is the spatial index
  3. raster window read           -> tile payload column scan
  4. coverage + block-local stats -> Arrow-batched mapInPandas kernel
                                     emitting partial-state rows
  5. serial merge                 -> groupBy(zone_id).agg(...) — Spark's
                                     partial+final aggregation, which is
                                     also the skew answer: a zone touching
                                     100k tiles is pre-aggregated map-side
                                     per partition before the (tiny) final
                                     shuffle, so no salting is needed for
                                     the scalar states (they are all
                                     associative-commutative by design).

Join strategies:
- "broadcast" (default for small/medium zone sets): only (zone_id,
  tile_row, tile_col) pairs enter the broadcast hash join; geometry WKT
  travels via a SparkContext broadcast dict straight to the kernel, so
  the big tile payloads are NEVER shuffled — the kernel runs in the same
  stage as the tile scan.
- "shuffle": for huge zone tables; pairs carry geometry and the join
  shuffles by tile key (payloads move exactly once).  AQE handles skewed
  tile keys.

Variance is carried as (Σc, Σcx, Σcx²) so partial states merge exactly —
lifting the reference's parallel-strategy restriction
(raster_parallel_processor.cpp:91-95, raster_stats.h:113-115).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from .accumulate import accumulate_pair
from .geom import parse_wkt
from .io import decode_tile, decode_value_tile
from .kernel import coverage_for_window
from .ops import Op, group_ops_by_key, parse_ops

__all__ = ["exact_extract", "attach_bbox", "zone_tile_pairs", "run_kernel",
           "crs_matches", "raise_on_invalid_zones", "count_and_validate"]

BROADCAST_ZONE_LIMIT = 200_000


def crs_matches(crs_a: str | None, crs_b: str | None) -> bool:
    """CRS equivalence with the reference's semantics
    (exact_extract.py:297-336): unknown (None) matches anything; equal
    strings match; otherwise defer to pyproj when available, else
    report a mismatch."""
    if crs_a is None or crs_b is None:
        return True
    if crs_a == crs_b:
        return True
    try:
        from pyproj import CRS
    except ImportError:
        # no pyproj: string-unequal CRSs cannot be proven equivalent —
        # report a mismatch (feeds a WARN-only path), like the
        # reference's crs_matches swallowing only ImportError
        return False
    # an unparseable CRS string propagates (reference exact_extract.py
    # crs_matches lets pyproj parse errors raise) — a genuine parse
    # failure should not masquerade as a CRS mismatch warning
    return CRS.from_user_input(crs_a) == CRS.from_user_input(crs_b)


def _table_crs(df: DataFrame) -> str | None:
    if "crs" not in df.columns:
        return None
    row = df.select("crs").first()
    return row[0] if row is not None else None


def _warn_on_crs_mismatch(vec_crs, tiles, grid, weight_tiles):
    """Reference warn_on_crs_mismatch (exact_extract.py:338-360):
    RuntimeWarning when the vector CRS does not match the value raster
    or the weighting raster."""
    import warnings

    rast_crs = grid.get("crs") or _table_crs(tiles)
    if not crs_matches(vec_crs, rast_crs):
        warnings.warn(
            "Spatial reference system of input features does not exactly "
            "match raster.", RuntimeWarning, stacklevel=3)
    if weight_tiles is not None:
        w_crs = _table_crs(weight_tiles)
        if not crs_matches(vec_crs, w_crs):
            warnings.warn(
                "Spatial reference system of input features does not "
                "exactly match weighting raster.", RuntimeWarning,
                stacklevel=3)

_CELLS_T = T.ArrayType(T.StructType([
    T.StructField("cell_id", T.LongType()),
    T.StructField("v", T.DoubleType()),
    T.StructField("cov", T.DoubleType()),
    T.StructField("w", T.DoubleType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
]))


# JVM-side WKT coordinate stream: split on any char that cannot be part
# of a float literal (keyword letters like the E in LINESTRING/EMPTY
# survive the split but try_cast them to NULL, which filter drops), so
# the remaining tokens are exactly the x,y,x,y,... coordinate stream.
_WKT_NUMS = ("filter(transform(split({c}, '[^-+.0-9eE]+'),"
             " s -> try_cast(s AS DOUBLE)), v -> v IS NOT NULL)")


# supported geometry head tags (geom.parse_wkt dispatch): anything else
# — POINT, MULTIPOINT, garbage — must raise at bbox time like the old
# per-row parse did, because a zone whose bbox intersects no tile never
# reaches the kernel's parse and would otherwise fail silently.  The
# tag must be followed directly by EMPTY or '(' so dimension-qualified
# WKT ('POLYGON Z (...)', 'POLYGON ZM (...)') — which parse_wkt rejects
# loudly — cannot slip through with a plausible-but-wrong bbox from
# x/y/z token-parity mixing (ADVICE r4).
_WKT_HEAD_OK = ("upper(ltrim(geometry)) RLIKE "
                "'^(MULTIPOLYGON|POLYGON|MULTILINESTRING|LINESTRING"
                "|GEOMETRYCOLLECTION)\\\\s*(EMPTY|[(])'")


def _bbox_expr(minmax: str, parity: int) -> str:
    """One bbox component over the coordinate stream (x = even tokens,
    y = odd); array_min/array_max skip the NULLed-out other axis.

    Invalid WKT (bad head tag, odd/missing coordinate tokens) yields a
    NULL component, NOT an inline raise_error: Catalyst freely reorders
    filter conjuncts and projections, so a raising expression can fire
    on rows an earlier filter was meant to drop (e.g. the raster-doc
    rows of an interleaved table before the zone filter).  The loud
    failure lives in raise_on_invalid_zones(), which consumers run as a
    driver-side action once the zone table is materialized."""
    per_axis = (f"array_{minmax}(transform(_wkt_nums,"
                f" (v, i) -> IF(i % 2 = {parity}, v, CAST(NULL AS DOUBLE))))")
    inf = "'Infinity'" if minmax == "min" else "'-Infinity'"
    return f"""CASE
      WHEN NOT _wkt_ok THEN CAST(NULL AS DOUBLE)
      WHEN size(_wkt_nums) >= 2 AND size(_wkt_nums) % 2 = 0 THEN {per_axis}
      WHEN size(_wkt_nums) = 0 AND upper(geometry) LIKE '%EMPTY%'
        THEN CAST({inf} AS DOUBLE)
      ELSE CAST(NULL AS DOUBLE)
    END"""


def attach_bbox(zones: DataFrame) -> DataFrame:
    """Add (xmin, ymin, xmax, ymax) parsed from WKT (bbox pre-filter
    feeds tile-range pruning — reference
    feature_sequential_processor.cpp:72-76).

    Computed entirely with JVM expressions (split/try_cast/array_min
    over the numeric token stream) — no per-row Python, so a 10⁸-zone
    table stays in whole-stage codegen.  EMPTY geometries get the
    inverted bbox (every tile-range predicate false; the zone flows to
    the final left join like the reference writing a row for every
    feature).  Invalid WKT (unsupported POINT zones, garbage, odd
    coordinate counts) gets a NULL bbox here; consumers fail loudly
    via raise_on_invalid_zones(), and structural invalidity that still
    yields a plausible bbox (e.g. unbalanced parens) raises at kernel
    parse time, which sees every zone that intersects any tile.

    The token-stream projection is an OPTIMIZER BARRIER: the split +
    try_cast parse is wrapped in an always-true non-deterministic guard
    so PushDownPredicates / CollapseProject cannot substitute it into
    every downstream filter conjunct and generator.  Without it the
    optimized tile-assignment plan evaluated the WKT synthesis + regex
    split up to ~50× per zone (measured: split() appeared 33× in the
    optimized plan; ~21 core-ms per zone — guide §7.2 'duplicated
    subtrees').  With the barrier the parse runs exactly once per row
    and downstream predicates reference the materialized token array."""
    if "xmin" in zones.columns:
        return zones
    # always-true, non-foldable guard (monotonically_increasing_id is
    # non-negative by construction); value is unchanged, but the
    # projection becomes non-deterministic, which blocks predicate
    # pushdown and projection collapse across it
    nd_true = F.monotonically_increasing_id() >= F.lit(0)
    z = zones.select(
        "*",
        F.when(nd_true, F.expr(_WKT_NUMS.format(c="geometry")))
         .alias("_wkt_nums"),
        F.expr(_WKT_HEAD_OK).alias("_wkt_ok"))
    z = z.select("*",
                 F.expr(_bbox_expr("min", 0)).alias("xmin"),
                 F.expr(_bbox_expr("min", 1)).alias("ymin"),
                 F.expr(_bbox_expr("max", 0)).alias("xmax"),
                 F.expr(_bbox_expr("max", 1)).alias("ymax"))
    return z.drop("_wkt_nums", "_wkt_ok")


def raise_on_invalid_zones(zones_b: DataFrame) -> None:
    """Fail loudly on invalid zone geometry like the reference
    (test_exact_extract.py:1264-1274 semantics): a NULL xmin marks WKT
    the JVM bbox parser rejected (attach_bbox).  One column-pruned
    driver-side action — run it AFTER the zone table is filtered/
    materialized so it cannot be reordered onto non-zone rows."""
    bad = zones_b.where(F.col("xmin").isNull()) \
                 .select("geometry").limit(1).collect()
    if bad:
        raise ValueError(f"invalid zone geometry {str(bad[0][0])[:80]!r}")


def count_and_validate(zones_b: DataFrame, validate: bool = True) -> int:
    """Zone count and invalid-geometry check in ONE action (consumers
    that need both would otherwise scan the zone table twice).
    ``validate=False`` for tables whose bbox columns were supplied by
    the CALLER (attach_bbox passed them through): a user NULL bbox
    there is not the engine's invalid-WKT marker."""
    aggs = [F.count("*").alias("n")]
    if validate:
        aggs += [F.sum(F.col("xmin").isNull().cast("long")).alias("bad"),
                 F.first(F.when(F.col("xmin").isNull(), F.col("geometry")),
                         ignorenulls=True).alias("ex")]
    row = zones_b.agg(*aggs).first()
    if validate and row["bad"]:
        raise ValueError(f"invalid zone geometry {str(row['ex'])[:80]!r}")
    return row["n"]


def prepare_weight_frame(weight_tiles: DataFrame, grid: dict,
                         tile_size: int) -> DataFrame:
    """Weight tile payloads renamed to the w_* columns the kernel
    consumes, with transparent common-grid handling (reference consumes
    a coarser weight raster lazily via common_grid + RasterView,
    grid.h:278-305, raster.h:327-395): a weight table on a
    different-resolution/offset grid is regridded onto the value grid
    automatically.  Shared by the batch extractor and the streaming
    writer (which prepares it once and joins per micro-batch)."""
    from .regrid import grids_equal, regrid_to
    wmeta = weight_tiles.select(
        "grid_xmin", "grid_ymax", "dx", "dy",
        "grid_nrows", "grid_ncols").first().asDict()
    vgrid = {k: grid.get(k) for k in wmeta}
    if None not in vgrid.values() and not grids_equal(wmeta, vgrid):
        weight_tiles = regrid_to(weight_tiles, vgrid, tile=tile_size)
    wextra = [F.col(c).alias(f"w_{c}") for c in
              ("scale", "offset", "mask_values")
              if c in weight_tiles.columns]
    return weight_tiles.select(
        F.col("tile_row").alias("w_tile_row"), F.col("tile_col").alias("w_tile_col"),
        F.col("values").alias("w_values"), F.col("dtype").alias("w_dtype"),
        F.col("nodata").alias("w_nodata"), *wextra)


def join_weight_frame(tiles: DataFrame, w: DataFrame) -> DataFrame:
    """Left-join prepared w_* payloads onto value tiles (missing weight
    tile → NULL w_values → undefined weighted stats, reference NaN
    semantics)."""
    return tiles.join(
        w, (F.col("tile_row") == F.col("w_tile_row")) &
           (F.col("tile_col") == F.col("w_tile_col")), "left") \
        .drop("w_tile_row", "w_tile_col")


def zone_tile_pairs(zones_bbox: DataFrame, grid: dict, tile: int) -> DataFrame:
    """bbox → covered tile-index range → explode.  Pure JVM expressions;
    Catalyst folds the constants.  Equivalent of Grid::crop +
    subdivide (grid.h:145-238, grid.cpp:92-119) as a relational op."""
    gx, gy = float(grid["grid_xmin"]), float(grid["grid_ymax"])
    dx, dy = float(grid["dx"]), float(grid["dy"])
    ntr = (int(grid["grid_nrows"]) + tile - 1) // tile
    ntc = (int(grid["grid_ncols"]) + tile - 1) // tile
    tw, th = dx * tile, dy * tile

    tc0 = F.greatest(F.lit(0), F.floor((F.col("xmin") - gx) / tw)).cast("int")
    tc1 = F.least(F.lit(ntc - 1), F.floor((F.col("xmax") - gx) / tw - 1e-12)).cast("int")
    tr0 = F.greatest(F.lit(0), F.floor((gy - F.col("ymax")) / th)).cast("int")
    tr1 = F.least(F.lit(ntr - 1), F.floor((gy - F.col("ymin")) / th - 1e-12)).cast("int")

    z = zones_bbox.where((F.col("xmax") > gx) & (F.col("xmin") < gx + ntc * tw) &
                         (F.col("ymax") > gy - ntr * th) & (F.col("ymin") < gy))
    z = z.withColumn("_tr0", tr0).withColumn("_tr1", tr1) \
         .withColumn("_tc0", tc0).withColumn("_tc1", tc1) \
         .where((F.col("_tr1") >= F.col("_tr0")) & (F.col("_tc1") >= F.col("_tc0")))
    return (z.withColumn("tile_row", F.explode(F.sequence("_tr0", "_tr1")))
             .withColumn("tile_col", F.explode(F.sequence("_tc0", "_tc1")))
             .drop("_tr0", "_tr1", "_tc0", "_tc1"))


def _partial_schema(keygroups, passthrough=()) -> T.StructType:
    fields = [T.StructField("zone_id", T.StringType())]
    fields += [T.StructField(c, T.IntegerType()) for c in passthrough]
    for i, (_, req, _) in enumerate(keygroups):
        p = f"k{i}_"
        fields += [T.StructField(p + "n", T.LongType()),
                   T.StructField(p + "sum_c", T.DoubleType()),
                   T.StructField(p + "sum_cx", T.DoubleType())]
        if req.variance:
            fields.append(T.StructField(p + "sum_cx2", T.DoubleType()))
        if req.stable_variance:
            fields += [T.StructField(p + "var_w", T.DoubleType()),
                       T.StructField(p + "var_mean", T.DoubleType()),
                       T.StructField(p + "var_m2", T.DoubleType())]
        if req.weighted:
            fields += [T.StructField(p + "sum_cw", T.DoubleType()),
                       T.StructField(p + "sum_cxw", T.DoubleType()),
                       T.StructField(p + "w_undef", T.BooleanType())]
            if req.weighted_variance:
                fields.append(T.StructField(p + "sum_cx2w", T.DoubleType()))
        if req.minmax:
            fields += [T.StructField(p + "min_v", T.DoubleType()),
                       T.StructField(p + "min_cell", T.LongType()),
                       T.StructField(p + "max_v", T.DoubleType()),
                       T.StructField(p + "max_cell", T.LongType())]
            if req.store_xy:
                fields += [T.StructField(p + n, T.DoubleType())
                           for n in ("min_x", "min_y", "max_x", "max_y")]
        if req.histogram:
            # per-pair histogram as three PARALLEL PRIMITIVE ARRAYS.
            # Measured against the two alternatives at 150k zones ×
            # 16k-cell windows (97 value buckets):
            # - array<struct{v,ci,ciw}> (round 2): the Arrow serializer
            #   runs a per-ELEMENT Python dict converter — the q_hist
            #   hot-path cost;
            # - one flat row per (pair, value) bucket: 97× the partial
            #   rows through pandas/Arrow/HashAggregate — 2.5× slower
            #   than round 2 at scale (JVM-side explode of a small row
            #   set beats Python-side row materialization).
            # Parallel primitive arrays keep the tiny row count AND
            # convert per-row (one C-level list per array), not
            # per-element; the aggregation explodes arrays_zip JVM-side.
            # NaN (the reference's poisoning of weighted bucket sums)
            # survives INSIDE array elements — only top-level NaN
            # becomes SQL NULL at the Arrow boundary.
            fields += [T.StructField(p + "hist_v", T.ArrayType(T.DoubleType())),
                       T.StructField(p + "hist_ci", T.ArrayType(T.DoubleType())),
                       T.StructField(p + "hist_ciw", T.ArrayType(T.DoubleType()))]
        if req.xy_moments or req.xy_change:
            # explicit undefined-y flag: NaN cannot ride a top-level
            # double partial (pandas NaN -> SQL NULL, silently skipped
            # by sum/max) — same mechanism as w_undef
            fields.append(T.StructField(p + "y_undef", T.BooleanType()))
        if req.xy_moments:
            fields += [T.StructField(p + "sum_cy", T.DoubleType()),
                       T.StructField(p + "sum_cy2", T.DoubleType()),
                       T.StructField(p + "sum_cxy", T.DoubleType())]
        if req.xy_change:
            fields += [T.StructField(p + "chg_c", T.DoubleType()),
                       T.StructField(p + "chg_sd", T.DoubleType()),
                       T.StructField(p + "chg_maxad", T.DoubleType())]
        if req.pair_hist:
            # joint (value, y) histogram as parallel primitive arrays —
            # same per-row C-level Arrow conversion as the value
            # histogram above
            fields += [T.StructField(p + "hist2_v", T.ArrayType(T.DoubleType())),
                       T.StructField(p + "hist2_w", T.ArrayType(T.DoubleType())),
                       T.StructField(p + "hist2_c", T.ArrayType(T.DoubleType()))]
        if req.pair_topk:
            fields += [T.StructField(p + "topk_cell", T.ArrayType(T.LongType())),
                       T.StructField(p + "topk_v", T.ArrayType(T.DoubleType())),
                       T.StructField(p + "topk_cov", T.ArrayType(T.DoubleType()))]
        if req.cells:
            fields.append(T.StructField(p + "cells", _CELLS_T))
    return T.StructType(fields)


def run_kernel(joined: DataFrame, keygroups, *, geom_lookup=None,
               has_weights: bool, passthrough=(), progress_acc=None) -> DataFrame:
    """mapInPandas kernel: decode tile, compute coverage once, update
    every op-key's accumulator (read-once dedup of shared windows —
    reference feature_sequential_processor.cpp:85-113).  ``passthrough``
    columns (e.g. tile ids for checkpoint lineage) are copied onto every
    partial row.

    Areal pairs are routed through the batch-vectorized path
    (batchkernel.py): coverage + statistics for the whole (zone × tile)
    batch are computed with flat numpy streams, so Python dispatch cost
    is per batch, not per pair.  Linear geometries, stored-cell arrays,
    stable variance and area_* coverage weights fall back to the
    per-pair path (kernel.py + accumulate.py)."""
    from .batchkernel import (CHUNK_CELLS, RECT_BATCH_MAX_CELLS,
                              accumulate_pairs_batch, batch_eligible,
                              zone_segments)

    schema = _partial_schema(keygroups, passthrough)
    # key[0] is the logical raster name; when the joined rows carry a
    # raster_id column (fused multi-raster scan) each key only consumes
    # rows of its own raster
    key_specs = [(i, req, key[0], dict(
        min_coverage_frac=key[2], coverage_weight=key[3],
        default_value=key[4], default_weight=key[5], bin_width=key[6]))
        for i, (key, req, _) in enumerate(keygroups)]
    multi_raster = len({k[0] for k, _, _ in keygroups}) > 1
    col_names = [f.name for f in schema.fields]
    _arr_cols = [f.name for f in schema.fields
                 if isinstance(f.dataType, T.ArrayType)]
    use_batch = batch_eligible(keygroups)

    def kernel(batches):
        geom_cache: dict = {}
        seg_cache: dict = {}
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            # one row per tile with the zone hit-list attached:
            # "zone_ids" (broadcast strategy; geometry via broadcast
            # dict) or "zone_structs" (shuffle strategy; (zone_id,
            # geometry) structs ride the row)
            grouped_structs = "zone_structs" in pdf.columns
            grouped = "zone_ids" in pdf.columns or grouped_structs
            g = lambda c: pdf[c].to_numpy()
            # the batch path evaluates grid constants once per batch;
            # heterogeneous grids (not produced by any current source,
            # but possible with hand-unioned tile tables) fall back
            uniform = all(pdf[c].nunique() <= 1 for c in
                          ("grid_xmin", "grid_ymax", "dx", "dy", "grid_ncols"))
            use_batch_rows = use_batch and uniform
            if grouped_structs:
                zid_a = g("zone_structs")
            elif grouped:
                zid_a = g("zone_ids")
            else:
                zid_a = g("zone_id")
            wkt_a = g("geometry") if geom_lookup is None and not grouped else None
            nr_a, nc_a = g("nrows"), g("ncols")
            r0_a, c0_a = g("row0"), g("col0")
            gx_a, gy_a = g("grid_xmin"), g("grid_ymax")
            dx_a, dy_a = g("dx"), g("dy")
            gnc_a = g("grid_ncols")
            buf_a, dt_a = g("values"), g("dtype")
            nd_a = pdf["nodata"].to_numpy(dtype=np.float64, na_value=np.nan)
            # optional on-read transform columns (scale/offset, mask band)
            sc_a = g("scale") if "scale" in pdf.columns else None
            of_a = g("offset") if "offset" in pdf.columns else None
            mk_a = g("mask_values") if "mask_values" in pdf.columns else None
            rid_a = g("raster_id") if multi_raster else None
            if has_weights:
                wbuf_a, wdt_a = g("w_values"), g("w_dtype")
                wnd_a = pdf["w_nodata"].to_numpy(dtype=np.float64, na_value=np.nan)
                wsc_a = g("w_scale") if "w_scale" in pdf.columns else None
                wof_a = g("w_offset") if "w_offset" in pdf.columns else None
                wmk_a = g("w_mask_values") if "w_mask_values" in pdf.columns else None
            out_rows = []
            batch_pairs: list = []
            batch_cells = 0
            tile_buf: dict = {}

            def row_transform(j, nd, sa, oa, ma):
                sc = float(sa[j]) if sa is not None and sa[j] is not None else 1.0
                of = float(oa[j]) if oa is not None and oa[j] is not None else 0.0
                mk = ma[j] if ma is not None else None
                transformed = sc != 1.0 or of != 0.0 or mk is not None
                # a transformed tile is decoded to float64 with undefined
                # cells already NaN, so downstream nodata is cleared
                return sc, of, mk, (None if transformed else nd)

            tr_a, tc_a = g("tile_row"), g("tile_col")
            bd_a = g("band") if "band" in pdf.columns else None
            pt_arrays = [g(c) for c in passthrough]

            def tile_key(j):
                return (tr_a[j], tc_a[j],
                        rid_a[j] if rid_a is not None else None,
                        bd_a[j] if bd_a is not None else None)

            def decode_row(j, sc=1.0, of=0.0, mk=None, nd=None,
                           wt=(1.0, 0.0, None, None)):
                # cache by tile IDENTITY, not row index: the shuffle
                # strategy joins one row per (zone, tile) pair, so the
                # same payload appears on many rows of a partition —
                # decode it once (read-once dedup across pairs)
                key = tile_key(j)
                got = tile_buf.get(key)
                if got is None:
                    tv = decode_value_tile(
                        buf_a[j], dt_a[j], int(nr_a[j]), int(nc_a[j]),
                        nodata=nd, scale=sc, offset=of, mask_buf=mk)
                    tw = None
                    if has_weights and wbuf_a[j] is not None:
                        wsc, wof, wmk, wnd = wt
                        tw = decode_value_tile(
                            wbuf_a[j], wdt_a[j], int(nr_a[j]), int(nc_a[j]),
                            nodata=wnd, scale=wsc, offset=wof, mask_buf=wmk)
                    got = tile_buf[key] = (tv, tw)
                return got

            def flush_batch():
                nonlocal batch_pairs, batch_cells, tile_buf
                if batch_pairs:
                    frame = accumulate_pairs_batch(
                        batch_pairs, tile_buf, key_specs,
                        has_weights=has_weights, passthrough=passthrough,
                        col_names=col_names, grid_ncols=int(gnc_a[0]),
                        grid_xmin=float(gx_a[0]), grid_ymax=float(gy_a[0]),
                        dx=float(dx_a[0]), dy=float(dy_a[0]),
                        multi_raster=multi_raster, seg_cache=seg_cache)
                else:
                    frame = None
                batch_pairs = []
                batch_cells = 0
                tile_buf = {}
                return frame

            for j in range(n_rows):
                nr, nc = int(nr_a[j]), int(nc_a[j])
                row0, col0 = int(r0_a[j]), int(c0_a[j])
                dx, dy = float(dx_a[j]), float(dy_a[j])
                xmin = float(gx_a[j]) + col0 * dx
                ymax = float(gy_a[j]) - row0 * dy
                vals = None
                wvals = None
                w_nodata = None
                nd_raw = None if np.isnan(nd_a[j]) else float(nd_a[j])
                sc_j, of_j, mk_j, nd = row_transform(j, nd_raw, sc_a, of_a, mk_a)
                wn0 = None
                wt_j = (1.0, 0.0, None, None)
                if has_weights:
                    wn_raw = None if np.isnan(wnd_a[j]) else float(wnd_a[j])
                    wsc_j, wof_j, wmk_j, wn0 = row_transform(
                        j, wn_raw, wsc_a, wof_a, wmk_a)
                    wt_j = (wsc_j, wof_j, wmk_j, wn_raw)
                rid_row = rid_a[j] if multi_raster else None
                pt_tuple = tuple(int(a[j]) for a in pt_arrays)
                for z_entry in (zid_a[j] if grouped else (zid_a[j],)):
                    if grouped_structs:
                        zid = z_entry["zone_id"]
                    else:
                        zid = z_entry
                    cached = geom_cache.get(zid)
                    if cached is None:
                        if geom_lookup is not None:
                            wkt = geom_lookup.value[zid]
                        elif grouped_structs:
                            wkt = z_entry["geometry"]
                        else:
                            wkt = wkt_a[j]
                        geom = parse_wkt(wkt)
                        if len(geom_cache) > 65536:
                            geom_cache.clear()
                            seg_cache.clear()
                        cached = geom_cache[zid] = (geom, geom.bbox)
                    geom, (bx0, by0, bx1, by1) = cached
                    # crop to the zone-bbox ∩ tile sub-window so kernel
                    # work scales with the zone, not the tile (the
                    # reference's crop/shrink_to_fit, grid.h:145-238)
                    c0z = min(max(int(math.floor((bx0 - xmin) / dx)), 0), nc - 1)
                    c1z = min(max(int(math.ceil((bx1 - xmin) / dx)), c0z + 1), nc)
                    r0z = min(max(int(math.floor((ymax - by1) / dy)), 0), nr - 1)
                    r1z = min(max(int(math.ceil((ymax - by0) / dy)), r0z + 1), nr)
                    if use_batch_rows and geom.kind == "areal" and (
                            not geom.is_rectangle() or
                            (r1z - r0z) * (c1z - c0z) <= RECT_BATCH_MAX_CELLS):
                        decode_row(j, sc_j, of_j, mk_j, nd_raw, wt_j)
                        if not geom.is_rectangle() and zid not in seg_cache:
                            seg_cache[zid] = zone_segments(geom)
                        batch_pairs.append((zid, tile_key(j), r0z, r1z, c0z, c1z,
                                            geom, row0, col0, nd, wn0, rid_row,
                                            pt_tuple))
                        batch_cells += (r1z - r0z) * (c1z - c0z)
                        continue
                    nrw, ncw = r1z - r0z, c1z - c0z
                    cov = coverage_for_window(geom, xmin + c0z * dx, ymax - r0z * dy,
                                              dx, dy, nrw, ncw)
                    if not cov.any():
                        continue
                    pt = dict(zip(passthrough, pt_tuple))
                    if vals is None:
                        # decode once per tile row (read-once dedup,
                        # feature_sequential_processor.cpp:85-113)
                        vals, wvals = decode_row(j, sc_j, of_j, mk_j, nd_raw, wt_j)
                        w_nodata = wn0
                    rec = {"zone_id": zid, **pt}
                    any_key = False
                    for i, req, vname, kwargs in key_specs:
                        if multi_raster and vname != rid_row:
                            continue
                        part = accumulate_pair(
                            cov, vals[r0z:r1z, c0z:c1z], req=req, nodata=nd,
                            weights=None if wvals is None else wvals[r0z:r1z, c0z:c1z],
                            weight_nodata=w_nodata,
                            row0=row0 + r0z, col0=col0 + c0z,
                            grid_ncols=int(gnc_a[j]),
                            grid_xmin=float(gx_a[j]), grid_ymax=float(gy_a[j]),
                            dx=dx, dy=dy, **kwargs)
                        if part is None:
                            continue
                        any_key = True
                        hist = part.pop("hist", None)
                        for k, v in part.items():
                            rec[f"k{i}_{k}"] = v
                        if hist is not None:
                            # parallel primitive arrays (see
                            # _partial_schema); numpy arrays convert
                            # per-row C-level, never per-element Python
                            uniq, hci, hciw = hist
                            rec[f"k{i}_hist_v"] = uniq
                            rec[f"k{i}_hist_ci"] = hci
                            rec[f"k{i}_hist_ciw"] = hciw
                    if any_key:
                        out_rows.append(rec)
                # bound decoded-tile + stream memory: flush a full batch
                # between tile rows (a tile's pairs stay in one batch)
                if batch_cells >= CHUNK_CELLS:
                    frame = flush_batch()
                    if frame is not None and len(frame):
                        yield frame
            frame = flush_batch()
            if frame is not None and len(frame):
                yield frame
            if progress_acc is not None:
                progress_acc.add(n_rows)
            if not out_rows:
                yield pd.DataFrame(columns=col_names)
                continue
            out = pd.DataFrame(out_rows, columns=col_names)
            # rows that carry only some keys' fields leave the other
            # keys' array columns as NaN floats — Arrow needs None
            for c in _arr_cols:
                if c in out.columns:
                    out[c] = [v if isinstance(v, (list, np.ndarray)) else None
                              for v in out[c]]
            yield out

    return joined.mapInPandas(kernel, schema=schema)


def _quantile_udf(q: float):
    """Exact weighted quantile over the per-zone sorted histogram —
    digit-for-digit the reference algorithm
    (/root/reference/src/weighted_quantiles.cpp:21-75: sort distinct
    values, s_i = i*w_i + (n-1)*cumsum_{i-1}, linear interpolation at
    q*(Σw)*(n-1)).  NOT percentile_approx — the histogram is exact and
    bounded by value variety, not cell count."""
    @F.pandas_udf(T.DoubleType())
    def qf(hist: pd.Series) -> pd.Series:
        out = []
        for h in hist:
            if h is None or len(h) == 0:
                out.append(None)
                continue
            xs = np.array([e["v"] for e in h], dtype=np.float64)
            ws = np.array([e["ci"] for e in h], dtype=np.float64)
            n = xs.size
            cum = np.cumsum(ws)
            s = np.empty(n)
            s[0] = 0.0
            if n > 1:
                s[1:] = np.arange(1, n) * ws[1:] + (float(n) - 1.0) * cum[:-1]
            sn = cum[-1] * (float(n) - 1.0)
            t = q * sn
            left = int(np.searchsorted(s, t, side="right")) - 1
            if left >= n - 1:
                out.append(float(xs[n - 1]))
            else:
                r = left + 1
                out.append(float(xs[left] + (t - s[left]) * (xs[r] - xs[left]) / (s[r] - s[left])))
        return pd.Series(out, dtype="float64")
    return qf


def _quantiles_via_window(ops_in_key) -> bool:
    """True when quantile-type ops are the ONLY sorted-histogram
    consumers in the key: the per-zone quantile then comes from pure
    JVM window expressions instead of collect_list(struct) + a pandas
    UDF.  Measured on the q_hist bench shape (sf0.1, 150k zones × ≤97
    buckets): the collect+UDF finalizer was 2.2 s of q_hist's 2.9 s —
    the array<struct> Arrow transfer converts every element to a Python
    dict.  When unique/frac also run, the collect happens anyway and
    quantiles keep reading it."""
    stats = {o.stat for o in ops_in_key}
    return bool(stats & {"median", "quantile"}) \
        and not (stats & {"unique", "frac", "weighted_frac"})


def _window_quantiles_fused(h: DataFrame, p: str, ops_in_key,
                            stats: set) -> DataFrame:
    """Single-pass histogram finalize for the JVM-window quantile path:
    ONE window pass over the merged per-zone (value, coverage) histogram
    computes the quantile helper columns (same expression sequence as
    the pandas-UDF path, digit-for-digit the reference algorithm,
    weighted_quantiles.cpp:21-75), and ONE final per-zone aggregation
    computes variety / majority / minority AND every requested quantile
    together.  Replaces the previous shape — persist(h) + a separate
    per-zone agg + a separate window sub-plan + two joins — with a
    single pipeline: explode → (zone, v) agg → window → zone agg.
    Measured on the q_hist bench shape (sf0.1, 32 cores): 1.23 s →
    0.82 s; the h cache materialization job and one join disappear.
    Bit-identical: the quantile expressions are unchanged, and
    variety/majority/minority aggregate the same (v, ci) rows."""
    from pyspark.sql import Window

    wo = Window.partitionBy("zone_id").orderBy("v")
    wp = Window.partitionBy("zone_id")
    o = h.select(
        "zone_id", "v", "ci",
        (F.row_number().over(wo) - 1).alias("i"),
        F.sum("ci").over(wo.rowsBetween(Window.unboundedPreceding, -1))
         .alias("cumprev"),
        F.count("*").over(wp).alias("n"),
        F.sum("ci").over(wp).alias("sw"))
    o = o.select(
        "zone_id", "v", "ci",
        (F.col("i") * F.col("ci")
         + (F.col("n") - 1) * F.coalesce(F.col("cumprev"), F.lit(0.0))).alias("s"),
        (F.col("sw") * (F.col("n") - 1)).alias("sn"))
    q2 = o.select(
        "zone_id", F.col("v").alias("x"), "ci", "s", "sn",
        F.lead("v").over(wo).alias("nx"),
        F.lead("s").over(wo).alias("ns"))
    aggs = []
    if "variety" in stats:
        aggs.append(F.count("*").alias(p + "variety"))
    if stats & {"majority", "mode"}:
        aggs.append(F.max_by("x", F.struct("ci", "x")).alias(p + "majority"))
    if "minority" in stats:
        aggs.append(F.min_by("x", F.struct("ci", "x")).alias(p + "minority"))
    for op in ops_in_key:
        if op.stat not in ("median", "quantile"):
            continue
        t = F.lit(0.5 if op.stat == "median" else op.q) * F.col("sn")
        hit = (F.col("s") <= t) & (F.col("ns").isNull() | (F.col("ns") > t))
        val = F.when(F.col("ns").isNull(), F.col("x")).otherwise(
            F.col("x") + (t - F.col("s")) * (F.col("nx") - F.col("x"))
            / (F.col("ns") - F.col("s")))
        aggs.append(F.max(F.when(hit, val)).alias(f"{p}q_{op.name}"))
    return q2.groupBy("zone_id").agg(*aggs)


def _python_op_udf(fn, weighted: bool, result_type: str):
    """Custom-op finalizer: calls the user function once per zone with
    masked numpy arrays — the reference PythonOperation contract
    (operation_bindings.cpp:75-99).  Skipped (NULL) for zones with no
    intersecting cells, like the reference never calling the op for
    non-intersecting features."""
    @F.pandas_udf(result_type)
    def u(cells: pd.Series) -> pd.Series:
        out = []
        for c in cells:
            if c is None or len(c) == 0:
                out.append(None)
                continue
            vals = np.ma.masked_array(np.array([e["v"] for e in c], dtype=np.float64))
            cov = np.array([e["cov"] for e in c], dtype=np.float64)
            if weighted:
                w = np.array([e["w"] for e in c], dtype=np.float64)
                r = fn(vals, cov, w)
            else:
                r = fn(vals, cov)
            if isinstance(r, np.ndarray):
                r = r.tolist()
            elif isinstance(r, np.generic):
                r = r.item()
            out.append(r)
        return pd.Series(out, dtype="object")
    return u


def _finalize_exprs(i: int, ops_in_key: list[Op], int_values: bool = False,
                    store_xy: bool = False,
                    dtype_results: bool = False) -> list[Column]:
    """dtype_results: cast cell-valued results (min/max/mode/minority/
    unique/values/median/quantile) to the integer cell dtype — the
    reference's result typing for integer rasters
    (operation.cpp:115-206).  Default float64 keeps ANSI-SQL-comparable
    output."""
    p = f"k{i}_"
    sum_c, sum_cx = F.col(p + "sum_c"), F.col(p + "sum_cx")
    mean = sum_cx / sum_c
    exprs = []
    for op in ops_in_key:
        s = op.stat
        if s == "count":
            e = F.coalesce(sum_c, F.lit(0.0))
        elif s == "sum":
            e = F.coalesce(sum_cx, F.lit(0.0))
        elif s == "mean":
            e = F.when(sum_c > 0, mean)
        elif s == "min":
            e = F.col(p + "mins.v") if store_xy else F.col(p + "min_v_agg")
        elif s == "max":
            e = F.col(p + "maxs.v") if store_xy else F.col(p + "max_v_agg")
        elif s == "min_center_x":
            e = F.col(p + "mins.x")
        elif s == "min_center_y":
            e = F.col(p + "mins.y")
        elif s == "max_center_x":
            e = F.col(p + "maxs.x")
        elif s == "max_center_y":
            e = F.col(p + "maxs.y")
        elif s in ("variance", "stdev", "coefficient_of_variation"):
            if op.stable:
                svw = F.col(p + "svar_w")
                var = F.greatest(F.col(p + "svar_m2") / svw, F.lit(0.0))
                if s == "variance":
                    e = F.when(svw > 0, var)
                elif s == "stdev":
                    e = F.when(svw > 0, F.sqrt(var))
                else:
                    e = F.when(svw > 0, F.sqrt(var) / F.col(p + "svar_mean"))
            else:
                var = F.greatest(F.col(p + "sum_cx2") / sum_c - mean * mean, F.lit(0.0))
                if s == "variance":
                    e = F.when(sum_c > 0, var)
                elif s == "stdev":
                    e = F.when(sum_c > 0, F.sqrt(var))
                else:
                    e = F.when(sum_c > 0, F.sqrt(var) / mean)
        elif s == "weighted_count":
            # any merged partial with an undefined weight (no default)
            # makes the weighted stats undefined (reference NaN
            # propagation, raster_stats.h:252-296)
            wok = ~F.coalesce(F.col(p + "w_undef"), F.lit(False))
            e = F.when(wok, F.coalesce(F.col(p + "sum_cw"), F.lit(0.0)))
        elif s == "weighted_sum":
            wok = ~F.coalesce(F.col(p + "w_undef"), F.lit(False))
            e = F.when(wok, F.coalesce(F.col(p + "sum_cxw"), F.lit(0.0)))
        elif s == "weighted_mean":
            wok = ~F.coalesce(F.col(p + "w_undef"), F.lit(False))
            e = F.when(wok & (F.col(p + "sum_cw") != 0),
                       F.col(p + "sum_cxw") / F.col(p + "sum_cw"))
        elif s in ("weighted_variance", "weighted_stdev"):
            wok = ~F.coalesce(F.col(p + "w_undef"), F.lit(False))
            wmean = F.col(p + "sum_cxw") / F.col(p + "sum_cw")
            wvar = F.greatest(F.col(p + "sum_cx2w") / F.col(p + "sum_cw") - wmean * wmean,
                              F.lit(0.0))
            e = F.when(wok & (F.col(p + "sum_cw") != 0),
                       wvar if s == "weighted_variance" else F.sqrt(wvar))
        elif s == "variety":
            e = F.coalesce(F.col(p + "variety"), F.lit(0).cast("long"))
        elif s in ("majority", "mode"):
            e = F.col(p + "majority")
        elif s == "minority":
            e = F.col(p + "minority")
        elif s == "unique":
            e = F.expr(f"transform({p}hist_sorted, s -> s.v)")
        elif s == "frac":
            e = F.expr(f"transform({p}hist_sorted, s -> s.ci / {p}hist_sum_ci)")
        elif s == "weighted_frac":
            e = F.expr(f"transform({p}hist_sorted, s -> s.ciw / {p}hist_sum_ciw)")
        elif s in ("median", "quantile"):
            if _quantiles_via_window(ops_in_key):
                e = F.col(f"{p}q_{op.name}")
            else:
                e = _quantile_udf(0.5 if s == "median" else op.q)(
                    F.col(p + "hist_sorted"))
            if int_values:
                # result type is the cell type (operation.cpp:115-206):
                # interpolated quantiles truncate toward zero for integer
                # rasters, like the reference's static_cast<T>
                e = e.cast("long").cast("double")
        elif s == "values":
            e = F.expr(f"transform({p}cells_sorted, s -> s.v)")
        elif s == "coverage":
            e = F.expr(f"transform({p}cells_sorted, s -> s.cov)")
        elif s == "weights":
            e = F.expr(f"transform({p}cells_sorted, s -> s.w)")
        elif s == "center_x":
            e = F.expr(f"transform({p}cells_sorted, s -> s.x)")
        elif s == "center_y":
            e = F.expr(f"transform({p}cells_sorted, s -> s.y)")
        elif s == "cell_id":
            e = F.expr(f"transform({p}cells_sorted, s -> s.cell_id)")
        elif s == "python":
            e = _python_op_udf(op.fn, op.weights is not None, op.result_type)(
                F.col(p + "cells_sorted"))
        else:
            raise ValueError(f"unhandled stat {s}")
        if dtype_results:
            if s in ("min", "max", "majority", "mode", "minority",
                     "median", "quantile"):
                e = e.cast("long")
            elif s in ("unique", "values"):
                e = F.transform(e, lambda x: x.cast("long"))
        exprs.append(e.alias(op.name))
    return exprs


class ZonalExtractor:
    """Reusable extraction context: zone bboxes, geometry broadcast and
    the tile⋈zone-list join are prepared once; ``extract(ops)`` can then
    run many op-sets against the same join (the reference reuses one
    processor across its Operation list the same way)."""

    def __init__(self, zones: DataFrame, tiles: DataFrame, *,
                 weight_tiles: DataFrame | None = None,
                 strategy: str = "auto",
                 grid: dict | None = None,
                 tile_size: int | None = None,
                 persist_joined: bool = False):
        if strategy not in ("auto", "broadcast", "shuffle"):
            raise ValueError(f"unknown strategy {strategy!r}: "
                             "expected 'auto', 'broadcast' or 'shuffle'")
        spark = zones.sparkSession
        if grid is None:
            grid = tiles.select("grid_xmin", "grid_ymax", "dx", "dy",
                                "grid_nrows", "grid_ncols").first().asDict()
        if tile_size is None:
            from .grid import infer_tile_size
            tile_size = infer_tile_size(grid, tiles)
        # CRS validation (reference exact_extract.py:297-360): a zones
        # table may carry a constant `crs` column; raster CRS comes from
        # the grid dict or a tile-table `crs` column.  Mismatches warn —
        # like the reference — because coordinates are not reprojected
        # anywhere in the engine.
        _warn_on_crs_mismatch(_table_crs(zones), tiles, grid, weight_tiles)
        values_dtype = grid.get("dtype")
        if values_dtype is None:
            values_dtype = tiles.select("dtype").first()[0]
        # scale/offset produce float values regardless of storage dtype,
        # so integer-raster result semantics (quantile truncation) are off
        self.int_values = np.dtype(values_dtype).kind in "iu" \
            and "scale" not in tiles.columns
        self.has_weights = weight_tiles is not None

        # zone bbox parse is op-independent: cache it (used by the
        # pair explode AND the final left join).  _zone_ord records the
        # input row order for preserve_order output (the reference's
        # pandas writer reindexes to the input GeoDataFrame,
        # exact_extract.py:497-501).
        had_bbox = "xmin" in zones.columns
        zones_b = attach_bbox(zones).withColumn(
            "_zone_ord", F.monotonically_increasing_id()).persist()
        self.zones_b = zones_b

        tiles_in = tiles
        if self.has_weights:
            w = prepare_weight_frame(weight_tiles, grid, tile_size)
            tiles_in = join_weight_frame(tiles, w)

        if strategy == "auto":
            strategy = "broadcast" \
                if count_and_validate(zones_b, validate=not had_bbox) \
                <= BROADCAST_ZONE_LIMIT else "shuffle"
        elif not had_bbox:
            raise_on_invalid_zones(zones_b)
        self.strategy = strategy

        self.geom_lookup = None
        self._pairs_agg = None
        if strategy == "broadcast":
            geoms = {r["zone_id"]: r["geometry"]
                     for r in zones_b.select("zone_id", "geometry").collect()}
            self.geom_lookup = spark.sparkContext.broadcast(geoms)
            pairs = zone_tile_pairs(zones_b.select("zone_id", "xmin", "ymin", "xmax", "ymax"),
                                    grid, tile_size)
            # ship each tile payload across the JVM->Arrow boundary exactly
            # once: attach the per-tile zone hit-list (the STRtree-query
            # analog, raster_parallel_processor.cpp:142-162) to the tile row
            pairs_agg = (pairs.groupBy("tile_row", "tile_col")
                         .agg(F.collect_list("zone_id").alias("zone_ids"))).persist()
            self._pairs_agg = pairs_agg
            self.joined = tiles_in.join(F.broadcast(pairs_agg), ["tile_row", "tile_col"])
        else:
            # shuffle strategy: group the (zone, tile) pairs into one
            # row per tile BEFORE joining, so each tile payload crosses
            # the shuffle exactly once (joining raw pairs would copy the
            # payload once per matching zone — at a 100k-zone hot tile
            # that is GBs of duplication).  Geometry WKT rides in the
            # per-tile zone list.
            pairs = zone_tile_pairs(
                zones_b.select("zone_id", "geometry", "xmin", "ymin", "xmax", "ymax"),
                grid, tile_size)
            pairs_agg = (pairs.groupBy("tile_row", "tile_col")
                         .agg(F.collect_list(F.struct("zone_id", "geometry"))
                              .alias("zone_structs")))
            self.joined = tiles_in.join(pairs_agg, ["tile_row", "tile_col"])
        self._joined_persisted = persist_joined
        if persist_joined:
            # materialize the tile⋈zone-list join once: repeated
            # extract() calls then skip the per-query broadcast build
            self.joined = self.joined.persist()

    def extract(self, ops, *, include_cols: list[str] | None = None,
                frac_as_map: bool = False, undefined: str = "null",
                dtype_results: bool = False, preserve_order: bool = False,
                compat: bool = False, _progress_acc=None) -> DataFrame:
        """Run an op list against the prepared join.

        frac_as_map: return each frac/weighted_frac column as a
          map<value, fraction> instead of parallel arrays, auto-adding
          the hidden unique op the reference adds
          (exact_extract.py:251-265).
        undefined: "null" (SQL-native, default) or "nan" — the
          reference writes NaN for undefined scalar statistics
          (test_exact_extract.py NaN expectations).
        dtype_results: return min/max/mode/minority/unique/values/
          median/quantile in the CELL dtype for integer rasters
          (operation.cpp:115-206) instead of float64.
        preserve_order: sort the output to the zones input row order
          (the reference's pandas writer reindexes to the input
          GeoDataFrame, exact_extract.py:497-501).  Default off: an
          unordered result avoids a full sort of the final (small)
          per-zone table.
        compat: reference-compatibility preset — turns on
          dtype_results, undefined="nan" and preserve_order, so output
          rows look like the reference's pandas output."""
        import dataclasses

        if compat:
            dtype_results = True
            undefined = "nan"
            preserve_order = True

        if not hasattr(self, "_caches"):
            # persisted intermediates (partials / merged histograms)
            # accumulated across extract() calls, released by close()
            # (ADVICE r5: they leaked for the session lifetime)
            self._caches = []
        wname = "weights" if self.has_weights else None
        op_list = parse_ops(ops, weights=wname) \
            if not all(isinstance(o, Op) for o in ops) else list(ops)
        frac_ops = [o for o in op_list if o.stat in ("frac", "weighted_frac")]
        uniq_of: dict = {}
        if frac_as_map and frac_ops:
            for o in op_list:
                if o.stat == "unique":
                    uniq_of[o.key] = o.name
            hidden = []
            for n, key in enumerate({o.key for o in frac_ops}):
                if key not in uniq_of:
                    proto = next(o for o in frac_ops if o.key == key)
                    h = dataclasses.replace(proto, stat="unique",
                                            name=f"__unique_{n}")
                    hidden.append(h)
                    uniq_of[key] = h.name
            op_list = op_list + hidden
        keygroups = group_ops_by_key(op_list)
        inc = list(include_cols or [])
        res = _assemble(self.zones_b, self.joined, keygroups,
                        geom_lookup=self.geom_lookup, has_weights=self.has_weights,
                        int_values=self.int_values,
                        include_cols=inc + (["_zone_ord"] if preserve_order else []),
                        dtype_results=self.int_values and dtype_results,
                        progress_acc=_progress_acc,
                        cache_registry=self._caches)
        if preserve_order:
            res = res.orderBy("_zone_ord").drop("_zone_ord")
        if frac_as_map and frac_ops:
            for o in frac_ops:
                res = res.withColumn(o.name, F.map_from_arrays(
                    F.col(uniq_of[o.key]), F.col(o.name)))
            res = res.drop(*[n for n in uniq_of.values()
                             if n.startswith("__unique_")])
        if undefined == "nan":
            # the reference writes NaN (not null) for undefined scalar
            # STATISTICS — zone_id / include_cols attributes keep their
            # legitimate NULLs.  dtype_results LongType columns cannot
            # hold NaN; they stay SQL NULL, which toPandas() renders as
            # a float64 column with NaN — exactly what the reference's
            # pandas output does when an integer-typed stat has missing
            # features (pandas has no nullable-int default either).
            op_names = {o.name for o in op_list}
            for f in res.schema.fields:
                if f.name in op_names and isinstance(f.dataType, T.DoubleType):
                    res = res.withColumn(
                        f.name, F.coalesce(F.col(f.name), F.lit(float("nan"))))
        return res

    def extract_collect(self, ops, *, progress=None, poll_interval: float = 0.5,
                        **kw) -> list:
        """Materialize results with a driver-side progress callback —
        the reference's progress reporting for plain (non-checkpointed)
        extraction (processor.h:124-136).  ``progress(fraction,
        message)`` is invoked from a monitor thread as tile rows
        complete; fraction reaches 1.0 when the action finishes."""
        if progress is None:
            return self.extract(ops, **kw).collect()
        import threading

        spark = self.zones_b.sparkSession
        acc = spark.sparkContext.accumulator(0)
        # the tile-row total only depends on the prepared join — compute
        # it once per extractor, not once per progress-enabled call
        if not hasattr(self, "_joined_total"):
            self._joined_total = self.joined.count()
        total = max(self._joined_total, 1)
        df = self.extract(ops, _progress_acc=acc, **kw)
        done = threading.Event()

        def monitor():
            last = -1
            while not done.wait(poll_interval):
                v = min(acc.value, total)
                if v != last:
                    progress(v / total, f"{v}/{total} tiles")
                    last = v

        t = threading.Thread(target=monitor, daemon=True)
        t.start()
        try:
            rows = df.collect()
        finally:
            done.set()
            t.join(timeout=2 * poll_interval)
        progress(1.0, f"{total}/{total} tiles")
        return rows

    def close(self) -> None:
        """Release cached state (zone bboxes, pair join, geometry
        broadcast).  Long-lived sessions that build many extractors
        should call this (or use the context manager) once the last
        result derived from this extractor has been materialized."""
        self.zones_b.unpersist()
        for df in getattr(self, "_caches", ()):
            df.unpersist()
        if self._pairs_agg is not None:
            self._pairs_agg.unpersist()
        if self._joined_persisted:
            self.joined.unpersist()
        if self.geom_lookup is not None:
            self.geom_lookup.unpersist()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def exact_extract(zones: DataFrame, tiles: DataFrame, ops, *,
                  weight_tiles: DataFrame | None = None,
                  include_cols: list[str] | None = None,
                  strategy: str = "auto",
                  grid: dict | None = None,
                  tile_size: int | None = None,
                  frac_as_map: bool = False,
                  undefined: str = "null",
                  dtype_results: bool = False,
                  preserve_order: bool = False,
                  compat: bool = False) -> DataFrame:
    """Compute zonal statistics — the engine's primary entry point
    (reference: python exact_extract,
    /root/reference/python/src/exactextract/exact_extract.py:363-502).

    zones: (zone_id string, geometry WKT string, ...)
    tiles: tile table from io.tiles_from_docs (or equivalent schema)
    ops:   list of stat descriptors / Op objects (ops.parse_ops)
    frac_as_map / undefined / dtype_results: see ZonalExtractor.extract
    """
    return ZonalExtractor(zones, tiles, weight_tiles=weight_tiles,
                          strategy=strategy, grid=grid, tile_size=tile_size) \
        .extract(ops, include_cols=include_cols, frac_as_map=frac_as_map,
                 undefined=undefined, dtype_results=dtype_results,
                 preserve_order=preserve_order, compat=compat)


def _assemble(zones_b, joined, keygroups, *, geom_lookup, has_weights,
              int_values, include_cols, dtype_results=False, progress_acc=None,
              cache_registry=None):
    partials = run_kernel(joined, keygroups, geom_lookup=geom_lookup,
                          has_weights=has_weights, progress_acc=progress_acc)
    return aggregate_partials(zones_b, partials, keygroups,
                              int_values=int_values, include_cols=include_cols,
                              dtype_results=dtype_results,
                              cache_registry=cache_registry)


def aggregate_partials(zones_b, partials, keygroups, *, int_values=False,
                       include_cols=None, dtype_results=False,
                       cache_registry=None):
    """Merge partial states into final per-zone statistics.  Separated
    from the kernel so checkpoint/resume can merge stored partials
    (checkpoint.py) — the RasterStats::combine stage."""
    # --- scalar aggregation (partial+final merge; RasterStats::combine
    # analog, raster_stats.h:107-155).  Only the state the requested ops
    # actually read is aggregated — pure-histogram/array queries skip
    # the scalar branch (and its shuffle) entirely. ---
    _SCALAR_STATS = {"count", "sum", "mean", "variance", "stdev",
                     "coefficient_of_variation", "weighted_count", "weighted_sum",
                     "weighted_mean", "weighted_variance", "weighted_stdev"}
    # Persist the partials whenever a histogram/cells branch consumes
    # them — even single-consumer.  Measured at 150k zones × 97 value
    # buckets (local[16]): WITHOUT the persist, Catalyst fuses
    # MapInPandas → explode → partial HashAggregate into one stage and
    # the histogram query runs 2× slower (34–49 s vs 17 s); cutting
    # the stage at the compact per-pair rows lets the Python kernel
    # stage and the explode+aggregate stage each run clean.
    need_hist = any(req.histogram for _, req, _ in keygroups)
    need_cells = any(req.cells for _, req, _ in keygroups)
    if need_hist or need_cells:
        partials = partials.persist()
        if cache_registry is not None:
            cache_registry.append(partials)

    aggs = []
    for i, (_, req, ops_in_key) in enumerate(keygroups):
        p = f"k{i}_"
        needs_scalar = any(o.stat in _SCALAR_STATS for o in ops_in_key)
        if not (needs_scalar or req.minmax):
            continue
        aggs += [F.sum(p + "n").alias(p + "n"),
                 F.sum(p + "sum_c").alias(p + "sum_c"),
                 F.sum(p + "sum_cx").alias(p + "sum_cx")]
        if req.variance:
            aggs.append(F.sum(p + "sum_cx2").alias(p + "sum_cx2"))
        if req.weighted:
            aggs += [F.sum(p + "sum_cw").alias(p + "sum_cw"),
                     F.sum(p + "sum_cxw").alias(p + "sum_cxw"),
                     F.max(p + "w_undef").alias(p + "w_undef")]
            if req.weighted_variance:
                aggs.append(F.sum(p + "sum_cx2w").alias(p + "sum_cx2w"))
        if req.minmax and not req.store_xy:
            # plain min/max need no tie-break state — scalar min/max
            # keeps the merge in whole-stage-codegen HashAggregate
            # (struct-valued min/max forces SortAggregate)
            aggs.append(F.min(p + "min_v").alias(p + "min_v_agg"))
            aggs.append(F.max(p + "max_v").alias(p + "max_v_agg"))
        elif req.minmax:
            xy_min = [F.col(p + "min_x").alias("x"), F.col(p + "min_y").alias("y")]
            xy_max = [F.col(p + "max_x").alias("x"), F.col(p + "max_y").alias("y")]
            # ties resolve to lowest cell_id = first-seen in row-major
            # scan order (raster_stats.h:299-311)
            aggs.append(F.min(F.when(F.col(p + "min_v").isNotNull(), F.struct(
                F.col(p + "min_v").alias("v"), F.col(p + "min_cell").alias("cell"),
                *xy_min))).alias(p + "mins"))
            aggs.append(F.max(F.when(F.col(p + "max_v").isNotNull(), F.struct(
                F.col(p + "max_v").alias("v"), (-F.col(p + "max_cell")).alias("negcell"),
                *xy_max))).alias(p + "maxs"))
    result = zones_b.select("zone_id", *(include_cols or []))
    if aggs:
        scalar = partials.groupBy("zone_id").agg(*aggs)
        result = result.join(scalar, "zone_id", "left")

    # --- stable-variance branch: Chan merge of per-pair West states ---
    for i, (_, req, _) in enumerate(keygroups):
        p = f"k{i}_"
        if req.stable_variance:
            def _chan(pdf: pd.DataFrame) -> pd.DataFrame:
                W = M = M2 = 0.0
                for w, m, m2 in zip(pdf.iloc[:, 1], pdf.iloc[:, 2], pdf.iloc[:, 3]):
                    if w is None or pd.isna(w):
                        continue
                    d = m - M
                    Wn = W + w
                    M = M + d * (w / Wn)
                    M2 = M2 + m2 + d * d * W * (w / Wn)
                    W = Wn
                return pd.DataFrame({"zone_id": [pdf.iloc[0, 0]],
                                     "w": [W], "mean": [M], "m2": [M2]})

            sv = (partials.select("zone_id", p + "var_w", p + "var_mean", p + "var_m2")
                  .where(F.col(p + "var_w").isNotNull())
                  .groupBy("zone_id")
                  .applyInPandas(_chan, schema="zone_id string, w double, mean double, m2 double")
                  .select("zone_id", F.col("w").alias(p + "svar_w"),
                          F.col("mean").alias(p + "svar_mean"),
                          F.col("m2").alias(p + "svar_m2")))
            result = result.join(sv, "zone_id", "left")

    # --- histogram branch: per-pair parallel arrays explode JVM-SIDE
    # (arrays_zip + explode are whole-stage-codegen generators over the
    # small per-pair row set), then merge key-wise (mergeable
    # histogram; raster_stats.h:752-757 merged as in combine()).  NaN
    # weighted sums propagate through F.sum (NaN is a value, not NULL,
    # in Spark SQL — reference NaN poisoning).  Only the aggregates
    # the requested ops actually read are built: without a
    # sorted-histogram consumer the per-zone agg stays a cheap scalar
    # aggregation instead of an ObjectHashAggregate collect_list. ---
    _SORTED_STATS = {"unique", "frac", "weighted_frac", "median", "quantile"}
    for i, (_, req, ops_in_key) in enumerate(keygroups):
        p = f"k{i}_"
        if req.histogram:
            stats = {o.stat for o in ops_in_key}
            h = (partials.where(F.col(p + "hist_v").isNotNull())
                 .select("zone_id", F.explode(F.arrays_zip(
                     F.col(p + "hist_v").alias("v"),
                     F.col(p + "hist_ci").alias("ci"),
                     F.col(p + "hist_ciw").alias("ciw"))).alias("h"))
                 .groupBy("zone_id", F.col("h.v").alias("v"))
                 .agg(F.sum("h.ci").alias("ci"), F.sum("h.ciw").alias("ciw")))
            if _quantiles_via_window(ops_in_key):
                # single consumer chain: the fused finalize computes the
                # per-zone histogram stats AND the quantiles in one
                # window + one aggregation — no h persist, one join
                result = result.join(
                    _window_quantiles_fused(h, p, ops_in_key, stats),
                    "zone_id", "left")
            else:
                hz_aggs = [F.count("*").alias(p + "variety")]
                if stats & {"majority", "mode"}:
                    hz_aggs.append(
                        F.max_by("v", F.struct("ci", "v")).alias(p + "majority"))
                if "minority" in stats:
                    hz_aggs.append(
                        F.min_by("v", F.struct("ci", "v")).alias(p + "minority"))
                if "frac" in stats:
                    hz_aggs.append(F.sum("ci").alias(p + "hist_sum_ci"))
                if "weighted_frac" in stats:
                    hz_aggs.append(F.sum("ciw").alias(p + "hist_sum_ciw"))
                if stats & {"unique", "frac", "weighted_frac"}:
                    # the array consumers genuinely need the sorted
                    # histogram materialized per zone; quantiles then
                    # read it too (no benefit splitting the paths when
                    # the collect happens anyway)
                    hz_aggs.append(F.array_sort(F.collect_list(
                        F.struct("v", "ci", "ciw"))).alias(p + "hist_sorted"))
                hz = h.groupBy("zone_id").agg(*hz_aggs)
                result = result.join(hz, "zone_id", "left")
        if req.cells:
            cz = (partials.select("zone_id", F.explode(p + "cells").alias("c"))
                  .groupBy("zone_id")
                  .agg(F.array_sort(F.collect_list(F.struct(
                      "c.cell_id", "c.v", "c.cov", "c.w", "c.x", "c.y"))).alias(p + "cells_sorted")))
            result = result.join(cz, "zone_id", "left")

    final_cols = [F.col("zone_id"), *[F.col(c) for c in (include_cols or [])]]
    for i, (_, req, ops_in_key) in enumerate(keygroups):
        final_cols += _finalize_exprs(i, ops_in_key, int_values, req.store_xy,
                                      dtype_results)
    return result.select(*final_cols)
