"""Command-line interface mirroring the reference CLI surface
(/root/reference/src/exactextract.cpp:54-193):

  exactextract-spark \
      --polygons zones.parquet --fid zone_id --geom geometry \
      --raster values=tiles.parquet [--weights w=tiles.parquet] \
      --stat "mean" --stat "q3=quantile(q=0.75)" \
      [--include-col props] [--strategy broadcast|shuffle|auto] \
      [--docs docs.parquet --raster-id r0]  (interleaved-doc input) \
      --output out.parquet

Reads zones/tiles from parquet (or an interleaved-docs table), runs the
engine, writes the result parquet.  ``--id-name/--id-type`` re-cast the
feature id like the reference's OGR SQL trick (exactextract.cpp:195-236).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("exactextract-spark")
    p.add_argument("--polygons",
                   help="zone rows: parquet, or GeoJSON "
                        "(.geojson/.json FeatureCollection, "
                        ".jsonl/.ndjson feature-per-line)")
    p.add_argument("--fid", default=None,
                   help="zone id column (parquet) / id property (GeoJSON); "
                        "default: 'zone_id' column / the Feature id member")
    p.add_argument("--geom", default="geometry", help="WKT geometry column")
    p.add_argument("--docs", help="interleaved-docs table: parquet path or catalog/Iceberg table name")
    p.add_argument("--raster", required=False, action="append",
                   help="NAME=tiles.parquet or raster id in --docs; "
                        "repeatable — several rasters run as ONE fused "
                        "tile scan with {name}_{stat} output columns "
                        "(reference: repeated -r)")
    p.add_argument("--include-geom", action="store_true",
                   help="include the zone geometry (WKT) in the output")
    p.add_argument("--weights", help="NAME=tiles.parquet or raster id in --docs")
    p.add_argument("--stat", "-s", action="append", dest="stats")
    p.add_argument("--subdivide", action="store_true",
                   help="emit per-cell covered polygons instead of stats "
                        "(the reference's separate `subdivide` CLI)")
    p.add_argument("--include-col", action="append", default=[], dest="include_cols")
    p.add_argument("--id-name", help="rename the id column in the output")
    p.add_argument("--id-type", help="cast the id column (e.g. bigint)")
    p.add_argument("--strategy", default="auto",
                   choices=["auto", "broadcast", "shuffle"])
    p.add_argument("--frac-as-map", action="store_true",
                   help="return frac/weighted_frac as map<value,fraction>")
    p.add_argument("--undefined", default="null", choices=["null", "nan"],
                   help="representation of undefined scalar stats")
    p.add_argument("--dtype-results", action="store_true",
                   help="cell-typed results for integer rasters")
    p.add_argument("--preserve-order", action="store_true",
                   help="output rows in zones input order")
    p.add_argument("--compat", action="store_true",
                   help="reference-compatible output: dtype-results + "
                        "NaN undefined + input row order")
    p.add_argument("--output", "-o", required=True)
    p.add_argument("--cores", type=int, default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.subdivide and not args.stats:
        print("--stat is required (or pass --subdivide)", file=sys.stderr)
        return 2
    from pyspark.sql import functions as F

    from . import io as eio
    from .extract import exact_extract
    from .session import get_spark

    spark = get_spark(app="exactextract-cli", cores=args.cores)

    rasters = args.raster or []
    multi = {}
    if args.docs:
        docs = eio.read_docs(spark, args.docs)
        zones = eio.zones_from_docs(docs)
        meta = {r["raster_id"]: r.asDict()
                for r in eio.raster_meta_from_docs(docs).collect()}
        rids = rasters or [next(iter(meta))]
        for r in rids:
            multi[r] = eio.tiles_from_docs(docs, r, meta[r])
        tiles = multi[rids[0]]
        wtiles = eio.tiles_from_docs(docs, args.weights, meta[args.weights]) \
            if args.weights else None
    else:
        if not args.polygons or not rasters:
            print("either --docs or both --polygons and --raster are required",
                  file=sys.stderr)
            return 2
        if args.polygons.endswith((".geojson", ".json", ".jsonl", ".ndjson")):
            zones = eio.zones_from_geojson(spark, args.polygons,
                                           id_property=args.fid)
        else:
            zones = spark.read.parquet(args.polygons) \
                .withColumnRenamed(args.fid or "zone_id", "zone_id") \
                .withColumnRenamed(args.geom, "geometry")
        for i, spec in enumerate(rasters):
            name, _, tpath = spec.partition("=")
            multi[name if tpath else f"r{i}"] = \
                spark.read.parquet(tpath or spec)
        tiles = next(iter(multi.values()))
        wtiles = None
        if args.weights:
            _, _, wpath = args.weights.partition("=")
            wtiles = spark.read.parquet(wpath or args.weights)
    include_cols = list(args.include_cols or [])
    if args.include_geom:
        include_cols.append("geometry")

    if args.subdivide:
        # subdivide emits the fixed per-cell schema; fail loudly on
        # flags it cannot honor instead of silently ignoring them
        unsupported = [flag for flag, on in (
            ("--include-geom", args.include_geom),
            ("--include-col", bool(args.include_cols)),
            ("multiple --raster", len(multi) > 1),
            ("--stat", bool(args.stats)),
            ("--weights", bool(args.weights)),
            ("--frac-as-map", args.frac_as_map),
            ("--undefined nan", args.undefined != "null"),
            ("--dtype-results", args.dtype_results),
            ("--preserve-order", args.preserve_order),
            ("--compat", args.compat)) if on]
        if unsupported:
            print("not supported with --subdivide: " + ", ".join(unsupported),
                  file=sys.stderr)
            return 2
        from .subdivide import subdivide as _subdivide
        res = _subdivide(zones, tiles, strategy=args.strategy)
        if args.id_type:
            res = res.withColumn("zone_id", F.col("zone_id").cast(args.id_type))
        if args.id_name:
            res = res.withColumnRenamed("zone_id", args.id_name)
        # the covered piece's polygon lives in the `wkt` column
        _write_output(res, args.output, id_col=args.id_name or "zone_id",
                      geometry_col="wkt")
        return 0

    if len(multi) > 1:
        # the fused multi-raster path supports a subset of the options;
        # fail loudly instead of silently dropping flags
        unsupported = [flag for flag, on in (
            ("--weights", args.weights), ("--frac-as-map", args.frac_as_map),
            ("--undefined nan", args.undefined != "null"),
            ("--dtype-results", args.dtype_results),
            ("--preserve-order", args.preserve_order),
            ("--compat", args.compat),
            ("--strategy", args.strategy != "auto")) if on]
        if unsupported:
            print("not supported with multiple --raster inputs: "
                  + ", ".join(unsupported), file=sys.stderr)
            return 2
        from .api import exact_extract_fused
        res = exact_extract_fused(zones, multi, args.stats,
                                  include_cols=include_cols or None)
    else:
        res = exact_extract(zones, tiles, args.stats, weight_tiles=wtiles,
                            include_cols=include_cols or None,
                            strategy=args.strategy,
                            frac_as_map=args.frac_as_map,
                            undefined=args.undefined,
                            dtype_results=args.dtype_results,
                            preserve_order=args.preserve_order,
                            compat=args.compat)
    if args.id_type:
        res = res.withColumn("zone_id", F.col("zone_id").cast(args.id_type))
    if args.id_name:
        res = res.withColumnRenamed("zone_id", args.id_name)
    _write_output(res, args.output, id_col=args.id_name or "zone_id")
    return 0


def _write_output(res, output: str, *, id_col: str = "zone_id",
                  geometry_col: str = "geometry") -> None:
    """Route the result to parquet (default), newline-delimited GeoJSON,
    or a single CSV file (the reference CLI's default output format,
    exactextract.cpp + gdal_writer.cpp).  CSV cannot hold arrays, so
    array stats unnest first; the final per-zone table is shuffled to
    one partition (repartition keeps the upstream plan parallel) and
    the lone part-file is moved to the requested name."""
    import glob
    import os
    import shutil

    if output.endswith(".csv"):
        from .api import unnest_arrays

        tmp = output + "._spark_tmp"
        try:
            # force an uncompressed part file: a session-level CSV codec
            # would produce part-*.csv.gz and break the single-file move
            (unnest_arrays(res).repartition(1).write.mode("overwrite")
             .option("header", True).option("compression", "none").csv(tmp))
            parts = glob.glob(os.path.join(tmp, "part-*"))
            if not parts:
                raise RuntimeError(f"CSV write produced no part file in {tmp}")
            shutil.move(parts[0], output)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    elif output.endswith((".geojson", ".jsonl", ".ndjson")):
        from .io import write_geojson
        write_geojson(res, output, id_col=id_col, geometry_col=geometry_col)
    else:
        res.write.mode("overwrite").parquet(output)
    print(f"wrote {output}")


if __name__ == "__main__":
    raise SystemExit(main())
