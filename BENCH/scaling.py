#!/usr/bin/env python3
"""N-vs-4N scaling evidence (BASELINE.json north rule).

The sandbox has no multi-node cluster, so the rule's two-cluster-size
criterion is evidenced by running the SAME job on the SAME input at two
parallelism levels: local[8] (N) and local[32] (4N).  Each level runs
in its own JVM (subprocess).  Reports throughput at both levels and the
scaling efficiency  eff = (thr_4N / thr_N) / 4, target >= 0.8.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPO = HERE.parent

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from exactextract_spark.session import get_spark
from exactextract_spark import io as eio
from exactextract_spark.extract import ZonalExtractor
from exactextract_spark.fixtures import SynthConfig, build_docs
import bench as B

cores = int(sys.argv[1])
G, Z = int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(app=f"scaling-{{cores}}", cores=cores, shuffle_partitions=cores)
cfg = SynthConfig(G=G, Z=Z)
docs = build_docs(spark, cfg)
zones = eio.zones_from_docs(docs)
meta = {{r['raster_id']: r.asDict() for r in eio.raster_meta_from_docs(docs).collect()}}
tiles = eio.tiles_from_docs(docs, 'r0', meta['r0']).repartition(cores).persist()
tiles.count()
grid = cfg.grid_dict(); grid['dtype'] = 'float64'
zones_all = zones.unionByName(
    B.big_zones(spark, cfg).withColumn('props', F.lit(None).cast('map<string,string>')))
ext = ZonalExtractor(zones_all, tiles, grid=grid, strategy='broadcast')

def once():
    ext.extract(['count', 'sum', 'mean', 'min', 'max']).write \
       .format('noop').mode('overwrite').save()

once()  # warmup
times = []
for _ in range(3):
    t0 = time.time(); once(); times.append(time.time() - t0)

from exactextract_spark.extract import attach_bbox, zone_tile_pairs
pairs = zone_tile_pairs(attach_bbox(zones_all), grid, cfg.tile)
px = tiles.join(F.broadcast(pairs.select('zone_id', 'tile_row', 'tile_col')),
                ['tile_row', 'tile_col']) \
          .select(F.sum(F.col('nrows') * F.col('ncols'))).first()[0]
n_zones = zones_all.count()
print("RESULT " + json.dumps({{"cores": cores, "best_sec": min(times),
                              "times": times, "pixels": int(px),
                              "zones": n_zones}}))
spark.stop()
""".format(repo=str(REPO))


def run_level(cores: int, G: int, Z: int) -> dict:
    env = dict(os.environ)
    out = subprocess.run([sys.executable, "-c", WORKER, str(cores), str(G), str(Z)],
                         capture_output=True, text=True, env=env, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main():
    # the job must be compute-dominated for a meaningful parallel-scaling
    # measurement: ~1.5e9 pixel-reads ≈ 60 CPU-seconds of kernel work
    G = int(os.environ.get("SPARK_GRAFT_SCALE_G", "6144"))
    Z = int(os.environ.get("SPARK_GRAFT_SCALE_Z", "250000"))
    n = run_level(8, G, Z)
    n4 = run_level(32, G, Z)
    thr_n = n["pixels"] / n["best_sec"]
    thr_4n = n4["pixels"] / n4["best_sec"]
    eff = (thr_4n / thr_n) / 4.0
    result = {
        "metric": "scaling efficiency N->4N (local[8] vs local[32])",
        "value": round(eff, 3),
        "unit": "ratio",
        "n": {"cores": 8, "sec": round(n["best_sec"], 3),
              "pixels_per_sec": round(thr_n, 1),
              "polygons_per_sec": round(n["zones"] / n["best_sec"], 1)},
        "4n": {"cores": 32, "sec": round(n4["best_sec"], 3),
               "pixels_per_sec": round(thr_4n, 1),
               "polygons_per_sec": round(n4["zones"] / n4["best_sec"], 1)},
        "input": {"grid_cells": G * G, "zones": n["zones"], "pixels_per_run": n["pixels"]},
    }
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE.md — scaling evidence (N vs 4N)

BASELINE.json requires throughput scaling efficiency >= 0.8 from N to 4N
executors.  No real cluster exists in this sandbox, so per the driver's
instruction the SAME job ran on the SAME input at two parallelism
levels, each in its own JVM:

| level | cores | best wall (s) | pixels/sec | polygons/sec |
|---|---|---|---|---|
| N  | 8  | {n['best_sec']:.3f} | {thr_n:,.0f} | {n['zones'] / n['best_sec']:,.1f} |
| 4N | 32 | {n4['best_sec']:.3f} | {thr_4n:,.0f} | {n4['zones'] / n4['best_sec']:,.1f} |

**Scaling efficiency = (thr_4N / thr_N) / 4 = {eff:.3f}** (target >= 0.8).

Job: q_basic (count/sum/mean/min/max) over a {G}x{G} grid
({G * G:,} cells), {n['zones']:,} zones incl. 8 giant skew zones,
{n['pixels']:,} pixel-reads per run; best of 3 warm runs after 1 warmup.
All runs: `exactextract_spark` broadcast strategy, AQE on,
spark.sql.shuffle.partitions = cores.

Reference points (BASELINE.md): the reference's best published
single-node figure is ~6.7 polygons/sec / ~1.3e8 px/s (67 large county
polygons x optimally-chunked NetCDF via GDAL's C++ I/O path); this
engine at 4N reaches {n4['zones'] / n4['best_sec']:,.0f} polygons/sec on
{n['zones']:,} small-to-giant zones.
"""
    (HERE / "BASELINE.md").write_text(md)


if __name__ == "__main__":
    main()
