#!/usr/bin/env python3
"""q_hist stage-time breakdown (VERDICT r4 item 5).

q_hist (variety+majority+median) is the one suite query still >2x
q_basic.  This decomposes it by timing nested subsets on the exact
bench fixture (sf0.1, persisted join, best-of-2 after warmup):

  q_count    count only             -> kernel + scan + scalar agg floor
  q_variety  variety                -> + hist partial arrays + explode +
                                       (zone,value) partial/final agg +
                                       per-zone scalar agg
  q_varmaj   variety+majority       -> + max_by finalizer (same shuffles)
  q_full     variety+majority+median-> + collect_list(struct) sorted agg
                                       + quantile pandas-UDF finalizer

Deltas attribute the residual over q_basic to (a) the histogram
partial+explode+two-level agg and (b) the sorted-histogram consumer.
Run EXCLUSIVELY (host load < 2 at start) or numbers are noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import big_zones  # noqa: E402
from exactextract_spark import io as eio  # noqa: E402
from exactextract_spark.extract import ZonalExtractor  # noqa: E402
from exactextract_spark.fixtures import SynthConfig, build_docs  # noqa: E402
from exactextract_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cores)
    load0 = tuple(round(v, 2) for v in os.getloadavg())

    cfg = SynthConfig.from_sf_dir(sf_dir)
    docs = build_docs(spark, cfg).persist()
    zones = eio.zones_from_docs(docs)
    meta = {r["raster_id"]: r.asDict()
            for r in eio.raster_meta_from_docs(docs).collect()}
    tiles = eio.tiles_from_docs(docs, "r0", meta["r0"]).repartition(cores).persist()
    tiles.count()
    grid = cfg.grid_dict()
    grid["dtype"] = "float64"
    zones_all = zones.unionByName(
        big_zones(spark, cfg).withColumn("props",
                                         F.lit(None).cast("map<string,string>")))
    ext = ZonalExtractor(zones_all, tiles, grid=grid, strategy="broadcast",
                         persist_joined=True)

    def timeit(fn):
        fn().write.format("noop").mode("overwrite").save()  # warmup
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    t = {}
    t["q_count"] = timeit(lambda: ext.extract(["count"]))
    t["q_variety"] = timeit(lambda: ext.extract(["variety"]))
    t["q_varmaj"] = timeit(lambda: ext.extract(["variety", "majority"]))
    t["q_median_only"] = timeit(lambda: ext.extract(["median"]))
    t["q_full"] = timeit(lambda: ext.extract(["variety", "majority", "median"]))

    out = {
        "metric": "q_hist breakdown (best-of-2, warm)",
        "sf_dir": sf_dir, "cores": cores,
        "host_load_start": load0,
        "host_load_end": tuple(round(v, 2) for v in os.getloadavg()),
        "timings": t,
        "deltas": {
            "hist_partials_explode_2level_agg": round(t["q_variety"] - t["q_count"], 3),
            "majority_max_by": round(t["q_varmaj"] - t["q_variety"], 3),
            "sorted_collect_plus_quantile_udf": round(t["q_full"] - t["q_varmaj"], 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
