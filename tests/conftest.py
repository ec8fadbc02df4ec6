import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from exactextract_spark.session import get_spark

    s = get_spark(app="exactextract-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def extract_mem(spark):
    """exact_extract over an in-memory numpy raster + WKT zones — the
    test harness mirroring the reference's
    exact_extract(NumPyRasterSource, JSONFeatureSource, ops)."""
    import numpy as np

    from exactextract_spark.extract import exact_extract
    from exactextract_spark.io import tiles_from_array

    def run(arr, zones_wkt, ops, *, weights=None, nodata=None, w_nodata=None,
            tile=64, **kw):
        arr = np.asarray(arr)
        tiles = tiles_from_array(spark, arr, nodata=nodata, tile=tile)
        wt = None
        if weights is not None:
            wt = tiles_from_array(spark, np.asarray(weights), nodata=w_nodata,
                                  tile=tile, raster_id="w")
        if isinstance(zones_wkt, str):
            zones_wkt = {"z0": zones_wkt}
        zdf = spark.createDataFrame(list(zones_wkt.items()), ["zone_id", "geometry"])
        res = exact_extract(zdf, tiles, ops, weight_tiles=wt, **kw)
        rows = {r["zone_id"]: r.asDict() for r in res.collect()}
        return rows if len(zones_wkt) > 1 else rows[next(iter(zones_wkt))]

    return run


def rect_wkt(x0, y0, x1, y1):
    return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))")
