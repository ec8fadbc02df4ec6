"""exactextract_spark — a from-scratch, PySpark-native zonal-statistics
and spatial-tiling engine with the query/data-processing capabilities of
isciences/exactextract (reference studied read-only at /root/reference;
no code copied — the execution model is Spark DataFrames + Arrow-batched
numpy kernels, not the reference's C++ per-cell traversal engine)."""

from .api import frac_as_map, unnest_arrays
from .extract import (ZonalExtractor, attach_bbox, crs_matches,
                      exact_extract, raise_on_invalid_zones)
from .geom import parse_wkt
from .grid import RasterGrid
from .io import (tiles_from_array, write_geojson, zones_from_docs,
                 zones_from_geojson)
from .kernel import cell_lengths, coverage_fraction
from .ops import Op, parse_op, parse_ops
from .subdivide import subdivide

__all__ = ["exact_extract", "ZonalExtractor", "crs_matches", "parse_wkt",
           "RasterGrid", "coverage_fraction", "cell_lengths", "Op",
           "parse_op", "parse_ops", "subdivide", "tiles_from_array",
           "write_geojson", "zones_from_docs", "zones_from_geojson",
           "attach_bbox", "raise_on_invalid_zones", "unnest_arrays",
           "frac_as_map"]
__version__ = "0.1.0"
