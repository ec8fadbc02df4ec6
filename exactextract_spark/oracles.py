"""DuckDB oracle SQL for the driver's correctness gate.

Every query in __spark_entry__.queries() has a matching ANSI-SQL string
here that recomputes the same result from first principles (range()
generators + closed-form rectangle coverage — no engine code).  The
synthetic fixture (fixtures.py) is quarter-cell aligned, so engine and
oracle agree bit-for-bit, not just to tolerance."""

from __future__ import annotations

from .fixtures import SynthConfig, cells_sql, lines_sql, pairs_sql, points_sql, zone_sql

D = "FILTER (val IS NOT NULL)"


def _agg(cfg: SynthConfig, select: str, extra_cte: str = "") -> str:
    return f"""WITH {pairs_sql(cfg)}{extra_cte}
SELECT zone_id, {select}
FROM pairs GROUP BY zone_id"""


def zonal_basic(cfg):
    return _agg(cfg, f"""
  COALESCE(SUM(cov) {D}, 0.0) AS count,
  COALESCE(SUM(val*cov) {D}, 0.0) AS sum,
  CASE WHEN SUM(cov) {D} > 0
       THEN (SUM(val*cov) {D}) / (SUM(cov) {D}) END AS mean,
  MIN(val) AS min, MAX(val) AS max""")


def zonal_weighted(cfg):
    return _agg(cfg, f"""
  COALESCE(SUM(cov*wgt) {D}, 0.0) AS weighted_count,
  COALESCE(SUM(val*(cov*wgt)) {D}, 0.0) AS weighted_sum,
  CASE WHEN SUM(cov*wgt) {D} <> 0
       THEN (SUM(val*(cov*wgt)) {D}) / (SUM(cov*wgt) {D}) END AS weighted_mean""")


def zonal_weighted_regrid(cfg):
    """Weights from the COARSE raster wc0 (dx=4) consumed transparently
    on the fine value grid: fine cell (r, c) reads coarse cell
    (r//4, c//4) — the RasterView disaggregation semantics."""
    from .fixtures import REG_F as f
    return f"""WITH {pairs_sql(cfg)},
p2 AS (
  SELECT *, CAST(((r // {f})*13 + (c // {f})*7) % 11 AS DOUBLE) AS wgtc
  FROM pairs)
SELECT zone_id,
  COALESCE(SUM(cov*wgtc) {D}, 0.0) AS weighted_count,
  COALESCE(SUM(val*(cov*wgtc)) {D}, 0.0) AS weighted_sum,
  CASE WHEN SUM(cov*wgtc) {D} <> 0
       THEN (SUM(val*(cov*wgtc)) {D}) / (SUM(cov*wgtc) {D}) END AS weighted_mean
FROM p2 GROUP BY zone_id"""


def zonal_scaled(cfg):
    """Raster rs0: int16 storage, on-read value = raw*0.5 + 10, 0/1
    mask band zeroing cells with (r+c)%5 == 0 — reference
    scale_and_offset + mask semantics (python raster.py:102-127,
    src/raster.h:108-127)."""
    return f"""WITH {pairs_sql(cfg)},
p2 AS (
  SELECT zone_id, cov,
         CASE WHEN (r + c) % 5 <> 0 THEN val * 0.5 + 10.0 END AS sval
  FROM pairs)
SELECT zone_id,
  COALESCE(SUM(cov) FILTER (sval IS NOT NULL), 0.0) AS count,
  COALESCE(SUM(sval*cov) FILTER (sval IS NOT NULL), 0.0) AS sum,
  CASE WHEN SUM(cov) FILTER (sval IS NOT NULL) > 0
       THEN (SUM(sval*cov) FILTER (sval IS NOT NULL))
            / (SUM(cov) FILTER (sval IS NOT NULL)) END AS mean,
  MIN(sval) AS min, MAX(sval) AS max
FROM p2 GROUP BY zone_id"""


def zonal_multiband(cfg):
    """Raster mb0, 2 bands in one fused scan: band b adds b*29 before
    the mod-97 (generator arith-v1), same nodata pattern."""
    return f"""WITH {pairs_sql(cfg)},
p2 AS (
  SELECT zone_id, cov, val AS v0,
         CASE WHEN val IS NOT NULL
              THEN CAST((CAST(val AS BIGINT) + 29) % 97 AS DOUBLE) END AS v1
  FROM pairs)
SELECT zone_id,
  COALESCE(SUM(cov) FILTER (v0 IS NOT NULL), 0.0) AS mb0_band_0_count,
  COALESCE(SUM(v0*cov) FILTER (v0 IS NOT NULL), 0.0) AS mb0_band_0_sum,
  CASE WHEN SUM(cov) FILTER (v0 IS NOT NULL) > 0
       THEN (SUM(v0*cov) FILTER (v0 IS NOT NULL))
            / (SUM(cov) FILTER (v0 IS NOT NULL)) END AS mb0_band_0_mean,
  COALESCE(SUM(cov) FILTER (v1 IS NOT NULL), 0.0) AS mb0_band_1_count,
  COALESCE(SUM(v1*cov) FILTER (v1 IS NOT NULL), 0.0) AS mb0_band_1_sum,
  CASE WHEN SUM(cov) FILTER (v1 IS NOT NULL) > 0
       THEN (SUM(v1*cov) FILTER (v1 IS NOT NULL))
            / (SUM(cov) FILTER (v1 IS NOT NULL)) END AS mb0_band_1_mean
FROM p2 GROUP BY zone_id"""


def zonal_variance(cfg):
    # identical operation order to extract._finalize_exprs: var =
    # greatest(sum_cx2/sum_c - mean*mean, 0), mean = sum_cx/sum_c
    return f"""WITH {pairs_sql(cfg)},
s AS (
  SELECT zone_id,
         SUM(cov) {D} AS sum_c,
         SUM(val*cov) {D} AS sum_cx,
         SUM((val*val)*cov) {D} AS sum_cx2
  FROM pairs GROUP BY zone_id)
SELECT zone_id,
  CASE WHEN sum_c > 0
       THEN GREATEST(sum_cx2/sum_c - (sum_cx/sum_c)*(sum_cx/sum_c), 0.0) END AS variance,
  CASE WHEN sum_c > 0
       THEN SQRT(GREATEST(sum_cx2/sum_c - (sum_cx/sum_c)*(sum_cx/sum_c), 0.0)) END AS stdev
FROM s"""


def zonal_weighted_variance(cfg):
    # same operation order as extract: wvar = greatest(sum_cx2w/sum_cw -
    # wmean*wmean, 0), wmean = sum_cxw/sum_cw
    return f"""WITH {pairs_sql(cfg)},
s AS (
  SELECT zone_id,
         SUM(cov*wgt) {D} AS sum_cw,
         SUM(val*(cov*wgt)) {D} AS sum_cxw,
         SUM((val*val)*(cov*wgt)) {D} AS sum_cx2w
  FROM pairs GROUP BY zone_id)
SELECT zone_id,
  CASE WHEN sum_cw <> 0
       THEN GREATEST(sum_cx2w/sum_cw - (sum_cxw/sum_cw)*(sum_cxw/sum_cw), 0.0) END AS weighted_variance,
  CASE WHEN sum_cw <> 0
       THEN SQRT(GREATEST(sum_cx2w/sum_cw - (sum_cxw/sum_cw)*(sum_cxw/sum_cw), 0.0)) END AS weighted_stdev
FROM s"""


def zonal_cv(cfg):
    return f"""WITH {pairs_sql(cfg)},
s AS (
  SELECT zone_id,
         SUM(cov) {D} AS sum_c,
         SUM(val*cov) {D} AS sum_cx,
         SUM((val*val)*cov) {D} AS sum_cx2
  FROM pairs GROUP BY zone_id)
SELECT zone_id,
  CASE WHEN sum_c > 0
       THEN SQRT(GREATEST(sum_cx2/sum_c - (sum_cx/sum_c)*(sum_cx/sum_c), 0.0))
            / (sum_cx/sum_c) END AS coefficient_of_variation
FROM s"""


def _hist_cte(cfg):
    return f"""WITH {pairs_sql(cfg)},
h AS (
  SELECT zone_id, val AS v, SUM(cov) AS ci, SUM(cov*wgt) AS ciw
  FROM pairs WHERE val IS NOT NULL GROUP BY zone_id, val)"""


def zonal_histogram(cfg):
    return f"""{_hist_cte(cfg)},
m AS (
  SELECT zone_id, v,
         ROW_NUMBER() OVER (PARTITION BY zone_id ORDER BY ci DESC, v DESC) AS rmaj,
         ROW_NUMBER() OVER (PARTITION BY zone_id ORDER BY ci ASC, v ASC) AS rmin
  FROM h)
SELECT zone_id,
       CAST(COUNT(*) AS BIGINT) AS variety,
       MAX(CASE WHEN rmaj = 1 THEN v END) AS majority,
       MAX(CASE WHEN rmin = 1 THEN v END) AS minority
FROM m GROUP BY zone_id"""


def zonal_frac(cfg):
    return f"""{_hist_cte(cfg)},
t AS (SELECT zone_id, SUM(ci) AS tot, SUM(ciw) AS totw FROM h GROUP BY zone_id)
SELECT h.zone_id, h.v AS value, h.ci / t.tot AS frac, h.ciw / t.totw AS weighted_frac
FROM h JOIN t USING (zone_id)"""


def _quantile_cte() -> str:
    """The o/q CTE pair feeding _quantile_expr: per-zone sorted distinct
    values with the reference's s_i = i*w_i + (n-1)*cumsum_{i-1}
    positions (weighted_quantiles.cpp:21-75).  Expects a CTE ``h`` of
    (zone_id, v, ci)."""
    return """o AS (
  SELECT zone_id, v, ci,
         ROW_NUMBER() OVER w - 1 AS i,
         SUM(ci) OVER (PARTITION BY zone_id ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cumprev,
         COUNT(*) OVER (PARTITION BY zone_id) AS n,
         SUM(ci) OVER (PARTITION BY zone_id) AS sw
  FROM h
  WINDOW w AS (PARTITION BY zone_id ORDER BY v)),
q AS (
  SELECT zone_id, v AS x,
         i * ci + (n - 1) * COALESCE(cumprev, 0.0) AS s,
         LEAD(v) OVER w2 AS nx,
         LEAD(i * ci + (n - 1) * COALESCE(cumprev, 0.0)) OVER w2 AS ns,
         sw * (n - 1) AS sn
  FROM o
  WINDOW w2 AS (PARTITION BY zone_id ORDER BY v))"""


def _quantile_expr(q: str, out: str) -> str:
    """One quantile via the reference formula (weighted_quantiles.cpp:21-75)."""
    return f"""
sel_{out} AS (
  SELECT zone_id, x + ({q} * sn - s) * (nx - x) / (ns - s) AS val_interp, x AS val_last,
         ns IS NULL AS at_end
  FROM q
  WHERE s <= {q} * sn AND (ns IS NULL OR ns > {q} * sn)),
r_{out} AS (
  SELECT zone_id, CASE WHEN at_end THEN val_last ELSE val_interp END AS {out}
  FROM sel_{out})"""


def zonal_quantiles(cfg):
    return f"""{_hist_cte(cfg)},
{_quantile_cte()},
{_quantile_expr('0.5', 'median')},
{_quantile_expr('0.25', 'quantile_25')},
{_quantile_expr('0.75', 'quantile_75')}
SELECT zone_id, median, quantile_25, quantile_75
FROM r_median JOIN r_quantile_25 USING (zone_id) JOIN r_quantile_75 USING (zone_id)"""


def zonal_dtype(cfg):
    """Integer raster i0 (int32, same arith-v1 values as r0):
    reference result typing — min/max/majority in the cell dtype,
    median truncated toward zero (operation.cpp:115-206;
    static_cast<T> of the interpolated quantile)."""
    return f"""{_hist_cte(cfg)},
m AS (
  SELECT zone_id, v, ci,
         ROW_NUMBER() OVER (PARTITION BY zone_id ORDER BY ci DESC, v DESC) AS rmaj
  FROM h),
mm AS (
  SELECT zone_id, CAST(MIN(val) AS BIGINT) AS min, CAST(MAX(val) AS BIGINT) AS max
  FROM pairs WHERE val IS NOT NULL GROUP BY zone_id),
maj AS (
  SELECT zone_id, CAST(MAX(CASE WHEN rmaj = 1 THEN v END) AS BIGINT) AS majority
  FROM m GROUP BY zone_id),
{_quantile_cte()},
{_quantile_expr('0.5', 'median')}
SELECT mm.zone_id, mm.min, mm.max, maj.majority,
       CAST(TRUNC(r_median.median) AS BIGINT) AS median
FROM mm JOIN maj USING (zone_id) JOIN r_median USING (zone_id)"""


def zonal_minmax_loc(cfg):
    G = cfg.G
    return f"""WITH {pairs_sql(cfg)},
rk AS (
  SELECT zone_id, c, r,
         ROW_NUMBER() OVER (PARTITION BY zone_id ORDER BY val ASC, cell_id ASC) AS rmin,
         ROW_NUMBER() OVER (PARTITION BY zone_id ORDER BY val DESC, cell_id ASC) AS rmax
  FROM pairs WHERE val IS NOT NULL)
SELECT zone_id,
  MAX(CASE WHEN rmin = 1 THEN c + 0.5 END) AS min_center_x,
  MAX(CASE WHEN rmin = 1 THEN {G} - r - 0.5 END) AS min_center_y,
  MAX(CASE WHEN rmax = 1 THEN c + 0.5 END) AS max_center_x,
  MAX(CASE WHEN rmax = 1 THEN {G} - r - 0.5 END) AS max_center_y
FROM rk GROUP BY zone_id"""


def zonal_coverage_none(cfg):
    return _agg(cfg, f"""
  COALESCE(CAST(COUNT(val) AS DOUBLE), 0.0) AS count,
  CASE WHEN COUNT(val) > 0 THEN SUM(val) / CAST(COUNT(val) AS DOUBLE) END AS mean""")


def zonal_min_coverage(cfg):
    return f"""WITH {pairs_sql(cfg)}
SELECT zone_id,
  COALESCE(SUM(cov) FILTER (val IS NOT NULL AND cov >= 0.5), 0.0) AS count,
  COALESCE(SUM(val*cov) FILTER (val IS NOT NULL AND cov >= 0.5), 0.0) AS sum
FROM pairs GROUP BY zone_id"""


def tile_assignment(cfg):
    """Zone → tile co-partitioning keys (north rule: 'matching the
    reference's join output rows and tile assignments')."""
    T = cfg.tile
    return f"""WITH {pairs_sql(cfg)}
SELECT DISTINCT zone_id,
       CAST(r // {T} AS INT) AS tile_row,
       CAST(c // {T} AS INT) AS tile_col
FROM pairs"""


def zonal_bandmath(cfg):
    """Raster algebra before aggregation: the normalized difference of
    mb0's two bands ((b1−b0)/(b1+b0), the NDVI shape), then the basic
    stats — band 1 = (val + 29) % 97 (generator arith-v1), nodata
    footprint shared by both bands.  The ratio is quantized to
    floor(x * 2^20) (bandmath.normalized_difference_q20) so the
    coverage-weighted sums are dyadic-exact and combine-order-free —
    one correctly-rounded division + exact power-of-two scale gives
    bit-identical cell values in both engines."""
    v1 = "CAST((CAST(val AS BIGINT) + 29) % 97 AS DOUBLE)"
    return f"""WITH {pairs_sql(cfg)},
p2 AS (
  SELECT zone_id, cov,
         CASE WHEN val IS NOT NULL AND ({v1} + val) <> 0
              THEN FLOOR(({v1} - val) / ({v1} + val) * 1048576.0) END AS dval
  FROM pairs)
SELECT zone_id,
  COALESCE(SUM(cov) FILTER (dval IS NOT NULL), 0.0) AS count,
  COALESCE(SUM(dval*cov) FILTER (dval IS NOT NULL), 0.0) AS sum,
  CASE WHEN SUM(cov) FILTER (dval IS NOT NULL) > 0
       THEN (SUM(dval*cov) FILTER (dval IS NOT NULL))
            / (SUM(cov) FILTER (dval IS NOT NULL)) END AS mean,
  MIN(dval) AS min, MAX(dval) AS max
FROM p2 GROUP BY zone_id"""


def _morton16_sql(tr: str, tc: str) -> str:
    """Bit-interleave (Z-order) of two 16-bit tile coordinates —
    the DuckDB mirror of tiling.morton's JVM expression."""
    return " + ".join(
        f"((({tr} >> {b}) & 1) << {2 * b + 1})"
        f" + ((({tc} >> {b}) & 1) << {2 * b})"
        for b in range(16))


def quadkey_rollup(cfg):
    """Multi-resolution rollup over the hierarchical quadkey index
    (tiling.quadkey): per cell at levels 16/12/8, how many zone-tile
    pairs, distinct zones, and distinct tiles it contains (levels
    16/14/12).  Parent
    cells are bit-prefixes (qk_L = qk_16 >> 2*(16-L))."""
    T = cfg.tile
    mort = _morton16_sql("tr", "tc")
    return f"""WITH {pairs_sql(cfg)},
pt AS (SELECT DISTINCT zone_id,
         CAST(r // {T} AS INT) AS tr, CAST(c // {T} AS INT) AS tc
       FROM pairs),
mk AS (SELECT zone_id, ({mort}) AS qk16 FROM pt),
lv AS (
  SELECT 16 AS level, qk16 AS cell, zone_id, qk16 AS tile_key FROM mk
  UNION ALL
  SELECT 14 AS level, qk16 >> 4 AS cell, zone_id, qk16 AS tile_key FROM mk
  UNION ALL
  SELECT 12 AS level, qk16 >> 8 AS cell, zone_id, qk16 AS tile_key FROM mk)
SELECT CAST(level AS INT) AS level, CAST(cell AS BIGINT) AS cell,
  COUNT(*) AS n_pairs,
  COUNT(DISTINCT zone_id) AS n_zones,
  COUNT(DISTINCT tile_key) AS n_tiles
FROM lv GROUP BY level, cell"""


def zonal_mixed_args(cfg):
    """Several op-keys in one query: default + min_coverage + unweighted
    count alongside weighted mean (exercises op-key sharing)."""
    return _agg(cfg, f"""
  COALESCE(SUM(cov) {D}, 0.0) AS count,
  COALESCE(SUM(cov) FILTER (val IS NOT NULL AND cov >= 0.25), 0.0) AS count_mc,
  CASE WHEN SUM(cov*wgt) {D} <> 0
       THEN (SUM(val*(cov*wgt)) {D}) / (SUM(cov*wgt) {D}) END AS weighted_mean""")


def zonal_arrays(cfg):
    """Stored-array ops, exploded to scalar rows (the driver's
    canonicalizer cannot sort list columns); ``pos`` checks the
    cell_id-sorted array order."""
    return f"""WITH {pairs_sql(cfg)}
SELECT zone_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY zone_id ORDER BY cell_id) - 1 AS INT) AS pos,
  cell_id, val AS value, cov AS coverage
FROM pairs WHERE val IS NOT NULL"""


def subdivide_rect(cfg):
    """Per-cell covered pieces of every (rect) zone: coverage fraction
    and the intersection rectangle (closed form for the fixture's
    quarter-aligned rectangles)."""
    return f"""WITH {zone_sql(cfg)},
{cells_sql(cfg)}
SELECT z.zone_id, c.cell_id,
       (LEAST(z.zx1, c.cx1) - GREATEST(z.zx0, c.cx0))
     * (LEAST(z.zy1, c.cy1) - GREATEST(z.zy0, c.cy0)) AS coverage,
       GREATEST(z.zx0, c.cx0) AS x0, GREATEST(z.zy0, c.cy0) AS y0,
       LEAST(z.zx1, c.cx1) AS x1, LEAST(z.zy1, c.cy1) AS y1
FROM zones z JOIN cells c
  ON c.cx1 > z.zx0 AND c.cx0 < z.zx1 AND c.cy1 > z.zy0 AND c.cy0 < z.zy1"""


def rasterize_burn(cfg):
    """Vector→raster burn: per covered grid cell, the number of zones
    covering it and the summed exact coverage fraction.  Pure geometry
    — no value filter, no raster read (rasterize.py)."""
    return f"""WITH {pairs_sql(cfg)}
SELECT cell_id, r, c, COUNT(*) AS n_zones, SUM(cov) AS burn
FROM pairs GROUP BY cell_id, r, c"""


def rasterize_zonal(cfg):
    """Vector→raster→zonal round trip: burn coverage per cell, define
    the burned layer on every cell of a TOUCHED tile (0.0 where no
    zone reaches — burn_to_tiles' sparse-rasterization contract), then
    zonal count/sum/mean of burn density per zone.  All sums are
    multiples of 1/256 — exact in both engines."""
    t = cfg.tile
    return f"""WITH {pairs_sql(cfg)},
burn AS (SELECT cell_id, SUM(cov) AS b FROM pairs GROUP BY 1),
touched AS (SELECT DISTINCT r // {t} AS tr, c // {t} AS tc FROM pairs),
layer AS (
  SELECT c.cell_id, c.cx0, c.cx1, c.cy0, c.cy1, COALESCE(b.b, 0.0) AS v
  FROM cells c
  JOIN touched tt ON c.r // {t} = tt.tr AND c.c // {t} = tt.tc
  LEFT JOIN burn b ON b.cell_id = c.cell_id),
p2 AS (
  SELECT z.zone_id, l.v,
         (LEAST(z.zx1, l.cx1) - GREATEST(z.zx0, l.cx0))
       * (LEAST(z.zy1, l.cy1) - GREATEST(z.zy0, l.cy0)) AS cov
  FROM zones z JOIN layer l
    ON l.cx1 > z.zx0 AND l.cx0 < z.zx1 AND l.cy1 > z.zy0 AND l.cy0 < z.zy1)
SELECT zone_id, SUM(cov) AS "count", SUM(v * cov) AS "sum",
       SUM(v * cov) / SUM(cov) AS mean
FROM p2 GROUP BY 1"""


def zonal_topk_cells(cfg):
    """Top-5 covered cells per zone by value, ties → lowest cell_id.
    The engine runs the two-phase salted top-k; same total order."""
    return f"""WITH {pairs_sql(cfg)},
ranked AS (
  SELECT zone_id, cell_id, val AS value, cov,
         ROW_NUMBER() OVER (PARTITION BY zone_id
                            ORDER BY val DESC, cell_id) AS rank
  FROM pairs WHERE val IS NOT NULL)
SELECT zone_id, CAST(rank AS INT) AS rank, cell_id, value, cov
FROM ranked WHERE rank <= 5"""


def zonal_change(cfg):
    """Before/after change summary per zone: changed coverage fraction,
    mean signed delta, max |delta| — exact sums, single divisions."""
    return f"""WITH {pairs_sql(cfg)},
m AS (
  SELECT zone_id, SUM(cov) AS n,
         SUM(CASE WHEN val <> wgt THEN cov ELSE 0.0 END) AS changed,
         SUM(cov * (val - wgt)) AS sdelta,
         MAX(ABS(val - wgt)) AS max_abs_delta
  FROM pairs WHERE val IS NOT NULL GROUP BY 1)
SELECT zone_id, n, changed / n AS changed_frac,
       sdelta / n AS mean_delta, max_abs_delta
FROM m"""


def zonal_correlation(cfg):
    """Coverage-weighted covariance/Pearson per zone: exact moment sums
    (1/16-multiples × small ints) feed numerator-form statistics —
    identical single-rounding expression sequences in both engines."""
    return f"""WITH {pairs_sql(cfg)},
m AS (
  SELECT zone_id, SUM(cov) AS n,
         SUM(cov * val) AS sx, SUM(cov * wgt) AS sy,
         SUM(cov * val * val) AS sxx, SUM(cov * wgt * wgt) AS syy,
         SUM(cov * val * wgt) AS sxy
  FROM pairs WHERE val IS NOT NULL GROUP BY 1)
SELECT zone_id, n, sx / n AS mean_x, sy / n AS mean_y,
       (n * sxy - sx * sy) / (n * n) AS cov,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN (n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))
       END AS corr
FROM m"""


def zonal_crosstab(cfg):
    """Joint (value, weight-value) tabulation per zone — the 2-raster
    cross-tab; frac is one correctly-rounded division of exact
    1/16-multiple sums, identical in both engines."""
    return f"""WITH {pairs_sql(cfg)},
g AS (
  SELECT zone_id, val AS value, wgt AS weight, SUM(cov) AS "count"
  FROM pairs WHERE val IS NOT NULL GROUP BY 1, 2, 3)
SELECT zone_id, value, weight, "count",
       "count" / SUM("count") OVER (PARTITION BY zone_id) AS frac
FROM g"""


def focal_mean(cfg):
    """Radius-2 focal statistics as the naive self-join: every cell
    joined to its ≤25 window neighbors, aggregated per center.  The
    engine's halo-exchange produces the same numbers with 1/25th the
    shuffle volume (focal.py); window sums are ≤25 small integers, so
    both engines are bit-exact."""
    return f"""WITH {cells_sql(cfg)}
SELECT c.cell_id, CAST(c.r AS INT) AS r, CAST(c.c AS INT) AS c,
       COUNT(n.val) AS focal_n,
       SUM(n.val) AS focal_sum,
       SUM(n.val) / COUNT(n.val) AS focal_mean,
       MIN(n.val) AS focal_min,
       MAX(n.val) AS focal_max
FROM cells c JOIN cells n
  ON n.r BETWEEN c.r - 2 AND c.r + 2
 AND n.c BETWEEN c.c - 2 AND c.c + 2
GROUP BY 1, 2, 3"""


def focal_convolve(cfg):
    """Binomial 5×5 kernel convolution as the naive weighted self-join
    (weight = outer product of [1,4,6,4,1], looked up by offset);
    integer weights × integer values keep both engines exact."""
    return f"""WITH {cells_sql(cfg)},
b(i, w) AS (VALUES (0, 1), (1, 4), (2, 6), (3, 4), (4, 1))
SELECT c.cell_id, CAST(c.r AS INT) AS r, CAST(c.c AS INT) AS c,
       CAST(SUM(CASE WHEN n.val IS NOT NULL THEN br.w * bc.w
                     ELSE 0 END) AS BIGINT) AS wsum,
       SUM(br.w * bc.w * n.val) AS conv,
       SUM(br.w * bc.w * n.val)
         / SUM(CASE WHEN n.val IS NOT NULL THEN br.w * bc.w END)
         AS smooth
FROM cells c
JOIN cells n
  ON n.r BETWEEN c.r - 2 AND c.r + 2
 AND n.c BETWEEN c.c - 2 AND c.c + 2
JOIN b br ON br.i = n.r - c.r + 2
JOIN b bc ON bc.i = n.c - c.c + 2
GROUP BY 1, 2, 3"""


def raster_proximity(cfg):
    """Square-window proximity: per cell, MIN(dr²+dc²) over target
    cells (val ≥ 90) within ±8 on both axes — NULL when none.  d2 is
    an exact integer; dist is one correctly-rounded sqrt."""
    return f"""WITH {cells_sql(cfg)}
SELECT c.cell_id, CAST(c.r AS INT) AS r, CAST(c.c AS INT) AS c,
       CAST(MIN((n.r - c.r) * (n.r - c.r) + (n.c - c.c) * (n.c - c.c))
            AS BIGINT) AS d2,
       SQRT(MIN((n.r - c.r) * (n.r - c.r) + (n.c - c.c) * (n.c - c.c)))
         AS dist
FROM cells c
LEFT JOIN cells n
  ON n.r BETWEEN c.r - 8 AND c.r + 8
 AND n.c BETWEEN c.c - 8 AND c.c + 8
 AND n.val >= 90
GROUP BY 1, 2, 3"""


def raster_gradient(cfg):
    """Horn-method gradient: 3×3 pivot per cell; defined only when all
    9 window cells exist and are non-nodata (GDAL edge/nodata default).
    Integer values on the unit grid make gx/gy/slope_sq dyadic
    rationals — exact in both engines."""
    return f"""WITH {cells_sql(cfg)},
w AS (
  SELECT c.cell_id, CAST(c.r AS INT) AS r, CAST(c.c AS INT) AS c,
         COUNT(n.val) AS nv,
         MAX(CASE WHEN n.r = c.r - 1 AND n.c = c.c - 1 THEN n.val END) AS zmm,
         MAX(CASE WHEN n.r = c.r - 1 AND n.c = c.c     THEN n.val END) AS zm0,
         MAX(CASE WHEN n.r = c.r - 1 AND n.c = c.c + 1 THEN n.val END) AS zmp,
         MAX(CASE WHEN n.r = c.r     AND n.c = c.c - 1 THEN n.val END) AS z0m,
         MAX(CASE WHEN n.r = c.r     AND n.c = c.c + 1 THEN n.val END) AS z0p,
         MAX(CASE WHEN n.r = c.r + 1 AND n.c = c.c - 1 THEN n.val END) AS zpm,
         MAX(CASE WHEN n.r = c.r + 1 AND n.c = c.c     THEN n.val END) AS zp0,
         MAX(CASE WHEN n.r = c.r + 1 AND n.c = c.c + 1 THEN n.val END) AS zpp
  FROM cells c
  JOIN cells n
    ON n.r BETWEEN c.r - 1 AND c.r + 1
   AND n.c BETWEEN c.c - 1 AND c.c + 1
  GROUP BY 1, 2, 3),
g AS (
  SELECT cell_id, r, c,
    CASE WHEN nv = 9
         THEN ((zmp + 2 * z0p + zpp) - (zmm + 2 * z0m + zpm)) / 8.0
    END AS gx,
    CASE WHEN nv = 9
         THEN ((zpm + 2 * zp0 + zpp) - (zmm + 2 * zm0 + zmp)) / 8.0
    END AS gy
  FROM w)
SELECT cell_id, r, c, gx, gy, gx * gx + gy * gy AS slope_sq
FROM g"""


def point_sample(cfg):
    """Raster point query: nearest cell by containment; bilinear
    between the 4 surrounding cell centers (fy/fx measured from the
    top-left cell center).  Quarter-aligned coordinates make every
    weight dyadic — no rounding anywhere, both engines exact."""
    G = cfg.G
    return f"""WITH {points_sql(cfg)},
{cells_sql(cfg)},
p AS (
  SELECT point_id, x, y,
         CAST(FLOOR({G} - y) AS INT) AS r,
         CAST(FLOOR(x) AS INT) AS c,
         (x - 0.5) AS fx, (({G} - y) - 0.5) AS fy
  FROM points
  WHERE FLOOR({G} - y) >= 0 AND FLOOR({G} - y) < {G}
    AND FLOOR(x) >= 0 AND FLOOR(x) < {G}),
q AS (
  SELECT p.*, CAST(FLOOR(fy) AS BIGINT) AS gr,
         CAST(FLOOR(fx) AS BIGINT) AS gc,
         fy - FLOOR(fy) AS wr, fx - FLOOR(fx) AS wx
  FROM p)
SELECT q.point_id, q.x, q.y, q.r, q.c,
       n.val AS v_nearest,
       (1 - q.wr) * (1 - q.wx) * a.val + (1 - q.wr) * q.wx * b.val
       + q.wr * (1 - q.wx) * d.val + q.wr * q.wx * e.val AS v_bilinear
FROM q
LEFT JOIN cells n ON n.r = q.r AND n.c = q.c
LEFT JOIN cells a ON a.r = q.gr     AND a.c = q.gc
LEFT JOIN cells b ON b.r = q.gr     AND b.c = q.gc + 1
LEFT JOIN cells d ON d.r = q.gr + 1 AND d.c = q.gc
LEFT JOIN cells e ON e.r = q.gr + 1 AND e.c = q.gc + 1"""


def raster_histogram(cfg):
    """Global value histogram: count of defined cells per distinct
    value (gdalinfo -hist).  Counts are exact integers."""
    return f"""WITH {cells_sql(cfg)}
SELECT val AS value, COUNT(*) AS n
FROM cells WHERE val IS NOT NULL GROUP BY 1"""


def raster_overview(cfg):
    """4×4 block aggregation (overview level): COUNT/SUM/MIN/MAX over
    each block's defined cells; all-nodata blocks keep their row with
    n=0 and NULL stats.  Block sums are ≤16 small integers — exact in
    both engines."""
    return f"""WITH {cells_sql(cfg)}
SELECT CAST(r // 4 AS INT) AS ov_r, CAST(c // 4 AS INT) AS ov_c,
       COUNT(val) AS n, SUM(val) AS "sum",
       SUM(val) / COUNT(val) AS mean,
       MIN(val) AS "min", MAX(val) AS "max"
FROM cells GROUP BY 1, 2"""


def zonal_binned(cfg):
    """bin_width histogram quantization (engine extension beyond the
    reference — bounded state for continuous rasters): values floor to
    the bin start BEFORE the histogram; ties follow the reference
    (majority → larger value, minority → smaller)."""
    return f"""WITH {pairs_sql(cfg)},
h AS (
  SELECT zone_id, FLOOR(val / 2.0) * 2.0 AS v, SUM(cov) AS ci
  FROM pairs WHERE val IS NOT NULL GROUP BY zone_id, FLOOR(val / 2.0) * 2.0),
m AS (
  SELECT zone_id, v,
         ROW_NUMBER() OVER (PARTITION BY zone_id ORDER BY ci DESC, v DESC) AS rmaj,
         ROW_NUMBER() OVER (PARTITION BY zone_id ORDER BY ci ASC, v ASC) AS rmin
  FROM h)
SELECT zone_id,
       CAST(COUNT(*) AS BIGINT) AS variety,
       MAX(CASE WHEN rmaj = 1 THEN v END) AS majority,
       MAX(CASE WHEN rmin = 1 THEN v END) AS minority
FROM m GROUP BY zone_id"""


def zonal_incremental(cfg):
    """Oracle for the checkpoint-resume AND streaming-snapshot queries:
    incremental ingestion with exact partial-state merge must equal the
    one-shot batch result, which this SQL recomputes directly."""
    return _agg(cfg, f"""
  COALESCE(SUM(cov) {D}, 0.0) AS count,
  COALESCE(SUM(val*cov) {D}, 0.0) AS sum,
  CASE WHEN SUM(cov) {D} > 0
       THEN (SUM(val*cov) {D}) / (SUM(cov) {D}) END AS mean""")


def zonal_area(cfg):
    """coverage_weight=area_cartesian on the COARSE raster wc0 (dx=4):
    the area factor is float32(16.0) — an exact power of two, so the
    area-multiplied sums stay exact and hash-safe.  The effective
    coverage cov*16 is simply the intersection AREA (not fraction);
    mean cross-checks that a constant area factor cancels."""
    from .fixtures import REG_F as f
    G = cfg.G
    gc = (G + f - 1) // f
    return f"""WITH {zone_sql(cfg)},
ccells AS (
  SELECT CAST((r*13 + c*7) % 11 AS DOUBLE) AS val,
         CAST(c*{f} AS DOUBLE) AS cx0, CAST((c+1)*{f} AS DOUBLE) AS cx1,
         CAST({G} - (r+1)*{f} AS DOUBLE) AS cy0, CAST({G} - r*{f} AS DOUBLE) AS cy1
  FROM (SELECT i // {gc} AS r, i % {gc} AS c
        FROM (SELECT range AS i FROM range({gc}*{gc})))),
cpairs AS (
  SELECT z.zone_id, c.val,
         (LEAST(z.zx1, c.cx1) - GREATEST(z.zx0, c.cx0))
       * (LEAST(z.zy1, c.cy1) - GREATEST(z.zy0, c.cy0)) AS cov_area
  FROM zones z JOIN ccells c
    ON c.cx1 > z.zx0 AND c.cx0 < z.zx1 AND c.cy1 > z.zy0 AND c.cy0 < z.zy1)
SELECT zone_id,
  COALESCE(SUM(cov_area), 0.0) AS area_count,
  COALESCE(SUM(val*cov_area), 0.0) AS area_sum,
  CASE WHEN SUM(cov_area) > 0
       THEN (SUM(val*cov_area)) / (SUM(cov_area)) END AS area_mean
FROM cpairs GROUP BY zone_id"""


def zonal_weights_array(cfg):
    """Stored weights array (weighted fixture w0), exploded to scalar
    rows with the cell_id sort order check."""
    return f"""WITH {pairs_sql(cfg)}
SELECT zone_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY zone_id ORDER BY cell_id) - 1 AS INT) AS pos,
  cell_id, wgt AS weight, cov AS coverage
FROM pairs WHERE val IS NOT NULL"""


def zonal_custom(cfg):
    """Custom Python op (PythonOperation contract): weighted sum of
    squares Σ v²·c — every term is an exact multiple of 1/16, so the
    sum is order-independent and hash-safe."""
    return _agg(cfg, f"""
  COALESCE(SUM(cov) {D}, 0.0) AS count,
  SUM((val*val)*cov) {D} AS sumsq""")


def zonal_linear(cfg):
    """Linear geometries: per-cell traversal length as coverage."""
    return f"""WITH {lines_sql(cfg)}
SELECT zone_id,
  COALESCE(SUM(cov) FILTER (val IS NOT NULL), 0.0) AS count,
  CASE WHEN SUM(cov) FILTER (val IS NOT NULL) > 0
       THEN (SUM(val*cov) FILTER (val IS NOT NULL)) / (SUM(cov) FILTER (val IS NOT NULL)) END AS mean,
  MIN(val) AS min, MAX(val) AS max
FROM lpairs GROUP BY zone_id"""


def point_in_polygon(cfg):
    """Strict-interior PIP (fixture points never touch boundaries)."""
    return f"""WITH {zone_sql(cfg)},
{points_sql(cfg)}
SELECT p.point_id, z.zone_id
FROM points p JOIN zones z
  ON p.x > z.zx0 AND p.x < z.zx1 AND p.y > z.zy0 AND p.y < z.zy1"""


def knn_tiles(cfg):
    T, G = cfg.tile, cfg.G
    nt = (G + T - 1) // T
    K = 4
    return f"""WITH {points_sql(cfg)},
tiles AS (
  SELECT i // {nt} AS tile_row, i % {nt} AS tile_col
  FROM (SELECT range AS i FROM range({nt * nt}))),
d AS (
  SELECT p.point_id, t.tile_row, t.tile_col,
         (p.x - (t.tile_col + 0.5) * {float(T)}) * (p.x - (t.tile_col + 0.5) * {float(T)})
       + (p.y - ({float(G)} - (t.tile_row + 0.5) * {float(T)}))
       * (p.y - ({float(G)} - (t.tile_row + 0.5) * {float(T)})) AS dist2
  FROM points p CROSS JOIN tiles t)
SELECT point_id, CAST(tile_row AS INT) AS tile_row, CAST(tile_col AS INT) AS tile_col,
       CAST(rank AS INT) AS rank, dist2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY point_id
        ORDER BY dist2 ASC, tile_row ASC, tile_col ASC) AS rank FROM d)
WHERE rank <= {K}"""


def span_sequence(cfg):
    """North-rule invariant: per-row span-sequence equality (kind, text,
    media_ref, order) of the interleaved fixture — the oracle is an
    independent DuckDB regeneration of every doc family's exploded span
    rows (fixtures.docs_spans_sql)."""
    from .fixtures import docs_spans_sql
    return docs_spans_sql(cfg)


ZONAL_ORACLES = {
    "span_sequence": span_sequence,
    "point_in_polygon": point_in_polygon,
    "knn_tiles": knn_tiles,
    "zonal_basic_shuffle": zonal_basic,  # same semantics, shuffle plan
    "zonal_arrays": zonal_arrays,
    "zonal_linear": zonal_linear,
    "subdivide_rect": subdivide_rect,
    "zonal_weighted_variance": zonal_weighted_variance,
    "zonal_cv": zonal_cv,
    "zonal_basic": zonal_basic,
    "zonal_weighted": zonal_weighted,
    "zonal_weighted_regrid": zonal_weighted_regrid,
    "zonal_scaled": zonal_scaled,
    "zonal_multiband": zonal_multiband,
    "zonal_variance": zonal_variance,
    "zonal_histogram": zonal_histogram,
    "zonal_frac": zonal_frac,
    "zonal_quantiles": zonal_quantiles,
    "zonal_dtype": zonal_dtype,
    "zonal_minmax_loc": zonal_minmax_loc,
    "zonal_coverage_none": zonal_coverage_none,
    "zonal_min_coverage": zonal_min_coverage,
    "zonal_mixed_args": zonal_mixed_args,
    "tile_assignment": tile_assignment,
    "quadkey_rollup": quadkey_rollup,
    "zonal_bandmath": zonal_bandmath,
    "zonal_area": zonal_area,
    "zonal_weights_array": zonal_weights_array,
    "zonal_custom": zonal_custom,
    "zonal_binned": zonal_binned,
    "focal_mean": focal_mean,
    "focal_convolve": focal_convolve,
    "raster_proximity": raster_proximity,
    "raster_gradient": raster_gradient,
    "point_sample": point_sample,
    "raster_overview": raster_overview,
    "raster_histogram": raster_histogram,
    "rasterize_burn": rasterize_burn,
    "rasterize_zonal": rasterize_zonal,
    "zonal_crosstab": zonal_crosstab,
    "zonal_correlation": zonal_correlation,
    "zonal_topk_cells": zonal_topk_cells,
    "zonal_change": zonal_change,
    "checkpoint_resume": zonal_incremental,
    "streaming_snapshot": zonal_incremental,
    # streamed value tiles weighted by a STATIC weight raster (w0):
    # incremental merge must equal the one-shot weighted batch SQL
    "streaming_weighted_snapshot": zonal_weighted,
}
