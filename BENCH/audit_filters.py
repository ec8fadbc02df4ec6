"""Plan audit: flag queries whose physical plan evaluates expensive
interpreted expressions inside Filter/Join conditions.

Why: join planning adds isnotnull(key) filters, and predicate pushdown
substitutes Project alias chains into them.  If the key is a computed
higher-order-function expression (transform/aggregate/zip_with — all
CodegenFallback, evaluated interpreted), the pushed filter re-evaluates
the whole tree per input row; nested element_at(alias, i) substitutions
make that super-linear (measured 80-130x wall on the MinHash LSH band
joins at 20k docs before the fix in dedup.minhash_band_long).

Run:  PYTHONPATH=/root/repo python BENCH/audit_filters.py [sf_dir]
Prints one line per query: OK, or FLAG with the offending fragment.
Exit code 1 if anything is flagged (usable as a regression gate).
"""
import re
import sys

HOF = re.compile(r"(?:aggregate|transform|zip_with|array_min|array_max|filter)\(")

# reviewed flags that are accepted: expensive-looking expression in a
# filter, but on a small/bounded side with no nested re-evaluation
# multiplier (each key: why it's fine)
ALLOW = {
    # fixture-side WKT-head regex validation inlined over the SMALL
    # synthesized zone table (bounded rows, scalar regex, evaluated at
    # most twice per zone) — not a per-corpus-row cost
    "point_in_polygon",
    # same zone-side WKT-head predicate, same bounded zone table (the
    # rollup consumes zone_tile_pairs exactly like point_in_polygon)
    "quadkey_rollup",
    # same zone-side WKT-head predicate again — rasterize_burn feeds
    # zones through subdivide, whose validation inlines over the
    # bounded zone table (scalar regex, ≤2 evaluations per zone row)
    "rasterize_burn",
}
# Filter [...] or +- Filter (...) lines in the executedPlan string
FILTER_LINE = re.compile(r"^\s*(?:\+- |:- |:  +- )*\*?\(?\d*\)? ?Filter (.*)$")


def audit_plan(plan: str):
    """Return list of Filter-condition fragments containing HOF calls."""
    bad = []
    for line in plan.splitlines():
        m = FILTER_LINE.match(line)
        if not m:
            continue
        cond = m.group(1)
        if HOF.search(cond):
            bad.append(cond[:160])
    return bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    flagged = {}
    for name, fn in sorted(entry.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming queries can't executedPlan
            print(f"{name}: SKIP ({type(exc).__name__})")
            continue
        bad = audit_plan(plan)
        if bad and name in ALLOW:
            print(f"{name}: ALLOW ({len(bad)} reviewed filter(s))")
        elif bad:
            flagged[name] = bad
            print(f"{name}: FLAG ({len(bad)} filter(s))")
            for b in bad[:2]:
                print(f"    {b}")
        else:
            print(f"{name}: OK")
    print(f"\n{len(flagged)} flagged")
    spark.stop()
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
