"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard), similarity search (brute-force + LSH-bucketed ANN), text
analysis (language guess, quality stats, token counts, fingerprints)
and multimodal binary plumbing.

Everything stays in JVM-side Spark SQL expressions (no Python UDF in
the hot path) except the multimodal decode stub, which demonstrates the
Arrow-batched mapInPandas plumbing.  All hashing uses explicit integer
arithmetic (no engine-builtin hash) so a DuckDB oracle reproduces every
value bit-for-bit."""

# --- staged-cache registry -------------------------------------------------
# Several pipeline operators persist an intermediate (shingle tables,
# long band-key tables) both as an optimizer barrier and because two
# plan branches consume it.  The persist cannot be released inside the
# builder (the returned plan is lazy), so long-lived sessions
# accumulated cached partitions for the session lifetime (ADVICE r5).
# Builders register every such persist here; call release_staged() once
# the results derived from prior pipeline calls are materialized.

_STAGED: list = []


def stage_cache(df):
    """Persist ``df`` and register it for release_staged()."""
    df.persist()
    _STAGED.append(df)
    return df


def release_staged() -> int:
    """Unpersist every staged pipeline intermediate; returns how many
    were released.  Safe at any time — consumers recompute from source
    if they re-execute after release."""
    n = 0
    while _STAGED:
        _STAGED.pop().unpersist()
        n += 1
    return n
