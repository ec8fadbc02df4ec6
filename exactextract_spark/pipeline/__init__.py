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
