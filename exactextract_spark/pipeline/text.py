"""Text-analysis operators over the documents table.

All pure JVM-side Spark SQL expressions.  Each builder has a paired
DuckDB oracle SQL (same arithmetic, same operation order) so the
driver's value-hash comparison passes bit-exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import stage_cache as _stage_cache

# deterministic per-token integer code (ASCII docs): first char, second
# char, length — used by fingerprints/minhash/simhash instead of any
# engine-builtin hash so both engines agree exactly
TOKCODE_SPARK = "(ascii({t})*961 + ascii(substr({t},2,1))*31 + length({t}))"
TOKCODE_DUCK = TOKCODE_SPARK  # same syntax in both dialects
P = 1000000007
M = 1000003

STOPWORDS = "('the','and','of','a','to','in','is')"
LANG_MARKERS = {
    "en": "('the','and','of','to','is')",
    "es": "('el','la','de','que','y')",
    "de": "('der','die','und','das')",
    "fr": "('le','et','les','des')",
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality stats: chars, tokens, distinct tokens,
    average token length, stopword ratio."""
    return _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "length(text) AS n_chars",
        "size(split(trim(text), '\\\\s+')) AS n_tokens",
        "size(array_distinct(split(trim(text), '\\\\s+'))) AS n_unique_tokens",
        "CAST(aggregate(transform(split(trim(text), '\\\\s+'), t -> length(t)), 0, (a, x) -> a + x) AS DOUBLE)"
        " / size(split(trim(text), '\\\\s+')) AS avg_token_len",
        f"CAST(size(filter(split(trim(text), '\\\\s+'), t -> t IN {STOPWORDS})) AS DOUBLE)"
        " / size(split(trim(text), '\\\\s+')) AS stopword_ratio",
    )


def text_stats_oracle() -> str:
    return f"""SELECT doc_id,
  length(text) AS n_chars,
  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens,
  CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS INT) AS n_unique_tokens,
  CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'), t -> length(t))) AS DOUBLE)
    / len(regexp_split_to_array(trim(text), '\\s+')) AS avg_token_len,
  CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t IN {STOPWORDS})) AS DOUBLE)
    / len(regexp_split_to_array(trim(text), '\\s+')) AS stopword_ratio
FROM documents"""


def _lang_counts_sql(toks: str, dialect_filter: str) -> list[str]:
    return [f"CAST(len({dialect_filter}({toks}, t -> t IN {m})) AS INT) AS c_{lang}"
            if dialect_filter == "list_filter" else
            f"size(filter({toks}, t -> t IN {m})) AS c_{lang}"
            for lang, m in LANG_MARKERS.items()]


_LANG_CASE = ("CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en' "
              "WHEN c_es >= c_de AND c_es >= c_fr THEN 'es' "
              "WHEN c_de >= c_fr THEN 'de' ELSE 'fr' END AS lang_guess")


def lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword-marker language heuristic (deterministic)."""
    toks = "split(trim(text), '\\\\s+')"
    counts = _lang_counts_sql(toks, "filter")
    return (_docs(spark, sf_dir)
            .selectExpr("doc_id", *counts)
            .selectExpr("doc_id", "c_en", "c_es", "c_de", "c_fr", _LANG_CASE))


def lang_guess_oracle() -> str:
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    counts = ", ".join(_lang_counts_sql(toks, "list_filter"))
    return f"""SELECT doc_id, c_en, c_es, c_de, c_fr, {_LANG_CASE}
FROM (SELECT doc_id, {counts} FROM documents)"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial document fingerprint over token codes
    (mod-{P} arithmetic; no engine-builtin hash)."""
    tc = TOKCODE_SPARK.format(t="t")
    return _docs(spark, sf_dir).selectExpr(
        "doc_id",
        f"aggregate(transform(split(trim(text), '\\\\s+'), t -> CAST({tc} AS BIGINT)),"
        f" CAST(0 AS BIGINT), (a, c) -> (a * {M} + c) % {P}) AS fingerprint",
    )


def fingerprint_oracle() -> str:
    tc = TOKCODE_DUCK.format(t="t")
    return f"""SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(regexp_split_to_array(trim(text), '\\s+'), t -> CAST({tc} AS BIGINT))),
    (a, c) -> (a * {M} + c) % {P}) AS fingerprint
FROM documents"""


_QUALITY_KEEP = ("(n_tokens >= 10 AND n_chars >= 60 AND avg_token_len >= 2.5 "
                 "AND avg_token_len <= 12.0 AND stopword_ratio <= 0.6)")


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation decision per document (the classic
    pre-training quality gate), built on text_stats."""
    s = text_stats(spark, sf_dir)
    return s.selectExpr("doc_id", "n_tokens", "n_chars",
                        f"{_QUALITY_KEEP} AS keep")


def quality_filter_oracle() -> str:
    return f"""WITH s AS ({text_stats_oracle()})
SELECT doc_id, n_tokens, n_chars, {_QUALITY_KEEP} AS keep FROM s"""


# per-language keep rate in permille (the classic corpus-rebalancing
# step: downsample the dominant language)
_STRATA_PERMILLE = {"en": 250, "es": 500, "de": 500, "fr": 500}
_RATE_CASE = ("CASE " + " ".join(
    f"WHEN lang = '{k}' THEN {v}" for k, v in _STRATA_PERMILLE.items())
    + " ELSE 750 END")
# deterministic splitmix-ish bucket in [0, 1000): pure BIGINT modular
# arithmetic (no engine-builtin hash), overflow-safe in both engines
_BUCKET = "(((doc_id % 100003) * 2654435761) % 1000003) % 1000"


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by language: each document
    hashes to a bucket in [0,1000) and is kept when the bucket falls
    under its stratum's permille rate.  Map-only (no shuffle), exactly
    reproducible across runs and engines — the production way to
    downsample a dominant stratum without a random seed."""
    return _docs(spark, sf_dir).selectExpr(
        "doc_id", "lang",
        f"CAST({_BUCKET} AS BIGINT) AS bucket",
        f"CAST({_RATE_CASE} AS BIGINT) AS rate_permille",
        f"{_BUCKET} < {_RATE_CASE} AS keep")


def sample_stratified_oracle() -> str:
    return f"""SELECT doc_id, lang,
  CAST({_BUCKET} AS BIGINT) AS bucket,
  CAST({_RATE_CASE} AS BIGINT) AS rate_permille,
  {_BUCKET} < {_RATE_CASE} AS keep
FROM documents"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by a BM25-style rational
    score tf * (N - df + 0.5) / (df + 0.5).

    The score is a RATIONAL function of integer counts (no log), so
    IEEE division makes it bit-identical across engines.  Scale shape:
    explode → groupBy(doc, term) for tf, groupBy(term) for df (both
    with map-side combine).  The df join carries NO broadcast hint: a
    web-scale corpus vocabulary (typos, URLs, numbers) is billions of
    rows, so the join strategy is left to Catalyst/AQE, which
    broadcasts exactly when the measured df size is under
    autoBroadcastJoinThreshold and sort-merge-joins otherwise.  N is a
    1-row aggregate cross-joined in (broadcast of one row), keeping
    the whole query a single lazy plan — no driver-side count()."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    n = d.agg(F.count("*").cast("double").alias("_n_docs"))
    toks = d.selectExpr("doc_id",
                        "explode(split(trim(text), '\\\\s+')) AS token")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = toks.select("doc_id", "token").distinct() \
        .groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "token").crossJoin(F.broadcast(n)).selectExpr(
        "doc_id", "token", "tf", "df",
        "CAST(tf AS DOUBLE) * (_n_docs - df + 0.5)"
        " / (df + 0.5) AS score")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("token"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .select("doc_id", "token", "tf", "df", "score",
                    F.col("rank").cast("int").alias("rank")))


def tfidf_top_terms_oracle() -> str:
    return """WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.token, tf, df,
         CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) AS score
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
SELECT doc_id, token, tf, df, score,
       CAST(rnk AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token ASC) AS rnk
      FROM scored)
WHERE rnk <= 3"""


def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token frequency (explode + groupBy — the classic
    wordcount shape, fully JVM-side)."""
    return (_docs(spark, sf_dir)
            .selectExpr("explode(split(trim(text), '\\\\s+')) AS token")
            .groupBy("token").agg(F.count("*").alias("freq")))


def token_histogram_oracle() -> str:
    return """SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token FROM documents)
GROUP BY token"""


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source sampling weight that
    rebalances the corpus to a UNIFORM target mixture (the standard
    pile-rebalancing step; any target vector slots into the same
    shape).  weight = target_frac / actual_frac, computed with the
    exact expression sequence mirrored in the oracle so both engines
    round identically.

    Scale shape (100 TB): one partial-aggregatable groupBy on source
    plus two 1-row aggregates cross-joined back (no driver collect,
    no window over the table)."""
    d = _docs(spark, sf_dir)
    per = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = d.agg(F.count("*").alias("_total"),
                F.countDistinct("source").alias("_nsrc"))
    return (per.crossJoin(tot)
            .select("source", "n_docs",
                    (F.col("n_docs") / F.col("_total")).alias("actual_frac"),
                    (F.lit(1.0) / F.col("_nsrc")).alias("target_frac"),
                    ((F.lit(1.0) / F.col("_nsrc"))
                     / (F.col("n_docs") / F.col("_total"))).alias("weight")))


def mixture_weights_oracle() -> str:
    return """WITH per AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT COUNT(*) AS total, COUNT(DISTINCT source) AS nsrc
        FROM documents)
SELECT source, n_docs,
  n_docs / CAST(total AS DOUBLE) AS actual_frac,
  1.0 / nsrc AS target_frac,
  (1.0 / nsrc) / (n_docs / CAST(total AS DOUBLE)) AS weight
FROM per, tot"""


# --- repetition / boilerplate signals (Gopher-style) ----------------------

_T_SPARK = "split(trim(text), '\\\\s+')"
_T_DUCK = "regexp_split_to_array(trim(text), '\\s+')"


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate
    token fraction, duplicate bigram fraction, and the most frequent
    token with its coverage fraction (the "fraction of characters in
    the most common n-gram" family of filters).

    Map-only JVM higher-order functions — no shuffle at any scale; the
    per-document cost is O(distinct_tokens x tokens), bounded by the
    document length, not the corpus.  Ties for the top token break to
    the lexicographically smallest (argmax set -> array_min), the same
    rule the oracle's list_min applies."""
    cnt = "size(filter(t, y -> y = x))"
    return (_docs(spark, sf_dir)
            .selectExpr("doc_id", f"{_T_SPARK} AS t")
            .selectExpr("doc_id", "t", "size(t) AS n",
                        "array_sort(array_distinct(t)) AS sd",
                        "CASE WHEN size(t) >= 2 THEN transform("
                        "  sequence(1, size(t) - 1),"
                        "  i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                        " ELSE array() END AS bg")
            .selectExpr("doc_id", "t", "n", "sd", "bg",
                        f"array_max(transform(sd, x -> {cnt})) AS topc")
            .selectExpr(
                "doc_id",
                "CAST(n AS INT) AS n_tokens",
                "CAST(n - size(array_distinct(t)) AS DOUBLE) / n"
                "  AS dup_token_frac",
                "CASE WHEN size(bg) > 0 THEN"
                "  CAST(size(bg) - size(array_distinct(bg)) AS DOUBLE) / size(bg)"
                " ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac",
                f"array_min(filter(sd, x -> {cnt} = topc)) AS top_token",
                "CAST(topc AS DOUBLE) / n AS top_token_frac"))


def repetition_stats_oracle() -> str:
    cnt = "len(list_filter(t, y -> y = x))"
    return f"""WITH a AS (
  SELECT doc_id, {_T_DUCK} AS t FROM documents),
b AS (
  SELECT doc_id, t, len(t) AS n,
         list_sort(list_distinct(t)) AS sd,
         CASE WHEN len(t) >= 2 THEN
           list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
         ELSE [] END AS bg
  FROM a),
c AS (
  SELECT *, list_max(list_transform(sd, x -> {cnt})) AS topc FROM b)
SELECT doc_id,
  CAST(n AS INT) AS n_tokens,
  CAST(n - len(list_distinct(t)) AS DOUBLE) / n AS dup_token_frac,
  CASE WHEN len(bg) > 0 THEN
    CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
  ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac,
  list_min(list_filter(sd, x -> {cnt} = topc)) AS top_token,
  CAST(topc AS DOUBLE) / n AS top_token_frac
FROM c"""


# --- PII scrub ------------------------------------------------------------

# identical meaning in Java regex (Spark) and RE2 (DuckDB)
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
# the synthesized corpus contains no emails, so (embedding_neardup
# precedent: testdata is read-only) deterministic PII is planted INSIDE
# the query, identically in both engines: every doc_id = 5 (mod 31)
# gains a trailing contact line
_PII_MOD, _PII_RES = 31, 5


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email detection + redaction (the standard pre-training PII
    scrub).  Map-only: regexp_count / regexp_replace are JVM
    expressions; at 100 TB this is a pure scan-stage rewrite with no
    shuffle."""
    planted = (f"CASE WHEN doc_id % {_PII_MOD} = {_PII_RES} THEN"
               " concat(text, ' contact user', CAST(doc_id AS STRING),"
               " '@example.com now') ELSE text END")
    return (_docs(spark, sf_dir)
            .selectExpr("doc_id", f"{planted} AS ptext")
            .selectExpr(
                "doc_id",
                f"CAST(regexp_count(ptext, '{_EMAIL_RE}') AS INT) AS n_emails",
                f"regexp_count(ptext, '{_EMAIL_RE}') > 0 AS has_pii",
                f"regexp_replace(ptext, '{_EMAIL_RE}', '<EMAIL>') AS redacted"))


def pii_scrub_oracle() -> str:
    planted = (f"CASE WHEN doc_id % {_PII_MOD} = {_PII_RES} THEN"
               " text || ' contact user' || CAST(doc_id AS VARCHAR)"
               " || '@example.com now' ELSE text END")
    return f"""WITH p AS (
  SELECT doc_id, {planted} AS ptext FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(ptext, '{_EMAIL_RE}')) AS INT) AS n_emails,
  len(regexp_extract_all(ptext, '{_EMAIL_RE}')) > 0 AS has_pii,
  regexp_replace(ptext, '{_EMAIL_RE}', '<EMAIL>', 'g') AS redacted
FROM p"""


# --- BPE-ish subword pre-tokenization count --------------------------------

# GPT-2-style pre-tokenizer alternation (no lookarounds, so the pattern
# means the same under Java regex and RE2, both leftmost-first):
# contraction suffixes | space-prefixed letter runs | digit runs |
# punctuation runs | whitespace runs.  SQL-escaped: '' = literal quote,
# {ws} = \s spelled per dialect.
_BPE_ALT = ("''s|''t|''re|''ve|''m|''ll|''d"
            "| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9{ws}]+|{ws}+")
_BPE_SPARK = _BPE_ALT.format(ws="\\\\s")
_BPE_DUCK = _BPE_ALT.format(ws="\\s")


# the synthesized corpus is space-separated lowercase words, on which
# BPE pre-tokenization degenerates to the whitespace split — so
# (planted-corpus precedent) every doc_id = 11 (mod 29) gains a suffix
# with contractions, digits, and punctuation runs, which the regex must
# segment into more pieces than the whitespace split sees
_BPE_MOD, _BPE_RES = 29, 11
_BPE_SUFFIX = " it''s 2024, state-of-the-art (v2.0)!"


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenizer token counting: whitespace tokens vs the BPE-style
    pre-tokenization the real tokenizers segment on, plus the
    chars-per-token compression proxy.  Map-only regexp_extract_all —
    a pure scan-stage expression at any scale."""
    planted = (f"CASE WHEN doc_id % {_BPE_MOD} = {_BPE_RES} THEN"
               f" concat(text, '{_BPE_SUFFIX}') ELSE text END")
    return (_docs(spark, sf_dir)
            .selectExpr("doc_id", f"{planted} AS ptext")
            .selectExpr(
                "doc_id",
                "size(split(trim(ptext), '\\\\s+')) AS ws_tokens",
                f"size(regexp_extract_all(ptext, '{_BPE_SPARK}', 0)) AS bpe_tokens",
                "CAST(length(ptext) AS DOUBLE)"
                f" / size(regexp_extract_all(ptext, '{_BPE_SPARK}', 0))"
                " AS chars_per_token"))


def bpe_token_count_oracle() -> str:
    return f"""WITH p AS (
  SELECT doc_id,
    CASE WHEN doc_id % {_BPE_MOD} = {_BPE_RES}
      THEN text || '{_BPE_SUFFIX}' ELSE text END AS ptext
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_split_to_array(trim(ptext), '\\s+')) AS INT) AS ws_tokens,
  CAST(len(regexp_extract_all(ptext, '{_BPE_DUCK}')) AS INT) AS bpe_tokens,
  CAST(length(ptext) AS DOUBLE)
    / len(regexp_extract_all(ptext, '{_BPE_DUCK}')) AS chars_per_token
FROM p"""


# --- global-percentile length filter ---------------------------------------

_PCT_NUM, _PCT_DEN = 1, 4  # P25, exact percentile_disc semantics


def length_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative quality gate: drop documents below the exact
    25th percentile of n_chars.  The global percentile is computed the
    scale-safe way — NOT a global sort: groupBy(n_chars) compresses the
    table to its value histogram (distinct lengths, bounded variety),
    the cumulative rank runs over that compact histogram, and the
    threshold joins back as a broadcast 1-row table.  Pure integer
    arithmetic end to end — trivially bit-exact."""
    from pyspark.sql import Window
    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    h = d.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    # the window runs on the compact histogram, not the corpus
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.withColumn("cum", F.sum("cnt").over(w))
    tot = h.agg(F.sum("cnt").alias("n"))
    # percentile_disc(1/4): smallest value whose cumulative count
    # reaches ceil(n/4)
    thr = (cum.crossJoin(tot)
           .where(F.col("cum") >=
                  F.ceil(F.col("n") * _PCT_NUM / F.lit(float(_PCT_DEN))))
           .agg(F.min("n_chars").alias("p25")))
    return (d.crossJoin(F.broadcast(thr))
            .select("doc_id", "n_chars", "p25",
                    (F.col("n_chars") >= F.col("p25")).alias("keep")))


def length_percentile_filter_oracle() -> str:
    return f"""WITH h AS (
  SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars),
cum AS (
  SELECT n_chars, SUM(cnt) OVER (ORDER BY n_chars) AS cum FROM h),
tot AS (SELECT SUM(cnt) AS n FROM h),
thr AS (
  SELECT MIN(n_chars) AS p25 FROM cum, tot
  WHERE cum >= CEIL(n * {_PCT_NUM} / {_PCT_DEN}.0))
SELECT d.doc_id, d.n_chars, thr.p25, d.n_chars >= thr.p25 AS keep
FROM documents d, thr"""


# --- context-window chunking ----------------------------------------------
# The pre-training window slicer: each document becomes overlapping
# token windows of CHUNK_WINDOW tokens with CHUNK_OVERLAP carried over
# (stride = W - O).  Scale shape: map-only — tokenize once, derive the
# chunk starts with a sequence(), posexplode, slice the token array.
# No shuffle at all; at 100 TB this is pure scan-side work.
CHUNK_WINDOW = 32
CHUNK_OVERLAP = 8
CHUNK_STRIDE = CHUNK_WINDOW - CHUNK_OVERLAP


def chunk_documents(spark: SparkSession, sf_dir: str,
                    window: int = CHUNK_WINDOW,
                    stride: int = CHUNK_STRIDE) -> DataFrame:
    """Overlapping token windows per document: chunk i covers tokens
    [i*stride, i*stride + window); the last chunk is the first one
    whose end reaches the document end (every token is covered exactly
    once by construction of n_chunks = 1 + ceil(max(0, n-W)/S))."""
    toks = "split(trim(text), '\\\\s+')"
    return (
        _docs(spark, sf_dir)
        .selectExpr("doc_id", f"{toks} AS toks")
        .selectExpr(
            "doc_id", "toks", "size(toks) AS n_tok",
            f"1 + (greatest(0, size(toks) - {window}) + {stride} - 1)"
            f" div {stride} AS n_chunks")
        .select("doc_id", "toks", "n_tok",
                F.posexplode(F.expr("sequence(0, n_chunks - 1)"))
                 .alias("chunk_id", "_c"))
        .selectExpr(
            "doc_id", "CAST(chunk_id AS INT) AS chunk_id",
            f"CAST(chunk_id * {stride} AS INT) AS tok_start",
            f"CAST(least(n_tok, chunk_id * {stride} + {window}) AS INT) AS tok_end",
            f"array_join(slice(toks, chunk_id * {stride} + 1,"
            f" least(n_tok, chunk_id * {stride} + {window})"
            f" - chunk_id * {stride}), ' ') AS chunk_text"))


def chunk_documents_oracle() -> str:
    w, s = CHUNK_WINDOW, CHUNK_STRIDE
    return f"""WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents),
n AS (
  SELECT doc_id, toks, len(toks) AS n_tok,
         1 + (greatest(0, len(toks) - {w}) + {s} - 1) // {s} AS n_chunks
  FROM d)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(chunk_id * {s} AS INT) AS tok_start,
       CAST(least(n_tok, chunk_id * {s} + {w}) AS INT) AS tok_end,
       array_to_string(toks[chunk_id * {s} + 1 : least(n_tok, chunk_id * {s} + {w})],
                       ' ') AS chunk_text
FROM n, LATERAL (SELECT unnest(range(0, n_chunks)) AS chunk_id)"""


# --- bigram coverage (corpus-LM quality surrogate) -------------------------
BIGRAM_TOP_K = 200


def bigram_coverage(spark: SparkSession, sf_dir: str,
                    k: int = BIGRAM_TOP_K) -> DataFrame:
    """Quality score via corpus statistics: the fraction of a document's
    token bigrams that appear among the corpus's top-k most frequent
    bigrams (a rational-arithmetic stand-in for LM-perplexity filters —
    fluent boilerplate scores high, lexical noise scores low).

    Scale shape: bigrams explode map-side; the reference table is an
    EXACT global top-k via orderBy(count desc, bigram asc).limit(k) —
    Spark plans TakeOrderedAndProject (per-partition partial top-k,
    driver merge of k-row heaps), never a single-partition global sort
    — then broadcasts k rows back onto the bigram stream.  Rational
    coverage (count/count, IEEE division) keeps the oracle bit-exact."""
    d = _docs(spark, sf_dir).selectExpr(
        "doc_id", "split(trim(text), '\\\\s+') AS toks")
    # sequence(1, 0) would generate a DESCENDING range, so guard <2-token
    # docs explicitly.  persisted: two consumers (top-k + hits) would
    # otherwise recompute the bigram arrays, and InferFiltersFromGenerate
    # inlines the transform tree into a size(bgs) filter below the
    # explode (the contamination_check precedent; BENCH/audit_filters.py
    # flags exactly this)
    bga = d.selectExpr(
        "doc_id",
        "CASE WHEN size(toks) >= 2 THEN"
        " transform(sequence(1, size(toks) - 1),"
        "  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        " ELSE array() END AS bgs").transform(_stage_cache)
    bg = bga.select("doc_id", F.explode("bgs").alias("bg"))
    top = (bg.groupBy("bg").count()
           .orderBy(F.desc("count"), F.asc("bg")).limit(k)
           .select("bg"))
    hits = (bg.join(F.broadcast(top), "bg")
            .groupBy("doc_id").agg(F.count("*").alias("n_common")))
    return (d.selectExpr(
                "doc_id",
                "CAST(greatest(0, size(toks) - 1) AS BIGINT) AS n_bigrams")
            .join(hits, "doc_id", "left")
            .selectExpr(
                "doc_id", "n_bigrams",
                "COALESCE(n_common, CAST(0 AS BIGINT)) AS n_common",
                "CASE WHEN n_bigrams = 0 THEN 0.0 ELSE"
                " CAST(COALESCE(n_common, 0) AS DOUBLE) / n_bigrams"
                " END AS coverage"))


def bigram_coverage_oracle() -> str:
    return f"""WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM t WHERE len(toks) >= 2),
top AS (
  SELECT bg FROM (SELECT bg, COUNT(*) AS c FROM bg GROUP BY bg)
  ORDER BY c DESC, bg ASC LIMIT {BIGRAM_TOP_K}),
hits AS (
  SELECT doc_id, COUNT(*) AS n_common FROM bg JOIN top USING (bg)
  GROUP BY doc_id)
SELECT t.doc_id,
       CAST(greatest(0, len(toks) - 1) AS BIGINT) AS n_bigrams,
       COALESCE(n_common, CAST(0 AS BIGINT)) AS n_common,
       CASE WHEN len(toks) < 2 THEN 0.0
            ELSE CAST(COALESCE(n_common, 0) AS DOUBLE) / (len(toks) - 1)
       END AS coverage
FROM t LEFT JOIN hits USING (doc_id)"""
