"""Training-data pipeline operators (SURVEY.md §2.11 extensions): corpus
vocabulary analysis, deterministic stratified sampling, embedding
quantization. Each is the Spark-shaped version of a step every large-scale
LLM-data pipeline runs between raw crawl and training shards.

Cross-engine determinism notes: no float transcendentals (log-based TF-IDF
is replaced by an exact integer cross-multiplication ratio test), sampling
uses md5 — bit-identical hex in both engines — and quantization is
IEEE-exact arithmetic on doubles (see queries/__init__ conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register, round4, sha_int, spread, sql_round4, sql_sha_int
from .text import _norm_text

# --- q66: distinctive vocabulary per language (TF-IDF-shaped, exact) --------
#
# For each language: terms whose in-language relative document frequency is
# more than 1.1x their global relative document frequency (the synthetic
# corpus shares most vocabulary across languages — max observed ratio 1.6 —
# so the threshold sits inside the real signal range), top-20 by in-lang
# df. The ratio test runs as integer cross-multiplication
# (in_df * global_docs * 10 > 11 * global_df * lang_docs) — the same signal
# a log-idf ranking gives at this threshold, with zero float ops, so the
# oracle hash can't drift on libm differences. Plan shape at 100 TB: one
# explode → two hash aggregations (term-level stats are tiny) → broadcast
# of per-lang doc counts.

_Q66_ORACLE = """
WITH words AS (
  SELECT DISTINCT doc_id, lang,
         unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents WHERE text IS NOT NULL
), filtered AS (SELECT * FROM words WHERE term != '' AND length(term) >= 3),
lang_docs AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_lang_docs
              FROM documents WHERE text IS NOT NULL GROUP BY lang),
total AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM documents WHERE text IS NOT NULL),
lang_df AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS in_df
            FROM filtered GROUP BY lang, term),
global_df AS (SELECT term, CAST(count(*) AS BIGINT) AS g_df FROM filtered GROUP BY term)
SELECT lang, term, in_df, g_df FROM (
  SELECT l.lang, l.term, l.in_df, g.g_df,
         row_number() OVER (PARTITION BY l.lang ORDER BY l.in_df DESC, l.term) AS rk
  FROM lang_df l
  JOIN global_df g USING (term)
  JOIN lang_docs d ON d.lang = l.lang
  CROSS JOIN total
  WHERE l.in_df * total.n_docs * 10 > 11 * g.g_df * d.n_lang_docs)
WHERE rk <= 20
"""


@register("q66_distinctive_terms", _Q66_ORACLE, "per-lang distinctive vocabulary (exact ratio test)")
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # document frequency = one count per (doc, term): dedup each doc's terms
    # MAP-SIDE (array_distinct before the explode) instead of a corpus-wide
    # .distinct() — that distinct was a full-width extra shuffle whose input
    # is the entire exploded token stream. A doc has exactly one lang, so
    # per-doc dedup makes (lang, term) occurrence counts == document
    # frequencies.
    terms = F.array_distinct(
        F.filter(
            F.split(_norm_text(), " "), lambda t: (t != "") & (F.length(t) >= 3)
        )
    )
    # spread() ONLY on the explode leg: the doc-count legs below are plain
    # aggregations with map-side partials, and wrapping the shared `d` in
    # spread made all three consumers re-run the scan+repartition of full
    # text rows (no exchange reuse fires across them). Row-preserving, so
    # results are identical. Measured at sf0.1 (interleaved, 2×5 pairs):
    # 0.93 → 0.65 s min, new side faster in every pair.
    words = spread(d).select("lang", F.explode_outer(terms).alias("term")).filter(
        F.col("term").isNotNull()
    )
    lang_df = words.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("in_df"))
    # global df folds out of the per-lang aggregate (sum over langs) — the
    # second aggregation reads the small (lang, term) frame, not the corpus
    global_df = lang_df.groupBy("term").agg(F.sum("in_df").alias("g_df"))
    lang_docs = d.groupBy("lang").agg(F.countDistinct("doc_id").alias("n_lang_docs"))
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        lang_df.join(global_df, "term")
        .join(F.broadcast(lang_docs), "lang")
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("in_df") * F.col("n_docs") * 10
            > 11 * F.col("g_df") * F.col("n_lang_docs")
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("in_df").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "term", "in_df", "g_df")
    )


# --- q67: deterministic stratified sampling ---------------------------------
#
# ~12.5% of documents per language, chosen by an md5 threshold on doc_id —
# reproducible across engines, runs, partitionings, and cluster sizes
# (unlike df.sample, whose output depends on partition layout). This is how
# training-data pipelines carve held-out/eval slices that must stay stable
# as the corpus recomputes. Map-only plan: no shuffle at all until the
# per-lang audit aggregate.

_SAMPLE_NUM = 8192  # threshold over the first 4 md5 nibbles (0..65535): 1/8

_Q67_ORACLE = f"""
WITH s AS (
  SELECT doc_id, lang
  FROM documents
  WHERE text IS NOT NULL
    AND (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
      < {_SAMPLE_NUM}
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id
FROM s GROUP BY lang
"""


@register("q67_stratified_sample", _Q67_ORACLE, "deterministic md5-threshold sample, per-lang audit")
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    s = d.filter(bucket < _SAMPLE_NUM)
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("id_sum"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


# --- q69: benchmark contamination check (word-8-gram overlap) ---------------
#
# The pre-training hygiene step: find training documents sharing any word
# 8-gram with a benchmark/eval set (stand-in here: doc_id % 97 == 0 — a
# deterministic pseudo-benchmark slice). Docs explode to DISTINCT 8-gram
# hashes (sha_int — engine-portable, 8 bytes on the wire instead of the
# gram text), the benchmark's hash set is the small side of a semi/inner
# join keyed on the hash, and the report is one row per contaminated doc
# with overlap counts. Plan at 100 TB: explode → per-doc distinct →
# hash-join on an 8-byte key whose build side is benchmark-sized.
# mod 7 makes the pseudo-benchmark dense enough that the planted near-dup
# pairs actually straddle the bench/train split at verify scale (a 0-row
# report would be a vacuous correctness check).

_NGRAM_WORDS = 8
_BENCH_MOD = 7


def _contamination_frames(spark: SparkSession, sf_dir: str):
    d = spread(load(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    grams = F.expr(
        f"transform(sequence(1, greatest(size(w) - {_NGRAM_WORDS - 1}, 1)),"
        f" i -> concat_ws(' ', slice(w, i, {_NGRAM_WORDS})))"
    )
    hashed = (
        d.select("doc_id", F.split(_norm_text(), " ").alias("w"))
        .select("doc_id", F.explode_outer(F.array_distinct(grams)).alias("g"))
        .select("doc_id", sha_int("g").alias("h"))
    )
    bench = hashed.filter(F.col("doc_id") % _BENCH_MOD == 0).select("h").distinct()
    train = hashed.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return train, bench


_Q69_ORACLE = f"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents WHERE text IS NOT NULL
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(w[i:i + {_NGRAM_WORDS - 1}], ' ')
                FOR i IN range(1, greatest(len(w) - {_NGRAM_WORDS - 1}, 1) + 1)])) AS g
  FROM norm
),
hashed AS (SELECT doc_id, {sql_sha_int('g')} AS h FROM grams),
bench AS (SELECT DISTINCT h FROM hashed WHERE doc_id % {_BENCH_MOD} = 0),
train AS (SELECT doc_id, h FROM hashed WHERE doc_id % {_BENCH_MOD} != 0),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM train GROUP BY doc_id),
shared AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
  FROM train WHERE h IN (SELECT h FROM bench) GROUP BY doc_id
)
SELECT t.doc_id, s.n_shared, t.n_grams,
       {sql_round4('CAST(s.n_shared AS DOUBLE) / CAST(t.n_grams AS DOUBLE)')} AS overlap
FROM tot t JOIN shared s USING (doc_id)
"""


@register("q69_contamination", _Q69_ORACLE, "benchmark n-gram contamination report")
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, bench = _contamination_frames(spark, sf_dir)
    tot = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (
        train.join(F.broadcast(bench), "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    overlap = round4(F.col("n_shared").cast("double") / F.col("n_grams").cast("double"))
    return tot.join(shared, "doc_id").select(
        "doc_id", "n_shared", "n_grams", overlap.alias("overlap")
    )


# --- q70: repetition / boilerplate scoring ----------------------------------
#
# Quality filter every crawl pipeline runs: the duplicate-shingle fraction
# (1 - distinct/total 5-gram shingles) flags boilerplate, templated, and
# looping documents. Both counts are PER-DOC facts, so they compute
# map-side from the shingle array (size / size(array_distinct)) — no
# explode, no shuffle; work per row is bounded by doc length. The only
# distributed step is the top-100 report (TakeOrderedAndProject).

_Q70_ORACLE = """
WITH sh AS (
  SELECT doc_id, lang,
         [substring(t, i, 5) FOR i IN range(1, greatest(length(t) - 4, 1) + 1)] AS s
  FROM (SELECT doc_id, lang, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
        FROM documents WHERE text IS NOT NULL)
),
scored AS (
  SELECT doc_id, lang,
         CAST(len(s) AS BIGINT) AS n_shingles,
         CAST(len(list_distinct(s)) AS BIGINT) AS n_distinct,
         floor((1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / CAST(len(s) AS DOUBLE))
               * 10000 + 0.5) / 10000.0 AS rep_ratio
  FROM sh
)
SELECT doc_id, lang, n_shingles, n_distinct, rep_ratio
FROM scored
ORDER BY rep_ratio DESC, doc_id
LIMIT 100
"""


@register("q70_repetition_score", _Q70_ORACLE, "duplicate-shingle boilerplate scoring, top-100")
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    shingles = F.expr(
        "transform(sequence(1, greatest(length(t) - 4, 1)), i -> substring(t, i, 5))"
    )
    scored = (
        d.select("doc_id", "lang", _norm_text().alias("t"))
        .select("doc_id", "lang", shingles.alias("sh"))
        .select(
            "doc_id",
            "lang",
            F.size("sh").cast("long").alias("n_shingles"),
            F.size(F.array_distinct("sh")).cast("long").alias("n_distinct"),
        )
    )
    rep = round4(
        1.0 - F.col("n_distinct").cast("double") / F.col("n_shingles").cast("double")
    )
    return (
        scored.withColumn("rep_ratio", rep)
        .orderBy(F.col("rep_ratio").desc(), "doc_id")
        .limit(100)
        .select("doc_id", "lang", "n_shingles", "n_distinct", "rep_ratio")
    )


# --- q68: embedding int8 scalar quantization --------------------------------
#
# Per-vector absmax scalar quantization (the standard int8 compression for
# ANN indexes and embedding shipping): scale = absmax/127, q_i =
# floor(x_i/scale + 0.5) in [-127, 127] (+0.5-floor = the round4 convention
# — library rounding differs between engines). Everything is IEEE-exact
# double arithmetic, so the full quantized vector hash-matches the oracle.
# Map-only at any scale; the only shuffle is the audit ordering.

_Q68_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id < 200),
m AS (SELECT vec_id, emb, list_max(list_transform(emb, x -> abs(x))) AS absmax FROM e)
SELECT vec_id, absmax / 127.0 AS scale,
       to_json([CAST(floor(x / (absmax / 127.0) + 0.5) AS BIGINT) FOR x IN emb]) AS qvec
FROM m WHERE absmax > 0
"""


@register("q68_int8_quantize", _Q68_ORACLE, "absmax int8 embedding quantization (exact)")
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    m = e.select("vec_id", emb.alias("emb")).select(
        "vec_id",
        "emb",
        F.array_max(F.transform(F.col("emb"), lambda x: F.abs(x))).alias("absmax"),
    )
    scale = F.col("absmax") / 127.0
    qvec = F.transform(F.col("emb"), lambda x: F.floor(x / (F.col("absmax") / 127.0) + 0.5))
    # quantized vector ships JSON-serialized (identical compact form in both
    # engines; top-level arrays break pandas-based result canonicalizers)
    return m.filter(F.col("absmax") > 0).select(
        "vec_id", scale.alias("scale"), F.to_json(qvec).alias("qvec")
    )


# --- q71: temperature-weighted language mixture sampling ---------------------
#
# The data-mixing step of every multilingual pre-training run: low-resource
# languages are upsampled relative to their corpus share (sampling rate
# proportional to n^(alpha-1), here alpha=0.5 — the T=2 temperature mix).
# Per-language keep-rate is c/sqrt(n_lang) capped at 1, materialized as an
# INTEGER basis-point threshold so the keep decision (48-bit sha hash of
# doc_id mod 10000 < threshold) is engine-exact with no knife-edge double
# compares. Plan at 100 TB: per-lang counts are a tiny aggregate, broadcast
# back onto the scan; the sample never shuffles — one filter pass — and the
# report is a second tiny aggregate. Reference scope: beyond-reference
# (SURVEY §2.11 pipeline extension).

_Q71_ORACLE = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
),
thresholds AS (
  SELECT lang, n_docs,
         least(CAST(10000 AS BIGINT),
               CAST(floor(30000.0 / sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT))
           AS threshold_bp
  FROM counts
),
kept AS (
  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_sampled
  FROM documents d JOIN thresholds t USING (lang)
  WHERE {sql_sha_int('CAST(d.doc_id AS VARCHAR)')} % 10000 < t.threshold_bp
  GROUP BY d.lang
)
SELECT t.lang, t.n_docs, t.threshold_bp,
       coalesce(k.n_sampled, CAST(0 AS BIGINT)) AS n_sampled
FROM thresholds t LEFT JOIN kept k USING (lang)
"""


@register("q71_mixture_sampling", _Q71_ORACLE, "temperature-weighted per-language sampling report")
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    thresholds = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "threshold_bp",
            F.least(
                F.lit(10000).cast("long"),
                F.floor(F.lit(30000.0) / F.sqrt(F.col("n_docs").cast("double"))).cast("long"),
            ),
        )
    )
    kept = (
        d.join(F.broadcast(thresholds.select("lang", "threshold_bp")), "lang")
        .filter(sha_int(F.col("doc_id")) % 10000 < F.col("threshold_bp"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return thresholds.join(kept, "lang", "left").select(
        "lang",
        "n_docs",
        "threshold_bp",
        F.coalesce(F.col("n_sampled"), F.lit(0).cast("long")).alias("n_sampled"),
    )


# --- q72: PII masking + k-anonymity suppression ------------------------------
#
# The dataset-release privacy pass: direct identifiers are masked (customer
# number keeps only its last 3 digits), the quasi-identifier (account
# balance) is generalized into 500-unit buckets, and any
# (segment, bucket) group smaller than k=5 has its bucket suppressed
# (nulled) so no published row is k-distinguishable. Plan at 100 TB: the
# group-size table is tiny (segments x buckets) and broadcasts back onto
# the scan — one wide pass, no row-level shuffle. Reference scope:
# beyond-reference (SURVEY §2.11 pipeline extension).

_Q72_K = 5

_Q72_ORACLE = f"""
WITH base AS (
  SELECT c_custkey,
         'Customer#******' || right(c_name, 3) AS masked_name,
         c_mktsegment,
         CAST(floor(c_acctbal / 500.0) AS BIGINT) * 500 AS bal_bucket
  FROM customer
),
sizes AS (
  SELECT c_mktsegment, bal_bucket, CAST(count(*) AS BIGINT) AS n
  FROM base GROUP BY c_mktsegment, bal_bucket
)
SELECT b.c_custkey, b.masked_name, b.c_mktsegment,
       CASE WHEN s.n >= {_Q72_K} THEN b.bal_bucket END AS bal_bucket,
       (s.n < {_Q72_K}) AS suppressed
FROM base b JOIN sizes s USING (c_mktsegment, bal_bucket)
"""


@register("q72_pii_masking", _Q72_ORACLE, "identifier masking + k-anonymity bucket suppression")
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(F.lit("Customer#******"), F.substring(F.col("c_name"), -3, 3)).alias(
            "masked_name"
        ),
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 500.0).cast("long") * 500).alias("bal_bucket"),
    )
    sizes = base.groupBy("c_mktsegment", "bal_bucket").agg(F.count(F.lit(1)).alias("n"))
    return base.join(F.broadcast(sizes), ["c_mktsegment", "bal_bucket"]).select(
        "c_custkey",
        "masked_name",
        "c_mktsegment",
        F.when(F.col("n") >= _Q72_K, F.col("bal_bucket")).alias("bal_bucket"),
        (F.col("n") < _Q72_K).alias("suppressed"),
    )


# --- q73: boilerplate n-gram mining ----------------------------------------
#
# Template/boilerplate detection across a crawl: per source, the word
# trigrams appearing in the most DISTINCT documents (document frequency,
# not occurrences). Per-doc gram de-dup happens map-side (array_distinct
# before the explode), the df>=2 prune drops the singleton long tail
# BEFORE the top-k window, and the window partitions by source over the
# already aggregated (source, gram, df) frame — its width is
# pruned-grams-per-source, not corpus size. Trigram + df>=2 is tuned to
# the synthetic corpus's repetition floor (longer grams are near-unique
# even at sf0.1, which would make the report vacuous). Reference scope:
# beyond-reference (§2.11).

_Q73_ORACLE = """
WITH norm AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents WHERE text IS NOT NULL
),
grams AS (
  SELECT doc_id, source,
         unnest(list_distinct([array_to_string(w[i:i + 2], ' ')
                FOR i IN range(1, greatest(len(w) - 2, 1) + 1)])) AS gram
  FROM norm
),
df AS (
  SELECT source, gram, CAST(count(*) AS BIGINT) AS df_cnt
  FROM grams GROUP BY source, gram HAVING count(*) >= 2
)
SELECT source, gram, df_cnt FROM (
  SELECT source, gram, df_cnt,
         row_number() OVER (PARTITION BY source ORDER BY df_cnt DESC, gram) AS rk
  FROM df)
WHERE rk <= 10
"""


@register("q73_boilerplate_ngrams", _Q73_ORACLE, "per-source top document-frequency 5-grams")
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    grams = F.expr(
        "transform(sequence(1, greatest(size(w) - 2, 1)),"
        " i -> concat_ws(' ', slice(w, i, 3)))"
    )
    df_cnt = (
        d.select("doc_id", "source", F.split(_norm_text(), " ").alias("w"))
        .select("doc_id", "source", F.explode_outer(F.array_distinct(grams)).alias("gram"))
        .groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("df_cnt"))
        .filter(F.col("df_cnt") >= 2)
    )
    w = Window.partitionBy("source").orderBy(F.col("df_cnt").desc(), "gram")
    return (
        df_cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("source", "gram", "df_cnt")
    )
