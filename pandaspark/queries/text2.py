"""Text tranche 2 — SimHash signatures, document quality scoring, BPE-ish
token counting, rolling-hash (Rabin–Karp / winnowing-style) fingerprinting.
SURVEY.md §2.11: the LLM-data-pipeline text surface beyond the reference.

Everything is built-in JVM expressions (higher-order array functions, regex
counters, sha2) — no Python in the hot path. Each op is a single map pass
followed by one hash aggregation, so at 100 TB the plans are scan-shaped:
the only shuffle carries small per-doc/per-lang aggregates.

Cross-engine determinism: hashes go through sha2-hex (identical text in both
engines), float scores through integer micro-units, and every computed
column is aliased identically on both sides (see queries/__init__ docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, register, round4, spread
from .text import _norm_text

# --- q38: 16-bit SimHash signatures ---------------------------------------
#
# Classic SimHash (Charikar 2002): per doc, hash every distinct token; for
# each output bit, sum +1/-1 votes across token hashes; the sign of the sum
# is the bit. Near-identical docs get identical/near signatures, so dedup
# becomes a groupBy on the signature (or a small-Hamming-distance probe).
# Bit source: nibble parity of the token's sha256 hex — identical in Spark
# (sha2) and DuckDB (sha256), so the whole signature is oracle-checkable.

_SIMHASH_BITS = 16

_Q38_ORACLE = f"""
WITH n AS (
  SELECT doc_id, lang, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents WHERE doc_id < 80 AND text IS NOT NULL
), toks AS (
  SELECT doc_id, lang, len(list_distinct(string_split(t, ' '))) AS n_tokens,
         unnest(list_distinct(string_split(t, ' '))) AS tok
  FROM n
), hs AS (
  SELECT doc_id, lang, n_tokens, sha256(tok) AS h FROM toks
), bits AS (
  SELECT doc_id, lang, n_tokens, k.range AS k,
         CASE WHEN sum(2 * ((strpos('0123456789abcdef',
                                     substr(h, CAST(k.range AS INTEGER) + 1, 1)) - 1) % 2) - 1) > 0
              THEN 1 ELSE 0 END AS b
  FROM hs, range({_SIMHASH_BITS}) k
  GROUP BY ALL
)
SELECT doc_id, lang, CAST(any_value(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(b * (1 << CAST(k AS INTEGER))) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id, lang
"""


@register("q38_simhash", _Q38_ORACLE, "16-bit SimHash signature per document")
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 80) & F.col("text").isNotNull()
    )
    t = _norm_text()
    tokens = F.array_distinct(F.split(t, " "))
    # hash each token ONCE (transform), then fold per bit over the hex strings
    d2 = d.select(
        "doc_id",
        "lang",
        F.transform(tokens, lambda tok: F.sha2(tok, 256)).alias("hs"),
    )

    def nibble(h, k: int):
        # hex digit value at 0-based position k (conv: hex → decimal string)
        return F.conv(h.substr(k + 1, 1), 16, 10).cast("int")

    def bit(k: int):
        votes = F.aggregate(
            F.col("hs"), F.lit(0), lambda acc, h: acc + (2 * (nibble(h, k) % 2) - 1)
        )
        return F.when(votes > 0, F.lit(1)).otherwise(F.lit(0))

    simhash = bit(0) * F.lit(1)
    for k in range(1, _SIMHASH_BITS):
        simhash = simhash + bit(k) * F.lit(2**k)
    return d2.select(
        "doc_id",
        "lang",
        F.size("hs").cast("long").alias("n_tokens"),
        simhash.cast("long").alias("simhash"),
    )


# --- q39: document quality scoring ----------------------------------------
#
# Heuristic quality score in [0,1]: token-count saturation, punctuation
# density, stopword-rate saturation, alphabetic ratio — equal-weighted.
# The per-doc score is a pure arithmetic tree over integer regex counts, so
# both engines produce bit-identical doubles; aggregation goes through
# integer 1e4-units for an exact mean.

_STOP_RE = r"\b(the|and|is|of|to|in)\b"

_Q39_ORACLE = f"""
WITH s AS (
  SELECT lang,
    floor(( least(1.0, CAST(length(regexp_extract_all(text, '\\S+')) AS DOUBLE) / 100.0) * 0.25
     + (1.0 - CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
              / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.25
     + least(1.0, CAST(length(regexp_extract_all(lower(text), '{_STOP_RE}')) AS DOUBLE) * 10.0
              / CAST(greatest(length(regexp_extract_all(text, '\\S+')), 1) AS DOUBLE)) * 0.25
     + CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
              / CAST(greatest(length(text), 1) AS DOUBLE) * 0.25) * 10000 + 0.5) / 10000.0 AS q
  FROM documents WHERE text IS NOT NULL
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(round(q * 10000) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 10000.0 AS avg_quality,
       min(q) AS min_q, max(q) AS max_q,
       CAST(count(*) FILTER (q < 0.5) AS BIGINT) AS n_low
FROM s GROUP BY lang
"""


@register("q39_quality_score", _Q39_ORACLE, "heuristic doc quality score, per-lang stats")
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    chars = F.length("text")
    toks = F.regexp_count("text", F.lit(r"\S+"))
    # single-char-class counts via translate (delete the class, diff the
    # lengths): same integers as regexp_count('[...]'), but pure codegen —
    # drops 2 of the 4 per-doc regex passes (~2x on this query at sf0.1)
    punct = chars - F.length(F.translate(F.col("text"), ".,;:!?", ""))
    stop = F.regexp_count(F.lower(F.col("text")), F.lit(_STOP_RE))
    _ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    alpha = chars - F.length(F.translate(F.col("text"), _ALPHA, ""))
    chars1 = F.greatest(chars, F.lit(1)).cast("double")
    score = round4(
        F.least(F.lit(1.0), toks.cast("double") / 100.0) * 0.25
        + (F.lit(1.0) - punct.cast("double") / chars1) * 0.25
        + F.least(
            F.lit(1.0),
            stop.cast("double") * 10.0 / F.greatest(toks, F.lit(1)).cast("double"),
        )
        * 0.25
        + alpha.cast("double") / chars1 * 0.25
    )
    s = d.select("lang", score.alias("q"))
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.round(F.col("q") * 10000).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(10000.0)
        ).alias("avg_quality"),
        F.min("q").alias("min_q"),
        F.max("q").alias("max_q"),
        F.count_if(F.col("q") < 0.5).alias("n_low"),
    )


# --- q43: BPE-ish regex token counting ------------------------------------
#
# GPT-2-style pre-tokenizer regex (contractions | space-prefixed word |
# number | punctuation run | whitespace run), counted per doc and rolled up
# per lang, alongside plain whitespace tokens for the tokens-per-word ratio.

_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"

_Q43_ORACLE = """
WITH c AS (
  SELECT lang,
         length(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+')) AS bpe,
         length(regexp_extract_all(text, '\\S+')) AS ws
  FROM documents WHERE text IS NOT NULL
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
       CAST(sum(ws) AS BIGINT) AS ws_tokens,
       floor(CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE) * 10000 + 0.5) / 10000.0 AS tokens_per_word
FROM c GROUP BY lang
"""


@register("q43_bpe_tokens", _Q43_ORACLE, "BPE-style pre-tokenizer counts per lang")
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    bpe = F.regexp_count("text", F.lit(_BPE_RE))
    ws = F.regexp_count("text", F.lit(r"\S+"))
    c = d.select("lang", bpe.alias("bpe"), ws.alias("ws"))
    return c.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe").cast("long").alias("bpe_tokens"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        round4(
            F.sum("bpe").cast("double") / F.sum("ws").cast("double")
        ).alias("tokens_per_word"),
    )


# --- q44: rolling-hash document fingerprinting ----------------------------
#
# Rabin–Karp polynomial rolling hash over 8-grams (base 31, mod 1000003),
# with mod-64 fingerprint selection (the 0-mod-p scheme used by winnowing /
# MOSS-style fingerprinters). Per doc: gram count, selected-fingerprint
# count, min/max fingerprint. All higher-order array expressions — the
# 100 TB plan is one narrow scan+project, no shuffle at all until the
# (tiny) per-doc result.

_K = 8
_BASE = 31
_MOD = 1000003
_SEL = 64  # keep hashes ≡ 0 (mod 64) as fingerprints
_POWS = [_BASE**j for j in range(_K)]  # _POWS[j] = 31^j

_duck_terms = " + ".join(
    f"CAST(ord(substr(t, CAST(i AS INTEGER) + {j}, 1)) AS BIGINT) * {_POWS[_K - 1 - j]}"
    for j in range(_K)
)

_Q44_ORACLE = f"""
WITH n AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents WHERE doc_id < 100 AND text IS NOT NULL
), g AS (
  SELECT doc_id, t FROM n WHERE length(t) >= {_K}
), h AS (
  SELECT doc_id,
         [({_duck_terms}) % {_MOD} FOR i IN range(1, length(t) - {_K - 2})] AS hashes
  FROM g
), f AS (
  SELECT doc_id, hashes, list_filter(hashes, x -> x % {_SEL} = 0) AS fps FROM h
)
SELECT doc_id,
       CAST(len(hashes) AS BIGINT) AS n_grams,
       CAST(len(fps) AS BIGINT) AS n_fp,
       CAST(list_aggregate(fps, 'min') AS BIGINT) AS min_fp,
       CAST(list_aggregate(fps, 'max') AS BIGINT) AS max_fp
FROM f
"""


@register("q44_rolling_fingerprint", _Q44_ORACLE, "Rabin-Karp 8-gram fingerprints per doc")
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").isNotNull()
    )
    t = _norm_text()
    g = d.select("doc_id", t.alias("t")).filter(F.length("t") >= _K)

    def gram_hash(i):
        expr = None
        for j in range(_K):
            term = F.ascii(F.substr(F.col("t"), i + F.lit(j), F.lit(1))).cast("long") * F.lit(
                _POWS[_K - 1 - j]
            )
            expr = term if expr is None else expr + term
        return expr % F.lit(_MOD)

    hashes = F.transform(F.sequence(F.lit(1), F.length("t") - (_K - 1)), gram_hash)
    h = g.select("doc_id", hashes.alias("hashes"))
    f = h.select(
        "doc_id", "hashes", F.filter("hashes", lambda x: x % _SEL == 0).alias("fps")
    )
    return f.select(
        "doc_id",
        F.size("hashes").cast("long").alias("n_grams"),
        F.size("fps").cast("long").alias("n_fp"),
        F.array_min("fps").cast("long").alias("min_fp"),
        F.array_max("fps").cast("long").alias("max_fp"),
    )


# --- q57: edit-distance fuzzy matching (SymSpell deletion neighborhood) ----
#
# All supplier-name pairs within levenshtein distance 1 — the fuzzy-key
# primitive for entity resolution / typo-tolerant dedup. The ORACLE is the
# quadratic definition; the Spark plan is the SymSpell idea (Garbe's
# Symmetric Delete): any dist<=1 pair shares at least one single-deletion
# variant, so candidates come from an equi-join on the O(n*L) variant set —
# no O(n^2) pair space ever materializes, which is what survives 100x more
# names. Variant collisions can reach dist 2 ('ab'/'ba' share 'a'), so a
# final levenshtein verify keeps semantics exact.

_Q57_ORACLE = """
WITH n AS (SELECT DISTINCT s_name FROM supplier)
SELECT a.s_name AS name_a, b.s_name AS name_b,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
FROM n a JOIN n b ON a.s_name < b.s_name
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


@register("q57_fuzzy_match", _Q57_ORACLE, "dist<=1 fuzzy self-join via SymSpell delete variants")
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DISTINCT names on both sides: the contract is "match distinct keys",
    # so a corpus with repeated names (e.g. the 5x synthetic's key-offset
    # copies) yields each name PAIR once — without this, a row-level
    # self-join multiplies every pair by the duplicate count squared
    s = spread(load(spark, sf_dir, "supplier").select("s_name").distinct())
    # variants = the name itself (catches pure insert/delete) + every
    # single-character deletion; explode → (variant, name). Built with
    # F.expr because substring with a per-element dynamic length needs the
    # SQL form inside the lambda.
    variants = F.array_union(
        F.array(F.col("s_name")),
        F.expr(
            "transform(sequence(1, length(s_name)), "
            "i -> concat(substring(s_name, 1, i - 1), substring(s_name, i + 1)))"
        ),
    )
    v = s.select(F.col("s_name"), F.explode(variants).alias("variant"))
    a = v.select(F.col("s_name").alias("name_a"), "variant")
    b = v.select(F.col("s_name").alias("name_b"), "variant")
    cand = (
        a.join(b, ["variant"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b").cast("long")
    return cand.select("name_a", "name_b", dist.alias("dist")).filter(F.col("dist") <= 1)


# --- q59: word count (explode / flatMap shape) -----------------------------

_Q59_ORACLE = """
SELECT lang, word, n FROM (
  SELECT lang, word, CAST(count(*) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, word) AS rk
  FROM (
    SELECT lang, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
    FROM documents WHERE text IS NOT NULL)
  WHERE word != ''
  GROUP BY lang, word)
WHERE rk <= 20
"""


@register("q59_wordcount", _Q59_ORACLE, "explode → count → top-20 words per lang")
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical flatMap-groupBy: explode words, hash-aggregate counts
    (map-side partials carry (lang, word, partial_n) — never raw text), then
    a per-lang top-k window on the already-tiny aggregate."""
    from pyspark.sql import Window

    d = spread(load(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    words = d.select(
        "lang", F.explode_outer(F.split(_norm_text(), " ")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "word")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "word", "n")
    )
