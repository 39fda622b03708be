"""Tranche 18: ANN tuning depth, snapshot diff, and the composite
training-data pipeline — the capstone operators of the round.

q198 multi-probe IVF recall curve: the tuning loop that sizes an ANN
index BEFORE a 100 TB build — recall@k and scanned-fraction as a
function of nprobe (1..3), in ONE plan: the probe ranking materializes
once and each (qid, cell, rank r) row fans out to every nprobe level
>= r, so the three searches share the centroid scoring and the cell
scan instead of re-running per level. At scale the fact table is
partitioned by cell id, so scanned-fraction IS the cost model: the
report shows exactly what recall each additional probe buys.

q199 snapshot diff: the table-format DIFF/CDC-between-versions
primitive. Version 2 is derived deterministically from orders (sha-
selected deletes, +1.00 price updates, key-offset inserts), and the
diff classifies added/removed/changed/unchanged via one full-outer
join on the key with fingerprint comparison — per class: row count and
the net money delta. At 100 TB both sides are key-partitioned scans
and the join co-locates; nothing else moves.

q200 composite pipeline funnel: the engine's headline operators
composed end-to-end the way a real corpus build runs them —
length/quality gate -> language gate -> exact near-order dedup (bag
hash, first-id-wins) -> sliding-window chunking — emitting the
per-stage survivor counts plus the final chunk mass. Every stage is a
plan fragment already proven green in isolation (q31's stats shapes,
q124's bag hash, q97's chunk manifest); the funnel hash-checks their
COMPOSITION, which is what a user actually ships.

Scale notes: q198 broadcasts centroids and probe lists (K cells, Q
queries — both tiny); q199 is one co-partitioned full-outer join;
q200 is scan -> hash-agg -> bounded explode. No driver collects, no
Python UDFs, no unbounded single-partition windows.

Reference parity: q200 is the beyond-reference pipeline the task
mandates; q199 generalizes the reference's import-dedup diff
(/root/reference/panda.py:736-745) to a versioned-table diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register, round4, sha_int, spread, sql_round4, sql_sha_int
from .similarity import _DIMS, _K, _N_QUERIES, _dot, _norm, _sql_centroid_terms

# --- q198: multi-probe IVF recall curve --------------------------------------

_MAX_PROBE = 3

_Q198_ORACLE = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM e),
cents AS (
  SELECT label AS cell, list_value({_sql_centroid_terms()}) AS centroid
  FROM e GROUP BY label
),
q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < {_N_QUERIES}),
ranked_cells AS (
  SELECT qid, qe, cell,
         row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, cell) AS prk
  FROM (
    SELECT q.qid, q.qe, c.cell,
           floor(list_dot_product(qe, centroid)
                 / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(centroid, centroid)))
                 * 10000 + 0.5) / 10000.0 AS ccos
    FROM q CROSS JOIN cents c)
),
probes AS (
  SELECT nprobe, qid, qe, cell
  FROM ranked_cells CROSS JOIN (SELECT unnest(range(1, {_MAX_PROBE + 1})) AS nprobe)
  WHERE prk <= nprobe
),
cand AS (
  SELECT p.nprobe, p.qid, e.vec_id,
         floor(list_dot_product(p.qe, e.emb)
               / (sqrt(list_dot_product(p.qe, p.qe)) * sqrt(list_dot_product(e.emb, e.emb)))
               * 10000 + 0.5) / 10000.0 AS cosine
  FROM probes p JOIN e ON e.label = p.cell AND e.vec_id != p.qid
),
approx_tk AS (
  SELECT nprobe, qid, vec_id,
         row_number() OVER (PARTITION BY nprobe, qid
                            ORDER BY cosine DESC, vec_id) AS rk
  FROM cand QUALIFY rk <= {_K}
),
exact_tk AS (
  SELECT q.qid, e.vec_id,
         row_number() OVER (PARTITION BY q.qid ORDER BY
           floor(list_dot_product(q.qe, e.emb)
                 / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(e.emb, e.emb)))
                 * 10000 + 0.5) / 10000.0 DESC, e.vec_id) AS rk
  FROM q JOIN e ON e.vec_id != q.qid QUALIFY rk <= {_K}
),
hits AS (
  SELECT a.nprobe, CAST(count(*) AS BIGINT) AS n_hit
  FROM approx_tk a JOIN exact_tk x ON x.qid = a.qid AND x.vec_id = a.vec_id
  GROUP BY a.nprobe
),
scanned AS (
  SELECT nprobe, CAST(count(*) AS BIGINT) AS n_scanned
  FROM cand GROUP BY nprobe
)
SELECT s.nprobe, coalesce(h.n_hit, CAST(0 AS BIGINT)) AS n_hit,
       CAST({_N_QUERIES * _K} AS BIGINT) AS n_exact,
       {sql_round4(f'CAST(coalesce(h.n_hit, 0) AS DOUBLE) / {_N_QUERIES * _K}.0')}
         AS recall,
       s.n_scanned,
       {sql_round4(f'CAST(s.n_scanned AS DOUBLE) / ({_N_QUERIES}.0 * (SELECT n_corpus FROM corpus))')}
         AS scanned_frac
FROM scanned s LEFT JOIN hits h USING (nprobe)
"""


@register(
    "q198_ivf_multiprobe_curve",
    _Q198_ORACLE,
    "IVF recall@k and scanned-fraction vs nprobe in one shared plan",
)
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    # e feeds SEVEN consumers (corpus count, centroids, query set, cell
    # scan, exact baseline, per-cell counts, query labels); without the
    # checkpoint the before-plan re-ran the scan+spread seven times (only
    # 3 exchanges got reused). One materialization of the small vector
    # frame serves all of them (guide §5 — reused and cheap to hold).
    # Measured at sf0.1 (interleaved, 6 pairs): 2.04 → 1.84 s min.
    e = spread(load(spark, sf_dir, "embeddings")).localCheckpoint(eager=False)
    n_corpus = e.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    centroid_terms = ", ".join(
        f"CAST(SUM(CAST(ROUND(CAST(embedding[{i}] AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / CAST(COUNT(1) AS DOUBLE) / 1000000.0"
        for i in range(_DIMS)
    )
    cents = e.groupBy("label").agg(F.expr(f"ARRAY({centroid_terms})").alias("centroid"))
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    qc = q.crossJoin(F.broadcast(cents.select(F.col("label").alias("cell"), "centroid")))
    ccos = round4(
        _dot(F.col("qe"), F.col("centroid")) / (_norm(F.col("qe")) * _norm(F.col("centroid")))
    )
    wq = Window.partitionBy("qid").orderBy(F.col("ccos").desc(), "cell")
    ranked = (
        qc.select("qid", "qe", "cell", ccos.alias("ccos"))
        .withColumn("prk", F.row_number().over(wq))
        .filter(F.col("prk") <= _MAX_PROBE)
    )
    # each rank-r cell belongs to every nprobe level >= r: the fan-out that
    # lets all three searches share one probe ranking and one cell scan
    probes = ranked.withColumn(
        "nprobe", F.explode(F.sequence("prk", F.lit(_MAX_PROBE)))
    ).select("nprobe", "qid", "qe", "cell")
    cand = F.broadcast(probes).join(e, F.col("label") == F.col("cell")).filter(
        F.col("vec_id") != F.col("qid")
    )
    cosine = round4(
        _dot(F.col("qe"), F.col("embedding")) / (_norm(F.col("qe")) * _norm(F.col("embedding")))
    )
    scored = cand.select("nprobe", "qid", "vec_id", cosine.alias("cosine"))
    wk = Window.partitionBy("nprobe", "qid").orderBy(F.col("cosine").desc(), "vec_id")
    approx_tk = scored.withColumn("rk", F.row_number().over(wk)).filter(
        F.col("rk") <= _K
    )
    # scanned-fraction needs only CANDIDATE COUNTS, never the cosines:
    # counting through `scored` would evaluate the probe-join + fold-cosine
    # subtree a second time (the window and the count agg partition
    # differently, so the plan can't share the exchange). Per probe row the
    # candidate count is |cell| minus 1 iff the query's own vector lives in
    # that cell — derivable from a K-row per-cell count broadcast.
    # exact baseline: brute force over all (q, e) pairs
    qe_all = q.crossJoin(e).filter(F.col("vec_id") != F.col("qid"))
    ecos = round4(
        _dot(F.col("qe"), F.col("embedding")) / (_norm(F.col("qe")) * _norm(F.col("embedding")))
    )
    wx = Window.partitionBy("qid").orderBy(F.col("ecos").desc(), "vec_id")
    exact_tk = (
        qe_all.select("qid", "vec_id", ecos.alias("ecos"))
        .withColumn("rk", F.row_number().over(wx))
        .filter(F.col("rk") <= _K)
        .select("qid", "vec_id")
    )
    hits = (
        approx_tk.join(exact_tk, ["qid", "vec_id"], "left_semi")
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    lbl_cnt = e.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    qlab = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel")
    )
    scanned = (
        probes.join(F.broadcast(lbl_cnt), F.col("cell") == F.col("label"))
        .join(F.broadcast(qlab), "qid")
        .groupBy("nprobe")
        .agg(
            (
                F.sum("cnt")
                - F.sum(F.when(F.col("cell") == F.col("qlabel"), 1).otherwise(0))
            )
            .cast("long")
            .alias("n_scanned")
        )
        # the oracle derives its row set from `cand` (actual candidate
        # rows), so an nprobe level whose every probed cell holds only the
        # query's own vector has NO oracle row; drop the n_scanned=0 row
        # the probe-derived count would otherwise emit
        .filter(F.col("n_scanned") > 0)
    )
    zero = F.lit(0).cast("long")
    return (
        scanned.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(n_corpus))
        .select(
            F.col("nprobe").cast("long").alias("nprobe"),
            F.coalesce("n_hit", zero).alias("n_hit"),
            F.lit(_N_QUERIES * _K).cast("long").alias("n_exact"),
            round4(
                F.coalesce("n_hit", zero).cast("double") / F.lit(float(_N_QUERIES * _K))
            ).alias("recall"),
            "n_scanned",
            round4(
                F.col("n_scanned").cast("double")
                / (F.lit(float(_N_QUERIES)) * F.col("n_corpus").cast("double"))
            ).alias("scanned_frac"),
        )
    )


# --- q199: snapshot diff ------------------------------------------------------

_DIFF_MOD = 20  # sha(key) % 20: 0 -> deleted in v2, 1 -> price+1.00, 2 -> cloned as insert
# synthetic-insert keys live in a disjoint key space: a fixed high bit far
# above any real o_orderkey (TPC-H sf1 tops out ~6e6, sf1000 ~6e9; 2^40 ≈
# 1.1e12) so clones can never collide with v1 keys and fan out the full join
_INSERT_OFFSET = 1 << 40


_SQL_KEYHASH = sql_sha_int("CAST(o_orderkey AS VARCHAR)") + f" % {_DIFF_MOD}"

_Q199_ORACLE = f"""
WITH v1 AS (
  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         {_SQL_KEYHASH} AS h
  FROM orders
),
v2 AS (
  SELECT k, CASE WHEN h = 1 THEN cents + 100 ELSE cents END AS cents
  FROM v1 WHERE h != 0
  UNION ALL
  SELECT k + {_INSERT_OFFSET}, cents FROM v1 WHERE h = 2
),
d AS (
  SELECT CASE WHEN a.k IS NULL THEN 'added'
              WHEN b.k IS NULL THEN 'removed'
              WHEN a.cents != b.cents THEN 'changed'
              ELSE 'unchanged' END AS change,
         coalesce(b.cents, 0) - coalesce(a.cents, 0) AS delta
  FROM v1 a FULL JOIN v2 b ON a.k = b.k
)
SELECT change, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(delta) AS BIGINT) AS net_cents_delta
FROM d GROUP BY change
"""


@register(
    "q199_snapshot_diff",
    _Q199_ORACLE,
    "versioned-table diff: added/removed/changed/unchanged with net money delta",
)
def q199(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two table versions by key: one full-outer join classifying
    every key as added/removed/changed/unchanged with the net cents
    delta per class. v2 derives deterministically from orders (sha-keyed
    deletes/updates/inserts) so the diff itself is the thing under test.
    Both sides partition on the join key — co-located at any scale."""
    v1 = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (sha_int(F.col("o_orderkey").cast("string")) % _DIFF_MOD).alias("h"),
    )
    v2 = (
        v1.filter(F.col("h") != 0)
        .select(
            "k",
            F.when(F.col("h") == 1, F.col("cents") + 100)
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        .unionByName(
            v1.filter(F.col("h") == 2).select(
                (F.col("k") + _INSERT_OFFSET).alias("k"), "cents"
            )
        )
    )
    d = (
        v1.select(F.col("k").alias("k1"), F.col("cents").alias("c1"))
        .join(
            v2.select(F.col("k").alias("k2"), F.col("cents").alias("c2")),
            F.col("k1") == F.col("k2"),
            "full",
        )
        .select(
            F.when(F.col("k1").isNull(), "added")
            .when(F.col("k2").isNull(), "removed")
            .when(F.col("c1") != F.col("c2"), "changed")
            .otherwise("unchanged")
            .alias("change"),
            (F.coalesce("c2", F.lit(0)) - F.coalesce("c1", F.lit(0))).alias("delta"),
        )
    )
    return d.groupBy("change").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("delta").cast("long").alias("net_cents_delta"),
    )


# --- q200: composite training-data pipeline funnel ----------------------------

_MIN_CHARS = 64
_KEEP_LANGS = ("en", "de", "fr", "es")  # drop the no-tokenizer tail
_CHUNK, _STRIDE = 32, 24


_Q200_ORACLE = f"""
WITH raw AS (SELECT doc_id, text, lang, n_chars FROM documents),
gated AS (
  SELECT * FROM raw WHERE text IS NOT NULL AND n_chars >= {_MIN_CHARS}
),
langed AS (
  SELECT * FROM gated WHERE lang IN {_KEEP_LANGS}
),
bagged AS (
  SELECT *, sha256(array_to_string(list_sort(list_distinct(
            string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))),
          ' ')) AS bag
  FROM langed
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY bag ORDER BY doc_id) AS rn
    FROM bagged) WHERE rn = 1
),
chunked AS (
  SELECT doc_id,
         greatest(1, CAST(ceil(n_tok / {_STRIDE}.0) AS BIGINT)) AS n_chunks
  FROM (SELECT doc_id,
               CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                 AS n_tok
        FROM deduped)
)
SELECT 'raw' AS stage, CAST(1 AS BIGINT) AS stage_no,
       (SELECT CAST(count(*) AS BIGINT) FROM raw) AS n_units
UNION ALL SELECT 'length_gate', 2, (SELECT count(*) FROM gated)
UNION ALL SELECT 'lang_gate', 3, (SELECT count(*) FROM langed)
UNION ALL SELECT 'bag_dedup', 4, (SELECT count(*) FROM deduped)
UNION ALL SELECT 'chunks', 5, (SELECT CAST(sum(n_chunks) AS BIGINT) FROM chunked)
"""


@register(
    "q200_pipeline_funnel",
    _Q200_ORACLE,
    "the composite corpus build: gates -> bag dedup -> chunking, per-stage funnel",
)
def q200(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's operators composed the way a corpus build ships them:
    length gate -> language gate -> word-bag exact dedup (first doc_id
    wins, q124's hash) -> 32/24 sliding chunk manifest (q97's shape),
    reported as a funnel of per-stage survivor counts. Every stage is a
    narrow scan/hash-agg/bounded-explode fragment; the funnel checks the
    COMPOSITION cross-engine."""
    raw = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    gated = raw.filter(F.col("text").isNotNull() & (F.col("n_chars") >= _MIN_CHARS))
    langed = gated.filter(F.col("lang").isin(*_KEEP_LANGS))
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    bag = F.sha2(
        F.array_join(F.array_sort(F.array_distinct(F.split(norm, " "))), " "), 256
    )
    wb = Window.partitionBy("bag").orderBy("doc_id")
    deduped = (
        spread(langed)
        .withColumn("bag", bag)
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
    )
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    chunked = deduped.select(
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(n_tok / F.lit(float(_STRIDE))).cast("long"),
        ).alias("n_chunks")
    )

    def stage(name: str, no: int, df_count: DataFrame) -> DataFrame:
        return df_count.select(
            F.lit(name).alias("stage"),
            F.lit(no).cast("long").alias("stage_no"),
            F.col("n").alias("n_units"),
        )

    return (
        stage("raw", 1, raw.agg(F.count(F.lit(1)).cast("long").alias("n")))
        .unionByName(stage("length_gate", 2, gated.agg(F.count(F.lit(1)).cast("long").alias("n"))))
        .unionByName(stage("lang_gate", 3, langed.agg(F.count(F.lit(1)).cast("long").alias("n"))))
        .unionByName(stage("bag_dedup", 4, deduped.agg(F.count(F.lit(1)).cast("long").alias("n"))))
        .unionByName(stage("chunks", 5, chunked.agg(F.sum("n_chunks").cast("long").alias("n"))))
    )
