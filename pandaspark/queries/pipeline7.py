"""LLM-data-pipeline operators, tranche 7: distributed BPE tokenizer
training.

q127 BPE pair-merge learning (Sennrich et al. 2016): the loop body every
subword tokenizer trainer runs — count weighted adjacent-symbol pairs over
the corpus vocabulary, pick the most frequent pair, MERGE it everywhere,
recount — expressed as pure relational plans with an exact DuckDB oracle.
Two learning steps are materialized: merge #1 from the initial character
pairs, and (after applying merge #1 exactly) the post-merge top-3
candidates, of which the top-1 is merge #2.

The hard part relationally is APPLYING a merge: greedy left-to-right,
non-overlapping — "a a a" under merge (a,a) becomes ["aa","a"], so a
naive "replace every matching pair" over-merges. Overlapping matches only
chain inside runs of consecutive match positions, and greedy keeps every
OTHER position within a run; runs are gaps-and-islands (position minus
match-rank is constant within a run), so the whole application is: flag
matches, island them with one window, keep even offsets, then re-derive
the merged symbol stream with a lead() — no sequential fold anywhere.

Scale shape (100 TB): everything after the word-count aggregation operates
on the corpus VOCABULARY (distinct words × word length rows), not the
corpus; windows partition by word (bounded by max word length); the
learned merge rides a 1-row broadcast. This is exactly how a cluster-scale
BPE trainer bounds its iteration cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register, spread
from .text import _norm_text

# --- q127: BPE pair-merge learning ------------------------------------------

_BPE_TOPK = 3  # post-merge candidates reported (rank 1 = merge #2)

_Q127_ORACLE = f"""
WITH wc AS (
  SELECT tok AS word, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
    FROM documents WHERE text IS NOT NULL)
  WHERE tok <> ''
  GROUP BY tok
),
sym AS (  -- vocabulary exploded to (word, 0-based position, character)
  SELECT word, cnt, i AS pos, substring(word, CAST(i AS INTEGER) + 1, 1) AS s
  FROM wc, LATERAL unnest(range(length(word))) t(i)
),
nxt AS (
  SELECT word, cnt, pos, s,
         lead(s) OVER (PARTITION BY word ORDER BY pos) AS sn
  FROM sym
),
pc0 AS (
  SELECT s AS l, sn AS r, CAST(sum(cnt) AS BIGINT) AS pair_count
  FROM nxt WHERE sn IS NOT NULL GROUP BY s, sn
),
b1 AS (SELECT l, r, pair_count FROM pc0 ORDER BY pair_count DESC, l, r LIMIT 1),
m AS (  -- greedy non-overlapping application of merge #1 (islands trick)
  SELECT n.word, n.cnt, n.pos, n.s, n.sn,
         CASE WHEN n.s = b1.l AND n.sn = b1.r THEN 1 ELSE 0 END AS mt
  FROM nxt n, b1
),
isl AS (
  SELECT *,
         CASE WHEN mt = 1 THEN pos - sum(mt) OVER (
           PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING) END AS grp
  FROM m
),
keepf AS (
  SELECT *,
         CASE WHEN mt = 1
              AND (pos - min(pos) OVER (PARTITION BY word, grp)) % 2 = 0
              THEN 1 ELSE 0 END AS kept
  FROM isl
),
stream AS (  -- merged symbol stream: drop the consumed right halves
  SELECT word, cnt, pos,
         CASE WHEN kept = 1 THEN s || sn ELSE s END AS s2,
         coalesce(lag(kept) OVER (PARTITION BY word ORDER BY pos), 0) AS absorbed
  FROM keepf
),
em AS (SELECT word, cnt, pos, s2 FROM stream WHERE absorbed = 0),
pc1 AS (
  SELECT s2 AS l, lead(s2) OVER (PARTITION BY word ORDER BY pos) AS r, cnt
  FROM em
),
agg1 AS (
  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS pair_count
  FROM pc1 WHERE r IS NOT NULL GROUP BY l, r
),
top1 AS (
  SELECT 2 AS it, CAST(row_number() OVER (ORDER BY pair_count DESC, l, r) AS BIGINT) AS rk,
         l, r, pair_count
  FROM agg1 QUALIFY rk <= {_BPE_TOPK}
)
SELECT CAST(it AS BIGINT) AS it, rk, l AS left_sym, r AS right_sym,
       l || r AS merged, pair_count
FROM (SELECT 1 AS it, CAST(1 AS BIGINT) AS rk, l, r, pair_count FROM b1
      UNION ALL
      SELECT it, rk, l, r, pair_count FROM top1)
"""


@register(
    "q127_bpe_merges",
    _Q127_ORACLE,
    "BPE trainer loop body: learn merge, apply greedily (islands), recount",
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    wc = (
        spread(d.select(_norm_text().alias("t")))
        .select(F.explode_outer(F.split(F.col("t"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # vocabulary-sized from here on; two consumers downstream (pair counts
    # + merge application) — pin it
    wc = wc.localCheckpoint(eager=False)
    chars = F.transform(
        F.sequence(F.lit(0), F.length("word") - 1),
        lambda i: F.substring(F.col("word"), i + 1, F.lit(1)),
    )
    sym = wc.select("word", "cnt", F.posexplode_outer(chars).alias("pos", "s"))
    wpos = Window.partitionBy("word").orderBy("pos")
    nxt = sym.withColumn("sn", F.lead("s").over(wpos)).localCheckpoint(eager=False)
    pc0 = (
        nxt.filter(F.col("sn").isNotNull())
        .groupBy(F.col("s").alias("l"), F.col("sn").alias("r"))
        .agg(F.sum("cnt").alias("pair_count"))
    )
    b1 = pc0.orderBy(F.col("pair_count").desc(), "l", "r").limit(1)
    # greedy application of merge #1: islands of consecutive match
    # positions, keep even offsets within each island
    m = nxt.crossJoin(
        F.broadcast(
            b1.select(
                F.col("l").alias("_l"), F.col("r").alias("_r"),
                F.col("pair_count").alias("_bc"),
            )
        )
    ).withColumn(
        "mt",
        ((F.col("s") == F.col("_l")) & (F.col("sn") == F.col("_r"))).cast("int"),
    )
    run = F.sum("mt").over(wpos.rowsBetween(Window.unboundedPreceding, 0))
    isl = m.withColumn("grp", F.when(F.col("mt") == 1, F.col("pos") - run))
    wisl = Window.partitionBy("word", "grp")
    kept = (
        (F.col("mt") == 1)
        & ((F.col("pos") - F.min("pos").over(wisl)) % 2 == 0)
    ).cast("int")
    stream = isl.withColumn("kept", kept).select(
        "word",
        "cnt",
        "pos",
        F.when(F.col("kept") == 1, F.concat("s", "sn")).otherwise(F.col("s")).alias("s2"),
        F.coalesce(F.lag("kept").over(wpos), F.lit(0)).alias("absorbed"),
        "_bc",
        "_l",
        "_r",
    )
    em = stream.filter(F.col("absorbed") == 0)
    pc1 = (
        em.withColumn("r2", F.lead("s2").over(wpos))
        .filter(F.col("r2").isNotNull())
        .groupBy(F.col("s2").alias("l"), F.col("r2").alias("r"))
        .agg(F.sum("cnt").alias("pair_count"))
    )
    wtop = Window.orderBy(F.col("pair_count").desc(), "l", "r")
    top1 = (
        pc1.withColumn("rk", F.row_number().over(wtop).cast("long"))
        .filter(F.col("rk") <= _BPE_TOPK)
        .select(F.lit(2).cast("long").alias("it"), "rk", "l", "r", "pair_count")
    )
    first = b1.select(
        F.lit(1).cast("long").alias("it"),
        F.lit(1).cast("long").alias("rk"),
        "l",
        "r",
        "pair_count",
    )
    return first.unionByName(top1).select(
        "it",
        "rk",
        F.col("l").alias("left_sym"),
        F.col("r").alias("right_sym"),
        F.concat("l", "r").alias("merged"),
        "pair_count",
    )
