"""Iterative + statistical pipeline operators, tranche 4: PageRank and a
bigram language model.

q112 PageRank: the second classic iterative-graph operator after q61's
connected components — importance scoring over a relationship graph (here
the customer↔supplier trade graph). Production data pipelines use exactly
this loop for domain-authority weighting of crawled corpora (e.g. the
Common-Crawl-style host graph). Beyond-reference capability (the reference
is single-pass eager pandas, SURVEY.md §2).

q113 bigram LM: per-language bigram counts with add-one (Laplace)
smoothing — the training half of the classic statistical LM used for
corpus quality filtering (a perplexity scorer needs exactly these
(count, num, den) tables). Probabilities are emitted as exact integer
rationals (num/den), never floats: cross-engine hash-exactness and no
libm-log divergence.

Scale notes (100 TB):
- q112 keeps ALL per-iteration state as (node, bigint) rows; each of the
  three rounds is one shuffle of the edge list joined to the rank table on
  src — the Pregel/GraphX communication pattern. Ranks are probability
  mass in 1e-12 fixed-point; every update is integer floor arithmetic, so
  the result is bitwise identical on any cluster layout or partition count.
  The loop-invariant graph is materialized ONCE (localCheckpoint); the
  fixed 3-round loop itself stays one lazy job.
- q113 is explode → hash-aggregate with map-side partials; the conditional
  denominator and vocabulary size reuse the bigram partials (no second
  corpus scan). Per-row regex work sits behind spread() so a single-file
  fixture scan still feeds every core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register, spread
from .text import _norm_text

_SCALE = 1_000_000_000_000  # 1e-12 fixed-point rank mass
_DAMP_NUM, _DAMP_DEN = 85, 100
_ITERS = 3


_Q112_ORACLE = f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS c,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS s
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
), edges AS MATERIALIZED (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), deg AS MATERIALIZED (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
), nn AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n FROM deg
), r0 AS MATERIALIZED (
  SELECT src AS node, {_SCALE} // n AS pr FROM deg, nn
), r1 AS MATERIALIZED (
  SELECT e.dst AS node,
         CAST(({_SCALE} * {_DAMP_DEN - _DAMP_NUM}) // ({_DAMP_DEN} * any_value(nn.n))
              + ({_DAMP_NUM} * sum(r.pr // d.outdeg)) // {_DAMP_DEN} AS BIGINT) AS pr
  FROM edges e JOIN r0 r ON r.node = e.src
  JOIN deg d ON d.src = e.src CROSS JOIN nn
  GROUP BY e.dst
), r2 AS MATERIALIZED (
  SELECT e.dst AS node,
         CAST(({_SCALE} * {_DAMP_DEN - _DAMP_NUM}) // ({_DAMP_DEN} * any_value(nn.n))
              + ({_DAMP_NUM} * sum(r.pr // d.outdeg)) // {_DAMP_DEN} AS BIGINT) AS pr
  FROM edges e JOIN r1 r ON r.node = e.src
  JOIN deg d ON d.src = e.src CROSS JOIN nn
  GROUP BY e.dst
), r3 AS (
  SELECT e.dst AS node,
         CAST(({_SCALE} * {_DAMP_DEN - _DAMP_NUM}) // ({_DAMP_DEN} * any_value(nn.n))
              + ({_DAMP_NUM} * sum(r.pr // d.outdeg)) // {_DAMP_DEN} AS BIGINT) AS pr
  FROM edges e JOIN r2 r ON r.node = e.src
  JOIN deg d ON d.src = e.src CROSS JOIN nn
  GROUP BY e.dst
)
SELECT CASE WHEN node % 2 = 0 THEN 'C' || CAST(node // 2 AS VARCHAR)
            ELSE 'S' || CAST(node // 2 AS VARCHAR) END AS node,
       pr AS pr_scaled
FROM (SELECT node, pr FROM r3 ORDER BY pr DESC, node LIMIT 20)
"""


@register(
    "q112_pagerank",
    _Q112_ORACLE,
    "3-iteration integer fixed-point PageRank over the customer-supplier graph",
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized bipartite trade graph (C→S and S→C for every distinct
    customer-supplier pair), so every node has out-degree >= 1 and there is
    no dangling mass to redistribute. Rank starts as SCALE//N probability
    mass; each round: contribution = pr div outdeg per out-edge (floor),
    new pr = (1-d)/N + d * sum(contribs), all in integer fixed-point, so
    three rounds are bit-identical to the unrolled SQL regardless of
    partitioning. The per-node degree is pre-joined into the edge list ONCE
    (it never changes); each round shuffles only (node, pr) longs."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # shuffle-hash, not sort-merge: the orderkey join needs no order, and
    # at 100 TB both fact sides are co-bucketable on orderkey anyway
    pairs = (
        li.join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # both directions in one pass (an explode, not a union that would
    # evaluate the join+distinct subtree twice), then the out-degree via a
    # src-partitioned window: ONE shuffle of the edge list, which leaves
    # the checkpointed graph HASH-PARTITIONED ON src — the layout every
    # iteration's join reuses below.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # ONE eager materialization of the loop-invariant graph. Without it the
    # unrolled rounds re-reference the distinct+degree subtree and the plan
    # grows multiplicatively (measured: 148 HashAggregates in the 3-round
    # DAG, 7-10 s at sf0.1); with it, every downstream reference is a local
    # scan and the whole loop is graph-build + ONE lazy 3-round job.
    # Everything derived from the graph (node list, degree, node count)
    # reads the checkpoint, never the raw tables. localCheckpoint records
    # the physical hash(src) partitioning, so each iteration's
    # edges ⋈ ranks join exchanges ONLY the (node, pr) rank rows — the
    # GraphX communication pattern: edges stay put, ranks travel.
    edges_deg = (
        edges.withColumn(
            "outdeg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        ).localCheckpoint(eager=True)
    )
    nn = edges_deg.select("src").distinct().agg(F.count(F.lit(1)).alias("_n"))

    ranks = (
        edges_deg.select(F.col("src").alias("node"))
        .distinct()
        .crossJoin(F.broadcast(nn))
        .select("node", F.expr(f"{_SCALE} div _n").alias("pr"))
    )
    for _ in range(_ITERS):
        # shuffle-hash join, build side = the rank table: per-task build is
        # node_count/n_partitions (n_partitions scales with the cluster);
        # no sort of the edge list, no exchange of the edge list, and from
        # round 2 on the rank side arrives pre-partitioned by the groupBy
        contrib = edges_deg.join(
            ranks.hint("shuffle_hash"), edges_deg.src == ranks.node
        ).select(F.col("dst").alias("node"), F.expr("pr div outdeg").alias("c"))
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("sc"))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                F.expr(
                    f"({_SCALE} * {_DAMP_DEN - _DAMP_NUM}) div ({_DAMP_DEN} * _n)"
                    f" + ({_DAMP_NUM} * sc) div {_DAMP_DEN}"
                ).alias("pr"),
            )
        )
    label = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("C")).otherwise(F.lit("S")),
        F.expr("node div 2"),
    )
    return (
        ranks.orderBy(F.col("pr").desc(), "node")
        .limit(20)
        .select(label.alias("node"), F.col("pr").alias("pr_scaled"))
    )


_Q113_ORACLE = """
WITH toks AS (
  SELECT lang,
         list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                     x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL
), bg AS (
  SELECT lang, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT lang, t, unnest(range(1, length(t))) AS i FROM toks WHERE length(t) >= 2)
), c2 AS (
  SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY lang, w1, w2
), c1 AS (
  SELECT lang, w1, CAST(sum(n) AS BIGINT) AS hist FROM c2 GROUP BY lang, w1
), vocab AS (
  SELECT lang, CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c2 GROUP BY lang
)
SELECT lang, w1, w2, n, n + 1 AS p_num, hist + v AS p_den
FROM (
  SELECT c2.lang, w1, w2, n, hist, v,
         row_number() OVER (PARTITION BY c2.lang ORDER BY n DESC, w1, w2) AS rk
  FROM c2
  JOIN c1 USING (lang, w1)
  JOIN vocab USING (lang)
)
WHERE rk <= 10
"""


@register(
    "q113_bigram_lm",
    _Q113_ORACLE,
    "per-language add-one-smoothed bigram LM; exact rational probabilities",
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts via one explode → hash aggregate (map-side partials
    carry (lang, w1, w2, partial_n)); the history denominator c1 is a
    second aggregate OVER THE BIGRAM PARTIALS (sum of n per (lang, w1)),
    not a rescan of the corpus, and the per-language successor vocabulary
    joins back as a broadcast. Laplace-smoothed P(w2|w1) is emitted as the
    exact rational (n+1)/(hist+V): integers hash-match any engine; a
    downstream perplexity scorer can take logs lazily. Top-10 per language
    on the tiny aggregate keeps the result report-sized."""
    d = spread(load(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    toks = d.select(
        "lang",
        F.filter(F.split(_norm_text(), " "), lambda x: x != "").alias("t"),
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        "lang",
        F.explode_outer(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
            )
        ).alias("z"),
    ).select("lang", F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    c2 = bg.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    c1 = c2.groupBy("lang", "w1").agg(F.sum("n").alias("hist"))
    vocab = c2.groupBy("lang").agg(F.count_distinct("w2").alias("v"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "w1", "w2")
    return (
        c2.join(c1, ["lang", "w1"])
        .join(F.broadcast(vocab), "lang")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(
            "lang",
            "w1",
            "w2",
            "n",
            (F.col("n") + 1).alias("p_num"),
            (F.col("hist") + F.col("v")).alias("p_den"),
        )
    )


_Q114_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                     x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL
), bg AS (
  SELECT doc_id, lang, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, lang, t, unnest(range(1, length(t))) AS i
        FROM toks WHERE length(t) >= 2)
), model AS (
  SELECT lang, w1, w2 FROM bg GROUP BY lang, w1, w2 HAVING count(*) >= 3
)
SELECT bg.doc_id,
       any_value(bg.lang) AS lang,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN model.w1 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_known
FROM bg
LEFT JOIN model ON model.lang = bg.lang AND model.w1 = bg.w1 AND model.w2 = bg.w2
GROUP BY bg.doc_id
"""


@register(
    "q114_lm_novelty",
    _Q114_ORACLE,
    "per-document OOV-bigram rate against the corpus bigram LM",
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scoring half of the bigram LM (q113 is the training half): each
    document's bigrams check membership in the corpus model (bigrams seen
    >= 3 times in its language), yielding an exact integer coverage
    (n_known / n_bigrams) — the deterministic stand-in for perplexity-based
    quality filtering (a float log-prob would diverge across libm
    implementations; a rational never does). One explode feeds BOTH sides:
    the model is an aggregate of the same bigram partials the scorer
    shuffles, so the corpus is scanned once. The membership join shuffles
    on (lang, w1, w2) — the model side is already deduplicated, so the
    fanout per key is exactly 1 and the join output equals the bigram
    count (no blowup)."""
    d = spread(load(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    toks = (
        d.select(
            "doc_id",
            "lang",
            F.filter(F.split(_norm_text(), " "), lambda x: x != "").alias("t"),
        )
        .filter(F.size("t") >= 2)
        # bg feeds BOTH the model aggregate and the scoring join below —
        # pin the tokenized docs (doc-sized, not bigram-sized) so the
        # regex normalize + split pass runs once, not per consumer
        .localCheckpoint(eager=False)
    )
    bg = toks.select(
        "doc_id",
        "lang",
        F.explode_outer(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
            )
        ).alias("z"),
    ).select("doc_id", "lang", F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    model = (
        bg.groupBy("lang", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 3)
        .select("lang", "w1", "w2", F.lit(1).alias("_known"))
    )
    return (
        bg.join(model, ["lang", "w1", "w2"], "left")
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("lang")).alias("lang"),
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce(F.col("_known"), F.lit(0))).cast("long").alias("n_known"),
        )
    )
