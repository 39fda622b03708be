"""Iterative graph operators — near-dup cluster canonicalization.

A large-scale dedup pipeline doesn't stop at *pairs* (q33/q34/q55): near-dup
relations are transitive in practice (A~B, B~C), so the keep/drop decision
needs *clusters* — connected components over the similarity graph, with one
canonical survivor per component. The reference has nothing iterative
(SURVEY.md §2 — eager pandas, single pass); this is pure beyond-reference
capability mandated by the LLM-data-pipeline surface (SURVEY.md §2.11).

Spark-first design: min-label propagation — the standard distributed CC
(GraphFrames / Pregel style). labels(node) starts at node id; each round
joins labels to the (symmetrized) edge list and takes the min label seen in
the neighborhood; repeat to fixpoint. Each round is one shuffle on node id;
rounds needed = graph diameter (near-dup clusters are tiny cliques, so 2-3).
`localCheckpoint` truncates lineage each round — without it the plan doubles
per iteration and Catalyst analysis time dominates. Convergence is detected
with a 1-row aggregate (sum of labels is monotone non-increasing), never by
collecting the label table.

At 100 TB: nodes/edges are the *candidate* graph (post-LSH, q34), orders of
magnitude smaller than the corpus; each round shuffles only (node, lbl)
longs. This exact loop is how production dedup (e.g. the large-star /
small-star CC of Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) behaves on small-diameter graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register
from .text import _norm_text

_K = 5  # shingle width; 3-grams are useless here (0.45 baseline jaccard)
_THRESH = 0.5  # planted near-dups sit at jaccard >= 0.9; background << 0.5

_Q61_ORACLE = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, lang,
         list_distinct([substring(t, i, {_K}) FOR i IN range(1, length(t) - {_K - 2})]) AS shingles
  FROM (SELECT doc_id, lang, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
        FROM documents WHERE doc_id < 60 AND text IS NOT NULL)
), pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / CAST(length(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
        >= {_THRESH}
), edges AS (
  SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS lbl FROM sh
  UNION
  SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node
), comp AS (
  SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node
)
SELECT doc_id, cluster,
       CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size,
       doc_id = cluster AS is_canonical
FROM comp
"""


@register(
    "q61_dup_clusters",
    _Q61_ORACLE,
    "near-dup connected components via min-label propagation; canonical per cluster",
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 60) & F.col("text").isNotNull()
    )
    # normalized text materialized in its own projection first — a lambda
    # capturing the regex expression would re-run it per shingle position
    tc = F.col("t")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(tc) - (_K - 1)),
            lambda i: F.substring(tc, i, F.lit(_K)),
        )
    )
    sh = (
        d.select("doc_id", "lang", _norm_text().alias("t"))
        .select("doc_id", "lang", shingles.alias("shingles"))
    )

    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_distinct(F.concat(F.col("a.shingles"), F.col("b.shingles"))))
    jac = inter.cast("double") / union.cast("double")
    pairs = (
        a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .filter(jac >= _THRESH)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)  # reused every round; cut the jaccard-join lineage

    labels = sh.select(F.col("doc_id").alias("node"), F.col("doc_id").alias("lbl"))
    prev_sum = None
    for _ in range(20):  # cap >> diameter of any real near-dup cluster
        prop = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), F.col("lbl")
        )
        labels = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lbl")).first()[0]
        if cur_sum == prev_sum:  # monotone non-increasing → equality = fixpoint
            break
        prev_sum = cur_sum

    w = Window.partitionBy("cluster")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster")
    ).select(
        "doc_id",
        "cluster",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster")).alias("is_canonical"),
    )
