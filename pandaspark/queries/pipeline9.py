"""Tranche 9: distributed graph analytics and skew-resistant joins.

q138 triangle counting — the standard MapReduce-era algorithm (Cohen 2009
"Graph twiddling in a MapReduce world"; Suri & Vassilvitskii 2011): orient
every edge from its lower-(degree, id) endpoint to the higher one, build
wedges only from each node's OUT-neighbors, and close them against the
oriented edge set. Orientation bounds every node's wedge fan-out by its
out-degree (<= sqrt(2m) on any graph), which is what keeps the
intermediate O(m^1.5) instead of sum-of-degree-squared — the difference
between a triangle count that finishes at 100 TB and one that doesn't.
The graph here is the co-purchase graph contracted to 1000 part buckets
(nodes are a FIXED space at any data scale; support counts grow instead —
the contraction every production co-occurrence graph applies first),
keeping the top-50k edges by co-occurrence support: the "strongest ties"
cap bounds edge count — and with it the oriented wedge volume — at EVERY
data scale, so the plan cannot saturate into a trivially-complete graph
as the fact table grows (at 400 buckets uncapped, sf0.1 already produced
79,799 of 79,800 possible edges).

q139 skew-resistant salted join — operators.salted_join registered as a
hash-checked query: events are enriched per event_type (5 hot keys, the
canonical skew shape) through the (key, salt) join, then re-aggregated;
the oracle is the plain join, which the salted plan must match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, register, spread, sql_round4, round4

# --- q138: degree-oriented triangle counting ---------------------------------

_TC_BUCKETS = 1000
_TC_TOP_EDGES = 50_000

_Q138_ORACLE = f"""
WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey % {_TC_BUCKETS} AS p FROM lineitem
),
e AS MATERIALIZED (
  SELECT x, y FROM (
    SELECT a.p AS x, b.p AS y, count(*) AS sup
    FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    GROUP BY a.p, b.p
    ORDER BY sup DESC, x, y
    LIMIT {_TC_TOP_EDGES})
),
tri AS (
  SELECT count(*) AS c
  FROM e e1
  JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
  JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y
)
SELECT CAST((SELECT count(DISTINCT p) FROM li) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT c FROM tri) AS BIGINT) AS n_triangles
"""


@register(
    "q138_triangle_count",
    _Q138_ORACLE,
    "degree-oriented triangle counting on the bucketed co-purchase graph",
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"),
        F.pmod(F.col("l_partkey"), F.lit(_TC_BUCKETS)).alias("p"),
    )
    # co-occurrence pairs WITHOUT a self-join: one groupBy(order) shuffle
    # collects each order's distinct part-buckets (bounded by order size),
    # and the x<y pairs explode map-side from the sorted array — the
    # support aggregate is the only other edge-list shuffle
    # no checkpoint here: lazy localCheckpoint pays a planning+codegen
    # round-trip per query BUILD (~0.3-0.5 s each on this chain), and the
    # only other consumer (n_nodes) is a cheap count-distinct rescan
    arr = raw.groupBy("o").agg(F.sort_array(F.collect_set("p")).alias("ps"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )
    e = (
        arr.select(F.explode(pair_structs).alias("pr"))
        .groupBy(F.col("pr.x").alias("x"), F.col("pr.y").alias("y"))
        .agg(F.count(F.lit(1)).alias("sup"))
        # strongest-ties cap: TakeOrdered of a bounded edge list, total
        # order (sup desc, x, y) so the kept set is deterministic
        .orderBy(F.col("sup").desc(), "x", "y")
        .limit(_TC_TOP_EDGES)
        .select("x", "y")
        .localCheckpoint(eager=False)  # undirected edges feed deg + orient + close
    )
    deg = (
        e.select(F.explode(F.array(F.col("x"), F.col("y"))).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )  # recomputes read the e checkpoint: bounded, no checkpoint of its own
    # orient each edge from the lower-(degree, id) endpoint — the total
    # order that bounds out-degree by sqrt(2m). deg is bounded by the
    # FIXED _TC_BUCKETS node space, so broadcasting it is scale-safe by
    # construction (not a small-SF accident).
    ed = (
        e.join(F.broadcast(deg.select(F.col("v").alias("x"), F.col("d").alias("dx"))), "x")
        .join(F.broadcast(deg.select(F.col("v").alias("y"), F.col("d").alias("dy"))), "y")
    )
    kx = F.struct(F.col("dx").alias("kd"), F.col("x").alias("kn"))
    ky = F.struct(F.col("dy").alias("kd"), F.col("y").alias("kn"))
    fwd = kx < ky
    oriented = ed.select(
        F.when(fwd, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(fwd, F.col("y")).otherwise(F.col("x")).alias("v"),
        F.when(fwd, ky).otherwise(kx).alias("kv"),
    ).localCheckpoint(eager=False)  # wedge legs + closing edge
    # the oriented edge list is capped at _TC_TOP_EDGES rows at ANY data
    # scale — broadcast it on both the wedge leg and the closing probe, so
    # only the (potentially m^1.5-sized) wedge stream ever shuffles
    o1 = oriented.alias("o1")
    wedges = o1.join(
        F.broadcast(oriented.alias("o2")),
        (F.col("o1.u") == F.col("o2.u")) & (F.col("o1.kv") < F.col("o2.kv")),
    ).select(F.col("o1.v").alias("wv"), F.col("o2.v").alias("ww"))
    # inner join, not left_semi: distinct centers u can produce the same
    # (wv, ww) wedge, and each closure is a distinct triangle
    tri = wedges.join(
        F.broadcast(oriented.select(F.col("u").alias("wv"), F.col("v").alias("ww"))),
        ["wv", "ww"],
    )
    # n_edges = sum(deg)/2 (every kept edge contributes two degree units),
    # sparing a separate count pass over e
    return (
        raw.agg(F.count_distinct("p").alias("n_nodes"))
        .crossJoin(deg.agg((F.sum("d") / 2).cast("long").alias("n_edges")))
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
    )


# --- q139: skew-resistant salted join, hash-checked --------------------------
#
# events.event_type has 5 values over the whole table — the textbook hot
# key: a plain shuffle join sends ~1/5 of 100 TB into ONE reducer. The
# salted form joins on (event_type, salt) so each hot key fans across 8
# tasks; the enrichment result must be row-for-row identical to the plain
# join (the oracle). The final re-aggregation keys on event_type with
# map-side partials, so it tolerates the same skew by construction.

_Q139_SALT = 8

_Q139_ORACLE = f"""
WITH d AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS type_n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS type_cents
  FROM events GROUP BY event_type
),
j AS (
  SELECT e.event_type, e.user_id, CAST(round(e.value * 100) AS BIGINT) AS v_cents,
         d.type_n, d.type_cents
  FROM events e JOIN d USING (event_type)
)
SELECT event_type, type_n, type_cents / 100.0 AS type_total,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       {sql_round4("CAST(sum(v_cents) AS DOUBLE) / type_cents")} AS mass_check
FROM j
GROUP BY event_type, type_n, type_cents
"""


@register(
    "q139_salted_join",
    _Q139_ORACLE,
    "hot-key enrichment through the (key, salt) join, exact vs plain-join oracle",
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pandaspark.operators import salted_join

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    d = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_n"), F.sum("v_cents").alias("type_cents")
    )
    j = salted_join(spread(ev), d, "event_type", salt=_Q139_SALT)
    return (
        j.groupBy("event_type", "type_n", "type_cents")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.sum("v_cents").alias("_mass"),
        )
        .select(
            "event_type",
            "type_n",
            (F.col("type_cents") / F.lit(100.0)).alias("type_total"),
            "n_users",
            round4(F.col("_mass").cast("double") / F.col("type_cents")).alias(
                "mass_check"
            ),
        )
    )
