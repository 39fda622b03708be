"""Tranche 11: sequence islands, skyline, robust stats, and temporal
nearest-join operators (q151-q164).

q151 gaps-and-islands — consecutive-day activity streaks via the
date-minus-row_number island key (one keyed window, no self-join).
q152 skyline / Pareto frontier — the sort-based O(n log n) plan (running
max over a strictly-preceding RANGE frame), never the O(n^2) dominance
self-join. q153 robust outliers — median/MAD from the (group, value)
histogram shuffle q27/q140 established, so hot groups still spread.
q154 nearest-event join — pandas merge_asof(direction='nearest')
semantics from two frame-bounded keyed windows (no join at all).
q155 largest-remainder quota allocation (exact integer apportionment over
the GROUP-cardinality frame). q156 MODE() with deterministic tie-break
behind broadcast dims. q157 percent_rank quantile normalization. q158
Z-order/Morton layout audit in pure bit arithmetic. q159 calibration
table from two chained hash-aggs. q160 watermark-lag audit (per-user
arrival high-water mark). q161 max drawdown over the per-day aggregate.
q162 last-touch + exact-integer linear attribution over a time-bounded
user-keyed join. q163 IQR winsorization with exact histogram quartiles.
q164 header-vs-lineitem total reconciliation on the co-keyed join.

Reference parity: the reference's analysis layer stops at cascaded rules
and grouped sums (/root/reference/panda.py); these are the
beyond-reference operators a large-scale pipeline needs, expressed in the
same exact-integer, engine-portable conventions as the rest of the
registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register

# --- q151: consecutive-day activity streaks (gaps-and-islands) --------------
#
# The classic sessionization-by-calendar-day problem: per user, how many
# distinct active days, how many maximal runs of consecutive days, and the
# longest run. The island key is d - row_number() (constant within a
# consecutive run, distinct across runs) — one keyed window over the
# per-(user, day) deduped frame. At 100 TB: the distinct() collapses the
# event stream to at most users x days rows map-side before any window,
# and every window is PARTITIONED BY user — no global ordering anywhere.

_Q151_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
isl AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS island
  FROM days
),
runs AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS run_len
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(run_len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(run_len) AS BIGINT) AS longest_streak
FROM runs GROUP BY user_id
"""


@register(
    "q151_activity_streaks",
    _Q151_ORACLE,
    "per-user consecutive-day streaks via the date-minus-row_number island key",
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("island", F.date_sub(F.col("d"), F.row_number().over(w)))
    runs = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.sum("run_len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("run_len").alias("longest_streak"),
    )


# --- q152: Pareto frontier (skyline) per brand -------------------------------
#
# Skyline query: the parts no other same-brand part dominates (cheaper or
# equal price AND larger or equal size, strict in at least one). The naive
# plan is the O(n^2) dominance self-join; the sort-based plan is two keyed
# window passes over the distinct (price, size) points: a point survives
# iff no strictly-cheaper point reaches its size (running max over the
# RANGE frame ending 1 cent before) and no equal-price point exceeds it.
# At 100 TB the window key (brand) partitions the work; the distinct()
# collapses to NDV(price, size) rows per brand before either window.

_Q152_ORACLE = """
WITH pts AS (
  SELECT p_brand,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM part
  GROUP BY 1, 2, 3
),
m AS (
  SELECT p_brand, price_cents, p_size, n_parts,
         max(p_size) OVER (PARTITION BY p_brand ORDER BY price_cents
                           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_cheaper,
         max(p_size) OVER (PARTITION BY p_brand, price_cents) AS best_same
  FROM pts
)
SELECT p_brand, price_cents / 100.0 AS price, p_size, n_parts
FROM m
WHERE (best_cheaper IS NULL OR best_cheaper < p_size) AND p_size = best_same
"""


@register(
    "q152_pareto_frontier",
    _Q152_ORACLE,
    "skyline (min price, max size) per brand via the sort-based window plan",
)
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        load(spark, sf_dir, "part")
        .select(
            "p_brand",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
            F.col("p_size").cast("long").alias("p_size"),
        )
        .groupBy("p_brand", "price_cents", "p_size")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same = Window.partitionBy("p_brand", "price_cents")
    m = pts.withColumn("best_cheaper", F.max("p_size").over(cheaper)).withColumn(
        "best_same", F.max("p_size").over(same)
    )
    return m.filter(
        (F.col("best_cheaper").isNull() | (F.col("best_cheaper") < F.col("p_size")))
        & (F.col("p_size") == F.col("best_same"))
    ).select(
        "p_brand",
        (F.col("price_cents") / F.lit(100.0)).alias("price"),
        "p_size",
        "n_parts",
    )


# --- q153: robust outliers via median/MAD ------------------------------------
#
# The robust counterpart to q81's 3-sigma rule: median absolute deviation
# flags outliers without the mean/variance being dragged by the outliers
# themselves (the estimator every data-quality monitor actually wants).
# Exact integer plan: per event_type, lower weighted median from the
# (type, value)-keyed histogram (cumulative-weight window over NDV-sized
# data — q140's skew-safe shape), broadcast the per-type median back,
# second histogram pass for the MAD, flag |x - med| > 3 * MAD. Two
# NDV-sized shuffles + two broadcast joins; nothing is per-row sorted.

_MED = """
  SELECT {key} AS grp, CAST(min(CASE WHEN cw * 2 >= tw THEN v END) AS BIGINT) AS med
  FROM (
    SELECT {key}, v, w,
           sum(w) OVER (PARTITION BY {key} ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS cw,
           sum(w) OVER (PARTITION BY {key}) AS tw
    FROM (SELECT {key}, {val} AS v, CAST(count(*) AS BIGINT) AS w
          FROM {src} GROUP BY {key}, {val})
  ) GROUP BY {key}
"""

_Q153_ORACLE = f"""
WITH base AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
),
med AS ({_MED.format(key="event_type", val="v_cents", src="base")}),
dev AS (
  SELECT b.event_type, abs(b.v_cents - m.med) AS ad
  FROM base b JOIN med m ON b.event_type = m.grp
),
mad AS ({_MED.format(key="event_type", val="ad", src="dev")})
SELECT b.event_type,
       CAST(count(*) AS BIGINT) AS n,
       m.med / 100.0 AS median_value,
       d.med / 100.0 AS mad_value,
       CAST(count(CASE WHEN abs(b.v_cents - m.med) > 3 * d.med THEN 1 END)
            AS BIGINT) AS n_outliers
FROM base b
JOIN med m ON b.event_type = m.grp
JOIN mad d ON b.event_type = d.grp
GROUP BY b.event_type, m.med, d.med
"""


def _lower_median(df: DataFrame, key: str, val: str) -> DataFrame:
    """Exact lower weighted median per key from the (key, value) histogram."""
    h = df.groupBy(key, val).agg(F.count(F.lit(1)).alias("w"))
    wk = Window.partitionBy(key)
    c = h.withColumn(
        "cw", F.sum("w").over(wk.orderBy(val).rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tw", F.sum("w").over(wk))
    return c.groupBy(key).agg(
        F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col(val))).cast("long").alias("med")
    )


@register(
    "q153_mad_outliers",
    _Q153_ORACLE,
    "median/MAD robust outlier flags per event type, exact-integer histograms",
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v_cents")
    )
    med = _lower_median(base, "event_type", "v_cents")
    dev = base.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v_cents") - F.col("med")).alias("ad")
    )
    mad = _lower_median(dev, "event_type", "ad").withColumnRenamed("med", "mad")
    j = base.join(F.broadcast(med), "event_type").join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.when(F.abs(F.col("v_cents") - F.col("med")) > 3 * F.col("mad"), F.lit(1))
        ).alias("n_outliers"),
    ).select(
        "event_type",
        "n",
        (F.col("med") / F.lit(100.0)).alias("median_value"),
        (F.col("mad") / F.lit(100.0)).alias("mad_value"),
        "n_outliers",
    )


# --- q154: nearest-event temporal join ---------------------------------------
#
# pandas merge_asof(direction='nearest', tolerance=...) semantics: each
# purchase matches its nearest same-user click within +/-10 minutes, ties
# to the earlier (backward) side. Zero joins: per user-keyed, ts-ordered
# window, the latest preceding click is max(click ts) over the frame
# ending 1 row before, the earliest following click is min(click ts) over
# the frame starting 1 row after (exact because ts ordering makes those
# extrema the temporal neighbors). Exact integer microseconds throughout.
# At 100 TB this is one keyed window pass over the event stream — the
# shape that wins over the union-of-two-asof-joins plan by two shuffles.

_TOL_US = 600 * 1_000_000

_Q154_ORACLE = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us,
         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click
  FROM events
)
SELECT event_id, user_id,
       CASE WHEN coalesce(t_us - prev_click, {_TOL_US + 1})
                 <= coalesce(next_click - t_us, {_TOL_US + 1})
            THEN t_us - prev_click ELSE next_click - t_us END AS delta_us,
       CASE WHEN coalesce(t_us - prev_click, {_TOL_US + 1})
                 <= coalesce(next_click - t_us, {_TOL_US + 1})
            THEN 'before' ELSE 'after' END AS click_side
FROM e
WHERE event_type = 'purchase'
  AND least(coalesce(t_us - prev_click, {_TOL_US + 1}),
            coalesce(next_click - t_us, {_TOL_US + 1})) <= {_TOL_US}
"""


@register(
    "q154_nearest_event_join",
    _Q154_ORACLE,
    "merge_asof(nearest, tolerance) via one keyed window, zero joins",
)
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros(F.col("ts")).alias("t_us")
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("t_us"))
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    e = e.withColumn(
        "prev_click", F.max(click_ts).over(w.rowsBetween(Window.unboundedPreceding, -1))
    ).withColumn(
        "next_click", F.min(click_ts).over(w.rowsBetween(1, Window.unboundedFollowing))
    )
    sentinel = F.lit(_TOL_US + 1)
    back = F.coalesce(F.col("t_us") - F.col("prev_click"), sentinel)
    fwd = F.coalesce(F.col("next_click") - F.col("t_us"), sentinel)
    return (
        e.filter(F.col("event_type") == "purchase")
        .filter(F.least(back, fwd) <= F.lit(_TOL_US))
        .select(
            "event_id",
            "user_id",
            F.when(back <= fwd, back).otherwise(fwd).alias("delta_us"),
            F.when(back <= fwd, F.lit("before")).otherwise(F.lit("after")).alias("click_side"),
        )
    )


# --- q155: largest-remainder quota allocation --------------------------------
#
# Hamilton/Hare apportionment: split a fixed sampling budget across
# document sources proportionally to their doc counts so the integer
# quotas sum EXACTLY to the budget — the quota-allocation step of every
# stratified corpus-sampling job (q67 samples by fraction; this computes
# the exact per-stratum take). Pure integer arithmetic: floor shares via
# BIGINT div, the leftover distributed by largest fractional remainder
# with a deterministic source tie-break. The windows here run over the
# GROUP-cardinality frame (one row per source, an Aggregate output), so
# the partition-less window is bounded by construction — the shape the
# plan gate distinguishes from a per-row global sort.

_BUDGET = 1000

_Q155_ORACLE = f"""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
s AS (
  SELECT source, n_docs,
         sum(n_docs) OVER () AS total,
         ({_BUDGET} * n_docs) // sum(n_docs) OVER () AS fl,
         {_BUDGET} * n_docs - (({_BUDGET} * n_docs) // sum(n_docs) OVER ())
           * sum(n_docs) OVER () AS rem
  FROM c
),
r AS (
  SELECT source, n_docs, fl, rem,
         {_BUDGET} - sum(fl) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, source) AS rk
  FROM s
)
SELECT source, n_docs,
       CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM r
"""


@register(
    "q155_quota_allocation",
    _Q155_ORACLE,
    "largest-remainder integer quota split of a sampling budget across sources",
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    wall = Window.partitionBy()
    total = F.sum("n_docs").over(wall)
    fl = F.expr(f"({_BUDGET} * n_docs) div total")
    s = c.withColumn("total", total).withColumn("fl", fl).withColumn(
        "rem", F.lit(_BUDGET) * F.col("n_docs") - F.col("fl") * F.col("total")
    )
    r = s.withColumn("leftover", F.lit(_BUDGET) - F.sum("fl").over(wall)).withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("rem").desc(), "source"))
    )
    return r.select(
        "source",
        "n_docs",
        (F.col("fl") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
        .cast("long")
        .alias("quota"),
    )


# --- q156: modal value per group (MODE aggregate) ----------------------------
#
# The MODE() statistical aggregate with a deterministic tie-break
# (smallest value wins), over a multi-dim join: the dominant part brand
# per supplier nation, with its exact share of the nation's lineitems.
# Plan: both dims (part for the brand, supplier->nation for the group)
# BROADCAST onto the fact scan, the (nation, brand) hash-agg combines
# map-side, then a GROUP-cardinality window picks the argmax — the fact
# table is never shuffled on a high-NDV key.

_Q156_ORACLE = """
WITH c AS (
  SELECT n_name, p_brand, CAST(count(*) AS BIGINT) AS n
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, p_brand
),
r AS (
  SELECT n_name, p_brand, n,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY n DESC, p_brand) AS rk,
         sum(n) OVER (PARTITION BY n_name) AS total
  FROM c
)
SELECT n_name, p_brand AS mode_brand, n AS n_mode,
       floor((CAST(n AS DOUBLE) / CAST(total AS DOUBLE)) * 10000 + 0.5) / 10000.0
         AS share
FROM r WHERE rk = 1
"""


@register(
    "q156_group_mode",
    _Q156_ORACLE,
    "MODE() with deterministic tie-break: dominant part brand per supplier nation",
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import round4

    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("n_name")
    r = c.withColumn(
        "rk", F.row_number().over(wp.orderBy(F.col("n").desc(), "p_brand"))
    ).withColumn("total", F.sum("n").over(wp))
    return r.filter(F.col("rk") == 1).select(
        "n_name",
        F.col("p_brand").alias("mode_brand"),
        F.col("n").alias("n_mode"),
        round4(F.col("n").cast("double") / F.col("total").cast("double")).alias("share"),
    )


# --- q157: quantile normalization (percent_rank features) --------------------
#
# Feature normalization by rank: percent_rank of each event's value within
# its event type — the distribution-free scaling step ML feature pipelines
# apply before mixing heterogeneous signals. percent_rank is exact
# rational arithmetic ((min_rank - 1) / (n - 1), identical tie semantics
# in both engines), then bucketed to ventiles. NOTE the window partitions
# by event_type: with few types this is a per-type global sort — at 100 TB
# swap in the range-partitioned two-phase ranking (operators.py's
# two-phase pattern); the per-type window is the correct small-cluster
# plan and the semantics anchor.

_Q157_ORACLE = """
WITH p AS (
  SELECT event_id, event_type,
         percent_rank() OVER (PARTITION BY event_type
                              ORDER BY CAST(round(value * 100) AS BIGINT)) AS pr
  FROM events
)
SELECT event_id, event_type,
       floor(pr * 10000 + 0.5) / 10000.0 AS pr,
       CAST(least(CAST(floor(pr * 20) AS BIGINT), 19) AS BIGINT) AS ventile
FROM p
"""


@register(
    "q157_quantile_normalize",
    _Q157_ORACLE,
    "percent_rank quantile normalization of event values within type",
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import round4

    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("v")
    p = e.withColumn("pr", F.percent_rank().over(w))
    return p.select(
        "event_id",
        "event_type",
        round4(F.col("pr")).alias("pr"),
        F.least(F.floor(F.col("pr") * 20).cast("long"), F.lit(19).cast("long")).alias(
            "ventile"
        ),
    )


# --- q158: Z-order (Morton) layout audit -------------------------------------
#
# The clustering statistic behind OPTIMIZE ... ZORDER BY: interleave the
# low 8 bits of two join/filter dimensions (part bucket, supplier bucket)
# into a 16-bit Morton code, then report per-z-range file-bucket stats —
# row count and the per-dimension value spread each z-bucket would pin
# into one file. A layout writer sorts by zval so range pruning on EITHER
# dimension skips most buckets; the audit's spread columns are exactly
# the min/max file stats that pruning would consult. Pure bit arithmetic
# (shifts, masks), identical in both engines; the bucketization is a
# modulus stand-in for the hash-bucket step of a real layout job.

_Z_TERMS_SQL = " + ".join(
    f"((((l_partkey % 256) >> {i}) & 1) << {2 * i + 1})"
    f" + ((((l_suppkey % 256) >> {i}) & 1) << {2 * i})"
    for i in range(8)
)

_Q158_ORACLE = f"""
WITH z AS (
  SELECT l_partkey, l_suppkey, CAST({_Z_TERMS_SQL} AS BIGINT) AS zval
  FROM lineitem
)
SELECT CAST(zval >> 10 AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(zval) AS BIGINT) AS z_min,
       CAST(max(zval) AS BIGINT) AS z_max,
       CAST(min(l_partkey % 256) AS BIGINT) AS part_lo,
       CAST(max(l_partkey % 256) AS BIGINT) AS part_hi,
       CAST(min(l_suppkey % 256) AS BIGINT) AS supp_lo,
       CAST(max(l_suppkey % 256) AS BIGINT) AS supp_hi
FROM z GROUP BY zval >> 10
"""


@register(
    "q158_zorder_layout",
    _Q158_ORACLE,
    "Morton-code clustering audit: per-z-bucket row counts and pruning spreads",
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    terms = " + ".join(
        f"(shiftleft((shiftright(pmod(l_partkey, 256), {i}) & 1), {2 * i + 1})"
        f" + shiftleft((shiftright(pmod(l_suppkey, 256), {i}) & 1), {2 * i}))"
        for i in range(8)
    )
    z = li.withColumn("zval", F.expr(terms).cast("long"))
    return z.groupBy(F.shiftright(F.col("zval"), 10).cast("long").alias("zbucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("zval").alias("z_min"),
        F.max("zval").alias("z_max"),
        F.min(F.pmod(F.col("l_partkey"), F.lit(256))).cast("long").alias("part_lo"),
        F.max(F.pmod(F.col("l_partkey"), F.lit(256))).cast("long").alias("part_hi"),
        F.min(F.pmod(F.col("l_suppkey"), F.lit(256))).cast("long").alias("supp_lo"),
        F.max(F.pmod(F.col("l_suppkey"), F.lit(256))).cast("long").alias("supp_hi"),
    )


# --- q159: calibration / lift table ------------------------------------------
#
# The model-evaluation table behind every "is the score calibrated?"
# review: bucket users by a model score (here the click-count feature
# itself — a monotone score proxy), and per bucket report cohort size,
# observed conversion (purchase) rate, and the exact mean score. No
# global sort anywhere: the bucket id is pure arithmetic on the per-user
# aggregate, so the plan is two hash-aggs (user, then bucket). Rates are
# IEEE divisions of exact integers; every float is round4'd.

_Q159_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS clicks,
         CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
           AS purchases
  FROM events GROUP BY user_id
)
SELECT least(clicks, 10) AS score_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(CASE WHEN purchases > 0 THEN 1 END) AS BIGINT) AS n_converted,
       floor((CAST(count(CASE WHEN purchases > 0 THEN 1 END) AS DOUBLE)
              / CAST(count(*) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS conv_rate,
       floor((CAST(sum(clicks) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000 + 0.5)
         / 10000.0 AS avg_clicks
FROM u GROUP BY least(clicks, 10)
"""


@register(
    "q159_calibration_bins",
    _Q159_ORACLE,
    "score-bucket calibration table: observed conversion rate per click cohort",
)
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import round4

    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
        )
    )
    b = u.groupBy(F.least(F.col("clicks"), F.lit(10).cast("long")).alias("score_bucket"))
    return b.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("purchases") > 0, 1)).alias("n_converted"),
        round4(
            F.count(F.when(F.col("purchases") > 0, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("conv_rate"),
        round4(F.sum("clicks").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_clicks"
        ),
    )


# --- q160: out-of-order arrival audit ----------------------------------------
#
# The measurement that picks a streaming watermark delay: how late do
# events actually arrive? Arrival order is event_id (the ingest
# sequence); an event is late if some earlier-arriving same-user event
# carries a LATER timestamp, and its lateness is the gap to the running
# max. One user-keyed window over arrival order (exact integer micros),
# then a per-type rollup of count / late count / max / p-sum of lateness.
# At 100 TB this is the per-key watermark-lag histogram job every
# structured-streaming deployment runs before setting withWatermark().

_Q160_ORACLE = """
WITH a AS (
  SELECT event_type, epoch_us(ts) AS t_us,
         max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS hwm
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(CASE WHEN hwm > t_us THEN 1 END) AS BIGINT) AS n_late,
       CAST(coalesce(max(CASE WHEN hwm > t_us THEN hwm - t_us END), 0) AS BIGINT)
         AS max_lateness_us,
       CAST(coalesce(sum(CASE WHEN hwm > t_us THEN hwm - t_us END), 0) AS BIGINT)
         AS total_lateness_us
FROM a GROUP BY event_type
"""


@register(
    "q160_late_arrival_audit",
    _Q160_ORACLE,
    "watermark-lag audit: per-type lateness vs the per-user arrival high-water mark",
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros(F.col("ts")).alias("t_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a = e.withColumn("hwm", F.max("t_us").over(w))
    late = F.when(F.col("hwm") > F.col("t_us"), F.col("hwm") - F.col("t_us"))
    return a.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(late).alias("n_late"),
        F.coalesce(F.max(late), F.lit(0)).cast("long").alias("max_lateness_us"),
        F.coalesce(F.sum(late), F.lit(0)).cast("long").alias("total_lateness_us"),
    )


# --- q161: maximum drawdown per user -----------------------------------------
#
# The running-peak-to-trough statistic (finance's max drawdown, SRE's
# error-budget burn): per user, daily net value (errors subtract), its
# running sum, the running peak of that sum, and the deepest gap between
# peak and current. Three user-keyed windows over the per-(user, day)
# aggregate — the event stream collapses to users x days rows before any
# window. Exact integer cents end-to-end; the final-day balance comes
# from max_by/arg_max (deterministic: one row per (user, day)).

_Q161_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(sum(CASE WHEN event_type = 'error'
                       THEN -CAST(round(value * 100) AS BIGINT)
                       ELSE CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
           AS net_cents
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
c AS (
  SELECT user_id, d, net_cents,
         sum(net_cents) OVER (PARTITION BY user_id ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS cum
  FROM daily
),
p AS (
  SELECT user_id, d, cum,
         max(cum) OVER (PARTITION BY user_id ORDER BY d
                        ROWS UNBOUNDED PRECEDING) AS peak
  FROM c
)
SELECT user_id,
       CAST(max(peak) AS BIGINT) / 100.0 AS peak_value,
       CAST(max(peak - cum) AS BIGINT) / 100.0 AS max_drawdown,
       CAST(arg_max(cum, d) AS BIGINT) / 100.0 AS final_value
FROM p GROUP BY user_id
"""


@register(
    "q161_max_drawdown",
    _Q161_ORACLE,
    "peak-to-trough max drawdown of per-user daily net value, exact cents",
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.when(
            F.col("event_type") == "error",
            -F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(F.round(F.col("value") * 100).cast("long"))
        .alias("v"),
    )
    daily = e.groupBy("user_id", "d").agg(F.sum("v").alias("net_cents"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = daily.withColumn("cum", F.sum("net_cents").over(w))
    p = c.withColumn("peak", F.max("cum").over(w))
    return p.groupBy("user_id").agg(
        (F.max("peak").cast("long") / F.lit(100.0)).alias("peak_value"),
        (F.max(F.col("peak") - F.col("cum")).cast("long") / F.lit(100.0)).alias(
            "max_drawdown"
        ),
        (F.max_by("cum", "d").cast("long") / F.lit(100.0)).alias("final_value"),
    )


# --- q162: multi-touch attribution -------------------------------------------
#
# Conversion credit assignment: each purchase credits its same-user
# click/view touches from the 7 preceding days — full credit to the last
# touch (ties to the later arrival), and exact fractional credit under
# the linear model as integer basis points (10000 div n per touch, so
# credit sums are exact BIGINTs, never an order-dependent float sum).
# Plan: a user-keyed equi-join bounded by the time predicate (at 100 TB
# the touches side would additionally bucket by week so the join key is
# (user, week) — the standard interval-join refinement q65 implements);
# the last-touch pick is a purchase-keyed window over the joined pairs.

_Q162_ORACLE = """
WITH t AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events
   WHERE event_type IN ('click', 'view')
),
p AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
   WHERE event_type = 'purchase'
),
pairs AS (
  SELECT p.event_id AS purchase_id, t.event_type AS channel,
         t.t_us AS touch_us, t.event_id AS touch_id,
         count(*) OVER (PARTITION BY p.event_id) AS n_touches,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY t.t_us DESC, t.event_id DESC) AS rk
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.t_us < p.t_us AND t.t_us >= p.t_us - 604800000000
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(count(CASE WHEN rk = 1 THEN 1 END) AS BIGINT) AS last_touch_conversions,
       CAST(sum(10000 // n_touches) AS BIGINT) AS linear_credit_bp
FROM pairs GROUP BY channel
"""


@register(
    "q162_attribution",
    _Q162_ORACLE,
    "last-touch + exact linear multi-touch attribution over a 7-day lookback",
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros(F.col("ts")).alias("t_us")
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("t_us").alias("touch_us"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("t_us").alias("p_us")
    )
    week_us = F.lit(604800000000)
    pairs = p.join(t, "user_id").filter(
        (F.col("touch_us") < F.col("p_us")) & (F.col("touch_us") >= F.col("p_us") - week_us)
    )
    wp = Window.partitionBy("purchase_id")
    pairs = pairs.withColumn("n_touches", F.count(F.lit(1)).over(wp)).withColumn(
        "rk",
        F.row_number().over(wp.orderBy(F.col("touch_us").desc(), F.col("touch_id").desc())),
    )
    return pairs.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.count(F.when(F.col("rk") == 1, 1)).alias("last_touch_conversions"),
        F.sum(F.expr("10000 div n_touches")).alias("linear_credit_bp"),
    )


# --- q163: IQR winsorization (outlier capping) -------------------------------
#
# The feature-cleaning step before any mean-based statistic: cap values at
# [Q1 - 1.5*IQR, Q3 + 1.5*IQR] per group and report how much was clipped.
# Quartiles are exact discrete lower-quantiles from the same (group,
# value)-keyed histogram as q140/q153 (min v with 4*cw >= tw, resp.
# 4*cw >= 3*tw) — skew-safe, NDV-sized windows, no per-row sort. The
# capped mean stays exact: integer cents clamped then summed as BIGINT.

_Q163_ORACLE = """
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
h AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS w
  FROM base GROUP BY event_type, v
),
c AS (
  SELECT event_type, v, w,
         sum(w) OVER (PARTITION BY event_type ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cw,
         sum(w) OVER (PARTITION BY event_type) AS tw
  FROM h
),
q AS (
  SELECT event_type,
         CAST(min(CASE WHEN cw * 4 >= tw THEN v END) AS BIGINT) AS q1,
         CAST(min(CASE WHEN cw * 4 >= 3 * tw THEN v END) AS BIGINT) AS q3
  FROM c GROUP BY event_type
),
b AS (
  SELECT event_type, q1, q3,
         q1 - 3 * (q3 - q1) // 2 AS lo,
         q3 + 3 * (q3 - q1) // 2 AS hi
  FROM q
)
SELECT base.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(CASE WHEN v < lo THEN 1 END) AS BIGINT) AS n_capped_low,
       CAST(count(CASE WHEN v > hi THEN 1 END) AS BIGINT) AS n_capped_high,
       b.q1 / 100.0 AS q1_value,
       b.q3 / 100.0 AS q3_value,
       CAST(sum(least(greatest(v, lo), hi)) AS BIGINT) / 100.0 AS capped_sum
FROM base JOIN b ON base.event_type = b.event_type
GROUP BY base.event_type, b.q1, b.q3
"""


@register(
    "q163_iqr_winsorize",
    _Q163_ORACLE,
    "per-group IQR outlier capping with exact quartiles and clipped sums",
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    h = base.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("w"))
    wk = Window.partitionBy("event_type")
    c = h.withColumn(
        "cw", F.sum("w").over(wk.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tw", F.sum("w").over(wk))
    q = c.groupBy("event_type").agg(
        F.min(F.when(F.col("cw") * 4 >= F.col("tw"), F.col("v"))).cast("long").alias("q1"),
        F.min(F.when(F.col("cw") * 4 >= 3 * F.col("tw"), F.col("v")))
        .cast("long")
        .alias("q3"),
    )
    # integer bound arithmetic: 3*(q3-q1)/2 with BIGINT div — mirrored in SQL
    b = q.withColumn("lo", F.expr("q1 - 3 * (q3 - q1) div 2")).withColumn(
        "hi", F.expr("q3 + 3 * (q3 - q1) div 2")
    )
    j = base.join(F.broadcast(b), "event_type")
    capped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return j.groupBy("event_type", "q1", "q3").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("v") < F.col("lo"), 1)).alias("n_capped_low"),
        F.count(F.when(F.col("v") > F.col("hi"), 1)).alias("n_capped_high"),
        (F.sum(capped).cast("long") / F.lit(100.0)).alias("capped_sum"),
    ).select(
        "event_type",
        "n",
        "n_capped_low",
        "n_capped_high",
        (F.col("q1") / F.lit(100.0)).alias("q1_value"),
        (F.col("q3") / F.lit(100.0)).alias("q3_value"),
        "capped_sum",
    )


# --- q164: order-total reconciliation audit ----------------------------------
#
# The invariant check every finance/data-quality pipeline runs after
# ingest: does the order header total equal the sum of its line charges?
# Charge is computed in one IEEE expression (identical in both engines),
# floored to cents; the per-order rollup is a BIGINT sum co-keyed with
# the join (orderkey-to-orderkey: at 100 TB both facts arrive bucketed on
# the key, so this is the Exchange-free co-located join test_layout
# gates). Headers with no lineitems surface as full-price mismatches via
# the left join's zero-fill.

_Q164_ORACLE = """
WITH li AS (
  SELECT l_orderkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                             * 100 + 0.5) AS BIGINT)) AS BIGINT) AS charge_cents
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS header_cents,
         coalesce(li.charge_cents, 0) AS charge_cents
  FROM orders LEFT JOIN li ON o_orderkey = l_orderkey
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(CASE WHEN abs(header_cents - charge_cents) > 1 THEN 1 END)
            AS BIGINT) AS n_mismatch,
       CAST(max(abs(header_cents - charge_cents)) AS BIGINT) AS max_abs_diff_cents,
       CAST(sum(header_cents - charge_cents) AS BIGINT) AS net_diff_cents
FROM j GROUP BY o_orderstatus
"""


@register(
    "q164_total_reconciliation",
    _Q164_ORACLE,
    "header-vs-lineitem total reconciliation, exact cents, co-keyed join",
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            F.floor(
                F.col("l_extendedprice")
                * (F.lit(1) - F.col("l_discount"))
                * (F.lit(1) + F.col("l_tax"))
                * 100
                + F.lit(0.5)
            )
            .cast("long")
            .alias("charge"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("charge").alias("charge_cents"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("header_cents"),
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderstatus",
        "header_cents",
        F.coalesce(F.col("charge_cents"), F.lit(0).cast("long")).alias("charge_cents"),
    )
    diff = F.col("header_cents") - F.col("charge_cents")
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.abs(diff) > 1, 1)).alias("n_mismatch"),
        F.max(F.abs(diff)).alias("max_abs_diff_cents"),
        F.sum(diff).alias("net_diff_cents"),
    )
