"""Tranche 19 (round 6): multimodal decode, end-to-end and hash-checked.

The driver's tables carry no binary media, so q201 synthesizes it: per
media id, the events rows become 16-bit PCM samples, are ENCODED into a
real WAV container (`wave` module), then DECODED back through the real
stdlib kernels in pandaspark/multimodal.py (decode_bytes +
decode_wav_samples) inside an Arrow-batched applyInPandas group. Every
output column — container metadata (frame count / rate / channels /
width) and the sample-domain features (block sums, zero crossings,
min/max) — is computed from the DECODED bytes, so any defect in either
codec direction breaks the value hash. The DuckDB oracle computes the
same features directly from the rows (encode∘decode is the identity on
in-range PCM), which is exactly the property under test.

The pairwise-cosine stage then runs on the extracted 8-dim block-sum
vectors through plain relational ops (unpivot -> equi-join on block
index -> integer dot/norms -> one IEEE sqrt+divide at the end), proving
the decode -> feature -> similarity composition the brief mandates.

Scale notes: one media file = one kernel group (file-granularity is
inherent to container encoding — the same boundary binaryFile gives a
real media lake); only fixed-width feature rows leave the kernel. The
cosine stage joins on the 8-value block index with integer partials —
no cartesian products, no windows.

Reference parity: none (the reference is text/CSV-only; multimodal is
builder-brief surface).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import load, register, round4, sha_int, sql_round4, sql_sha_int

_N_MEDIA = 8
_N_BLOCKS = 8
_RATE = 8000

_MEDIA_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_channels", T.LongType(), True),
        T.StructField("sample_width", T.LongType(), True),
        T.StructField("zcross", T.LongType(), True),
        T.StructField("smin", T.LongType(), True),
        T.StructField("smax", T.LongType(), True),
    ]
    + [T.StructField(f"b{k}", T.LongType(), True) for k in range(_N_BLOCKS)]
)


def _wav_roundtrip_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per media group: samples -> REAL WAV bytes -> REAL decode ->
    features of the decoded samples. Imports stay inside the kernel
    (executor-side).

    WHOLE-GROUP signature, not Iterator[pd.DataFrame]: the iterator form
    is called once per ~10k-row ARROW BATCH, so any group larger than
    spark.sql.execution.arrow.maxRecordsPerBatch silently became several
    per-chunk WAV files and several feature rows — one row per media is
    the contract every downstream join assumes. (Found by the 5x scaling
    sweep: 7 rows/group at 62.5k samples; sf0.01 groups fit one batch and
    hid it.) One media file per task is inherent to container encoding —
    the same boundary binaryFile gives a real media lake."""
    import numpy as np

    from pandaspark.multimodal import decode_bytes, decode_wav_samples, encode_wav

    pdf = pdf.sort_values("event_id")
    content = encode_wav(
        pdf["sample"].to_numpy(dtype=np.int64).astype(np.int16), sample_rate=_RATE
    )
    meta = decode_bytes(content)  # magic dispatch -> wav branch
    _, s = decode_wav_samples(content)
    n = len(s)
    idx = (np.arange(n, dtype=np.int64) * _N_BLOCKS) // max(n, 1)
    bsum = np.bincount(idx, weights=s.astype(np.float64), minlength=_N_BLOCKS)
    sign = s >= 0
    row = {
        "media_id": int(pdf["media_id"].iloc[0]),
        "n_frames": int(meta["n_frames"]),
        "sample_rate": int(meta["sample_rate"]),
        "n_channels": int(meta["n_channels"]),
        "sample_width": int(meta["sample_width"]),
        "zcross": int(np.count_nonzero(sign[1:] != sign[:-1])),
        "smin": int(s.min()),
        "smax": int(s.max()),
    }
    for k in range(_N_BLOCKS):
        row[f"b{k}"] = int(bsum[k])
    return pd.DataFrame([row], columns=[f.name for f in _MEDIA_FEAT_SCHEMA.fields])


_Q201_ORACLE = f"""
WITH s AS (
  SELECT user_id % {_N_MEDIA} AS media_id, event_id,
         ({sql_sha_int('CAST(event_id AS VARCHAR)')} % 65536) - 32768 AS sample
  FROM events
),
o AS (
  SELECT media_id, sample,
         row_number() OVER (PARTITION BY media_id ORDER BY event_id) - 1 AS i,
         count(*) OVER (PARTITION BY media_id) AS n,
         lag(sample) OVER (PARTITION BY media_id ORDER BY event_id) AS prev
  FROM s
),
m AS (
  SELECT media_id,
         CAST(max(n) AS BIGINT) AS n_frames,
         CAST(count(*) FILTER (prev IS NOT NULL AND ((sample >= 0) != (prev >= 0)))
              AS BIGINT) AS zcross,
         CAST(min(sample) AS BIGINT) AS smin,
         CAST(max(sample) AS BIGINT) AS smax
  FROM o GROUP BY media_id
),
b AS (
  SELECT media_id, (i * {_N_BLOCKS}) // n AS blk, CAST(sum(sample) AS BIGINT) AS bsum
  FROM o GROUP BY media_id, (i * {_N_BLOCKS}) // n
),
nrm AS (
  SELECT media_id, CAST(sum(bsum * bsum) AS BIGINT) AS nsq FROM b GROUP BY media_id
),
dots AS (
  SELECT a.media_id AS media_a, c.media_id AS media_b,
         CAST(sum(a.bsum * c.bsum) AS BIGINT) AS dot
  FROM b a JOIN b c ON a.blk = c.blk AND a.media_id < c.media_id
  GROUP BY 1, 2
)
SELECT d.media_a, d.media_b,
       {sql_round4('CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))')}
         AS cos_sim,
       ma.n_frames AS n_frames_a, CAST({_RATE} AS BIGINT) AS sample_rate_a,
       CAST(1 AS BIGINT) AS n_channels_a, CAST(2 AS BIGINT) AS sample_width_a,
       ma.zcross AS zcross_a, ma.smin AS smin_a, ma.smax AS smax_a
FROM dots d
JOIN nrm na ON na.media_id = d.media_a
JOIN nrm nb ON nb.media_id = d.media_b
JOIN m ma ON ma.media_id = d.media_a
"""


@register(
    "q201_media_pipeline",
    _Q201_ORACLE,
    "multimodal decode->feature->cosine: real WAV encode/decode kernels, hash-checked features",
)
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % _N_MEDIA).alias("media_id"),
        "event_id",
        ((sha_int(F.col("event_id").cast("string")) % 65536) - 32768).alias("sample"),
    )
    # pin: feats feeds the block unpivot, the norm aggregate AND the meta
    # projection — without the checkpoint the WAV encode/decode Pandas
    # stage (the expensive part) re-runs once per consumer
    feats = ev.groupBy("media_id").applyInPandas(
        _wav_roundtrip_features, _MEDIA_FEAT_SCHEMA
    ).localCheckpoint(eager=False)
    # unpivot block sums -> (media_id, blk, bsum): the cosine stage is a
    # plain equi-join on blk with integer partials, mirroring the oracle
    stack_expr = ", ".join(f"{k}L, b{k}" for k in range(_N_BLOCKS))
    blocks = feats.selectExpr(
        "media_id", f"stack({_N_BLOCKS}, {stack_expr}) AS (blk, bsum)"
    )
    nrm = blocks.groupBy("media_id").agg(
        F.sum(F.col("bsum") * F.col("bsum")).cast("long").alias("nsq")
    )
    a, c = blocks.alias("a"), blocks.alias("c")
    dots = (
        a.join(
            c,
            (F.col("a.blk") == F.col("c.blk"))
            & (F.col("a.media_id") < F.col("c.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_a"), F.col("c.media_id").alias("media_b")
        )
        .agg(F.sum(F.col("a.bsum") * F.col("c.bsum")).cast("long").alias("dot"))
    )
    meta = feats.select(
        F.col("media_id"),
        "n_frames", "sample_rate", "n_channels", "sample_width",
        "zcross", "smin", "smax",
    )
    na = F.broadcast(nrm.withColumnsRenamed({"media_id": "media_a", "nsq": "nsq_a"}))
    nb = F.broadcast(nrm.withColumnsRenamed({"media_id": "media_b", "nsq": "nsq_b"}))
    ma = F.broadcast(meta.withColumnsRenamed({"media_id": "media_a"}))
    return (
        dots.join(na, "media_a")
        .join(nb, "media_b")
        .join(ma, "media_a")
        .select(
            "media_a",
            "media_b",
            round4(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("nsq_a").cast("double"))
                    * F.sqrt(F.col("nsq_b").cast("double"))
                )
            ).alias("cos_sim"),
            F.col("n_frames").alias("n_frames_a"),
            F.col("sample_rate").alias("sample_rate_a"),
            F.col("n_channels").alias("n_channels_a"),
            F.col("sample_width").alias("sample_width_a"),
            F.col("zcross").alias("zcross_a"),
            F.col("smin").alias("smin_a"),
            F.col("smax").alias("smax_a"),
        )
    )
