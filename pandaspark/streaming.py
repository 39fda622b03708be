"""Structured Streaming surface (SURVEY.md §2.9).

The reference's import loop (new CSV batches → parse → dedup → categorize →
upsert) is inherently a stream; here it is expressed as Structured Streaming
jobs. Batch and streaming share the same expression library — the cascade,
fingerprints, and window aggs are identical Columns in both — so semantics
can't drift between the paths.

Scale design: file-source streams parallelize listing + read across
executors; watermarks bound state; the upsert sink goes through
foreachBatch so each micro-batch applies the same exactly-once
fingerprint MERGE as the batch path.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a documents directory — the live-ingest form
    of the corpus scan (new parquet drops = new docs)."""
    reader = spark.readStream.format(fmt).schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_chunk_manifest(docs_stream: DataFrame) -> DataFrame:
    """Streaming tokenizer front door: the SAME chunk_manifest transform as
    batch q97 applied to a document stream. Stateless map + bounded explode
    → append output mode, no watermark, no state store; each micro-batch
    emits its docs' chunk rows exactly once. Batch parity asserted in
    test_streaming_multimodal.py."""
    from .queries.pipeline3 import chunk_manifest

    return chunk_manifest(docs_stream)


def read_event_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over an events directory (new files = new data).
    `max_files_per_trigger` paces micro-batches (tests use it to force
    multi-batch runs; production uses it for ingestion back-pressure)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.readStream.format(fmt).schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window aggregation with late-data watermark.

    The watermark bounds streaming state: windows older than max(event_time)
    - watermark are finalized and evicted — mandatory for unbounded streams.
    Batch mirror: queries/relational.py q25 (hourly date_trunc) — same
    semantics, oracle-checked there.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "total_value")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows: a session closes after `gap` of user
    inactivity. Batch mirror: q26 (lag + gap cumsum) — same session
    boundaries for micro-precision timestamps.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"), "n_events"
        )
    )


STATEFUL_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_TOTALS_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("cents", T.LongType())]
)


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, exact-cents total), emitted each micro-batch a
    user appears in ("update" mode downstream).

    This is the escape hatch for stateful semantics Spark's built-in
    windowed aggs can't express (custom accumulators, CEP-ish logic).
    State is per-key and Arrow-batched, so at scale it shards across
    executors by the groupBy key exactly like an agg shuffle; value totals
    are integer cents (associative, exact), so re-partitioning or batch
    boundaries can't change results.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        STATEFUL_TOTALS_SCHEMA,
        _TOTALS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once dedup via the state store: the native form of
    the reference's fingerprint upsert (SURVEY.md S6/J1) for in-flight data
    — a re-delivered event (at-least-once source, retried file, replayed
    partition) is dropped before it ever reaches a sink. The watermark
    bounds dedup state: a key older than the watermark can be evicted
    because the source can no longer legally re-deliver it. Batch mirror:
    plain dropDuplicates on the same keys (exact for unique-keyed data);
    asserted equal across micro-batch boundaries in tests."""
    keyed = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicates(keyed)


def interval_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "view",
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
    sub_buckets: int = 1,
) -> DataFrame:
    """Stream-stream inner join: each `left_type` event pairs with the same
    user's `right_type` events in the preceding `lookback` window.

    Both sides carry watermarks and the join condition bounds event time in
    both directions — the two requirements for Spark to know when a buffered
    row can never match again and evict it, keeping state bounded on an
    unbounded stream. Batch mirror: queries/relational3.py q65 (identical
    pairs, oracle-checked); tests assert stream==batch across micro-batches.

    Hot-key regime (`sub_buckets` > 1): the join state store shuffles both
    sides by the equi-join key, so a hot user (20% of a 100 TB stream on
    one key) lands ALL its buffered rows in one state partition and its
    output — inherently n_clicks x n_views pairs per window — is produced
    by one task. Sub-bucketing shards that key: the left side gets a
    deterministic bucket `pmod(xxhash64(click_event), B)` (a secondary
    column, so replayed micro-batches re-derive the same bucket — required
    for exactly-once), the right side is exploded across all B buckets, and
    the bucket joins as an extra equi-key. Every (click, view) pair still
    meets exactly once — in the click's bucket — so results are identical
    to the unsalted join (parity asserted on a planted-hot-key fixture in
    tests/test_streaming_multimodal.py), while the hot key's state and its
    quadratic output now spread over B state partitions. Cost: right-side
    state is replicated B times (bounded by the same watermark eviction);
    choose B ~ hot-key share x shuffle width. This is the implemented form
    of the mitigation docs/SCALING.md prescribes for q177's skew100 plant.
    """
    left = (
        events.filter(F.col("event_type") == left_type)
        .select("user_id", F.col("event_id").alias("click_event"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_event"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("view_ts") <= F.col("click_ts"))
    )
    if sub_buckets > 1:
        # watermark metadata survives these stateless projections, so
        # eviction semantics are unchanged on both sides
        left = left.withColumn(
            "_bkt", F.pmod(F.xxhash64(F.col("click_event")), F.lit(sub_buckets))
        )
        right = right.withColumn(
            "_vbkt",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(sub_buckets - 1).cast("long"))),
        )
        cond = cond & (F.col("_bkt") == F.col("_vbkt"))
    return left.join(right, cond).select("user_id", "click_event", "view_event")


def run_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a bounded file-source stream to completion into an in-memory
    sink (test/dev harness; production uses parquet/kafka sinks)."""
    q = (
        stream_df.writeStream.outputMode("complete" if _has_agg(stream_df) else "append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def stream_upsert_to_store(
    batch_stream: DataFrame,
    store_path: str,
    apply_batch: Callable[[DataFrame, DataFrame], DataFrame],
    checkpoint: str,
    prepare_first: Callable[[DataFrame], DataFrame] | None = None,
    compact_every: int | None = None,
):
    """foreachBatch exactly-once sink: every micro-batch runs the SAME
    merge as the batch path (e.g. store.upsert) against the CURRENT store
    snapshot and commits the result as a new snapshot via the versioned
    atomic-commit protocol (store.commit_snapshot): batch N+1 reads batch
    N's merge, and a crash mid-write leaves the previous snapshot intact.

    Exactly-once: Spark may re-run a micro-batch after failure (same
    epoch). The merge function must therefore be idempotent — fingerprint/
    key-based upserts are (re-applying the same rows is a no-op) — which
    is the same property the reference's ON CONFLICT upsert relies on
    (panda.py:713-728). With Delta on the classpath this becomes MERGE
    INTO without changing callers.

    compact_every=N folds store maintenance into the sink: after every Nth
    committed snapshot the store is rewritten into one file set
    (store.compact_store) — the operational answer to micro-batch
    small-file accretion; content-neutral and crash-safe like any other
    commit.
    """
    from .store import (
        commit_snapshot,
        compact_store,
        gc_snapshots,
        latest_commit_path,
        snapshot_versions,
    )

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        current = latest_commit_path(spark, store_path)
        store = spark.read.parquet(current) if current is not None else None
        if store is None:
            # no snapshot yet: the first batch seeds the store (optionally
            # normalized by prepare_first, e.g. within-batch dedup)
            merged = prepare_first(batch_df) if prepare_first else batch_df
        else:
            merged = apply_batch(store, batch_df)
        commit_snapshot(merged, store_path)
        # version numbers are monotonic even after GC, so every Nth COMMIT
        # triggers a compaction (which itself commits the next version)
        if compact_every and max(snapshot_versions(spark, store_path)) % compact_every == 0:
            compact_store(spark, store_path)
        gc_snapshots(spark, store_path, keep=2)

    return (
        batch_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def stream_dedup_corpus(
    doc_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    text_col: str = "text",
):
    """Streaming incremental corpus dedup — the streaming twin of registry
    q79 (queries/pipeline2.py) and the live form of the reference's
    import-loop dedup (panda.py:736-745: new batch vs existing rows, first
    wins): each micro-batch of documents is content-hashed (normalized
    sha256, same family as q30/q79), anti-joined against the committed
    corpus snapshot, deduplicated within the batch (min doc_id wins —
    deterministic, never dropDuplicates), and only novel docs append into
    the next snapshot.

    Composes stream_upsert_to_store's exactly-once commit protocol: a
    replayed micro-batch re-hashes to the same keys and anti-joins to
    nothing, so retries are no-ops; a crash mid-commit leaves the previous
    snapshot readable. At scale the anti-join shuffles on the 32-byte hash
    against a corpus-sized store — the same plan as q79's batch form.
    """
    hash_expr = F.sha2(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), 256
    )

    def _dedup_merge(store: DataFrame, batch: DataFrame) -> DataFrame:
        batch = batch.withColumn("_h", hash_expr)
        # within-batch first-wins (deterministic min doc_id per hash)
        w_first = batch.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
        batch = batch.join(w_first, ["_h", "doc_id"], "left_semi")
        novel = batch.join(store.select("_h"), "_h", "left_anti")
        return store.unionByName(novel)

    def _first_batch(batch: DataFrame) -> DataFrame:
        batch = batch.withColumn("_h", hash_expr)
        w_first = batch.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
        return batch.join(w_first, ["_h", "doc_id"], "left_semi")

    return stream_upsert_to_store(
        doc_stream,
        store_path,
        lambda store, batch: _dedup_merge(store, _strip(batch)),
        checkpoint,
        prepare_first=_first_batch,
    )


def _strip(df: DataFrame) -> DataFrame:
    return df.drop("_h") if "_h" in df.columns else df


def stream_cdc_apply(
    change_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    key: str,
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
    compact_every: int | None = None,
):
    """Streaming CDC apply — the foreachBatch MERGE pattern Delta documents
    for change feeds, on the engine's own snapshot store: each micro-batch
    is a change feed carrying an op column ('upsert'/'delete'-style), is
    reduced to the LATEST change per key within the batch (by (ts, op)
    with a fixed tie order — deterministic under replay), and applied to
    the current snapshot through store.merge_into:

        MATCHED  + last op is delete  -> DELETE   (tombstone)
        MATCHED                       -> UPDATE   (take batch values)
        NOT MATCHED + non-delete      -> INSERT   (delete of absent key: no-op)

    Exactly-once by composition: the reduction and merge are deterministic
    functions of (snapshot, batch), so a replayed micro-batch recommits an
    identical snapshot; a crash mid-write leaves the previous version
    current (same protocol as stream_upsert_to_store). One full-outer
    shuffle on the key per micro-batch; the store never rewrites more than
    the merge output."""
    from .store import merge_into

    def _latest(batch: DataFrame) -> DataFrame:
        w = Window.partitionBy(key).orderBy(
            F.col(ts_col).desc(), F.col(op_col).desc()
        )
        return (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _apply(store: DataFrame, batch: DataFrame) -> DataFrame:
        b = _latest(batch)
        data_cols = [c for c in store.columns if c != key]
        return merge_into(
            store,
            b,
            [key],
            matched_update={c: f"s.{c}" for c in data_cols if c in b.columns},
            matched_delete=f"s.{op_col} = '{delete_op}'",
            not_matched_insert={c: f"s.{c}" for c in store.columns},
            not_matched_insert_condition=f"s.{op_col} <> '{delete_op}'",
        )

    def _first(batch: DataFrame) -> DataFrame:
        b = _latest(batch)
        keep = b.filter(F.col(op_col) != delete_op)
        return keep.drop(op_col)

    return stream_upsert_to_store(
        change_stream,
        store_path,
        _apply,
        checkpoint,
        prepare_first=_first,
        compact_every=compact_every,
    )
