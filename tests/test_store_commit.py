"""Atomic versioned store commit (batch + streaming).

The reference's DuckDB store commits atomically (panda.py:713-728: a
crashed import can't destroy committed rows). These tests pin the parquet
substitute: snapshot versioning with the `_SUCCESS` marker as the commit
point, for both the batch `write_store` path and the streaming
`stream_upsert_to_store` sink — including the lost-batch regression where
micro-batch N+1 must observe micro-batch N's merge.
"""

from __future__ import annotations

import os
import pathlib

from pyspark.sql import functions as F

from pandaspark.queries import load
from pandaspark.store import (
    commit_snapshot,
    gc_snapshots,
    latest_commit_path,
    read_store,
    write_store,
)
from pandaspark.streaming import read_event_stream, stream_upsert_to_store

from .conftest import SF_DIR


def _touch_garbage_version(root: str, version: int, name: str = "part-junk") -> None:
    """Simulate a crashed write: a version dir with data but NO _SUCCESS."""
    d = pathlib.Path(root) / f"v{version:06d}"
    d.mkdir(parents=True)
    (d / name).write_bytes(b"partial write, job died before commit")


def test_commit_snapshot_is_crash_safe(spark, tmp_path):
    root = str(tmp_path / "store")
    df1 = spark.range(5).withColumn("x", F.col("id") * 2)
    p1 = commit_snapshot(df1, root)
    assert p1.endswith("v000001") and latest_commit_path(spark, root) == p1

    # crashed writer: garbage v2 without _SUCCESS must be invisible to
    # readers and must not block the next committer
    _touch_garbage_version(root, 2)
    assert latest_commit_path(spark, root) == p1
    assert spark.read.parquet(latest_commit_path(spark, root)).count() == 5

    p3 = commit_snapshot(df1.withColumn("x", F.col("x") + 1), root)
    assert p3.endswith("v000003")  # skipped the garbage slot
    assert latest_commit_path(spark, root) == p3


def test_gc_keeps_live_window_and_drops_garbage(spark, tmp_path):
    root = str(tmp_path / "store")
    for i in range(4):
        commit_snapshot(spark.range(i + 1), root)
    # v1 becomes old garbage (commit marker lost), v5 is garbage NEWER than
    # current (a write possibly in flight — GC must not touch it)
    os.remove(f"{root}/v000001/_SUCCESS")
    _touch_garbage_version(root, 5)

    dropped = gc_snapshots(spark, root, keep=2)
    assert set(dropped) == {1, 2}
    assert os.path.isdir(f"{root}/v000005")
    assert latest_commit_path(spark, root).endswith("v000004")
    assert spark.read.parquet(latest_commit_path(spark, root)).count() == 4
    # previous snapshot retained for time travel
    assert spark.read.parquet(f"{root}/v000003").count() == 3


def test_write_store_never_clobbers_previous_snapshot(spark, tmp_path):
    root = str(tmp_path / "txstore")
    base = load(spark, SF_DIR, "orders").limit(50)
    df = base.select(
        F.col("o_orderkey").alias("transaction_id"),
        F.lit("giro").alias("account"),
        F.col("o_orderdate").alias("book_date"),
        F.col("o_orderdate").alias("valuta_date"),
        F.col("o_orderpriority").alias("party"),
        F.lit(None).cast("string").alias("book_text"),
        F.col("o_orderstatus").alias("purpose"),
        (F.col("o_totalprice") * 100).cast("long").alias("amount_cents"),
        F.lit(None).cast("long").alias("balance_cents"),
        F.lit(None).cast("string").alias("transfer_category"),
        F.lit(None).cast("string").alias("category"),
        F.lit(None).cast("string").alias("category_manual"),
        F.sha2(F.col("o_orderkey").cast("string"), 256).alias("fingerprint"),
        F.current_timestamp().alias("imported_at"),
    )
    write_store(df, root)
    first = read_store(spark, root).count()
    write_store(df.limit(20), root)
    assert read_store(spark, root).count() == 20
    # both snapshots exist on disk; the first is still fully readable
    assert spark.read.parquet(f"{root}/v000001").count() == first == 50


def test_read_store_time_travel(spark, tmp_path):
    """read_store(version=N) reads a retained older snapshot; unknown or
    garbage versions raise instead of silently reading junk."""
    import pytest as _pt

    from pandaspark.store import snapshot_versions

    root = str(tmp_path / "tt")

    def frame(n):
        return spark.range(n).select(
            F.col("id").alias("transaction_id"),
            (F.col("id") * 100).cast("long").alias("amount_cents"),
            F.lit(None).cast("long").alias("balance_cents"),
        )

    commit_snapshot(frame(3), root)
    commit_snapshot(frame(5), root)
    _touch_garbage_version(root, 3)
    assert snapshot_versions(spark, root) == [1, 2]
    assert read_store(spark, root).count() == 5
    assert read_store(spark, root, version=1).count() == 3
    with _pt.raises(FileNotFoundError):
        read_store(spark, root, version=3)  # garbage: never committed


def test_read_store_legacy_plain_directory(spark, tmp_path):
    """Stores written before versioning (plain parquet dir) still read."""
    root = str(tmp_path / "legacy")
    spark.range(7).select(
        F.col("id").alias("transaction_id"),
        (F.col("id") * 100).cast("long").alias("amount_cents"),
        F.lit(None).cast("long").alias("balance_cents"),
    ).write.parquet(root)
    got = read_store(spark, root)
    assert got.count() == 7 and "amount" in got.columns


def test_stream_upsert_chains_micro_batches(spark, tmp_path):
    """The lost-batch regression: with maxFilesPerTrigger=1 forcing one
    micro-batch per file, every batch's merge must be visible to the next —
    the final store must equal folding the same merge over the files in
    batch mode. The old implementation wrote `store_path+'_next'` and never
    swapped, so all but the last batch vanished."""
    events = load(spark, SF_DIR, "events").limit(300).cache()
    src = tmp_path / "src"
    # three files: disjoint event slices, except file 3 RE-DELIVERS file 1's
    # rows with value bumped — the merge must update, not duplicate
    s1 = events.filter(F.col("event_id") % 3 == 0)
    s2 = events.filter(F.col("event_id") % 3 == 1)
    s3 = s1.withColumn("value", F.col("value") + 1000.0)
    for i, s in enumerate((s1, s2, s3)):
        s.coalesce(1).write.parquet(str(src / f"f{i}"))

    def merge(store, batch):
        # key-based upsert, batch wins — idempotent, same shape as
        # store.upsert's fingerprint MERGE
        return store.join(batch, "event_id", "left_anti").unionByName(batch)

    root = str(tmp_path / "stream_store")
    q = stream_upsert_to_store(
        read_event_stream(spark, str(src) + "/f*", max_files_per_trigger=1),
        root,
        merge,
        checkpoint=str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # batch-path fold over the same three files in order
    want = None
    for i in range(3):
        b = spark.read.parquet(str(src / f"f{i}"))
        want = b if want is None else merge(want, b)

    got = spark.read.parquet(latest_commit_path(spark, root))
    assert got.count() == want.count() == s1.count() + s2.count()
    g = {r.event_id: r.value for r in got.collect()}
    w = {r.event_id: r.value for r in want.collect()}
    assert g == w
    # re-delivered rows took the batch value (+1000), proving batch 3 saw
    # batch 1's rows in the store it read
    bumped = [v for v in g.values() if v >= 1000.0]
    assert len(bumped) == s1.count()


def test_stream_dedup_corpus_matches_sequential_first_wins(spark, tmp_path):
    """Streaming incremental corpus dedup (the q79 twin): three doc
    micro-batches with within-batch AND cross-batch content duplicates;
    the final snapshot must contain exactly the first-winning doc per
    normalized content hash, where "first" = earliest batch, then lowest
    doc_id. The expectation is an independent Python fold (hashlib + re),
    not the Spark code under test."""
    import hashlib
    import re as _re

    from pandaspark.streaming import stream_dedup_corpus

    docs = [r.asDict() for r in load(spark, SF_DIR, "documents")
            .filter(F.col("text").isNotNull()).limit(60).collect()]
    assert len(docs) == 60
    b1, b2, b3 = docs[:20], docs[20:40], docs[40:60]
    # cross-batch dups: 5 docs of batch 2 re-deliver batch-1 texts
    for i in range(5):
        b2[i]["text"] = b1[i]["text"]
    # within-batch dups in batch 3 (two clones of one text, higher doc_ids)
    b3[10]["text"] = b3[2]["text"]
    b3[11]["text"] = b3[2]["text"]
    # and batch-3 re-delivery of a batch-2-only text
    b3[12]["text"] = b2[7]["text"]

    src = tmp_path / "docs_src"
    doc_schema = load(spark, SF_DIR, "documents").schema
    for i, b in enumerate((b1, b2, b3)):
        spark.createDataFrame(b, schema=doc_schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )

    root = str(tmp_path / "corpus_store")
    stream = (
        spark.readStream.format("parquet")
        .schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src) + "/f*")
    )
    q = stream_dedup_corpus(stream, root, checkpoint=str(tmp_path / "ck_dedup"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # independent first-wins fold
    def norm_hash(text):
        return hashlib.sha256(_re.sub(r"\s+", " ", text.lower()).strip().encode()).hexdigest()

    want: dict[str, int] = {}
    for batch in (b1, b2, b3):
        for row in sorted(batch, key=lambda r: r["doc_id"]):
            want.setdefault(norm_hash(row["text"]), row["doc_id"])

    from pandaspark.store import latest_commit_path

    got = spark.read.parquet(latest_commit_path(spark, root))
    got_rows = {r.doc_id: r._h for r in got.select("doc_id", "_h").collect()}
    assert set(got_rows.keys()) == set(want.values())
    assert len(got_rows) == len(want)
    # committed hash column agrees with the independent hash
    inv = {v: k for k, v in want.items()}
    for doc_id, h in got_rows.items():
        assert h == inv[doc_id]


def test_compact_store_is_content_neutral_and_versioned(spark, tmp_path):
    """Compaction must rewrite the current snapshot into fewer files as a
    NEW version: identical row multiset, fewer data files, old snapshot
    still readable through time travel."""
    from pandaspark.store import (
        commit_snapshot,
        compact_store,
        latest_commit_path,
        snapshot_versions,
    )

    root = str(tmp_path / "cstore")
    base = load(spark, SF_DIR, "orders").limit(200)
    commit_snapshot(base.repartition(8), root)
    v_before = snapshot_versions(spark, root)
    p_before = latest_commit_path(spark, root)
    files_before = [
        f for f in os.listdir(p_before) if f.endswith(".parquet")
    ]
    assert len(files_before) == 8

    compact_store(spark, root, target_files=1)

    p_after = latest_commit_path(spark, root)
    assert p_after != p_before
    assert snapshot_versions(spark, root) == v_before + [v_before[-1] + 1]
    files_after = [f for f in os.listdir(p_after) if f.endswith(".parquet")]
    assert len(files_after) == 1
    a = spark.read.parquet(p_before)
    b = spark.read.parquet(p_after)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # pre-compaction version remains in the time-travel window
    old = spark.read.parquet(p_before)
    assert old.count() == 200


def test_upsert_to_path_parquet_backend_and_delta_seam(spark, tmp_path):
    """The MERGE seam: parquet backend folds batches through the atomic
    snapshot protocol with ON-CONFLICT semantics (matched rows take the
    batch's derived fields, keep store identity fields); the delta backend
    fails loudly without delta-spark instead of silently degrading."""
    import pytest

    from pandaspark.store import latest_commit_path, upsert_to_path

    root = str(tmp_path / "seam")
    base = (
        load(spark, SF_DIR, "orders")
        .limit(50)
        .select(
            F.col("o_orderkey").alias("transaction_id"),
            F.sha2(F.col("o_orderkey").cast("string"), 256).alias("fingerprint"),
            F.lit("a").alias("category"),
            F.lit(None).cast("string").alias("category_manual"),
            F.lit(None).cast("string").alias("transfer_category"),
            F.lit(100).cast("long").alias("balance_cents"),
        )
    )
    upsert_to_path(spark, root, base)
    # second batch: 10 overlapping fingerprints with new category + 5 new rows
    b2 = (
        load(spark, SF_DIR, "orders")
        .limit(65)
        .select(
            F.col("o_orderkey").alias("transaction_id"),
            F.sha2(F.col("o_orderkey").cast("string"), 256).alias("fingerprint"),
            F.lit("b").alias("category"),
            F.lit(None).cast("string").alias("category_manual"),
            F.lit(None).cast("string").alias("transfer_category"),
            F.lit(200).cast("long").alias("balance_cents"),
        )
        .filter(F.col("transaction_id") % 2 == 0)
    )
    upsert_to_path(spark, root, b2)
    got = spark.read.parquet(latest_commit_path(spark, root))
    n_base, n_b2 = base.count(), b2.count()
    n_overlap = base.join(b2, "fingerprint", "left_semi").count()
    assert got.count() == n_base + n_b2 - n_overlap
    # matched rows took the batch's category
    assert (
        got.join(b2.select("fingerprint"), "fingerprint", "left_semi")
        .filter(F.col("category") != "b")
        .count()
        == 0
    )
    with pytest.raises((ImportError, ValueError)):
        upsert_to_path(spark, root, b2, backend="delta")
    with pytest.raises(ValueError):
        upsert_to_path(spark, root, b2, backend="iceberg")


def test_stream_upsert_with_auto_compaction(spark, tmp_path):
    """compact_every folds maintenance into the sink: content must equal
    the batch-path fold exactly, and the final snapshot (a compaction
    commit) must be a single file set."""
    events = load(spark, SF_DIR, "events").limit(300).cache()
    src = tmp_path / "csrc"
    s1 = events.filter(F.col("event_id") % 3 == 0)
    s2 = events.filter(F.col("event_id") % 3 == 1)
    s3 = s1.withColumn("value", F.col("value") + 1000.0)
    for i, s in enumerate((s1, s2, s3)):
        s.coalesce(2).write.parquet(str(src / f"f{i}"))

    def merge(store, batch):
        return store.join(batch, "event_id", "left_anti").unionByName(batch)

    root = str(tmp_path / "cstream")
    q = stream_upsert_to_store(
        read_event_stream(spark, str(src) + "/f*", max_files_per_trigger=1),
        root,
        merge,
        checkpoint=str(tmp_path / "cck"),
        compact_every=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from pandaspark.store import latest_commit_path

    want = None
    for i in range(3):
        b = spark.read.parquet(str(src / f"f{i}"))
        want = b if want is None else merge(want, b)
    current = latest_commit_path(spark, root)
    got = spark.read.parquet(current)
    g = {r.event_id: r.value for r in got.collect()}
    w = {r.event_id: r.value for r in want.collect()}
    assert g == w
    data_files = [f for f in os.listdir(current) if f.endswith(".parquet")]
    assert len(data_files) == 1  # last commit was a compaction


def test_diff_snapshots_classifies_adds_removes_changes(spark, tmp_path):
    """Snapshot CDC: v1→v2 with one removed row, one added row, one changed
    row, and the rest untouched must classify exactly those keys."""
    from pandaspark.store import commit_snapshot, diff_snapshots

    root = str(tmp_path / "diffstore")
    v1 = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z"), ("d", 4, "w")],
        "fingerprint string, val int, tag string",
    )
    commit_snapshot(v1, root)
    v2 = spark.createDataFrame(
        [("b", 2, "y"), ("c", 30, "z"), ("d", 4, "w"), ("e", 5, "v")],
        "fingerprint string, val int, tag string",
    )
    commit_snapshot(v2, root)
    got = {
        r.fingerprint: r.change_type
        for r in diff_snapshots(spark, root, 1, 2).collect()
    }
    assert got == {"a": "removed", "c": "changed", "e": "added"}
    # column-scoped diff: comparing only `tag` sees no change on c
    got_tag = {
        r.fingerprint: r.change_type
        for r in diff_snapshots(spark, root, 1, 2, compare_cols=["tag"]).collect()
    }
    assert got_tag == {"a": "removed", "e": "added"}
    import pytest

    with pytest.raises(FileNotFoundError):
        diff_snapshots(spark, root, 1, 9)


def test_incremental_stats_maintenance_via_snapshot_diff(spark, tmp_path):
    """Incremental view maintenance: per-lang doc counts maintained from a
    snapshot CDC delta must equal a fresh recompute on the new snapshot —
    the warehouse pattern where 100 TB of stats update from a change-sized
    diff instead of a full rescan."""
    from pandaspark.store import commit_snapshot, diff_snapshots

    root = str(tmp_path / "ivm")
    docs = load(spark, SF_DIR, "documents").select("doc_id", "lang", "text").limit(100)
    v1 = docs.filter(F.col("doc_id") % 4 != 0)
    commit_snapshot(v1.withColumn("fingerprint", F.col("doc_id").cast("string")), root)
    # v2: some removed, some added, one lang flipped
    v2 = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .withColumn(
            "lang", F.when(F.col("doc_id") % 7 == 0, F.lit("xx")).otherwise(F.col("lang"))
        )
    )
    commit_snapshot(v2.withColumn("fingerprint", F.col("doc_id").cast("string")), root)

    stats_v1 = v1.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    delta = diff_snapshots(spark, root, 1, 2)
    s1 = spark.read.parquet(f"{root}/v000001")
    s2 = spark.read.parquet(f"{root}/v000002")
    # per-lang delta: -1 for removed/changed-away rows (old lang), +1 for
    # added/changed-into rows (new lang)
    minus = (
        delta.filter(F.col("change_type").isin("removed", "changed"))
        .join(s1.select("fingerprint", "lang"), "fingerprint")
        .groupBy("lang")
        .agg((-F.count(F.lit(1))).alias("d"))
    )
    plus = (
        delta.filter(F.col("change_type").isin("added", "changed"))
        .join(s2.select("fingerprint", "lang"), "fingerprint")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    maintained = (
        stats_v1.select("lang", F.col("n").alias("d"))
        .unionByName(minus)
        .unionByName(plus)
        .groupBy("lang")
        .agg(F.sum("d").alias("n"))
        .filter(F.col("n") > 0)
    )
    fresh = v2.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    m = {r.lang: r.n for r in maintained.collect()}
    f = {r.lang: r.n for r in fresh.collect()}
    assert m == f and "xx" in f


def test_diff_snapshots_across_schema_evolution(spark, tmp_path):
    """Snapshot CDC when a column was ADDED between versions (and one
    dropped): the diff compares over the union of columns, reading the
    version that lacks a column as typed NULL — added columns surface as
    'changed' exactly where the new snapshot populated them, and the diff
    never errors on the asymmetric schemas."""
    from pandaspark.store import commit_snapshot, diff_snapshots

    root = str(tmp_path / "evostore")
    v1 = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")],
        "fingerprint string, val int, legacy string",
    )
    commit_snapshot(v1, root)
    # v2 adds `score`, drops `legacy`, changes nothing else on a/b; c gone
    v2 = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, None), ("d", 4, 40)],
        "fingerprint string, val int, score int",
    )
    commit_snapshot(v2, root)
    got = {
        r.fingerprint: r.change_type
        for r in diff_snapshots(spark, root, 1, 2).collect()
    }
    # a: score NULL->10 AND legacy x->NULL => changed
    # b: score stays NULL, but legacy y->NULL => changed
    # c: removed; d: added
    assert got == {"a": "changed", "b": "changed", "c": "removed", "d": "added"}
    # scoped to the surviving common column, a and b are unchanged
    got_val = {
        r.fingerprint: r.change_type
        for r in diff_snapshots(spark, root, 1, 2, compare_cols=["val"]).collect()
    }
    assert got_val == {"c": "removed", "d": "added"}


def test_stream_cdc_apply_with_tombstones(spark, tmp_path):
    """Streaming CDC apply: three change-feed micro-batches with upserts,
    tombstone deletes (including delete-then-reinsert across batches, a
    within-batch update+delete race resolved by latest-ts, and a delete of
    a never-seen key), folded through foreachBatch MERGE. The expectation
    is an independent Python fold of the change log."""
    from pandaspark.streaming import stream_cdc_apply
    from pandaspark.store import latest_commit_path

    schema = "k bigint, val string, ts bigint, op string"
    b1 = [(1, "a1", 10, "upsert"), (2, "b1", 11, "upsert"), (3, "c1", 12, "upsert")]
    b2 = [
        (2, "b2", 20, "upsert"),   # update
        (3, None, 21, "delete"),   # tombstone
        (4, "d1", 22, "upsert"),   # insert
        (9, None, 23, "delete"),   # delete of absent key: no-op
        (5, "e1", 24, "upsert"),   # within-batch: upserted then deleted...
        (5, None, 25, "delete"),   # ...latest wins -> never lands
    ]
    b3 = [(3, "c2", 30, "upsert")]  # re-insert after tombstone
    src = tmp_path / "cdc_src"
    for i, b in enumerate((b1, b2, b3)):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(str(src / f"f{i}"))

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src) + "/f*")
    )
    root = str(tmp_path / "cdc_store")
    q = stream_cdc_apply(
        stream, root, checkpoint=str(tmp_path / "ck_cdc"), key="k", ts_col="ts"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # independent fold of the change log
    state: dict = {}
    for b in (b1, b2, b3):
        latest: dict = {}
        for k, val, ts, op in b:
            if k not in latest or ts > latest[k][1]:
                latest[k] = (val, ts, op)
        for k, (val, ts, op) in latest.items():
            if op == "delete":
                state.pop(k, None)
            else:
                state[k] = (val, ts)

    got = {
        r.k: (r.val, r.ts)
        for r in spark.read.parquet(latest_commit_path(spark, root)).collect()
    }
    assert got == state == {1: ("a1", 10), 2: ("b2", 20), 4: ("d1", 22), 3: ("c2", 30)}
    # the store schema carries no op column
    assert "op" not in spark.read.parquet(latest_commit_path(spark, root)).columns
