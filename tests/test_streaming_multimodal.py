"""Streaming and multimodal plumbing tests.

Streaming queries are driven to completion with the memory sink over the
bounded events parquet; results must agree with the batch mirrors (q25/q26
semantics), which are themselves oracle-checked.
"""

from __future__ import annotations

import hashlib
import shutil

import pytest
from pyspark.sql import functions as F

from pandaspark.multimodal import decode_media, frame_sample, read_media_dir
from pandaspark.queries import REGISTRY
from pandaspark.streaming import (
    read_event_stream,
    run_to_memory,
    session_windows,
    windowed_counts,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, spark):
    """Events re-encoded to micro-precision parquet (the streaming source
    schema uses TimestampType; the raw file is TIMESTAMP(NANOS))."""
    from pandaspark.queries import load

    d = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, SF_DIR, "events").write.mode("overwrite").parquet(d)
    return d


def test_windowed_counts_matches_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    got = run_to_memory(windowed_counts(stream), "win_counts")
    want = REGISTRY["q25_tumbling_window"].fn(spark, SF_DIR)
    g = {(str(r.bucket), r.event_type): (r.n, r.total_value) for r in got.collect()}
    w = {(str(r.bucket), r.event_type): (r.n, r.total_value) for r in want.collect()}
    assert g == w and len(g) > 0


def test_session_windows_agree_with_batch_sessionization(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    got = run_to_memory(session_windows(stream), "sessions")
    per_user = (
        got.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions")).collect()
    )
    batch = {r.user_id: r.n_sessions for r in REGISTRY["q26_sessionize"].fn(spark, SF_DIR).collect()}
    assert {r.user_id: r.n_sessions for r in per_user} == batch


@pytest.fixture()
def media_dir(tmp_path):
    files = {
        "a.jpg": b"\xff\xd8fakejpegbytes",
        "b.png": b"\x89PNGfake",
        "c.mp4": b"\x00\x00ftypisomfakevideo",
        "d.bin": b"unknownkind",
    }
    for name, payload in files.items():
        (tmp_path / name).write_bytes(payload)
    return str(tmp_path), files


def test_multimodal_decode_plumbing(spark, media_dir):
    path, files = media_dir
    df = read_media_dir(spark, path)
    kinds = {r.path.rsplit("/", 1)[-1]: r.kind for r in df.select("path", "kind").collect()}
    assert kinds == {"a.jpg": "image", "b.png": "image", "c.mp4": "video", "d.bin": "unknown"}

    decoded = decode_media(df, deterministic_fake=True)
    rows = {r.path.rsplit("/", 1)[-1]: r for r in decoded.collect()}
    assert rows["a.jpg"].content_sha256 == hashlib.sha256(files["a.jpg"]).hexdigest()
    assert rows["a.jpg"].n_bytes == len(files["a.jpg"])
    assert 16 <= rows["b.png"].width <= 255 and rows["b.png"].n_frames == 1
    assert rows["c.mp4"].n_frames >= 1

    frames = frame_sample(decoded, every_nth=4).collect()
    assert all(f.frame_index % 4 == 0 for f in frames)
    assert len({f.path for f in frames}) == 1  # only the video row explodes


def test_real_decode_is_explicitly_stubbed(spark, media_dir):
    path, _ = media_dir
    df = read_media_dir(spark, path)
    with pytest.raises(Exception, match="NotImplementedError|decode requires"):
        decode_media(df, deterministic_fake=False).collect()
