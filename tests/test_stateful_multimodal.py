"""applyInPandasWithState change-point stream + multimodal resize/frame
plumbing."""

from __future__ import annotations

from conftest import drain_stateful_stream

import json

from tests.conftest import make_envelope


def test_streaming_changed_rows_stateful(spark, tmp_path):
    """Stream-side Q8: across MULTIPLE micro-batches, only change
    points are emitted — state (last value per subject) carries from
    batch to batch."""
    from eventhub_to_timescale_spark.streaming.pipeline import (
        read_raw_stream,
        stream_to_conditions,
    )
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_changed_rows,
    )

    def msg(sec, mode):
        return make_envelope(
            "homie/room/thermostat/mode",
            mode,
            timestamp=f"2024-02-01T10:00:{sec:02d}Z",
        )

    raw_dir = str(tmp_path / "raw")
    # batch 1: auto, auto → 1 change point; batch 2 (separate file):
    # auto (suppressed by carried state), heat → 1 change point
    spark.createDataFrame(
        [(msg(0, "auto"),), (msg(10, "auto"),)], "value string"
    ).coalesce(1).write.mode("append").parquet(raw_dir)
    spark.createDataFrame(
        [(msg(20, "auto"),), (msg(30, "heat"),)], "value string"
    ).coalesce(1).write.mode("append").parquet(raw_dir)

    cond = stream_to_conditions(
        read_raw_stream(spark, raw_dir, max_files_per_trigger=1)
    )
    q = (
        streaming_changed_rows(cond)
        .writeStream.format("memory")
        .queryName("q8_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)
    rows = spark.sql(
        "SELECT value FROM q8_stream ORDER BY timestamp"
    ).collect()
    assert [r.value for r in rows] == ["auto", "heat"]


def test_resize_images_plumbing(spark):
    from eventhub_to_timescale_spark.operators.multimodal import (
        documents_as_blobs,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(1, "abc", "s"), (2, "a much longer text body for the blob", "s")],
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: r
        for r in resize_images(documents_as_blobs(docs), 8, 4, fake=True).collect()
    }
    assert all(len(r.payload) == 32 for r in out.values())
    assert out[1].width == 8 and out[1].height == 4
    # deterministic: short payloads cycle
    assert bytes(out[1].payload)[:3] == b"abc" and bytes(out[1].payload)[3:6] == b"abc"


def test_sample_frames_plumbing(spark):
    from eventhub_to_timescale_spark.operators.multimodal import (
        documents_as_blobs,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "0123456789abcdef", "s")], "doc_id long, text string, source string"
    )
    rows = sample_frames(documents_as_blobs(docs), n_frames=4, fake=True).collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    assert b"".join(bytes(r.frame) for r in rows) == b"0123456789abcdef"
    assert all(r.n_bytes == 4 for r in rows)


class _FakeState:
    """Minimal GroupState double for driving _changes_fn directly."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_changes_fn_timeout_evicts_state():
    """ProcessingTimeTimeout invocation must remove state and NOT
    re-arm the timer — otherwise idle keys are revisited forever and
    state never shrinks (the 'state stays bounded' claim)."""
    from eventhub_to_timescale_spark.streaming.stateful import _changes_fn

    state = _FakeState(value=("auto", True), timed_out=True)
    out = list(_changes_fn(("room", "mode"), iter([]), state))
    assert out == []
    assert state.removed
    assert state.timeout_set is None


def test_changes_fn_data_rearms_timer():
    import pandas as pd

    from eventhub_to_timescale_spark.streaming.stateful import _changes_fn

    state = _FakeState()
    pdf = pd.DataFrame(
        {
            "timestamp": pd.to_datetime(["2024-02-01T10:00:00Z"]),
            "measurement_string": ["auto"],
        }
    )
    out = list(_changes_fn(("room", "mode"), iter([pdf]), state))
    assert len(out) == 1 and list(out[0]["value"]) == ["auto"]
    assert state.get == ("auto", True)
    assert state.timeout_set == 24 * 3600 * 1000


def test_empty_partitions_pass_through_map_in_pandas(spark):
    """mapInPandas stages must tolerate zero-row pandas batches: an
    empty partition's row-list would otherwise build a column-less
    DataFrame that Spark rejects against the declared schema."""
    from eventhub_to_timescale_spark.operators import imagecodec as ic
    from eventhub_to_timescale_spark.operators.multimodal import (
        extract_blob_features,
        resize_images,
        sample_frames,
    )

    one_row = spark.createDataFrame(
        [(7, ic.synth_video_bytes(7))], "doc_id long, payload binary"
    ).repartition(8)  # 1 row over 8 partitions -> 7 empty partitions
    assert sample_frames(one_row, n_frames=2).count() == 2

    img = spark.createDataFrame(
        [(3, ic.synth_image_bytes(3))], "doc_id long, payload binary"
    ).repartition(8)
    assert resize_images(img, width=4, height=4).count() == 1
    assert extract_blob_features(img, fake=True).count() == 1

    empty = spark.createDataFrame([], "doc_id long, payload binary")
    assert sample_frames(empty, n_frames=2).count() == 0
    assert resize_images(empty, width=4, height=4).count() == 0
    assert extract_blob_features(empty, fake=True).count() == 0
