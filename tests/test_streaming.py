"""Structured Streaming smoke: a bounded parquet file-source drives the
watermarked windowed aggregation to completion; results must equal the same
aggregation run in batch mode."""

from __future__ import annotations

from pyspark.sql import functions as F

from latex_ocr_spark.streaming import (
    run_to_memory,
    sessionize,
    stream_events,
    windowed_event_counts,
)

from tests.conftest import SF_DIR


def test_windowed_counts_stream_equals_batch(spark, tmp_path_factory):
    # the file stream source discovers files in a DIRECTORY
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    path = f"{SF_DIR}/events.parquet"
    stream = stream_events(spark, str(d))
    run_to_memory(windowed_event_counts(stream), "win_counts")
    got = {
        (r.win_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = {
        (r.win_start, r.event_type): (r.n, r.sum_value)
        for r in windowed_event_counts(spark.read.parquet(path)).collect()
    }
    assert got == batch
    assert len(got) > 0


def test_sessionize_smoke(spark):
    path = f"{SF_DIR}/events.parquet"
    out = sessionize(spark.read.parquet(path)).collect()
    assert len(out) > 0
    for r in out[:50]:
        assert r.sess_end >= r.sess_start
        assert r.n_events >= 1
