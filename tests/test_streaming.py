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


def test_stateful_running_totals(spark, tmp_path_factory):
    """applyInPandasWithState: two micro-batches (two files discovered with
    maxFilesPerTrigger=1) must accumulate state across batches."""
    import shutil

    from latex_ocr_spark.streaming import running_user_totals

    d = tmp_path_factory.mktemp("events_state")
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    half1 = src.filter(F.col("event_id") % 2 == 0)
    half2 = src.filter(F.col("event_id") % 2 == 1)
    half1.coalesce(1).write.mode("overwrite").parquet(str(d / "p1"))
    half2.coalesce(1).write.mode("overwrite").parquet(str(d / "p2"))
    files = d / "stream"
    files.mkdir()
    shutil.copy(next((d / "p1").glob("*.parquet")), files / "a.parquet")
    shutil.copy(next((d / "p2").glob("*.parquet")), files / "b.parquet")

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(files))
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last emitted row per user must equal the batch ground truth
    got = {
        r.user_id: (r.n, r.total)
        for r in spark.sql(
            "SELECT user_id, n, total FROM running_totals"
        ).collect()  # update mode appends; later rows overwrite earlier per user
    }
    truth = {
        r.user_id: (r.n, round(r.total, 4))
        for r in src.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    # keep only the final emission per user: memory sink holds all updates, so
    # compare against the max-n emission
    final = {}
    for r in spark.sql("SELECT user_id, n, total FROM running_totals").collect():
        if r.user_id not in final or r.n > final[r.user_id][0]:
            final[r.user_id] = (r.n, r.total)
    assert final == truth


def test_sessionize_smoke(spark):
    path = f"{SF_DIR}/events.parquet"
    out = sessionize(spark.read.parquet(path)).collect()
    assert len(out) > 0
    for r in out[:50]:
        assert r.sess_end >= r.sess_start
        assert r.n_events >= 1


def test_sessionize_exact_gap_merges(spark):
    """Pin the session boundary the DuckDB oracle mirrors with strict '>':
    an event EXACTLY gap after the previous one merges into the same session;
    one second beyond the gap starts a new one."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=30), 2.0),  # exact gap → merge
        (2, base, 1.0),
        (2, base + dt.timedelta(minutes=30, seconds=1), 2.0),  # beyond → split
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    by_user = {}
    for r in sessionize(df).collect():
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0].n_events == 2
    assert len(by_user[2]) == 2


def test_foreachbatch_extraction_sink_equals_batch(spark, corpus, tmp_path_factory):
    """The streaming extraction sink must produce byte-identical spans to the
    batch pipeline, and a second availableNow run must be a checkpointed no-op
    (no new files → no rewrite)."""
    import os

    from latex_ocr_spark.config import ModelConfig
    from latex_ocr_spark.pipeline import extract_documents
    from latex_ocr_spark.streaming import extraction_sink

    out = str(tmp_path_factory.mktemp("stream_extract"))
    cfg = ModelConfig.small()
    q = extraction_sink(spark, corpus, out, cfg=cfg)
    q.awaitTermination()

    flat = lambda df: df.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select("doc_id", "pos", "s.kind", "s.text", "s.media_ref", "s.offset")
    got = flat(spark.read.parquet(os.path.join(out, "docs")))
    want = flat(extract_documents(spark, corpus, cfg=cfg))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    mtimes = {
        p: os.path.getmtime(os.path.join(out, "docs", p))
        for p in os.listdir(os.path.join(out, "docs"))
        if p.startswith("part=")
    }
    q2 = extraction_sink(spark, corpus, out, cfg=cfg)
    q2.awaitTermination()
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, "docs", p)) == m


def test_extraction_sink_multi_batch_additive(spark, corpus, tmp_path_factory):
    """Continuous ingestion: a second availableNow drain over NEWLY LANDED
    doc files must ADD to the sink output (distinct batch_id leaves), never
    replace an earlier batch's partitions — the failure mode of plain
    partitionBy(part) + dynamic overwrite when two batches share a part."""
    import os
    import shutil

    from latex_ocr_spark.config import ModelConfig
    from latex_ocr_spark.pipeline import extract_documents
    from latex_ocr_spark.streaming import extraction_sink, read_extracted

    src = str(tmp_path_factory.mktemp("stream_src"))
    out = str(tmp_path_factory.mktemp("stream_out_mb"))
    os.makedirs(os.path.join(src, "docs"))
    os.symlink(os.path.join(corpus, "media"), os.path.join(src, "media"))
    parts = sorted(
        p for p in os.listdir(os.path.join(corpus, "docs")) if p.startswith("part=")
    )
    half = max(1, len(parts) // 2)
    for p in parts[:half]:
        shutil.copytree(os.path.join(corpus, "docs", p), os.path.join(src, "docs", p))

    cfg = ModelConfig.small()
    extraction_sink(spark, src, out, cfg=cfg).awaitTermination()
    n_first = read_extracted(spark, out).count()
    assert n_first > 0

    for p in parts[half:]:
        shutil.copytree(os.path.join(corpus, "docs", p), os.path.join(src, "docs", p))
    extraction_sink(spark, src, out, cfg=cfg).awaitTermination()

    flat = lambda df: df.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select("doc_id", "pos", "s.kind", "s.text", "s.media_ref", "s.offset")
    got = flat(read_extracted(spark, out))
    want = flat(extract_documents(spark, src, cfg=cfg))
    assert read_extracted(spark, out).count() > n_first
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path_factory):
    """Cross-batch fingerprint dedup: a duplicate (case/whitespace variant)
    arriving in a later micro-batch must be dropped; new content passes."""
    import pandas as pd

    from latex_ocr_spark.streaming import streaming_dedup

    d = tmp_path_factory.mktemp("docs_dedup")
    b1 = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["the cat sat", "unique second doc"]}
    )
    b2 = pd.DataFrame(
        {"doc_id": [3, 4], "text": ["The  CAT  sat", "brand new third doc"]}
    )
    files = d / "stream"
    files.mkdir()
    sb1 = spark.createDataFrame(b1)
    sb2 = spark.createDataFrame(b2)
    sb1.coalesce(1).write.mode("overwrite").parquet(str(d / "p1"))
    sb2.coalesce(1).write.mode("overwrite").parquet(str(d / "p2"))
    import os
    import shutil
    import time

    shutil.copy(next((d / "p1").glob("*.parquet")), files / "a.parquet")
    shutil.copy(next((d / "p2").glob("*.parquet")), files / "b.parquet")
    # The file source orders micro-batches by modification time; two copies
    # in quick succession can tie and flip batch order (doc 3's fingerprint
    # admitted before doc 1's — observed flaking under full-suite host
    # load). Force batch 1 strictly older than batch 2.
    now = time.time()
    os.utime(files / "a.parquet", (now - 60, now - 60))
    os.utime(files / "b.parquet", (now, now))
    stream = (
        spark.readStream.schema(sb1.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(files))
    )
    q = (
        streaming_dedup(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM dedup_stream").collect()
    }
    # doc 3 is a case/whitespace duplicate of doc 1 -> dropped
    assert got == {1, 2, 4}


def test_streaming_dedup_ttl_expires_state(spark, tmp_path_factory):
    """state_ttl_ms bounds the dedup horizon: a fingerprint whose marker sat
    idle past the TTL is evicted (ProcessingTimeTimeout), so the same content
    arriving after expiry is admitted AGAIN.

    One continuous query (with ProcessingTimeTimeout the engine runs no-data
    micro-batches on every trigger, which is exactly what fires the timeout
    while the source is quiet — but it also means processAllAvailable/
    availableNow never see a terminal state, so the test polls the emitted
    set instead of draining):

      t=0       doc 1 "same text"  -> admitted, marker set (TTL 1 s)
      [~3 s quiet  >> TTL: an empty batch fires the timeout, marker evicted]
      t=3       doc 3 "same text"  -> re-admitted (horizon passed)

    Without the TTL, doc 3 would be dropped (see the first-seen test)."""
    import time

    import pandas as pd

    from latex_ocr_spark.streaming import streaming_dedup

    d = tmp_path_factory.mktemp("docs_dedup_ttl")
    files = d / "stream"
    files.mkdir()
    ckpt = str(d / "ckpt")

    def land(name: str, doc_id: int, text: str) -> None:
        sdf = spark.createDataFrame(
            pd.DataFrame({"doc_id": [doc_id], "text": [text]})
        )
        sdf.coalesce(1).write.mode("overwrite").parquet(str(d / name))
        import shutil

        shutil.copy(
            next((d / name).glob("*.parquet")), files / f"{name}.parquet"
        )

    schema = "doc_id bigint, text string"
    emitted: set[int] = set()

    def emit(batch_df, batch_id):
        emitted.update(r.doc_id for r in batch_df.collect())

    def wait_for(doc_id: int, deadline_s: float = 120.0) -> None:
        t0 = time.time()
        while doc_id not in emitted:
            assert time.time() - t0 < deadline_s, (
                f"doc {doc_id} not emitted within {deadline_s}s: {emitted}"
            )
            time.sleep(0.5)

    land("p1", 1, "same text")
    stream = (
        spark.readStream.schema(schema).format("parquet").load(str(files))
    )
    q = (
        streaming_dedup(stream, state_ttl_ms=1000)
        .writeStream.outputMode("update")
        .foreachBatch(emit)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        wait_for(1)
        time.sleep(3.0)  # > TTL: doc 1's marker ages out in an empty batch
        land("p3", 3, "same text")
        # re-admitted despite the identical fingerprint -> marker was evicted
        wait_for(3)
    finally:
        q.stop()
    assert emitted == {1, 3}


def test_streaming_dedup_drain_terminates_with_ttl(spark, tmp_path_factory):
    """drain() gives a TTL'd dedup query availableNow-like termination: a
    ProcessingTimeTimeout query never self-terminates (the engine keeps
    scheduling no-data batches so idle keys can expire), so production
    callers use the library drain — process everything currently in the
    source, then stop. The poll-and-stop lives in the library now, not the
    test."""
    import os
    import shutil
    import time

    import pandas as pd

    from latex_ocr_spark.streaming import drain, streaming_dedup

    d = tmp_path_factory.mktemp("docs_dedup_drain")
    files = d / "stream"
    files.mkdir()
    sb1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["drain me once", "other"]})
    )
    sb2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3, 4], "text": ["Drain  ME  once", "new"]})
    )
    sb1.coalesce(1).write.mode("overwrite").parquet(str(d / "p1"))
    sb2.coalesce(1).write.mode("overwrite").parquet(str(d / "p2"))
    shutil.copy(next((d / "p1").glob("*.parquet")), files / "a.parquet")
    shutil.copy(next((d / "p2").glob("*.parquet")), files / "b.parquet")
    now = time.time()
    os.utime(files / "a.parquet", (now - 60, now - 60))
    os.utime(files / "b.parquet", (now, now))

    stream = (
        spark.readStream.schema(sb1.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(files))
    )
    # long TTL: no marker expires during the drain — semantics stay
    # first-seen; the TTL's only effect here is the never-terminating
    # trigger loop that drain() must cut through
    q = (
        streaming_dedup(stream, state_ttl_ms=3_600_000)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("dedup_drain")
        .option("checkpointLocation", str(d / "ckpt"))
        .start()
    )
    drain(q)
    assert not q.isActive
    got = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM dedup_drain").collect()
    }
    assert got == {1, 2, 4}


def test_drain_no_timeout_query_idle_fallback(spark, tmp_path_factory):
    """drain() also terminates a NoTimeout query (no empty batches are ever
    scheduled — the engine just goes idle), via the engine-idle fallback."""
    import pandas as pd

    from latex_ocr_spark.streaming import drain, streaming_dedup

    d = tmp_path_factory.mktemp("docs_dedup_drain_nt")
    files = d / "stream"
    files.mkdir()
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7, 8], "text": ["alpha", "beta"]})
    )
    sdf.coalesce(1).write.mode("overwrite").parquet(str(d / "p1"))
    import shutil

    shutil.copy(next((d / "p1").glob("*.parquet")), files / "a.parquet")
    q = (
        streaming_dedup(
            spark.readStream.schema(sdf.schema).format("parquet").load(str(files))
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("dedup_drain_nt")
        .start()
    )
    drain(q)
    assert not q.isActive
    got = {
        r.doc_id
        for r in spark.sql("SELECT doc_id FROM dedup_drain_nt").collect()
    }
    assert got == {7, 8}


def test_streaming_dedup_rocksdb_state_store(spark, tmp_path_factory):
    """The 100 TB state story: the dedup operator's keyed state runs
    unchanged on the RocksDB state-store provider (the store a long-running
    production ingestion uses so state spills to disk instead of executor
    heap). Same cross-batch first-seen semantics as the default provider."""
    import os
    import shutil
    import time

    import pandas as pd

    from latex_ocr_spark.streaming import streaming_dedup

    d = tmp_path_factory.mktemp("docs_dedup_rocks")
    files = d / "stream"
    files.mkdir()
    sb1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["rocks db one", "other doc"]})
    )
    sb2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3, 4], "text": ["Rocks  DB  one", "fresh doc"]})
    )
    sb1.coalesce(1).write.mode("overwrite").parquet(str(d / "p1"))
    sb2.coalesce(1).write.mode("overwrite").parquet(str(d / "p2"))
    shutil.copy(next((d / "p1").glob("*.parquet")), files / "a.parquet")
    shutil.copy(next((d / "p2").glob("*.parquet")), files / "b.parquet")
    now = time.time()
    os.utime(files / "a.parquet", (now - 60, now - 60))
    os.utime(files / "b.parquet", (now, now))

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(sb1.schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(str(files))
        )
        q = (
            streaming_dedup(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("dedup_rocks")
            .option("checkpointLocation", str(d / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM dedup_rocks").collect()
    }
    # doc 3 is a case/whitespace duplicate of doc 1 -> dropped
    assert got == {1, 2, 4}
