"""Per-partition checkpoint/lineage + resumable restarts.

The reference's resumability precedents: incremental rebuild skips formulas
whose PNG already exists (F4, /root/reference/model/utils/image.py:238-245 —
semantically a left anti join) and epoch-resume parses the checkpoint filename
(model/base.py:33-48). At 10^12-document scale that becomes: process the docs
table one identity-partition at a time, write each partition's output
idempotently (overwrite its own directory), append a lineage row with metrics
(A8 analog), and on restart anti-join the partition list against the
checkpoint table so completed partitions are never re-decoded (north rule).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import ModelConfig, PipelineConfig
from ..pipeline import broadcast_weights, extract_spans
from ..operators.reassemble import reassemble
from ..sources import read_docs

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("part", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_images", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("wall_s", T.DoubleType(), False),
        T.StructField("run_id", T.StringType(), False),
    ]
)


def _ckpt_path(out_dir: str) -> str:
    return out_dir.rstrip("/") + "/_checkpoint"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under whatever scheme it carries —
    local, hdfs://, s3a://. All checkpoint state I/O goes through this so
    resumability works on the cluster deployments job.py advertises, not just
    the driver's local disk."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def completed_parts(spark: SparkSession, out_dir: str) -> set[int]:
    path = _ckpt_path(out_dir)
    fs, hpath = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return set()
    rows = (
        spark.read.schema(CHECKPOINT_SCHEMA)
        .json(path)
        .filter(F.col("status") == "done")
        .select("part")
        .distinct()
        .collect()
    )
    return {r.part for r in rows}


def clear_checkpoint(spark: SparkSession, out_dir: str) -> None:
    """Drop the checkpoint table (job.py --no-resume) via the Hadoop FS API."""
    fs, hpath = _hadoop_fs(spark, _ckpt_path(out_dir))
    if fs.exists(hpath):
        fs.delete(hpath, True)


def _append_checkpoint(spark: SparkSession, out_dir: str, row: dict) -> None:
    """Append one lineage record. JSON-lines dir keeps appends atomic per
    partition (one file per record) without table-format dependencies; an
    Iceberg deployment would MERGE into a checkpoint table instead. Written
    through the Hadoop FS API so the record lands next to the output on
    HDFS/S3, never on the driver's local disk."""
    path = _ckpt_path(out_dir)
    fs, dirp = _hadoop_fs(spark, path)
    # .crc sidecars are tolerated: Hadoop/Spark listings skip dot-files, so
    # completed_parts' spark.read.json never sees them. (Do NOT call
    # fs.setWriteChecksum(False) — FileSystem.get caches instances per
    # scheme/conf, so the flag would leak to every other write in the JVM.)
    fs.mkdirs(dirp)
    fname = spark._jvm.org.apache.hadoop.fs.Path(
        dirp, f"part-{row['part']}-{row['run_id']}.json"
    )
    stream = fs.create(fname, True)
    try:
        stream.write(bytearray((json.dumps(row) + "\n").encode("utf-8")))
    finally:
        stream.close()


def run_with_checkpoint(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    cfg: ModelConfig | None = None,
    pipe: PipelineConfig | None = None,
    fail_after: int | None = None,
    parts: list[int] | None = None,
) -> list[int]:
    """Run extraction partition-by-partition, resumably.

    Each identity partition is one pruned, idempotent job: output lands in
    ``out_dir/docs/part=<k>/`` via dynamic partition overwrite, then the
    lineage row is appended (output-then-mark ordering → a crash re-runs at
    most the in-flight partition; the overwrite makes the retry idempotent).

    ``fail_after=k`` injects a failure after k partitions (for the resume test,
    FIXTURES.md §6). Returns the list of partitions processed in this run.
    """
    cfg = cfg or ModelConfig.small()
    pipe = pipe or PipelineConfig()
    run_id = uuid.uuid4().hex[:8]
    weights_bc = broadcast_weights(spark, cfg)

    all_parts = sorted(
        r.part
        for r in read_docs(spark, corpus_dir, parts=parts)
        .select("part")
        .distinct()
        .collect()
    )
    done = completed_parts(spark, out_dir)
    todo = [p for p in all_parts if p not in done]

    out_docs = os.path.join(out_dir, "docs")
    processed: list[int] = []
    prev_overwrite = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for i, part in enumerate(todo):
            if fail_after is not None and i >= fail_after:
                raise RuntimeError(f"injected failure before partition {part}")
            t0 = time.time()
            flat = extract_spans(
                spark, corpus_dir, cfg=cfg, pipe=pipe, parts=[part], weights_bc=weights_bc
            )
            result = reassemble(flat)
            # lineage metrics ride the write job itself (df.observe): one pass,
            # no post-write re-read of the output parquet (at 10^12 docs the
            # re-read would double the write-path I/O)
            obs = Observation(f"part-{part}-{run_id}")
            media_per_doc = F.size(
                F.filter("spans", lambda s: s["kind"] == F.lit("media"))
            )
            tokens_per_doc = F.aggregate(
                "spans",
                F.lit(0),
                lambda acc, s: acc
                + F.when(
                    s["kind"] == F.lit("media"), F.size(F.split(s["text"], " "))
                ).otherwise(0),
            )
            observed = result.observe(
                obs,
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(media_per_doc).alias("n_images"),
                F.sum(tokens_per_doc).alias("n_tokens"),
            )
            observed.write.mode("overwrite").partitionBy("part").parquet(out_docs)
            stats = obs.get
            _append_checkpoint(
                spark,
                out_dir,
                {
                    "part": int(part),
                    "status": "done",
                    "n_docs": int(stats["n_docs"] or 0),
                    "n_images": int(stats["n_images"] or 0),
                    "n_tokens": int(stats["n_tokens"] or 0),
                    "wall_s": round(time.time() - t0, 3),
                    "run_id": run_id,
                },
            )
            processed.append(part)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_overwrite)
    return processed


def run_curation(
    spark: SparkSession, extracted_dir: str, out_dir: str
) -> dict:
    """Curation stage of the daily pipeline (job.py --stage curate): read an
    extraction output (``extracted_dir/docs`` — the per-partition parquet
    ``run_with_checkpoint`` writes), flatten each document's offset-ordered
    span sequence to training text, run curate → near-dup dedup →
    token-budget (``pipeline.curate_and_budget``), and write the surviving
    corpus to ``out_dir/curated`` with a lineage record alongside.

    Reading the extraction CHECKPOINT rather than recomputing extraction is
    the production contract: the two stages are separate daily jobs and the
    decode output is materialized storage between them. The write is an
    idempotent overwrite (the stage is one corpus-wide pass — unlike
    extraction there is no per-partition restart unit, because the dedup
    join is global by nature); lineage metrics ride the write job via
    ``observe`` so the output parquet is never re-read."""
    from ..pipeline import curate_and_budget

    t0 = time.time()
    run_id = uuid.uuid4().hex[:8]
    docs = spark.read.parquet(os.path.join(extracted_dir, "docs"))
    flat_text = docs.select(
        F.split("doc_id", "-").getItem(1).cast("long").alias("doc_id"),
        F.concat_ws(
            " ", F.transform("spans", lambda s: s["text"])
        ).alias("text"),
    )
    budget = curate_and_budget(flat_text, keep_text=True)
    obs = Observation(f"curate-{run_id}")
    observed = budget.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_subwords").alias("n_subwords"),
        F.sum("n_chars").alias("n_chars"),
    )
    observed.write.mode("overwrite").parquet(
        os.path.join(out_dir, "curated")
    )
    stats = obs.get
    row = {
        "part": -1,  # corpus-wide stage; keyed -1 in the shared lineage table
        "status": "curated",
        "n_docs": int(stats["n_docs"] or 0),
        "n_images": 0,
        "n_tokens": int(stats["n_subwords"] or 0),
        "wall_s": round(time.time() - t0, 3),
        "run_id": run_id,
    }
    _append_checkpoint(spark, out_dir, row)
    return {
        **row,
        "n_words": int(stats["n_words"] or 0),
        "n_chars": int(stats["n_chars"] or 0),
    }
