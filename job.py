"""Production extraction job — the spark-submit entry point (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

    zip -r latex_ocr_spark.zip latex_ocr_spark
    spark-submit --master <yarn|k8s://...> --py-files latex_ocr_spark.zip \
        job.py --input /data/corpus --output /data/extracted \
        [--parts 0 1 2] [--profile reference|bench|small] [--decoding beam_search]

Resumable by default: partitions already marked done in the output's
checkpoint/lineage table are anti-joined away on restart; each partition's
output is written with dynamic partition overwrite so retries are idempotent
(latex_ocr_spark/operators/checkpoint.py; reference precedents F4 + epoch
resume, /root/reference/model/utils/image.py:238-245, model/base.py:33-48).

Local smoke run (no cluster):
    python job.py --input <corpus_dir> --output /tmp/out --local --profile small

Two stages (--stage): ``extract`` (default, per-partition resumable) and
``curate`` (read an extraction output, write the curated + near-dup-deduped +
token-budgeted training corpus — the downstream daily job); ``all`` chains
them through the same output dir.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from latex_ocr_spark.config import ModelConfig
from latex_ocr_spark.operators.checkpoint import completed_parts, run_with_checkpoint
from latex_ocr_spark.session import get_spark


def build_config(profile: str, decoding: str | None) -> ModelConfig:
    cfg = {
        "reference": ModelConfig.reference,
        "bench": ModelConfig.bench,
        "small": ModelConfig.small,
    }[profile]()
    if decoding:
        cfg = ModelConfig.from_dict({**cfg.to_dict(), "decoding": decoding})
    return cfg


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input", required=True, help="corpus dir (docs/ + media/)")
    ap.add_argument("--output", required=True, help="output dir (docs/ + _checkpoint/)")
    ap.add_argument("--stage", default="extract",
                    choices=["extract", "curate", "all"],
                    help="extract: resumable per-partition extraction (default). "
                         "curate: read an extraction OUTPUT dir as --input and "
                         "write the curated+deduped+token-budgeted corpus to "
                         "--output/curated. all: extraction into --output, then "
                         "curation from it into the same dir — the composed "
                         "daily pipeline.")
    ap.add_argument("--parts", type=int, nargs="*", default=None,
                    help="explicit partition list (default: all, minus completed)")
    ap.add_argument("--profile", default="reference",
                    choices=["reference", "bench", "small"])
    ap.add_argument("--decoding", default=None, choices=["greedy", "beam_search"])
    ap.add_argument("--format", default=None, choices=["parquet", "iceberg"],
                    help="corpus table format (default: parquet, or "
                         "LATEX_OCR_TABLE_FORMAT)")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore the checkpoint table and reprocess everything")
    ap.add_argument("--local", action="store_true",
                    help="pin local[N] master (tests); default inherits spark-submit")
    ap.add_argument("--cores", type=int, default=None, help="cores for --local")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    if args.format:
        from latex_ocr_spark.sources import TABLE_FORMAT_ENV

        # read sites (read_docs/read_media) pick the format up from the env,
        # so it needs no plumbing through run_with_checkpoint
        os.environ[TABLE_FORMAT_ENV] = args.format

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(
        "latex-ocr-extract",
        cores=args.cores,
        master="local" if args.local else None,
    )
    try:
        if args.no_resume:
            from latex_ocr_spark.operators.checkpoint import clear_checkpoint

            clear_checkpoint(spark, args.output)
        if args.stage in ("extract", "all"):
            before = completed_parts(spark, args.output)
            processed = run_with_checkpoint(
                spark,
                args.input,
                args.output,
                cfg=build_config(args.profile, args.decoding),
                parts=args.parts,
            )
            print(
                f"done: {len(processed)} partition(s) processed this run "
                f"({len(before)} already complete, skipped); output at "
                f"{os.path.join(args.output, 'docs')}"
            )
        if args.stage in ("curate", "all"):
            from latex_ocr_spark.operators.checkpoint import run_curation

            extracted = args.input if args.stage == "curate" else args.output
            stats = run_curation(spark, extracted, args.output)
            print(
                f"curated: {stats['n_docs']} surviving docs, "
                f"{stats['n_words']} words / {stats['n_tokens']} subwords / "
                f"{stats['n_chars']} chars in {stats['wall_s']}s; output at "
                f"{os.path.join(args.output, 'curated')}"
            )
        return 0
    finally:
        # getOrCreate may have handed us a caller's session (embedded use /
        # tests) — only tear down a session this job itself created
        if not preexisting:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
