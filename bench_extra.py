"""Noop-sink isolation bench (guide §1.4) — NOT the driver's bench.

Decomposes the expensive suite rows into their stages so optimization work
targets the real cost, with each stage timed via the noop sink (computes
every column, no output cost) and labelled with setJobDescription. Prints
one JSON line per stage; run with the same env contract as bench.py.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench_extra.py [stage ...]
Stages default to all. Never run concurrently with bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from latex_ocr_spark.config import ModelConfig, PipelineConfig
from latex_ocr_spark.operators import dedup as D
from latex_ocr_spark.operators import similarity as S
from latex_ocr_spark.operators import text_analysis as TA
from latex_ocr_spark.session import get_spark
from latex_ocr_spark.sources import build_corpus, read_docs, read_media


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    only = set(sys.argv[1:])
    spark = get_spark("bench_extra", cores=cores)
    corpus = build_corpus(spark, sf_dir)

    from latex_ocr_spark.pipeline import (
        broadcast_weights,
        decode_groups_estimate,
        explode_spans,
        extract_documents,
        extract_spans,
    )
    from latex_ocr_spark.operators.inference import (
        decode_groups,
        fits_some_bucket,
        preprocess_spans,
    )

    pipe = PipelineConfig()
    cfg = ModelConfig.bench()
    decode_groups_estimate(spark, corpus, pipe)
    timings: dict[str, list[float]] = {}

    def bench(name, fn, n=None):
        if only and name not in only:
            return
        walls = []
        for _ in range(n or reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        timings[name] = walls
        print(json.dumps({"stage": name, "walls": walls, "min": min(walls)}),
              flush=True)

    docs = read_docs(spark, corpus)
    media = read_media(spark, corpus)

    # --- extraction decomposition -----------------------------------------
    bench("ex_explode_spans", lambda: noop(explode_spans(docs)))

    def _joined():
        spans = explode_spans(docs)
        m = spans.filter(F.col("kind") == "media").select(
            "doc_id", "part", "offset", "media_ref"
        )
        return m.join(
            media.select("media_ref", "image", "height", "width"), "media_ref"
        )

    bench("ex_media_join", lambda: noop(_joined()))

    def _prepped():
        j = _joined()
        fits = fits_some_bucket(pipe, F.col("height"), F.col("width"))
        n_prepro = max(spark.sparkContext.defaultParallelism, 8)
        return preprocess_spans(
            j.filter(fits)
            .select("doc_id", "part", "offset", "media_ref", "image")
            .repartition(n_prepro),
            pipe,
        )

    bench("ex_prepro", lambda: noop(_prepped()))

    wbc = broadcast_weights(spark, cfg)
    n_est = decode_groups_estimate(spark, corpus, pipe)
    bench(
        "ex_decode",
        lambda: noop(decode_groups(_prepped(), wbc, cfg, pipe, n_est)),
    )
    bench("ex_spans_full", lambda: noop(extract_spans(spark, corpus, cfg=cfg)))
    bench(
        "ex_documents_full", lambda: noop(extract_documents(spark, corpus, cfg=cfg))
    )

    # --- dedup decomposition ----------------------------------------------
    dup = D.corpus_with_dups(spark, sf_dir)
    bench("dd_shingles", lambda: noop(D.shingles(dup, n=3, max_freq=256)))

    def _banded():
        sh = D.shingles(dup, n=3, max_freq=256)
        return D.minhash_banded(sh)

    bench("dd_minhash_sig", lambda: noop(_banded()))

    def _cands():
        c, sh, banded = D.minhash_band_candidates(dup)
        noop(c)
        sh.unpersist()
        banded.unpersist()

    bench("dd_band_candidates", _cands)
    bench("dd_lsh_pairs_full", lambda: noop(D.minhash_lsh_pairs(dup, threshold=0.5)))

    def _components():
        noop(D.dedup_components(D.minhash_lsh_pairs(dup, threshold=0.5)))

    bench("dd_components_full", _components)

    # components loop alone over materialized pairs
    pairs_mat = D.minhash_lsh_pairs(dup, threshold=0.5).localCheckpoint()
    bench("dd_components_loop_only", lambda: noop(D.dedup_components(pairs_mat)))

    # --- incremental neardup ----------------------------------------------
    new_b = dup.filter(F.col("doc_id") >= 1000000)
    idx_b = dup.filter(F.col("doc_id") < 1000000)
    bench(
        "inc_full",
        lambda: noop(D.incremental_neardup_pairs(new_b, idx_b, threshold=0.5)),
    )
    bench("inc_sh_idx", lambda: noop(D.shingles(idx_b, n=3, max_freq=None)))
    bench(
        "inc_sig_idx",
        lambda: noop(D.minhash_banded(D.shingles(idx_b, n=3, max_freq=None))),
    )

    # --- curation ----------------------------------------------------------
    bench("cu_curate_full", lambda: noop(TA.curate_corpus(dup)))
    bench(
        "cu_gates_only",
        lambda: noop(
            dup.filter(
                (TA._lang_pred_expr(F.col("text")) == "en")
                & TA._quality_keep_expr(F.col("text"))
            )
        ),
    )

    # --- similarity ---------------------------------------------------------
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    bench("sim_cosine_topk", lambda: noop(S.cosine_topk(emb, k=5, n_queries=50)))
    bench(
        "sim_lsh_cosine_topk",
        lambda: noop(S.lsh_cosine_topk(emb, k=5, n_queries=50)),
    )

    # --- perplexity ---------------------------------------------------------
    from latex_ocr_spark.eval.perplexity import perplexity_metric

    bench(
        "perplexity_full",
        lambda: noop(perplexity_metric(spark, corpus, cfg=ModelConfig.small())),
    )

    print(json.dumps({"stages": {k: min(v) for k, v in timings.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
