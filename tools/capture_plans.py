"""Capture .explain("formatted") for the bench suite's queries into
plans/<tag>/<query>_<suffix>.txt (the judge-facing plan artifacts).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r08 before
Queries default to the full list. Cheap (no execution — plans only), but
still starts a Spark session: don't run concurrently with a bench.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from latex_ocr_spark.config import ModelConfig
from latex_ocr_spark.operators import dedup as D
from latex_ocr_spark.operators import similarity as S
from latex_ocr_spark.operators import text_analysis as TA
from latex_ocr_spark.session import get_spark
from latex_ocr_spark.sources import build_corpus


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r08"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans", cores=cores)
    corpus = build_corpus(spark, sf_dir)
    docs_src = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dup = D.corpus_with_dups(spark, sf_dir)

    from latex_ocr_spark.eval.perplexity import perplexity_metric
    from latex_ocr_spark.operators.lm import lm_score
    from latex_ocr_spark.operators.packing import chunk_dedup
    from latex_ocr_spark.pipeline import (
        composed_training_pipeline,
        extract_documents,
    )

    frames = {
        "extract_pipeline": lambda: extract_documents(
            spark, corpus, cfg=ModelConfig.bench()
        ),
        "minhash_lsh": lambda: D.minhash_lsh_pairs(dup, threshold=0.5),
        "dedup_components": lambda: D.dedup_components(
            D.minhash_lsh_pairs(dup, threshold=0.5)
        ),
        "dedup_apply": lambda: D.dedup_apply(
            dup, D.minhash_lsh_pairs(dup, threshold=0.5)
        ),
        "incremental_neardup": lambda: D.incremental_neardup_pairs(
            dup.filter(F.col("doc_id") >= 1000000),
            dup.filter(F.col("doc_id") < 1000000),
            threshold=0.5,
        ),
        "ngram_jaccard": lambda: D.jaccard_pairs(dup, threshold=0.5),
        "curate_corpus": lambda: TA.curate_corpus(dup),
        "curate_percentile": lambda: TA.curate_by_percentile(docs_src),
        "cosine_topk": lambda: S.cosine_topk(emb, k=5, n_queries=50),
        "lsh_cosine_topk": lambda: S.lsh_cosine_topk(emb, k=5, n_queries=50),
        "ivf_cosine_topk": lambda: S.ivf_cosine_topk(emb, k=5, n_queries=50),
        "embedding_neardup": lambda: S.embedding_neardup_pairs(
            emb, threshold=0.99
        ),
        "semantic_dedup": lambda: S.semantic_dedup(
            emb, n_clusters=8, threshold=0.99
        ),
        "lm_score": lambda: lm_score(docs_src, alpha=0.5),
        "perplexity": lambda: perplexity_metric(
            spark, corpus, cfg=ModelConfig.small()
        ),
        "daily_pipeline": lambda: composed_training_pipeline(
            spark, corpus, cfg=ModelConfig.bench()
        ),
        "chunk_dedup": lambda: chunk_dedup(
            docs_src.select("doc_id", "text"), chunk_words=20
        ),
        "simhash_pairs": lambda: D.simhash_pairs(dup),
        "token_count": lambda: TA.token_count(docs_src),
    }
    for name, fn in frames.items():
        if only and name not in only:
            continue
        df = fn()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
