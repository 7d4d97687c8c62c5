"""Sinks (SURVEY.md §2.1 K1–K3) — fixture/report writers with the reference's
output contracts, Spark-native.

K1 matching sink  — (img_path, formula_id) lines, successes only
                    (/root/reference/model/utils/data_generator.py:234-238)
K2 vocab sink     — sorted vocab, one token per line
                    (/root/reference/model/utils/text.py:118-138)
K3 answers sink   — row-aligned ref/hyp files; here keyed by (doc_id, offset)
                    instead of row order (/root/reference/model/evaluation/text.py:107-145)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_vocab(vocab_df: DataFrame, path: str) -> None:
    """K2: token column → sorted text file (single part: a vocab is tiny by
    construction — min-count filtered)."""
    vocab_df.select("token").orderBy("token").coalesce(1).write.mode(
        "overwrite"
    ).text(path)


def load_vocab(spark, path: str, specials: list[str]) -> dict[str, int]:
    """S4: one-token-per-line scan, id = line order, specials appended — read
    once on the driver, intended for sc.broadcast
    (/root/reference/model/utils/text.py:43-63)."""
    rows = (
        spark.read.text(path)
        .select(F.col("value").alias("token"))
        .orderBy("token")  # written sorted; re-sorting makes ids order-stable
        .collect()
    )
    tok_to_id = {r.token: i for i, r in enumerate(rows)}
    for t in specials:
        tok_to_id[t] = len(tok_to_id)
    return tok_to_id


def write_matching(media_df: DataFrame, path: str, ok_col: str = "ok") -> None:
    """K1: '(media_ref formula_id)' lines for successful renders only (F6
    success filter fused in)."""
    df = media_df
    if ok_col in df.columns:
        df = df.filter(F.col(ok_col))
    df.select(
        F.concat_ws(" ", F.col("media_ref"), F.col("formula_id").cast("string")).alias(
            "value"
        )
    ).write.mode("overwrite").text(path)


def write_answers(pairs: DataFrame, out_dir: str) -> None:
    """K3: ref/hyp files keyed by (doc_id, offset) — never positional
    (SURVEY.md §2.3 J3: the reference's positional zip is its weakest
    invariant; the key column rides along so alignment is provable)."""
    keyed = pairs.select(
        F.concat_ws("\t", "doc_id", F.col("offset").cast("string"), "ref").alias("r"),
        F.concat_ws("\t", "doc_id", F.col("offset").cast("string"), "hyp").alias("h"),
    )
    keyed.select(F.col("r").alias("value")).write.mode("overwrite").text(
        os.path.join(out_dir, "ref")
    )
    keyed.select(F.col("h").alias("value")).write.mode("overwrite").text(
        os.path.join(out_dir, "hyp_0")
    )


def predict_single(image_bytes: bytes, cfg=None) -> str:
    """predict.py parity (/root/reference/predict.py:13-54): one image OR PDF
    in (magic-byte dispatch, like the reference's extension dispatch at
    predict.py:28-47), decoded LaTeX out, same kernels as the distributed
    path. PDFs go through the pure-python rasterizer stub
    (operators/multimodal.rasterize_pdf)."""
    from .config import ModelConfig
    from .fixtures.png import decode_png
    from .kernels.oracle import Model, oracle_decode_images

    cfg = cfg or ModelConfig.small()
    if image_bytes[:4] == b"%PDF":
        from .operators.multimodal import rasterize_pdf

        rgb = rasterize_pdf(image_bytes)
    else:
        rgb = decode_png(image_bytes)
    return oracle_decode_images([rgb], Model(cfg))[0]
