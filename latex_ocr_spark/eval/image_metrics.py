"""Image-level evaluation (A6): column-wise binarized Levenshtein between a
reference render and a hypothesis render.

Re-derivation of /root/reference/model/evaluation/image.py:50-99 (Harvard NLP
im2markup scoring): each image column binarizes (luma ≤ 128 → ink) into a
symbol; the two column-symbol sequences are compared with Levenshtein; height
mismatch zero-pads the shorter columns (:80-90). Corpus aggregation
(:9-47): EM = fraction with distance < 1; Lev = 1 - Σdist/Σmaxlen.

Spark-side: per-pair stats in an Arrow-batched pandas UDF over the rendered
pair table, one global aggregation.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _column_symbols(gray: np.ndarray, pad_to_h: int) -> list[bytes]:
    """Binarize and encode each column as a hashable symbol (bit-packed)."""
    ink = (gray <= 128).astype(np.uint8)
    if pad_to_h > ink.shape[0]:
        ink = np.pad(ink, ((0, pad_to_h - ink.shape[0]), (0, 0)))
    packed = np.packbits(ink, axis=0)
    return [packed[:, j].tobytes() for j in range(packed.shape[1])]


def _levenshtein(a: list, b: list) -> int:
    """Sequence Levenshtein over arbitrary symbols (numpy DP rows)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = np.arange(len(b) + 1, dtype=np.int32)
    for i, ca in enumerate(a, 1):
        cur = np.empty(len(b) + 1, dtype=np.int32)
        cur[0] = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return int(prev[-1])


def img_edit_distance(gray1: np.ndarray, gray2: np.ndarray) -> tuple[int, int]:
    """(distance, max_len) for two grayscale uint8 images — the reference's
    column-as-character comparison with height zero-padding."""
    h = max(gray1.shape[0], gray2.shape[0])
    s1 = _column_symbols(gray1, h)
    s2 = _column_symbols(gray2, h)
    return _levenshtein(s1, s2), max(len(s1), len(s2))


def image_scores(pairs: DataFrame, ref_png: str = "ref_png", hyp_png: str = "hyp_png") -> DataFrame:
    """Corpus EM + Lev over a table of (ref_png, hyp_png) PNG binary columns."""
    from ..fixtures.png import decode_png
    from ..kernels.image_ops import greyscale

    def stats(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r, h in zip(pdf[ref_png], pdf[hyp_png]):
                g1 = greyscale(decode_png(bytes(r)))
                g2 = greyscale(decode_png(bytes(h)))
                dist, length = img_edit_distance(g1, g2)
                rows.append({"dist": dist, "length": length, "em": 1 if dist < 1 else 0})
            yield pd.DataFrame(rows)

    agg = (
        pairs.select(ref_png, hyp_png)
        .mapInPandas(stats, schema="dist long, length long, em int")
        .agg(
            F.sum("dist").alias("d"),
            F.sum("length").alias("l"),
            F.avg(F.col("em").cast("double")).alias("em"),
        )
        .select(
            F.round("em", 4).alias("image_em"),
            F.round(1.0 - F.col("d") / F.col("l"), 4).alias("image_lev"),
        )
    )
    return agg
