"""Materialized ground truth for the flagship media half.

Decodes every media_ref of a scale factor with the single-process numpy
oracle (kernels/oracle.py — the SAME kernel composition the Spark UDFs run,
north-star invariant) and writes (media_ref, latex) to a parquet that the
DuckDB side of the correctness gate reads with read_parquet(). This turns
extract_media_decoded from a rows-only check into a hash-matched row: Spark's
distributed bucketed decode must equal the single-process oracle span-for-span.

Pure python/pyarrow — no SparkSession — so the oracle side of the gate can
ensure it exists even if it runs before any Spark query.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import ModelConfig, PipelineConfig
from ..kernels.oracle import Model, oracle_decode_images
from .corpus import formula_for
from .glyphs import render_formula
from ..sources import corpus_dir


def oracle_decodes_path(sf_dir: str, profile: str = "small") -> str:
    return os.path.join(corpus_dir(sf_dir), f"oracle_decodes_{profile}.parquet")


def _media_refs_for(sf_dir: str) -> list[str]:
    """Derive every media_ref from documents.parquet's doc_id column alone
    (the corpus derivation rule, fixtures/corpus.py docstring)."""
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    refs: list[str] = []
    for d in tbl.column("doc_id").to_pylist():
        n_media = d % 3 + (12 if d % 97 == 0 else 0)
        refs.extend(f"img-{d}-{j}" for j in range(n_media))
    return refs


def oracle_prepro_path(sf_dir: str) -> str:
    return os.path.join(corpus_dir(sf_dir), "oracle_prepro.parquet")


def ensure_oracle_prepro(sf_dir: str) -> str:
    """Single-process preprocess ground truth per media_ref:
    (media_ref, bucket_w, bucket_h, canvas_h, canvas_w). Lets the gate
    hash-check the distributed preprocess/bucketing stage (G1) against the
    same kernels run in one process — prepro only, no decode, so it is cheap
    and independent of the model profile."""
    from ..kernels import image_ops
    from ..config import PipelineConfig

    path = oracle_prepro_path(sf_dir)
    if os.path.exists(path):
        return path
    buckets = list(PipelineConfig().buckets)
    refs = _media_refs_for(sf_dir)
    rows = {"media_ref": [], "bucket_w": [], "bucket_h": [],
            "canvas_h": [], "canvas_w": []}
    for ref in refs:
        _, d, j = ref.split("-")
        latex, scale = formula_for(int(d), int(j))
        canvas, bw, bh, _ok = image_ops.preprocess(
            render_formula(latex, scale), buckets=buckets
        )
        rows["media_ref"].append(ref)
        rows["bucket_w"].append(int(bw))
        rows["bucket_h"].append(int(bh))
        rows["canvas_h"].append(int(canvas.shape[0]))
        rows["canvas_w"].append(int(canvas.shape[1]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "media_ref": rows["media_ref"],
                "bucket_w": pa.array(rows["bucket_w"], pa.int32()),
                "bucket_h": pa.array(rows["bucket_h"], pa.int32()),
                "canvas_h": pa.array(rows["canvas_h"], pa.int32()),
                "canvas_w": pa.array(rows["canvas_w"], pa.int32()),
            }
        ),
        tmp,
    )
    os.replace(tmp, path)
    return path


def oracle_features_path(sf_dir: str) -> str:
    return os.path.join(corpus_dir(sf_dir), "oracle_features.parquet")


def ensure_oracle_features(sf_dir: str) -> str:
    """Single-process image-feature ground truth per media_ref — the same
    greyscale/crop/stat computation operators/multimodal.image_features runs
    distributed, executed in one process over the deterministic renders."""
    from ..fixtures.png import encode_png
    from ..kernels import image_ops

    path = oracle_features_path(sf_dir)
    if os.path.exists(path):
        return path
    refs = _media_refs_for(sf_dir)
    out: dict[str, list] = {
        "media_ref": [], "height": [], "width": [], "n_bytes": [],
        "mean_luma": [], "nonwhite_frac": [], "content_h": [], "content_w": [],
    }
    for ref in refs:
        _, d, j = ref.split("-")
        latex, scale = formula_for(int(d), int(j))
        rgb = render_formula(latex, scale)
        png = encode_png(rgb)
        gray = image_ops.greyscale(rgb)
        cropped, ok = image_ops.crop_to_content(gray)
        out["media_ref"].append(ref)
        out["height"].append(gray.shape[0])
        out["width"].append(gray.shape[1])
        out["n_bytes"].append(len(png))
        out["mean_luma"].append(round(float(gray.mean()), 4))
        out["nonwhite_frac"].append(round(float((gray != 255).mean()), 4))
        out["content_h"].append(cropped.shape[0] if ok else 0)
        out["content_w"].append(cropped.shape[1] if ok else 0)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "media_ref": out["media_ref"],
                "height": pa.array(out["height"], pa.int32()),
                "width": pa.array(out["width"], pa.int32()),
                "n_bytes": pa.array(out["n_bytes"], pa.int64()),
                "mean_luma": pa.array(out["mean_luma"], pa.float64()),
                "nonwhite_frac": pa.array(out["nonwhite_frac"], pa.float64()),
                "content_h": pa.array(out["content_h"], pa.int32()),
                "content_w": pa.array(out["content_w"], pa.int32()),
            }
        ),
        tmp,
    )
    os.replace(tmp, path)
    return path


def ensure_oracle_decodes(sf_dir: str, profile: str = "small") -> str:
    """Idempotent: render + single-process-decode every media_ref once per
    (sf, profile), cache as parquet, return the path."""
    path = oracle_decodes_path(sf_dir, profile)
    if os.path.exists(path):
        return path
    cfg = {
        "reference": ModelConfig.reference,
        "bench": ModelConfig.bench,
        "small": ModelConfig.small,
    }[profile]()
    pipe = PipelineConfig()
    model = Model(cfg)
    refs = _media_refs_for(sf_dir)
    images: list[np.ndarray] = []
    for ref in refs:
        _, d, j = ref.split("-")
        latex, scale = formula_for(int(d), int(j))
        images.append(render_formula(latex, scale))
    decoded = oracle_decode_images(images, model, pipe)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(
        pa.table({"media_ref": refs, "latex": decoded}),
        tmp,
    )
    os.replace(tmp, path)  # atomic publish: concurrent builders both win
    return path
