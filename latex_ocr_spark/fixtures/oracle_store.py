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
