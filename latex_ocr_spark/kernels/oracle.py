"""Single-process oracle: the reference semantics end-to-end in one process.

This is the ground truth the distributed Spark pipeline must match per
document (span-sequence equality) — the analog of the reference's row-aligned
ref/hyp golden files (/root/reference/model/evaluation/text.py:107-145).
It composes the SAME kernel functions the Spark UDFs call, so any divergence
isolates a distribution bug (ordering, partitioning, broadcast), never a
numeric one.
"""

from __future__ import annotations

import numpy as np

from ..config import ModelConfig, PipelineConfig
from ..fixtures.vocab import ID_END, ID_TO_TOK, N_TOK
from . import image_ops
from .beam import beam_decode
from .decode import AttentionDecoder
from .text_ops import decode_ids_to_latex
from .weights import init_weights


class Model:
    """Weights + decoder bundle; built once and broadcast to executors."""

    def __init__(self, cfg: ModelConfig, n_tok: int = N_TOK, id_end: int = ID_END):
        self.cfg = cfg
        self.weights = init_weights(cfg, n_tok)
        self.decoder = AttentionDecoder(self.weights, cfg, id_end)
        self.id_end = id_end

    def decode_batch(self, batch_u8: np.ndarray) -> list[str]:
        """uint8 (N,H,W) same-shape preprocessed canvases → LaTeX strings."""
        from .encoder import encode  # local import keeps worker start cheap

        enc = encode(batch_u8, self.weights, self.cfg)
        if self.cfg.decoding == "beam_search":
            ids = beam_decode(self.decoder, enc)[:, 0, :]  # best beam
        else:
            ids = self.decoder.greedy_decode(enc)
        return [decode_ids_to_latex(row, self.id_end, ID_TO_TOK) for row in ids]


def oracle_decode_images(
    rgb_images: list[np.ndarray],
    model: Model,
    pipe: PipelineConfig | None = None,
) -> list[str]:
    """Decode a list of raw RGB images exactly like the pipeline: prepro →
    group by bucket → batch decode — but single-process. Output order matches
    input order (the caller holds the (doc_id, offset) keys)."""
    pipe = pipe or PipelineConfig()
    pre = [image_ops.preprocess(img, buckets=list(pipe.buckets)) for img in rgb_images]
    # group indices by downsampled canvas shape (same bucket → same shape)
    by_shape: dict[tuple[int, int], list[int]] = {}
    for i, (canvas, _bw, _bh, _ok) in enumerate(pre):
        by_shape.setdefault(canvas.shape, []).append(i)
    out: list[str] = [""] * len(rgb_images)
    for _shape, idxs in sorted(by_shape.items()):
        batch = np.stack([pre[i][0] for i in idxs])
        texts = model.decode_batch(batch)
        for i, txt in zip(idxs, texts):
            out[i] = txt
    return out
