"""Text kernels: tokenize (P2), detokenize (P7), truncate-at-END (F5).

Semantics mirror the reference exactly:
  tokenize    — /root/reference/model/utils/text.py:26-40 (strip, split(' '),
                OOV→id_unk)
  truncate    — /root/reference/model/evaluation/text.py:95-104
  detokenize  — /root/reference/model/img2seq.py:272-273 / evaluation/text.py:126-129
"""

from __future__ import annotations

import numpy as np


def tokenize(formula: str, tok_to_id: dict[str, int], id_unk: int) -> list[int]:
    return [tok_to_id.get(t, id_unk) for t in formula.strip().split(" ")]


def truncate_at_end(ids, id_end: int) -> list[int]:
    out = []
    for i in ids:
        if int(i) == id_end:
            break
        out.append(int(i))
    return out


def detokenize(ids, id_to_tok: dict[int, str]) -> str:
    return " ".join(id_to_tok[int(i)] for i in ids)


def decode_ids_to_latex(ids, id_end: int, id_to_tok: dict[int, str]) -> str:
    """F5 + P7 composed — the per-row postprocessing of the decoder output."""
    return detokenize(truncate_at_end(ids, id_end), id_to_tok)


def pad_batch_formulas(
    formulas: list[list[int]], id_pad: int, id_end: int, max_len: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """G4 — pad to max_len+1 with id_pad, append id_end, emit lengths
    (/root/reference/model/utils/text.py:141-164). int32 outputs."""
    if max_len is None:
        max_len = max(len(f) for f in formulas)
    batch = id_pad * np.ones((len(formulas), max_len + 1), dtype=np.int32)
    lengths = np.zeros(len(formulas), dtype=np.int32)
    for i, f in enumerate(formulas):
        batch[i, : len(f)] = np.asarray(f, dtype=np.int32)
        batch[i, len(f)] = id_end
        lengths[i] = len(f) + 1
    return batch, lengths
