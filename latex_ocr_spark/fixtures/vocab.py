"""Deterministic fixture vocabulary.

Mirrors the reference's vocab model: one token per line, id = line number,
3 special tokens appended last in the order _UNK, _PAD, _END
(/root/reference/model/utils/text.py:43-63, configs/vocab.json). Token style
mirrors data/small.formulas (space-separated LaTeX units).
"""

from __future__ import annotations

from ..config import SPECIALS, TOK_END, TOK_PAD, TOK_UNK

BASE_TOKENS: list[str] = sorted(
    [str(d) for d in range(10)]
    + list("abcdefghijklmnopqrstuvwxyz")
    + list("NRXY")
    + ["+", "-", "=", "(", ")", "[", "]", "{", "}", "^", "_", ",", "|", "!", "<", ">", "/"]
    + [
        r"\frac", r"\alpha", r"\beta", r"\gamma", r"\delta", r"\lambda",
        r"\mu", r"\pi", r"\sigma", r"\theta", r"\phi", r"\omega",
        r"\sum", r"\int", r"\prod", r"\sqrt", r"\partial", r"\infty",
        r"\cdot", r"\times", r"\pm", r"\leq", r"\geq", r"\neq",
        r"\left", r"\right", r"\over", r"\prime", r"\hat", r"\tilde",
    ]
)


def build_vocab() -> tuple[dict[str, int], dict[int, str]]:
    """tok_to_id with specials appended last; id_to_tok is the inverse."""
    tok_to_id: dict[str, int] = {t: i for i, t in enumerate(BASE_TOKENS)}
    for tok in SPECIALS:
        tok_to_id[tok] = len(tok_to_id)
    id_to_tok = {i: t for t, i in tok_to_id.items()}
    return tok_to_id, id_to_tok


TOK_TO_ID, ID_TO_TOK = build_vocab()
N_TOK = len(TOK_TO_ID)
ID_UNK = TOK_TO_ID[TOK_UNK]
ID_PAD = TOK_TO_ID[TOK_PAD]
ID_END = TOK_TO_ID[TOK_END]
