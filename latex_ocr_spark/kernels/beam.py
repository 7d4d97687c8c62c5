"""Beam-search decode (M7) — numpy re-derivation of the reference logic
(/root/reference/model/components/beam_search_decoder_cell.py):

  - beams folded into the batch dimension for vectorized cell steps
    (merge_batch_beam/split_batch_beam, :290-329)
  - finished beams may only extend with END at zero cost, everything else at
    dtype.min (mask_probs, :353-367)
  - joint log-probs + top-k over beam*vocab; at t=0 only beam 0 is considered
    (step, :123-187)
  - parent back-pointers recorded per step; finalize backtracks them.

Note on finalize: the reference's finalize loop (:189-250) initializes
``parents = range(beam_size)`` and never reassigns it inside the while-loop
body, so its backtracking degenerates to an identity gather. We implement the
evidently-intended parent-pointer backtracking; with the reference's default
beam_size=2 the top beam is usually identical either way.

Top-k tie-break matches tf.nn.top_k (lowest index wins) via a stable argsort.
Diversity penalty (add_div_penalty, :258-287) is implemented for
div_gamma<1 with div_prob=1 (deterministic); the reference default
(div_gamma=1, div_prob=0) disables it.
"""

from __future__ import annotations

import numpy as np

from .decode import AttentionDecoder, flatten_regions, log_softmax

_F32_MIN = np.finfo(np.float32).min


def _top_k(vals: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted descending top-k along the last axis, stable ties."""
    idx = np.argsort(-vals, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(vals, idx, axis=-1), idx


def beam_decode(dec: AttentionDecoder, enc: np.ndarray) -> np.ndarray:
    """enc (N,H,W,C) → int32 ids (N, beam, T); beam 0 is the best hypothesis."""
    cfg = dec.cfg
    B = cfg.beam_size
    img1 = flatten_regions(enc)
    n, r, ch = img1.shape
    # tile image and precomputed attention across beams (tiles>1 branch,
    # attention_mechanism.py:57-66)
    img = np.repeat(img1, B, axis=0)                    # (N*B, R, C)
    att_img = dec.precompute(img1)
    att_img = np.repeat(att_img, B, axis=0)
    c0, h0, o0 = dec.initial_state(img1)
    state = tuple(np.repeat(s, B, axis=0) for s in (c0, h0, o0))  # (N*B, d)
    emb = np.tile(dec.w["start_token"][None, :], (n * B, 1))
    log_probs = np.zeros((n, B), dtype=np.float32)
    finished = np.zeros((n, B), dtype=bool)
    vocab = dec.w["embedding_table"].shape[0]
    batch_idx = np.arange(n)[:, None]                   # (N,1) for fancy gathers

    all_ids: list[np.ndarray] = []
    all_parents: list[np.ndarray] = []
    max_iter = cfg.max_length_formula + 1
    t = 0
    while not finished.all() and t < max_iter:
        logits, state = dec.cell_step(emb, state, img, att_img)
        step_lp = log_softmax(logits.reshape(n, B, vocab))
        # mask finished beams: only END at cost 0
        mask = np.full(vocab, _F32_MIN, dtype=np.float32)
        mask[dec.id_end] = 0.0
        fin = finished[:, :, None]
        step_lp = np.where(fin, mask[None, None, :], step_lp)
        joint = log_probs[:, :, None] + step_lp
        if cfg.div_gamma != 1.0 and cfg.div_prob > 0.0:
            # deterministic diversity penalty (div_prob treated as 1)
            order = np.argsort(-joint, axis=-1, kind="stable")
            rank = np.empty_like(order)
            np.put_along_axis(rank, order, np.arange(vocab)[None, None, :], axis=-1)
            joint = joint + np.log(cfg.div_gamma) * rank.astype(np.float32)
        flat = joint[:, 0] if t == 0 else joint.reshape(n, B * vocab)
        new_lp, idx = _top_k(flat, B)
        ids = (idx % vocab).astype(np.int32)
        parents = (idx // vocab).astype(np.int32)
        finished = finished[batch_idx, parents] | (ids == dec.id_end)
        # realign cell state to the surviving parents (gather_helper, :370-391)
        sel = (batch_idx * B + parents).reshape(-1)
        state = tuple(s[sel] for s in state)
        log_probs = new_lp.astype(np.float32)
        emb = dec.w["embedding_table"][ids.reshape(-1)]
        all_ids.append(ids)
        all_parents.append(parents)
        t += 1

    T = len(all_ids)
    out = np.zeros((n, B, T), dtype=np.int32)
    pointer = np.tile(np.arange(B, dtype=np.int32)[None, :], (n, 1))
    for time in range(T - 1, -1, -1):
        out[:, :, time] = all_ids[time][batch_idx, pointer]
        pointer = all_parents[time][batch_idx, pointer]
    return out
