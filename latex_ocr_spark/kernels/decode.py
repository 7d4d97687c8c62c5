"""Attention decoder kernels (M3–M6, M8): flatten-to-regions, attention,
attention LSTM cell, greedy decode, dynamic-decode driver.

Numpy re-derivations of:
  flatten          — /root/reference/model/components/attention_mechanism.py:19-28
  attention        — model/components/attention_mechanism.py:46-94
  initial states   — model/components/attention_mechanism.py:124-153
  attention cell   — model/components/attention_cell.py:58-102 (dropout=1 at inference)
  greedy step      — model/components/greedy_decoder_cell.py:53-66
  dynamic decode   — model/components/dynamic_decode.py:17-75 (early exit when all
                     finished, cap max_length_formula+1 per model/decoder.py:70)

All ops are batch-vectorized float32; the LSTM follows tf.contrib.rnn.LSTMCell
gate order (i, j, f, o) with forget_bias=1.0.
"""

from __future__ import annotations

import numpy as np

from ..config import ModelConfig


def flatten_regions(enc: np.ndarray) -> np.ndarray:
    """(N,H,W,C) → (N,H*W,C) — M3."""
    n, h, w, c = enc.shape
    return enc.reshape(n, h * w, c)


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def log_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=axis, keepdims=True))


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def lstm_step(
    x: np.ndarray, c: np.ndarray, h: np.ndarray, kernel: np.ndarray, bias: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """One LSTMCell step; returns (new_c, new_h)."""
    z = np.concatenate([x, h], axis=1) @ kernel + bias
    i, j, f, o = np.split(z, 4, axis=1)
    new_c = c * _sigmoid(f + 1.0) + _sigmoid(i) * np.tanh(j)
    new_h = np.tanh(new_c) * _sigmoid(o)
    return new_c.astype(np.float32), new_h.astype(np.float32)


def gru_step(
    x: np.ndarray,
    h: np.ndarray,
    gate_kernel: np.ndarray,
    gate_bias: np.ndarray,
    cand_kernel: np.ndarray,
    cand_bias: np.ndarray,
) -> np.ndarray:
    """One GRUCell step (cell_type='gru' variant, attn_cell_config.cell_type;
    the reference imports GRUCell at model/decoder.py:5 — note its
    initial_cell_state would crash on GRU's non-namedtuple state, a latent
    bug we fix by seeding h from the mean image directly)."""
    g = _sigmoid(np.concatenate([x, h], axis=1) @ gate_kernel + gate_bias)
    r, u = np.split(g, 2, axis=1)
    c = np.tanh(np.concatenate([x, r * h], axis=1) @ cand_kernel + cand_bias)
    return (u * h + (1.0 - u) * c).astype(np.float32)


class AttentionDecoder:
    """Holds broadcast weights; per-batch state lives in method args (so one
    instance is reused across Arrow batches inside a Python worker)."""

    def __init__(self, weights: dict[str, np.ndarray], cfg: ModelConfig, id_end: int):
        self.w = weights
        self.cfg = cfg
        self.id_end = id_end

    # --- attention mechanism -------------------------------------------------
    def precompute(self, img: np.ndarray) -> np.ndarray:
        """att_img = img @ W, computed once per image and reused every step
        (reference precompute, attention_mechanism.py:43)."""
        return img @ self.w["att_img_W"]

    def context(self, img: np.ndarray, att_img: np.ndarray, h: np.ndarray) -> np.ndarray:
        """M4: a = softmax(tanh(att_img + W·h)·beta); c = Σ a·img."""
        att_h = h @ self.w["att_h_W"]
        att = np.tanh(att_img + att_h[:, None, :])
        e = (att @ self.w["att_beta"])[:, :, 0]
        a = softmax(e, axis=-1)
        return (a[:, :, None] * img).sum(axis=1).astype(np.float32)

    def initial_state(self, img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Initial (c, h, o) from the mean image (attention_mechanism.py:124-153)."""
        mean = img.mean(axis=1)
        c0 = np.tanh(mean @ self.w["W_c_0"] + self.w["b_c_0"]).astype(np.float32)
        h0 = np.tanh(mean @ self.w["W_h_0"] + self.w["b_h_0"]).astype(np.float32)
        o0 = np.tanh(mean @ self.w["W_o_0"] + self.w["b_o_0"]).astype(np.float32)
        return c0, h0, o0

    # --- attention cell (M5) --------------------------------------------------
    def cell_step(
        self,
        embedding: np.ndarray,
        state: tuple[np.ndarray, np.ndarray, np.ndarray],
        img: np.ndarray,
        att_img: np.ndarray,
    ) -> tuple[np.ndarray, tuple[np.ndarray, np.ndarray, np.ndarray]]:
        c, h, o = state
        x = np.concatenate([embedding, o], axis=1)
        if self.cfg.cell_type == "gru":
            new_h = gru_step(
                x, h,
                self.w["gru_gate_kernel"], self.w["gru_gate_bias"],
                self.w["gru_cand_kernel"], self.w["gru_cand_bias"],
            )
            new_c = c  # unused for GRU; kept so the state tuple shape is stable
        else:
            new_c, new_h = lstm_step(x, c, h, self.w["lstm_kernel"], self.w["lstm_bias"])
        ctx = self.context(img, att_img, new_h)
        new_o = np.tanh(new_h @ self.w["o_W_h"] + ctx @ self.w["o_W_c"]).astype(np.float32)
        logits = new_o @ self.w["y_W_o"]
        return logits.astype(np.float32), (new_c, new_h, new_o)

    # --- greedy dynamic decode (M6 + M8) --------------------------------------
    def greedy_decode(self, enc: np.ndarray) -> np.ndarray:
        """enc: (N,H,W,C) encoder output → int32 ids (N,T), T ≤ max_len+1.

        Finished rows are COMPACTED out of the active batch each step (the
        reference lets them keep emitting into the TensorArray,
        dynamic_decode.py:17-75; rows are truncated at the first END
        downstream either way — F5 — so padding finished rows with END here is
        output-equivalent and saves the per-step attention/LSTM cost of rows
        that ended early: mean formula length is ~6 tokens vs the 49-step cap,
        so the active batch shrinks fast)."""
        img = flatten_regions(enc)
        n = img.shape[0]
        att_img = self.precompute(img)
        c, h, o = self.initial_state(img)
        emb = np.tile(self.w["start_token"][None, :], (n, 1))
        max_iter = self.cfg.max_length_formula + 1
        out = np.full((n, max_iter), self.id_end, dtype=np.int32)
        active = np.arange(n)
        t = 0
        while active.size and t < max_iter:
            logits, (c, h, o) = self.cell_step(emb, (c, h, o), img, att_img)
            ids = logits.argmax(axis=-1).astype(np.int32)
            out[active, t] = ids
            t += 1
            alive = ids != self.id_end
            if not alive.all():
                active = active[alive]
                img, att_img = img[alive], att_img[alive]
                c, h, o = c[alive], h[alive], o[alive]
                ids = ids[alive]
            emb = self.w["embedding_table"][ids]
        return out[:, :t]

    # --- teacher-forced masked cross-entropy (A2) ------------------------------
    def teacher_forced_ce(
        self, enc: np.ndarray, labels: np.ndarray, lengths: np.ndarray
    ) -> np.ndarray:
        """Per-row masked cross-entropy sum for gold label sequences.

        The reference's perplexity statistic (/root/reference/model/img2seq.py:68-75):
        losses = sparse_softmax_CE(logits_t, label_t) under teacher forcing
        (step t's input embedding is gold label t-1, start token at t=0),
        masked by sequence_mask(formula_length); ce_words = Σ losses. Labels
        come from pad_batch_formulas (END appended, lengths include it),
        exactly the reference feed. CE is accumulated in float64 from the
        float32 logits; padded steps contribute nothing.

        Returns ce_sums (N,) float64; n_words per row is ``lengths``.
        """
        img = flatten_regions(enc)
        n = img.shape[0]
        att_img = self.precompute(img)
        c, h, o = self.initial_state(img)
        emb = np.tile(self.w["start_token"][None, :], (n, 1))
        ce = np.zeros(n, dtype=np.float64)
        rows = np.arange(n)
        for t in range(int(lengths.max())):
            logits, (c, h, o) = self.cell_step(emb, (c, h, o), img, att_img)
            lp = log_softmax(logits.astype(np.float64), axis=-1)
            tok = labels[:, t]
            ce -= np.where(t < lengths, lp[rows, tok], 0.0)
            emb = self.w["embedding_table"][tok]
        return ce
