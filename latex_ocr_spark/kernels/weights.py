"""Deterministic seeded model weights.

No trained checkpoint ships with the reference (.MISSING_LARGE_BLOBS), so
"matching the reference" operationally means matching a seeded oracle that
implements the reference architecture (SURVEY.md §7 'Hard parts'). Weights are
generated once from a fixed seed, identically on driver and (via Spark
broadcast) on every executor.

Shapes mirror the reference variables:
  conv layers   — /root/reference/model/encoder.py:31-57
  att_img dense — model/components/attention_mechanism.py:43
  att_h/beta    — model/components/attention_mechanism.py:75-90
  init states   — model/components/attention_mechanism.py:124-153 (fields c,h,o)
  LSTM kernel   — tf.contrib.rnn.LSTMCell (i,j,f,o gate order, forget_bias=1)
  o_W_c/o_W_h/y_W_o — model/components/attention_cell.py:78-86
  embedding_table/start_token — model/decoder.py:41-46 (uniform(-1,1), L2-normalized)
"""

from __future__ import annotations

import numpy as np

from ..config import ModelConfig


def _glorot(rng: np.random.Generator, shape: tuple[int, ...]) -> np.ndarray:
    fan_in = int(np.prod(shape[:-1]))
    fan_out = int(shape[-1])
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return rng.uniform(-limit, limit, size=shape).astype(np.float32)


def _embedding(rng: np.random.Generator, shape: tuple[int, ...]) -> np.ndarray:
    t = rng.uniform(-1.0, 1.0, size=shape).astype(np.float32)
    norm = np.sqrt((t * t).sum(axis=-1, keepdims=True))
    return (t / np.maximum(norm, 1e-12)).astype(np.float32)


def init_weights(cfg: ModelConfig, n_tok: int) -> dict[str, np.ndarray]:
    """Build the full weight dict in a fixed name order (determinism)."""
    rng = np.random.default_rng(cfg.weights_seed)
    w: dict[str, np.ndarray] = {}
    c_in = 1
    for i, c_out in enumerate(cfg.conv_channels):
        w[f"conv{i}_W"] = _glorot(rng, (3, 3, c_in, c_out))
        w[f"conv{i}_b"] = np.zeros(c_out, dtype=np.float32)
        c_in = c_out
    n_channels = cfg.conv_channels[-1]
    w["att_img_W"] = _glorot(rng, (n_channels, cfg.dim_e))
    w["att_h_W"] = _glorot(rng, (cfg.num_units, cfg.dim_e))
    w["att_beta"] = _glorot(rng, (cfg.dim_e, 1))
    # initial states from mean image — LSTMStateTuple fields ("c", "h"), then "o"
    for name, dim in (("c", cfg.num_units), ("h", cfg.num_units), ("o", cfg.dim_o)):
        w[f"W_{name}_0"] = _glorot(rng, (n_channels, dim))
        w[f"b_{name}_0"] = np.zeros(dim, dtype=np.float32)
    lstm_in = cfg.dim_embeddings + cfg.dim_o
    w["lstm_kernel"] = _glorot(rng, (lstm_in + cfg.num_units, 4 * cfg.num_units))
    w["lstm_bias"] = np.zeros(4 * cfg.num_units, dtype=np.float32)
    w["o_W_c"] = _glorot(rng, (n_channels, cfg.dim_o))
    w["o_W_h"] = _glorot(rng, (cfg.num_units, cfg.dim_o))
    w["y_W_o"] = _glorot(rng, (cfg.dim_o, n_tok))
    w["embedding_table"] = _embedding(rng, (n_tok, cfg.dim_embeddings))
    w["start_token"] = _embedding(rng, (1, cfg.dim_embeddings))[0]
    # variant weights drawn LAST so enabling a variant never perturbs the
    # rng stream of the base weights (golden outputs stay fixed):
    # "cnn" encoder variant — strided conv replacing the 2 asymmetric pools
    # (/root/reference/model/encoder.py:53-55)
    w["conv_s_W"] = _glorot(rng, (2, 4, n_channels, n_channels))
    w["conv_s_b"] = np.zeros(n_channels, dtype=np.float32)
    # GRU cell variant (attn_cell_config.cell_type, model/decoder.py:5);
    # gate bias init 1.0 per tf GRUCell
    w["gru_gate_kernel"] = _glorot(rng, (lstm_in + cfg.num_units, 2 * cfg.num_units))
    w["gru_gate_bias"] = np.ones(2 * cfg.num_units, dtype=np.float32)
    w["gru_cand_kernel"] = _glorot(rng, (lstm_in + cfg.num_units, cfg.num_units))
    w["gru_cand_bias"] = np.zeros(cfg.num_units, dtype=np.float32)

    # encoder ZOO variants (model/img2seq_torch.py:69-83), drawn after
    # everything else — same stream invariant as above. Inference batchnorm
    # uses seeded frozen statistics (no trained checkpoint ships).
    def _bn(name: str, ch: int) -> None:
        w[f"{name}_gamma"] = rng.uniform(0.8, 1.2, ch).astype(np.float32)
        w[f"{name}_beta"] = (rng.standard_normal(ch) * 0.1).astype(np.float32)
        w[f"{name}_mean"] = (rng.standard_normal(ch) * 0.1).astype(np.float32)
        w[f"{name}_var"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)

    c = cfg.conv_channels
    # simple_cnn (components/SimpleCNN.py:10-23): 5 conv+bn stages
    scnn_ch = [c[0], c[1], c[2], c[3], c[5]]
    prev = 1
    for i, ch in enumerate(scnn_ch):
        w[f"scnn{i}_W"] = _glorot(rng, (3, 3, prev, ch))
        w[f"scnn{i}_b"] = np.zeros(ch, dtype=np.float32)
        _bn(f"scnn_bn{i}", ch)
        prev = ch
    # resnet9 (components/ResNet.py:8-13): stem + 4 BasicBlocks
    w["rn_stem_W"] = _glorot(rng, (3, 3, 1, c[0]))
    w["rn_stem_b"] = np.zeros(c[0], dtype=np.float32)
    _bn("rn_stem_bn", c[0])
    rn_ch = [c[1], c[2], c[4], c[5]]
    prev = c[0]
    for s, ch in enumerate(rn_ch):
        w[f"rn_b{s}_c1_W"] = _glorot(rng, (3, 3, prev, ch))
        w[f"rn_b{s}_c1_b"] = np.zeros(ch, dtype=np.float32)
        _bn(f"rn_b{s}_bn1", ch)
        w[f"rn_b{s}_c2_W"] = _glorot(rng, (3, 3, ch, ch))
        w[f"rn_b{s}_c2_b"] = np.zeros(ch, dtype=np.float32)
        _bn(f"rn_b{s}_bn2", ch)
        if prev != ch:
            w[f"rn_b{s}_proj_W"] = _glorot(rng, (1, 1, prev, ch))
            w[f"rn_b{s}_proj_b"] = np.zeros(ch, dtype=np.float32)
        prev = ch
    # densenet (components/DenseNet.py:3): stem + 3 growth layers + transition
    w["dn_stem_W"] = _glorot(rng, (3, 3, 1, c[0]))
    w["dn_stem_b"] = np.zeros(c[0], dtype=np.float32)
    _bn("dn_stem_bn", c[0])
    acc = c[0]
    for i in range(3):
        w[f"dn_g{i}_W"] = _glorot(rng, (3, 3, acc, c[1]))
        w[f"dn_g{i}_b"] = np.zeros(c[1], dtype=np.float32)
        _bn(f"dn_bn{i}", c[1])
        acc += c[1]
    w["dn_trans_W"] = _glorot(rng, (1, 1, acc, c[5]))
    w["dn_trans_b"] = np.zeros(c[5], dtype=np.float32)
    return w
