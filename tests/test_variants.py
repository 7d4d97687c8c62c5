"""Config-variant tests: 'cnn' encoder (strided conv), GRU cell, beam
diversity penalty plumbing, and the A6 image metric — plus the invariant that
enabling a variant never changes base-weight golden outputs (variant weights
are drawn after the base rng stream)."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from latex_ocr_spark.config import ModelConfig
from latex_ocr_spark.eval.image_metrics import image_scores, img_edit_distance
from latex_ocr_spark.fixtures.glyphs import render_formula
from latex_ocr_spark.fixtures.png import encode_png
from latex_ocr_spark.fixtures.vocab import N_TOK
from latex_ocr_spark.kernels import image_ops
from latex_ocr_spark.kernels.encoder import encode
from latex_ocr_spark.kernels.oracle import Model, oracle_decode_images
from latex_ocr_spark.kernels.weights import init_weights


def _cfg(**kw):
    return dataclasses.replace(ModelConfig.small(), **kw)


def test_variant_weights_do_not_change_base_stream():
    base = init_weights(ModelConfig.small(), N_TOK)
    # weights module always draws variant weights last; same seed ⇒ identical base
    again = init_weights(_cfg(encoder_cnn="cnn", cell_type="gru"), N_TOK)
    for k in ("conv0_W", "lstm_kernel", "embedding_table", "start_token"):
        assert np.array_equal(base[k], again[k])


def test_cnn_encoder_variant_shapes_and_determinism():
    cfg = _cfg(encoder_cnn="cnn")
    w = init_weights(cfg, N_TOK)
    canvas, *_ = image_ops.preprocess(render_formula("1 + 2", 1))
    out1 = encode(np.stack([canvas]), w, cfg)
    out2 = encode(np.stack([canvas]), w, cfg)
    assert np.array_equal(out1, out2)
    vanilla = encode(np.stack([canvas]), w, ModelConfig.small())
    # strided (2,2) conv vs pools (2,1)+(1,2) ⇒ same downsampling factor,
    # but VALID conv then differs only via values, shapes match
    assert out1.shape[3] == vanilla.shape[3]
    assert not np.array_equal(out1, vanilla)


def test_gru_decode_end_to_end_deterministic():
    cfg = _cfg(cell_type="gru")
    m = Model(cfg)
    imgs = [render_formula("a + b", 1), render_formula(r"\frac x y", 2)]
    t1 = oracle_decode_images(imgs, m)
    t2 = oracle_decode_images(imgs, m)
    assert t1 == t2
    lstm_out = oracle_decode_images(imgs, Model(ModelConfig.small()))
    assert t1 != lstm_out  # different cell ⇒ different (deterministic) output


def test_beam_diversity_penalty_plumbing():
    cfg = _cfg(decoding="beam_search", div_gamma=0.5, div_prob=1.0)
    m = Model(cfg)
    img = render_formula("1 + 2", 1)
    out1 = oracle_decode_images([img], m)
    out2 = oracle_decode_images([img], m)
    assert out1 == out2  # deterministic penalty


def test_img_edit_distance_reference_semantics():
    a = np.full((4, 3), 255, dtype=np.uint8)
    b = a.copy()
    assert img_edit_distance(a, b) == (0, 3)
    b2 = a.copy()
    b2[:, 1] = 0  # one differing column ⇒ 1 substitution
    assert img_edit_distance(a, b2) == (1, 3)
    # width mismatch ⇒ insertions
    c = np.full((4, 5), 255, dtype=np.uint8)
    assert img_edit_distance(a, c) == (2, 5)
    # height mismatch: shorter image zero-padded (white pad = no ink = 0 bits)
    d = np.full((6, 3), 255, dtype=np.uint8)
    assert img_edit_distance(a, d) == (0, 3)


def test_image_scores_dataframe(spark):
    r1 = encode_png(render_formula("1 + 2", 1))
    r2 = encode_png(render_formula("a b", 1))
    df = spark.createDataFrame(
        [(r1, r1), (r2, r1)], ["ref_png", "hyp_png"]
    )
    row = image_scores(df).collect()[0]
    assert row.image_em == 0.5
    assert 0.0 <= row.image_lev <= 1.0


@pytest.mark.parametrize("variant", ["simple_cnn", "resnet9", "densenet"])
def test_encoder_zoo_variant_decodes_deterministically(variant):
    """Zoo variants (model/img2seq_torch.py:69-83 analogs): spatial output
    with C = conv_channels[-1] so the same attention decoder runs end-to-end;
    deterministic; distinct from vanilla."""
    cfg = _cfg(encoder_cnn=variant)
    w = init_weights(cfg, N_TOK)
    canvas, *_ = image_ops.preprocess(render_formula("1 + 2 = 3", 2))
    out1 = encode(np.stack([canvas]), w, cfg)
    out2 = encode(np.stack([canvas]), w, cfg)
    assert np.array_equal(out1, out2)
    assert out1.ndim == 4 and out1.shape[0] == 1
    assert out1.shape[3] == cfg.conv_channels[-1]
    assert out1.shape[1] >= 1 and out1.shape[2] >= 1
    m = Model(cfg)
    t1 = oracle_decode_images([render_formula("a + b", 1)], m)
    t2 = oracle_decode_images([render_formula("a + b", 1)], m)
    assert t1 == t2


def test_zoo_weights_do_not_change_base_or_prior_variant_streams():
    base = init_weights(ModelConfig.small(), N_TOK)
    zoo = init_weights(_cfg(encoder_cnn="resnet9"), N_TOK)
    for k in ("conv0_W", "lstm_kernel", "conv_s_W", "gru_gate_kernel"):
        assert np.array_equal(base[k], zoo[k])
