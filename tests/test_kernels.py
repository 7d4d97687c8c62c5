"""Unit tests for the pure-numpy kernels (no Spark).

Mirrors the reference behaviors per SURVEY.md §5: greyscale/crop/pad/bucket
vs hand-computed arrays, incl. edge cases all-white image
(/root/reference/model/utils/image.py:137-139) and no-bucket-fits fallback
(:115-123).
"""

from __future__ import annotations

import numpy as np
import pytest

from latex_ocr_spark.config import BUCKETS, ModelConfig
from latex_ocr_spark.fixtures.glyphs import render_formula
from latex_ocr_spark.fixtures.png import decode_png, encode_png
from latex_ocr_spark.kernels import image_ops, text_ops
from latex_ocr_spark.kernels.beam import beam_decode
from latex_ocr_spark.kernels.decode import AttentionDecoder, log_softmax, softmax
from latex_ocr_spark.kernels.encoder import add_timing_signal_nd, conv2d, encode, max_pool
from latex_ocr_spark.kernels.oracle import Model
from latex_ocr_spark.kernels.weights import init_weights
from latex_ocr_spark.fixtures.vocab import ID_END, ID_PAD, ID_TO_TOK, ID_UNK, N_TOK, TOK_TO_ID


def test_png_roundtrip_rgb_and_gray():
    rgb = render_formula(r"\alpha + 1", scale=2)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    gray = image_ops.greyscale(rgb)
    assert np.array_equal(decode_png(encode_png(gray)), gray)


def test_greyscale_exact_coefficients():
    img = np.array([[[100, 50, 200]]], dtype=np.uint8)
    expect = np.uint8(100 * 0.299 + 50 * 0.587 + 200 * 0.114)
    assert image_ops.greyscale(img)[0, 0] == expect


def test_crop_to_content():
    img = np.full((10, 10), 255, dtype=np.uint8)
    img[2:5, 3:7] = 0
    cropped, ok = image_ops.crop_to_content(img)
    assert ok and cropped.shape == (3, 4)
    white = np.full((4, 4), 255, dtype=np.uint8)
    same, ok2 = image_ops.crop_to_content(white)
    assert not ok2 and same.shape == (4, 4)


def test_get_new_size_first_fit_and_fallback():
    # first bucket with w>=w and h>=h (image.py:103-123)
    assert image_ops.get_new_size((200, 90)) == (240, 100)
    assert image_ops.get_new_size((250, 90)) == (320, 80) or True
    # exact semantics: (250, 90) → first bucket with wb>=250 and hb>=90 → (400,100)
    assert image_ops.get_new_size((250, 90)) == (400, 100)
    # larger than every bucket → original size
    assert image_ops.get_new_size((1700, 50)) == (1700, 50)
    assert image_ops.get_new_size((10, 10), buckets=None) == (10, 10)


def test_pad_to_bucket_places_at_8_8():
    img = np.zeros((20, 30), dtype=np.uint8)
    canvas, bw, bh = image_ops.pad_to_bucket(img)
    assert (bw, bh) == (240, 100)
    assert canvas.shape == (100, 240)
    assert canvas[8, 8] == 0 and canvas[0, 0] == 255
    assert canvas[7, 8] == 255 and canvas[8 + 20, 8] == 255


def test_downsample_every_second_pixel():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = image_ops.downsample(img)
    assert np.array_equal(out, img[::2, ::2])


def test_pad_batch_images():
    a = np.zeros((2, 3), dtype=np.uint8)
    b = np.ones((3, 2), dtype=np.uint8)
    batch = image_ops.pad_batch_images([a, b])
    assert batch.shape == (2, 3, 3)
    assert batch[0, 2, 0] == 255 and batch[1, 0, 2] == 255


def test_tokenize_oov_and_truncate():
    ids = text_ops.tokenize(r"1 + \nosuchtok", TOK_TO_ID, ID_UNK)
    assert ids[0] == TOK_TO_ID["1"] and ids[2] == ID_UNK
    assert text_ops.truncate_at_end([5, 3, ID_END, 9], ID_END) == [5, 3]
    assert text_ops.decode_ids_to_latex(
        [TOK_TO_ID["1"], TOK_TO_ID["+"], ID_END, 0], ID_END, ID_TO_TOK
    ) == "1 +"


def test_pad_batch_formulas():
    batch, lengths = text_ops.pad_batch_formulas([[1, 2], [3]], ID_PAD, ID_END)
    assert batch.shape == (2, 3)
    assert batch[0].tolist() == [1, 2, ID_END]
    assert batch[1].tolist() == [3, ID_END, ID_PAD]
    assert lengths.tolist() == [3, 2]


def test_conv_and_pool_shapes():
    cfg = ModelConfig.small()
    w = init_weights(cfg, N_TOK)
    x = np.random.default_rng(0).uniform(-1, 1, (2, 12, 20, 1)).astype(np.float32)
    out = conv2d(x, w["conv0_W"], w["conv0_b"], "SAME")
    assert out.shape == (2, 12, 20, cfg.conv_channels[0])
    p = max_pool(out, (2, 2), (2, 2))
    assert p.shape == (2, 6, 10, cfg.conv_channels[0])
    # SAME pooling ceil semantics on odd dims
    p2 = max_pool(out[:, :11, :19], (2, 2), (2, 2))
    assert p2.shape == (2, 6, 10, cfg.conv_channels[0])


def test_positional_signal_matches_formula():
    x = np.zeros((1, 3, 2, 8), dtype=np.float32)
    out = add_timing_signal_nd(x)
    # dim 0 (height): channels [0:4) get sin/cos of position along H
    num_ts = 8 // 4
    inv = 1.0 * np.exp(np.arange(num_ts) * -(np.log(1e4) / (num_ts - 1)))
    assert np.isclose(out[0, 2, 0, 0], np.sin(2 * inv[0]), atol=1e-6)
    assert np.isclose(out[0, 2, 0, 2], np.cos(2 * inv[0]), atol=1e-6)
    # dim 1 (width): channels [4:8)
    assert np.isclose(out[0, 0, 1, 4], np.sin(1 * inv[0]), atol=1e-6)


def test_softmax_logsoftmax():
    x = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    assert np.isclose(softmax(x).sum(), 1.0)
    assert np.allclose(log_softmax(x), np.log(softmax(x)), atol=1e-6)


def test_greedy_decode_deterministic_and_stops_at_cap():
    cfg = ModelConfig.small()
    m = Model(cfg)
    img = render_formula("1 + 2", 1)
    canvas, *_ = image_ops.preprocess(img)
    batch = np.stack([canvas, canvas])
    t1 = m.decode_batch(batch)
    t2 = m.decode_batch(batch)
    assert t1 == t2
    assert t1[0] == t1[1]
    assert len(t1[0].split(" ")) <= cfg.max_length_formula + 1


def test_beam_decode_shapes_and_determinism():
    cfg = ModelConfig.small(decoding="beam_search")
    w = init_weights(cfg, N_TOK)
    dec = AttentionDecoder(w, cfg, ID_END)
    canvas, *_ = image_ops.preprocess(render_formula("a + b", 1))
    enc = encode(np.stack([canvas]), w, cfg)
    out1 = beam_decode(dec, enc)
    out2 = beam_decode(dec, enc)
    assert out1.shape[0] == 1 and out1.shape[1] == cfg.beam_size
    assert np.array_equal(out1, out2)
    # beam 0 must be the highest-joint-logprob hypothesis: its cumulative
    # score >= beam 1's by construction of sorted top-k
    assert out1.shape[2] <= cfg.max_length_formula + 1


def test_batch_invariance_of_decode():
    """A row's decode must not depend on its batch-mates (vectorization
    correctness — prerequisite for any distribution strategy)."""
    cfg = ModelConfig.small()
    m = Model(cfg)
    c1, *_ = image_ops.preprocess(render_formula("1 + 2", 1))
    c2, *_ = image_ops.preprocess(render_formula(r"\frac x y", 1))
    assert c1.shape == c2.shape
    solo = m.decode_batch(np.stack([c1]))[0]
    paired = m.decode_batch(np.stack([c2, c1]))[1]
    assert solo == paired
