"""Sink parity tests (K1/K2/K3 + predict.py single-image path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from latex_ocr_spark.config import ModelConfig
from latex_ocr_spark.fixtures.glyphs import render_formula
from latex_ocr_spark.fixtures.png import encode_png
from latex_ocr_spark.fixtures.vocab import SPECIALS
from latex_ocr_spark.kernels.oracle import Model, oracle_decode_images
from latex_ocr_spark.sinks import (
    load_vocab,
    predict_single,
    write_answers,
    write_matching,
    write_vocab,
)


def test_vocab_sink_roundtrip(spark, tmp_path):
    vocab = spark.createDataFrame([("b",), ("a",), ("c",)], ["token"])
    path = str(tmp_path / "vocab")
    write_vocab(vocab, path)
    tok_to_id = load_vocab(spark, path, SPECIALS)
    assert tok_to_id["a"] == 0 and tok_to_id["b"] == 1 and tok_to_id["c"] == 2
    assert tok_to_id["_END"] == 5  # specials appended last, reference order


def test_matching_sink_success_filter(spark, tmp_path):
    df = spark.createDataFrame(
        [("img-1", 10, True), ("img-2", 11, False)], ["media_ref", "formula_id", "ok"]
    )
    path = str(tmp_path / "matching")
    write_matching(df, path)
    lines = [r.value for r in spark.read.text(path).collect()]
    assert lines == ["img-1 10"]


def test_answers_sink_keyed(spark, tmp_path):
    pairs = spark.createDataFrame(
        [("d1", 1, "a b", "a b"), ("d1", 3, "c", "x")],
        ["doc_id", "offset", "ref", "hyp"],
    )
    write_answers(pairs, str(tmp_path / "ans"))
    refs = {r.value for r in spark.read.text(str(tmp_path / "ans" / "ref")).collect()}
    hyps = {r.value for r in spark.read.text(str(tmp_path / "ans" / "hyp_0")).collect()}
    assert "d1\t3\tc" in refs and "d1\t3\tx" in hyps


def test_predict_single_matches_oracle():
    img = render_formula(r"\alpha + 1", scale=2)
    cfg = ModelConfig.small()
    assert predict_single(encode_png(img), cfg) == oracle_decode_images(
        [img], Model(cfg)
    )[0]


def test_table_format_switch(spark, corpus):
    """parquet default reads; iceberg fail-fasts with an actionable error in
    this connector-less container; unknown formats rejected."""
    import pytest

    from latex_ocr_spark.sources import read_docs, table_format

    assert table_format() == "parquet"
    assert read_docs(spark, corpus, fmt="parquet").count() > 0
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_docs(spark, corpus, fmt="iceberg")
    with pytest.raises(ValueError, match="unknown table format"):
        read_docs(spark, corpus, fmt="orc")


def test_iceberg_roundtrip_self_activating(spark, corpus, tmp_path):
    """Skipped in this sandbox (no iceberg-spark-runtime jar ships, no
    network to fetch one — README Known limits); on any cluster where the
    jar IS on the classpath this test self-activates and exercises the
    real `--format iceberg` path end-to-end: write the docs table to a
    hadoop-catalog Iceberg warehouse with an identity partition spec on
    `part`, read it back through read_docs(fmt="iceberg"), and verify
    partition pruning returns exactly the parquet-side counts."""
    import pytest
    from pyspark.sql import functions as F

    from latex_ocr_spark.sources import DOCS_SCHEMA, read_docs

    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
    except Exception:
        pytest.skip(
            "iceberg-spark-runtime not on classpath (expected here; "
            "self-activates on a cluster that ships the jar)"
        )

    wh = str(tmp_path / "wh")
    spark.conf.set(
        "spark.sql.catalog.it_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it_test.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_test.warehouse", wh)

    docs = spark.read.schema(DOCS_SCHEMA).parquet(f"{corpus}/docs")
    docs.writeTo("it_test.db.docs").partitionedBy(F.col("part")).create()

    # hadoop-catalog tables are path-addressable: wh/db/docs — exactly the
    # layout read_docs expects when out_dir points at the database dir
    back = read_docs(spark, f"{wh}/db", fmt="iceberg")
    assert back.count() == docs.count()
    one_part = read_docs(spark, f"{wh}/db", parts=[0], fmt="iceberg")
    assert one_part.count() == docs.filter("part = 0").count()


def _fixture_pdf_with_png(png: bytes) -> bytes:
    """Minimal single-page PDF embedding a PNG image XObject — the shape the
    rasterizer stub handles (the reference accepts .pdf via magick)."""
    return (
        b"%PDF-1.4\n1 0 obj<</Type/XObject/Subtype/Image/Filter/PNGRaw>>stream\n"
        + png
        + b"\nendstream endobj\ntrailer<<>>\n%%EOF\n"
    )


def test_predict_single_pdf_parity():
    """predict.py PDF-input parity: PDF bytes wrapping a PNG must decode to
    the same LaTeX as the PNG itself; non-image PDFs hit the stub's
    NotImplementedError."""
    import pytest

    cfg = ModelConfig.small()
    png = encode_png(render_formula("a + b", 2))
    assert predict_single(_fixture_pdf_with_png(png), cfg) == predict_single(png, cfg)
    with pytest.raises(NotImplementedError, match="pdfium|magick"):
        predict_single(b"%PDF-1.4\nno image here\n%%EOF", cfg)
