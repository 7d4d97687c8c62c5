"""Unit oracles for the sequence-assembly operators (pack_sequences,
chunk_dedup, stratified_split) — tiny hand-checkable corpora; the sf0.01
hash gate covers them at scale."""

from __future__ import annotations

import hashlib

import pytest

from latex_ocr_spark.operators.packing import (
    chunk_dedup,
    pack_sequences,
    stratified_split,
)


def test_pack_sequences_single_shard_layout(spark):
    """With one shard the layout is the plain concat-and-chop: doc word
    counts 3, 4, 2 at seq_len 5 → starts at offsets 0, 3, 2-of-block-1."""
    rows = [(1, "a b c"), (2, "d e f g"), (3, "h i")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.shard, r.seq_id, r.offset, r.n_words)
        for r in pack_sequences(docs, seq_len=5, n_shards=1).collect()
    }
    assert got == {
        1: (0, 0, 0, 3),   # starts block 0 offset 0
        2: (0, 0, 3, 4),   # cum_before 3
        3: (0, 1, 2, 2),   # cum_before 7 → block 1, offset 2
    }


def test_pack_sequences_shard_is_md5_derived(spark):
    docs = spark.createDataFrame(
        [(i, "w") for i in range(50)], "doc_id long, text string"
    )
    got = {r.doc_id: r.shard for r in
           pack_sequences(docs, seq_len=4, n_shards=16).collect()}
    expect = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 16
        for i in range(50)
    }
    assert got == expect


def test_chunk_dedup_cross_doc_within_doc_and_full_dup(spark):
    rows = [
        (1, "a b c d e f"),        # chunks: 'a b c', 'd e f' — both novel
        (2, "a b c x y z"),        # 'a b c' already seen → only 'x y z'
        (3, "a b c d e f"),        # full duplicate of doc 1 → empty
        (4, "p q r p q r"),        # within-doc repeat → one survives
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_chunks, r.n_kept)
        for r in chunk_dedup(docs, chunk_words=3).collect()
    }
    assert got[1] == ("a b c d e f", 2, 2)
    assert got[2] == ("x y z", 2, 1)
    assert got[3] == ("", 2, 0)
    assert got[4] == ("p q r", 2, 1)


def test_chunk_dedup_short_and_empty_docs(spark):
    rows = [(1, "only two"), (2, ""), (3, "only two")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_chunks, r.n_kept)
        for r in chunk_dedup(docs, chunk_words=5).collect()
    }
    assert got[1] == ("only two", 1, 1)
    assert got[2] == ("", 0, 0)      # empty doc survives as an empty row
    assert got[3] == ("", 1, 0)      # its single chunk is a dup of doc 1


def test_stratified_split_matches_python_rule_and_validates(spark):
    docs = spark.createDataFrame(
        [(i, "t", "en") for i in range(300)],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: r.split for r in stratified_split(docs).collect()}
    b_train = format(min(int(0.98 * 2**32), 2**32 - 1), "08x")
    b_val = format(min(int(0.99 * 2**32), 2**32 - 1), "08x")
    for i in range(300):
        h = hashlib.md5(str(i).encode()).hexdigest()[:8]
        expect = "train" if h < b_train else ("val" if h < b_val else "test")
        assert got[i] == expect
    with pytest.raises(ValueError, match="sum to 1"):
        stratified_split(docs, fractions=(("a", 0.5), ("b", 0.1)))
