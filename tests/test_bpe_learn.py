"""Distributed BPE trainer vs a pure-python reference implementation.

learn_bpe_merges is iterative (argmax per round) and therefore has no DuckDB
oracle — the python reference below IS the oracle: classic BPE over the word
frequency table with the same deterministic tie-break (max count, then
lexicographically smallest (left, right)) and the same left-to-right
non-overlapping apply rule."""

from __future__ import annotations

from collections import Counter

from latex_ocr_spark.operators.text_analysis import learn_bpe_merges


def _py_bpe(word_counts: dict[str, int], k: int):
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(k):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        maxf = max(pairs.values())
        a, b = min(p for p, f in pairs.items() if f == maxf)
        merges.append((a, b, maxf))
        new_vocab: dict = {}
        for syms, c in vocab.items():
            out: list = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_learn_bpe_matches_python_reference(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower newest newest newest newest"),
        (3, "newest newest widest widest widest"),
        (4, "low lower newest"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    words: Counter = Counter()
    for _, text in rows:
        words.update(text.split())
    expect = _py_bpe(dict(words), 8)
    got = [
        (r.left, r.right, r.freq)
        for r in learn_bpe_merges(docs, num_merges=8)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect
    # well-formedness: every compound operand was produced by an earlier merge
    produced = set()
    for a, b, _ in got:
        for operand in (a, b):
            assert len(operand) == 1 or operand in produced, (a, b)
        produced.add(a + b)


def test_learn_bpe_stops_when_no_pairs_remain(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab")], "doc_id long, text string"
    )
    # vocab is the single word 'ab' → one merge exhausts every pair
    got = learn_bpe_merges(docs, num_merges=10).collect()
    assert [(r.left, r.right, r.freq) for r in got] == [("a", "b", 3)]
