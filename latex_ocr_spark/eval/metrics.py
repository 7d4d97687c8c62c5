"""Corpus scoring aggregations (SURVEY.md §2.4 A3/A4/A5), re-expressed as
DataFrame aggregations over a (ref, hyp) pair table.

Reference formulas:
  exact match   — /root/reference/model/evaluation/text.py:41-57
                  (fraction of rows with token-sequence equality)
  edit distance — model/evaluation/text.py:76-92
                  1 - sum(levenshtein) / sum(max(len_ref, len_hyp))
  BLEU-4        — model/evaluation/text.py:60-73 (nltk corpus_bleu, uniform
                  1/4 weights): corpus-level clipped n-gram precision product
                  with brevity penalty — per-row stats in a pandas UDF, global
                  sums in a single agg.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_match_rate(pairs: DataFrame, ref: str = "ref", hyp: str = "hyp") -> DataFrame:
    """avg(ref == hyp) — whole-token-sequence equality on the joined strings."""
    return pairs.agg(
        F.round(
            F.avg((F.col(ref) == F.col(hyp)).cast("double")), 4
        ).alias("exact_match")
    )


def edit_distance_score(pairs: DataFrame, ref: str = "ref", hyp: str = "hyp") -> DataFrame:
    """1 - Σlev/Σmaxlen at CHARACTER level via the built-in levenshtein
    (JVM-side). The reference computes token-level distance; character level
    is the Spark-native equivalent and is what `F.levenshtein` gives us —
    both are reported by `token_edit_distance_score` below."""
    agg = pairs.agg(
        F.sum(F.levenshtein(ref, hyp)).alias("lev"),
        F.sum(F.greatest(F.length(ref), F.length(hyp))).alias("den"),
    )
    return agg.select(
        F.round(1.0 - F.col("lev") / F.col("den"), 4).alias("edit_distance_score")
    )


def token_edit_distance_score(
    pairs: DataFrame, ref: str = "ref", hyp: str = "hyp"
) -> DataFrame:
    """Token-level variant (the reference's exact semantics) — map tokens of
    each row to single unicode codepoints, then levenshtein on those proxy
    strings; pure built-in expressions via a per-row vocabulary."""

    def to_codes(c_ref, c_hyp):
        toks = F.array_distinct(
            F.concat(F.split(c_ref, " "), F.split(c_hyp, " "))
        )
        def enc(col):
            return F.concat_ws(
                "",
                F.transform(
                    F.split(col, " "),
                    lambda t: F.chr(F.array_position(toks, t) + 192),
                ),
            )
        return enc(c_ref), enc(c_hyp)

    r, h = to_codes(F.col(ref), F.col(hyp))
    agg = pairs.select(r.alias("_r"), h.alias("_h")).agg(
        F.sum(F.levenshtein("_r", "_h")).alias("lev"),
        F.sum(F.greatest(F.length("_r"), F.length("_h"))).alias("den"),
    )
    return agg.select(
        F.round(1.0 - F.col("lev") / F.col("den"), 4).alias("token_edit_distance_score")
    )


def _ngram_counts(tokens: list[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu4(pairs: DataFrame, ref: str = "ref", hyp: str = "hyp") -> DataFrame:
    """Corpus BLEU-4 (uniform weights, no smoothing — nltk default):
    per-row clipped counts in an Arrow-batched pandas UDF, one global agg."""
    schema = (
        "c1 long, t1 long, c2 long, t2 long, c3 long, t3 long, c4 long, t4 long, "
        "hyp_len long, ref_len long"
    )

    def stats(batches):
        for pdf in batches:
            rows = []
            for r, h in zip(pdf[ref], pdf[hyp]):
                rt = r.split(" ") if r else []
                ht = h.split(" ") if h else []
                row = {}
                for n in range(1, 5):
                    hc = _ngram_counts(ht, n)
                    rc = _ngram_counts(rt, n)
                    row[f"c{n}"] = sum(min(c, rc[g]) for g, c in hc.items())
                    row[f"t{n}"] = max(sum(hc.values()), 0)
                row["hyp_len"] = len(ht)
                row["ref_len"] = len(rt)
                rows.append(row)
            yield pd.DataFrame(rows)

    agg = (
        pairs.select(ref, hyp)
        .mapInPandas(stats, schema=schema)
        .agg(
            *[F.sum(c).alias(c) for c in
              ["c1", "t1", "c2", "t2", "c3", "t3", "c4", "t4", "hyp_len", "ref_len"]]
        )
        .collect()[0]
    )
    precisions = []
    for n in range(1, 5):
        c, t = agg[f"c{n}"], agg[f"t{n}"]
        if not t or not c:
            return pairs.sparkSession.createDataFrame([(0.0,)], "bleu4 double")
        precisions.append(c / t)
    bp = 1.0 if agg["hyp_len"] > agg["ref_len"] else math.exp(
        1 - agg["ref_len"] / max(agg["hyp_len"], 1)
    )
    score = bp * math.exp(sum(math.log(p) for p in precisions) / 4.0)
    return pairs.sparkSession.createDataFrame([(round(score, 4),)], "bleu4 double")
