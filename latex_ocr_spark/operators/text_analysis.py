"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

Every operator is a pure built-in-expression DataFrame transform (JVM-side,
whole-stage-codegen; no Python in the hot path) with an exactly-equivalent
DuckDB oracle formula in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "les", "et"],
    "es": ["el", "los", "las", "y"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def _count_word(text_col, word: str):
    """Occurrences of ``word`` as a whole token: count in ' '||text||' ' of
    ' word ' via length-difference — identical semantics in DuckDB."""
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def token_count(corpus: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (4 chars/subword,
    ceil per word) per document."""
    words = F.split(F.col("text"), " ")
    return corpus.select(
        "doc_id",
        F.size(F.filter(words, lambda w: w != "")).alias("n_words"),
        F.aggregate(
            words,
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
        ).alias("n_subwords"),
        F.length("text").alias("n_chars"),
    )


def quality_score(corpus: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals, rounded to 4dp
    (float-stable across engines)."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    stop_hits = None
    for w in STOPWORDS:
        c = _count_word(F.col("text"), w)
        stop_hits = c if stop_hits is None else stop_hits + c
    n_punct = F.length("text") - F.length(
        F.regexp_replace("text", r"[\.,;:!\?]", "")
    )
    avg_word_len = F.round(
        (F.length("text") - (n_words - 1)) / n_words, 4
    )  # chars excluding single separators / word count
    return corpus.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(stop_hits / n_words, 4).cast("double").alias("stopword_ratio"),
        F.round(n_punct / F.length("text"), 4).cast("double").alias("punct_ratio"),
        avg_word_len.cast("double").alias("avg_word_len"),
        (
            (n_words >= 8)
            & (F.round(stop_hits / n_words, 4) >= 0.05)
        ).cast("int").alias("quality_keep"),
    )


def language_id(corpus: DataFrame) -> DataFrame:
    """Marker-lexicon language scorer: picks the language with the highest
    whole-word marker hit count; ties broken by language code order; 'und'
    (undetermined) when all scores are 0."""
    scores = {
        lang: sum(_count_word(F.col("text"), w) for w in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(scores)  # deterministic tie-break: alphabetical
    best = None
    best_score = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    pred = F.when(best_score > 0, best).otherwise(F.lit("und"))
    sel = [corpus["doc_id"], pred.alias("lang_pred")]
    sel += [scores[lang].alias(f"score_{lang}") for lang in langs]
    return corpus.select(*sel)


# Block-level tags whose entire content is boilerplate (dropped content and
# all), then any remaining tag is stripped markup-only. Order matters: block
# removal first, tag strip second, whitespace collapse last.
BOILERPLATE_BLOCKS = ["head", "script", "style", "nav", "header", "footer", "aside"]


def strip_boilerplate(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Main-content extraction from an HTML column: drop script/style/nav/
    header/footer/aside blocks wholesale, strip remaining tags, collapse
    whitespace. Pure regexp_replace chain (JVM codegen, no UDF); the DuckDB
    oracle replays the identical regex pipeline. A DOM parser would live in a
    mapInPandas stage; the regex path is the shuffle-free fast path for the
    overwhelmingly common flat-markup case."""
    col = F.col(html_col)
    for tag in BOILERPLATE_BLOCKS:
        col = F.regexp_replace(col, rf"(?i)<{tag}\b[^>]*>[\s\S]*?</{tag}>", " ")
    col = F.regexp_replace(col, r"<[^>]+>", " ")          # leftover markup → separator
    col = F.regexp_replace(col, r"\s+", " ")              # collapse runs
    col = F.trim(col)
    return df.withColumn("main_text", col)


def fingerprint(corpus: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the whitespace/case-normalized text
    (md5 is engine-stable, unlike xxhash64 which DuckDB lacks)."""
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return corpus.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.substring(F.md5(norm), 1, 8).alias("fp_prefix"),
    )
