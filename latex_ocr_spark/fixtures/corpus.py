"""Deterministic synthetic interleaved corpus.

Derives the ``input_hint`` table — ``(doc_id:string, part:int,
spans:array<struct<kind,text,media_ref,offset>>)`` — **deterministically and
SQL-expressibly** from the driver's ``documents`` parquet, so the DuckDB
oracle can re-derive the exact same spans from the same source table (the
driver registers only the testdata views). Media images are rendered by the
seeded glyph renderer (fixtures/glyphs.py) — the stand-in for the reference's
pdflatex+magick corpus build (/root/reference/build.py,
model/utils/image.py:164-207).

Derivation rule (fixed; mirrored in ``SPANS_DUCKDB_CTE``):
  n_media(doc)  = doc_id % 3 + (12 if doc_id % 97 == 0 else 0)   # skew knob
  chunk_len     = ceil(len(text) / (n_media + 1))
  text span i   = (kind='text',  text=substr(text, i*chunk_len+1, chunk_len),
                   media_ref=NULL, offset=2i)          for i in 0..n_media
  media span j  = (kind='media', text=NULL,
                   media_ref='img-<doc_id>-<j>', offset=2j+1)  for j in 0..n_media-1
  doc_id        = 'doc-' || doc_id ;  part = doc_id % 16
  span ARRAY ORDER is reversed when doc_id % 7 == 0 (tests must not rely on
  array order — the (doc_id, offset) reassembly invariant, SURVEY.md §2.3 J3).

Formula content for media_ref (doc_id, j) is seeded (FORMULA_SEED), includes
edge cases: all-white image (k%53), long formula (k%101), image larger than
every bucket → fallback path (k%211) (model/utils/image.py:115-123, :137-139).
"""

from __future__ import annotations

import numpy as np

from .glyphs import render_formula
from .png import encode_png
from .vocab import BASE_TOKENS

FORMULA_SEED = 0xF0E_2026
N_PARTS = 16
MAX_MEDIA_PER_DOC = 64  # bound used by the oracle's range() cross join

# ---------------------------------------------------------------------------
# Spark SQL derivation (documents view -> docs table with spans array)
# ---------------------------------------------------------------------------

DOCS_SPARK_SQL = """
SELECT
  concat('doc-', CAST(doc_id AS STRING)) AS doc_id,
  CAST(doc_id % {n_parts} AS INT) AS part,
  CASE WHEN doc_id % 7 = 0 THEN reverse(spans_sorted) ELSE spans_sorted END AS spans
FROM (
  SELECT doc_id,
    array_sort(
      concat(
        transform(sequence(0, n_media), i -> named_struct(
          'kind', 'text',
          'text', substr(text, CAST(i * chunk_len + 1 AS INT), chunk_len),
          'media_ref', CAST(NULL AS STRING),
          'offset', CAST(2 * i AS INT))),
        filter(
          transform(sequence(0, greatest(n_media, 1) - 1), j -> named_struct(
            'kind', 'media',
            'text', CAST(NULL AS STRING),
            'media_ref', concat('img-', CAST(doc_id AS STRING), '-', CAST(j AS STRING)),
            'offset', CAST(2 * j + 1 AS INT))),
          s -> s.offset < 2 * n_media)
      ),
      (l, r) -> CASE WHEN l.offset < r.offset THEN -1
                     WHEN l.offset > r.offset THEN 1 ELSE 0 END
    ) AS spans_sorted
  FROM (
    SELECT doc_id, text,
           (doc_id % 3) + (CASE WHEN doc_id % 97 = 0 THEN 12 ELSE 0 END) AS n_media,
           CAST(ceil(length(text) /
               ((doc_id % 3) + (CASE WHEN doc_id % 97 = 0 THEN 12 ELSE 0 END) + 1.0)
             ) AS INT) AS chunk_len
    FROM {documents}
  )
)
"""

# ---------------------------------------------------------------------------
# DuckDB derivation of the SAME spans, exploded (used inside oracle_sql)
# ---------------------------------------------------------------------------

SPANS_DUCKDB_CTE = """
doc_base AS (
  SELECT doc_id AS did, text,
         (doc_id % 3) + (CASE WHEN doc_id % 97 = 0 THEN 12 ELSE 0 END) AS n_media,
         CAST(ceil(length(text) /
             ((doc_id % 3) + (CASE WHEN doc_id % 97 = 0 THEN 12 ELSE 0 END) + 1.0)
           ) AS INT) AS chunk_len
  FROM documents
),
doc_spans AS (
  SELECT 'doc-' || CAST(did AS VARCHAR) AS doc_id,
         CAST(did % {n_parts} AS INT) AS part,
         'text' AS kind,
         substr(text, CAST(i * chunk_len + 1 AS INT), chunk_len) AS text,
         CAST(NULL AS VARCHAR) AS media_ref,
         CAST(2 * i AS INT) AS "offset"
  FROM doc_base CROSS JOIN range(0, {max_media}) t(i)
  WHERE t.i <= doc_base.n_media
  UNION ALL
  SELECT 'doc-' || CAST(did AS VARCHAR) AS doc_id,
         CAST(did % {n_parts} AS INT) AS part,
         'media' AS kind,
         CAST(NULL AS VARCHAR) AS text,
         'img-' || CAST(did AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS media_ref,
         CAST(2 * j + 1 AS INT) AS "offset"
  FROM doc_base CROSS JOIN range(0, {max_media}) t(j)
  WHERE t.j < doc_base.n_media
)
"""


def docs_spark_sql(documents_view: str = "documents", n_parts: int = N_PARTS) -> str:
    return DOCS_SPARK_SQL.format(documents=documents_view, n_parts=n_parts)


def spans_duckdb_cte(n_parts: int = N_PARTS, max_media: int = MAX_MEDIA_PER_DOC) -> str:
    return SPANS_DUCKDB_CTE.format(n_parts=n_parts, max_media=max_media)


# ---------------------------------------------------------------------------
# media content (seeded, pure python/numpy — used by render UDF and oracle)
# ---------------------------------------------------------------------------


def formula_for(doc_id: int, j: int) -> tuple[str, int]:
    """Deterministic (latex, scale) for media_ref img-<doc_id>-<j>."""
    k = doc_id * 131 + j
    if k % 211 == 0:
        # larger than every bucket → get_new_size fallback path
        rng = np.random.default_rng(FORMULA_SEED ^ (k * 2 + 1))
        toks = [BASE_TOKENS[int(i)] for i in rng.integers(0, len(BASE_TOKENS), 40)]
        return " ".join(toks), 5
    if k % 101 == 0:
        rng = np.random.default_rng(FORMULA_SEED ^ (k * 2 + 3))
        toks = [BASE_TOKENS[int(i)] for i in rng.integers(0, len(BASE_TOKENS), 30)]
        return " ".join(toks), 4
    if k % 53 == 0:
        return "", 1  # all-white image → crop no-content edge case
    rng = np.random.default_rng(FORMULA_SEED ^ k)
    length = 1 + int(rng.integers(0, 12))
    toks = [BASE_TOKENS[int(i)] for i in rng.integers(0, len(BASE_TOKENS), length)]
    scale = 1 + int(rng.integers(0, 3))
    return " ".join(toks), scale


def parse_media_ref(media_ref: str) -> tuple[int, int]:
    _, d, j = media_ref.split("-")
    return int(d), int(j)


def render_media_ref(media_ref: str) -> tuple[bytes, int, int, str]:
    """media_ref → (png_bytes, height, width, latex ground truth)."""
    d, j = parse_media_ref(media_ref)
    latex, scale = formula_for(d, j)
    rgb = render_formula(latex, scale)
    return encode_png(rgb), rgb.shape[0], rgb.shape[1], latex
