"""Derive a larger scale factor deterministically from the provided sf0.1
documents table (no external data): REPLICAS copies with doc_id offsets that
are multiples of lcm(3, 97) = 291 so the corpus derivation rule's media
densities (d%3 media spans, d%97 heavy docs) are preserved exactly.

Purpose: scaling evidence with stage walls long enough (>60 s at local[32])
to amortize fixed per-job overhead — the BASELINE.md "overhead cannot
amortize over a 10 s wall" claim, demonstrated instead of argued.

Usage: python tools/make_big_sf.py [replicas=6] → .fixtures/sfbig<k>/documents.parquet
"""
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 6
src = "/root/testdata/sf0.1/documents.parquet"
out_dir = os.path.join(REPO, ".fixtures", f"sfbig{replicas}")
os.makedirs(out_dir, exist_ok=True)
out = os.path.join(out_dir, "documents.parquet")
if os.path.exists(out):
    print("exists", out)
    raise SystemExit(0)
# replica id offset: multiple of 291 (the corpus fixture's doc_id modulus,
# preserving the d%3/d%97 planted-density invariants) above the source range
step = 29100000
max_id = duckdb.sql(f"SELECT max(doc_id) FROM read_parquet('{src}')").fetchone()[0]
assert max_id < step, (
    f"source doc_ids reach {max_id} >= step {step}: replicas would collide"
)
sel = " UNION ALL ".join(
    f"SELECT doc_id + {k * step} AS doc_id, text, lang, source, n_chars "
    f"FROM read_parquet('{src}')"
    for k in range(replicas)
)
duckdb.sql(f"COPY ({sel}) TO '{out}' (FORMAT PARQUET)")
print("wrote", out, duckdb.sql(f"SELECT count(*) FROM '{out}'").fetchone())
