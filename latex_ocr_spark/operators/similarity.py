"""Similarity search over the embeddings table (vec_id, embedding float[64],
label).

Two paths, same result shape (query_id, neighbor_id, sim):
  - ``cosine_topk``      — exact brute force: query-set ⋈ corpus with the dot
    product as a built-in zip_with/aggregate expression (JVM, codegen). The
    correctness baseline; at scale only for bounded query sets (the broadcast
    side is the query set).
  - ``lsh_cosine_topk``  — random-hyperplane (SRP) LSH-bucketed variant: only
    candidates sharing a hyperplane signature with the query are scored, then
    exact re-rank; multiple hash tables (signature rotations) trade recall for
    fan-in. The 100 TB path: candidate generation is an equi-join on
    (table, signature); no cross join anywhere.

Float determinism: similarities are computed in double and rounded to 4dp,
ranked with a (sim DESC, neighbor_id ASC) tie-break so row_number is stable.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SRP_SEED = 0x51A_2026


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(pairs: DataFrame, a: str = "qv", b: str = "nv") -> DataFrame:
    return pairs.withColumn(
        "sim",
        F.round(_dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b))), 4),
    )


def cosine_topk(
    embeddings: DataFrame, k: int = 5, n_queries: int = 50
) -> DataFrame:
    """Exact top-k cosine neighbors for vec_id < n_queries (excluding self)."""
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv")
    )
    scored = with_cosine(
        F.broadcast(queries).crossJoin(corpus).filter(
            F.col("query_id") != F.col("neighbor_id")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _srp_planes(dim: int, n_planes: int, table: int) -> list[list[float]]:
    rng = np.random.default_rng(SRP_SEED + table)
    return rng.standard_normal((n_planes, dim)).tolist()


def srp_signature(df: DataFrame, vec_col: str, dim: int, n_planes: int, table: int):
    """Signed-random-projection signature as a built-in expression: bit b set
    iff embedding · plane_b >= 0."""
    planes = _srp_planes(dim, n_planes, table)
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(v)) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot >= 0, F.lit(2**b).cast("long")).otherwise(F.lit(0))
    return sig


def lsh_cosine_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 50,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 12,
) -> DataFrame:
    """SRP-LSH candidate generation + exact re-rank (approximate top-k)."""
    base = embeddings.select("vec_id", "embedding")
    # all tables' signatures in ONE projection + explode (linear plan, one
    # scan), persisted because both join sides read it
    table_structs = [
        F.struct(
            F.lit(t).alias("table"),
            srp_signature(base, "embedding", dim, n_planes, t).alias("sig"),
        )
        for t in range(n_tables)
    ]
    sigs = (
        base.select("vec_id", F.explode(F.array(*table_structs)).alias("ts"))
        .select("vec_id", F.col("ts.table").alias("table"), F.col("ts.sig").alias("sig"))
        .persist()
    )
    q = sigs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "table", "sig"
    )
    cands = (
        q.join(sigs, ["table", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qv = base.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    nv = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv")
    )
    scored = with_cosine(cands.join(F.broadcast(qv), "query_id").join(nv, "neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
