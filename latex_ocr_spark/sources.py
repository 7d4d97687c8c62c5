"""Sources & sinks: schema-enforced reads of the corpus tables.

Replaces the reference's convention-only file formats (SURVEY.md §2.1 S1-S4)
with explicit StructType schemas and fail-fast validation. Table format is
switchable (SURVEY.md §7 'Stack'): ``--format iceberg`` (or
LATEX_OCR_TABLE_FORMAT=iceberg) routes reads through the Iceberg DSv2
connector — identical schemas, identity partitioning on ``part``, and the
``parts`` filter becomes Iceberg partition pruning; the default is plain
parquet with directory-level pruning. The container ships no Iceberg jar, so
the iceberg path fail-fasts with a clear error here and parquet is the tested
path; the read-site abstraction (``read_docs``/``read_media``) is the single
place a deployment flips.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .fixtures.corpus import MAX_MEDIA_PER_DOC, docs_spark_sql, render_media_ref

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("image", T.BinaryType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("latex_true", T.StringType(), False),  # fixture lineage only
    ]
)


def corpus_dir(sf_dir: str, root: str | None = None) -> str:
    """Cache directory for the synthesized corpus derived from ``sf_dir``."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = root or os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".fixtures")
    return os.path.abspath(os.path.join(root, tag))


def build_corpus(spark: SparkSession, sf_dir: str, out_dir: str | None = None) -> str:
    """Materialize the deterministic interleaved corpus (docs + media parquet)
    derived from ``<sf_dir>/documents.parquet``. Idempotent: returns the cached
    dir if the _SUCCESS markers already exist.

    docs/  — (doc_id, part, spans) written partitionBy(part) → partition
             pruning is real directory pruning, the Iceberg identity-partition
             analog (FIXTURES.md §1).
    media/ — (media_ref, image PNG, height, width, latex_true) rendered by the
             seeded glyph renderer inside mapInPandas (Arrow-batched).
    """
    out_dir = out_dir or corpus_dir(sf_dir)
    docs_path = os.path.join(out_dir, "docs")
    media_path = os.path.join(out_dir, "media")
    if os.path.exists(os.path.join(docs_path, "_SUCCESS")) and os.path.exists(
        os.path.join(media_path, "_SUCCESS")
    ):
        return out_dir

    docs_src = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs_src.createOrReplaceTempView("__documents_src")
    docs = spark.sql(docs_spark_sql("__documents_src"))
    docs.write.mode("overwrite").partitionBy("part").parquet(docs_path)

    refs = (
        spark.read.parquet(docs_path)
        .select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
    )

    def render(batches):
        import pandas as pd

        for pdf in batches:
            rows = [render_media_ref(m) for m in pdf["media_ref"]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].values,
                    "image": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "width": [r[2] for r in rows],
                    "latex_true": [r[3] for r in rows],
                }
            )

    media = refs.mapInPandas(render, schema=MEDIA_SCHEMA)
    media.write.mode("overwrite").parquet(media_path)
    return out_dir


TABLE_FORMAT_ENV = "LATEX_OCR_TABLE_FORMAT"


def table_format(fmt: str | None = None) -> str:
    fmt = fmt or os.environ.get(TABLE_FORMAT_ENV, "parquet")
    if fmt not in ("parquet", "iceberg"):
        raise ValueError(f"unknown table format {fmt!r} (parquet|iceberg)")
    return fmt


def _require_iceberg(spark: SparkSession) -> None:
    """Fail fast with an actionable message when the Iceberg Spark runtime is
    not on the classpath (this container never ships it)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
    except Exception as ex:  # py4j wraps ClassNotFoundException
        raise RuntimeError(
            "table format 'iceberg' requires iceberg-spark-runtime on the "
            "classpath (spark-submit --packages org.apache.iceberg:"
            "iceberg-spark-runtime-3.5_2.13:<version>); falling back is "
            "deliberate-only: rerun with --format parquet"
        ) from ex


def _read_table(
    spark: SparkSession, path: str, schema: T.StructType, fmt: str | None
) -> DataFrame:
    if table_format(fmt) == "iceberg":
        _require_iceberg(spark)
        # Iceberg tables carry their own schema + identity partition spec;
        # `path` is a table identifier or metadata location
        return spark.read.format("iceberg").load(path)
    return spark.read.schema(schema).parquet(path)


def read_docs(
    spark: SparkSession,
    out_dir: str,
    parts: list[int] | None = None,
    fmt: str | None = None,
) -> DataFrame:
    """Docs scan with explicit partition pruning (north rule). ``parts=None``
    reads all partitions; the filter is a directory-level prune on parquet and
    an identity-partition prune on Iceberg — check ``.explain`` →
    PartitionFilters."""
    df = _read_table(spark, os.path.join(out_dir, "docs"), DOCS_SCHEMA, fmt)
    if parts is not None:
        df = df.filter(F.col("part").isin(parts))
    return df


def read_media(spark: SparkSession, out_dir: str, fmt: str | None = None) -> DataFrame:
    return _read_table(spark, os.path.join(out_dir, "media"), MEDIA_SCHEMA, fmt)
