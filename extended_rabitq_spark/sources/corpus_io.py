"""Text-corpus ingest: JSONL (plain or compressed) → the canonical
``documents`` table.

Real training-data pipelines store raw text as JSON-lines shards
(``*.jsonl``, ``*.jsonl.gz``, ``*.jsonl.zst`` ...) — one document per
line, schema drift between sources.  This module normalizes any such
corpus into the engine's documents schema
``(doc_id BIGINT, text STRING, lang STRING, source STRING,
n_chars BIGINT)`` so every registered operator (dedup, quality, text
analysis, sampling, export) runs on it unchanged.

Spark-first: ``spark.read.json`` is the distributed line-JSON reader —
splittable per file, codec transparently handled for the codecs the
JVM ships (gzip, bzip2, deflate, snappy; zstd on Spark 4 builds with
the codec present), with an EXPLICIT schema so the reader never runs
an inference pass over 100 TB.  The id is ``xxhash64(source, text)``
when the data has no id field — deterministic under re-runs and
re-partitioning (a row-number would depend on split planning), with
collision odds ~n²/2⁶⁵ (≈ 3×10⁻⁹ at 10⁹ docs); pass ``id_field`` to
keep upstream ids instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_jsonl_docs"]


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    lang_field: str | None = None,
    source_field: str | None = None,
    default_source: str = "jsonl",
) -> DataFrame:
    """Load a JSONL corpus → documents-schema DataFrame.

    Rows whose ``text_field`` is missing/null are dropped (counted by
    the caller via ``corpus_integrity_audit`` if needed); all other
    fields are optional.
    """
    fields = [T.StructField(text_field, T.StringType())]
    for f in (id_field, lang_field, source_field):
        if f:
            # id may arrive as number or string; read as string, cast
            fields.append(T.StructField(f, T.StringType()))
    schema = T.StructType(fields)
    raw = spark.read.schema(schema).json(path)
    raw = raw.where(F.col(text_field).isNotNull())
    src = (
        F.coalesce(F.col(source_field), F.lit(default_source))
        if source_field
        else F.lit(default_source)
    )
    if id_field:
        # numeric upstream ids pass through; string ids (UUIDs,
        # "doc-00017", ... — common in crawl shards) hash to a stable
        # 64-bit id instead of silently casting to NULL (review r5)
        # NULL upstream ids: xxhash64(NULL) is the seed constant (42) —
        # NON-null — so every null-id row would coalesce onto one shared
        # doc_id, corrupting downstream dedup/joins (ADVICE r5).  Route
        # null ids to the same content hash used without id_field.
        doc_id = F.when(
            F.col(id_field).isNull(), F.xxhash64(src, F.col(text_field))
        ).otherwise(
            F.coalesce(
                F.col(id_field).try_cast("bigint"),  # ANSI: plain cast raises
                F.xxhash64(F.col(id_field)),
            )
        )
    else:
        doc_id = F.xxhash64(src, F.col(text_field))
    return raw.select(
        doc_id.alias("doc_id"),
        F.col(text_field).alias("text"),
        (F.col(lang_field) if lang_field else F.lit(None).cast("string")).alias(
            "lang"
        ),
        src.alias("source"),
        F.length(text_field).cast("bigint").alias("n_chars"),
    )
