"""JSONL corpus ingest: schema normalization, gzip transparency,
deterministic hash ids, and downstream operator compatibility."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from extended_rabitq_spark.sources.corpus_io import read_jsonl_docs

DOCS = [
    {"text": "the quick brown fox jumps over the lazy dog", "language": "en",
     "src": "web"},
    {"text": "pack my box with five dozen liquor jugs", "language": "en"},
    {"text": "agua fria del rio corre hacia el mar", "language": "es",
     "src": "books"},
    {"notext": "dropped row"},  # no text field → dropped
]


def _write_jsonl(path, rows, compress=False):
    data = "\n".join(json.dumps(r) for r in rows).encode()
    if compress:
        with gzip.open(path, "wb") as fh:
            fh.write(data)
    else:
        with open(path, "wb") as fh:
            fh.write(data)


def test_jsonl_to_documents_schema(spark, tmp_path):
    p = str(tmp_path / "c.jsonl")
    _write_jsonl(p, DOCS)
    docs = read_jsonl_docs(
        spark, p, lang_field="language", source_field="src",
        default_source="crawl",
    )
    rows = {r.text: r for r in docs.collect()}
    assert len(rows) == 3  # the no-text row dropped
    assert [f.name for f in docs.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars"
    ]
    r = rows["the quick brown fox jumps over the lazy dog"]
    assert r.lang == "en" and r.source == "web" and r.n_chars == len(r.text)
    # missing source falls back to the default
    assert rows["pack my box with five dozen liquor jugs"].source == "crawl"
    # hash ids: deterministic across a re-read, unique here
    again = {r.text: r.doc_id for r in read_jsonl_docs(
        spark, p, lang_field="language", source_field="src",
        default_source="crawl").collect()}
    assert all(again[t] == rows[t].doc_id for t in rows)
    assert len({r.doc_id for r in rows.values()}) == 3


def test_gzip_transparent_and_operators_run(spark, tmp_path):
    p = str(tmp_path / "c.jsonl.gz")
    _write_jsonl(p, DOCS, compress=True)
    docs = read_jsonl_docs(spark, p)
    assert docs.count() == 3
    # the normalized frame feeds registered operators unchanged
    from extended_rabitq_spark.operators import dedup, textops

    assert dedup.exact_dedup(docs).count() == 3
    q = textops.text_quality(docs)
    assert q.where(F.col("n_tokens") > 0).count() == 3


def test_upstream_id_field_kept(spark, tmp_path):
    p = str(tmp_path / "ids.jsonl")
    _write_jsonl(p, [{"text": "a b c", "uid": 77}, {"text": "d e f", "uid": 9}])
    docs = read_jsonl_docs(spark, p, id_field="uid")
    assert {r.doc_id for r in docs.collect()} == {77, 9}


def test_string_id_field_hashes_instead_of_nulling(spark, tmp_path):
    """String upstream ids (UUIDs, 'doc-00017') must map to stable
    non-null hash ids, not NULL via a silent bigint cast (review r5)."""
    p = str(tmp_path / "sids.jsonl")
    _write_jsonl(p, [{"text": "a b c", "id": "doc-00017"},
                     {"text": "d e f", "id": "doc-00018"},
                     {"text": "g h i", "id": 42}])
    docs = read_jsonl_docs(spark, p, id_field="id")
    rows = {r.text: r.doc_id for r in docs.collect()}
    assert None not in rows.values()
    assert rows["g h i"] == 42  # numeric ids still pass through
    again = {r.text: r.doc_id for r in read_jsonl_docs(
        spark, p, id_field="id").collect()}
    assert again == rows  # stable across re-reads
    assert len(set(rows.values())) == 3


def test_null_id_rows_fall_back_to_content_hash(spark, tmp_path):
    """Rows with a NULL upstream id must NOT collapse onto the single
    xxhash64(NULL) seed constant — they fall back to the same
    (source, text) content hash used when no id_field is given, so
    distinct texts keep distinct doc_ids (ADVICE r5)."""
    p = str(tmp_path / "nullids.jsonl")
    _write_jsonl(p, [{"text": "alpha beta", "id": None},
                     {"text": "gamma delta", "id": None},
                     {"text": "kept", "id": 5}])
    docs = read_jsonl_docs(spark, p, id_field="id")
    rows = {r.text: r.doc_id for r in docs.collect()}
    assert rows["kept"] == 5
    assert None not in rows.values()
    assert len(set(rows.values())) == 3  # no shared-seed collision
    # null-id rows hash exactly as the no-id_field path does
    noid = {r.text: r.doc_id for r in read_jsonl_docs(spark, p).collect()}
    assert rows["alpha beta"] == noid["alpha beta"]
    assert rows["gamma delta"] == noid["gamma delta"]
