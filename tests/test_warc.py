"""WARC ingest (sources/warc_io.py): stdlib parser over synthesized
archives — plain, gzip-per-member (the Common Crawl convention), and
whole-stream gzip."""

from __future__ import annotations

import gzip

from extended_rabitq_spark.sources import warc_io


def _record(wtype: bytes, url: bytes, body: bytes) -> bytes:
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype + b"\r\n"
        b"WARC-Target-URI: " + url + b"\r\n"
        b"WARC-Date: 2024-01-02T03:04:05Z\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
    )
    return hdr + b"\r\n" + body + b"\r\n\r\n"


def _response(url: bytes, html: bytes, ctype: bytes = b"text/html") -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"; charset=utf-8\r\n\r\n" + html
    )
    return _record(b"response", url, http)


def _sample_warc() -> bytes:
    return (
        _record(b"warcinfo", b"urn:x", b"software: test\r\n")
        + _response(
            b"http://a.example/page",
            b"<html><head><style>p{}</style></head>"
            b"<body><h1>Title A</h1><p>Hello   world</p>"
            b"<script>var x=1;</script></body></html>",
        )
        + _record(b"request", b"http://a.example/page", b"GET / HTTP/1.1\r\n")
        + _response(b"http://b.example/x", b"<p>Second doc body</p>")
    )


class TestParser:
    def test_parses_responses_only(self):
        recs = list(warc_io.parse_warc_bytes(_sample_warc()))
        assert len(recs) == 2
        (u1, d1, c1, t1), (u2, _, _, t2) = recs
        assert u1 == "http://a.example/page" and c1 == "text/html"
        assert d1 == "2024-01-02T03:04:05Z"
        assert t1 == "Title A Hello world"  # style/script stripped, ws collapsed
        assert u2 == "http://b.example/x" and t2 == "Second doc body"

    def test_gzip_member_per_record(self):
        raw = _sample_warc()
        # CC convention: each record its own gzip member
        parts = [
            _record(b"warcinfo", b"urn:x", b"software: test\r\n"),
            _response(b"http://a.example/page", b"<p>A</p>"),
            _response(b"http://b.example/x", b"<p>B</p>"),
        ]
        blob = b"".join(gzip.compress(p) for p in parts)
        recs = list(warc_io.parse_warc_bytes(blob))
        assert [t for _, _, _, t in recs] == ["A", "B"]
        # whole-stream gzip also works
        recs2 = list(warc_io.parse_warc_bytes(gzip.compress(raw)))
        assert len(recs2) == 2

    def test_truncated_input_no_crash(self):
        raw = _sample_warc()
        assert list(warc_io.parse_warc_bytes(raw[: len(raw) // 3])) is not None
        assert list(warc_io.parse_warc_bytes(b"")) == []
        assert list(warc_io.parse_warc_bytes(b"garbage no warc")) == []


class TestSparkIngest:
    def test_read_warc_docs_schema_and_ids(self, spark, tmp_path):
        p = tmp_path / "shard-00000.warc"
        p.write_bytes(_sample_warc())
        gz = tmp_path / "shard-00001.warc.gz"
        gz.write_bytes(gzip.compress(_response(b"http://c.example/z", b"<p>Third</p>")))
        df = warc_io.read_warc_docs(spark, str(tmp_path))
        rows = {r.url: r for r in df.collect()}
        assert set(rows) == {
            "http://a.example/page",
            "http://b.example/x",
            "http://c.example/z",
        }
        r = rows["http://a.example/page"]
        assert r.text == "Title A Hello world"
        assert r.n_chars == len(r.text) and r.source == "shard-00000.warc"
        # deterministic ids: re-read yields identical doc_ids
        again = {r.url: r.doc_id for r in warc_io.read_warc_docs(spark, str(tmp_path)).collect()}
        assert {u: rw.doc_id for u, rw in rows.items()} == again

    def test_documents_contract_feeds_operators(self, spark, tmp_path):
        """The ingested frame must run a real documents-table operator."""
        from extended_rabitq_spark.operators import dedup

        p = tmp_path / "s.warc"
        p.write_bytes(_sample_warc() + _sample_warc())  # every doc duplicated
        docs = warc_io.read_warc_docs(spark, str(tmp_path)).select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        # duplicate URLs+text collapse to the same doc_id -> distinct first
        uniq = docs.distinct()
        assert uniq.count() == 2
        survivors = dedup.exact_dedup(uniq)
        assert survivors.count() == 2
