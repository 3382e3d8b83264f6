"""WARC ingest: Common Crawl-style web archives → the documents table.

WARC (ISO 28500) is the raw-crawl format every web-scale corpus starts
from.  A WARC file is a sequence of records, each a header block
(``WARC/1.0`` + ``Name: value`` lines, CRLF) followed by
``Content-Length`` payload bytes and a blank-line separator.  This
reader is pure stdlib (the container ships no warcio): parsing runs
inside ``mapInPandas`` over ``binaryFile`` rows, one Arrow batch per
shard — the standard per-file parallelism for crawls (CC shards are
~1 GB gzip members; files parallelize, records stream within a file).

Only ``WARC-Type: response`` records carry page payloads; the HTTP
headers inside the payload are split off at the first blank line, and a
crude tag-strip recovers text from HTML (a real pipeline plugs trafila-
tura/justext here — the Spark-side plumbing is identical).  Gzipped
inputs (``.warc.gz``) decompress with stdlib zlib; per-record-member
gzip (the CC convention) and plain concatenated streams both work
because ``zlib.decompressobj`` exposes ``unused_data`` for member
chaining.

At 100 TB: ingest is map-only (binaryFile scan → Arrow parse → columnar
write); no shuffle anywhere; doc ids are ``xxhash64(url, text)`` so
re-runs never migrate rows (the ``corpus_io`` convention).
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["parse_warc_bytes", "read_warc_docs", "html_to_text"]

_TAG_RE = re.compile(rb"<script.*?</script>|<style.*?</style>|<[^>]+>", re.S | re.I)
_WS_RE = re.compile(r"\s+")


def _iter_decompressed(data: bytes, chunk: int = 1 << 20):
    """Yield decompressed chunks of a (possibly multi-member) gzip
    stream, ≤ ``chunk`` bytes at a time; plain input yields itself.

    Chunked (``decompressobj`` + ``max_length``) so a whole-stream-gzip
    shard never materializes fully decompressed — peak memory is one
    chunk + the largest in-flight record, not the ~5 GB a decompressed
    Common Crawl shard would occupy."""
    if not data.startswith(b"\x1f\x8b"):
        yield data
        return
    rest = data
    while rest.startswith(b"\x1f\x8b"):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        buf = rest
        while True:
            out = d.decompress(buf, chunk)
            if out:
                yield out
            buf = d.unconsumed_tail
            if d.eof or not buf:
                break
        if not d.eof:  # truncated member
            break
        rest = d.unused_data


def html_to_text(payload: bytes) -> str:
    """Crude HTML→text: drop script/style, strip tags, collapse space.
    The seam where a production pipeline plugs a real extractor."""
    txt = _TAG_RE.sub(b" ", payload)
    s = txt.decode("utf-8", errors="replace")
    return _WS_RE.sub(" ", s).strip()


def _emit_record(headers: dict, body: bytes):
    """One parsed record → (url, date, ctype, text) or None (non-response)."""
    if headers.get(b"warc-type") != b"response":
        return None
    url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
    date = headers.get(b"warc-date", b"").decode("ascii", "replace")
    http_end = body.find(b"\r\n\r\n")
    http_hdr = body[:http_end] if http_end >= 0 else b""
    payload = body[http_end + 4 :] if http_end >= 0 else body
    m = re.search(rb"(?im)^content-type:\s*([^\r\n;]+)", http_hdr)
    ctype = m.group(1).strip().decode("ascii", "replace") if m else ""
    return url, date, ctype, html_to_text(payload)


def parse_warc_bytes(data: bytes):
    """Yield (url, date, content_type, text) for each response record.

    Incremental: decompressed chunks feed a rolling buffer from which
    complete records are parsed and discarded, so memory stays bounded
    by one record + one chunk regardless of shard size (review r6)."""
    buf = bytearray()
    done = False
    chunks = _iter_decompressed(data)
    while not done or buf:
        # Refill until a complete record is in the buffer (or EOF).
        start = bytes(buf).find(b"WARC/")
        hdr_end = bytes(buf).find(b"\r\n\r\n", start) if start >= 0 else -1
        need_more = start < 0 or hdr_end < 0
        rec_end = -1
        headers: dict = {}
        if not need_more:
            for line in bytes(buf[start:hdr_end]).split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().lower()] = v.strip()
            try:
                length = int(headers.get(b"content-length", b"0"))
            except ValueError:
                length = 0
            rec_end = hdr_end + 4 + length
            need_more = len(buf) < rec_end
        if need_more:
            if done:
                break  # truncated tail — stop cleanly
            nxt = next(chunks, None)
            if nxt is None:
                done = True
                # keep only a bounded tail while searching for a marker
                if start < 0 and len(buf) > 8:
                    del buf[:-8]
            else:
                buf.extend(nxt)
                if start < 0 and len(buf) > (1 << 22):
                    del buf[: -(1 << 22)]  # runaway garbage guard
            continue
        rec = _emit_record(headers, bytes(buf[hdr_end + 4 : rec_end]))
        del buf[:rec_end]  # drop the consumed record from memory
        if rec is not None:
            yield rec


def read_warc_docs(
    spark: SparkSession,
    path: str,
    min_chars: int = 1,
    default_source: str = "warc",
) -> DataFrame:
    """Load WARC shard(s) → documents-schema DataFrame
    ``(doc_id, text, lang, source, n_chars)``; ``lang`` is NULL (run
    ``text_lang_id`` downstream), ``source`` = the shard file name.

    binaryFile scan (content pruned to the parse stage only) →
    ``mapInPandas`` stdlib parser → deterministic ``xxhash64(url, text)``
    ids.  Map-only end-to-end."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                fname = fpath.rsplit("/", 1)[-1]
                for url, date, ctype, text in parse_warc_bytes(bytes(content)):
                    if len(text) >= min_chars:
                        rows.append((url, date, ctype, text, fname))
            yield pd.DataFrame(
                rows, columns=["url", "warc_date", "content_type", "text", "shard"]
            )

    parsed = raw.mapInPandas(
        parse,
        "url string, warc_date string, content_type string, text string, shard string",
    )
    return parsed.select(
        F.xxhash64("url", "text").alias("doc_id"),
        F.col("text"),
        F.lit(None).cast("string").alias("lang"),
        F.coalesce(F.col("shard"), F.lit(default_source)).alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
        "url",
        "warc_date",
        "content_type",
    )
