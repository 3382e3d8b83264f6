"""Vector binary file sources/sinks (SURVEY §2.1 S1-S3).

The reference's on-disk formats:

- ``.fvecs``/``.ivecs``: per row ``[int32 d][d × float32|int32]``
  (reader ``inc/utils/IO.hpp:53-83``, python ``python/utils/io.py:5-31``);
- ``.bvecs``: per row ``[int32 d][d × uint8]`` — the SIFT1B-family
  companion format (same row framing, byte components; int semantics
  downstream like ivecs);
- ``.fbin``/``.ibin``: header ``[int32 n][int32 d]`` then the raw matrix
  (``python/utils/io.py:34-42``).

Spark strategy: these are *ingest* formats — converted ONCE to parquet
(same reshape trick as the reference's io.py), then every downstream
stage reads parquet (columnar, splittable, predicate-pushdown).  A
row-framed single binary file has no parallel split points without a
scan, so the unit of parallelism is the SHARD: ``ingest_dir`` loads the
shard fleet through Spark's ``binaryFile`` source (works on any
Hadoop-compatible FS — local, HDFS, S3) and converts each shard to
parquet rows in an executor-side Arrow pass, one task per shard.  Only
8-byte headers are read on the driver (to assign contiguous id offsets);
shard payloads never touch driver memory.
"""

from __future__ import annotations

import glob
import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_fvecs(path: str) -> np.ndarray:
    """Load a .fvecs file → float32 matrix (row-framed: d repeated per row)."""
    raw = np.fromfile(path, dtype=np.int32)
    if raw.size == 0:
        return np.zeros((0, 0), dtype=np.float32)
    d = int(raw[0])
    mat = raw.reshape(-1, d + 1)[:, 1:]
    return mat.view(np.float32).copy()


def read_ivecs(path: str) -> np.ndarray:
    """Load a .ivecs file → int32 matrix."""
    raw = np.fromfile(path, dtype=np.int32)
    if raw.size == 0:
        return np.zeros((0, 0), dtype=np.int32)
    d = int(raw[0])
    return raw.reshape(-1, d + 1)[:, 1:].copy()


def write_fvecs(path: str, mat: np.ndarray) -> None:
    """Write float32 matrix as .fvecs (S3)."""
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    n, d = mat.shape
    framed = np.empty((n, d + 1), dtype=np.int32)
    framed[:, 0] = d
    framed[:, 1:] = mat.view(np.int32)
    framed.tofile(path)


def write_ivecs(path: str, mat: np.ndarray) -> None:
    mat = np.ascontiguousarray(mat, dtype=np.int32)
    n, d = mat.shape
    framed = np.empty((n, d + 1), dtype=np.int32)
    framed[:, 0] = d
    framed[:, 1:] = mat
    framed.tofile(path)


def read_bvecs(path: str) -> np.ndarray:
    """Load a .bvecs file (uint8 vectors, row-framed: int32 d + d bytes
    per row — the SIFT1B-family format) → int32 matrix (int semantics
    downstream, like ivecs)."""
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size == 0:
        return np.zeros((0, 0), dtype=np.int32)
    d = int(np.frombuffer(raw[:4].tobytes(), dtype=np.int32)[0])
    return raw.reshape(-1, d + 4)[:, 4:].astype(np.int32)


def write_bvecs(path: str, mat: np.ndarray) -> None:
    """Write a uint8-valued matrix as .bvecs."""
    mat = np.ascontiguousarray(mat, dtype=np.uint8)
    n, d = mat.shape
    framed = np.empty((n, d + 4), dtype=np.uint8)
    framed[:, :4] = np.array([d], dtype=np.int32).view(np.uint8)
    framed[:, 4:] = mat
    framed.tofile(path)


def read_fbin(path: str) -> np.ndarray:
    """Load a .fbin file ([n][d] header) → float32 matrix (S2)."""
    with open(path, "rb") as f:
        n, d = struct.unpack("<ii", f.read(8))
        return np.fromfile(f, dtype=np.float32, count=n * d).reshape(n, d)


def read_ibin(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        n, d = struct.unpack("<ii", f.read(8))
        return np.fromfile(f, dtype=np.int32, count=n * d).reshape(n, d)


def write_fbin(path: str, mat: np.ndarray) -> None:
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", *mat.shape))
        mat.tofile(f)


_READERS = {
    ".fvecs": read_fvecs,
    ".ivecs": read_ivecs,
    ".bvecs": read_bvecs,
    ".fbin": read_fbin,
    ".ibin": read_ibin,
}


def _decode_bytes(ext: str, buf: bytes) -> np.ndarray:
    """Decode one shard's payload (bytes, any FS) → matrix; mirrors the
    file readers above, shared by the executor-side conversion."""
    if ext in (".fvecs", ".ivecs"):
        raw = np.frombuffer(buf, dtype=np.int32)
        if raw.size == 0:
            return np.zeros((0, 0), dtype=np.float32 if ext == ".fvecs" else np.int32)
        d = int(raw[0])
        mat = raw.reshape(-1, d + 1)[:, 1:]
        return mat.view(np.float32) if ext == ".fvecs" else mat
    if ext == ".bvecs":
        raw = np.frombuffer(buf, dtype=np.uint8)
        if raw.size == 0:
            return np.zeros((0, 0), dtype=np.int32)
        d = int(np.frombuffer(raw[:4].tobytes(), dtype=np.int32)[0])
        return raw.reshape(-1, d + 4)[:, 4:].astype(np.int32)
    n, d = struct.unpack("<ii", buf[:8])
    dt = np.float32 if ext == ".fbin" else np.int32
    return np.frombuffer(buf, dtype=dt, offset=8, count=n * d).reshape(n, d)


def _shard_rows(path: str) -> int:
    """Row count of a shard from its 8-byte header + file size ONLY —
    the driver never reads shard payloads."""
    ext = os.path.splitext(path)[1]
    size = os.path.getsize(path)
    if ext in (".fvecs", ".ivecs", ".bvecs"):
        if size < 4:
            return 0
        with open(path, "rb") as f:
            d = struct.unpack("<i", f.read(4))[0]
        if d <= 0:
            return 0
        stride = (d + 4) if ext == ".bvecs" else 4 * (d + 1)
        return size // stride
    with open(path, "rb") as f:
        n, _ = struct.unpack("<ii", f.read(8))
    return n


def vectors_to_df(
    spark: SparkSession,
    mat: np.ndarray,
    id_offset: int = 0,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """numpy matrix → DataFrame(id BIGINT, vec ARRAY<FLOAT>) with explicit
    row ids (the reference's implicit row position, inc/defines.hpp:15).
    Arrow-batched via pandas — no per-element Python row materialization."""
    elem = "float" if mat.dtype in (np.float32, np.float64) else "int"
    pdf = pd.DataFrame(
        {id_col: np.arange(id_offset, id_offset + len(mat), dtype=np.int64),
         vec_col: list(mat)}
    )
    return spark.createDataFrame(pdf).select(
        F.col(id_col).cast("long"), F.col(vec_col).cast(f"array<{elem}>")
    )


def ingest_file(spark: SparkSession, path: str, out_parquet: str, **kw) -> DataFrame:
    """S1/S2 one-shot ingest: binary vector file → parquet; returns the
    DataFrame re-read from parquet (the steady-state source).  The path
    is LITERAL (no glob interpretation — a file named ``v[1].fvecs``
    works); single file ≡ single-shard :func:`ingest_dir`."""
    df = convert_shards_df(spark, [path], path, **kw)
    df.write.mode("overwrite").parquet(out_parquet)
    return spark.read.parquet(out_parquet)


def ingest_dir(
    spark: SparkSession,
    pattern: str,
    out_parquet: str,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Distributed sharded ingest (S1/S2): every file matching ``pattern``
    converts in its own executor task, with a contiguous global id range
    (ids = global row position, matching the reference's concatenated
    base file, inc/utils/IO.hpp:53-83).

    Driver work is metadata-only: list shards, read 8-byte headers to
    compute per-shard id offsets.  Payloads flow through the
    ``binaryFile`` source → Arrow ``mapInPandas`` (numpy reshape per
    shard) → parquet, so a 100 TB fleet of .fvecs shards converts as a
    single map-only distributed job — no shard ever enters driver
    memory.  Shards must share one extension/dtype; each yields rows in
    bounded chunks so task memory stays flat regardless of shard size.
    """
    df = convert_shards_df(spark, sorted(glob.glob(pattern)), pattern,
                           id_col=id_col, vec_col=vec_col)
    df.write.mode("overwrite").parquet(out_parquet)
    return spark.read.parquet(out_parquet)


def convert_shards_df(
    spark: SparkSession,
    paths: list[str],
    pattern: str = "",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """The conversion plan of :func:`ingest_dir`, pre-write: binaryFile
    scan → one Arrow conversion task per shard (AQE may pack tiny shards
    together — that coalescing is the desired behavior at scale, where a
    shard is hundreds of MB and keeps its own task)."""
    if not paths:
        raise ValueError(f"ingest_dir: no files match {pattern!r}")
    exts = {os.path.splitext(p)[1] for p in paths}
    if len(exts) > 1:
        raise ValueError(f"ingest_dir: mixed shard formats {sorted(exts)}")
    ext = exts.pop()
    if ext not in _READERS:
        raise ValueError(f"ingest_dir: unsupported format {ext!r}")
    elem = "float" if ext in (".fvecs", ".fbin") else "int"
    # key per-shard id offsets by BASENAME: binaryFile reports paths as
    # URIs (percent-encoded — 'my file' arrives as 'my%20file'), so
    # filesystem-path keys don't round-trip.  Basenames survive URI
    # encoding via unquote and shards are files of one directory listing
    # in practice; duplicate basenames across dirs are rejected loudly.
    names = [os.path.basename(p) for p in paths]
    if len(set(names)) != len(names):
        raise ValueError("ingest_dir: duplicate shard basenames across dirs")
    offsets: dict[str, int] = {}
    offset = 0
    for p in paths:
        offsets[os.path.basename(p)] = offset
        offset += _shard_rows(p)
    b_offsets = spark.sparkContext.broadcast(offsets)

    CHUNK = 65_536

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs = b_offsets.value
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                from urllib.parse import unquote, urlparse

                name = os.path.basename(unquote(urlparse(path).path))
                mat = _decode_bytes(ext, content)
                off = offs[name]
                for i in range(0, len(mat), CHUNK):
                    part = mat[i : i + CHUNK]
                    yield pd.DataFrame(
                        {
                            id_col: np.arange(off + i, off + i + len(part), dtype=np.int64),
                            vec_col: list(part),
                        }
                    )

    # NO repartition: it would shuffle every shard's payload.  binaryFile
    # gives each large shard its own partition (binary files never split;
    # only sub-maxPartitionBytes files pack together) — at scale the job
    # is genuinely map-only.  Tiny-fixture shards may share a task; that
    # coalescing is fine.
    def _glob_escape(path: str) -> str:
        # Hadoop's load() globs its paths; escape metacharacters so a
        # literal shard named 'v[1].fvecs' resolves (backslash escaping
        # per Hadoop GlobPattern)
        out = []
        for ch in path:
            if ch in "*?[]{}\\":
                out.append("\\" + ch)
            else:
                out.append(ch)
        return "".join(out)

    shards = (
        spark.read.format("binaryFile")
        .load([_glob_escape(os.path.abspath(p)) for p in paths])
        .select("path", "content")
    )
    return shards.mapInPandas(convert, f"{id_col} long, {vec_col} array<{elem}>")
