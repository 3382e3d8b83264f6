"""Vector binary file sources/sinks (SURVEY §2.1 S1-S3).

The reference's on-disk formats:

- ``.fvecs``/``.ivecs``: per row ``[int32 d][d × float32|int32]``
  (reader ``inc/utils/IO.hpp:53-83``, python ``python/utils/io.py:5-31``);
- ``.fbin``/``.ibin``: header ``[int32 n][int32 d]`` then the raw matrix
  (``python/utils/io.py:34-42``).

Spark strategy: these are *ingest* formats — converted ONCE to parquet
via numpy (same reshape trick as the reference's io.py), then every
downstream stage reads parquet (columnar, splittable, predicate-pushdown).
We deliberately do not build a Spark DataSource for them: a row-framed
single binary file has no parallel split points without a scan, so a
one-shot driver-side conversion is the honest distributed design — at
100 TB the fleet of .fvecs shards maps to one conversion task per shard
(``ingest_dir``).
"""

from __future__ import annotations

import glob
import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession


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
    ".fbin": read_fbin,
    ".ibin": read_ibin,
}


def vectors_to_df(
    spark: SparkSession,
    mat: np.ndarray,
    id_offset: int = 0,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """numpy matrix → DataFrame(id BIGINT, vec ARRAY<FLOAT>) with explicit
    row ids (the reference's implicit row position, inc/defines.hpp:15)."""
    elem = "float" if mat.dtype in (np.float32, np.float64) else "int"
    rows = [(id_offset + i, [v.item() for v in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, f"{id_col} long, {vec_col} array<{elem}>")


def ingest_file(spark: SparkSession, path: str, out_parquet: str, **kw) -> DataFrame:
    """S1/S2 one-shot ingest: binary vector file → parquet; returns the
    DataFrame re-read from parquet (the steady-state source)."""
    ext = os.path.splitext(path)[1]
    mat = _READERS[ext](path)
    vectors_to_df(spark, mat, **kw).write.mode("overwrite").parquet(out_parquet)
    return spark.read.parquet(out_parquet)


def ingest_dir(spark: SparkSession, pattern: str, out_parquet: str, **kw) -> DataFrame:
    """Sharded ingest: each file matching ``pattern`` converts with a
    contiguous id range (ids = global row position, matching the
    reference's concatenated base file)."""
    paths = sorted(glob.glob(pattern))
    offset = 0
    first = True
    for p in paths:
        mat = _READERS[os.path.splitext(p)[1]](p)
        df = vectors_to_df(spark, mat, id_offset=offset, **kw)
        df.write.mode("overwrite" if first else "append").parquet(out_parquet)
        offset += mat.shape[0]
        first = False
    return spark.read.parquet(out_parquet)
