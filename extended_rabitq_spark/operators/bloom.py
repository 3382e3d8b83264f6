"""Distributed Bloom filter for dedup ingest gating (beyond-reference;
standard large-corpus practice — e.g. web-crawl pipelines keep a Bloom
filter of seen content hashes so the common all-unique batch never joins
the full corpus state).

Design for Spark:

- **Build** is one Arrow pass: the key hashes are computed JVM-side
  (``xxhash64`` — stays in whole-stage codegen), and an Arrow
  ``mapInPandas`` stage folds each partition into ONE bitmap row
  (``m/8`` bytes) with vectorized double hashing; the per-partition
  bitmaps are OR-reduced on EXECUTORS via a coalesce-and-fold chain
  (ADVICE r4) — exactly ONE merged bitmap (the return value itself)
  crosses to the driver, never ``n_partitions × m/8`` bytes.  Returning
  a >1 GB filter still requires ``spark.driver.maxResultSize`` (and
  driver RAM) sized for that one bitmap — see the sizing note in
  :func:`build_bloom`.  Nothing row-at-a-time, and no stage ever sees
  the keys themselves.
- **Probe** broadcasts the bitmap once and filters an incoming batch
  with the same vectorized double hashing — per-batch cost is O(batch),
  independent of corpus size.  No false negatives by construction
  (every inserted key set its bits), so a Bloom **pre-gate composes
  losslessly** with an exact equi-join tier: dropped rows provably have
  no match; false positives simply proceed to the join and resolve
  there.  Gated output ≡ ungated output, bitwise (tested).
- **Append** is an OR of bitmaps: a shard's keys build a bloom with the
  SAME (m, k) and merge without touching existing state — the same
  no-rewrite contract as the parquet dedup artifacts.

Sizing: m = ceil(-n·ln(p)/ln²2) bits, k = round(m/n·ln 2) — at 10⁹
content hashes and p = 1%, the bitmap is ~1.2 GB: broadcastable, the
standard trade for skipping a corpus-sized join per ingest batch.
At that size raise ``spark.driver.maxResultSize`` (default 1g) above
the bitmap size — the ONE merged bitmap the build returns must cross
to the driver.  (Band-key blooms are 8× that many keys; size p
accordingly or gate on the exact-hash tier only at extreme scale.)
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SALT2 = "exrq-bloom-h2"  # second independent xxhash64 stream


def _with_hashes(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append JVM-side 64-bit hash pair (_bh1, _bh2) of the composite
    key.  \\x1f-joined cast-to-string composite matches across build and
    probe by construction (same expression text)."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    return df.withColumn("_bh1", F.xxhash64(key)).withColumn(
        "_bh2", F.xxhash64(F.lit(_SALT2), key)
    )


def _positions(h1, h2, i: int, m: int):
    """Double hashing: pos_i = (h1 + i·h2) mod m, in uint64 (Kirsch-
    Mitzenmacher: k independent probes from 2 hashes)."""
    import numpy as np

    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64) | np.uint64(1)  # avoid the degenerate stride 0
    return (u1 + np.uint64(i) * u2) % np.uint64(m)


def build_bloom(
    df: DataFrame,
    cols: list[str],
    expected_items: int | None = None,
    fpp: float = 0.01,
    m: int | None = None,
    k: int | None = None,
) -> dict:
    """Build ``{"m", "k", "bitmap"}`` over the composite key ``cols``.

    ``m``/``k`` override sizing (required when building a delta bloom to
    OR into an existing one — parameters must match bit-for-bit).
    """
    import numpy as np
    import pandas as pd

    if m is None or k is None:
        n = max(1, expected_items if expected_items is not None else df.count())
        m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
        m += (-m) % 8  # whole bytes
        k = max(1, round(m / n * math.log(2)))
    n_bytes = m // 8
    hashed = _with_hashes(df, cols).select("_bh1", "_bh2")
    kk, mm = k, m

    def to_bitmap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h1 = pdf["_bh1"].to_numpy()
            h2 = pdf["_bh2"].to_numpy()
            for i in range(kk):
                pos = _positions(h1, h2, i, mm)
                np.bitwise_or.at(
                    bm, (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
        yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    bitmaps = hashed.mapInPandas(to_bitmap, "bitmap binary")
    # OR-reduce on executors: collecting one m/8-byte bitmap PER PARTITION
    # to the driver is n_partitions × bitmap through collect() — at the
    # advertised 10⁹-key sizing that exceeds driver.maxResultSize.  A
    # coalesce-and-fold chain merges partials executor-side (coalesce
    # without shuffle co-locates ~8 partials per task, the fold ORs them
    # in place) until ONE partition remains, so exactly one bitmap — the
    # return value itself, the theoretical minimum — crosses to the
    # driver.  (Each input partition yields exactly one row: to_bitmap
    # emits a zero bitmap even for empty partitions.)  Sizing note: that
    # final bitmap still counts against spark.driver.maxResultSize, so
    # bitmaps over ~1 GB (m ≳ 8×10⁹ bits ≈ 7×10⁸ keys at p=1%) need
    # maxResultSize raised alongside driver RAM — inherent to returning
    # the filter, not to the build.
    def _or_partition(it):
        import numpy as np

        acc = None
        for b in it:
            arr = np.frombuffer(b, dtype=np.uint8)
            acc = arr.copy() if acc is None else acc | arr
        return [acc.tobytes()] if acc is not None else []

    rdd = bitmaps.rdd.map(lambda r: bytes(r["bitmap"]))
    while rdd.getNumPartitions() > 1:
        rdd = rdd.coalesce(
            max(1, rdd.getNumPartitions() // 8)
        ).mapPartitions(_or_partition)
    parts = rdd.collect()
    if not parts:  # zero-partition input
        return {"m": m, "k": k, "bitmap": np.zeros(n_bytes, dtype=np.uint8).tobytes()}
    acc = np.frombuffer(parts[0], dtype=np.uint8).copy()
    for p in parts[1:]:  # single-partition RDDs skip the loop entirely
        acc |= np.frombuffer(p, dtype=np.uint8)
    return {"m": m, "k": k, "bitmap": acc.tobytes()}


def bloom_prefilter(df: DataFrame, bloom: dict, cols: list[str]) -> DataFrame:
    """Rows of ``df`` whose key MIGHT be in the bloom (no false
    negatives: definite non-members are dropped; false positives pass
    through to whatever exact tier follows).  One broadcast of the
    bitmap, Arrow-vectorized probe, schema preserved."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    b_bits = spark.sparkContext.broadcast(bloom["bitmap"])
    kk, mm = bloom["k"], bloom["m"]
    out_cols = df.columns

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.frombuffer(b_bits.value, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h1 = pdf["_bh1"].to_numpy()
            h2 = pdf["_bh2"].to_numpy()
            keep = np.ones(len(pdf), dtype=bool)
            for i in range(kk):
                pos = _positions(h1, h2, i, mm)
                bit = (
                    bm[(pos >> np.uint64(3)).astype(np.int64)]
                    >> (pos & np.uint64(7)).astype(np.uint8)
                ) & np.uint8(1)
                keep &= bit.astype(bool)
                if not keep.any():
                    break
            yield pdf.loc[keep, out_cols]

    hashed = _with_hashes(df, cols)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return hashed.mapInPandas(probe, schema)


def bloom_or(a: dict, b: dict) -> dict:
    """Merge two blooms built with identical (m, k) — the append path."""
    import numpy as np

    if (a["m"], a["k"]) != (b["m"], b["k"]):
        raise ValueError(
            f"bloom_or: parameter mismatch {(a['m'], a['k'])} vs {(b['m'], b['k'])}"
        )
    merged = np.frombuffer(a["bitmap"], dtype=np.uint8) | np.frombuffer(
        b["bitmap"], dtype=np.uint8
    )
    return {"m": a["m"], "k": a["k"], "bitmap": merged.tobytes()}


def save_blooms(spark: SparkSession, blooms: dict[str, dict], path: str) -> None:
    """Persist named blooms as one tiny parquet (name, m, k, bitmap)."""
    rows = [
        (name, int(b["m"]), int(b["k"]), bytearray(b["bitmap"]))
        for name, b in sorted(blooms.items())
    ]
    spark.createDataFrame(
        rows, "name string, m long, k int, bitmap binary"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_blooms(spark: SparkSession, path: str) -> dict[str, dict]:
    return {
        r["name"]: {"m": int(r["m"]), "k": int(r["k"]), "bitmap": bytes(r["bitmap"])}
        for r in spark.read.parquet(path).collect()
    }
