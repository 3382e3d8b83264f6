"""Embedding STORAGE codec: per-vector symmetric int8 quantization.

Distinct from the RaBitQ index codes (``operators/rabitq.py`` quantizes
rotated residuals for SEARCH): this codec shrinks the embedding COLUMN
itself for at-rest storage and shuffle — fp32 ``array<float>`` →
``array<tinyint>`` + one float scale ≈ 4× smaller, which at 100 TB of
training-corpus embeddings is the difference between one storage tier
and the next.  Everything is a single codegen projection (map-only, no
shuffle, no Python): scale = max|x| / 127, code = ⌊x/scale + 0.5⌋
(floor-plus-half keeps the rounding identical across engines — the P6
convention), dequant = code · scale.  Zero vectors get scale 0 and
all-zero codes, dequantizing losslessly.

Reconstruction error is bounded by scale/2 per coordinate (≤ max|x| /
254), which preserves neighborhood structure: the recall of exact KNN
over dequantized embeddings vs the fp32 originals is tested ≥ 0.9 on
the fixture (tests/test_knn.py::TestInt8EmbeddingCodec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings_int8(
    df: DataFrame, vec: str = "embedding", scale_col: str = "scale",
    code_col: str = "code_i8",
) -> DataFrame:
    """Append ``scale`` (DOUBLE) and ``code_i8`` (ARRAY<TINYINT>) columns;
    drops the original vector column (the point is storing codes)."""
    scale = f"CAST(array_max(transform({vec}, v -> abs(CAST(v AS DOUBLE)))) AS DOUBLE) / 127.0"
    codes = (
        f"CASE WHEN ({scale}) = 0 THEN transform({vec}, v -> CAST(0 AS TINYINT)) "
        f"ELSE transform({vec}, v -> CAST(floor(CAST(v AS DOUBLE) / ({scale}) + 0.5) AS TINYINT)) END"
    )
    return df.withColumn(scale_col, F.expr(scale)).withColumn(
        code_col, F.expr(codes)
    ).drop(vec)


def dequantize_embeddings_int8(
    df: DataFrame, vec: str = "embedding", scale_col: str = "scale",
    code_col: str = "code_i8",
) -> DataFrame:
    """Inverse: reconstruct a DOUBLE vector column from codes + scale."""
    expr = (
        f"transform({code_col}, c -> CAST(c AS DOUBLE) * {scale_col})"
    )
    return df.withColumn(vec, F.expr(expr)).drop(code_col, scale_col)
