"""Evaluation metrics (SURVEY §2.3 J4/J5, §2.4 A5).

Mirrors ``src/test_search.cpp:104-134`` (recall@k) and
``inc/utils/tools.hpp:16-51`` (average distance ratio, with the
``gt > 1e-5`` zero-distance guard at tools.hpp:39).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_per_query(results: DataFrame, gt: DataFrame, k: int) -> DataFrame:
    """J4: |result_ids ∩ gt_top_k| / k per query → (qid, recall).

    Membership join (semi-join semantics), then count — the set form of
    the reference's nested-loop membership test (src/test_search.cpp:113-120).
    """
    r = results.where(F.col("rank") <= k).select("qid", "id")
    g = gt.where(F.col("rank") <= k).select("qid", "id")
    hits = r.join(g, on=["qid", "id"], how="inner").groupBy("qid").agg(
        F.count("*").alias("nhit")
    )
    all_q = gt.select("qid").distinct()
    return all_q.join(hits, on="qid", how="left").select(
        "qid",
        F.round(F.coalesce(F.col("nhit"), F.lit(0)).cast("double") / F.lit(float(k)), 6).alias(
            "recall"
        ),
    )


def ratio_per_query(results: DataFrame, gt: DataFrame, k: int) -> DataFrame:
    """J5: mean of sqrt(d_ann / d_gt) over rank-paired results per query
    (inc/utils/tools.hpp:16-51).  Pairs with d_gt ≤ 1e-5 are skipped
    (tools.hpp:39); both inputs must carry squared-L2 ``dist``.
    Output: (qid, ratio) — NULL ratio when every pair was guarded out.
    """
    r = results.where(F.col("rank") <= k).select("qid", "rank", F.col("dist").alias("ann_d2"))
    g = gt.where(F.col("rank") <= k).select("qid", "rank", F.col("dist").alias("gt_d2"))
    paired = r.join(g, on=["qid", "rank"], how="inner").where(F.col("gt_d2") > 1e-5)
    return paired.groupBy("qid").agg(
        F.round(F.avg(F.sqrt(F.col("ann_d2") / F.col("gt_d2"))), 6).alias("ratio")
    )
