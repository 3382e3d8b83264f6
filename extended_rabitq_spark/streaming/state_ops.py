"""Custom stateful streaming operator: the reference's bounded top-k
result pool (``inc/index/Pool.hpp:15-49``) as an
``applyInPandasWithState`` operator.

A stream of candidate rows (qid, id, dist) — e.g. from incremental index
scans or per-cluster probe micro-batches — folds into a per-query bounded
pool held in the StateStore; each trigger emits the query's current
top-k.  This is the streaming twin of the W3 window top-k: the sequential
``distk`` threshold the reference maintains per query lives here as real
operator state, which a parallel batch engine replaces with rank cuts
(SURVEY §4.2.2) — the stateful form exists for incremental/serving
pipelines where candidates arrive over time.

State size is O(k) per query key, partitioned by qid across executors.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "qid long, rank long, id long, dist double"
STATE_SCHEMA = "ids array<long>, dists array<double>"


def make_topk_pool_fn(k: int):
    """Returns the (key, pdf_iter, state) function for
    ``applyInPandasWithState`` maintaining a size-k pool per qid."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (qid,) = key
        if state.exists:
            ids, dists = state.get
            pool = list(zip(ids, dists))
        else:
            pool = []
        for pdf in pdfs:
            pool.extend(zip(pdf["id"].tolist(), pdf["dist"].tolist()))
        # deterministic total order: (dist, id) — SURVEY §4.2.1 tie-break
        pool.sort(key=lambda t: (t[1], t[0]))
        # drop duplicate ids (a candidate may be re-offered across batches)
        seen: set[int] = set()
        dedup = []
        for i, d in pool:
            if i not in seen:
                seen.add(i)
                dedup.append((i, d))
        pool = dedup[:k]
        state.update((
            [int(i) for i, _ in pool],
            [float(d) for _, d in pool],
        ))
        yield pd.DataFrame(
            {
                "qid": [qid] * len(pool),
                "rank": list(range(1, len(pool) + 1)),
                "id": [i for i, _ in pool],
                "dist": [d for _, d in pool],
            }
        )

    return update


def streaming_topk_pool(candidates, k: int):
    """Wire the pool over a streaming DataFrame of (qid, id, dist)."""
    return candidates.groupBy("qid").applyInPandasWithState(
        make_topk_pool_fn(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming rate-anomaly detector (stateful twin of events_rate_anomaly)
# ---------------------------------------------------------------------------

ANOM_OUTPUT_SCHEMA = (
    "event_type string, hour timestamp, cnt long, med double, is_spike boolean"
)
ANOM_STATE_SCHEMA = "hours array<long>, cnts array<long>"


def make_rate_anomaly_fn(window: int = 5, factor: int = 3):
    """Returns the ``applyInPandasWithState`` function maintaining the
    trailing ``window`` hourly counts per event_type and emitting each
    finalized hour's robust-baseline verdict — the online form of
    ``events_rate_anomaly`` (same median-of-trailing-5 rule, same
    integer-exact arithmetic).  State is O(window) per key."""
    import statistics

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            hours, cnts = state.get
            buf = list(zip(hours, cnts))
        else:
            buf = []
        batch: list[tuple[int, int]] = []
        for pdf in pdfs:
            for h, c in zip(pdf["hour"], pdf["cnt"]):
                batch.append((int(pd.Timestamp(h).value // 1000), int(c)))
        batch.sort()  # event-time order within the micro-batch
        out_h, out_c, out_m, out_s = [], [], [], []
        for h, c in batch:
            if len(buf) >= window:
                med = float(statistics.median([x for _, x in buf[-window:]]))
                out_h.append(h)
                out_c.append(c)
                out_m.append(med)
                out_s.append(c > factor * med)
            buf.append((h, c))
            buf = buf[-window:]
        state.update((
            [int(h) for h, _ in buf],
            [int(c) for _, c in buf],
        ))
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(out_h),
                "hour": pd.to_datetime(out_h, unit="us"),
                "cnt": out_c,
                "med": out_m,
                "is_spike": out_s,
            }
        )

    return update


def streaming_rate_anomaly(counts, window: int = 5, factor: int = 3):
    """Wire the detector over a streaming DataFrame of
    (event_type, hour, cnt) — e.g. the compacted output of an upstream
    watermarked hourly-count aggregation (two chained stateful
    operators in one query are not supported, so the counts land in a
    table/topic and the detector tails them — the standard split)."""
    return counts.groupBy("event_type").applyInPandasWithState(
        make_rate_anomaly_fn(window, factor),
        outputStructType=ANOM_OUTPUT_SCHEMA,
        stateStructType=ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
