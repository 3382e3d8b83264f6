"""extended_rabitq_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of VectorDB-NTU/Extended-RaBitQ.

The reference (read-only at /root/reference) is a single-node C++ IVF +
RaBitQ / Extended-RaBitQ approximate-nearest-neighbor engine.  This package
re-expresses every operator it supports (SURVEY.md §2) as idiomatic Spark
DataFrame pipelines designed for a multi-executor cluster:

- index build  = groupBy/repartition on ``cluster_id`` + Arrow-vectorized
  ``mapInPandas`` quantization (the reference's OpenMP-per-cluster loop,
  ``inc/index/IVF.hpp:142-148``, maps 1:1 to Spark tasks per partition);
- search       = broadcast top-nprobe probe selection + partition-pruned
  equi-join + two-phase estimate/re-rank dataflow
  (``inc/index/IVF.hpp:295-325``);
- metrics      = joins + window top-k (``src/test_search.cpp:97-150``).

Beyond the reference surface it adds the LLM-data-pipeline operators a
100 TB training-data job needs: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search, text analysis, and
multimodal binary-column plumbing.
"""

__version__ = "0.1.0"
