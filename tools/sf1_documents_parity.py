"""One-shot sf1-scale documents parity sweep (round-4 scale validation,
companion to sf1_events_parity.py).

Synthesizes an sf1-sized documents table (10× sf0.1 = 50k docs) by
replicating documents with distinct doc_ids while KEEPING every text —
so each document gains 9 exact twins.  That is a deliberately adversarial
corpus for the dedup family: exact-dup groups of 10, every MinHash band
bucket 10× hotter, shingle document frequencies 10× higher (pushing many
through the DF_CAP stop-shingle guard on BOTH engines), and candidate
pair sets that grow quadratically in the twin count — exactly the
heavy-hitter/skew behavior that only shows at volume.  Every registered
documents-only query with a scalable oracle then runs on Spark AND its
DuckDB oracle over the same parquet, compared with the driver's
repr-tuple method.

Excluded: queries needing the embeddings table (ANN family — covered by
the K=20k soak) and the all-pairs-oracle near-dup twins whose DuckDB
side is O(N²) by construction (dedup_ngram_jaccard's oracle joins stay
bounded by DF_CAP, so it IS included).

Usage: python tools/sf1_documents_parity.py   (~3-6 min, local[8])
Writes nothing outside $TMPDIR.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
SRC = "/root/testdata/sf0.1"

# Documents-only queries whose oracles scale past 50k docs.  The
# all-pairs forms (dedup_simhash, dedup_embedding_cosine, doc_similarity)
# and embeddings-dependent queries are excluded by construction.
NAMES = [
    "dedup_exact",
    "dedup_lines",
    "dedup_spans",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_banded",
    "dedup_components",
    "dedup_cluster_sizes",
    "doc_chunks",
    "training_shard_export",
    "gopher_quality_filter",
    "tfidf_top_terms",
    "text_lang_id",
    "text_quality",
    "text_token_count",
    "text_pii_scrub",
    "text_fingerprint",
    "text_repetition",
    "corpus_stats",
    "corpus_stats_rollup",
    "corpus_stats_cube",
    "corpus_length_quantiles",
    "token_topk",
    "vocab_stats",
    "text_quality_bins",
    "token_pmi",
    # round-9 (cont.): the rewritten exact prefix-filtered Jaccard join
    # (aggregate positional bounds + array_intersect verify) and the two
    # documents-only curation audits — the 10-twin corpus is exactly the
    # adversarial shape for prefix filtering (every twin pair survives
    # every filter) and for the novelty/estimator audits (DF 10× higher)
    "dedup_jaccard_prefix",
    "minhash_jaccard_estimate",
    "doc_ngram_novelty",
    "sketch_length_quantiles",
]


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from extended_rabitq_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="sf1docs_")
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT doc_id + r * 10_000_000 AS doc_id,
                 text, lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet'),
               range({REPLICAS}) AS t(r)
        ) TO '{tmp}/documents.parquet' (FORMAT parquet)
        """
    )
    (n,) = con.sql(f"SELECT count(*) FROM '{tmp}/documents.parquet'").fetchone()
    print(f"sf1 documents synthesized: {n} rows at {tmp}")
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp}/documents.parquet'")

    spark = get_spark("sf1-documents-parity", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    q, o = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or NAMES  # optional: re-check a subset
    run = [nm for nm in names if nm in q and nm in o]
    missing = [nm for nm in names if nm not in q or nm not in o]
    if missing:
        print(f"WARNING: not registered / no oracle, skipped: {missing}")
    failures = []
    for name in run:
        t0 = time.perf_counter()
        s = sorted(tuple(map(repr, r)) for r in q[name](spark, tmp).collect())
        t1 = time.perf_counter()
        d = sorted(tuple(map(repr, r)) for r in con.sql(o[name]).fetchall())
        ok = s == d
        print(
            f"{name}: match={ok} rows={len(s)} "
            f"(spark {t1 - t0:.1f}s, duck {time.perf_counter() - t1:.1f}s)"
        )
        if not ok:
            failures.append(name)
            only_s = sorted(set(s) - set(d))[:2]
            only_d = sorted(set(d) - set(s))[:2]
            print(f"  rows spark={len(s)} duck={len(d)}; "
                  f"spark-only={only_s} duck-only={only_d}")
    print(f"RESULT: {len(run) - len(failures)}/{len(run)} match; "
          f"failures={failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
