"""Guards on the driver-facing query registry: the correctness gate
hashes the FIRST 50 entries of ``queries()`` (observed driver behavior),
so the window's composition is product surface — pin it.
"""

from __future__ import annotations

CHECK_WINDOW = 50

# One representative per operator family that must stay driver-checked
# (COVERAGE.md "Checked-window manifest"); a registration-order change
# that silently evicts one of these fails here, not in the next round's
# VERDICT.  r5 rotation: quota_sample/text_token_count/corpus_stats/
# ivf_ratio rotated out (≥3 green rounds each) — their families keep the
# reps below (stratified_sample, text_quality, corpus_stats_cube,
# ivf_recall).
MUST_BE_CHECKED = [
    "ivf_recall",           # J4 (+ metric-join family rep after r5
                            # rotated ivf_ratio out; GT side keeps the
                            # J1/W4 exact-KNN primitive exercised after
                            # knn_exact rotated out r9; J3 probe join
                            # + A2 centroid CTE family rep after
                            # knn_ivf rotated out r10 — knn_ivf_adaptive
                            # also composes ivf_search twice)
    "text_pii_scrub",
    "multimodal_frames",
    # r7 rotation (VERDICT r6 item 1: 10 swaps — r7 manifest + r8 pool).
    # Rotated out in exchange (each >=3 green driver rounds, family rep
    # retained above): events_windowed, events_sessions, events_funnel,
    # events_json_props, events_pivot, multimodal_meta, ivf_probes,
    # ivf_assign, dedup_exact, knn_cosine.
    # (tpch_q10/q2/q22, maxsim_label_topk, tfidf_top_terms,
    # events_rate_anomaly, knn_hamming, dsir_select, semdedup rotated
    # out r10 after three green rounds — family reps retained below.)
    # (retrieval_eval_hamming rotated out r11 after four green rounds —
    # retrieval family keeps bm25_topk + hybrid_search_rrf below.)
    # r8 rotation (VERDICT r7 items 1+5: 14 swaps — the eleven
    # pre-verified pool candidates + tpch_q4/q7/q12).  Rotated out in
    # exchange (each >=3 green driver rounds, family rep retained in
    # the window): tpch_q1, tpch_q21, tpch_q3, tpch_q6, tpch_q13,
    # corpus_stats_cube, text_fingerprint, events_asof_state,
    # events_attribution, events_lead_lag, contamination_check,
    # dedup_components, dedup_incremental, stratified_sample.
    # (tpch_q4/q7/q12, kmv_source_overlap, pagerank_event_types,
    # events_zorder_layout, weighted_sample_aes rotated out r11 after
    # three green rounds — family reps retained below.)
    "knn_ivfpq",
    "knn_pq_adc",
    "bm25_topk",
    "hll_distinct_shingles",
    "entity_resolution",
    "events_scd2_intervals",
    "decontaminate_ngrams",
    # r9 rotation (VERDICT r8 items 1/3/6: 16 swaps).  Rotated out in
    # exchange (each >=3 green driver rounds, family rep retained in
    # the window): vocab_stats, dedup_spans, training_shard_export,
    # tpch_q5, tpch_q18, tpch_q15, token_topk, text_repetition,
    # dedup_lines, rabitq_recall_counts, knn_exact, vector_stats,
    # dedup_ngram_jaccard, dedup_simhash_banded, ivf_centroids,
    # events_salted_cohort_join.
    "sketch_length_quantiles",
    "dedup_jaccard_prefix",
    "rabitq_recall_counts_adaptive",
    "rabitq_recall_counts_ha",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q14",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "knn_binary_rerank",
    "knn_int8_rerank",
    "text_quality_bins",
    "token_pmi",
    # r10 rotation (VERDICT r9 item 1: 16 swaps — the six r9 _QUEUED
    # registrations + ten older never-driver-checked entries).  Rotated
    # out in exchange (each ≥3 green driver rounds, family rep retained
    # in the window): tpch_q10, tpch_q2, tpch_q22, maxsim_label_topk,
    # tfidf_top_terms, events_rate_anomaly, knn_hamming, dsir_select,
    # semdedup, dedup_minhash_lsh, dedup_embedding_ann, knn_ivf,
    # pipeline_clean_corpus, query_quantize_uniform,
    # corpus_mixture_sample, text_quality.
    "knn_ivf_adaptive",
    "ivf_adaptive_verdicts",
    "ivf_cell_stats",
    "cluster_balanced_sample",
    "minhash_jaccard_estimate",
    "doc_ngram_novelty",
    "knn_cosine_rabitq",
    "knn_ip_rabitq",
    "knn_filtered_rabitq",
    "embedding_int8_codec",
    "hybrid_search_rrf",
    "knn_mrl_prefix",
    "gopher_quality_filter",
    "doc_chunks",
    "events_retention",
    "events_latest_state",
    # r11 rotation (VERDICT r10 item 8 + the two r10 _QUEUED
    # registrations): the six r10-optimizer-touched queries rotate back
    # in for driver-side verification of their rewrites; the two new
    # registrations get their first driver checks.
    "dedup_minhash_lsh",
    "semdedup",
    "dsir_select",
    "knn_ivf",
    "pipeline_clean_corpus",
    "text_quality",
    "lm_kn_bigram_score",
    "mixture_token_budget",
]


def _entry():
    import __spark_entry__ as e

    return e


def test_checked_window_is_fully_oracle_backed():
    e = _entry()
    qs, os_ = list(e.queries()), e.oracle_sql()
    window = qs[:CHECK_WINDOW]
    missing = [n for n in window if n not in os_]
    assert not missing, f"rows-only queries inside the checked window: {missing}"


def test_every_family_representative_is_inside_the_window():
    e = _entry()
    window = set(list(e.queries())[:CHECK_WINDOW])
    evicted = [n for n in MUST_BE_CHECKED if n not in window]
    assert not evicted, f"family representatives outside the checked window: {evicted}"


def test_queued_registrations_sit_between_window_and_demoted():
    """_QUEUED entries (same-round registrations awaiting rotation) must
    be OUTSIDE the checked window but AHEAD of the demoted tail — new
    registrations never displace window members mid-round, and the
    queued block is the next rotation's candidate pool."""
    from extended_rabitq_spark.registry import _DEMOTED, _QUEUED

    e = _entry()
    order = list(e.queries())
    pos = {n: i for i, n in enumerate(order)}
    first_demoted = min(pos[n] for n in _DEMOTED)
    for n in _QUEUED:
        assert pos[n] >= CHECK_WINDOW, f"{n} displaces a window member"
        assert pos[n] < first_demoted, f"{n} sorted behind the demoted tail"


def test_oracles_is_subset_of_queries_and_order_consistent():
    e = _entry()
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    # ordered_oracles must follow ordered_queries (driver zips by position)
    q_order = [n for n in qs if n in os_]
    assert q_order == list(os_)


def test_demoted_and_promoted_lists_are_registered_and_disjoint():
    from extended_rabitq_spark import registry

    assert set(registry._DEMOTED) <= set(registry.QUERIES)
    assert set(registry._PROMOTED) <= set(registry.QUERIES)
    assert not set(registry._DEMOTED) & set(registry._PROMOTED)
