"""Byte-pair-encoding tokenizer: corpus training + distributed apply.

Sequence packing, token budgeting, and mixture math all need counts in
REAL tokenizer units; the whitespace/regex counter (``text_token_count``)
approximates them, this module computes them: train a BPE merge table
on the corpus (Sennrich et al. 2016 — the algorithm under GPT-2/
SentencePiece-BPE vocabularies) and tokenize at scale.

Spark-first split of work:

- **Training** needs only the WORD-FREQUENCY table, not the corpus: one
  distributed tokenize + groupBy (partial-agg) pass, ``top_words``
  rows collected (bounded, corpus-size-independent — the standard BPE
  training protocol).  The merge loop itself is inherently sequential
  (each merge depends on the previous), so it runs driver-side over
  that bounded dict; ties break lexicographically → fully
  deterministic, no RNG anywhere.
- **Apply** broadcasts the merge-rank dict and tokenizes inside Arrow
  batches (``mapInPandas``) with per-batch word memoization — map-only,
  no shuffle; Python is unavoidable here (iterative best-ranked-pair
  merging is not expressible in Catalyst) and is the documented
  exception path (SURVEY §3): batch-level, never per-row UDFs.

End-of-word marker: ``</w>`` appended to each word's last symbol so
merges never cross word boundaries (the Sennrich convention).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

EOW = "</w>"


def word_frequencies(docs: DataFrame, text: str = "text", top_words: int = 50_000):
    """Bounded word-frequency dict off ONE distributed pass."""
    wc = (
        docs.select(F.explode(F.expr(T.tokens(text))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(top_words)
    )
    return {r.w: r.c for r in wc.collect()}


def word_frequencies_two_stage(
    docs: DataFrame,
    text: str = "text",
    top_words: int = 50_000,
    n_buckets: int = 64,
):
    """EXACT top-``top_words`` word frequencies without a single global
    ``orderBy().limit()`` over all distinct words (VERDICT r6 item 7).

    The single-stage form compiles to TakeOrderedAndProject — per-
    partition top-K heaps merged AT THE DRIVER, so the driver merge
    volume is shuffle_partitions × top_words rows.  Fine at 32
    partitions; at a 10k-partition 100 TB vocabulary pass that is
    500M rows through one process.  Two-stage fix:

    1. exact word counts (same partial-agg groupBy);
    2. DISTRIBUTED pre-cut: hash words into ``n_buckets`` salt buckets
       and keep each bucket's local top-``top_words`` via a rank window
       (partial WindowGroupLimit — map-side pre-cut before the bucket
       shuffle).  **Superset theorem**: any word in the GLOBAL top-K
       ranks ≤ K inside its own bucket (ranks only shrink when
       restricted to a subset), so the candidate table — at most
       n_buckets · top_words rows — provably contains the global top-K;
    3. the final orderBy+limit runs over the bounded candidate table,
       so the driver merge is ≤ partitions · K over a tiny input.

    Same deterministic (count DESC, word ASC) order everywhere ⇒ the
    result dict is IDENTICAL to ``word_frequencies`` (asserted in
    tests/test_bpe.py), not merely a superset."""
    from pyspark.sql import Window

    wc = (
        docs.select(F.explode(F.expr(T.tokens(text))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    # xxhash64 (JVM, cheap) is fine here: bucketing only balances the
    # pre-cut, it never affects WHICH words win — no portability need.
    bucketed = wc.withColumn("b", F.pmod(F.xxhash64("w"), F.lit(n_buckets)))
    win = Window.partitionBy("b").orderBy(F.col("c").desc(), F.col("w").asc())
    cand = (
        bucketed.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= top_words)
        .select("w", "c")
    )
    top = cand.orderBy(F.col("c").desc(), F.col("w").asc()).limit(top_words)
    return {r.w: r.c for r in top.collect()}


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text: str = "text",
    top_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges → ordered merge list.

    Deterministic: pair counts come from the (bounded) word-frequency
    dict; the argmax tie-breaks lexicographically.

    Incremental (the Sennrich reference strategy): pair counts and a
    pair→words index are maintained across merges, so each merge only
    re-segments the words that actually contain the merged pair —
    O(affected words), not O(vocabulary), per merge (review r6)."""
    freqs = word_frequencies(docs, text=text, top_words=top_words)
    words = {w: tuple(w[:-1]) + (w[-1] + EOW,) for w in freqs}
    pair_counts: dict[tuple[str, str], int] = {}
    # pair -> words that contained it at SOME point; entries may go
    # stale after a rewrite — membership is re-derived from words[w]
    # when the pair is merged, counts stay exact via add/sub below.
    pair_words: dict[tuple[str, str], set[str]] = {}

    def adjust(w: str, sym: tuple, sign: int, index: bool) -> None:
        c = freqs[w] * sign
        for a, b in zip(sym, sym[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + c
            if index:
                pair_words.setdefault(p, set()).add(w)

    for w, sym in words.items():
        adjust(w, sym, +1, index=True)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        live = [(p, c) for p, c in pair_counts.items() if c >= 2]
        if not live:
            break
        # (count DESC, pair lexicographically ASC) — deterministic argmax
        pair, _cnt = min(live, key=lambda kv: (-kv[1], kv[0]))
        merges.append(pair)
        merged = pair[0] + pair[1]
        for w in sorted(pair_words.get(pair, ())):
            sym = words[w]
            out: list[str] = []
            i = 0
            hit = False
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                    hit = True
                else:
                    out.append(sym[i])
                    i += 1
            if not hit:  # stale index entry — word was rewritten since
                continue
            adjust(w, sym, -1, index=False)
            words[w] = tuple(out)
            adjust(w, words[w], +1, index=True)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word[:-1]) + [word[-1] + EOW] if word else []
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(sym, sym[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """→ (doc_id, tokens ARRAY<STRING>, n_tokens BIGINT): merge-rank
    greedy encode inside Arrow batches; the merge table broadcasts; a
    per-BATCH word cache collapses repeated words (Zipf makes the hit
    rate high) and is reset between batches so task memory stays
    bounded on high-cardinality corpora (review r6).

    The ``</w>`` marker is RESERVED: any literal occurrence inside a
    word is stripped at tokenize time (normalization), so the
    ``detokenize_expr`` round-trip is lossless exactly for marker-free
    text — which is all natural text; HTML remnants containing the
    literal marker lose it."""
    import pandas as pd

    spark = docs.sparkSession
    bR = spark.sparkContext.broadcast({p: i for i, p in enumerate(merges)})
    id_type = docs.schema[id_].dataType.simpleString()
    norm = docs.select(
        F.col(id_).alias("doc_id"), F.expr(T.tokens(text)).alias("_toks")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = bR.value
        for pdf in batches:
            cache: dict[str, list[str]] = {}  # per-batch: bounded memory
            toks_col, n_col = [], []
            for words in pdf["_toks"]:
                out: list[str] = []
                for w in words:
                    w = w.replace(EOW, "")  # reserved-marker normalization
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                toks_col.append(out)
                n_col.append(len(out))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "tokens": toks_col, "n_tokens": n_col}
            )

    return norm.mapInPandas(
        run, f"doc_id {id_type}, tokens array<string>, n_tokens long"
    )


def detokenize_expr(tokens: str = "tokens") -> str:
    """SQL text reversing :func:`bpe_tokenize`: concatenate and restore
    spaces at end-of-word markers.  Lossless for text free of the
    reserved literal ``</w>`` (stripped at tokenize — see
    :func:`bpe_tokenize`); round-trip tested both ways."""
    return (
        f"rtrim(replace(concat_ws('', {tokens}), '{EOW}', ' '))"
    )


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a merge table (ordered JSON list — the artifact a
    production pipeline trains once and ships to every tokenize job)."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump([list(p) for p in merges], f)


def load_merges(path: str) -> list[tuple[str, str]]:
    import json

    with open(path) as f:
        return [tuple(p) for p in json.load(f)]
