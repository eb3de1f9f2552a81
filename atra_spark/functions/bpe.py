"""Distributed BPE tokenizer training + encoding.

The reference ships a fixed tokenizer (text_processing/src/tokenizer.rs);
a large-scale training-data pipeline additionally needs to LEARN the
tokenizer from the corpus. This implements byte-pair-encoding merge
learning (Sennrich et al. 2016, ACL — the published algorithm) in
Spark's execution model:

- ONE corpus-wide shuffle builds the word-frequency table
  (groupBy word, map-side combined). Everything after runs on that
  table, which is orders of magnitude smaller than the corpus — the
  same economics GPT-2's BPE trainer exploited. A ``max_words``
  frequency cap bounds it at web scale (top-K words carry almost all
  pair mass; the drop is logged, never silent).
- Each merge round counts adjacent symbol pairs JVM-side (transform +
  posexplode over the symbol arrays, weighted by word frequency,
  map-side combined) and takes the argmax with a total-order
  tie-break (count DESC, left ASC, right ASC) so training is
  deterministic.
- The winning pair is applied with a pure-SQL ``aggregate`` fold that
  reproduces the canonical greedy left-to-right merge scan ("aaa" +
  (a,a) -> ["aa","a"]): state is (out_array, pending_symbol); no
  Python in the loop. Lineage is truncated with localCheckpoint every
  few rounds (the dedup.py connected-components pattern).
- Encoding applies the learned merge ranks per word in an
  Arrow-batched pandas UDF with the merge table broadcast (real
  tokenizers are native code; the Spark-side shape — broadcast
  vocabulary, vectorized batches — is what survives the swap-in).

Word pre-tokenization is lowercase + split on ``[^a-z0-9]+`` — chosen
because the regex means the same thing in Spark, DuckDB and Python
``re``, so the serial oracle cannot drift. The last character of every
word carries the classic ``</w>`` end-of-word marker.
"""

from __future__ import annotations

import logging
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

log = logging.getLogger(__name__)

_WORD_SPLIT = "[^a-z0-9]+"


def word_freqs(docs: DataFrame, text_col: str = "text", max_words: int = 1_000_000) -> DataFrame:
    """Corpus -> (word, freq) table: the single corpus-wide shuffle of
    BPE training. ``max_words`` keeps the most frequent words (ties by
    word for determinism) and logs what the cap dropped.

    Standalone convenience wrapper — it leaves the word table cached
    (the cap check materializes it and every caller consumes it next).
    The training/vocab entry points use :func:`_word_table` directly so
    they can unpersist the base once their own state is materialized."""
    out, _base = _word_table(docs, text_col, max_words)
    return out


def _word_table(docs: DataFrame, text_col: str, max_words: int):
    """(capped word table, cached base). The corpus is scanned exactly
    once: the cap-check count materializes the cache, and the cap
    (when active) is a top-K read of that cache. The caller unpersists
    ``base`` after its downstream state is materialized."""
    words = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), _WORD_SPLIT)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .cache()
    )
    total = words.count()  # materializes the cache for every later read
    out = words
    if total > max_words:
        log.warning("bpe: word table %d > cap %d — dropping %d rare words",
                    total, max_words, total - max_words)
        out = words.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(max_words)
    return out, words


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq) -> (symbols array, freq); last char gets </w>."""
    chars = F.expr("filter(split(word, ''), c -> c != '')")
    return words.select(
        F.expr(
            "transform(filter(split(word, ''), c -> c != ''),"
            " (c, i) -> if(i = size(filter(split(word, ''), c -> c != '')) - 1,"
            " concat(c, '</w>'), c))"
        ).alias("symbols"),
        "freq",
    ).filter(F.size(chars) > 0)


def _pair_counts(sym: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word freq — all JVM, map-side
    combined by the partial aggregation Catalyst inserts."""
    pairs = F.expr(
        "transform(slice(symbols, 1, size(symbols) - 1),"
        " (s, i) -> struct(s AS left, symbols[i + 1] AS right))"
    )
    return (
        sym.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("n"))
    )


# greedy left-to-right merge scan as a pure-SQL fold: state = (merged
# prefix, pending symbol). For each x: if (pending, x) is the target
# pair, emit the merged token and clear pending; else flush pending and
# hold x. The merged token is never re-considered as a left side within
# the same pass — exactly the canonical scan.
_MERGE_FOLD = """
aggregate(
  symbols,
  named_struct('out', CAST(array() AS ARRAY<STRING>), 'pend', CAST(NULL AS STRING)),
  (acc, x) -> IF(acc.pend = {l} AND x = {r},
                 named_struct('out', array_append(acc.out, {m}),
                              'pend', CAST(NULL AS STRING)),
                 named_struct('out', IF(acc.pend IS NULL, acc.out,
                                        array_append(acc.out, acc.pend)),
                              'pend', CAST(x AS STRING))),
  acc -> IF(acc.pend IS NULL, acc.out, array_append(acc.out, acc.pend))
)
"""


def _apply_merge(sym: DataFrame, left: str, right: str) -> DataFrame:
    l, r, m = [_sql_str(s) for s in (left, right, left + right)]
    return sym.select(
        F.expr(_MERGE_FOLD.format(l=l, r=r, m=m)).alias("symbols"), "freq"
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


# multi-pair variant of _MERGE_FOLD: one left-to-right scan that merges
# whenever (pend, x) is in a batch of SYMBOL-DISJOINT pairs. Keys are
# "left right" (space-safe: symbols only ever contain [a-z0-9</w>]).
# Because no symbol appears in two batch pairs, a single scan is
# order-independent and equal to applying the pairs' individual folds
# sequentially.
_BATCH_FOLD = """
aggregate(
  symbols,
  named_struct('out', CAST(array() AS ARRAY<STRING>), 'pend', CAST(NULL AS STRING)),
  (acc, x) -> IF(acc.pend IS NOT NULL
                 AND element_at({m}, concat(acc.pend, ' ', x)) IS NOT NULL,
                 named_struct('out', array_append(acc.out,
                                element_at({m}, concat(acc.pend, ' ', x))),
                              'pend', CAST(NULL AS STRING)),
                 named_struct('out', IF(acc.pend IS NULL, acc.out,
                                        array_append(acc.out, acc.pend)),
                              'pend', CAST(x AS STRING))),
  acc -> IF(acc.pend IS NULL, acc.out, array_append(acc.out, acc.pend))
)
"""


def _apply_merge_batch(sym: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    entries = ", ".join(
        f"{_sql_str(l + ' ' + r)}, {_sql_str(l + r)}" for l, r in pairs
    )
    return sym.select(
        F.expr(_BATCH_FOLD.format(m=f"map({entries})")).alias("symbols"), "freq"
    )


def _select_disjoint(rows, batch_k: int, min_pair_freq: int) -> list[tuple[str, str, int]]:
    """Greedy prefix of the (count DESC, left, right)-sorted pair table:
    accept a pair iff it shares NO symbol with any already-accepted pair
    in this batch. Applying a merge can only change the counts of pairs
    that contain one of its two symbols (it consumes (x,left)/(right,y)
    adjacencies and creates (x,leftright)/(leftright,y) ones), so the
    accepted pairs' counts — and therefore their ranks and recorded
    frequencies — are exactly what the one-merge-per-round algorithm
    would have seen, UNLESS a pair newly created by an earlier accepted
    merge would have out-ranked a later one (the documented
    approximation; see bpe_train_batch)."""
    used: set[str] = set()
    out: list[tuple[str, str, int]] = []
    for row in rows:
        l, r, n = row["left"], row["right"], int(row["n"])
        if n < min_pair_freq:
            break
        if l in used or r in used:
            continue
        out.append((l, r, n))
        used.add(l)
        used.add(r)
        if len(out) >= batch_k:
            break
    return out


def bpe_train_batch(
    docs: DataFrame,
    n_merges: int = 1000,
    batch_k: int = 64,
    text_col: str = "text",
    max_words: int = 1_000_000,
    min_pair_freq: int = 2,
) -> tuple[list[tuple[int, str, str, int]], int]:
    """Scale path of :func:`bpe_train`: per Spark round, count pairs
    ONCE, take the top-``batch_k`` SYMBOL-DISJOINT pairs from the
    (count DESC, left, right) order, and apply them in ONE fold pass —
    a 32k-merge tokenizer trains in hundreds of rounds instead of 32k
    sequential jobs with a driver round-trip each.

    Returns (merges, n_rounds) with the same [(rank, left, right,
    pair_freq)] rows as :func:`bpe_train`.

    Exactness: within a round the accepted pairs are pairwise
    symbol-disjoint, so each one's count (and hence its rank and
    recorded frequency) is invariant under the others — the result is
    byte-identical to the serial algorithm whenever the pairs a round
    batches are non-interacting, i.e. no pair CREATED by an accepted
    merge (one containing the new merged symbol) would have out-ranked
    a later accepted pair. On natural-language corpora that inversion
    is rare (a created pair's count is bounded by its parent's and
    real pair-count distributions fall fast); where it happens the
    batch result is the standard scalable BPE approximation. For exact
    parity with the reference oracle use ``bpe_train`` (batch_k=1
    semantics), which this module keeps as the default path.
    """
    wt, base = _word_table(docs, text_col, max_words)
    live = _initial_symbols(wt).localCheckpoint()
    base.unpersist()
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        want = min(batch_k, n_merges - len(merges))
        head = (
            _pair_counts(live)
            .orderBy(F.col("n").desc(), F.col("left").asc(), F.col("right").asc())
            # bounded driver cost: enough rows that skipped (conflicting)
            # pairs don't starve the batch, never the full pair table
            # (8x: at 4x the disjointness filter exhausted the head at
            # ~19 accepted/round; 8x sustains ~25+ at the same O(K)
            # driver footprint)
            .limit(max(8 * want, 64))
            .collect()
        )
        picked = _select_disjoint(head, want, min_pair_freq)
        if not picked:
            break
        rounds += 1
        for l, r, n in picked:
            merges.append((len(merges), l, r, n))
        live = _apply_merge_batch(live, [(l, r) for l, r, _ in picked])
        # one full pass per round -> checkpoint each round keeps lineage flat
        live = live.localCheckpoint()
        log.info("bpe batch round %d: accepted %d pairs (%d/%d merges)",
                 rounds, len(picked), len(merges), n_merges)
    log.info("bpe_train_batch: %d merges in %d Spark rounds (batch_k=%d)",
             len(merges), rounds, batch_k)
    return merges, rounds


def bpe_train(
    docs: DataFrame,
    n_merges: int = 60,
    text_col: str = "text",
    max_words: int = 1_000_000,
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [(rank, left, right, pair_freq)] in merge order. Deterministic:
    argmax tie-break is (count DESC, left ASC, right ASC). Stops early
    when no pair reaches ``min_pair_freq``."""
    wt, base = _word_table(docs, text_col, max_words)
    sym = _initial_symbols(wt).cache()
    sym.count()  # materialize once; each round folds in place
    base.unpersist()
    merges: list[tuple[int, str, str, int]] = []
    live = sym
    for rank in range(n_merges):
        top = (
            _pair_counts(live)
            .orderBy(F.col("n").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_freq:
            break
        l, r, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        merges.append((rank, l, r, n))
        live = _apply_merge(live, l, r)
        if (rank + 1) % checkpoint_every == 0:
            live = live.localCheckpoint()  # flat lineage across rounds
    sym.unpersist()
    return merges


def bpe_vocab(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    max_words: int = 1_000_000,
    checkpoint_every: int = 8,
) -> DataFrame:
    """The vocabulary the learned merges induce on the corpus: replay
    every merge over the word-frequency table (chained JVM folds,
    lineage truncated periodically), then explode the final symbol
    arrays and sum word frequencies per symbol. Returns (token,
    n_occurrences) — the table a sampling-aware loader or a coverage
    audit reads."""
    wt, base = _word_table(docs, text_col, max_words)
    sym = _initial_symbols(wt).localCheckpoint()  # materialize; frees base
    base.unpersist()
    for k, (rank, l, r, _n) in enumerate(merges):
        sym = _apply_merge(sym, l, r)
        if (k + 1) % checkpoint_every == 0:
            sym = sym.localCheckpoint()
    return (
        sym.select(F.explode("symbols").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("n_occurrences"))
    )


def bpe_vocab_serial(texts: Iterable[str], merges) -> dict[str, int]:
    """Serial twin of bpe_vocab (oracle)."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in re.split(_WORD_SPLIT, (t or "").lower()):
            if w:
                wf[w] += 1
    words = {tuple(list(w[:-1]) + [w[-1] + "</w>"]): c for w, c in wf.items()}
    for _rank, l, r, _n in merges:
        nxt: dict = {}
        for syms, c in words.items():
            out, pend = [], None
            for x in syms:
                if pend == l and x == r:
                    out.append(l + r)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        words = nxt
    vocab: Counter = Counter()
    for syms, c in words.items():
        for s in syms:
            vocab[s] += c
    return dict(vocab)


def bpe_train_serial(texts: Iterable[str], n_merges: int = 60, min_pair_freq: int = 2):
    """Independent serial reference (the oracle): same published
    algorithm, plain Python dicts, no Spark. Must agree with bpe_train
    exactly (same pre-tokenization, </w> convention, tie-break)."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in re.split(_WORD_SPLIT, (t or "").lower()):
            if w:
                wf[w] += 1
    words = {tuple(list(w[:-1]) + [w[-1] + "</w>"]): c for w, c in wf.items()}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_pair_freq:
            break
        merges.append((rank, l, r, n))
        nxt = {}
        for syms, c in words.items():
            out, pend = [], None
            for x in syms:
                if pend == l and x == r:
                    out.append(l + r)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        words = nxt
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, best-rank-first (the canonical
    BPE encode loop). Shared by the pandas UDF and the serial oracle."""
    syms = list(word[:-1]) + [word[-1] + "</w>"] if word else []
    while len(syms) >= 2:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best, best_rank = i, rk
        if best is None:
            break
        syms[best : best + 2] = [syms[best] + syms[best + 1]]
    return syms


def bpe_encode_counts(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token count under the learned merges — the
    budget/packing statistic pipelines need. Arrow-batched mapInPandas;
    the merge table rides the closure (broadcast by Spark's task
    serialization — it is vocabulary-sized, never corpus-sized)."""
    import re

    ranks = {(l, r): rank for rank, l, r, _ in merges}
    split = re.compile(_WORD_SPLIT)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            counts = []
            for t in pdf[text_col]:
                n = 0
                for w in split.split((t or "").lower()):
                    if not w:
                        continue
                    c = cache.get(w)
                    if c is None:
                        c = len(encode_word(w, ranks))
                        cache[w] = c
                    n += c
                counts.append(n)
            yield pd.DataFrame({id_col: pdf[id_col], "n_bpe_tokens": counts})

    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, n_bpe_tokens long"
    )
