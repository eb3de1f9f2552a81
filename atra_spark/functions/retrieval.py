"""Full-text retrieval over the crawled corpus: inverted postings and
BM25 ranking.

The reference computes TF-IDF corpus statistics over crawled text
(``atra/src/toolkit`` vectorizer; see ``functions/tfidf.py`` for the
direct twin). This module adds the retrieval pass a production system
runs ON those statistics — Okapi BM25 (Lucene's variant: idf =
ln(1 + (N - df + 0.5)/(df + 0.5)), so weights are always positive) —
as pure DataFrame aggregation, no UDFs anywhere.

100 TB posture:
- document lengths and corpus stats are ONE map-side-combined
  aggregation over the token stream (algebraic: count/avg);
- the query-term postings are filtered BEFORE any shuffle — the
  ``isin`` literal predicate prunes the exploded token stream to the
  handful of query terms, so the per-term tf aggregation shuffles only
  matching occurrences, never the corpus;
- per-term document frequencies are a few rows — broadcast back;
- the final score is a sum over (doc, term) rows joined to the (tiny)
  idf relation and the narrow (doc, dl) relation, one shuffle keyed on
  the doc id; top-k is a global TakeOrdered (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_lengths(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, dl): whitespace token count per document — the BM25 length
    normalizer. Pure column math, no explode needed."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    dl = F.size(F.filter(toks, lambda t: t != F.lit("")))
    return df.select(F.col(id_col).alias("id"), dl.cast("double").alias("dl"))


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-words query.

    score(d) = sum over query terms t of
      idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1 - b + b*dl(d)/avgdl))

    Deterministic tie-break: score DESC, doc_id ASC. Returns
    (doc_id, score) with exactly ``min(k, matching docs)`` rows.
    """
    terms = sorted(set(t.lower() for t in query_terms))
    lengths = doc_lengths(df, text_col, id_col)
    stats = lengths.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.col("tok").isin(terms))
    tf = toks.groupBy("id", "tok").agg(F.count("*").cast("double").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))

    idf = (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "tok",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
            "avgdl",
        )
    )
    scored = (
        tf.join(F.broadcast(idf), on="tok")
        .join(lengths, on="id")
        .select(
            "id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
        .groupBy("id")
        .agg(F.sum("term_score").alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("id"))
        .limit(int(k))
        .select(F.col("id").alias("doc_id"), "score")
    )
