"""TF/IDF corpus statistics + document vectorizer (SURVEY §2.5 #31).

Re-implements, from spec, the reference text-processing stack
(text_processing/src/tf_idf.rs, corpus.rs, vectorizer.rs) as pure
DataFrame aggregations — the formulas are copied EXACTLY, including
the reference's quirk that IDF's word_frequency is the word's TOTAL
occurrence count in the corpus (corpus.rs:102-110 increments per
occurrence), not its document frequency:

  Tf::Binary               1.0
  Tf::RawCount             c
  Tf::TermFrequency        c / sum(c) per doc
  Tf::LogNormalization     log10(c + 1)
  Tf::DoubleNormalization  0.5 + 0.5 * c / max(c) per doc
  Idf::Unary               1.0
  Idf::InverseDocumentFrequency        log10(N / wf)
  Idf::InverseDocumentFrequencySmooth  log10(N / (wf + 1)) + 1
  Idf::ProbabilisticInverseDocumentFrequency  (N - wf) / wf

(tf_idf.rs:183-214, :258-305). Everything is a JVM plan: one explode,
two aggregations, one broadcastable join on the word dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TF_KINDS = ("binary", "raw_count", "term_frequency", "log_normalization", "double_normalization")
IDF_KINDS = ("unary", "idf", "idf_smooth", "idf_probabilistic")


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, word) token occurrences — lowercased whitespace tokens (the
    same tokenization the oracle SQL replicates)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"),
        )
        .filter(F.col("word") != "")
    )


def corpus_stats(tok: DataFrame) -> DataFrame:
    """Per-word corpus statistics (corpus.rs CorpusStatisticsCollector):
    total occurrence count + document frequency. Broadcastable word
    dimension at any corpus size (vocabulary << rows)."""
    return tok.groupBy("word").agg(
        F.count("*").alias("word_frequency"),
        F.countDistinct("id").alias("doc_frequency"),
    )


def _tf_col(kind: str):
    c = F.col("c")
    if kind == "binary":
        return F.lit(1.0)
    if kind == "raw_count":
        return c.cast("double")
    if kind == "term_frequency":
        return c / F.sum("c").over(Window.partitionBy("id"))
    if kind == "log_normalization":
        return F.log10(c + 1.0)
    if kind == "double_normalization":
        return 0.5 + 0.5 * c / F.max("c").over(Window.partitionBy("id"))
    raise ValueError(f"unknown tf kind {kind!r}")


def _idf_col(kind: str, n_docs):
    wf = F.col("word_frequency")
    if kind == "unary":
        return F.lit(1.0)
    if kind == "idf":
        return F.log10(n_docs / wf)
    if kind == "idf_smooth":
        return F.log10(n_docs / (wf + 1.0)) + 1.0
    if kind == "idf_probabilistic":
        return (n_docs - wf) / wf
    raise ValueError(f"unknown idf kind {kind!r}")


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tf: str = "term_frequency",
    idf: str = "idf_smooth",
) -> DataFrame:
    """(id, word, tf, idf, tf_idf) per (document, word).

    Plan shape: explode -> groupBy(id, word) count (map-side partial)
    -> per-doc window for the normalizing TF variants -> join the
    (broadcastable) corpus word stats -> multiply. N (document count)
    is a scalar subexpression via a 1-row cross join, not a driver
    collect."""
    tok = tokens(df, text_col, id_col)
    counts = tok.groupBy("id", "word").agg(F.count("*").alias("c"))
    n_docs_df = df.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("_n_docs")
    )
    stats = corpus_stats(tok)
    out = (
        counts.withColumn("tf", _tf_col(tf))
        .join(F.broadcast(stats), on="word")
        .crossJoin(F.broadcast(n_docs_df))
        .withColumn("idf", _idf_col(idf, F.col("_n_docs")))
        .select("id", "word", "tf", "idf", (F.col("tf") * F.col("idf")).alias("tf_idf"))
    )
    return out


def vectorize_topk(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    tf: str = "term_frequency",
    idf: str = "idf_smooth",
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the sparse document vector of
    vectorizer.rs (VectorizedDocument.sparse_features), rank-ordered.
    Deterministic tie-break on the rounded weight then word."""
    w = tf_idf(df, text_col, id_col, tf, idf)
    rounded = F.floor(F.col("tf_idf") * 1e6 + 0.5 + 1e-9).cast("double") / 1e6
    win = Window.partitionBy("id").orderBy(rounded.desc(), F.col("word").asc())
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias("doc_id"),
            "word",
            rounded.alias("tf_idf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def cosine_pairs(vec_a: DataFrame, vec_b: DataFrame) -> DataFrame:
    """Cosine similarity between sparse (id, word, tf_idf) vectors
    (vectorizer.rs VectorizedDocument::cosine_sim): shuffle on word,
    dot products map-side combined."""
    a = vec_a.select(F.col("id").alias("ida"), "word", F.col("tf_idf").alias("wa"))
    b = vec_b.select(F.col("id").alias("idb"), "word", F.col("tf_idf").alias("wb"))
    dots = (
        a.join(b, on="word")
        .groupBy("ida", "idb")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = vec_a.groupBy(F.col("id").alias("ida")).agg(
        F.sqrt(F.sum(F.col("tf_idf") ** 2)).alias("na")
    )
    nb = vec_b.groupBy(F.col("id").alias("idb")).agg(
        F.sqrt(F.sum(F.col("tf_idf") ** 2)).alias("nb")
    )
    return (
        dots.join(na, on="ida")
        .join(nb, on="idb")
        .select("ida", "idb", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine"))
    )
