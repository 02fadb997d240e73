"""Corpus-level text analytics: TF-IDF (SURVEY §7 Phase 3 "text
analysis" — TF-IDF named explicitly).

Implemented as plain DataFrame algebra (explode → counts → join), not
ml.feature's HashingTF, so terms stay inspectable and the result is
exactly verifiable against a SQL oracle. Scale shape: two shuffles
(term-frequency groupBy, document-frequency groupBy) + one broadcast
join of the df table (vocabulary-sized, small by Heaps' law relative
to the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warpdb_spark.functions import text as T


def term_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, term, tf) — lower-cased whitespace tokens."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(T.tokens(F.lower(F.col(text_col)))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, term, tf, df, tfidf) with the smoothed idf
    ``ln((N + 1) / (df + 1))``."""
    n_docs = docs.count()
    tf = term_frequencies(docs, id_col, text_col)
    df_tbl = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1.0))
    return tf.join(F.broadcast(df_tbl), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * idf, 6).alias("tfidf"),
    )


def top_terms(docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document (tfidf desc, term asc)."""
    scored = tfidf(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tfidf", "rank")
    )
