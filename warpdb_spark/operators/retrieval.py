"""Materialized inverted index + BM25 query — the persistent-index
counterpart of the ad-hoc scoring in ``inventory/retrieval_ops.py``
(superset; the reference has no text-retrieval facilities).

At 100 TB you do not re-explode the corpus per query: the postings
list ``(term, doc_id, tf, dl)`` and the one-row corpus stats are built
ONCE (one tokenize scan + one (doc, term) shuffle), written bucketed
on ``term``, and every query is then a broadcast semi-join of its
terms against the index — the scan touches only the queried terms'
buckets, no corpus access at all.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(postings, stats): postings = (term, doc_id, tf, dl) for every
    (document, term); stats = one row (n_docs, avgdl). One corpus scan,
    one partial-aggregated (doc, term) shuffle."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__toks")).select(
        "doc_id", F.size("__toks").alias("dl"), "__toks"
    )
    postings = (
        base.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return postings, stats


def write_index(
    postings: DataFrame,
    stats: DataFrame,
    path: str,
    num_buckets: int = 32,
) -> None:
    """Persist the index: postings bucketed on term (query joins then
    read only matching buckets, shuffle-free), stats as one parquet
    row."""
    (
        postings.write.mode("overwrite")
        .bucketBy(num_buckets, "term")
        .sortBy("term")
        .option("path", f"{path}/postings")
        .format("parquet")
        .saveAsTable(f"bm25_postings_{abs(hash(path)) % 10**8}")
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def bm25_query(
    postings: DataFrame,
    stats: DataFrame,
    terms: list[str],
    k: int = 20,
) -> DataFrame:
    """Top-k BM25 from a prebuilt index: filter postings to the query's
    terms (pushed to the scan — with a term-bucketed index this reads
    only those buckets), broadcast df-per-term and the stats row, one
    partial-aggregated per-doc sum, TakeOrdered top-k."""
    hit = postings.filter(F.col("term").isin(terms))
    dft = hit.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hit.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("w"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )
