"""Shared synthetic replay corpora + honest materialization.

One definition of the on-cluster corpus generators (1M docs / 20M
orders / 20M events / 1M×64-dim embeddings) used by every replay
tool, so the corpora can't silently drift between tools (round 6's
first honest-replay script regenerated events with a different value
exponent than the curation replay — comparable in shape, but an
unmarked difference; this module is now the single source).

``force(df)`` is the honest way to time a DataFrame end-to-end:
xxhash64 over every column reduced with bit_xor. ``.count()`` is NOT
a replay — Catalyst prunes every column the count doesn't need,
which erased aggregate expressions wholesale and hid a live int64
overflow (PLANS.md round 6); and summing 20M full-range hashes
overflows int64 itself, hence bit_xor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
ORDER_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def force(df):
    """Fully materialize ``df`` (every column computed) and return the
    row count."""
    h = df.select(
        F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).alias("h")
    )
    return h.agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h")).collect()[0]["n"]


def build_documents(spark, out_dir: str, n_docs: int = 1_000_000):
    """n_docs docs, ~40 words each from a 30k hashed vocab."""
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id") * 41 + i), F.lit(30000)).cast("string"),
        ),
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
            F.concat(F.lit("l"), F.pmod(F.col("id"), F.lit(5)).cast("string")).alias(
                "lang"
            ),
            F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(20)).cast("string")).alias(
                "source"
            ),
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def build_orders(spark, out_dir: str, n_orders: int = 20_000_000):
    """n_orders rows with a heavy-ish value spread ($1k–$500k)."""
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.element_at(
            F.array(*[F.lit(p) for p in ORDER_PRIORITIES]),
            (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int"),
        ).alias("o_orderpriority"),
        (
            F.round(
                F.pow(F.pmod(F.xxhash64("id"), F.lit(100000)) / 100000.0 + 1e-6, 2.0)
                * 499000
                + 1000,
                2,
            )
        ).alias("o_totalprice"),
    )
    orders.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")


def build_lineitem(spark, out_dir: str, n_lines: int = 20_000_000,
                   n_orders: int = 5_000_000):
    """n_lines fact rows over n_orders order keys (testdata columns the
    bloom-prefilter entry reads; ~4 lines/order like TPC-H)."""
    lines = spark.range(n_lines).select(
        F.pmod(F.xxhash64(F.col("id") * 17), F.lit(n_orders)).alias("l_orderkey"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("l_returnflag"),
        F.round(
            F.pmod(F.xxhash64(F.col("id") * 23), F.lit(9500000)) / 100.0 + 900.0, 2
        ).alias("l_extendedprice"),
        (F.pmod(F.xxhash64(F.col("id") * 29), F.lit(11)) / 100.0).alias("l_discount"),
    )
    lines.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")


def build_events(spark, out_dir: str, n_events: int = 20_000_000,
                 n_users: int = 200_000):
    """n_events rows over n_users users, int64-ns ts (testdata layout)."""
    base_ns = 1_700_000_000_000_000_000
    events = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (F.lit(base_ns) + F.col("id") * 1_000_000_000).alias("ts"),
        F.pmod(F.xxhash64(F.col("id") * 7), F.lit(n_users)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in EVENT_TYPES]),
            (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        F.round(
            F.pow(F.pmod(F.xxhash64(F.col("id") * 13), F.lit(100000)) / 100000.0
                  + 1e-6, 3.0) * 560,
            2,
        ).alias("value"),
        F.lit("{}").alias("props"),
    )
    events.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def build_embeddings(spark, out_dir: str, n_vecs: int = 1_000_000, dim: int = 64):
    """n_vecs float[dim] vectors in [-1, 1] with an 8-way label."""
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("id") * 31 + i), F.lit(2001)) - 1000) / 1000.0
        ).cast("float"),
    )
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        F.pmod(F.col("id"), F.lit(8)).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def build_embeddings_clustered(spark, out_dir: str, n_vecs: int = 1_000_000,
                               dim: int = 64, n_clusters: int = 64,
                               noise: float = 0.12):
    """n_vecs float[dim] vectors drawn around n_clusters deterministic
    centers — the PRODUCTION embedding regime (real encoders emit
    clustered manifolds, not isotropic noise), the positive control the
    uniform corpus's honest-negative IVF/Lloyd readings beg for.
    center[c][i] in [-1, 1] from a hash of (c, i); each vector = its
    cluster's center + hash-noise in [-noise, +noise] per coordinate.
    All JVM-side expressions, fully deterministic (no rand())."""
    cluster = F.pmod(F.xxhash64(F.col("id") * 17), F.lit(n_clusters))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (F.pmod(F.xxhash64(cluster * 131 + i), F.lit(2001)) - 1000) / 1000.0
            + ((F.pmod(F.xxhash64(F.col("id") * 31 + i), F.lit(2001)) - 1000)
               / 1000.0) * noise
        ).cast("float"),
    )
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        cluster.cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
