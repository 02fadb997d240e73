"""ANN recall gates at production scale: 1M x 64-dim vectors.

The driver-checked entries (`similarity_ann_recall`,
`similarity_ivf_recall`) gate index settings at oracle scale. This
replay runs the SAME gate logic at 1M x 64 — the scale where the index
choice actually matters — and prints the go/no-go table: recall@5 of
IVF (num_lists=256, nprobe in {8, 32, 96}) against the exact brute-force
top-5 for 20 queries, with full-materialization timing for each leg
(the replay_scale_honest rule).

Two corpora (r10): ``uniform`` — isotropic hash vectors, the
ADVERSARIAL case for any partition-based index (the r9 honest-negative
readings: IVF ceiling 0.66, Lloyd +0.01); ``clustered`` — 64
hash-Gaussian clusters, the PRODUCTION regime real encoders emit,
where IVF pruning and Lloyd refinement are supposed to pay. Running
both gives the go/no-go table its two columns: thresholds are judged
against the clustered (production) column, with the uniform column as
the worst-case floor.

Usage: PYTHONPATH=/root/repo python tools/replay_ann_recall.py [uniform|clustered|both]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warpdb_spark.session import get_spark
import warpdb_spark.operators.similarity as S
from tools import replay_corpus as rc

OUT = "/tmp/replay_ann_corpus"
OUT_CLUSTERED = "/tmp/replay_ann_corpus_clustered"


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which not in ("uniform", "clustered", "both"):
        print(f"unknown corpus {which!r}: expected uniform|clustered|both")
        return 2
    spark = get_spark("replay-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    rcode = 0
    for corpus in ("uniform", "clustered"):
        if which not in (corpus, "both"):
            continue
        print(f"=== corpus: {corpus} ===")
        rcode |= run_suite(spark, corpus)
    return rcode


def run_suite(spark, corpus: str) -> int:
    out = OUT if corpus == "uniform" else OUT_CLUSTERED
    t0 = time.time()
    os.makedirs(out, exist_ok=True)
    if not os.path.isdir(f"{out}/embeddings.parquet"):
        if corpus == "uniform":
            rc.build_embeddings(spark, out)
        else:
            rc.build_embeddings_clustered(spark, out)
    emb = spark.read.parquet(f"{out}/embeddings.parquet")
    n = emb.count()
    print(f"corpus: {n} x 64 vectors ({time.time()-t0:.1f}s)")

    queries = emb.filter(F.col("vec_id") < 20)
    t0 = time.time()
    exact = (
        S.cosine_topk_np(emb, queries, k=5, id_col="vec_id", vec_col="embedding")
        .select("query_id", "neighbor_id")
        .persist()
    )
    exact.count()
    t_exact = time.time() - t0
    print(f"exact brute-force top-5 (20 queries x {n}): {t_exact:.1f}s")

    for nprobe in (8, 32, 96):
        t0 = time.time()
        ap = S.ivf_topk(
            emb, queries, k=5, num_lists=256, nprobe=nprobe
        ).select("query_id", "neighbor_id")
        hits = (
            exact.join(F.broadcast(ap), ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = {r["query_id"]: r["n"] for r in hits.collect()}
        dt = time.time() - t0
        recalls = [rows.get(q, 0) / 5.0 for q in range(20)]
        mean_r = sum(recalls) / len(recalls)
        n_go = sum(1 for r in recalls if r >= 0.8)
        print(
            f"IVF lists=256 nprobe={nprobe}: {dt:.1f}s, "
            f"mean recall@5 {mean_r:.2f}, go (>=0.8) {n_go}/20, "
            f"scanned ~{nprobe / 256:.1%} of corpus per query"
        )
    exact.unpersist()

    # IVFPQ leg (L2 metric — scored against the exact L2 top-5, not
    # the cosine table above): the composed index scans nprobe/256 of
    # the CODES (16 bytes/vector vs 256 raw), then reranks 20 exact
    t0 = time.time()
    from pyspark.sql import Window

    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )
    pairs = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cv")
    ).crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    dist = F.round(
        F.aggregate(
            F.zip_with(
                "__cv", "__qv",
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    exact_l2 = (
        pairs.select("query_id", "neighbor_id", dist.alias("dist2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id")
        .persist()
    )
    exact_l2.count()
    t_l2 = time.time() - t0
    print(f"exact L2 top-5 (20 queries x {n}, HOF fold): {t_l2:.1f}s")
    # (nprobe, n_codes, train_iters, rerank_factor): the entry's
    # oracle-scale params (32 codes, init-only — too coarse at 1M,
    # the honest reading below) vs the production FAISS-default 8-bit
    # codebooks + deeper rerank, with and without Lloyd refinement
    for nprobe, n_codes, it, rf, res in (
        (8, 32, 0, 4, False),
        (32, 32, 0, 4, False),
        (32, 256, 0, 10, False),
        (32, 256, 2, 10, False),
        # TRUE IVFADC (r10): residual encoding — the FAISS default.
        # On clustered corpora raw-vector PQ collapses (codes are
        # cluster ids, not neighbors); residuals quantize the
        # within-cluster offsets the ranking depends on.
        (8, 32, 0, 4, True),
        (32, 256, 0, 10, True),
        (32, 256, 2, 10, True),
    ):
        t0 = time.time()
        ap = S.ivfpq_topk(
            emb, queries, k=5, num_lists=256, nprobe=nprobe,
            m_subs=16, n_codes=n_codes, train_iters=it, rerank_factor=rf,
            residual=res,
        ).select("query_id", "neighbor_id")
        hits = (
            exact_l2.join(F.broadcast(ap), ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = {r["query_id"]: r["n"] for r in hits.collect()}
        dt = time.time() - t0
        recalls = [rows.get(qq, 0) / 5.0 for qq in range(20)]
        mean_r = sum(recalls) / len(recalls)
        n_go = sum(1 for r in recalls if r >= 0.8)
        print(
            f"IVFPQ lists=256 nprobe={nprobe} m=16 codes={n_codes} "
            f"iters={it} rf={rf} residual={res}: {dt:.1f}s, "
            f"mean recall@5 {mean_r:.2f}, "
            f"go (>=0.8) {n_go}/20, code scan ~{nprobe / 256:.1%} of a "
            f"{'16x' if n_codes == 32 else '13x'}-compressed corpus"
        )
    exact_l2.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
