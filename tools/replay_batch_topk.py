"""Scale replay for the r11 distributed-query search paths.

Usage: python tools/replay_batch_topk.py [n_corpus] [n_queries] [dim]
Defaults: 200_000 corpus vectors x 20_000 queries x 64 dims — 20x the
MAX a sane driver collect should carry per the old ``max_queries``
discipline, and 40x the sf0.1 embeddings table.

What it pins (the r10 verdict's "Done =" for item 5, at scale):

1. ``cosine_topk_blocked`` completes the 200k x 20k exact batch with
   NO driver collect of query vectors (the query frame never leaves
   the executors) and its result agrees ROW-FOR-ROW with
   ``cosine_topk_np`` on a 500-query sample of the same corpus.
2. ``ivfpq_topk_batch`` (residual IVFADC) completes the same batch
   against a 256-list index and agrees row-for-row with the collected
   ``ivfpq_topk`` on the sample.
3. Wall-clock per stage is printed so regressions are visible round
   over round (PLANS.md records the reference run).

Synthetic corpus: clustered Gaussians (the production embedding
regime — the case that exposed the r10 all-zero-residual-codebook
defect), deterministic seed, built executor-side via mapInArrow so the
replay itself doesn't driver-materialize the corpus.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_corpus(spark, n: int, dim: int, n_clusters: int, seed: int, name: str):
    """(vec_id, embedding) clustered-Gaussian frame, generated inside
    the executors (one numpy RNG per id-range slice, seeded by the
    slice, so the frame is deterministic AND never driver-resident)."""
    import pandas as pd
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            if len(ids) == 0:
                continue
            rng = np.random.default_rng(seed + int(ids[0]))
            centers = np.random.default_rng(seed).standard_normal((n_clusters, dim))
            vecs = centers[ids % n_clusters] + 0.05 * rng.standard_normal(
                (len(ids), dim)
            )
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame({"vec_id": ids, "embedding": list(vecs.astype(np.float32))})
            )

    return (
        spark.range(0, n, 1, 32)
        .mapInArrow(gen, "vec_id long, embedding array<float>")
        .persist()
    )


def main() -> int:
    from pyspark.sql import functions as F

    from warpdb_spark.operators import similarity as S
    from warpdb_spark.session import get_spark

    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("replay-batch-topk")

    corpus = build_corpus(spark, n_corpus, dim, n_clusters=64, seed=7, name="corpus")
    corpus.count()
    queries = corpus.filter(F.col("vec_id") % (n_corpus // n_queries) == 0)
    nq = queries.count()
    print(f"corpus {n_corpus} x {dim}d, queries {nq}")

    # spy that the query frame never collects (concrete classic class)
    from pyspark.sql.classic.dataframe import DataFrame

    collected_plans: list[str] = []
    orig_collect = DataFrame.collect

    def spy(self):
        collected_plans.append(self._jdf.queryExecution().analyzed().toString())
        return orig_collect(self)

    DataFrame.collect = spy
    try:
        t0 = time.perf_counter()
        blocked = S.cosine_topk_blocked(corpus, queries, k=5)
        blocked.write.format("noop").mode("overwrite").save()
        t_blocked = time.perf_counter() - t0

        t0 = time.perf_counter()
        ivfb = S.ivfpq_topk_batch(
            corpus, queries, k=5, num_lists=256, nprobe=8, m_subs=8,
            n_codes=64, train_iters=1, rerank_factor=4, seed=42, residual=True,
        )
        ivfb.write.format("noop").mode("overwrite").save()
        t_ivfpq = time.perf_counter() - t0
    finally:
        DataFrame.collect = orig_collect
    # legal collects are corpus-BOUNDED index state: the md5-ordered
    # GlobalLimit pulls (centroids, PQ init seeds) and the Lloyd
    # codebook-update Aggregate ((sub, code, dim) grouping = m x K x d
    # rows). Anything else — in particular a plain query-frame scan —
    # is an unbounded driver collect and fails the replay.
    bad = [
        p
        for p in collected_plans
        if not p.startswith(("GlobalLimit", "Aggregate"))
    ]
    print(f"collects during batch runs: {len(collected_plans)} "
          f"(all index-bounded: {not bad})")
    if bad:
        print("FAIL: unbounded driver collect detected:")
        print(bad[0][:400])
        return 1

    # agreement on a sample vs the collected paths
    sample = corpus.filter(F.col("vec_id") % (n_corpus // 500) == 0)
    a = sorted(map(tuple, S.cosine_topk_np(corpus, sample, k=5).collect()))
    b = sorted(map(tuple, S.cosine_topk_blocked(corpus, sample, k=5).collect()))
    exact_ok = a == b
    kw = dict(k=5, num_lists=256, nprobe=8, m_subs=8, n_codes=64,
              train_iters=1, rerank_factor=4, seed=42, residual=True)
    c = sorted(map(tuple, S.ivfpq_topk(corpus, sample, **kw).collect()))
    d = sorted(map(tuple, S.ivfpq_topk_batch(corpus, sample, **kw).collect()))
    ivf_ok = c == d
    print(f"blocked==np on 500-sample: {exact_ok} ({len(a)} rows); "
          f"ivfpq batch==collected: {ivf_ok} ({len(c)} rows)")

    # r12 (r11 verdict item 1): at a list count BELOW the scan
    # partition count the _subchunk split must ENGAGE (derived chunks
    # = ceil(partitions / num_lists) > 1), appear in the plan as the
    # (__list, __ck) cogroup key, and stay row-identical to the
    # unchunked cogroup — the scale shape where one pandas worker
    # would otherwise hold 1/num_lists of the corpus forever.
    kw16 = dict(k=5, num_lists=16, nprobe=4, m_subs=8, n_codes=64,
                train_iters=1, rerank_factor=4, seed=42, residual=True)
    derived = S._derive_chunks(corpus, 16)
    chunked_df = S.ivfpq_topk_batch(corpus, sample, **kw16)
    plan = chunked_df._jdf.queryExecution().optimizedPlan().toString()
    plan_ok = "__ck" in plan
    e = sorted(map(tuple, chunked_df.collect()))
    f_ = sorted(map(tuple, S.ivfpq_topk_batch(corpus, sample, num_chunks=1, **kw16).collect()))
    chunk_ok = derived > 1 and plan_ok and e == f_
    print(f"subchunk engages at 16 lists: derived={derived} (>1), "
          f"__ck in plan: {plan_ok}, chunked==unchunked: {e == f_} "
          f"({len(e)} rows)")

    print(f"wall: cosine_topk_blocked {t_blocked:.1f}s, "
          f"ivfpq_topk_batch {t_ivfpq:.1f}s at {n_corpus}x{nq}")
    return 0 if (exact_ok and ivf_ok and chunk_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
