"""Scale replay for the bloom prefilter's post-broadcast regime.

The driver-checked entries run the bloom at the oracle scale (fixed
64 Kbit bitmap — always broadcastable). This replay exercises the
regime the partitioned sibling exists for: the build side sized so the
(widx, word) table itself is a multi-million-row distributed dataset
(≥4M build keys × 16 bits/key → 64M-bit bitmap → ~2.13M word rows,
~34 MB serialized — past the 10 MB autoBroadcast threshold and the
shape that at 1e9 keys becomes ~533M rows / ~8 GB). Asserts from the
EXECUTED plan that no BroadcastExchange appears anywhere on the bloom
path — the probes and the exactness join are ShuffledHashJoin — and
measures the prefilter's reduction with full materialization
(noop sink; the replay_scale_honest rule).

Usage: PYTHONPATH=/root/repo python tools/replay_bloom_partitioned.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warpdb_spark.session import get_spark
import warpdb_spark.inventory.curation_ext as cx

N_BUILD = 4_000_000  # dim keys folded into the bloom
N_FACT = 40_000_000  # probe rows, uniform over 100x the dim keys → ~1% match
M_BITS = 16 * N_BUILD  # 16 bits/key — FPR ≈ (1-e^{-3/16})^3 ≈ 0.5%


def _force(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    spark = get_spark("replay-bloom-partitioned")
    spark.sparkContext.setLogLevel("ERROR")

    # dim: 4M distinct keys spread over a 400M key space; fact: 40M
    # rows over the same space → ~1% expected true-match rate, so the
    # prefilter's reduction is visible and the FPR measurable
    dim = spark.range(0, N_BUILD, 1, 32).select(
        (F.col("id") * 100).alias("o_orderkey")
    )
    fact = spark.range(0, N_FACT, 1, 32).select(
        F.pmod(F.xxhash64("id"), F.lit(N_BUILD * 100)).alias("l_orderkey"),
        F.lit("N").alias("l_returnflag"),
        F.lit(100.0).alias("l_extendedprice"),
        F.lit(0.05).alias("l_discount"),
    )

    words = cx._bloom_words(dim, "o_orderkey", M_BITS)
    n_words = words.count()
    print(f"bitmap: {M_BITS} bits -> {n_words} word rows "
          f"(~{n_words * 16 / 1e6:.0f} MB as rows — not broadcastable)")

    filtered = cx._bloom_probe(
        fact, words, "l_orderkey", M_BITS, broadcast=False
    )
    joined = filtered.join(
        dim.hint("shuffle_hash"),
        filtered.l_orderkey == dim.o_orderkey,
        "left",
    )
    report = cx._bloom_report(joined)

    plan = report._jdf.queryExecution().executedPlan().toString()
    shj = plan.count("ShuffledHashJoin")
    bce = plan.count("BroadcastExchange")
    print(f"plan: ShuffledHashJoin x{shj}, BroadcastExchange x{bce}")
    assert shj >= cx._BLOOM_K + 1, "probes must be shuffle hash joins"
    assert bce == 0, "bloom path must not broadcast at this scale"

    # ONE timed execution: collecting the 1-row rollup materializes the
    # whole path (it is an aggregate — nothing prunes), so a separate
    # noop force would just run the 40M-row pipeline a second time
    t0 = time.time()
    row = report.agg(
        F.sum("n_bloom_pass").alias("p"), F.sum("n_matched").alias("m")
    ).collect()[0]
    dt = time.time() - t0
    n_pass, n_match = row["p"], row["m"]
    fpr = (n_pass - n_match) / max(N_FACT - n_match, 1)
    print(
        f"full bloom path at {N_BUILD} build keys / {N_FACT} fact rows: "
        f"{dt:.1f}s; bloom passed {n_pass} ({n_pass / N_FACT:.2%} of fact), "
        f"true matches {n_match}, measured FPR {fpr:.3%}"
    )

    # same strategy, production hash: xxhash64 positions (codegen'd,
    # no md5 hex-string round-trip) — what you'd ship when the oracle
    # replay constraint doesn't apply
    words_xx = cx._bloom_words(dim, "o_orderkey", M_BITS,
                               hash_fn=cx._bloom_xxhash_u32)
    filtered_xx = cx._bloom_probe(fact, words_xx, "l_orderkey", M_BITS,
                                  broadcast=False,
                                  hash_fn=cx._bloom_xxhash_u32)
    joined_xx = filtered_xx.join(
        dim.hint("shuffle_hash"),
        filtered_xx.l_orderkey == dim.o_orderkey,
        "left",
    )
    dt_xx = _force(cx._bloom_report(joined_xx))
    print(f"same path with xxhash64 positions: {dt_xx:.1f}s "
          f"(md5 portability tax: {dt / max(dt_xx, 1e-9):.1f}x)")

    # contrast: the exact join without the prefilter shuffles ALL fact
    plain = fact.join(
        dim.hint("shuffle_hash"), fact.l_orderkey == dim.o_orderkey, "left"
    )
    plain_report = plain.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNotNull(), 1).otherwise(0)).alias(
            "n_matched"
        ),
    )
    dt_plain = _force(plain_report)
    print(f"exact join with NO prefilter: {dt_plain:.1f}s "
          f"(prefilter cuts the exactness-join input to {n_pass / N_FACT:.2%})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
