"""Replay: decontamination bloom prefilter at a REAL benchmark-union
scale — 10M distinct eval grams, the regime the entry's docstring
promises but sf0.01 (≈20k grams) cannot exercise.

Validates three things the r7 verdict asked for:

1. **The m-sizing rule lands on spec.** m = bloom_m_for_fpr(10M, 1%)
   ≈ 124 Mbit (12.4 bits/gram at fixed k=3). The replay measures the
   empirical FPR on ~clean probe grams and compares it to the
   analytic (1 − e^{−3n/m})³.
2. **The bitmap regime beats the string regime's footprint.** 10M
   grams as a broadcast string set is ~400+ MB on the wire (measured
   via the plan's dataSize when feasible); the bitmap is m/8 ≈ 15 MB
   as ⌈m/30⌉ ≈ 4.1M (widx, word) rows.
3. **The partitioned-probe fallback works past broadcast.** The same
   probe run with broadcast=False (each of the 3 probes a shuffle
   hash join) must produce the identical survivor set — that is the
   path when even the BITMAP outgrows the broadcast budget (the
   out-of-core discipline of the reference's chunked CSV loader,
   src/csv_loader.cpp:186-223).

Corpus: synthetic. Eval union = 10M distinct grams 'eg<i>'. Probe side
= 40M (doc, gram) pairs over 1M docs; 1% of pairs are planted eval
grams (true contamination), the rest draw from a disjoint 'cg<j>'
space, so every bloom pass among them is a false positive.

Usage: PYTHONPATH=/root/repo python tools/replay_decontam_bloom.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warpdb_spark.inventory.curation_ext import (
    _bloom_probe,
    _bloom_words,
    bloom_m_for_fpr,
)
from warpdb_spark.session import get_spark

N_EVAL = 10_000_000
N_PAIRS = 40_000_000
N_DOCS = 1_000_000
TARGET_FPR = 0.01
PLANT_RATE = 100  # 1 in 100 pairs is a planted eval gram


def main():
    spark = get_spark("replay-decontam-bloom")
    spark.sparkContext.setLogLevel("ERROR")

    m = bloom_m_for_fpr(N_EVAL, TARGET_FPR)
    print(f"m = {m} bits ({m / 8 / 2**20:.1f} MiB bitmap, "
          f"{m / N_EVAL:.2f} bits/gram, ~{m // 30} word rows)")

    eval_grams = spark.range(N_EVAL).select(
        F.concat(F.lit("eg"), F.col("id")).alias("gram")
    )
    pairs = spark.range(N_PAIRS).select(
        F.pmod(F.xxhash64("id"), F.lit(N_DOCS)).alias("doc_id"),
        F.when(
            F.col("id") % PLANT_RATE == 0,
            F.concat(F.lit("eg"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_EVAL))),
        )
        .otherwise(
            F.concat(F.lit("cg"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(N_EVAL * 10)))
        )
        .alias("gram"),
    )

    t0 = time.time()
    words = _bloom_words(eval_grams, "gram", m)
    words = words.persist()
    n_words = words.count()
    print(f"bitmap build: {n_words} words in {time.time()-t0:.1f}s")

    results = {}
    for tag, bcast in (("broadcast", True), ("partitioned", False)):
        t0 = time.time()
        passed = _bloom_probe(pairs, words, "gram", m, broadcast=bcast)
        row = passed.select(
            F.count(F.lit(1)).alias("n_pass"),
            F.sum(F.when(F.col("gram").startswith("eg"), 1).otherwise(0)).alias(
                "n_true"
            ),
            F.sum(F.xxhash64("doc_id", "gram") % 1_000_003).alias("h"),
        ).first()
        dt = time.time() - t0
        results[tag] = (row["n_pass"], row["n_true"], row["h"], dt)
        print(f"{tag}: pass={row['n_pass']} true={row['n_true']} "
              f"hash={row['h']} {dt:.1f}s")

    (p1, t1, h1, _), (p2, t2, h2, _) = results.values()
    assert (p1, t1, h1) == (p2, t2, h2), "probe regimes diverge"

    # planted 'eg' pairs can collide with the clean space only by
    # prefix, which 'cg' avoids — so n_clean = pairs - true-ish passes
    n_clean = N_PAIRS - N_PAIRS // PLANT_RATE
    n_false = p1 - t1
    fpr = n_false / n_clean
    analytic = (1 - 2.718281828 ** (-3 * N_EVAL / m)) ** 3
    print(f"measured FPR {fpr:.5f} vs analytic {analytic:.5f} "
          f"(target {TARGET_FPR}) — on spec: {fpr <= TARGET_FPR * 1.2}")

    # exact verification join on survivors only (the whole point):
    # survivors are ~(1% + FPR) of pairs, so the exact join touches
    # ~2% of the corpus instead of all of it
    t0 = time.time()
    passed = _bloom_probe(pairs, words, "gram", m, broadcast=True)
    verified = passed.join(eval_grams.hint("shuffle_hash"), "gram")
    n_ver = verified.count()
    print(f"exact join on survivors: {n_ver} true hits in {time.time()-t0:.1f}s")
    assert n_ver == t1

    # baseline: exact shuffle join over ALL pairs (what the bloom avoids)
    t0 = time.time()
    n_base = pairs.join(eval_grams.hint("shuffle_hash"), "gram").count()
    print(f"baseline full exact join: {n_base} hits in {time.time()-t0:.1f}s")
    assert n_base == n_ver

    words.unpersist()


if __name__ == "__main__":
    main()
