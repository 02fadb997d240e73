"""Replay: cross-modal corroboration fires at 1M docs on PLANTED dups.

The r7 cross-modal replay honestly reported ZERO verdict rows at 1M:
the base corpus plants no text near-dups, and the fixture blob
formulas draw from only 25 base patterns, so at 1M docs every
image/audio LSH bucket exceeds the cap and is dropped wholesale. That
proved the caps; it could not prove the >=2-modality corroboration
path. This replay proves it:

- documents = the shared 1M-doc corpus + ~991 planted clones
  (doc_id % 1009 == 0, clone id = doc_id + 10,000,000, text copied
  verbatim) — the clone set of `dedup_cross_modal_planted`, at scale.
- text leg: the REAL entry (dedup_minhash_lsh with the planted frame
  injected) — identical texts are the only text near-dups by
  construction (the builder hashes a unique 40-word doc per id).
- image/audio legs: the entries' banding/cap/verify machinery (the
  shared capped generator, the same band layouts and hamming
  thresholds, bit_count verify) over fingerprints with REALISTIC
  entropy — hash-random bits per base pattern + sparse per-doc noise
  (see _bit_hash for why the sf0.01 quadratic fixture formulas cannot
  be diversified: their difference terms collapse mod 256 at any base
  modulus). The clone offset is ≡ 0 (mod BASE_MOD), so a clone keeps
  its base in both fingerprints and differs only in noise. The codec
  round-trip and exact fixture formulas are oracle-checked at sf0.01;
  the candidate/cap/fusion behavior at 1M is the question here.
- fusion: the SAME fuse_modalities the entries use.

Pass criteria: every planted clone doc gets a verdict row, and >= 95%
of them are CORROBORATED (>= 2 modalities on some pair).

Usage: PYTHONPATH=/root/repo python tools/replay_cross_modal_planted.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools import replay_corpus as rc
from warpdb_spark.inventory.pipeline_ops import dedup_minhash_lsh, fuse_modalities
from warpdb_spark.operators.dedup import capped_key_pairs
from warpdb_spark.session import get_spark

OUT = "/tmp/replay_r8_cross_modal"
PLANT_MOD = 1009
OFFSET = 10_000_000
# Diversified from the fixture's 25: with BASE_MOD = n_docs each doc
# owns its base pattern and ONLY its planted clone shares it (the
# offset is ≡ 0 mod BASE_MOD) — band buckets hold ~15 random 16-bit
# collisions instead of 10 base-mates + collisions, which at 1M docs
# is the difference between ~30M and ~1B candidate pairs.
BASE_MOD = 1_000_000


def _bit_hash(docs, nbits: int, flip_mod: int, seed: int):
    """Fingerprint with REALISTIC entropy: bit j of doc d is
    xxhash(seed, base(d), j) & 1, XOR a sparse per-doc noise flip when
    (d*13 + j) % flip_mod == 0. Same-base docs (a clone and its
    original) differ only in their noise flips — a small hamming
    distance — while distinct bases are independent coin flips
    (expected hamming nbits/2). Why not the entries' quadratic pixel
    formulas with a widened base? Their difference terms collapse mod
    256, leaving ~256 effective classes at ANY base modulus — at 1M
    docs that is ~1M genuine near-dup pairs (measured: 950k, 319s),
    a property of the sf0.01 fixture family, not of banding. The
    fingerprint FORMULAS are oracle-checked at sf0.01; what must be
    proven at 1M is the banding/cap/verify/fusion machinery, which
    needs realistic hash entropy."""
    d = F.col("doc_id")
    base = d % BASE_MOD
    bits = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(nbits - 1)),
            lambda j: (
                (F.xxhash64(F.lit(seed), base, j) % 2 + 2) % 2
                + F.when((d * 13 + j) % flip_mod == 0, 1).otherwise(0)
            )
            % 2,
        ),
        "",
    )
    return docs.select("doc_id", bits.alias("bits"))


def _image_hash(docs):
    """64-bit image-fingerprint stand-in, ~0.7 noise flips per doc —
    clone pairs land at hamming <= ~2 (threshold 6). Noise density is
    the banding-recall knob: at ~2 flips/doc the deterministic spread
    puts a flip in most 16-bit bands and equality-banding recall drops
    to ~26% (measured) — the same recall physics the entries' 4-band
    Hamming LSH has, just exercised at 1M."""
    return _bit_hash(docs, 64, 97, seed=7)


def _audio_hash(docs):
    """31-bit audio-fingerprint stand-in, ~0.25 noise flips per doc —
    clone pairs land at hamming <= ~1 (threshold 2)."""
    return _bit_hash(docs, 31, 127, seed=11)


def _hamming_pairs(hashed, bands, max_h):
    """Band on substrings (capped generator, cap 100 like the entries),
    verify by exact hamming. At 1M docs a 16-bit band space yields
    ~15 random collisions per bucket, so the capped generator emits
    ~tens of millions of candidates — the verify must be codegen'd:
    the bit string folds into two 32-bit longs and hamming is
    bit_count(xor), not a per-character loop (the first cut of this
    replay spent >9 min in an interpreted 64-step substr aggregate)."""
    keyed = hashed.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(F.lit(f"{bi}|"), F.substring("bits", lo, ln))
                    for bi, (lo, ln) in enumerate(bands)
                ]
            )
        ).alias("key"),
    )
    packed = hashed.select(
        "doc_id",
        F.coalesce(F.conv(F.substring("bits", 1, 32), 2, 10).cast("long"), F.lit(0)).alias("h1"),
        # a <33-bit fingerprint has an empty upper half -> conv('') is
        # NULL/0 depending on engine mood; pin it to 0
        F.coalesce(F.conv(F.substring("bits", 33, 32), 2, 10).cast("long"), F.lit(0)).alias("h2"),
    )
    pairs = capped_key_pairs(keyed, max_bucket_size=100)
    a = packed.select(
        F.col("doc_id").alias("id_a"),
        F.col("h1").alias("a1"),
        F.col("h2").alias("a2"),
    )
    b = packed.select(
        F.col("doc_id").alias("id_b"),
        F.col("h1").alias("b1"),
        F.col("h2").alias("b2"),
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    ham = F.bit_count(F.col("a1").bitwiseXOR(F.col("b1"))) + F.bit_count(
        F.col("a2").bitwiseXOR(F.col("b2"))
    )
    return (
        j.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_h)
        .select("id_a", "id_b")
    )


def main():
    spark = get_spark("replay-cross-modal-planted")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    base_dir = f"{OUT}/base"
    planted_path = f"{OUT}/documents_planted.parquet"
    if not os.path.exists(f"{planted_path}/_SUCCESS"):
        t0 = time.time()
        rc.build_documents(spark, base_dir)
        docs = spark.read.parquet(f"{base_dir}/documents.parquet")
        clones = docs.filter(F.col("doc_id") % PLANT_MOD == 0).withColumn(
            "doc_id", F.col("doc_id") + OFFSET
        )
        docs.unionByName(clones).write.mode("overwrite").parquet(planted_path)
        print(f"planted corpus build: {time.time()-t0:.1f}s")
    planted = spark.read.parquet(planted_path)
    n_clones = planted.filter(F.col("doc_id") >= OFFSET).count()
    print(f"docs={planted.count()} clones={n_clones}")

    t0 = time.time()
    t = (
        dedup_minhash_lsh(spark, "unused", docs=planted)
        .select("id_a", "id_b")
        .withColumn("m", F.lit("text"))
    )
    i = _hamming_pairs(
        _image_hash(planted),
        bands=[(1, 16), (17, 16), (33, 16), (49, 16)],
        max_h=6,
    ).withColumn("m", F.lit("image"))
    # the audio fingerprint is 31 bits banded 10+10+11: at 1M docs a
    # 10-bit band space (1024 buckets) saturates past the cap no
    # matter how diverse the waveforms — a fingerprint must carry
    # enough band entropy for the corpus it serves. Kept in the fusion
    # so its (expected zero) pair count is REPORTED, not hidden.
    a = _hamming_pairs(
        _audio_hash(planted),
        bands=[(1, 10), (11, 10), (21, 11)],
        max_h=2,
    ).withColumn("m", F.lit("audio"))
    n_audio_pairs = a.count()
    verdicts = fuse_modalities(t, i, a).persist()
    n_v = verdicts.count()
    dt = time.time() - t0
    planted_v = verdicts.filter(F.col("doc_id") >= OFFSET)
    n_pv = planted_v.count()
    n_corr = planted_v.filter(F.col("verdict") == "corroborated").count()
    print(f"verdict rows={n_v} audio_pairs={n_audio_pairs} "
          f"planted-with-verdict={n_pv} planted-corroborated={n_corr} "
          f"in {dt:.1f}s")
    assert n_pv >= n_clones * 0.99, "planted clones missing verdict rows"
    # corroboration at 1M runs on text+image (audio's band space is
    # saturated — see above); >= 2 modalities is the bar either way
    assert n_corr >= n_clones * 0.95, "corroboration failed at scale"
    print("OK: >=2-modality corroboration fires at 1M docs on planted dups")
    verdicts.unpersist()


if __name__ == "__main__":
    main()
