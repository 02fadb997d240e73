"""Corpus-curation operators: PII scrub, sequence packing, stratified
sampling (operators/curation.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from warpdb_spark.operators import curation as C


class TestPiiScrub:
    def _scrub_one(self, spark, text):
        df = spark.createDataFrame([Row(t=text)])
        return df.select(C.scrub_pii(F.col("t")).alias("s")).first()["s"]

    def test_each_category(self, spark):
        s = self._scrub_one(
            spark,
            "mail a.b+c@foo-bar.org call 415-555-2671 ip 192.168.0.1 "
            "ssn 078-05-1120 card 4111-1111-1111-1111 done",
        )
        assert s == "mail <EMAIL> call <PHONE> ip <IP> ssn <SSN> card <CC> done"

    def test_cc_not_eaten_by_phone(self, spark):
        # CC is scrubbed first; phone must not fire inside the 4-4-4-4 run
        s = self._scrub_one(spark, "x 4111-1111-1111-1111 y")
        assert s == "x <CC> y"

    def test_plain_numbers_untouched(self, spark):
        txt = "version 1.2 build 2024 pi 3.14159 range 10-20"
        assert self._scrub_one(spark, txt) == txt

    def test_counts_sequential(self, spark):
        df = spark.createDataFrame(
            [Row(t="a@b.co and c@d.io ssn 078-05-1120 tel 202-555-0100")]
        )
        counts = C.pii_counts(F.col("t"))
        row = df.select(*[v.alias(k) for k, v in counts.items()]).first()
        assert (row["email"], row["ssn"], row["phone"], row["cc"], row["ip"]) == (
            2, 1, 1, 0, 0,
        )


class TestPacking:
    @pytest.fixture()
    def toks(self, spark):
        rows = [Row(id=i, grp=i % 2, tok=t) for i, t in enumerate([300, 400, 500, 900, 200, 1500])]
        return spark.createDataFrame(rows)

    def test_chunked_offsets(self, toks):
        out = {
            r["id"]: r
            for r in C.pack_chunks(toks, "id", "grp", "tok", block_size=512).collect()
        }
        # grp 0: ids 0,2,4 → starts 0,300,800
        assert [out[i]["start_tok"] for i in (0, 2, 4)] == [0, 300, 800]
        assert (out[2]["first_block"], out[2]["last_block"]) == (0, 1)
        assert out[4]["n_blocks"] == 1
        # grp 1: ids 1,3,5 → starts 0,400,1300; id5 spans blocks 2..5
        assert [out[i]["start_tok"] for i in (1, 3, 5)] == [0, 400, 1300]
        assert (out[5]["first_block"], out[5]["last_block"]) == (2, 5)

    def test_greedy_bins(self, toks):
        out = {
            r["id"]: r["bin"]
            for r in C.pack_greedy(toks, "id", "grp", "tok", budget=1024).collect()
        }
        # grp 0 order 0,2,4: 300 | +500=800 | +200>1024? 1000 ≤ 1024 → same bin
        assert (out[0], out[2], out[4]) == (0, 0, 0)
        # grp 1 order 1,3,5: 400 | +900>1024 → bin1 | +1500>1024 → bin2 (oversize doc alone)
        assert (out[1], out[3], out[5]) == (0, 1, 2)

    def test_greedy_matches_python_reference(self, spark, sf_dir):
        from warpdb_spark.functions import text as T

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id",
            (F.col("doc_id") % 4).alias("grp"),
            T.token_count(F.col("text")).alias("tok"),
        )
        got = {
            (r["grp"], r["doc_id"]): r["bin"]
            for r in C.pack_greedy(docs, "doc_id", "grp", "tok", budget=1024).collect()
        }
        rows = sorted(docs.collect(), key=lambda r: (r["grp"], r["doc_id"]))
        want, acc, b, cur = {}, 0, 0, None
        for r in rows:
            if r["grp"] != cur:
                cur, acc, b = r["grp"], r["tok"], 0
            elif acc + r["tok"] > 1024:
                b, acc = b + 1, r["tok"]
            else:
                acc += r["tok"]
            want[(r["grp"], r["doc_id"])] = b
        assert got == want


class TestContamination:
    def test_overlap_counts(self, spark):
        corpus = spark.createDataFrame(
            [
                Row(doc_id=1, text="the quick brown fox jumps"),   # shares 3-grams
                Row(doc_id=2, text="totally different words here entirely"),
                Row(doc_id=3, text="quick brown fox"),              # exactly one gram
            ]
        )
        eval_df = spark.createDataFrame(
            [Row(doc_id=100, text="a quick brown fox ran")]
        )
        out = {
            r["doc_id"]: r
            for r in C.contamination_report(corpus, eval_df, "doc_id", "text").collect()
        }
        # eval grams: {a quick brown, quick brown fox, brown fox ran}
        assert out[1]["n_overlap"] == 1 and out[1]["n_shingles"] == 3
        assert out[3]["n_overlap"] == 1 and out[3]["n_shingles"] == 1
        assert out[3]["ratio"] == 1.0
        assert 2 not in out  # no overlap → not reported

    def test_case_and_whitespace_normalized(self, spark):
        corpus = spark.createDataFrame([Row(doc_id=1, text="The  QUICK   brown fox")])
        eval_df = spark.createDataFrame([Row(doc_id=9, text="the quick brown")])
        out = C.contamination_report(corpus, eval_df, "doc_id", "text").collect()
        assert len(out) == 1 and out[0]["n_overlap"] == 1


class TestRepetitionStats:
    def test_degenerate_repetition(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="spam spam spam spam"),
                Row(doc_id=2, text="all words are unique here"),
                Row(doc_id=3, text="one"),
            ]
        )
        out = {r["doc_id"]: r for r in C.repetition_stats(df).collect()}
        # 3 bigrams, all identical → dup ratio 1 - 1/3; every token the same
        assert out[1]["dup_bigram_ratio"] == round(1 - 1 / 3, 6)
        assert out[1]["top_token_ratio"] == 1.0
        assert out[2]["dup_bigram_ratio"] == 0.0
        assert out[2]["top_token_ratio"] == 0.2
        # single token: no bigrams → 0.0, top token ratio 1.0
        assert out[3]["dup_bigram_ratio"] == 0.0
        assert out[3]["top_token_ratio"] == 1.0


class TestChunking:
    def test_overlapping_windows(self, spark):
        text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
        df = spark.createDataFrame([Row(doc_id=1, text=text)])
        out = sorted(
            C.chunk_documents(df, window=64, stride=48).collect(),
            key=lambda r: r["chunk_no"],
        )
        # starts 0, 48, 96 → lengths 64, 52, 4
        assert [(r["chunk_no"], r["n_chunk_tokens"]) for r in out] == [
            (0, 64), (1, 52), (2, 4),
        ]
        import hashlib

        want = hashlib.md5(" ".join(f"w{i}" for i in range(96, 100)).encode()).hexdigest()
        assert out[2]["chunk_md5"] == want

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
        out = C.chunk_documents(df, window=64, stride=48).collect()
        assert len(out) == 1 and out[0]["n_chunk_tokens"] == 3


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, sf_dir):
        from warpdb_spark.operators.skew import salted_join

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
        salted = salted_join(li, orders, "l_orderkey", salt=8)
        plain = li.join(orders, "l_orderkey")
        assert salted.count() == plain.count()
        a = {tuple(r) for r in salted.collect()}
        b = {tuple(r) for r in plain.collect()}
        assert a == b


class TestStratifiedSample:
    def test_counts_and_determinism(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = C.stratified_sample(docs, ["lang", "source"], "doc_id", 2)
        per = out.groupBy("lang", "source").count().collect()
        assert all(r["count"] <= 2 for r in per)
        # every stratum with ≥2 docs yields exactly 2
        sizes = {
            (r["lang"], r["source"]): r["count"]
            for r in docs.groupBy("lang", "source").count().collect()
        }
        got = {(r["lang"], r["source"]): r["count"] for r in per}
        for k, n in sizes.items():
            assert got[k] == min(n, 2)
        # deterministic: second run identical
        again = C.stratified_sample(docs, ["lang", "source"], "doc_id", 2)
        assert sorted(r["doc_id"] for r in out.collect()) == sorted(
            r["doc_id"] for r in again.collect()
        )

    def test_rank_orders_by_md5(self, spark):
        df = spark.createDataFrame([Row(k="a", id=i) for i in range(10)])
        out = C.stratified_sample(df, ["k"], "id", 3).collect()
        import hashlib

        want = sorted(range(10), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:3]
        assert sorted(r["id"] for r in out) == sorted(want)


class TestBoilerplateSpans:
    def test_planted_shared_span_removed(self, spark):
        shared = "alpha beta gamma delta epsilon"  # the 5-gram boilerplate
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text=f"one two three {shared} four five"),
                Row(doc_id=2, text=f"six seven {shared} eight"),
                Row(doc_id=3, text="nine ten eleven twelve thirteen fourteen"),
            ]
        )
        out = {
            r["doc_id"]: r
            for r in C.remove_boilerplate_spans(
                docs, "doc_id", "text", span=5, min_docs=2
            ).collect()
        }
        # the shared 5 tokens vanish from both carriers, the rest stay
        assert out[1]["n_removed"] == 5 and out[1]["n_kept"] == 5
        assert out[2]["n_removed"] == 5 and out[2]["n_kept"] == 3
        # untouched doc keeps everything
        assert out[3]["n_removed"] == 0 and out[3]["n_kept"] == 6
        import hashlib

        assert out[1]["clean_md5"] == hashlib.md5(b"one two three four five").hexdigest()
        assert out[2]["clean_md5"] == hashlib.md5(b"six seven eight").hexdigest()

    def test_doc_shorter_than_span_untouched(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="tiny doc"), Row(doc_id=2, text="tiny doc")]
        )
        out = C.remove_boilerplate_spans(docs, "doc_id", "text", span=5).collect()
        assert all(r["n_removed"] == 0 for r in out)


class TestBudgetFill:
    """budget_fill must be EXACTLY the plain per-key ordered-cumsum
    window, computed via the two-level (bucketed) rewrite."""

    def _plain(self, df, key, w, idc, budget):
        from pyspark.sql import Window

        win = Window.partitionBy(key).orderBy(
            F.md5(F.col(idc).cast("string")), F.col(idc)
        )
        d = df.withColumn("cum", F.sum(w).over(win))
        return d.filter(F.col("cum") - F.col(w) < budget)

    @pytest.mark.parametrize("prefix_len", [1, 2])
    def test_matches_plain_window(self, spark, prefix_len):
        rows = [
            Row(doc_id=i, lang=["en", "de", "fr"][i % 3], n=(i * 37) % 50 + 1)
            for i in range(600)
        ]
        df = spark.createDataFrame(rows)
        got = C.budget_fill(
            df, "lang", "n", "doc_id", budget=800, prefix_len=prefix_len
        )
        want = self._plain(df, "lang", "n", "doc_id", 800)
        gs = sorted(got.select("doc_id", "lang", "n", "cum").collect())
        ws = sorted(want.select("doc_id", "lang", "n", "cum").collect())
        assert gs == ws and len(gs) > 0

    def test_row_windows_never_partition_on_key_alone(self, spark):
        """The data-volume window must run per (key, bucket) — a window
        partitioned on the bare key is the single-task-per-key sort the
        operator exists to avoid (the offset window over the per-bucket
        aggregate is key-only by design but touches 16**prefix_len rows
        per key). budget_fill now rides grouped_prefix_sum: its local
        running-sum window (__loc) must carry the __chunk bucket in the
        partition spec."""
        df = spark.createDataFrame(
            [Row(doc_id=i, lang="en", n=1) for i in range(50)]
        )
        out = C.budget_fill(df, "lang", "n", "doc_id", budget=10)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        import re

        windows = re.findall(r"Window \[.*?\]", plan)
        cum_windows = [w for w in windows if "AS __loc" in w]
        assert cum_windows, plan
        assert all("__chunk" in w for w in cum_windows), plan

    def test_budget_boundary_overshoot_by_one(self, spark):
        # weights 10 each, budget 25: cum 10,20,30 → kept 10,20,30 (the
        # 30-row started under budget), 40 dropped
        df = spark.createDataFrame(
            [Row(doc_id=i, lang="en", n=10) for i in range(1, 9)]
        )
        out = C.budget_fill(df, "lang", "n", "doc_id", budget=25).collect()
        assert len(out) == 3 and max(r["cum"] for r in out) == 30


class TestBatchFormation:
    def test_bucketed_batches_invariants(self, spark):
        from warpdb_spark.inventory.pipeline_ops import pack_batches_bucketed

        rows = pack_batches_bucketed(spark, "/root/testdata/sf0.001").collect()
        assert rows
        for r in rows:
            assert 1 <= r.n_docs <= 16
            assert r.sum_tokens <= r.max_tokens * r.n_docs
            assert 0.0 <= r.padding_frac < 1.0
            # bucket width 64: the max length inside a bucket stays in range
            assert r.bucket * 64 <= r.max_tokens < (r.bucket + 1) * 64

    def test_length_sorting_beats_random_batching(self, spark):
        """The whole point: length-sorted batches waste less padding
        than hash-ordered batches of the same size."""
        from pyspark.sql import functions as F, Window
        from warpdb_spark.functions import text as T

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        d = docs.select(
            "doc_id", T.token_count(F.col("text")).cast("long").alias("n")
        )
        def waste(w):
            b = d.withColumn("bno", ((F.row_number().over(w) - 1) / 16).cast("long"))
            agg = b.groupBy("bno").agg(
                F.max("n").alias("mx"), F.sum("n").alias("sm"), F.count("*").alias("c")
            )
            tot = agg.agg(
                F.sum(F.col("mx") * F.col("c")).alias("padded"), F.sum("sm").alias("real")
            ).first()
            return 1 - tot.real / tot.padded

        sorted_waste = waste(Window.orderBy("n", "doc_id"))
        random_waste = waste(Window.orderBy(F.md5(F.col("doc_id").cast("string"))))
        assert sorted_waste < random_waste


class TestScriptShares:
    def test_planted_composition(self, spark, monkeypatch):
        import warpdb_spark.inventory.pipeline_ops as po

        docs = spark.createDataFrame(
            [
                (1, "abcd 12"),      # 8 chars: 4 alpha, 2 digit, 1 ws... wait
                (2, "漢字漢字"),      # all cjk
                (3, "1234"),         # all digit
                (4, "!!!"),          # all other
                (5, ""),             # empty -> excluded
            ],
            ["doc_id", "text"],
        )
        monkeypatch.setattr(po, "_t", lambda spark, sf_dir, name: docs)
        got = {r.doc_id: r for r in po.text_script_shares(spark, "x").collect()}
        r1 = got[1]  # "abcd 12" = 7 chars: 4 alpha, 2 digit, 1 space
        assert r1.n_chars_total == 7
        assert r1.share_alpha == round(4 / 7, 6)
        assert r1.share_digit == round(2 / 7, 6)
        assert r1.share_ws == round(1 / 7, 6)
        assert r1.dominant_class == "alpha"
        assert got[2].share_cjk == 1.0 and got[2].dominant_class == "cjk"
        assert got[3].dominant_class == "digit"
        assert got[4].share_other == 1.0 and got[4].dominant_class == "other"
        assert 5 not in got
        # shares always partition to ~1
        for r in got.values():
            total = r.share_alpha + r.share_digit + r.share_cjk + r.share_ws + r.share_other
            assert abs(total - 1.0) < 1e-5


class TestEmbeddingDimProfile:
    def test_planted_moments_and_dead_dim(self, spark, monkeypatch):
        import warpdb_spark.inventory.pipeline_ops as po

        vecs = [
            (1, [1.0, 0.5, 0.0]),
            (2, [3.0, 0.5, 0.0]),
            (3, [2.0, 0.5, 4.0]),
        ]
        emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        monkeypatch.setattr(po, "_t", lambda spark, sf_dir, name: emb)
        got = {r.dim: r for r in po.embedding_dim_profile(spark, "x").collect()}
        d0 = got[0]  # values 1,2,3: mean 2, pop-std sqrt(2/3)
        assert d0.n_vecs == 3 and d0.mean == 2.0
        assert d0.std == pytest.approx((2 / 3) ** 0.5, abs=1e-6)
        assert (d0.min_val, d0.max_val) == (1.0, 3.0)
        assert not d0.is_dead
        d1 = got[1]  # constant 0.5: dead, zero std
        assert d1.is_dead and d1.std == 0.0 and d1.zero_frac == 0.0
        d2 = got[2]  # 0,0,4: zero_frac 2/3
        assert d2.zero_frac == pytest.approx(round(2 / 3, 6))


class TestReadabilityFK:
    def test_planted_counts_and_grade(self, spark, monkeypatch):
        import warpdb_spark.inventory.pipeline_ops as po

        docs = spark.createDataFrame(
            [
                (1, "The cat sat. The dog ran. Good"),   # 7 words, 3 sentences
                (2, "aeiou bcdfg"),                       # 2 words, 1 sentence, 1 vowel group
                (3, ""),                                  # excluded
            ],
            ["doc_id", "text"],
        )
        monkeypatch.setattr(po, "_t", lambda spark, sf_dir, name: docs)
        got = {r.doc_id: r for r in po.text_readability_fk(spark, "x").collect()}
        r1 = got[1]
        assert (r1.n_words, r1.n_sentences) == (7, 3)
        # vowel groups: e,a,a,e,o,a,oo -> 7
        assert r1.n_syllable_groups == 7
        expected = round(0.39 * (7 / 3) + 11.8 * (7 / 7) - 15.59, 6)
        assert r1.fk_grade == pytest.approx(expected, abs=1e-6)
        r2 = got[2]
        assert (r2.n_words, r2.n_sentences, r2.n_syllable_groups) == (2, 1, 1)
        assert 3 not in got
