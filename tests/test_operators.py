"""Operator-level tests for the pipeline superset (dedup, similarity,
text, multimodal, asof/range) on deterministic in-memory fixtures plus
the sf0.001 driver tables."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from warpdb_spark.functions import text as T
from warpdb_spark.functions import vectors as V
from warpdb_spark.operators import dedup as D
from warpdb_spark.operators import multimodal as M
from warpdb_spark.operators import similarity as S
from warpdb_spark.operators.asof import asof_join, range_join


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="The quick  brown fox jumps over the lazy dog"),  # case/ws dup
        Row(doc_id=3, text="the quick brown fox jumps over the lazy cat"),  # near dup
        Row(doc_id=4, text="completely different content about spark engines"),
        Row(doc_id=5, text="tiny"),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(8)
    rows = [
        Row(vec_id=1, embedding=[float(x) for x in base]),
        Row(vec_id=2, embedding=[float(x) for x in base + 0.01 * rng.standard_normal(8)]),
        Row(vec_id=3, embedding=[float(x) for x in -base]),
        Row(vec_id=4, embedding=[float(x) for x in rng.standard_normal(8)]),
        Row(vec_id=5, embedding=[float(x) for x in rng.standard_normal(8)]),
    ]
    return spark.createDataFrame(rows)


class TestTextFunctions:
    def test_token_count(self, spark):
        df = spark.createDataFrame([Row(t="a b  c"), Row(t="  "), Row(t="one")])
        out = [r[0] for r in df.select(T.token_count(F.col("t"))).collect()]
        assert out == [3, 0, 1]

    def test_word_ngrams(self, spark):
        df = spark.createDataFrame([Row(t="a b c d")])
        out = df.select(T.word_ngrams(F.col("t"), 3)).first()[0]
        assert out == ["a b c", "b c d"]

    def test_ngrams_short_doc(self, spark):
        df = spark.createDataFrame([Row(t="a b")])
        assert df.select(T.word_ngrams(F.col("t"), 3)).first()[0] == []

    def test_lang_id(self, spark):
        df = spark.createDataFrame(
            [
                Row(t="the cat and the dog of it"),
                Row(t="el perro y la casa de los gatos"),
                Row(t="der hund und die katze ist da"),
                Row(t="xyzzy plugh"),
            ]
        )
        out = [r[0] for r in df.select(T.lang_id(F.col("t"))).collect()]
        assert out == ["en", "es", "de", "unknown"]

    def test_quality_score_bounds(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        stats = docs.select(T.quality_score(F.col("text")).alias("q")).agg(
            F.min("q"), F.max("q")
        ).first()
        assert 0.0 <= stats[0] <= stats[1] <= 1.0

    def test_gopher_metrics(self, spark):
        df = spark.createDataFrame(
            [
                Row(t="the cat sat"),          # mean len (3+3+3)/3, 1 stopword
                Row(t="## ## ..."),            # symbol-heavy, no alpha
                Row(t="   "),                  # empty after trim
            ]
        )
        rows = df.select(
            T.mean_word_length(F.col("t")).alias("mwl"),
            T.symbol_word_ratio(F.col("t")).alias("sym"),
            T.alpha_word_fraction(F.col("t")).alias("alpha"),
            T.distinct_stopword_hits(F.col("t")).alias("stops"),
        ).collect()
        assert rows[0]["mwl"] == 3.0
        assert rows[0]["sym"] == 0.0
        assert rows[0]["alpha"] == 1.0
        assert rows[0]["stops"] == 1  # 'the' once → 1 distinct hit
        # '## ## ...': 4 '#' chars + 1 '...' over 3 words
        assert rows[1]["sym"] == round(5 / 3, 6)
        assert rows[1]["alpha"] == 0.0
        assert rows[2]["mwl"] == 0.0 and rows[2]["sym"] == 0.0 and rows[2]["alpha"] == 0.0

    def test_distinct_stopword_hits_counts_distinct(self, spark):
        df = spark.createDataFrame([Row(t="the the the and AND of")])
        # 3 distinct list words present, repeats ignored
        assert df.select(T.distinct_stopword_hits(F.col("t"))).first()[0] == 3

    def test_normalized_fingerprint_stable(self, spark):
        df = spark.createDataFrame(
            [Row(t="Hello   World"), Row(t="hello world"), Row(t=" HELLO WORLD ")]
        )
        fps = [r[0] for r in df.select(T.md5_fingerprint(F.col("t"))).collect()]
        assert len(set(fps)) == 1


class TestDedup:
    def test_exact_dedup_normalized(self, docs):
        out = D.exact_dedup(docs, ["text"], "doc_id", normalize=True)
        ids = sorted(r.doc_id for r in out.collect())
        assert ids == [1, 3, 4, 5]  # doc 2 deduped into doc 1

    def test_exact_dedup_null_ids_agree_across_paths(self, spark):
        """A group whose every id is NULL disappears in BOTH agg paths
        (plain min(id) and generic min_by) — r7 advice: without the
        up-front NULL-id filter the min_by path emitted an all-NULL
        row while the plain path kept keys with a NULL id."""
        df = spark.createDataFrame(
            [
                Row(k="a", doc_id=2),
                Row(k="a", doc_id=1),
                Row(k="b", doc_id=None),  # all-NULL group: must vanish
                Row(k="c", doc_id=None),  # NULL loses to a real id
                Row(k="c", doc_id=7),
            ]
        )
        # plain path: frame is exactly (keys, id)
        plain = {(r.k, r.doc_id) for r in D.exact_dedup(df, ["k"], "doc_id").collect()}
        assert plain == {("a", 1), ("c", 7)}
        # generic min_by path: extra payload column forces the struct agg
        wide = df.withColumn("payload", F.length("k"))
        generic = {
            (r.k, r.doc_id)
            for r in D.exact_dedup(wide, ["k"], "doc_id").collect()
        }
        assert generic == plain

    def test_minhash_finds_near_dups(self, docs):
        pairs = D.lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=64, bands=16)
        verified = D.ngram_jaccard(docs, pairs, "doc_id", "text")
        j = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
        assert j[(1, 2)] == 1.0  # normalization makes them identical
        assert (1, 3) in j and 0.5 < j[(1, 3)] < 1.0

    def test_minhash_dedup_survivors(self, docs):
        out = D.minhash_dedup(docs, "doc_id", "text", threshold=0.99)
        ids = sorted(r.doc_id for r in out.collect())
        assert 2 not in ids and 1 in ids

    def test_simhash_reference(self, spark, docs):
        """Spark SimHash must equal a pure-python reimplementation."""
        import hashlib

        def py_simhash(text):
            toks = text.lower().split()
            votes = [0] * 64
            for tok in toks:
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                for b in range(64):
                    votes[b] += 1 if (h >> b) & 1 else -1
            sig = 0
            for b in range(64):
                if votes[b] > 0:
                    sig |= 1 << b
            return sig - (1 << 64) if sig >= 1 << 63 else sig

        out = {r.doc_id: r.simhash for r in D.simhash_signature(docs).collect()}
        for r in docs.collect():
            assert out[r.doc_id] == py_simhash(r.text), r.doc_id

    def test_simhash_candidates_close_pair(self, docs):
        cands = D.simhash_candidates(docs, max_hamming=3)
        pairs = {(r.id_a, r.id_b) for r in cands.collect()}
        assert (1, 2) in pairs  # identical after lowering → hamming 0

    def test_embedding_near_duplicates(self, vecs):
        out = D.embedding_near_duplicates(vecs, threshold=0.95, num_planes=4, seed=1)
        pairs = {(r.id_a, r.id_b) for r in out.collect()}
        assert (1, 2) in pairs
        assert all(p != (1, 3) for p in pairs)  # opposite vector

    def test_capped_key_pairs_drops_hot_buckets_and_dedups(self, spark):
        keyed = spark.createDataFrame(
            # 'hot' holds 4 docs (over cap 3): dropped wholesale.
            # (1,2) collide on BOTH k1 and k2: emitted once (distinct).
            [(1, "hot"), (2, "hot"), (3, "hot"), (4, "hot"),
             (1, "k1"), (2, "k1"), (1, "k2"), (2, "k2"), (3, "k3"), (5, "k3")],
            ["doc_id", "key"],
        )
        out = D.capped_key_pairs(keyed, max_bucket_size=3)
        rows = out.collect()
        assert sorted((r.id_a, r.id_b) for r in rows) == [(1, 2), (3, 5)]


class TestSimilarity:
    def test_bruteforce_topk_exact(self, vecs):
        out = S.cosine_topk(vecs, vecs.filter(F.col("vec_id") == 1), k=2)
        rows = sorted(out.collect(), key=lambda r: r.rank)
        assert [r.neighbor_id for r in rows] == [2, 4] or rows[0].neighbor_id == 2
        assert rows[0].cosine > 0.99

    def test_lsh_recall_vs_bruteforce(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 10)
        exact = S.cosine_topk(emb, queries, k=5)
        # random embeddings have weakly separated neighbors (cosine
        # ~0.4), so use few planes → bigger buckets → higher recall
        approx = S.ann_lsh_topk(emb, queries, k=5, num_planes=4)
        e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.3, f"LSH recall too low: {recall}"

    def test_ivf_recall_vs_bruteforce(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 10)
        exact = S.cosine_topk(emb, queries, k=5)
        approx = S.ivf_topk(emb, queries, k=5, num_lists=8, nprobe=4)
        e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.3, f"IVF recall too low: {recall}"

    def test_cosine_function(self, spark):
        df = spark.createDataFrame([Row(a=[1.0, 0.0], b=[0.0, 1.0]), Row(a=[1.0, 1.0], b=[1.0, 1.0])])
        out = [r[0] for r in df.select(V.cosine_similarity(F.col("a"), F.col("b"))).collect()]
        assert out[0] == pytest.approx(0.0)
        assert out[1] == pytest.approx(1.0)


class TestMultimodal:
    def test_blob_schema(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        blobs = M.attach_blob(docs)
        assert [f.name for f in blobs.schema.fields] == ["doc_id", "payload", "meta"]
        row = blobs.first()
        assert row.meta.n_bytes == len(row.payload)

    def test_feature_extraction_shape(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        feats = M.extract_features(M.attach_blob(docs))
        rows = feats.collect()
        assert len(rows) == 50
        for r in rows[:5]:
            assert len(r.features) == 8
            assert abs(sum(r.features) - 1.0) < 1e-5

    def test_pil_decode_feature_gated(self):
        """PIL-class formats decode for real when Pillow is installed,
        and fail LOUDLY (install guidance, not a silent fake) when it
        is not — both branches of the feature check are pinned."""
        try:
            import PIL  # noqa: F401
        except ImportError:
            with pytest.raises(RuntimeError, match="Pillow"):
                M.pil_decode(b"abc", "jpeg")
        else:
            import io

            from PIL import Image

            arr = np.arange(16 * 12 * 3, dtype=np.uint8).reshape(12, 16, 3)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            out = M.decode_media(buf.getvalue(), "png")
            assert np.array_equal(out, arr)

    def test_decode_media_dispatches_ppm_without_pil(self):
        arr = np.full((4, 5, 3), 7, dtype=np.uint8)
        assert np.array_equal(M.decode_media(M.ppm_encode(arr), "ppm"), arr)

    def test_frame_sampling(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="x" * 300, source="s")])
        frames = M.sample_frames(M.attach_blob(df), frame_size=64, every_n=2)
        rows = sorted(frames.collect(), key=lambda r: r.frame_no)
        assert [r.frame_no for r in rows] == [0, 2, 4]
        assert len(rows[0].frame) == 64 and len(rows[-1].frame) == 300 - 4 * 64


class TestAsofRange:
    def test_asof_backward(self, spark):
        left = spark.createDataFrame(
            [Row(id=1, k="a", t=10), Row(id=2, k="a", t=20), Row(id=3, k="b", t=5)]
        )
        right = spark.createDataFrame(
            [Row(k="a", t=8, v=1.0), Row(k="a", t=15, v=2.0), Row(k="b", t=9, v=9.0)]
        )
        out = asof_join(left, right, on="t", by="k", right_cols=["v"])
        got = {r.id: r.v_right for r in out.collect()}
        assert got == {1: 1.0, 2: 2.0, 3: None}

    def test_asof_inclusive_tie(self, spark):
        left = spark.createDataFrame([Row(id=1, k="a", t=10)])
        right = spark.createDataFrame([Row(k="a", t=10, v=5.0)])
        out = asof_join(left, right, on="t", by="k", right_cols=["v"])
        assert out.first().v_right == 5.0

    def test_asof_forward(self, spark):
        left = spark.createDataFrame([Row(id=1, k="a", t=10)])
        right = spark.createDataFrame([Row(k="a", t=8, v=1.0), Row(k="a", t=12, v=2.0)])
        out = asof_join(left, right, on="t", by="k", right_cols=["v"], direction="forward")
        assert out.first().v_right == 2.0

    @pytest.mark.slow
    def test_range_join_banded_equals_plain(self, spark):
        left = spark.createDataFrame([Row(id=i, val=float(i * 7 % 100)) for i in range(30)])
        right = spark.createDataFrame(
            [Row(band=f"b{i}", lo=float(i * 25), hi=float((i + 1) * 25)) for i in range(4)]
        )
        plain = range_join(left, right, "val", "lo", "hi")
        banded = range_join(left, right, "val", "lo", "hi", band_width=10.0)
        p = {(r.id, r.band) for r in plain.collect()}
        b = {(r.id, r.band) for r in banded.collect()}
        assert p == b and len(p) == 30


class TestCosineTopkNp:
    def test_matches_hof_implementation(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from warpdb_spark.operators import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 5)
        a = sorted(
            map(tuple, S.cosine_topk(emb, queries, k=5).collect())
        )
        b = sorted(
            map(tuple, S.cosine_topk_np(emb, queries, k=5).collect())
        )
        assert a == b


class TestCosineTopkBlocked:
    """cosine_topk_blocked (r11): the distributed-query exact path must
    rank identically to cosine_topk_np at any blocking, and must never
    collect query vectors to the driver."""

    def test_matches_np_implementation_across_blockings(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from warpdb_spark.operators import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 30)
        want = sorted(map(tuple, S.cosine_topk_np(emb, queries, k=4).collect()))
        for ncb, nqb in [(1, 1), (3, 2), (7, 5)]:
            got = sorted(
                map(
                    tuple,
                    S.cosine_topk_blocked(
                        emb, queries, k=4,
                        num_corpus_blocks=ncb, num_query_blocks=nqb,
                    ).collect(),
                )
            )
            assert got == want, f"diverged at blocking ({ncb}, {nqb})"

    def test_no_driver_collect_during_construction(self, spark, sf_dir, monkeypatch):
        """The batch entry's contract (r10 verdict item 5): building the
        plan must not collect query vectors — fail any DataFrame.collect
        while the entry constructs. (Patch the CONCRETE classic class:
        pyspark 4 defines collect there, not on the abstract base.)"""
        from pyspark.sql.classic.dataframe import DataFrame

        from warpdb_spark.inventory.pipeline_ops import similarity_topk_batch

        def boom(self):
            raise AssertionError("driver collect during batch-entry construction")

        monkeypatch.setattr(DataFrame, "collect", boom)
        df = similarity_topk_batch(spark, sf_dir)  # must build collect-free
        assert "query_id" in df.columns


class TestIvfpqBatch:
    """ivfpq_topk_batch (r11): the distributed-query IVFADC must be
    row-identical to the collected-query ivfpq_topk in both raw and
    residual mode, and must never collect query vectors."""

    @pytest.mark.parametrize("residual", [False, True])
    def test_matches_collected_path(self, spark, sf_dir, residual):
        from pyspark.sql import functions as F

        from warpdb_spark.operators import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 25)
        kw = dict(k=5, num_lists=16, nprobe=4, m_subs=16, n_codes=32,
                  train_iters=0, rerank_factor=4, seed=42, residual=residual)
        a = sorted(map(tuple, S.ivfpq_topk(emb, qs, **kw).collect()))
        b = sorted(map(tuple, S.ivfpq_topk_batch(emb, qs, **kw).collect()))
        assert a == b and len(a) == 125

    def test_query_frame_never_collected(self, spark, sf_dir, monkeypatch):
        """The index build collects corpus-bounded state (centroids,
        codebook seeds) — legal; the QUERY frame must never collect.
        Wrap collect to record which plans it ran."""
        from pyspark.sql import functions as F
        # patch the CONCRETE class: pyspark 4 defines collect on the
        # classic subclass, so patching the abstract base is a no-op
        from pyspark.sql.classic.dataframe import DataFrame

        from warpdb_spark.operators import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 25).withColumn(
            "qmark", F.lit("query-frame-marker")
        )
        collected = []
        orig = DataFrame.collect

        def spy(self):
            collected.append(self._jdf.queryExecution().analyzed().toString())
            return orig(self)

        monkeypatch.setattr(DataFrame, "collect", spy)
        df = S.ivfpq_topk_batch(
            emb, qs, k=5, num_lists=16, nprobe=4, m_subs=16, n_codes=32,
            train_iters=0, rerank_factor=4, seed=42, residual=True,
        )
        monkeypatch.undo()
        assert collected, "index build should collect bounded corpus state"
        assert not any("query-frame-marker" in p for p in collected), (
            "query frame was collected to the driver"
        )
        assert df.count() == 125


class TestPqBatchAndDelegation:
    """r12 (r11 verdict item 8): the MAX_COLLECTED_QUERIES raises are
    retired — each collected-query path delegates to its distributed
    batch twin past the cap, and the new plain-PQ batch twin is
    row-identical to pq_topk at any blocking."""

    def test_pq_topk_batch_matches_collected(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from warpdb_spark.operators import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 9)
        kw = dict(k=4, m_subs=8, n_codes=8, train_iters=1, seed=42)
        a = sorted(map(tuple, S.pq_topk(emb, qs, **kw).collect()))
        b = sorted(map(tuple, S.pq_topk_batch(emb, qs, **kw).collect()))
        assert a == b and len(a) == 36
        # explicit block counts (incl. 1) cannot change results
        c = sorted(map(tuple, S.pq_topk_batch(
            emb, qs, num_corpus_blocks=3, num_query_blocks=2, **kw
        ).collect()))
        d = sorted(map(tuple, S.pq_topk_batch(
            emb, qs, num_corpus_blocks=1, num_query_blocks=1, **kw
        ).collect()))
        assert a == c == d

    def test_cap_trip_delegates_identically(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from warpdb_spark.operators import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 9)
        pq_kw = dict(k=4, m_subs=8, n_codes=8, train_iters=1, seed=42)
        a = sorted(map(tuple, S.pq_topk(emb, qs, **pq_kw).collect()))
        b = sorted(map(tuple, S.pq_topk(emb, qs, max_queries=3, **pq_kw).collect()))
        assert a == b
        ivf_kw = dict(k=3, num_lists=8, nprobe=2, m_subs=8, n_codes=8,
                      train_iters=0, rerank_factor=4, seed=42)
        c = sorted(map(tuple, S.ivfpq_topk(emb, qs, **ivf_kw).collect()))
        d = sorted(map(tuple, S.ivfpq_topk(emb, qs, max_queries=3, **ivf_kw).collect()))
        assert c == d


@pytest.mark.slow
class TestBatchKnobFuzz:
    """r12 (r11 verdict item 7): property fuzz of the batch-similarity
    seams — block counts (incl. 1 and > |rows|) and nprobe/num_lists
    edge cases can never change results vs the collected/default paths.
    >=100 cases total across the three tests, on a small deterministic
    corpus so the suite cost stays bounded."""

    @pytest.fixture(scope="class")
    def tiny(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        rows = [
            Row(vec_id=i, embedding=[float(x) for x in rng.randn(8)])
            for i in range(30)
        ]
        df = spark.createDataFrame(rows).repartition(4).cache()
        df.count()
        return df

    def test_blocked_cosine_knobs(self, spark, tiny):
        from warpdb_spark.operators import similarity as S

        qs = tiny.filter(F.col("vec_id") < 6)
        for k in (1, 3, 10):
            oracle = sorted(map(tuple, S.cosine_topk_np(tiny, qs, k=k).collect()))
            for ncb in (1, 2, 3, 7, 64):
                for nqb in (1, 2, 5, 64):
                    got = sorted(map(tuple, S.cosine_topk_blocked(
                        tiny, qs, k=k,
                        num_corpus_blocks=ncb, num_query_blocks=nqb,
                    ).collect()))
                    assert got == oracle, (k, ncb, nqb)  # 60 cases

    def test_pq_batch_knobs(self, spark, tiny):
        from warpdb_spark.operators import similarity as S

        qs = tiny.filter(F.col("vec_id") < 6)
        kw = dict(k=3, m_subs=4, n_codes=4, train_iters=1, seed=11)
        oracle = sorted(map(tuple, S.pq_topk(tiny, qs, **kw).collect()))
        for ncb in (1, 2, 3, 64):
            for nqb in (1, 4, 64):
                got = sorted(map(tuple, S.pq_topk_batch(
                    tiny, qs, num_corpus_blocks=ncb, num_query_blocks=nqb, **kw
                ).collect()))
                assert got == oracle, (ncb, nqb)  # 12 cases

    @pytest.mark.parametrize("residual", [False, True])
    def test_ivfpq_list_probe_edges(self, spark, tiny, residual):
        """nprobe == num_lists, nprobe > num_lists (clamped), a single
        list, and chunk counts 1/3/9 — collected vs batch vs chunked
        all row-identical."""
        from warpdb_spark.operators import similarity as S

        qs = tiny.filter(F.col("vec_id") < 6)
        base = dict(k=3, m_subs=4, n_codes=4, train_iters=0,
                    rerank_factor=2, seed=11, residual=residual)
        for num_lists, nprobe in (
            (1, 1), (1, 4), (2, 5), (3, 3), (4, 4), (5, 2), (8, 8),
        ):
            kw = dict(base, num_lists=num_lists, nprobe=nprobe)
            a = sorted(map(tuple, S.ivfpq_topk(tiny, qs, **kw).collect()))
            b = sorted(map(tuple, S.ivfpq_topk_batch(tiny, qs, **kw).collect()))
            assert a == b, (num_lists, nprobe)
            for nch in (3, 9):
                c = sorted(map(tuple, S.ivfpq_topk_batch(
                    tiny, qs, num_chunks=nch, **kw
                ).collect()))
                assert a == c, (num_lists, nprobe, nch)  # 2x7x3 = 42 cases


class TestPPMCodec:
    """Real pure-numpy P6 codec (operators/multimodal.py): header
    grammar, round-trip, error paths, resize, and the decode-in-the-
    loop mapInPandas stats."""

    def test_roundtrip_and_header_grammar(self):
        import numpy as np

        a = (np.arange(16 * 12 * 3) % 256).astype(np.uint8).reshape(12, 16, 3)
        assert (M.ppm_decode(M.ppm_encode(a)) == a).all()
        with_comment = b"P6\n# made by a test\n 16\t12\n255\n" + a.tobytes()
        assert (M.ppm_decode(with_comment) == a).all()

    def test_error_paths(self):
        import numpy as np

        import pytest as _pytest

        with _pytest.raises(ValueError, match="not a binary PPM"):
            M.ppm_decode(b"P5\n1 1\n255\n\x00")
        with _pytest.raises(ValueError, match="payload size"):
            M.ppm_decode(b"P6\n4 4\n255\n\x00\x00")
        with _pytest.raises(ValueError, match="maxval"):
            a = np.zeros((1, 1, 3), np.uint8)
            M.ppm_decode(b"P6\n1 1\n65535\n" + a.tobytes())
        # non-PPM formats route to the feature-checked PIL path: a real
        # decode attempt with Pillow installed (invalid bytes -> its
        # error), a loud RuntimeError with install guidance without
        try:
            import PIL  # noqa: F401
        except ImportError:
            with _pytest.raises(RuntimeError, match="Pillow"):
                M.decode_media(b"\x89PNG", "png")
        else:
            with _pytest.raises(Exception):
                M.decode_media(b"\x89PNG", "png")  # truncated payload

    def test_resize_nearest(self):
        import numpy as np

        a = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        r = M.resize_nearest(a, 2, 2)
        assert r.shape == (2, 2, 3)
        assert (r[0, 0] == a[0, 0]).all() and (r[1, 1] == a[2, 2]).all()

    def test_image_stats_streams_real_decodes(self, spark):
        import numpy as np

        rows = []
        for i in range(5):
            arr = np.full((3, 4, 3), i * 10, dtype=np.uint8)
            rows.append((i, M.ppm_encode(arr)))
        blobs = spark.createDataFrame(rows, ["doc_id", "payload"])
        got = {r["doc_id"]: r for r in M.image_stats(blobs).collect()}
        for i in range(5):
            r = got[i]
            assert (r["width"], r["height"]) == (4, 3)
            assert r["mean_r"] == r["mean_g"] == r["mean_b"] == i * 10.0


class TestWAVCodec:
    """Real pure-numpy RIFF/PCM16 codec: round-trip, chunk walking,
    error paths, and decode-in-the-loop audio stats."""

    def test_roundtrip(self):
        import numpy as np

        s = ((np.arange(480) * 13 % 2001) - 1000).astype(np.int16)
        out, rate = M.wav_decode(M.wav_encode(s, 8000))
        assert rate == 8000 and (out == s).all()

    def test_unknown_chunks_skipped(self):
        import struct

        import numpy as np

        s = np.array([1, -2, 3], dtype=np.int16)
        p = M.wav_encode(s, 16000)
        junk = struct.pack("<4sI", b"LIST", 4) + b"INFO"
        p2 = p[:12] + junk + p[12:]
        p2 = p[:4] + struct.pack("<I", len(p2) - 8) + p2[8:]
        out, rate = M.wav_decode(p2)
        assert rate == 16000 and (out == s).all()

    def test_error_paths(self):
        import struct

        import numpy as np
        import pytest as _pytest

        with _pytest.raises(ValueError, match="not a RIFF"):
            M.wav_decode(b"OggS" + b"\x00" * 40)
        stereo = M.wav_encode(np.array([1], dtype=np.int16), 8000)
        # corrupt channels field (offset 22 in the canonical layout)
        bad = stereo[:22] + struct.pack("<H", 2) + stereo[24:]
        with _pytest.raises(ValueError, match="unsupported WAV layout"):
            M.wav_decode(bad)

    def test_audio_stats_streams_real_decodes(self, spark):
        import numpy as np

        rows = []
        for i in range(4):
            s = np.full(100, (i + 1) * 100, dtype=np.int16)
            s[::2] *= -1  # alternate sign: 99 crossings
            rows.append((i, M.wav_encode(s, 8000)))
        blobs = spark.createDataFrame(rows, ["doc_id", "payload"])
        got = {r["doc_id"]: r for r in M.audio_stats(blobs).collect()}
        for i in range(4):
            r = got[i]
            assert r["n_samples"] == 100 and r["sample_rate"] == 8000
            assert abs(r["rms"] - (i + 1) * 100) < 1e-9
            assert r["zero_crossings"] == 99


class TestBloomSizing:
    def test_m_for_fpr_matches_analytic_fpr(self):
        """bloom_m_for_fpr inverts FPR(m) = (1-e^{-kn/m})^k at k=3;
        plugging the returned m back in must land on the target (up to
        word-granularity rounding, which only lowers FPR), and more
        keys / tighter targets must need more bits."""
        import math

        from warpdb_spark.inventory.curation_ext import _BLOOM_K, bloom_m_for_fpr

        for n, p in [(10_000_000, 0.01), (1_000_000, 0.05), (500, 0.001)]:
            m = bloom_m_for_fpr(n, p)
            fpr = (1 - math.exp(-_BLOOM_K * n / m)) ** _BLOOM_K
            assert fpr <= p + 1e-12, (n, p, m, fpr)
            assert fpr > p * 0.98 or m <= 60, "grossly oversized"
        assert bloom_m_for_fpr(2_000_000, 0.01) > bloom_m_for_fpr(1_000_000, 0.01)
        assert bloom_m_for_fpr(1_000_000, 0.001) > bloom_m_for_fpr(1_000_000, 0.01)
        assert bloom_m_for_fpr(1_000_000, 0.01) % 30 == 0


class TestCrossModalPlanted:
    def test_planted_clones_are_corroborated(self, spark, sf_dir):
        """dedup_cross_modal_planted's whole reason to exist: every
        planted clone (identical text, same blob base pattern) must be
        flagged by >= 2 modalities and verdict 'corroborated' — the
        path the base corpus never exercises (its fusion entry finds
        only single-modality pairs)."""
        from pyspark.sql import functions as F

        from warpdb_spark.inventory.pipeline_ops import (
            _PLANT_MOD,
            _PLANT_OFFSET,
            dedup_cross_modal_planted,
        )

        out = dedup_cross_modal_planted(spark, sf_dir).persist()
        planted = out.filter(F.col("is_planted")).collect()
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") % _PLANT_MOD == 0
        ).count()
        assert len(planted) == n_docs > 0
        for r in planted:
            assert r.verdict == "corroborated", r
            assert r.n_corroborated >= 1 and r.n_text >= 1
            assert r.doc_id >= _PLANT_OFFSET
        # the originals of the planted pairs corroborate too
        origs = {r.doc_id - _PLANT_OFFSET for r in planted}
        got = {
            r.doc_id
            for r in out.filter(
                (~F.col("is_planted")) & (F.col("verdict") == "corroborated")
            ).collect()
        }
        assert origs <= got
        out.unpersist()

    def test_m_for_fpr_rejects_degenerate_inputs(self):
        import pytest as _pt

        from warpdb_spark.inventory.curation_ext import bloom_m_for_fpr

        for bad_p in (0.0, 1.0, -0.1, 1.5):
            with _pt.raises(ValueError):
                bloom_m_for_fpr(1000, bad_p)
        with _pt.raises(ValueError):
            bloom_m_for_fpr(0, 0.01)
