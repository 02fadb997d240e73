"""Tests for the curation/analytics extension inventory
(inventory/curation_ext.py): hand-computable fixtures for each
statistic, determinism of the hash-priority sample, truncation
semantics of the sequence builder, and invariants on the real
sf0.001 tables."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

import warpdb_spark.inventory.curation_ext as cx


@pytest.fixture
def inject(monkeypatch):
    """Route cx._t (and scale_ops._t, which the shared _user_edges
    helper reads through) to a fixed DataFrame regardless of table
    name."""
    import warpdb_spark.inventory.scale_ops as so

    def _set(df):
        monkeypatch.setattr(cx, "_t", lambda spark, sf_dir, name: df)
        monkeypatch.setattr(so, "_t", lambda spark, sf_dir, name: df)

    return _set


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


TS0 = datetime.datetime(2024, 1, 1)


class TestGini:
    def test_equal_values_give_zero(self, spark, inject):
        df = spark.createDataFrame(
            [(i, "P", 100.0) for i in range(1, 6)],
            "o_orderkey long, o_orderpriority string, o_totalprice double",
        )
        inject(df)
        r = cx.agg_gini_by_segment(spark, "x").collect()[0]
        assert r["gini"] == 0.0
        assert r["n_orders"] == 5 and r["total_value"] == 500.0

    def test_hand_computed_two_values(self, spark, inject):
        # x = [1, 3] ascending: G = 2*(1*1+2*3)/(2*4) - 3/2 = 14/8-12/8
        df = spark.createDataFrame(
            [(1, "P", 1.0), (2, "P", 3.0)],
            "o_orderkey long, o_orderpriority string, o_totalprice double",
        )
        inject(df)
        r = cx.agg_gini_by_segment(spark, "x").collect()[0]
        assert r["gini"] == 0.25

    def test_real_data_bounds(self, spark, sf_dir):
        for r in cx.agg_gini_by_segment(spark, sf_dir).collect():
            assert 0.0 <= r["gini"] < 1.0

    def test_rank_moment_sums_in_decimal(self, spark, sf_dir):
        # Σ i·cents grows as n²·max-cents — a long sum crashed under
        # ANSI at 4M rows/group in the 20M replay. The accumulator
        # must stay decimal(38,0) (exact, order-proof, ~1e38 headroom).
        df = cx.agg_gini_by_segment(spark, sf_dir)
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "decimal(38,0)" in plan

    def test_binned_matches_exact_within_tolerance(self, spark, sf_dir):
        exact = {
            r["o_orderpriority"]: r["gini"]
            for r in cx.agg_gini_by_segment(spark, sf_dir).collect()
        }
        for r in cx.agg_gini_binned(spark, sf_dir).collect():
            assert abs(r["gini"] - exact[r["o_orderpriority"]]) < 1e-3
            assert r["n_buckets"] >= 2

    def test_binned_equal_values_give_zero(self, spark, inject):
        df = spark.createDataFrame(
            [(i, "P", 100.0) for i in range(1, 6)],
            "o_orderkey long, o_orderpriority string, o_totalprice double",
        )
        inject(df)
        r = cx.agg_gini_binned(spark, "x").collect()[0]
        assert r["gini"] == 0.0
        assert r["n_orders"] == 5 and r["n_buckets"] == 1


class TestReservoir:
    def test_cap_and_determinism(self, spark, sf_dir):
        a = cx.sample_reservoir_per_key(spark, sf_dir)
        sizes = a.groupBy("lang", "source").count().collect()
        assert all(r["count"] <= 5 for r in sizes)
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, cx.sample_reservoir_per_key(spark, sf_dir).collect())
        )

    def test_priority_is_md5_of_salted_id(self, spark, sf_dir):
        import hashlib

        r = cx.sample_reservoir_per_key(spark, sf_dir).collect()[0]
        want = hashlib.md5(f"{r['doc_id']}:rsv".encode()).hexdigest()
        assert r["priority"] == want


class TestUserSequences:
    def test_order_and_truncation(self, spark, inject):
        rows = [
            (i, TS0 + datetime.timedelta(seconds=i), 1, f"e{i:02d}", 1.0)
            for i in range(25)
        ] + [(100, TS0, 2, "solo", 1.0)]
        inject(_events(spark, rows))
        got = {r["user_id"]: r for r in
               cx.reshape_user_sequences(spark, "x").collect()}
        assert got[1]["n_events"] == 25 and got[1]["truncated"]
        assert got[1]["seq"] == ">".join(f"e{i:02d}" for i in range(20))
        assert got[2]["seq"] == "solo" and not got[2]["truncated"]

    def test_tie_breaks_on_event_id(self, spark, inject):
        rows = [(2, TS0, 1, "b", 1.0), (1, TS0, 1, "a", 1.0)]
        inject(_events(spark, rows))
        assert cx.reshape_user_sequences(spark, "x").collect()[0]["seq"] == "a>b"


class TestChi2:
    def test_independent_table_has_zero_contrib(self, spark, inject):
        # 2 types × 4 dayparts, identical counts → obs == expected
        rows = []
        eid = 0
        for part in range(4):
            for t in ("a", "b"):
                for _ in range(3):
                    rows.append(
                        (eid, TS0 + datetime.timedelta(hours=6 * part), eid, t, 1.0)
                    )
                    eid += 1
        inject(_events(spark, rows))
        for r in cx.stats_chi2_independence(spark, "x").collect():
            assert r["chi2_contrib"] == 0.0
            assert r["expected"] == r["obs"]

    def test_marginals_sum(self, spark, sf_dir):
        rows = cx.stats_chi2_independence(spark, sf_dir).collect()
        assert all(r["chi2_contrib"] >= 0 for r in rows)
        assert sum(r["obs"] for r in rows) == 1000  # sf0.001 events


class TestHill:
    def test_pareto_exponent_recovered(self, spark, inject):
        # exact Pareto(α=2) quantiles: x_i = (i/n)^(-1/2) — the Hill
        # estimator on the top-100 of n=500 should land near 2
        n = 500
        rows = [
            (i, TS0, i, "p", (i / n) ** -0.5) for i in range(1, n + 1)
        ]
        inject(_events(spark, rows))
        r = cx.events_hill_tail_index(spark, "x").collect()[0]
        assert r["k"] == 100
        assert 1.7 < r["hill_alpha"] < 2.3

    def test_small_groups_dropped(self, spark, inject):
        inject(_events(spark, [(i, TS0, i, "tiny", 1.0 + i) for i in range(50)]))
        assert cx.events_hill_tail_index(spark, "x").count() == 0


class TestEntropy:
    def test_uniform_is_log2_k(self, spark, inject):
        rows = []
        eid = 0
        for cohort in range(2):
            for t in ("a", "b", "c", "d"):
                for _ in range(5):
                    rows.append((eid, TS0, cohort, t, 1.0))
                    eid += 1
        inject(_events(spark, rows))
        for r in cx.agg_group_entropy(spark, "x").collect():
            assert r["entropy_bits"] == 2.0 and r["n_types"] == 4

    def test_single_type_is_zero(self, spark, inject):
        inject(_events(spark, [(i, TS0, 3, "only", 1.0) for i in range(10)]))
        r = cx.agg_group_entropy(spark, "x").collect()[0]
        assert r["entropy_bits"] == 0.0 and r["cohort"] == 3


class TestFreshness:
    def test_lag_and_recent_share(self, spark, inject):
        rows = [
            (1, TS0 + datetime.timedelta(days=2), 1, "fresh", 1.0),
            (2, TS0 + datetime.timedelta(days=2, hours=-12), 2, "fresh", 1.0),
            (3, TS0, 3, "stale", 1.0),
        ]
        inject(_events(spark, rows))
        got = {r["event_type"]: r for r in
               cx.table_freshness_report(spark, "x").collect()}
        assert got["fresh"]["lag_us"] == 0
        assert got["fresh"]["n_last_24h"] == 2  # 12h-old row inside window
        assert got["stale"]["lag_us"] == 2 * 86400 * 10**6
        assert got["stale"]["share_last_24h"] == 0.0


class TestCodeDetect:
    def test_code_doc_flagged_prose_not(self, spark, inject):
        code = "if (x == 1) { y[0] = <z>; }"  # 12 symbol chars
        prose = "plain words only here"
        df = spark.createDataFrame(
            [(1, code, "en", "s", len(code)), (2, prose, "en", "t", len(prose))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        inject(df)
        got = {r["source"]: r for r in cx.text_code_detect(spark, "x").collect()}
        assert got["s"]["n_flagged"] == 1 and got["s"]["n_sym_chars"] == 12
        assert got["t"]["n_flagged"] == 0 and got["t"]["mean_sym_density"] == 0.0


class TestPrefixCluster:
    def test_planted_prefix_family(self, spark, inject):
        stem = "the same beginning " * 5  # > 64 chars normalized
        df = spark.createDataFrame(
            [
                (1, stem + "tail one", "en", "a", 1),
                (2, stem + "a different tail", "en", "b", 1),
                (3, "totally different document", "en", "a", 1),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        inject(df)
        got = {r["cluster_size"]: r for r in
               cx.dedup_prefix_cluster(spark, "x").collect()}
        assert got[2]["n_clusters"] == 1 and got[2]["n_docs"] == 2
        assert got[2]["max_sources_in_cluster"] == 2
        assert got[1]["n_clusters"] == 1


class TestVocabCoverage:
    def test_hand_counts(self, spark, inject):
        # 10×"a", 5×"b", 1×"c": top-10 covers everything at each cp
        text = " ".join(["a"] * 10 + ["b"] * 5 + ["c"])
        df = spark.createDataFrame(
            [(1, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        inject(df)
        rows = {r["top_n"]: r for r in
                cx.text_vocab_coverage_curve(spark, "x").collect()}
        assert set(rows) == {10, 100, 1000, 5000}
        for r in rows.values():
            assert r["vocab_size"] == 3 and r["total_tokens"] == 16
            assert r["covered_tokens"] == 16 and r["coverage"] == 1.0

    def test_monotone_on_real_data(self, spark, sf_dir):
        rows = sorted(
            cx.text_vocab_coverage_curve(spark, sf_dir).collect(),
            key=lambda r: r["top_n"],
        )
        covs = [r["coverage"] for r in rows]
        assert covs == sorted(covs)
        assert all(0 < c <= 1 for c in covs)


class TestWindowDistribution:
    def test_rank_formulas(self, spark, inject):
        # single priority, orderkeys 37 and 74 at known rank positions
        df = spark.createDataFrame(
            [(37, "P", 10.0), (74, "P", 20.0), (3, "P", 30.0), (4, "P", 40.0)],
            "o_orderkey long, o_orderpriority string, o_totalprice double",
        )
        inject(df)
        got = {r["o_orderkey"]: r for r in
               cx.window_distribution_functions(spark, "x").collect()}
        assert set(got) == {37, 74}
        assert got[37]["pct_rank"] == 0.0 and got[37]["cume_dist"] == 0.25
        assert got[74]["pct_rank"] == round(1 / 3, 6)
        assert got[74]["cume_dist"] == 0.5


class TestNeighborJaccard:
    def test_hand_computed_path_graph(self, spark, inject):
        # path 1-2-3-4-5: pairs two apart share exactly one neighbour
        # (dropped by the ≥2 filter); add edge 1-3 and 3-5 via the
        # consecutive-user construction: seq 1,2,3,4,5,1,3,5
        seq = [1, 2, 3, 4, 5, 1, 3, 5]
        rows = [
            (i, TS0 + datetime.timedelta(seconds=i), u, "x", 1.0)
            for i, u in enumerate(seq)
        ]
        inject(_events(spark, rows))
        got = {(r["u"], r["v"]): r for r in
               cx.graph_neighbor_jaccard(spark, "x").collect()}
        # N(1)={2,3,5}... pair (1,5): common = {3} plus? compute via code
        for (u, v), r in got.items():
            assert u < v and r["common"] >= 2
            assert 0 < r["jaccard"] <= 1
            assert r["jaccard"] == round(
                r["common"] / (r["deg_u"] + r["deg_v"] - r["common"]), 6
            )

    def test_cap_binding_consistent_semantics(self, spark, inject, monkeypatch):
        # When the center cap BINDS, degrees must be counted over the
        # same capped (non-hub) neighbour sets the wedges walk — the r6
        # advice fix. Graph: hub 9 → {1,2,3,4}; leaf edges 4-1, 1-2,
        # 2-3, 3-1. Full degrees: 9:4, 1:4, 2:3, 3:3, 4:2. Cap 3 drops
        # centers 9 and 1. Surviving ≥2-common pair is (1,9) with
        # common=3 (wedges via 2,3,4), N'(1)={2,3,4}, N'(9)={2,3,4} →
        # jaccard 3/(3+3-3) = 1.0 exactly. The OLD inconsistent
        # semantics (full degrees 4,4) would read 3/5 = 0.6.
        monkeypatch.setattr(cx, "_JACCARD_CENTER_CAP", 3)
        seq = [1, 9, 2, 9, 3, 9, 4, 1, 2, 3, 1]
        rows = [
            (i, TS0 + datetime.timedelta(seconds=i), u, "x", 1.0)
            for i, u in enumerate(seq)
        ]
        inject(_events(spark, rows))
        got = {(r["u"], r["v"]): r for r in
               cx.graph_neighbor_jaccard(spark, "x").collect()}
        assert set(got) == {(1, 9)}
        r = got[(1, 9)]
        assert (r["common"], r["deg_u"], r["deg_v"]) == (3, 3, 3)
        assert r["jaccard"] == 1.0

    def test_symmetric_star_counts(self, spark, inject):
        # star: center 9 touches 1,2,3 → every leaf pair shares only
        # {9}: below the ≥2 bar unless leaves also connect. Build
        # K3 + center via consecutive users.
        seq = [1, 9, 2, 9, 3, 9, 1, 2, 3, 1]
        rows = [
            (i, TS0 + datetime.timedelta(seconds=i), u, "x", 1.0)
            for i, u in enumerate(seq)
        ]
        inject(_events(spark, rows))
        rows_out = cx.graph_neighbor_jaccard(spark, "x").collect()
        # leaves 1,2,3 pairwise share {9, third leaf} → common=2
        pairs = {(r["u"], r["v"]) for r in rows_out}
        assert {(1, 2), (1, 3), (2, 3)} <= pairs


class TestWelchZtest:
    def test_zero_variance_arms_yield_no_row(self, spark, inject):
        # both arms constant -> z = x/0: Spark NULL vs DuckDB NaN, the
        # engine-divergence class the guard exists for (r7 review).
        # Guarded on exact integer moments (n*sum(x^2) == sum(x)^2),
        # so the row is dropped identically on both engines.
        rows = [(i, TS0, i, "purchase", 50.0) for i in range(10)]
        inject(_events(spark, rows))
        assert cx.events_ab_welch_ztest(spark, "x").count() == 0

    def test_one_constant_arm_keeps_row(self, spark, inject):
        # variance in ONE arm is enough for a finite z
        rows = [(i, TS0, i, "purchase", 50.0 if i % 2 == 0 else float(40 + i))
                for i in range(10)]
        inject(_events(spark, rows))
        out = cx.events_ab_welch_ztest(spark, "x").collect()
        assert len(out) == 1 and out[0]["var0"] == 0.0
        assert out[0]["z_score"] is not None

    def test_identical_arms_give_zero(self, spark, inject):
        rows = []
        for uid in range(10):  # same values in both arms
            for k in range(3):
                rows.append((uid * 10 + k, TS0, uid, "purchase", 10.0 + k))
        inject(_events(spark, rows))
        r = cx.events_ab_welch_ztest(spark, "x").collect()[0]
        assert r["z_score"] == 0.0
        assert r["mean0"] == r["mean1"] == 11.0
        # 15 values {10,11,12}×5 per arm: Σ(x-11)² = 10, /14
        assert r["var0"] == r["var1"] == round(10 / 14, 6)

    def test_shifted_arm_detected(self, spark, inject):
        rows = []
        for uid in range(20):
            shift = 100.0 if uid % 2 else 0.0
            for k in range(5):
                rows.append((uid * 10 + k, TS0, uid, "purchase",
                             10.0 + k + shift))
        inject(_events(spark, rows))
        r = cx.events_ab_welch_ztest(spark, "x").collect()[0]
        assert r["mean1"] - r["mean0"] == 100.0
        assert r["z_score"] > 50

    def test_aa_on_real_data_is_small(self, spark, sf_dir):
        r = cx.events_ab_welch_ztest(spark, sf_dir).collect()[0]
        assert abs(r["z_score"]) < 4  # hash-split A/A
        assert r["n0"] > 0 and r["n1"] > 0


class TestKsTwoSample:
    def test_identical_arms_give_zero(self, spark, inject):
        rows = []
        for uid in range(10):  # same values in both arms
            for k in range(3):
                rows.append((uid * 10 + k, TS0, uid, "purchase", 10.0 + k))
        rows.append((999, TS0, 0, "purchase", None))  # NULL value dropped
        inject(_events(spark, rows))
        r = cx.stats_ks_two_sample(spark, "x").collect()[0]
        assert r["ks_d"] == 0.0 and r["ks_stat"] == 0.0
        assert r["n0"] == r["n1"] == 15

    def test_separated_arms_give_one(self, spark, inject):
        rows = [(u, TS0, u, "purchase", 10.0 if u % 2 == 0 else 100.0)
                for u in range(20)]
        inject(_events(spark, rows))
        r = cx.stats_ks_two_sample(spark, "x").collect()[0]
        assert r["ks_d"] == 1.0
        assert r["ks_at_value"] == 10.0  # the arm-0 mass point

    def test_hand_computed_half_with_tie_pinned(self, spark, inject):
        # arm0 = {1, 2}, arm1 = {2, 3}: |ECDF0-ECDF1| is 1/2 at both
        # value 1 and value 2 — the argmax must pin to the SMALLER
        # cents on both engines
        rows = [(1, TS0, 0, "purchase", 1.0), (2, TS0, 2, "purchase", 2.0),
                (3, TS0, 1, "purchase", 2.0), (4, TS0, 3, "purchase", 3.0)]
        inject(_events(spark, rows))
        r = cx.stats_ks_two_sample(spark, "x").collect()[0]
        assert r["ks_d"] == 0.5
        assert r["ks_at_value"] == 1.0
        assert r["ks_stat"] == round(math.sqrt(4 / 4) * 0.5, 6)

    def test_aa_on_real_data_is_small(self, spark, sf_dir):
        r = cx.stats_ks_two_sample(spark, sf_dir).collect()[0]
        # hash-split A/A: ks_stat beyond ~2 would reject at alpha<<.001
        assert r["ks_stat"] < 2.0
        assert 0.0 <= r["ks_d"] <= 1.0


class TestMannWhitneyU:
    def test_identical_arms_center_u(self, spark, inject):
        # same value multiset as click and purchase → R_A is exactly
        # half the total rank mass → U = n0*n1/2, z = 0
        rows = []
        for k in range(6):
            rows.append((2 * k, TS0, k, "click", 10.0 + k))
            rows.append((2 * k + 1, TS0, k, "purchase", 10.0 + k))
        inject(_events(spark, rows))
        r = cx.stats_mannwhitney_u(spark, "x").collect()[0]
        assert r["n0"] == r["n1"] == 6
        assert r["u_stat"] == 18.0  # 6*6/2
        assert r["z_score"] == 0.0

    def test_separated_arms_give_extreme_u(self, spark, inject):
        # every click value below every purchase value → U_A = 0
        rows = [(u, TS0, u, "click", 1.0) for u in range(5)]
        rows += [(10 + u, TS0, u, "purchase", 100.0 + u) for u in range(5)]
        inject(_events(spark, rows))
        r = cx.stats_mannwhitney_u(spark, "x").collect()[0]
        assert r["u_stat"] == 0.0
        assert r["z_score"] < 0

    def test_hand_computed_midranks_with_tie(self, spark, inject):
        # clicks {1,2}, purchases {2,3}: midrank(2) = 2.5, R_A = 3.5,
        # U = 0.5; tie term t³-t = 6 → var = (4/12)(5 - 6/12) = 1.5,
        # z = -1.5/√1.5 — pins the .5-midrank and tie-correction paths
        rows = [(1, TS0, 0, "click", 1.0), (2, TS0, 1, "click", 2.0),
                (3, TS0, 2, "purchase", 2.0), (4, TS0, 3, "purchase", 3.0)]
        inject(_events(spark, rows))
        r = cx.stats_mannwhitney_u(spark, "x").collect()[0]
        assert r["u_stat"] == 0.5
        assert r["z_score"] == round(-1.5 / math.sqrt(1.5), 6)

    def test_degenerate_all_tied_z_null(self, spark, inject):
        # a single shared value → var = 0 → z_score NULL, U still valid
        rows = [(1, TS0, 0, "click", 5.0), (2, TS0, 1, "purchase", 5.0)]
        inject(_events(spark, rows))
        r = cx.stats_mannwhitney_u(spark, "x").collect()[0]
        assert r["u_stat"] == 0.5  # midrank 1.5 → R_A 1.5 → U 0.5
        assert r["z_score"] is None

    def test_real_data_bounds(self, spark, sf_dir):
        r = cx.stats_mannwhitney_u(spark, sf_dir).collect()[0]
        assert 0.0 <= r["u_stat"] <= r["n0"] * r["n1"]
        assert abs(r["z_score"]) < 6  # same synthetic value generator


class TestBhFdr:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )

    def test_planted_outlier_is_the_significant_prefix(self, spark, inject):
        # a MILD planted shift (+80 on sd≈38 noise, 1 of 20 sources):
        # each source is tested against the REST, so an extreme
        # outlier would contaminate every rest-mean and flag all
        # sources (leave-one-out is not leave-outlier-out)
        rows, did = [], 0
        for s in range(20):
            base = 380 if s == 0 else 300
            for i in range(10):
                rows.append((did, "t", "en", f"s{s:02d}", base + (i * 37) % 130))
                did += 1
        inject(self._docs(spark, rows))
        got = cx.stats_bh_fdr(spark, "x").collect()
        sig = [r["source"] for r in got if r["significant"]]
        assert sig == ["s00"]  # the planted source, and only it
        assert got[0]["source"] == "s00" and got[0]["bh_rank"] == 1
        # BH selection is always a prefix of the p-ranked list
        flags = [r["significant"] for r in got]
        assert flags == sorted(flags, reverse=True)

    def test_erfc_polynomial_accuracy(self, spark):
        import math

        zs = [0.0, 0.5, 1.0, 1.645, 1.96, 2.5758, 4.0]
        df = spark.createDataFrame([(z,) for z in zs], "z double")
        got = df.select(
            "z", cx._normal_two_sided_p(F.col("z")).alias("p")
        ).collect()
        for r in got:
            exact = math.erfc(abs(r["z"]) / math.sqrt(2))
            assert abs(r["p"] - exact) < 1.5e-7  # A&S 7.1.26 bound

    def test_uniform_corpus_is_a_null_reading(self, spark, sf_dir):
        got = cx.stats_bh_fdr(spark, sf_dir).collect()
        assert len(got) == 20
        # selection, if any, is a rank prefix; ranks are 1..m
        flags = [r["significant"] for r in got]
        assert flags == sorted(flags, reverse=True)
        assert [r["bh_rank"] for r in got] == list(range(1, 21))


class TestPsiValueDrift:
    def test_identical_distributions_give_zero(self, spark, inject):
        rows = []
        for t, ty in enumerate(["click", "view"]):
            for k in range(4):
                rows.append((t * 10 + k, TS0, 1, ty, 10.0 if k % 2 else 60.0))
        inject(_events(spark, rows))
        for r in cx.events_psi_value_drift(spark, "x").collect():
            assert r["psi"] == 0.0
            assert r["n_buckets_used"] == 2 and r["n_buckets_zero"] == 0

    def test_disjoint_buckets_counted_not_fudged(self, spark, inject):
        # A all in bucket 0, B all in bucket 1: every bucket has a
        # structural zero on one side -> excluded and counted, psi 0
        rows = [(1, TS0, 1, "A", 10.0), (2, TS0, 1, "A", 11.0),
                (3, TS0, 1, "B", 30.0), (4, TS0, 1, "B", 31.0)]
        inject(_events(spark, rows))
        for r in cx.events_psi_value_drift(spark, "x").collect():
            assert r["psi"] == 0.0
            assert r["n_buckets_used"] == 0 and r["n_buckets_zero"] == 2

    def test_hand_computed_psi(self, spark, inject):
        # A: shares [3/4, 1/4]; B(rest of A) symmetric -> psi =
        # 2 * (1/2) * ln(3) for both types
        rows = ([(i, TS0, 1, "A", 10.0) for i in range(3)]
                + [(3, TS0, 1, "A", 30.0)]
                + [(4, TS0, 1, "B", 10.0)]
                + [(5 + i, TS0, 1, "B", 30.0) for i in range(3)])
        inject(_events(spark, rows))
        out = cx.events_psi_value_drift(spark, "x").collect()
        expect = round(round(0.5 * math.log(3) * 1e6) * 2 / 1e6, 6)
        for r in out:
            assert r["psi"] == expect
            assert r["n_type"] == 4 and r["n_rest"] == 4

    def test_real_data_shape(self, spark, sf_dir):
        rows = cx.events_psi_value_drift(spark, sf_dir).collect()
        assert len(rows) == 5
        for r in rows:
            assert r["psi"] >= 0.0
            assert r["n_buckets_used"] + r["n_buckets_zero"] >= 1


class TestPlanShapes:
    """Physical-plan pins for the scale-load-bearing shapes (the
    test_optimizer_parity discipline): rank-filter top-k must stay a
    WindowGroupLimit (per-group bounded heap, no full-partition sort
    materialization) and the wedge join must never degrade to a
    cartesian/nested-loop product."""

    @staticmethod
    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_reservoir_uses_window_group_limit(self, spark, sf_dir):
        assert "WindowGroupLimit" in self._plan(
            cx.sample_reservoir_per_key(spark, sf_dir)
        )

    def test_hill_uses_window_group_limit(self, spark, sf_dir):
        assert "WindowGroupLimit" in self._plan(
            cx.events_hill_tail_index(spark, sf_dir)
        )

    def test_jaccard_has_no_cartesian(self, spark, sf_dir):
        p = self._plan(cx.graph_neighbor_jaccard(spark, sf_dir))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoop" not in p

    def test_binned_ecdf_broadcasts_and_skips_probe_sort(self, spark, sf_dir):
        # the whole point of the binned path: the probe side must be a
        # broadcast hash join with the report filter pushed into the
        # probe scan — no per-group sort of the fact table
        p = self._plan(cx.window_distribution_binned(spark, sf_dir))
        assert "BroadcastHashJoin" in p

    def test_bloom_probes_are_broadcast_joins(self, spark, sf_dir):
        # every bitmap probe must be a broadcast hash join against the
        # words table — a shuffle on the fact side before the bloom
        # has filtered it defeats the entire prefilter
        p = self._plan(cx.join_bloom_prefilter(spark, sf_dir))
        assert p.count("BroadcastHashJoin") >= cx._BLOOM_K
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoop" not in p

    def test_bloom_partitioned_probes_never_broadcast(self, spark, sf_dir):
        # the post-broadcast regime: every probe AND the exactness
        # join must be shuffle hash joins — the strategy that survives
        # a bitmap/dim too big for any single machine. Zero broadcast
        # anywhere on the path.
        p = self._plan(cx.join_bloom_prefilter_partitioned(spark, sf_dir))
        assert p.count("ShuffledHashJoin") >= cx._BLOOM_K + 1
        assert "BroadcastExchange" not in p
        assert "CartesianProduct" not in p

    def test_decontam_probes_broadcast_and_no_cartesian(self, spark, sf_dir):
        # every bitmap probe and the exactness join must broadcast the
        # bounded side; the corpus gram pairs must never cross-product
        p = self._plan(cx.decontam_bloom_prefilter(spark, sf_dir))
        assert p.count("BroadcastHashJoin") >= cx._BLOOM_K + 1
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoop" not in p

    def test_skew_advisor_aggregates_before_window(self, spark, sf_dir):
        # the rank window must consume the BOUNDED per-key aggregate,
        # never raw fact rows: exactly one aggregate pair below the
        # window and partial aggregation present (map-side combine)
        p = self._plan(cx.join_key_skew_advisor(spark, sf_dir))
        assert "partial_count" in p
        w = p.index("Window")
        assert "HashAggregate" in p[w:], "window must sit above the per-key agg"

    def test_bootstrap_has_partial_aggregation(self, spark, sf_dir):
        # the exploded replica pass must map-side combine: a
        # partial_sum before the exchange keeps the shuffle at O(B)
        # rows per task instead of O(n·B)
        p = self._plan(cx.stats_bootstrap_poisson_ci(spark, sf_dir))
        assert "partial_sum" in p


class TestBinnedEcdf:
    def test_tracks_exact_distribution_functions(self, spark, sf_dir):
        exact = {
            r["o_orderkey"]: r
            for r in cx.window_distribution_functions(spark, sf_dir).collect()
        }
        rows = cx.window_distribution_binned(spark, sf_dir).collect()
        assert len(rows) == len(exact)
        for r in rows:
            e = exact[r["o_orderkey"]]
            # pct_below <= true percent_rank-ish position <= pct_incl,
            # and both within the bucket-occupancy error envelope
            assert r["pct_below"] <= e["cume_dist"] + 1e-9
            assert r["pct_incl"] >= e["cume_dist"] - 1e-9
            assert abs(r["pct_incl"] - e["cume_dist"]) < 0.05
            assert abs(r["pct_below"] - e["pct_rank"]) < 0.05


class TestDecontamBloom:
    def test_planted_contamination_caught_exactly(self, spark, inject):
        # doc 17 and 34 are EVAL (id % 17 == 0); corpus doc 1 copies an
        # eval phrase (true contamination), doc 2 is clean. The exact
        # join must strip every bloom false positive, so the verdict is
        # exact regardless of FPR.
        rows = [
            (17, "the quick brown fox jumps over the lazy dog"),
            (34, "pack my box with five dozen liquor jugs"),
            (1, "intro text then the quick brown fox jumps here"),
            (2, "completely unrelated words nothing shared at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        inject(df)
        got = {r["doc_id"]: r for r in
               cx.decontam_bloom_prefilter(spark, "x").collect()}
        assert set(got) == {1, 2}
        # doc 1 shares the 3 trigrams of "the quick brown fox jumps"
        assert got[1]["contaminated"] and got[1]["n_true_hits"] == 3
        assert not got[2]["contaminated"] and got[2]["n_true_hits"] == 0
        for r in got.values():
            assert r["n_false_pos"] == r["n_bloom_pass"] - r["n_true_hits"]
            assert 0 <= r["n_bloom_pass"] <= r["n_grams"]


class TestJoinKeySkewAdvisor:
    def test_hand_computed_salt_factors(self, spark, inject):
        # keys: 1 -> 8 rows, 2 -> 3 rows, 3 -> 1 row; total 12, 3 keys,
        # mean 4. salt = ceil(n * n_keys / total): 8*3/12=2.0 -> 2,
        # 3*3/12=0.75 -> 1, 1*3/12=0.25 -> 1.
        rows = [(k, i) for k, reps in [(1, 8), (2, 3), (3, 1)]
                for i in range(reps)]
        df = spark.createDataFrame(rows, "l_suppkey long, pad long")
        inject(df)
        got = {r["suppkey"]: r for r in
               cx.join_key_skew_advisor(spark, "x").collect()}
        assert [got[k]["rank"] for k in (1, 2, 3)] == [1, 2, 3]
        assert got[1]["salt_factor"] == 2
        assert got[2]["salt_factor"] == 1 and got[3]["salt_factor"] == 1
        assert got[1]["ratio_to_mean"] == 2.0
        assert got[1]["share"] == round(8 / 12, 6)

    def test_rank_tie_breaks_on_key(self, spark, inject):
        rows = [(k, 0) for k in (5, 4)] + [(6, 0)]
        df = spark.createDataFrame(rows, "l_suppkey long, pad long")
        inject(df)
        out = cx.join_key_skew_advisor(spark, "x").collect()
        assert [r["suppkey"] for r in sorted(out, key=lambda r: r["rank"])] \
            == [4, 5, 6]


class TestBloomPartitionedEquality:
    def test_same_result_as_broadcast_sibling(self, spark, sf_dir):
        # the partitioned entry changes ONLY the exchange strategy;
        # rows must be identical to the broadcast entry
        a = sorted(map(tuple, cx.join_bloom_prefilter(spark, sf_dir).collect()))
        b = sorted(
            map(tuple, cx.join_bloom_prefilter_partitioned(spark, sf_dir).collect())
        )
        assert a == b and len(a) > 0


class TestMannWhitneyFuzz:
    """Entry-vs-oracle parity on random tiny samples — the edge
    classes the fixed corpus can't reach: an empty arm (entry must
    emit 0 rows on both engines), everything tied (z NULL), heavy
    tie mass, single observations."""

    def test_random_arms_match_oracle(self, spark, inject):
        import datetime

        import duckdb
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from warpdb_spark.inventory.curation_ext import ORACLES

        t0 = datetime.datetime(2024, 1, 1)
        sample = st.lists(
            st.tuples(st.booleans(), st.integers(0, 8)), min_size=0, max_size=14
        )

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[
                HealthCheck.too_slow,
                HealthCheck.function_scoped_fixture,
            ],
        )
        @given(obs=sample)
        def check(obs):
            rows = [
                (i, t0, i, "purchase" if arm else "click", v / 1.0)
                for i, (arm, v) in enumerate(obs)
            ]
            df = spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
            )
            inject(df)
            got = sorted(map(tuple, cx.stats_mannwhitney_u(spark, "x").collect()))
            con = duckdb.connect()
            con.register("ev_src", df.toPandas())
            want = sorted(
                map(
                    tuple,
                    con.sql(
                        ORACLES["stats_mannwhitney_u"].replace(
                            "FROM events", "FROM ev_src"
                        )
                    ).fetchall(),
                )
            )
            assert got == want

        check()


class TestBhFdrFuzz:
    """Entry-vs-oracle parity on random segment tables: degenerate
    sources (n < 2 must drop), zero-variance families (se² = 0 must
    drop), p ties resolving by source on both engines, and the BH
    prefix selection agreeing bit-for-bit."""

    def test_random_segments_match_oracle(self, spark, inject):
        import duckdb
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from warpdb_spark.inventory.curation_ext import ORACLES

        seg = st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 40)),
            min_size=1,
            max_size=25,
        )

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[
                HealthCheck.too_slow,
                HealthCheck.function_scoped_fixture,
            ],
        )
        @given(docs=seg)
        def check(docs):
            rows = [
                (i, "t", "en", f"s{s}", c) for i, (s, c) in enumerate(docs)
            ]
            df = spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, n_chars long",
            )
            inject(df)
            got = sorted(map(tuple, cx.stats_bh_fdr(spark, "x").collect()))
            con = duckdb.connect()
            con.register("docs_src", df.toPandas())
            want = sorted(
                map(
                    tuple,
                    con.sql(
                        ORACLES["stats_bh_fdr"].replace(
                            "FROM documents", "FROM docs_src"
                        )
                    ).fetchall(),
                )
            )
            assert got == want

        check()


class TestPoissonRateTest:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )

    def test_hand_computed_equal_exposure(self, spark, inject):
        import datetime
        import math

        t0 = datetime.datetime(2024, 1, 1)
        h = datetime.timedelta
        # boundary non-error events pin [mn, mx] to exactly 4h → the
        # midpoint splits exposure 50/50, p0 = 0.5 exactly
        rows = [
            (0, t0, 0, "view", 1.0),
            (1, t0 + h(hours=4), 0, "view", 1.0),
            (2, t0 + h(minutes=30), 1, "error", 1.0),
            (3, t0 + h(minutes=60), 1, "error", 1.0),
            (4, t0 + h(minutes=90), 1, "error", 1.0),
            (5, t0 + h(hours=3), 1, "error", 1.0),
        ]
        inject(self._ev(spark, rows))
        r = cx.stats_poisson_rate_test(spark, "x").collect()
        assert len(r) == 1
        row = r[0]
        assert (row["n_before"], row["n_after"]) == (3, 1)
        assert row["rate_ratio"] == 3.0
        # z = (c1 - C*0.5)/sqrt(C*0.25) = (3-2)/1 = 1
        assert row["z_score"] == 1.0
        assert abs(row["p_value"] - math.erfc(1 / math.sqrt(2))) < 1e-6

    def test_no_errors_yields_no_row(self, spark, inject):
        import datetime

        t0 = datetime.datetime(2024, 1, 1)
        rows = [(0, t0, 0, "view", 1.0),
                (1, t0 + datetime.timedelta(hours=2), 0, "view", 1.0)]
        inject(self._ev(spark, rows))
        assert cx.stats_poisson_rate_test(spark, "x").collect() == []

    def test_direction_and_null_ratio(self, spark, inject):
        import datetime

        t0 = datetime.datetime(2024, 1, 1)
        h = datetime.timedelta
        rows = [
            (0, t0, 0, "view", 1.0),
            (1, t0 + h(hours=4), 0, "view", 1.0),
            (2, t0 + h(hours=3), 1, "error", 1.0),
            (3, t0 + h(minutes=200), 1, "error", 1.0),
        ]
        inject(self._ev(spark, rows))
        row = cx.stats_poisson_rate_test(spark, "x").collect()[0]
        assert row["n_before"] == 0 and row["n_after"] == 2
        assert row["z_score"] < 0  # rate rose in the second half
        assert row["rate_ratio"] == 0.0

    def test_aa_on_real_data(self, spark, sf_dir):
        row = cx.stats_poisson_rate_test(spark, sf_dir).collect()[0]
        # uniform synthetic arrivals: halves should be rate-similar
        assert abs(row["z_score"]) < 4
        assert 0 < row["p_value"] <= 1


@pytest.mark.slow
class TestDecontamBloomFuzz:
    """Tokenizer/trigram/bloom edge parity: random short documents —
    punctuation-only, fewer than 3 tokens, repeated grams, mixed
    case — through the Spark entry and its DuckDB oracle on the same
    rows. Catches normalizer or bitmap drift that the fixed corpus
    (long clean synthetic docs) would never touch."""

    def test_random_docs_match_oracle(self, spark, inject):
        import duckdb
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from warpdb_spark.inventory.curation_ext import ORACLES

        word = st.text(
            alphabet="ab1.!Z ", min_size=0, max_size=6
        )
        doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[
                HealthCheck.too_slow,
                HealthCheck.function_scoped_fixture,
            ],
        )
        @given(texts=st.lists(doc, min_size=2, max_size=10))
        def check(texts):
            rows = [(i, t) for i, t in enumerate(texts)]
            df = spark.createDataFrame(rows, "doc_id long, text string")
            inject(df)
            import warpdb_spark.inventory.curation_ext as cx_

            got = sorted(
                map(tuple, cx_.decontam_bloom_prefilter(spark, "x").collect())
            )
            con = duckdb.connect()
            con.register("docs_src", df.toPandas())
            want = sorted(
                map(
                    tuple,
                    con.sql(
                        ORACLES["decontam_bloom_prefilter"].replace(
                            "FROM documents", "FROM docs_src"
                        )
                    ).fetchall(),
                )
            )
            assert got == want

        check()
