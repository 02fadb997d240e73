"""Property-based cross-check of the dialect front-end: random
expressions evaluated by the WarpDB engine (parser → Column compiler →
Spark) must agree with DuckDB evaluating the identical text as SQL.
This is the randomized correctness layer the reference lacks
(SURVEY §5)."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from warpdb_spark.api import WarpDB

ROWS = [(10.5, 3.0), (20.0, 4.0), (15.25, 2.0), (30.0, 5.0)]


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("prop") / "t.csv"
    p.write_text("price,quantity\n" + "\n".join(f"{a},{b}" for a, b in ROWS) + "\n")
    # float64 schema so both engines compute in double precision
    return WarpDB(str(p), schema=["float64", "float64"], spark=spark, table_name="t")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(price DOUBLE, quantity DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    return con


# literals chosen to avoid division-by-zero and keep magnitudes tame
_literals = st.sampled_from(["1", "2", "3.5", "0.25", "10", "7"])
_columns = st.sampled_from(["price", "quantity"])
_atoms = st.one_of(_literals, _columns)


def _binop(children, ops):
    return st.tuples(st.sampled_from(ops), children, children).map(
        lambda t: f"({t[1]} {t[0]} {t[2]})"
    )


_arith = st.recursive(
    _atoms, lambda kids: _binop(kids, ["+", "-", "*"]) | _binop(_atoms, ["/"]), max_leaves=8
)
_predicate = _binop(_arith, [">", "<", ">=", "<=", "==", "!="])
_boolean = st.recursive(_predicate, lambda kids: _binop(kids, ["AND", "OR"]), max_leaves=4)


def _duck_text(expr: str) -> str:
    return expr.replace("==", "=")


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=_arith)
def test_arithmetic_matches_duckdb(db, duck, expr):
    got = sorted(r[0] for r in db.query(expr).collect())
    want = sorted(
        r[0] for r in duck.execute(f"SELECT {_duck_text(expr)} FROM t").fetchall()
    )
    assert got == pytest.approx(want, rel=1e-12, abs=1e-12), expr


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(cond=_boolean)
def test_where_matches_duckdb(db, duck, cond):
    got = sorted(r[0] for r in db.query(f"price WHERE {cond}").collect())
    want = sorted(
        r[0]
        for r in duck.execute(f"SELECT price FROM t WHERE {_duck_text(cond)}").fetchall()
    )
    assert got == pytest.approx(want), cond


# --- full query-pipeline properties -----------------------------------------

_agg_fns = st.sampled_from(["SUM", "AVG", "MIN", "MAX", "COUNT"])
_group_cols = st.sampled_from(["quantity", "price"])


@st.composite
def _query_spec(draw):
    group = draw(_group_cols)
    fn = draw(_agg_fns)
    arg = draw(_arith)
    having = draw(st.booleans())
    desc = draw(st.booleans())
    limit = draw(st.integers(min_value=1, max_value=5))
    use_where = draw(st.booleans())
    return group, fn, arg, having, desc, limit, use_where


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(spec=_query_spec())
def test_query_pipeline_matches_duckdb(db, duck, spec):
    group, fn, arg, having, desc, limit, use_where = spec
    where = " WHERE price > 11" if use_where else ""
    hav = f" HAVING COUNT({group}) >= 1" if having else ""
    order = "DESC" if desc else "ASC"
    sql = (
        f"SELECT {group} AS g, {fn}({arg}) AS v FROM t{where} "
        f"GROUP BY {group}{hav} ORDER BY {group} {order} LIMIT {limit}"
    )
    got = [(r.g, r.v) for r in db.query_sql(sql).collect()]
    want = duck.execute(_duck_text(sql)).fetchall()
    assert len(got) == len(want), sql
    for (g1, v1), (g2, v2) in zip(got, want):
        assert g1 == pytest.approx(g2), sql
        assert v1 == pytest.approx(v2, rel=1e-12, abs=1e-12), sql


# --- QUALIFY: randomized cross-check against DuckDB's native QUALIFY ---

_Q_ROWS = [
    (1, "a", 10.5), (2, "a", 20.0), (3, "a", 20.0), (4, "b", 15.25),
    (5, "b", 30.0), (6, "c", 7.75), (7, "c", 7.75), (8, "c", 12.0),
]


@pytest.fixture(scope="module")
def qdb(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("prop_q") / "t2.csv"
    p.write_text("id,grp,price\n" + "\n".join(f"{i},{g},{v}" for i, g, v in _Q_ROWS) + "\n")
    return WarpDB(
        str(p), schema=["int64", "string", "float64"], spark=spark, table_name="t2"
    )


@pytest.fixture(scope="module")
def qduck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t2(id BIGINT, grp VARCHAR, price DOUBLE)")
    con.executemany("INSERT INTO t2 VALUES (?, ?, ?)", _Q_ROWS)
    return con


_wfuncs = st.sampled_from(
    ["row_number()", "rank()", "dense_rank()", "count(*)", "sum(price)"]
)
_partitions = st.sampled_from(["", "PARTITION BY grp "])
_dirs = st.sampled_from(["ASC", "DESC"])
_qpreds = st.sampled_from(["w <= 1", "w = 1", "w <= 2", "w >= 2", "w > 1"])


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(wf=_wfuncs, part=_partitions, d=_dirs, pred=_qpreds)
def test_qualify_matches_duckdb(qdb, qduck, wf, part, d, pred):
    # deterministic total order inside every window: (price dir, id)
    sql = (
        f"SELECT id, {wf} OVER ({part}ORDER BY price {d}, id) AS w "
        f"FROM t2 QUALIFY {pred} ORDER BY id"
    )
    got = [(r["id"], r["w"]) for r in qdb.query_sql(sql).collect()]
    want = [tuple(r) for r in qduck.execute(sql).fetchall()]
    # normalize sum(price) DOUBLE vs others BIGINT across engines
    norm = lambda rows: [(i, round(float(w), 9)) for i, w in rows]
    assert norm(got) == norm(want), sql


# --- compound set-ops: randomized chains vs DuckDB (ANSI precedence) ---

_sops = st.sampled_from(
    ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]
)
_branch_preds = st.sampled_from(
    ["price > 11", "quantity >= 3", "price < 25", "quantity == 4", "price >= 10.5"]
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    preds=st.lists(_branch_preds, min_size=2, max_size=4),
    ops=st.lists(_sops, min_size=3, max_size=3),
)
def test_setop_chain_matches_duckdb(db, duck, preds, ops):
    """Random compound SELECT chains (mixing every set-op incl. the ALL
    variants) must resolve operands, precedence (INTERSECT over
    UNION/EXCEPT), and bag-vs-set semantics exactly as DuckDB does on
    the identical text."""
    branches = [f"SELECT price FROM t WHERE {p}" for p in preds]
    sql = branches[0]
    for i, b in enumerate(branches[1:]):
        sql += f" {ops[i]} {b}"
    got = sorted(r.price for r in db.query_sql(sql).collect())
    want = sorted(v for (v,) in duck.execute(_duck_text(sql)).fetchall())
    assert got == pytest.approx(want), sql


# --- grouping modes fuzz ------------------------------------------------------

GROUP_ROWS = [
    ("a", "x", 1.0), ("a", "y", 2.0), ("a", "y", 3.0),
    ("b", "x", 4.0), ("b", "z", 5.0), ("c", "z", 6.0), ("c", None, 7.0),
]


@pytest.fixture(scope="module")
def gdb(spark):
    df = spark.createDataFrame(GROUP_ROWS, "k1 string, k2 string, v double")
    return WarpDB(df=df, table_name="g", spark=spark)


@pytest.fixture(scope="module")
def gduck():
    con = duckdb.connect()
    con.execute("CREATE TABLE g(k1 VARCHAR, k2 VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", GROUP_ROWS)
    return con


_keysets = st.sampled_from([("k1",), ("k2",), ("k1", "k2"), ("k2", "k1")])
_aggsel = st.sampled_from(
    ["sum(v) AS s", "count(*) AS s", "min(v) AS s", "max(v) AS s", "avg(v) AS s"]
)
_mode = st.sampled_from(["ROLLUP", "CUBE"])


def _norm_rows(rows):
    # NULL-safe order-insensitive compare; floats rounded
    def cell(v):
        if v is None:
            return "~"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    return sorted(",".join(cell(c) for c in r) for r in rows)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(keys=_keysets, agg=_aggsel, mode=_mode)
def test_rollup_cube_matches_duckdb(gdb, gduck, keys, agg, mode):
    cols = ", ".join(keys)
    gflags = ", ".join(f"grouping({k}) AS g_{k}" for k in keys)
    q = f"SELECT {cols}, {agg}, {gflags} FROM g GROUP BY {mode}({cols})"
    got = _norm_rows(tuple(r) for r in gdb.query_sql(q).collect())
    want = _norm_rows(gduck.execute(q).fetchall())
    assert got == want, q


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    sets=st.lists(
        st.sampled_from(["(k1, k2)", "(k1)", "(k2)", "()"]),
        min_size=1, max_size=3, unique=True,
    ),
    agg=_aggsel,
)
def test_grouping_sets_matches_duckdb(gdb, gduck, sets, agg):
    # select only keys covered by the union of sets (selecting an
    # uncovered column is an error in BOTH engines — separate test)
    union = [k for k in ("k1", "k2") if any(k in s for s in sets)]
    sel = (", ".join(union) + ", ") if union else ""
    q = f"SELECT {sel}{agg} FROM g GROUP BY GROUPING SETS ({', '.join(sets)})"
    got = _norm_rows(tuple(r) for r in gdb.query_sql(q).collect())
    want = _norm_rows(gduck.execute(q).fetchall())
    assert got == want, q


def test_grouping_sets_uncovered_column_errors(gdb):
    from warpdb_spark.errors import ValidationError

    with pytest.raises(ValidationError):
        gdb.query_sql(
            "SELECT k1, k2, sum(v) AS s FROM g GROUP BY GROUPING SETS ((k1))"
        )


# --- event-time RANGE frames with INTERVAL bounds vs DuckDB ---

_EV_ROWS = [
    (i, f"u{i % 3}", f"2024-01-01 {i % 24:02d}:{(i * 17) % 60:02d}:{(i * 13) % 60:02d}", float(i % 7) + 0.5)
    for i in range(48)
]


@pytest.fixture(scope="module")
def fdb(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("prop_f") / "t3.csv"
    p.write_text(
        "id,grp,ts,price\n"
        + "\n".join(f"{i},{g},{t},{v}" for i, g, t, v in _EV_ROWS)
        + "\n"
    )
    db = WarpDB(
        str(p),
        schema=["int64", "string", "timestamp", "float64"],
        spark=spark,
        table_name="t3",
    )
    return db


@pytest.fixture(scope="module")
def fduck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t3(id BIGINT, grp VARCHAR, ts TIMESTAMP, price DOUBLE)")
    con.executemany("INSERT INTO t3 VALUES (?, ?, ?, ?)", _EV_ROWS)
    return con


_famounts = st.sampled_from(["30 seconds", "5 minutes", "1 hour", "3 hours", "1 day"])
_ffuncs = st.sampled_from(["SUM(price)", "COUNT(*)", "MIN(price)", "MAX(price)"])
_fparts = st.sampled_from(["", "PARTITION BY grp "])
_fends = st.sampled_from(["CURRENT ROW", "INTERVAL '10 minutes' FOLLOWING"])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(amount=_famounts, fn=_ffuncs, part=_fparts, end=_fends)
def test_interval_range_frame_matches_duckdb(fdb, fduck, amount, fn, part, end):
    """Randomized event-time RANGE frames (unit mix, PRECEDING-only and
    centered, with/without partitions) must frame exactly as DuckDB's
    native INTERVAL RANGE — the micros-offset lowering may not drift
    by even one row."""
    sql = (
        f"SELECT id, round({fn} OVER ({part}ORDER BY ts "
        f"RANGE BETWEEN INTERVAL '{amount}' PRECEDING AND {end}), 6) AS w "
        f"FROM t3 ORDER BY id"
    )
    got = [(r["id"], r["w"]) for r in fdb.query_sql(sql).collect()]
    want = [tuple(r) for r in fduck.execute(sql).fetchall()]
    norm = lambda rows: [(i, round(float(w), 6)) for i, w in rows]
    assert norm(got) == norm(want), sql


# --- aggregate FILTER clauses vs DuckDB ---

_filter_preds = st.sampled_from(
    ["price > 11", "id >= 3", "price < 25", "id % 2 = 0", "price >= 10.5"]
)
_filter_aggs = st.sampled_from(
    ["COUNT(*)", "SUM(price)", "MIN(price)", "MAX(id)", "AVG(price)"]
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(agg=_filter_aggs, pred=_filter_preds, pred2=_filter_preds)
def test_agg_filter_matches_duckdb(qdb, qduck, agg, pred, pred2):
    """Randomized FILTER (WHERE ...) combinations — two filtered
    aggregates per query, grouped — must match DuckDB exactly."""
    sql = (
        f"SELECT grp, {agg} FILTER (WHERE {pred}) AS a, "
        f"COUNT(*) FILTER (WHERE {pred2}) AS b "
        f"FROM t2 GROUP BY grp ORDER BY grp"
    )
    got = [tuple(r) for r in qdb.query_sql(sql).collect()]
    want = qduck.execute(sql).fetchall()
    norm = lambda rows: [
        tuple(round(float(c), 9) if isinstance(c, (int, float)) and c is not None else c for c in r)
        for r in rows
    ]
    assert norm(got) == norm(want), sql


# --- DISTINCT ON: randomized cross-check against DuckDB's native form ---

_don_tie = st.sampled_from(["price ASC, id", "price DESC, id", "id DESC"])
_don_where = st.sampled_from(["", "WHERE price > 10 ", "WHERE id >= 2 "])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(tie=_don_tie, where=_don_where)
def test_distinct_on_matches_duckdb(qdb, qduck, tie, where):
    """DISTINCT ON keeps the first row per ON-group under ORDER BY —
    the chosen ROW (not just the key) must match DuckDB exactly, for
    every tie-break direction and pre-filter."""
    sql = (
        f"SELECT DISTINCT ON (grp) grp, id, price FROM t2 {where}"
        f"ORDER BY grp, {tie}"
    )
    got = [tuple(r) for r in qdb.query_sql(sql).collect()]
    want = [tuple(r) for r in qduck.execute(sql).fetchall()]
    assert got == want, sql


# --- STRING_AGG / ARRAY_AGG: randomized order-key cross-check ---------------

_OA_ROWS = [
    (1, "g1", "e"), (2, "g1", "a"), (3, "g1", "c"), (4, "g2", "b"),
    (5, "g2", "d"), (6, "g3", "f"), (7, "g3", "a"), (8, "g3", "b"),
]


@pytest.fixture(scope="module")
def oadb(spark, tmp_path_factory):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(k=k, g=g, v=v) for k, g, v in _OA_ROWS])
    return WarpDB(df=df, table_name="t", spark=spark)


@pytest.fixture(scope="module")
def oaduck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT, g VARCHAR, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", _OA_ROWS)
    return con


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    key=st.sampled_from(["k", "v", "k + 1", "0 - k"]),
    desc=st.booleans(),
    use_filter=st.booleans(),
)
def test_string_agg_order_matches_duckdb(oadb, oaduck, key, desc, use_filter):
    """Unique order keys (k and v are unique per group) — the engines'
    tie-break contracts differ, so uniqueness isolates the ordering
    machinery itself: direction, expression keys, FILTER composition."""
    d = "DESC" if desc else "ASC"
    filt = " FILTER (WHERE k != 4)" if use_filter else ""
    sql = (
        f"SELECT g, STRING_AGG(v, ',' ORDER BY {key} {d}){filt} AS s "
        "FROM t GROUP BY g ORDER BY g"
    )
    got = [(r.g, r.s) for r in oadb.query_sql(sql).collect()]
    want = oaduck.execute(sql).fetchall()
    # DuckDB renders an empty group (all rows filtered) as NULL; our
    # array_join renders '' — normalize both to ''
    want = [(g, s or "") for g, s in want]
    got = [(g, s or "") for g, s in got]
    assert got == want, sql


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    key=st.sampled_from(["k", "v", "k * 2"]),
    desc=st.booleans(),
)
def test_array_agg_order_matches_duckdb(oadb, oaduck, key, desc):
    d = "DESC" if desc else "ASC"
    sql = (
        f"SELECT g, ARRAY_AGG(v ORDER BY {key} {d}) AS a "
        "FROM t GROUP BY g ORDER BY g"
    )
    got = [(r.g, list(r.a)) for r in oadb.query_sql(sql).collect()]
    want = [(g, list(a)) for g, a in oaduck.execute(sql).fetchall()]
    assert got == want, sql


# --- star modifiers / TRY_CAST / WITH TIES: randomized cross-check ----------

_SM_ROWS = [
    (1, "7", 10.5), (2, "x", 20.0), (3, "15", 20.0), (4, "", 15.25),
    (5, "-3", 30.0), (6, "2.5", 7.75), (7, "0", 7.75), (8, "oops", 20.0),
]


@pytest.fixture(scope="module")
def smdb(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(k=k, s=s, v=v) for k, s, v in _SM_ROWS])
    return WarpDB(df=df, table_name="t", spark=spark)


@pytest.fixture(scope="module")
def smduck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT, s VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", _SM_ROWS)
    return con


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    ex=st.sampled_from(["k", "s", "v"]),
    rep_target=st.sampled_from(["k", "v"]),
    rep_expr=st.sampled_from(["k + 100", "v * 2", "k - v"]),
)
def test_star_modifiers_match_duckdb(smdb, smduck, ex, rep_target, rep_expr):
    if rep_target == ex:
        rep_target = "s" if ex != "s" else "k"
        if rep_target == ex:
            return
    sql = (
        f"SELECT * EXCLUDE ({ex}) REPLACE ({rep_expr} AS {rep_target}) "
        "FROM t ORDER BY 1"
    )
    # ORDER BY ordinal isn't in our dialect — order client-side instead
    sql_ours = (
        f"SELECT * EXCLUDE ({ex}) REPLACE ({rep_expr} AS {rep_target}) FROM t"
    )
    got_df = smdb.query_sql(sql_ours)
    want = smduck.execute(sql_ours).fetchall()
    got = [tuple(r) for r in got_df.collect()]
    assert sorted(map(repr, got)) == sorted(map(repr, want)), sql_ours
    assert got_df.columns == [d[0] for d in smduck.execute(sql_ours).description]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(typ=st.sampled_from(["INT", "DOUBLE", "BIGINT"]))
def test_try_cast_matches_duckdb(smdb, smduck, typ):
    """Known engine divergence (found by this fuzz, documented in the
    dialect_try_cast entry): DuckDB casts decimal STRINGS to integer
    types by rounding ('2.5' -> 3), Spark's try_cast yields NULL. The
    dialect keeps Spark semantics; the comparison therefore excludes
    decimal-string -> integer inputs (row k=6)."""
    sql = f"SELECT k, TRY_CAST(s AS {typ}) AS c FROM t WHERE k != 6"
    got = {r.k: r.c for r in smdb.query_sql(sql).collect()}
    want = dict(smduck.execute(sql).fetchall())
    for k in want:
        if got[k] is None or want[k] is None:
            assert got[k] == want[k], (sql, k)
        else:
            assert got[k] == pytest.approx(want[k]), (sql, k)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(n=st.integers(min_value=1, max_value=6), desc=st.booleans())
def test_with_ties_matches_duckdb_rank_replay(smdb, smduck, n, desc):
    d = "DESC" if desc else "ASC"
    got = smdb.query_sql(
        f"SELECT k, v FROM t ORDER BY v {d} LIMIT {n} WITH TIES"
    ).collect()
    want = smduck.execute(
        f"WITH r AS (SELECT k, v, rank() OVER (ORDER BY v {d}) AS rk FROM t) "
        f"SELECT k, v FROM r WHERE rk <= {n}"
    ).fetchall()
    assert sorted((r.k, r.v) for r in got) == sorted(want)


# --- sentence_split UDTF vs DuckDB (round 5) --------------------------------

_frag = st.sampled_from(
    ["alpha", "b", ". ", ".", " ", "", "é", "漢字", "x. y", "..", ". . ", "end."]
)
_doc = st.lists(_frag, max_size=10).map("".join)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=st.lists(_doc, min_size=1, max_size=4))
@pytest.mark.slow
def test_sentence_split_matches_duckdb(spark, texts):
    """The production oracle (struct-comprehension split + windowed
    length sums) must agree with the UDTF row-for-row on arbitrary
    corpora — separators at edges, consecutive separators, empty docs,
    multi-byte code points. Lengths are code-point counts in BOTH
    engines (verified: DuckDB len() == Python len() incl. astral)."""
    import pandas as pd

    from warpdb_spark.api import WarpDB
    from warpdb_spark.inventory.core_sql import ORACLES

    # doc_ids multiples of 25 so the entry's sampling predicate keeps all
    rows = [(i * 25, t) for i, t in enumerate(texts)]
    db = WarpDB(
        df=spark.createDataFrame(rows, ["doc_id", "text"]),
        table_name="documents",
        spark=spark,
    )
    got = db.query_sql(
        "SELECT doc_id, sent_idx, sentence, char_start, char_end "
        "FROM sentence_split(documents.text) WHERE doc_id % 25 = 0 "
        "ORDER BY doc_id, sent_idx"
    ).collect()

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.execute(ORACLES["dialect_udtf_sentences"]).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


_words = st.sampled_from(["w0", "w1", "w2", "w3", "w4", "the", "a"])
_run_doc = st.lists(_words, max_size=20).map(" ".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=st.lists(_run_doc, min_size=2, max_size=5))
def test_max_shared_run_matches_duckdb(spark, texts):
    """Random small-vocabulary corpora (dense accidental overlaps,
    repeated words, blank docs) — the JVM arrays_overlap ladder and
    DuckDB's comprehension ladder must emit the identical pair set and
    run lengths."""
    import pandas as pd

    import warpdb_spark.inventory.scale_ops as so

    rows = [(i, "en", "web", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])
    orig = so._t
    so._t = lambda spark, sf_dir, name: df
    try:
        got = sorted(tuple(r) for r in so.dedup_max_shared_run(spark, "x").collect())
    finally:
        so._t = orig

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "lang", "source", "text"])
    )
    want = sorted(tuple(r) for r in con.execute(so.ORACLES["dedup_max_shared_run"]).fetchall())
    assert got == want


# --- window frame fuzz (round 5): ROWS BETWEEN bounds vs DuckDB -------------
# price values in _Q_ROWS are exact binary fractions, so frame sums are
# association-insensitive and the comparison is exact at 6dp.

_frame_fn = st.sampled_from(
    ["sum(price)", "min(price)", "max(price)", "count(price)", "avg(price)"]
)
_frame_lo = st.sampled_from(
    ["UNBOUNDED PRECEDING", "2 PRECEDING", "1 PRECEDING", "CURRENT ROW"]
)
_frame_hi = st.sampled_from(
    ["CURRENT ROW", "1 FOLLOWING", "2 FOLLOWING", "UNBOUNDED FOLLOWING"]
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(fn=_frame_fn, lo=_frame_lo, hi=_frame_hi, part=_partitions)
def test_rows_frame_matches_duckdb(qdb, qduck, fn, lo, hi, part):
    sql = (
        f"SELECT id, round({fn} OVER ({part}ORDER BY id "
        f"ROWS BETWEEN {lo} AND {hi}), 6) AS s FROM t2 ORDER BY id"
    )
    got = [(r.id, r.s) for r in qdb.query_sql(sql).collect()]
    want = qduck.execute(sql).fetchall()
    assert got == [(i, v) for i, v in want], sql


_gb_where = st.sampled_from(["", "WHERE price > 8 ", "WHERE id % 2 = 0 ", "WHERE grp != 'b' "])
_gb_having = st.sampled_from(["", "HAVING count(*) > 1 ", "HAVING sum(price) > 20 "])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(w=_gb_where, h=_gb_having)
def test_group_by_all_pipeline_matches_duckdb(qdb, qduck, w, h):
    """GROUP BY ALL + HAVING + ORDER BY ALL: identical text on both
    engines (DuckDB invented the ALL shorthands; the dialect adopted
    them), random WHERE/HAVING composition."""
    sql = (
        "SELECT grp, round(sum(price), 6) AS sv, count(*) AS n "
        f"FROM t2 {w}GROUP BY ALL {h}ORDER BY ALL"
    )
    got = [(r.grp, r.sv, r.n) for r in qdb.query_sql(sql).collect()]
    want = qduck.execute(sql).fetchall()
    assert got == [tuple(r) for r in want], sql


# --- round-5 late-entry fuzzes: oracle strings replayed on random data ------

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=st.lists(_doc, min_size=1, max_size=4))
def test_readability_matches_duckdb(spark, texts):
    """text_readability_fk vs its oracle on arbitrary corpora — word/
    sentence/syllable counting edge cases (blank docs, separators at
    edges, multi-byte chars, no vowels)."""
    import pandas as pd

    import warpdb_spark.inventory.pipeline_ops as po

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    orig = po._t
    po._t = lambda s, d, n: df
    try:
        got = sorted(tuple(r) for r in po.text_readability_fk(spark, "x").collect())
    finally:
        po._t = orig
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(tuple(r) for r in con.execute(po.ORACLES["text_readability_fk"]).fetchall())
    assert got == want


# NULL values included: the prefix walk must order them identically on
# both engines (Spark's bare ASC is NULLS FIRST, DuckDB's is NULLS
# LAST — the entry spells asc_nulls_last to agree)
_wm_vals = st.sampled_from([1.0, 2.5, 2.5, 7.25, 10.0, -3.5, None])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b"]), _wm_vals, st.integers(0, 9)),
    min_size=1, max_size=12,
))
def test_weighted_median_matches_duckdb(spark, rows):
    """agg_weighted_median vs its oracle on random groups with
    duplicate values, NULL values, and varied integer weights — the
    cumulative-weight prefix walk must agree exactly."""
    import pyarrow as pa

    import warpdb_spark.inventory.scale_ops as so

    data = [(i, t, v, u) for i, (t, v, u) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "event_id long, event_type string, value double, user_id long"
    )
    orig = so._t
    so._t = lambda s, d, n: df
    try:
        got = sorted(tuple(r) for r in so.agg_weighted_median(spark, "x").collect())
    finally:
        so._t = orig
    con = duckdb.connect()
    # arrow keeps None a true NULL (a pandas float column would turn it
    # into NaN, which DuckDB treats as a value, not NULL)
    con.register(
        "events",
        pa.table({
            "event_id": pa.array([d[0] for d in data], pa.int64()),
            "event_type": pa.array([d[1] for d in data], pa.string()),
            "value": pa.array([d[2] for d in data], pa.float64()),
            "user_id": pa.array([d[3] for d in data], pa.int64()),
        }),
    )
    want = sorted(tuple(r) for r in con.execute(so.ORACLES["agg_weighted_median"]).fetchall())
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b"]), _wm_vals),
    min_size=1, max_size=12,
))
def test_winsorize_matches_duckdb_with_nulls(spark, rows):
    """events_value_winsorize vs its oracle on random groups including
    NULL values — the rank window must place NULLs last on both
    engines and the CASE-form clamp must keep NULL rows NULL (the
    agg_weighted_median NULL-ordering rule, applied to the other
    selected-rank entry)."""
    import pyarrow as pa

    import warpdb_spark.inventory.scale_ops as so

    data = [(i, t, v) for i, (t, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "event_id long, event_type string, value double"
    )
    orig = so._t
    so._t = lambda s, d, n: df
    try:
        got = sorted(tuple(r) for r in so.events_value_winsorize(spark, "x").collect())
    finally:
        so._t = orig
    con = duckdb.connect()
    con.register(
        "events",
        pa.table({
            "event_id": pa.array([d[0] for d in data], pa.int64()),
            "event_type": pa.array([d[1] for d in data], pa.string()),
            "value": pa.array([d[2] for d in data], pa.float64()),
        }),
    )
    want = sorted(
        tuple(r) for r in con.execute(so.ORACLES["events_value_winsorize"]).fetchall()
    )
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b"]), _wm_vals, st.integers(0, 9)),
    min_size=1, max_size=12,
))
def test_weighted_median_approx_matches_duckdb_with_nulls(spark, rows):
    """agg_weighted_median_approx vs its oracle on groups with NULL
    values: percentile_approx ignores NULLs, so the entry must filter
    them up front on BOTH sides or the oracle's cumulative-weight walk
    counts NULL rows' weights toward the crossing and the rank-check
    booleans flip between engines."""
    import pyarrow as pa

    import warpdb_spark.inventory.scale_ops as so

    data = [(i, t, v, u) for i, (t, v, u) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "event_id long, event_type string, value double, user_id long"
    )
    orig = so._t
    so._t = lambda s, d, n: df
    try:
        got = sorted(
            tuple(r) for r in so.agg_weighted_median_approx(spark, "x").collect()
        )
    finally:
        so._t = orig
    con = duckdb.connect()
    con.register(
        "events",
        pa.table({
            "event_id": pa.array([d[0] for d in data], pa.int64()),
            "event_type": pa.array([d[1] for d in data], pa.string()),
            "value": pa.array([d[2] for d in data], pa.float64()),
            "user_id": pa.array([d[3] for d in data], pa.int64()),
        }),
    )
    want = sorted(
        tuple(r)
        for r in con.execute(so.ORACLES["agg_weighted_median_approx"]).fetchall()
    )
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=st.lists(
    st.tuples(
        _wm_vals, st.one_of(st.none(), st.integers(0, 9))
    ),
    min_size=0, max_size=12,
))
def test_welch_ztest_matches_duckdb_with_nulls(spark, rows):
    """events_ab_welch_ztest vs its oracle on purchase rows including
    NULL values and NULL user_ids: both must be filtered up front or a
    NULL value inflates an arm's n while dropping out of the moment
    sums, silently deflating the mean. Four fixed rows keep both arms
    at n >= 2 so the variance denominators stay positive."""
    import pyarrow as pa

    import warpdb_spark.inventory.curation_ext as cx

    anchored = [(10.0, 0), (20.0, 2), (30.0, 1), (40.0, 3)] + list(rows)
    data = [(i, "purchase", v, u) for i, (v, u) in enumerate(anchored)]
    df = spark.createDataFrame(
        data, "event_id long, event_type string, value double, user_id long"
    )
    orig = cx._t
    cx._t = lambda s, d, n: df
    try:
        got = sorted(
            tuple(r) for r in cx.events_ab_welch_ztest(spark, "x").collect()
        )
    finally:
        cx._t = orig
    con = duckdb.connect()
    con.register(
        "events",
        pa.table({
            "event_id": pa.array([d[0] for d in data], pa.int64()),
            "event_type": pa.array([d[1] for d in data], pa.string()),
            "value": pa.array([d[2] for d in data], pa.float64()),
            "user_id": pa.array([d[3] for d in data], pa.int64()),
        }),
    )
    want = sorted(
        tuple(r)
        for r in con.execute(cx.ORACLES["events_ab_welch_ztest"]).fetchall()
    )
    assert got == want


# --- r10 dialect corners: QUALIFY×PIVOT, multi-measure UNPIVOT, and the
# --- r11 two-pass WITH TIES — randomized cross-checks (r10 verdict item 8)

_UPM_ROWS = [
    (1, 10.0, 1.0, None, 4.0, 2.5, 0.5),
    (2, None, None, 7.0, 8.0, None, 1.5),
    (3, 3.25, 9.0, 3.25, None, 6.0, None),
    (4, None, None, None, None, None, None),
    (5, 0.0, -1.0, 12.5, 0.0, -3.0, 7.0),
]


@pytest.fixture(scope="module")
def updb(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(k=k, a=a, b=b, c=c, d=d, e=e, f=f) for k, a, b, c, d, e, f in _UPM_ROWS]
    )
    return WarpDB(df=df, table_name="tm", spark=spark)


@pytest.fixture(scope="module")
def upduck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tm(k BIGINT, a DOUBLE, b DOUBLE, c DOUBLE, d DOUBLE, "
        "e DOUBLE, f DOUBLE)"
    )
    con.executemany("INSERT INTO tm VALUES (?, ?, ?, ?, ?, ?, ?)", _UPM_ROWS)
    return con


_up_pool = ["a", "b", "c", "d", "e", "f"]


@settings(
    max_examples=70,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    perm=st.permutations(_up_pool),
    width=st.integers(min_value=2, max_value=3),
    include_nulls=st.booleans(),
)
@pytest.mark.slow
def test_unpivot_multi_matches_duckdb(updb, upduck, perm, width, include_nulls):
    """Random multi-measure UNPIVOT — tuple width 2-3, random column
    grouping, INCLUDE NULLS on/off — must match DuckDB running the
    IDENTICAL text (all-null-tuple exclusion, per-position values,
    labels)."""
    n_tuples = len(_up_pool) // width
    tuples = [perm[i * width : (i + 1) * width] for i in range(n_tuples)]
    vals = [f"v{i}" for i in range(width)]
    inc = "INCLUDE NULLS " if include_nulls else ""
    in_list = ", ".join(
        f"({', '.join(tp)}) AS t{j}" for j, tp in enumerate(tuples)
    )
    sql = (
        f"SELECT k, m, {', '.join(vals)} FROM tm "
        f"UNPIVOT {inc}(({', '.join(vals)}) FOR m IN ({in_list})) "
        "ORDER BY k, m"
    )
    got = [tuple(r) for r in updb.query_sql(sql).collect()]
    # Engine divergence found by THIS fuzz (r11): DuckDB 1.0's default
    # exclusion drops a tuple when ANY measure is NULL; Spark SQL (and
    # this dialect, pinned by dialect_unpivot_multi's docstring) drop
    # only ALL-NULL tuples (ANSI). Replay DuckDB with INCLUDE NULLS and
    # apply the ANSI all-null exclusion explicitly.
    inner = (
        f"SELECT k, m, {', '.join(vals)} FROM tm "
        f"UNPIVOT INCLUDE NULLS (({', '.join(vals)}) FOR m IN ({in_list}))"
    )
    duck_sql = f"SELECT * FROM ({inner})"
    if not include_nulls:
        duck_sql += f" WHERE COALESCE({', '.join(vals)}) IS NOT NULL"
    duck_sql += " ORDER BY k, m"
    want = [tuple(r) for r in upduck.execute(duck_sql).fetchall()]
    assert got == want, sql


_qp_aggs = st.sampled_from(["SUM", "MIN", "MAX", "COUNT"])
_qp_pcol = st.sampled_from(["a_v", "b_v", "c_v"])
_qp_dir = st.sampled_from(["ASC NULLS FIRST", "ASC NULLS LAST", "DESC NULLS FIRST", "DESC NULLS LAST"])


@settings(
    max_examples=70,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    agg=_qp_aggs,
    pcol=_qp_pcol,
    d=_qp_dir,
    n=st.integers(min_value=1, max_value=3),
    modk=st.integers(min_value=2, max_value=3),
)
def test_qualify_over_pivot_matches_duckdb(qdb, qduck, agg, pcol, d, n, modk):
    """Random QUALIFY predicates over a PIVOT result (the r10 seam):
    the pivoted columns must feed the window predicate exactly like a
    plain frame's. DuckDB replays the pivot as CASE-aggregation (its
    PIVOT syntax differs) with the same QUALIFY text. NULLS placement
    spelled explicitly — absent (bucket, grp) combos yield NULL
    measures and the engines' defaults differ."""
    ours = (
        f"SELECT bucket, a_v, b_v, c_v FROM "
        f"(SELECT id % {modk} AS bucket, grp, price FROM t2) "
        f"PIVOT ({agg}(price) FOR grp IN ('a' AS a_v, 'b' AS b_v, 'c' AS c_v)) "
        f"QUALIFY row_number() OVER (ORDER BY {pcol} {d}, bucket) <= {n} "
        "ORDER BY bucket"
    )
    # COUNT parity: Spark's pivot yields NULL for an absent (bucket,
    # grp) combo (the aggregate never sees the group) while
    # count(CASE...) over the bucket's rows yields 0 — replay COUNT as
    # sum(CASE WHEN ... THEN 1 END), which is NULL on absent combos and
    # the count otherwise (price is never NULL in this fixture).
    def case_agg(g):
        if agg == "COUNT":
            return f"sum(CASE WHEN grp = '{g}' THEN 1 END) AS {g}_v"
        return f"{agg}(CASE WHEN grp = '{g}' THEN price END) AS {g}_v"

    cases = ", ".join(case_agg(g) for g in "abc")
    theirs = (
        f"SELECT bucket, a_v, b_v, c_v FROM "
        f"(SELECT id % {modk} AS bucket, {cases} FROM t2 GROUP BY 1) "
        f"QUALIFY row_number() OVER (ORDER BY {pcol} {d}, bucket) <= {n} "
        "ORDER BY bucket"
    )
    got = [tuple(r) for r in qdb.query_sql(ours).collect()]
    want = [tuple(r) for r in qduck.execute(theirs).fetchall()]
    norm = lambda rows: [
        tuple(None if x is None else round(float(x), 9) for x in r) for r in rows
    ]
    assert norm(got) == norm(want), (ours, theirs)


_WT_ROWS = [
    (1, 10.5), (2, 20.0), (3, 20.0), (4, None), (5, 30.0),
    (6, 7.75), (7, 7.75), (8, None), (9, 20.0), (10, 30.0),
]


@pytest.fixture(scope="module")
def wtdb(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(k=k, v=v) for k, v in _WT_ROWS])
    return WarpDB(df=df, table_name="t", spark=spark)


@pytest.fixture(scope="module")
def wtduck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", _WT_ROWS)
    return con


@settings(
    max_examples=70,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    n=st.integers(min_value=1, max_value=10),
    d1=st.sampled_from(["ASC NULLS FIRST", "ASC NULLS LAST", "DESC NULLS FIRST", "DESC NULLS LAST"]),
    mod=st.sampled_from(["v", "v % 2", "k % 3"]),
    d2=st.sampled_from(["ASC", "DESC"]),
)
@pytest.mark.slow
def test_with_ties_two_pass_matches_duckdb_rank_replay(wtdb, wtduck, n, d1, mod, d2):
    """The r11 two-pass WITH TIES against DuckDB's rank replay — NULL
    sort keys with explicit placement, duplicate boundary values,
    multi-key sorts with an expression key, n spanning past the table
    size. The boundary-filter plan must return the identical SET the
    single rank() formulation defines."""
    order = f"{mod} {d1}, k {d2}"
    got = wtdb.query_sql(
        f"SELECT k, v FROM t ORDER BY {order} LIMIT {n} WITH TIES"
    ).collect()
    want = wtduck.execute(
        f"WITH r AS (SELECT k, v, rank() OVER (ORDER BY {order}) AS rk FROM t) "
        f"SELECT k, v FROM r WHERE rk <= {n}"
    ).fetchall()
    assert sorted((r.k, r.v) for r in got) == sorted(want), order
