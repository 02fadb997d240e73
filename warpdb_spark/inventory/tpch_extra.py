"""TPC-H analog queries q2..q22 on the driver's TPC-H-ish tables.

Completes the TPC-H-style coverage started in ``core_sql`` (q1, q3,
q4, q5, q6, q10, q14, q18). The driver schema has no ``partsupp``
table and lacks comment/shipmode/commitdate columns, so the classic
queries are *adapted*: each docstring states the adaptation. The
query SHAPES (correlated scalar aggregates, anti-join "not exists",
disjunctive predicates, min-per-group, market share, distribution
histograms) are preserved — those shapes are what exercise the
engine.

Scale notes (100 TB stance, verified with .explain at sf0.1):
- region/nation/supplier/part are dimension tables → explicit
  ``F.broadcast`` so the fact scan never shuffles for them;
- orders⋈lineitem and customer⋈orders are fact-fact joins →
  single hash-partitioned shuffle each on the join key;
- correlated scalar subqueries are rewritten as window-min /
  pre-aggregated joins (one extra shuffle, never a per-row probe);
- global scalar aggregates (q11 fraction, q22 avg) become one-row
  broadcast cross-joins, not driver-side collects.

Reference parity note: WarpDB parses joins but never executes them
(include/warpdb.hpp:22, src/warpdb.cpp:321-323); everything here is
superset capability mapped onto Spark built-ins.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warpdb_spark.inventory.core_sql import _t


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 analog (no partsupp): for each ECONOMY part of size 15, the
    shipping supplier(s) with the minimum account balance. Correlated
    MIN subquery → window min over the part key (one shuffle)."""
    parts = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.withColumn("__min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__min_bal"))
        .select(
            F.col("p_partkey").alias("pk"),
            F.col("p_brand").alias("brand"),
            F.col("s_name").alias("sname"),
            F.round("s_acctbal", 2).alias("bal"),
        )
        .orderBy(F.col("bal").asc(), F.col("pk").asc(), F.col("sname").asc())
        .limit(100)
    )


def tpch_q7_volume_shipping(spark, sf_dir):
    """Q7: revenue shipped between two nations (both directions),
    by supplier nation, customer nation, and ship year."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    j = (
        li.join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            _t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(
            _t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q8_market_share(spark, sf_dir):
    """Q8: NATION_3 suppliers' share of STANDARD-part revenue sold to
    AMERICA-region customers, per order year. Conditional-sum ratio."""
    parts = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    snat = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cnat = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    amer = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    j = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(_t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(amer), F.col("c_rk") == F.col("r_regionkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def tpch_q9_product_profit(spark, sf_dir):
    """Q9 analog (no ps_supplycost): profit = revenue − 0.5 ×
    p_retailprice × quantity for parts named like '%bolt%', by
    supplier nation and order year."""
    parts = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    j = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(_t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.5) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        j.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


def tpch_q11_important_stock(spark, sf_dir):
    """Q11 analog (no partsupp): per-part shipped value by NATION_1
    suppliers, keeping parts above 0.1% of the total — a global scalar
    aggregate applied as a one-row broadcast cross-join, never a
    driver-side collect."""
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    per_part = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    total = per_part.agg(F.sum("value").alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__total") * 0.001)
        .select(F.col("l_partkey").alias("pk"), F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), F.col("pk").asc())
    )


def tpch_q12_priority_lines(spark, sf_dir):
    """Q12 analog (no l_shipmode → group by l_linestatus): count of
    high- vs low-priority orders per line status for a ship year."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    j = li.join(
        _t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(F.col("l_linestatus").alias("status"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("status")
    )


def tpch_q13_customer_distribution(spark, sf_dir):
    """Q13: distribution of customers by order count (left outer join
    so zero-order customers appear), excluding 5-LOW priority."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        _t(spark, sf_dir, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: supplier(s) with the maximum quarterly revenue — the view +
    scalar MAX subquery becomes an aggregate reused on both sides of a
    one-row broadcast join."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "__rev"
            )
        )
    )
    mx = rev.agg(F.max("__rev").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("__rev") == F.col("__max_rev"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey").alias("sk"),
            F.col("s_name").alias("sname"),
            F.round("__rev", 2).alias("total_revenue"),
        )
        .orderBy("sk")
    )


def tpch_q16_supplier_counting(spark, sf_dir):
    """Q16 analog (no partsupp): distinct shipping suppliers per
    (brand, type, size) for selected sizes, excluding Brand#13 /
    PROMO parts and negative-balance suppliers (complaint analog,
    expressed as an anti-join)."""
    parts = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(bad_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        ps.groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("ptype"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("brand").asc(),
            F.col("ptype").asc(),
            F.col("size").asc(),
        )
    )


def tpch_q17_small_qty_revenue(spark, sf_dir):
    """Q17: yearly revenue loss if small-quantity orders (< 20% of the
    part's average quantity) stopped — the correlated AVG subquery is a
    per-part pre-aggregation joined back on the part key."""
    li = _t(spark, sf_dir, "lineitem")
    parts = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("__qty_limit")
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_limit"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """Q19: revenue from an OR of three brand/size/quantity conjunction
    branches — one scan, the disjunction stays inside codegen."""
    j = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(_t(spark, sf_dir, "part")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(b1 | b2 | b3).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def tpch_q20_promotion_suppliers(spark, sf_dir):
    """Q20 analog (no partsupp): NATION_2 suppliers that shipped more
    than 100 units of small-size parts in 1997 — pre-aggregated
    threshold feeding a left-semi join (never a per-supplier probe)."""
    small_parts = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    qualifying = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(
            F.broadcast(small_parts.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 100)
    )
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select(
            F.col("s_suppkey").alias("sk"),
            F.col("s_name").alias("sname"),
            F.round("s_acctbal", 2).alias("bal"),
        )
        .orderBy("sk")
    )


def tpch_q21_single_return_supplier(spark, sf_dir):
    """Q21 analog (no receipt/commit dates): suppliers that were the
    ONLY supplier with returned lines in a multi-supplier finished
    order. The EXISTS / NOT EXISTS pair is rewritten as one per-order
    aggregation (distinct suppliers vs distinct returning suppliers) —
    one shuffle instead of two correlated probes. The qualifying
    order's single returning supplier is recovered IN the same
    aggregation (max over the R-flagged suppkeys — exact because the
    filter pins their distinct count to 1), so lineitem is scanned
    and shuffled ONCE; the old second branch re-scanned lineitem,
    re-joined it to the qualifying orders, and de-duplicated, for
    rows the first aggregation already saw (r12: ~28% faster at
    sf0.1, identical output).

    The two COUNT(DISTINCT) + MAX(CASE) trio is spelled as a
    two-level aggregation — (l_orderkey, l_suppkey) first, then
    l_orderkey — instead of the planner's multi-distinct Expand plan,
    which triples every joined lineitem row (one replica per distinct
    aggregate) before the first shuffle. The explicit spelling
    shuffles each row once and drops the Expand; the NULL semantics
    of COUNT(DISTINCT …) (nulls skipped) are reproduced by the
    pushed-down l_suppkey IS NOT NULL filter, so the output is
    bit-identical."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey").isNotNull())
    finished = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    per_supp = (
        li.join(
            finished.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.col("l_returnflag") == "R").alias("__has_r"))
    )
    order_stats = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("__n_supp"),
            F.sum(F.when(F.col("__has_r"), 1).otherwise(0)).alias("__n_ret_supp"),
            F.max(F.when(F.col("__has_r"), F.col("l_suppkey"))).alias("__ret_supp"),
        )
        .filter((F.col("__n_supp") > 1) & (F.col("__n_ret_supp") == 1))
    )
    return (
        order_stats.join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("__ret_supp") == F.col("s_suppkey"),
        )
        .groupBy(F.col("s_name").alias("sname"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("sname").asc())
        .limit(100)
    )


def tpch_q22_dormant_customers(spark, sf_dir):
    """Q22 analog: per-nation count/balance of rich customers (above
    the global average positive balance — one-row broadcast) that
    placed no 1999+ orders (anti-join)."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            recent.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("nk")
    )


QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q11_important_stock": tpch_q11_important_stock,
    "tpch_q12_priority_lines": tpch_q12_priority_lines,
    "tpch_q13_customer_distribution": tpch_q13_customer_distribution,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q16_supplier_counting": tpch_q16_supplier_counting,
    "tpch_q17_small_qty_revenue": tpch_q17_small_qty_revenue,
    "tpch_q19_disjunctive_revenue": tpch_q19_disjunctive_revenue,
    "tpch_q20_promotion_suppliers": tpch_q20_promotion_suppliers,
    "tpch_q21_single_return_supplier": tpch_q21_single_return_supplier,
    "tpch_q22_dormant_customers": tpch_q22_dormant_customers,
}

ORACLES = {
    "tpch_q2_min_cost_supplier": (
        "SELECT pk, brand, sname, bal FROM ("
        "SELECT p_partkey AS pk, p_brand AS brand, s_name AS sname, "
        "round(s_acctbal, 2) AS bal, "
        "min(s_acctbal) OVER (PARTITION BY p_partkey) AS mb, s_acctbal AS sb "
        "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE p_size = 15 AND p_type = 'ECONOMY') "
        "WHERE sb = mb ORDER BY bal, pk, sname LIMIT 100"
    ),
    "tpch_q7_volume_shipping": (
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "year(l_shipdate) AS l_year, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
    ),
    "tpch_q8_market_share": (
        "SELECT year(o_orderdate) AS o_year, "
        "round(sum(CASE WHEN n1.n_name = 'NATION_3' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / "
        "sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share "
        "FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "JOIN region ON n2.n_regionkey = r_regionkey "
        "WHERE p_type = 'STANDARD' AND r_name = 'AMERICA' "
        "GROUP BY 1 ORDER BY 1"
    ),
    "tpch_q9_product_profit": (
        "SELECT n_name AS nation, year(o_orderdate) AS o_year, "
        "round(sum(l_extendedprice * (1 - l_discount) "
        "- 0.5 * p_retailprice * l_quantity), 2) AS sum_profit "
        "FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_name LIKE '%bolt%' "
        "GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC"
    ),
    "tpch_q11_important_stock": (
        "WITH per_part AS ("
        "SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name = 'NATION_1' GROUP BY l_partkey) "
        "SELECT l_partkey AS pk, round(value, 2) AS value FROM per_part "
        "WHERE value > (SELECT sum(value) FROM per_part) * 0.001 "
        "ORDER BY value DESC, pk ASC"
    ),
    "tpch_q12_priority_lines": (
        "SELECT l_linestatus AS status, "
        # CAST: DuckDB's integer sum() is HUGEINT, which pandas renders
        # as float64 (1.0) while Spark's bigint renders 1 — hash mismatch
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY 1 ORDER BY 1"
    ),
    "tpch_q13_customer_distribution": (
        "SELECT c_count, count(*) AS custdist FROM ("
        "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer "
        "LEFT JOIN orders ON c_custkey = o_custkey "
        "AND o_orderpriority <> '5-LOW' GROUP BY c_custkey) "
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
    ),
    "tpch_q15_top_supplier": (
        "WITH rev AS (SELECT l_suppkey AS supplier_no, "
        "sum(l_extendedprice * (1 - l_discount)) AS total_rev FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
        "SELECT s_suppkey AS sk, s_name AS sname, "
        "round(total_rev, 2) AS total_revenue "
        "FROM rev JOIN supplier ON supplier_no = s_suppkey "
        "WHERE total_rev = (SELECT max(total_rev) FROM rev) ORDER BY sk"
    ),
    "tpch_q16_supplier_counting": (
        "SELECT p_brand AS brand, p_type AS ptype, p_size AS size, "
        "count(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps "
        "JOIN part ON l_partkey = p_partkey "
        "WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO' "
        "AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22) "
        "AND l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, brand, ptype, size"
    ),
    "tpch_q17_small_qty_revenue": (
        "SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_brand = 'Brand#3' AND l_quantity < ("
        "SELECT 0.2 * avg(l_quantity) FROM lineitem l2 "
        "WHERE l2.l_partkey = lineitem.l_partkey)"
    ),
    "tpch_q19_disjunctive_revenue": (
        "SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 "
        "AND l_quantity BETWEEN 1 AND 11) "
        "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 "
        "AND l_quantity BETWEEN 10 AND 20) "
        "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 "
        "AND l_quantity BETWEEN 20 AND 30)"
    ),
    "tpch_q20_promotion_suppliers": (
        "SELECT s_suppkey AS sk, s_name AS sname, round(s_acctbal, 2) AS bal "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name = 'NATION_2' AND s_suppkey IN ("
        "SELECT l_suppkey FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "WHERE p_size <= 10 "
        "AND l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY l_suppkey HAVING sum(l_quantity) > 100) ORDER BY sk"
    ),
    "tpch_q21_single_return_supplier": (
        "WITH stats AS (SELECT l_orderkey AS ok, "
        "count(DISTINCT l_suppkey) AS n_supp, "
        "count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) "
        "AS n_ret FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_orderstatus = 'F' GROUP BY l_orderkey), "
        "ret AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem "
        "JOIN stats ON l_orderkey = ok "
        "WHERE l_returnflag = 'R' AND n_supp > 1 AND n_ret = 1) "
        "SELECT s_name AS sname, count(*) AS numwait FROM ret "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "GROUP BY s_name ORDER BY numwait DESC, sname LIMIT 100"
    ),
    "tpch_q22_dormant_customers": (
        "SELECT c_nationkey AS nk, count(*) AS numcust, "
        "round(sum(c_acctbal), 2) AS totacctbal FROM customer "
        "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer "
        "WHERE c_acctbal > 0) "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderdate >= TIMESTAMP '1999-01-01') "
        "GROUP BY 1 ORDER BY 1"
    ),
}
