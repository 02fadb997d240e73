"""TPC-H analog extension entries (warpdb_spark/inventory/tpch_extra.py).

The value-level gate is the DuckDB oracle harness
(tools/check_oracle.py) at sf0.01; here we pin (1) registry
invariants, (2) plan-level resolution (every entry analyzes and
exposes its aliased output schema) at sf0.001, and (3) execution +
known-shape results for the queries with data-independent shape.
"""

import pytest

from warpdb_spark.inventory import tpch_extra


def test_every_query_has_oracle():
    assert set(tpch_extra.QUERIES) == set(tpch_extra.ORACLES)


EXPECTED_COLUMNS = {
    "tpch_q2_min_cost_supplier": ["pk", "brand", "sname", "bal"],
    "tpch_q7_volume_shipping": ["supp_nation", "cust_nation", "l_year", "revenue"],
    "tpch_q8_market_share": ["o_year", "mkt_share"],
    "tpch_q9_product_profit": ["nation", "o_year", "sum_profit"],
    "tpch_q11_important_stock": ["pk", "value"],
    "tpch_q12_priority_lines": ["status", "high_line_count", "low_line_count"],
    "tpch_q13_customer_distribution": ["c_count", "custdist"],
    "tpch_q15_top_supplier": ["sk", "sname", "total_revenue"],
    "tpch_q16_supplier_counting": ["brand", "ptype", "size", "supplier_cnt"],
    "tpch_q17_small_qty_revenue": ["avg_yearly"],
    "tpch_q19_disjunctive_revenue": ["revenue"],
    "tpch_q20_promotion_suppliers": ["sk", "sname", "bal"],
    "tpch_q21_single_return_supplier": ["sname", "numwait"],
    "tpch_q22_dormant_customers": ["nk", "numcust", "totacctbal"],
}


@pytest.mark.parametrize("name", sorted(tpch_extra.QUERIES))
def test_entry_resolves_with_aliased_schema(spark, sf_dir, name):
    df = tpch_extra.QUERIES[name](spark, sf_dir)
    assert df.columns == EXPECTED_COLUMNS[name]


def test_q19_single_global_aggregate_row(spark, sf_dir):
    rows = tpch_extra.tpch_q19_disjunctive_revenue(spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0]["revenue"] is None or rows[0]["revenue"] >= 0


def test_q12_partitions_lines_exactly(spark, sf_dir):
    # high + low must partition every joined line in the ship-year
    from pyspark.sql import functions as F

    from warpdb_spark.inventory.core_sql import _t

    rows = tpch_extra.tpch_q12_priority_lines(spark, sf_dir).collect()
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    total = li.join(
        _t(spark, sf_dir, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).count()
    assert sum(r["high_line_count"] + r["low_line_count"] for r in rows) == total


def test_q15_returns_the_max_revenue_suppliers(spark, sf_dir):
    rows = tpch_extra.tpch_q15_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    # all returned suppliers tie on the max revenue
    assert len({r["total_revenue"] for r in rows}) == 1
