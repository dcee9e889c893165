"""BASELINE.md target #1: engine runtime within 2× of a tuned
plain-PySpark implementation of the same queries.

The engine is a facade over DataFrame/Catalyst, so its physical plans
should be IDENTICAL to hand-written Spark SQL — we assert that
directly (same optimized-plan shape), which is a stronger and less
flaky guarantee than wall-clock ratios at test scale. bench.py tracks
absolute times.
"""

import contextlib
import io

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def plan_signature(df) -> list:
    """Ordered list of physical operator names in the plan."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    ops = []
    for line in buf.getvalue().splitlines():
        s = line.strip().lstrip("+-: ").strip()
        if not s or s.startswith("=="):
            continue
        name = s.split(" ")[0].split("(")[0]
        if name and name[0].isupper():
            ops.append(name)
    return ops


def _register(spark):
    for t in ["lineitem", "orders", "customer", "nation", "region",
              "supplier", "part"]:
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)


def test_q1_plan_matches_plain_sql(spark):
    _register(spark)
    plain = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 0) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 0) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 0) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """)
    engine = em.tpch_q1(spark, SF)
    assert plan_signature(engine) == plan_signature(plain)


def test_q6_plan_matches_plain_sql(spark):
    _register(spark)
    plain = spark.sql("""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= timestamp '1996-01-01'
          AND l_shipdate < timestamp '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """)
    engine = em.tpch_q6(spark, SF)
    assert plan_signature(engine) == plan_signature(plain)


def test_q5_plan_shape_matches_plain_sql(spark):
    """Join order may legally differ (Catalyst reorders both); the
    operator MULTISET must match — same number of broadcast joins,
    same scan count, no extra shuffles in the engine plan."""
    _register(spark)
    plain = spark.sql("""
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue
        FROM region, nation, supplier, lineitem, orders, customer
        WHERE r_name = 'ASIA' AND r_regionkey = n_regionkey
          AND n_nationkey = s_nationkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n_nationkey
          AND o_orderdate >= timestamp '1996-01-01'
          AND o_orderdate < timestamp '1997-01-01'
        GROUP BY n_name
    """)
    engine = em.tpch_q5(spark, SF)
    from collections import Counter
    pe, pp = Counter(plan_signature(engine)), Counter(plan_signature(plain))
    assert pe["BroadcastHashJoin"] == pp["BroadcastHashJoin"]
    assert pe["Scan"] == pp["Scan"]
    assert pe.get("Exchange", 0) <= pp.get("Exchange", 0)


def test_q12_plan_matches_plain_sql(spark):
    """Join + conditional agg through the facade (filter_sql, join,
    agg_sql) must plan exactly like hand-written SQL."""
    _register(spark)
    plain = spark.sql("""
        SELECT l_linestatus,
               sum(CASE WHEN o_orderpriority = '1-URGENT'
                          OR o_orderpriority = '2-HIGH'
                        THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority <> '1-URGENT'
                         AND o_orderpriority <> '2-HIGH'
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= timestamp '1996-01-01'
          AND l_shipdate < timestamp '1997-01-01'
        GROUP BY l_linestatus
    """)
    engine = em.tpch_q12(spark, SF)
    assert plan_signature(engine) == plan_signature(plain)


def test_q14_plan_matches_plain_sql(spark):
    _register(spark)
    plain = spark.sql("""
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
               / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= timestamp '1996-03-01'
          AND l_shipdate < timestamp '1996-04-01'
    """)
    engine = em.tpch_q14(spark, SF)
    assert plan_signature(engine) == plan_signature(plain)


def test_nonequi_join_plan_matches_plain_sql(spark):
    """join(condition=...) must lower to the same plan as SQL with the
    predicate in the ON clause (hash join + in-join residual)."""
    _register(spark)
    plain = spark.sql("""
        SELECT p_brand, count(*) AS n,
               round(sum(l_extendedprice), 2) AS rev
        FROM lineitem JOIN part
          ON l_partkey = p_partkey
         AND l_quantity BETWEEN p_size - 5 AND p_size + 5
        GROUP BY p_brand
    """)
    engine = em.op_join_nonequi(spark, SF)
    assert plan_signature(engine) == plan_signature(plain)
