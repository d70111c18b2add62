"""Relational rows of the rotated/never-gated EXTRAS parity ledger.

Split out of plans/parity_extras.py (r14) purely for navigability —
the registry (plans/extras_base.py), the compare loop
(tests/test_rotated_parity.py), and every row's (spark_fn, oracle_sql)
contract are unchanged. parity_extras.py keeps the ledger's charter
and rotation history and re-exports the public faces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_instagram_spark.plans.extras_base import EXTRAS, _extra, _llm
from etl_instagram_spark.plans.queries import _t


@_extra(
    "pivot_returnflag_status",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns per returnflag (SURVEY §2.6 —
    conditional aggregation; Catalyst rewrites pivot to CASE WHEN aggs)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
        .orderBy("l_returnflag")
    )


@_extra(
    "top10_customers_by_revenue",
    """
    SELECT c_custkey, c_name,
           round(sum(o_totalprice), 2) AS revenue,
           count(*)                    AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def top10_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + global top-k (reference O2 orderBy+limit generalized;
    engages TakeOrderedAndProject instead of a full sort)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


@_extra(
    "orders_date_functions",
    """
    SELECT o_orderkey,
           year(o_orderdate)                       AS order_year,
           month(o_orderdate)                      AS order_month,
           dayofmonth(o_orderdate)                 AS order_day,
           quarter(o_orderdate)                    AS order_quarter,
           strftime(o_orderdate, '%Y-%m')          AS order_ym,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoh
    FROM orders WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def orders_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time kernel (F13 analogue): extract parts, truncation, diff."""
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_eoh"),
    ).orderBy("o_orderkey")


@_extra(
    "segment_rollup",
    """
    SELECT c_mktsegment, c_nationkey,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS sum_acctbal
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    ORDER BY c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST
    """,
)
def segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (segment, nation): hierarchical grouping sets in one
    Expand pass — the grouping-sets surface the r5 gate rotation dropped."""
    cu = _t(spark, sf_dir, "customer")
    return (
        cu.rollup("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("c_nationkey").asc_nulls_first(),
        )
    )


@_extra(
    "customer_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_revenue
    FROM orders WHERE o_custkey < 50
    ORDER BY o_custkey, o_orderkey
    """,
)
def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window frame (running revenue per customer) — the
    running-sum frame surface the r5 gate rotation dropped; remaining
    gated window queries cover rank/lag/range frames but not this."""
    od = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_revenue"),
    ).orderBy("o_custkey", "o_orderkey")


@_extra(
    "customers_without_urgent_orders",
    """
    SELECT c_mktsegment,
           count(*)               AS n_customers,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)
             AS avg_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (the engine's incremental-ingest gate,
    J3/J5, operators.merge.anti_join_new) aggregated by segment (r6
    rotation; the semi-join sibling stays gated via
    q4_order_priority_semijoin)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cu.join(od.select("o_custkey").distinct(), cu.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # c_acctbal is a 2dp grid column: exact DECIMAL sum so the
            # 4dp rounding can't sit on a summation-order tie
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def _supplier_geo_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine distance bands (r6 rotation for docs_domain_cap; the
    trig formula keeps its pytest coverage in functions/geo.py)."""
    return _llm("supplier_geo_bands")(spark, sf_dir)


def _q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 filter + global agg (r6 rotation for docs_gopher_filter;
    the surface stays gated via q1 / conditional_agg_promo_share)."""
    from etl_instagram_spark.plans.queries import q6_forecast_revenue

    return q6_forecast_revenue(spark, sf_dir)


def _part_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url host/path/query extraction (r6 rotation for
    docs_bm25_topk; the F10 surface keeps projection pytest coverage)."""
    return _llm("part_url_parse")(spark, sf_dir)


def _conditional_agg_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 conditional aggregate (r6 rotation for emb_pq_recall;
    CASE-WHEN-in-aggregate stays gated via docs_gopher_filter /
    cube_returnflag_status)."""
    from etl_instagram_spark.plans.queries import conditional_agg_promo_share

    return conditional_agg_promo_share(spark, sf_dir)


_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


def _orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of orders (exact distincts for the
    parity check; production defaults to HLL). Never gate-registered."""
    from etl_instagram_spark.operators.profiling import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "orders"),
        [c for c, _ in _PROFILE_COLS],
        exact_distinct=True,
    ).orderBy("column")


def _sql_orders_profile() -> str:
    parts = []
    for c, numeric in _PROFILE_COLS:
        mins = (
            f"round(CAST(min({c}) AS DOUBLE), 4)" if numeric else "CAST(NULL AS DOUBLE)"
        )
        maxs = (
            f"round(CAST(max({c}) AS DOUBLE), 4)" if numeric else "CAST(NULL AS DOUBLE)"
        )
        avgs = (
            f"round(avg(CAST({c} AS DOUBLE)), 4)" if numeric else "CAST(NULL AS DOUBLE)"
        )
        parts.append(
            f"""SELECT '{c}' AS "column", count(*) AS n_rows,
                count(*) - count({c}) AS n_nulls,
                count(DISTINCT {c}) AS n_distinct,
                {mins} AS min_d, {maxs} AS max_d, {avgs} AS avg_d
                FROM orders"""
        )
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


_SQL_CUST_RANK_DIST = """
    WITH rev AS (
      SELECT o_custkey AS c_custkey, round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY o_custkey)
    SELECT c_custkey, revenue,
           round(percent_rank() OVER (ORDER BY revenue DESC, c_custkey), 6)
             AS pct_rank,
           round(cume_dist() OVER (ORDER BY revenue DESC, c_custkey), 6)
             AS cum_dist
    FROM rev ORDER BY c_custkey
    """


def _customer_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist over customer revenue — the two rank
    distributions no other inventory window uses (rank/lag/ntile/frames
    are covered elsewhere). Never gate-registered."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return rev.select(
        "c_custkey",
        "revenue",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    ).orderBy("c_custkey")


# the threshold derives from an exact DECIMAL sum (o_totalprice is a 2dp
# grid column): a float avg's summation-order ulps could otherwise flip
# the comparison for an order priced exactly at 1.5x the mean
_SQL_ABOVE_CUST_AVG = """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o_totalprice > (SELECT 1.5 * (CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                        / count(*))
                          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """


def _orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subquery (each order against its own customer's
    average) — the decorrelation surface no other inventory query
    exercises (the gate's correlated shapes are EXISTS/IN semi-joins).
    Catalyst rewrites it to an aggregate + join; the same ANSI text runs
    on both engines. Never gate-registered."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SQL_ABOVE_CUST_AVG)


def _top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10 rotation (for docs_dup_cluster_reps): row_number top-k per
    group — the shape stays gated via docs_bm25_topk (and
    customer_revenue_quartiles until its own r11 rotation; both remain
    EXTRAS-checked)."""
    from etl_instagram_spark.plans.queries import top3_orders_per_customer

    return top3_orders_per_customer(spark, sf_dir)


def _nation_customer_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10 rotation (for graph_pagerank_suppliers): listagg — sorted
    collect_list stays gated via docs_top_terms_by_lang."""
    from etl_instagram_spark.plans.llm_queries import nation_customer_listagg

    return nation_customer_listagg(spark, sf_dir)


def _part_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10 rotation (for docs_leakage_safe_split): unpivot/Expand."""
    from etl_instagram_spark.plans.llm_queries import part_metrics_unpivot

    return part_metrics_unpivot(spark, sf_dir)


def _order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 rotation (for emb_kmeans_cells): LAG-window date arithmetic —
    offset windows stay exercised here at driver-grade parity; date
    arithmetic stays gated via customer_rolling_30d_revenue /
    events_asof_join."""
    from etl_instagram_spark.plans.queries import order_gap_days

    return order_gap_days(spark, sf_dir)


def _customer_revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 rotation (gate seat given to part_entity_resolution — the
    driver now certifies the ER family directly): percentile-boundary
    broadcast bucketing; the shape stays gated via
    events_value_percentiles and docs_bm25_topk."""
    from etl_instagram_spark.plans.llm_queries import (
        customer_revenue_quartiles,
    )

    return customer_revenue_quartiles(spark, sf_dir)
def _customer_rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r17 rotation (gate seat given to docs_weighted_sample — the
    priority-sampling estimator semantics were the strongest
    not-yet-certified value contract in the sampling family): RANGE-frame
    rolling window. The value-based frame machinery stays gated via
    events_hypertable_rollup's time buckets and events_asof_join's
    ordered merge; this exact query keeps driver-grade parity here."""
    from etl_instagram_spark.plans.q_relational import (
        customer_rolling_30d_revenue,
    )

    return customer_rolling_30d_revenue(spark, sf_dir)


def _nation_customers_suppliers_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """r18 rotation (gate seat given to graph_node2vec_embeddings_97q1 —
    the node2vec-fed embedding chain was the graph family's last
    uncertified composition): FULL OUTER between two aggregates. The
    coalesce-both-sides machinery stays gated via q5's join tree and
    the merge family's anti-joins; this exact query keeps driver-grade
    parity here."""
    from etl_instagram_spark.plans.q_relational import (
        nation_customers_suppliers_full,
    )

    return nation_customers_suppliers_full(spark, sf_dir)


def _orders_nested_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 rotation (gate seat given to events_hll_distinct — the seat
    that completes direct driver certification of all four sketch
    faces): nested-document round trip — collect lineitems into a
    sorted array<struct>, then read it back with element_at / aggregate
    / transform, the engine's nested data model (SURVEY §1.1). One
    shuffle (the groupBy); every array op is a per-row expression. The
    nested/HOF surface stays gated via events_json_extract and
    docs_chunking."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("l_linenumber").alias("ln"), F.col("l_quantity").alias("qty"))
            )
        ).alias("items")
    )
    return nested.select(
        "l_orderkey",
        F.size("items").alias("n_items"),
        F.element_at("items", 1)["qty"].alias("first_qty"),
        F.round(
            F.aggregate("items", F.lit(0.0), lambda acc, x: acc + x["qty"]), 2
        ).alias("total_qty"),
        F.concat_ws(",", F.transform("items", lambda x: x["ln"].cast("string"))).alias(
            "line_numbers"
        ),
    ).orderBy("l_orderkey")


_SQL_ORDERS_NESTED_LINEITEMS = """
    WITH nested AS (
      SELECT l_orderkey,
             list(struct_pack(ln := l_linenumber, qty := l_quantity)
                  ORDER BY l_linenumber, l_quantity) AS items
      FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey)
    SELECT l_orderkey,
           len(items) AS n_items,
           items[1].qty AS first_qty,
           round(list_sum(list_transform(items, x -> x.qty)), 2) AS total_qty,
           array_to_string(list_transform(items, x -> x.ln::VARCHAR), ',') AS line_numbers
    FROM nested ORDER BY l_orderkey
    """


def _register() -> None:
    from etl_instagram_spark.plans import llm_queries
    from etl_instagram_spark.plans.oracle import (
        SQL_CONDITIONAL_AGG_PROMO_SHARE,
        SQL_ORDER_GAP_DAYS,
        SQL_Q6_FORECAST_REVENUE,
        SQL_TOP3_ORDERS_PER_CUSTOMER,
    )

    EXTRAS["supplier_geo_bands"] = (
        _supplier_geo_bands,
        llm_queries.SQL_SUPPLIER_GEO_BANDS,
    )
    EXTRAS["q6_forecast_revenue"] = (_q6_forecast_revenue, SQL_Q6_FORECAST_REVENUE)
    EXTRAS["part_url_parse"] = (_part_url_parse, llm_queries.SQL_PART_URL_PARSE)
    EXTRAS["conditional_agg_promo_share"] = (
        _conditional_agg_promo_share,
        SQL_CONDITIONAL_AGG_PROMO_SHARE,
    )
    EXTRAS["orders_profile"] = (_orders_profile, _sql_orders_profile())
    EXTRAS["orders_above_customer_avg"] = (
        _orders_above_customer_avg,
        _SQL_ABOVE_CUST_AVG,
    )
    EXTRAS["customer_rank_distributions"] = (
        _customer_rank_distributions,
        _SQL_CUST_RANK_DIST,
    )
    # r8 rotation: LAG offset window (seat given to emb_kmeans_cells)
    EXTRAS["order_gap_days"] = (_order_gap_days, SQL_ORDER_GAP_DAYS)
    # r10 rotations (for graph_pagerank_suppliers, docs_dup_cluster_reps,
    # docs_leakage_safe_split)
    EXTRAS["top3_orders_per_customer"] = (
        _top3_orders_per_customer,
        SQL_TOP3_ORDERS_PER_CUSTOMER,
    )
    EXTRAS["nation_customer_listagg"] = (
        _nation_customer_listagg,
        llm_queries.SQL_NATION_CUSTOMER_LISTAGG,
    )
    EXTRAS["part_metrics_unpivot"] = (
        _part_metrics_unpivot,
        llm_queries.SQL_PART_METRICS_UNPIVOT,
    )
    # r11 rotation: quartile bucketing (seat given to part_entity_resolution)
    EXTRAS["customer_revenue_quartiles"] = (
        _customer_revenue_quartiles,
        llm_queries.SQL_CUSTOMER_REVENUE_QUARTILES,
    )
    # r14 rotation: nested array-of-struct round trip (seat given to
    # events_hll_distinct)
    EXTRAS["orders_nested_lineitems"] = (
        _orders_nested_lineitems,
        _SQL_ORDERS_NESTED_LINEITEMS,
    )
    # r15 rotation: the spark.sql() front-door face (seat given to
    # docs_kmv_shingle_overlap) — same shared ANSI text on both engines
    from etl_instagram_spark.plans.q_relational import (
        _SHARED_SQL_BRAND_REVENUE,
        sql_brand_revenue,
    )

    EXTRAS["sql_brand_revenue"] = (sql_brand_revenue, _SHARED_SQL_BRAND_REVENUE)
    # second r15 rotation: CUBE grouping sets (seat given to
    # docs_bm25_indexed) — grouping-set machinery stays gated via
    # events_hypertable_rollup
    from etl_instagram_spark.plans.q_relational import (
        _SQL_CUBE_RETURNFLAG_STATUS,
        cube_returnflag_status,
    )

    EXTRAS["cube_returnflag_status"] = (
        cube_returnflag_status,
        _SQL_CUBE_RETURNFLAG_STATUS,
    )
    # r17 rotation: RANGE-frame rolling window (seat given to
    # docs_weighted_sample) — value-based frame machinery stays gated
    # via events_hypertable_rollup / events_asof_join
    from etl_instagram_spark.plans.q_relational import (
        SQL_CUSTOMER_ROLLING_30D_REVENUE,
    )

    EXTRAS["customer_rolling_30d_revenue"] = (
        _customer_rolling_30d_revenue,
        SQL_CUSTOMER_ROLLING_30D_REVENUE,
    )
    # r18 rotation: seat given to graph_node2vec_embeddings_97q1
    from etl_instagram_spark.plans.q_relational import (
        SQL_NATION_CUSTOMERS_SUPPLIERS_FULL,
    )

    EXTRAS["nation_customers_suppliers_full"] = (
        _nation_customers_suppliers_full,
        SQL_NATION_CUSTOMERS_SUPPLIERS_FULL,
    )


_register()
