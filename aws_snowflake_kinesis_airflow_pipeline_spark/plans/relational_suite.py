"""Part B relational queries (SURVEY.md §2 B1-B10, B13) over the TPC-H-ish
star schema.

Conventions for oracle parity (FIXTURES.md §3):
- every computed column aliased identically in Spark and DuckDB SQL;
- float aggregates rounded to 2 dp on both sides (double-sum ordering noise
  is ~1e-9 relative, far below 2 dp);
- counts kept as bigint (Spark long == DuckDB BIGINT);
- every top-k carries a unique tie-breaker key.

Scale posture: dims (region, nation) are broadcast; fact-fact joins shuffle
on their keys with AQE free to re-plan; window functions partition on the
natural key so state stays bounded per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Headline aggregation (TPC-H Q1 shape) — the bench centerpiece
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                  AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                             AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                  AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                             AS avg_price,
           ROUND(AVG(l_discount), 4)                                  AS avg_disc,
           COUNT(*)                                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="§2 G1 at TPC-H shape (Q1 analog); §7 M2",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: single scan, partial+final hash aggregation on two
    low-cardinality keys — the canonical scan-bound aggregate. At 100 TB the
    shuffle carries 6 rows per input partition; scan dominates."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# B1/B2 — joins
# --------------------------------------------------------------------------


@register(
    "b1_join_revenue_by_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    survey_ref="§2 B1 inner equi-join fact⋈dim",
)
def b1_join_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈customer. Customer is |orders|/10 — below the broadcast
    threshold through mid SFs; at 100 TB AQE decides broadcast vs shuffle
    from runtime stats, so no hint is hard-coded here."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "b2_multiway_join_revenue_by_nation",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    survey_ref="§2 B2 multi-way join (TPC-H Q5 shape)",
)
def b2_multiway_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders⋈customer⋈nation⋈region. nation/region are O(10) rows
    at every SF — explicitly broadcast so the big sides never shuffle for
    them; the lineitem⋈orders join shuffles on orderkey (or goes broadcast
    under AQE when the filtered orders side is small)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    survey_ref="§2 B2+B4 join + top-k (TPC-H Q3 shape)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# B3 — outer / semi / anti joins
# --------------------------------------------------------------------------


@register(
    "b3_left_join_urgent_order_counts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_urgent
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') u
      ON c_custkey = u.o_custkey
    GROUP BY c_custkey
    """,
    survey_ref="§2 B3 left outer join (zero-preserving count)",
)
def b3_left_join_urgent_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_urgent"))
    )


@register(
    "b3_semi_join_big_spenders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 450000
    )
    """,
    survey_ref="§2 B3 left-semi join (EXISTS)",
)
def b3_semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "b3_anti_join_no_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
    survey_ref="§2 B3 left-anti join (NOT EXISTS)",
)
def b3_anti_join_no_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# B4 — sort / top-k
# --------------------------------------------------------------------------


@register(
    "b4_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    survey_ref="§2 B4 sort + top-k",
)
def b4_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject: each partition keeps
    its local top-25, the driver merges k*numPartitions rows — no global
    sort at any scale."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# B5 — window functions
# --------------------------------------------------------------------------


@register(
    "b5_window_latest_order",
    oracle="""
    SELECT c_custkey AS custkey, o_orderkey, o_totalprice FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY c_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey
    ) WHERE rn = 1
    """,
    survey_ref="§2 B5 row_number (latest-per-key)",
)
def b5_window_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey)
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("c_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
        )
    )


@register(
    "b5_window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(COALESCE(LAG(o_totalprice) OVER w, 0), 2) AS prev_price,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    survey_ref="§2 B5 lag + running sum with frame",
)
def b5_window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0)), 2).alias(
            "prev_price"
        ),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_spend"),
    )


@register(
    "b5_window_top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             DENSE_RANK() OVER (
               PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
             ) AS rk
      FROM part
    ) WHERE rk <= 3
    """,
    survey_ref="§2 B5 dense_rank (top-n-per-group)",
)
def b5_window_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rk", F.dense_rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


# --------------------------------------------------------------------------
# B6 — rollup / cube
# --------------------------------------------------------------------------


@register(
    "b6_rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey_ref="§2 B6 rollup",
)
def b6_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )


@register(
    "b6_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    survey_ref="§2 B6 cube",
)
def b6_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# B7 — set operations
# --------------------------------------------------------------------------


@register(
    "b7_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    survey_ref="§2 B7 UNION (distinct)",
)
def b7_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "b7_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    survey_ref="§2 B7 INTERSECT",
)
def b7_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


@register(
    "b7_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    survey_ref="§2 B7 EXCEPT",
)
def b7_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    # subtract() is SQL EXCEPT (set semantics): a row present in b is fully
    # removed. exceptAll().distinct() would differ when a duplicated left
    # row also appears in b (multiplicity arithmetic leaves survivors).
    return a.subtract(b)


@register(
    "b7_union_all",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    survey_ref="§2 B7 UNION ALL",
)
def b7_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b)


# --------------------------------------------------------------------------
# B8 — distinct / approx distinct
# --------------------------------------------------------------------------


@register(
    "b8_distinct_segments_nations",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    survey_ref="§2 B8 DISTINCT",
)
def b8_distinct_segments_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()


@register(
    "b8_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ref="§2 B8 exact COUNT(DISTINCT)",
)
def b8_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@register(
    "b8_approx_count_distinct",
    oracle=None,  # approximate — rows-only check by design
    survey_ref="§2 B8 approx_count_distinct (HLL sketch)",
)
def b8_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct: the 100 TB answer to COUNT(DISTINCT) — one pass,
    no dedup shuffle of the key domain, mergeable partial sketches."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# B9 — scalar function pack
# --------------------------------------------------------------------------


@register(
    "b9_scalar_pack",
    oracle="""
    SELECT o_orderkey,
           UPPER(SUBSTR(o_orderpriority, 3)) AS priority_name,
           CONCAT(o_orderstatus, '-', REGEXP_EXTRACT(o_orderpriority, '^([0-9]+)', 1))
             AS status_code,
           (o_orderpriority LIKE '%URGENT%') AS is_urgent,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
           CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT)
             AS days_before_2002,
           ROUND(o_totalprice / 1000.0, 6) AS price_k,
           ABS(o_totalprice - 250000.0) AS dist_from_median,
           CASE WHEN o_totalprice > 400000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_pending
    FROM orders
    """,
    survey_ref="§2 B9 string/date/math/conditional scalar functions",
)
def b9_scalar_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper(F.expr("substring(o_orderpriority, 3)")).alias("priority_name"),
        F.concat(
            F.col("o_orderstatus"),
            F.lit("-"),
            F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1),
        ).alias("status_code"),
        F.col("o_orderpriority").like("%URGENT%").alias("is_urgent"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("days_before_2002"),
        # 6 dp: totalprice has <=2 decimals so /1000 has <=5 — rounding past
        # the last digit never lands on a .5 boundary, where Spark (decimal
        # HALF_UP on the shortest representation) and DuckDB (raw binary
        # round) disagree. Surfaced at sf0.1 with values like 172805/1000.
        F.round(F.col("o_totalprice") / 1000.0, 6).alias("price_k"),
        F.abs(F.col("o_totalprice") - 250000.0).alias("dist_from_median"),
        F.when(F.col("o_totalprice") > 400000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_or_pending"),
    )


# --------------------------------------------------------------------------
# B10 — JSON / array functions
# --------------------------------------------------------------------------


@register(
    "b10_json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           ARRAY_TO_STRING(json_keys(props), ',') AS key_list
    FROM events
    """,
    survey_ref="§2 B10 JSON path + keys over events.props",
)
def b10_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.array_join(
            F.map_keys(F.from_json("props", "map<string,string>")), ","
        ).alias("key_list"),
    )


@register(
    "b10_explode_token_counts",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    survey_ref="§2 B10 array explode (token frequency)",
)
def b10_explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# B13 — text statistics
# --------------------------------------------------------------------------


@register(
    "b13_text_stats_by_lang",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           ROUND(AVG(LEN(STRING_SPLIT(text, ' '))), 2) AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
    survey_ref="§2 B13 text analysis aggregates",
)
def b13_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg(F.size(F.split("text", " "))), 2).alias("avg_tokens"),
        )
    )
