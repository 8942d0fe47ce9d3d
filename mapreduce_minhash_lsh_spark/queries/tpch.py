"""Relational surface: TPC-H shapes, aggregates, joins, set ops,
window/rollup/cube, order statistics, the SQL-text interface.
"""

from __future__ import annotations

from mapreduce_minhash_lsh_spark.queries._base import (  # noqa: F401
    F,
    Window,
    load_table,
    register,
)

from mapreduce_minhash_lsh_spark.plans import tpch as _tpch  # noqa: E402

_Q1_AGGS = """
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order"""

register(
    "q1_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,{_Q1_AGGS}
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus""",
)(_tpch.pricing_summary)

register(
    "q3_top_revenue_orders",
    """SELECT o_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10""",
)(_tpch.top_revenue_orders)

register(
    "q5_region_revenue",
    """SELECT r_name, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name""",
)(_tpch.region_revenue)

register(
    "window_top_orders_per_customer",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
  FROM orders)
WHERE rn <= 3""",
)(_tpch.top_orders_per_customer)

register(
    "rollup_quantity",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
)(_tpch.rollup_quantity)

register(
    "distinct_parts_per_flag",
    """SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag""",
)(_tpch.distinct_parts_per_flag)


# --------------------------------------------------------------------------
# General query-engine breadth: simple filter-agg, semi/anti joins, set
# operations, calendar functions, and the SQL-text interface
# --------------------------------------------------------------------------

_Q6_REV = "CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)"

register(
    "q6_forecast_revenue",
    f"""SELECT {_Q6_REV} AS revenue, COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)(
    lambda spark, sf: load_table(spark, sf, "lineitem")
    .where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    .agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(38,6)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_rows"),
    )
)

register(
    "customers_without_orders",
    """SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
)(
    lambda spark, sf: load_table(spark, sf, "customer").join(
        load_table(spark, sf, "orders"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name")
)

register(
    "suppliers_with_lineitems",
    """SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)""",
)(
    lambda spark, sf: load_table(spark, sf, "supplier").join(
        load_table(spark, sf, "lineitem"),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")
)

register(
    "partkeys_never_ordered",
    """SELECT p_partkey AS partkey FROM part
EXCEPT
SELECT l_partkey FROM lineitem""",
)(
    lambda spark, sf: load_table(spark, sf, "part")
    .select(F.col("p_partkey").alias("partkey"))
    .exceptAll(
        load_table(spark, sf, "lineitem").select(F.col("l_partkey").alias("partkey"))
    )
    .distinct()
)

register(
    "orders_by_year_priority",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_total
FROM orders GROUP BY CAST(year(o_orderdate) AS INTEGER), o_orderpriority""",
)(
    lambda spark, sf: load_table(spark, sf, "orders")
    .groupBy(
        F.year("o_orderdate").alias("order_year"),
        "o_orderpriority",
    )
    .agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("sum_total"),
    )
)


@register(
    "sql_interface",
    """SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_total
FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderstatus""",
)
def q_sql_interface(spark, sf):
    """The engine's SQL-text surface: the query is planned by Catalyst
    from SQL, not the DataFrame DSL (spark.sql over registered views)."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """SELECT o_orderstatus,
                  COUNT(*) AS n_orders,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_total
           FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           GROUP BY o_orderstatus"""
    )


# --------------------------------------------------------------------------
# Outer joins, exact order statistics, normalized dedup
# --------------------------------------------------------------------------

register(
    "customer_order_counts",
    """SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 0) AS DOUBLE) AS sum_total
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name""",
)(
    lambda spark, sf: load_table(spark, sf, "customer")
    .join(
        load_table(spark, sf, "orders"),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    )
    .groupBy("c_custkey", "c_name")
    .agg(
        F.count("o_orderkey").alias("n_orders"),
        F.coalesce(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")), F.lit(0)
        ).cast("double").alias("sum_total"),
    )
)


@register(
    "median_quantity",
    """WITH o AS (
  SELECT l_returnflag, l_quantity,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       SUM(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN l_quantity ELSE 0 END)
         / (CASE WHEN (n + 1) // 2 = (n + 2) // 2 THEN 1.0 ELSE 2.0 END) AS median_qty,
       CAST(MAX(n) AS BIGINT) AS n_rows
FROM o GROUP BY l_returnflag, n""",
)
def q_median_quantity(spark, sf):
    """EXACT median per group via rank windows (both engines pick the
    identical middle element(s) under a fully deterministic order) —
    order-statistics coverage without interpolation ambiguity."""
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    o = li.select(
        "l_returnflag", "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    lo = F.expr("(n + 1) div 2")
    hi = F.expr("(n + 2) div 2")
    return (
        o.groupBy("l_returnflag", "n")
        .agg(
            (
                F.sum(
                    F.when((F.col("rn") == lo) | (F.col("rn") == hi), F.col("l_quantity"))
                    .otherwise(F.lit(0.0))
                )
                / F.when(lo == hi, F.lit(1.0)).otherwise(F.lit(2.0))
            ).alias("median_qty"),
            F.max("n").cast("long").alias("n_rows"),
        )
        .drop("n")
    )


register(
    "normalized_dedup",
    """SELECT lower(trim(text)) AS norm_text, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY lower(trim(text)) HAVING COUNT(*) > 1""",
)(
    lambda spark, sf: load_table(spark, sf, "documents")
    .groupBy(F.lower(F.trim(F.col("text"))).alias("norm_text"))
    .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
    .where(F.col("n_dups") > 1)
)


register(
    "cube_quantity",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
)(
    lambda spark, sf: load_table(spark, sf, "lineitem")
    .cube("l_returnflag", "l_linestatus")
    .agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )
    .select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "sum_qty", "n_rows",
    )
)

register(
    "price_histogram",
    """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM orders GROUP BY CAST(floor(o_totalprice / 50000.0) AS BIGINT)""",
)(
    lambda spark, sf: load_table(spark, sf, "orders")
    .groupBy(
        F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("long").alias("bucket")
    )
    .agg(
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
)

register(
    "nation_suppliers",
    """SELECT n_name,
       COUNT(s_suppkey) AS n_suppliers,
       COALESCE(string_agg(s_name, ',' ORDER BY s_name), '') AS supplier_names
FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
GROUP BY n_name""",
)(
    lambda spark, sf: load_table(spark, sf, "nation")
    .join(
        load_table(spark, sf, "supplier"),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left",
    )
    .groupBy("n_name")
    .agg(
        F.count("s_suppkey").alias("n_suppliers"),
        F.array_join(
            F.sort_array(F.collect_list("s_name")), ","
        ).alias("supplier_names"),
    )
)


@register(
    "string_functions",
    """SELECT doc_id,
  substr(text, 1, 10) AS prefix10,
  CASE WHEN contains(text, 'spark') THEN 1 ELSE 0 END AS has_spark,
  concat(lang, '/', source) AS lang_source,
  to_base64(encode(substr(text, 1, 12))) AS b64_prefix,
  replace(substr(text, 1, 20), ' ', '_') AS snake_prefix,
  reverse(substr(text, 1, 8)) AS rev_prefix
FROM documents WHERE length(text) > 0""",
)
def q_string_functions(spark, sf):
    """The reference's full string-function surface (SURVEY.md §2.6:
    substring/pad, split/join via concat, contains, Base64) plus
    replace/reverse — all JVM built-ins, one scan, no shuffle."""
    docs = load_table(spark, sf, "documents").where(F.length("text") > 0)
    t = F.col("text")
    return docs.select(
        "doc_id",
        t.substr(1, 10).alias("prefix10"),
        F.when(t.contains("spark"), 1).otherwise(0).alias("has_spark"),
        F.concat(F.col("lang"), F.lit("/"), F.col("source")).alias("lang_source"),
        F.base64(F.encode(t.substr(1, 12), "UTF-8")).alias("b64_prefix"),
        F.replace(t.substr(1, 20), F.lit(" "), F.lit("_")).alias("snake_prefix"),
        F.reverse(t.substr(1, 8)).alias("rev_prefix"),
    )

register(
    "quantity_quantiles_approx",
    """SELECT l_returnflag,
       quantile_disc(l_quantity, 0.25) AS q25,
       quantile_disc(l_quantity, 0.5) AS q50,
       quantile_disc(l_quantity, 0.75) AS q75,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag""",
)(
    lambda spark, sf: load_table(spark, sf, "lineitem")
    .groupBy("l_returnflag")
    .agg(
        F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10000).alias("_q"),
        F.count("*").alias("n_rows"),
    )
    .select(
        "l_returnflag",
        F.element_at("_q", 1).alias("q25"),
        F.element_at("_q", 2).alias("q50"),
        F.element_at("_q", 3).alias("q75"),
        "n_rows",
    )
)

register(
    "orders_above_customer_avg",
    """WITH cavg AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price
  FROM orders GROUP BY o_custkey
)
SELECT o_orderkey, o_custkey, o_totalprice, avg_price
FROM orders JOIN cavg USING (o_custkey)
WHERE o_totalprice > avg_price""",
)(
    lambda spark, sf: (lambda orders: (
        orders.join(
            orders.groupBy("o_custkey").agg(
                (
                    F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double")
                    / F.count("*")
                ).alias("avg_price")
            ),
            "o_custkey",
        )
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "avg_price")
    ))(load_table(spark, sf, "orders"))
)


_PRICE_BANDS = [(float(lo), float(lo + 250), f"band_{i}") for i, lo in enumerate(range(0, 2500, 250))]

@register(
    "parts_price_bands",
    f"""WITH bands(lo, hi, band) AS (
  SELECT * FROM (VALUES {", ".join(f"({lo}, {hi}, '{b}')" for lo, hi, b in _PRICE_BANDS)})
)
SELECT band, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band""",
)
def q_parts_price_bands(spark, sf):
    """Range (interval) join: parts matched into price bands via the
    broadcast non-equi join (operators/rangejoin.py); the uniform-grid
    equi variant is cross-checked in tests."""
    from mapreduce_minhash_lsh_spark.operators.rangejoin import range_join

    bands = spark.createDataFrame(_PRICE_BANDS, ["lo", "hi", "band"])
    parts = load_table(spark, sf, "part")
    return (
        range_join(parts, bands, "p_retailprice")
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(38,6)")).cast("double").alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Additional relational depth: Q10/Q18 shapes + window-frame moving average
# --------------------------------------------------------------------------

@register(
    "q10_returned_revenue",
    """SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20""",
)
def q_q10_returned_revenue(spark, sf):
    """TPC-H Q10 shape (plans/tpch.py:returned_item_customers): revenue
    lost to returns per customer; filters on the scans, dims broadcast,
    deterministic (revenue desc, custkey) top-20."""
    return _tpch.returned_item_customers(spark, sf)


@register(
    "q18_large_orders",
    """SELECT c_custkey, c_name, o_orderkey,
       o_totalprice AS totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 300""",
)
def q_q18_large_orders(spark, sf):
    """TPC-H Q18 shape (plans/tpch.py:large_quantity_orders): total
    order quantity HAVING filter, partial-aggregated before any join."""
    return _tpch.large_quantity_orders(spark, sf)


@register(
    "q4_late_shipment_priorities",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND epoch_us(l.l_shipdate) >= epoch_us(o.o_orderdate) + 5184000000000)
GROUP BY o_orderpriority""",
)
def q_q4_late_shipment_priorities(spark, sf):
    """TPC-H Q4 shape (plans/tpch.py:late_shipment_priorities): EXISTS
    as a left-semi join with a non-equi lateness predicate riding the
    orderkey equi-join; epoch-us arithmetic for engine-exact cutoffs."""
    return _tpch.late_shipment_priorities(spark, sf)


@register(
    "q12_priority_lines_by_flag",
    """SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY l_returnflag""",
)
def q_q12_priority_lines_by_flag(spark, sf):
    """TPC-H Q12 shape (plans/tpch.py:priority_lines_by_flag):
    conditional integer counts over the orderkey join."""
    return _tpch.priority_lines_by_flag(spark, sf)


@register(
    "q14_promo_revenue",
    """SELECT promo_revenue, total_revenue,
       (promo_revenue / total_revenue) * 100.0 AS promo_pct
FROM (
  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                       ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS promo_revenue,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
           AS total_revenue
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01')""",
)
def q_q14_promo_revenue(spark, sf):
    """TPC-H Q14 shape (plans/tpch.py:promo_revenue_share): PROMO
    revenue share — exact decimal sums, pinned double division."""
    return _tpch.promo_revenue_share(spark, sf)


@register(
    "q15_top_supplier",
    """WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""",
)
def q_q15_top_supplier(spark, sf):
    """TPC-H Q15 shape (plans/tpch.py:top_revenue_supplier): max-revenue
    supplier(s) via a broadcast scalar max — no global sort/window."""
    return _tpch.top_revenue_supplier(spark, sf)


@register(
    "q17_small_quantity_revenue",
    """WITH lim AS (
  SELECT l_partkey AS pk,
         (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE)) * 0.2 AS lim
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#13'
JOIN lim ON pk = l_partkey
WHERE l_quantity < lim""",
)
def q_q17_small_quantity_revenue(spark, sf):
    """TPC-H Q17 shape (plans/tpch.py:small_quantity_revenue): the
    correlated per-part average decorrelated into one groupBy joined
    back; the 0.2x threshold divides exact aggregates in a pinned
    order, so the qualifying row set is engine-exact."""
    return _tpch.small_quantity_revenue(spark, sf)


# --------------------------------------------------------------------------
# Relational depth r3b: TPC-H Q7 / Q13 / Q19 / Q22 shapes (plans/tpch.py)
# --------------------------------------------------------------------------


@register(
    "q7_nation_trade_volume",
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
GROUP BY 1, 2, 3""",
)
def q_q7_nation_trade_volume(spark, sf):
    """TPC-H Q7 shape (plans/tpch.py:nation_trade_volume): five-way star
    join, dims broadcast, fact shuffled once (orders equi-join);
    decimal-exact revenue, calendar year under the UTC-pinned session."""
    return _tpch.nation_trade_volume(spark, sf)


@register(
    "q13_customer_order_distribution",
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN (
    SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT'
  ) ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count""",
)
def q_q13_customer_order_distribution(spark, sf):
    """TPC-H Q13 shape (plans/tpch.py:customer_order_distribution):
    zero-preserving LEFT join + double aggregation — the order-count
    histogram keeps customers with no (non-urgent) orders."""
    return _tpch.customer_order_distribution(spark, sf)


@register(
    "q9_profit_by_nation_year",
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%rod%'
GROUP BY 1, 2""",
)
def q_q9_profit_by_nation_year(spark, sf):
    """TPC-H Q9 shape adapted to the schema (no partsupp: profit =
    discounted revenue) — plans/tpch.py:profit_by_nation_year; part
    filter pruned before broadcast, one fact shuffle."""
    return _tpch.profit_by_nation_year(spark, sf)


@register(
    "q21_sole_blame_suppliers",
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name""",
)
def q_q21_sole_blame_suppliers(spark, sf):
    """TPC-H Q21 shape (plans/tpch.py:sole_blame_suppliers): the
    correlated EXISTS + NOT EXISTS pair DECORRELATED into one per-order
    aggregate (n_supp, n_ret) — one l_orderkey shuffle instead of two
    correlated fact self-joins.  The oracle runs the literal EXISTS
    form, so parity proves the decorrelation equivalence."""
    return _tpch.sole_blame_suppliers(spark, sf)


@register(
    "q19_disjunctive_revenue",
    """SELECT
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""",
)
def q_q19_disjunctive_revenue(spark, sf):
    """TPC-H Q19 shape (plans/tpch.py:disjunctive_part_revenue): three
    OR'd brand/size/quantity windows evaluated on ONE broadcast join —
    the fact table is read once, not unioned three times."""
    return _tpch.disjunctive_part_revenue(spark, sf)


@register(
    "q22_idle_rich_customers",
    """WITH ab AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
FROM customer, ab
WHERE c_acctbal > ab.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey""",
)
def q_q22_idle_rich_customers(spark, sf):
    """TPC-H Q22 shape (plans/tpch.py:idle_rich_customers): scalar
    above-average balance threshold broadcast back, NOT-EXISTS as a
    LEFT ANTI join (against urgent orders — every testdata customer has
    some order); the threshold divides exact aggregates in a pinned
    order so the qualifying set is engine-exact."""
    return _tpch.idle_rich_customers(spark, sf)


@register(
    "q11_important_parts",
    """WITH nl AS (
  SELECT l_partkey, CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
),
val AS (
  SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS value
  FROM nl GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(v) AS DOUBLE) AS total FROM nl)
SELECT l_partkey AS p_partkey, value
FROM val, tot WHERE value > 0.001 * total""",
)
def q_q11_important_parts(spark, sf):
    """TPC-H Q11 SHAPE over the driver schema (which has no partsupp
    table — lineitem revenue stands in for supplycost x availqty, the
    same group-value-vs-global-scalar structure): per-part value of one
    nation's suppliers, kept when above a fraction of the nation
    total.  The scalar total rides a 1-row broadcast crossJoin;
    decimal-exact sums cast to double make the HAVING boundary
    engine-exact."""
    li = load_table(spark, sf, "lineitem")
    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    v = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    nl = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat.where(F.col("n_name") == "NATION_3")),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .select("l_partkey", v.alias("v"))
    )
    val = nl.groupBy("l_partkey").agg(F.sum("v").cast("double").alias("value"))
    tot = nl.agg(F.sum("v").cast("double").alias("total"))
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("value") > F.lit(0.001) * F.col("total"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


@register(
    "q16_supplier_part_counts",
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (5, 10, 15, 20, 25, 30)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500)
GROUP BY p_brand, p_type, p_size""",
)
def q_q16_supplier_part_counts(spark, sf):
    """TPC-H Q16 shape (no partsupp: lineitem is the who-supplies-what
    relation): distinct supplier count per (brand, type, size) slice,
    excluding a supplier denylist via NOT IN — a broadcast anti join
    (the comment-LIKE complaint filter of real Q16 becomes an acctbal
    threshold; the driver schema has no s_comment)."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    sup = load_table(spark, sf, "supplier")
    bad = sup.where(F.col("s_acctbal") < 1500).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(
            (F.col("p_brand") != "Brand#13")
            & ~F.col("p_type").startswith("PROMO")
            & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
        )
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .select(
            "p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"),
            "supplier_cnt",
        )
    )


@register(
    "q20_excess_suppliers",
    """WITH sl AS (
  SELECT l_suppkey, l_partkey, CAST(l_quantity AS DECIMAL(38,6)) AS q
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
),
shipped AS (
  SELECT l_suppkey, l_partkey, CAST(SUM(q) AS DOUBLE) AS qty
  FROM sl GROUP BY l_suppkey, l_partkey
),
per_part AS (
  SELECT l_partkey, CAST(SUM(q) AS DOUBLE) AS total_qty
  FROM sl GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name
FROM shipped sh
JOIN per_part pp ON pp.l_partkey = sh.l_partkey
JOIN supplier ON s_suppkey = sh.l_suppkey
WHERE sh.qty > 0.5 * pp.total_qty""",
)
def q_q20_excess_suppliers(spark, sf):
    """TPC-H Q20 shape (availqty > half a part's year volume becomes:
    this supplier shipped more than half the part's total year volume
    — the same correlated-threshold nested structure, partsupp-free):
    suppliers dominating any 'small%' part's 1995 shipments.  Both
    aggregates ride one shuffle family on l_partkey; the per-part
    total broadcasts back; decimal-exact sums."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    sup = load_table(spark, sf, "supplier")
    sl = (
        li.join(F.broadcast(part.where(F.col("p_name").startswith("small"))),
                li.l_partkey == part.p_partkey)
        .where(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
        )
        .select("l_suppkey", "l_partkey",
                F.col("l_quantity").cast("decimal(38,6)").alias("q"))
    )
    shipped = sl.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("q").cast("double").alias("qty")
    )
    per_part = sl.groupBy("l_partkey").agg(
        F.sum("q").cast("double").alias("total_qty")
    )
    return (
        shipped.join(F.broadcast(per_part), "l_partkey")
        .where(F.col("qty") > F.lit(0.5) * F.col("total_qty"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "customer_balance_ranks",
    """SELECT c_custkey, c_nationkey,
       CAST(percent_rank() OVER w AS DOUBLE) AS bal_pct_rank,
       CAST(cume_dist() OVER w AS DOUBLE) AS bal_cume_dist,
       CAST(ntile(4) OVER w AS BIGINT) AS bal_quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""",
)
def q_customer_balance_ranks(spark, sf):
    """Ranking-window depth: percent_rank, cume_dist and ntile(4) of
    customer balance within each nation — the quantile-bucketing pass a
    feature pipeline runs per group.  The order key carries c_custkey as
    a unique tie-break, so every rank (and both ratio outputs — ratios
    of identical integers) is engine-exact.  One shuffle on the window
    partition key, no global sort."""
    cust = load_table(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
    )


@register(
    "q8_market_share",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS nation_revenue,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
GROUP BY 1""",
)
def q_q8_market_share(spark, sf):
    """TPC-H Q8 shape (plans/tpch.py:market_share): one fact pass
    computes both the supplier-nation conditional revenue and the
    regional total (no second scan); exact-decimal sums divided in a
    pinned order make the share engine-exact."""
    return _tpch.market_share(spark, sf)


@register(
    "quantity_price_correlation",
    """WITH q AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS DECIMAL(38,0)) AS x,
         CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS y
  FROM lineitem
),
s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
FROM s""",
)
def q_quantity_price_correlation(spark, sf):
    """Per-flag Pearson correlation computed FROM exact decimal moment
    sums in a pinned expression — not the built-in corr(), whose
    float accumulation order is partition-dependent.  The five moments
    are exact decimals; the final formula is the same IEEE double
    arithmetic in both engines, so the result is bit-reproducible at
    any parallelism.  One partial-aggregated pass over the fact table."""
    li = load_table(spark, sf, "lineitem")
    # Correlation is invariant under linear scaling, so quantize both
    # columns to centi-units first: every moment sum is then a SCALE-0
    # decimal — exact in both engines (decimal multiply at non-zero
    # scale rounds differently across engines at the 38-digit cap).
    q = F.round(F.col("l_quantity") * 100).cast("decimal(38,0)")
    p = F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select("l_returnflag", "n", corr.alias("corr_qty_price"))


@register(
    "quantity_grouping_sets",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
)
def q_quantity_grouping_sets(spark, sf):
    """Explicit GROUPING SETS — the third grouping-analytics form next
    to cube_quantity and rollup_quantity: the two single-dimension
    marginals plus the grand total, WITHOUT the (flag, status) cross
    cells a cube would add.  One pass, Spark expands the sets inside a
    single aggregate; NULL grouping keys coalesced for unambiguous
    cross-engine hashing."""
    li = load_table(spark, sf, "lineitem")
    li.createOrReplaceTempView("_li_gs")
    return spark.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                  COALESCE(l_linestatus, 'ALL') AS linestatus,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
                  CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM _li_gs
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
    )


@register(
    "cheapest_supplier_per_part",
    """SELECT l_partkey, l_suppkey, avg_price FROM (
  SELECT l_partkey, l_suppkey, avg_price,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY avg_price, l_suppkey) AS rn
  FROM (
    SELECT l_partkey, l_suppkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_price
    FROM lineitem GROUP BY l_partkey, l_suppkey
  )
) WHERE rn = 1""",
)
def q_cheapest_supplier_per_part(spark, sf):
    """Per-group ARGMIN with a deterministic tie-break (TPC-H Q2's core
    shape, partsupp stood in by observed lineitem prices): aggregate to
    (part, supplier) grain, then a row_number window picks each part's
    cheapest supplier — ties resolve by suppkey, so the winner is
    engine-exact (min_by/arg_min leave ties undefined).  The rank
    filter compiles to WindowGroupLimit: map tasks emit one row per
    part, never a full per-part sort."""
    li = load_table(spark, sf, "lineitem")
    grain = li.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
            / F.count("*").cast("double")
        ).alias("avg_price")
    )
    w = Window.partitionBy("l_partkey").orderBy("avg_price", "l_suppkey")
    return (
        grain.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "avg_price")
    )


@register(
    "partkeys_both_years",
    """SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1996
INTERSECT
SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1997""",
)
def q_partkeys_both_years(spark, sf):
    """Relation-level INTERSECT (the set op the reference never had):
    parts shipped in both 1996 and 1997.  Spark compiles intersect()
    to a distinct left-semi join — one shuffle per side on the full
    row, no row fan-out."""
    li = load_table(spark, sf, "lineitem")
    y = F.year(F.col("l_shipdate").cast("timestamp"))
    a = li.where(y == 1996).select("l_partkey")
    b = li.where(y == 1997).select("l_partkey")
    return a.intersect(b)


@register(
    "customer_rfm_segments",
    """WITH rfm AS (
  SELECT o_custkey AS c_custkey,
         CAST(max(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000) AS BIGINT) AS last_order_day,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, last_order_day, frequency, monetary,
       CAST(ntile(4) OVER (ORDER BY last_order_day, c_custkey) AS BIGINT) AS r_quartile,
       CAST(ntile(4) OVER (ORDER BY frequency, c_custkey) AS BIGINT) AS f_quartile,
       CAST(ntile(4) OVER (ORDER BY monetary, c_custkey) AS BIGINT) AS m_quartile
FROM rfm""",
)
def q_customer_rfm_segments(spark, sf):
    """RFM segmentation: per customer the recency (last order day as an
    integer epoch-day), frequency (order count) and monetary (exact
    decimal spend) plus ntile(4) quartile scores for each axis — the
    canonical customer-binning feature pass.  The ntile windows are
    GLOBAL by the metric, which is a deliberate single-reducer-per-
    window shape at the customer-dimension scale (customers ~= dim
    table, not the fact table); unique c_custkey tie-breaks keep every
    quartile engine-exact.  One shuffle for the per-customer aggregate,
    then window passes over the small aggregate."""
    orders = load_table(spark, sf, "orders")
    # exact integer floor-div (not float /): the repo's own overlap-join
    # fix (ADVICE r3) — double quotients go inexact past 2^53 and an
    # off-by-one day here would flip a quartile boundary
    day = F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
    rfm = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max(day).alias("last_order_day"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double").alias("monetary"),
    )
    wr = Window.orderBy("last_order_day", "c_custkey")
    wf = Window.orderBy("frequency", "c_custkey")
    wm = Window.orderBy("monetary", "c_custkey")
    return rfm.select(
        "c_custkey", "last_order_day", "frequency", "monetary",
        F.ntile(4).over(wr).cast("long").alias("r_quartile"),
        F.ntile(4).over(wf).cast("long").alias("f_quartile"),
        F.ntile(4).over(wm).cast("long").alias("m_quartile"),
    )
