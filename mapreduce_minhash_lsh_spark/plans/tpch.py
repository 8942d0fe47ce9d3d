"""TPC-H-style relational plans, written for the 100 TB plan shape:

  * dimension joins are explicitly ``F.broadcast`` (region/nation/
    customer/supplier are tiny next to orders/lineitem — never shuffle
    the fact table for them);
  * every aggregate that sums doubles goes through an exact
    DECIMAL(38,6) sum and is cast back to double, so results are
    partition-order independent (bit-identical across runs, engines,
    and cluster sizes — a correctness property, not just a test nicety);
  * filters sit directly on the scan so Catalyst pushes them into the
    parquet reader (verify with .explain: PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_minhash_lsh_spark.sources.tables import load_table


def _dec(col: F.Column | str) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(38,6)")


def _dsum(col: F.Column | str, alias: str) -> F.Column:
    return F.sum(_dec(col)).cast("double").alias(alias)


def pricing_summary(spark: SparkSession, sf: str, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate over the fact table; partial
    aggregation makes this shuffle only num_groups rows per partition."""
    l = load_table(spark, sf, "lineitem").where(F.col("l_shipdate") <= cutoff)
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.sum(_dec(disc_price)).cast("double").alias("sum_disc_price"),
            F.sum(_dec(charge)).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def top_revenue_orders(
    spark: SparkSession, sf: str, segment: str = "BUILDING",
    cutoff: str = "1998-01-01", n: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: broadcast the filtered customer dim into the
    orders⋈lineitem join, aggregate, deterministic top-n."""
    cust = load_table(spark, sf, "customer").where(F.col("c_mktsegment") == segment)
    orders = load_table(spark, sf, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(F.sum(_dec(revenue)).cast("double").alias("revenue"),
             F.count("*").alias("n_items"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(n)
    )


def region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: star join — broadcast region->nation->customer chain,
    shuffle only on the fact side keys."""
    region = load_table(spark, sf, "region")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(_dec(revenue)).cast("double").alias("revenue"),
             F.count("*").alias("n_items"))
    )


def top_orders_per_customer(spark: SparkSession, sf: str, n: int = 3) -> DataFrame:
    """Window top-k: rank orders within each customer (no global sort)."""
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
        ).where(F.col("rn") <= n)
    )


def rollup_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — grouping-sets coverage;
    NULL grouping keys coalesced to 'ALL' for unambiguous hashing."""
    l = load_table(spark, sf, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(_dsum("l_quantity", "sum_qty"), F.count("*").alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty", "n_rows",
        )
    )


def distinct_parts_per_flag(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT(DISTINCT) coverage — expands to two-phase distinct aggregation."""
    l = load_table(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


def returned_item_customers(
    spark: SparkSession, sf: str, lo: str = "1996-01-01", hi: str = "1996-07-01",
    n: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer.

    lineitem filtered on the scan (returnflag pushed down), orders
    date-filtered on the scan, customer+nation broadcast — the fact
    table shuffles once, on o_orderkey, for the join."""
    li = load_table(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dec(revenue)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(n)
    )


def large_quantity_orders(
    spark: SparkSession, sf: str, threshold: int = 300
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with their customer.  The HAVING runs as a partial-aggregated
    groupBy on the fact table; only qualifying orderkeys join onward."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > threshold)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_totalprice").alias("totalprice"), "total_qty",
        )
    )


def late_shipment_priorities(
    spark: SparkSession, sf: str,
    lo: str = "1996-01-01", hi: str = "1996-04-01",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q4 shape on this schema: per-priority counts of orders with
    at least one LATE line (shipped >= late_days after the order date).

    The EXISTS compiles to a LEFT SEMI join — each qualifying order
    counted once no matter how many late lines — with the date-window
    filter pushed to the orders scan.  The non-equi part of the
    predicate rides the equi-join on orderkey, so there is no range/
    cross join.  Epoch-microsecond arithmetic keeps the cutoff
    engine-exact (no calendar functions)."""
    late_us = late_days * 86_400 * 1_000_000
    orders = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf, "lineitem")
    # parquet timestamps read as TIMESTAMP_NTZ; the session TZ is pinned
    # UTC (sources/tables.py), so casting to timestamp yields the same
    # epoch-us DuckDB's epoch_us() computes on the naive value.
    cond = (orders.o_orderkey == li.l_orderkey) & (
        F.unix_micros(li.l_shipdate.cast("timestamp"))
        >= F.unix_micros(orders.o_orderdate.cast("timestamp")) + F.lit(late_us)
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_late_orders"))
    )


def priority_lines_by_flag(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape on this schema: per return-flag counts of high-
    vs low-priority lines.  One shuffle (the orderkey join — orders is
    left to AQE: broadcast at small SF, sort-merge at scale); the CASE
    aggregation is a pure conditional count, exact in integers."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def promo_revenue_share(
    spark: SparkSession, sf: str, lo: str = "1996-01-01", hi: str = "1997-01-01"
) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO-type parts in a
    shipdate window.  part is broadcast; both sums are exact decimals
    and the share divides the two doubles in a pinned order, so the
    ratio is bit-identical across engines and partitionings."""
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    part = load_table(spark, sf, "part")
    rev = _dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(38,6)")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue") * F.lit(100.0)).alias(
            "promo_pct"
        ),
    )


def top_revenue_supplier(
    spark: SparkSession, sf: str, lo: str = "1996-01-01", hi: str = "1996-04-01"
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a
    quarter — ties all returned, like the reference query's equality
    against the view max.  The max is aggregated once and broadcast
    back against the (already supplier-grained, tiny) revenue relation;
    no global sort, no single-task window."""
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    supp = load_table(spark, sf, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        _dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("_max"))
    return (
        rev.join(F.broadcast(best), F.col("total_rev") == F.col("_max"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


def small_quantity_revenue(
    spark: SparkSession, sf: str, brand: str = "Brand#13"
) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's average quantity) were not filled,
    for one brand.  The per-part average is a correlated scalar
    subquery in the reference SQL; here it is one partial-aggregated
    groupBy on the fact table joined back — the decorrelated plan every
    engine wants.  The average divides two exact aggregates in a pinned
    order, so the threshold (and thus the row set) is engine-exact."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").where(F.col("p_brand") == brand)
    lim = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(_dec("l_quantity")).cast("double")
            / F.count("*").cast("double")
            * F.lit(0.2)
        ).alias("lim")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(lim, li.l_partkey == lim.pk)
        .where(F.col("l_quantity") < F.col("lim"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


def nation_trade_volume(
    spark: SparkSession, sf: str, lo: str = "1996-01-01", hi: str = "1998-01-01"
) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between (supplier nation, customer
    nation) pairs per year.  The lineitem fact joins supplier and the
    order->customer chain; nation (and supplier/customer at any SF where
    they fit) broadcast, so the fact table shuffles only for the orders
    equi-join.  Year comes from the shipdate under the UTC-pinned
    session, matching the oracle's calendar exactly."""
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    orders = load_table(spark, sf, "orders")
    supp = load_table(spark, sf, "supplier")
    cust = load_table(spark, sf, "customer")
    nat = load_table(spark, sf, "nation")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("timestamp")).cast("long").alias("l_year"),
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue")
        )
    )


def customer_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly N orders
    (urgent orders excluded, standing in for the reference's comment
    filter).  A LEFT outer join keeps zero-order customers in the
    distribution; two aggregations, the second over an order-count
    relation that is already tiny."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


def disjunctive_part_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd brand/size/quantity
    windows.  The disjunction stays one predicate on one broadcast
    hash join — no union of three scans; Catalyst pushes the common
    partkey equi-condition and evaluates the OR post-join, reading the
    fact table once."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    q = F.col("l_quantity")
    arm = lambda brand, szlo, szhi, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(szlo, szhi)
        & q.between(qlo, qhi)
    )
    pred = (
        arm("Brand#12", 1, 5, 1, 11)
        | arm("Brand#23", 1, 10, 10, 20)
        | arm("Brand#34", 1, 15, 20, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(pred)
        .agg(
            _dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


def idle_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of customers with
    above-average positive balance and no URGENT orders (every testdata
    customer has some order, so the urgency filter keeps the anti-join
    non-vacuous).  The global average is one scalar aggregate broadcast
    back (sum/count divided in a pinned order, engine-exact); the
    no-matching-orders test is a LEFT ANTI join — no NOT IN, no null
    traps, shuffle only on custkey."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count("*").cast("double")
        ).alias("_avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


def market_share(
    spark: SparkSession,
    sf: str,
    region: str = "ASIA",
    supp_nation: str = "NATION_3",
) -> DataFrame:
    """TPC-H Q8 shape: per order-year, the share of revenue shipped into
    ``region`` that came from suppliers in ``supp_nation``.  One pass
    over the fact table computes both the conditional and total sums
    (no second scan, no self-join); the share divides two exact
    decimals in a pinned order so it is engine-exact."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region").where(F.col("r_name") == region)
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    rev = _dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(38,6)")
    from_nation = F.when(F.col("sn_name") == supp_nation, rev).otherwise(zero)
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(
            F.year(F.col("o_orderdate").cast("timestamp")).cast("long").alias("o_year")
        )
        .agg(
            F.sum(from_nation).cast("double").alias("nation_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "o_year",
        "nation_revenue",
        "total_revenue",
        (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
    )


def profit_by_nation_year(
    spark: SparkSession, sf: str, name_token: str = "rod"
) -> DataFrame:
    """TPC-H Q9 shape, adapted to the available schema (no partsupp
    table, so profit = discounted revenue rather than revenue minus
    ps_supplycost): per supplier-nation x order-year profit on parts
    whose name contains ``name_token``.  The part filter is applied
    BEFORE the broadcast so the fact join prunes on the small side;
    part/supplier/nation broadcast, the fact table shuffles once for
    the orders equi-join; decimal-exact sum."""
    part = load_table(spark, sf, "part").where(
        F.col("p_name").contains(name_token)
    ).select("p_partkey")
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = _dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("timestamp")).cast("long").alias("o_year"),
        )
        .agg(F.sum(rev).cast("double").alias("profit"))
    )


def sole_blame_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape, adapted (no receipt/commit dates: "late" =
    l_returnflag 'R' on a finished order): suppliers whose returned
    line sits on a multi-supplier 'F' order where NO OTHER supplier
    also had a returned line.

    The reference formulation is a correlated EXISTS + NOT EXISTS on
    the fact table; correlated rewrites re-join lineitem twice.  The
    scalable plan DECORRELATES both into one per-order aggregate:
    n_supp = countDistinct(supplier), n_ret = countDistinct(supplier
    with a returned line) — then EXISTS(other supplier) == n_supp >= 2
    and NOT EXISTS(other supplier with 'R'), given the probe line is
    'R', == n_ret == 1.  One extra shuffle on l_orderkey replaces two
    correlated self-joins; the oracle runs the literal EXISTS form, so
    parity also proves the decorrelation equivalence."""
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # Two-level aggregate instead of two countDistincts: multiple
    # DISTINCT aggregates compile to an Expand (x2 fan-out of the fact
    # table before the shuffle); the (order, supplier) pre-aggregate
    # shrinks map output first and the per-order counts ride its
    # partitioning without the fan-out.
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    stats = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("has_r").alias("n_ret"),
    )
    orders_f = load_table(spark, sf, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    probe = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .join(stats, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
    )
    return (
        probe.join(F.broadcast(supp), probe.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )
