"""The remaining TPC-H query family (Q2, Q7-Q9, Q11-Q22), shaped to the
driver fixture schema.

The reference implements no queries at all (SURVEY.md §2.2 — no joins
beyond the broken data_frame.py:357-370 attempt, no aggregation, no
subqueries); this module is part of the §2.3 mandated extension surface:
the full decision-support join/agg/subquery repertoire, expressed
Spark-first so Catalyst owns join ordering, pushdown and AQE.

Shaping notes (the fixture lacks partsupp, l_shipmode, l_commitdate,
l_receiptdate, c_phone, p_container, p_mfgr):
- "supply cost" is proxied by the observed unit price
  l_extendedprice / l_quantity (Q2, Q11);
- "ship mode" is proxied by l_linestatus (Q12);
- Q4/Q21's late-delivery predicate is proxied by l_returnflag = 'R';
- Q22's country code is proxied by c_nationkey % 5.
Every query keeps the *plan shape* of its TPC-H counterpart — that is
what matters for the 100 TB goal: which side broadcasts, where the
shuffles land, how correlated subqueries decorrelate into joins.

Broadcast-hint policy: ``F.broadcast`` is reserved for tables whose size
is constant at every SF (nation = 25 rows, region = 5) and for 1-row
scalar re-aggregates (Q11 total, Q15 max, Q22 avg).  SF-scaled tables
(part, supplier, customer) carry NO hint — a forced hint overrides
Spark's size check and OOMs executors once the table outgrows the
driver/executor broadcast budget at large SF; AQE converts the join to
broadcast at runtime whenever the (filtered) side is actually small.

Cross-engine determinism (CLAUDE.md invariant 3): money sums go through
DECIMAL via functions.disc_price_sum/money_sum/decimal_sum; ratios are
computed as one double division of two exact sums, rounded with a +0.0
negative-zero guard; every LIMIT carries a unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import decimal_sum, disc_price, disc_price_sum, money_sum
from ..sources import load_table


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped: for each part in a size/type slice, the supplier(s)
    selling it at the minimum observed unit price (partsupp is absent, so
    unit cost = min over that supplier's lineitems of
    l_extendedprice/l_quantity).

    Q2's correlated MIN subquery decorrelates into: per-(part,supplier)
    min-price agg, per-part min agg, then an equi-join back on
    (partkey, price).  Scale: both aggs are map-side-partial on the same
    l_partkey-dominated keys; nation broadcasts, part/supplier joins are
    AQE size-decided (SF-scaled — no forced hint); no shuffle
    carries lineitem payload columns beyond the two keys + one double.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 10) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    min_cost = costs.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        costs.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(p, F.col("l_partkey") == p.p_partkey)
        .join(s, costs.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            "n_name",
            "unit_cost",
        )
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: shipping volume between two nations by year, both
    directions.

    Scale: the two nation lookups broadcast (aliased copies — Catalyst
    dedups the scan); the only wide shuffles are lineitem⋈orders and
    ⋈customer on their natural keys.  The pair-filter applies after the
    broadcasts, before the aggregation shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(disc_price_sum("l_extendedprice", "l_discount").alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: NATION_2's share of PROMO-part revenue among
    ASIA-region customers, by order year.

    Scale: the share is sum(CASE)/sum — one aggregation, no second pass;
    both sums are exact decimal so the final division is one deterministic
    double op.  part filters before the join (column-pruned to one key).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = disc_price("l_extendedprice", "l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.round(
                    decimal_sum(
                        F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(
                            F.lit(0).cast("long")
                        ),
                        scale=0,
                    )
                    / decimal_sum(vol, scale=0),
                    6,
                )
                + F.lit(0.0)
            ).alias("mkt_share")
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped: profit on 'red*' parts by supplier nation and
    year.  With no partsupp, supply cost is proxied as 10% of
    p_retailprice per unit; profit = disc-price − qty·cost, computed in
    exact integer 1e-4 units so the sum is order-free on both engines.

    Scale: the part filter prunes before the join (AQE broadcasts it at
    runtime when the filtered side fits); profit arithmetic is all
    codegen'd long math (no BigDecimal until the final sum).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    price_c = F.round(F.col("p_retailprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    profit_e4 = ep_c * (100 - disc_c) - qty * price_c * 10
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((decimal_sum(profit_e4, scale=0) / 10000.0).alias("sum_profit"))
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: parts whose shipped value (qty·unit-price, from
    lineitems of NATION_3 suppliers) exceeds 0.1% of the total such value.

    Q11's scalar HAVING subquery becomes: aggregate once, re-aggregate the
    tiny per-part result to one row, broadcast it back as a cross join.
    Scale: the expensive agg runs once; the threshold compare touches only
    O(parts) rows — no second scan of lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    value_c = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round(F.col("l_quantity")).cast("long")
    )
    by_part = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg((decimal_sum(value_c, scale=0) / 100.0).alias("value"))
    )
    total = by_part.agg(
        (decimal_sum(F.round(F.col("value") * 100).cast("long"), scale=0) / 100.0)
        .alias("total_value")
    )
    return (
        by_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("total_value") * 0.001)
        .select("l_partkey", "value")
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: per line status (ship-mode proxy), how many
    high- vs low-priority orders shipped in 1996-1997.

    Scale: conditional aggregation — one join, one pass; the CASE sums are
    map-side partial so the shuffle carries ≤ 2 longs per (partition,
    status).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, one).otherwise(zero)).alias("high_line_count"),
            F.sum(F.when(~high, one).otherwise(zero)).alias("low_line_count"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count (excluding
    URGENT orders) — the left-outer join + double aggregation.

    Scale: the join predicate's extra filter (priority) applies on the
    orders scan before the shuffle; the second groupBy is over at most
    max-orders-per-customer distinct keys — tiny.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of 1996-H1 revenue from PROMO parts.

    Scale: part joins pruned to (key, type), AQE size-decided; numerator and
    denominator come out of one aggregation pass as exact decimal sums, so
    the ratio is a single deterministic double division.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-07-01"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = disc_price("l_extendedprice", "l_discount")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.round(
                    decimal_sum(
                        F.when(F.col("p_type") == "PROMO", vol).otherwise(
                            F.lit(0).cast("long")
                        ),
                        scale=0,
                    )
                    * 100.0
                    / decimal_sum(vol, scale=0),
                    6,
                )
                + F.lit(0.0)
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue in 1996-Q1.

    The revenue view aggregates once; the scalar MAX re-aggregates the
    100-row result and broadcasts back — Q15's view + scalar subquery with
    no window and no second lineitem scan.  Revenue is an exact decimal
    sum, so the max-equality join is bit-deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        disc_price_sum("l_extendedprice", "l_discount").alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: distinct suppliers per (brand, type, size) for
    selected sizes, excluding one brand and any supplier with negative
    balance (the 'complaints' NOT IN proxy).

    Scale: the NOT IN decorrelates to an anti-join against the
    bad-supplier set (AQE size-decided — supplier is SF-scaled);
    COUNT(DISTINCT) plans as expand+two-phase agg
    with per-partition dedup before the shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if Brand#4 orders below 20%
    of that part's average quantity were not taken.

    The correlated AVG subquery decorrelates into a per-part aggregate
    joined back on partkey.  Scale: the avg-qty agg is map-side partial on
    l_partkey; the filter runs before the final single-row sum.  avg is
    exact-decimal-sum / count, so the 0.2·avg threshold is deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    avg_qty = li.groupBy(F.col("l_partkey").alias("aq_partkey")).agg(
        (decimal_sum(F.round(F.col("l_quantity")).cast("long"), scale=0)
         / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < F.col("avg_qty") * 0.2)
        .agg(
            (money_sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders totalling > 250 units — the
    group-HAVING semi-join into a 3-way join, top-100.

    Scale: the HAVING aggregate reduces lineitem to qualifying orderkeys
    (tiny) before any join; top-k is TakeOrderedAndProject with an
    orderkey tiebreak.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_orderkey"))
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250.0)
    )
    return (
        o.join(big, o.o_orderkey == F.col("big_orderkey"))
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty"
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three OR'd brand/size/quantity bands — the
    disjunctive-predicate join.

    Scale: part joins AQE size-decided; the OR-of-ANDs stays one codegen'd predicate
    evaluated join-side (no union-of-three-scans rewrite needed — the
    common join key means one pass).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    bands = (
        ((F.col("p_brand") == "Brand#4") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#19") & sz.between(1, 50) & q.between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(bands)
        .agg(
            disc_price_sum("l_extendedprice", "l_discount").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped: NATION-0-region suppliers who moved > 100 units
    of 'red*' parts — the nested IN-subquery chain as semi-join cascade.

    Scale: the part filter prunes the lineitem agg input (join AQE
    size-decided); the HAVING
    output (qualifying suppkeys) is tiny and semi-joins supplier — no
    supplier column ever crosses a wide shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    movers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("double").alias("red_qty"))
        .filter(F.col("red_qty") > 100.0)
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(movers, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: suppliers who were the *sole* returner in a
    multi-supplier finished order ('R' return proxies late delivery);
    count per supplier, top 100.

    The EXISTS becomes a left-semi join (another supplier in the order),
    the NOT EXISTS a left-anti join (another supplier also returned) —
    both equi on orderkey with a suppkey-inequality residual, so they
    plan as shuffle/broadcast hash joins, never a cartesian.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    return (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: rich-but-inactive customers by country code
    (c_nationkey % 5 proxies the phone prefix): balance above the
    positive-balance average, no orders since 2000.

    The scalar AVG subquery broadcasts one row; NOT EXISTS is a left-anti
    join against recent orders pruned to o_custkey only.  Scale: the anti
    join is the one shuffle; everything else is broadcast or map-side.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_nationkey") % 5).isin(0, 2, 3)
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (money_sum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
    )
