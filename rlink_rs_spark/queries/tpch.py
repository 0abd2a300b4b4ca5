"""Adapted TPC-H query shapes beyond the q1/q3/q5/q6/q10/q14 set.

The driver fixtures carry a reduced TPC-H schema (no partsupp, no
commit/receipt dates, no phone/container columns), so each query here keeps
the *shape* of its TPC-H namesake — the join topology, subquery pattern, and
aggregation structure that stress the same engine paths the reference's
relational pipelines exercise (dataflow composition per
/root/reference/rlink/src/core/data_stream.rs) — with predicates adapted to the
fixture columns. All money aggregates use the engine-neutral integer-cents
pattern (SUM_EXACT_SQL) so Spark and the DuckDB oracle are bit-identical.

Scale notes (100 TB): every query is expressed declaratively so Catalyst
picks broadcast vs sort-merge per side size; correlated TPC-H subqueries are
rewritten as agg-then-join (no per-row subquery execution); window functions
partition on high-cardinality keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rlink_rs_spark.queries.base import SUM_EXACT_SQL, register
from rlink_rs_spark.tables import load_table

REV_SQL = "SUM(CAST(ROUND({col} * (1 - {disc}) * 10000) AS BIGINT))/10000.0"


def _revenue_exact(alias: str, price="l_extendedprice", disc="l_discount"):
    return (F.sum(F.round(F.col(price) * (1 - F.col(disc)) * 10000).cast("long")) / 10000.0).alias(alias)


@register(
    "q2_min_cost_supplier",
    """
    WITH shipped AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), cand AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
             ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                ORDER BY s.s_acctbal DESC, s.s_suppkey ASC) AS rn
      FROM part p JOIN shipped sh ON sh.l_partkey = p.p_partkey
                  JOIN supplier s ON s.s_suppkey = sh.l_suppkey
                  JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM cand WHERE rn = 1
    ORDER BY s_acctbal DESC, p_partkey ASC LIMIT 100
    """,
    "TPC-H Q2 shape: correlated min-cost-supplier subquery rewritten as a "
    "per-part ranking window (best supplier by acctbal stands in for min "
    "supplycost; partsupp is absent so shipped pairs from lineitem stand in). "
    "Scale: distinct pair extraction is a map-side-combinable agg; the part "
    "filter is broadcast; the window partitions on p_partkey (high card).",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    shipped = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    cand = (
        shipped.join(F.broadcast(part), shipped.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), shipped.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey").asc())
        .limit(100)
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 shape: EXISTS-correlated subquery as a left-semi join, then "
    "count per priority (returnflag='R' stands in for the absent "
    "commitdate<receiptdate predicate). Scale: semi-join shuffles on "
    "l_orderkey with the date filter pushed to the orders scan; AQE picks "
    "broadcast when the filtered orders side is small.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    late = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {REV_SQL.format(col='l.l_extendedprice', disc='l.l_discount')} AS revenue
    FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    "TPC-H Q7 shape: 6-table snowflake with a symmetric nation-pair "
    "disjunction and per-year revenue. Scale: both nation joins broadcast; "
    "the fact-side joins (lineitem-orders) shuffle on orderkey once and the "
    "date filter is pushed to the parquet scan.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_revenue_exact("revenue"))
    )


@register(
    "q8_market_share",
    """
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) AS rev4,
             n1.n_name AS supp_nation
      FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n2.n_regionkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev4 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rev4) AS DOUBLE) AS mkt_share
    FROM base GROUP BY o_year
    """,
    "TPC-H Q8 shape: national market share inside a region's market — "
    "conditional-sum-over-sum on an 8-table join. The share divides two "
    "exact integer-cents sums, so both engines produce the identical double. "
    "Scale: all dimension joins broadcast; one fact shuffle on orderkey.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
            .cast("long")
            .alias("rev4"),
            "supp_nation",
        )
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("rev4")).otherwise(F.lit(0)))
    return base.groupBy("o_year").agg(
        (num.cast("double") / F.sum("rev4").cast("double")).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    """
    SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
           SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)
                           - 0.1 * p.p_retailprice * l.l_quantity) * 10000) AS BIGINT))/10000.0
             AS sum_profit
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY n.n_name, year(l.l_shipdate)
    """,
    "TPC-H Q9 shape: per-nation per-year profit on a name-pattern part "
    "filter (0.1*retailprice*quantity stands in for the absent "
    "ps_supplycost). Profit can go negative — exercises signed "
    "round-half-away parity between engines. Scale: part/supplier/nation "
    "broadcast, single fact scan, no orders join needed.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").cast("long").alias("o_year"))
        .agg((F.sum(F.round(profit * 10000).cast("long")) / 10000.0).alias("sum_profit"))
    )


@register(
    "q12_priority_class",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
    "TPC-H Q12 shape: conditional-count pivot of order priority per line "
    "status (linestatus stands in for the absent shipmode). Scale: date "
    "filter pushed to the lineitem scan, one shuffle join on orderkey, "
    "map-side partial counts.",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    "TPC-H Q13 shape: customers-without-orders distribution — left outer "
    "join with an ON-clause filter (NOT a WHERE, so zero-order customers "
    "survive), per-customer count, then a histogram of counts. Scale: first "
    "agg shuffles on custkey (high card, no skew), the second agg's domain "
    "is tiny (distinct counts) — classic two-level reaggregation.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q18_large_volume_customers",
    f"""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           epoch_ms(o.o_orderdate) AS orderdate_ms, o.o_totalprice, big.sum_qty
    FROM big JOIN orders o ON o.o_orderkey = big.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    "TPC-H Q18 shape: IN-subquery over a HAVING aggregate rewritten as "
    "agg-then-join (large-volume orders). l_quantity is integer-valued so "
    "the plain double SUM is exact in both engines. Scale: the HAVING agg "
    "is map-side combinable and shrinks the fact table to a sliver before "
    "any join; orders joins on orderkey, customer broadcasts.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            "o_totalprice",
            "sum_qty",
        )
    )


@register(
    "q16_supplier_part_counts",
    """
    WITH shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    bad_supp AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT sh.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM shipped sh JOIN part p ON p.p_partkey = sh.l_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 9, 15, 23, 36, 49)
      AND sh.l_suppkey NOT IN (SELECT s_suppkey FROM bad_supp)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    "TPC-H Q16 shape: distinct supplier counts per (brand, type, size) with "
    "a NOT IN supplier exclusion (negative acctbal stands in for the absent "
    "complaints predicate; shipped pairs stand in for partsupp). Scale: "
    "the exclusion list is tiny -> broadcast left-anti; distinct pairs are "
    "a map-side-combinable agg; part filter broadcasts.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    shipped = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 9, 15, 23, 36, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        shipped.join(F.broadcast(bad), shipped.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_bracket_revenue",
    f"""
    SELECT {REV_SQL.format(col='l.l_extendedprice', disc='l.l_discount')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "TPC-H Q19 shape: disjunctive bracket predicates spanning both join "
    "sides (brand x size x quantity OR-brackets; shipmode/container columns "
    "absent). Scale: the join stays a broadcast equi-join on partkey with "
    "the OR residual evaluated post-join -- never a cartesian; integer-cents "
    "revenue is bit-exact.",
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return joined.where(bracket).agg(_revenue_exact("revenue"))


@register(
    "q22_dormant_customers",
    """
    WITH bal AS (
      SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS tot, COUNT(*) AS cnt
      FROM customer WHERE c_acctbal > 0
    ),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    )
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))/100.0 AS totacctbal
    FROM customer c, bal
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * bal.cnt > bal.tot
      AND c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY c_mktsegment
    """,
    "TPC-H Q22 shape: above-average-balance customers with no recent orders "
    "(no 2000+ order stands in for no-order-at-all, which is vacuous on the "
    "fixture; mktsegment stands in for the phone country code). The "
    "avg-balance scalar subquery is exact integer-cents arithmetic "
    "(bal*100*cnt > total_cents), so the threshold is bit-identical across "
    "engines -- a double AVG would make boundary rows engine-dependent. "
    "Scale: the 1-row aggregate broadcasts; the recent-customer exclusion "
    "is a left-anti shuffle on custkey.",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("tot"),
        F.count("*").alias("cnt"),
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
        .distinct()
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        cust.crossJoin(F.broadcast(bal))
        .where(cents * F.col("cnt") > F.col("tot"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(cents) / 100.0).alias("totacctbal"),
        )
    )


@register(
    "q11_important_stock",
    """
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS val_cents
      FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT SUM(val_cents) AS tot, CAST(COUNT(*) AS BIGINT) AS n FROM pv)
    SELECT l_partkey, val_cents/10000.0 AS part_value
    FROM pv, tot WHERE val_cents * 2 * tot.n > 3 * tot.tot
    """,
    "TPC-H Q11 shape: per-key value share against a global threshold "
    "(partsupp stock value stands in as per-part shipped revenue). TPC-H's "
    "SUM*FRACTION/SF threshold is scale-adjusted by spec; here the "
    "equivalent scale-free form is value > 1.5x the mean part value, as "
    "pure integer arithmetic (val_cents * 2 * n_parts > 3 * total_cents) "
    "so boundary parts are bit-identical across engines. Scale: one "
    "map-side-combined agg builds the per-part table; the 1-row "
    "(total, count) broadcasts; no second pass over the fact table.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    pv = li.groupBy("l_partkey").agg(F.sum(cents).alias("val_cents"))
    tot = pv.agg(F.sum("val_cents").alias("tot"), F.count("*").alias("n"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .where(F.col("val_cents") * 2 * F.col("n") > 3 * F.col("tot"))
        .select("l_partkey", (F.col("val_cents") / 10000.0).alias("part_value"))
    )


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    ), mx AS (SELECT MAX(rev_cents) AS mx FROM rev)
    SELECT s.s_suppkey, s.s_name, rev.rev_cents/10000.0 AS total_revenue
    FROM rev, mx JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.rev_cents = mx.mx
    """,
    "TPC-H Q15 shape: the revenue view + its MAX as a scalar subquery, "
    "keeping every supplier tied at the maximum (equality on exact integer "
    "cents -- a double SUM would make the tie engine-dependent). Scale: "
    "quarter filter pushed to the scan, one map-side-combined agg, 1-row "
    "max broadcast, supplier broadcast.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("rev_cents"))
    mx = rev.agg(F.max("rev_cents").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_cents") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("rev_cents") / 10000.0).alias("total_revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    WITH pq AS (
      SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS sumq,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      GROUP BY l_partkey
    )
    SELECT SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))/100.0/7.0 AS avg_yearly
    FROM lineitem l JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS BIGINT) * 5 * pq.cnt < pq.sumq
    """,
    "TPC-H Q17 shape: lost revenue from small-quantity orders; the "
    "correlated per-part AVG(quantity) subquery is rewritten as agg-then-"
    "join, and the 20%-of-average threshold is cleared of division "
    "(qty * 5 * cnt < sumq, all BIGINT) so boundary rows are bit-identical "
    "across engines. Scale: the brand/type filter broadcasts through the "
    "part join, the per-part agg is map-side combinable, and the fact "
    "re-join hits only the filtered parts.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    pq = filtered.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sumq"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(pq, "l_partkey")
        .where(F.col("l_quantity").cast("long") * 5 * F.col("cnt") < F.col("sumq"))
        .agg(
            (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0 / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q20_promo_suppliers",
    """
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ), pair_qty AS (
      SELECT l_partkey, l_suppkey,
             SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-07-01'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS early_qty,
             SUM(CAST(l_quantity AS BIGINT)) AS total_qty
      FROM lineitem JOIN red_parts ON p_partkey = l_partkey
      GROUP BY l_partkey, l_suppkey
    ), excess AS (
      SELECT DISTINCT l_suppkey FROM pair_qty WHERE early_qty * 2 > total_qty
    )
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN excess e ON e.l_suppkey = s.s_suppkey
                    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
    """,
    "TPC-H Q20 shape: nested IN-subqueries (promo parts -> part/supplier "
    "pairs above a correlated quantity threshold -> suppliers in one "
    "nation) rewritten as agg-then-semi-join; availqty > 0.5*shipped "
    "stands in as early-period share > half of total (integer compare, "
    "2*early > total). Scale: the red-part filter broadcasts into the "
    "fact scan, the pair agg is map-side combinable, and the supplier/"
    "nation joins broadcast.",
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    pair_qty = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(F.col("l_shipdate") < "1998-07-01", qty).otherwise(0)).alias(
                "early_qty"
            ),
            F.sum(qty).alias("total_qty"),
        )
    )
    excess = (
        pair_qty.where(F.col("early_qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    return (
        supp.join(excess, supp.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH f_orders AS (
      SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
    ), late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN f_orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name ASC LIMIT 100
    """,
    "TPC-H Q21 shape: suppliers who alone held up a finished multi-supplier "
    "order -- the EXISTS / NOT-EXISTS pair becomes a left-semi join (some "
    "OTHER supplier shipped in the order) and a left-anti join (no OTHER "
    "supplier was also late); 'late' adapts receipt-after-commit to "
    "shipdate > orderdate + 90 days on the reduced schema. Scale: both "
    "existence probes are equi-joins on orderkey (shuffle once, no "
    "per-row subquery execution); supplier broadcasts; numwait counts "
    "lineitems, preserving l1 multiplicity exactly like the SQL.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waited = late.join(
        others,
        (late.l_orderkey == F.col("o2")) & (late.l_suppkey != F.col("s2")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        waited.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )
