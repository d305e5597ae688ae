"""Query registry: every implemented operator as a (Spark impl, DuckDB oracle)
pair for the driver's correctness gate (SURVEY §5.2).

Conventions that make cross-engine value-hashing deterministic:

* money/quantity aggregates go through ``CAST(SUM(CAST(x AS DECIMAL)) AS
  DOUBLE)`` — decimal arithmetic is exact, so the double result is
  bit-identical regardless of accumulation order/engine;
* raw timestamps never appear in outputs — dates are CAST AS DATE, event
  times compared as epoch integers (``ts_ns``/``epoch_ns``);
* every computed column is aliased identically on both sides;
* LIMIT queries carry a total-order ORDER BY (deterministic tiebreak);
* window ranks are cast to INT on both sides (DuckDB row_number is BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .conf import SkewJoinConf
from .functions.text import (
    LANG_MARKERS,
    lang_id,
    punct_count,
    quality_score,
    stopword_count,
    token_count,
)
from .operators.dedup import (
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    shingles,
)
from .operators.similarity import cosine_topk, lsh_topk
from .operators.skew_join import skew_join
from .sources.tables import load_tables

# conf that engages salting on the driver tables (hottest key ≈660 rows at
# sf0.01): a key with >=200 rows fragments, R = clamp(freq/100, 1, P)
SKEW_CONF = SkewJoinConf(replication_factor=0.01, hot_threshold=200)

_DEC_MONEY = "decimal(18,2)"
_DEC_PROD = "decimal(24,6)"


def _null_first(keys) -> list:
    """Sort a sketch-result key set that may mix ``None`` (the NULL
    group, ADVICE r6 #2) with real values: None sorts first, the rest
    by natural order. Plain ``sorted()`` raises TypeError on the mix
    (ADVICE r7 #1)."""
    ks = list(keys)
    return [k for k in ks if k is None] + sorted(
        k for k in ks if k is not None
    )


def _dsum(col_expr, dec: str = _DEC_MONEY):
    """CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE) — deterministic double sum."""
    return F.sum(col_expr.cast(dec)).cast("double")


# --------------------------------------------------------------------------
# TPC-H-style analytics
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    g = l.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dsum(disc_price, _DEC_PROD).alias("sum_disc_price"),
        _dsum(charge, _DEC_PROD).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    l = t["lineitem"].where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    j = l.join(
        F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    g = (
        j.groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_orderpriority")
        .agg(_dsum(disc_price, _DEC_PROD).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
    return g.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")


Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    j = (
        t["lineitem"]
        .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
    )
    return j.groupBy("n_name").agg(_dsum(disc_price, _DEC_PROD).alias("revenue"))


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# skew_join family (the reference surface)
# --------------------------------------------------------------------------

def skew_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = skew_join(
        t["orders"], t["customer"], [("o_custkey", "c_custkey")], "inner", SKEW_CONF
    )
    return j.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.to_date("o_orderdate").alias("o_orderdate"), "o_orderpriority",
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    )


SJ_ORDERS_CUSTOMER_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       c_name, c_nationkey, c_acctbal, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def skew_join_lineitem_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = skew_join(
        t["lineitem"], t["supplier"], [("l_suppkey", "s_suppkey")], "inner", SKEW_CONF
    )
    return j.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag",
        F.to_date("l_shipdate").alias("l_shipdate"),
        "s_name", "s_nationkey", "s_acctbal",
    )


SJ_LINEITEM_SUPPLIER_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       l_extendedprice, l_discount, l_returnflag,
       CAST(l_shipdate AS DATE) AS l_shipdate,
       s_name, s_nationkey, s_acctbal
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
"""


def skew_join_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # sample estimator: the composite key space is near-unique, so the exact
    # pre-pass (full 2-col groupBy on both sides) buys nothing — a 5% sample
    # finds any genuinely hot key and costs 2.6x less wall-clock at sf0.1.
    # Inner join => approximate counts cannot affect correctness (the
    # exactly-once pair guarantee is structural; sampling only tunes R).
    conf = SkewJoinConf(
        replication_factor=0.01, hot_threshold=200,
        estimator="sample", sample_fraction=0.05,
    )
    j = skew_join(
        t["lineitem"], ps, [("l_partkey", "pk"), ("l_suppkey", "sk")], "inner", conf
    )
    return j.select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "cnt")


SJ_MULTICOL_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, cnt
FROM lineitem
JOIN (SELECT l_partkey AS pk, l_suppkey AS sk, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey, l_suppkey) ps
  ON l_partkey = pk AND l_suppkey = sk
"""


def skew_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = skew_join(
        t["customer"], t["orders"], [("c_custkey", "o_custkey")], "left", SKEW_CONF
    )
    return j.select(
        "c_custkey", "c_name", "c_acctbal", "o_orderkey", "o_totalprice",
        F.to_date("o_orderdate").alias("o_orderdate"),
    )


SJ_LEFT_OUTER_SQL = """
SELECT c_custkey, c_name, c_acctbal, o_orderkey, o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
"""


def skew_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return skew_join(
        t["customer"], t["orders"], [("c_custkey", "o_custkey")], "left_semi", SKEW_CONF
    )


SJ_SEMI_SQL = """
SELECT * FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def skew_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no 1995 order. The right side is date-restricted
    so the anti-join output is NON-EMPTY at sf0.01 (VERDICT r7 #7 —
    every customer has some order in the fixture, so the unrestricted
    form certified nothing)."""
    t = load_tables(spark, sf_dir)
    orders_95 = t["orders"].where(
        F.col("o_orderdate").between("1995-01-01", "1995-12-31")
    )
    return skew_join(
        t["customer"], orders_95, [("c_custkey", "o_custkey")], "left_anti", SKEW_CONF
    )


SJ_ANTI_SQL = """
SELECT * FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate BETWEEN DATE '1995-01-01'
                                        AND DATE '1995-12-31')
"""


# --------------------------------------------------------------------------
# aggregation / window / sort / set-op coverage
# --------------------------------------------------------------------------

def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _dsum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("sum_price"),
        )
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


WINDOW_TOP_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
  FROM orders) x
WHERE rn <= 3
"""


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def setops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].select(F.col("o_custkey").alias("custkey"))
    c = t["customer"].select(F.col("c_custkey").alias("custkey"))
    return o.intersect(c)


SETOPS_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders
INTERSECT
SELECT c_custkey AS custkey FROM customer
"""


def setops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL EXCEPT has set semantics: a row present on the right at all is
    dropped, regardless of left multiplicity — subtract(), not
    exceptAll().distinct() (which keeps rows whose left count merely
    exceeds their right count).  The right side is date-restricted so
    the difference is NON-EMPTY at sf0.01 (every customer has some
    order in the fixture — the unrestricted form was a vacuous n=0
    green, the skew_join_anti problem of VERDICT r7 #7)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_custkey").alias("custkey"))
    o = t["orders"].where(
        F.col("o_orderdate").between("1995-01-01", "1995-12-31")
    ).select(F.col("o_custkey").alias("custkey"))
    return c.distinct().subtract(o)


SETOPS_EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
"""


def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to the fixture's columns): orders with at
    least one lineitem shipped after the order date, counted by priority —
    a decorrelated EXISTS → left-semi join."""
    t = load_tables(spark, sf_dir)
    o, li = t["orders"], t["lineitem"]
    return (
        o.alias("o")
        .join(
            li.alias("l"),
            (F.col("l.l_orderkey") == F.col("o.o_orderkey"))
            & (F.col("l.l_shipdate") > F.col("o.o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""


def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts (CASE-in-aggregate) of
    high/low-priority orders per lineitem return flag."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional decimal-summed
    revenue ratio over a one-year ship window."""
    t = load_tables(spark, sf_dir)
    j = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC_PROD)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(_DEC_PROD))
    return j.agg(
        (
            F.lit(100.0) * F.sum(promo).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))
                             ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
         AS promo_pct,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
"""


def q19_disjunctive_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicates over a
    part-lineitem join (brand x size x quantity bands OR-ed together) —
    exercises predicate planning under disjunction."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return j.where(b1 | b2 | b3).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), _DEC_PROD).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface: LATERAL table function splitting documents into
    sentences; per-doc sentence count + longest sentence. The split regex
    has no lookbehind so DuckDB's RE2 string_split_regex computes the
    identical split."""
    from .functions.udtf import register_split_sentences

    t = load_tables(spark, sf_dir)
    register_split_sentences(spark)
    t["documents"].createOrReplaceTempView("docs_udtf_v")
    return spark.sql(
        """
        SELECT doc_id, COUNT(*) AS n_sentences,
               CAST(MAX(LENGTH(sentence)) AS INT) AS max_sent_len
        FROM docs_udtf_v, LATERAL split_sentences(text)
        GROUP BY doc_id
        """
    )


UDTF_SENT_SQL = r"""
SELECT doc_id, COUNT(*) AS n_sentences,
       CAST(MAX(LENGTH(s)) AS INT) AS max_sent_len
FROM (
  SELECT doc_id, UNNEST(string_split_regex(text, '\.\s+')) AS s
  FROM documents
)
WHERE s <> ''
GROUP BY doc_id
"""


def udaf_weighted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF surface: quantity-weighted mean price per
    return flag, computed in exact int64 cents inside the UDF so the
    result is order-independent and oracle-comparable."""
    from .functions.udtf import weighted_avg_price_udf

    t = load_tables(spark, sf_dir)
    wap = weighted_avg_price_udf()
    return t["lineitem"].groupBy("l_returnflag").agg(
        wap(F.col("l_extendedprice"), F.col("l_quantity")).alias("w_avg_price")
    )


UDAF_WPRICE_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(l_quantity AS BIGINT)) AS DOUBLE)
       / (CAST(100.0 AS DOUBLE) * SUM(CAST(l_quantity AS BIGINT)))
         AS w_avg_price
FROM lineitem GROUP BY l_returnflag
"""


def date_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-dimension rollup: year/quarter extraction, interval min/max
    formatted as ISO strings (dates as raw values don't canonicalize the
    same across engines; strings do)."""
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("revenue"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_day"),
    )


DATE_ROLLUP_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
       STRFTIME(MAX(o_orderdate), '%Y-%m-%d') AS last_day
FROM orders GROUP BY 1, 2
"""


def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_u"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("o_day"),
        (F.col("o_totalprice") / 10).alias("fee"),
        F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias("tag"),
    )


SCALAR_SQL = """
SELECT o_orderkey,
       UPPER(o_orderstatus) AS status_u,
       SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
       CAST(LENGTH(o_orderpriority) AS INT) AS prio_len,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS o_month,
       CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS o_day,
       o_totalprice / 10 AS fee,
       CONCAT(o_orderstatus, '-', o_orderpriority) AS tag
FROM orders
"""


# --------------------------------------------------------------------------
# LLM-pipeline extensions: dedup / text analysis / similarity / multimodal
# --------------------------------------------------------------------------

# The fuzzy-dedup family (ngram / minhash / clusters / fuzzy-survivors)
# shares one plan-equal shingle subtree and one MinHash pair list. Round 2
# rebuilt + persisted them per query (3× the work, never unpersisted, and
# bench timings became cache-order-dependent — VERDICT r2 #1/#7). One
# materialization per (session, sf_dir) is cached here; ``clear_dedup_cache``
# releases the executor memory (bench.py and the test suite call it).

def _session_key(spark: SparkSession):
    """Family-cache key component. Classic sessions key on the
    SparkContext identity (survives newSession clones); Spark Connect
    has no SparkContext — fall back to the session object itself."""
    try:
        return id(spark.sparkContext)
    except Exception:  # Connect: no SparkContext on the client
        return id(spark)


_DEDUP_FAMILY_CACHE: dict[tuple[int, str], tuple[DataFrame, DataFrame]] = {}


def _dedup_family(
    spark: SparkSession, sf_dir: str, stage_times: dict | None = None
) -> tuple[DataFrame, DataFrame]:
    """(shingle_df, minhash_pair_df) shared by the dedup query family.

    Both are eagerly localCheckpointed at build (the timed family-build
    line); later family members read the materialized blocks through a
    constant-size LogicalRDD plan. The pair list is the verified
    (id_a, id_b, jaccard) output of ``minhash_pairs`` at the family's
    standing parameters (threshold=0.5, n=8).

    ``stage_times`` (bench.py's dedup stage sub-lines, redefined for
    the eager build): "shingles" = shingle build + checkpoint wall,
    "construct" = minhash_pairs construction incl. its internal eager
    signature/band checkpoints, "pairs" = candidate join + prefilter +
    verify execution (the pair checkpoint)."""
    import time as _time

    key = (_session_key(spark), sf_dir)
    hit = _DEDUP_FAMILY_CACHE.get(key)
    if hit is not None:
        return hit
    docs = load_tables(spark, sf_dir)["documents"]
    # localCheckpoint, not persist (r14): persist substitutes cached
    # blocks only AFTER analysis, so every consumer action re-analyzed
    # the full shingle/signature/verify logical tree (~6x-embedded
    # 32-agg subtree — BASELINE r14 anatomy); the checkpoint truncates
    # to a LogicalRDD leaf. Measured fresh-JVM A/B
    # (tools/ab_dedup_ckpt.py, alternating): build 30.7/19.9 s vs
    # 42.1/29.9, six benched consumers 20.5/15.2 s vs 52.9/25.6 —
    # ckpt won every adjacent comparison. Eager: runs inside the timed
    # dedup_family_build line. release_family handles the RDD blocks.
    t0 = _time.perf_counter()
    sh = shingles(docs, n=8).localCheckpoint()
    t1 = _time.perf_counter()
    lazy_pairs = minhash_pairs(
        docs, threshold=0.5, n=8, shingle_df=sh, cache_bands="ckpt"
    )
    t2 = _time.perf_counter()
    pairs = lazy_pairs.localCheckpoint()
    if stage_times is not None:
        stage_times["shingles"] = t1 - t0
        stage_times["construct"] = t2 - t1
        stage_times["pairs"] = _time.perf_counter() - t2
    _DEDUP_FAMILY_CACHE[key] = (sh, pairs)
    return sh, pairs


# The exact-substring family (dedup_exact_substr / substr_dedup_clean_docs /
# pipeline_train_mix) shares one detected-runs table at the standing
# parameters (k=16, min_tokens=32) — previously each member re-ran the
# window-table shuffle (~7.9 s duplicated inside the capstone alone,
# VERDICT r5 wrong #2). Same per-(session, sf_dir) idiom as _dedup_family;
# bench.py times the materialization as its own `substr_family_build` line.
_SUBSTR_CACHE: dict[tuple[int, str], DataFrame] = {}


def _substr_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted exact_substring_runs(documents, k=16, min_tokens=32)
    shared by the exact-substring query family."""
    from .operators.substr_dedup import exact_substring_runs

    key = (_session_key(spark), sf_dir)
    hit = _SUBSTR_CACHE.get(key)
    if hit is not None:
        return hit
    docs = load_tables(spark, sf_dir)["documents"]
    runs = exact_substring_runs(docs, k=16, min_tokens=32).localCheckpoint()
    _SUBSTR_CACHE[key] = runs
    return runs


# The span-REMOVED corpus (doc_id, n_tokens, n_removed, clean_text) is
# itself shared: substr_dedup_clean_docs verifies it, and
# pipeline_train_mix references it four times in one job graph (DSIR
# corpus + DSIR target + packing input + final join) — unpersisted,
# Spark re-ran the ~2 s rebuild per reference (capstone 17 s instead of
# ~7 s). bench.py materializes it inside the substr_family_build line.
_SUBSTR_CLEAN_CACHE: dict[tuple[int, str], DataFrame] = {}


def _substr_clean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted remove_duplicate_spans(documents, runs=_substr_family)
    at the standing family parameters."""
    from .operators.substr_dedup import remove_duplicate_spans

    key = (_session_key(spark), sf_dir)
    hit = _SUBSTR_CLEAN_CACHE.get(key)
    if hit is not None:
        return hit
    docs = load_tables(spark, sf_dir)["documents"]
    cleaned = remove_duplicate_spans(
        docs, runs=_substr_family(spark, sf_dir)
    ).localCheckpoint()
    _SUBSTR_CLEAN_CACHE[key] = cleaned
    return cleaned


# DSIR weights over the RAW corpus (target = src0, md5 bucketing) feed
# both dsir_importance_docs and dsir_resample_docs — identical ~4 s gram
# aggregations. Same family idiom; the capstone's weights are over the
# span-CLEANED text and stay separate.
_DSIR_CACHE: dict[tuple[int, str], DataFrame] = {}


def _dsir_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted importance_weights(documents, target=src0, md5)."""
    from .operators.dsir import importance_weights

    key = (_session_key(spark), sf_dir)
    hit = _DSIR_CACHE.get(key)
    if hit is not None:
        return hit
    docs = load_tables(spark, sf_dir)["documents"]
    weights = importance_weights(
        docs, docs.where(F.col("source") == "src0"), hash_fn="md5"
    ).localCheckpoint()
    _DSIR_CACHE[key] = weights
    return weights


# Which registered queries read each family cache (bench.py releases a
# family's persisted artifacts as soon as its LAST benched consumer
# line completes — VERDICT r11 #1a; membership is asserted by
# tests/test_plans.py::test_family_consumer_ledger so the ledger can't
# rot when queries are added or renamed).
FAMILY_CONSUMERS: dict[str, tuple[str, ...]] = {
    "dedup": (
        "dedup_ngram_jaccard",
        "dedup_containment_docs",
        "near_dup_leakage_sources",
        "dedup_minhash_docs",
        "dedup_clusters_docs",
        "dedup_fuzzy_survivors",
        "cluster_split_docs",
        "incremental_minhash_docs",
    ),
    "winnow": ("doc_fingerprint_winnow", "winnow_overlap_pairs"),
    "substr": (
        "dedup_exact_substr",
        "substr_dedup_clean_docs",
        "pipeline_train_mix",
    ),
    "dsir": ("dsir_importance_docs", "dsir_resample_docs"),
    "langid": ("langid_softmax_docs", "langid_softmax_eval"),
    "copurchase": (
        "triangle_count_copurchase",
        "kcore_copurchase",
        "label_propagation_copurchase",
    ),
    "quality": (
        "quality_classifier_docs",
        "classifier_calibration_docs",
    ),
    "ann": (
        "ann_pq_topk",
        "ann_pq_refined_topk",
        "ann_ivf_topk",
        "ann_ivf_refined_topk",
        "ann_ivfpq_topk",
        "ann_ivfpq_refined_topk",
    ),
    "tok": (
        "bpe_train_docs",
        "bpe_tokenize_docs",
        "wordpiece_train_docs",
        "wordpiece_tokenize_docs",
        "unigram_tokenizer_docs",
        "unigram_tokenize_docs",
    ),
}


_COPURCHASE_CACHE: dict = {}


def _copurchase_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted canonical part co-purchase edge list (src < dst,
    distinct, no self-loops) — the identical graph kcore_copurchase,
    label_propagation_copurchase, and triangle_count_copurchase each
    rebuilt per entry. Built from per-order sorted part-set arrays
    with in-array pair generation (explode of nested transform) rather
    than the lineitem self-join: one shuffle (groupBy orderkey)
    instead of two join-side exchanges, pairs emitted in codegen —
    measured 1.97-3.6 s vs 2.6-5.3 s across 3 alternating rounds at
    sf0.1. Assumes bounded basket size (TPC-H orders hold <= 7 parts;
    the assoc_rules contract) — a corpus with million-item baskets
    would cap or fall back to the join form."""
    key = (_session_key(spark), sf_dir)
    hit = _COPURCHASE_CACHE.get(key)
    if hit is not None:
        return hit
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_partkey"
    )
    arr = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .where(F.size("ps") >= 2)
    )
    edges = (
        arr.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda x, i: F.transform(
                            F.slice("ps", i + F.lit(2), F.size("ps")),
                            lambda y: F.struct(
                                x.alias("src"), y.alias("dst")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .distinct()
        .localCheckpoint()
    )
    _COPURCHASE_CACHE[key] = edges
    return edges


_LANGID_CACHE: dict = {}


def _langid_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted char_tf_counts(documents, 128 buckets, bigrams) — the
    granular per-(doc, bucket) count table both langid classifiers
    train from (VERDICT r12 next-round #1): the 128-bucket entry reads
    it as-is, the 64-bucket eval entry folds bucket % 64 (exact, since
    md5_32 % 128 % 64 == md5_32 % 64), so the corpus tokenizes ONCE
    per bench run instead of once per entry."""
    from .operators.langid import char_tf_counts

    key = (_session_key(spark), sf_dir)
    hit = _LANGID_CACHE.get(key)
    if hit is not None:
        return hit
    docs = load_tables(spark, sf_dir)["documents"]
    tf = char_tf_counts(docs, n_buckets=128, n=2).localCheckpoint()
    _LANGID_CACHE[key] = tf
    return tf


_QUALITY_CACHE: dict = {}


def _gopher_mwl_label() -> "F.Column":
    """The Gopher mean-word-length weak label (mwl > 4.5) both quality
    classifier entries train against — int/int double division,
    bit-exact in both engines."""
    n_tok = F.when(F.length("text") == 0, F.lit(0)).otherwise(
        F.length("text")
        - F.length(F.regexp_replace("text", " ", ""))
        + 1
    )
    mwl = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        (F.length("text") - (n_tok - 1)) / n_tok.cast("double")
    )
    return mwl > 4.5


def _quality_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted quality_classifier output at the standing parameters
    (Gopher mean-word-length weak label, 64 buckets, 6 iterations,
    lr=2.0) — quality_classifier_docs returns it verbatim and
    classifier_calibration_docs sweeps it; each previously re-ran the
    IDENTICAL 6-iteration training (r14, guide §1.2: one trained model,
    two consumers). Training collects at family construction."""
    from .operators.classifier import quality_classifier

    key = (_session_key(spark), sf_dir)
    hit = _QUALITY_CACHE.get(key)
    if hit is not None:
        return hit
    docs = load_tables(spark, sf_dir)["documents"]
    scored = quality_classifier(
        docs, _gopher_mwl_label(), n_buckets=64, iters=6, lr=2.0
    ).localCheckpoint()
    _QUALITY_CACHE[key] = scored
    return scored


def _par_actions(*thunks):
    """Run independent Spark driver actions concurrently and return
    their results in CALL order (guide §2.6 — actions are only
    sequential because driver code calls them sequentially; concurrent
    jobs back-fill each other's stage tails, on local[32] exactly like
    on a cluster). Each thunk's result is deterministic on its own, and
    results are consumed in submission order, so downstream values are
    independent of completion order. Exceptions propagate from the
    failing thunk."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


_ANN_CACHE: dict = {}


def _ann_family(spark: SparkSession, sf_dir: str) -> dict:
    """Shared trained ANN models for the IVF/PQ registry entries
    (r14, the quality-family pattern at model granularity): ONE
    deterministic centroid fit (16 centroids, sample 2048, 5 iters)
    serves ivf/ivf_refined/ivfpq/ivfpq_refined and ONE PQ codebook
    train (m=16, ks=32, sample 2048) serves pq/pq_refined/ivfpq/
    ivfpq_refined — previously each entry re-ran the identical
    training at construction. Training is deterministic (hash-ordered
    sample, fixed iterations), so shared models are bit-identical to
    per-entry ones and every downstream row is unchanged. The cached
    values are two driver-side float lists (~16x64 + 16x32x4 floats)
    plus, since r15, two SHARED DERIVED CORPUS RELATIONS (guide §1.2
    don't-recompute, the r14 family pattern one artifact level deeper):

    * ``assign`` — the IVF argmax-cosine list assignment (16
      interpreted HOF dot products per corpus row: the expensive
      corpus-side expression all four IVF/IVF-PQ entries rebuilt per
      call, a ~170 KB plan subtree re-analyzed per action), and
    * ``codes`` — the PQ code table (one Arrow encode pass previously
      re-run by all four PQ/IVF-PQ entries).

    Both are eager localCheckpoints (constant-size LogicalRDD plans for
    every consumer) registered in the session-cache ledger; the bench's
    ann_family_build line pays their materialization and
    release_family/release_entries drop the blocks after the last
    consumer. Deterministic given the shared models, so every
    downstream row is unchanged (pinned in tests/test_ann_family.py).
    The two model trainings run as one Spark action chain each and are
    independent, so the family overlaps them (guide §2.6)."""
    from .operators.dedup import _session_cache
    from .operators.pq import encode_pq, train_pq
    from .operators.similarity import _fit_centroids, assign_centroids

    key = (_session_key(spark), sf_dir)
    hit = _ANN_CACHE.get(key)
    if hit is not None:
        return hit
    e = load_tables(spark, sf_dir)["embeddings"]

    def _ivf_chain():
        cents = _fit_centroids(e, "vec_id", "embedding", 16, 2048, 5)
        return cents, _session_cache(assign_centroids(e, cents), mode="ckpt")

    def _pq_chain():
        books = train_pq(e, m=16, ks=32)
        return books, _session_cache(encode_pq(e, books), mode="ckpt")

    (cents, assign), (books, codes) = _par_actions(_ivf_chain, _pq_chain)
    models = {
        "centroids": cents,
        "books": books,
        "assign": assign,
        "codes": codes,
    }
    _ANN_CACHE[key] = models
    return models


_TOK_CACHE: dict = {}


def _tok_family(spark: SparkSession, sf_dir: str) -> dict:
    """Shared tokenizer-trainer artifacts (r15, the ANN-family pattern
    at model granularity — guide §1.2 don't-recompute): ONE
    word-frequency corpus aggregation collected once feeds all three
    driver-mode trainers (BPE 16 merges, WordPiece 16 merges + apply
    vocab, unigram-LM 40 pieces), whose outputs serve the six tokenizer
    registry entries. Previously each *_tokenize_docs entry re-ran the
    IDENTICAL training its *_train_docs sibling ran, and every one of
    the six lines re-ran the same word-frequency aggregation (~12
    corpus aggregations + 6 trainings per bench run for 4 distinct
    artifacts). Each trainer is deterministic and order-independent
    (integer counts, full tie-breaks), so shared models are
    bit-identical to per-entry ones — pinned in
    tests/test_tok_family.py. Cached values are driver-side
    lists/sets, not DataFrames (the _ANN_CACHE shape)."""
    from .operators.bpe import train_bpe, word_frequencies
    from .operators.unigram import train_unigram
    from .operators.wordpiece import train_wordpiece, wordpiece_vocab

    key = (_session_key(spark), sf_dir)
    hit = _TOK_CACHE.get(key)
    if hit is not None:
        return hit
    docs = load_tables(spark, sf_dir)["documents"]
    words = word_frequencies(docs).collect()
    models = {
        "bpe": train_bpe(docs, 16, mode="driver", words_rows=words),
        "wp": train_wordpiece(docs, 16, mode="driver", words_rows=words),
        "uni": train_unigram(docs, mode="driver", words_rows=words),
    }
    models["wp_vocab"] = wordpiece_vocab(
        docs, models["wp"], words_rows=words
    )
    _TOK_CACHE[key] = models
    return models


def build_family(family: str, spark: SparkSession, sf_dir: str) -> None:
    """Materialize one family's shared artifacts (idempotent)."""
    if family == "dedup":
        sh, pairs = _dedup_family(spark, sf_dir)
        sh.count()
        pairs.count()
    elif family == "winnow":
        _winnow_family(spark, sf_dir).count()
    elif family == "substr":
        _substr_family(spark, sf_dir).count()
        _substr_clean_family(spark, sf_dir).count()
    elif family == "dsir":
        _dsir_family(spark, sf_dir).count()
    elif family == "langid":
        _langid_family(spark, sf_dir).count()
    elif family == "copurchase":
        _copurchase_family(spark, sf_dir).count()
    elif family == "quality":
        _quality_family(spark, sf_dir).count()
    elif family == "ann":
        _ann_family(spark, sf_dir)
    elif family == "tok":
        _tok_family(spark, sf_dir)
    else:
        raise KeyError(f"unknown family {family!r}")


def release_family(family: str) -> None:
    """Unpersist ONE family's shared DataFrames (idempotent; the
    band/spill entries its build registered are scoped separately via
    operators.dedup.cache_snapshot/release_entries)."""
    if family == "ann":
        # model lists are driver-side, but the derived assign/codes
        # relations (r15) hold checkpoint blocks — release them (the
        # bench's ledger-scoped release also covers them; this keeps
        # non-bench callers leak-free and stays idempotent)
        from .operators.dedup import _release_df

        for models in _ANN_CACHE.values():
            for v in models.values():
                if isinstance(v, DataFrame):
                    _release_df(v)
        _ANN_CACHE.clear()
        return
    if family == "tok":
        # driver-side merge lists / vocab sets, no Spark storage
        _TOK_CACHE.clear()
        return
    caches: tuple[dict, ...] = {
        "dedup": (_DEDUP_FAMILY_CACHE,),
        "winnow": (_WINNOW_CACHE,),
        "substr": (_SUBSTR_CACHE, _SUBSTR_CLEAN_CACHE),
        "dsir": (_DSIR_CACHE,),
        "langid": (_LANGID_CACHE,),
        "copurchase": (_COPURCHASE_CACHE,),
        "quality": (_QUALITY_CACHE,),
    }[family]
    from .operators.dedup import _release_df

    for cache in caches:
        for val in cache.values():
            for df in val if isinstance(val, tuple) else (val,):
                _release_df(df)
        cache.clear()


def clear_dedup_cache() -> None:
    """Unpersist the shared dedup-family DataFrames AND the operator-level
    LSH band caches (idempotent)."""
    from .operators.dedup import clear_band_cache

    for sh, pairs in _DEDUP_FAMILY_CACHE.values():
        for df in (pairs, sh):
            try:
                df.unpersist()
            except Exception:  # session already stopped — nothing to release
                pass
    _DEDUP_FAMILY_CACHE.clear()
    for fps in _WINNOW_CACHE.values():
        try:
            fps.unpersist()
        except Exception:
            pass
    _WINNOW_CACHE.clear()
    for runs in _SUBSTR_CACHE.values():
        try:
            runs.unpersist()
        except Exception:
            pass
    _SUBSTR_CACHE.clear()
    for cleaned in _SUBSTR_CLEAN_CACHE.values():
        try:
            cleaned.unpersist()
        except Exception:
            pass
    _SUBSTR_CLEAN_CACHE.clear()
    for weights in _DSIR_CACHE.values():
        try:
            weights.unpersist()
        except Exception:
            pass
    _DSIR_CACHE.clear()
    clear_band_cache()
    # LUT broadcasts pq_topk left alive for its lazy result DataFrames
    # (one per lut_chunk — ADVICE r8 #4)
    from .operators.pq import clear_pq_broadcasts

    clear_pq_broadcasts()


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return exact_dedup(t["documents"])


DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS rep_id, MD5(text) AS fp, COUNT(*) AS dup_count
FROM documents GROUP BY MD5(text)
"""


def dedup_normalized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup (functions/text.py::
    normalize_text → operators/dedup.py::exact_dedup): casing,
    punctuation, and whitespace variants of the same content collapse
    to one md5 fingerprint — the C4/RefinedWeb canonical-form step raw
    exact dedup misses. Same 16-byte-key shuffle posture as
    dedup_exact_docs; the oracle replays the normalization
    byte-for-byte (dialect-portable regex classes)."""
    from .functions.text import normalize_text
    from .operators.dedup import exact_dedup

    t = load_tables(spark, sf_dir)
    docs = t["documents"].withColumn(
        "__norm", normalize_text(F.col("text"))
    )
    return exact_dedup(docs, text_col="__norm")


DEDUP_NORMALIZED_SQL = """
WITH n AS (
  SELECT doc_id,
         TRIM(REGEXP_REPLACE(
           REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),
           ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT MIN(doc_id) AS rep_id, MD5(norm) AS fp, COUNT(*) AS dup_count
FROM n GROUP BY MD5(norm)
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_shingle_df drops stop-shingles (df > 50): the synthetic corpus has
    # a tiny vocabulary, so common 8-grams appear in most docs and the
    # all-pairs shingle join fans out quadratically without the cap — the
    # hot-token skew case the module documents. The oracle applies the
    # identical cap.
    sh, _ = _dedup_family(spark, sf_dir)
    return ngram_jaccard_pairs(
        load_tables(spark, sf_dir)["documents"], threshold=0.5, n=8,
        max_shingle_df=50, shingle_df=sh,
    )


DEDUP_JACCARD_SQL = """
WITH sh0 AS (
  SELECT DISTINCT doc_id, SUBSTRING(text, CAST(pos AS INT), 8) AS shingle
  FROM documents, UNNEST(range(1, GREATEST(LENGTH(text) - 8 + 1, 1) + 1)) AS t(pos)
  WHERE LENGTH(text) >= 8
),
sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 50)
),
sizes AS (SELECT doc_id, COUNT(*) AS size FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, inter, sa.size AS size_a, sb.size AS size_b,
       CAST(inter AS DOUBLE) / (sa.size + sb.size - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.size + sb.size - inter) >= 0.5
"""


def dedup_containment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed near-superset pairs (containment ≥ 0.6) over the shared
    8-gram shingle set — the asymmetric dedup flavor that catches a doc
    quoted/embedded inside a larger one, which Jaccard under-scores. Same
    stop-shingle cap (df > 50) and shared materialization as the Jaccard
    sibling; like it, this exact all-pairs form is the oracle
    (BENCH_EXCLUDE) and the scale path is LSH candidates +
    containment_for_pairs."""
    from .operators.dedup import ngram_containment_pairs

    sh, _ = _dedup_family(spark, sf_dir)
    return ngram_containment_pairs(
        load_tables(spark, sf_dir)["documents"], threshold=0.6, n=8,
        max_shingle_df=50, shingle_df=sh,
    )


DEDUP_CONTAINMENT_SQL = """
WITH sh0 AS (
  SELECT DISTINCT doc_id, SUBSTRING(text, CAST(pos AS INT), 8) AS shingle
  FROM documents, UNNEST(range(1, GREATEST(LENGTH(text) - 8 + 1, 1) + 1)) AS t(pos)
  WHERE LENGTH(text) >= 8
),
sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 50)
),
sizes AS (SELECT doc_id, COUNT(*) AS size FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sized AS (
  SELECT id_a, id_b, inter, sa.size AS size_a, sb.size AS size_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
directed AS (
  SELECT id_a AS inner_id, id_b AS outer_id, inter,
         size_a AS size_inner, size_b AS size_outer FROM sized
  UNION ALL
  SELECT id_b AS inner_id, id_a AS outer_id, inter,
         size_b AS size_inner, size_a AS size_outer FROM sized
)
SELECT inner_id, outer_id, inter, size_inner, size_outer,
       CAST(inter AS DOUBLE) / size_inner AS containment
FROM directed
WHERE CAST(inter AS DOUBLE) / size_inner >= 0.6
"""


def dedup_exact_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate runs (operators/substr_dedup.py — the
    distributed approximation of Lee et al. 2022's suffix-array
    ExactSubstr pass, VERDICT r4 #4): maximal exactly-matching token
    runs of >= 32 detected tokens between document pairs, reported with
    token AND character offsets into both documents. Anchor width k=16,
    so every true common run of >= 47 tokens (the paper's ~50-token
    regime) is guaranteed detected; spans are grid-aligned in doc_a.
    The oracle replays the identical seed-grid + islands-merge
    arithmetic in SQL — hash-free (it joins on the window text), so the
    match also certifies that xxhash64 collisions played no role.
    Reads the shared family runs table (_substr_family, VERDICT r5 #4)."""
    return _substr_family(spark, sf_dir)


DEDUP_SUBSTR_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
w AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(tk, i + 1, i + 16), ' ') AS win
  FROM toks, UNNEST(range(0, GREATEST(len(tk) - 15, 0))) AS t(i)
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
         b.pos - a.pos AS diag
  FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id
  WHERE a.pos % 16 = 0
),
brk AS (
  SELECT doc_a, doc_b, diag, pa,
         CASE WHEN pa - LAG(pa) OVER (PARTITION BY doc_a, doc_b, diag
                                      ORDER BY pa) <= 16
              THEN 0 ELSE 1 END AS b
  FROM m
),
grp AS (
  SELECT doc_a, doc_b, diag, pa,
         SUM(b) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
                      ROWS UNBOUNDED PRECEDING) AS rid
  FROM brk
),
spans AS (
  SELECT doc_a, doc_b, diag, MIN(pa) AS a_start,
         MAX(pa) + 16 - MIN(pa) AS n_tokens
  FROM grp GROUP BY doc_a, doc_b, diag, rid
  HAVING MAX(pa) + 16 - MIN(pa) >= 32
)
SELECT s.doc_a, s.doc_b,
       CAST(s.a_start AS INT) AS a_start_tok,
       CAST(s.a_start + s.diag AS INT) AS b_start_tok,
       CAST(s.n_tokens AS INT) AS n_tokens,
       CAST(COALESCE(LENGTH(array_to_string(list_slice(ta.tk, 1, s.a_start), ' ')), 0)
            + CASE WHEN s.a_start > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS a_start_char,
       CAST(COALESCE(LENGTH(array_to_string(list_slice(tb.tk, 1, s.a_start + s.diag), ' ')), 0)
            + CASE WHEN s.a_start + s.diag > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS b_start_char,
       CAST(LENGTH(array_to_string(
              list_slice(ta.tk, s.a_start + 1, s.a_start + s.n_tokens), ' '))
         AS BIGINT) AS n_chars
FROM spans s
JOIN toks ta ON ta.doc_id = s.doc_a
JOIN toks tb ON tb.doc_id = s.doc_b
"""


def substr_dedup_clean_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of the ExactSubstr pass
    (operators/substr_dedup.py::remove_duplicate_spans): every detected
    duplicated span is cut from the larger-id document, and the CLEANED
    TEXT itself is verified end-to-end via md5 (the chunk_dedup
    reassembly idiom) — per doc: token count, removed-token count, and
    the checksum of the surviving text. Reads the shared span-removed
    corpus (_substr_clean_family, VERDICT r5 #4)."""
    out = _substr_clean_family(spark, sf_dir)
    return out.select(
        "doc_id", "n_tokens", "n_removed", F.md5("clean_text").alias("clean_md5")
    )


_SUBSTR_SPAN_CTES = """
toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
w AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(tk, i + 1, i + 16), ' ') AS win
  FROM toks, UNNEST(range(0, GREATEST(len(tk) - 15, 0))) AS t(i)
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
         b.pos - a.pos AS diag
  FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id
  WHERE a.pos % 16 = 0
),
brk AS (
  SELECT doc_a, doc_b, diag, pa,
         CASE WHEN pa - LAG(pa) OVER (PARTITION BY doc_a, doc_b, diag
                                      ORDER BY pa) <= 16
              THEN 0 ELSE 1 END AS b
  FROM m
),
grp AS (
  SELECT doc_a, doc_b, diag, pa,
         SUM(b) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
                      ROWS UNBOUNDED PRECEDING) AS rid
  FROM brk
),
spans AS (
  SELECT doc_a, doc_b, diag, MIN(pa) AS a_start,
         MAX(pa) + 16 - MIN(pa) AS n_tokens
  FROM grp GROUP BY doc_a, doc_b, diag, rid
  HAVING MAX(pa) + 16 - MIN(pa) >= 32
)
""".strip()

SUBSTR_CLEAN_SQL = f"""
WITH {_SUBSTR_SPAN_CTES},
drop_pos AS (
  SELECT DISTINCT s.doc_b AS doc_id, s.a_start + s.diag + i AS pos
  FROM spans s, UNNEST(range(0, s.n_tokens)) AS t(i)
),
affected AS (SELECT DISTINCT doc_id FROM drop_pos),
tok_rows AS (
  SELECT t.doc_id, i AS pos, tk[CAST(i + 1 AS INT)] AS tok
  FROM toks t JOIN affected a ON a.doc_id = t.doc_id,
       UNNEST(range(0, len(tk))) AS u(i)
),
kept AS (
  SELECT tr.doc_id, tr.pos, tr.tok
  FROM tok_rows tr
  LEFT JOIN drop_pos dp ON dp.doc_id = tr.doc_id AND dp.pos = tr.pos
  WHERE dp.doc_id IS NULL
),
rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(t.tk) AS INT) AS n_tokens,
       CAST(CASE WHEN a.doc_id IS NOT NULL
                 THEN len(t.tk) - COALESCE(r.n_kept, 0) ELSE 0 END AS INT)
         AS n_removed,
       MD5(CASE WHEN a.doc_id IS NOT NULL THEN COALESCE(r.clean, '')
                ELSE d.text END) AS clean_md5
FROM documents d
JOIN toks t ON t.doc_id = d.doc_id
LEFT JOIN affected a ON a.doc_id = d.doc_id
LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
"""


def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (operators/semdedup.py, SemDeDup recipe): cluster
    the embedding space, prune any vector with a smaller-id same-cluster
    neighbor at cosine >= 0.4 (the corpus's near-dup threshold), keep
    one representative per duplicate chain. centroid_source="seed_rows"
    (the 8 smallest vec_ids) makes assignment AND pruning replayable in
    the SQL oracle — exact within-cluster cosines, never all-pairs.
    assign_method="join" (broadcast centroid table + max_by) computes
    the same nearest/smallest-index rule as the literal path but stays
    compilable: the 8x64-dim literal expression tree fails janino and
    fell back to interpreted eval (24 s -> 8 s at sf0.1)."""
    from .operators.semdedup import semdedup

    t = load_tables(spark, sf_dir)
    return semdedup(
        t["embeddings"], threshold=0.4, n_clusters=8,
        centroid_source="seed_rows", dim=64, assign_method="join",
    )


_SEMDEDUP_COS = """
CASE WHEN sqrt(list_sum(list_transform({a}, x -> x * x))) = 0
       OR sqrt(list_sum(list_transform({b}, x -> x * x))) = 0 THEN 0.0
     ELSE list_sum(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]))
          / (sqrt(list_sum(list_transform({a}, x -> x * x)))
             * sqrt(list_sum(list_transform({b}, x -> x * x))))
END
""".strip()

SEMDEDUP_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
c AS (
  SELECT e AS ce, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
  FROM v ORDER BY vec_id LIMIT 8
),
sims AS (
  SELECT v.vec_id, c.cid,
         {_SEMDEDUP_COS.format(a="v.e", b="c.ce")} AS sim
  FROM v CROSS JOIN c
),
assign AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cid ASC) AS rn
    FROM sims) x
  WHERE rn = 1
),
pairs AS (
  SELECT bb.vec_id AS id_b,
         {_SEMDEDUP_COS.format(a="va.e", b="vb.e")} AS sim
  FROM assign aa
  JOIN assign bb ON aa.cluster_id = bb.cluster_id AND aa.vec_id < bb.vec_id
  JOIN v va ON va.vec_id = aa.vec_id
  JOIN v vb ON vb.vec_id = bb.vec_id
),
stats AS (
  SELECT id_b, CAST(COUNT(*) AS INT) AS n_dups_smaller,
         MAX(sim) AS max_sim_smaller
  FROM pairs WHERE sim >= 0.4 GROUP BY id_b
)
SELECT a.vec_id, CAST(a.cluster_id AS INT) AS cluster_id,
       s.id_b IS NULL AS is_kept,
       COALESCE(s.n_dups_smaller, 0) AS n_dups_smaller,
       s.max_sim_smaller
FROM assign a LEFT JOIN stats s ON s.id_b = a.vec_id
"""


def temperature_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled training mixture (operators/packing.py):
    source targets ∝ n^0.5 (alpha=0.5 up-samples low-resource sources),
    members = the target smallest md5(id) ranks per source — the
    deterministic hash-rank idiom, so the oracle reproduces the exact
    sampled set, not just its size."""
    from .operators.packing import temperature_mix

    t = load_tables(spark, sf_dir)
    return temperature_mix(t["documents"], alpha=0.5, total=300)


TEMPERATURE_MIX_SQL = """
WITH counts AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
),
weighted AS (SELECT source, n, POWER(n, 0.5) AS w FROM counts),
z AS (SELECT SUM(w) AS z FROM weighted),
targets AS (
  SELECT source, n,
         LEAST(CAST(FLOOR(300 * w / z.z) AS INT), CAST(n AS INT)) AS target
  FROM weighted, z
),
ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents
)
SELECT r.doc_id, r.source, t.n AS source_docs, t.target AS source_target
FROM ranked r JOIN targets t ON t.source = r.source
WHERE r.rk <= t.target
"""


def sequence_packing_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (operators/packing.py): documents in id
    order pack into 256-token bins per source (a doc that would
    overflow opens a new bin). Output is per-document (bin id + offset
    inside the bin) — fully deterministic, so the oracle replays the
    greedy recurrence with a recursive CTE and the match verifies every
    placement, not just bin counts."""
    from .operators.packing import sequence_packing

    t = load_tables(spark, sf_dir)
    out = sequence_packing(t["documents"], capacity=256, group_col="source")
    return out.select(
        "source", "doc_id", "n_tokens",
        F.col("bin_id").cast("int").alias("bin_id"),
        F.col("bin_offset").cast("int").alias("bin_offset"),
    )


SEQUENCE_PACKING_SQL = """
WITH RECURSIVE t AS (
  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
rec AS (
  SELECT source, rn, doc_id, n_tokens,
         0 AS bin_id, 0 AS bin_offset
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN rec.bin_offset + rec.n_tokens + t.n_tokens <= 256
              THEN rec.bin_id ELSE rec.bin_id + 1 END,
         CASE WHEN rec.bin_offset + rec.n_tokens + t.n_tokens <= 256
              THEN rec.bin_offset + rec.n_tokens ELSE 0 END
  FROM rec JOIN t ON t.source = rec.source AND t.rn = rec.rn + 1
)
SELECT source, doc_id, n_tokens,
       CAST(bin_id AS INT) AS bin_id,
       CAST(bin_offset AS INT) AS bin_offset
FROM rec
"""


def incremental_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup (operators/incremental.py): the batch of
    documents with doc_id >= 250 is classified against the persisted
    fingerprint store of the first 250 — per new doc, its historical
    representative (if the text already exists), its within-batch
    representative, and whether it is genuinely new (the rows whose
    fingerprints extend the store). History is never re-deduplicated."""
    from .operators.incremental import fingerprint_store, incremental_exact_dedup

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    store = fingerprint_store(docs.where(F.col("doc_id") < 250))
    return incremental_exact_dedup(docs.where(F.col("doc_id") >= 250), store)


INCR_EXACT_SQL = """
WITH store AS (
  SELECT MD5(text) AS fp, MIN(doc_id) AS rep_id
  FROM documents WHERE doc_id < 250 GROUP BY MD5(text)
),
batch AS (
  SELECT doc_id, MD5(text) AS fp,
         MIN(doc_id) OVER (PARTITION BY MD5(text)) AS batch_rep
  FROM documents WHERE doc_id >= 250
)
SELECT b.doc_id, b.fp, s.rep_id AS hist_rep, b.batch_rep,
       (s.rep_id IS NULL AND b.batch_rep = b.doc_id) AS is_new
FROM batch b LEFT JOIN store s ON s.fp = b.fp
"""


def incremental_minhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental FUZZY dedup: the new batch's MinHash band table joins
    the historical band table only (new x history — history is never
    self-joined), candidates verified by exact Jaccard at the family's
    standing parameters (8-gram shingles, threshold 0.5). The oracle
    computes exact cross-Jaccard for ALL (hist, new) pairs, so the match
    also re-certifies the banding's recall on this corpus.

    r14: both sides' shingle sets are id-filtered slices of the dedup
    family's persisted corpus shingle table (same n=8 — row filters
    commute with the per-doc explode, so the sets are identical and so
    is the output); the entry no longer tokenizes the corpus twice more
    on its own (guide §1.2)."""
    from .operators.incremental import incremental_minhash_dups

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    sh, _ = _dedup_family(spark, sf_dir)
    return incremental_minhash_dups(
        docs.where(F.col("doc_id") >= 250),
        docs.where(F.col("doc_id") < 250),
        threshold=0.5, n=8, shingle_df=sh,
    )


INCR_MINHASH_SQL = """
WITH sh AS (
  SELECT DISTINCT doc_id, SUBSTRING(text, CAST(pos AS INT), 8) AS shingle
  FROM documents, UNNEST(range(1, GREATEST(LENGTH(text) - 8 + 1, 1) + 1)) AS t(pos)
  WHERE LENGTH(text) >= 8
),
sizes AS (SELECT doc_id, COUNT(*) AS size FROM sh GROUP BY doc_id),
inter AS (
  SELECT h.doc_id AS hist_id, n.doc_id AS new_id, COUNT(*) AS inter
  FROM sh h JOIN sh n ON h.shingle = n.shingle
  WHERE h.doc_id < 250 AND n.doc_id >= 250
  GROUP BY h.doc_id, n.doc_id
)
SELECT i.hist_id, i.new_id, i.inter,
       sh_.size AS size_hist, sn.size AS size_new,
       CAST(i.inter AS DOUBLE) / (sh_.size + sn.size - i.inter) AS jaccard
FROM inter i
JOIN sizes sh_ ON sh_.doc_id = i.hist_id
JOIN sizes sn ON sn.doc_id = i.new_id
WHERE CAST(i.inter AS DOUBLE) / (sh_.size + sn.size - i.inter) >= 0.5
"""


def incremental_compaction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch state lifecycle (operators/incremental.py::
    compact_fingerprint_store — VERDICT r5 missing #2): epoch-0 store
    from docs < 200, batch-1 (200–349) classified and COMPACTED back
    into the store, then batch-2 (≥ 350) classified against the
    compacted epoch-1 artifact. The oracle classifies batch-2 against
    a ONE-SHOT store over docs < 350 — an EXACT match certifies the
    round-trip identity compact(store(H), classify(B)) ≡ store(H ∪ B)
    on real data (ids ordered so min-rep semantics align)."""
    from .operators.incremental import (
        compact_fingerprint_store,
        fingerprint_store,
        incremental_exact_dedup,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    store0 = fingerprint_store(docs.where(F.col("doc_id") < 200))
    batch1 = docs.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 350))
    store1 = compact_fingerprint_store(
        store0, incremental_exact_dedup(batch1, store0)
    )
    return incremental_exact_dedup(docs.where(F.col("doc_id") >= 350), store1)


INCR_COMPACT_SQL = """
WITH store AS (
  SELECT MD5(text) AS fp, MIN(doc_id) AS rep_id
  FROM documents WHERE doc_id < 350 GROUP BY MD5(text)
),
batch AS (
  SELECT doc_id, MD5(text) AS fp,
         MIN(doc_id) OVER (PARTITION BY MD5(text)) AS batch_rep
  FROM documents WHERE doc_id >= 350
)
SELECT b.doc_id, b.fp, s.rep_id AS hist_rep, b.batch_rep,
       (s.rep_id IS NULL AND b.batch_rep = b.doc_id) AS is_new
FROM batch b LEFT JOIN store s ON s.fp = b.fp
"""


def dsir_importance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (operators/dsir.py): every document
    scored by sum count_b·(log p_target(b) − log p_raw(b)) over 512
    hashed unigram+bigram buckets, target = the 'src0' slice. hash_fn=
    "md5" so the bucketing is bit-equal in the SQL oracle (xxhash64 is
    the scale path); the weight is rounded to 6 decimals — double
    summation order differs between engines at ~1e-13 relative, far
    below the rounding quantum. Reads the shared weights table
    (_dsir_family)."""
    out = _dsir_family(spark, sf_dir)
    return out.select(
        "doc_id", "n_grams",
        F.round("log_weight", 6).alias("log_weight"),
        (F.col("log_weight") > 0).alias("target_like"),
    )


DSIR_SQL = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
),
grams AS (
  SELECT doc_id, source, tk[CAST(i + 1 AS INT)] AS g
  FROM toks, UNNEST(range(0, len(tk))) AS u(i)
  UNION ALL
  SELECT doc_id, source,
         tk[CAST(i + 1 AS INT)] || ' ' || tk[CAST(i + 2 AS INT)] AS g
  FROM toks, UNNEST(range(0, len(tk) - 1)) AS u(i)
  WHERE len(tk) >= 2
),
bucketed AS (
  SELECT doc_id, source,
         CAST(CAST(('0x' || SUBSTRING(MD5(g), 1, 8)) AS BIGINT) % 512 AS BIGINT)
           AS bucket
  FROM grams
),
doc_b AS (
  SELECT doc_id, bucket, COUNT(*) AS cnt FROM bucketed GROUP BY 1, 2
),
raw_c AS (SELECT bucket, COUNT(*) AS n FROM bucketed GROUP BY 1),
raw_n AS (SELECT SUM(n) AS N FROM raw_c),
tgt_c AS (SELECT bucket, COUNT(*) AS n FROM bucketed WHERE source = 'src0'
          GROUP BY 1),
tgt_n AS (SELECT SUM(n) AS N FROM tgt_c),
scored AS (
  SELECT d.doc_id, d.cnt,
         d.cnt * (LN(COALESCE(t.n + 1.0, 1.0) / (tn.N + 512.0))
                  - LN(COALESCE(r.n + 1.0, 1.0) / (rn.N + 512.0))) AS contrib
  FROM doc_b d
  LEFT JOIN tgt_c t ON t.bucket = d.bucket
  LEFT JOIN raw_c r ON r.bucket = d.bucket
  CROSS JOIN tgt_n tn CROSS JOIN raw_n rn
)
SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
       ROUND(SUM(contrib), 6) AS log_weight,
       SUM(contrib) > 0 AS target_like
FROM scored GROUP BY doc_id
"""


def dsir_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's RESAMPLING half (operators/dsir.py::dsir_resample —
    VERDICT r5 missing #1): Gumbel-top-k selection of 200 documents
    ∝ softmax(log_weight), with the Gumbel noise derived
    deterministically from md5(doc_id) so the sampled SET is
    engine-reproducible — the oracle replays weight computation AND
    the perturbed top-k bit-for-bit. The top_k (hard-selection)
    variant is pinned against a Python reference in tests/test_dsir.py.
    Reads the shared weights table (_dsir_family)."""
    from .operators.dsir import dsir_resample

    sel = dsir_resample(_dsir_family(spark, sf_dir), k=200, method="gumbel")
    return sel.select(
        "doc_id", "n_grams", F.round("log_weight", 6).alias("log_weight")
    )


DSIR_RESAMPLE_SQL = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
),
grams AS (
  SELECT doc_id, source, tk[CAST(i + 1 AS INT)] AS g
  FROM toks, UNNEST(range(0, len(tk))) AS u(i)
  UNION ALL
  SELECT doc_id, source,
         tk[CAST(i + 1 AS INT)] || ' ' || tk[CAST(i + 2 AS INT)] AS g
  FROM toks, UNNEST(range(0, len(tk) - 1)) AS u(i)
  WHERE len(tk) >= 2
),
bucketed AS (
  SELECT doc_id, source,
         CAST(CAST(('0x' || SUBSTRING(MD5(g), 1, 8)) AS BIGINT) % 512 AS BIGINT)
           AS bucket
  FROM grams
),
doc_b AS (
  SELECT doc_id, bucket, COUNT(*) AS cnt FROM bucketed GROUP BY 1, 2
),
raw_c AS (SELECT bucket, COUNT(*) AS n FROM bucketed GROUP BY 1),
raw_n AS (SELECT SUM(n) AS N FROM raw_c),
tgt_c AS (SELECT bucket, COUNT(*) AS n FROM bucketed WHERE source = 'src0'
          GROUP BY 1),
tgt_n AS (SELECT SUM(n) AS N FROM tgt_c),
wts AS (
  SELECT d.doc_id, CAST(SUM(d.cnt) AS BIGINT) AS n_grams,
         SUM(d.cnt * (LN(COALESCE(t.n + 1.0, 1.0) / (tn.N + 512.0))
                      - LN(COALESCE(r.n + 1.0, 1.0) / (rn.N + 512.0))))
           AS log_weight
  FROM doc_b d
  LEFT JOIN tgt_c t ON t.bucket = d.bucket
  LEFT JOIN raw_c r ON r.bucket = d.bucket
  CROSS JOIN tgt_n tn CROSS JOIN raw_n rn
  GROUP BY d.doc_id
)
SELECT doc_id, n_grams, ROUND(log_weight, 6) AS log_weight
FROM wts
ORDER BY log_weight
         - LN(-LN((CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) + 0.5) / 4294967296.0))
         DESC, doc_id
LIMIT 200
"""


def pipeline_train_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix capstone — the full pipeline as ONE lazily-planned
    job graph over four proven operators: exact-substring span removal
    (duplicated spans cut from larger-id docs, via the SHARED family
    runs table — VERDICT r5 #4) → DSIR importance weights over the
    CLEANED text (target = src0) → importance RESAMPLING (Gumbel-top-k
    over the weights the pipeline just computed, 300 docs — the mix is
    now BY the weights, Xie et al. 2023's actual selection step;
    VERDICT r5 #3) → greedy 256-token sequence packing of the selected
    docs per source. Output: one row per selected document with its
    cleaned length, removed-span tokens, importance weight, and packed
    position. The oracle replays the whole chain in a single CTE
    pipeline."""
    from .operators.dsir import dsir_resample, importance_weights
    from .operators.packing import sequence_packing

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    cleaned = (
        _substr_clean_family(spark, sf_dir)
        .join(docs.select("doc_id", "source"), on="doc_id")
        .select("doc_id", "source", F.col("clean_text").alias("text"),
                "n_removed")
    )
    weights = importance_weights(
        cleaned, cleaned.where(F.col("source") == "src0"), hash_fn="md5"
    )
    # selected carries log_weight through (dsir_resample returns the
    # weights rows unchanged), so the final join reads the 300-row
    # selection — NOT the full weights table, which would evaluate the
    # DSIR gram aggregation a second time in the same graph.
    # Materialized EAGERLY (round 10): the selection feeds BOTH the
    # packing semi-join and the final log_weight join, and the lazy
    # plan evaluated the full DSIR gram aggregation once per consumer;
    # checkpointing the 300-row result runs DSIR exactly once.
    # → EAGER_QUERIES.
    selected = dsir_resample(weights, k=300, method="gumbel").localCheckpoint(
        eager=True
    )
    packed = sequence_packing(
        cleaned.join(selected.select("doc_id"), on="doc_id", how="left_semi"),
        capacity=256, group_col="source",
    )
    return (
        packed.join(selected.select("doc_id", "log_weight"), on="doc_id")
        .join(cleaned.select("doc_id", "n_removed"), on="doc_id")
        .select(
            "source", "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("n_removed").cast("int").alias("n_removed"),
            F.round("log_weight", 6).alias("log_weight"),
            F.col("bin_id").cast("int").alias("bin_id"),
            F.col("bin_offset").cast("int").alias("bin_offset"),
        )
    )


PIPELINE_TRAIN_MIX_SQL = f"""
WITH RECURSIVE {_SUBSTR_SPAN_CTES},
drop_pos AS (
  SELECT DISTINCT s.doc_b AS doc_id, s.a_start + s.diag + i AS pos
  FROM spans s, UNNEST(range(0, s.n_tokens)) AS t(i)
),
affected AS (SELECT DISTINCT doc_id FROM drop_pos),
tok_rows AS (
  SELECT t.doc_id, i AS pos, tk[CAST(i + 1 AS INT)] AS tok
  FROM toks t JOIN affected a ON a.doc_id = t.doc_id,
       UNNEST(range(0, len(tk))) AS u(i)
),
kept AS (
  SELECT tr.doc_id, tr.pos, tr.tok
  FROM tok_rows tr
  LEFT JOIN drop_pos dp ON dp.doc_id = tr.doc_id AND dp.pos = tr.pos
  WHERE dp.doc_id IS NULL
),
rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
cleaned AS (
  SELECT d.doc_id, d.source,
         CASE WHEN a.doc_id IS NOT NULL THEN COALESCE(r.clean, '')
              ELSE d.text END AS text,
         CAST(CASE WHEN a.doc_id IS NOT NULL
                   THEN len(string_split(d.text, ' ')) - COALESCE(r.n_kept, 0)
                   ELSE 0 END AS INT) AS n_removed
  FROM documents d
  LEFT JOIN affected a ON a.doc_id = d.doc_id
  LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
),
ctoks AS (SELECT doc_id, source, string_split(text, ' ') AS ctk FROM cleaned),
grams AS (
  SELECT doc_id, source, ctk[CAST(i + 1 AS INT)] AS g
  FROM ctoks, UNNEST(range(0, len(ctk))) AS u(i)
  UNION ALL
  SELECT doc_id, source,
         ctk[CAST(i + 1 AS INT)] || ' ' || ctk[CAST(i + 2 AS INT)] AS g
  FROM ctoks, UNNEST(range(0, len(ctk) - 1)) AS u(i)
  WHERE len(ctk) >= 2
),
bucketed AS (
  SELECT doc_id, source,
         CAST(CAST(('0x' || SUBSTRING(MD5(g), 1, 8)) AS BIGINT) % 512 AS BIGINT)
           AS bucket
  FROM grams
),
doc_b AS (SELECT doc_id, bucket, COUNT(*) AS cnt FROM bucketed GROUP BY 1, 2),
raw_c AS (SELECT bucket, COUNT(*) AS n FROM bucketed GROUP BY 1),
raw_n AS (SELECT SUM(n) AS nn FROM raw_c),
tgt_c AS (SELECT bucket, COUNT(*) AS n FROM bucketed WHERE source = 'src0'
          GROUP BY 1),
tgt_n AS (SELECT SUM(n) AS nn FROM tgt_c),
wts AS (
  SELECT d.doc_id,
         SUM(d.cnt * (LN(COALESCE(tc.n + 1.0, 1.0) / (tn.nn + 512.0))
                      - LN(COALESCE(rc.n + 1.0, 1.0) / (rn.nn + 512.0))))
           AS log_weight
  FROM doc_b d
  LEFT JOIN tgt_c tc ON tc.bucket = d.bucket
  LEFT JOIN raw_c rc ON rc.bucket = d.bucket
  CROSS JOIN tgt_n tn CROSS JOIN raw_n rn
  GROUP BY d.doc_id
),
selected AS (
  SELECT w.doc_id
  FROM wts w
  ORDER BY w.log_weight
           - LN(-LN((CAST(('0x' || SUBSTRING(MD5(CAST(w.doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) + 0.5) / 4294967296.0))
           DESC, w.doc_id
  LIMIT 300
),
pt AS (
  SELECT c.source, c.doc_id,
         CAST(len(string_split(c.text, ' ')) AS INT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY c.source ORDER BY c.doc_id) AS rn
  FROM cleaned c JOIN selected s ON s.doc_id = c.doc_id
),
rec AS (
  SELECT source, rn, doc_id, n_tokens, 0 AS bin_id, 0 AS bin_offset
  FROM pt WHERE rn = 1
  UNION ALL
  SELECT pt.source, pt.rn, pt.doc_id, pt.n_tokens,
         CASE WHEN rec.bin_offset + rec.n_tokens + pt.n_tokens <= 256
              THEN rec.bin_id ELSE rec.bin_id + 1 END,
         CASE WHEN rec.bin_offset + rec.n_tokens + pt.n_tokens <= 256
              THEN rec.bin_offset + rec.n_tokens ELSE 0 END
  FROM rec JOIN pt ON pt.source = rec.source AND pt.rn = rec.rn + 1
)
SELECT rec.source, rec.doc_id, rec.n_tokens, cl.n_removed,
       ROUND(w.log_weight, 6) AS log_weight,
       CAST(rec.bin_id AS INT) AS bin_id,
       CAST(rec.bin_offset AS INT) AS bin_offset
FROM rec
JOIN wts w ON w.doc_id = rec.doc_id
JOIN cleaned cl ON cl.doc_id = rec.doc_id
"""


def near_dup_leakage_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate leakage audit: for every unordered pair
    of sources, how many near-duplicate document pairs (8-gram Jaccard
    ≥ 0.5) span them. The train/test-split hygiene check for an LLM corpus:
    a 'held-out' source whose documents near-duplicate a training source
    leaks — exact-dedup alone misses it (this fixture has ZERO exact
    cross-source duplicates but 24/25 near-dup pairs cross sources).

    Spark side rides the shared MinHash pair list (the verified scale
    path — banded candidates, not all-pairs); the oracle recomputes the
    pairs with the exact Jaccard CTE, so the driver gate also re-certifies
    minhash's full recall on the fixtures. Source lookup is two joins on
    doc_id against a 2-column projection of documents (broadcastable at
    any corpus size: one row per doc, two small columns)."""
    _, pairs = _dedup_family(spark, sf_dir)
    src = load_tables(spark, sf_dir)["documents"].select("doc_id", "source")
    labeled = (
        pairs.select("id_a", "id_b")
        .join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("src_a")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("src_b")
            ),
            "id_b",
        )
    )
    return (
        labeled.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


NEAR_DUP_LEAKAGE_SQL = """
WITH sh0 AS (
  SELECT DISTINCT doc_id, SUBSTRING(text, CAST(pos AS INT), 8) AS shingle
  FROM documents, UNNEST(range(1, GREATEST(LENGTH(text) - 8 + 1, 1) + 1)) AS t(pos)
  WHERE LENGTH(text) >= 8
),
sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 50)
),
sizes AS (SELECT doc_id, COUNT(*) AS size FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(inter AS DOUBLE) / (sa.size + sb.size - inter) >= 0.5
)
SELECT LEAST(da.source, db.source) AS source_a,
       GREATEST(da.source, db.source) AS source_b,
       COUNT(*) AS n_pairs
FROM pairs
JOIN documents da ON da.doc_id = id_a
JOIN documents db ON db.doc_id = id_b
GROUP BY 1, 2
ORDER BY source_a, source_b
"""


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end LLM-data cleaning pipeline, one DataFrame program:
    exact-dedup (md5 min-id representative) → language filter (en) →
    quality gate → per-source doc/token accounting. Every stage is a
    codegen column expression; the whole pipeline is one shuffle for the
    dedup plus one for the final rollup."""
    from .operators.dedup import exact_dedup

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    reps = exact_dedup(docs).select(F.col("rep_id").alias("doc_id"))
    kept = (
        docs.join(reps, on="doc_id", how="left_semi")
        .withColumn("pred_lang", lang_id("text"))
        .withColumn("quality", quality_score("text"))
        .withColumn("n_tokens", token_count("text"))
        .where(
            (F.col("pred_lang") == "en")
            & (F.col("quality") >= 0.3)
            & (F.col("n_tokens") >= 10)
            & (F.col("n_tokens") <= 1000)
        )
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


def _stop_sql(lang: str) -> str:
    """SQL mirror of functions.text.stopword_count — same markers, same
    length/replace/cast-int arithmetic."""
    padded = "(' ' || text || ' ')"
    parts = [
        f"CAST((LENGTH({padded}) - LENGTH(REPLACE({padded}, '{m}', ''))) / {len(m)} AS INT)"
        for m in LANG_MARKERS[lang]
    ]
    return "CAST(" + " + ".join(parts) + " AS INT)"


_NTOK_SQL = (
    "CAST(CASE WHEN LENGTH(text) = 0 THEN 0 "
    "ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END AS INT)"
)
_NPUNCT_SQL = (
    "CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS INT)"
)


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars_m"),
        token_count("text").alias("n_tokens"),
        punct_count("text").alias("n_punct"),
        stopword_count("text", "en").alias("n_stop_en"),
        quality_score("text").alias("quality"),
    )


TEXT_STATS_SQL = f"""
SELECT doc_id,
       CAST(LENGTH(text) AS INT) AS n_chars_m,
       {_NTOK_SQL} AS n_tokens,
       {_NPUNCT_SQL} AS n_punct,
       {_stop_sql('en')} AS n_stop_en,
       (LEAST(LENGTH(text) / 500.0, 1.0) * 0.4
        + LEAST((CASE WHEN {_NTOK_SQL} = 0 THEN 0.0
                 ELSE CAST({_stop_sql('en')} AS DOUBLE) / {_NTOK_SQL} END) * 5.0, 1.0) * 0.4
        + (1.0 - LEAST((CASE WHEN LENGTH(text) = 0 THEN 0.0
                        ELSE CAST({_NPUNCT_SQL} AS DOUBLE) / LENGTH(text) END) * 10.0, 1.0)) * 0.2
       ) AS quality
FROM documents
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select("doc_id", "lang", lang_id("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _lang_case_sql() -> str:
    order = list(LANG_MARKERS)
    whens = []
    for i, lang in enumerate(order):
        conds = [f"{_stop_sql(lang)} > 0"] + [
            f"{_stop_sql(lang)} >= {_stop_sql(o)}" for o in order[i + 1 :]
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


TEXT_LANG_SQL = f"""
SELECT lang, pred_lang, COUNT(*) AS n_docs
FROM (SELECT doc_id, lang, {_lang_case_sql()} AS pred_lang FROM documents) x
GROUP BY lang, pred_lang
"""


PIPELINE_SQL = f"""
WITH reps AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text)
),
kept AS (
  SELECT d.doc_id, d.source,
         {_lang_case_sql()} AS pred_lang,
         (LEAST(LENGTH(text) / 500.0, 1.0) * 0.4
          + LEAST((CASE WHEN {_NTOK_SQL} = 0 THEN 0.0
                   ELSE CAST({_stop_sql('en')} AS DOUBLE) / {_NTOK_SQL} END) * 5.0, 1.0) * 0.4
          + (1.0 - LEAST((CASE WHEN LENGTH(text) = 0 THEN 0.0
                          ELSE CAST({_NPUNCT_SQL} AS DOUBLE) / LENGTH(text) END) * 10.0, 1.0)) * 0.2
         ) AS quality,
         {_NTOK_SQL} AS n_tokens
  FROM documents d JOIN reps USING (doc_id)
)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc
FROM kept
WHERE pred_lang = 'en' AND quality >= 0.3 AND n_tokens BETWEEN 10 AND 1000
GROUP BY source
"""


def dedup_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: 64-bit fingerprints, pairs within
    Hamming distance 8 via 16-bit band blocking (a pair within distance 3
    must share at least one of 4 bands). md5-compat fingerprint mode
    (VERDICT r8 #2): SimHash is deterministic given the token hash, so
    hashing shingles with md5 halves makes every fingerprint bit — and
    therefore the band buckets and Hamming distances — SQL-replayable,
    flipping this entry from rows-only to EXACT (the HLL/Bloom/theta
    precedent). The fast xxhash64 default remains for non-oracle use."""
    from .operators.dedup import _session_cache, simhash64

    t = load_tables(spark, sf_dir)
    # md5 mode can't reuse the family's int64-hashed shingle set — it
    # rebuilds raw-substring shingles (same n=8) in one shuffle-free
    # Arrow pass (VERDICT r9 #7: the expression form's explode +
    # global distinct + 64-sum aggregate cost 5-7 s at sf0.1; the
    # mapInPandas rebuild runs in ~1 s — see simhash64). Persist the
    # 5000-row fingerprint table since both self-join sides consume it.
    sh = _session_cache(simhash64(t["documents"], n=8, hash_fn="md5"))
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "chunk"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int"),
        )
        .where(F.col("hamming") <= 8)
        .select("id_a", "id_b", "hamming")
    )


# The oracle rebuilds the md5-mode fingerprints bit-for-bit: per-shingle
# hash = hi||lo from the first 16 hex chars of md5 (the Spark side is
# conv(substring(md5, off, 8), 16, 10) per half); per-doc bit b{i} is the
# sign of the Σ±1 vote; the 64-bit code and the four 16-bit band chunks
# reassemble from the votes (chunks from the votes directly — DuckDB
# BIGINT shifts error on signed overflow, so the oracle never shifts the
# assembled code). Blocking, pairing, and the Hamming cut then mirror the
# Spark plan exactly.
_SIMHASH_BIT_VOTES = ",\n    ".join(
    f"SUM(CASE WHEN ({'lo' if i < 32 else 'hi'} >> {i % 32}) & 1 = 1 "
    f"THEN 1 ELSE -1 END) AS b{i}"
    for i in range(64)
)
_SIMHASH_CODE = "\n      + ".join(
    ["(CASE WHEN b63 > 0 THEN CAST(-9223372036854775808 AS BIGINT) "
     "ELSE 0 END)"]
    + [f"(CASE WHEN b{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END)"
       for i in range(62, -1, -1)]
)
_SIMHASH_CHUNKS = ",\n    ".join(
    " + ".join(
        f"(CASE WHEN b{16 * b + j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(16)
    )
    + f" AS c{b}"
    for b in range(4)
)
SIMHASH_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, SUBSTRING(text, CAST(pos AS INT), 8) AS shingle
  FROM documents, UNNEST(range(1, GREATEST(LENGTH(text) - 8 + 1, 1) + 1)) AS t(pos)
  WHERE LENGTH(text) >= 8
),
hs AS (
  SELECT doc_id,
         CAST('0x' || SUBSTRING(MD5(shingle), 1, 8) AS BIGINT) AS hi,
         CAST('0x' || SUBSTRING(MD5(shingle), 9, 8) AS BIGINT) AS lo
  FROM sh
),
votes AS (
  SELECT doc_id,
    {_SIMHASH_BIT_VOTES}
  FROM hs GROUP BY doc_id
),
codes AS (
  SELECT doc_id,
    {_SIMHASH_CODE} AS simhash,
    {_SIMHASH_CHUNKS}
  FROM votes
),
bands AS (
  SELECT doc_id, simhash, b.band,
         CASE b.band WHEN 0 THEN c0 WHEN 1 THEN c1
                     WHEN 2 THEN c2 ELSE c3 END AS chunk
  FROM codes, (VALUES (0), (1), (2), (3)) AS b(band)
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                  x.simhash AS ha, y.simhash AS hb
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 8
"""


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return cosine_topk(e, e.where(F.col("vec_id") < 5), k=10, dim=64)


KNN_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         CASE WHEN sqrt(list_sum(list_transform(q.qe, x -> x * x))) = 0
                OR sqrt(list_sum(list_transform(v.e, x -> x * x))) = 0 THEN 0.0
              ELSE list_sum(list_transform(list_zip(q.qe, v.e), s -> s[1] * s[2]))
                   / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
                      * sqrt(list_sum(list_transform(v.e, x -> x * x))))
         END AS sim
  FROM v CROSS JOIN q
  WHERE v.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM scored) x
WHERE rank <= 10
"""


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute-force baseline)."""
    from .operators.dedup import embedding_near_dup

    t = load_tables(spark, sf_dir)
    return embedding_near_dup(t["embeddings"], threshold=0.4, dim=64)


def embedding_near_dup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: random-hyperplane LSH candidates + exact cosine verify.

    Shares the brute-force oracle: recall is < 1 in general, but the pinned
    seed/banding (32 bands x 4 bits) recovers every >=0.4-cosine pair on the
    test fixtures (verified empirically) and the cosine verify makes
    precision exactly 1 — bit-identical output, O(candidates) plan."""
    from .operators.dedup import embedding_near_dup_lsh

    t = load_tables(spark, sf_dir)
    return embedding_near_dup_lsh(t["embeddings"], threshold=0.4)


EMB_NEAR_DUP_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CASE WHEN sqrt(list_sum(list_transform(a.e, x -> x * x))) = 0
              OR sqrt(list_sum(list_transform(b.e, x -> x * x))) = 0 THEN 0.0
            ELSE list_sum(list_transform(list_zip(a.e, b.e), s -> s[1] * s[2]))
                 / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                    * sqrt(list_sum(list_transform(b.e, x -> x * x))))
       END AS cos
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE CASE WHEN sqrt(list_sum(list_transform(a.e, x -> x * x))) = 0
             OR sqrt(list_sum(list_transform(b.e, x -> x * x))) = 0 THEN 0.0
           ELSE list_sum(list_transform(list_zip(a.e, b.e), s -> s[1] * s[2]))
                / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                   * sqrt(list_sum(list_transform(b.e, x -> x * x))))
      END >= 0.4
"""


def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency table (explode + group — the UDTF-shaped
    pattern on the codegen path), top 50 by count."""
    t = load_tables(spark, sf_dir)
    tok = t["documents"].select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).where(F.length("token") > 0)
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(50)
    )


TOKEN_FREQ_SQL = """
SELECT token, COUNT(*) AS n
FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents) x
WHERE LENGTH(token) > 0
GROUP BY token ORDER BY n DESC, token LIMIT 50
"""


def ngram_diversity_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram diversity (operators/corpus_stats.py::
    ngram_diversity): total/distinct bigrams, type-token ratio,
    singleton share — the curation dashboard read before/after every
    dedup or filter pass (diversity collapse = over-dedup or template
    flooding). Grams cross the shuffle as xxhash64 int64s; the oracle
    groups the raw phrase strings, so the count comparison doubles as
    the collision check."""
    from .operators.corpus_stats import ngram_diversity

    t = load_tables(spark, sf_dir)
    return ngram_diversity(t["documents"], n=2, group_col="source")


NGRAM_DIVERSITY_SQL = """
WITH wl AS (SELECT source, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT source,
         w[CAST(p AS INT)] || ' ' || w[CAST(p AS INT) + 1] AS g
  FROM wl, UNNEST(range(1, GREATEST(len(w) - 1, 0) + 1)) AS r(p)
  WHERE len(w) >= 2
),
pg AS (SELECT source, g, COUNT(*) AS c FROM grams GROUP BY 1, 2)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS total_ngrams,
       COUNT(*) AS distinct_ngrams,
       ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS type_token_ratio,
       ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS singleton_share
FROM pg GROUP BY source
"""


def zipf_vocab_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf/vocabulary fingerprint (operators/corpus_stats.py::
    zipf_vocab_stats): token count, vocab size, singleton share,
    top-100 mass, and the OLS Zipf slope over the top-100 rank-frequency
    curve. Rank tiebreaks differ between engines (hash here, raw token
    in SQL) and the output is still EXACT — tied counts make every
    top-k aggregate tie-order invariant (see the operator docstring)."""
    from .operators.corpus_stats import zipf_vocab_stats

    t = load_tables(spark, sf_dir)
    return zipf_vocab_stats(t["documents"], top_k=100)


ZIPF_VOCAB_SQL = """
WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS t FROM documents),
cnt AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY 1),
totals AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS vocab_size,
         ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE), 6) AS singleton_share
  FROM cnt
),
top AS (
  SELECT c, r FROM (
    SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS r FROM cnt) x
  WHERE r <= 100
),
fit AS (
  SELECT CAST(SUM(c) AS BIGINT) AS topc,
         ROUND((COUNT(*) * SUM(LN(r) * LN(c)) - SUM(LN(r)) * SUM(LN(c)))
               / (COUNT(*) * SUM(LN(r) * LN(r)) - SUM(LN(r)) * SUM(LN(r))),
               6) AS zipf_slope
  FROM top
)
SELECT t.n_tokens, t.vocab_size, t.singleton_share,
       ROUND(f.topc / CAST(t.n_tokens AS DOUBLE), 6) AS topk_coverage,
       f.zipf_slope
FROM totals t CROSS JOIN fit f
"""


def salted_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch evaluation of the streaming salted two-phase windowed agg
    (streaming/skew_agg.py): the oracle is the PLAIN windowed aggregation —
    the driver hash check is the salted ≡ unsalted proof. value is
    pre-rounded to 3 decimals like tumbling_window_events so the decimal
    partial sums match DuckDB's bit-for-bit."""
    from .streaming.skew_agg import salted_window_agg

    t = load_tables(spark, sf_dir)
    e = t["events"].withColumn("value", F.round("value", 3))
    return salted_window_agg(e)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (1 media row → N frame rows) through the
    Arrow-batched stub decoder: duration := byte_len, frame := md5 of
    'f{idx}:'+content — fully deterministic, so even the exploded frame
    payloads hash-match the SQL oracle (frames surfaced as lowercase md5
    hex; the driver canonicalizer can't hash raw binary)."""
    from .operators.multimodal import attach_binary, sample_frames

    t = load_tables(spark, sf_dir)
    binary = attach_binary(t["documents"], "text", media_type="video")
    frames = sample_frames(binary, every_ms=100, max_frames=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        "ts_ms",
        F.lower(F.hex(F.col("frame"))).alias("frame_md5"),
    )


MM_FRAMES_SQL = """
SELECT doc_id,
       CAST(idx AS INT) AS frame_idx,
       CAST(idx * 100 AS BIGINT) AS ts_ms,
       MD5('f' || CAST(idx AS VARCHAR) || ':' || text) AS frame_md5
FROM documents,
     UNNEST(range(0, LEAST(4, GREATEST(1, CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 100.0) AS BIGINT))))) AS t(idx)
WHERE OCTET_LENGTH(ENCODE(text)) > 0
"""


def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish-regex token counts per doc + corpus rollup
    input: the pre-tokenizer pattern (letter runs / single digits /
    punctuation runs) is evaluated identically by Spark's Java regex and
    DuckDB's RE2 — restricted on purpose (no lookarounds, no \\p)."""
    from .functions.text import bpe_token_count

    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(
            "doc_id",
            token_count("text").alias("n_ws_tokens"),
            bpe_token_count("text").alias("n_bpe_tokens"),
        )
        .withColumn(
            "bpe_per_ws",
            F.when(
                F.col("n_ws_tokens") > 0,
                F.col("n_bpe_tokens").cast("double") / F.col("n_ws_tokens"),
            ).otherwise(F.lit(0.0)),
        )
    )


BPE_TOKEN_SQL = """
SELECT doc_id,
       CAST(CASE WHEN LENGTH(text) = 0 THEN 0
            ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END AS INT) AS n_ws_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+')) AS INT) AS n_bpe_tokens,
       CASE WHEN (CASE WHEN LENGTH(text) = 0 THEN 0
                  ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END) > 0
            THEN CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+')) AS DOUBLE)
                 / (CASE WHEN LENGTH(text) = 0 THEN 0
                    ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END)
            ELSE 0.0 END AS bpe_per_ws
FROM documents
"""


def train_test_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-hash 80/20 split of the corpus — reproducible
    across engines, so the split itself is oracle-checked."""
    from .operators.sampling import hash_split

    t = load_tables(spark, sf_dir)
    s = hash_split(t["documents"], "doc_id", train_pct=80)
    return s.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


TRAIN_SPLIT_SQL = """
SELECT CASE WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
            THEN 'train' ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2
"""


def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: text → utf8 blob + typed metadata (the decode
    step for real image/audio bytes is stubbed in operators/multimodal.py)."""
    t = load_tables(spark, sf_dir)
    blob = F.encode(F.col("text"), "UTF-8")
    return t["documents"].select(
        "doc_id",
        F.length(blob).cast("int").alias("byte_len"),
        F.md5(blob).alias("content_md5"),
        F.substring("source", 4, 10).alias("source_id"),
    )


MM_BINARY_SQL = """
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS byte_len,
       MD5(text) AS content_md5,
       SUBSTRING(source, 4, 10) AS source_id
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode over a binary column (stub decoder).

    The stub features are sha256-byte/255.0 doubles, so the oracle can
    reproduce them via DuckDB sha256() + hex extraction — the array column is
    projected to one scalar per dimension (the driver canonicalizer can't
    sort/hash raw array columns)."""
    from .operators.multimodal import FEATURE_DIM, attach_binary, extract_features

    t = load_tables(spark, sf_dir)
    binary = attach_binary(t["documents"], "text", media_type="image")
    feats = extract_features(binary)
    dims = [
        F.element_at("features", i + 1).alias(f"f{i:02d}") for i in range(FEATURE_DIM)
    ]
    return feats.select("doc_id", "byte_len", "content_sha", *dims)


_MM_FEAT_COLS = ",\n       ".join(
    f"CAST(CAST(('0x' || SUBSTRING(sha256(text), {2 * i + 1}, 2)) AS INT) AS DOUBLE)"
    f" / 255.0 AS f{i:02d}"
    for i in range(16)
)

MM_FEATURES_SQL = f"""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS byte_len,
       sha256(text) AS content_sha,
       {_MM_FEAT_COLS}
FROM documents
"""


# --------------------------------------------------------------------------
# events: windowed aggregation + sessionization (batch counterparts of the
# streaming module; exact epoch-integer comparisons for oracle parity)
# --------------------------------------------------------------------------

def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 3).cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


TUMBLING_SQL = """
SELECT CAST(EPOCH(DATE_TRUNC('hour', ts)) AS BIGINT) AS hour_start,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding by 15min — every event lands in exactly 4 windows.
    Oracle reconstructs membership arithmetically (integer-second window
    boundaries make second-floored timestamps membership-safe)."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "event_type",
            "n_events",
        )
    )


SLIDING_SQL = """
WITH e AS (SELECT event_type, EPOCH_US(ts) // 1000000 AS ts_s FROM events),
w AS (SELECT event_type, (ts_s // 900) * 900 - 900 * k AS win_start
      FROM e, UNNEST([0, 1, 2, 3]) AS t(k))
SELECT win_start, event_type, COUNT(*) AS n_events
FROM w GROUP BY win_start, event_type
"""


def session_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) on exact microsecond integers
    (micros, not nanos: DuckDB's parquet reader truncates TIMESTAMP(NANOS)
    to micros, so the oracle can only see epoch_us)."""
    t = load_tables(spark, sf_dir)
    e = t["events"].withColumn("ts_us", F.expr("ts_ns div 1000"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = 30 * 60 * 1_000_000
    marked = e.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int")
    )
    return sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


SESSION_SQL = """
WITH e AS (SELECT user_id, event_id, EPOCH_US(ts) AS ts_us FROM events),
marked AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS INT) AS sid
  FROM marked
)
SELECT user_id, sid, COUNT(*) AS n_events,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM sess GROUP BY user_id, sid
"""


def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused by reciprocal rank
    (operators/retrieval.py::rrf_fuse — Cormack et al. 2009): three
    queries each run BM25 over documents (their own term pair) AND
    brute-force cosine over the paired embeddings (vec_id ≡ doc_id),
    and the two shortlists fuse by Σ 1/(60 + rank) — ranks only, no
    score calibration.  The oracle replays the parameterized BM25, the
    cosine ranking, and the fusion (full-outer join of the two rank
    lists) in one SQL query, so fused scores AND the top-10 cut are
    EXACT-checked.

    Each shortlist leg is eagerly materialized (localCheckpoint) before
    fusion (VERDICT r9 #2): the single fused BM25+cosine+fusion plan
    was large enough that whole-stage-codegen/JIT compile dominated its
    first execution (driver bench swung 2.4→11.3 s across rounds on
    unchanged code); split, each leg is a small plan that compiles in
    milliseconds and the fusion plan sees two ≤75-row leaf scans.
    Construction runs the leg jobs → EAGER_QUERIES."""
    from .operators.retrieval import bm25_topk_multi, rrf_fuse
    from .operators.similarity import cosine_topk

    t = load_tables(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]
    terms = {0: ["spark", "join"], 1: ["window", "vector"],
             2: ["stream", "query"]}
    # ONE corpus pass for all three queries (VERDICT r7 #3 — the
    # per-query bm25_topk loop tokenized the corpus three times)
    lex = bm25_topk_multi(docs, terms, k=25).select(
        "query_id", "doc_id", "rank"
    ).localCheckpoint(eager=True)
    vec = cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=25, dim=64).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    ).localCheckpoint(eager=True)
    return rrf_fuse({"lex": lex, "vec": vec}, k=10).orderBy("query_id", "rank")


HYBRID_RRF_SQL = """
WITH qt AS (
  SELECT * FROM (VALUES (0, 'spark'), (0, 'join'), (1, 'window'),
                        (1, 'vector'), (2, 'stream'), (2, 'query'))
  AS v(qid, term)
),
toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
corpus AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2
),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT q.qid, t.doc_id,
         LN(1 + (c.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (t.tf * (1.2 + 1.0))
           / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) AS s
  FROM qt q JOIN tf t USING (term) JOIN dft f ON f.term = t.term
  JOIN dl d USING (doc_id) CROSS JOIN corpus c
),
lex AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY ROUND(SUM(s), 6) DESC, doc_id) AS INT) AS rank
    FROM scored GROUP BY qid, doc_id) x
  WHERE rank <= 25
),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
vq AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 3),
vscored AS (
  SELECT vq.qid, v.vec_id AS doc_id,
         CASE WHEN sqrt(list_sum(list_transform(vq.qe, x -> x * x))) = 0
                OR sqrt(list_sum(list_transform(v.e, x -> x * x))) = 0 THEN 0.0
              ELSE list_sum(list_transform(list_zip(vq.qe, v.e),
                                           s -> s[1] * s[2]))
                   / (sqrt(list_sum(list_transform(vq.qe, x -> x * x)))
                      * sqrt(list_sum(list_transform(v.e, x -> x * x))))
         END AS sim
  FROM v CROSS JOIN vq
  WHERE v.vec_id <> vq.qid
),
vec AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY sim DESC, doc_id) AS INT) AS rank
    FROM vscored) x
  WHERE rank <= 25
),
fused AS (
  SELECT COALESCE(l.qid, p.qid) AS query_id,
         COALESCE(l.doc_id, p.doc_id) AS doc_id,
         (CASE WHEN l.rank IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN p.rank IS NOT NULL THEN 1 ELSE 0 END) AS n_rankers,
         ROUND(COALESCE(1.0 / (60.0 + l.rank), 0.0)
               + COALESCE(1.0 / (60.0 + p.rank), 0.0), 6) AS rrf_score
  FROM lex l FULL OUTER JOIN vec p
    ON p.qid = l.qid AND p.doc_id = l.doc_id
)
SELECT query_id, doc_id, CAST(n_rankers AS INT) AS n_rankers, rrf_score,
       rank
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
  FROM fused) x
WHERE rank <= 10
ORDER BY query_id, rank
"""


def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + global clustering on the part co-purchase
    graph (operators/pagerank.py::triangle_count): parts are linked
    when they appear in the same order, and triangles are triads of
    pairwise co-purchased parts.  The operator runs degree-ordered
    compact-forward (oriented wedges bound hub fan-out at O(√E)); the
    oracle counts the same triangles with the orientation-free a<b<c
    triple self-join — equality certifies the orientation trick."""
    from .operators.pagerank import triangle_count

    edges = _copurchase_family(spark, sf_dir)
    return triangle_count(edges, "src", "dst", assume_canonical=True)


TRIANGLE_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b ON b.l_orderkey = a.l_orderkey
                 AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT n, COUNT(*) AS d FROM (
    SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n
),
tri AS (
  SELECT COUNT(*) AS t
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
agg AS (
  SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
         (SELECT COUNT(*) FROM e) AS n_edges,
         (SELECT CAST(SUM(d * (d - 1)) / 2 AS BIGINT) FROM deg) AS n_wedges,
         (SELECT t FROM tri) AS n_triangles
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       ROUND(3.0 * n_triangles / GREATEST(n_wedges, 1), 6)
         AS global_clustering
FROM agg
"""


def holt_winters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Holt double exponential smoothing over the first 300
    events (operators/timeseries.py::holt_winters): the sequential
    level/trend recurrence folds JVM-side via the aggregate HOF —
    parallel across keys, codegen within a key — and the oracle replays
    the exact recurrence as a recursive CTE (300 steps per type), so
    level/trend/forecast are EXACT-compared, not just gated."""
    from .operators.timeseries import holt_winters

    t = load_tables(spark, sf_dir)
    e = t["events"].withColumn("ts_us", F.expr("ts_ns div 1000"))
    return holt_winters(
        e, "event_type", "ts_us", "value",
        alpha=0.5, beta=0.3, max_points=300, tiebreak_col="event_id",
    ).orderBy("event_type")


HOLT_WINTERS_SQL = """
WITH RECURSIVE e AS (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS y,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY EPOCH_US(ts), event_id) AS rn
  FROM events
),
s AS (SELECT * FROM e WHERE rn <= 300),
r AS (
  SELECT event_type, rn, y AS l, CAST(0.0 AS DOUBLE) AS b
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.rn,
         0.5 * s.y + 0.5 * (r.l + r.b) AS l,
         0.3 * ((0.5 * s.y + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b AS b
  FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1
),
last AS (SELECT event_type, MAX(rn) AS n FROM r GROUP BY event_type)
SELECT r.event_type, CAST(r.rn AS BIGINT) AS n_points,
       ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
       ROUND(r.l + r.b, 6) AS forecast
FROM r JOIN last ON last.event_type = r.event_type AND r.rn = last.n
ORDER BY r.event_type
"""


def ks_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type two-sample KS drift (operators/profile.py::ks_drift):
    two controlled comparisons at α = 0.01 (c = 1.63; at α = 0.05 one
    of five types trips a legitimate false positive on this fixture) —
    the even/odd event_id halves (same distribution: no type drifts)
    and even vs odd×1.5 (a planted 50% scale shift: every type
    drifts).  D is the exact max ECDF gap computed relationally
    (per-key cumulative windows, no sort across keys); the oracle
    replays ECDFs, thresholds, and both verdicts in SQL."""
    from .operators.profile import ks_drift

    t = load_tables(spark, sf_dir)
    e = t["events"].select("event_type", "event_id", "value")
    even = e.where(F.col("event_id") % 2 == 0)
    odd = e.where(F.col("event_id") % 2 == 1)
    same = ks_drift(even, odd, "event_type", "value", alpha_c=1.63).select(
        F.lit("even_vs_odd").alias("case_name"), "*"
    )
    shifted = ks_drift(
        even,
        odd.withColumn("value", F.col("value") * 1.5),
        "event_type",
        "value",
        alpha_c=1.63,
    ).select(F.lit("even_vs_odd_scaled").alias("case_name"), "*")
    return same.unionByName(shifted).orderBy("case_name", "event_type")


KS_DRIFT_SQL = """
WITH e AS (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS value
  FROM events WHERE value IS NOT NULL
),
cases AS (
  SELECT 'even_vs_odd' AS case_name, event_type,
         CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS side, value
  FROM e
  UNION ALL
  SELECT 'even_vs_odd_scaled', event_type,
         CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END,
         CASE WHEN event_id % 2 = 0 THEN value ELSE value * 1.5 END
  FROM e
),
cnt AS (
  SELECT case_name, event_type, value,
         COUNT(*) FILTER (side = 'a') AS na_v,
         COUNT(*) FILTER (side = 'b') AS nb_v
  FROM cases GROUP BY 1, 2, 3
),
cum AS (
  SELECT case_name, event_type,
         SUM(na_v) OVER w AS ca, SUM(nb_v) OVER w AS cb,
         SUM(na_v) OVER t AS n_a, SUM(nb_v) OVER t AS n_b
  FROM cnt
  WINDOW w AS (PARTITION BY case_name, event_type ORDER BY value
               ROWS UNBOUNDED PRECEDING),
         t AS (PARTITION BY case_name, event_type)
),
d AS (
  SELECT case_name, event_type, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
         ROUND(MAX(ABS(CAST(ca AS DOUBLE) / n_a
                       - CAST(cb AS DOUBLE) / n_b)), 6) AS ks_d
  FROM cum GROUP BY 1, 2
)
SELECT case_name, event_type,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, ks_d,
       ROUND(1.63 * SQRT(CAST(n_a + n_b AS DOUBLE) / (n_a * n_b)), 6)
         AS threshold,
       ks_d > ROUND(1.63 * SQRT(CAST(n_a + n_b AS DOUBLE) / (n_a * n_b)), 6)
         AS drift
FROM d ORDER BY case_name, event_type
"""


def psi_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Population Stability Index drift
    (operators/profile.py::psi_drift) — the binned-shares drift score
    that reports a MAGNITUDE: the same two controlled comparisons as
    ks_drift_events (even/odd event halves: stable; even vs odd×1.5: a
    planted 50% scale shift), 10 equal-width bins fixed by the
    reference side's per-type [min, max].  Every share, floor, and the
    PSI fold is replayed by the SQL oracle, so psi itself is
    EXACT-checked to 6 decimals."""
    from .operators.profile import psi_drift

    t = load_tables(spark, sf_dir)
    e = t["events"].select("event_type", "event_id", "value")
    even = e.where(F.col("event_id") % 2 == 0)
    odd = e.where(F.col("event_id") % 2 == 1)
    same = psi_drift(even, odd, "event_type", "value").select(
        F.lit("even_vs_odd").alias("case_name"), "*"
    )
    shifted = psi_drift(
        even, odd.withColumn("value", F.col("value") * 1.5),
        "event_type", "value",
    ).select(F.lit("even_vs_odd_scaled").alias("case_name"), "*")
    return same.unionByName(shifted).orderBy("case_name", "event_type")


PSI_DRIFT_SQL = """
WITH e AS (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS value
  FROM events WHERE value IS NOT NULL
),
cases AS (
  SELECT 'even_vs_odd' AS case_name, event_type,
         CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS side, value
  FROM e
  UNION ALL
  SELECT 'even_vs_odd_scaled', event_type,
         CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END,
         CASE WHEN event_id % 2 = 0 THEN value ELSE value * 1.5 END
  FROM e
),
stats AS (
  SELECT case_name, event_type, MIN(value) AS mn, MAX(value) AS mx
  FROM cases WHERE side = 'a' GROUP BY 1, 2
),
binned AS (
  SELECT c.case_name, c.event_type, c.side,
         CASE WHEN s.mx > s.mn
              THEN LEAST(GREATEST(CAST(FLOOR((c.value - s.mn)
                         / ((s.mx - s.mn) / 10.0)) AS INT), 0), 9)
              ELSE 0 END AS bin
  FROM cases c JOIN stats s USING (case_name, event_type)
),
spine AS (
  SELECT case_name, event_type, i AS bin
  FROM stats, UNNEST(range(0, 10)) AS t(i)
),
counts AS (
  SELECT sp.case_name, sp.event_type, sp.bin,
         COALESCE(SUM(CASE WHEN b.side = 'a' THEN 1 END), 0) AS na_bin,
         COALESCE(SUM(CASE WHEN b.side = 'b' THEN 1 END), 0) AS nb_bin
  FROM spine sp
  LEFT JOIN binned b USING (case_name, event_type, bin)
  GROUP BY 1, 2, 3
),
tot AS (
  SELECT case_name, event_type,
         SUM(na_bin) AS n_a, SUM(nb_bin) AS n_b
  FROM counts GROUP BY 1, 2
),
psi AS (
  SELECT c.case_name, c.event_type, t.n_a, t.n_b,
         ROUND(SUM(
           (GREATEST(CAST(c.na_bin AS DOUBLE) / t.n_a, 1e-6)
            - GREATEST(CAST(c.nb_bin AS DOUBLE) / t.n_b, 1e-6))
           * LN(GREATEST(CAST(c.na_bin AS DOUBLE) / t.n_a, 1e-6)
                / GREATEST(CAST(c.nb_bin AS DOUBLE) / t.n_b, 1e-6))
         ), 6) AS psi
  FROM counts c JOIN tot t USING (case_name, event_type)
  GROUP BY 1, 2, t.n_a, t.n_b
)
SELECT case_name, event_type, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b, psi, psi >= 0.2 AS drift
FROM psi ORDER BY case_name, event_type
"""


def char_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc character Shannon entropy
    (operators/quality.py::char_entropy) — the cheapest
    gibberish/boilerplate band in the quality family: one (doc, char)
    groupBy + a per-doc fold, shuffle bounded by alphabet size per doc.
    Counts, distincts, and the -Σ p·log2 p fold replay in SQL, so
    entropy is EXACT-checked to 6 decimals."""
    from .operators.quality import char_entropy

    t = load_tables(spark, sf_dir)
    return char_entropy(t["documents"]).orderBy("doc_id")


CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, UNNEST(string_split(text, '')) AS c FROM documents
),
counts AS (
  SELECT doc_id, c, COUNT(*) AS n FROM chars WHERE c <> '' GROUP BY 1, 2
),
tot AS (
  SELECT doc_id, SUM(n) AS n_chars, COUNT(*) AS n_distinct
  FROM counts GROUP BY 1
),
ent AS (
  SELECT c.doc_id, MAX(t.n_chars) AS n_chars,
         MAX(t.n_distinct) AS n_distinct,
         ROUND(-SUM((CAST(c.n AS DOUBLE) / t.n_chars)
               * LOG2(CAST(c.n AS DOUBLE) / t.n_chars)), 6) AS entropy_bits
  FROM counts c JOIN tot t USING (doc_id) GROUP BY c.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(e.n_chars, 0) AS BIGINT) AS n_chars,
       CAST(COALESCE(e.n_distinct, 0) AS BIGINT) AS n_distinct,
       COALESCE(e.entropy_bits, 0.0) AS entropy_bits
FROM documents d LEFT JOIN ent e USING (doc_id)
ORDER BY d.doc_id
"""


def chunk_docs_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking
    (functions/text.py::chunk_documents — the RAG/embedding primitive):
    12-token windows, 4-token overlap, final window = remainder.  Pure
    codegen (split → generated starts → slice/concat_ws, no Python);
    the oracle replays the window grid and the chunk TEXT itself via
    DuckDB list slicing, so boundaries are EXACT-checked byte-for-byte."""
    from .functions.text import chunk_documents

    t = load_tables(spark, sf_dir)
    return chunk_documents(
        t["documents"], chunk_tokens=12, overlap=4
    ).orderBy("doc_id", "chunk_idx")


def cdc_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (functions/text.py::cdc_chunks —
    Rabin/FastCDC boundaries relationally): a chunk closes where the
    md5-derived hash of the trailing 4-token window ≡ 0 mod 16, so an
    edit perturbs only the chunks overlapping it while every other
    chunk keeps its identity/dedup hash — the property fixed windows
    (chunk_docs_windows) lack. md5 boundary mode → every boundary,
    chunk extent, and the chunk TEXT replay byte-for-byte in SQL."""
    from .functions.text import cdc_chunks

    t = load_tables(spark, sf_dir)
    return cdc_chunks(
        t["documents"], gram=4, avg_tokens=16, hash_fn="md5"
    ).orderBy("doc_id", "chunk_id")


CDC_CHUNK_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '') AS t
  FROM documents
),
base AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
pos AS (
  SELECT doc_id, n, i FROM base, UNNEST(range(1, n + 1)) AS u(i)
),
mark AS (
  SELECT p.doc_id, p.i,
         CASE WHEN p.i >= 4 AND
              CAST('0x' || SUBSTRING(
                MD5(array_to_string(b.t[p.i - 3 : p.i], ' ')), 1, 8)
                AS BIGINT) % 16 = 0
              THEN 1 ELSE 0 END AS m
  FROM pos p JOIN base b USING (doc_id)
),
cid AS (
  SELECT doc_id, i,
         1 + COALESCE(SUM(m) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS chunk_id
  FROM mark
),
ch AS (
  SELECT doc_id, chunk_id, MIN(i) AS start_tok, COUNT(*) AS n_tokens
  FROM cid GROUP BY 1, 2
)
SELECT c.doc_id, CAST(c.chunk_id AS INT) AS chunk_id,
       CAST(c.start_tok AS INT) AS start_tok,
       CAST(c.n_tokens AS INT) AS n_tokens,
       array_to_string(b.t[c.start_tok : c.start_tok + c.n_tokens - 1],
                       ' ') AS chunk_text
FROM ch c JOIN base b USING (doc_id)
ORDER BY c.doc_id, c.chunk_id
"""


CHUNK_DOCS_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '') AS t
  FROM documents
),
base AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
w AS (
  SELECT doc_id, n, t, i AS chunk_idx, i * 8 + 1 AS start
  FROM base,
       UNNEST(range(0, GREATEST(
         CAST(CEIL((n - 4) / CAST(8 AS DOUBLE)) AS INT), 1))) AS u(i)
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(start AS INT) AS start_token,
       CAST(LEAST(12, n - start + 1) AS INT) AS n_tokens,
       array_to_string(t[start:start + 11], ' ') AS chunk_text
FROM w ORDER BY doc_id, chunk_idx
"""


def cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type one-sided CUSUM change detection over the first 300
    events (operators/timeseries.py::cusum_scan — Page 1954): target is
    the type's decimal-exact mean, the sequential max(0, s+(y−μ)) scan
    folds via the aggregate HOF, and the oracle replays the recurrence
    as a recursive CTE — cusum_max, its position, and the alarm flag
    EXACT-compared."""
    from .operators.timeseries import cusum_scan

    t = load_tables(spark, sf_dir)
    e = t["events"].withColumn("ts_us", F.expr("ts_ns div 1000"))
    return cusum_scan(
        e, "event_type", "ts_us", "value",
        slack=0.0, threshold=100.0, max_points=300, tiebreak_col="event_id",
    ).orderBy("event_type")


CUSUM_SQL = """
WITH RECURSIVE e AS (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS y,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY EPOCH_US(ts), event_id) AS rn
  FROM events
),
s AS (SELECT * FROM e WHERE rn <= 300),
mu AS (
  SELECT event_type,
         CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) / COUNT(y) AS target
  FROM s GROUP BY event_type
),
r AS (
  SELECT s.event_type, s.rn,
         GREATEST(CAST(0.0 AS DOUBLE), s.y - m.target) AS cs,
         GREATEST(CAST(0.0 AS DOUBLE), s.y - m.target) AS smax,
         CASE WHEN GREATEST(CAST(0.0 AS DOUBLE), s.y - m.target) > 0.0
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS imax
  FROM s JOIN mu m USING (event_type) WHERE s.rn = 1
  UNION ALL
  SELECT s.event_type, s.rn,
         GREATEST(CAST(0.0 AS DOUBLE), r.cs + (s.y - m.target)) AS cs,
         CASE WHEN GREATEST(CAST(0.0 AS DOUBLE), r.cs + (s.y - m.target))
                   > r.smax
              THEN GREATEST(CAST(0.0 AS DOUBLE), r.cs + (s.y - m.target))
              ELSE r.smax END,
         CASE WHEN GREATEST(CAST(0.0 AS DOUBLE), r.cs + (s.y - m.target))
                   > r.smax
              THEN s.rn ELSE r.imax END
  FROM r
  JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1
  JOIN mu m ON m.event_type = r.event_type
),
last AS (SELECT event_type, MAX(rn) AS n FROM r GROUP BY event_type)
SELECT r.event_type, CAST(r.rn AS BIGINT) AS n_points,
       ROUND(m.target, 6) AS target,
       ROUND(r.smax, 6) AS cusum_max,
       r.imax AS argmax_idx,
       r.smax > 100.0 AS alarm
FROM r
JOIN last ON last.event_type = r.event_type AND r.rn = last.n
JOIN mu m ON m.event_type = r.event_type
ORDER BY r.event_type
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight filters + single aggregate (pushdown showcase)."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        _dsum(F.col("l_extendedprice") * F.col("l_discount"), _DEC_PROD).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24
"""


def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern (orders above their customer's mean),
    decorrelated to a window — exact decimal window sums for determinism."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey")
    o = t["orders"].withColumn(
        "cust_sum", F.sum(F.col("o_totalprice").cast(_DEC_MONEY)).over(w)
    ).withColumn("cust_n", F.count(F.lit(1)).over(w))
    return (
        o.where(
            F.col("o_totalprice").cast(_DEC_MONEY) * F.col("cust_n") > F.col("cust_sum")
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SUBQUERY_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS cust_sum,
         COUNT(*) OVER (PARTITION BY o_custkey) AS cust_n
  FROM orders) x
WHERE CAST(o_totalprice AS DECIMAL(18,2)) * cust_n > cust_sum
"""


def exists_high_value_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-subquery shape: orders having any lineitem over 50k."""
    t = load_tables(spark, sf_dir)
    big = t["lineitem"].where(F.col("l_extendedprice") > 50_000).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return t["orders"].join(big.distinct(), on="o_orderkey", how="left_semi").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


EXISTS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 50000)
"""


def skew_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level exact COUNT(DISTINCT) that survives hot keys."""
    from .operators.skew_agg import count_distinct_skewed

    t = load_tables(spark, sf_dir)
    return count_distinct_skewed(t["lineitem"], "l_suppkey", "l_orderkey", "n_orders")


SKEW_AGG_DISTINCT_SQL = """
SELECT l_suppkey, COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY l_suppkey
"""


def skew_agg_salted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) decomposable aggregate: exact mean via partial
    decimal sums + counts per salt bucket, merged per key."""
    from .operators.skew_agg import salted_aggregate

    t = load_tables(spark, sf_dir)
    partial = [
        F.sum(F.col("l_quantity").cast(_DEC_MONEY)).alias("s"),
        F.count(F.lit(1)).alias("c"),
    ]
    merge = [
        (F.sum("s").cast("double") / F.sum("c")).alias("avg_qty"),
        F.sum("c").alias("n_rows"),
    ]
    return salted_aggregate(t["lineitem"], "l_returnflag", partial, merge)


SKEW_AGG_MEAN_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def median_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition and agree
    bit-for-bit on the same doubles."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


MEDIAN_SQL = """
SELECT l_returnflag,
       QUANTILE_CONT(l_extendedprice, 0.5) AS med_price,
       QUANTILE_CONT(l_extendedprice, 0.9) AS p90_price,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


def approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct, quantile sketch) — rows-only
    check by nature: sketch internals differ across engines."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_med"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


AGG_DISTINCT_SQL = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def grouping_sets_li(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API entry point (spark.sql), GROUPING SETS coverage."""
    t = load_tables(spark, sf_dir)
    t["lineitem"].createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def json_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return t["events"].groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


JSON_PROPS_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


def vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.vectors import norm, to_double_array

    t = load_tables(spark, sf_dir)
    v = to_double_array("embedding")
    return t["embeddings"].select(
        "vec_id",
        F.size("embedding").alias("dim"),
        norm(v).alias("l2_norm"),
        F.array_max(v).alias("v_max"),
        F.array_min(v).alias("v_min"),
        "label",
    )


VECTOR_STATS_SQL = """
SELECT vec_id,
       CAST(LEN(embedding) AS INT) AS dim,
       SQRT(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm,
       list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v_max,
       list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v_min,
       label
FROM embeddings
"""


# --------------------------------------------------------------------------
# as-of / range joins (operators Spark lacks natively; DuckDB ASOF JOIN and
# a theta join are the oracles) + pivot/unpivot
# --------------------------------------------------------------------------

def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's latest prior purchase value (backward
    as-of join on exact microsecond integers)."""
    from .operators.asof import asof_join

    t = load_tables(spark, sf_dir)
    e = t["events"].withColumn("ts_us", F.expr("ts_ns div 1000"))
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks, purchases, on="user_id", left_ts="ts_us", right_ts="ts_us",
        right_vals=["purchase_value"],
    )


ASOF_SQL = """
WITH e AS (SELECT event_id, user_id, event_type, value, EPOCH_US(ts) AS ts_us FROM events),
clicks AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
purch AS (SELECT user_id, ts_us, MAX(value) AS purchase_value
          FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT c.event_id, c.user_id, c.ts_us, p.purchase_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
"""


def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems whose price falls in the supplier's account-balance band —
    bucketed band join (equi-join on (key, bucket), no theta cross)."""
    from .operators.asof import range_join

    t = load_tables(spark, sf_dir)
    bands = t["supplier"].select(
        F.col("s_suppkey").alias("l_suppkey"),
        (F.col("s_acctbal") - 1000.0).alias("lo"),
        (F.col("s_acctbal") + 1000.0).alias("hi"),
    )
    li = t["lineitem"].select("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice")
    j = range_join(
        li, bands, on="l_suppkey", left_val="l_extendedprice",
        right_lo="lo", right_hi="hi", bucket_width=500.0,
    )
    return j.select("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice", "lo", "hi")


RANGE_SQL = """
SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
       s_acctbal - 1000.0 AS lo, s_acctbal + 1000.0 AS hi
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE l_extendedprice >= s_acctbal - 1000.0 AND l_extendedprice <= s_acctbal + 1000.0
"""


def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        )
    )


PIVOT_SQL = """
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_f
FROM lineitem GROUP BY l_returnflag
"""


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    wide = t["lineitem"].groupBy("l_returnflag").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_price"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
"""


# --------------------------------------------------------------------------
# rows-only queries (no SQL-expressible oracle; driver records weaker check)
# --------------------------------------------------------------------------

def dedup_minhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, candidate-verified with exact Jaccard.

    Oracle-checked against the full exact-Jaccard SQL: LSH recall is < 1 in
    general, but with the pinned seeds/banding the candidates cover every
    >=0.5-Jaccard pair on the test fixtures (verified empirically), and the
    verify stage makes precision exactly 1 — so the output matches the
    exact computation bit-for-bit while the plan stays O(candidates)."""
    _, pairs = _dedup_family(spark, sf_dir)
    return pairs


MINHASH_SQL = """
WITH sh AS (
  SELECT DISTINCT doc_id, SUBSTRING(text, CAST(pos AS INT), 8) AS shingle
  FROM documents, UNNEST(range(1, GREATEST(LENGTH(text) - 8 + 1, 1) + 1)) AS t(pos)
  WHERE LENGTH(text) >= 8
),
sizes AS (SELECT doc_id, COUNT(*) AS size FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       CAST(inter AS DOUBLE) / (sa.size + sb.size - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.size + sb.size - inter) >= 0.5
"""


def dedup_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components (min-id representative)
    over the MinHash-LSH pair list — the pairs→clusters→one-doc-per-cluster
    step of a fuzzy-dedup pipeline. Iterative label-propagation joins in
    Spark; the oracle is a DuckDB recursive-CTE transitive closure over the
    exact-Jaccard pairs (identical to the LSH pairs on the fixtures)."""
    from .operators.cluster import connected_components

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    _, mh = _dedup_family(spark, sf_dir)
    pairs = mh.select("id_a", "id_b")
    return connected_components(pairs, docs.select("doc_id"))


DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, SUBSTRING(text, CAST(pos AS INT), 8) AS shingle
  FROM documents, UNNEST(range(1, GREATEST(LENGTH(text) - 8 + 1, 1) + 1)) AS t(pos)
  WHERE LENGTH(text) >= 8
),
sizes AS (SELECT doc_id, COUNT(*) AS size FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pr AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(inter AS DOUBLE) / (sa.size + sb.size - inter) >= 0.5
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pr
  UNION
  SELECT id_b, id_a FROM pr
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_rep
FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
GROUP BY d.doc_id
"""

_CLOSURE_CTE = DEDUP_CLUSTERS_SQL[: DEDUP_CLUSTERS_SQL.rindex("SELECT")]


def dedup_fuzzy_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source accounting of documents that survive FUZZY dedup (one
    min-id representative per near-dup cluster) — the end-to-end
    pairs→clusters→keep-reps pipeline as one query."""
    from .operators.cluster import dedup_fuzzy

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    _, mh = _dedup_family(spark, sf_dir)
    pairs = mh.select("id_a", "id_b")
    kept = dedup_fuzzy(docs, pairs)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("first_kept"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


DEDUP_FUZZY_SQL = (
    _CLOSURE_CTE
    + """,
reps AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_rep
  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id
)
SELECT d.source, COUNT(*) AS n_kept, MIN(d.doc_id) AS first_kept,
       CAST(SUM(LENGTH(d.text)) AS BIGINT) AS total_chars
FROM documents d JOIN reps ON reps.doc_id = d.doc_id
WHERE reps.doc_id = reps.cluster_rep
GROUP BY d.source
"""
)


def cluster_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split (operators/sampling.py::
    cluster_aware_split): split by the md5 of each doc's NEAR-DUP
    CLUSTER REP, so no near-duplicate pair straddles train/test.  The
    output carries the guarantee in the data: per split, the number of
    clusters whose members land in >1 split under this scheme
    (n_straddling — provably 0) next to the same count under a naive
    per-doc hash_split (n_naive_straddling — nonzero on this fixture:
    the leakage the operator exists to prevent).  Oracle recomputes the
    transitive-closure reps and both split assignments in SQL."""
    from .operators.cluster import connected_components
    from .operators.sampling import cluster_aware_split, hash_split

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    _, mh = _dedup_family(spark, sf_dir)
    clusters = connected_components(
        mh.select("id_a", "id_b"), docs.select("doc_id")
    )
    out = cluster_aware_split(docs, clusters, id_col="doc_id", train_pct=80)
    out = hash_split(out, "doc_id", train_pct=80, label_col="naive_split")
    both = out.join(clusters, on="doc_id")
    per_cluster = both.groupBy("cluster_rep").agg(
        F.countDistinct("split").alias("n_splits"),
        F.countDistinct("naive_split").alias("n_naive_splits"),
        F.min("split").alias("split"),
    )
    docs_agg = out.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
    cl_agg = per_cluster.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
        .cast("bigint").alias("n_straddling"),
        F.sum(F.when(F.col("n_naive_splits") > 1, 1).otherwise(0))
        .cast("bigint").alias("n_naive_straddling"),
    )
    return docs_agg.join(cl_agg, on="split").orderBy("split")


CLUSTER_SPLIT_SQL = (
    _CLOSURE_CTE
    + """SELECT doc_id, cluster_rep,
       CASE WHEN SUBSTRING(MD5(CAST(cluster_rep AS VARCHAR)), 1, 2) < 'cc'
            THEN 'train' ELSE 'test' END AS split,
       CASE WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
            THEN 'train' ELSE 'test' END AS naive_split
FROM (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_rep
  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id
)
"""
)

CLUSTER_SPLIT_STATS_SQL = f"""
WITH assigned AS ({CLUSTER_SPLIT_SQL}),
per_cluster AS (
  SELECT cluster_rep,
         COUNT(DISTINCT split) AS n_splits,
         COUNT(DISTINCT naive_split) AS n_naive_splits,
         MIN(split) AS split
  FROM assigned GROUP BY cluster_rep
),
docs_agg AS (SELECT split, COUNT(*) AS n_docs FROM assigned GROUP BY split),
cl_agg AS (
  SELECT split, COUNT(*) AS n_clusters,
         CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_straddling,
         CAST(SUM(CASE WHEN n_naive_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_naive_straddling
  FROM per_cluster GROUP BY split
)
SELECT d.split, d.n_docs, c.n_clusters, c.n_straddling, c.n_naive_straddling
FROM docs_agg d JOIN cl_agg c ON c.split = d.split
ORDER BY d.split
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return lsh_topk(e, e.where(F.col("vec_id") < 5), k=10)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN (rows-only oracle, approximate by construction).

    n_probe=8 of 16 lists because the synthetic fixture vectors are
    near-orthogonal (no cluster structure, so neighbors scatter across
    lists — recall 0.88 pinned in tests/test_dedup_equivalence.py); real
    clustered embeddings probe far fewer lists for the same recall."""
    from .operators.similarity import ivf_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    fam = _ann_family(spark, sf_dir)
    return ivf_topk(
        e, e.where(F.col("vec_id") < 5), k=10, n_centroids=16, n_probe=8,
        centroids=fam["centroids"], assigned=fam["assign"],
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py — Jégou et al. 2011;
    rows-only oracle, approximate by construction like LSH/IVF): the
    64-dim embeddings compress to m=16 byte codes (16 bytes/vector),
    then asymmetric-distance top-10 for five queries via per-query
    lookup tables — candidates cost m table gathers, the float vectors
    are never read after encoding.  Recall vs brute force pinned in
    tests/test_pq.py; the near-orthogonal fixture is PQ's worst case
    (no cluster structure for the sub-quantizers to exploit)."""
    from .operators.pq import pq_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    fam = _ann_family(spark, sf_dir)
    return pq_topk(
        fam["codes"], e.where(F.col("vec_id") < 5), fam["books"], k=10,
        refine_with=e, refine_factor=8,
    )


def ann_pq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC+R at FULL refinement coverage (VERDICT r7 #6): with
    refine_factor = ceil(N/k) the ADC shortlist is the whole corpus and
    the exact-cosine re-rank IS brute force, so this pins the entire
    refine pipeline (code assignment → chunked-LUT ADC → candidate
    re-score → final cut) against the knn_bruteforce SQL oracle
    EXACTLY — the production setting (refine_factor ~4-8) runs the same
    code on a shortlist.  Eager (train/encode collect at construction)
    → EAGER_QUERIES."""
    from .operators.pq import pq_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    n = e.count()
    fam = _ann_family(spark, sf_dir)
    return pq_topk(
        fam["codes"], e.where(F.col("vec_id") < 5), fam["books"], k=10,
        refine_with=e, refine_factor=-(-n // 10),
    )


def ann_ivf_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF at FULL probe coverage (VERDICT r9 #4 — the
    ann_pq_refined_topk precedent): with n_probe = n_centroids every
    inverted list is probed, the probe join scores the whole corpus,
    and the result IS brute force — pinning the entire IVF pipeline
    (sampled k-means centroid fit → argmax list assignment → per-query
    probe-list explode → centroid-id equi-join → cosine score → window
    cut) against the knn_bruteforce SQL oracle EXACTLY.  The
    production setting (n_probe ≪ n_centroids) runs the same code on
    fewer lists.  Eager (centroid training collects at construction)
    → EAGER_QUERIES."""
    from .operators.similarity import ivf_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    fam = _ann_family(spark, sf_dir)
    return ivf_topk(
        e, e.where(F.col("vec_id") < 5), k=10, n_centroids=16, n_probe=16,
        centroids=fam["centroids"], assigned=fam["assign"],
    )


def ann_lsh_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH (Lv et al. 2007) at FULL code coverage
    (VERDICT r9 #4): probe_codes = 2^band_bits probes every bucket of
    every band, so the candidate set is the whole corpus and the exact
    cosine re-rank IS brute force — pinning the LSH pipeline (Arrow
    band-code projection → multiprobe code expansion → (band, code)
    bucket join → pair dedup → score → cut) against the
    knn_bruteforce SQL oracle EXACTLY.  Production multiprobe
    (probe_codes 2–4) runs the same code on Hamming-adjacent buckets
    only.  max_bucket_size=None: bucket-cap sampling would break the
    coverage guarantee (and every bucket is over-cap when all codes
    are probed)."""
    from .operators.similarity import lsh_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return lsh_topk(
        e, e.where(F.col("vec_id") < 5), k=10,
        probe_codes=16, max_bucket_size=None,
    )


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (operators/pq.py::ivfpq_topk — the FAISS IndexIVFPQ
    layout): inverted-file restriction (8 of 16 lists) + PURE-CODEGEN
    asymmetric-distance scoring (broadcast LUT DataFrame + aggregate/
    element_at fold — zero Python per candidate) + exact refine of the
    top 4k.  Rows-only oracle like LSH/IVF/PQ (approximate by
    construction); n_probe=n_centroids equality with pq_topk and
    full-coverage recall 1.0 are pinned in tests/test_pq.py.  Eager
    (centroid/codebook training collects at construction) →
    EAGER_QUERIES."""
    from .operators.pq import ivfpq_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    models = _ann_family(spark, sf_dir)
    return ivfpq_topk(
        e, e.where(F.col("vec_id") < 5), k=10,
        n_centroids=16, n_probe=8, m=16, ks=32,
        refine_with=e, refine_factor=4,
        centroids=models["centroids"], codebooks=models["books"],
        assigned=models["assign"], codes_df=models["codes"],
    )


def embedding_covariance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle embedding covariance (operators/pca.py::
    embedding_covariance) — the one-pass second-moment fold that
    whitening/PCA/OPQ and drift monitors start from. Terms quantize to
    fixed decimal scales and sum as DECIMAL (exact in any order — the
    embedding_centroids precedent), so all 2080 covariance entries
    hash-match the SQL replay bit-for-bit."""
    from .operators.pca import embedding_covariance

    t = load_tables(spark, sf_dir)
    return embedding_covariance(t["embeddings"], dim=64)


EMB_COV_SQL = """
WITH v AS (
  -- quantized integer micro-units: round-to-6 as DECIMAL (the step
  -- both engines agree on bit-for-bit) scaled exactly to BIGINT
  SELECT list_transform(embedding,
           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6))
                     * 1000000 AS BIGINT)) AS q
  FROM embeddings
),
pairs AS (
  SELECT ii.i AS i, jj.j AS j,
         q[ii.i + 1] AS x, q[jj.j + 1] AS y,
         q[ii.i + 1] * q[jj.j + 1] AS xy
  FROM v, UNNEST(range(0, 64)) AS ii(i), UNNEST(range(0, 64)) AS jj(j)
  WHERE jj.j >= ii.i
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, COUNT(*) AS n_vecs,
       -- + 0.0 canonicalizes IEEE negative zero (see the Spark side)
       ROUND((CAST(SUM(xy) AS DOUBLE) / 1e12
              - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE)
                / 1e12 / COUNT(*))
             / COUNT(*), 6) + 0.0 AS cov
FROM pairs GROUP BY i, j
"""


def ann_ivfpq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ at FULL coverage (VERDICT r9 #4 family, third flip):
    n_probe = n_centroids makes the inverted-file restriction a no-op
    AND refine_factor = ceil(N/k) re-ranks the whole ADC shortlist by
    exact cosine, so the production IndexIVFPQ layout (centroid fit →
    list assignment → codebook train → encode → codegen ADC → exact
    refine → cut) is pinned against the knn_bruteforce SQL oracle
    EXACTLY.  Production settings (n_probe ≪ n_centroids,
    refine_factor ~4) run the same code on fewer lists and a shorter
    shortlist.  Eager (centroid + codebook training collect at
    construction) → EAGER_QUERIES."""
    from .operators.pq import ivfpq_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    n = e.count()
    models = _ann_family(spark, sf_dir)
    return ivfpq_topk(
        e, e.where(F.col("vec_id") < 5), k=10,
        n_centroids=16, n_probe=16, m=16, ks=32,
        refine_with=e, refine_factor=-(-n // 10),
        centroids=models["centroids"], codebooks=models["books"],
        assigned=models["assign"], codes_df=models["codes"],
    )


def hard_negatives_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py::hard_negatives):
    for 5 anchors, the top-10 most-cosine-similar vectors with a
    DIFFERENT class label (the embeddings table's own label column) —
    the contrastive-training batch builder.  The oracle replays cosine,
    the null-safe label-mismatch filter, and the cut, so the mined set
    is EXACT-checked."""
    from .operators.similarity import hard_negatives

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return hard_negatives(e, e.where(F.col("vec_id") < 5), k=10, dim=64)


HARD_NEGATIVES_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev,
         label
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, ev AS qe, label AS query_label
      FROM v WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, q.query_label, v.vec_id AS neighbor_id,
         v.label AS neighbor_label,
         CASE WHEN sqrt(list_sum(list_transform(q.qe, x -> x * x))) = 0
                OR sqrt(list_sum(list_transform(v.ev, x -> x * x))) = 0
              THEN 0.0
              ELSE list_sum(list_transform(list_zip(q.qe, v.ev),
                                           s -> s[1] * s[2]))
                   / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
                      * sqrt(list_sum(list_transform(v.ev, x -> x * x))))
         END AS sim
  FROM v CROSS JOIN q
  WHERE v.label IS DISTINCT FROM q.query_label
)
SELECT query_id, query_label, neighbor_id, neighbor_label, rank FROM (
  SELECT query_id, query_label, neighbor_id, neighbor_label,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INT)
           AS rank
  FROM scored) x
WHERE rank <= 10
"""


def weighted_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag quantity-weighted price quantiles
    (operators/profile.py::weighted_quantiles, inverted-CDF): the
    median/p90 DOLLAR-OF-QUANTITY price, not the median row — one
    cumulative window per key serves every q.  No interpolation, so
    the oracle replays it byte-for-byte."""
    from .operators.profile import weighted_quantiles

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        "l_quantity",
    )
    return weighted_quantiles(
        li, "l_returnflag", "price", "l_quantity", qs=[0.25, 0.5, 0.9]
    ).orderBy("l_returnflag", "q")


WEIGHTED_QUANTILES_SQL = """
WITH vals AS (
  SELECT l_returnflag AS k, CAST(l_extendedprice AS DOUBLE) AS v,
         SUM(CAST(l_quantity AS DOUBLE)) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT k, v,
         SUM(w) OVER (PARTITION BY k ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY k) AS tw
  FROM vals
),
qs AS (SELECT CAST(UNNEST([0.25, 0.5, 0.9]) AS DOUBLE) AS q)
SELECT cum.k AS l_returnflag, qs.q,
       MIN(CASE WHEN cw >= q * tw THEN v END) AS value,
       ROUND(MAX(tw), 6) AS total_weight
FROM cum CROSS JOIN qs
GROUP BY 1, 2
ORDER BY l_returnflag, q
"""


def token_budget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection
    (operators/sampling.py::token_budget_sample): fill 60% of the
    corpus token budget from the longest documents down — the final
    cut of a curated pretraining mix.  NO global sort: range buckets
    on the order column + a driver cumulative over 256 bucket totals;
    only the boundary bucket runs a (bucket-partitioned) window.  The
    oracle replays the global-order cumulative directly, so membership
    AND each row's exact preceding-weight are hash-checked (integer
    token weights — float-order effects cannot flip the cut).  Eager
    (bucket totals collect at construction) → EAGER_QUERIES."""
    from .operators.sampling import token_budget_sample

    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).cast("long").alias("n_tokens"),
    )
    total = toks.agg(F.sum("n_tokens").alias("s")).collect()[0]["s"]
    out = token_budget_sample(
        toks, budget=0.6 * float(total), weight_col="n_tokens",
        order_col="n_tokens", id_col="doc_id",
    )
    return out.select(
        "doc_id", "n_tokens",
        F.round("__cum_before", 6).alias("cum_before"),
    ).orderBy("doc_id")


TOKEN_BUDGET_SQL = """
WITH base AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'),
                         x -> x <> '')) AS n_tokens
  FROM documents
),
tot AS (SELECT 0.6 * SUM(n_tokens) AS budget FROM base),
ordered AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(CAST(n_tokens AS DOUBLE))
                    OVER (ORDER BY n_tokens DESC, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0.0) AS cb
  FROM base
)
SELECT o.doc_id, CAST(o.n_tokens AS BIGINT) AS n_tokens,
       ROUND(o.cb, 6) AS cum_before
FROM ordered o, tot WHERE o.cb < tot.budget
ORDER BY o.doc_id
"""


def skew_join_cms_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skew_join with the CMS estimator — same oracle as the exact path."""
    t = load_tables(spark, sf_dir)
    conf = SkewJoinConf(
        replication_factor=0.01, hot_threshold=200, estimator="cms",
        sample_fraction=0.05,
    )
    j = skew_join(t["lineitem"], t["supplier"], [("l_suppkey", "s_suppkey")], "inner", conf)
    return j.select("l_orderkey", "l_suppkey", "l_quantity", "s_name")


SJ_CMS_SQL = """
SELECT l_orderkey, l_suppkey, l_quantity, s_name
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
"""


# --------------------------------------------------------------------------
# TPC-H-shape completion (round 3): the remaining 14 classic query shapes,
# adapted to the driver's slim star schema (no partsupp/commit dates/phone:
# q2/q9/q11/q20 derive supply facts from lineitem; q21 uses returnflag for
# the "failed delivery" role; q22's country code is a nationkey bucket).
# Decimal-sum casts keep every money aggregate engine-deterministic.
# --------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape: correlated MIN subquery over a derived supply-cost fact +
    4-way dim join. The per-(part,supplier) unit cost comes from lineitem
    (no partsupp table in this schema); the region-scoped minimum is a
    window min — Catalyst computes it in one pass where the SQL oracle
    re-correlates."""
    t = load_tables(spark, sf_dir)
    cost = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eu_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
    )
    j = (
        cost.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["part"].where(F.col("p_size") == 15)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("__min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("__min_cost"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "unit_cost")
    )


Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
FROM part, cost, supplier, nation, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND p_size = 15
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND unit_cost = (
    SELECT MIN(c2.unit_cost) FROM cost c2, supplier s2, nation n2, region r2
    WHERE c2.l_partkey = p_partkey AND s2.s_suppkey = c2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7: bidirectional nation-pair revenue by ship year (self-joined dim)."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    l = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    j = (
        l.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    volume = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        j.withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum(volume, _DEC_PROD).alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8: conditional-aggregate ratio (one nation's share of regional
    promo-part volume by order year). Both sums are decimal-exact before
    the single double division."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    j = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].where(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "AFRICA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    volume = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    nation_volume = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0))
    return (
        j.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            (
                _dsum(nation_volume, _DEC_PROD) / _dsum(volume, _DEC_PROD)
            ).alias("mkt_share")
        )
    )


Q8_SQL = """
SELECT o_year,
       CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(24,6))) AS DOUBLE)
       / CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
    AND n1.n_regionkey = r_regionkey AND r_name = 'AFRICA'
    AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9: nation/year profit over a part-name LIKE filter. Supply cost is
    derived as 0.6 × retail price × quantity (no partsupp.ps_supplycost in
    this schema)."""
    t = load_tables(spark, sf_dir)
    j = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].where(F.col("p_name").like("%gear%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_dsum(F.col("amount"), _DEC_PROD).alias("sum_profit"))
    )


Q9_SQL = """
SELECT nation, o_year,
       CAST(SUM(CAST(amount AS DECIMAL(24,6))) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
    AND s_nationkey = n_nationkey AND p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10: top-20 customers by returned-item revenue in a quarter."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    j = (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(_dsum(revenue, _DEC_PROD).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
       c_acctbal, n_name, c_mktsegment
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 shape: HAVING against a scalar subquery (parts whose revenue
    through one nation's suppliers exceeds 0.2% of that nation's total).
    The scalar total is a 1-row broadcast cross join, not a driver round
    trip."""
    t = load_tables(spark, sf_dir)
    base = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    per_part = base.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        _dsum(revenue, _DEC_PROD).alias("part_value")
    )
    total = base.agg((_dsum(revenue, _DEC_PROD) * F.lit(0.002)).alias("__threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > F.col("__threshold"))
        .orderBy(F.col("part_value").desc(), "ps_partkey")
        .select("ps_partkey", "part_value")
    )


Q11_SQL = """
SELECT l_partkey AS ps_partkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS part_value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) > (
  SELECT 0.002 * CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_5')
ORDER BY part_value DESC, ps_partkey
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13: LEFT OUTER join with an extra join-condition predicate, then a
    distribution over per-customer order counts."""
    t = load_tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15: CTE + scalar MAX equality (the revenue view is computed once and
    reused for both the ranking and the max — no second scan)."""
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), _DEC_PROD
            ).alias("total_revenue")
        )
    )
    # scalar max as a 1-row broadcast, NOT an unpartitioned window (which
    # would drag every supplier row to a single partition)
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16: NOT IN subquery (suppliers in bad standing excluded via
    left_anti) + COUNT(DISTINCT) per part attribute triple."""
    t = load_tables(spark, sf_dir)
    bad = t["supplier"].where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    p = t["part"].where(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(bad), on="l_suppkey", how="left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#11' AND p_type <> 'PROMO'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17: correlated per-part AVG threshold (rows under half the part's
    mean quantity). The mean is decimal-sum / count — bit-identical across
    engines — and attaches as a broadcast per-part map, not a rescan per
    row."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    thresholds = li.groupBy(F.col("l_partkey").alias("__tp")).agg(
        (
            F.lit(0.5)
            * (_dsum(F.col("l_quantity")) / F.count(F.lit(1)))
        ).alias("__half_avg_qty")
    )
    j = (
        li.join(
            F.broadcast(t["part"].where(F.col("p_brand") == "Brand#13")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(thresholds), F.col("l_partkey") == F.col("__tp"))
        .where(F.col("l_quantity") < F.col("__half_avg_qty"))
    )
    return j.agg((_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
  AND l_quantity < (
    SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18: IN-subquery with HAVING (orders whose total quantity > 170)."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("__sq"))
        .where(F.col("__sq") > 170)
        .select("l_orderkey")
    )
    j = (
        t["orders"]
        .join(big.withColumnRenamed("l_orderkey", "o_orderkey"), on="o_orderkey", how="left_semi")
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        j.groupBy(
            "c_name", "c_custkey", "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"), "o_totalprice",
        )
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 170)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape: IN-subquery whose HAVING correlates to a per-part scalar
    (suppliers providing >8% of a SMALL part's total quantity). The
    correlated total is a window sum over the per-(supplier, part)
    aggregate's part partition — one shuffle, no per-group subquery."""
    t = load_tables(spark, sf_dir)
    small = t["part"].where(F.col("p_type") == "SMALL").select("p_partkey")
    per_ps = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(_dsum(F.col("l_quantity")).alias("__sq"))
    )
    w = Window.partitionBy("l_partkey")
    qualifying = (
        per_ps.withColumn("__part_total", F.sum("__sq").over(w))
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .where(F.col("__sq") > F.lit(0.08) * F.col("__part_total"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return (
        t["supplier"]
        .join(qualifying, on="s_suppkey", how="left_semi")
        .join(
            F.broadcast(t["nation"].where(F.col("n_regionkey") == 2)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .orderBy("s_name")
        .select("s_name", "s_acctbal", "n_name")
    )


Q20_SQL = """
SELECT s_name, s_acctbal, n_name
FROM supplier, nation
WHERE s_nationkey = n_nationkey AND n_regionkey = 2
  AND s_suppkey IN (
    SELECT l1.l_suppkey FROM lineitem l1, part
    WHERE p_partkey = l1.l_partkey AND p_type = 'SMALL'
    GROUP BY l1.l_suppkey, l1.l_partkey
    HAVING CAST(SUM(CAST(l1.l_quantity AS DECIMAL(18,2))) AS DOUBLE) > (
      SELECT 0.08 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey))
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 shape: correlated EXISTS + NOT EXISTS against sibling lineitems.
    Adapted to this schema: on finished ('F') multi-supplier orders, count
    per supplier the lines where THIS supplier is the only one whose line
    was returned (returnflag 'R' plays the missed-commit-date role).
    EXISTS → left_semi on (orderkey, other-supplier); NOT EXISTS →
    left_anti on the same shape restricted to returned lines."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .join(
            F.broadcast(t["orders"].where(F.col("o_orderstatus") == "F")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    ).distinct()
    exists = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    others_r = (
        li.where(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("o3_orderkey"),
            F.col("l_suppkey").alias("o3_suppkey"),
        )
        .distinct()
    )
    not_exists = exists.join(
        others_r,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        not_exists.join(
            F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "NATION_4")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
  AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape: scalar AVG subquery + NOT EXISTS. Country code is a
    nationkey bucket (no phone column); "inactive" = no order above 300k
    (every fixture customer has orders, so the classic no-orders predicate
    is vacuous)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].where((F.col("c_nationkey") % 10).isin(1, 3, 5, 7, 9))
    avg_bal = t["customer"].where(F.col("c_acctbal") > 0.0).agg(
        (_dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("__avg_bal")
    )
    big_orders = t["orders"].where(F.col("o_totalprice") > 300000.0).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(big_orders, on="c_custkey", how="left_anti")
        .groupBy((F.col("c_nationkey") % 10).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
    AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                     FROM customer WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_totalprice > 300000.0)
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


# --------------------------------------------------------------------------
# pipeline-scale operators (round 4): runtime-filter join, heavy hitters,
# contamination check, shard export
# --------------------------------------------------------------------------

def prefilter_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-style hashed prefilter join: orders pruned map-side against the
    selective customer subset before the exact join (operators/prefilter.py).
    The prefilter can only prune, never change results — the oracle is the
    plain join."""
    from .operators.prefilter import prefiltered_join

    t = load_tables(spark, sf_dir)
    dim = t["customer"].where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000.0)
    )
    j = prefiltered_join(t["orders"], dim, [("o_custkey", "c_custkey")])
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("revenue"),
    )


PREFILTER_JOIN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
GROUP BY o_orderpriority
"""


def heavy_hitter_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ-frequent keys via per-partition Misra-Gries summaries + exact
    verify pass (operators/heavy.py) — output is exact, so the oracle is
    the plain GROUP BY/HAVING."""
    from .operators.heavy import heavy_hitters

    t = load_tables(spark, sf_dir)
    return heavy_hitters(t["lineitem"], ["l_suppkey"], phi=0.009, k=512)


HEAVY_HITTER_SQL = """
SELECT l_suppkey, COUNT(*) AS n_rows
FROM lineitem GROUP BY l_suppkey
HAVING COUNT(*) >= CEIL(0.009 * (SELECT COUNT(*) FROM lineitem))
"""


def contamination_check_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing token n-grams with
    the held-out eval slice (doc_id % 97 = 0 stands in for the benchmark).
    Benchmark n-gram set broadcasts; the corpus is never shuffled.

    n=4 here because the synthetic word-soup corpus has almost no longer
    shared spans (real deployments use 8-13); the operator takes n as a
    parameter."""
    from .operators.contamination import contamination_report

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return contamination_report(corpus, bench, n=4)


CONTAMINATION_SQL = """
WITH grams AS (
  SELECT doc_id,
         ARRAY_TO_STRING(LIST_SLICE(toks, CAST(pos AS INT), CAST(pos AS INT) + 3), ' ') AS gram
  FROM (SELECT doc_id, STRING_SPLIT_REGEX(text, '\\s+') AS toks FROM documents),
       UNNEST(RANGE(1, GREATEST(LEN(toks) - 4 + 1, 0) + 1)) AS t(pos)
),
corpus AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 97 <> 0),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
hits AS (
  SELECT doc_id, COUNT(*) AS n_hits FROM corpus
  WHERE gram IN (SELECT gram FROM bench) GROUP BY doc_id
)
SELECT p.doc_id, p.n_grams, h.n_hits,
       CAST(h.n_hits AS DOUBLE) / p.n_grams AS contamination
FROM per_doc p JOIN hits h ON p.doc_id = h.doc_id
"""


def shard_export_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-byte shard assignment for training-data export
    (operators/sampling.py::shard_id) — engine-independent, so the shard
    membership itself is oracle-checked."""
    from .operators.sampling import shard_id

    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .withColumn("shard", shard_id("doc_id", 16))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms: explode → per-doc term counts →
    corpus document frequency → score → windowed top-k. Two shuffles
    (doc+term counts, then the per-doc window); the document-frequency
    table joins by term (broadcastable when the vocabulary is bounded).
    Ranking uses the ROUNDED score (same 6-decimal expression as the
    reported column) with a token tiebreak — ADVICE r3: ranking by the
    raw double let a cross-libm ln() ulp difference flip row_number for
    near-equal scores of different tokens, changing rk<=3 membership."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.length("token") > 0)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    score = F.col("tf").cast("double") * F.log(
        (F.col("n_docs") + F.lit(1.0)) / (F.col("dfc") + F.lit(1.0))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round(score, 6).desc(), F.col("token")
    )
    return (
        tf.join(dfreq, "token")
        .crossJoin(n)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(score, 6).alias("tfidf"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok
  WHERE LENGTH(token) > 0 GROUP BY doc_id, token
),
dfq AS (SELECT token, COUNT(*) AS dfc FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, tf,
       ROUND(CAST(tf AS DOUBLE) * LN((n_docs + 1.0) / (dfc + 1.0)), 6) AS tfidf,
       CAST(rk AS INT) AS rk
FROM (
  SELECT t.doc_id, t.token, t.tf, d.dfc, n.n_docs,
         ROW_NUMBER() OVER (
           PARTITION BY t.doc_id
           ORDER BY ROUND(CAST(t.tf AS DOUBLE) * LN((n.n_docs + 1.0) / (d.dfc + 1.0)), 6) DESC,
                    t.token
         ) AS rk
  FROM tf t JOIN dfq d USING (token) CROSS JOIN n
) WHERE rk <= 3
"""


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label dimension-wise centroid stats over the embedding column —
    the 'what does each class look like' scan of embedding analytics.
    posexplode keys the shuffle by (label, dim): 64·n_labels groups, no
    skew. Cross-row float sums are order-dependent, so each value is
    rounded to 6 decimals and summed as DECIMAL (exact, order-independent)
    before the final double division — bit-stable across engines."""
    t = load_tables(spark, sf_dir)
    pos = t["embeddings"].select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    dec = F.round(F.col("v").cast("double"), 6).cast("decimal(18,6)")
    return (
        pos.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("mean_v"),
            F.min(F.col("v").cast("double")).alias("min_v"),
            F.max(F.col("v").cast("double")).alias("max_v"),
        )
        .select("label", F.col("dim").cast("int").alias("dim"), "n_vecs", "mean_v", "min_v", "max_v")
    )


EMBEDDING_CENTROIDS_SQL = """
SELECT label, CAST(pos - 1 AS INT) AS dim, COUNT(*) AS n_vecs,
       CAST(SUM(CAST(ROUND(CAST(embedding[CAST(pos AS INT)] AS DOUBLE), 6) AS DECIMAL(18,6))) AS DOUBLE)
         / COUNT(*) AS mean_v,
       MIN(CAST(embedding[CAST(pos AS INT)] AS DOUBLE)) AS min_v,
       MAX(CAST(embedding[CAST(pos AS INT)] AS DOUBLE)) AS max_v
FROM embeddings, UNNEST(RANGE(1, LEN(embedding) + 1)) AS t(pos)
GROUP BY label, pos
"""


def quota_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap documents per source by deterministic md5-hash rank
    (operators/sampling.py::quota_sample) — the kept set is engine-
    independent, so membership itself is oracle-checked."""
    from .operators.sampling import quota_sample

    t = load_tables(spark, sf_dir)
    kept = quota_sample(t["documents"], "source", "doc_id", cap=10)
    return kept.select("doc_id", "source", "lang")


QUOTA_SAMPLE_SQL = """
SELECT doc_id, source, lang FROM (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
) WHERE rk <= 10
"""


SHARD_STATS_SQL = """
SELECT CAST((STRPOS('0123456789abcdef', SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
          + STRPOS('0123456789abcdef', SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS INT) % 16 AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY 1
"""


# The winnow family (per-doc stats + overlap pairs) shares one fingerprint
# table at the standing parameters (k=16, w=12) — same persist-once idiom
# as _dedup_family; clear_dedup_cache releases it too.
_WINNOW_CACHE: dict[tuple[int, str], DataFrame] = {}


def _winnow_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (_session_key(spark), sf_dir)
    hit = _WINNOW_CACHE.get(key)
    if hit is not None:
        return hit
    from .operators.fingerprint import winnow_fingerprints

    docs = load_tables(spark, sf_dir)["documents"]
    fps = winnow_fingerprints(docs, k=16, w=12).localCheckpoint()
    _WINNOW_CACHE[key] = fps
    return fps


def doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (rolling-hash document sketch, MOSS scheme)
    over the corpus: per-doc fingerprint count + min/max and a mod-sum
    checksum of the actual fingerprint VALUES — the 60-bit md5-prefix
    hash is reproduced bit-for-bit by the SQL oracle, so the selected
    set itself is verified, not just its size."""
    fps = _winnow_family(spark, sf_dir)
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
        # order-insensitive set checksum; mod keeps the sum far from
        # int64 overflow (ANSI mode would raise on a raw sum of 2^60s)
        F.sum(F.col("fp") % 1000003).alias("sum_fp_mod"),
    )


def winnow_overlap_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= 2 winnowed fingerprints — the overlap /
    near-dup application of the fingerprint sketch. Fingerprints held by
    > 50 docs (boilerplate; the quadratic hot bucket at scale) are
    dropped on both sides before the self-join, mirrored in the oracle.

    k=16/w=12/min_shared=4 tuned on the word-soup fixture for
    selectivity: finds all 25 planted near-dup pairs (100% recall vs
    dedup_minhash_docs) in 29 output pairs; k=8 grams are
    non-discriminative on a small-vocab corpus (~88k pairs)."""
    from .operators.fingerprint import fingerprint_overlap_pairs

    fps = _winnow_family(spark, sf_dir)
    return fingerprint_overlap_pairs(fps, min_shared=4, max_docs_per_fp=30)


WINNOW16_FPS_CTE = """
WITH grams AS (
  SELECT doc_id, pos, LENGTH(text) - 15 AS npos,
         CAST('0x' || SUBSTR(MD5(SUBSTR(text, CAST(pos AS INT), 16)), 1, 15) AS BIGINT) AS h
  FROM documents,
       UNNEST(RANGE(1, GREATEST(LENGTH(text) - 16 + 1, 0) + 1)) AS t(pos)
  WHERE LENGTH(text) >= 16
),
wm AS (
  SELECT doc_id, pos, npos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 11 FOLLOWING) AS wmin
  FROM grams
),
fps AS (SELECT DISTINCT doc_id, wmin AS fp FROM wm WHERE pos <= npos - 11)
"""

WINNOW_FP_SQL = WINNOW16_FPS_CTE + """
SELECT doc_id, COUNT(*) AS n_fps, MIN(fp) AS min_fp, MAX(fp) AS max_fp,
       CAST(SUM(fp % 1000003) AS BIGINT) AS sum_fp_mod
FROM fps GROUP BY doc_id
"""

WINNOW_OVERLAP_SQL = WINNOW16_FPS_CTE + """,
rare AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 30),
kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare r USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 4
"""


def repetition_signals_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher duplicate-n-gram repetition signals: per doc, the fraction
    of word 2-grams / 3-grams that repeat an earlier occurrence
    (1 - distinct/total). Complements top_ngram_fraction inside
    gopher_quality_signals (most-frequent-gram variant)."""
    from .operators.quality import duplicate_ngram_fraction

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    d2 = duplicate_ngram_fraction(docs, "doc_id", "text", 2, "dup_2gram_frac")
    d3 = duplicate_ngram_fraction(docs, "doc_id", "text", 3, "dup_3gram_frac")
    return d2.join(d3, "doc_id")


REPETITION_SQL = """
WITH g2 AS (
  SELECT doc_id,
         ARRAY_TO_STRING(LIST_SLICE(toks, CAST(pos AS INT), CAST(pos AS INT) + 1), ' ') AS ng
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
       UNNEST(RANGE(1, GREATEST(LEN(toks) - 2 + 1, 0) + 1)) AS t(pos)
  WHERE LEN(toks) >= 2
),
g3 AS (
  SELECT doc_id,
         ARRAY_TO_STRING(LIST_SLICE(toks, CAST(pos AS INT), CAST(pos AS INT) + 2), ' ') AS ng
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
       UNNEST(RANGE(1, GREATEST(LEN(toks) - 3 + 1, 0) + 1)) AS t(pos)
  WHERE LEN(toks) >= 3
),
d2 AS (SELECT doc_id, 1.0 - CAST(COUNT(DISTINCT ng) AS DOUBLE) / COUNT(*) AS dup_2gram_frac
       FROM g2 GROUP BY doc_id),
d3 AS (SELECT doc_id, 1.0 - CAST(COUNT(DISTINCT ng) AS DOUBLE) / COUNT(*) AS dup_3gram_frac
       FROM g3 GROUP BY doc_id)
SELECT d2.doc_id, dup_2gram_frac, dup_3gram_frac
FROM d2 JOIN d3 ON d2.doc_id = d3.doc_id
"""


def redact_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/pattern scrubbing audit over events.props: per-rule replacement
    counts + md5 of the fully redacted text — the redacted OUTPUT is
    checksummed, so regexp_replace semantics are verified end-to-end, not
    just counts. The fixture corpus carries no synthetic PII, so the
    email/ip/ssn/phone rules legitimately count 0 here (their match
    behavior is unit-tested on synthetic rows in tests/test_redact.py)
    and the digit-run rule does the live replacements."""
    from .operators.redact import DEFAULT_PII_RULES, NUMBER_RULE, redact

    t = load_tables(spark, sf_dir)
    r = redact(
        t["events"], "props", rules=DEFAULT_PII_RULES + [NUMBER_RULE],
        out_col="redacted",
    )
    return r.select(
        "event_id", "n_email", "n_ipv4", "n_ssn", "n_phone", "n_number",
        F.md5(F.col("redacted").cast("binary")).alias("redacted_md5"),
    )


REDACT_SQL = r"""
WITH s0 AS (SELECT event_id, props AS t FROM events),
s1 AS (SELECT event_id,
              LEN(REGEXP_EXTRACT_ALL(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
              REGEXP_REPLACE(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
       FROM s0),
s2 AS (SELECT event_id, n_email,
              LEN(REGEXP_EXTRACT_ALL(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ipv4,
              REGEXP_REPLACE(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS t
       FROM s1),
s3 AS (SELECT event_id, n_email, n_ipv4,
              LEN(REGEXP_EXTRACT_ALL(t, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS n_ssn,
              REGEXP_REPLACE(t, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS t
       FROM s2),
s4 AS (SELECT event_id, n_email, n_ipv4, n_ssn,
              LEN(REGEXP_EXTRACT_ALL(t, '\+?[0-9][0-9()\-. ]{7,}[0-9]')) AS n_phone,
              REGEXP_REPLACE(t, '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS t
       FROM s3),
s5 AS (SELECT event_id, n_email, n_ipv4, n_ssn, n_phone,
              LEN(REGEXP_EXTRACT_ALL(t, '[0-9]+')) AS n_number,
              REGEXP_REPLACE(t, '[0-9]+', '<NUM>', 'g') AS t
       FROM s4)
SELECT event_id, CAST(n_email AS INT) AS n_email, CAST(n_ipv4 AS INT) AS n_ipv4,
       CAST(n_ssn AS INT) AS n_ssn, CAST(n_phone AS INT) AS n_phone,
       CAST(n_number AS INT) AS n_number, MD5(t) AS redacted_md5
FROM s5
"""


def zorder_layout_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (o_custkey, o_totalprice) +
    per-bucket min/max locality statistics — the file-level stats a
    lakehouse reader prunes on after OPTIMIZE ZORDER BY. The interleave
    is pure shift/mask/or codegen, oracle-checked bit-for-bit — which
    requires quantizer="exact" (percent_rank is ANSI-reproducible; the
    KLL sampled-quantile map is not). Production writes use the DEFAULT
    quantizer="approx" scale path — no global window — whose locality
    equivalence is pinned in tests/test_layout.py (VERDICT r5 #2)."""
    from .operators.layout import zorder_bucket_stats

    t = load_tables(spark, sf_dir)
    o = t["orders"].select("o_custkey", "o_totalprice")
    return zorder_bucket_stats(
        o, ["o_custkey", "o_totalprice"], bits=16, bucket_bits=5,
        quantizer="exact",
    )


def _zorder_interleave_sql(qcols: list[str], bits: int) -> str:
    ncols = len(qcols)
    terms = [
        f"((({q} >> {i}) & 1) << {i * ncols + j})"
        for j, q in enumerate(qcols)
        for i in range(bits)
    ]
    return " | ".join(terms)


ZORDER_SQL = f"""
WITH q AS (
  SELECT o_custkey, o_totalprice,
         CAST(LEAST(FLOOR(PERCENT_RANK() OVER (ORDER BY o_custkey) * 65536), 65535) AS BIGINT) AS q0,
         CAST(LEAST(FLOOR(PERCENT_RANK() OVER (ORDER BY o_totalprice) * 65536), 65535) AS BIGINT) AS q1
  FROM orders
),
z AS (SELECT o_custkey, o_totalprice,
             {_zorder_interleave_sql(['q0', 'q1'], 16)} AS zval
      FROM q)
SELECT CAST(zval >> 27 AS INT) AS bucket, COUNT(*) AS n_rows,
       MIN(o_custkey) AS min_o_custkey, MAX(o_custkey) AS max_o_custkey,
       MIN(o_totalprice) AS min_o_totalprice, MAX(o_totalprice) AS max_o_totalprice
FROM z GROUP BY 1
"""


def hilbert_layout_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over (o_custkey, o_totalprice) +
    per-bucket min/max locality statistics (operators/layout.py::
    hilbert_bucket_stats) — the locality-optimal sibling of
    zorder_layout_orders (successive Hilbert indices are always
    grid-adjacent; Morton's Z-jumps are what it removes). The iterative
    reflect+swap walk is integer shift/xor/case codegen, unrolled one
    projection per bit; the oracle replays the identical 16 steps as
    chained CTEs. quantizer="exact" for the oracle (ANSI percent_rank);
    production uses the default KLL sampled-quantile map, locality
    equivalence pinned in tests/test_redact_layout.py."""
    from .operators.layout import hilbert_bucket_stats

    t = load_tables(spark, sf_dir)
    o = t["orders"].select("o_custkey", "o_totalprice")
    return hilbert_bucket_stats(
        o, ["o_custkey", "o_totalprice"], bits=16, bucket_bits=5,
        quantizer="exact",
    )


def _hilbert_steps_sql(bits: int) -> str:
    """The xy→d walk as chained CTEs s{bits-1}..s0 (one per bit),
    mirroring layout.hilbert_fixed step for step."""
    ctes = []
    prev = "h0"
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"((x >> {i}) & 1)"
        ry = f"((y >> {i}) & 1)"
        ctes.append(
            f"s{i} AS (SELECT o_custkey, o_totalprice,\n"
            f"  CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {s - 1} - y ELSE y END) ELSE x END AS x,\n"
            f"  CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {s - 1} - x ELSE x END) ELSE y END AS y,\n"
            f"  d + {s * s} * xor(3 * {rx}, {ry}) AS d\n"
            f"  FROM {prev})"
        )
        prev = f"s{i}"
    return ",\n".join(ctes)


HILBERT_SQL = f"""
WITH q AS (
  SELECT o_custkey, o_totalprice,
         CAST(LEAST(FLOOR(PERCENT_RANK() OVER (ORDER BY o_custkey) * 65536), 65535) AS BIGINT) AS q0,
         CAST(LEAST(FLOOR(PERCENT_RANK() OVER (ORDER BY o_totalprice) * 65536), 65535) AS BIGINT) AS q1
  FROM orders
),
h0 AS (SELECT o_custkey, o_totalprice, q0 AS x, q1 AS y,
              CAST(0 AS BIGINT) AS d FROM q),
{_hilbert_steps_sql(16)}
SELECT CAST(d >> 27 AS INT) AS bucket, COUNT(*) AS n_rows,
       MIN(o_custkey) AS min_o_custkey, MAX(o_custkey) AS max_o_custkey,
       MIN(o_totalprice) AS min_o_totalprice, MAX(o_totalprice) AS max_o_totalprice
FROM s0 GROUP BY 1
"""


def chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide boilerplate removal (CCNet/RefinedWeb line-dedup
    semantics on fixed 10-token chunks — the fixture text is single-line,
    so the deterministic chunk grid replaces newline splitting). Chunks
    appearing verbatim in >1 document are dropped; the reassembled
    document is md5-verified end-to-end against the oracle."""
    from .operators.boilerplate import chunk_dedup_stats

    t = load_tables(spark, sf_dir)
    return chunk_dedup_stats(
        t["documents"], "doc_id", "text", chunk_tokens=10, max_docs=1
    )


CHUNK_DEDUP_SQL = """
WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
chunks AS (
  SELECT doc_id, CAST(pos AS INT) AS pos,
         ARRAY_TO_STRING(
           LIST_SLICE(t, CAST(pos * 10 + 1 AS INT), CAST(pos * 10 + 10 AS INT)),
           ' ') AS chunk
  FROM toks, UNNEST(RANGE(0, CAST(CEIL(LEN(t) / 10.0) AS BIGINT))) AS u(pos)
),
freq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY chunk),
flagged AS (
  SELECT c.doc_id, c.pos, c.chunk, f.nd > 1 AS dup
  FROM chunks c JOIN freq f USING (chunk)
)
SELECT doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       MD5(COALESCE(STRING_AGG(chunk, ' ' ORDER BY pos)
                      FILTER (WHERE NOT dup), '')) AS clean_md5
FROM flagged GROUP BY doc_id
"""


def unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram-LM quality score per document (CCNet
    perplexity-proxy shape): avg token negative log-likelihood under
    p(tok)=count/total fitted on the corpus itself."""
    from .operators.quality import unigram_logprob

    t = load_tables(spark, sf_dir)
    return unigram_logprob(t["documents"], "doc_id", "text")


def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-k-smoothed bigram-LM quality score per document
    (operators/quality.py::bigram_logprob): the sequence-probability
    rung above unigram_lm_quality — flags improbable word ORDER, not
    just rare vocabulary. Textbook add-k conditional
    p(b|a) = (c(a b)+k)/(c(a)+k·V), k=0.5, V = corpus vocabulary;
    score = mean bigram NLL. The operator predates this round but was
    never registered — this entry wires it to the correctness gate."""
    from .operators.quality import bigram_logprob

    t = load_tables(spark, sf_dir)
    return bigram_logprob(t["documents"], "doc_id", "text", k_smooth=0.5)


BIGRAM_LM_SQL = """
WITH wl AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT doc_id,
         w[CAST(p AS INT)] || ' ' || w[CAST(p AS INT) + 1] AS bgm,
         w[CAST(p AS INT)] AS ctx
  FROM wl, UNNEST(range(1, GREATEST(len(w) - 1, 0) + 1)) AS r(p)
),
bc AS (SELECT bgm, COUNT(*) AS bc FROM bg GROUP BY 1),
uc AS (SELECT tk, COUNT(*) AS ca
       FROM (SELECT UNNEST(string_split(text, ' ')) AS tk FROM documents)
       GROUP BY 1),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uc)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(-LN((bc.bc + 0.5) / (uc.ca + 0.5 * v.v))), 6) AS avg_nll
FROM bg JOIN bc USING (bgm) JOIN uc ON uc.tk = bg.ctx CROSS JOIN v
GROUP BY doc_id
"""


def kn_bigram_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram-LM quality score per document
    (operators/quality.py::kneser_ney_logprob — Kneser & Ney 1995,
    Chen & Goodman 1999 eq. 4.25): the production-grade smoothing of
    the KenLM family next to bigram_lm_quality's add-k.  Absolute
    discount 0.75, continuation probability from distinct-context
    counts; every term is pure count arithmetic replayed by the SQL
    oracle in the identical double association order, round-6 ln-ulp
    posture."""
    from .operators.quality import kneser_ney_logprob

    t = load_tables(spark, sf_dir)
    return kneser_ney_logprob(t["documents"], "doc_id", "text")


# shared KN per-doc CTE block: kn_bigram_quality_docs reads it raw;
# perplexity_buckets_docs layers the CCNet tercile window on top
_KN_CTES = """wl AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT doc_id,
         w[CAST(p AS INT)] || ' ' || w[CAST(p AS INT) + 1] AS bgm,
         w[CAST(p AS INT)] AS ctx,
         w[CAST(p AS INT) + 1] AS nxt
  FROM wl, UNNEST(range(1, GREATEST(len(w) - 1, 0) + 1)) AS r(p)
),
bc AS (SELECT bgm, ANY_VALUE(ctx) AS ctx, ANY_VALUE(nxt) AS nxt,
              COUNT(*) AS cab
       FROM bg GROUP BY bgm),
uc AS (SELECT tk, COUNT(*) AS ca
       FROM (SELECT UNNEST(string_split(text, ' ')) AS tk FROM documents)
       GROUP BY 1),
n1f AS (SELECT ctx, COUNT(*) AS n1f FROM bc GROUP BY 1),
n1b AS (SELECT nxt, COUNT(*) AS n1b FROM bc GROUP BY 1),
t AS (SELECT COUNT(*) AS t FROM bc),
kn AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         ROUND(AVG(-LN(
           (GREATEST(CAST(bc.cab AS DOUBLE) - CAST(0.75 AS DOUBLE),
                     CAST(0.0 AS DOUBLE))
            + CAST(0.75 AS DOUBLE) * n1f.n1f * (n1b.n1b / t.t))
           / uc.ca)), 6) AS avg_nll
  FROM bg
  JOIN bc USING (bgm)
  JOIN uc ON uc.tk = bg.ctx
  JOIN n1f ON n1f.ctx = bg.ctx
  JOIN n1b ON n1b.nxt = bg.nxt
  CROSS JOIN t
  GROUP BY doc_id
)"""

KN_BIGRAM_SQL = f"""
WITH {_KN_CTES}
SELECT doc_id, n_bigrams, avg_nll FROM kn
"""

PERPLEXITY_BUCKETS_SQL = f"""
WITH {_KN_CTES},
scored AS (
  SELECT d.source, k.doc_id, k.avg_nll
  FROM kn k JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT source, avg_nll,
         NTILE(3) OVER (PARTITION BY source
                        ORDER BY avg_nll, doc_id) AS b
  FROM scored
)
SELECT source,
       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
              ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs,
       ROUND(MIN(avg_nll), 6) AS min_nll,
       ROUND(MAX(avg_nll), 6) AS max_nll,
       ROUND(AVG(avg_nll), 6) AS mean_nll
FROM ranked
GROUP BY source, b
"""


def perplexity_buckets_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity partitioning (operators/quality.py::
    perplexity_buckets — Wenzek et al. 2020 §4.3): per-source
    head/middle/tail terciles over the Kneser-Ney document scores,
    the canonical keep/downsample/drop decision step of a pretrain
    mix.  Deterministic ntile over (round-6 avg_nll, doc_id); one row
    per (source, bucket) with count and nll envelope, EXACT vs the
    windowed SQL oracle sharing the KN CTE block."""
    from .operators.quality import perplexity_buckets

    t = load_tables(spark, sf_dir)
    return perplexity_buckets(t["documents"], "doc_id", "text", "source")


UNIGRAM_LM_SQL = """
WITH tok AS (
  SELECT doc_id, tk
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tk FROM documents)
),
cnt AS (SELECT tk, COUNT(*) AS c FROM tok GROUP BY tk),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cnt)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(AVG(LN(n) - LN(CAST(c AS DOUBLE))), 6) AS avg_nll
FROM tok JOIN cnt USING (tk) CROSS JOIN tot
GROUP BY doc_id
"""


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain parquet (operators/merge.py): a
    deterministic changeset (10% price updates + synthetic inserts keyed
    o_orderkey+10M) merged into orders — source wins on match, unmatched
    target rows survive. The anti-join+union plan is the logical core of
    a lakehouse copy-on-write MERGE."""
    from .operators.merge import merge_upsert

    t = load_tables(spark, sf_dir)
    o = t["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    inserts = o.where(F.col("o_orderkey") % 100 == 7).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    return merge_upsert(o, updates.unionByName(inserts), ["o_orderkey"])


MERGE_UPSERT_SQL = """
WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
src AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice
  FROM o WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice
  FROM o WHERE o_orderkey % 100 = 7
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM src
UNION ALL
SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice
FROM o t
WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
"""


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC classification between two snapshots of orders: the new
    snapshot re-prices 10% of keys, deletes keys % 100 == 13 and inserts
    keys+10M — the diff returns every non-unchanged key with its class
    and new values, via one full-outer join (operators/merge.py)."""
    from .operators.merge import snapshot_diff

    t = load_tables(spark, sf_dir)
    o = t["orders"]
    old = o.select("o_orderkey", "o_totalprice", "o_orderstatus")
    modified = o.where(F.col("o_orderkey") % 100 != 13).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") * 1.1)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("U"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    inserted = o.where(F.col("o_orderkey") % 100 == 7).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_totalprice",
        F.lit("N").alias("o_orderstatus"),
    )
    new = modified.unionByName(inserted)
    d = snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return d.where(F.col("change_type") != "unchanged")


SNAPSHOT_DIFF_SQL = """
WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
newv AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 10 = 0 THEN 'U'
              ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 100 <> 13
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, 'N'
  FROM orders WHERE o_orderkey % 100 = 7
),
d AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
              WHEN n.o_orderkey IS NULL THEN 'deleted'
              WHEN (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
                OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                THEN 'updated'
              ELSE 'unchanged' END AS change_type,
         n.o_totalprice AS new_o_totalprice,
         n.o_orderstatus AS new_o_orderstatus
  FROM old o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey
)
SELECT * FROM d WHERE change_type <> 'unchanged'
"""


def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of each user's event_type: consecutive same-type
    events collapse into validity intervals [valid_from, valid_to); the
    open current interval carries valid_to_us = -1 (sentinel instead of
    NULL so the column stays int64 in both engines — nullable BIGINT
    round-trips to float64 in pandas and would dtype-mismatch)."""
    from .operators.merge import scd2_history

    t = load_tables(spark, sf_dir)
    h = scd2_history(t["events"], "user_id", "ts", "event_id", "event_type")
    return h.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.coalesce(F.unix_micros("valid_to"), F.lit(-1)).alias("valid_to_us"),
        "is_current",
    )


SCD2_SQL = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
chg AS (
  SELECT user_id, event_type, ts, event_id
  FROM e WHERE rn = 1 OR event_type IS DISTINCT FROM prev
),
v AS (
  SELECT user_id, event_type, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM chg
)
SELECT user_id, event_type, EPOCH_US(ts) AS valid_from_us,
       COALESCE(EPOCH_US(nxt), -1) AS valid_to_us,
       nxt IS NULL AS is_current
FROM v
"""


def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion funnel per user: first time
    reaching each stage strictly after the previous stage's time, and
    the deepest stage reached (operators/funnel.py). Unreached stage
    times carry the -1 sentinel (nullable BIGINT pandas-roundtrips to
    float64 and would dtype-mismatch the oracle)."""
    from .operators.funnel import funnel_stages

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    f = funnel_stages(ev, "user_id", "event_type", "us",
                      ["view", "click", "purchase"])
    return f.select(
        "user_id",
        "reached",
        F.col("t_view").alias("t_view_us"),
        F.coalesce(F.col("t_click"), F.lit(-1)).alias("t_click_us"),
        F.coalesce(F.col("t_purchase"), F.lit(-1)).alias("t_purchase_us"),
    )


FUNNEL_SQL = """
WITH ev AS (SELECT user_id, event_type AS t, EPOCH_US(ts) AS us FROM events),
s1 AS (SELECT user_id, MIN(us) AS t_view FROM ev WHERE t = 'view'
       GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(us) AS t_click
       FROM ev e JOIN s1 USING (user_id)
       WHERE t = 'click' AND us > t_view GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(us) AS t_purchase
       FROM ev e JOIN s2 USING (user_id)
       WHERE t = 'purchase' AND us > t_click GROUP BY e.user_id)
SELECT s1.user_id,
       CAST(1 + CAST(t_click IS NOT NULL AS INT)
              + CAST(t_purchase IS NOT NULL AS INT) AS INT) AS reached,
       t_view AS t_view_us,
       COALESCE(t_click, -1) AS t_click_us,
       COALESCE(t_purchase, -1) AS t_purchase_us
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


def resample_locf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample of per-user event value onto a gap-free calendar
    spine with last-observation-carried-forward fill
    (operators/timeseries.py) — the hypertable-rollup / time-series
    densification shape."""
    from .operators.timeseries import resample_locf

    t = load_tables(spark, sf_dir)
    return resample_locf(t["events"], "user_id", "ts", "value")


RESAMPLE_LOCF_SQL = """
WITH daily AS (
  SELECT user_id,
         CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT) AS day,
         CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(18,3))) AS DOUBLE) AS dv
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
           FROM daily GROUP BY user_id),
spine AS (
  SELECT user_id, CAST(d AS INT) AS day
  FROM bounds, UNNEST(RANGE(d0, d1 + 1)) AS u(d)
),
j AS (SELECT s.user_id, s.day, d.dv
      FROM spine s LEFT JOIN daily d USING (user_id, day))
SELECT user_id, day,
       LAST_VALUE(dv IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       dv IS NULL AS filled
FROM j
"""


def corr_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per return flag: Pearson correlation and
    sample stddevs of (l_quantity, l_extendedprice). Rounded to 6
    decimals — both engines use one-pass co-moment accumulation whose
    partition-order float drift sits far below 1e-6."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
        )
    )


CORR_STATS_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
       ROUND(STDDEV_SAMP(l_extendedprice), 6) AS sd_price
FROM lineitem GROUP BY l_returnflag
"""


def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the week of
    their first event; each (cohort_week, weeks_since) cell counts the
    cohort's users active that week. Two user-keyed aggregations + one
    user-keyed join — the classic retention shape, no window over the
    whole event stream. Weeks are 7-day buckets of days-since-epoch
    (engine-independent, no WEEK() locale semantics)."""
    t = load_tables(spark, sf_dir)
    week = F.floor(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) / 7
    ).cast("int")
    ev = t["events"].select("user_id", week.alias("week"))
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


COHORT_RETENTION_SQL = """
WITH ev AS (
  SELECT user_id,
         CAST(FLOOR(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7)
              AS INT) AS week
  FROM events
),
first AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, week FROM ev)
SELECT cohort_week, CAST(week - cohort_week AS INT) AS weeks_since,
       COUNT(DISTINCT user_id) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY 1, 2
"""


def rolling_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing moving average of each user's daily event value —
    a RANGE-framed window over the (possibly gappy) daily series, so a
    day with no activity in the trailing week genuinely shrinks the
    frame (RANGE, not ROWS). Daily sums are DECIMAL(18,3) for
    order-independence; the average divides decimal sums by an exact
    integer count, then rounds to 6."""
    t = load_tables(spark, sf_dir)
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    daily = (
        t["events"]
        .select("user_id", day.alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(
            F.sum(F.round("value", 3).cast("decimal(18,3)")).alias("__dv")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        F.col("__dv").cast("double").alias("day_value"),
        F.round(
            (F.sum("__dv").over(w) / F.count(F.lit(1)).over(w)).cast("double"),
            6,
        ).alias("avg_7d"),
    )


ROLLING_AVG_SQL = """
WITH daily AS (
  SELECT user_id,
         CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT) AS day,
         SUM(CAST(ROUND(value, 3) AS DECIMAL(18,3))) AS dv
  FROM events GROUP BY 1, 2
)
SELECT user_id, day, CAST(dv AS DOUBLE) AS day_value,
       ROUND(CAST(SUM(dv) OVER w / COUNT(*) OVER w AS DOUBLE), 6) AS avg_7d
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (d=0.85, 10 fixed iterations) over the
    inter-nation trade graph: edge supplier-nation → customer-nation
    weighted by lineitem revenue. Fixed iteration count keeps the
    recurrence a deterministic dataflow, oracle-checked against an
    unrolled 10-step SQL CTE chain (DuckDB's recursive CTEs disallow
    the per-step aggregation). The edge list is localCheckpointed so
    the 10 lazy iterations don't re-derive the 4-table join per
    reference (the connected-components lineage lesson) — hence
    EAGER_QUERIES membership."""
    from .operators.pagerank import pagerank

    t = load_tables(spark, sf_dir)
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    edges = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "w"
            )
        )
    )
    from .operators.dedup import register_ckpt

    # ledger-registered (ADVICE r14 #2): previously stranded to the
    # async ContextCleaner; bench releases it when the line completes
    edges = register_ckpt(edges.localCheckpoint())
    # checkpoint_interval=5 (r15): with verts/trans checkpointed, a
    # wider interval only deepens an executed-once lazy chain — each
    # iteration references the previous rank exactly once — while
    # cutting the eager per-iteration checkpoint jobs from 9 to 1
    # (alternating A/B at sf0.1: interval 1 = 6.9-13.2 s, interval 5 =
    # 5.4-6.1 s). Materialization points move, arithmetic is unchanged
    # (tests/test_pagerank.py pins ckpt-vs-lazy equality at 1e-12;
    # oracle re-verified EXACT at sf0.001/0.01/0.1).
    pr = pagerank(edges, "src", "dst", "w", damping=0.85, iterations=10,
                  checkpoint_interval=5)
    return pr.select(
        F.col("vertex").alias("nationkey"), F.round("rank", 6).alias("rank")
    )


def _pagerank_sql(iterations: int, damping: float) -> str:
    steps = []
    prev = "pr0"
    for i in range(1, iterations + 1):
        cur = f"pr{i}"
        steps.append(f"""{cur} AS (
  SELECT v.vertex,
         (1 - {damping}) / n.n + {damping} * COALESCE(c.contrib, 0.0) AS rank
  FROM verts v CROSS JOIN n
  LEFT JOIN (
    SELECT t.dst AS vertex, SUM(t.p * p.rank) AS contrib
    FROM trans t JOIN {prev} p ON t.src = p.vertex
    GROUP BY t.dst
  ) c ON c.vertex = v.vertex
)""")
        prev = cur
    return f"""
WITH edges AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         SUM(l.l_extendedprice * (1 - l.l_discount)) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
verts AS (SELECT src AS vertex FROM edges UNION SELECT dst FROM edges),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
trans AS (SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM edges),
pr0 AS (SELECT vertex, 1.0 / n.n AS rank FROM verts CROSS JOIN n),
{",".join(steps)}
SELECT vertex AS nationkey, ROUND(rank, 6) AS rank FROM {prev}
"""


PAGERANK_SQL = _pagerank_sql(10, 0.85)


def window_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window function suite over each customer's orders in one
    pass (one sort serves every function): row_number, ntile(4),
    percent_rank, cume_dist, lag/lead of the price. Deterministic total
    order via the (price DESC, orderkey) tiebreak."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    t = load_tables(spark, sf_dir)
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


WINDOW_FUNCS_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(ROW_NUMBER() OVER w AS INT) AS rn,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit of the orders/lineitem pair in two plans: one
    aggregation for row/null/duplicate-key metrics, one anti-join for
    lineitem→orders referential orphans (operators/dq.py). Fixture data
    is clean, so the audit's zeros ARE the assertion; violation
    semantics are unit-tested on planted dirty rows."""
    from .operators.dq import dq_metrics, orphan_count

    t = load_tables(spark, sf_dir)
    m = dq_metrics(
        t["orders"], ["o_orderkey"], ["o_custkey", "o_orderdate"]
    )
    orph = orphan_count(t["lineitem"], t["orders"], "l_orderkey", "o_orderkey")
    return m.crossJoin(F.broadcast(orph)).select(
        "n_rows",
        "n_dup_key",
        "n_null_o_custkey",
        "n_null_o_orderdate",
        F.col("n_orphans").alias("n_orphan_lineitems"),
    )


DQ_AUDIT_SQL = """
WITH m AS (
  SELECT COUNT(*) AS n_rows,
         CAST(COUNT(*) - COUNT(DISTINCT ROW(o_orderkey)) AS BIGINT) AS n_dup_key,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_o_custkey,
         CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_o_orderdate
  FROM orders
),
orph AS (
  SELECT COUNT(*) AS n_orphan_lineitems
  FROM lineitem l
  WHERE l.l_orderkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey)
)
SELECT n_rows, n_dup_key, n_null_o_custkey, n_null_o_orderdate,
       n_orphan_lineitems
FROM m CROSS JOIN orph
"""


def hll_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY as a query — the property the built-in
    approx_count_distinct cannot offer (sketch/hll.py docstring): one
    distributed pass builds a distinct-token sketch PER SOURCE
    (the bounded-memory grouped two-level mapInPandas fold of
    hll_by_group — per-partition group slices, never a whole group on
    one worker; ADVICE r5 #4), the driver max-merges the ~16 KiB
    register arrays, and the merged estimate is gated against the
    exact corpus-wide distinct-token count — the union was never
    recomputed from data.  Per-source rows gate their own estimates
    the same way; exact comparators come from ONE unioned aggregate
    action.  Built in md5-compat mode (60-bit values from the first 15
    md5 hex chars), so the SQL oracle replays every register (index =
    top 14 bits, rank = 47 − bit_length of the 46-bit tail) and both
    the per-source AND merged-union ESTIMATES hash-match."""
    from .sketch.hll import HyperLogLog, hll_by_group

    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "source",
        F.explode(F.split("text", " ")).alias("tok"),
    )
    per_source = hll_by_group(toks, "source", ["tok"], hash_fn="md5")
    merged = HyperLogLog(14, 60)
    for s in per_source.values():
        merged = merged.merge(s)
    # exact distincts (per source + corpus) in one action
    exact_rows = (
        toks.groupBy("source").agg(F.countDistinct("tok").alias("n"))
        .unionByName(
            toks.agg(F.countDistinct("tok").alias("n"))
            .select(F.lit("__union__").alias("source"), "n")
        )
        .collect()
    )
    exact = {r["source"]: int(r["n"]) for r in exact_rows}
    rows = []
    # NULL groups survive as key None (ADVICE r6 #2); sort them first so
    # a mixed None/str key set never hits TypeError (ADVICE r7 #1).
    for name in _null_first(per_source) + ["__union__"]:
        est = (merged if name == "__union__" else per_source[name]).estimate()
        ex = exact[name]
        rows.append((name, float(est), ex, float(abs(est - ex) / ex)))
    out = spark.createDataFrame(
        rows, "source string, hll_estimate double, exact bigint, rel_err double"
    )
    # round IN-PLAN (KLL r13 lesson: Python round() rounds the true
    # binary value, Spark/DuckDB ROUND the shortest-decimal HALF_UP —
    # a .x5 estimate would flip sides) and gate on the rounded value,
    # matching the oracle's WHERE exactly
    return out.select(
        "source",
        F.round("hll_estimate", 1).alias("hll_estimate"),
        "exact",
        F.round("rel_err", 6).alias("rel_err"),
    ).where(F.col("rel_err") < 0.025)  # 3-sigma p=14 bound


def hll_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog distinct counts (sketch/hll.py — the
    distinct-count companion to the reference's getCMS) next to the
    exact answers: one row per audited key with the HLL estimate and
    relative error.  md5-compat mode (VERDICT r7 direction: the
    theta/CMS/Bloom SQL-replay idiom applied to HLL): the oracle
    rebuilds all 16384 registers per probe and replays the harmonic
    estimate + linear-counting branch, so the ESTIMATE hash-matches —
    no longer rows-only.  The p=14 error bound (|err| < 2.5%, 3 sigma)
    stays pinned here AND in tests/test_hll.py. Sketch builds are
    eager (driver folds 16 KiB register arrays) → EAGER_QUERIES."""
    from .sketch.hll import hll_from_dataframe

    t = load_tables(spark, sf_dir)
    probes = [
        ("orders.o_custkey", t["orders"], ["o_custkey"]),
        ("lineitem.l_partkey", t["lineitem"], ["l_partkey"]),
        ("lineitem.l_suppkey", t["lineitem"], ["l_suppkey"]),
    ]
    # exact comparators in ONE action: a multi-distinct aggregate per
    # table unioned into a single 3-row job (VERDICT r4 #8 — the old
    # form ran one full countDistinct job per probe)
    def _exact():
        return (
            t["orders"]
            .agg(F.countDistinct("o_custkey").alias("n"))
            .select(F.lit("orders.o_custkey").alias("key"), "n")
            .unionByName(
                t["lineitem"]
                .agg(
                    F.countDistinct("l_partkey").alias("np"),
                    F.countDistinct("l_suppkey").alias("ns"),
                )
                .select(
                    F.explode(
                        F.map_from_arrays(
                            F.array(
                                F.lit("lineitem.l_partkey"),
                                F.lit("lineitem.l_suppkey"),
                            ),
                            F.array("np", "ns"),
                        )
                    ).alias("key", "n")
                )
            )
            .collect()
        )

    exact_rows = _exact()
    exact_by_key = {r["key"]: int(r["n"]) for r in exact_rows}
    rows = []
    for name, df, cols in probes:
        est = hll_from_dataframe(df, cols, hash_fn="md5").estimate()
        exact = exact_by_key[name]
        rows.append((name, float(est), int(exact),
                     float(abs(est - exact) / exact)))
    out = spark.createDataFrame(
        rows, "key string, hll_estimate double, exact bigint, rel_err double"
    )
    # round IN-PLAN + gate on the rounded value (the KLL r13 lesson)
    return out.select(
        "key",
        F.round("hll_estimate", 1).alias("hll_estimate"),
        "exact",
        F.round("rel_err", 6).alias("rel_err"),
    ).where(F.col("rel_err") < 0.025)  # 3-sigma bound enforced


def _hll_md5_est_sql(key_sql: str, from_sql: str) -> str:
    """DuckDB scalar subquery: the p=14 md5-compat HLL estimate of
    DISTINCT ``key_sql`` over ``from_sql`` — registers (index = top 14
    bits, rank = 47 − bit_length(46-bit tail), exact via bin(), no
    float log) then the harmonic estimate with the linear-counting
    branch, the exact arithmetic of HyperLogLog.estimate()."""
    return f"""(
  WITH __ks AS (SELECT DISTINCT CAST({key_sql} AS VARCHAR) AS k
                FROM {from_sql}),
  __hv AS (SELECT CAST(('0x' || SUBSTRING(MD5(k), 1, 15)) AS BIGINT) AS h
           FROM __ks),
  __regs AS (
    SELECT h >> 46 AS idx,
           MAX(CASE WHEN (h & 70368744177663) = 0 THEN 47
                    ELSE 47 - length(bin(h & 70368744177663)) END) AS r
    FROM __hv GROUP BY 1
  ),
  __agg AS (
    SELECT 16384 - COUNT(*) AS zeros,
           (0.7213 / (1 + 1.079 / 16384.0)) * 16384.0 * 16384.0
             / ((16384 - COUNT(*)) * 1.0 + SUM(POWER(2.0, -r))) AS raw
    FROM __regs
  )
  SELECT CASE WHEN raw <= 2.5 * 16384 AND zeros > 0
              THEN 16384.0 * LN(16384.0 / zeros) ELSE raw END
  FROM __agg
)"""


_HLL_PROBES_SQL = " UNION ALL ".join(
    f"""SELECT '{name}' AS key,
       ROUND({_hll_md5_est_sql(col, tbl)}, 1) AS hll_estimate,
       CAST((SELECT COUNT(DISTINCT {col}) FROM {tbl}) AS BIGINT) AS exact,
       ROUND(ABS({_hll_md5_est_sql(col, tbl)}
                 - (SELECT COUNT(DISTINCT {col}) FROM {tbl}))
             / (SELECT COUNT(DISTINCT {col}) FROM {tbl}), 6) AS rel_err"""
    for name, tbl, col in [
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ]
)

HLL_DISTINCT_SQL = f"""
SELECT * FROM ({_HLL_PROBES_SQL}) WHERE rel_err < 0.025
"""


HLL_UNION_SQL = """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
keys AS (SELECT DISTINCT source, tok FROM toks),
hv AS (
  SELECT source,
         CAST(('0x' || SUBSTRING(MD5(tok), 1, 15)) AS BIGINT) AS h
  FROM keys
),
branches AS (
  SELECT source AS grp, h FROM hv
  UNION ALL
  SELECT '__union__' AS grp, h FROM (SELECT DISTINCT h FROM hv)
),
regs AS (
  SELECT grp, h >> 46 AS idx,
         MAX(CASE WHEN (h & 70368744177663) = 0 THEN 47
                  ELSE 47 - length(bin(h & 70368744177663)) END) AS r
  FROM branches GROUP BY 1, 2
),
agg AS (
  SELECT grp, 16384 - COUNT(*) AS zeros,
         (0.7213 / (1 + 1.079 / 16384.0)) * 16384.0 * 16384.0
           / ((16384 - COUNT(*)) * 1.0 + SUM(POWER(2.0, -r))) AS raw
  FROM regs GROUP BY 1
),
est AS (
  SELECT grp,
         CASE WHEN raw <= 2.5 * 16384 AND zeros > 0
              THEN 16384.0 * LN(16384.0 / zeros) ELSE raw END AS e
  FROM agg
),
ex AS (
  SELECT source AS grp, COUNT(DISTINCT tok) AS n FROM toks GROUP BY 1
  UNION ALL
  SELECT '__union__', COUNT(DISTINCT tok) FROM toks
)
SELECT grp AS source, ROUND(e.e, 1) AS hll_estimate,
       CAST(x.n AS BIGINT) AS exact,
       ROUND(ABS(e.e - x.n) / x.n, 6) AS rel_err
FROM est e JOIN ex x USING (grp)
WHERE ROUND(ABS(e.e - x.n) / x.n, 6) < 0.025
"""


def ivm_refresh_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/ivm.py): the standing
    per-priority rollup of pre-1996 orders folds in the 1996+ delta by
    monoid merge of (count, decimal sum) states — no historical rescan.
    The merged result must equal a from-scratch GROUP BY over the whole
    table, which is exactly what the oracle computes."""
    from .operators.ivm import agg_state, merge_agg_states

    t = load_tables(spark, sf_dir)
    o = t["orders"]
    cut = F.lit("1996-01-01").cast("timestamp")
    base = agg_state(
        o.where(F.col("o_orderdate") < cut), ["o_orderpriority"],
        "o_totalprice",
    )
    delta = agg_state(
        o.where(F.col("o_orderdate") >= cut), ["o_orderpriority"],
        "o_totalprice",
    )
    merged = merge_agg_states(base, delta, ["o_orderpriority"])
    return merged.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.col("s").cast("double").alias("sum_price"),
        # divide as DOUBLE: decimal-division scale/rounding rules differ
        # between engines; double / bigint is the same IEEE op in both
        (F.col("s").cast("double") / F.col("n")).alias("avg_price"),
    )


IVM_REFRESH_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_price
FROM orders GROUP BY o_orderpriority
"""


def outlier_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier audit: group stats (mean/std of
    l_extendedprice per return flag) broadcast back onto the rows, rows
    beyond 3 sigma counted. Two-pass shape — the stats aggregation is
    tiny and broadcasts, the row pass is one scan; identical double
    arithmetic in both engines (population std via sqrt(E[x²]−mean²)
    would be the fragile path — stddev_pop is computed by both engines
    with one-pass co-moments whose drift sits far below the rounding)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("l_extendedprice").alias("__mean"),
        F.stddev_pop("l_extendedprice").alias("__std"),
    )
    joined = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(stats), "l_returnflag"
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.first("n").alias("n"),
            F.round(F.first("__mean"), 6).alias("mean_price"),
            F.round(F.first("__std"), 6).alias("std_price"),
            F.sum(
                (
                    F.abs(F.col("l_extendedprice") - F.col("__mean"))
                    > 3 * F.col("__std")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


OUTLIER_STATS_SQL = """
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n, AVG(l_extendedprice) AS m,
         STDDEV_POP(l_extendedprice) AS sd
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag, MIN(s.n) AS n,
       ROUND(MIN(s.m), 6) AS mean_price,
       ROUND(MIN(s.sd), 6) AS std_price,
       CAST(SUM(CASE WHEN ABS(l.l_extendedprice - s.m) > 3 * s.sd
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM lineitem l JOIN s USING (l_returnflag)
GROUP BY l.l_returnflag
"""


def quantize_embeddings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization audit (operators/quantize.py): scale,
    code checksum, and worst-dimension reconstruction error — the 4×
    storage scale path for the embedding store, hash-checked UNROUNDED
    (every step is the same IEEE op in both engines)."""
    from .operators.quantize import quantize_audit

    t = load_tables(spark, sf_dir)
    return quantize_audit(t["embeddings"], "vec_id", "embedding")


QUANTIZE_SQL = """
WITH v AS (
  SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, e,
         LIST_MAX(LIST_TRANSFORM(e, x -> ABS(x))) / 127.0 AS scale
  FROM v
)
SELECT vec_id, CAST(LEN(e) AS INT) AS n_dims, scale,
       CASE WHEN scale = 0 THEN 0
            ELSE CAST(LIST_SUM(LIST_TRANSFORM(
                   e, x -> CAST(FLOOR(x / scale + 0.5) AS BIGINT))) AS BIGINT)
       END AS code_sum,
       CASE WHEN scale = 0 THEN 0.0
            ELSE LIST_MAX(LIST_TRANSFORM(
                   e, x -> ABS(x - FLOOR(x / scale + 0.5) * scale)))
       END AS max_abs_err
FROM s
"""


def pipeline_pretrain_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composed pretraining-prep pipeline, one DataFrame
    program over four proven operators: exact dedup survivors →
    benchmark decontamination (4-gram semi-join, bench slice
    doc_id % 97 = 0 excluded from output) → boilerplate gate (docs with
    >50% corpus-duplicated chunks dropped) → per-source quota (≤10 by
    hash rank) → per-source accounting. Shows the operators COMPOSE:
    each stage consumes the previous stage's DataFrame lazily — Catalyst
    plans the whole thing as one job graph."""
    from .operators.boilerplate import chunk_dedup_stats
    from .operators.contamination import token_ngrams
    from .operators.dedup import dedup as exact_survivors
    from .operators.sampling import quota_sample

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    kept = exact_survivors(docs)
    corpus = kept.where(F.col("doc_id") % 97 != 0)
    bench_grams = F.broadcast(
        token_ngrams(docs.where(F.col("doc_id") % 97 == 0), 4, hashed=True)
        .select("gram")
        .distinct()
    )
    contaminated = (
        token_ngrams(corpus, 4, hashed=True)
        .join(bench_grams, "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = corpus.join(contaminated, "doc_id", "left_anti")
    st = chunk_dedup_stats(docs).select("doc_id", "n_chunks", "n_dup_chunks")
    gated = clean.join(st, "doc_id").where(
        F.col("n_dup_chunks") * 2 <= F.col("n_chunks")
    )
    final = quota_sample(gated, "source", "doc_id", 10)
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).cast("bigint").alias("total_tokens"),
        F.sum("n_dup_chunks").cast("bigint").alias("boiler_chunks"),
        F.min("doc_id").alias("first_doc"),
    )


PRETRAIN_PREP_SQL = r"""
WITH fp AS (SELECT doc_id, MD5(text) AS f FROM documents),
reps AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f),
kept AS (SELECT d.* FROM documents d JOIN reps USING (doc_id)),
corpus AS (SELECT * FROM kept WHERE doc_id % 97 <> 0),
grams AS (
  SELECT DISTINCT doc_id,
         ARRAY_TO_STRING(LIST_SLICE(toks, CAST(pos AS INT),
                                    CAST(pos AS INT) + 3), ' ') AS gram
  FROM (SELECT doc_id, STRING_SPLIT_REGEX(text, '\s+') AS toks
        FROM documents),
       UNNEST(RANGE(1, GREATEST(LEN(toks) - 4 + 1, 0) + 1)) AS t(pos)
  WHERE LEN(toks) >= 4
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
contaminated AS (
  SELECT DISTINCT g.doc_id
  FROM grams g JOIN bench b USING (gram)
  JOIN corpus c ON c.doc_id = g.doc_id
),
clean AS (SELECT * FROM corpus
          WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
toks2 AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents),
chunks AS (
  SELECT doc_id,
         ARRAY_TO_STRING(LIST_SLICE(tk, CAST(p * 10 + 1 AS INT),
                                    CAST(p * 10 + 10 AS INT)), ' ') AS chunk
  FROM toks2, UNNEST(RANGE(0, CAST(CEIL(LEN(tk) / 10.0) AS BIGINT))) AS u(p)
),
freq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY chunk),
cstats AS (
  SELECT c.doc_id, COUNT(*) AS n_chunks,
         CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_chunks
  FROM chunks c JOIN freq f USING (chunk) GROUP BY c.doc_id
),
gated AS (
  SELECT cl.*, cs.n_dup_chunks FROM clean cl JOIN cstats cs USING (doc_id)
  WHERE cs.n_dup_chunks * 2 <= cs.n_chunks
),
final AS (
  SELECT * FROM (
    SELECT g.*, ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM gated g
  ) WHERE rk <= 10
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN LENGTH(text) = 0 THEN 0
                ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                END) AS BIGINT) AS total_tokens,
       CAST(SUM(n_dup_chunks) AS BIGINT) AS boiler_chunks,
       MIN(doc_id) AS first_doc
FROM final GROUP BY source
"""


def setops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) set-operation semantics in one result: per custkey,
    its multiplicity under INTERSECT ALL (min of the two sides' counts)
    and under EXCEPT ALL (left count minus right count, floored at 0) —
    the bag-algebra identities the distinct variants can't show.
    Aggregated to counts-per-key so the output is ordering-free."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].select(F.col("o_custkey").alias("custkey"))
    c = t["customer"].select(F.col("c_custkey").alias("custkey"))
    both = o.intersectAll(c).groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    diff = o.exceptAll(c).groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n_except_all")
    )
    return (
        both.join(diff, "custkey", "full_outer")
        .select(
            "custkey",
            F.coalesce("n_intersect_all", F.lit(0)).alias("n_intersect_all"),
            F.coalesce("n_except_all", F.lit(0)).alias("n_except_all"),
        )
    )


SETOPS_ALL_SQL = """
WITH ia AS (
  SELECT custkey, COUNT(*) AS n_intersect_all FROM (
    SELECT o_custkey AS custkey FROM orders
    INTERSECT ALL
    SELECT c_custkey FROM customer
  ) GROUP BY custkey
),
ea AS (
  SELECT custkey, COUNT(*) AS n_except_all FROM (
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey FROM customer
  ) GROUP BY custkey
)
SELECT COALESCE(ia.custkey, ea.custkey) AS custkey,
       COALESCE(n_intersect_all, 0) AS n_intersect_all,
       COALESCE(n_except_all, 0) AS n_except_all
FROM ia FULL OUTER JOIN ea ON ia.custkey = ea.custkey
"""


def temporal_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 lookup — the consumption pattern for type-2
    history: each purchase event joins to the event-type regime interval
    [valid_from, valid_to) active at its timestamp. Equality on the
    entity key + half-open range predicate → a user-keyed sort-merge
    join, never a cartesian; every purchase lands in exactly one
    interval by construction (intervals partition the user's timeline
    from their first event)."""
    from .operators.merge import scd2_history

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    h = scd2_history(ev, "user_id", "ts", "event_id", "event_type")
    maxlong = 9223372036854775807
    v = h.select(
        F.col("user_id").alias("h_user"),
        F.col("event_type").alias("regime"),
        F.unix_micros("valid_from").alias("f"),
        F.coalesce(F.unix_micros("valid_to"), F.lit(maxlong)).alias("tt"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    j = p.join(
        v,
        (p["user_id"] == v["h_user"])
        & (p["us"] >= v["f"])
        & (p["us"] < v["tt"]),
    )
    return j.select(
        "event_id", "user_id", "regime", F.col("f").alias("regime_start_us")
    )


TEMPORAL_JOIN_SQL = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
chg AS (
  SELECT user_id, event_type, ts, event_id
  FROM e WHERE rn = 1 OR event_type IS DISTINCT FROM prev
),
v AS (
  SELECT user_id, event_type, EPOCH_US(ts) AS f,
         COALESCE(EPOCH_US(LEAD(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)),
           9223372036854775807) AS tt
  FROM chg
),
p AS (SELECT user_id, event_id, EPOCH_US(ts) AS us
      FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, v.event_type AS regime,
       v.f AS regime_start_us
FROM p JOIN v ON p.user_id = v.user_id AND p.us >= v.f AND p.us < v.tt
"""


def q3_via_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 with its fact join routed through the reference flagship
    skew_join operator instead of a broadcast join — demonstrating the
    operator drops into a real reporting query unchanged (same oracle as
    q3_shipping_priority; equality is the whole point)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = t["lineitem"].where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    oc = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = skew_join(
        l, oc, [("l_orderkey", "o_orderkey")], "inner", SKEW_CONF
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        j.groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(_dsum(disc_price, _DEC_PROD).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


def delete_propagation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style delete propagation audit: a tombstone set of customers
    (c_custkey % 50 == 3) cascades through orders to lineitem via
    anti-joins — each fact table is pruned by keys, never row-multiplied.
    One row per table with surviving/deleted counts."""
    t = load_tables(spark, sf_dir)
    tomb = t["customer"].where(F.col("c_custkey") % 50 == 3).select(
        F.col("c_custkey").alias("k")
    )
    cust_kept = t["customer"].join(
        tomb, t["customer"]["c_custkey"] == tomb["k"], "left_anti"
    )
    del_orders = t["orders"].join(
        tomb, t["orders"]["o_custkey"] == tomb["k"], "left_semi"
    ).select(F.col("o_orderkey").alias("ok"))
    orders_kept = t["orders"].join(
        tomb, t["orders"]["o_custkey"] == tomb["k"], "left_anti"
    )
    li_kept = t["lineitem"].join(
        del_orders, t["lineitem"]["l_orderkey"] == del_orders["ok"],
        "left_anti",
    )
    rows = [
        ("customer", t["customer"], cust_kept),
        ("orders", t["orders"], orders_kept),
        ("lineitem", t["lineitem"], li_kept),
    ]
    out = None
    for name, full, kept in rows:
        r = full.agg(F.count(F.lit(1)).alias("n_total")).crossJoin(
            F.broadcast(kept.agg(F.count(F.lit(1)).alias("n_kept")))
        ).select(
            F.lit(name).alias("table_name"),
            "n_total",
            "n_kept",
            (F.col("n_total") - F.col("n_kept")).alias("n_deleted"),
        )
        out = r if out is None else out.unionByName(r)
    return out


DELETE_PROPAGATION_SQL = """
WITH tomb AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 50 = 3),
del_orders AS (SELECT o_orderkey FROM orders
               WHERE o_custkey IN (SELECT k FROM tomb)),
m AS (
  SELECT 'customer' AS table_name, (SELECT COUNT(*) FROM customer) AS n_total,
         (SELECT COUNT(*) FROM customer
          WHERE c_custkey NOT IN (SELECT k FROM tomb)) AS n_kept
  UNION ALL
  SELECT 'orders', (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders
          WHERE o_custkey NOT IN (SELECT k FROM tomb))
  UNION ALL
  SELECT 'lineitem', (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM del_orders))
)
SELECT table_name, n_total, n_kept, n_total - n_kept AS n_deleted FROM m
"""


def kll_quantiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP deterministic quantile sketches in batch (the grouped
    sibling of kll_quantiles_orders): one md5-compat KLL register set
    per order priority (sketch/kll.py::kll_compat_by_group — one count
    job for per-group thresholds, then ONE shuffle-free filtered scan
    collects every group's <=~2k registers), median + p90 estimates
    alongside the exact per-group percentiles from ONE aggregate
    action. EXACT since r13: estimates, ranks, and the within_bound
    gate are integer/IEEE-replayable by the SQL oracle (VERDICT r12
    #3 — the hll_distinct_stats md5-mode recipe applied to quantiles;
    the seeded-compaction KLL build remains available as
    kll_by_group for deployments that want the tighter O(1/k) bound
    over replayability)."""
    from .sketch.kll import kll_compat_by_group

    t = load_tables(spark, sf_dir)
    o = t["orders"].select("o_orderpriority", "o_orderkey", "o_totalprice")
    sketches = kll_compat_by_group(
        o, "o_orderpriority", "o_orderkey", "o_totalprice", k=200
    )
    exact = {
        r["o_orderpriority"]: (r["n"], r["qs"][0], r["qs"][1])
        for r in o.where(F.col("o_totalprice").isNotNull())
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(o_totalprice, array(0.5, 0.9))").alias("qs"),
        )
        .collect()
    }
    rows = []
    # None-first sort: NULL priority groups are a real key (ADVICE r7 #1)
    for p in _null_first(sketches):
        s = sketches[p]
        n, ex50, ex90 = exact[p]
        bound = s.rank_error_bound()
        est50, est90 = s.quantile(0.5), s.quantile(0.9)
        rows.append(
            (p, int(n), float(est50), float(ex50), float(est90),
             float(ex90),
             bool(abs(s.rank(ex50) - 0.5) <= bound
                  and abs(s.rank(ex90) - 0.9) <= bound))
        )
    out = spark.createDataFrame(
        rows,
        "priority string, n bigint, kll_p50 double, exact_p50 double, "
        "kll_p90 double, exact_p90 double, within_bound boolean",
    )
    # round IN-PLAN: Python's round() rounds the true binary value
    # while Spark/DuckDB ROUND use the shortest-decimal HALF_UP repr —
    # a .xx5 interpolation midpoint (common: prices have 2 decimals)
    # lands on opposite sides (seen at sf0.001, exact_p50 = .175)
    return out.where(F.col("within_bound")).select(
        "priority", "n",
        F.round("kll_p50", 2).alias("kll_p50"),
        F.round("exact_p50", 2).alias("exact_p50"),
        F.round("kll_p90", 2).alias("kll_p90"),
        F.round("exact_p90", 2).alias("exact_p90"),
        "within_bound",
    )


def kll_quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile sketch over o_totalprice: one
    row per probed quantile with the sketch estimate, the EXACT
    normalized rank of that estimate, and the rank error. EXACT since
    r13 (VERDICT r12 #3): the md5-compat mode (sketch/kll.py::
    KLLCompat) makes every compaction coin a hash bit of the row key
    and compacts eagerly, collapsing the cascade to the
    order-independent register set {x : md5_60(key) >> (60-H) == 0}
    with weight 2^H — the SQL oracle replays registers, estimates,
    ranks, and the error gate bit-for-bit (the hll/theta/CMS md5-mode
    precedent). The seeded-compaction KLL (kll_from_dataframe) remains
    the tight-bound non-replayable path, still covered by
    tests/test_kll.py and the streaming quantile parity test. Sketch
    build is eager → EAGER_QUERIES."""
    from .sketch.kll import kll_compat_from_dataframe

    t = load_tables(spark, sf_dir)
    o = t["orders"].where(F.col("o_totalprice").isNotNull())
    sketch = kll_compat_from_dataframe(o, "o_orderkey", "o_totalprice", k=200)
    probes = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    ests = {q: sketch.quantile(q) for q in probes}
    # exact normalized ranks of all 7 estimates in one aggregate action
    exact = o.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.when(F.col("o_totalprice") <= F.lit(ests[q]), 1).otherwise(0)
            ).alias(f"r_{int(q * 100)}")
            for q in probes
        ],
    ).collect()[0]
    n = exact["n"]
    rows = [
        (
            float(q),
            float(ests[q]),
            float(exact[f"r_{int(q * 100)}"] / n),
            float(abs(exact[f"r_{int(q * 100)}"] / n - q)),
        )
        for q in probes
    ]
    out = spark.createDataFrame(
        rows, "q double, kll_estimate double, exact_rank double, rank_err double"
    )
    # round IN-PLAN (HALF_UP decimal semantics shared with the oracle's
    # ROUND; Python round() diverges on .xx5 doubles) and gate on the
    # rounded error, matching the SQL WHERE clause exactly
    return (
        out.select(
            "q",
            F.round("kll_estimate", 6).alias("kll_estimate"),
            F.round("exact_rank", 6).alias("exact_rank"),
            F.round("rank_err", 6).alias("rank_err"),
        )
        .where(F.col("rank_err") <= F.lit(float(sketch.rank_error_bound())))
    )


# DuckDB replay of the md5-compat register set: same integer H
# (MIN b with (ceil(n/k)-1)>>b = 0 ≡ bit_length), same 60-bit hash
# (first 15 md5 hex chars), same clamp(ceil(q·m),1,m) register rank,
# same (count << H)/n rank arithmetic, same 3/(2·sqrt(m)) gate.
KLL_QUANTILES_SQL = """
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
            WHERE o_totalprice IS NOT NULL),
lv AS (SELECT n, (SELECT MIN(b) FROM range(0, 62) t(b)
                  WHERE ((((n + 199) // 200) - 1) >> b) = 0) AS h FROM nn),
samp AS (
  SELECT o_totalprice AS v
  FROM orders, lv
  WHERE o_totalprice IS NOT NULL
    AND (CAST(('0x' || SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)), 1, 15))
              AS BIGINT) >> (60 - lv.h)) = 0
),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM samp),
srt AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM samp),
-- DOUBLE probes: a bare decimal list types DECIMAL in DuckDB — the
-- driver's hash is dtype-sensitive, and DECIMAL q*m is exact decimal
-- arithmetic where Spark's double q*m can ceil differently
probes AS (SELECT UNNEST([0.01::DOUBLE, 0.1::DOUBLE, 0.25::DOUBLE,
                          0.5::DOUBLE, 0.75::DOUBLE, 0.9::DOUBLE,
                          0.99::DOUBLE]) AS q),
est AS (
  SELECT p.q, s.v AS est
  FROM probes p, mm, srt s
  WHERE s.rn = LEAST(mm.m, GREATEST(1, CAST(CEIL(p.q * mm.m) AS BIGINT)))
),
rk AS (
  SELECT e.q, e.est,
         (SELECT COUNT(*) FROM orders o
          WHERE o.o_totalprice <= e.est) * 1.0 / nn.n AS xr
  FROM est e, nn
)
SELECT q, ROUND(est, 6) AS kll_estimate, ROUND(xr, 6) AS exact_rank,
       ROUND(ABS(xr - q), 6) AS rank_err
FROM rk, lv
WHERE ROUND(ABS(xr - q), 6)
      <= 3.0 * SQRT((CAST(1 AS BIGINT) << lv.h) * 1.0 / lv.n)
ORDER BY q
"""


KLL_BY_PRIORITY_SQL = """
WITH base AS (SELECT o_orderpriority AS g, o_totalprice AS v,
                     CAST(('0x' || SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)),
                                             1, 15)) AS BIGINT) AS u
              FROM orders WHERE o_totalprice IS NOT NULL),
gn AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY g),
lv AS (SELECT g, n, (SELECT MIN(b) FROM range(0, 62) t(b)
                     WHERE ((((n + 199) // 200) - 1) >> b) = 0) AS h FROM gn),
samp AS (SELECT b.g, b.v
         FROM base b JOIN lv ON b.g IS NOT DISTINCT FROM lv.g
         WHERE (b.u >> (60 - lv.h)) = 0),
gm AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS m FROM samp GROUP BY g),
srt AS (SELECT g, v,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn
        FROM samp),
est AS (
  SELECT s.g,
         MAX(CASE WHEN s.rn = LEAST(gm.m, GREATEST(1,
                    CAST(CEIL(0.5::DOUBLE * gm.m) AS BIGINT))) THEN s.v END) AS e50,
         MAX(CASE WHEN s.rn = LEAST(gm.m, GREATEST(1,
                    CAST(CEIL(0.9::DOUBLE * gm.m) AS BIGINT))) THEN s.v END) AS e90
  FROM srt s JOIN gm ON s.g IS NOT DISTINCT FROM gm.g GROUP BY s.g),
-- exact percentiles replicate Spark's Percentile interpolation
-- bit-for-bit: pos = q*(n-1); if floor(pos)=ceil(pos) take the value,
-- else lo*(ceil(pos)-pos) + hi*(pos-floor(pos)) — QUANTILE_CONT's
-- different FP formula lands .xx5 midpoints on the other side of the
-- round-2 boundary (seen at sf0.001)
exr AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn
        FROM base),
exs AS (SELECT r.g,
          SUM(CASE WHEN r.rn = CAST(FLOOR(0.5::DOUBLE * (gn.n - 1)) AS BIGINT) + 1
                   THEN r.v ELSE 0 END) AS lo50,
          SUM(CASE WHEN r.rn = CAST(CEIL(0.5::DOUBLE * (gn.n - 1)) AS BIGINT) + 1
                   THEN r.v ELSE 0 END) AS hi50,
          SUM(CASE WHEN r.rn = CAST(FLOOR(0.9::DOUBLE * (gn.n - 1)) AS BIGINT) + 1
                   THEN r.v ELSE 0 END) AS lo90,
          SUM(CASE WHEN r.rn = CAST(CEIL(0.9::DOUBLE * (gn.n - 1)) AS BIGINT) + 1
                   THEN r.v ELSE 0 END) AS hi90,
          MAX(gn.n) AS n
        FROM exr r JOIN gn ON r.g IS NOT DISTINCT FROM gn.g
        GROUP BY r.g),
ex AS (SELECT g,
         CASE WHEN FLOOR(0.5::DOUBLE * (n - 1)) = CEIL(0.5::DOUBLE * (n - 1)) THEN lo50
              ELSE lo50 * (CEIL(0.5::DOUBLE * (n - 1)) - 0.5::DOUBLE * (n - 1))
                   + hi50 * (0.5::DOUBLE * (n - 1) - FLOOR(0.5::DOUBLE * (n - 1))) END AS x50,
         CASE WHEN FLOOR(0.9::DOUBLE * (n - 1)) = CEIL(0.9::DOUBLE * (n - 1)) THEN lo90
              ELSE lo90 * (CEIL(0.9::DOUBLE * (n - 1)) - 0.9::DOUBLE * (n - 1))
                   + hi90 * (0.9::DOUBLE * (n - 1) - FLOOR(0.9::DOUBLE * (n - 1))) END AS x90
       FROM exs),
rk AS (SELECT lv.g, lv.n, lv.h, gm.m, est.e50, est.e90, ex.x50, ex.x90,
         ((SELECT COUNT(*) FROM samp s2
           WHERE s2.g IS NOT DISTINCT FROM lv.g AND s2.v <= ex.x50)
          * (CAST(1 AS BIGINT) << lv.h)) * 1.0 / lv.n AS r50,
         ((SELECT COUNT(*) FROM samp s2
           WHERE s2.g IS NOT DISTINCT FROM lv.g AND s2.v <= ex.x90)
          * (CAST(1 AS BIGINT) << lv.h)) * 1.0 / lv.n AS r90
       FROM lv
       JOIN gm ON lv.g IS NOT DISTINCT FROM gm.g
       JOIN est ON lv.g IS NOT DISTINCT FROM est.g
       JOIN ex ON lv.g IS NOT DISTINCT FROM ex.g)
SELECT g AS priority, n, ROUND(e50, 2) AS kll_p50, ROUND(x50, 2) AS exact_p50,
       ROUND(e90, 2) AS kll_p90, ROUND(x90, 2) AS exact_p90,
       (ABS(r50 - 0.5) <= 3.0 * SQRT((CAST(1 AS BIGINT) << h) * 1.0 / n)
        AND ABS(r90 - 0.9)
            <= 3.0 * SQRT((CAST(1 AS BIGINT) << h) * 1.0 / n)) AS within_bound
FROM rk
WHERE ABS(r50 - 0.5) <= 3.0 * SQRT((CAST(1 AS BIGINT) << h) * 1.0 / n)
  AND ABS(r90 - 0.9) <= 3.0 * SQRT((CAST(1 AS BIGINT) << h) * 1.0 / n)
ORDER BY priority
"""


def bottomk_quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate order-price quantiles from a bottom-k sketch
    (operators/bottomk.py): the 1000 orders with the smallest md5(key)
    form a deterministic uniform sample whose percentiles estimate the
    population's — and because the sample is hash-defined, the oracle
    reproduces it EXACTLY (an honestly checkable approximate-quantile
    path, unlike engine-internal approx_percentile)."""
    from .operators.bottomk import bottomk_quantiles

    t = load_tables(spark, sf_dir)
    out = bottomk_quantiles(
        t["orders"], "o_orderkey", "o_totalprice", 1000, [0.5, 0.9, 0.99]
    )
    return out.select(
        "sample_n",
        F.round("q_50", 6).alias("q_50"),
        F.round("q_90", 6).alias("q_90"),
        F.round("q_99", 6).alias("q_99"),
    )


BOTTOMK_QUANTILES_SQL = """
WITH s AS (
  SELECT o_totalprice FROM orders
  ORDER BY MD5(CAST(o_orderkey AS VARCHAR)), o_orderkey
  LIMIT 1000
)
SELECT COUNT(*) AS sample_n,
       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 6) AS q_50,
       ROUND(QUANTILE_CONT(o_totalprice, 0.9), 6) AS q_90,
       ROUND(QUANTILE_CONT(o_totalprice, 0.99), 6) AS q_99
FROM s
"""


def null_aware_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN three-valued-logic semantics — the classic correctness
    trap: against a null-free key set NOT IN ≡ anti-join; inject one
    NULL into the set and NOT IN returns ZERO rows (x <> NULL is
    unknown for every x). Spark plans the null-aware anti join
    (broadcast, single-column NAAJ); both counts must match the SQL
    oracle's."""
    t = load_tables(spark, sf_dir)
    t["orders"].createOrReplaceTempView("__naaj_orders")
    t["customer"].createOrReplaceTempView("__naaj_customer")
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM __naaj_orders
           WHERE o_custkey NOT IN
             (SELECT c_custkey FROM __naaj_customer
              WHERE c_custkey % 3 = 0)) AS n_without_null,
          (SELECT COUNT(*) FROM __naaj_orders
           WHERE o_custkey NOT IN
             (SELECT c_custkey FROM __naaj_customer WHERE c_custkey % 3 = 0
              UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_with_null
        """
    )


NULL_AWARE_ANTI_SQL = """
SELECT
  (SELECT COUNT(*) FROM orders
   WHERE o_custkey NOT IN
     (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0))
    AS n_without_null,
  (SELECT COUNT(*) FROM orders
   WHERE o_custkey NOT IN
     (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
      UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_with_null
"""


def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order prices: 25k-wide bins with count +
    per-bin min/max — one codegen projection + one aggregation (integer
    bin arithmetic, engine-identical)."""
    t = load_tables(spark, sf_dir)
    bucket = F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("int")
    return (
        t["orders"]
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


HISTOGRAM_SQL = """
SELECT CAST(FLOOR(o_totalprice / 25000.0) AS INT) AS bucket,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# --- round 6: retrieval + membership-sketch + quality-verdict queries ----


def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation inside the engine
    (operators/retrieval.py::ndcg_at_k): NDCG@10 of the batched BM25
    run (bm25_topk_multi, one corpus pass for 3 query bags) against
    graded relevance derived relationally from the corpus itself —
    rel(q, d) = number of distinct q-terms present in d. The oracle
    replays the BM25 ranking, the derived judgments, the ideal
    ordering, and the burst-gain arithmetic, so DCG/IDCG/NDCG are all
    hash-checked."""
    from .operators.retrieval import bm25_topk_multi, ndcg_at_k

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    terms = {0: ["spark", "join"], 1: ["window", "vector"],
             2: ["stream", "query"]}
    run = bm25_topk_multi(docs, terms, k=10).select(
        "query_id", "doc_id", "rank"
    )
    qt = spark.createDataFrame(
        [(qid, tm) for qid, ts in terms.items() for tm in ts],
        "query_id int, term string",
    )
    # broadcast-join the 6 query terms BEFORE the distinct: only
    # matching (doc, term) rows ever shuffle — a corpus-wide distinct
    # over raw token strings first would move the whole vocabulary
    # as text for nothing (review r9 finding)
    judgments = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .join(F.broadcast(qt), "term")
        .distinct()
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("rel"))
    )
    return ndcg_at_k(run, judgments, k=10)


NDCG_EVAL_SQL = """
WITH qt AS (
  SELECT * FROM (VALUES (0, 'spark'), (0, 'join'), (1, 'window'),
                        (1, 'vector'), (2, 'stream'), (2, 'query'))
  AS v(qid, term)
),
toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
corpus AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2
),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT q.qid, t.doc_id,
         LN(1 + (c.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (t.tf * (1.2 + 1.0))
           / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) AS s
  FROM qt q JOIN tf t USING (term) JOIN dft f ON f.term = t.term
  JOIN dl d USING (doc_id) CROSS JOIN corpus c
),
run AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY ROUND(SUM(s), 6) DESC, doc_id) AS INT) AS rank
    FROM scored GROUP BY qid, doc_id) x
  WHERE rank <= 10
),
judg AS (
  SELECT q.qid, d.doc_id, CAST(COUNT(*) AS DOUBLE) AS rel
  FROM (SELECT DISTINCT doc_id, term FROM toks) d JOIN qt q USING (term)
  GROUP BY 1, 2
),
dcg AS (
  SELECT r.qid, ROUND(SUM((POW(2.0, COALESCE(j.rel, 0.0)) - 1.0)
                          / LOG2(r.rank + 1.0)), 6) AS dcg
  FROM run r LEFT JOIN judg j ON j.qid = r.qid AND j.doc_id = r.doc_id
  GROUP BY r.qid
),
ideal AS (
  SELECT qid, ROUND(SUM((POW(2.0, rel) - 1.0) / LOG2(rk + 1.0)), 6) AS idcg
  FROM (
    SELECT qid, rel,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY rel DESC, doc_id) AS rk
    FROM judg WHERE rel > 0) x
  WHERE rk <= 10 GROUP BY qid
)
SELECT COALESCE(d.qid, i.qid) AS query_id,
       COALESCE(d.dcg, 0.0) AS dcg,
       COALESCE(i.idcg, 0.0) AS idcg,
       ROUND(CASE WHEN COALESCE(i.idcg, 0.0) > 0
                  THEN COALESCE(d.dcg, 0.0) / i.idcg ELSE 0.0 END, 6) AS ndcg
FROM dcg d FULL OUTER JOIN ideal i ON i.qid = d.qid
"""


def retrieval_metrics_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-based retrieval metrics
    (operators/retrieval.py::retrieval_metrics): recall@10,
    precision@10, and MRR of the batched BM25 run against the same
    term-coverage judgments as ndcg_retrieval_eval (relevant = any
    matched term). Completes the in-engine evaluation family: NDCG
    grades the ORDER, these grade the SET. The run is cut at 25 while
    the metrics use k=10 (ADVICE r9 #2): recall/precision/hits count
    only the top-10, but MRR reads the first relevant rank anywhere in
    the 25-deep run — the operator's uncapped-MRR contract is now
    actually exercised and oracle-checked, not vacuously true on a
    pre-cut run."""
    from .operators.retrieval import bm25_topk_multi, retrieval_metrics

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    terms = {0: ["spark", "join"], 1: ["window", "vector"],
             2: ["stream", "query"]}
    run = bm25_topk_multi(docs, terms, k=25).select(
        "query_id", "doc_id", "rank"
    )
    qt = spark.createDataFrame(
        [(qid, tm) for qid, ts in terms.items() for tm in ts],
        "query_id int, term string",
    )
    judgments = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .join(F.broadcast(qt), "term")
        .distinct()
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("rel"))
    )
    return retrieval_metrics(run, judgments, k=10, rel_threshold=1)


RETRIEVAL_METRICS_SQL = """
WITH qt AS (
  SELECT * FROM (VALUES (0, 'spark'), (0, 'join'), (1, 'window'),
                        (1, 'vector'), (2, 'stream'), (2, 'query'))
  AS v(qid, term)
),
toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
corpus AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2
),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT q.qid, t.doc_id,
         LN(1 + (c.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (t.tf * (1.2 + 1.0))
           / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) AS s
  FROM qt q JOIN tf t USING (term) JOIN dft f ON f.term = t.term
  JOIN dl d USING (doc_id) CROSS JOIN corpus c
),
run AS (
  -- 25-deep run (the Spark side's bm25_topk_multi k=25): hits cut at
  -- 10 below, but first_rank reads the WHOLE run — the uncapped-MRR
  -- contract (ADVICE r9 #2)
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY ROUND(SUM(s), 6) DESC, doc_id) AS INT) AS rank
    FROM scored GROUP BY qid, doc_id) x
  WHERE rank <= 25
),
judg AS (
  SELECT q.qid, d.doc_id, COUNT(*) AS rel
  FROM (SELECT DISTINCT doc_id, term FROM toks) d JOIN qt q USING (term)
  GROUP BY 1, 2
),
relv AS (SELECT qid, doc_id FROM judg WHERE rel >= 1),
nrel AS (SELECT qid, COUNT(*) AS n_rel FROM relv GROUP BY 1),
per_run AS (
  SELECT r.qid,
         CAST(SUM(CASE WHEN r.rank <= 10 THEN 1 ELSE 0 END) AS BIGINT)
           AS hits,
         MIN(r.rank) AS first_rank
  FROM run r JOIN relv v ON v.qid = r.qid AND v.doc_id = r.doc_id
  GROUP BY r.qid
)
SELECT COALESCE(n.qid, p.qid) AS query_id,
       COALESCE(n.n_rel, 0) AS n_rel,
       COALESCE(p.hits, 0) AS hits,
       ROUND(CASE WHEN COALESCE(n.n_rel, 0) > 0
                  THEN COALESCE(p.hits, 0) / CAST(n.n_rel AS DOUBLE)
                  ELSE 0.0 END, 6) AS recall_at_k,
       ROUND(COALESCE(p.hits, 0) / 10.0, 6) AS precision_at_k,
       ROUND(CASE WHEN p.first_rank IS NOT NULL
                  THEN 1.0 / p.first_rank ELSE 0.0 END, 6) AS mrr
FROM nrel n FULL OUTER JOIN per_run p ON p.qid = n.qid
"""


def tfidf_cosine_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine text-reuse pairs
    (operators/retrieval.py::tfidf_cosine_pairs): word-trigram phrase
    vectors, tf·ln(N/df) weights, df>50 stop-phrases dropped from
    vectors and norms alike, inverted-index pair enumeration (terms
    xxhash64-hashed before shuffle — the setsim trick), cosine cut on
    the ROUNDED value. Isolates the planted near-dup families (the
    cosine counterpart of dedup_ngram_jaccard's Jaccard threshold);
    the oracle replays the identical arithmetic on raw phrase
    strings."""
    from .operators.retrieval import tfidf_cosine_pairs

    t = load_tables(spark, sf_dir)
    return tfidf_cosine_pairs(
        t["documents"], threshold=0.5, ngram=3, max_df=50
    )


TFIDF_COSINE_SQL = """
WITH wl AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tri AS (
  SELECT doc_id,
         w[CAST(p AS INT)] || ' ' || w[CAST(p AS INT) + 1] || ' '
           || w[CAST(p AS INT) + 2] AS term
  FROM wl, UNNEST(range(1, GREATEST(len(w) - 2, 0) + 1)) AS r(p)
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tri GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
wt AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(n.n_docs / dfq.df) AS w
  FROM tf JOIN dfq USING (term) CROSS JOIN n
  WHERE dfq.df <= 50
),
nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nm FROM wt GROUP BY doc_id),
dot AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS d
  FROM wt a JOIN wt b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, ROUND(d / (x.nm * y.nm), 6) AS cosine
FROM dot JOIN nrm x ON x.doc_id = id_a JOIN nrm y ON y.doc_id = id_b
WHERE x.nm > 0 AND y.nm > 0
  AND ROUND(d / (x.nm * y.nm), 6) >= 0.5
"""


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (operators/retrieval.py::bm25_topk):
    top-25 documents for a 4-term query, Lucene-form idf and length
    normalization, expressed fully relationally — postings are filtered
    to the query terms BEFORE any aggregation, corpus scalars are 1-row
    broadcasts, and the cut is TakeOrderedAndProject on the ROUNDED
    score so the oracle's top-k boundary is bit-identical."""
    from .operators.retrieval import bm25_topk

    t = load_tables(spark, sf_dir)
    return bm25_topk(
        t["documents"], ["spark", "join", "window", "vector"], k=25
    )


BM25_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
corpus AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN ('spark', 'join', 'window', 'vector') GROUP BY 1, 2
),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT t.doc_id, d.dl,
         LN(1 + (c.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (t.tf * (1.2 + 1.0))
           / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) AS s
  FROM tf t JOIN dft f USING (term) JOIN dl d USING (doc_id)
  CROSS JOIN corpus c
)
SELECT doc_id, CAST(dl AS INT) AS dl, CAST(COUNT(*) AS INT) AS matched,
       ROUND(SUM(s), 6) AS score
FROM scored GROUP BY doc_id, dl
ORDER BY ROUND(SUM(s), 6) DESC, doc_id LIMIT 25
"""


def bloom_membership_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership summary (sketch/bloom.py): build a
    128 KiB filter over orders.o_custkey (two per-half builds merged —
    certifying bitwise-OR mergeability against the one-shot build),
    probe every customer key through the broadcast prefilter, and
    cross-check against the exact semi-join truth.  In-query gates
    (the sketch contract, same posture as the HLL/KLL queries):
    zero false negatives, merge ≡ one-shot bit-for-bit, observed fp
    rate within 2× the (1-e^(-kn/m))^k envelope + 1e-3.  Built in
    md5-compat mode (VERDICT r7 #5): h1/h2 are the two 15-hex-char
    halves of one md5, so the DuckDB oracle replays every probe
    position and n_claimed/fp_rate are EXACT-checked, not just
    rows-gated.  Eager (sketch builds collect at construction) →
    EAGER_QUERIES."""
    from .sketch.bloom import bloom_from_dataframe, bloom_prefilter

    t = load_tables(spark, sf_dir)
    orders, customer = t["orders"], t["customer"]
    # the three sketch builds and three exact counts are independent
    # actions over independent scans — overlap them (guide §2.6; each
    # filter's bits depend only on its own partition's hashed keys, so
    # completion order cannot change a single bit)
    truth = customer.join(orders, customer.c_custkey == orders.o_custkey,
                          "left_semi")
    half0, half1, oneshot, n_customers, n_true, n_keys = _par_actions(
        *[
            (lambda i=i: bloom_from_dataframe(
                orders.where(F.pmod("o_orderkey", F.lit(2)) == i),
                ["o_custkey"], hash_fn="md5",
            ))
            for i in (0, 1)
        ],
        lambda: bloom_from_dataframe(orders, ["o_custkey"], hash_fn="md5"),
        customer.count,
        truth.count,
        orders.select("o_custkey").distinct().count,
    )
    merged = half0.merge(half1)
    union_exact = bool((merged.bits == oneshot.bits).all())
    assert union_exact, "bloom merge diverged from one-shot build"

    claimed = bloom_prefilter(customer, merged, ["c_custkey"], keep="member",
                              hash_fn="md5")
    n_claimed, n_false_neg = _par_actions(
        claimed.count,
        truth.join(
            claimed.select("c_custkey"), on="c_custkey", how="left_anti"
        ).count,
    )
    assert n_false_neg == 0, f"bloom false negatives: {n_false_neg}"
    bound = merged.fp_bound(n_keys)
    fp_rate = (
        (n_claimed - n_true) / (n_customers - n_true)
        if n_customers > n_true else 0.0
    )
    assert fp_rate <= 2.0 * bound + 1e-3, (fp_rate, bound)
    out = spark.createDataFrame(
        [(n_customers, n_true, n_claimed, n_false_neg,
          float(fp_rate), float(bound), union_exact)],
        "n_customers bigint, n_with_orders bigint, n_claimed bigint, "
        "n_false_neg bigint, fp_rate double, fp_bound double, "
        "merge_exact boolean",
    )
    # round IN-PLAN (the KLL r13 lesson): HALF_UP shortest-decimal
    # semantics shared with the oracle's ROUND
    return out.select(
        "n_customers", "n_with_orders", "n_claimed", "n_false_neg",
        F.round("fp_rate", 6).alias("fp_rate"),
        F.round("fp_bound", 6).alias("fp_bound"),
        "merge_exact",
    )


BLOOM_MEMBERSHIP_SQL = """
WITH ik AS (
  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS ks
  FROM orders WHERE o_custkey IS NOT NULL
),
ih AS (
  SELECT CAST(('0x' || SUBSTRING(MD5(ks), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || SUBSTRING(MD5(ks), 16, 15)) AS BIGINT) | 1 AS h2
  FROM ik
),
ipos AS (
  SELECT DISTINCT (h1 + i * h2) % 1048576 AS pos
  FROM ih, UNNEST(range(0, 7)) AS t(i)
),
ck AS (
  SELECT c_custkey,
         CAST(('0x' || SUBSTRING(MD5(CAST(c_custkey AS VARCHAR)), 1, 15))
              AS BIGINT) AS h1,
         CAST(('0x' || SUBSTRING(MD5(CAST(c_custkey AS VARCHAR)), 16, 15))
              AS BIGINT) | 1 AS h2
  FROM customer
),
cpos AS (
  SELECT c_custkey, (h1 + i * h2) % 1048576 AS pos
  FROM ck, UNNEST(range(0, 7)) AS t(i)
),
claimed AS (
  SELECT c.c_custkey
  FROM cpos c LEFT JOIN ipos i ON c.pos = i.pos
  GROUP BY c.c_custkey
  HAVING COUNT(*) = COUNT(i.pos)
),
truth AS (
  SELECT DISTINCT c.c_custkey FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
),
scal AS (
  SELECT (SELECT COUNT(*) FROM customer) AS n_customers,
         (SELECT COUNT(*) FROM truth) AS n_true,
         (SELECT COUNT(*) FROM claimed) AS n_claimed,
         (SELECT COUNT(*) FROM truth t
          LEFT JOIN claimed c ON c.c_custkey = t.c_custkey
          WHERE c.c_custkey IS NULL) AS n_false_neg,
         (SELECT COUNT(*) FROM ik) AS n_keys
)
SELECT CAST(n_customers AS BIGINT) AS n_customers,
       CAST(n_true AS BIGINT) AS n_with_orders,
       CAST(n_claimed AS BIGINT) AS n_claimed,
       CAST(n_false_neg AS BIGINT) AS n_false_neg,
       ROUND(CASE WHEN n_customers > n_true
                  THEN CAST(n_claimed - n_true AS DOUBLE)
                       / (n_customers - n_true)
                  ELSE 0.0 END, 6) AS fp_rate,
       ROUND(POW(1.0 - EXP(-7.0 * n_keys / 1048576.0), 7), 6) AS fp_bound,
       TRUE AS merge_exact
FROM scal
"""


def gopher_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule-set verdict (operators/quality.py::
    gopher_quality_signals, Rae et al. 2021 §A1.1): per-doc word count,
    mean word length, symbol:word ratio, top-unigram/bigram fractions,
    and the combined passes_quality flag — every signal an int/int
    division in double, hash-exact against the SQL oracle."""
    from .operators.quality import gopher_quality_signals

    t = load_tables(spark, sf_dir)
    out = gopher_quality_signals(t["documents"])
    return out.select(
        "doc_id", "n_tokens",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("symbol_word_ratio", 6).alias("symbol_word_ratio"),
        F.round("top_unigram_frac", 6).alias("top_unigram_frac"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
        "passes_quality",
    )


GOPHER_QUALITY_SQL = """
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN LENGTH(text) = 0 THEN 0
              ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
         END AS n_tokens,
         LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g'))
           AS n_punct
  FROM documents
),
scalars AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens = 0 THEN 0.0
              ELSE (LENGTH(text) - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE)
         END AS mean_word_len,
         CASE WHEN n_tokens = 0 THEN 0.0
              ELSE n_punct / CAST(n_tokens AS DOUBLE)
         END AS symbol_word_ratio
  FROM base
),
toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
g1 AS (
  SELECT doc_id, tk[CAST(i + 1 AS INT)] AS ng
  FROM toks, UNNEST(range(0, len(tk))) AS u(i)
),
uni AS (
  SELECT doc_id, MAX(c) / CAST(SUM(c) AS DOUBLE) AS top_unigram_frac
  FROM (SELECT doc_id, ng, COUNT(*) AS c FROM g1 GROUP BY 1, 2)
  GROUP BY doc_id
),
g2 AS (
  SELECT doc_id,
         tk[CAST(i + 1 AS INT)] || ' ' || tk[CAST(i + 2 AS INT)] AS ng
  FROM toks, UNNEST(range(0, len(tk) - 1)) AS u(i)
  WHERE len(tk) >= 2
),
bi AS (
  SELECT doc_id, MAX(c) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac
  FROM (SELECT doc_id, ng, COUNT(*) AS c FROM g2 GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT s.doc_id, CAST(s.n_tokens AS INT) AS n_tokens,
       ROUND(s.mean_word_len, 6) AS mean_word_len,
       ROUND(s.symbol_word_ratio, 6) AS symbol_word_ratio,
       ROUND(COALESCE(u.top_unigram_frac, 0.0), 6) AS top_unigram_frac,
       ROUND(COALESCE(b.top_bigram_frac, 0.0), 6) AS top_bigram_frac,
       (s.n_tokens BETWEEN 10 AND 1000)
         AND (s.mean_word_len BETWEEN 2.0 AND 12.0)
         AND (s.symbol_word_ratio <= 0.3)
         AND (COALESCE(u.top_unigram_frac, 0.0) <= 0.25)
         AND (COALESCE(b.top_bigram_frac, 0.0) <= 0.18) AS passes_quality
FROM scalars s
LEFT JOIN uni u ON u.doc_id = s.doc_id
LEFT JOIN bi b ON b.doc_id = s.doc_id
"""


def quality_classifier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINABLE quality classifier (operators/classifier.py): hashed
    word-unigram features (64 md5 buckets + bias, tf-normalized) and
    full-batch logistic GD — 6 fixed iterations, lr=2.0, zero init —
    distilling the Gopher mean-word-length rule (Rae et al. 2021
    §A1.1) as the weak label y = mean_word_len > 4.5 (int/int double
    division, bit-exact in both engines). The whole training
    recurrence is SQL-replayable: the oracle unrolls all 6 gradient
    steps as a CTE chain (the BPE-trainer precedent), so EVERY weight
    update is certified, not just the final scores. Reaches 0.836
    train accuracy vs a 0.502 base rate on the fixture. Training
    collects only the 65-float gradient per iteration → EAGER.
    r14: reads the shared quality family (one training serves this
    entry and the calibration sweep)."""
    return _quality_family(spark, sf_dir)


def _quality_classifier_sql() -> str:
    from .operators.classifier import logreg_oracle_sql

    label = (
        "(LENGTH(text) - (CASE WHEN LENGTH(text) = 0 THEN 0 "
        "ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END - 1))"
        " / CAST(NULLIF(CASE WHEN LENGTH(text) = 0 THEN 0 "
        "ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END, 0)"
        " AS DOUBLE) > 4.5"
    )
    return logreg_oracle_sql(label, n_buckets=64, iters=6, lr=2.0)


QUALITY_CLASSIFIER_SQL = _quality_classifier_sql()


def classifier_calibration_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-calibration sweep over the trained quality classifier
    (operators/classifier.py::calibration_sweep): confusion counts +
    precision/recall/F1 at thresholds 0.1-0.9 against the Gopher weak
    labels — the operating-point selection step every learned filter
    ships with (FineWeb-Edu's score >= 3 cut).  One in-plan explode
    over the scored docs, one 9-group aggregation; the oracle wraps
    the full unrolled-GD classifier chain as a subquery, so the sweep
    is certified end-to-end from the raw corpus.  Training collects at
    construction → EAGER.  r14: sweeps the shared quality family's
    scored table (one training serves both classifier entries)."""
    from .operators.classifier import calibration_sweep

    return calibration_sweep(_quality_family(spark, sf_dir))


def _classifier_calibration_sql() -> str:
    from .operators.classifier import calibration_oracle_sql

    return calibration_oracle_sql(_quality_classifier_sql())


CLASSIFIER_CALIBRATION_SQL = _classifier_calibration_sql()


def langid_softmax_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised fastText-style language ID (operators/langid.py):
    hashed char-bigram features (128 md5 buckets + bias, tf-normalized)
    into a full-batch softmax-GD classifier — 6 fixed iterations,
    lr=2.0, zero init — trained on the corpus ``lang`` labels, the
    multiclass upgrade of the binary quality classifier. The oracle
    unrolls the whole softmax trajectory (margins → softmax →
    per-class gradients → weight updates) as a CTE chain, so every
    arithmetic step is certified, and the prediction rule (argmax of
    round-6 probabilities, smallest class on ties) is identical in
    both engines. NOTE the fixture's ``lang`` column is independent of
    the text (all languages share one synthetic vocabulary), so the
    honestly-trained model collapses to the label prior — the
    trajectory is what this entry certifies; learnability on separable
    labels is demonstrated by ``langid_softmax_eval`` (source-labeled,
    genuinely different word mixtures) and the planted-label tests in
    tests/test_langid.py. Per-iteration driver traffic is the
    C x 129-float gradient → EAGER."""
    from .operators.langid import langid_classifier

    t = load_tables(spark, sf_dir)
    return langid_classifier(
        t["documents"], label_col="lang", n_buckets=128, iters=6, lr=2.0,
        tf_counts=_langid_family(spark, sf_dir),
    )


def _langid_softmax_sql() -> str:
    from .operators.langid import softmax_oracle_sql

    return softmax_oracle_sql(
        n_buckets=128, iters=6, lr=2.0, label_col="lang"
    )


LANGID_SOFTMAX_SQL = _langid_softmax_sql()


def langid_softmax_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class one-vs-rest metrics for the softmax classifier trained
    on the 20 SOURCE domains (operators/langid.py::langid_eval) —
    sources carry genuinely different word mixtures (the DSIR premise),
    so above-chance per-class F1 here is the fixture's learnability
    evidence for the trainer. Same certified trajectory as
    langid_softmax_docs at a lighter operating point (64 buckets, 4
    iterations — 20 classes make each GD job and each oracle CTE ~4x
    the 5-class entry's, and the learnability signal is already clear
    here); the oracle wraps the full 20-class unrolled softmax chain
    as a subquery, aggregated to one row per true class:
    (lang, n_docs, tp, fp, fn, precision, recall, f1). Training
    collects at construction → EAGER."""
    from .operators.langid import langid_classifier, langid_eval

    t = load_tables(spark, sf_dir)
    scored = langid_classifier(
        t["documents"], label_col="source", n_buckets=64, iters=4, lr=2.0,
        tf_counts=_langid_family(spark, sf_dir),
    )
    return langid_eval(scored)


def _langid_eval_sql() -> str:
    from .operators.langid import langid_eval_oracle_sql, softmax_oracle_sql

    return langid_eval_oracle_sql(
        softmax_oracle_sql(
            n_buckets=64, iters=4, lr=2.0, label_col="source"
        )
    )


LANGID_EVAL_SQL = _langid_eval_sql()


# 3 planted "languages" with disjoint 15-char alphabets (+ shared
# space): text = md5 hex stream of the doc_id TRANSLATEd into the
# class alphabet — deterministic, engine-identical (md5 hex is
# lowercase in both; TRANSLATE is 1:1), and genuinely text-dependent:
# the class signal lives ONLY in the characters.
_LANGID_ALPHABETS = {
    "lang-a": "abcdefghijklmno ",
    "lang-b": "pqrstuvwxyz0123 ",
    "lang-c": "456789+-=_;:,.< ",
}
_LANGID_HEX = "0123456789abcdef"


def _planted_multilingual(docs: DataFrame) -> DataFrame:
    """(doc_id, text, lang): deterministic synthetic multilingual
    corpus over the documents ids — lang = doc_id % 3 mapped to a
    label whose 96-char text is TRANSLATE(md5-hex stream, hex-digits,
    class alphabet). The pytest planted-alphabet fixture promoted into
    the oracle-checked path (VERDICT r12 #5)."""
    labels = sorted(_LANGID_ALPHABETS)
    idm = F.col("doc_id") % 3
    hexstream = F.concat(
        F.md5(F.col("doc_id").cast("string")),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("x"))),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("y"))),
    )
    lang = None
    text = None
    for i, lbl in enumerate(labels):
        cond = idm == i
        tr = F.translate(hexstream, _LANGID_HEX, _LANGID_ALPHABETS[lbl])
        lang = F.when(cond, lbl) if lang is None else lang.when(cond, lbl)
        text = F.when(cond, tr) if text is None else text.when(cond, tr)
    return docs.select("doc_id", text.alias("text"), lang.alias("lang"))


def _planted_multilingual_sql() -> str:
    labels = sorted(_LANGID_ALPHABETS)
    lang = " ".join(
        f"WHEN {i} THEN '{lbl}'" for i, lbl in enumerate(labels)
    )
    hexstream = (
        "MD5(CAST(doc_id AS VARCHAR)) || "
        "MD5(CAST(doc_id AS VARCHAR) || 'x') || "
        "MD5(CAST(doc_id AS VARCHAR) || 'y')"
    )
    text = " ".join(
        f"WHEN {i} THEN TRANSLATE({hexstream}, '{_LANGID_HEX}', "
        f"'{_LANGID_ALPHABETS[lbl]}')"
        for i, lbl in enumerate(labels)
    )
    return (
        f"(SELECT doc_id, CASE doc_id % 3 {text} END AS text, "
        f"CASE doc_id % 3 {lang} END AS lang FROM documents)"
    )


def langid_planted_multilingual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEXT-DEPENDENT language-ID certification (VERDICT r12 #5):
    langid_softmax_docs honestly documents that the fixture ``lang``
    label is text-independent (the trained model collapses to the
    prior), so this entry plants three languages with DISJOINT
    alphabets over deterministic md5-hex streams — the only class
    signal is in the characters — trains the same certified softmax
    trajectory (64 buckets, 4 iters, lr=4.0), and returns the
    per-class eval metrics. The in-query gate HARD-FAILS (raises)
    unless every class recall is >= 0.9, far above the 1/3 chance
    floor, so a model that stopped reading the text cannot certify;
    the oracle replays corpus synthesis, the full GD trajectory, and
    the metrics in SQL. Training collects at construction → EAGER."""
    from .operators.langid import langid_classifier, langid_eval

    t = load_tables(spark, sf_dir)
    docs = _planted_multilingual(t["documents"])
    scored = langid_classifier(
        docs, label_col="lang", n_buckets=64, iters=4, lr=4.0
    )
    ev = langid_eval(scored)
    rows = ev.collect()
    bad = [r for r in rows if r["recall"] is None or r["recall"] < 0.9]
    if bad:
        raise ValueError(
            "planted-language recall gate failed (model is not "
            f"text-dependent): {[(r['lang'], r['recall']) for r in bad]}"
        )
    return spark.createDataFrame(rows, ev.schema)


def _langid_planted_sql() -> str:
    from .operators.langid import langid_eval_oracle_sql, softmax_oracle_sql

    return langid_eval_oracle_sql(
        softmax_oracle_sql(
            n_buckets=64, iters=4, lr=4.0, label_col="lang",
            table=_planted_multilingual_sql(),
        )
    )


LANGID_PLANTED_SQL = _langid_planted_sql()


def _unigram_sqls() -> tuple[str, str]:
    from .operators.unigram import (
        unigram_oracle_sql,
        unigram_tokenize_oracle_sql,
    )

    return unigram_oracle_sql(), unigram_tokenize_oracle_sql()


UNIGRAM_TRAIN_SQL, UNIGRAM_TOKENIZE_SQL = _unigram_sqls()


def theta_sketch_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta distinct SET-OPERATION estimates (sketch/theta.py) —
    the question HLL cannot answer: per order priority, one k=256
    sketch of distinct o_custkey is built in a SINGLE bounded two-level
    fold (theta_by_group), then every priority pair reports distinct /
    union / intersection / Jaccard ESTIMATES (customer-audience overlap
    across priorities, J ≈ 0.76 at this fixture).  hash_fn="md5"
    derives a 60-bit hash from md5's first 15 hex chars, so KMV — pure
    order statistics over a deterministic hash — is reproduced EXACTLY
    by the SQL oracle: the estimate columns hash-match, they are not
    merely row-count-gated (unique among the sketch queries).  An
    in-query gate additionally pins each per-priority estimate within
    4·RSE (RSE = 1/sqrt(k−2)) of the exact distinct count.  Sketch
    builds collect at construction → EAGER_QUERIES."""
    import itertools

    from .sketch.theta import intersection_estimate, theta_by_group

    K = 256
    t = load_tables(spark, sf_dir)
    orders = t["orders"]
    sk = theta_by_group(orders, "o_orderpriority", ["o_custkey"], k=K,
                        hash_fn="md5")
    # exact keeps NULL groups (the sketch does too, under key None —
    # ADVICE r7 #1); only NULL key VALUES are dropped, matching
    # theta_by_group's isNotNull filter on key_cols.
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.where(F.col("o_custkey").isNotNull())
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for g, s in sk.items():
        est, true = s.estimate(), exact[g]
        assert abs(est - true) <= 4.0 * s.rse() * true + 1e-9, \
            f"theta estimate out of envelope: {g} est={est} true={true}"
    rows = []
    for ta, tb in itertools.combinations(_null_first(sk), 2):
        a, b = sk[ta], sk[tb]
        eu = a.merge(b).estimate()
        ei = intersection_estimate(a, b)
        rows.append((
            ta, tb, float(a.estimate()), float(b.estimate()),
            float(eu), float(ei), float(ei / eu if eu else 0.0),
        ))
    out = spark.createDataFrame(
        rows,
        "type_a string, type_b string, est_a double, est_b double, "
        "est_union double, est_inter double, est_jaccard double",
    )
    # round IN-PLAN (the KLL r13 lesson)
    return out.select(
        "type_a", "type_b",
        *[F.round(c, 4).alias(c) for c in
          ("est_a", "est_b", "est_union", "est_inter", "est_jaccard")],
    )


# KMV is deterministic order statistics over the md5-derived 60-bit
# hash, so the ORACLE replays the whole sketch in SQL: rank the distinct
# hashes per group, keep the k smallest, theta = the k-th (full space
# 2^60 when unsaturated), estimate = n·2^60/theta with n the retained
# values strictly below theta.  Union ranks the distinct union of
# hashes (KMV mergeability: k-smallest of the union ≡ merge of the
# k-smallest sets); intersection counts kept_a ∩ kept_b below
# LEAST(theta_a, theta_b).  All divisions double-typed to mirror the
# Python float path bit-for-bit.
THETA_SKETCH_SQL = """
WITH hv AS (
  SELECT DISTINCT o_orderpriority AS et,
         CAST(('0x' || SUBSTRING(MD5(CAST(o_custkey AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
),
ranked AS (
  SELECT et, h, ROW_NUMBER() OVER (PARTITION BY et ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY et) AS cnt
  FROM hv
),
kept AS (SELECT * FROM ranked WHERE rn <= 256),
marg AS (
  SELECT et,
         CASE WHEN MAX(cnt) >= 256 THEN MAX(CASE WHEN rn = 256 THEN h END)
              ELSE 1152921504606846976 END AS th,
         CASE WHEN MAX(cnt) >= 256 THEN 255 ELSE MAX(cnt) END AS n
  FROM kept GROUP BY et
),
est AS (
  SELECT et,
         n * CAST(1152921504606846976 AS DOUBLE) / CAST(th AS DOUBLE) AS e,
         th
  FROM marg
),
pairs AS (
  SELECT a.et AS ta, b.et AS tb, a.e AS ea, a.th AS tha,
         b.e AS eb, b.th AS thb
  FROM est a JOIN est b ON a.et < b.et
),
uh AS (
  SELECT p.ta, p.tb, v.h
  FROM (SELECT DISTINCT ta, tb FROM pairs) p
  JOIN hv v ON v.et IN (p.ta, p.tb)
  GROUP BY p.ta, p.tb, v.h
),
ur AS (
  SELECT ta, tb, h,
         ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY ta, tb) AS cnt
  FROM uh
),
um AS (
  SELECT ta, tb,
         CASE WHEN MAX(cnt) >= 256 THEN MAX(CASE WHEN rn = 256 THEN h END)
              ELSE 1152921504606846976 END AS th,
         CASE WHEN MAX(cnt) >= 256 THEN 255 ELSE MAX(cnt) END AS n
  FROM ur WHERE rn <= 256 GROUP BY ta, tb
),
uest AS (
  SELECT ta, tb,
         n * CAST(1152921504606846976 AS DOUBLE) / CAST(th AS DOUBLE) AS eu
  FROM um
),
icnt AS (
  SELECT p.ta, p.tb,
         COUNT(CASE WHEN kb.h < LEAST(p.tha, p.thb) THEN 1 END) AS n
  FROM pairs p
  LEFT JOIN kept ka ON ka.et = p.ta
  LEFT JOIN kept kb ON kb.et = p.tb AND kb.h = ka.h
  GROUP BY p.ta, p.tb
),
iest AS (
  SELECT i.ta, i.tb,
         i.n * CAST(1152921504606846976 AS DOUBLE)
           / CAST(LEAST(p.tha, p.thb) AS DOUBLE) AS ei
  FROM icnt i JOIN pairs p ON p.ta = i.ta AND p.tb = i.tb
)
SELECT p.ta AS type_a, p.tb AS type_b,
       ROUND(p.ea, 4) AS est_a, ROUND(p.eb, 4) AS est_b,
       ROUND(u.eu, 4) AS est_union, ROUND(i.ei, 4) AS est_inter,
       ROUND(CASE WHEN u.eu > 0 THEN i.ei / u.eu ELSE 0.0 END, 4)
         AS est_jaccard
FROM pairs p
JOIN uest u ON u.ta = p.ta AND u.tb = p.tb
JOIN iest i ON i.ta = p.ta AND i.tb = p.tb
"""


def record_linkage_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (operators/linkage.py): match every customer to a
    deterministically-dirtied copy of itself (id offset +1,000,000,
    phone dashes stripped) — the Fellegi-Sunter blocking→scoring→
    best-match shape with NO all-pairs stage.  Blocking key = last 4
    digits of the dash-stripped phone (stable under the perturbation,
    high-cardinality → O(1) blocks at any scale); score = normalized
    Levenshtein similarity of the phone strings (JVM codegen); 1:1
    best-match window per left id.  A true pair always scores exactly
    1 − 2/13 (two dash deletions over the 13-char phone), so the
    per-nation aggregate is hash-exact vs the SQL oracle, which mirrors
    the block-cap guard, the scoring formula, and the tie-broken
    best-match window."""
    from .operators.linkage import link_records

    t = load_tables(spark, sf_dir)
    customer = t["customer"]
    # the synthetic customer table has no phone column — derive a
    # deterministic 13-char pseudo-phone from md5(custkey) (identical
    # hex in both engines), dash-grouped 3-4-4
    phone = (
        "concat(substring(md5(cast(c_custkey as string)), 1, 3), '-', "
        "substring(md5(cast(c_custkey as string)), 4, 4), '-', "
        "substring(md5(cast(c_custkey as string)), 8, 4))"
    )
    base = customer.select(
        "c_custkey", F.expr(phone).alias("c_phone")
    )
    left = base.select(
        "c_custkey", "c_phone",
        F.expr("right(replace(c_phone, '-', ''), 4)").alias("blk"),
    )
    dirty = base.select(
        (F.col("c_custkey") + 1_000_000).alias("d_id"),
        F.expr("replace(c_phone, '-', '')").alias("d_phone"),
    ).withColumn("blk", F.expr("right(d_phone, 4)"))
    links = link_records(
        left, dirty,
        left_id="c_custkey", right_id="d_id",
        block_left=["blk"], block_right=["blk"],
        compare=[("c_phone", "d_phone")],
        threshold=0.6, block_cap=10_000, best_match=True,
    )
    return (
        links.join(customer.select("c_custkey", "c_nationkey"),
                   on="c_custkey")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.sum(
                F.when(F.col("d_id") - 1_000_000 == F.col("c_custkey"), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_correct"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("c_nationkey")
    )


RECORD_LINKAGE_SQL = """
WITH ph AS (
  SELECT c_custkey,
         SUBSTRING(MD5(CAST(c_custkey AS VARCHAR)), 1, 3) || '-' ||
         SUBSTRING(MD5(CAST(c_custkey AS VARCHAR)), 4, 4) || '-' ||
         SUBSTRING(MD5(CAST(c_custkey AS VARCHAR)), 8, 4) AS c_phone
  FROM customer
),
l AS (
  SELECT c_custkey AS lid, c_phone,
         right(replace(c_phone, '-', ''), 4) AS blk
  FROM ph
),
r AS (
  SELECT c_custkey + 1000000 AS rid,
         replace(c_phone, '-', '') AS d_phone,
         right(replace(c_phone, '-', ''), 4) AS blk
  FROM ph
),
ln AS (SELECT blk, COUNT(*) AS nl FROM l GROUP BY blk),
rn AS (SELECT blk, COUNT(*) AS nr FROM r GROUP BY blk),
ok AS (
  SELECT ln.blk FROM ln JOIN rn ON rn.blk = ln.blk
  WHERE ln.nl * rn.nr <= 10000
),
cand AS (
  SELECT l.lid, r.rid,
         1.0 - levenshtein(l.c_phone, r.d_phone)
             / GREATEST(LENGTH(l.c_phone), LENGTH(r.d_phone), 1) AS score
  FROM l JOIN ok ON ok.blk = l.blk JOIN r ON r.blk = l.blk
),
matched AS (
  SELECT lid, rid, score,
         ROW_NUMBER() OVER (PARTITION BY lid
                            ORDER BY score DESC, rid ASC) AS rk
  FROM cand WHERE score >= 0.6
)
SELECT c.c_nationkey, COUNT(*) AS n_links,
       CAST(SUM(CASE WHEN m.rid - 1000000 = m.lid THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       ROUND(AVG(m.score), 4) AS avg_score
FROM matched m
JOIN customer c ON c.c_custkey = m.lid
WHERE m.rk = 1
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


def entity_resolution_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution (operators/linkage.py::
    resolve_entities): every customer is linked against TWO
    independently-dirtied copies (dashes stripped / dashes→dots, id
    offsets +1M/+2M), the two best-match pair sets union into a link
    graph, and pointer-jumping connected components folds each
    original + its two variants into ONE entity — the >2-way merge a
    pairwise matcher alone cannot express.  Output is the entity-size
    histogram (all size 3 when no spurious cross-customer link forms).
    Oracle replays both linkage runs and the transitive closure as a
    recursive CTE."""
    from .operators.linkage import link_records, resolve_entities

    t = load_tables(spark, sf_dir)
    customer = t["customer"]
    phone = (
        "concat(substring(md5(cast(c_custkey as string)), 1, 3), '-', "
        "substring(md5(cast(c_custkey as string)), 4, 4), '-', "
        "substring(md5(cast(c_custkey as string)), 8, 4))"
    )
    base = customer.select("c_custkey", F.expr(phone).alias("c_phone"))
    left = base.select(
        "c_custkey", "c_phone",
        F.expr("right(replace(c_phone, '-', ''), 4)").alias("blk"),
    )

    def dirty(offset: int, repl: str):
        return base.select(
            (F.col("c_custkey") + offset).alias("d_id"),
            F.expr(f"replace(c_phone, '-', '{repl}')").alias("d_phone"),
        ).withColumn(
            "blk", F.expr(f"right(replace(d_phone, '{repl}', ''), 4)")
            if repl else F.expr("right(d_phone, 4)")
        )

    pair_sets = []
    for offset, repl in ((1_000_000, ""), (2_000_000, ".")):
        links = link_records(
            left, dirty(offset, repl),
            left_id="c_custkey", right_id="d_id",
            block_left=["blk"], block_right=["blk"],
            compare=[("c_phone", "d_phone")],
            threshold=0.6, block_cap=10_000, best_match=True,
        )
        pair_sets.append(links.select(
            F.col("c_custkey").alias("id_l"), F.col("d_id").alias("id_r")
        ))
    pairs = pair_sets[0].unionByName(pair_sets[1])
    vertices = (
        base.select(F.col("c_custkey").alias("vid"))
        .unionByName(base.select((F.col("c_custkey") + 1_000_000).alias("vid")))
        .unionByName(base.select((F.col("c_custkey") + 2_000_000).alias("vid")))
    )
    ents = resolve_entities(
        pairs, vertices, id_col="vid", left_id="id_l", right_id="id_r"
    )
    return (
        ents.groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .orderBy("size")
    )


ENTITY_RESOLUTION_SQL = """
WITH RECURSIVE ph AS (
  SELECT c_custkey,
         SUBSTRING(MD5(CAST(c_custkey AS VARCHAR)), 1, 3) || '-' ||
         SUBSTRING(MD5(CAST(c_custkey AS VARCHAR)), 4, 4) || '-' ||
         SUBSTRING(MD5(CAST(c_custkey AS VARCHAR)), 8, 4) AS c_phone
  FROM customer
),
l AS (
  SELECT c_custkey AS lid, c_phone,
         right(replace(c_phone, '-', ''), 4) AS blk
  FROM ph
),
ra AS (
  SELECT c_custkey + 1000000 AS rid, replace(c_phone, '-', '') AS d_phone,
         right(replace(c_phone, '-', ''), 4) AS blk
  FROM ph
),
rb AS (
  SELECT c_custkey + 2000000 AS rid, replace(c_phone, '-', '.') AS d_phone,
         right(replace(replace(c_phone, '-', '.'), '.', ''), 4) AS blk
  FROM ph
),
la AS (SELECT blk, COUNT(*) AS n FROM l GROUP BY blk),
ra_n AS (SELECT blk, COUNT(*) AS n FROM ra GROUP BY blk),
rb_n AS (SELECT blk, COUNT(*) AS n FROM rb GROUP BY blk),
ok_a AS (SELECT la.blk FROM la JOIN ra_n ON ra_n.blk = la.blk
         WHERE la.n * ra_n.n <= 10000),
ok_b AS (SELECT la.blk FROM la JOIN rb_n ON rb_n.blk = la.blk
         WHERE la.n * rb_n.n <= 10000),
cand_a AS (
  SELECT l.lid, r.rid,
         1.0 - levenshtein(l.c_phone, r.d_phone)
             / GREATEST(LENGTH(l.c_phone), LENGTH(r.d_phone), 1) AS score
  FROM l JOIN ok_a ON ok_a.blk = l.blk JOIN ra r ON r.blk = l.blk
),
cand_b AS (
  SELECT l.lid, r.rid,
         1.0 - levenshtein(l.c_phone, r.d_phone)
             / GREATEST(LENGTH(l.c_phone), LENGTH(r.d_phone), 1) AS score
  FROM l JOIN ok_b ON ok_b.blk = l.blk JOIN rb r ON r.blk = l.blk
),
best_a AS (
  SELECT lid, rid FROM (
    SELECT lid, rid,
           ROW_NUMBER() OVER (PARTITION BY lid
                              ORDER BY score DESC, rid ASC) AS rk
    FROM cand_a WHERE score >= 0.6
  ) WHERE rk = 1
),
best_b AS (
  SELECT lid, rid FROM (
    SELECT lid, rid,
           ROW_NUMBER() OVER (PARTITION BY lid
                              ORDER BY score DESC, rid ASC) AS rk
    FROM cand_b WHERE score >= 0.6
  ) WHERE rk = 1
),
pr AS (SELECT lid AS id_a, rid AS id_b FROM best_a
       UNION ALL SELECT lid, rid FROM best_b),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pr
  UNION
  SELECT id_b, id_a FROM pr
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
verts AS (
  SELECT c_custkey AS vid FROM ph
  UNION ALL SELECT c_custkey + 1000000 FROM ph
  UNION ALL SELECT c_custkey + 2000000 FROM ph
),
ents AS (
  SELECT v.vid,
         LEAST(v.vid, COALESCE(MIN(r.dst), v.vid)) AS entity_id
  FROM verts v LEFT JOIN reach r ON r.src = v.vid
  GROUP BY v.vid
),
sizes AS (SELECT entity_id, COUNT(*) AS size FROM ents GROUP BY entity_id)
SELECT size, COUNT(*) AS n_entities FROM sizes GROUP BY size ORDER BY size
"""


def join_size_estimate_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS inner-product join-cardinality forecasting
    (operators/joinest.py — Cormode–Muthukrishnan §4.2): predict the
    output row count of an equi-join WITHOUT running it, from two
    bounded (depth × width) bucket-count aggregates.  Two joins are
    forecast: the many-to-many lineitem self-join on l_partkey (the
    case where a planner must decide between shuffle and skew_join) and
    the FK orders⋈customer join.  md5 bucketing makes the estimate
    itself deterministic, so the oracle replays the full sketch —
    estimates included — in SQL; ``within_bound`` additionally gates
    the analytic contract (never undershoots, overshoot ≤ 6× expected
    collision mass Na·Nb/width; width 2^20 — nonzero cells are bounded by distinct keys, so a wide sketch is free)."""
    from .operators.joinest import join_size_report

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_partkey")
    r1 = join_size_report(li, li, "l_partkey", "l_partkey", width=1 << 20).select(
        F.lit("lineitem_self_partkey").alias("join_name"), "*"
    )
    r2 = join_size_report(
        t["orders"].select("o_custkey"),
        t["customer"].select("c_custkey"),
        "o_custkey",
        "c_custkey",
        width=1 << 20,
    ).select(F.lit("orders_customer").alias("join_name"), "*")
    return r1.unionByName(r2).orderBy("join_name")


JOIN_SIZE_CMS_SQL = """
WITH li AS (SELECT l_partkey AS k FROM lineitem WHERE l_partkey IS NOT NULL),
a1 AS (
  SELECT d,
         CAST(('0x' || SUBSTRING(MD5(CAST(d AS VARCHAR) || chr(1)
               || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 1048576 AS bucket,
         COUNT(*) AS n
  FROM li, UNNEST([0, 1, 2, 3, 4]) AS u(d) GROUP BY 1, 2
),
est1 AS (SELECT MIN(dot) AS est FROM (
  SELECT d, SUM(n * n) AS dot FROM a1 GROUP BY d)),
tru1 AS (SELECT SUM(c * c) AS tru FROM (
  SELECT COUNT(*) AS c FROM li GROUP BY k)),
n1 AS (SELECT COUNT(*) AS n FROM li),
o AS (SELECT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL),
c AS (SELECT c_custkey AS k FROM customer WHERE c_custkey IS NOT NULL),
a2 AS (
  SELECT d,
         CAST(('0x' || SUBSTRING(MD5(CAST(d AS VARCHAR) || chr(1)
               || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 1048576 AS bucket,
         COUNT(*) AS n
  FROM o, UNNEST([0, 1, 2, 3, 4]) AS u(d) GROUP BY 1, 2
),
b2 AS (
  SELECT d,
         CAST(('0x' || SUBSTRING(MD5(CAST(d AS VARCHAR) || chr(1)
               || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 1048576 AS bucket,
         COUNT(*) AS m
  FROM c, UNNEST([0, 1, 2, 3, 4]) AS u(d) GROUP BY 1, 2
),
est2 AS (SELECT MIN(dot) AS est FROM (
  SELECT a2.d, SUM(a2.n * b2.m) AS dot
  FROM a2 JOIN b2 ON b2.d = a2.d AND b2.bucket = a2.bucket GROUP BY a2.d)),
tru2 AS (SELECT SUM(oc.n * cc.m) AS tru FROM
  (SELECT k, COUNT(*) AS n FROM o GROUP BY k) oc JOIN
  (SELECT k, COUNT(*) AS m FROM c GROUP BY k) cc ON cc.k = oc.k),
n2a AS (SELECT COUNT(*) AS n FROM o),
n2b AS (SELECT COUNT(*) AS n FROM c),
rows_out AS (
  SELECT 'lineitem_self_partkey' AS join_name,
         CAST(tru AS BIGINT) AS true_join_rows,
         CAST(est AS BIGINT) AS est_join_rows,
         ROUND(CAST(est - tru AS DOUBLE) / GREATEST(tru, 1), 6) AS rel_err,
         est >= tru AND est <= tru + 6.0 * n1.n * n1.n / 1048576 AS within_bound
  FROM est1, tru1, n1
  UNION ALL
  SELECT 'orders_customer',
         CAST(tru AS BIGINT), CAST(est AS BIGINT),
         ROUND(CAST(est - tru AS DOUBLE) / GREATEST(tru, 1), 6),
         est >= tru AND est <= tru + 6.0 * n2a.n * n2b.n / 1048576
  FROM est2, tru2, n2a, n2b
)
SELECT * FROM rows_out ORDER BY join_name
"""


def adaptive_join_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evidence-based join planning (operators/adaptive.py): three join
    shapes probe into the three strategies — supplier is small enough
    to BROADCAST (capped right-side count), orders⋈lineitem has no hot
    key so it stays on Catalyst's plain SHUFFLE, and a synthetically
    hot-keyed lineitem (40% of rows on one key) routes through
    skew_join (SKEW).  Each row carries the decision inputs AND the
    executed join's row count, so the oracle — which replays the capped
    counts, hot-key probe, CASE logic, and plain-join counts in SQL —
    certifies both the decision and the execution."""
    from .operators.adaptive import adaptive_join, plan_equi_join

    t = load_tables(spark, sf_dir)
    conf = SkewJoinConf(replication_factor=0.01, hot_threshold=200)
    li, orders, supplier = t["lineitem"], t["orders"], t["supplier"]
    hot_li = li.select(
        F.when(F.col("l_linenumber") >= 4, F.lit(-999))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_linenumber",
    )
    cases = [
        ("broadcast_supplier", li, supplier, [("l_suppkey", "s_suppkey")]),
        ("shuffle_orders", li, orders, [("l_orderkey", "o_orderkey")]),
        ("skew_hot_key", hot_li, orders, [("k", "o_orderkey")]),
    ]
    # the three cases' probe pairs (capped right count + left hot-key
    # aggregate) are independent driver actions — run them concurrently
    # (guide §2.6) and feed each result into BOTH the report row and
    # adaptive_join, which previously re-ran the identical probes
    # (guide §1.2: 12 probe actions -> 6, overlapped to ~2 walls)
    plans = _par_actions(*[
        (lambda l=left, r=right, o=on: plan_equi_join(
            l, r, o, conf, broadcast_rows=1000
        ))
        for name, left, right, on in cases
    ])
    out = None
    for (name, left, right, on), plan in zip(cases, plans):
        joined = adaptive_join(
            left, right, on, "inner", conf, broadcast_rows=1000, plan=plan
        )
        row = joined.agg(F.count(F.lit(1)).alias("join_rows")).select(
            F.lit(name).alias("case_name"),
            F.lit(plan["strategy"]).alias("strategy"),
            F.lit(plan["n_right_capped"]).cast("long").alias("n_right_capped"),
            F.lit(plan["n_hot_keys"]).cast("long").alias("n_hot_keys"),
            F.lit(plan["max_key_freq"]).cast("long").alias("max_key_freq"),
            F.col("join_rows"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("case_name")


ADAPTIVE_JOIN_SQL = """
WITH sup AS (SELECT LEAST(COUNT(*), 1001) AS nr FROM supplier),
ord AS (SELECT LEAST(COUNT(*), 1001) AS nr FROM orders),
f_sup AS (
  SELECT COUNT(*) FILTER (n >= 200) AS hot, MAX(n) AS mx FROM (
    SELECT COUNT(*) AS n FROM lineitem GROUP BY l_suppkey)
),
f_ord AS (
  SELECT COUNT(*) FILTER (n >= 200) AS hot, MAX(n) AS mx FROM (
    SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey)
),
f_hot AS (
  SELECT COUNT(*) FILTER (n >= 200) AS hot, MAX(n) AS mx FROM (
    SELECT COUNT(*) AS n FROM lineitem
    GROUP BY CASE WHEN l_linenumber >= 4 THEN -999 ELSE l_orderkey END)
),
j_sup AS (SELECT COUNT(*) AS jr FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey),
j_ord AS (SELECT COUNT(*) AS jr FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey),
j_hot AS (SELECT COUNT(*) AS jr FROM lineitem l
          JOIN orders o ON o.o_orderkey =
            CASE WHEN l.l_linenumber >= 4 THEN -999 ELSE l.l_orderkey END)
SELECT 'broadcast_supplier' AS case_name,
       CASE WHEN sup.nr <= 1000 THEN 'broadcast'
            WHEN f_sup.hot > 0 THEN 'skew' ELSE 'shuffle' END AS strategy,
       CAST(sup.nr AS BIGINT) AS n_right_capped,
       CAST(f_sup.hot AS BIGINT) AS n_hot_keys,
       CAST(f_sup.mx AS BIGINT) AS max_key_freq,
       CAST(j_sup.jr AS BIGINT) AS join_rows
FROM sup, f_sup, j_sup
UNION ALL
SELECT 'shuffle_orders',
       CASE WHEN ord.nr <= 1000 THEN 'broadcast'
            WHEN f_ord.hot > 0 THEN 'skew' ELSE 'shuffle' END,
       CAST(ord.nr AS BIGINT), CAST(f_ord.hot AS BIGINT),
       CAST(f_ord.mx AS BIGINT), CAST(j_ord.jr AS BIGINT)
FROM ord, f_ord, j_ord
UNION ALL
SELECT 'skew_hot_key',
       CASE WHEN ord.nr <= 1000 THEN 'broadcast'
            WHEN f_hot.hot > 0 THEN 'skew' ELSE 'shuffle' END,
       CAST(ord.nr AS BIGINT), CAST(f_hot.hot AS BIGINT),
       CAST(f_hot.mx AS BIGINT), CAST(j_hot.jr AS BIGINT)
FROM ord, f_hot, j_hot
ORDER BY case_name
"""


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profiling (operators/profile.py): per-column
    count / nulls / exact distincts / numeric min-max-mean / string
    min-max over five orders columns, all planned into ONE aggregation
    (the scan is the cost at 100 TB — per-column jobs would multiply
    it).  Means go through exact decimal sums so the doubles are
    accumulation-order independent; numeric and string extrema surface
    in separate typed columns (never engine-specific float→string
    casts)."""
    from .operators.profile import profile_table

    t = load_tables(spark, sf_dir)
    return profile_table(
        t["orders"],
        ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
         "o_orderstatus"],
    ).orderBy("column")


PROFILE_ORDERS_SQL = """
SELECT 'o_custkey' AS "column", 'bigint' AS dtype,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS DOUBLE) AS min_num,
       CAST(MAX(o_custkey) AS DOUBLE) AS max_num,
       ROUND(CAST(SUM(CAST(o_custkey AS DECIMAL(30,8))) AS DOUBLE)
             / COUNT(o_custkey), 6) AS mean,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_orderkey', 'bigint', COUNT(*),
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_orderkey),
       CAST(MIN(o_orderkey) AS DOUBLE), CAST(MAX(o_orderkey) AS DOUBLE),
       ROUND(CAST(SUM(CAST(o_orderkey AS DECIMAL(30,8))) AS DOUBLE)
             / COUNT(o_orderkey), 6),
       NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderpriority', 'string', COUNT(*),
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_orderpriority),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderstatus', 'string', COUNT(*),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_orderstatus),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice', 'double', COUNT(*),
       CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_totalprice),
       CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE),
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
             / COUNT(o_totalprice), 6),
       NULL, NULL
FROM orders
ORDER BY "column"
"""


def schema_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift detection (operators/profile.py::schema_drift)
    between orders and an in-query mutated v2 — a column added
    (o_channel), one removed (o_orderstatus), one retyped (o_custkey
    bigint→string), one with injected nulls (o_totalprice, ~30% where
    o_orderkey%10<3 — null-rate drift), one collapsed to a constant
    (o_orderpriority 5→1 distincts — distinct drift).  The oracle
    recomputes both versions' stats and derives the same report."""
    from .operators.profile import schema_drift

    t = load_tables(spark, sf_dir)
    old = t["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
        "o_orderstatus",
    )
    new = t["orders"].select(
        "o_orderkey",
        F.col("o_custkey").cast("string").alias("o_custkey"),
        F.when(F.col("o_orderkey") % 10 < 3, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.lit("1-URGENT").alias("o_orderpriority"),
        F.lit(1).alias("o_channel"),
    )
    return schema_drift(old, new)


SCHEMA_DRIFT_SQL = """
WITH stats AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT o_orderpriority) AS nd_prio_old,
         SUM(CASE WHEN o_orderkey % 10 < 3 THEN 1 ELSE 0 END) AS n_nulled
  FROM orders
)
SELECT 'o_channel' AS "column", 'column_added' AS change, 'int' AS detail
FROM stats
UNION ALL
SELECT 'o_custkey', 'dtype_changed', 'bigint -> string' FROM stats
UNION ALL
SELECT 'o_orderpriority', 'distinct_drift',
       CAST(nd_prio_old AS VARCHAR) || ' -> 1'
FROM stats
UNION ALL
SELECT 'o_orderstatus', 'column_removed', 'string' FROM stats
UNION ALL
SELECT 'o_totalprice', 'null_rate_drift',
       '0.0 -> ' || CAST(ROUND(CAST(n_nulled AS DOUBLE) / n, 4) AS VARCHAR)
FROM stats
ORDER BY "column", change
"""


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl URL canonicalization (functions/text.py::canonicalize_url):
    every order synthesizes the same page fetched two messy ways —
    uppercase scheme/host + default :443 port + trailing slash +
    fragment + shuffled/tracking query params vs the clean form — and
    canonicalization must fold each pair to ONE key (the dedup step a
    crawl pipeline runs before any content hash).  Pure codegen string
    ladder; the oracle replays every step in ANSI SQL, so group counts
    AND the canonical string format itself are EXACT-checked."""
    from .functions.text import canonicalize_url

    t = load_tables(spark, sf_dir)
    o = t["orders"].select(
        (F.col("o_orderkey") % 50).cast("string").alias("s"),
        F.col("o_orderkey").cast("string").alias("k"),
    )
    u1 = o.select(
        F.concat(
            F.lit("HTTPS://Shop"), F.col("s"), F.lit(".Example.COM:443/item/"),
            F.col("k"), F.lit("/?utm_source=feed&b=2&a=1#frag"),
        ).alias("url")
    )
    u2 = o.select(
        F.concat(
            F.lit("https://shop"), F.col("s"), F.lit(".example.com/item/"),
            F.col("k"), F.lit("?a=1&b=2&utm_campaign=x"),
        ).alias("url")
    )
    groups = (
        u1.unionByName(u2)
        .select(canonicalize_url("url").alias("canon"))
        .groupBy("canon")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return groups.agg(
        F.sum("n").cast("long").alias("n_urls"),
        F.count(F.lit(1)).cast("long").alias("n_canonical"),
        F.min("n").cast("long").alias("min_group"),
        F.max("n").cast("long").alias("max_group"),
        F.min("canon").alias("sample_canonical"),
    )


URL_CANONICAL_SQL = """
WITH u AS (
  SELECT 'HTTPS://Shop' || CAST(o_orderkey % 50 AS VARCHAR)
         || '.Example.COM:443/item/' || CAST(o_orderkey AS VARCHAR)
         || '/?utm_source=feed&b=2&a=1#frag' AS url
  FROM orders
  UNION ALL
  SELECT 'https://shop' || CAST(o_orderkey % 50 AS VARCHAR)
         || '.example.com/item/' || CAST(o_orderkey AS VARCHAR)
         || '?a=1&b=2&utm_campaign=x'
  FROM orders
),
c1 AS (
  SELECT split_part(split_part(url, '#', 1), '?', 1) AS base,
         CASE WHEN position('?' IN split_part(url, '#', 1)) > 0
              THEN split_part(split_part(url, '#', 1), '?', 2)
              ELSE '' END AS query
  FROM u
),
c2 AS (
  SELECT lower(split_part(base, '://', 1)) AS scheme,
         split_part(base, '://', 2) AS rest, query
  FROM c1
),
c3 AS (
  SELECT scheme, query,
         lower(split_part(rest, '/', 1)) AS hostport,
         CASE WHEN position('/' IN rest) > 0
              THEN substring(rest, position('/' IN rest))
              ELSE '' END AS path0
  FROM c2
),
c4 AS (
  SELECT scheme,
         CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
              WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
              ELSE hostport END AS host,
         CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(path0, '/+$', '') END AS path,
         list_sort(list_filter(string_split(query, '&'),
           p -> p <> '' AND NOT starts_with(p, 'utm_')
                AND NOT starts_with(p, 'gclid=')
                AND NOT starts_with(p, 'fbclid=')
                AND NOT starts_with(p, 'msclkid='))) AS params
  FROM c3
),
c AS (
  SELECT scheme || '://' || host || path ||
         CASE WHEN len(params) > 0
              THEN '?' || array_to_string(params, '&') ELSE '' END AS canon
  FROM c4
),
g AS (SELECT canon, COUNT(*) AS n FROM c GROUP BY canon)
SELECT CAST(SUM(n) AS BIGINT) AS n_urls,
       CAST(COUNT(*) AS BIGINT) AS n_canonical,
       CAST(MIN(n) AS BIGINT) AS min_group,
       CAST(MAX(n) AS BIGINT) AS max_group,
       MIN(canon) AS sample_canonical
FROM g
"""


def bpe_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (operators/bpe.py — Sennrich et al. 2016):
    16 merges learned from the documents corpus.  The corpus is touched
    ONCE (word-frequency aggregation); merge learning runs on the
    bounded distinct-word table.  Deterministic tie-break (count DESC,
    pair ASC) makes the merge list stable, so the oracle replays all 16
    rounds as an unrolled CTE chain (wrapped-symbol string replace ==
    the greedy single-pass merge) and the merge list is EXACT-checked;
    driver-vs-distributed parity and the canonical-example merge order
    stay pinned in tests/test_bpe.py.  r15: reads the shared tok
    family (one word-table collect + one training serves this entry
    and bpe_tokenize_docs — bit-identical merges, test_tok_family)."""
    merges = _tok_family(spark, sf_dir)["bpe"]
    return spark.createDataFrame(
        [(r, a, b, a + b, n) for r, a, b, n in merges],
        "rank int, left string, right string, merged string, pair_count long",
    ).orderBy("rank")


def bpe_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE application (operators/bpe.py::apply_bpe): tokenize the
    corpus with the 16 learned merges and SELF-CERTIFY losslessness in
    the output — rebuilding each document from its tokens (concat, then
    split on the end-of-word marker) must recover the lowercased words
    exactly, so ``n_lossless`` must equal ``n_docs``.  The oracle
    replays training and reads per-word token counts off the final
    merge state (rank-order replay ≡ lowest-rank-first application:
    merge components always have strictly lower creation rank), so
    total_tokens / tokens_per_word are EXACT-checked; the in-query
    lossless gate additionally pins the apply path."""
    from .operators.bpe import EOW, apply_bpe

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    merges = _tok_family(spark, sf_dir)["bpe"]
    toks = apply_bpe(docs, merges)
    joined = toks.join(docs.select("doc_id", "text"), "doc_id")
    expected = F.concat_ws(
        "",
        F.transform(
            F.split(F.lower(F.col("text")), r"\s+"),
            lambda w: F.when(w != "", F.concat(w, F.lit(EOW))).otherwise(""),
        ),
    )
    per_doc = joined.select(
        F.size("bpe_tokens").alias("n_toks"),
        (F.concat_ws("", F.col("bpe_tokens")) == expected)
        .cast("int")
        .alias("lossless"),
        (F.size(F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                         lambda w: w != ""))).alias("n_words"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("lossless").alias("n_lossless"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.round(F.sum("n_toks") / F.sum("n_words"), 4).alias(
            "tokens_per_word"
        ),
    )


def unigram_tokenizer_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer TRAINING
    (operators/unigram.py — Kudo 2018): substring seed vocabulary,
    3 hard-EM rounds (Viterbi counts, integer log-probs, total
    tie-break), prune to the top-40 pieces. The corpus is touched once
    (word-frequency aggregation); EM runs on the bounded word table.
    The oracle unrolls every EM round — recursive-CTE segmentation
    enumeration + the trainer's exact (score, n_pieces, path)
    tie-break — so every intermediate count is certified, the
    unrolled-GD/BPE precedent. Output logprobs are recomputed in-plan
    (F.round) from the certified integer counts. Driver-vs-distributed
    parity is pinned in tests/test_unigram.py. Training collects at
    construction → EAGER."""
    vocab = _tok_family(spark, sf_dir)["uni"]
    total = float(sum(c for _, c, _ in vocab))
    df = spark.createDataFrame(
        [(p, c) for p, c, _ in vocab], "piece string, count long"
    )
    return df.select(
        "piece",
        "count",
        F.round(F.log(F.col("count") / F.lit(total)), 6).alias("logprob"),
    ).orderBy(F.col("count").desc(), "piece")


def unigram_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer APPLICATION (operators/unigram.py::
    apply_unigram): tokenize the corpus with the trained 40-piece
    vocabulary via the Arrow word-memo idiom and SELF-CERTIFY
    losslessness — concatenating each doc's pieces must rebuild its
    whitespace-stripped lowercased text, so n_lossless must equal
    n_docs. The oracle replays training AND application (kept-vocab
    Viterbi with the single-char OOV floor, fallback-averse two-phase
    preference), so total_pieces / pieces_per_word are EXACT-checked
    while the lossless gate pins the engine's actual apply output."""
    from .operators.unigram import apply_unigram

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    vocab = _tok_family(spark, sf_dir)["uni"]
    toks = apply_unigram(docs, vocab)
    joined = toks.join(docs.select("doc_id", "text"), "doc_id")
    stripped = F.regexp_replace(F.lower("text"), r"\s+", "")
    n_words = F.size(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    )
    per_doc = joined.select(
        "n_pieces",
        (F.concat_ws("", "pieces") == stripped).cast("int").alias(
            "lossless"
        ),
        n_words.alias("n_words"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("lossless").cast("long").alias("n_lossless"),
        F.sum("n_pieces").cast("long").alias("total_pieces"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.round(F.sum("n_pieces") / F.sum("n_words"), 4).alias(
            "pieces_per_word"
        ),
    )


def wordpiece_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece tokenizer TRAINING (operators/wordpiece.py — Schuster
    & Nakajima 2012, Wu et al. 2016 §4.1, the BERT tokenizer): 16
    merges learned from the documents corpus by likelihood-gain
    scoring — score(a,b) = count(ab)/(count(a)·count(b)) as an IEEE
    double, the identical operation in Python, Spark and DuckDB, so
    the argmax is bit-identical in all three.  Completes the trainer
    triad next to BPE (frequency merges) and unigram-LM (EM).  The
    corpus is touched ONCE (word-frequency aggregation); merge
    learning runs on the bounded distinct-word table.  The oracle
    unrolls all 16 rounds as a CTE chain and certifies the FULL argmax
    input — pair count and both symbol counts per round — not just the
    winning pair.  Driver-vs-distributed parity is pinned in
    tests/test_wordpiece.py.  Training collects at construction →
    EAGER."""
    merges = _tok_family(spark, sf_dir)["wp"]
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, "
        "pair_count long, left_count long, right_count long",
    ).orderBy("rank")


def wordpiece_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece APPLICATION (operators/wordpiece.py::apply_wordpiece):
    greedy longest-match-first ("maximal munch") tokenization with the
    ## continuation convention and whole-word [UNK] fallback — NOT a
    merge replay (the BPE shortcut doesn't apply to WordPiece), so the
    oracle precomputes the greedy step table (longest vocab match per
    (word, position)) and walks it with a recursive CTE.  Losslessness
    is SELF-CERTIFIED in the output: rebuilding each document from its
    pieces (## stripped, concatenated) must recover the
    whitespace-stripped lowercased text with zero [UNK] words, so
    n_lossless must equal n_docs on the training corpus (the full
    alphabet is in-vocab by construction)."""
    from .operators.wordpiece import apply_wordpiece

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    vocab = _tok_family(spark, sf_dir)["wp_vocab"]
    toks = apply_wordpiece(docs, vocab)
    joined = toks.join(docs.select("doc_id", "text"), "doc_id")
    stripped = F.regexp_replace(F.lower("text"), r"\s+", "")
    rebuilt = F.concat_ws(
        "",
        F.transform(
            "pieces",
            lambda p: F.when(
                p.startswith("##"), F.substring(p, 3, 1 << 20)
            ).otherwise(p),
        ),
    )
    n_words = F.size(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    )
    per_doc = joined.select(
        "n_pieces",
        "n_unk_words",
        ((rebuilt == stripped) & (F.col("n_unk_words") == 0))
        .cast("int")
        .alias("lossless"),
        n_words.alias("n_words"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("lossless").cast("long").alias("n_lossless"),
        F.sum("n_unk_words").cast("long").alias("n_unk_words"),
        F.sum("n_pieces").cast("long").alias("total_pieces"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.round(F.sum("n_pieces") / F.sum("n_words"), 4).alias(
            "pieces_per_word"
        ),
    )


def _wordpiece_sqls() -> tuple[str, str]:
    from .operators.wordpiece import (
        wordpiece_oracle_sql,
        wordpiece_tokenize_oracle_sql,
    )

    return wordpiece_oracle_sql(16), wordpiece_tokenize_oracle_sql(16)


WORDPIECE_TRAIN_SQL, WORDPIECE_TOKENIZE_SQL = _wordpiece_sqls()


def _bpe_chain_ctes(n_merges: int) -> str:
    """The shared CTE chain replaying ``n_merges`` BPE rounds in DuckDB
    (VERDICT r7 #4 — the unrolled-recurrence oracle technique of
    holt_winters/pagerank applied to merge learning).

    Symbol lists ride as strings with each symbol wrapped in
    chr(30)…chr(31) (absent from the corpus — asserted impossible to
    collide by the WHERE guard in ``w``): ``replace()`` scans
    left-to-right over non-overlapping occurrences, which IS the greedy
    single-pass merge of operators/bpe.py::_merge_expr, and the
    wrapping makes a cross-symbol-boundary match impossible (the
    fixtures contain neither control char — if a regenerated corpus
    ever did, the vocabularies would diverge and the driver row would
    flag MISMATCH loudly rather than pass silently). Round r:
    adjacent-pair counts from splitting the encoded string, top-1 by
    (count DESC, pair ASC) — the training tie-break — then one replace.
    """
    so, sc = "chr(30)", "chr(31)"  # symbol open/close wrappers
    parts = [f"""w AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT UNNEST(regexp_split_to_array(LOWER(text), '\\s+')) AS word
    FROM documents
  ) WHERE word <> ''
  GROUP BY word
),
enc0 AS MATERIALIZED (
  SELECT word, freq,
         regexp_replace(word, '(.)', {so} || '\\1' || {sc}, 'g')
           || {so} || '</w>' || {sc} AS enc
  FROM w
)"""]
    for r in range(n_merges):
        parts.append(f"""p{r} AS (
  SELECT lst[i] AS l, lst[i + 1] AS r2, SUM(freq) AS cnt
  FROM (SELECT freq,
               string_split(substring(enc, 2, length(enc) - 2),
                            {sc} || {so}) AS lst
        FROM enc{r}) t,
       UNNEST(range(1, len(lst))) AS u(i)
  GROUP BY 1, 2
),
b{r} AS MATERIALIZED (
  SELECT l, r2, cnt FROM p{r} ORDER BY cnt DESC, l, r2 LIMIT 1
),
enc{r + 1} AS MATERIALIZED (
  SELECT word, freq,
         replace(enc,
                 {so} || b.l || {sc} || {so} || b.r2 || {sc},
                 {so} || b.l || b.r2 || {sc}) AS enc
  FROM enc{r}, b{r} b
)""")
    return ",\n".join(parts)


def _bpe_train_oracle_sql(n_merges: int = 16) -> str:
    rows = "\n  UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS rank, l AS \"left\", r2 AS \"right\", "
        f"l || r2 AS merged, CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(n_merges)
    )
    return (f"WITH {_bpe_chain_ctes(n_merges)}\n"
            f"SELECT * FROM (\n  {rows}\n) ORDER BY rank")


def _bpe_tokenize_oracle_sql(n_merges: int = 16) -> str:
    """Replays training, then derives per-word token counts from the
    FINAL encoded state (rank-order replay ≡ lowest-rank-first
    apply_bpe: every merge's components have strictly lower creation
    rank, so application order cannot diverge). Losslessness is
    asserted structurally — tokens concatenate back to word + EOW by
    construction — so n_lossless = n_docs; a Spark-side lossless
    failure would hash-MISMATCH this oracle."""
    return f"""WITH {_bpe_chain_ctes(n_merges)},
wtoks AS (
  SELECT word,
         len(string_split(substring(enc, 2, length(enc) - 2),
                          chr(31) || chr(30))) AS n_toks
  FROM enc{n_merges}
),
docw AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(LOWER(text), '\\s+')) AS word
  FROM documents
),
per_doc AS (
  SELECT d.doc_id, COUNT(*) AS n_words, SUM(wt.n_toks) AS n_toks
  FROM docw d JOIN wtoks wt USING (word)
  WHERE d.word <> ''
  GROUP BY d.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_lossless,
       CAST(COALESCE(SUM(p.n_toks), 0) AS BIGINT) AS total_tokens,
       CAST(COALESCE(SUM(p.n_words), 0) AS BIGINT) AS total_words,
       ROUND(CAST(COALESCE(SUM(p.n_toks), 0) AS DOUBLE)
             / SUM(p.n_words), 4) AS tokens_per_word
FROM documents doc LEFT JOIN per_doc p USING (doc_id)"""


BPE_TRAIN_SQL = _bpe_train_oracle_sql(16)
BPE_TOKENIZE_SQL = _bpe_tokenize_oracle_sql(16)


_IMG_VARIANT_OFFSET = 1 << 40


def _synth_bmp_corpus(docs: DataFrame, codec: str = "bmp") -> DataFrame:
    """(doc_id, content): deterministic 16×16 real image per document
    (pixels from a sha256 stream over doc_id, range 0..199); every EVEN
    doc_id also emits a planted near-duplicate variant (+10 brightness
    — strictly monotonic, so zero dHash bits flip — plus one sampled
    grid pixel blown out to 255, which flips at most 2 of the 64 bits).
    Variant ids live at doc_id + 2^40 so they never collide.
    ``codec`` picks the payload container (bmp or png) — the PIXELS are
    identical, so the two corpora must dHash identically."""
    from .operators.multimodal import encode_bmp, encode_png

    enc = {"bmp": encode_bmp, "png": encode_png}[codec]

    def gen(it):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                data = b"".join(
                    hashlib.sha256(f"img:{did}:{i}".encode()).digest()
                    for i in range(24)
                )
                px = (np.frombuffer(data, dtype=np.uint8) % 200).reshape(16, 16, 3)
                ids.append(did)
                blobs.append(enc(px))
                if did % 2 == 0:
                    v = px + 10  # ≤ 209: no clipping, order-preserving
                    v[6, 7] = 255  # grid point (yi[3], xi[4]) → ≤2 bit flips
                    ids.append(did + _IMG_VARIANT_OFFSET)
                    blobs.append(enc(v))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "content": blobs}
            )

    # the documents scan is 1-2 partitions at test SFs — spread the
    # synthesis/decode work before the Python stage (8 ways: enough
    # parallelism to matter, few enough tasks that Arrow/worker
    # round-trip overhead stays amortized at this corpus size)
    return docs.select("doc_id").repartition(8).mapInPandas(
        gen, "doc_id long, content binary"
    )


def image_near_dup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-duplicate detection over REAL decoded
    pixels (operators/multimodal.py::dhash64 / phash_near_dup): BMP
    corpus → dHash (Arrow-batched decode, 8 bytes/image leave the
    stage) → pigeonhole-banded Hamming join (≤3 of 64 bits) → exact
    ``bit_count(xor)`` verify in codegen.  The fixture plants one
    brightness-shifted + single-pixel-perturbed variant per even
    doc_id (dHash distance ≤ 2 by construction), so the CORRECT output
    is fully determined: every planted pair found (banding guarantees
    recall at hamming < n_bands), zero spurious pairs (distinct images
    sit ~32 bits apart).  The oracle derives that expected output in
    SQL — a miss or a false pair mismatches."""
    from .operators.multimodal import dhash_images, phash_near_dup

    t = load_tables(spark, sf_dir)
    imgs = _synth_bmp_corpus(t["documents"])
    hashes = dhash_images(imgs, decoder="bmp")
    pairs = phash_near_dup(hashes, max_hamming=3, n_bands=4)
    planted = (
        (F.col("id_a") % 2 == 0)
        & (F.col("id_b") - F.col("id_a") == _IMG_VARIANT_OFFSET)
    ).cast("int")
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum(planted), F.lit(0)).alias("n_planted_found"),
    )
    base = t["documents"].agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("doc_id") % 2 == 0).cast("int")).alias("n_planted"),
    )
    return base.crossJoin(agg).select(
        (F.col("n_docs") + F.col("n_planted")).cast("long").alias("n_images"),
        F.col("n_planted").cast("long").alias("n_planted"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_planted_found").cast("long").alias("n_planted_found"),
        (F.col("n_pairs") - F.col("n_planted_found"))
        .cast("long")
        .alias("n_spurious"),
    )


def image_near_dup_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PNG twin of image_near_dup_phash (VERDICT r12 #4): the SAME
    deterministic planted corpus, but carried as real zlib-compressed
    PNG payloads decoded by the stdlib codec
    (operators/multimodal.py::decode_png — chunk walk → IDAT inflate →
    per-row unfilter) before dHash + pigeonhole-banded Hamming
    matching.  Pixels are identical to the BMP corpus, so the expected
    output is identical too: every planted pair found, zero spurious —
    certifying the compressed-codec decode path end-to-end, not just
    in unit tests."""
    from .operators.multimodal import dhash_images, phash_near_dup

    t = load_tables(spark, sf_dir)
    imgs = _synth_bmp_corpus(t["documents"], codec="png")
    hashes = dhash_images(imgs, decoder="png")
    pairs = phash_near_dup(hashes, max_hamming=3, n_bands=4)
    planted = (
        (F.col("id_a") % 2 == 0)
        & (F.col("id_b") - F.col("id_a") == _IMG_VARIANT_OFFSET)
    ).cast("int")
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum(planted), F.lit(0)).alias("n_planted_found"),
    )
    base = t["documents"].agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("doc_id") % 2 == 0).cast("int")).alias("n_planted"),
    )
    return base.crossJoin(agg).select(
        (F.col("n_docs") + F.col("n_planted")).cast("long").alias("n_images"),
        F.col("n_planted").cast("long").alias("n_planted"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_planted_found").cast("long").alias("n_planted_found"),
        (F.col("n_pairs") - F.col("n_planted_found"))
        .cast("long")
        .alias("n_spurious"),
    )


def jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end certification of the pure-numpy baseline JPEG codec
    (operators/jpeg.py, r13): per document, a 16x16 smooth gray image
    is synthesized from md5(doc_id)-derived parameters — DC offset
    108+8k (k = hex0 % 8), horizontal tilt sign s (hex1 parity,
    slope ±3/px), sine-texture amplitude 32+16a (a = hex2 % 3) — then
    REALLY encoded (quality 97, 4:4:4) and REALLY decoded inside the
    Arrow-batched stage, and three statistics are re-quantized from
    the DECODED pixels: the DC bucket floor((mean-104)/8), the tilt
    sign from the half-image mean difference (margin 24 gray levels vs
    <1 of codec error), and the amplitude class from the pixel
    variance (gaps ~320 vs ~±30 of error). Every parameter is
    SQL-derivable from the same md5, so the oracle states the EXPECTED
    buckets analytically — a decoder that mangles coefficients, zigzag
    order, quantization, or the IDCT shifts the statistics and
    mismatches. (The sine term sums to zero over full periods and over
    each half-image, so mean and half-difference are exact analytics;
    no pixel clips by construction.)"""
    from .operators.jpeg import decode_jpeg, encode_jpeg

    t = load_tables(spark, sf_dir)

    def synth(it):
        import hashlib

        import numpy as np
        import pandas as pd

        xx, yy = np.meshgrid(np.arange(16), np.arange(16))
        sin2d = np.sin(2 * np.pi * xx / 8.0) * np.sin(2 * np.pi * yy / 8.0)
        for pdf in it:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                h = hashlib.md5(str(did).encode()).hexdigest()
                k = int(h[0], 16) % 8
                s = 1 if int(h[1], 16) % 2 == 0 else -1
                a = int(h[2], 16) % 3
                v = (
                    108.0 + 8 * k
                    + s * 3.0 * (xx - 7.5)
                    + (32.0 + 16 * a) * sin2d
                )
                px = np.round(v).clip(0, 255).astype(np.uint8)
                ids.append(did)
                blobs.append(
                    encode_jpeg(np.repeat(px[:, :, None], 3, axis=2),
                                quality=97)
                )
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "content": blobs}
            )

    def stats(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf["content"]):
                px = decode_jpeg(bytes(b)).astype(np.float64)
                lum = px[:, :, 0]
                rows.append((
                    int(did), px.shape[1], px.shape[0],
                    float(lum.mean()),
                    float(lum[:, :8].mean() - lum[:, 8:].mean()),
                    float(lum.var()),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "w", "h", "mean_lum", "half_diff", "var_lum"
                ],
            )

    imgs = (
        t["documents"].select("doc_id").repartition(8)
        .mapInPandas(synth, "doc_id long, content binary")
    )
    raw = imgs.mapInPandas(
        stats,
        "doc_id long, w int, h int, mean_lum double, half_diff double, "
        "var_lum double",
    )
    return raw.select(
        "doc_id",
        F.col("w").cast("long").alias("width"),
        F.col("h").cast("long").alias("height"),
        F.floor((F.col("mean_lum") - 104.0) / 8.0).cast("long").alias(
            "dc_bucket"
        ),
        F.when(F.col("half_diff") < 0, 1).otherwise(-1).cast("long").alias(
            "grad_sign"
        ),
        F.when(F.col("var_lum") < 607.25, 0)
        .when(F.col("var_lum") < 991.25, 1)
        .otherwise(2)
        .cast("long")
        .alias("amp_bucket"),
    ).orderBy("doc_id")


JPEG_DECODE_SQL = """
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1))
            AS BIGINT) % 8 AS dc_bucket,
       CASE WHEN CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)),
                                         2, 1)) AS BIGINT) % 2 = 0
            THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT)
       END AS grad_sign,
       CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 3, 1))
            AS BIGINT) % 3 AS amp_bucket
FROM documents
ORDER BY doc_id
"""


def _synth_wav_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, content): deterministic PCM-16 WAV per document — 8
    sinusoids (one per fingerprint band, at that band's center bin)
    with per-(frame, band) envelopes on a LADDER of 8 levels
    (0.2 … 0.9) where adjacent frames always sit on different levels,
    so every frame-difference comparison carries a ≥27% energy margin
    that PCM-16 quantization cannot flip.  Every EVEN doc_id also
    emits a planted near-duplicate: amplitude × 0.6 (awhash is
    scale-invariant — zero bits flip) with ONE band's frame-4 envelope
    forced above the ladder (1.2 > 0.9), flipping EXACTLY the ≤ 2
    comparisons adjacent to frame 4 in that band."""
    from .operators.multimodal import encode_wav

    def gen(it):
        import hashlib

        import numpy as np
        import pandas as pd

        sr, n_frames, frame_len, n_bands = 4000, 9, 200, 8
        t = np.arange(n_frames * frame_len) / sr
        freqs = (12 * np.arange(n_bands) + 6) * (sr / frame_len)
        waves = np.sin(2 * np.pi * freqs[None, :] * t[:, None])  # (n, 8)

        def synth(did: int, variant: bool) -> bytes:
            data = b"".join(
                hashlib.sha256(f"wav:{did}:{i}".encode()).digest()
                for i in range(3)
            )
            raw = np.frombuffer(data[:72], dtype=np.uint8).reshape(
                n_frames, n_bands
            )
            lvl = np.empty((n_frames, n_bands), dtype=np.int64)
            lvl[0] = raw[0] % 8
            for f in range(1, n_frames):
                lvl[f] = (lvl[f - 1] + 1 + raw[f] % 7) % 8
            env = 0.2 + 0.1 * lvl.astype(np.float64)
            if variant:
                env = env.copy()
                env[4, data[72] % n_bands] = 1.2
            gain = 0.6 if variant else 1.0
            mono = (np.repeat(env, frame_len, axis=0) * waves).sum(axis=1)
            return encode_wav(gain * mono / n_bands, sr)

        for pdf in it:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                ids.append(did)
                blobs.append(synth(did, False))
                if did % 2 == 0:
                    ids.append(did + _IMG_VARIANT_OFFSET)
                    blobs.append(synth(did, True))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "content": blobs}
            )

    return docs.select("doc_id").repartition(8).mapInPandas(
        gen, "doc_id long, content binary"
    )


def audio_near_dup_awhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate detection over REAL decoded PCM samples
    (operators/multimodal.py::awhash64 / awhash_audio): WAV corpus →
    Haitsma–Kalker-style band-energy fingerprint (Arrow-batched decode,
    8 bytes/clip leave the stage) → the SAME pigeonhole-banded Hamming
    matcher as images (phash_near_dup is hash-agnostic).  The fixture
    plants one amplitude-scaled + single-band-boosted variant per even
    doc_id (fingerprint distance ≤ 2 by construction), so the correct
    output is fully determined and the oracle derives it in SQL."""
    from .operators.multimodal import awhash_audio, phash_near_dup

    t = load_tables(spark, sf_dir)
    clips = _synth_wav_corpus(t["documents"])
    hashes = awhash_audio(clips)
    pairs = phash_near_dup(hashes, hash_col="awhash", max_hamming=3, n_bands=4)
    planted = (
        (F.col("id_a") % 2 == 0)
        & (F.col("id_b") - F.col("id_a") == _IMG_VARIANT_OFFSET)
    ).cast("int")
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum(planted), F.lit(0)).alias("n_planted_found"),
    )
    base = t["documents"].agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("doc_id") % 2 == 0).cast("int")).alias("n_planted"),
    )
    return base.crossJoin(agg).select(
        (F.col("n_docs") + F.col("n_planted")).cast("long").alias("n_clips"),
        F.col("n_planted").cast("long").alias("n_planted"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_planted_found").cast("long").alias("n_planted_found"),
        (F.col("n_pairs") - F.col("n_planted_found"))
        .cast("long")
        .alias("n_spurious"),
    )


AUDIO_NEAR_DUP_SQL = """
WITH d AS (
  SELECT COUNT(*) AS n_docs,
         COUNT(*) FILTER (doc_id % 2 = 0) AS n_planted
  FROM documents
)
SELECT CAST(n_docs + n_planted AS BIGINT) AS n_clips,
       CAST(n_planted AS BIGINT) AS n_planted,
       CAST(n_planted AS BIGINT) AS n_pairs,
       CAST(n_planted AS BIGINT) AS n_planted_found,
       CAST(0 AS BIGINT) AS n_spurious
FROM d
"""


IMAGE_NEAR_DUP_SQL = """
WITH d AS (
  SELECT COUNT(*) AS n_docs,
         COUNT(*) FILTER (doc_id % 2 = 0) AS n_planted
  FROM documents
)
SELECT CAST(n_docs + n_planted AS BIGINT) AS n_images,
       CAST(n_planted AS BIGINT) AS n_planted,
       CAST(n_planted AS BIGINT) AS n_pairs,
       CAST(n_planted AS BIGINT) AS n_planted_found,
       CAST(0 AS BIGINT) AS n_spurious
FROM d
"""


# --------------------------------------------------------------------------
# round 6 session 5: exact set-similarity join (prefix filter)
# --------------------------------------------------------------------------

def setsim_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard pairs >= 0.5 via the AllPairs/PPJoin
    prefix filter (operators/setsim.py::set_similarity_join) — 100%
    recall without an all-pairs product: candidates come from an
    equi-join on each doc's few rarest bigrams, then exact
    array_intersect verification. The oracle generates candidates by
    *any* shared bigram (a superset of jaccard > 0), so it checks the
    prefix filter's no-false-negative guarantee, not just the verify."""
    from .operators.setsim import set_similarity_join

    t = load_tables(spark, sf_dir)
    return set_similarity_join(t["documents"], threshold=0.5, ngram=2)


SETSIM_JOIN_SQL = """
WITH arrs AS (
  SELECT doc_id,
         list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS arr
  FROM documents
),
tok AS (
  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i + 1] AS token
  FROM arrs, UNNEST(range(1, len(arr))) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter, sa.n AS size_a, sb.n AS size_b,
       CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
"""


def assoc_rules_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise market-basket rules over parts co-ordered in one order
    (operators/assoc.py::association_rules): support / confidence /
    lift for part pairs seen together in >= 3 orders, both directions.
    Apriori item pruning bounds the per-order pair fan-out before the
    basket self-join shuffles anything."""
    from .operators.assoc import association_rules

    t = load_tables(spark, sf_dir)
    return association_rules(
        t["lineitem"], "l_orderkey", "l_partkey", min_pair_count=3
    )


ASSOC_RULES_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
n AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM items),
icounts AS (SELECT item, COUNT(*) AS item_count FROM items GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_count
  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
),
directed AS (
  SELECT item_a AS antecedent, item_b AS consequent, pair_count FROM pairs
  UNION ALL
  SELECT item_b AS antecedent, item_a AS consequent, pair_count FROM pairs
)
SELECT antecedent, consequent, pair_count,
       ca.item_count AS n_antecedent, cb.item_count AS n_consequent,
       CAST(pair_count AS DOUBLE) / n.n_baskets AS support,
       CAST(pair_count AS DOUBLE) / ca.item_count AS confidence,
       CAST(pair_count * n.n_baskets AS DOUBLE)
         / (ca.item_count * cb.item_count) AS lift
FROM directed
JOIN icounts ca ON ca.item = antecedent
JOIN icounts cb ON cb.item = consequent
CROSS JOIN n
"""


def acf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type autocorrelation of value at lags 1..3, series
    ordered by (ts, event_id) (operators/timeseries.py::acf). One
    key-partitioned window computes all lags; no global sort."""
    from .operators.timeseries import acf

    t = load_tables(spark, sf_dir)
    return acf(
        t["events"], "event_type", ["ts", "event_id"], "value", max_lag=3
    )


ACF_SQL = """
WITH lagged AS (
  SELECT event_type, value,
         LAG(value, 1) OVER w AS l1,
         LAG(value, 2) OVER w AS l2,
         LAG(value, 3) OVER w AS l3
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
st AS (
  SELECT event_type, 1 AS lag, value, l1 AS lv FROM lagged
  UNION ALL SELECT event_type, 2, value, l2 FROM lagged
  UNION ALL SELECT event_type, 3, value, l3 FROM lagged
)
SELECT event_type, lag, COUNT(*) AS n_pairs, ROUND(CORR(value, lv), 6) AS acf
FROM st WHERE lv IS NOT NULL
GROUP BY event_type, lag
"""


def mad_outliers_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel-rule robust outliers on l_extendedprice per return flag
    (operators/profile.py::mad_outliers): |x − median| > 3·MAD, both
    statistics exact interpolated medians (sort-based — bit-identical
    across engines, unlike mean/σ)."""
    from .operators.profile import mad_outliers

    t = load_tables(spark, sf_dir)
    return mad_outliers(t["lineitem"], "l_returnflag", "l_extendedprice", 3.0)


MAD_OUTLIERS_SQL = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
  FROM lineitem GROUP BY l_returnflag
),
dev AS (
  SELECT l.l_returnflag, ABS(l_extendedprice - m.med) AS d, m.med
  FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
),
madt AS (
  SELECT l_returnflag, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY l_returnflag
)
SELECT dev.l_returnflag, COUNT(*) AS n,
       ROUND(ANY_VALUE(dev.med), 6) AS median,
       ROUND(ANY_VALUE(madt.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d > 3.0 * madt.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(SUM(CASE WHEN d > 3.0 * madt.mad THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS outlier_frac
FROM dev JOIN madt ON dev.l_returnflag = madt.l_returnflag
GROUP BY dev.l_returnflag
"""


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement
    (operators/sampling.py::weighted_sample): 15 docs per source,
    selection probability ∝ n_chars, deterministic md5-seeded race —
    the 'sample by quality weight, reproducibly' training-mix step."""
    from .operators.sampling import weighted_sample

    t = load_tables(spark, sf_dir)
    s = weighted_sample(
        t["documents"], "doc_id", "n_chars", k=15, group_col="source"
    )
    return s.select(
        "source", "doc_id", "n_chars", F.round("es_key", 6).alias("es_key")
    )


WEIGHTED_SAMPLE_SQL = """
WITH w AS (
  SELECT source, doc_id, n_chars,
         -LN((CAST('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) + 1) / 4294967297.0) / n_chars AS es
  FROM documents WHERE n_chars > 0
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY es, doc_id) AS rk
  FROM w
)
SELECT source, doc_id, n_chars, ROUND(es, 6) AS es_key
FROM r WHERE rk <= 15
"""


def markov_transitions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical first-order Markov kernel of event types per user
    (operators/funnel.py::markov_transitions): one LEAD window per
    user ordered by (ts, event_id), then global transition counts and
    per-from-state probabilities."""
    from .operators.funnel import markov_transitions

    t = load_tables(spark, sf_dir)
    return markov_transitions(
        t["events"], "user_id", ["ts", "event_id"], "event_type"
    )


MARKOV_SQL = """
WITH seq AS (
  SELECT event_type AS from_state,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_state
  FROM events
),
trans AS (
  SELECT from_state, to_state, COUNT(*) AS n_transitions
  FROM seq WHERE to_state IS NOT NULL
  GROUP BY 1, 2
),
totals AS (
  SELECT from_state, CAST(SUM(n_transitions) AS BIGINT) AS n_from
  FROM trans GROUP BY 1
)
SELECT t.from_state, t.to_state, t.n_transitions, tot.n_from,
       CAST(t.n_transitions AS DOUBLE) / tot.n_from AS prob
FROM trans t JOIN totals tot ON t.from_state = tot.from_state
"""


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts — cheapest for their size (minimize
    p_retailprice, maximize p_size) via the two-phase local/global
    sweep (operators/skyline.py). The oracle is the quadratic
    NOT EXISTS dominance self-join the operator avoids."""
    from .operators.skyline import skyline

    t = load_tables(spark, sf_dir)
    return skyline(
        t["part"].select("p_partkey", "p_retailprice", "p_size"),
        minimize=["p_retailprice"],
        maximize=["p_size"],
    )


SKYLINE_SQL = """
SELECT p_partkey, p_retailprice, p_size FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
"""


def pmi_collocations_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-word-pair PMI collocations over the document corpus
    (operators/colloc.py::pmi_collocations), pair_count >= 5 — the
    multiword-expression miner of the text-analysis surface."""
    from .operators.colloc import pmi_collocations

    t = load_tables(spark, sf_dir)
    return pmi_collocations(t["documents"], "text", min_count=5)


PMI_SQL = """
WITH arrs AS (
  SELECT list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS w
  FROM documents
),
uni AS (
  SELECT t.word AS word, COUNT(*) AS cnt
  FROM arrs, UNNEST(w) AS t(word) GROUP BY 1
),
pairs AS (
  SELECT w[i] AS word_a, w[i + 1] AS word_b, COUNT(*) AS pair_count
  FROM arrs, UNNEST(range(1, len(w))) AS t(i)
  GROUP BY 1, 2
  HAVING COUNT(*) >= 5
),
nw AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_words FROM uni),
nb AS (
  SELECT CAST(SUM(GREATEST(len(w) - 1, 0)) AS BIGINT) AS n_bigrams FROM arrs
)
SELECT word_a, word_b, pair_count, ca.cnt AS count_a, cb.cnt AS count_b,
       ROUND(LN((CAST(pair_count AS DOUBLE) / nb.n_bigrams)
                / ((CAST(ca.cnt AS DOUBLE) / nw.n_words)
                   * (CAST(cb.cnt AS DOUBLE) / nw.n_words))), 6) AS pmi
FROM pairs
JOIN uni ca ON ca.word = word_a
JOIN uni cb ON cb.word = word_b
CROSS JOIN nw CROSS JOIN nb
"""


def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-round 80-core peel of the part co-purchase graph
    (operators/pagerank.py::kcore) — converged on this data (round 9 ==
    round 10), so the fixed-round output IS the 80-core. The canonical
    edge list comes from the shared copurchase family table (r13:
    kcore/LPA/triangle each rebuilt the identical graph; now it
    materializes once per run). Construction localCheckpoints each
    round's degree table (EAGER_QUERIES)."""
    from .operators.pagerank import kcore

    edges = _copurchase_family(spark, sf_dir)
    return kcore(edges, "src", "dst", k=80, rounds=10,
                 assume_canonical=True)


def label_propagation_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-round synchronous label-propagation communities on the part
    co-purchase graph (operators/pagerank.py::label_propagation —
    Raghavan 2007, the deterministic synchronous variant: most-frequent
    neighbor label, ties to the smallest).  The oracle replays all four
    rounds as an unrolled MATERIALIZED CTE chain (the kcore technique),
    so every vertex's final label and community size are EXACT-checked.
    Since r11 the default checkpoint cadence is 4 (tools/sweep_lpa.py:
    LPA lineage grows linearly, so one checkpoint at the final round
    beats per-round cache write/reads — result bit-identical), so this
    4-round query checkpoints once. Construction still runs eager jobs
    (EAGER_QUERIES)."""
    from .operators.pagerank import label_propagation

    edges = _copurchase_family(spark, sf_dir)
    return label_propagation(
        edges, "src", "dst", rounds=4, assume_canonical=True
    ).orderBy("node")


def range_split_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-height range-partition boundaries for
    orders.o_totalprice into 16 partitions
    (operators/layout.py::range_split_points) — the auditable version
    of repartitionByRange's sampled splits, one exact-percentile
    aggregation pass. EXACT vs quantile_cont in SQL (same linear
    interpolation), boundaries rounded to 6."""
    from .operators.layout import range_split_points

    t = load_tables(spark, sf_dir)
    return range_split_points(t["orders"], "o_totalprice", 16)


RANGE_SPLIT_SQL = """
WITH b AS (
  SELECT quantile_cont(o_totalprice,
           [0.0625, 0.125, 0.1875, 0.25, 0.3125, 0.375, 0.4375, 0.5,
            0.5625, 0.625, 0.6875, 0.75, 0.8125, 0.875, 0.9375]) AS bs
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT CAST(i AS INT) AS split_idx,
       ROUND(i / 16.0, 6) AS lower_pct,
       ROUND(bs[i], 6) AS boundary
FROM b, UNNEST(range(1, 16)) AS t(i)
ORDER BY split_idx
"""


def _lpa_sql(rounds: int) -> str:
    """Oracle generator mirroring label_propagation round for round
    (MATERIALIZED per round — each round references its predecessor
    once per direction, and the chain must not inline)."""
    parts = ["""e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
bidir AS MATERIALIZED (
  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
),
l0 AS MATERIALIZED (
  SELECT n, n AS label FROM (
    SELECT u AS n FROM e0 UNION SELECT v FROM e0
  )
)"""]
    for i in range(1, rounds + 1):
        parts.append(f"""c{i} AS (
  SELECT b.u AS n, l.label AS nl, COUNT(*) AS c
  FROM bidir b JOIN l{i - 1} l ON l.n = b.v GROUP BY 1, 2
),
l{i} AS MATERIALIZED (
  SELECT n, nl AS label FROM (
    SELECT n, nl,
           ROW_NUMBER() OVER (PARTITION BY n
                              ORDER BY c DESC, nl ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
)""")
    return (
        "WITH " + ",\n".join(parts) + f""",
sizes AS (
  SELECT label, COUNT(*) AS community_size FROM l{rounds} GROUP BY label
)
SELECT l.n AS node, l.label, CAST(s.community_size AS BIGINT)
         AS community_size
FROM l{rounds} l JOIN sizes s USING (label)
ORDER BY node"""
    )


LPA_SQL = _lpa_sql(4)


def _kcore_sql(k: int, rounds: int) -> str:
    """Oracle generator mirroring kcore round for round. MATERIALIZED
    breaks DuckDB's CTE inlining — each round references its
    predecessor three times, and inlined the chain is 3^rounds (the
    exact blowup the operator's per-round localCheckpoint prevents)."""
    parts = [
        """e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""d{i} AS MATERIALIZED (
  SELECT n, COUNT(*) AS d FROM (
    SELECT u AS n FROM e{p} UNION ALL SELECT v FROM e{p}) GROUP BY n),
k{i} AS MATERIALIZED (SELECT n FROM d{i} WHERE d >= {k}),
e{i} AS MATERIALIZED (
  SELECT u, v FROM e{p}
  WHERE u IN (SELECT n FROM k{i}) AND v IN (SELECT n FROM k{i}))"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT n AS node, CAST(d AS BIGINT) AS degree FROM (
  SELECT n, COUNT(*) AS d FROM (
    SELECT u AS n FROM e{rounds} UNION ALL SELECT v FROM e{rounds})
  GROUP BY n)"""
    )


KCORE_SQL = _kcore_sql(80, 10)


def theil_sen_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Theil-Sen robust trend of value over time
    (operators/timeseries.py::theil_sen): median of pairwise slopes on
    the first 300 points per type in (ts, event_id) order — the robust
    sibling of an OLS drift fit, paired with mad_outliers/cusum in the
    monitoring surface."""
    from .operators.timeseries import theil_sen

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "event_type",
        F.col("ts").cast("double").alias("x"),
        "value",
        "event_id",
    )
    return theil_sen(
        ev, "event_type", "x", "value",
        order_cols=["x", "event_id"], max_points=300,
    )


def ols_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time
    (operators/timeseries.py::ols_trend): slope/intercept/R² from raw
    moments in ONE map-side-combined aggregation — the cheap parametric
    fit next to theil_sen_events' robust quadratic one. Every moment,
    the normal-equation arithmetic, and the rounding replay in SQL, so
    the fit is EXACT-checked."""
    from .operators.timeseries import ols_trend

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "event_type", F.col("ts").cast("double").alias("x"), "value"
    )
    return ols_trend(ev, "event_type", "x", "value").orderBy("event_type")


OLS_TREND_SQL = """
WITH pts AS (
  SELECT event_type, CAST(epoch(ts) AS DOUBLE) AS x,
         CAST(value AS DOUBLE) AS y
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
m AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pts GROUP BY event_type
),
d AS (
  SELECT event_type, n,
         sxx - sx * sx / n AS ssxx,
         syy - sy * sy / n AS ssyy,
         sxy - sx * sy / n AS ssxy,
         sx, sy
  FROM m
)
SELECT event_type, CAST(n AS BIGINT) AS n_points,
       ROUND(CASE WHEN ssxx > 0 THEN ssxy / ssxx END, 6) AS slope,
       ROUND(CASE WHEN ssxx > 0
                  THEN (sy - ssxy / ssxx * sx) / n END, 6) AS intercept,
       ROUND(CASE WHEN ssxx > 0 AND ssyy > 0
                  THEN ssxy * ssxy / (ssxx * ssyy) END, 6) AS r2
FROM d ORDER BY event_type
"""


THEIL_SEN_SQL = """
WITH pts AS (
  SELECT event_type, epoch(ts) AS x, value AS y,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY epoch(ts), event_id
         ) AS rn
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
bounded AS (SELECT * FROM pts WHERE rn <= 300),
slopes AS (
  SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS s
  FROM bounded a JOIN bounded b
    ON a.event_type = b.event_type AND a.rn < b.rn AND a.x <> b.x
),
med AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         quantile_cont(s, 0.5) AS m
  FROM slopes GROUP BY event_type
)
SELECT b.event_type, CAST(COUNT(*) AS BIGINT) AS n_points,
       COALESCE(ANY_VALUE(med.n_pairs), 0) AS n_pairs,
       ROUND(ANY_VALUE(med.m), 6) AS slope,
       ROUND(quantile_cont(b.y - med.m * b.x, 0.5), 6) AS intercept
FROM bounded b LEFT JOIN med ON b.event_type = med.event_type
GROUP BY b.event_type
"""


def bleu_rouge_eval_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU-2 + ROUGE-1/2 recall per source
    (operators/texteval.py::corpus_bleu_rouge — Papineni et al. 2002,
    Lin 2004): the generation-eval counterpart of the retrieval evals
    (ndcg_retrieval_eval).  Candidate = the document with every 7th
    token dropped (deterministic degradation, so the oracle replays the
    exact pair set); all clipped-match / total counts are integer sums,
    the BLEU/ROUGE float formulas run once per source row (round-6
    ln-ulp posture)."""
    from .operators.texteval import corpus_bleu_rouge

    t = load_tables(spark, sf_dir)
    return corpus_bleu_rouge(t["documents"])


BLEU_ROUGE_SQL = """
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
),
dd AS (SELECT *, CAST(n - (n // 7) AS INT) AS cn FROM d),
c1 AS (
  SELECT doc_id, source, w[CAST(p + (p-1)//6 AS INT)] AS g, COUNT(*) AS nc
  FROM dd, UNNEST(range(1, cn + 1)) AS r(p) GROUP BY 1, 2, 3
),
r1 AS (
  SELECT doc_id, w[CAST(p AS INT)] AS g, COUNT(*) AS nr
  FROM dd, UNNEST(range(1, n + 1)) AS r(p) GROUP BY 1, 2
),
clip1 AS (
  SELECT source, CAST(SUM(LEAST(nc, nr)) AS BIGINT) AS c1
  FROM c1 JOIN r1 USING (doc_id, g) GROUP BY 1
),
c2 AS (
  SELECT doc_id, source,
         w[CAST(p + (p-1)//6 AS INT)] || ' ' || w[CAST((p+1) + p//6 AS INT)]
           AS g,
         COUNT(*) AS nc
  FROM dd, UNNEST(range(1, GREATEST(cn - 1, 0) + 1)) AS r(p)
  GROUP BY 1, 2, 3
),
r2 AS (
  SELECT doc_id, w[CAST(p AS INT)] || ' ' || w[CAST(p + 1 AS INT)] AS g,
         COUNT(*) AS nr
  FROM dd, UNNEST(range(1, GREATEST(n - 1, 0) + 1)) AS r(p)
  GROUP BY 1, 2
),
clip2 AS (
  SELECT source, CAST(SUM(LEAST(nc, nr)) AS BIGINT) AS c2
  FROM c2 JOIN r2 USING (doc_id, g) GROUP BY 1
),
tot AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(cn) AS BIGINT) AS cand_tokens,
         CAST(SUM(n) AS BIGINT) AS ref_tokens,
         CAST(SUM(GREATEST(cn - 1, 0)) AS BIGINT) AS c2t,
         CAST(SUM(GREATEST(n - 1, 0)) AS BIGINT) AS r2t
  FROM dd GROUP BY 1
)
SELECT t.source, t.n_docs, t.cand_tokens, t.ref_tokens,
  ROUND(CASE WHEN c1 > 0 AND c2 > 0 THEN
    EXP(LEAST(0.0, 1.0 - CAST(ref_tokens AS DOUBLE) / cand_tokens)) *
    EXP(0.5 * LN(CAST(c1 AS DOUBLE) / cand_tokens)
        + 0.5 * LN(CAST(c2 AS DOUBLE) / c2t))
    ELSE 0.0 END, 6) AS bleu2,
  ROUND(CAST(c1 AS DOUBLE) / ref_tokens, 6) AS rouge1_recall,
  ROUND(CAST(c2 AS DOUBLE) / r2t, 6) AS rouge2_recall
FROM tot t JOIN clip1 USING (source) JOIN clip2 USING (source)
ORDER BY source
"""


def readability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled Flesch reading ease + Flesch-Kincaid grade per source
    (operators/texteval.py::readability — Kincaid et al. 1975):
    vowel-group syllable approximation, 15-word pseudo-sentences (the
    synthetic corpus has no punctuation).  Formulas run on pooled
    integer counts, never averaged per-doc doubles, so the result is
    association-order-free."""
    from .operators.texteval import readability

    t = load_tables(spark, sf_dir)
    return readability(t["documents"])


READABILITY_SQL = """
WITH tok AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS t FROM documents
),
wt AS (
  SELECT source, COUNT(*) AS words,
         CAST(SUM(GREATEST(1, len(regexp_extract_all(t, '[aeiouy]+'))))
              AS BIGINT) AS syllables
  FROM tok GROUP BY 1
),
sent AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(CAST(FLOOR((len(string_split(text, ' ')) + 14) / 15.0)
                       AS BIGINT)) AS BIGINT) AS sentences
  FROM documents GROUP BY 1
)
SELECT w.source, n_docs, words, syllables, sentences,
  ROUND(206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences)
        - 84.6 * (CAST(syllables AS DOUBLE) / words), 6) AS flesch,
  ROUND(0.39 * (CAST(words AS DOUBLE) / sentences)
        + 11.8 * (CAST(syllables AS DOUBLE) / words) - 15.59, 6) AS fk_grade
FROM wt w JOIN sent USING (source)
ORDER BY source
"""


def domain_reweight_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-lite domain mixture weights per source
    (operators/doremi.py::domain_reweight — Xie et al. 2023): excess
    bigram-LM loss over the best domain, softmax(η·excess) blended with
    a uniform floor.  Per-occurrence NLLs quantize to DECIMAL(18,6)
    before summation (the covariance micro-unit idiom) so per-domain
    sums and the softmax denominator are association-order-free."""
    from .operators.doremi import domain_reweight

    t = load_tables(spark, sf_dir)
    return domain_reweight(t["documents"])


DOMAIN_REWEIGHT_SQL = """
WITH wl AS (
  SELECT source, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
bg AS (
  SELECT source, w[CAST(p AS INT)] AS a, w[CAST(p AS INT) + 1] AS b
  FROM wl, UNNEST(range(1, len(w))) AS r(p)
),
tf AS (SELECT source, a, b, COUNT(*) AS n FROM bg GROUP BY 1, 2, 3),
bc AS (SELECT a, b, COUNT(*) AS bc FROM bg GROUP BY 1, 2),
uc AS (SELECT tk, COUNT(*) AS ca
       FROM (SELECT UNNEST(string_split(text, ' ')) AS tk FROM documents)
       GROUP BY 1),
v AS (SELECT COUNT(*) AS v FROM uc),
perdom AS (
  SELECT tf.source,
         CAST(SUM(tf.n) AS BIGINT) AS n_bigrams,
         SUM(tf.n * CAST(ROUND(-LN((bc.bc + 0.5) / (uc.ca + 0.5 * v.v)), 6)
                         AS DECIMAL(18,6))) AS nll_sum
  FROM tf JOIN bc USING (a, b) JOIN uc ON uc.tk = tf.a CROSS JOIN v
  GROUP BY 1
),
nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
dom AS (
  SELECT p.source, nd.n_docs, p.n_bigrams,
         ROUND(CAST(p.nll_sum AS DOUBLE) / p.n_bigrams, 6) AS mean_nll
  FROM perdom p JOIN nd USING (source)
),
dom2 AS (
  SELECT *, ROUND(mean_nll - MIN(mean_nll) OVER (), 6) AS excess_nll
  FROM dom
),
dom3 AS (
  SELECT *, CAST(ROUND(EXP(1.0 * excess_nll), 6) AS DECIMAL(18,6)) AS s
  FROM dom2
),
dom4 AS (SELECT *, SUM(s) OVER () AS z, COUNT(*) OVER () AS k FROM dom3)
SELECT source, n_docs, n_bigrams, mean_nll, excess_nll,
  ROUND(0.8 * (CAST(s AS DOUBLE) / CAST(z AS DOUBLE)) + 0.2 / k, 6)
    AS weight
FROM dom4 ORDER BY source
"""


def domain_reweight_mw_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative DoReMi multiplicative-weights reweighting
    (operators/doremi.py::domain_reweight_mw — Xie et al. 2023 Alg. 1):
    3 unrolled Group-DRO epochs over doc_id%3 slices of the corpus,
    per-step uniform smoothing (non-telescoping recurrence, the
    pagerank/classifier-GD precedent).  Output carries every epoch's
    excess and weight, so the oracle's unrolled CTE chain certifies the
    full trajectory, not just the endpoint."""
    from .operators.doremi import domain_reweight_mw

    t = load_tables(spark, sf_dir)
    return domain_reweight_mw(t["documents"])


DOMAIN_REWEIGHT_MW_SQL = """
WITH wl AS (
  SELECT source, doc_id % 3 AS e, string_split(text, ' ') AS w
  FROM documents WHERE len(string_split(text, ' ')) >= 2
),
bg AS (
  SELECT source, e, w[CAST(p AS INT)] AS a, w[CAST(p AS INT) + 1] AS b
  FROM wl, UNNEST(range(1, len(w))) AS r(p)
),
tf AS (SELECT source, e, a, b, COUNT(*) AS n FROM bg GROUP BY 1, 2, 3, 4),
bc AS (SELECT a, b, COUNT(*) AS bc FROM bg GROUP BY 1, 2),
uc AS (SELECT tk, COUNT(*) AS ca
       FROM (SELECT UNNEST(string_split(text, ' ')) AS tk FROM documents)
       GROUP BY 1),
v AS (SELECT COUNT(*) AS v FROM uc),
cell AS (
  SELECT tf.source, tf.e,
         CAST(SUM(tf.n) AS BIGINT) AS nb,
         SUM(tf.n * CAST(ROUND(-LN((bc.bc + 0.5) / (uc.ca + 0.5 * v.v)), 6)
                         AS DECIMAL(18,6))) AS nll_sum
  FROM tf JOIN bc USING (a, b) JOIN uc ON uc.tk = tf.a CROSS JOIN v
  GROUP BY 1, 2
),
cm AS (SELECT source, e, ROUND(CAST(nll_sum AS DOUBLE) / nb, 6) AS mean
       FROM cell),
cx AS (SELECT source, e,
              ROUND(mean - MIN(mean) OVER (PARTITION BY e), 6) AS x
       FROM cm),
wide AS (
  SELECT source,
         COALESCE(MAX(CASE WHEN e = 0 THEN x END), 0.0) AS excess_e1,
         COALESCE(MAX(CASE WHEN e = 1 THEN x END), 0.0) AS excess_e2,
         COALESCE(MAX(CASE WHEN e = 2 THEN x END), 0.0) AS excess_e3
  FROM cx GROUP BY 1
),
nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
d0 AS (SELECT w.*, nd.n_docs, COUNT(*) OVER () AS k
       FROM wide w JOIN nd USING (source)),
s1 AS (SELECT *, CAST(ROUND(ROUND(1.0 / k, 6) * EXP(0.5 * excess_e1), 9)
                      AS DECIMAL(18,9)) AS sc1 FROM d0),
z1 AS (SELECT *, SUM(sc1) OVER () AS zz1 FROM s1),
w1 AS (SELECT *, ROUND(0.8 * (CAST(sc1 AS DOUBLE) / CAST(zz1 AS DOUBLE))
                       + 0.2 / k, 6) AS weight_e1 FROM z1),
s2 AS (SELECT *, CAST(ROUND(weight_e1 * EXP(0.5 * excess_e2), 9)
                      AS DECIMAL(18,9)) AS sc2 FROM w1),
z2 AS (SELECT *, SUM(sc2) OVER () AS zz2 FROM s2),
w2 AS (SELECT *, ROUND(0.8 * (CAST(sc2 AS DOUBLE) / CAST(zz2 AS DOUBLE))
                       + 0.2 / k, 6) AS weight_e2 FROM z2),
s3 AS (SELECT *, CAST(ROUND(weight_e2 * EXP(0.5 * excess_e3), 9)
                      AS DECIMAL(18,9)) AS sc3 FROM w2),
z3 AS (SELECT *, SUM(sc3) OVER () AS zz3 FROM s3),
w3 AS (SELECT *, ROUND(0.8 * (CAST(sc3 AS DOUBLE) / CAST(zz3 AS DOUBLE))
                       + 0.2 / k, 6) AS weight_e3 FROM z3)
SELECT source, n_docs, excess_e1, excess_e2, excess_e3,
       weight_e1, weight_e2, weight_e3, weight_e3 AS weight
FROM w3 ORDER BY source
"""


# round 14: registry rotated staleness-first for the driver's
# first-50 window (the standing VERDICT r11 #2/#5 rhythm).
# Composition: no debuts this round; 4 entries whose code changed
# THIS round (the three langid classifiers — char_tf_counts /
# char_hashed_features now derive gram positions from the LOWERED
# text and the oracle SQL mirrors it with LENGTH(LOWER(..)), plus the
# family tf fold's divisibility validation — and jpeg_decode_stats,
# which now decodes through the block-batched LUT engine certified
# bit-for-bit against the bit-serial reference); then the 46 stalest
# ORACLE-CHECKABLE entries in ledger order — all 13 remaining r9 and
# the 33 oldest r10. Rows-only postures (QUERIES - ORACLES) are
# skipped by the rotation per VERDICT r11 #5 (their EXACT *_refined
# siblings carry coverage). 4 + 13 + 33 = 50. The window is
# machine-checked: DRIVER_WINDOW below must equal
# list(QUERIES)[:50] and the staleness-first invariant is asserted
# by tests/test_plans.py::test_driver_window_marker.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "langid_softmax_docs": langid_softmax_docs,
    "langid_softmax_eval": langid_softmax_eval,
    "langid_planted_multilingual": langid_planted_multilingual,
    "jpeg_decode_stats": jpeg_decode_stats,
    "bottomk_quantiles_orders": bottomk_quantiles_orders,
    "dedup_containment_docs": dedup_containment_docs,
    "dedup_exact_substr": dedup_exact_substr,
    "delete_propagation_stats": delete_propagation_stats,
    "histogram_prices": histogram_prices,
    "near_dup_leakage_sources": near_dup_leakage_sources,
    "null_aware_anti_join": null_aware_anti_join,
    "q3_via_skew_join": q3_via_skew_join,
    "semdedup_embeddings": semdedup_embeddings,
    "sequence_packing_docs": sequence_packing_docs,
    "substr_dedup_clean_docs": substr_dedup_clean_docs,
    "temperature_mix_sources": temperature_mix_sources,
    "temporal_join_events": temporal_join_events,
    "acf_events": acf_events,
    "ann_ivf_refined_topk": ann_ivf_refined_topk,
    "ann_ivfpq_refined_topk": ann_ivfpq_refined_topk,
    "ann_lsh_refined_topk": ann_lsh_refined_topk,
    "asof_purchase_attribution": asof_purchase_attribution,
    "assoc_rules_copurchase": assoc_rules_copurchase,
    "bigram_lm_quality": bigram_lm_quality,
    "bpe_tokenize_docs": bpe_tokenize_docs,
    "bpe_train_docs": bpe_train_docs,
    "dedup_normalized_docs": dedup_normalized_docs,
    "dedup_simhash_docs": dedup_simhash_docs,
    "dsir_importance_docs": dsir_importance_docs,
    "hybrid_retrieval_rrf": hybrid_retrieval_rrf,
    "incremental_exact_dedup_docs": incremental_exact_dedup_docs,
    "incremental_minhash_docs": incremental_minhash_docs,
    "join_size_estimate_cms": join_size_estimate_cms,
    "multimodal_features": multimodal_features,
    "ndcg_retrieval_eval": ndcg_retrieval_eval,
    "ngram_diversity_sources": ngram_diversity_sources,
    "pipeline_train_mix": pipeline_train_mix,
    "pivot_linestatus": pivot_linestatus,
    "q10_returned_items": q10_returned_items,
    "q11_important_parts": q11_important_parts,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q20_part_promotion_suppliers": q20_part_promotion_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "image_near_dup_png": image_near_dup_png,
    "kll_quantiles_orders": kll_quantiles_orders,
    "kll_quantiles_by_priority": kll_quantiles_by_priority,
    "setsim_join_docs": setsim_join_docs,
    "hll_union_sources": hll_union_sources,
    "hll_distinct_stats": hll_distinct_stats,
    "bloom_membership_orders": bloom_membership_orders,
    "theta_sketch_orders": theta_sketch_orders,
    "q14_promo_revenue": q14_promo_revenue,
    "q19_disjunctive_brand": q19_disjunctive_brand,
    "udtf_sentence_stats": udtf_sentence_stats,
    "udaf_weighted_price": udaf_weighted_price,
    "dedup_exact_docs": dedup_exact_docs,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_docs": dedup_minhash_docs,
    "dedup_clusters_docs": dedup_clusters_docs,
    "tfidf_cosine_docs": tfidf_cosine_docs,
    "dedup_fuzzy_survivors": dedup_fuzzy_survivors,
    "pipeline_clean_corpus": pipeline_clean_corpus,
    "text_stats": text_stats,
    "text_lang_id": text_lang_id,
    "knn_bruteforce": knn_bruteforce,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "embedding_near_dup_lsh": embedding_near_dup_lsh_pairs,
    "token_frequencies": token_frequencies,
    "multimodal_binary_meta": multimodal_binary_meta,
    "redact_events_props": redact_events_props,
    "zorder_layout_orders": zorder_layout_orders,
    "chunk_dedup_docs": chunk_dedup_docs,
    "unigram_lm_quality": unigram_lm_quality,
    "merge_upsert_orders": merge_upsert_orders,
    "snapshot_diff_orders": snapshot_diff_orders,
    "scd2_user_event_history": scd2_user_event_history,
    "funnel_events": funnel_events,
    "resample_locf_events": resample_locf_events,
    "cohort_retention_events": cohort_retention_events,
    "pagerank_nations": pagerank_nations,
    "ivm_refresh_orders": ivm_refresh_orders,
    "dq_audit_orders": dq_audit_orders,
    "rolling_avg_events": rolling_avg_events,
    "corr_stats_lineitem": corr_stats_lineitem,
    "window_funcs_orders": window_funcs_orders,
    "outlier_stats_lineitem": outlier_stats_lineitem,
    "quantize_embeddings_stats": quantize_embeddings_stats,
    "pipeline_pretrain_prep": pipeline_pretrain_prep,
    "setops_all_variants": setops_all_variants,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "approx_stats": approx_stats,
    "ann_lsh_topk": ann_lsh_topk,
    "zipf_vocab_stats_docs": zipf_vocab_stats_docs,
    "retrieval_metrics_eval": retrieval_metrics_eval,
    "train_test_split_stats": train_test_split_stats,
    "tumbling_window_events": tumbling_window_events,
    "sliding_window_events": sliding_window_events,
    "session_windows_events": session_windows_events,
    "range_join_price_bands": range_join_price_bands,
    "unpivot_metrics": unpivot_metrics,
    "q9_product_profit": q9_product_profit,
    "bleu_rouge_eval_docs": bleu_rouge_eval_docs,
    "readability_docs": readability_docs,
    "wordpiece_train_docs": wordpiece_train_docs,
    "wordpiece_tokenize_docs": wordpiece_tokenize_docs,
    "kn_bigram_quality_docs": kn_bigram_quality_docs,
    "perplexity_buckets_docs": perplexity_buckets_docs,
    "classifier_calibration_docs": classifier_calibration_docs,
    "quality_classifier_docs": quality_classifier_docs,
    "unigram_tokenizer_docs": unigram_tokenizer_docs,
    "unigram_tokenize_docs": unigram_tokenize_docs,
    "cdc_chunk_docs": cdc_chunk_docs,
    "label_propagation_copurchase": label_propagation_copurchase,
    "mad_outliers_lineitem": mad_outliers_lineitem,
    "weighted_sample_docs": weighted_sample_docs,
    "markov_transitions_events": markov_transitions_events,
    "skyline_parts": skyline_parts,
    "pmi_collocations_docs": pmi_collocations_docs,
    "theil_sen_events": theil_sen_events,
    "image_near_dup_phash": image_near_dup_phash,
    "audio_near_dup_awhash": audio_near_dup_awhash,
    "url_canonical_dedup": url_canonical_dedup,
    "profile_orders": profile_orders,
    "schema_drift_orders": schema_drift_orders,
    "adaptive_join_strategies": adaptive_join_strategies,
    "holt_winters_events": holt_winters_events,
    "cusum_events": cusum_events,
    "ks_drift_events": ks_drift_events,
    "triangle_count_copurchase": triangle_count_copurchase,
    "record_linkage_customers": record_linkage_customers,
    "entity_resolution_customers": entity_resolution_customers,
    "cluster_split_docs": cluster_split_docs,
    "bm25_topk_docs": bm25_topk_docs,
    "gopher_quality_docs": gopher_quality_docs,
    "hilbert_layout_orders": hilbert_layout_orders,
    "dsir_resample_docs": dsir_resample_docs,
    "incremental_compaction_docs": incremental_compaction_docs,
    "q22_inactive_customers": q22_inactive_customers,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_pq_topk": ann_pq_topk,
    "bpe_token_stats": bpe_token_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
    "salted_window_events": salted_window_events,
    "prefilter_join_orders": prefilter_join_orders,
    "heavy_hitter_suppliers": heavy_hitter_suppliers,
    "contamination_check_docs": contamination_check_docs,
    "shard_export_stats": shard_export_stats,
    "quota_sample_sources": quota_sample_sources,
    "tfidf_top_terms": tfidf_top_terms,
    "domain_reweight_docs": domain_reweight_docs,
    "domain_reweight_mw_docs": domain_reweight_mw_docs,
    "kcore_copurchase": kcore_copurchase,
    "embedding_covariance_stats": embedding_covariance_stats,
    "embedding_centroids": embedding_centroids,
    "doc_fingerprint_winnow": doc_fingerprint_winnow,
    "winnow_overlap_pairs": winnow_overlap_pairs_docs,
    "repetition_signals": repetition_signals_docs,
    "ann_pq_refined_topk": ann_pq_refined_topk,
    "psi_drift_events": psi_drift_events,
    "ols_trend_events": ols_trend_events,
    "char_entropy_docs": char_entropy_docs,
    "range_split_orders": range_split_orders,
    "chunk_docs_windows": chunk_docs_windows,
    "hard_negatives_embeddings": hard_negatives_embeddings,
    "weighted_quantiles_lineitem": weighted_quantiles_lineitem,
    "token_budget_docs": token_budget_docs,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "subquery_above_avg": subquery_above_avg,
    "exists_high_value_lineitem": exists_high_value_lineitem,
    "skew_join_orders_customer": skew_join_orders_customer,
    "skew_join_lineitem_supplier": skew_join_lineitem_supplier,
    "skew_join_multicol": skew_join_multicol,
    "skew_join_left_outer": skew_join_left_outer,
    "skew_join_semi": skew_join_semi,
    "skew_join_anti": skew_join_anti,
    "skew_join_cms_estimator": skew_join_cms_estimator,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_distinct": agg_distinct,
    "median_stats": median_stats,
    "skew_agg_distinct": skew_agg_distinct,
    "skew_agg_salted_mean": skew_agg_salted_mean,
    "grouping_sets_li": grouping_sets_li,
    "json_props_events": json_props_events,
    "vector_stats": vector_stats,
    "window_top_orders": window_top_orders,
    "topk_orders": topk_orders,
    "setops_intersect": setops_intersect,
    "setops_except": setops_except,
    "scalar_funcs": scalar_funcs,
    "date_rollup_orders": date_rollup_orders,
    "q4_priority_late_ship": q4_priority_late_ship,
    "q12_priority_by_returnflag": q12_priority_by_returnflag,
}

# Machine-readable driver-window marker (VERDICT r10 #1): the test
# asserts list(QUERIES)[:DRIVER_WINDOW["size"]] == DRIVER_WINDOW["entries"],
# that the composition arithmetic adds up, and that no entry OUTSIDE the
# window is staler (per CORRECTNESS_r*.json) than any non-debut,
# non-changed entry inside it.
DRIVER_WINDOW = {
    "round": 14,
    "size": 50,
    "composition": {"debut": 0, "changed": 4, "r9_stale": 13,
                    "r10_stale": 33},
    "debut": (),
    "changed": (
        "langid_softmax_docs",
        "langid_softmax_eval",
        "langid_planted_multilingual",
        "jpeg_decode_stats",
    ),
    "entries": (
        "langid_softmax_docs",
        "langid_softmax_eval",
        "langid_planted_multilingual",
        "jpeg_decode_stats",
        "bottomk_quantiles_orders",
        "dedup_containment_docs",
        "dedup_exact_substr",
        "delete_propagation_stats",
        "histogram_prices",
        "near_dup_leakage_sources",
        "null_aware_anti_join",
        "q3_via_skew_join",
        "semdedup_embeddings",
        "sequence_packing_docs",
        "substr_dedup_clean_docs",
        "temperature_mix_sources",
        "temporal_join_events",
        "acf_events",
        "ann_ivf_refined_topk",
        "ann_ivfpq_refined_topk",
        "ann_lsh_refined_topk",
        "asof_purchase_attribution",
        "assoc_rules_copurchase",
        "bigram_lm_quality",
        "bpe_tokenize_docs",
        "bpe_train_docs",
        "dedup_normalized_docs",
        "dedup_simhash_docs",
        "dsir_importance_docs",
        "hybrid_retrieval_rrf",
        "incremental_exact_dedup_docs",
        "incremental_minhash_docs",
        "join_size_estimate_cms",
        "multimodal_features",
        "ndcg_retrieval_eval",
        "ngram_diversity_sources",
        "pipeline_train_mix",
        "pivot_linestatus",
        "q10_returned_items",
        "q11_important_parts",
        "q13_order_count_distribution",
        "q15_top_supplier",
        "q16_supplier_part_counts",
        "q17_small_qty_revenue",
        "q18_large_volume_customers",
        "q20_part_promotion_suppliers",
        "q21_waiting_suppliers",
        "q2_min_cost_supplier",
        "q7_volume_shipping",
        "q8_market_share",
    ),
}

ORACLES: dict[str, str] = {
    "langid_softmax_docs": LANGID_SOFTMAX_SQL,
    "langid_softmax_eval": LANGID_EVAL_SQL,
    # text-dependent certification over planted disjoint alphabets
    # (r13 debut)
    "langid_planted_multilingual": LANGID_PLANTED_SQL,
    "bleu_rouge_eval_docs": BLEU_ROUGE_SQL,
    "readability_docs": READABILITY_SQL,
    "domain_reweight_docs": DOMAIN_REWEIGHT_SQL,
    "domain_reweight_mw_docs": DOMAIN_REWEIGHT_MW_SQL,
    "setsim_join_docs": SETSIM_JOIN_SQL,
    "assoc_rules_copurchase": ASSOC_RULES_SQL,
    "acf_events": ACF_SQL,
    "mad_outliers_lineitem": MAD_OUTLIERS_SQL,
    "weighted_sample_docs": WEIGHTED_SAMPLE_SQL,
    "markov_transitions_events": MARKOV_SQL,
    "skyline_parts": SKYLINE_SQL,
    "pmi_collocations_docs": PMI_SQL,
    "kcore_copurchase": KCORE_SQL,
    "theil_sen_events": THEIL_SEN_SQL,
    "theta_sketch_orders": THETA_SKETCH_SQL,
    "join_size_estimate_cms": JOIN_SIZE_CMS_SQL,
    "image_near_dup_phash": IMAGE_NEAR_DUP_SQL,
    # identical planted pixels, PNG container (r13 debut)
    "image_near_dup_png": IMAGE_NEAR_DUP_SQL,
    # analytic expected buckets from the md5 synth parameters
    # (r13 debut — the Spark side really encodes+decodes JPEG)
    "jpeg_decode_stats": JPEG_DECODE_SQL,
    "audio_near_dup_awhash": AUDIO_NEAR_DUP_SQL,
    "url_canonical_dedup": URL_CANONICAL_SQL,
    "profile_orders": PROFILE_ORDERS_SQL,
    "schema_drift_orders": SCHEMA_DRIFT_SQL,
    "adaptive_join_strategies": ADAPTIVE_JOIN_SQL,
    "holt_winters_events": HOLT_WINTERS_SQL,
    "cusum_events": CUSUM_SQL,
    "ks_drift_events": KS_DRIFT_SQL,
    "psi_drift_events": PSI_DRIFT_SQL,
    "ols_trend_events": OLS_TREND_SQL,
    "char_entropy_docs": CHAR_ENTROPY_SQL,
    "label_propagation_copurchase": LPA_SQL,
    "range_split_orders": RANGE_SPLIT_SQL,
    "chunk_docs_windows": CHUNK_DOCS_SQL,
    "hard_negatives_embeddings": HARD_NEGATIVES_SQL,
    "weighted_quantiles_lineitem": WEIGHTED_QUANTILES_SQL,
    "token_budget_docs": TOKEN_BUDGET_SQL,
    "triangle_count_copurchase": TRIANGLE_SQL,
    "hybrid_retrieval_rrf": HYBRID_RRF_SQL,
    "record_linkage_customers": RECORD_LINKAGE_SQL,
    "entity_resolution_customers": ENTITY_RESOLUTION_SQL,
    "cluster_split_docs": CLUSTER_SPLIT_STATS_SQL,
    "bm25_topk_docs": BM25_SQL,
    "bpe_train_docs": BPE_TRAIN_SQL,
    "bpe_tokenize_docs": BPE_TOKENIZE_SQL,
    "wordpiece_train_docs": WORDPIECE_TRAIN_SQL,
    "wordpiece_tokenize_docs": WORDPIECE_TOKENIZE_SQL,
    "kn_bigram_quality_docs": KN_BIGRAM_SQL,
    "perplexity_buckets_docs": PERPLEXITY_BUCKETS_SQL,
    "classifier_calibration_docs": CLASSIFIER_CALIBRATION_SQL,
    "unigram_tokenizer_docs": UNIGRAM_TRAIN_SQL,
    "unigram_tokenize_docs": UNIGRAM_TOKENIZE_SQL,
    "gopher_quality_docs": GOPHER_QUALITY_SQL,
    "quality_classifier_docs": QUALITY_CLASSIFIER_SQL,
    "hilbert_layout_orders": HILBERT_SQL,
    "bloom_membership_orders": BLOOM_MEMBERSHIP_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "subquery_above_avg": SUBQUERY_SQL,
    "exists_high_value_lineitem": EXISTS_SQL,
    "skew_join_orders_customer": SJ_ORDERS_CUSTOMER_SQL,
    "skew_join_lineitem_supplier": SJ_LINEITEM_SUPPLIER_SQL,
    "skew_join_multicol": SJ_MULTICOL_SQL,
    "skew_join_left_outer": SJ_LEFT_OUTER_SQL,
    "skew_join_semi": SJ_SEMI_SQL,
    "skew_join_anti": SJ_ANTI_SQL,
    "skew_join_cms_estimator": SJ_CMS_SQL,
    "agg_rollup": AGG_ROLLUP_SQL,
    "agg_cube": AGG_CUBE_SQL,
    "agg_distinct": AGG_DISTINCT_SQL,
    "median_stats": MEDIAN_SQL,
    "skew_agg_distinct": SKEW_AGG_DISTINCT_SQL,
    "skew_agg_salted_mean": SKEW_AGG_MEAN_SQL,
    "grouping_sets_li": GROUPING_SETS_SQL,
    "json_props_events": JSON_PROPS_SQL,
    "vector_stats": VECTOR_STATS_SQL,
    "window_top_orders": WINDOW_TOP_SQL,
    "topk_orders": TOPK_SQL,
    "setops_intersect": SETOPS_INTERSECT_SQL,
    "setops_except": SETOPS_EXCEPT_SQL,
    "scalar_funcs": SCALAR_SQL,
    "date_rollup_orders": DATE_ROLLUP_SQL,
    "q4_priority_late_ship": Q4_SQL,
    "q12_priority_by_returnflag": Q12_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q19_disjunctive_brand": Q19_SQL,
    "udtf_sentence_stats": UDTF_SENT_SQL,
    "udaf_weighted_price": UDAF_WPRICE_SQL,
    "dedup_exact_docs": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_JACCARD_SQL,
    "dedup_containment_docs": DEDUP_CONTAINMENT_SQL,
    "dedup_exact_substr": DEDUP_SUBSTR_SQL,
    "substr_dedup_clean_docs": SUBSTR_CLEAN_SQL,
    "semdedup_embeddings": SEMDEDUP_SQL,
    "temperature_mix_sources": TEMPERATURE_MIX_SQL,
    "sequence_packing_docs": SEQUENCE_PACKING_SQL,
    "incremental_exact_dedup_docs": INCR_EXACT_SQL,
    "incremental_minhash_docs": INCR_MINHASH_SQL,
    "incremental_compaction_docs": INCR_COMPACT_SQL,
    "dsir_importance_docs": DSIR_SQL,
    "dsir_resample_docs": DSIR_RESAMPLE_SQL,
    "pipeline_train_mix": PIPELINE_TRAIN_MIX_SQL,
    "near_dup_leakage_sources": NEAR_DUP_LEAKAGE_SQL,
    # dedup_minhash_docs / embedding_near_dup_lsh are gated against exact
    # full-recall oracles; the gate holds because the pinned seeds/banding
    # give empirically 100% recall on the current fixtures (asserted in
    # tests/test_dedup_equivalence.py). A fixture regeneration can flip
    # these to MISMATCH with no code bug — check that test first.
    "dedup_minhash_docs": MINHASH_SQL,
    "dedup_clusters_docs": DEDUP_CLUSTERS_SQL,
    "dedup_fuzzy_survivors": DEDUP_FUZZY_SQL,
    "pipeline_clean_corpus": PIPELINE_SQL,
    "text_stats": TEXT_STATS_SQL,
    "text_lang_id": TEXT_LANG_SQL,
    "knn_bruteforce": KNN_SQL,
    "ann_pq_refined_topk": KNN_SQL,
    # full-coverage certification variants ≡ brute force by
    # construction (VERDICT r9 #4): same queries, k, tiebreak
    "ann_ivf_refined_topk": KNN_SQL,
    "ann_lsh_refined_topk": KNN_SQL,
    "ann_ivfpq_refined_topk": KNN_SQL,
    "ngram_diversity_sources": NGRAM_DIVERSITY_SQL,
    "zipf_vocab_stats_docs": ZIPF_VOCAB_SQL,
    "cdc_chunk_docs": CDC_CHUNK_SQL,
    "embedding_covariance_stats": EMB_COV_SQL,
    "dedup_normalized_docs": DEDUP_NORMALIZED_SQL,
    "embedding_near_dup_pairs": EMB_NEAR_DUP_SQL,
    "embedding_near_dup_lsh": EMB_NEAR_DUP_SQL,
    "token_frequencies": TOKEN_FREQ_SQL,
    "multimodal_binary_meta": MM_BINARY_SQL,
    "multimodal_features": MM_FEATURES_SQL,
    "train_test_split_stats": TRAIN_SPLIT_SQL,
    "tumbling_window_events": TUMBLING_SQL,
    "sliding_window_events": SLIDING_SQL,
    "session_windows_events": SESSION_SQL,
    "asof_purchase_attribution": ASOF_SQL,
    "range_join_price_bands": RANGE_SQL,
    "pivot_linestatus": PIVOT_SQL,
    "unpivot_metrics": UNPIVOT_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q10_returned_items": Q10_SQL,
    "q11_important_parts": Q11_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q18_large_volume_customers": Q18_SQL,
    "q20_part_promotion_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q22_inactive_customers": Q22_SQL,
    "bpe_token_stats": BPE_TOKEN_SQL,
    "multimodal_frame_sample": MM_FRAMES_SQL,
    "salted_window_events": TUMBLING_SQL,
    "prefilter_join_orders": PREFILTER_JOIN_SQL,
    "heavy_hitter_suppliers": HEAVY_HITTER_SQL,
    "contamination_check_docs": CONTAMINATION_SQL,
    "shard_export_stats": SHARD_STATS_SQL,
    "quota_sample_sources": QUOTA_SAMPLE_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "embedding_centroids": EMBEDDING_CENTROIDS_SQL,
    "doc_fingerprint_winnow": WINNOW_FP_SQL,
    "winnow_overlap_pairs": WINNOW_OVERLAP_SQL,
    "repetition_signals": REPETITION_SQL,
    "redact_events_props": REDACT_SQL,
    "zorder_layout_orders": ZORDER_SQL,
    "chunk_dedup_docs": CHUNK_DEDUP_SQL,
    "unigram_lm_quality": UNIGRAM_LM_SQL,
    "merge_upsert_orders": MERGE_UPSERT_SQL,
    "snapshot_diff_orders": SNAPSHOT_DIFF_SQL,
    "scd2_user_event_history": SCD2_SQL,
    "funnel_events": FUNNEL_SQL,
    "resample_locf_events": RESAMPLE_LOCF_SQL,
    "corr_stats_lineitem": CORR_STATS_SQL,
    "cohort_retention_events": COHORT_RETENTION_SQL,
    "rolling_avg_events": ROLLING_AVG_SQL,
    "pagerank_nations": PAGERANK_SQL,
    "window_funcs_orders": WINDOW_FUNCS_SQL,
    "dq_audit_orders": DQ_AUDIT_SQL,
    "ivm_refresh_orders": IVM_REFRESH_SQL,
    "outlier_stats_lineitem": OUTLIER_STATS_SQL,
    "quantize_embeddings_stats": QUANTIZE_SQL,
    "pipeline_pretrain_prep": PRETRAIN_PREP_SQL,
    "setops_all_variants": SETOPS_ALL_SQL,
    "temporal_join_events": TEMPORAL_JOIN_SQL,
    "q3_via_skew_join": Q3_SQL,
    "delete_propagation_stats": DELETE_PROPAGATION_SQL,
    "bottomk_quantiles_orders": BOTTOMK_QUANTILES_SQL,
    # EXACT since r13 via the md5-compat deterministic-compaction mode
    # (VERDICT r12 #3)
    "kll_quantiles_orders": KLL_QUANTILES_SQL,
    "kll_quantiles_by_priority": KLL_BY_PRIORITY_SQL,
    "null_aware_anti_join": NULL_AWARE_ANTI_SQL,
    "histogram_prices": HISTOGRAM_SQL,
    "hll_distinct_stats": HLL_DISTINCT_SQL,
    "hll_union_sources": HLL_UNION_SQL,
    # md5-mode fingerprints replay bit-for-bit (VERDICT r8 #2)
    "dedup_simhash_docs": SIMHASH_SQL,
    "tfidf_cosine_docs": TFIDF_COSINE_SQL,
    "bigram_lm_quality": BIGRAM_LM_SQL,
    "ndcg_retrieval_eval": NDCG_EVAL_SQL,
    "retrieval_metrics_eval": RETRIEVAL_METRICS_SQL,
    # rows-only (intentionally no oracle): ann_lsh_topk,
    # ann_ivf_topk, approx_stats
}

# Queries whose plan CONSTRUCTION runs eager Spark jobs (skew-join hot-key
# pre-pass, connected-components label loop): bench re-times these
# construction+execution so the reported number includes the eager work.
# Any new iterative/pre-pass query must be added here (ADVICE r2 #1).
EAGER_QUERIES = (
    "theta_sketch_orders",
    # per-round localCheckpoint at plan construction (3^rounds lineage guard)
    "kcore_copurchase",
    "label_propagation_copurchase",
    # shortlist legs localCheckpoint at construction (VERDICT r9 #2 —
    # the fused plan's codegen/JIT cold-compile swing)
    "hybrid_retrieval_rrf",
    # 300-row DSIR selection localCheckpoints at construction (round
    # 10: two consumers re-ran the gram aggregation once each)
    "pipeline_train_mix",
    "token_budget_docs",
    "adaptive_join_strategies",
    "ann_pq_topk",
    "ann_pq_refined_topk",
    "ann_ivfpq_topk",
    # centroid training collects at construction (like ann_ivfpq;
    # ann_ivf_topk had the same eager fit all along — bench now times
    # its construction too instead of hiding the k-means collect)
    "ann_ivf_topk",
    "ann_ivf_refined_topk",
    "ann_ivfpq_refined_topk",
    # corpus band table may spill via _session_cache("auto") at
    # construction (the setsim precedent)
    "ann_lsh_refined_topk",
    "bpe_train_docs",
    "bpe_tokenize_docs",
    "unigram_tokenizer_docs",
    "unigram_tokenize_docs",
    # WordPiece trains driver-mode at construction (the BPE posture)
    "wordpiece_train_docs",
    "wordpiece_tokenize_docs",
    # logistic GD trains at construction (6 gradient collects)
    "quality_classifier_docs",
    # softmax GD trains at construction (classes collect + 6
    # gradient collects per entry)
    "langid_softmax_docs",
    "langid_softmax_eval",
    "langid_planted_multilingual",
    "classifier_calibration_docs",
    "cluster_split_docs",
    "entity_resolution_customers",
    "bloom_membership_orders",
    "skew_join_lineitem_supplier",
    "kll_quantiles_orders",
    "hll_union_sources",
    "skew_join_multicol",
    "q3_via_skew_join",
    # _session_cache(ordered, "auto") at plan construction runs an eager
    # saveAsTable when the spill threshold trips (ADVICE r8 #5)
    "setsim_join_docs",
    "dedup_clusters_docs",
    "dedup_fuzzy_survivors",
    # broadcast-size guard materializes + counts the benchmark gram set
    # at plan construction (operators/contamination.py)
    "contamination_check_docs",
    # edge-list localCheckpoint at plan construction (lineage truncation
    # ahead of the 10 lazy iterations)
    "pagerank_nations",
    # HLL sketch builds fold on the driver at plan construction
    "hll_distinct_stats",
    # seed-centroid collect (8 rows) at plan construction
    "semdedup_embeddings",
    # per-group sketch builds fold on the driver at plan construction
    "kll_quantiles_by_priority",
    # merge_upsert's default on_duplicate="error" runs an eager
    # duplicate-source-key check job at plan construction (ADVICE r5 #2)
    "merge_upsert_orders",
)

# Queries whose physical plan legitimately contains a BroadcastNestedLoopJoin:
# every entry is either a 1-row scalar-aggregate broadcast (avg/total/max
# thresholds kept lazy instead of collected driver-side) or, for
# knn_bruteforce, the designed exact-baseline broadcast of a tiny query set
# over the corpus scan. All are bounded and shuffle-free — NOT cartesians.
# tests/test_plans.py::test_no_benched_query_has_cartesian_product derives
# its allowlist from this tuple (VERDICT r3 #2): any new scalar-broadcast
# query MUST be added here or the plan gate fails.
SCALAR_BNL_OK = (
    "assoc_rules_copurchase",  # 1-row n_baskets broadcast for support/lift
    "pmi_collocations_docs",  # 1-row n_words / n_bigrams total broadcasts
    "knn_bruteforce",
    "hard_negatives_embeddings",  # same shape as knn_bruteforce: the
    # tiny anchor set broadcasts over the corpus (embarrassingly
    # parallel, no shuffle); at scale swap in an LSH/IVF candidate join
    "q11_important_parts",
    "q15_top_supplier",
    "q22_inactive_customers",
    "heavy_hitter_suppliers",
    "tfidf_top_terms",  # 1-row n_docs count broadcast for the IDF term
    "bm25_topk_docs",  # 1-row (n_docs, avgdl) corpus-scalar broadcast
    "unigram_lm_quality",  # 1-row total-token-count broadcast for ln(total)
    "bigram_lm_quality",  # 1-row vocabulary-size broadcast for the k·V term
    "domain_reweight_docs",  # same 1-row vocabulary-size broadcast (k·V term)
    "domain_reweight_mw_docs",  # same vocabulary broadcast, unrolled epochs
    "kn_bigram_quality_docs",  # 1-row N1+(··) bigram-type-total broadcast
    "perplexity_buckets_docs",  # composes the KN scorer's scalar broadcast
    "tfidf_cosine_docs",  # 1-row n_docs broadcast for the IDF term
    "ndcg_retrieval_eval",  # BM25's 1-row corpus-scalar broadcast
    "retrieval_metrics_eval",  # same BM25 corpus-scalar broadcast
    "pagerank_nations",  # 1-row vertex-count broadcast per iteration (1/N term)
    "dq_audit_orders",  # 1-row metric frames combined by scalar cross-join
    "delete_propagation_stats",  # 1-row per-table count frames cross-joined
    "temperature_mix_sources",  # 1-row Σn^alpha normalizer broadcast
    "dsir_importance_docs",  # 1-row corpus/target gram-total broadcasts
    "dsir_resample_docs",  # same DSIR 1-row gram-total broadcasts
    "pipeline_train_mix",  # composes the DSIR scalar broadcasts
    "join_size_estimate_cms",  # 1-row est/true/Na/Nb frames cross-joined
    "image_near_dup_phash",  # 1-row pair-stats x corpus-stats cross-join
    "image_near_dup_png",  # same 1-row stats cross-join shape
    "audio_near_dup_awhash",  # same 1-row stats cross-join shape
    "adaptive_join_strategies",  # 1-row per-case decision frames unioned
    "triangle_count_copurchase",  # 1-row node/edge/triangle frames joined
    "hybrid_retrieval_rrf",  # BM25's 1-row corpus-scalar broadcast x3
    "zipf_vocab_stats_docs",  # 1-row totals x 1-row OLS-fit cross-join
    # (langid entries left this list in r13: the weight matrix now
    # broadcasts as a (D+1)-row RELATION equi-joined on bucket — a
    # BroadcastHashJoin, not a BNL)
    "quality_classifier_docs",  # 1-row weight-vector relation broadcast
    # (the langid _weights_rel precedent, r14): the fold reads __w from a
    # 1-row array<double> attached by crossJoin(broadcast(...)) so every
    # GD iteration + scoring share one compiled class — scalar BNL by
    # construction, never data x data
    "classifier_calibration_docs",  # sweeps the same scored relation
    "semdedup_embeddings",  # n_clusters-row centroid table broadcast:
    # each vector fans out exactly x n_clusters for scoring (the IVF
    # assignment shape), bounded by the quantizer size — never data x data
)

# Correct-but-quadratic oracle formulations whose scale-path siblings are
# the benched headline (VERDICT r2 #2): still registered so the sf0.01
# correctness gate checks them, but excluded from the timed sf0.1 bench —
# no benched query plan contains a cartesian/all-pairs product
# (asserted in tests/test_plans.py). Equivalence to the scale paths is
# pinned by tests/test_dedup_equivalence.py.
BENCH_EXCLUDE = (
    "dedup_ngram_jaccard",      # all-pairs-within-shingle; scale path: dedup_minhash_docs
    "embedding_near_dup_pairs",  # cartesian baseline; scale path: embedding_near_dup_lsh
    "dedup_containment_docs",   # all-pairs oracle; scale path: containment_for_pairs on LSH candidates
)


def flagship(spark: SparkSession) -> DataFrame:
    """entry() target: skew join + aggregation over sf0.001."""
    t = load_tables(spark, "/root/testdata/sf0.001")
    j = skew_join(
        t["orders"], t["customer"], [("o_custkey", "c_custkey")], "inner", SKEW_CONF
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )
