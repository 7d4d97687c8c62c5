"""General relational operators beyond the reference's inventory — the OLAP
surface a user of this engine expects alongside extraction (SURVEY.md notes
the reference has no grouping sets / pivot / as-of joins; these are the
Spark-native implementations, each with a DuckDB oracle in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_events_orders(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of join: for each event, the latest order of the same user/customer
    with o_orderdate <= ts.

    Spark has no native ASOF JOIN; the scalable pattern is union + window
    (one shuffle on the key, no range explosion): tag both sides, sort by
    time within the key, carry the last order forward with last(ignorenulls).
    """
    e = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey_in"),
        F.lit(None).cast("double").alias("o_totalprice_in"),
        F.lit(1).alias("is_event"),
    )
    o = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("o_orderkey_in"),
        F.col("o_totalprice").alias("o_totalprice_in"),
        F.lit(0).alias("is_event"),
    )
    u = e.unionByName(o)
    # orders sort before events at the same timestamp (is_event ascending);
    # equal-timestamp orders tie-break on orderkey so "last" is deterministic
    w = Window.partitionBy("k").orderBy("t", "is_event", "o_orderkey_in").rowsBetween(
        Window.unboundedPreceding, 0
    )
    joined = (
        u.withColumn("o_orderkey", F.last("o_orderkey_in", ignorenulls=True).over(w))
        .withColumn("o_totalprice", F.last("o_totalprice_in", ignorenulls=True).over(w))
        .filter(F.col("is_event") == 1)
    )
    return joined.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "o_orderkey",
        F.round("o_totalprice", 4).cast("double").alias("o_totalprice"),
    )


def rollup_revenue(lineitem: DataFrame) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
            "revenue",
        )
    )


def cube_order_stats(orders: DataFrame) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 4).cast("double").alias("avg_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n",
            "avg_price",
        )
    )


def pivot_events(events: DataFrame) -> DataFrame:
    """Pivot event_type into columns of per-user counts (explicit value list —
    the scalable form: no distinct-scan to discover columns)."""
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    for t in types:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)).cast("bigint"))
    return out


def tpch_q3(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shipping priority (adapted: o_orderpriority stands in for the
    missing o_shippriority column). Join strategy: the filtered customer dim
    is broadcast — the fact-side lineitem scan never shuffles for it; orders ⋈
    lineitem is the one key shuffle. Deterministic top-10 via (revenue DESC,
    l_orderkey ASC)."""
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ord_f = orders.filter(F.col("o_orderdate") < F.lit("1998-03-15")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(F.col("l_shipdate") > F.lit("1998-03-15")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(ord_f, li.l_orderkey == ord_f.o_orderkey)
        .join(F.broadcast(cust), ord_f.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def tpch_q5(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5 local-supplier volume for ASIA, 1996. The dimension chain
    region→nation→(customer, supplier) is tiny and broadcast end-to-end; only
    orders ⋈ lineitem shuffles. The c_nationkey = s_nationkey correlation is
    applied as a post-join predicate exactly as the spec writes it."""
    nat = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", F.col("n_nationkey").alias("c_nk"), "n_name")
    supp = supplier.join(
        F.broadcast(nat.select("n_nationkey")),
        supplier.s_nationkey == nat.n_nationkey,
    ).select("s_suppkey", F.col("s_nationkey").alias("s_nk"))
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nk") == F.col("s_nk"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def tpch_q6(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 forecasting revenue change — pure scan+filter+agg; the filters
    push down to the parquet reader (PushedFilters in .explain)."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n"),
        )
    )


def tpch_q14(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q14 promotion effect (adapted to the synthetic p_type domain:
    the exact 'PROMO' class stands in for the spec's 'PROMO%' prefix family).
    Conditional aggregation over a broadcast-dim join: the part dim is
    broadcast, the lineitem scan arrives pre-filtered on the shipdate month
    (predicate pushed to parquet), and the only wide operation is the final
    scalar aggregation — no shuffle of the fact table at all."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_type")),
            li.l_partkey == F.col("p_partkey"),
        )
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                2,
            )
            .cast("double")
            .alias("promo_revenue_pct"),
            F.count("*").alias("n"),
        )
    )


def tpch_q7(
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations (NATION_1 ⇄ NATION_2,
    ship years 1995-1997). Both nation-keyed dimension chains
    (supplier→nation, customer→nation via orders) are tiny and broadcast;
    the only key shuffle is lineitem ⋈ orders. Orders joins the broadcast
    two-nation customer dim BEFORE that exchange — the inner broadcast join
    is map-side, so only orders of the two qualifying nations (~2/25 of
    rows at spec selectivity) ride the shuffle; joining customers after the
    fact exchange would shuffle all 25 nations' orders and discard 23/25 of
    them post-join. The cross-pair predicate ((supp=1 ∧ cust=2) ∨ (supp=2 ∧
    cust=1)) is a post-join filter exactly as the spec writes it — on two
    broadcast columns, so it costs nothing extra at the fact scan."""
    nat2 = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = supplier.join(
        F.broadcast(nat2), supplier.s_nationkey == nat2.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(nat2), customer.c_nationkey == nat2.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    ord2 = (
        orders.select("o_orderkey", "o_custkey")
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select("o_orderkey", "cust_nation")
    )
    return (
        li.join(ord2, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q10(
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q10 returned-item reporting: revenue lost to returns
    (l_returnflag = 'R') per customer for one quarter of orders. Customer
    and nation broadcast; lineitem ⋈ orders is the key shuffle; top 20 via
    TakeOrderedAndProject with c_custkey as the deterministic tie-break."""
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        li.join(ord_f, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).cast("double").alias("c_acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def tpch_q13(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 customer order-count distribution (adapted: the spec's
    o_comment NOT LIKE filter becomes o_orderpriority <> '4-NOT SPECIFIED'
    — the synthetic schema carries no comment column). The double
    aggregation over a LEFT OUTER join is the load-bearing shape: customers
    with zero qualifying orders must survive into the c_count = 0 bucket.
    Orders shuffle on custkey once; the second groupBy is over ≤ a few
    hundred distinct counts."""
    ord_f = orders.filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        customer.select("c_custkey")
        .join(ord_f, customer.c_custkey == ord_f.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def tpch_q15(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15 top supplier: per-supplier revenue over one quarter, then
    keep the supplier(s) hitting the maximum. The max is a 1-row broadcast
    joined back against the (already tiny) revenue aggregate — the same
    scalar-threshold decorrelation as Q22; the fact table is scanned once
    and shuffles once (on suppkey). Revenue is rounded to 2 dp BEFORE the
    max comparison on both engines so float summation order cannot flip
    the equality."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .cast("double")
            .alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("max_revenue"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def tpch_q19(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q19 discounted revenue (adapted: p_type stands in for the
    missing p_container, and the spec's shipmode/shipinstruct guards drop —
    no such columns). The OR-of-ANDs predicate spans both tables, so it
    stays a post-join filter on a broadcast part dim; the per-branch
    l_quantity bounds let nothing push below the join, but the join itself
    is broadcast so the fact never shuffles at all."""
    joined = lineitem.select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    ).join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL")
         & q.between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_type") == "MEDIUM")
           & q.between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "LARGE")
           & q.between(20, 30) & F.col("p_size").between(1, 15))
    )
    return joined.filter(branch).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n"),
    )


def tpch_q1(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 pricing summary (the canonical groupBy-agg benchmark shape)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).cast("double").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).cast("double").alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).cast("double").alias("avg_price"),
            F.round(F.avg("l_discount"), 4).cast("double").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def tpch_q18(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    threshold: float = 250.0,
) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total lineitem
    quantity exceeds ``threshold``, with their customer, ranked by order
    value (reference precedent: top-k over aggregated groups, the shape of
    the reference's vocab min-count + sort, build_vocab.py).

    Plan shape at 100 TB: the only full-fact shuffle is the
    groupBy(l_orderkey) quantity rollup; its HAVING filter cuts the result
    to a tiny qualifying set (~1% of orders), so AQE broadcasts it into the
    orders join at runtime (no static hint — the qualifying-set size is
    data-dependent, the same no-unconditional-broadcast policy as the LSH
    candidate join); the customer dim is an explicit broadcast. The spec's
    correlated `IN (SELECT ... HAVING)` is expressed as the aggregation
    itself reused as the join input — no second scan of lineitem, no
    semi-join back against the fact table.
    """
    qualifying = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > threshold)
    )
    return (
        qualifying.join(orders, qualifying.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


def tpch_q17(
    part: DataFrame, lineitem: DataFrame, brand: str = "Brand#23"
) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue (adapted to the synthetic part
    schema: no p_container column, so the part predicate is the brand alone).

    The spec's correlated scalar subquery — ``l_quantity < 0.2 * (SELECT
    avg(l_quantity) ... WHERE l2.l_partkey = p_partkey)`` — decorrelates to
    a per-partkey window average over the SAME filtered fact subset. Plan
    shape at 100 TB: the tiny brand-filtered part dim is an explicit
    broadcast, so the fact is scanned ONCE (projection pruned to 3 columns,
    brand membership applied map-side); the window's partitionBy(l_partkey)
    is the pass's only shuffle and carries just the ~1/brand-count slice of
    the fact. The alternative (separate avg-aggregate joined back) scans the
    fact twice for the same shuffle volume — strictly worse.
    """
    parts_f = part.filter(F.col("p_brand") == brand).select("p_partkey")
    lp = (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(parts_f), F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    return (
        lp.withColumn("qty_threshold", 0.2 * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2)
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


def tpch_q22(
    customer: DataFrame, orders: DataFrame, cutoff: str = "2001-01-01"
) -> DataFrame:
    """TPC-H Q22 global-sales-opportunity (adapted: the synthetic customer
    table has no c_phone, so "country code" is c_nationkey, and because every
    synthetic customer has at least one order the spec's NOT EXISTS over ALL
    orders is parameterized to orders since ``cutoff`` — dormant
    high-balance customers).

    Two correlated-subquery decorrelations in one query:
    - the scalar subquery ``c_acctbal > (SELECT avg(c_acctbal) WHERE
      c_acctbal > 0)`` becomes a 1-row aggregate cross-joined in as an
      explicit broadcast (no driver collect — the threshold never leaves
      the cluster);
    - the ``NOT EXISTS (orders since cutoff)`` becomes a LEFT ANTI join on
      the distinct recent-customer set. Its size is data-dependent (cutoff
      moves it anywhere between 0 and |customer|), so no static broadcast
      hint — AQE picks the strategy from runtime stats, the same policy as
      the LSH-candidate and Q18 qualifying-set joins.
    """
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit(cutoff))
        .select("o_custkey")
        .distinct()
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def tpch_q4(
    orders: DataFrame,
    lineitem: DataFrame,
    qtr_start: str = "1997-07-01",
    qtr_end: str = "1997-10-01",
) -> DataFrame:
    """TPC-H Q4 order-priority checking (adapted: the synthetic lineitem has
    no commit/receipt dates, so "late" is ``l_returnflag = 'R'`` — orders
    with at least one returned line).

    The spec's correlated EXISTS decorrelates to a LEFT SEMI join: the fact
    side is pre-filtered to returned lines and projected to the join key
    alone before the shuffle, the orders side carries its pushed quarter
    range to the scan. Semi-join (not inner + distinct) is the
    at-scale-correct shape — it short-circuits per key on the first match
    and never materializes the multiplicity of the many-lines-per-order
    fact."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(qtr_start))
        & (F.col("o_orderdate") < F.lit(qtr_end))
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q20(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    part_type: str = "PROMO",
    stock_start: str = "1997-01-01",
    demand_start: str = "1998-01-01",
    demand_end: str = "1999-01-01",
) -> DataFrame:
    """TPC-H Q20 potential-part-promotion (adapted: the synthetic schema has
    no partsupp table, so per-(supplier, part) "availqty" is the quantity
    shipped in the stock year and the spec's correlated threshold — ``0.5 *
    sum(l_quantity)`` over a date window for the same (partkey, suppkey) —
    is the following year's demand; there is no p_container/p_name pattern,
    so the promotable-part predicate is ``p_type``; output is enriched with
    the per-supplier excess-part count and excess quantity so the gate
    hashes values, not just membership).

    Decorrelation shape: both the derived availqty and the spec's correlated
    scalar subquery aggregate the SAME fact at the same (l_suppkey,
    l_partkey) grain, so one conditional aggregation computes both — the
    fact is scanned ONCE with the two-year shipdate range pushed to the
    scan, projected to 4 columns, brand-membership applied map-side via the
    broadcast promotable-part dim. That (suppkey, partkey) groupBy is the
    only fact-sized shuffle; everything after is supplier-grain: the
    qualifying filter, the per-supplier rollup, the join to the supplier dim
    (AQE-decided — at 100 TB the supplier dim shuffles, the rollup is
    already tiny), and the broadcast nation join. ``avail`` stays NULL for
    groups with no stock-year rows (NULL > x is false), matching the
    oracle's outer aggregation existing only over stock-year rows.
    """
    promo = part.filter(F.col("p_type") == part_type).select("p_partkey")
    lp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(stock_start))
            & (F.col("l_shipdate") < F.lit(demand_end))
        )
        .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    in_stock = F.col("l_shipdate") < F.lit(demand_start)
    per_part = lp.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.when(in_stock, F.col("l_quantity"))).alias("avail"),
        F.sum(F.when(~in_stock, F.col("l_quantity"))).alias("demand"),
    )
    half_demand = 0.5 * F.coalesce(F.col("demand"), F.lit(0.0))
    qual = (
        per_part.filter(F.col("avail") > half_demand)
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_excess_parts"),
            F.round(F.sum(F.col("avail") - half_demand), 2)
            .cast("double")
            .alias("excess_qty"),
        )
    )
    return (
        qual.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name", "n_excess_parts", "excess_qty")
        .orderBy("s_suppkey")
    )


def tpch_q21(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    late_flag: str = "R",
    status: str = "F",
) -> DataFrame:
    """TPC-H Q21 suppliers-who-kept-orders-waiting (adapted: the synthetic
    lineitem has no commit/receipt dates, so "late" is ``l_returnflag =
    'R'``, matching the Q4 adaptation; no top-100 LIMIT — ties at a limit
    boundary are engine-dependent, so the gate hashes the full ranking).

    The spec stacks the two hardest correlation shapes on one fact: EXISTS
    (another supplier contributed to the order) and NOT EXISTS (no OTHER
    supplier was late in it). Both decorrelate to conditional DISTINCT
    counts at the order grain, computed here with window functions over the
    orderkey partition: size(collect_set(suppkey)) > 1 for the EXISTS and
    size(collect_set(suppkey) FILTER late) = 1 for the NOT-EXISTS (this row
    is late, so "exactly one late supplier" means "no other"). The plan
    scans lineitem ONCE: the status-F orders join hash-partitions by
    orderkey and the windows reuse that exact partitioning — one fact
    shuffle total, no self-joins, no second scan. Everything after the
    window filter is supplier-grain: groupBy suppkey count, AQE-decided
    join to the supplier dim, full deterministic ordering.
    """
    o = orders.filter(F.col("o_orderstatus") == status).select("o_orderkey")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_returnflag").join(
        o, F.col("l_orderkey") == F.col("o_orderkey")
    )
    w = Window.partitionBy("l_orderkey")
    late = F.col("l_returnflag") == late_flag
    flagged = li.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(
            F.collect_set(F.when(late, F.col("l_suppkey"))).over(w)
        ),
    )
    return (
        flagged.filter(late & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
    )


def tpch_q8(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    market_region: str = "EUROPE",
    target_nation: str = "NATION_1",
    part_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8 national market share: the fraction of a region's market
    volume (for one part type, order years 1995-1996) supplied by one
    nation. Adapted to the synthetic schema: ``p_type`` is a single token,
    so the part predicate is equality (the spec's three-token type has no
    counterpart here).

    Plan shape for 100 TB: the part dim (one type, ~1/6 of parts) broadcasts
    into lineitem FIRST — the fact is pruned before any exchange. The
    supplier→nation chain broadcasts. The two unavoidable key shuffles are
    lineitem ⋈ orders (orderkey) and that result ⋈ customer (custkey);
    customer itself is pre-joined to the broadcast region-nation dim so the
    shuffled customer side carries only (c_custkey) of the market region
    (~1/5 of customers). The share division happens on two grouped sums of
    the same rows — one aggregation, no second scan."""
    rnat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == market_region)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust_r = customer.join(
        F.broadcast(rnat), customer.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey")
    supp_n = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == part_type)),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    return (
        li.join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_r, F.col("o_custkey") == cust_r.c_custkey)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == target_nation, F.col("volume"))
                    .otherwise(F.lit(0.0))
                )
                / F.sum("volume"),
                6,
            ).cast("double").alias("mkt_share")
        )
        .orderBy("o_year")
    )


def tpch_q9(
    nation: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    name_token: str = "widget",
    cost_factor: float = 0.6,
) -> DataFrame:
    """TPC-H Q9 product-type profit by nation and year. Adapted: the
    synthetic schema has no partsupp, so per-unit supply cost is
    ``cost_factor * p_retailprice`` (a deterministic stand-in with the same
    join shape — the cost rides the part dim into the fact scan); the part
    predicate matches a token of ``p_name`` (spec: p_name LIKE '%green%').

    Plan shape for 100 TB: part (filtered, with its cost column) and the
    supplier→nation chain both broadcast into the lineitem scan — profit is
    computed per fact row map-side; the single key shuffle is
    lineitem ⋈ orders (orderkey, for the order year); the aggregation on
    (nation, year) is a ~25×years-row rollup with map-side partials."""
    supp_n = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    part_f = part.filter(F.col("p_name").contains(name_token)).select(
        "p_partkey", "p_retailprice"
    )
    profit = (
        lineitem.join(F.broadcast(part_f), lineitem.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "nation",
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.lit(cost_factor) * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return (
        profit.join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def tpch_q12(
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = 90,
    ship_start: str = "1996-01-01",
    ship_end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 shipping-priority audit. Adapted: the synthetic schema has
    no l_shipmode/l_commitdate/l_receiptdate, so the audit groups by
    ``l_linestatus`` and a shipment is "late" when it shipped more than
    ``late_days`` after the order date (the spec's receipt-vs-commit lag has
    no counterpart). Same shape as the spec: one lineitem ⋈ orders key
    shuffle with the ship-window filter pushed to the fact scan, priority
    split as conditional sums in one aggregation."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(ship_start))
        & (F.col("l_shipdate") < F.lit(ship_end))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate",
                          "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), late_days)
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).cast("bigint").alias("high_line_count"),
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0
                ).otherwise(1)
            ).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def tpch_q2(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    r_name: str = "EUROPE",
    p_size: int = 15,
    p_type: str = "STANDARD",
) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier. Adapted: no partsupp, so the
    (part, supplier) supply cost is DERIVED from the fact —
    min(l_extendedprice / l_quantity) per (l_partkey, l_suppkey) — and the
    synthetic part columns (p_size equality + single-token p_type) stand in
    for the spec's size + '%BRASS' predicates; output carries the columns
    the schema has (acctbal, supplier, nation, part, cost).

    Decorrelation shape (the spec's correlated MIN subquery): the derived
    supply fact is aggregated ONCE (one shuffle on (partkey, suppkey));
    filtering to the region's suppliers and the qualifying parts happens
    via broadcast dims BEFORE the per-part minimum, which is a window over
    partkey — no second scan, no self-join, no correlated re-execution. The
    window's partkey partitioning is a sub-partitioning of the aggregation
    key, so AQE plans it off the same exchange."""
    rnat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == r_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    supp = supplier.join(
        F.broadcast(rnat), supplier.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    part_f = part.filter(
        (F.col("p_size") == p_size) & (F.col("p_type") == p_type)
    ).select("p_partkey")
    ps = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4)
            .alias("cost")
        )
        .join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def tpch_q11(
    nation: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    n_name: str = "NATION_3",
    fraction: float = 0.001,
) -> DataFrame:
    """TPC-H Q11 important stock identification. Adapted: no partsupp, so a
    part's stock value held by one nation's suppliers is the derived
    ``sum(l_extendedprice * l_quantity)`` over that nation's lineitems.

    Shape: the nation's suppliers broadcast into the fact scan (fact pruned
    map-side); ONE aggregation per partkey; the spec's correlated
    ``fraction × total`` threshold is a 1-row aggregate broadcast back
    (same device as Q15's max and Q22's avg) — the fact is scanned once,
    the per-part frame reused for both sides."""
    supp_n = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == n_name)),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        lineitem.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    threshold = per_part.agg(
        (F.sum("value") * fraction).alias("thr")
    )
    # compare at 2dp on BOTH sides: float-sum order differs across engines,
    # and a raw > against an unrounded threshold could flip a boundary row
    # (same device as Q15's rounded-revenue equality)
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.round("value", 2) > F.round("thr", 2))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), "p_partkey")
    )


def tpch_q16(
    supplier: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    excl_brand: str = "BRAND_1",
    excl_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship. Adapted: the (part, supplier)
    pairs come from distinct lineitem (l_partkey, l_suppkey) — the derived
    supply relation — and the spec's complaint-comment supplier exclusion
    (no s_comment column) becomes ``s_acctbal < 0`` (delinquent accounts),
    applied as a broadcast LEFT ANTI join exactly like the spec's NOT IN.

    Shape: distinct pairs are one shuffle on the pair key; the part
    attribute filter rides a broadcast join; supplier_cnt is a
    count-distinct per (brand, type, size) — Spark plans the two-level
    distinct aggregation with map-side partials."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    part_f = part.filter(
        (F.col("p_brand") != excl_brand) & (F.col("p_type") != excl_type)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excl = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excl), F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )
