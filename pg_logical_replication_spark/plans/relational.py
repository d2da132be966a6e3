"""Relational query layer — SURVEY §2.2's capability matrix, Spark-first.

Each query is expressed with the DataFrame API (Catalyst handles pushdown,
pruning, join strategy; AQE rewrites at runtime) and paired with ANSI SQL
for the DuckDB oracle. Aggregates use the registry's stable-sum pattern so
values hash identically across engines.

Scale notes are in each docstring — the design point is 100 TB / 1000
executors even though tests run local (BASELINE.md north star).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pg_logical_replication_spark.plans.registry import register, savg, ssum, t

_SSUM = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"
_SAVG = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({x})"


# --------------------------------------------------------------- aggregates
@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_SSUM.format(x='l_quantity')} AS sum_qty,
           {_SSUM.format(x='l_extendedprice')} AS sum_base_price,
           {_SSUM.format(x='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_SSUM.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {_SAVG.format(x='l_quantity')} AS avg_qty,
           {_SAVG.format(x='l_extendedprice')} AS avg_price,
           {_SAVG.format(x='l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 pricing summary: scan + partial/final hash agg",
)
def q1_pricing_summary(spark, sf_dir):
    """Scale: map-side partial agg on 6 groups → final agg is tiny;
    filter + 7-column pruning pushed to the parquet scan.
    spread_if_narrow: the sf testdata is single-row-group parquet (one
    working scan task); the respread parallelizes the decimal aggs and
    is a no-op whenever the input plans ≥ cores splits (any real
    deployment)."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    li = spread_if_narrow(t(spark, sf_dir, "lineitem"), spark)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            ssum("l_quantity").alias("sum_qty"),
            ssum("l_extendedprice").alias("sum_base_price"),
            ssum(disc_price).alias("sum_disc_price"),
            ssum(charge).alias("sum_charge"),
            savg("l_quantity").alias("avg_qty"),
            savg("l_extendedprice").alias("avg_price"),
            savg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT o.o_orderkey, {_SSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, o_orderkey LIMIT 10
    """,
    "TPC-H Q3: 3-way join + agg + deterministic top-10",
)
def q3_shipping_priority(spark, sf_dir):
    """Scale: customer (filtered) broadcasts under AQE; orders⋈lineitem is
    the one big shuffle, on the join key both sides. Top-10 is a
    TakeOrdered — no global sort materialization."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])  # customer SCALES: AQE decides
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(ssum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "o_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier",
    f"""
    SELECT n.n_name, {_SSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                                   AND c.c_nationkey = s.s_nationkey
                    JOIN nation n ON s.s_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    "TPC-H Q5: 6-way join with small-dim broadcasts",
)
def q5_local_supplier(spark, sf_dir):
    """Scale: region/nation/supplier broadcast (tiny dims); the only
    shuffles are orders⋈lineitem and customer⋈orders, both key-aligned."""
    c, o, li = (t(spark, sf_dir, x) for x in ("customer", "orders", "lineitem"))
    s, n, r = (t(spark, sf_dir, x) for x in ("supplier", "nation", "region"))
    r = r.filter(F.col("r_name") == "ASIA")
    o = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            # supplier SCALES with SF: no hint, AQE decides
            s,
            (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(ssum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q_agg_distinct",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    "exact distinct aggregation (expand + two-phase agg)",
)
def q_agg_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "q_approx_distinct",
    None,  # raw HLL estimates are engine-specific — rows-only by design
    "approx_count_distinct (HyperLogLog++): the 100 TB-scale distinct path",
)
def q_approx_distinct(spark, sf_dir):
    """Scale: HLL sketch merges are associative — no expand, constant
    memory per group; THE way to count distincts at 100 TB."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"))
    )


@register(
    "q_approx_distinct_contract",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS approx_ok
    FROM lineitem GROUP BY 1
    """,
    "HLL accuracy contract, oracle-gated: the rsd=0.02 sketch estimate "
    "must land within 10% (5σ) of the exact distinct count per group — "
    "the raw estimate can't hash-match SQL, but the contract it must "
    "honor can (same pattern as q_ann_lsh_recall)",
)
def q_approx_distinct_contract(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("_approx") - F.col("exact_orders"))
                <= 0.1 * F.col("exact_orders")
            ).alias("approx_ok"),
        )
    )


@register(
    "q_rollup",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {_SSUM.format(x='l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "ROLLUP grouping hierarchy",
)
def q_rollup(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), ssum("l_quantity").alias("sum_qty"))
    )


@register(
    "q_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "CUBE over two dimensions",
)
def q_cube(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus, {_SSUM.format(x='l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "explicit GROUPING SETS via SQL",
)
def q_grouping_sets(spark, sf_dir):
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ----------------------------------------------------------------- windows
@register(
    "q_window_topk",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) WHERE rnk <= 3
    """,
    "top-k per group via row_number window",
)
def q_window_topk(spark, sf_dir):
    """Scale: one shuffle on o_custkey; rank truncation happens inside
    each partition (no global sort)."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "q_window_running",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
    "running aggregate per key (cumulative customer spend)",
)
def q_window_running(spark, sf_dir):
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "q_orders_revenue_milestones",
    """
    WITH cents AS (SELECT o_orderkey, o_orderdate,
                          CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
                   FROM orders),
    cum AS (SELECT v, SUM(v) OVER (ORDER BY o_orderdate, o_orderkey
                                   ROWS UNBOUNDED PRECEDING) AS c
            FROM cents),
    tot AS (SELECT SUM(v) AS t FROM cents)
    SELECT CAST(k AS INTEGER) AS decile,
           CAST(MIN(c) AS BIGINT) AS cum_cents
    FROM cum, tot, (SELECT UNNEST(range(1, 11)) AS k) d
    WHERE c * 10 >= t * k
    GROUP BY 1 ORDER BY 1
    """,
    "GLOBAL revenue decile milestones: the cumulative cents value at "
    "the first order (in (date, key) stream order) that crosses each "
    "10%-of-total threshold — the oracle is a corpus-wide running-sum "
    "window; the executed plan is layout.global_running_sum (range "
    "exchange + per-partition offsets, no SinglePartition stage), and "
    "only the <= 10 crossing rows survive to the aggregate",
)
def q_orders_revenue_milestones(spark, sf_dir):
    """The new-in-r7 exact distributed prefix sum as a user query.
    Crossing detection is per-row integer arithmetic: row crosses
    decile k iff floor(prev*10/t) < k <= floor(c*10/t) (v > 0 so c is
    strictly increasing and each decile is crossed exactly once) —
    emitted via sequence(lo, hi) WITH the lo<=hi guard, because
    sequence(lo>hi) generates a DESCENDING range, not an empty one
    (SCALE.md r6 trap)."""
    from pg_logical_replication_spark.operators.layout import (
        global_running_sum,
    )

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        # explicit round: DuckDB ROUNDS double->bigint casts, Spark
        # TRUNCATES -- the implicit cast diverges by 1 cent per row
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
    )
    cum = global_running_sum(
        o, ["o_orderdate", "o_orderkey"], "v", out_col="c"
    )
    # grand total = max running sum (v > 0), read from the checkpointed
    # cum frame — NOT a second full scan of orders (round-7 review)
    tot = cum.agg(F.max("c").alias("t"))
    lo = F.expr("(c - v) * 10 div t") + F.lit(1).cast("long")
    hi = F.expr("c * 10 div t")
    return (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("_lo", lo)
        .withColumn("_hi", hi)
        .where(F.col("_hi") >= F.col("_lo"))
        .select(
            F.explode(F.sequence("_lo", "_hi")).alias("k"),
            F.col("c").alias("cum_cents"),
        )
        .where((F.col("k") >= 1) & (F.col("k") <= 10))
        .select(
            F.col("k").cast("int").alias("decile"),
            F.col("cum_cents").cast("long").alias("cum_cents"),
        )
        .orderBy("decile")
    )


@register(
    "q_window_range_frame",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY user_id ORDER BY CAST(epoch(ts) AS BIGINT)
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS hour_sum
    FROM events
    """,
    "RANGE-frame window: per-user rolling 1-hour sum by event time — "
    "value-based frames (peers included), vs the ROWS frames elsewhere; "
    "decimal accumulation keeps the frame sum order-stable cross-engine",
)
def q_window_range_frame(spark, sf_dir):
    """rangeBetween over epoch seconds: the frame is defined by the
    ORDER BY *value*, so out-of-order arrival inside a partition doesn't
    change results — the property that matters for CDC event time. One
    (user_id) hash shuffle + per-partition sort, same exchange the other
    per-key windows reuse."""
    ev = t(spark, sf_dir, "events").withColumn(
        "_epoch", F.unix_timestamp(F.col("ts"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("_epoch")
        .rangeBetween(-3599, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("hour_sum"),
    )


@register(
    "q_event_funnel",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY 1)
    SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
           (SELECT COUNT(*) FROM s2) AS n_view_after,
           (SELECT COUNT(*) FROM s3) AS n_click_after
    """,
    "ordered event funnel: signup → first view AFTER it → first click "
    "AFTER that, per user; stage counts — sequential-pattern analytics "
    "as three cascaded min-aggregates, no self-join explosion",
)
def q_event_funnel(spark, sf_dir):
    """Each stage is a groupBy(user_id) min + a key-aligned join back —
    the user_id hash partitioning is reused down the cascade, and each
    stage's input shrinks monotonically. No window over the full stream,
    no per-user collect."""
    ev = t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "click")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_signup"))
        .crossJoin(s2.agg(F.count("*").alias("n_view_after")))
        .crossJoin(s3.agg(F.count("*").alias("n_click_after")))
    )


@register(
    "q_cohort_retention",
    """
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    first_seen AS (
      SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY 1)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
           COUNT(*) AS n_active
    FROM activity a JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
    "cohort retention: users bucketed by first-seen day, distinct-active "
    "counts per (cohort, day-offset) — two aggregates + one key join, "
    "all integer/date arithmetic (bit-stable cross-engine)",
)
def q_cohort_retention(spark, sf_dir):
    """The (user_id, day) distinct and the first-seen aggregate share
    the user_id hash partitioning, and the join is key-aligned on it —
    one logical shuffle chain, no re-exchange; the cohort matrix output
    is tiny regardless of input scale."""
    ev = t(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    act = ev.select("user_id", day.alias("day")).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias(
                "day_offset"
            ),
        )
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "q_window_lag",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price
    FROM orders
    """,
    "lag(): previous-row image per key — the CDC old/new reconstruction primitive",
)
def q_window_lag(spark, sf_dir):
    """lag() is how the engine reconstructs old/new images from a change
    stream (SURVEY §2.2 'window functions' row)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


@register(
    "q_window_ntile",
    """
    SELECT event_type, tile, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           CAST(MIN(pr) AS DOUBLE) AS min_pct_rank,
           CAST(MAX(cd) AS DOUBLE) AS max_cume_dist,
           MAX(fv) AS first_eid
    FROM (
      SELECT event_type, value, event_id,
             NTILE(10)     OVER w AS tile,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST()   OVER w AS cd,
             FIRST_VALUE(event_id) OVER w AS fv
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id))
    GROUP BY event_type, tile
    """,
    "rank-family window functions: ntile decile assignment, "
    "percent_rank, cume_dist, first_value per partition — unique "
    "(value, event_id) ordering makes every rank deterministic",
)
def q_window_ntile(spark, sf_dir):
    """One shuffle on event_type serves all four window functions (same
    WINDOW frame) and the decile rollup reuses it map-side."""
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    ev = t(spark, sf_dir, "events").select(
        "event_type", "value", "event_id",
        F.ntile(10).over(w).alias("tile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first("event_id").over(w).alias("fv"),
    )
    return ev.groupBy("event_type", "tile").agg(
        F.count("*").alias("n"),
        ssum("value").alias("sum_value"),
        F.min("pr").cast("double").alias("min_pct_rank"),
        F.max("cd").cast("double").alias("max_cume_dist"),
        F.max("fv").alias("first_eid"),
    )


# ------------------------------------------------------------ sorts / sets
@register(
    "q_topk_global",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
    """,
    "global top-k with unique tie-break",
)
def q_topk_global(spark, sf_dir):
    """Scale: ORDER BY+LIMIT compiles to TakeOrderedAndProject — per-
    partition heaps + driver merge, never a full sort."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "q_set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    "INTERSECT (distinct) of two key sets",
)
def q_set_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    "EXCEPT (distinct): snapshot diffing primitive",
)
def q_set_except(spark, sf_dir):
    """exceptAll both ways = snapshot diff (SURVEY §2.2 set-ops row)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "q_set_union",
    """
    SELECT DISTINCT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier)
    """,
    "UNION + DISTINCT",
)
def q_set_union(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


# ------------------------------------------------------------------- joins
@register(
    "q_semi_join",
    """
    SELECT c_mktsegment, COUNT(*) AS n_active FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
    "left-semi join (EXISTS)",
)
def q_semi_join(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "q_anti_join",
    """
    SELECT c_nationkey, COUNT(*) AS n_inactive FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
    "left-anti join (NOT EXISTS)",
)
def q_anti_join(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_inactive"))
    )


@register(
    "q_range_join",
    """
    SELECT b.band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
    FROM part p
    JOIN (VALUES ('low', 900.0, 935.0), ('mid', 935.0, 970.0), ('high', 970.0, 1000.0))
         AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
    "range (interval) join against a band table",
)
def q_range_join(spark, sf_dir):
    """Scale: inequality join with a small build side → broadcast nested
    loop over 3 rows — constant per-row work; for large band tables the
    engine buckets the range (see operators/asof.py)."""
    p = t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 900.0, 935.0), ("mid", 935.0, 970.0), ("high", 970.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p["p_retailprice"] >= bands["lo"]) & (p["p_retailprice"] < bands["hi"]),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            ssum("p_retailprice").alias("sum_price"),
        )
    )


@register(
    "q_asof_join",
    """
    SELECT event_id, user_id, purchase_value, last_click_value FROM (
      SELECT event_id, user_id, event_type, value AS purchase_value,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_value
      FROM events) WHERE event_type = 'purchase'
    """,
    "as-of join: latest click strictly before each purchase, per user",
)
def q_asof_join(spark, sf_dir):
    """As-of ('most recent prior fact') is CDC-native — same shape as
    'row image as of LSN'. One shuffle on user_id; last(ignorenulls) over
    an unbounded-preceding frame avoids a per-row range scan."""
    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        ev.withColumn(
            "last_click_value",
            F.last(
                F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", F.col("value").alias("purchase_value"), "last_click_value"
        )
    )


# ---------------------------------------------------- events: json / time
@register(
    "q_json_extract",
    f"""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n, {_SSUM.format(x='value')} AS sum_value
    FROM events GROUP BY 1
    """,
    "JSON path extraction + aggregation",
)
def q_json_extract(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_mod"),
            "value",
        )
        .groupBy("k_mod")
        .agg(F.count("*").alias("n"), ssum("value").alias("sum_value"))
    )


@register(
    "q_tumbling_window",
    f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n, {_SSUM.format(x='value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
    "tumbling time window aggregation (batch form of streaming window())",
)
def q_tumbling_window(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count("*").alias("n"), ssum("value").alias("sum_value"))
    )


@register(
    "q_sessionize",
    f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_idx
      FROM g)
    SELECT user_id, session_idx, COUNT(*) AS n_events, {_SSUM.format(x='value')} AS sum_value
    FROM s GROUP BY user_id, session_idx
    """,
    "sessionization: 30-min-gap sessions via lag + cumulative sum",
)
def q_sessionize(spark, sf_dir):
    """Batch equivalent of streaming session_window(); one shuffle on
    user_id, two window passes in the same partitioning."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    g = ev.select(
        "user_id", "ts", "value",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_session"),
    )
    w2 = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    s = g.withColumn("session_idx", F.sum("new_session").over(w2))
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"), ssum("value").alias("sum_value")
    )


@register(
    "q6_forecast_revenue",
    f"""
    SELECT {_SSUM.format(x='l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 forecast-revenue: pure scan query, every predicate pushed "
    "to parquet",
)
def q6_forecast_revenue(spark, sf_dir):
    """Scale: no shuffle at all — filters + 3-column pruning reach the
    scan (PushedFilters), partial sums combine in one final row."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(ssum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 pattern: EXISTS decorrelated to a left-semi join, count by "
    "priority",
)
def q4_order_priority(spark, sf_dir):
    """Scale: semi join shuffles only orderkeys of the filtered year; the
    'R' filter prunes the probe side at the scan."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           {_SSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    "TPC-H Q10: top-20 customers by returned-item revenue (3 joins + "
    "agg + top-k)",
)
def q10_returned_items(spark, sf_dir):
    """Scale: lineitem filtered at scan ('R' ≈ 25%); nation broadcasts;
    top-20 via TakeOrderedAndProject, never a global sort."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(ssum(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             CAST(MIN(CAST(l_extendedprice / l_quantity AS DECIMAL(38,6)))
                  AS DOUBLE) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    best AS (SELECT l_partkey, MIN(unit_cost) AS min_cost
             FROM cost GROUP BY l_partkey)
    SELECT p.p_partkey, p.p_brand, s.s_name,
           ROUND(c.unit_cost, 6) AS unit_cost
    FROM cost c
      JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost
      JOIN part p ON p.p_partkey = c.l_partkey
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
    WHERE p.p_size <= 5
    ORDER BY p.p_partkey, s.s_name LIMIT 50
    """,
    "TPC-H Q2 pattern: correlated min-subquery decorrelated to "
    "aggregate + join-back (min unit cost supplier per small part)",
)
def q2_min_cost_supplier(spark, sf_dir):
    """Scale: the classic decorrelation — per-(part,supp) agg, then a
    per-part min re-joined on equality. Both aggs partial-combine; the
    join-back key (partkey) reuses the agg's partitioning under AQE."""
    l = t(spark, sf_dir, "lineitem")
    cost = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min((F.col("l_extendedprice") / F.col("l_quantity")).cast("decimal(38,6)"))
            .cast("double")
            .alias("unit_cost")
        )
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost")).withColumnRenamed("l_partkey", "b_partkey")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    s = t(spark, sf_dir, "supplier")
    return (
        cost.join(
            best,
            (cost["l_partkey"] == best["b_partkey"])
            & (cost["unit_cost"] == best["min_cost"]),
        )
        .join(p, p["p_partkey"] == cost["l_partkey"])
        .join(s, s["s_suppkey"] == cost["l_suppkey"])  # supplier SCALES: AQE decides
        .select(
            "p_partkey", "p_brand", "s_name", F.round("unit_cost", 6).alias("unit_cost")
        )
        .orderBy("p_partkey", "s_name")
        .limit(50)
    )


@register(
    "q_sliding_window",
    f"""
    SELECT ws, COUNT(*) AS n, {_SSUM.format(x='value')} AS sum_value
    FROM (
      SELECT date_trunc('hour', ts) AS ws, value FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value FROM events
    ) GROUP BY ws
    """,
    "sliding window (2h window, 1h slide) via window(); each event lands in "
    "two overlapping windows — streaming's F.window in its batch form. "
    "Scale: window assignment is a stateless projection (explode of ≤2 "
    "buckets); the agg is one partial+final hash shuffle on window start.",
)
def q_sliding_window(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), ssum("value").alias("sum_value"))
        .select(F.col("w").getField("start").alias("ws"), "n", "sum_value")
    )


@register(
    "q_pivot",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
             AS urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
             AS high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT)
             AS medium
    FROM orders GROUP BY 1
    """,
    "pivot: order counts per year x priority as columns (groupBy().pivot "
    "with an explicit value list — one pass, no per-value scans)",
)
def q_pivot(spark, sf_dir):
    """Scale note: ALWAYS pass the pivot value list — without it Spark
    runs an extra distinct-collect job over the full table to discover
    the columns before planning the real aggregation."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select(F.year("o_orderdate").cast("long").alias("o_year"), "o_orderpriority")
        .groupBy("o_year")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .count()
        .select(
            "o_year",
            F.coalesce(F.col("1-URGENT"), F.lit(0)).alias("urgent"),
            F.coalesce(F.col("2-HIGH"), F.lit(0)).alias("high"),
            F.coalesce(F.col("3-MEDIUM"), F.lit(0)).alias("medium"),
        )
    )


@register(
    "q_unpivot",
    """
    SELECT p_partkey, metric, CAST(val AS DOUBLE) AS val FROM (
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retail', CAST(p_retailprice AS DOUBLE) FROM part
    ) WHERE val IS NOT NULL
    """,
    "unpivot/melt: wide part metrics to long (id, metric, value) rows — "
    "the inverse reshape, stateless and narrow",
)
def q_unpivot(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retail"),
    ).unpivot("p_partkey", ["size", "retail"], "metric", "val")


@register(
    "q_agg_percentile",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
    FROM lineitem GROUP BY l_returnflag
    """,
    "exact interpolated percentiles per group (median quantity, p95 "
    "price) — Spark percentile() vs DuckDB quantile_cont",
)
def q_agg_percentile(spark, sf_dir):
    """Exact percentile is a sort-based aggregate — at 100 TB prefer
    approx_percentile (t-digest sketch, mergeable map-side) unless
    bit-exactness is the requirement; both surfaces exist here and the
    approx path is q_approx_distinct's sketch family."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 6).alias("p95_price"),
    )


@register(
    "q_agg_stats",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    "statistical aggregates per group: sample stddev, Pearson corr, "
    "sample covariance",
)
def q_agg_stats(spark, sf_dir):
    """All three are single-pass mergeable moment sketches (sum, sum of
    squares, co-moments) — partial aggregation map-side, so the shuffle
    carries O(groups) moment tuples at any scale."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
    )


@register(
    "q_fuzzy_part_names",
    """
    SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2 AND a.p_name <> b.p_name
    """,
    "fuzzy string matching: near-identical part names (levenshtein <= 2) "
    "within brand-blocked candidate pairs",
)
def q_fuzzy_part_names(spark, sf_dir):
    """Blocking on brand bounds the pair count by a CONSTANT factor, not
    asymptotically — so the per-pair cost must be near-zero for the
    non-matches that dominate: (1) a length pre-filter inside the join
    condition (dist<=2 forces |len diff|<=2) rejects most pairs before
    any DP, and (2) the thresholded ``levenshtein(l, r, 2)`` (banded DP,
    early exit, returns -1 over threshold) prices survivors at O(2·len)
    instead of O(len²). Together 2× at sf0.1 (names here cluster in
    length, so the pre-filter rejects less than it would on natural
    data). Brand blocking alone is NOT the 100 TB answer — the pair
    count still grows n² within a block; at corpus scale candidates
    must come from sub-quadratic generation (shared-token inverted
    index / the LSH machinery in operators/dedup.py) with edit distance
    only as the re-rank."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a = p.select(*[F.col(c).alias(f"a_{c}") for c in p.columns])
    b = p.select(*[F.col(c).alias(f"b_{c}") for c in p.columns])
    len_ok = (
        F.abs(F.length("a_p_name") - F.length("b_p_name")) <= 2
    )
    return (
        a.join(
            b,
            (F.col("a_p_brand") == F.col("b_p_brand"))
            & (F.col("a_p_partkey") < F.col("b_p_partkey"))
            & len_ok
            & (F.col("a_p_name") != F.col("b_p_name")),
        )
        .select(
            F.col("a_p_partkey").alias("a_key"),
            F.col("b_p_partkey").alias("b_key"),
            F.levenshtein("a_p_name", "b_p_name", 2).cast("long").alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )


@register(
    "q_skew_salted_join",
    """
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(e.event_id) AS BIGINT) AS sum_eid
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    WHERE n.n_regionkey = 1
    GROUP BY e.event_type
    """,
    "skew-resistant salted equi-join, value-gated (not just plan-"
    "gated): the big side joins a tiny dim through "
    "operators.layout.salted_equi_join — hot keys spread over 8 salt "
    "partitions — and the aggregate must equal DuckDB's plain join",
)
def q_skew_salted_join(spark, sf_dir):
    """events.user_id%25 is a deliberately low-cardinality (hence
    skew-prone) key; salting spreads each key over 8 shuffle partitions
    while the dim side explodes 8× (25 rows → 200 — nothing). At real
    skew AQE's skew-join split handles the same shape automatically;
    this keeps the manual tool oracle-verified."""
    from pg_logical_replication_spark.operators.layout import salted_equi_join

    ev = t(spark, sf_dir, "events").withColumn(
        "n_nationkey", (F.col("user_id") % 25).cast("long")
    )
    dim = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    joined = salted_equi_join(ev, dim, on=["n_nationkey"], n_salt=8)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("event_id").alias("sum_eid"),
    )


@register(
    "q_approx_percentile_contract",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS exact_median,
           TRUE AS approx_ok
    FROM lineitem GROUP BY 1
    """,
    "approx_percentile accuracy contract, oracle-gated: the t-digest-"
    "style sketch median (accuracy 10000) must land within 1% of the "
    "exact interpolated median per group — the mergeable sketch is the "
    "100 TB path where exact percentile's global sort is not "
    "(q_agg_percentile keeps the exact surface); same contract pattern "
    "as q_approx_distinct_contract",
)
def q_approx_percentile_contract(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias(
                "exact_median"
            ),
            F.approx_percentile(
                "l_extendedprice", F.lit(0.5), F.lit(10000)
            ).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            (
                F.abs(F.col("_approx") - F.col("exact_median"))
                <= 0.01 * F.col("exact_median")
            ).alias("approx_ok"),
        )
    )


@register(
    "q_events_gapfill",
    """
    WITH daily AS (
      SELECT user_id, day, value FROM (
        SELECT user_id, date_trunc('day', ts) AS day, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1),
    span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
             FROM daily GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
             FROM span),
    filled AS (SELECT g.user_id, g.day,
                      LAST_VALUE(d.value IGNORE NULLS)
                        OVER (PARTITION BY g.user_id ORDER BY g.day) AS value,
                      d.value IS NOT NULL AS observed
               FROM grid g LEFT JOIN daily d
                 ON d.user_id = g.user_id AND d.day = g.day)
    SELECT user_id, CAST(day AS DATE) AS day, ROUND(value, 6) AS value, observed
    FROM filled
    """,
    "time-series resample + gap fill (the hypertable/timescale pattern): "
    "newest observation per (user, day), a per-user day grid from "
    "sequence(), missing days forward-filled with last(ignore nulls) — "
    "the dense daily panel a feature store materializes from sparse "
    "events",
)
def q_events_gapfill(spark, sf_dir):
    """One shuffle on user_id serves the daily rollup, the span
    aggregate, the grid join and the fill window (same key, Spark
    reuses the exchange); sequence() explodes the grid executor-side so
    the dense panel never crosses the driver. At 100 TB the events scan
    is time-partition-pruned and each user's panel stays one task."""
    from pyspark.sql import Window as W

    # ONE hash exchange on user_id per lineage serves every downstream
    # stage: the (user_id, day) window, the span aggregate and the fill
    # window all require clustering that hash(user_id) already satisfies
    # (partition keys ⊆ clustering keys), so EnsureRequirements inserts
    # no further shuffles (was 3 exchanges when each stage shuffled for
    # itself). `daily` feeds the join twice, so its subtree runs once
    # per reference — at 100 TB persist() it; the join side then SMJs
    # co-partitioned instead of the small-scale broadcast AQE picks here.
    ev = t(spark, sf_dir, "events").repartition("user_id")
    daily = (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            "value", "ts", "event_id",
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "day").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    filled = grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.last("value", ignorenulls=True)
        .over(W.partitionBy("user_id").orderBy("day"))
        .alias("value"),
        F.col("value").isNotNull().alias("observed"),
    )
    return filled.select(
        "user_id",
        F.col("day").cast("date").alias("day"),
        F.round("value", 6).alias("value"),
        "observed",
    )
