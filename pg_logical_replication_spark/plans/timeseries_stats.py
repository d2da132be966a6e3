"""Time-series statistics + pipeline extras (round-2, late batch).

Operators a monitoring / feature-engineering consumer runs on the
materialized event stream: exponential smoothing, autocorrelation,
robust (MAD) outlier detection — plus two training-data ops (fixed-
stride document chunking, market-basket association rules).

Cross-engine determinism notes (the whole point of each design):

* **EWMA** uses a dyadic decay ``alpha = 1/2`` truncated at depth 15,
  so every weight ``2^-k`` is exact in binary *and* in
  ``DECIMAL(16,15)`` — both engines accumulate the identical decimal
  numerator/denominator and only the final division happens in double
  (deterministic for identical operands).
* **autocorrelation** is computed from integer moment sums (exact in
  int64); the closing formula is a handful of IEEE double ops on
  identical inputs.
* **MAD** works on integer counts: medians of integers are at worst
  ``x.5`` (dyadic-exact), deviations at worst ``x.5``, the second
  median at worst ``x.25`` — all exactly representable, so the outlier
  inequality can never straddle a rounding difference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_logical_replication_spark.plans.registry import register, t


@register(
    "q_events_ewma",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    pairs AS (
      SELECT a.day,
             CAST(POWER(0.5, date_diff('day', b.day, a.day)) AS DECIMAL(16,15))
               AS w,
             b.x
      FROM daily a JOIN daily b
        ON b.day <= a.day AND date_diff('day', b.day, a.day) <= 15)
    SELECT day,
           COUNT(*) AS n_terms,
           CAST(CAST(SUM(x * w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS DOUBLE)
             AS ewma
    FROM pairs GROUP BY day ORDER BY day
    """,
    "exponentially weighted moving average of daily event value "
    "(alpha=1/2, depth 15): dyadic weights make the smoothing exactly "
    "replayable in decimal on any engine",
)
def q_events_ewma(spark, sf_dir):
    """EWMA as a bounded range self-join over the *daily aggregate* —
    the expensive part (the raw scan) reduces first, then the join
    touches only ~365×16 rows/year regardless of raw volume. At 100 TB
    the daily rollup is partial-aggregated map-side and the self-join
    input is kilobytes; no window state, no recursion. Weights
    ``2^-k`` are exact in DECIMAL(16,15), so both engines accumulate
    identical numerators and the one double division at the end is
    deterministic."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("x")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    diff = F.datediff(F.col("a.day"), F.col("b.day"))
    pairs = a.join(
        b, (F.col("b.day") <= F.col("a.day")) & (diff <= 15)
    ).select(
        F.col("a.day").alias("day"),
        F.pow(F.lit(0.5), diff).cast("decimal(16,15)").alias("w"),
        F.col("b.x").alias("x"),
    )
    return (
        pairs.groupBy("day")
        .agg(
            F.count("*").alias("n_terms"),
            (
                F.sum(F.col("x") * F.col("w")).cast("double")
                / F.sum("w").cast("double")
            ).alias("ewma"),
        )
        .orderBy("day")
    )


@register(
    "q_events_autocorr",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    lagged AS (
      SELECT a.event_type, a.n AS x, b.n AS y
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type
       AND date_diff('day', b.day, a.day) = 7),
    mom AS (
      SELECT event_type, COUNT(*) AS k,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy
      FROM lagged GROUP BY event_type)
    SELECT event_type, k,
           CAST(k*sxy - sx*sy AS DOUBLE)
             / (SQRT(CAST(k*sxx - sx*sx AS DOUBLE))
                * SQRT(CAST(k*syy - sy*sy AS DOUBLE))) AS autocorr_7d
    FROM mom WHERE k*sxx - sx*sx > 0 AND k*syy - sy*sy > 0
    ORDER BY event_type
    """,
    "lag-7 autocorrelation of daily event counts per type: weekly "
    "seasonality detection from exact integer moment sums",
)
def q_events_autocorr(spark, sf_dir):
    """Pearson r between the daily-count series and its 7-day lag,
    computed from five integer moment sums (exact in int64 at any
    scale that fits a day in a count) and closed in double — no
    streaming variance, no order dependence. One shuffle for the daily
    rollup; the lag join and moments run on the tiny reduction."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count("*").alias("n"))
    a = daily.alias("a")
    b = daily.alias("b")
    lagged = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.datediff(F.col("a.day"), F.col("b.day")) == 7),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("x"),
        F.col("b.n").alias("y"),
    )
    mom = lagged.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        mom.filter((vx > 0) & (vy > 0))
        .select(
            "event_type",
            "k",
            (
                cov.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
            ).alias("autocorr_7d"),
        )
        .orderBy("event_type")
    )


@register(
    "q_events_mad_outliers",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    med AS (SELECT event_type, MEDIAN(n) AS med FROM daily GROUP BY 1),
    dev AS (
      SELECT d.event_type, d.day, d.n, m.med, ABS(d.n - m.med) AS ad
      FROM daily d JOIN med m ON m.event_type = d.event_type),
    mad AS (SELECT event_type, MEDIAN(ad) AS mad FROM dev GROUP BY 1)
    SELECT d.event_type, d.day, d.n, d.med, m.mad
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    WHERE ABS(d.n - d.med) > 3 * m.mad AND m.mad > 0
    ORDER BY d.event_type, d.day
    """,
    "robust anomaly detection: daily event counts more than 3 MADs "
    "from their type's median (median absolute deviation — outlier-"
    "proof, unlike z-scores)",
)
def q_events_mad_outliers(spark, sf_dir):
    """MAD on integer counts is dyadic-exact end-to-end (medians are
    at worst .5, second-level medians at worst .25), so the 3-MAD
    threshold compares identical doubles on both engines. Exact
    medians cost one sort of the *daily* series per type — tiny after
    the first reduction; at 100 TB swap F.percentile for
    approx_percentile and keep the same frame."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count("*").alias("n"))
    med = daily.groupBy("event_type").agg(
        F.percentile("n", F.lit(0.5)).alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            (F.abs(F.col("n") - F.col("med")) > 3 * F.col("mad"))
            & (F.col("mad") > 0)
        )
        .select("event_type", "day", "n", "med", "mad")
        .orderBy("event_type", "day")
    )


@register(
    "q_doc_chunks",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents),
    grid AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0,
               CASE WHEN n <= 32 THEN 0
                    ELSE CAST(CEIL((n - 32) / 16.0) AS INT) END)) AS chunk_idx
      FROM tok)
    SELECT doc_id, chunk_idx,
           len(list_slice(toks, chunk_idx*16 + 1,
                          LEAST(chunk_idx*16 + 32, n))) AS chunk_len,
           md5(array_to_string(
               list_slice(toks, chunk_idx*16 + 1,
                          LEAST(chunk_idx*16 + 32, n)), ' ')) AS chunk_md5
    FROM grid ORDER BY doc_id, chunk_idx
    """,
    "fixed-window document chunking (32 tokens, stride 16): the "
    "context-window prep op between cleaning and packing; chunk "
    "digests are hash-checked so the split boundaries are pinned "
    "exactly",
)
def q_doc_chunks(spark, sf_dir):
    """Chunking is a pure narrow map: split → sequence(0, n_chunks-1)
    → posexplode → slice, all JVM built-ins, no shuffle at all (the
    final orderBy is presentation only). Rows out ≈ tokens/stride;
    at 100 TB this runs at scan speed and pairs with
    operators/packing.py downstream."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    )
    n_last = F.when(F.col("n") <= 32, F.lit(0)).otherwise(
        F.ceil((F.col("n") - 32) / 16.0).cast("int")
    )
    grid = toks.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), n_last)).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("toks"),
        F.col("chunk_idx") * 16 + 1,
        F.least(F.col("chunk_idx") * 16 + F.lit(32), F.col("n"))
        - F.col("chunk_idx") * 16,
    )
    return grid.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "q_market_basket",
    """
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    tot AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM ob),
    brand_n AS (SELECT brand, COUNT(*) AS n FROM ob GROUP BY brand),
    pair_n AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_pair
      FROM ob a JOIN ob b ON b.okey = a.okey AND a.brand < b.brand
      GROUP BY 1, 2)
    SELECT p.brand_a, p.brand_b, p.n_pair,
           CAST(p.n_pair AS DOUBLE) / CAST(na.n AS DOUBLE) AS confidence,
           CAST(p.n_pair AS DOUBLE) * CAST(t.n_orders AS DOUBLE)
             / (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)) AS lift
    FROM pair_n p
    JOIN brand_n na ON na.brand = p.brand_a
    JOIN brand_n nb ON nb.brand = p.brand_b
    CROSS JOIN tot t
    WHERE p.n_pair >= 20
    ORDER BY lift DESC, p.brand_a, p.brand_b LIMIT 15
    """,
    "market-basket association rules over order contents: "
    "support / confidence / lift for brand co-occurrence, top-15 by "
    "lift — the classic co-purchase analysis from exact counts",
)
def q_market_basket(spark, sf_dir):
    """The pair blow-up is bounded by (brands-per-order choose 2) —
    tiny per order — and the heavy input reduces to DISTINCT
    (order, brand) first, so the self-join is over the reduction and
    co-partitioned on okey (one exchange serves both sides). All
    ratios close from exact int64 counts in double. Part is
    broadcast into the lineitem scan."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        # repartition FIRST: hash(okey) satisfies the (okey, brand)
        # distinct's clustering requirement (partition keys ⊆ group
        # keys), so one exchange serves the distinct, the pair
        # self-join and the total-orders count
        .repartition("okey")
        .distinct()
        .persist()
    )
    tot = ob.select(F.count_distinct("okey").alias("n_orders"))
    brand_n = ob.groupBy("brand").agg(F.count("*").alias("n"))
    a = ob.alias("a")
    b = ob.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("b.okey") == F.col("a.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 20)
    )
    na = brand_n.alias("na")
    nb = brand_n.alias("nb")
    return (
        pair_n.join(F.broadcast(na), F.col("na.brand") == F.col("brand_a"))
        .join(F.broadcast(nb), F.col("nb.brand") == F.col("brand_b"))
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_pair",
            (F.col("n_pair").cast("double") / F.col("na.n").cast("double")).alias(
                "confidence"
            ),
            (
                F.col("n_pair").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("na.n").cast("double") * F.col("nb.n").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(15)
    )


@register(
    "q_dq_constraints",
    """
    SELECT 'orders_pk_unique' AS check_name,
           (SELECT COUNT(*) FROM orders) AS n_checked,
           (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM
             (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
              HAVING COUNT(*) > 1)) AS n_violations
    UNION ALL
    SELECT 'lineitem_fk_orders',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'customer_fk_nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
             (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'lineitem_ship_after_order',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l JOIN orders o
              ON o.o_orderkey = l.l_orderkey
            WHERE l.l_shipdate < o.o_orderdate)
    UNION ALL
    SELECT 'orders_totalprice_positive',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'lineitem_qty_in_range',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_quantity < 1 OR l_quantity > 50)
    UNION ALL
    SELECT 'events_ts_not_null',
           (SELECT COUNT(*) FROM events),
           (SELECT COUNT(*) FROM events WHERE ts IS NULL)
    ORDER BY check_name
    """,
    "data-quality assertion suite (dbt-test family): PK uniqueness, "
    "FK orphans, ordering/range/nullability invariants — one summary "
    "row per check with checked/violation counts",
)
def q_dq_constraints(spark, sf_dir):
    """The post-materialization audit a CDC replica runs continuously
    (pairs with operators/verify.py's checksum diff: that detects
    divergence, this classifies it). Fully LAZY: every check is one
    one-row aggregate (count + conditional sum, or a left join folded
    into the same aggregate), unioned — nothing executes until the
    caller acts on the returned plan, and the dimension FK join
    broadcasts; fact-fact checks let AQE pick the strategy. Counts are exact
    integers, so the gate is trivially cross-engine."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    ev = t(spark, sf_dir, "events")

    def summary(name, df, viol):
        """One-row (name, n_checked, n_violations) aggregate."""
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            F.coalesce(F.sum(F.when(viol, 1).otherwise(0)), F.lit(0)).alias(
                "n_violations"
            ),
        )

    # PK uniqueness: groups with n>1 contribute n-1 violations; the
    # grouped aggregate also recovers the checked-row total as sum(n)
    pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .agg(
            F.lit("orders_pk_unique").alias("check_name"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_checked"),
            F.coalesce(
                F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)),
                F.lit(0),
            ).alias("n_violations"),
        )
    )
    checks = [
        pk,
        summary(
            "lineitem_fk_orders",
            li.join(
                # no broadcast hint: orders is a fact table — let AQE
                # pick (broadcast here at test sizes, SMJ at 100 TB)
                orders.select("o_orderkey").distinct(),
                li["l_orderkey"] == F.col("o_orderkey"),
                "left",
            ),
            F.col("o_orderkey").isNull(),
        ),
        summary(
            "customer_fk_nation",
            cust.join(
                F.broadcast(nat.select("n_nationkey").distinct()),
                cust["c_nationkey"] == F.col("n_nationkey"),
                "left",
            ),
            F.col("n_nationkey").isNull(),
        ),
        summary(
            "lineitem_ship_after_order",
            li.join(
                orders.select("o_orderkey", "o_orderdate"),
                li["l_orderkey"] == F.col("o_orderkey"),
                "left",
            ),
            F.col("l_shipdate") < F.col("o_orderdate"),
        ),
        summary(
            "orders_totalprice_positive", orders, F.col("o_totalprice") <= 0
        ),
        summary(
            "lineitem_qty_in_range",
            li,
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        summary("events_ts_not_null", ev, F.col("ts").isNull()),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out.orderBy("check_name")


@register(
    "q_events_attribution",
    """
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             LAST_VALUE(CASE WHEN event_type IN ('click','view')
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type,
             LAST_VALUE(CASE WHEN event_type IN ('click','view')
                             THEN ts END IGNORE NULLS)
               OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    purch AS (
      SELECT user_id,
             CASE WHEN touch_ts IS NOT NULL
                   AND ts - touch_ts <= INTERVAL 30 MINUTE
                  THEN touch_type ELSE 'none' END AS attributed_to
      FROM seq WHERE event_type = 'purchase')
    SELECT attributed_to, COUNT(*) AS n_purchases,
           COUNT(DISTINCT user_id) AS n_users
    FROM purch GROUP BY attributed_to ORDER BY attributed_to
    """,
    "last-touch marketing attribution: each purchase credits the most "
    "recent click/view by the same user within 30 minutes ('none' when "
    "cold) — the event-stream join-to-self pattern via IGNORE NULLS "
    "window, no self-join",
)
def q_events_attribution(spark, sf_dir):
    """Attribution as a running last(ignore nulls) over the per-user
    ordered stream — O(1) state per row, one shuffle on user_id, versus
    the naive as-of self-join. The three LAST_VALUE columns share one
    window frame so they resolve from the same sort. The 1-PRECEDING
    upper bound keeps a purchase from attributing to itself if types
    ever overlap. At 100 TB: time-partition the scan, and the window
    stays within (user, day) task locality."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    purch = seq.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.when(
            F.col("touch_ts").isNotNull()
            & (
                F.col("ts").cast("long") - F.col("touch_ts").cast("long")
                <= 30 * 60
            ),
            F.col("touch_type"),
        )
        .otherwise(F.lit("none"))
        .alias("attributed_to"),
    )
    return (
        purch.groupBy("attributed_to")
        .agg(
            F.count("*").alias("n_purchases"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("attributed_to")
    )


@register(
    "q_text_search_rank",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    hit AS (
      SELECT t.doc_id, CAST(SUM(t.tf * (n.n // d.df)) AS BIGINT) AS score,
             COUNT(*) AS n_terms_hit
      FROM tf t JOIN df d ON d.w = t.w CROSS JOIN n
      WHERE t.w IN ('spark', 'merge', 'window')
      GROUP BY t.doc_id)
    SELECT doc_id, score, n_terms_hit
    FROM hit ORDER BY score DESC, doc_id LIMIT 10
    """,
    "keyword search ranking: tf × floor-idf scoring (integer "
    "arithmetic — the cross-engine-exact surrogate for tf-idf) over "
    "an inverted index, top-10 docs for a 3-term query",
)
def q_text_search_rank(spark, sf_dir):
    """The inverted-index probe: the term filter prunes postings
    BEFORE the per-doc reduce, so work is O(postings of query terms),
    not O(corpus) — at 100 TB the postings table is bucketed by term
    and the query touches 3 buckets. Integer floor-idf (N div df)
    keeps every score exact, dodging cross-engine log() ulps."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    n_docs = tf.select(F.count_distinct("doc_id").alias("n"))
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    hit = (
        tf.filter(F.col("w").isin("spark", "merge", "window"))
        .join(F.broadcast(df), "w")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf") * F.expr("n div df")
            ).alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    return hit.orderBy(F.col("score").desc(), "doc_id").limit(10)


@register(
    "q_text_cosine_pairs",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    kept AS (
      SELECT t.doc_id, t.w, t.tf * (n.n // d.df) AS wt
      FROM tf t JOIN df d ON d.w = t.w CROSS JOIN n
      WHERE d.df * 4 <= n.n),
    norm AS (SELECT doc_id, SUM(wt * wt) AS nrm FROM kept GROUP BY doc_id),
    dot AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.wt * b.wt) AS dp
      FROM kept a JOIN kept b ON b.w = a.w AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d.doc_a, d.doc_b,
           ROUND(CAST(d.dp AS DOUBLE)
                 / (SQRT(CAST(na.nrm AS DOUBLE))
                    * SQRT(CAST(nb.nrm AS DOUBLE))), 9) AS cosine
    FROM dot d
    JOIN norm na ON na.doc_id = d.doc_a
    JOIN norm nb ON nb.doc_id = d.doc_b
    ORDER BY CAST(d.dp AS DOUBLE)
             / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE)))
             DESC, d.doc_a, d.doc_b
    LIMIT 20
    """,
    "sparse tf-idf cosine similarity join through the inverted index: "
    "rare-term postings only (df ≤ N/4 — the prefix-filter bound), "
    "integer floor-idf weights so dots and norms are exact, top-20 "
    "pairs",
)
def q_text_cosine_pairs(spark, sf_dir):
    """The weighted cousin of the MinHash Jaccard join: candidate
    pairs come only from SHARED RARE tokens (df ≤ N/4), which is what
    bounds the quadratic blow-up — frequent terms never generate
    pairs, exactly the prefix-filtering idea from set-similarity-join
    literature. Dots and norms are integer sums (floor-idf weights),
    so both engines rank identically; one shuffle on token for the
    pair join, one on the pair for the reduce."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    n_docs = tf.select(F.count_distinct("doc_id").alias("n"))
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    kept = (
        tf.join(F.broadcast(df), "w")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * 4 <= F.col("n"))
        .select(
            "doc_id",
            "w",
            (F.col("tf") * F.expr("n div df")).alias("wt"),
        )
        .persist()
    )
    norm = kept.groupBy("doc_id").agg(F.sum(F.col("wt") * F.col("wt")).alias("nrm"))
    a, b = kept.alias("a"), kept.alias("b")
    dot = (
        a.join(
            b,
            (F.col("b.w") == F.col("a.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.wt") * F.col("b.wt")).alias("dp"))
    )
    na, nb = norm.alias("na"), norm.alias("nb")
    cos = (
        F.col("dp").cast("double")
        / (
            F.sqrt(F.col("na.nrm").cast("double"))
            * F.sqrt(F.col("nb.nrm").cast("double"))
        )
    )
    return (
        dot.join(F.broadcast(na), F.col("na.doc_id") == F.col("doc_a"))
        .join(F.broadcast(nb), F.col("nb.doc_id") == F.col("doc_b"))
        .orderBy(cos.desc(), "doc_a", "doc_b")
        .select("doc_a", "doc_b", F.round(cos, 9).alias("cosine"))
        .limit(20)
    )


@register(
    "q_text_bpe_merge",
    """
    WITH words AS (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w),
    pairs AS (
      SELECT substr(w, i, 1) AS left_sym, substr(w, i + 1, 1) AS right_sym,
             freq
      FROM words CROSS JOIN
           unnest(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2)
    SELECT left_sym, right_sym,
           CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY 1, 2
    ORDER BY n_occurrences DESC, left_sym, right_sym LIMIT 10
    """,
    "BPE training step 1: the adjacent-symbol pair statistics that "
    "pick the first merge — counted over the deduplicated word table "
    "(frequency-weighted), top-10 candidate merges",
)
def q_text_bpe_merge(spark, sf_dir):
    """The heart of BPE/WordPiece training: pair counts over the WORD
    table, not the corpus — dedup to (word, freq) first, so the
    pair-explode touches |vocab| rows however big the corpus is (this
    is how every real tokenizer trainer scales). Iterating merges =
    re-running this reduce over the re-segmented vocab, same shape
    every round. All integer counts."""
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), "
                "i -> struct(substring(w, i, 1) AS l, "
                "substring(w, i + 1, 1) AS r))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("freq").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "left_sym", "right_sym")
        .limit(10)
    )


@register(
    "q_orders_seasonality",
    """
    WITH monthly AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
             EXTRACT(MONTH FROM o_orderdate) AS mo,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
               AS DECIMAL(38,6)) AS rev
      FROM orders GROUP BY 1, 2),
    by_month AS (
      SELECT mo, COUNT(*) AS n_months,
             CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS avg_rev
      FROM monthly GROUP BY mo),
    overall AS (
      SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS mean_rev FROM monthly)
    SELECT CAST(b.mo AS BIGINT) AS month, b.n_months,
           ROUND(b.avg_rev, 6) AS avg_rev,
           ROUND(b.avg_rev / o.mean_rev, 9) AS seasonal_idx
    FROM by_month b CROSS JOIN overall o ORDER BY b.mo
    """,
    "seasonal decomposition of order revenue: month-of-year averages "
    "vs the overall monthly mean (seasonal index > 1 = peak month) — "
    "the classical-decomposition seasonality profile from stable "
    "decimal sums",
)
def q_orders_seasonality(spark, sf_dir):
    """Two cheap reductions: raw scan → (year, month) sums (map-side
    partial agg, shuffle O(months)), then month-of-year profile and
    the global mean off the same tiny intermediate — reuse, not
    re-scan. The index division happens on identical doubles. At
    100 TB the orders scan is the only heavy stage and prunes to the
    date + price columns."""
    orders = t(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .alias("rev")
        )
        .persist()
    )
    by_month = monthly.groupBy("mo").agg(
        F.count("*").alias("n_months"),
        (F.sum("rev").cast("double") / F.count("*")).alias("avg_rev"),
    )
    overall = monthly.agg(
        (F.sum("rev").cast("double") / F.count("*")).alias("mean_rev")
    )
    return (
        by_month.crossJoin(F.broadcast(overall))
        .select(
            F.col("mo").cast("bigint").alias("month"),
            "n_months",
            F.round("avg_rev", 6).alias("avg_rev"),
            F.round(F.col("avg_rev") / F.col("mean_rev"), 9).alias(
                "seasonal_idx"
            ),
        )
        .orderBy("month")
    )


@register(
    "q_chunk_dedup",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents),
    grid AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0,
               CASE WHEN n <= 32 THEN 0
                    ELSE CAST(CEIL((n - 32) / 16.0) AS INT) END)) AS chunk_idx
      FROM tok),
    chunks AS (
      SELECT doc_id,
             md5(array_to_string(
                 list_slice(toks, chunk_idx*16 + 1,
                            LEAST(chunk_idx*16 + 32, n)), ' ')) AS chunk_md5
      FROM grid)
    SELECT chunk_md5,
           COUNT(*) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM chunks
    GROUP BY chunk_md5
    HAVING COUNT(*) > 1
    ORDER BY n_occurrences DESC, chunk_md5
    LIMIT 25
    """,
    "cross-document chunk dedup: which 32-token windows repeat across "
    "the corpus (boilerplate passages) — sub-document granularity the "
    "whole-doc dedup family misses; top-25 repeated chunks by count",
)
def q_chunk_dedup(spark, sf_dir):
    """Chunk-level dedup = the chunking narrow map + a groupBy on the
    32-byte chunk digest: the shuffle carries digests + doc ids, never
    token text — the exact_dedup scale shape applied below document
    granularity. At 100 TB this is how repeated boilerplate passages
    (licenses, navbars, disclaimers) are found without any pairwise
    work."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    )
    n_last = F.when(F.col("n") <= 32, F.lit(0)).otherwise(
        F.ceil((F.col("n") - 32) / 16.0).cast("int")
    )
    grid = toks.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), n_last)).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("toks"),
        F.col("chunk_idx") * 16 + 1,
        F.least(F.col("chunk_idx") * 16 + F.lit(32), F.col("n"))
        - F.col("chunk_idx") * 16,
    )
    return (
        grid.select(
            "doc_id", F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5")
        )
        .groupBy("chunk_md5")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.col("n_occurrences").desc(), "chunk_md5")
        .limit(25)
    )


@register(
    "q_events_cusum",
    """
    WITH RECURSIVE daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    base AS (
      SELECT day, c,
             ROW_NUMBER() OVER (ORDER BY day) AS idx,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(c) OVER () AS BIGINT) AS total
      FROM daily),
    cs AS (
      SELECT idx, day, c, n, total,
             GREATEST(CAST(0 AS BIGINT),
                      n * c - total - total // 10) AS s
      FROM base WHERE idx = 1
      UNION ALL
      SELECT b.idx, b.day, b.c, b.n, b.total,
             GREATEST(CAST(0 AS BIGINT),
                      cs.s + b.n * b.c - b.total - b.total // 10) AS s
      FROM cs JOIN base b ON b.idx = cs.idx + 1)
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(MAX(total) AS BIGINT) AS total_events,
           CAST(MAX(s) AS BIGINT) AS max_cusum_scaled,
           CAST(SUM(CASE WHEN s >= 2 * total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarm_days,
           MIN(CASE WHEN s >= 2 * total THEN day END) AS first_alarm_day
    FROM cs
    """,
    "CUSUM change-point detection (Page 1954 — the classic sequential "
    "drift alarm) on daily event counts, in EXACT scaled integers: "
    "S_i = max(0, S_(i-1) + n*c_i - total - total/10) (slack k = "
    "mean/10, threshold h = 2*mean, both scaled by n so everything "
    "stays int64) — the raw scan reduces to one daily rollup, the "
    "sequential fold runs over the tiny day array",
)
def q_events_cusum(spark, sf_dir):
    """Spark side folds the ordered daily array with F.aggregate (the
    recurrence has a max() so it is not a prefix sum; the fold input is
    the DAY-level aggregate, bounded by the date range, never raw
    rows); the oracle replays it as a recursive CTE."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    one = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "c"))).alias("arr"),
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("total"),
    )
    folded = one.select(
        "n",
        "total",
        F.expr(
            """
            aggregate(
              arr,
              named_struct('s', 0L, 'mx', 0L, 'alarms', 0L,
                           'first_day', CAST(NULL AS DATE)),
              (acc, x) -> named_struct(
                's', greatest(0L, acc.s + n * x.c - total - total DIV 10),
                'mx', greatest(acc.mx,
                       greatest(0L, acc.s + n * x.c - total
                                - total DIV 10)),
                'alarms', acc.alarms + (CASE WHEN
                       greatest(0L, acc.s + n * x.c - total
                                - total DIV 10) >= 2 * total
                       THEN 1L ELSE 0L END),
                'first_day', CASE WHEN acc.first_day IS NULL AND
                       greatest(0L, acc.s + n * x.c - total
                                - total DIV 10) >= 2 * total
                       THEN x.day ELSE acc.first_day END))
            """
        ).alias("f"),
    )
    return folded.select(
        F.col("n").alias("n_days"),
        F.col("total").alias("total_events"),
        F.col("f.mx").alias("max_cusum_scaled"),
        F.col("f.alarms").alias("n_alarm_days"),
        F.col("f.first_day").alias("first_alarm_day"),
    )
