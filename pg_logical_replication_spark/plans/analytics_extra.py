"""Round-2 analytics additions: recursive hierarchy closure, ordered
string aggregation, distribution windows, event-transition matrices,
deterministic hash sampling, fixed-grid histograms, and the raw
COPY-stream wire demux as an oracle-gated query.

Each query keeps the cross-engine determinism rules of
``plans/registry``: stable decimal sums, explicit tie-breaks, fixed
bucket grids, and md5 (identical in Spark and DuckDB) wherever a hash
feeds a predicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_logical_replication_spark.plans.registry import register, ssum, t


@register(
    "q_recursive_hierarchy",
    """
    WITH RECURSIVE up(part, anc, price) AS (
      SELECT p_partkey, p_partkey // 10, p_retailprice
      FROM part WHERE p_partkey >= 10
      UNION ALL
      SELECT part, anc // 10, price FROM up WHERE anc >= 10
    )
    SELECT anc,
           COUNT(*) AS n_desc,
           CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS subtree_value
    FROM up WHERE anc BETWEEN 10 AND 99
    GROUP BY anc ORDER BY anc
    """,
    "recursive CTE transitive closure: synthetic part hierarchy "
    "(parent = key div 10), per-ancestor subtree rollup — the BOM / "
    "org-chart pattern (Spark 4 WITH RECURSIVE, SPARK-24497)",
)
def q_recursive_hierarchy(spark, sf_dir):
    """Spark 4's recursive CTE executes as an iterative union of
    DataFrame steps driven by the engine — each iteration is a narrow
    map over the frontier (no shuffle until the final rollup), and the
    depth is log10(maxkey) ≈ 6-7 even at 100 TB part counts, so the
    iteration count is scale-stable. The closure itself never leaves
    the JVM."""
    t(spark, sf_dir, "part").createOrReplaceTempView("_rh_part")
    return spark.sql(
        """
        WITH RECURSIVE up(part, anc, price) AS (
          SELECT p_partkey, p_partkey div 10, p_retailprice
          FROM _rh_part WHERE p_partkey >= 10
          UNION ALL
          SELECT part, anc div 10, price FROM up WHERE anc >= 10
        )
        SELECT anc,
               COUNT(*) AS n_desc,
               CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE)
                 AS subtree_value
        FROM up WHERE anc BETWEEN 10 AND 99
        GROUP BY anc ORDER BY anc
        """
    )


@register(
    "q_agg_listagg",
    """
    SELECT r.r_name,
           STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """,
    "ordered string aggregation (LISTAGG WITHIN GROUP ≙ STRING_AGG "
    "ORDER BY): the canonical denormalized-label rollup",
)
def q_agg_listagg(spark, sf_dir):
    """listagg with an explicit WITHIN GROUP order is deterministic
    across engines (unordered collect_list would not be). Scale: group
    cardinality is the region count; the agg is partial-aggregated
    map-side like any other."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    joined = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    joined.createOrReplaceTempView("_la_rn")
    return spark.sql(
        """
        SELECT r_name,
               LISTAGG(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
               COUNT(*) AS n_nations
        FROM _la_rn GROUP BY r_name ORDER BY r_name
        """
    )


@register(
    "q_window_distribution",
    """
    SELECT s_nationkey, s_suppkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST()    OVER w, 6) AS cd,
           NTILE(4) OVER w AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
    "distribution window functions: percent_rank / cume_dist / ntile "
    "per nation over supplier balances (ties broken on the unique key)",
)
def q_window_distribution(spark, sf_dir):
    """percent_rank/cume_dist are rank-arithmetic on identical sorted
    runs — cross-engine exact once ties are keyed away. One shuffle on
    s_nationkey serves all three windows (same spec)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return t(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q_events_markov",
    """
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY n DESC, prev_type, next_type
    LIMIT 20
    """,
    "event-transition (Markov bigram) matrix: per-user lag window → "
    "global transition counts, top 20 — the user-journey fan-out query",
)
def q_events_markov(spark, sf_dir):
    """One shuffle on user_id for the lag window; the transition agg is
    partial map-side into at most |types|² cells, so the final exchange
    carries a few dozen rows regardless of input size."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "prev_type", "next_type")
        .limit(20)
    )


@register(
    "q_corpus_hash_sample",
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) AS chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
    GROUP BY lang ORDER BY lang
    """,
    "deterministic ~5% corpus sample via md5(doc_id) prefix — the "
    "reproducible-split primitive (train/val carving, A/B subsets) "
    "that survives reshuffling and re-ingestion",
)
def q_corpus_hash_sample(spark, sf_dir):
    """md5 is bit-identical across engines (unlike xxhash64/hash whose
    seeds differ), so the sampled set is THE SAME set everywhere — the
    property that makes hash-sampling the right split primitive at
    100 TB (no materialized membership table, no shuffle; the predicate
    evaluates in the scan)."""
    d = t(spark, sf_dir, "documents")
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "0d"
    return (
        d.filter(keep)
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), ssum("n_chars").alias("chars"))
        .orderBy("lang")
    )


@register(
    "q_corpus_priority_sample",
    """
    WITH pri AS (
      SELECT doc_id, lang, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
               * 1000000 // n_chars AS priority
      FROM documents WHERE n_chars > 0),
    top AS (SELECT * FROM pri ORDER BY priority, doc_id LIMIT 60)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM top GROUP BY lang ORDER BY lang
    """,
    "weighted sampling WITHOUT replacement via priority sampling "
    "(Duffield-Lund-Thorup): priority = u/w with u a deterministic "
    "md5-derived uniform, keep the k smallest — longer docs "
    "proportionally likelier, the reproducible WEIGHTED twin of "
    "q_corpus_hash_sample's uniform split; integer-scaled priorities "
    "so both engines rank bit-identically",
)
def q_corpus_priority_sample(spark, sf_dir):
    """Priority sampling composes the md5 trick (cross-engine identical
    u) with integer arithmetic (u32 * 1e6 DIV w < 2^52 — no float in
    the ranking, so engines can never disagree at a tie). Scale: the
    priority is a scan-side expression and the k-smallest is a
    TakeOrdered reduction — no shuffle of the corpus, exactly like the
    uniform hash sample; this is the primitive under weighted corpus
    carving (sample tokens ∝ length, quality-weighted eval slices)."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    top = (
        d.select(
            "doc_id", "lang", "n_chars", (u * 1000000).alias("_scaled")
        )
        .withColumn("priority", F.expr("_scaled div n_chars"))
        .orderBy("priority", "doc_id")
        .limit(60)
    )
    return (
        top.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .orderBy("lang")
    )


@register(
    "q_events_histogram",
    """
    SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM events WHERE value IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
    "fixed-grid histogram of event values (floor-bucketing — portable "
    "width_bucket): the profiling/quantization sweep",
)
def q_events_histogram(spark, sf_dir):
    """Fixed bucket edges (value div 50) rather than data-dependent
    quantiles: the bucket id is a pure narrow map, the agg is partial
    map-side, and two engines can never disagree about edges. At scale
    this is the single-pass profile pass run before choosing
    quantization grids."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        ev.groupBy(
            F.floor(F.col("value") / F.lit(50.0)).cast("long").alias("bucket")
        )
        .agg(F.count("*").alias("n"), ssum("value").alias("total"))
        .orderBy("bucket")
    )


@register(
    "q_cdc_udtf_explode",
    """
    SELECT CASE WHEN event_type = 'signup' THEN 'insert'
                WHEN event_type = 'error' THEN 'delete'
                ELSE 'update' END AS op,
           COUNT(*) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid
    FROM events GROUP BY 1 ORDER BY 1
    """,
    "Python UDTF surface (§2.2), oracle-gated: events encoded as "
    "wal2json lines JVM-side (to_json), exploded one-changeset→many-"
    "rows through the LATERAL table function, aggregates replayed from "
    "the source rows",
)
def q_cdc_udtf_explode(spark, sf_dir):
    """Encode is pure Catalyst (to_json over structs — no Python);
    only the UDTF explode crosses into the Python worker, per
    partition. The production path stays declarative (posexplode in
    sources/wal2json.py); this pins the imperative template's
    correctness end-to-end."""
    from pg_logical_replication_spark.sources.udtf_explode import (
        register_wal2json_explode,
    )

    register_wal2json_explode(spark)
    ev = t(spark, sf_dir, "events")
    kind = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
    )
    line = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    kind.alias("kind"),
                    F.lit("public").alias("schema"),
                    F.lit("events").alias("table"),
                    F.array(F.lit("user_id"), F.lit("etype")).alias(
                        "columnnames"
                    ),
                    F.array(
                        F.col("user_id").cast("string"), F.col("event_type")
                    ).alias("columnvalues"),
                )
            ).alias("change")
        )
    )
    ev.select(line.alias("value")).createOrReplaceTempView("_udtf_raw")
    exploded = spark.sql(
        "SELECT f.* FROM _udtf_raw, LATERAL wal2json_explode(value) f"
    )
    return (
        exploded.groupBy("op")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("after").getItem("user_id").cast("bigint")).alias(
                "sum_uid"
            ),
        )
        .orderBy("op")
    )


@register(
    "q_udaf_weighted_median",
    """
    WITH w AS (
      SELECT event_type, value, user_id % 5 + 1 AS wt FROM events),
    ranked AS (
      SELECT event_type, value, wt,
             SUM(wt) OVER (PARTITION BY event_type
                           ORDER BY value, wt
                           ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(wt) OVER (PARTITION BY event_type) AS total
      FROM w)
    SELECT event_type,
           ROUND(MIN(value), 6) AS weighted_median,
           CAST(MIN(total) AS BIGINT) AS total_weight
    FROM ranked WHERE cum * 2 >= total
    GROUP BY event_type ORDER BY event_type
    """,
    "Arrow-batched grouped-agg pandas UDAF (the §2.2 UDAF surface): "
    "lower weighted median per event type, oracle-replayed with a "
    "cumulative-weight window — UDAF result ≡ pure-SQL result",
)
def q_udaf_weighted_median(spark, sf_dir):
    """The UDF path done right: a GROUPED_AGG pandas_udf receives each
    group as Arrow-backed Series (one JVM→Python crossing per group,
    not per row) and returns one scalar. Weighted-lower-median is
    order-insensitive after an explicit in-group sort, so the UDAF is
    deterministic and the SQL window twin replays it exactly. Scale:
    groups hash-distribute; for heavy groups prefer the pure-window
    form (the oracle SQL IS that form) — this query exists to pin the
    UDAF surface itself."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _wmedian(value: pd.Series, wt: pd.Series) -> float:
        df = pd.DataFrame({"v": value, "w": wt}).sort_values(["v", "w"])
        cum = df["w"].cumsum()
        total = int(df["w"].sum())
        return float(df.loc[cum * 2 >= total, "v"].iloc[0])

    # the module's `from __future__ import annotations` stringifies type
    # hints; materialize them as real types so pandas_udf infers
    # GROUPED_AGG from the (Series, Series) -> float signature instead
    # of the deprecated explicit PandasUDFType
    _wmedian.__annotations__ = {"value": pd.Series, "wt": pd.Series, "return": float}
    wmedian = pandas_udf(_wmedian, "double")

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.col("user_id") % 5 + 1).alias("wt"),
    )
    # Spark disallows mixing a grouped-agg pandas UDF with built-in
    # aggregates in one agg(); the tiny per-group frames join instead
    med = ev.groupBy("event_type").agg(
        F.round(wmedian("value", "wt"), 6).alias("weighted_median")
    )
    tot = ev.groupBy("event_type").agg(
        F.sum("wt").cast("bigint").alias("total_weight")
    )
    return med.join(tot, "event_type").orderBy("event_type")


@register(
    "q_customer_rfm",
    """
    WITH base AS (
      SELECT c.c_custkey,
             MAX(o.o_orderdate) AS last_order,
             COUNT(*) AS freq,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               AS monetary
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey),
    scored AS (
      SELECT c_custkey,
             NTILE(4) OVER (ORDER BY last_order, c_custkey) AS r,
             NTILE(4) OVER (ORDER BY freq, c_custkey) AS f,
             NTILE(4) OVER (ORDER BY monetary, c_custkey) AS m,
             monetary
      FROM base)
    SELECT r, f, m, COUNT(*) AS n_customers,
           CAST(SUM(CAST(monetary AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM scored GROUP BY r, f, m ORDER BY r, f, m
    """,
    "RFM customer segmentation: recency/frequency/monetary quartiles "
    "(ntile with unique-key tie-breaks), segment sizes and revenue — "
    "the classic cohort-marketing rollup",
)
def q_customer_rfm(spark, sf_dir):
    """One shuffle on custkey builds the per-customer profile; the
    three quartile assignments are EXACT distributed ntiles
    (``operators.layout.exact_ntile``: range repartition + closed-form
    tile from global rank — VERDICT r5 #5) instead of three
    single-partition window sorts, so the plan survives a
    customer dimension that doesn't fit one task. Bit-identical to the
    oracle's NTILE (unique c_custkey tie-break). Segment rollup is a
    64-cell aggregate."""
    from pg_logical_replication_spark.operators.layout import exact_ntile

    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("freq"),
            ssum("o_totalprice").alias("monetary"),
        )
    )
    scored = exact_ntile(base, 4, ["last_order", "c_custkey"], "r")
    scored = exact_ntile(scored, 4, ["freq", "c_custkey"], "f")
    scored = exact_ntile(scored, 4, ["monetary", "c_custkey"], "m")
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count("*").alias("n_customers"),
            ssum("monetary").alias("revenue"),
        )
        .orderBy("r", "f", "m")
    )


@register(
    "q_ts_similarity_topk",
    """
    WITH grid AS (
      SELECT u.user_id, t.d
      FROM (SELECT DISTINCT user_id FROM events
            WHERE ts < TIMESTAMP '2024-01-15 00:00:00') u
      CROSS JOIN range(14) t(d)),
    daily AS (
      SELECT user_id,
             CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00',
                            date_trunc('day', ts)) AS BIGINT) AS d,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS val
      FROM events
      WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY 1, 2),
    dense AS (
      SELECT g.user_id, g.d, COALESCE(dy.val, 0.0) AS val
      FROM grid g LEFT JOIN daily dy
        ON dy.user_id = g.user_id AND dy.d = g.d),
    centered AS (
      SELECT user_id, d,
             val - CAST(SUM(CAST(val AS DECIMAL(38,6)))
                        OVER (PARTITION BY user_id) AS DOUBLE) / 14 AS v
      FROM dense),
    dist AS (
      SELECT a.user_id AS a_id, b.user_id AS b_id,
             CAST(SUM(CAST((a.v - b.v) * (a.v - b.v) AS DECIMAL(38,12)))
                  AS DOUBLE) AS d2
      FROM centered a JOIN centered b
        ON a.d = b.d AND a.user_id < b.user_id
      GROUP BY a.user_id, b.user_id)
    SELECT a_id, b_id, ROUND(d2, 6) AS dist_sq
    FROM dist ORDER BY d2, a_id, b_id LIMIT 10
    """,
    "distributed time-series similarity search (EDBT'19/EDBT'20 "
    "retrieved-paper theme): per-user 14-day activity series, "
    "mean-centered, top-10 nearest pairs by squared Euclidean distance",
)
def q_ts_similarity_topk(spark, sf_dir):
    """The series matrix builds with ONE shuffle on user_id (daily
    rollup + dense grid + centering window all cluster on it); the
    pairwise stage re-shuffles on the day index so each day's column
    joins co-partitioned, and the per-pair reduce partial-aggregates
    map-side. At real scale the quadratic pair space is what LSH/IVF
    prune (q_ann_*); this is the exact kernel those indexes re-rank
    with. Fixed 14-day grid keeps missing-day semantics (zero-fill,
    then center) engine-exact."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp")
    )
    daily = (
        ev.groupBy(
            "user_id",
            F.datediff(
                F.date_trunc("day", F.col("ts")),
                F.lit("2024-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("d"),
        )
        .agg(ssum("value").alias("val"))
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(spark.range(14).withColumnRenamed("id", "d"))
    )
    dense = grid.join(daily, ["user_id", "d"], "left").select(
        "user_id", "d", F.coalesce("val", F.lit(0.0)).alias("val")
    )
    centered = dense.select(
        "user_id",
        "d",
        (
            F.col("val")
            - F.sum(F.col("val").cast("decimal(38,6)"))
            .over(W.partitionBy("user_id"))
            .cast("double")
            / 14
        ).alias("v"),
    )
    a = centered.select(
        F.col("user_id").alias("a_id"), "d", F.col("v").alias("va")
    )
    b = centered.select(
        F.col("user_id").alias("b_id"), "d", F.col("v").alias("vb")
    )
    dist = (
        a.join(b, "d")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.sum(
                ((F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb")))
                .cast("decimal(38,12)")
            )
            .cast("double")
            .alias("d2")
        )
    )
    return (
        dist.orderBy("d2", "a_id", "b_id")
        .limit(10)
        .select("a_id", "b_id", F.round("d2", 6).alias("dist_sq"))
    )


def _kmeans_chain(iters: int = 2, k: int = 4) -> str:
    """Unrolled Lloyd iterations (shared by the k-means and D4-prune
    oracles): assignment = argmin of decimal-stabilized squared
    distances (ties on cluster id), update = decimal-stabilized
    per-dimension means. Deterministic init: cluster c starts as the
    mean of vectors with vec_id % k = c. Produces ex, c0..c{iters},
    d1..d{iters}, a1..a{iters}."""
    head = f"""
    WITH ex AS (
      SELECT vec_id, t.j,
             CAST(list_extract(embedding, t.j + 1) AS DOUBLE) AS x
      FROM embeddings CROSS JOIN range(64) t(j)),
    c0 AS (
      SELECT CAST(vec_id % {k} AS BIGINT) AS c, j,
             CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS v
      FROM ex GROUP BY 1, j)
    """
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
    d{i} AS (
      SELECT e.vec_id, c.c,
             CAST(SUM(CAST((e.x - c.v) * (e.x - c.v) AS DECIMAL(38,18)))
                  AS DOUBLE) AS dist
      FROM ex e JOIN c{i - 1} c ON c.j = e.j
      GROUP BY e.vec_id, c.c),
    a{i} AS (
      SELECT vec_id, c FROM (
        SELECT vec_id, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, c) AS rn
        FROM d{i}) WHERE rn = 1),
    c{i} AS (
      SELECT a.c, e.j,
             CAST(SUM(CAST(e.x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS v
      FROM ex e JOIN a{i} a ON a.vec_id = e.vec_id
      GROUP BY a.c, e.j)""")
    return head + "," + ",".join(steps)


def _kmeans_oracle(iters: int = 2, k: int = 4) -> str:
    return (
        _kmeans_chain(iters, k)
        + f"""
    SELECT a.c AS cluster, COUNT(DISTINCT a.vec_id) AS n,
           ROUND(CAST(SUM(CAST(c.v * c.v AS DECIMAL(38,18))) AS DOUBLE)
                 / COUNT(DISTINCT a.vec_id), 9) AS centroid_sq_norm
    FROM a{iters} a JOIN c{iters} c ON c.c = a.c
    GROUP BY a.c ORDER BY a.c
    """
    )


def _d4_oracle(iters: int = 2, k: int = 4) -> str:
    """D4-style prototype pruning on top of the Lloyd chain: final
    per-vector distance to its own centroid, per-cluster rank (rounded
    distance ASC, id tie-break), drop the closest half (the redundant
    prototypical core), keep the diverse half."""
    return (
        _kmeans_chain(iters, k)
        + f""",
    fd AS (
      SELECT e.vec_id, a.c,
             CAST(SUM(CAST((e.x - c.v) * (e.x - c.v) AS DECIMAL(38,18)))
                  AS DOUBLE) AS dist
      FROM ex e
      JOIN a{iters} a ON a.vec_id = e.vec_id
      JOIN c{iters} c ON c.c = a.c AND c.j = e.j
      GROUP BY e.vec_id, a.c),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY c
                                   ORDER BY ROUND(dist, 9), vec_id) AS rn,
             COUNT(*) OVER (PARTITION BY c) AS n_c
      FROM fd)
    SELECT c AS cluster,
           CAST(MAX(n_c) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN rn * 2 > n_c THEN 1 END) AS BIGINT)
             AS n_kept,
           CAST(MIN(CASE WHEN rn * 2 > n_c THEN vec_id END) AS BIGINT)
             AS first_kept,
           ROUND(SUM(CASE WHEN rn * 2 > n_c THEN ROUND(dist, 9) END)
                 / COUNT(CASE WHEN rn * 2 > n_c THEN 1 END), 6)
             AS mean_kept_dist
    FROM rk GROUP BY c ORDER BY c
    """
    )


def _kmeans_fit(spark, sf_dir, k: int = 4, iters: int = 2):
    """The shared Lloyd loop (see q_embed_kmeans docstring for the
    scale shape); returns (ex, assign, cent) for downstream consumers
    (the k-means rollup and the D4 prototype prune)."""
    from pyspark.sql import Window as W

    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("j", "x")
    ).withColumn("x", F.col("x").cast("double")).persist()
    cent = (
        ex.groupBy((F.col("vec_id") % k).cast("bigint").alias("c"), "j")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("v")
        )
    )
    assign = None
    for _ in range(iters):
        dist = (
            ex.join(F.broadcast(cent), "j")
            .groupBy("vec_id", "c")
            .agg(
                F.sum(
                    ((F.col("x") - F.col("v")) * (F.col("x") - F.col("v")))
                    .cast("decimal(38,18)")
                )
                .cast("double")
                .alias("dist")
            )
        )
        assign = (
            dist.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("vec_id").orderBy("dist", "c")
                ),
            )
            .filter(F.col("rn") == 1)
            .select("vec_id", "c")
        )
        # assign is CORPUS-sized (one row per vector): no broadcast
        # hint — AQE picks broadcast at small scale and a co-partitioned
        # shuffle join at 100 TB, where broadcasting it would be fatal
        cent = (
            ex.join(assign, "vec_id")
            .groupBy("c", "j")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                    / F.count("*")
                ).alias("v")
            )
        )
    return ex, assign, cent


@register(
    "q_embed_kmeans",
    _kmeans_oracle(2, 4),
    "deterministic k-means (k=4, 2 Lloyd rounds, modulo-init) over the "
    "embedding table — the cluster-balanced-sampling / semantic-"
    "clustering primitive, every round's float math decimal-stabilized "
    "so assignments match the DuckDB unrolled twin exactly",
)
def q_embed_kmeans(spark, sf_dir):
    """Lloyd on Spark without MLlib: each round is (a) a distance
    aggregate against the BROADCAST k×64 centroid table — narrow map +
    map-side partial sum, (b) an argmin window per vector, (c) a
    per-(cluster, dim) mean — shuffle width k×64 regardless of input
    size. The 100 TB never re-scans: `ex` is the one exploded pass,
    cached; iteration cost is O(n·k·d) compute with O(k·d) shuffle.
    Ties (equidistant centroids) break on cluster id in both engines."""
    ex, assign, cent = _kmeans_fit(spark, sf_dir)
    return (
        assign.join(F.broadcast(cent), "c")
        .groupBy(F.col("c").alias("cluster"))
        .agg(
            F.countDistinct("vec_id").alias("n"),
            F.round(
                F.sum((F.col("v") * F.col("v")).cast("decimal(38,18)"))
                .cast("double")
                / F.countDistinct("vec_id"),
                9,
            ).alias("centroid_sq_norm"),
        )
        .orderBy("cluster")
    )


@register(
    "q_embed_random_projection",
    """
    WITH dims AS (
      SELECT t1.i, t2.j,
             (CAST('0x' || substr(md5(CAST(t1.i AS VARCHAR) || '_' ||
                                      CAST(t2.j AS VARCHAR)), 1, 8)
                   AS BIGINT) % 1000) / 1000.0 - 0.5 AS p
      FROM range(4) t1(i) CROSS JOIN range(64) t2(j)),
    ex AS (
      SELECT vec_id, label, t.j,
             CAST(list_extract(embedding, t.j + 1) AS DOUBLE) AS x
      FROM embeddings CROSS JOIN range(64) t(j)),
    proj AS (
      SELECT e.vec_id, e.label, d.i,
             CAST(SUM(CAST(e.x * d.p AS DECIMAL(38,18))) AS DOUBLE) AS coord
      FROM ex e JOIN dims d ON d.j = e.j
      GROUP BY e.vec_id, e.label, d.i)
    SELECT label, i AS dim, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(coord AS DECIMAL(38,18))) AS DOUBLE)
                 / COUNT(*), 9) AS avg_coord
    FROM proj GROUP BY label, i ORDER BY label, dim
    """,
    "random-projection dimensionality reduction (Johnson-Lindenstrauss "
    "sketch): 64-d embeddings projected to 4-d through an md5-derived "
    "pseudo-random matrix both engines can reconstruct bit-identically; "
    "per-label centroid profile of the projected space",
)
def q_embed_random_projection(spark, sf_dir):
    """The projection matrix is DERIVED, not stored — md5(i_j) gives
    every engine (and every executor, with no broadcast of learned
    state) the same matrix, the same trick as the hyperplane-LSH and
    hash-sample ops. Scale: posexplode is a narrow map, the 256-cell
    matrix broadcasts, and the per-vector reduce partial-aggregates
    map-side; nothing shuffles except (vec_id, i) partial sums. The
    same shape serves PCA-free visualization, coarse ANN pre-filters,
    and feature hashing."""
    emb = t(spark, sf_dir, "embeddings")
    dims = (
        spark.range(4)
        .withColumnRenamed("id", "i")
        .crossJoin(spark.range(64).withColumnRenamed("id", "j"))
        .select(
            "i",
            "j",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "_", F.col("i").cast("string"),
                                F.col("j").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 1000
                / F.lit(1000.0)
                - F.lit(0.5)
            ).alias("p"),
        )
    )
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("j", "x")
    ).withColumn("x", F.col("x").cast("double"))
    proj = (
        ex.join(F.broadcast(dims), "j")
        .groupBy("vec_id", "label", "i")
        .agg(
            F.sum((F.col("x") * F.col("p")).cast("decimal(38,18)"))
            .cast("double")
            .alias("coord")
        )
    )
    return (
        proj.groupBy("label", F.col("i").alias("dim"))
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("coord").cast("decimal(38,18)")).cast("double")
                / F.count("*"),
                9,
            ).alias("avg_coord"),
        )
        .orderBy("label", "dim")
    )


@register(
    "q_pipeline_wire_to_snapshot",
    """
    WITH snap AS (
      SELECT user_id, event_type AS etype, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events)
      WHERE rn = 1 AND event_type <> 'error')
    SELECT etype, COUNT(*) AS n_users,
           CAST(SUM(CAST(user_id AS DECIMAL(38,0))) AS BIGINT) AS sum_uid,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM snap GROUP BY etype ORDER BY etype
    """,
    "the reference's entire consumer lifecycle as ONE oracle-gated "
    "query: raw COPY frames ('w' XLogData wrapping wal2json-v2 payloads "
    "+ interleaved 'k' keepalives + an unknown tag) → Catalyst wire "
    "demux → v2 decode → apply_changes snapshot → aggregate, "
    "value-hash-checked against a direct newest-per-key replay",
)
def q_pipeline_wire_to_snapshot(spark, sf_dir):
    """Layer cake scale shape: encode is the only Python (Arrow-batched
    map); demux + v2 decode are whole-stage-codegen narrow maps; the
    one shuffle in the whole pipeline is apply_changes' latest-image
    window on the key — exactly the per-family budgets SCALE.md
    promises, composed end-to-end. Keepalives and unknown tags ride the
    same frame log and are separated by the demux without touching the
    data plane."""
    import json as _json
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.operators.apply_changes import apply_changes
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json_v2
    from pg_logical_replication_spark.sources.wire import demux_copy_stream

    def encode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        frames = []
        for pdf in pdfs:
            for eid, uid, et, val in zip(
                pdf["event_id"], pdf["user_id"], pdf["event_type"], pdf["value"]
            ):
                eid, uid = int(eid), int(uid)
                lsn = f"0/{eid * 8 + 16:X}"
                if et == "signup":
                    action, cols = "I", True
                elif et == "error":
                    action, cols = "D", False
                else:
                    action, cols = "U", True
                msg = {
                    "action": action,
                    "schema": "public",
                    "table": "t",
                    "lsn": lsn,
                    "xid": eid,
                }
                if cols:
                    msg["columns"] = [
                        {"name": "user_id", "type": "bigint", "value": str(uid)},
                        {"name": "etype", "type": "text", "value": str(et)},
                        {"name": "value", "type": "double precision",
                         "value": repr(float(val))},
                    ]
                else:
                    msg["identity"] = [
                        {"name": "user_id", "type": "bigint", "value": str(uid)}
                    ]
                payload = _json.dumps(msg).encode()
                start = eid * 8 + 16
                frames.append(
                    b"w"
                    + struct.pack(">QQq", start, start + len(payload), eid)
                    + payload
                )
                if eid % 16 == 0:  # keepalive plane, demux must drop it
                    frames.append(b"k" + struct.pack(">Qq", start, eid) + b"\x00")
                if eid % 500 == 0:  # unknown tag → '?' row, not data
                    frames.append(b"z" + b"\x00" * 24)
            yield pd.DataFrame({"data": frames})
            frames = []

    raw = (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(encode, "data binary")
    )
    payloads = (
        demux_copy_stream(raw)
        .filter(F.col("msg_type") == "w")
        .select(F.col("payload").cast("string").alias("value"))
    )
    events = decode_wal2json_v2(payloads)
    snap = apply_changes(
        events,
        key_columns=["user_id"],
        table="t",
        columns={
            "user_id": "bigint",
            "etype": "text",
            "value": "double precision",
        },
    )
    return (
        snap.groupBy("etype")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.col("user_id").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("sum_uid"),
            ssum("value").alias("sum_value"),
        )
        .orderBy("etype")
    )


@register(
    "q_variant_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(json_extract_string(props, '$.missing')) AS BIGINT)
             AS n_missing
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "semi-structured Variant path (Spark 4 VariantType): props parsed "
    "once to variant, typed path extraction + safe missing-path probe — "
    "the open-schema ingestion pattern (vs per-query string re-parsing "
    "in get_json_object)",
)
def q_variant_extract(spark, sf_dir):
    """parse_json materializes the binary variant encoding ONCE; every
    variant_get afterwards is a cheap binary path walk instead of a
    string re-parse (the difference between O(fields) and O(queries)
    JSON parsing at 100 TB — and why variant columns should be
    materialized at ingestion, not in the query). try_variant_get is
    the total (null-on-miss) form for paths that may not exist."""
    ev = t(spark, sf_dir, "events")
    parsed = ev.select("event_type", F.parse_json("props").alias("v"))
    return (
        parsed.select(
            "event_type",
            F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
            F.expr("try_variant_get(v, '$.missing', 'string')").alias("missing"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.count("missing").alias("n_missing"),
        )
        .orderBy("event_type")
    )


def _pagerank_oracle(iters: int = 5) -> str:
    """Unrolled-CTE DuckDB twin of the iterative PageRank builder.

    The recursion is unrolled (r0..rN as chained CTEs) because the
    grouped aggregate per step doesn't fit SQL's recursive-CTE rules;
    the arithmetic is written with the exact same parenthesization and
    decimal-stabilized summation as the Spark side so five iterations
    of float math stay bit-identical across engines.
    """
    head = """
    WITH edges AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    ow AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT v FROM
      (SELECT src AS v FROM edges UNION SELECT dst FROM edges)),
    cnt AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT v, 1.0 / cnt.n AS rank FROM nodes CROSS JOIN cnt)
    """
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
    r{i} AS (
      SELECT nd.v,
             0.15 / cnt.n + 0.85 * COALESCE(
               CAST(SUM(CAST(p.rank * e.w / ow.outw AS DECIMAL(38,18)))
                    AS DOUBLE), 0.0) AS rank
      FROM nodes nd CROSS JOIN cnt
      LEFT JOIN edges e ON e.dst = nd.v
      LEFT JOIN ow ON ow.src = e.src
      LEFT JOIN r{i - 1} p ON p.v = e.src
      GROUP BY nd.v, cnt.n)""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT v AS nationkey, ROUND(rank, 9) AS rank
    FROM r{iters} ORDER BY v
    """
    )


def _trade_edge_graph(spark, sf_dir):
    """supplier-nation → customer-nation weighted edge list: ONE pass
    over lineitem (two dim joins — AQE broadcasts them while they fit,
    shuffle-joins co-partitioned when they don't — + a partial-aggregated
    groupBy to the ~|nations|² reduction), the only stage that grows at
    100 TB."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )


@register(
    "q_graph_pagerank",
    _pagerank_oracle(5),
    "weighted PageRank (5 iterations, damping 0.85) over the "
    "supplier-nation → customer-nation trade graph — the iterative-"
    "algorithm representative (decimal-stabilized contributions keep "
    "five rounds of float math cross-engine exact)",
)
def q_graph_pagerank(spark, sf_dir, edges_in_cluster=False):
    """The iteration runs on the CONSTANT-size nation-graph reduction.
    Default: the reduction is collected and the fixpoint iterates
    driver-side in bit-exact replicated arithmetic (IEEE doubles +
    half-up decimal(38,18) stabilization, identical to the SQL twin):
    re-entering the cluster per round would pay ~4 AQE stage
    materializations per iteration for zero parallelism gain on 25
    nodes — measured 7-10 s of pure scheduling vs <0.1 s locally.
    ``edges_in_cluster=True`` routes the SAME arithmetic through the
    distributed join-loop (``operators/graph.pagerank``) — the
    formulation for graphs whose edge list outgrows the driver; the
    agreement test in tests/test_pipeline_ops.py pins the two equal."""
    from decimal import ROUND_HALF_UP, Decimal

    if edges_in_cluster:
        from pg_logical_replication_spark.operators.graph import pagerank

        ranks = pagerank(
            _trade_edge_graph(spark, sf_dir),
            iterations=5,
            damping=0.85,
            teleport=0.15,  # the driver twin's exact float literal
        )
        return ranks.select(
            F.col("v").cast("int").alias("nationkey"),
            # half-up 1e-9 quantization, same as the driver twin below
            F.col("rank").cast("decimal(38,9)").cast("double").alias("rank"),
        ).orderBy("nationkey")

    edges = _trade_edge_graph(spark, sf_dir).collect()

    ew = [(r["src"], r["dst"], r["w"]) for r in edges]
    outw: dict[int, int] = {}
    for src, _dst, w in ew:
        outw[src] = outw.get(src, 0) + w
    nodes = sorted({src for src, _, _ in ew} | {dst for _, dst, _ in ew})
    n = len(nodes)
    q18 = Decimal("1e-18")
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        mass: dict[int, Decimal] = {}
        for src, dst, w in ew:
            # same parenthesization as the SQL twin: (rank*w)/outw in
            # IEEE double, then half-up decimal(38,18) per contribution
            contrib = Decimal(rank[src] * w / outw[src]).quantize(
                q18, rounding=ROUND_HALF_UP
            )
            mass[dst] = mass.get(dst, Decimal(0)) + contrib
        rank = {
            v: 0.15 / n + 0.85 * float(mass.get(v, Decimal(0)))
            for v in nodes
        }
    rows = [
        (v, float(Decimal(rank[v]).quantize(Decimal("1e-9"),
                                            rounding=ROUND_HALF_UP)))
        for v in nodes
    ]
    return spark.createDataFrame(rows, "nationkey int, rank double").orderBy(
        "nationkey"
    )


@register(
    "q_cdc_wire_demux",
    """
    SELECT 'w' AS msg_type, COUNT(*) AS n,
           CAST(MAX(event_id * 256 + 7 + length(event_type)) AS BIGINT)
             AS max_wal,
           CAST(SUM(length(event_type)) AS BIGINT) AS payload_bytes,
           CAST(0 AS BIGINT) AS n_respond,
           CAST(946684800000000 + MIN(event_id) * 1000 AS BIGINT) AS min_ts_us
    FROM events
    HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'k', COUNT(*),
           CAST(MAX(event_id * 256 + 8) AS BIGINT),
           CAST(0 AS BIGINT),
           CAST(SUM(CASE WHEN event_id % 20 = 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(946684800000000 + MIN(event_id) * 1000 + 1 AS BIGINT)
    FROM events WHERE event_id % 10 = 0
    HAVING COUNT(*) > 0
    ORDER BY msg_type
    """,
    "raw replication COPY-stream demux (reference copyData listener, "
    "logical-replication-service.ts:146-174): events encoded as "
    "XLogData 'w' frames + periodic 'k' keepalives, split and "
    "header-decoded entirely in Catalyst (hex→conv, no UDF), "
    "aggregates replayed closed-form by the oracle",
)
def q_cdc_wire_demux(spark, sf_dir):
    """Encode side is an Arrow-batched mapInPandas (the only Python);
    the demux itself (sources/wire.py) is first-byte CASE + substring
    header math — whole-stage-codegen, filter pushes to the scan. The
    keepalive plane separates from the data plane with no shuffle."""
    import struct
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.sources.wire import demux_copy_stream

    def encode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            frames = []
            for eid, etype in zip(pdf["event_id"], pdf["event_type"]):
                eid = int(eid)
                payload = str(etype).encode()
                start = eid * 256 + 7
                frames.append(
                    b"w"
                    + struct.pack(
                        ">QQq", start, start + len(payload), eid * 1000
                    )
                    + payload
                )
                if eid % 10 == 0:
                    frames.append(
                        b"k"
                        + struct.pack(">Qq", eid * 256 + 8, eid * 1000 + 1)
                        + (b"\x01" if eid % 20 == 0 else b"\x00")
                    )
            yield pd.DataFrame({"data": frames})

    raw = (
        t(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .mapInPandas(encode, "data binary")
    )
    return (
        demux_copy_stream(raw)
        .groupBy("msg_type")
        .agg(
            F.count("*").alias("n"),
            F.max("wal_end").alias("max_wal"),
            # zero-coalesced so a group with no such field stays BIGINT
            # (a NULL in a pandas int column silently floats the column)
            F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias(
                "payload_bytes"
            ),
            F.sum(
                F.coalesce(F.col("should_respond").cast("bigint"), F.lit(0))
            ).alias("n_respond"),
            F.min(F.unix_micros("server_ts")).alias("min_ts_us"),
        )
        .orderBy("msg_type")
    )


@register(
    "q_join_bloom_prune",
    """
    WITH s AS (SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 9000),
    build AS (
      SELECT list_sort(list(DISTINCT pos)) AS bits FROM (
        SELECT CAST('0x' || substr(md5('b' || seed || '#' ||
                       CAST(k AS VARCHAR)), 1, 15) AS BIGINT) % 8192 AS pos
        FROM s CROSS JOIN (VALUES (1),(2),(3)) seeds(seed))),
    probe AS (SELECT DISTINCT l_suppkey AS k FROM lineitem),
    cand AS (
      SELECT p.k,
             list_has_all(b.bits, [
               CAST('0x' || substr(md5('b1#' || CAST(p.k AS VARCHAR)), 1, 15)
                 AS BIGINT) % 8192,
               CAST('0x' || substr(md5('b2#' || CAST(p.k AS VARCHAR)), 1, 15)
                 AS BIGINT) % 8192,
               CAST('0x' || substr(md5('b3#' || CAST(p.k AS VARCHAR)), 1, 15)
                 AS BIGINT) % 8192]) AS maybe,
             EXISTS (SELECT 1 FROM s WHERE s.k = p.k) AS truly
      FROM probe p CROSS JOIN build b)
    SELECT (SELECT COUNT(*) FROM s) AS n_build_keys,
           COUNT(*) AS n_probe_keys,
           CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
             AS n_candidates,
           CAST(SUM(CASE WHEN truly THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN maybe AND NOT truly THEN 1 ELSE 0 END)
             AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN truly AND NOT maybe THEN 1 ELSE 0 END)
             AS BIGINT) AS n_missed
    FROM cand
    """,
    "Bloom-filter join pruning: an 8192-bit / 3-hash filter built from "
    "the small join side is probed by the big side before any shuffle; "
    "md5-derived hash positions make the bit set and every membership "
    "verdict engine-replayable (n_missed must be 0 — Blooms have no "
    "false negatives)",
)
def q_join_bloom_prune(spark, sf_dir):
    """THE shuffle-avoidance pattern for selective joins at 100 TB:
    the build side reduces to a bit set (here a sorted position array,
    ≤ 3·|S| longs) broadcast into the probe scan, so non-candidate rows
    die before the exchange — Spark's own runtime row-group filtering
    (spark.sql.optimizer.runtime.bloomFilter.enabled) does this
    opaquely; this query pins the arithmetic observably. Probe keys
    reduce with a map-side distinct first; every verdict is integer
    arithmetic on md5, so both engines agree bit-for-bit."""
    sup = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_suppkey").alias("k"))
    )

    def pos(seed: int, key):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"b{seed}#"), key.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 8192
        )

    build = (
        sup.select(
            F.explode(
                F.array(*[pos(s, F.col("k")) for s in (1, 2, 3)])
            ).alias("p")
        )
        .agg(F.array_sort(F.collect_set("p")).alias("bits"))
    )
    probe = t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k")
    ).distinct()
    probed = probe.crossJoin(F.broadcast(build)).withColumn(
        "maybe",
        F.forall(
            F.array(*[pos(s, F.col("k")) for s in (1, 2, 3)]),
            lambda p: F.array_contains(F.col("bits"), p),
        ),
    )
    truly = sup.select("k").withColumn("truly", F.lit(True))
    cand = probed.join(F.broadcast(truly), "k", "left").withColumn(
        "truly", F.coalesce(F.col("truly"), F.lit(False))
    )
    # build-side cardinality as a lazy 1-row aggregate (the oracle's
    # scalar subquery), not an eager .count() at plan-build time
    n_build = sup.agg(F.count(F.lit(1)).alias("n_build_keys"))
    cand = cand.crossJoin(F.broadcast(n_build))
    return cand.agg(
        F.first("n_build_keys").alias("n_build_keys"),
        F.count("*").alias("n_probe_keys"),
        F.sum(F.when(F.col("maybe"), 1).otherwise(0)).alias("n_candidates"),
        F.sum(F.when(F.col("truly"), 1).otherwise(0)).alias("n_true"),
        F.sum(
            F.when(F.col("maybe") & ~F.col("truly"), 1).otherwise(0)
        ).alias("n_false_pos"),
        F.sum(
            F.when(F.col("truly") & ~F.col("maybe"), 1).otherwise(0)
        ).alias("n_missed"),
    )


@register(
    "q_graph_triangles",
    """
    WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem),
    e AS (SELECT a.pk AS pa, b.pk AS pb
          FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    tri AS (SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
            FROM e e1
            JOIN e e2 ON e2.pa = e1.pb
            JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
    node AS (
      SELECT v, COUNT(*) AS n_tri FROM (
        SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri) GROUP BY v)
    SELECT v, n_tri FROM node
    ORDER BY n_tri DESC, v LIMIT 15
    """,
    "triangle counting on the co-purchase graph (parts bought together "
    "in ≥2 orders): per-node triangle participation, top-15 — the "
    "clustering-coefficient / community-detection primitive",
)
def q_graph_triangles(spark, sf_dir):
    """Standard distributed triangle enumeration: orient every edge
    low→high so each triangle is found exactly once, then two
    self-joins over the (already reduced) edge list. The raw scan
    collapses to DISTINCT (order, part) pairs first and the ≥2-support
    filter prunes the edge list before any quadratic step; the
    wedge-join shuffles on the shared endpoint — at 100 TB you'd
    pre-bucket the edge list by pa. All integer counts."""
    li = t(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(b, (F.col("b.ok") == F.col("a.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
        .persist()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("a"),
            F.col("e1.pb").alias("b"),
            F.col("e2.pb").alias("c"),
        )
    )
    node = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("n_tri"))
    )
    return node.orderBy(F.col("n_tri").desc(), "v").limit(15)


_PQ_ORACLE = """
    WITH ex AS (
      SELECT vec_id, t.j, t.j // 16 AS sub,
             CAST(list_extract(embedding, t.j + 1) AS DOUBLE) AS x
      FROM embeddings CROSS JOIN range(64) t(j)),
    c0 AS (
      SELECT vec_id % 8 AS c, sub, j,
             CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)/COUNT(*) AS v
      FROM ex GROUP BY 1, 2, 3),
    d0 AS (
      SELECT e.vec_id, e.sub, c0.c,
             CAST(SUM(CAST((e.x - c0.v)*(e.x - c0.v) AS DECIMAL(38,18)))
               AS DOUBLE) AS dist
      FROM ex e JOIN c0 ON c0.j = e.j AND c0.sub = e.sub
      GROUP BY 1, 2, 3),
    a0 AS (
      SELECT vec_id, sub, c FROM (
        SELECT vec_id, sub, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, c) AS rn
        FROM d0) WHERE rn = 1),
    c1 AS (
      SELECT a0.c, e.sub, e.j,
             CAST(SUM(CAST(e.x AS DECIMAL(38,18))) AS DOUBLE)/COUNT(*) AS v
      FROM ex e JOIN a0 ON a0.vec_id = e.vec_id AND a0.sub = e.sub
      GROUP BY 1, 2, 3),
    d1 AS (
      SELECT e.vec_id, e.sub, c1.c,
             CAST(SUM(CAST((e.x - c1.v)*(e.x - c1.v) AS DECIMAL(38,18)))
               AS DOUBLE) AS dist
      FROM ex e JOIN c1 ON c1.j = e.j AND c1.sub = e.sub
      GROUP BY 1, 2, 3),
    codes AS (
      SELECT vec_id, sub, c FROM (
        SELECT vec_id, sub, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, c) AS rn
        FROM d1) WHERE rn = 1),
    q AS (SELECT j, sub, x FROM ex WHERE vec_id = 0),
    lut AS (
      SELECT c1.sub, c1.c,
             CAST(SUM(CAST((q.x - c1.v)*(q.x - c1.v) AS DECIMAL(38,18)))
               AS DOUBLE) AS pd
      FROM c1 JOIN q ON q.j = c1.j AND q.sub = c1.sub GROUP BY 1, 2),
    approx AS (
      SELECT cd.vec_id,
             CAST(SUM(CAST(l.pd AS DECIMAL(38,18))) AS DOUBLE) AS adist
      FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.c = cd.c
      GROUP BY cd.vec_id)
    SELECT vec_id, ROUND(adist, 9) AS approx_dist
    FROM approx WHERE vec_id <> 0
    ORDER BY adist, vec_id LIMIT 10
"""


@register(
    "q_ann_pq_topk",
    _PQ_ORACLE,
    "product-quantization ANN (PQ4x8: 4 subspaces × 8 centroids, "
    "modulo-init + 1 Lloyd round): asymmetric-distance top-10 for "
    "query vec 0 through the 4×8 lookup table — completes the "
    "IVF / SQ8 / PQ coarse-index trio, every float decimal-stabilized "
    "so codebooks, codes and ADC ranks replay exactly on DuckDB",
)
def q_ann_pq_topk(spark, sf_dir):
    """PQ compresses each 64-d vector to 4 bytes (codes into a k=8
    codebook per 16-d subspace), and query scoring touches only the
    codes plus a 4×8 precomputed distance table — at 100 TB the scan
    reads 1/64th the bytes of the float path and the LUT join is a
    broadcast of 32 rows. Training shuffles only (sub, c, j) partial
    sums (width k·d regardless of input); the exploded pass is cached
    once. Same modulo-init + decimal-stabilized Lloyd as
    q_embed_kmeans so the codebook is engine-replayable."""
    from pyspark.sql import Window as W

    M, K, DSUB = 4, 8, 16
    emb = t(spark, sf_dir, "embeddings")
    ex = (
        emb.select("vec_id", F.posexplode("embedding").alias("j", "x"))
        .withColumn("x", F.col("x").cast("double"))
        .withColumn("sub", (F.col("j") / DSUB).cast("bigint"))
        .persist()
    )

    def means(assign=None):
        src = (
            ex.withColumn("c", (F.col("vec_id") % K).cast("bigint"))
            if assign is None
            else ex.join(F.broadcast(assign), ["vec_id", "sub"])
        )
        return src.groupBy("c", "sub", "j").agg(
            (
                F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("v")
        )

    def argmin(cent):
        d = (
            ex.join(F.broadcast(cent), ["sub", "j"])
            .groupBy("vec_id", "sub", "c")
            .agg(
                F.sum(
                    ((F.col("x") - F.col("v")) * (F.col("x") - F.col("v")))
                    .cast("decimal(38,18)")
                )
                .cast("double")
                .alias("dist")
            )
        )
        return (
            d.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("vec_id", "sub").orderBy("dist", "c")
                ),
            )
            .filter(F.col("rn") == 1)
            .select("vec_id", "sub", "c")
        )

    c0 = means()
    a0 = argmin(c0)
    c1 = means(a0)
    codes = argmin(c1)
    q = ex.filter(F.col("vec_id") == 0).select(
        "sub", "j", F.col("x").alias("qx")
    )
    lut = (
        c1.join(F.broadcast(q), ["sub", "j"])
        .groupBy("sub", "c")
        .agg(
            F.sum(
                ((F.col("qx") - F.col("v")) * (F.col("qx") - F.col("v")))
                .cast("decimal(38,18)")
            )
            .cast("double")
            .alias("pd")
        )
    )
    approx = (
        codes.join(F.broadcast(lut), ["sub", "c"])
        .groupBy("vec_id")
        .agg(F.sum(F.col("pd").cast("decimal(38,18)")).cast("double").alias("adist"))
    )
    return (
        approx.filter(F.col("vec_id") != 0)
        .orderBy("adist", "vec_id")
        .select("vec_id", F.round("adist", 9).alias("approx_dist"))
        .limit(10)
    )


def _semdedup_oracle(thr: float = 0.3) -> str:
    """k-means head (2 unrolled Lloyd rounds, shared with
    q_embed_kmeans) closed with the in-cluster cosine dedup."""
    head = _kmeans_oracle(2, 4)
    head = head[: head.index("SELECT a.c AS cluster")]
    return (
        head
        + f"""
    , nrm AS (
      SELECT vec_id,
             CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS n2
      FROM ex GROUP BY vec_id),
    prs AS (
      SELECT p1.c, p1.vec_id AS va, p2.vec_id AS vb
      FROM a2 p1 JOIN a2 p2
        ON p2.c = p1.c AND p1.vec_id < p2.vec_id),
    dots AS (
      SELECT p.c, p.va, p.vb,
             CAST(SUM(CAST(a.x * b.x AS DECIMAL(38,18))) AS DOUBLE) AS dp
      FROM prs p
      JOIN ex a ON a.vec_id = p.va
      JOIN ex b ON b.vec_id = p.vb AND b.j = a.j
      GROUP BY p.c, p.va, p.vb),
    dups AS (
      SELECT d.c, d.va, d.vb
      FROM dots d
      JOIN nrm na ON na.vec_id = d.va
      JOIN nrm nb ON nb.vec_id = d.vb
      WHERE d.dp / (SQRT(na.n2) * SQRT(nb.n2)) > {thr})
    SELECT a.c AS cluster,
           COUNT(DISTINCT a.vec_id) AS n_vecs,
           (SELECT COUNT(*) FROM dups d WHERE d.c = a.c) AS n_dup_pairs,
           (SELECT COUNT(DISTINCT d.vb) FROM dups d WHERE d.c = a.c)
             AS n_removed
    FROM a2 a GROUP BY a.c ORDER BY a.c
    """
    )


@register(
    "q_dedup_semantic",
    _semdedup_oracle(),
    "semantic deduplication (the SemDeDup recipe): k-means cluster the "
    "embedding space, then compare cosines ONLY within clusters "
    "(> 0.3 → near-duplicate, keep the lowest id) — per-cluster "
    "vector / dup-pair / removed counts",
)
def q_dedup_semantic(spark, sf_dir):
    """SemDeDup's point is the scale shape: clustering first makes the
    quadratic step per-cluster (Σ|cluster|² ≪ n² — here ~4× cheaper,
    at 100 TB with √n clusters it's the difference between feasible
    and not). The Lloyd rounds shuffle O(k·d) partial sums off one
    cached exploded pass; the pair stage shuffles only within-cluster
    pair keys. Same modulo-init decimal-stabilized codebook as
    q_embed_kmeans, so assignments — and therefore the dedup verdicts
    — replay exactly on the oracle."""
    from pyspark.sql import Window as W

    K, THR = 4, 0.3
    emb = t(spark, sf_dir, "embeddings")
    ex = (
        emb.select("vec_id", F.posexplode("embedding").alias("j", "x"))
        .withColumn("x", F.col("x").cast("double"))
        .persist()
    )
    cent = ex.groupBy(
        (F.col("vec_id") % K).cast("bigint").alias("c"), "j"
    ).agg(
        (
            F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
            / F.count("*")
        ).alias("v")
    )
    assign = None
    for _ in range(2):
        if assign is not None:
            cent = ex.join(F.broadcast(assign), "vec_id").groupBy("c", "j").agg(
                (
                    F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                    / F.count("*")
                ).alias("v")
            )
        dist = (
            ex.join(F.broadcast(cent), "j")
            .groupBy("vec_id", "c")
            .agg(
                F.sum(
                    ((F.col("x") - F.col("v")) * (F.col("x") - F.col("v")))
                    .cast("decimal(38,18)")
                )
                .cast("double")
                .alias("dist")
            )
        )
        assign = (
            dist.withColumn(
                "rn",
                F.row_number().over(W.partitionBy("vec_id").orderBy("dist", "c")),
            )
            .filter(F.col("rn") == 1)
            .select("vec_id", "c")
        )
    assign = assign.persist()
    nrm = ex.groupBy("vec_id").agg(
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)"))
        .cast("double")
        .alias("n2")
    )
    p1, p2 = assign.alias("p1"), assign.alias("p2")
    prs = p1.join(
        p2,
        (F.col("p2.c") == F.col("p1.c"))
        & (F.col("p1.vec_id") < F.col("p2.vec_id")),
    ).select(
        F.col("p1.c").alias("c"),
        F.col("p1.vec_id").alias("va"),
        F.col("p2.vec_id").alias("vb"),
    )
    a, b = ex.alias("a"), ex.alias("b")
    dots = (
        prs.join(a, F.col("a.vec_id") == F.col("va"))
        .join(
            b,
            (F.col("b.vec_id") == F.col("vb")) & (F.col("b.j") == F.col("a.j")),
        )
        .groupBy("c", "va", "vb")
        .agg(
            F.sum((F.col("a.x") * F.col("b.x")).cast("decimal(38,18)"))
            .cast("double")
            .alias("dp")
        )
    )
    na, nb = nrm.alias("na"), nrm.alias("nb")
    dups = (
        dots.join(na, F.col("na.vec_id") == F.col("va"))  # norms are corpus-
        .join(nb, F.col("nb.vec_id") == F.col("vb"))   # sized: AQE decides
        .filter(
            F.col("dp") / (F.sqrt(F.col("na.n2")) * F.sqrt(F.col("nb.n2")))
            > THR
        )
        .select("c", "va", "vb")
        .persist()
    )
    per_cluster = assign.groupBy("c").agg(
        F.count_distinct("vec_id").alias("n_vecs")
    )
    dup_stats = dups.groupBy("c").agg(
        F.count("*").alias("n_dup_pairs"),
        F.count_distinct("vb").alias("n_removed"),
    )
    return (
        per_cluster.join(dup_stats, "c", "left")
        .select(
            F.col("c").alias("cluster"),
            "n_vecs",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
        .orderBy("cluster")
    )


@register(
    "q_embed_d4_prune",
    _d4_oracle(2, 4),
    "D4-style diversity pruning (Abbas et al. 2023, 'SemDeDup + "
    "prototypes'): after the deterministic Lloyd fit, rank every "
    "vector by distance to its OWN centroid and drop the closest half "
    "per cluster — the redundant prototypical core — keeping the "
    "diverse half; rank on round(dist,9) with id tie-break so the cut "
    "is exact cross-engine; iteration shuffle stays O(k·d), the final "
    "rank is one window per cluster",
)
def q_embed_d4_prune(spark, sf_dir):
    """The data-pruning member of the embedding family: SemDeDup
    removes near-identical pairs, D4 additionally prunes cluster
    cores. Reuses the shared _kmeans_fit chain (same decimal-stabilized
    float contract as q_embed_kmeans)."""
    from pyspark.sql import Window as W

    ex, assign, cent = _kmeans_fit(spark, sf_dir)
    fd = (
        ex.join(assign, "vec_id")  # corpus-sized: AQE decides (see _kmeans_fit)
        .join(F.broadcast(cent), ["c", "j"])
        .groupBy("vec_id", "c")
        .agg(
            F.sum(
                ((F.col("x") - F.col("v")) * (F.col("x") - F.col("v")))
                .cast("decimal(38,18)")
            )
            .cast("double")
            .alias("dist")
        )
    )
    w = W.partitionBy("c").orderBy(F.round("dist", 9), "vec_id")
    wc = W.partitionBy("c")
    rk = fd.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_c", F.count("*").over(wc)
    )
    keep = F.col("rn") * 2 > F.col("n_c")
    return (
        rk.groupBy(F.col("c").alias("cluster"))
        .agg(
            F.max("n_c").cast("long").alias("n"),
            F.count(F.when(keep, 1)).cast("long").alias("n_kept"),
            F.min(F.when(keep, F.col("vec_id"))).cast("long").alias(
                "first_kept"
            ),
            F.round(
                F.sum(F.when(keep, F.round("dist", 9)))
                / F.count(F.when(keep, 1)),
                6,
            ).alias("mean_kept_dist"),
        )
        .orderBy("cluster")
    )


def _skew_oracle() -> str:
    """Value-at-rank percentile convention mirrored exactly: rank =
    ROW_NUMBER() OVER (ORDER BY sz, k::VARCHAR), picked at
    ceil(p·n_keys/100) = (p·n_keys+99)//100."""
    blocks = []
    rows = []
    for sfx, tbl, key in (
        ("o", "orders", "o_custkey"),
        ("l", "lineitem", "l_suppkey"),
        ("d", "documents", "lang"),
    ):
        blocks.append(f"""
    s_{sfx} AS (SELECT CAST({key} AS VARCHAR) AS k,
                       CAST(COUNT(*) AS BIGINT) AS sz
                FROM {tbl} GROUP BY 1),
    r_{sfx} AS (SELECT sz, ROW_NUMBER() OVER (ORDER BY sz, k) AS r
                FROM s_{sfx}),
    st_{sfx} AS (SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
                        CAST(COUNT(*) AS BIGINT) AS n_keys,
                        CAST(MAX(sz) AS BIGINT) AS max_group
                 FROM s_{sfx}),
    pick_{sfx} AS (SELECT
        CAST(MAX(CASE WHEN r = (50 * n_keys + 99) // 100 THEN sz END)
             AS BIGINT) AS p50_group,
        CAST(MAX(CASE WHEN r = (90 * n_keys + 99) // 100 THEN sz END)
             AS BIGINT) AS p90_group,
        CAST(MAX(CASE WHEN r = (99 * n_keys + 99) // 100 THEN sz END)
             AS BIGINT) AS p99_group
        FROM r_{sfx}, st_{sfx}),
    row_{sfx} AS (SELECT '{key}' AS key_col, n_rows, n_keys,
        CAST(n_rows * 1000 // n_keys AS BIGINT) AS mean_group_milli,
        max_group, p50_group, p90_group, p99_group,
        CAST(max_group * 1000000 // n_rows AS BIGINT) AS top1_share_ppm,
        CAST(max_group * n_keys * 1000 // n_rows AS BIGINT)
          AS max_over_mean_milli
        FROM st_{sfx}, pick_{sfx})""")
        rows.append(f"SELECT * FROM row_{sfx}")
    return (
        "WITH " + ",".join(blocks) + "\n    "
        + "\n    UNION ALL ".join(rows)
        + "\n    ORDER BY key_col"
    )


@register(
    "q_diag_key_skew",
    _skew_oracle(),
    "join/partition-key skew census — the diagnostic you run before "
    "choosing a partitioning at 100 TB: per candidate key, exact "
    "rank-based group-size percentiles, top-1 mass share (ppm) and the "
    "max/mean ratio (milli) that decides between AQE skew splitting "
    "and explicit salting; percentile ranks via the range-exchange "
    "global_row_number, never a single-partition sort",
)
def q_diag_key_skew(spark, sf_dir):
    """operators/layout.py key_skew_census over three candidate keys
    (orders.o_custkey, lineitem.l_suppkey, documents.lang). Scale: the
    groupBy per key is the aggregation the real join would pay anyway
    minus payload; ranks run over the GROUP-SIZE table (|keys| rows),
    and the census row is a 1x1 scalar cross-join."""
    from pg_logical_replication_spark.operators.layout import (
        key_skew_census,
    )

    parts = [
        key_skew_census(t(spark, sf_dir, "orders"), ["o_custkey"]),
        key_skew_census(t(spark, sf_dir, "lineitem"), ["l_suppkey"]),
        key_skew_census(t(spark, sf_dir, "documents"), ["lang"]),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key_col")


@register(
    "q_events_watermark_lateness",
    """
    WITH o AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us,
                      event_id + (event_id % 7) * 40 AS arr
               FROM events),
    m AS (SELECT event_type, ts_us,
                 MAX(ts_us) OVER (ORDER BY arr, event_id
                                  ROWS UNBOUNDED PRECEDING) AS wm
          FROM o),
    l AS (SELECT event_type, wm - ts_us AS late_us FROM m)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS late_ppm,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us,
           CAST(SUM(late_us) AS BIGINT) AS sum_late_us,
           CAST(SUM(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS dropped_at_10m
    FROM l GROUP BY 1 ORDER BY 1
    """,
    "watermark sizing from history: per event type, how late events "
    "arrive relative to the running max event-time in ARRIVAL order "
    "(event_id) — late fraction (ppm), worst/total lateness, and how "
    "many rows a 10-minute watermark would have dropped; the prefix-max "
    "runs in global_running_max's range-exchange layout, never a "
    "single-partition window sort",
)
def q_events_watermark_lateness(spark, sf_dir):
    """The replay that answers 'what withWatermark() horizon does this
    stream need': a streaming watermark IS the running max event-time,
    so lateness = prefix_max(ts) - ts in arrival order. Scale: one
    range exchange + one pid-partitioned window (operators/layout.py
    global_running_max) + the event_type rollup — the naive
    MAX() OVER (ORDER BY event_id) would serialize the whole history
    through one partition."""
    from pg_logical_replication_spark.operators.layout import (
        global_running_max,
    )

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        # deterministic delivery jitter (up to 240 stream positions):
        # the fixture arrives in event-time order, so an identity
        # arrival order would make every lateness 0 and leave the
        # prefix-max path untested
        (F.col("event_id") + (F.col("event_id") % 7) * 40).alias("arr"),
    )
    wm = global_running_max(ev, ["arr", "event_id"], "ts_us", out_col="wm")
    late = wm.select(
        "event_type", (F.col("wm") - F.col("ts_us")).alias("late_us")
    )
    is_late = F.when(F.col("late_us") > 0, 1).otherwise(0)
    return (
        late.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(is_late).cast("long").alias("n_late"),
            F.expr(
                "sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 1000000 "
                "div count(*)"
            ).cast("long").alias("late_ppm"),
            F.max("late_us").cast("long").alias("max_late_us"),
            F.sum("late_us").cast("long").alias("sum_late_us"),
            F.sum(F.when(F.col("late_us") > 600000000, 1).otherwise(0))
            .cast("long")
            .alias("dropped_at_10m"),
        )
        .orderBy("event_type")
    )


def _join_advisor_oracle() -> str:
    blocks, rows = [], []
    for sfx, (fact, fkey, dim, dkey) in {
        "c": ("orders", "o_custkey", "customer", "c_custkey"),
        "s": ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        "o": ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    }.items():
        blocks.append(f"""
    f_{sfx} AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
                       CAST(COUNT(*) AS BIGINT) AS n_keys,
                       CAST(MAX(c) AS BIGINT) AS max_group
                FROM (SELECT {fkey}, COUNT(*) AS c FROM {fact}
                      GROUP BY 1)),
    d_{sfx} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM {dim}),
    row_{sfx} AS (SELECT '{fact}⋈{dim}' AS join_name,
        f.n_rows AS fact_rows, d.n_rows AS dim_rows,
        CAST(f.max_group * f.n_keys * 1000 // f.n_rows AS BIGINT)
          AS fact_key_skew_milli,
        CASE WHEN d.n_rows <= 100000 THEN 'broadcast'
             WHEN f.max_group * f.n_keys * 1000 // f.n_rows > 4000
             THEN 'salted_smj'
             ELSE 'smj' END AS strategy
        FROM f_{sfx} f, d_{sfx} d)""")
        rows.append(f"SELECT * FROM row_{sfx}")
    return (
        "WITH " + ",".join(blocks) + "\n    "
        + "\n    UNION ALL ".join(rows) + "\n    ORDER BY join_name"
    )


@register(
    "q_diag_join_advisor",
    _join_advisor_oracle(),
    "join-strategy advisor — key_skew_census turned into a decision: "
    "per candidate join, fact/dim row counts, fact-side key skew "
    "(max/mean milli) and the integer-threshold recommendation "
    "(dim <= 100k rows -> broadcast; skew > 4x mean -> salted SMJ; "
    "else plain SMJ) — the pre-flight the layout operators "
    "(broadcast/salted_equi_join/bucketing) act on",
)
def q_diag_join_advisor(spark, sf_dir):
    """Pure integer arithmetic over per-join censuses, so the
    recommendation itself is oracle-gated — at 100 TB this query reads
    only groupBy aggregates (the join keys' distributions), never the
    fact payloads. Thresholds are deliberately simple integers: the
    point is a DETERMINISTIC, testable pre-flight, not a cost model."""
    out = None
    for fact, fkey, dim, dkey in (
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ):
        f = (
            t(spark, sf_dir, fact)
            .groupBy(fkey)
            .agg(F.count("*").alias("c"))
            .agg(
                F.sum("c").cast("long").alias("n_rows"),
                F.count("*").cast("long").alias("n_keys"),
                F.max("c").cast("long").alias("max_group"),
            )
        )
        d = t(spark, sf_dir, dim).agg(
            F.count("*").cast("long").alias("dim_rows")
        )
        row = (
            f.crossJoin(F.broadcast(d))
            .select(
                F.lit(f"{fact}⋈{dim}").alias("join_name"),
                F.col("n_rows").alias("fact_rows"),
                "dim_rows",
                F.expr("max_group * n_keys * 1000 div n_rows")
                .cast("long")
                .alias("fact_key_skew_milli"),
                F.expr(
                    "CASE WHEN dim_rows <= 100000 THEN 'broadcast' "
                    "WHEN max_group * n_keys * 1000 div n_rows > 4000 "
                    "THEN 'salted_smj' ELSE 'smj' END"
                ).alias("strategy"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("join_name")
