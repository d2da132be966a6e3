"""Physical-layout operators: bucketed co-located joins, salted joins.

The bucketing test is plan-level: after materializing both sides
bucketed by the join key, the join's physical plan must contain ZERO
shuffle exchanges — that's the property that makes the layout pay for
itself at 100 TB (recurring joins against a CDC snapshot re-read
co-located buckets instead of re-shuffling the table).
"""

import pytest
from pyspark.sql import functions as F

from pg_logical_replication_spark.operators.layout import (
    salted_equi_join,
    write_bucketed,
)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def orders_items(spark):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_id"), (F.col("id") % 7).alias("o_flag")
    )
    items = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("o_id"), F.col("id").alias("i_id")
    )
    return orders, items


def test_bucketed_join_has_no_exchange(spark, tmp_path, orders_items):
    # disable broadcast so the planner faces the real choice it faces at
    # 100 TB (neither side fits): shuffle join vs bucketed co-located join
    orders, items = orders_items
    bo = write_bucketed(
        orders, "t_orders_b", ["o_id"], num_buckets=4, path=str(tmp_path / "o")
    )
    bi = write_bucketed(
        items, "t_items_b", ["o_id"], num_buckets=4, path=str(tmp_path / "i")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bi, "o_id")
        assert joined.count() == 5000
        plan = _physical_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_items_b")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path, orders_items):
    orders, _ = orders_items
    bo = write_bucketed(
        orders, "t_orders_g", ["o_id"], num_buckets=4, path=str(tmp_path / "g")
    )
    try:
        agg = bo.groupBy("o_id").agg(F.count("*").alias("n"))
        assert agg.count() == 1000
        assert "Exchange" not in _physical_plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_g")


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) plus a long tail
    big = spark.range(0, 10000).select(
        F.when(F.col("id") < 9000, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("d")
    )
    plain = big.join(dim, ["k"]).select("k", "v", "d")
    salted = salted_equi_join(big, dim, ["k"], n_salt=8).select("k", "v", "d")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.range(0, 100).select(F.col("id").alias("k"), F.col("id").alias("v"))
    dim = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    out = salted_equi_join(big, dim, ["k"], n_salt=4, how="left")
    assert out.count() == 100
    assert out.filter(F.col("d").isNull()).count() == 90


def test_salted_join_rejects_right(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_equi_join(df, df, ["k"], how="right")


def test_table_partitioned_event_log_prunes(spark, tmp_path):
    """The SURVEY §4 layout claim: persist decoded ChangeEvents
    partitioned by table, and a per-table consumer's filter becomes
    partition pruning (PartitionFilters on the scan, other tables'
    files never open) — the at-rest analogue of wal2json filter-tables."""
    events = spark.createDataFrame(
        [(f"0/{i:X}", "users" if i % 2 else "orders", str(i)) for i in range(100)],
        "lsn string, table string, v string",
    )
    path = str(tmp_path / "evlog")
    events.write.partitionBy("table").parquet(path)

    df = spark.read.parquet(path).filter(F.col("table") == "users")
    assert df.count() == 50
    plan = _physical_plan(df)
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "PartitionFilters" in scan and "users" in scan.split("PartitionFilters")[1], scan


def test_global_row_number_matches_window(spark):
    """Exact distributed rank == single-partition row_number, on a
    multi-partition frame with heavy value ties (unique-key tie-break)."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.operators.layout import (
        global_row_number,
    )

    random.seed(11)
    rows = [(i, random.randint(0, 40)) for i in range(1201)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(9)
    ranked, n = global_row_number(df, ["v", "k"], out_col="rnk")
    assert n == 1201
    got = {r["k"]: r["rnk"] for r in ranked.collect()}
    want = {
        r["k"]: r["rnk"]
        for r in df.select(
            "k", F.row_number().over(W.orderBy("v", "k")).alias("rnk")
        ).collect()
    }
    assert got == want


def test_global_running_sum_matches_window(spark):
    """Exact distributed prefix sum == single-partition SUM OVER
    (ORDER BY v DESC, k ROWS UNBOUNDED PRECEDING), on a multi-partition
    frame with heavy ties and a descending order column."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.operators.layout import (
        global_running_sum,
    )

    random.seed(17)
    rows = [(i, random.randint(0, 25)) for i in range(1103)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    order = [F.col("v").desc(), F.col("k")]
    got = {
        r["k"]: r["cum"]
        for r in global_running_sum(df, order, "v", out_col="cum").collect()
    }
    w = W.orderBy(F.col("v").desc(), "k").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    want = {
        r["k"]: r["cum"]
        for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()
    }
    assert got == want


def test_global_running_sum_nulls_negatives_ties(spark):
    """Edge semantics must be bit-identical to SUM OVER: NULL values
    contribute nothing (a null-v row inherits the previous cum),
    negatives make the sum non-monotone, heavy ties exercise the
    range-boundary tie-break."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.operators.layout import (
        global_running_sum,
    )

    random.seed(23)
    rows = [
        (i, random.randint(0, 6),
         None if random.random() < 0.15 else random.randint(-50, 50))
        for i in range(751)
    ]
    df = spark.createDataFrame(rows, "k long, o long, v long").repartition(7)
    got = {
        r["k"]: r["cum"]
        for r in global_running_sum(
            df, [F.col("o"), F.col("k")], "v", out_col="cum"
        ).collect()
    }
    w = W.orderBy("o", "k").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        r["k"]: r["cum"]
        for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()
    }
    assert got == want

    # deterministic regression (round-7 review): a partition whose
    # LOCAL prefix is all-null must still carry the cross-partition
    # offset — the naive off + SUM(v) OVER w nulled it
    small = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 5), (5, None), (6, None)],
        "k long, v long",
    )
    got2 = {
        r["k"]: r["cum"]
        for r in global_running_sum(
            small, [F.col("k")], "v", out_col="cum", num_partitions=3
        ).collect()
    }
    assert got2 == {1: 10, 2: 30, 3: 30, 4: 35, 5: 35, 6: 35}

    # all-null global prefix stays NULL (SUM OVER semantics)
    lead_null = spark.createDataFrame(
        [(1, None), (2, None), (3, 7), (4, None)], "k long, v long"
    )
    got3 = {
        r["k"]: r["cum"]
        for r in global_running_sum(
            lead_null, [F.col("k")], "v", out_col="cum", num_partitions=2
        ).collect()
    }
    assert got3 == {1: None, 2: None, 3: 7, 4: 7}

    # empty frame: column exists, no rows explode
    empty = spark.createDataFrame([], "k long, v long")
    out = global_running_sum(empty, [F.col("k")], "v", out_col="cum")
    assert out.count() == 0 and "cum" in out.columns


def test_token_budget_homogeneous_corpus_distributed_cut(spark):
    """VERDICT r6 #2: a length-homogeneous corpus (every doc in ONE
    log2 value-range bucket — the post-chunking shape) must not fall
    back to the corpus-sized SinglePartition window. Above the census
    threshold the cut routes through global_running_sum: same selected
    set as the window path, and no SinglePartition exchange anywhere
    in the executed plan."""
    from pg_logical_replication_spark.plans.pipeline import (
        token_budget_select,
    )

    docs = spark.createDataFrame(
        [(i, 7) for i in range(900)], "doc_id long, n_tokens long"
    ).repartition(8)
    # threshold=0 forces the distributed path; huge threshold = the
    # window reference. Budget cuts mid-bucket (897*7 < 6283 < 898*7).
    fast = token_budget_select(docs, 6283, boundary_rows_threshold=0)
    slow = token_budget_select(
        docs, 6283, boundary_rows_threshold=10**9
    )
    got = sorted(r["doc_id"] for r in fast.collect())
    want = sorted(r["doc_id"] for r in slow.collect())
    assert got == want and len(got) == 897
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_exact_ntile_matches_window_ntile(spark):
    """Distributed exact ntile == NTILE(4) OVER (ORDER BY v, k) —
    including the n mod t remainder distribution and the n < tiles
    edge."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.operators.layout import exact_ntile

    random.seed(13)
    rows = [(i, random.randint(0, 30)) for i in range(997)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    got = {
        r["k"]: r["tile"]
        for r in exact_ntile(df, 4, ["v", "k"], "tile").collect()
    }
    want = {
        r["k"]: r["tile"]
        for r in df.select(
            "k", F.ntile(4).over(W.orderBy("v", "k")).alias("tile")
        ).collect()
    }
    assert got == want

    small = spark.createDataFrame([(1, 9), (2, 3)], "k long, v long")
    g = {
        r["k"]: r["tile"]
        for r in exact_ntile(small, 4, ["v", "k"], "tile").collect()
    }
    assert g == {2: 1, 1: 2}


def test_global_running_sum_schema_stable_on_empty_double(spark):
    """Empty and non-empty frames must agree on the out_col dtype (the
    SUM type of the value column) — a caller unioning per-batch results
    hit a long-vs-double mismatch exactly on the empty batch
    (round-7 review)."""
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.operators.layout import (
        global_running_sum,
    )

    full = global_running_sum(
        spark.createDataFrame([(1, 1.5), (2, 2.5)], "k long, v double"),
        [F.col("k")], "v", out_col="cum",
    )
    empty = global_running_sum(
        spark.createDataFrame([], "k long, v double"),
        [F.col("k")], "v", out_col="cum",
    )
    assert full.schema["cum"].dataType == empty.schema["cum"].dataType
    got = {r["k"]: r["cum"] for r in full.collect()}
    assert got == {1: 1.5, 2: 4.0}
    # unioning the two shapes must not raise
    full.unionByName(empty).collect()
