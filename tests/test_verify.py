"""Replica verification: bucketed checksums localize divergence; clean
replicas certify empty."""

from pyspark.sql import functions as F

from pg_logical_replication_spark.operators.verify import (
    bucket_checksums,
    checksum_diff,
)


def _sums(spark, rows):
    df = spark.createDataFrame(rows, "id long, name string, qty long")
    return bucket_checksums(
        df, columns=["id", "name", "qty"], bucket=(F.col("id") % 4).cast("int")
    )


BASE = [(i, f"n{i}", i * 10) for i in range(20)]


def test_identical_replicas_certify_empty_diff(spark):
    assert checksum_diff(_sums(spark, BASE), _sums(spark, list(BASE))).count() == 0


def test_value_drift_localizes_to_one_bucket(spark):
    drifted = [(i, n, q if i != 7 else q + 1) for i, n, q in BASE]
    diff = checksum_diff(_sums(spark, BASE), _sums(spark, drifted)).collect()
    assert [r["bucket"] for r in diff] == [7 % 4]
    (row,) = diff
    # same row count, different content hash — count alone would miss it
    assert row["ours_n"] == row["theirs_n"]
    assert row["ours_checksum"] != row["theirs_checksum"]


def test_missing_row_changes_count_and_checksum(spark):
    short = [r for r in BASE if r[0] != 13]
    diff = checksum_diff(_sums(spark, BASE), _sums(spark, short)).collect()
    assert [r["bucket"] for r in diff] == [13 % 4]
    (row,) = diff
    assert row["ours_n"] == row["theirs_n"] + 1


def test_null_vs_empty_string_not_conflated(spark):
    a = [(1, None, 5)]
    b = [(1, "", 5)]
    assert checksum_diff(_sums(spark, a), _sums(spark, b)).count() == 1


def test_bucket_order_insensitive(spark):
    assert checksum_diff(_sums(spark, BASE), _sums(spark, BASE[::-1])).count() == 0
