"""LSN arithmetic — mirrors the reference's hex-pair formatting
(binary-reader.ts:75-86) and ack carry (logical-replication-service.ts:258-272)."""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from pg_logical_replication_spark.model import ack_lsn, long_to_lsn, lsn_to_long


def test_lsn_roundtrip_known():
    assert lsn_to_long("0/16B3D88") == 0x16B3D88
    assert lsn_to_long("00000001/00000000") == 1 << 32
    assert long_to_lsn(0x16B3D88) == "00000000/016B3D88"
    assert long_to_lsn((0xAB << 32) | 0xCD) == "000000AB/000000CD"


def test_ack_carry():
    # lower word 0xFFFFFFFF carries into the upper word — the edge case
    # the reference handles at logical-replication-service.ts:266-272
    assert ack_lsn("00000001/FFFFFFFF") == "00000002/00000000"
    assert ack_lsn("00000000/00000000") == "00000000/00000001"
    assert ack_lsn("0/16B3D88") == "00000000/016B3D89"


@given(st.integers(min_value=0, max_value=(1 << 62) - 1))
def test_lsn_roundtrip_property(v):
    assert lsn_to_long(long_to_lsn(v)) == v


def test_negative_rejected():
    with pytest.raises(ValueError):
        long_to_lsn(-1)


def test_snapshot_diff_ops(spark):
    """Reverse CDC: full-outer diff classifies insert/delete/update and
    skips unchanged keys; null-safe value comparison."""
    from pg_logical_replication_spark.operators.apply_changes import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged → not emitted
         (2, "b", 20.0),          # null → value: update
         (4, "D", 40.0),          # name changed: update
         (5, "e", 50.0)],         # new key: insert
        "id long, name string, v double",
    )
    rows = {(r["op"], r["id"]): r for r in snapshot_diff(old, new, ["id"]).collect()}
    assert set(rows) == {("update", 2), ("delete", 3), ("update", 4), ("insert", 5)}
    assert rows[("update", 2)]["old_v"] is None and rows[("update", 2)]["new_v"] == 20.0
    assert rows[("insert", 5)]["old_name"] is None and rows[("insert", 5)]["new_name"] == "e"
    assert rows[("delete", 3)]["new_name"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        snapshot_diff(old.drop("v"), new, ["id"])


def test_register_tables_sql_surface(spark):
    """register_tables exposes the table set to plain spark.sql — the
    switch-over path for reference consumers who query the replica
    with SQL today."""
    from pg_logical_replication_spark.session import register_tables

    names = register_tables(spark, "/root/testdata/sf0.001", prefix="plrs_")
    assert "plrs_lineitem" in names and len(names) == 10
    row = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_cust
        FROM plrs_customer c JOIN plrs_nation n
          ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name ORDER BY n_cust DESC, n.n_name LIMIT 1
        """
    ).collect()[0]
    assert row["n_cust"] > 0


def test_pg_type_array_suffix_beats_numeric_prefix():
    """'numeric[]' maps to string (text literal), not decimal — the
    decimal cast NULLed every array literal (review r2)."""
    from pg_logical_replication_spark.model import pg_type_to_spark

    assert pg_type_to_spark("numeric[]") == "string"
    assert pg_type_to_spark("character varying(10)[]") == "string"
    assert pg_type_to_spark("numeric(10,2)") == "decimal(38,18)"


def test_lsn_str_expr_propagates_null(spark):
    """A NULL lsn_long yields NULL, not concat_ws's '' (review r2)."""
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.model import lsn_str_expr

    rows = (
        spark.createDataFrame([(None,), (16,)], "lsn_long long")
        .select(lsn_str_expr("lsn_long").alias("lsn"))
        .collect()
    )
    assert [r["lsn"] for r in rows] == [None, "00000000/00000010"]
