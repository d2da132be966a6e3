"""Declarative pgoutput encoder (sources/pgoutput_encode_sql.py):
byte-for-byte agreement with the Python codec, decoded back by the real
decoder, multi-byte utf-8 safety."""

from pyspark.sql import functions as F

from pg_logical_replication_spark.sources import pgoutput_encode_sql as E
from pg_logical_replication_spark.sources import pgoutput_format as pf


def test_bytes_agree_with_python_codec(spark):
    df = spark.range(1).select(
        F.lit(7).alias("id"), F.lit("héllo✓").alias("v"),  # multi-byte utf-8
        F.lit(None).cast("string").alias("nul"),
    )
    row = df.select(
        E.encode_begin(F.lit(0x1000), 0, F.lit(800)).alias("b"),
        E.encode_relation(
            16384, "public", "t",
            [("id", 23), ("v", 25), ("nul", 25)], key_columns=["id"],
        ).alias("r"),
        E.encode_insert(
            16384, E.tuple_data(F.col("id"), F.col("v"), F.col("nul"))
        ).alias("i"),
        E.encode_update(
            16384,
            E.tuple_data(F.col("id"), F.col("v"), F.col("nul")),
            old_key=E.tuple_data(F.col("id")),
        ).alias("u"),
        E.encode_delete(16384, E.tuple_data(F.col("id"))).alias("d"),
        E.encode_commit(F.lit(0x1000), F.lit(0x1008), 0).alias("c"),
    ).first()

    assert bytes(row["b"]) == pf.encode_begin("0/1000", 0, 800)
    assert bytes(row["r"]) == pf.encode_relation(
        16384, "public", "t", [("id", 23), ("v", 25), ("nul", 25)],
        key_columns=["id"],
    )
    py_cols = [("t", "7"), ("t", "héllo✓"), ("n", None)]
    assert bytes(row["i"]) == pf.encode_insert(16384, py_cols)
    assert bytes(row["u"]) == pf.encode_update(
        16384, py_cols, old=[("t", "7")], old_kind="K"
    )
    assert bytes(row["d"]) == pf.encode_delete(16384, [("t", "7")])
    assert bytes(row["c"]) == pf.encode_commit("0/1000", "0/1008", 0)


def test_pre2000_timestamp_and_decode_roundtrip(spark):
    """Signed timestamp path + full decode of a JVM-encoded stream."""
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    ev = spark.range(5).select(F.col("id").cast("long").alias("n"))
    lsn = F.col("n") * 8 + 16
    msgs = ev.select(
        F.posexplode(
            F.array(
                E.encode_begin(lsn, 0, F.col("n") + 100),
                E.encode_insert(
                    16384, E.tuple_data(F.col("n"), F.concat(F.lit("v"), F.col("n")))
                ),
                E.encode_commit(lsn, lsn + 8, 0),
            )
        ).alias("k", "data"),
        lsn.alias("_lsn"),
    ).select(
        F.lit(None).cast("string").alias("lsn"),
        (F.col("_lsn") * 4 + F.col("k")).alias("seq"),
        F.col("data"),
    )
    rel = {}
    pf.parse_message(
        pf.encode_relation(16384, "public", "t", [("n", 20), ("v", 25)],
                           key_columns=["n"]),
        rel,
    )
    decoded = decode_pgoutput(msgs, relations=rel)
    ins = decoded.filter("op = 'insert'").orderBy("seq").collect()
    assert [r["after"]["n"] for r in ins] == [str(i) for i in range(5)]
    assert [r["after"]["v"] for r in ins] == [f"v{i}" for i in range(5)]
    begin = decoded.filter("op = 'begin'").first()
    # pre-2000: signed i64 on the wire — ts_us 0 is the unix epoch
    assert str(begin["commit_ts"]).startswith("1970-01-01")


def test_random_values_agree_with_python_codec(spark):
    """200 seeded-random strings (unicode, quotes, empties, NULLs)
    through the JVM insert encoder must be byte-identical to the Python
    codec — one batched job, not per-example round trips."""
    import random

    rng = random.Random(42)
    alphabet = "abc XYZ 0123456789 èéñ✓🎈 '\"\\,;\t"
    vals = [
        None if rng.random() < 0.1 else
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v string"
    )
    rows = df.select(
        "i",
        E.encode_insert(99, E.tuple_data(F.col("i"), F.col("v"))).alias("m"),
    ).collect()
    got = {r["i"]: bytes(r["m"]) for r in rows}
    for i, v in enumerate(vals):
        want = pf.encode_insert(
            99, [("t", str(i)), ("n", None) if v is None else ("t", v)]
        )
        assert got[i] == want, (i, v)


def test_int_helpers_mask_before_hex(spark):
    """u8/u16/u32 must mask BEFORE hex: Spark lpad truncates from the
    LEFT, so a negative long's 16-char two's-complement hex would keep
    the wrong (high-order) digits."""
    from pyspark.sql import functions as F

    row = spark.range(1).select(
        E.u32(F.lit(-2)).alias("a"),      # 0xFFFFFFFE, not 0xFFFFFFFF
        E.u16(F.lit(-1)).alias("b"),
        E.u8(F.lit(300)).alias("c"),      # wraps to 0x2C
        E.u32(F.lit(0xFFFFFFFF)).alias("d"),
    ).first()
    assert bytes(row["a"]) == b"\xff\xff\xff\xfe"
    assert bytes(row["b"]) == b"\xff\xff"
    assert bytes(row["c"]) == b"\x2c"
    assert bytes(row["d"]) == b"\xff\xff\xff\xff"
