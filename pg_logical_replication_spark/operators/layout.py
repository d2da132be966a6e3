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
