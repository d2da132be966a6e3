"""Oracle parity harness — mimics the driver's correctness gate locally.

For every registered query: run the Spark builder AND the DuckDB oracle
on the same sf0.001 parquet, compare row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows sorted,
floats pre-rounded by the queries themselves)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from pg_logical_replication_spark.plans.registry import QUERIES, TABLES

SF_DIR = "/root/testdata/sf0.001"

# Both scales: sf0.001 is the iteration loop; sf0.01 is the DRIVER's
# correctness scale — empty-group / tie-break divergences can hide at a
# 10x smaller sf (review r2 #4), and the driver only checks a 50-query
# prefix, so the other ~110 queries are pinned at driver scale HERE.
# The sf0.01 replay is marked slow: `-m "not slow"` keeps quick runs.
_SF_PARAMS = [
    "/root/testdata/sf0.001",
    pytest.param("/root/testdata/sf0.01", marks=pytest.mark.slow),
]


@pytest.fixture(scope="module", params=_SF_PARAMS)
def sf_dir(request):
    return request.param


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)


def _type_class(t: str) -> str:
    """Coarse cross-engine type class (pandas-conversion equivalence)."""
    t = t.lower()
    if "hugeint" in t:
        return "int128"  # pandas converts to float64/object — never OK
    for cls, keys in (
        ("int", ("tinyint", "smallint", "bigint", "int")),
        ("float", ("double", "float", "real")),
        ("decimal", ("decimal", "numeric")),
        ("bool", ("bool",)),
        ("timestamp", ("timestamp",)),
        ("date", ("date",)),
        ("array", ("array", "[]", "list")),
        ("map", ("map",)),
        ("string", ("string", "varchar", "char", "text")),
    ):
        if any(k in t for k in keys):
            return cls
    return t


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(_norm(row[i]) for i in order) for row in data],
        key=lambda r: tuple((x is None, str(x)) for x in r),
    )


ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.builder(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(spec.oracle)
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    # The driver's value-hash is dtype-sensitive: DuckDB HUGEINT (int128,
    # the default SUM(integer) result) converts to float64/object in
    # pandas while Spark yields int64 — identical values, different hash
    # (bit us on q12 round 1). Compare coarse type classes per column so
    # ANY int/float/decimal/string divergence fails here, not at the
    # driver; HUGEINT maps to its own class nothing on the Spark side
    # matches, forcing oracles to CAST sums to BIGINT.
    sclass = {c: _type_class(t) for c, t in sdf.dtypes}
    dclass = {c: _type_class(str(t)) for c, t in zip(dcols, rel.types)}
    diff = {c: (sclass[c], dclass[c]) for c in sclass if sclass[c] != dclass[c]}
    assert not diff, f"{name}: column type classes differ spark vs oracle: {diff}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    left, right = _rows(scols, srows), _rows(dcols, drows)
    mismatches = [i for i, (a, b) in enumerate(zip(left, right)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"{left[mismatches[0]]} vs {right[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name].builder(spark, SF_DIR)
    assert df.count() >= 0


def test_entry_contract(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
