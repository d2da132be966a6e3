"""Scalar function layer: PG text-format parsers + the OID type registry
(≙ the reference's ``types.getTypeParser(typeOid)`` surface,
``pgoutput-parser.ts:144``). All parsers are JVM-side Column
expressions — no UDFs in the typed-projection hot path."""

from pg_logical_replication_spark.functions.pg_values import (  # noqa: F401
    OID_TO_PG_TYPE,
    oid_to_spark,
    pg_array,
    pg_bool,
    pg_bytea,
    pg_numeric,
    pg_timestamp,
    pg_value,
)
