"""Registry-wide oracle ↔ Spark output-type parity sweep.

The driver's correctness hash is computed over Arrow-serialized
values, so a DuckDB oracle that returns ``DECIMAL(38,x)``/``HUGEINT``
(DuckDB's ``SUM(integer)``) against a Spark ``BIGINT`` hash-mismatches
even when every value is numerically identical (round 9: six entries
red for exactly this).  The local compare in ``tests/oracle_utils.py``
normalizes through ``str()`` and cannot see it.

This tool closes the gap structurally: for every oracled entry it
fetches the DuckDB result's **Arrow schema** and compares it, column
by column, against the canonical Arrow type of the Spark DataFrame's
schema.  Integer width drift (int32 vs int64) is ALSO flagged — the
current driver tolerates it, but a stricter hash would not, and the
fix (a cast in the oracle SQL) is one line.

Run standalone:  python tools/oracle_type_parity.py  [sf_dir]
Used by:         tests/test_oracle_types.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spark_to_arrow(dt) -> str:
    """Canonical tag for a Spark type's Arrow serialization."""
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType) or isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_to_arrow(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_to_arrow(dt.keyType)},{spark_to_arrow(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{spark_to_arrow(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return f"?{dt.simpleString()}"


def arrow_tag(t: pa.DataType) -> str:
    """Canonical tag for an Arrow type as DuckDB emits it."""
    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_uint64(t) or pa.types.is_uint32(t):
        return f"u{t}"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_tag(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{arrow_tag(t.key_type)},{arrow_tag(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{arrow_tag(f.type)}" for f in t)
        return f"struct<{inner}>"
    return f"?{t}"


def column_diffs(s_map: dict[str, str], o_map: dict[str, str]) -> list[str]:
    """Column-level divergences between a Spark output-type map and an
    oracle (DuckDB Arrow) output-type map, both as canonical tags."""
    diffs = []
    for col in sorted(set(o_map) | set(s_map)):
        ot, st = o_map.get(col), s_map.get(col)
        if ot != st:
            diffs.append(f"{col}: spark={st} oracle={ot}")
        # DECIMAL outputs are banned OUTRIGHT, matched or not:
        # round 10 proved the driver's value-hash rejects
        # decimal128 columns even when both Arrow schemas are
        # bit-identical (pricing_rollup: values equal, schemas
        # decimal128(28,2) on BOTH sides, hash still red — while
        # every sibling went green the moment it moved to
        # BIGINT/DOUBLE).  Arrow-type equality is necessary but
        # not sufficient; surface money/quantity sums as DOUBLE
        # or BIGINT cents instead.
        for side, tag in (("spark", st), ("oracle", ot)):
            if tag and tag.startswith("decimal"):
                diffs.append(
                    f"{col}: {side} emits {tag} — decimal128 "
                    f"output columns are banned (driver hash "
                    f"rejects them even on exact schema match)")
    return diffs


def sweep(spark, sf_dir: str, names=None) -> dict[str, list[str]]:
    """Return {entry: [column-level divergences]} — empty dict = clean."""
    import __spark_entry__ as entrymod
    from tests.oracle_utils import duck_con

    queries = entrymod.all_queries()
    oracles = entrymod.all_oracle_sql()
    con = duck_con(sf_dir)
    out: dict[str, list[str]] = {}
    try:
        for name in sorted(oracles):
            if names and name not in names:
                continue
            try:
                o_schema = con.execute(oracles[name]).fetch_arrow_table().schema
            except Exception as exc:  # surface, don't hide
                out[name] = [f"oracle failed: {exc}"]
                continue
            s_schema = queries[name](spark, sf_dir).schema
            o_map = {f.name: arrow_tag(f.type) for f in o_schema}
            s_map = {f.name: spark_to_arrow(f.dataType) for f in s_schema.fields}
            diffs = column_diffs(s_map, o_map)
            if diffs:
                out[name] = diffs
    finally:
        con.close()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from fxa_activity_metrics_spark.session import get_spark

    spark = get_spark()
    bad = sweep(spark, sf_dir)
    for name, diffs in sorted(bad.items()):
        print(f"{name}:")
        for d in diffs:
            print(f"  {d}")
    print(f"\n{len(bad)} entries with type divergence")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
