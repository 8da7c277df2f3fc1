#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate — STRICT by default.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet result dumped by graft.Verify, runs the
corresponding oracle SQL (oracle_sql.json) in DuckDB over the sf_dir
parquet tables, and compares: schema (column names sorted), arrow
column TYPES (strict — the driver's hasher is type-sensitive, so a
DuckDB HUGEINT vs Spark int64 divergence must fail here too, not just
in the driver; see VERDICT r3 on q36), row count, and values.

Strictness contract (r5 VERDICT item 2 — this mirror must PREDICT the
driver, not flatter it):
  * doubles FAIL when they disagree at 12 significant digits (a real
    value error under any plausible driver tolerance) and WARN when
    they agree at 12 but not bit-exactly (the "ulp zone"). Bit-exact
    default was tried and over-predicts: r6 measurement showed eight
    driver-GREEN rows (q26/q31/q60/q83/q114/q127/q132/q141) agreeing
    with the LOCAL DuckDB only at 12–15 digits, while driver-RED q126
    agreed at ~12 as well — so the driver's verdict cannot be any
    fixed digit tolerance against locally-computed oracle values; its
    own DuckDB build/threading lands on different last ulps. The ulp
    zone is where the driver's verdict is build-dependent: new rows
    must avoid it via exact restatements (integer moments, cents —
    see ORACLE_NOTES.md), and the WARN is the tripwire;
  * any list- or struct-typed output column is a hard FAIL regardless
    of values (the driver's pandas sort_values crashes on ndarray
    cells — q122/q124/q125/q145/q148 in r5 — so such a schema can
    never go green at the gate);
  * decimal columns that are the result of SUM aggregation are known
    driver-red (r5 classes: q96b bit-identical yet rejected). This
    mirror cannot see the driver's hasher, so decimals get a WARN
    line (not a failure) to keep q91/q140-style coverage possible
    while flagging new decimal outputs for review.
"""
import json
import math
import struct
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_type(t):
    """Canonical arrow type string. Collapses only representation details
    that carry no value-level information (string/large_string, dictionary
    encoding, timestamp storage unit, list offset width); keeps every
    width/precision distinction that the driver's type-sensitive hasher
    would see (int64 vs decimal128, int32 vs int64, float32 vs float64)."""
    import pyarrow as pa
    if pa.types.is_dictionary(t):
        return canon_type(t.value_type)
    # Integer widths are value-identical through the driver's hasher
    # (arrow → python int regardless of width; r3 gate was green on six
    # queries with spark int32 vs duck int64). decimal128 is NOT an
    # integer here: arrow yields Decimal objects, which is exactly the
    # q36 divergence this check exists to catch.
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return f"timestamp[tz={t.tz}]"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(f"{f.name}: {canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def unsortable_cols(schema):
    """Columns whose arrow type the driver's pandas sorter cannot take
    (list/struct cells become numpy.ndarray/dict → unhashable in
    sort_values). Presence of any such column is an automatic gate red."""
    import pyarrow as pa
    bad = []
    for f in schema:
        t = f.type
        if pa.types.is_dictionary(t):
            t = t.value_type
        if (pa.types.is_list(t) or pa.types.is_large_list(t)
                or pa.types.is_fixed_size_list(t) or pa.types.is_struct(t)
                or pa.types.is_map(t)):
            bad.append(f.name)
    return bad


def decimal_cols(schema):
    import pyarrow as pa
    return [f.name for f in schema if pa.types.is_decimal(f.type)]


def norm_cell(v, g=12):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if g is None:
            return struct.pack("<d", v).hex()  # bit-exact
        return f"{v:.{g}g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x, g) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x, g)) for k, x in v.items()))
    return v


def table_rows(tbl, cols, g=12):
    data = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    rows = [tuple(norm_cell(data[c][i], g) for c in cols) for i in range(n)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = 0
    for name, sql in sorted(oracle.items()):
        res_dir = out_dir / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            failures += 1
            continue
        spark_tbl = pds.dataset(res_dir, format="parquet").to_table()
        bad_shape = unsortable_cols(spark_tbl.schema)
        if bad_shape:
            print(f"FAIL {name}: list/struct output column(s) "
                  f"{bad_shape} — the driver's sorter crashes on these; "
                  f"serialize to string (array_join/to_json)")
            failures += 1
            continue
        dec = decimal_cols(spark_tbl.schema)
        if dec:
            print(f"WARN {name}: decimal column(s) {dec} — driver hasher "
                  f"rejected decimal SUM outputs in r5; prefer BIGINT "
                  f"cents unless this row is the designated decimal "
                  f"coverage (q91/q140)")
        try:
            duck_tbl = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: schema mismatch spark={s_cols} duck={d_cols}")
            failures += 1
            continue
        type_diffs = []
        for c in s_cols:
            st = canon_type(spark_tbl.schema.field(c).type)
            dt = canon_type(duck_tbl.schema.field(c).type)
            if st != dt:
                type_diffs.append(f"{c}: spark={st} duck={dt}")
        if type_diffs:
            print(f"FAIL {name}: arrow type mismatch " + "; ".join(type_diffs))
            failures += 1
            continue
        if spark_tbl.num_rows != duck_tbl.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} "
                  f"duck={duck_tbl.num_rows}")
            failures += 1
            continue
        s_rows = table_rows(spark_tbl, s_cols)
        d_rows = table_rows(duck_tbl, d_cols)
        if s_rows != d_rows:
            bad = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
            print(f"FAIL {name}: {bad}/{len(s_rows)} rows differ")
            for a, b in zip(s_rows, d_rows):
                if a != b:
                    print(f"  spark: {a}\n  duck:  {b}")
                    break
            failures += 1
            continue
        # ulp-zone tripwire: values agree at 12 digits but not bitwise —
        # the driver's verdict here depends on ITS DuckDB build; new
        # rows should restate exactly (ORACLE_NOTES.md) instead. Only
        # float-bearing outputs need the second (bit-exact) pass.
        import pyarrow as pa
        has_float = any(pa.types.is_floating(f.type)
                        for f in spark_tbl.schema)
        s_bits = table_rows(spark_tbl, s_cols, g=None) if has_float else []
        d_bits = table_rows(duck_tbl, d_cols, g=None) if has_float else []
        if s_bits != d_bits:
            bad = sum(1 for a, b in zip(s_bits, d_bits) if a != b)
            print(f"OK   {name} ({spark_tbl.num_rows} rows) "
                  f"[WARN ulp-zone: {bad} rows differ past 12 digits]")
        else:
            print(f"OK   {name} ({spark_tbl.num_rows} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
