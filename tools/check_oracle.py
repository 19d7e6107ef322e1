#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same sf directory, and compare row sets (columns sorted by name,
rows sorted, values stringified) AND the physical value types.

The type check exists because stringified compare once masked a real
driver failure: an oracle column typed HUGEINT hashed differently from
Spark's int64 even though every stringified value matched. Types are
canonicalized only across aliases of the same physical family
(int32/int64 both map to "int"); int-vs-decimal or int-vs-double is a
FAIL here like it is in the driver's typed hash.

Types MUST come from the relation API (`con.sql(q).types`), NOT the
DB-API cursor: DuckDB's `con.description` collapses every numeric type
to the string 'NUMBER' (BIGINT and HUGEINT are indistinguishable
there), which made the round-11 gate dead code and let two HUGEINT
oracles ship. `--selftest` proves the gate is alive.

Usage: check_oracle.py <verify_out_dir> <sf_dir>
       check_oracle.py --selftest
"""
import json
import math
import os
import sys

import duckdb


def canon_type(duck_type):
    """Map DuckDB type names onto the driver-relevant families."""
    t = str(duck_type).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL") or t == "HUGEINT":
        return "decimal"  # hashes differently from int64 driver-side
    if t.startswith("VARCHAR"):
        return "str"
    return t.lower()


def canon(rows, cols, types):
    """Sort columns by name, stringify values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.10g}"
        return str(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort()
    return ([cols[i] for i in order], out,
            [canon_type(types[i]) for i in order])


def sql_with_types(con, query):
    """fetchall + REAL column types via the relation API.

    The DB-API cursor (`con.description`) reports 'NUMBER' for every
    numeric type, so BIGINT vs HUGEINT — the exact driver-side typed-hash
    mismatch this tool exists to catch — is invisible there. The relation
    API (`con.sql(q).types`) reports the true logical types.
    """
    rel = con.sql(query)
    return rel.fetchall(), list(rel.columns), [str(t) for t in rel.types]


def selftest(con):
    """The gate must distinguish HUGEINT from BIGINT — fail loudly if not."""
    _, _, types = sql_with_types(con, "SELECT 1::BIGINT AS a, 1::HUGEINT AS b")
    ct = [canon_type(t) for t in types]
    assert ct == ["int", "decimal"], (
        f"type gate is DEAD: BIGINT/HUGEINT canonicalized to {ct}; "
        "a HUGEINT oracle column would pass silently")
    # integer division on a subquery-sum reproduces the round-11 bug shape
    _, _, t2 = sql_with_types(
        con,
        "WITH w AS (SELECT unnest([1,2,3])::BIGINT AS x) "
        "SELECT x * 1000000 // (SELECT sum(x) FROM w) AS ppm FROM w")
    assert canon_type(t2[0]) == "decimal", (
        f"expected the uncast ppm column to flag as decimal, got {t2[0]}")
    print("selftest ok: HUGEINT is distinguishable from BIGINT and would FAIL")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest(duckdb.connect())
        return
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures = 0
    names = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        res_path = os.path.join(out_dir, name)
        try:
            got, got_cols, got_types = sql_with_types(
                con, f"SELECT * FROM '{res_path}/*.parquet'")
        except Exception as e:
            print(f"FAIL  {name}: cannot read result: {e}")
            failures += 1
            continue
        if name not in oracles:
            status = "rows-only"
            ok = len(got) > 0
            print(f"{'ok   ' if ok else 'FAIL '} {name}: {status}, rows={len(got)}")
            if not ok:
                failures += 1
            continue
        try:
            exp, exp_cols, exp_types = sql_with_types(con, oracles[name])
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        gc, g, gt = canon(got, got_cols, got_types)
        ec, e, et = canon(exp, exp_cols, exp_types)
        if gc != ec:
            print(f"FAIL  {name}: columns differ: spark={gc} duckdb={ec}")
            failures += 1
        elif gt != et:
            print(f"FAIL  {name}: TYPES differ (driver's typed hash would "
                  f"mismatch): spark={list(zip(gc, gt))} duckdb={list(zip(ec, et))}")
            failures += 1
        elif g != e:
            print(f"FAIL  {name}: rows differ: spark={len(g)} duckdb={len(e)}")
            sg, se = set(g), set(e)
            for r in list(sg - se)[:3]:
                print(f"      spark-only: {r}")
            for r in list(se - sg)[:3]:
                print(f"      duck-only : {r}")
            failures += 1
        else:
            print(f"ok    {name}: {len(g)} rows match")
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
