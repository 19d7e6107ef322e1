#!/usr/bin/env python3
"""Oracle pre-flight: extract named oracle SQL blocks straight out of
SparkEntry.scala and execute them in DuckDB over an sf directory,
printing row counts and REAL column types (relation API — the DB-API
cursor lies about numerics, see check_oracle.py).

This is the seconds-fast first gate that caught two round-12 bugs
before any Spark run: a HUGEINT leak from an uncast sum, and a
recursive-CTE binder issue. Run it on every NEW oracle before the
scoped Verify.

Usage: dryrun_oracle.py <sf_dir> <query_name> [query_name ...]
       dryrun_oracle.py <sf_dir> --all        # every oracle in the file

Exit 1 if any named oracle fails to parse/execute or types a column
HUGEINT/DECIMAL (the driver's typed hash would mismatch int64).
"""
import os
import re
import sys

import duckdb

ENTRY = os.path.join(os.path.dirname(__file__), os.pardir,
                     "src", "main", "scala", "graft", "SparkEntry.scala")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def extract_oracles(src):
    """name -> SQL for every `"name" -> [s]\"\"\"...\"\"\".stripMargin` block."""
    out = {}
    # oracle entries start with the name on its own line followed by a
    # triple-quoted stripMargin block (query lambdas have `((s, dir)` on
    # the same line and never match)
    for m in re.finditer(
            r'"([a-z0-9_]+)" ->\s*\n\s*(s?)"""(.*?)""".stripMargin',
            src, re.DOTALL):
        name, interp, body = m.group(1), m.group(2) == "s", m.group(3)
        sql = "\n".join(l.split("|", 1)[1] if "|" in l else l
                        for l in body.splitlines())
        if interp:
            # s-string: $$ is a literal $; any OTHER $ is real scala
            # interpolation ($OracleM, ${...}) — skip those, they need
            # the Verify-dumped oracle_sql.json instead
            if re.search(r"\$(?!\$)", sql):
                continue
            sql = sql.replace("$$", "$")
        # plain """ string: every $ is literal (regex anchors etc.)
        # oracles assembled by scala string CONCATENATION extract as
        # fragments — accept only blocks that start like a statement
        if not re.match(r"\s*(WITH|SELECT)\b", sql, re.IGNORECASE):
            continue
        out[name] = sql
    return out


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = extract_oracles(open(ENTRY).read())
    if names == ["--all"]:
        names = sorted(oracles)
    failures = 0
    for name in names:
        if name not in oracles:
            print(f"SKIP  {name}: not directly extractable (interpolated "
                  f"oracle — dump via graft.Verify and use check_oracle.py)")
            continue
        try:
            rel = con.sql(oracles[name])
            rows = rel.fetchall()
            types = [str(t).upper() for t in rel.types]
            bad = [(c, t) for c, t in zip(rel.columns, types)
                   if t == "HUGEINT" or t.startswith("DECIMAL")]
            if bad:
                print(f"FAIL  {name}: driver-hash-breaking types {bad}")
                failures += 1
            else:
                print(f"ok    {name}: {len(rows)} rows, types ok")
        except Exception as e:
            print(f"FAIL  {name}: {str(e).splitlines()[0][:200]}")
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
