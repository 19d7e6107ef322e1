#!/usr/bin/env python3
"""Sweep every oracle SQL for output columns DuckDB types as HUGEINT or
DECIMAL — the widening family that the driver's typed hash distinguishes
from Spark's int64 (the p_mixture_reweight trap, bitten twice).

DuckDB widens sum(BIGINT) -> HUGEINT and keeps it through `//`; any
sum()-derived integer output column must carry an explicit CAST(... AS
BIGINT) or the row hash-fails even with identical values.

Usage: sweep_oracle_types.py <oracle_sql.json> <sf_dir>
Exit 1 if any suspicious column found.
"""
import json
import os
import sys

import duckdb


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(oracle_path) as f:
        oracles = json.load(f)
    bad = 0
    for name in sorted(oracles):
        try:
            rows = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
        except Exception as e:
            print(f"ERROR {name}: describe failed: {e}")
            bad += 1
            continue
        sus = [(c, ty) for c, ty, *_ in rows
               if str(ty).upper() == "HUGEINT"
               or str(ty).upper().startswith("DECIMAL")]
        if sus:
            print(f"SUSPECT {name}: {sus}")
            bad += 1
    print(f"\n{len(oracles)} oracles swept, {bad} suspect")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
