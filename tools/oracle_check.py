#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads every <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet
tables, then compares: sort columns by name, sort rows, compare values
(exact for ints/strings/timestamps, tiny-epsilon report for floats).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Decimal columns arrive as objects; normalize to float-safe strings for
    # sorting, but keep values for compare.
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True,
                        key=lambda s: s.map(lambda v: str(v)))
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # driver may hash exactly; flag any difference
    return str(a) == str(b)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        got = pd.read_parquet(d)
        if name not in oracle:
            print(f"SKIP  {name}: rows={len(got)} (no oracle, rows-only check)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        bad = []
        for col in g.columns:
            for i, (a, b) in enumerate(zip(g[col], e[col])):
                if not values_equal(a, b):
                    bad.append((col, i, a, b))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL  {name}: value mismatches {bad}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(g)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
