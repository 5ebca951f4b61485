#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate — BIT-EXACT.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads every <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet
tables, then compares: sort columns by name, stringify every value, sort
rows, compare strings EXACTLY (the driver hashes values, so any
representational difference — Decimal vs float, trailing zeros, 0 vs 0.0 —
is a failure here too).
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def kind(s: pd.Series) -> str:
    """Canonical dtype class for the driver's hash compare.

    The driver hashes typed values, so DuckDB's DECIMAL(38,0) (sum(BIGINT)
    promotion) vs Spark's int64 is a hash MISMATCH even when every value is
    identical (q_pagerank r10). String canon can't see it; this can. DATE vs
    midnight-TIMESTAMP stays equivalent (driver rule), and int widths fold.
    """
    import datetime
    import decimal
    dt = s.dtype
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datelike"
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    nn = s.dropna()
    if len(nn) == 0:
        return "empty"
    v = nn.iloc[0]
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, datetime.datetime):
        return "datelike"
    if isinstance(v, datetime.date):
        return "datelike"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, str):
        return "str"
    return type(v).__name__


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Midnight timestamps stringify as dates: one engine may type a day
    # bucket DATE while the other types it TIMESTAMP (q_time_bucket vs
    # q_cohort) — the driver's compare treats the two as equal, so the
    # replica must too. Applied ONLY to datetime-typed columns: a string
    # column legitimately ending in " 00:00:00" must still compare exactly.
    def s_dt(v):
        r = str(v)
        return r[:-9] if r.endswith(" 00:00:00") else r
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            out[c] = df[c].map(s_dt)
        else:
            out[c] = df[c].map(str)
    return out.sort_values(by=list(out.columns), kind="mergesort", ignore_index=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    results = {}
    con = duckdb.connect()
    # An in-memory connection has no temp directory, so big oracle
    # queries (the sf1 closure family) hit a hard OOM instead of
    # spilling; give it a spill path and a bounded budget so one heavy
    # face can't take down the whole batch.
    con.execute("SET temp_directory='/tmp/graft_oracle_spill'")
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written table (ScaleUp sf1): glob the parts
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
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
            results[name] = {"status": "rows_only", "spark_rows": len(got)}
            n_skip += 1
            continue
        try:
            # .arrow() keeps DATE as date32 → datetime.date ("2024-01-01"),
            # matching how pandas reads Spark's parquet dates; .df() would
            # widen DATE to datetime64 ("2024-01-01 00:00:00") and fail the
            # string compare on a purely representational difference (the
            # driver's own compare treats them as equal — q_cohort r8).
            exp = con.execute(oracle[name]).arrow().to_pandas(
                date_as_object=True)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL error: {e}")
            results[name] = {"status": "fail", "err": str(e)[:200]}
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(e.columns)}")
            results[name] = {"status": "fail", "err": "columns"}
            n_fail += 1
            continue
        gk = {c: kind(got[c]) for c in got.columns}
        ek = {c: kind(exp[c]) for c in exp.columns}
        bad_kinds = [(c, gk[c], ek[c]) for c in sorted(got.columns)
                     if gk[c] != ek[c] and "empty" not in (gk[c], ek[c])]
        if bad_kinds:
            print(f"FAIL  {name}: dtype class mismatch (driver hashes typed "
                  f"values): {bad_kinds}")
            results[name] = {"status": "fail", "err": f"dtype {bad_kinds}"}
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} != {len(e)}")
            results[name] = {"status": "fail", "err": f"rows {len(g)} != {len(e)}"}
            n_fail += 1
            continue
        diff = g != e
        if diff.any().any():
            idx = diff.any(axis=1)
            n_bad = int(idx.sum())
            print(f"FAIL  {name}: {n_bad}/{len(g)} rows differ; first:")
            print(pd.concat([g[idx].head(2).add_suffix("_spark"),
                             e[idx].head(2).add_suffix("_duck")], axis=1).to_string())
            results[name] = {"status": "fail", "err": f"{n_bad}/{len(g)} rows differ"}
            n_fail += 1
            continue
        print(f"PASS  {name}: rows={len(g)}")
        results[name] = {"status": "pass", "rows": len(g)}
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} rows-only")
    if json_out:
        Path(json_out).write_text(json.dumps(
            {"sf_dir": sf_dir, "pass": n_pass, "fail": n_fail,
             "rows_only": n_skip, "results": results}, indent=1))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
