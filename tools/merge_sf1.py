#!/usr/bin/env python3
"""Merge a delta Verify run (new faces) into an sf1 CORRECTNESS artifact.

Usage: python3 tools/merge_sf1.py <verifyOutDir> <face> [face...]
The artifact defaults to CORRECTNESS_sf1_r13.json; set GRAFT_SF1_ART to
merge into a different round's file.
Runs oracle_check's compare for the named faces against the sf1 dir the
artifact records, then updates pass counts + per-face results in place.
"""
import json
import subprocess
import sys

import os
ART = os.environ.get("GRAFT_SF1_ART", "CORRECTNESS_sf1_r13.json")

def main():
    out_dir = sys.argv[1]
    faces = sys.argv[2:]
    art = json.load(open(ART))
    sf_dir = art["sf_dir"]
    # reuse the bit-exact gate itself
    r = subprocess.run(
        ["python3", "tools/oracle_check.py", sf_dir, out_dir],
        capture_output=True, text=True)
    print(r.stdout[-2000:])
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    results = {}
    for l in lines:
        parts = l.split()
        if parts and parts[0] in ("PASS", "FAIL", "ROWS-ONLY", "SKIP") \
                and len(parts) >= 2:
            name = parts[1].rstrip(":")
            rows = 0
            for p in parts:
                if p.startswith("rows="):
                    rows = int(p.split("=")[1])
            status = {"PASS": "pass", "FAIL": "fail",
                      "ROWS-ONLY": "rows_only", "SKIP": "rows_only"}[parts[0]]
            entry = {"status": status}
            if status == "rows_only":
                entry["spark_rows"] = rows
            else:
                entry["rows"] = rows
            results[name] = entry
    missing = [f for f in faces if f not in results]
    if missing:
        print("MISSING from oracle_check output:", missing)
        sys.exit(1)
    for f in faces:
        art["results"][f] = results[f]
    art["pass"] = sum(1 for v in art["results"].values()
                      if v["status"] == "pass")
    art["fail"] = sum(1 for v in art["results"].values()
                      if v["status"] == "fail")
    art["rows_only"] = sum(1 for v in art["results"].values()
                           if v["status"] == "rows_only")
    json.dump(art, open(ART, "w"), indent=1)
    print(f"merged {len(faces)} faces -> pass={art['pass']} "
          f"fail={art['fail']} total={len(art['results'])}")

if __name__ == "__main__":
    main()
