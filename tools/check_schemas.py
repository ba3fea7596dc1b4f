#!/usr/bin/env python3
"""Schema-contract guard for the driver-owned testdata.

The driver can regenerate /root/testdata between rounds with changed
PHYSICAL types (r9: events.ts flipped TIMESTAMP(NANOS) -> TIMESTAMP_MICROS
and silently broke the 15-query events family until the reader was made
schema-adaptive). This check turns the next such drift into a named
one-line diff at round start instead of a family-wide silent break.

Usage:
  python3 tools/check_schemas.py           # diff against the contract
  python3 tools/check_schemas.py --update  # rewrite the contract to match

Exit 0 = all tables match the committed contract (tools/schemas.json);
exit 1 = any drift, with a per-field diff printed.
"""
import glob
import json
import os
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONTRACT = os.path.join(REPO, "tools", "schemas.json")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def current():
    out = {}
    for sf in SFS:
        tables = {}
        for f in sorted(glob.glob(f"{TESTDATA}/{sf}/*.parquet")):
            s = pq.read_schema(f)
            tables[os.path.basename(f)] = {
                n: str(t) for n, t in zip(s.names, s.types)
            }
        out[sf] = tables
    return out


def main():
    cur = current()
    if "--update" in sys.argv:
        with open(CONTRACT, "w") as fh:
            json.dump(cur, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"contract rewritten: {CONTRACT}")
        return 0
    if not os.path.exists(CONTRACT):
        print(f"FAIL: no contract at {CONTRACT} (run with --update once)")
        return 1
    want = json.load(open(CONTRACT))
    drift = 0
    for sf in sorted(set(want) | set(cur)):
        wt, ct = want.get(sf, {}), cur.get(sf, {})
        for tbl in sorted(set(wt) | set(ct)):
            if tbl not in ct:
                print(f"DRIFT {sf}/{tbl}: table missing on disk")
                drift += 1
                continue
            if tbl not in wt:
                print(f"DRIFT {sf}/{tbl}: new table not in contract")
                drift += 1
                continue
            wf, cf = wt[tbl], ct[tbl]
            for fld in sorted(set(wf) | set(cf)):
                if wf.get(fld) != cf.get(fld):
                    print(
                        f"DRIFT {sf}/{tbl}.{fld}: "
                        f"contract={wf.get(fld)} disk={cf.get(fld)}"
                    )
                    drift += 1
    if drift:
        print(f"RESULT: {drift} drift(s) — update readers, then --update")
        return 1
    print("RESULT: schemas match contract")
    return 0


if __name__ == "__main__":
    sys.exit(main())
