#!/usr/bin/env python3
"""Determinism audit: compare two graft.Verify dumps query by query.

Usage: determinism_check.py <outDirA> <outDirB>

Every query is totally ordered by contract, so two runs must produce
byte-identical frames (schema, row order, values). Exit 1 on any drift.
"""
import glob
import os
import sys

import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]

def load(d, name):
    files = sorted(glob.glob(os.path.join(d, name, "*.parquet")))
    if not files:
        return pd.DataFrame()
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

names_a = {n for n in os.listdir(a_dir)
           if os.path.isdir(os.path.join(a_dir, n))}
names_b = {n for n in os.listdir(b_dir)
           if os.path.isdir(os.path.join(b_dir, n))}
if names_a != names_b:
    print(f"query sets differ: only-in-A={sorted(names_a - names_b)} "
          f"only-in-B={sorted(names_b - names_a)}")
    sys.exit(1)

drift = []
for name in sorted(names_a):
    da, db = load(a_dir, name), load(b_dir, name)
    same = (list(da.columns) == list(db.columns) and len(da) == len(db)
            and da.equals(db))
    if not same:
        # NaN-tolerant fallback: equals() is NaN-aware, but dtype quirks
        # (e.g. object vs float columns) can spuriously differ — compare
        # the string rendering before declaring drift
        same = da.astype(str).equals(db.astype(str)) and \
            list(da.columns) == list(db.columns)
    if not same:
        drift.append(name)
        print(f"  DRIFT {name}: rows {len(da)} vs {len(db)}")

print(f"=== determinism: {len(names_a) - len(drift)}/{len(names_a)} identical ===")
sys.exit(1 if drift else 0)
