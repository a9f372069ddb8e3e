#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [summary.json]

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
with views over <sfDir>/*.parquet, load the Spark parquet result, sort
columns by name, and compare row count / schema / value hash.

Queries are independent, so they run across a process pool (ORACLE_PAR
workers, default min(8, cpus)) — the heavy recursive-CTE oracles (store
capstones, ER value-link) dominate the serial runtime and parallelize
cleanly; each worker holds its own DuckDB connection over the same
read-only parquet views. ORACLE_PAR=1 restores the serial path.
"""
import json, sys, glob, os

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def _connect():
    import duckdb, tempfile
    con = duckdb.connect()
    # Per-WORKER spill dir + bounded memory/threads: in-memory DuckDB
    # spills to ./.tmp by default, which concurrent workers share — one
    # worker's cleanup removed another's temp file mid-query at sf0.1
    # (IOException -> BrokenProcessPool). Memory and thread caps keep
    # 8 workers from oversubscribing the host when a heavy oracle
    # builds a large hash table.
    con.execute(f"SET temp_directory='{tempfile.mkdtemp(prefix='duck_oracle_')}'")
    con.execute("SET memory_limit='10GB'")
    con.execute("SET threads=4")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con

def canon(df):
    return df.reindex(sorted(df.columns), axis=1)

def cell(v):
    import pandas as pd
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def frame_repr(df):
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]

_worker_con = None

def check_one(name):
    import pandas as pd
    global _worker_con
    if _worker_con is None:
        _worker_con = _connect()
    sql = oracle[name]
    spark_path = os.path.join(out_dir, name)
    entry = {}
    try:
        ddf = canon(_worker_con.execute(sql).df())
        sdf_files = glob.glob(os.path.join(spark_path, "*.parquet"))
        sdf = canon(pd.concat([pd.read_parquet(f) for f in sdf_files]) if sdf_files else pd.DataFrame())
        entry["rows"] = (len(ddf), len(sdf), len(ddf) == len(sdf))
        entry["schema"] = (list(ddf.columns), list(sdf.columns), list(ddf.columns) == list(sdf.columns))
        if entry["rows"][2] and entry["schema"][2]:
            a, b = frame_repr(ddf), frame_repr(sdf)
            match = a == b
            entry["hash"] = match
            if not match:
                diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                entry["first_diffs"] = diffs
        else:
            entry["hash"] = False
    except Exception as e:
        entry["error"] = f"{type(e).__name__}: {e}"[:500]
        entry["hash"] = False
    return name, entry

def main():
    names = sorted(oracle)
    par = int(os.environ.get("ORACLE_PAR", str(min(8, os.cpu_count() or 1))))
    if par > 1 and len(names) > 1:
        from concurrent.futures import ProcessPoolExecutor
        # chunksize=1: the runtime distribution is extremely skewed (a
        # handful of recursive-CTE oracles dominate), so static chunking
        # strands the heavy tail on one worker
        with ProcessPoolExecutor(max_workers=par) as pool:
            results = dict(pool.map(check_one, names, chunksize=1))
    else:
        results = dict(check_one(n) for n in names)

    n_ok = sum(1 for e in results.values() if e.get("hash"))
    print(f"=== {n_ok}/{len(results)} MATCH ===")

    # Optional 3rd arg: write a machine-readable per-query summary (the
    # round-close evidence artifact — VERDICT r8 flagged an empty
    # CORRECTNESS record as a round regression; the writer REFUSES an
    # empty result set so that failure mode is loud, never silent).
    if len(sys.argv) > 3:
        summary = {name: {"rows": e.get("rows", (0, 0, False))[1],
                          "match": bool(e.get("hash"))}
                   for name, e in results.items()}
        if not summary:
            print("REFUSING to write an empty correctness summary", file=sys.stderr)
            sys.exit(2)
        with open(sys.argv[3], "w") as f:
            json.dump({"n_match": n_ok, "n_total": len(results),
                       "queries": summary}, f, indent=0, sort_keys=True)
        print(f"wrote {sys.argv[3]} ({n_ok}/{len(results)})")
    for name in names:
        e = results[name]
        if e.get("hash"):
            print(f"  OK   {name}  rows={e['rows'][0]}")
    for name in names:
        e = results[name]
        if not e.get("hash"):
            print(f"  FAIL {name}")
            if "error" in e:
                print(f"       error: {e['error']}")
            else:
                if not e["rows"][2]:
                    print(f"       rows: duck={e['rows'][0]} spark={e['rows'][1]}")
                if not e["schema"][2]:
                    print(f"       cols: duck={e['schema'][0]} spark={e['schema'][1]}")
                for d in e.get("first_diffs", []):
                    print(f"       row {d[0]}: duck={d[1]} spark={d[2]}")

if __name__ == "__main__":
    main()
