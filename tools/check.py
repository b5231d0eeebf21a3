#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json against DuckDB (with
the sf tables registered as views) and compares to the Spark parquet dump
in <outdir>/<name>/. Mimics the driver: sort columns by name, then
compare row-by-row values exactly.

Usage: python3 tools/check.py <sfdir> <outdir>
"""
import glob
import json
import math
import os
import sys
import time

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sfdir, outdir):
    con = duckdb.connect()
    # Bound the oracle's memory and give it a spill path: at the sf1
    # sweep scale an un-spillable operator otherwise grows until the
    # kernel OOM-kills the WHOLE sweep (observed: 130 GB RSS, SIGKILL
    # mid-run) — with a limit the offending query raises, is recorded
    # as its own FAIL, and the remaining 200+ queries still run.
    con.sql(f"SET memory_limit='{os.environ.get('GRAFT_CHECK_MEM', '80GB')}'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    # cap the spill too: an unbounded spill FILLS THE DISK before the
    # memory limit ever trips (observed r11: the old q_triangles oracle
    # wrote 78 GB of temp and took / to 100% — which breaks every other
    # process on the box, not just the sweep). With a cap the offending
    # query raises its own error and the sweep continues.
    con.sql(f"SET max_temp_directory_size="
            f"'{os.environ.get('GRAFT_CHECK_SPILL', '40GB')}'")
    for t in TABLES:
        # driver snapshots are flat files; Spark-written replicas
        # (ScaleUp output, e.g. /tmp/sf1) are part-file directories
        path = f"{sfdir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # GRAFT_CHECK_ONLY / GRAFT_CHECK_SKIP: comma lists to restrict or
    # resume a long sweep (the sf0.1 full-gate run crunches recursive /
    # brute-force oracles for tens of minutes; a crash or timeout should
    # not force re-running the queries that already passed)
    only = {q.strip() for q in os.environ.get("GRAFT_CHECK_ONLY", "").split(",") if q.strip()}
    skip = {q.strip() for q in os.environ.get("GRAFT_CHECK_SKIP", "").split(",") if q.strip()}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    if skip:
        oracle = {k: v for k, v in oracle.items() if k not in skip}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        import pyarrow as pa
        got = pa.concat_tables([pq.read_table(f) for f in sorted(files)],
                               promote_options="permissive")
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        if want.num_rows != got.num_rows:
            print(f"FAIL {name}: rows differ: oracle={want.num_rows} spark={got.num_rows}")
            n_fail += 1
            continue
        wt = {c: str(want.schema.field(c).type) for c in wcols}
        gt = {c: str(got.schema.field(c).type) for c in gcols}
        tdiff = {c: (wt[c], gt[c]) for c in wcols if wt[c] != gt[c]}
        if tdiff:
            print(f"WARN {name}: type diff {tdiff}")
        bad = None
        for c in wcols:
            wv = [norm(x) for x in want.column(c).to_pylist()]
            gv = [norm(x) for x in got.column(c).to_pylist()]
            for i, (a, b) in enumerate(zip(wv, gv)):
                # list-typed cells: pd.isna is elementwise — compare as lists
                if isinstance(a, list) or isinstance(b, list):
                    if [str(norm(x)) for x in (a or [])] != [str(norm(x)) for x in (b or [])]:
                        bad = (c, i, a, b)
                        break
                    continue
                na, nb = pd.isna(a), pd.isna(b)
                if na and nb:
                    continue
                if na != nb or str(a) != str(b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows, oracle {time.time() - t0:.1f}s)", flush=True)
            n_pass += 1
    # rows-only queries (in outdir but not in oracle)
    for d in sorted(glob.glob(f"{outdir}/q_*")):
        name = d.split("/")[-1]
        if only and name not in only:
            continue
        if name in skip:
            continue
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {n} rows)")
            if n > 0:
                n_pass += 1
            else:
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
