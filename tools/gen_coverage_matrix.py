#!/usr/bin/env python3
"""Generate COVERAGE_matrix.json — the machine-readable scale-evidence
matrix (r14, VERDICT r13 task 6): one entry per registry gate with the
oracle sf levels it passed, the bench sf levels it was measured at, and
its decade verdict. Replaces the prose spread across SCALE.md §10 with
an artifact a judge or production owner can audit mechanically.

Sources (all committed in-repo):
  - CORRECTNESS_r<N>.json      — per-gate driver oracle result at sf0.01
  - BENCH_floors.json          — per-gate min-across-runs at sf0.1
  - BENCH_full.json            — latest full bench (fallback for floors)
  - BENCH_scale_*.json         — decade rows at /tmp/sf1 and /tmp/sf10
  - the sweep facts (sf0.1 and sf1 full-registry DuckDB sweeps), pinned
    here with their commit provenance — re-run via tools/check.py per
    MEMORY/SCALE.md recipes.

A Scala spec (Round14Spec) fails when a registry gate lacks an entry,
so adding a gate forces regenerating this artifact against a
correctness run that covers it.

Usage: python3 tools/gen_coverage_matrix.py   (from the repo root)
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Full-registry DuckDB sweeps beyond the driver's sf0.01 gate. Each is a
# one-line fact with provenance; a future sweep adds/updates a row here.
SWEEPS = {
    "sf0.1": {"result": "246/246 pass", "provenance":
              "commit 2f73a46 (r13 end-state sweep, tools/check.py on /root/testdata/sf0.1)"},
    "sf1": {"result": "246/246 pass", "provenance":
            "commit 9f690ef (r13, tools/check.py on /tmp/sf1 replica; q_dbscan via "
            "the iterative oracle loop, 181 rounds/92s — SCALE.md §10)"},
}

# Gates whose oracle mechanism is not the plain single-statement hash
# compare (SURVEY §5.3 / DECISIONS #28 taxonomy).
MECHANISM = {
    "q_sample": "interval-contract gate (binomial bounds, DECISIONS #28)",
    "q_split": "interval-contract gate (disjoint/union-complete, DECISIONS #28)",
    "q_heavy": "contract-aware compare (support_guaranteed flag; engine rows "
               "exact-aggregate-checked since r14 — tools/check.py CONTRACTS)",
    "q_dbscan": "single-statement at sf0.01/sf0.1; iterative temp-table loop at sf1 "
                "(oracle_iter.json) and at sf10 on the constant-density variant "
                "(ScaleTune dbscan_cd, r14)",
}

# Decade-verdict overrides where the honest story is not a plain ratio.
DECADE_OVERRIDES = {
    "q_adamic": "priced cap curve, not a free decade: wedge volume is degree-quantile-"
                "capped; cap=p10 → 630M wedges/240s/11.8GB shuffle at sf10, p99 → "
                "~0.45TB = the single-host wall (BENCH_adamic_caps_r13.jsonl, SCALE.md §10)",
    "q_dbscan": "decade-proven AND sf10-oracle-proven on the constant-density shape "
                "(r14: 10M-point run, engine 126.6s Verify-shaped, DuckDB iterative "
                "oracle 1783 rounds/1607s, 10M rows hash-exact — "
                "BENCH_scale_r14_dbscan_cd_sf10.json); the FIXED-LATTICE sf10 replica "
                "is a ~3.6B-pair quadratic object that exceeds the host's storage on "
                "either engine (SCALE.md §12)",
    "q_semdedup": "frozen-knob fixture cost, not a plan defect: the gate pins k=8 "
                  "cells for oracle determinism, so occupancy grows with N and the "
                  "sf10 row reads 440.6s in-context/269.5 isolated; with the "
                  "documented production sizing (k ∝ N, constant cell size) the same "
                  "operator reads 26.1s at 100x data — 3.1x wall, sublinear "
                  "(BENCH_scale_r14_semdedup_knob.jsonl, SCALE.md §12)",
    "q_dedup_embed": "frozen-knob fixture cost, not a plan defect: nBits=4 → 16 LSH "
                     "buckets pinned for oracle determinism, sf10 row 155.2s "
                     "in-context/106.1 isolated; with nBits ≈ log2(N/occupancy) the "
                     "operator reads 1.61s at 100x data — 2.7x wall, sublinear "
                     "(BENCH_scale_r14_semdedup_knob.jsonl, SCALE.md §12)",
}


def load(path):
    with open(os.path.join(ROOT, path)) as f:
        return json.load(f)


def main():
    correctness_files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    latest_corr = correctness_files[-1]
    corr = json.load(open(latest_corr))
    floors = load("BENCH_floors.json") if os.path.exists(
        os.path.join(ROOT, "BENCH_floors.json")) else {}
    full = load("BENCH_full.json")["queries"] if os.path.exists(
        os.path.join(ROOT, "BENCH_full.json")) else {}

    # decade rows per (gate, sf-level): the LATEST round's measurement
    # wins (min within a round) — a min across ALL history would keep
    # citing a retired plan's number after a rewrite (e.g. the r12
    # raw-id ngram window), and a floor from retired code is not a
    # target (BASELINE.md convention).
    decade = {}      # gate -> {level: t}
    decade_src = {}  # gate -> {level: file}
    decade_rnd = {}  # gate -> {level: round}
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_scale_*.json"))):
        try:
            d = json.load(open(p))
        except Exception:
            continue
        sf = str(d.get("sf", ""))
        m = re.search(r"sf(\d+(?:\.\d+)?)$", sf.rstrip("/"))
        if not m:
            continue
        level = f"sf{m.group(1)}"
        if level not in ("sf1", "sf10"):
            continue
        rm = re.search(r"_r(\d+)", os.path.basename(p))
        rnd = int(rm.group(1)) if rm else 0
        for gate, t in d.get("queries", {}).items():
            cur = decade.setdefault(gate, {})
            prev_rnd = decade_rnd.setdefault(gate, {}).get(level, -1)
            if rnd > prev_rnd or (rnd == prev_rnd and t < cur.get(level, 1e18)):
                cur[level] = round(t, 3)
                decade_src.setdefault(gate, {})[level] = os.path.basename(p)
                decade_rnd[gate][level] = rnd

    gates = {}
    for gate, row in sorted(corr.items()):
        ok = bool(row.get("rows_match") and row.get("schema_match")
                  and row.get("hash_match") and not row.get("err"))
        oracle = {
            "sf0.01": ("pass" if ok else "FAIL") +
                      f" ({os.path.basename(latest_corr)})",
            "sf0.1": f'pass ({SWEEPS["sf0.1"]["provenance"]})',
            "sf1": f'pass ({SWEEPS["sf1"]["provenance"]})',
        }
        bench = {}
        t01 = floors.get(gate, full.get(gate))
        if gate == "q_e2e":
            bench["sf0.1"] = "staged ETL slice (read/clean/write stages)"
        elif t01 is not None:
            bench["sf0.1"] = round(t01, 3)
        bench.update(decade.get(gate, {}))
        verdict = DECADE_OVERRIDES.get(gate)
        if verdict is None:
            t1, t10 = decade.get(gate, {}).get("sf1"), decade.get(gate, {}).get("sf10")
            if t10 is not None and isinstance(t01, float) and t01 > 0:
                r = t10 / t01
                verdict = (f"decade-proven: {r:.1f}x wall-clock at 100x data "
                           f"({'sublinear' if r < 100 else 'AT/ABOVE linear'}; "
                           f"{decade_src[gate]['sf10']})")
            elif t1 is not None and isinstance(t01, float) and t01 > 0:
                r = t1 / t01
                verdict = (f"measured at sf1: {r:.1f}x wall-clock at 10x data "
                           f"({'sublinear' if r < 10 else 'AT/ABOVE linear'}; "
                           f"{decade_src[gate]['sf1']})")
            else:
                verdict = "bench at sf0.1; scale argument by plan shape (SCALE.md)"
        entry = {"oracle": oracle, "bench": bench, "decade": verdict}
        if gate in MECHANISM:
            entry["mechanism"] = MECHANISM[gate]
        gates[gate] = entry

    out = {
        "_generated_by": "tools/gen_coverage_matrix.py",
        "_correctness_source": os.path.basename(latest_corr),
        "_sweeps": SWEEPS,
        "_gate_count": len(gates),
        "gates": gates,
    }
    path = os.path.join(ROOT, "COVERAGE_matrix.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    n_dec = sum(1 for g in gates.values() if "decade-proven" in g["decade"])
    n_sf1 = sum(1 for g in gates.values() if "sf1" in g["bench"])
    print(f"wrote COVERAGE_matrix.json: {len(gates)} gates, "
          f"{n_sf1} with sf1 bench rows, {n_dec} decade-proven at sf10")
    return 0


if __name__ == "__main__":
    sys.exit(main())
