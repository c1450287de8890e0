#!/usr/bin/env python3
"""Build/refresh BASELINE_BENCH.json from a full graft.Bench run.

Reads target/bench_last.json (the bench's own full artifact) and writes the
committed per-row reference table the next round's Bench cross-checks
against (Bench.loadReferenceCpu) and the judge diffs BENCH_r{N} rows
against (VERDICT r14 item 7). Carries per-row wall+cpu, the run's floors,
and provenance so a reader can judge whether the reference box was quiet.

Usage: python3 tools/make_baseline_bench.py [note...]
"""
import json
import sys


def main() -> None:
    src = json.load(open("target/bench_last.json"))
    c = src.get("contention", {})
    out = {
        "_provenance": {
            "sf": src.get("sf"),
            "parallelism": src.get("parallelism"),
            "total_sec": round(src.get("value", -1), 4),
            "contended": src.get("contended"),
            "suspectQueries": src.get("suspectQueries", []),
            "minSpinMs": c.get("minSpinMs"),
            "minAllCoreSpinMs": c.get("minAllCoreSpinMs"),
            "spinNormTotal": c.get("spinNormTotal"),
            "stealSec": c.get("stealSec"),
            "note": " ".join(sys.argv[1:]) or "committed reference run",
        },
        "queries": {},
    }
    tel = src.get("telemetry", {})
    for name, sec in sorted(src["queries"].items()):
        t = tel.get(name, {})
        out["queries"][name] = {
            "sec": round(sec, 4),
            "cpuSec": round(t.get("cpuSec", -1), 4),
            "suspect": t.get("suspect", False),
        }
    with open("BASELINE_BENCH.json", "w") as f:
        json.dump(out, f, indent=1)
    n = len(out["queries"])
    print(f"BASELINE_BENCH.json written: {n} rows, total {out['_provenance']['total_sec']} s, "
          f"contended={out['_provenance']['contended']}")


if __name__ == "__main__":
    main()
