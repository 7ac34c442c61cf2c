#!/usr/bin/env python
"""Compare the current BENCH_DETAIL.json against a previous round's
bench record and print per-query regressions — the measurement
discipline behind "no query regressed >2x beyond its measured spread".

Usage:
    python tools/bench_compare.py [BASELINE_JSON]

BASELINE_JSON defaults to the newest BENCH_r*.json whose payload
parses (the driver's stdout capture; records with "parsed": null are
skipped). Exit code 1 if any regression is found, 0 otherwise.
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_record(path: str) -> dict | None:
    """A bench record is either the raw compact line, the full detail
    dict, or a driver wrapper {"parsed": {...}}."""
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if isinstance(d, dict) and "parsed" in d:
        d = d["parsed"]
    if not isinstance(d, dict) or not isinstance(d.get("queries"), dict):
        return None
    return d


def _latest_baseline() -> tuple[str, dict] | None:
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    for p in reversed(paths):
        d = _load_record(p)
        # the compact stdout line carries only the worst-3 queries —
        # need a full per-query dict to compare against
        if d and len(d["queries"]) >= 20:
            return p, d
    return None


def main() -> int:
    cur = _load_record(os.path.join(ROOT, "BENCH_DETAIL.json"))
    if cur is None:
        print("no BENCH_DETAIL.json — run `python bench.py` first")
        return 2
    if len(sys.argv) > 1:
        base_path = sys.argv[1]
        base = _load_record(base_path)
    else:
        found = _latest_baseline()
        base_path, base = found if found else ("<none>", None)
    if base is None:
        print(f"no parseable baseline ({base_path})")
        return 2

    qc, qb = cur["queries"], base["queries"]
    sc = cur.get("spread", {})
    sb = base.get("spread", {})
    common = sorted(set(qc) & set(qb))
    tot_c = sum(qc[k] for k in common)
    tot_b = sum(qb[k] for k in common)
    print(
        f"baseline {os.path.basename(base_path)}: {len(common)} common "
        f"queries, total {tot_b:.1f}s -> {tot_c:.1f}s"
    )
    regressions = []
    for k in common:
        # regression = >2x the old time AND outside both runs' spread
        # AND not measurement dust (>150ms absolute)
        slack = sc.get(k, 0.0) + sb.get(k, 0.0)
        if qc[k] > 2 * qb[k] + slack and qc[k] - qb[k] > 0.15:
            regressions.append(k)
            print(
                f"  REGRESSION {k}: {qb[k]:.2f}s -> {qc[k]:.2f}s "
                f"(spread {sb.get(k, 0)}/{sc.get(k, 0)})"
            )
    new = sorted(set(qc) - set(qb))
    if new:
        print(f"  new (no baseline): {len(new)} queries, "
              f"{sum(qc[k] for k in new):.1f}s")
    if not regressions:
        print("  regressions: none")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
