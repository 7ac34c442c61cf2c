#!/usr/bin/env python
"""Compare the current BENCH_DETAIL.json against a previous round's
bench record and print per-query regressions — the measurement
discipline behind "no query regressed >2x beyond its measured spread".

Usage:
    python tools/bench_compare.py [BASELINE] [CURRENT] [--clean[=PATH]]

``--clean`` re-adjudicates against a clean same-code sidecar run
(default BENCH_DETAIL.local.json — the builder's detached quiet-host
run of the same commit): the common-set total and every flagged
regression are re-read from the clean record, and a regression that
vanishes there is reported as HOST NOISE rather than a plan change.
(Motivating case: the official r12 record ran ~1.25x hot and flagged
lang_id_confusion 0.42->1.25s; the clean run of the same code measured
0.50s.)

BASELINE / CURRENT may be file paths or round labels like ``r09`` —
a label resolves to BENCH_DETAIL_r09.json (the full per-query archive
bench.py writes since round 10) and falls back to the driver's
BENCH_r09.json stdout capture (worst-3 queries only). CURRENT defaults
to BENCH_DETAIL.json (the latest local run); BASELINE defaults to the
newest archive/record with a usable per-query dict. Exit code 1 if any
regression is found, 0 otherwise.
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


def _resolve(label: str) -> str:
    """Map ``r09`` → the round's full detail archive if present, else
    the driver's compact record; pass file paths through unchanged."""
    if not (label.startswith("r") and label[1:].isdigit()):
        return label
    n = int(label[1:])
    for pat in (f"BENCH_DETAIL_r{n:02d}.json", f"BENCH_r{n:02d}.json"):
        p = os.path.join(ROOT, pat)
        if os.path.exists(p):
            return p
    return os.path.join(ROOT, f"BENCH_r{n:02d}.json")


def _latest_baseline() -> tuple[str, dict] | None:
    # detail archives first (full per-query dicts), then the driver's
    # compact stdout captures (worst-3 only, need >=20 to be usable)
    paths = sorted(
        glob.glob(os.path.join(ROOT, "BENCH_DETAIL_r*.json"))
    ) + sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    for p in reversed(paths):
        d = _load_record(p)
        if d and len(d["queries"]) >= 20:
            return p, d
    return None


def main() -> int:
    args = list(sys.argv[1:])
    clean_path = None
    for a in list(args):
        if a == "--clean":
            clean_path = os.path.join(ROOT, "BENCH_DETAIL.local.json")
            args.remove(a)
        elif a.startswith("--clean="):
            clean_path = a.split("=", 1)[1]
            args.remove(a)
    cur_path = (
        _resolve(args[1])
        if len(args) > 1
        else os.path.join(ROOT, "BENCH_DETAIL.json")
    )
    cur = _load_record(cur_path)
    if cur is None:
        print(f"no current record ({cur_path}) — run `python bench.py` first")
        return 2
    if len(args) > 0:
        base_path = _resolve(args[0])
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
    regressions, noisy = [], []
    for k in common:
        # A spread larger than the measured time itself means the
        # record can't distinguish plan change from host noise (r10
        # saw 32s spreads on a 3s query) — report it as UNRELIABLE
        # instead of pretending the comparison is meaningful.
        if max(sc.get(k, 0.0), sb.get(k, 0.0)) > max(qc[k], qb[k]):
            noisy.append(k)
            continue
        # regression = >2x the old time AND outside both runs' spread
        # AND not measurement dust (>150ms absolute)
        slack = sc.get(k, 0.0) + sb.get(k, 0.0)
        if qc[k] > 2 * qb[k] + slack and qc[k] - qb[k] > 0.15:
            regressions.append(k)
            print(
                f"  REGRESSION {k}: {qb[k]:.2f}s -> {qc[k]:.2f}s "
                f"(spread {sb.get(k, 0)}/{sc.get(k, 0)})"
            )
    if noisy:
        print(
            f"  UNRELIABLE (spread > measured time, not compared): "
            f"{len(noisy)} queries: {' '.join(noisy[:10])}"
            + (" ..." if len(noisy) > 10 else "")
        )
    new = sorted(set(qc) - set(qb))
    if new:
        print(f"  new (no baseline): {len(new)} queries, "
              f"{sum(qc[k] for k in new):.1f}s")
    if not regressions:
        print("  regressions: none")

    if clean_path is not None:
        clean = _load_record(clean_path)
        if clean is None:
            print(f"  --clean: no parseable record at {clean_path}")
            return 2
        qk = clean["queries"]
        ccommon = sorted(set(qk) & set(qb))
        print(
            f"  clean {os.path.basename(clean_path)}: "
            f"{len(ccommon)} common queries, total "
            f"{sum(qb[k] for k in ccommon):.1f}s -> "
            f"{sum(qk[k] for k in ccommon):.1f}s"
        )
        persisted = []
        for k in regressions:
            if k not in qk:
                print(f"    {k}: not in clean record — UNRESOLVED")
                persisted.append(k)
                continue
            slack = sb.get(k, 0.0) + clean.get("spread", {}).get(k, 0.0)
            if qk[k] > 2 * qb[k] + slack and qk[k] - qb[k] > 0.15:
                print(
                    f"    {k}: persists in clean run "
                    f"({qb[k]:.2f}s -> {qk[k]:.2f}s) — PLAN REGRESSION"
                )
                persisted.append(k)
            else:
                print(
                    f"    {k}: clean run measures {qk[k]:.2f}s "
                    f"(official {qc.get(k, float('nan')):.2f}s) — "
                    f"HOST NOISE"
                )
        return 1 if persisted else 0

    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
