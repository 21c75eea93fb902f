#!/usr/bin/env python3
"""Round-over-round bench comparison: diff two BENCH_FULL json artifacts.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio_threshold]

Per-query grading uses the IN-ARTIFACT SPREAD BAND when the old artifact
carries per-run times (queries_runs, round 9+): a query is flagged only
when the new median falls OUTSIDE [min(old_runs)/1.2, max(old_runs)*1.2]
— same-code rerun noise (the volatile tail swings 1.3-1.4x between
identical runs) stays inside the band, genuine regressions don't. Without
runs, falls back to the point-median ratio threshold (default 1.5x either
direction). Since round 9 Bench grades the MEDIAN of 3 timed runs (5 for
queries whose 3-run spread exceeds 15%) after a discarded warmup; earlier
artifacts were min-of-2 — biased low; cross-era ratios carry that offset.
"""
import json
import sys

if len(sys.argv) < 3:
    print(__doc__)
    sys.exit(2)

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
BAND = 1.2  # driver-rerun tolerance around the committed run spread

print(f"total: {old.get('value', 0):.1f}s -> {new.get('value', 0):.1f}s "
      f"({len(old.get('queries', {}))} -> {len(new.get('queries', {}))} queries)")

oq, nq = old.get("queries", {}), new.get("queries", {})
old_runs = old.get("queries_runs", {})
flagged = []
for name in sorted(set(oq) & set(nq)):
    a, b = oq[name], nq[name]
    if a <= 0.05 or b <= 0.05:
        continue
    runs = old_runs.get(name)
    if runs:
        lo, hi = min(runs), max(runs)
        if b > hi * BAND or b < lo / BAND:
            flagged.append((b / a, name, a, b, f"band [{lo:.2f},{hi:.2f}]x{BAND}"))
    elif b / a > thr or a / b > thr:
        flagged.append((b / a, name, a, b, f"point x{thr}"))
for ratio, name, a, b, how in sorted(flagged, reverse=True):
    tag = "SLOWER" if ratio > 1 else "faster"
    print(f"  {tag} {ratio:5.2f}x  {name}: {a:.3f}s -> {b:.3f}s  (out of {how})")
if not flagged:
    print("  every common query inside its committed spread band")

for added in sorted(set(nq) - set(oq)):
    print(f"  new query: {added} ({nq[added]:.3f}s)")
for gone in sorted(set(oq) - set(nq)):
    print(f"  REMOVED query: {gone}")

for section in ("recall", "qps"):
    os_, ns_ = old.get(section, {}), new.get(section, {})
    keys = sorted(set(os_) | set(ns_))
    if keys:
        print(f"{section}:")
        for k in keys:
            print(f"  {k}: {os_.get(k, '-')} -> {ns_.get(k, '-')}")

if "targets" in new:
    print("targets (new):")
    for k, v in sorted(new["targets"].items()):
        if isinstance(v, dict):
            verdict = "PASS" if v.get("pass") else "FAIL"
            print(f"  {k}: measured={v.get('measured')} {verdict}")
        else:
            print(f"  {k}: {v}")
