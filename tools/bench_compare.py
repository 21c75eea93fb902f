#!/usr/bin/env python3
"""Round-over-round bench comparison: diff two BENCH_FULL json artifacts.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio_threshold]

Prints per-query deltas whose new/old ratio exceeds the threshold (default
1.5x either direction), plus totals, recall, qps, and targets side by side.
Since round 9 Bench grades the MEDIAN of 3 timed runs after a discarded
warmup (earlier artifacts were min-of-2 — biased low; cross-era ratios
carry that offset). Per-run spread ships in queries_runs; treat per-query
flags as leads, totals as the signal.
"""
import json
import sys

if len(sys.argv) < 3:
    print(__doc__)
    sys.exit(2)

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

print(f"total: {old.get('value', 0):.1f}s -> {new.get('value', 0):.1f}s "
      f"({len(old.get('queries', {}))} -> {len(new.get('queries', {}))} queries)")

oq, nq = old.get("queries", {}), new.get("queries", {})
flagged = []
for name in sorted(set(oq) & set(nq)):
    a, b = oq[name], nq[name]
    if a > 0.05 and b > 0.05 and (b / a > thr or a / b > thr):
        flagged.append((b / a, name, a, b))
for ratio, name, a, b in sorted(flagged, reverse=True):
    tag = "SLOWER" if ratio > 1 else "faster"
    print(f"  {tag} {ratio:5.2f}x  {name}: {a:.3f}s -> {b:.3f}s")
if not flagged:
    print("  no per-query delta beyond the threshold")

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
