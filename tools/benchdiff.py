#!/usr/bin/env python3
"""Compare two graft.Bench JSON artifacts (dev tool): per-query warm-time
ratios on the common query set, plus totals and diagnostics, so a round-
over-round slowdown is attributable to specific queries (or to the host,
via the embedded loadavg/GC evidence)."""
import sys, json

import re


def load(path):
    d = json.load(open(path))
    if "queries_warm" in d or "queries" in d:
        return d, d.get("queries_warm", d.get("queries"))
    # driver-recorded artifact: the JSON line survives only as a (possibly
    # head-truncated) 'tail' string — scrape the queries_warm pairs from it
    tail = d.get("tail", "")
    m = re.search(r'"queries_warm":\{([^}]*)\}', tail)
    seg = m.group(1) if m else tail
    pairs = dict((k, float(v)) for k, v in
                 re.findall(r'"([a-z0-9_]+)":([0-9.]+)', seg))
    pairs.pop("sf", None)
    return d, pairs


a, qa = load(sys.argv[1])
b, qb = load(sys.argv[2])
common = sorted(set(qa) & set(qb))
print(f"common queries: {len(common)}  "
      f"only-{sys.argv[1]}: {len(set(qa)-set(qb))}  "
      f"only-{sys.argv[2]}: {len(set(qb)-set(qa))}")
sa = sum(qa[q] for q in common)
sb = sum(qb[q] for q in common)
print(f"common warm totals: {sa:.1f}s vs {sb:.1f}s  ratio {sb/sa:.2f}x")
for src, d in ((sys.argv[1], a), (sys.argv[2], b)):
    diag = d.get("diag", {})
    if diag:
        print(f"{src}: wall={diag.get('wall_sec', 0):.0f}s "
              f"load={diag.get('loadavg_start')}->{diag.get('loadavg_end')} "
              f"gc={diag.get('gc_total_ms')}ms")
ratios = sorted(((qb[q] / qa[q] if qa[q] > 0 else float('inf'), q)
                 for q in common), reverse=True)
print("\nworst regressions (b/a):")
for r, q in ratios[:10]:
    print(f"  {q:30s} {qa[q]:6.2f} -> {qb[q]:6.2f}  {r:5.2f}x")
print("best improvements (b/a):")
for r, q in ratios[-5:]:
    print(f"  {q:30s} {qa[q]:6.2f} -> {qb[q]:6.2f}  {r:5.2f}x")
