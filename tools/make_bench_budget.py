#!/usr/bin/env python3
"""Regenerate tools/bench_budget.json from the latest in-repo BENCH.json.

Ceiling = 2x the steady (min-of-passes) per-query time, floored at 0.3 s
so sub-150ms queries don't flag on scheduler noise. Run after a deliberate
plan change shifts a query's steady cost; commit the result so the next
round's bench compares against pinned expectations (VERDICT r12 #8 — the
motivating case was q_assoc_rules' quiet +22% hiding inside a healthy
total).
"""
import json

d = json.load(open("BENCH.json"))
qs = d["queries"]
budget = {k: round(max(2 * v, 0.3), 3) for k, v in sorted(qs.items()) if v >= 0}
out = {
    "_doc": "Per-query steady-time ceilings at sf0.1 (VERDICT r12 #8): "
    "2x the r12 steady min, floored at 0.3 s so sub-150ms queries don't "
    "flag on scheduler noise. Bench.scala compares its min-of-passes "
    "against these when the target dir basename is sf0.1 and reports "
    "over_budget loudly. Regenerate from BENCH.json after a deliberate "
    "plan change: python3 tools/make_bench_budget.py",
    "sf": "sf0.1",
    "queries": budget,
}
json.dump(out, open("tools/bench_budget.json", "w"), indent=1, sort_keys=True)
print(f"{len(budget)} ceilings written to tools/bench_budget.json")
