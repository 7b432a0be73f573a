#!/usr/bin/env python3
"""Regenerate tools/bench_budget.json from the latest in-repo BENCH.json.

Ceiling = 2x the steady (min-of-passes) per-query time, floored at 0.3 s
so sub-150ms queries don't flag on scheduler noise. Run after a deliberate
plan change shifts a query's steady cost; commit the result so the next
round's bench compares against pinned expectations (VERDICT r12 #8 — the
motivating case was q_assoc_rules' quiet +22% hiding inside a healthy
total).

The tier is DERIVED from BENCH.json's own "sf" field (ADVICE r13: the
old hardcoded "sf0.1" would stamp wrong-tier ceilings if regenerated
from a restored sf10 artifact, and Bench would then enforce them at
sf0.1). The committed budget is an sf0.1 contract, so anything else
aborts loudly.
"""
import json
import os
import sys

d = json.load(open("BENCH.json"))
tier = os.path.basename(d["sf"].rstrip("/"))
if tier != "sf0.1":
    sys.exit(
        f"BENCH.json was produced at tier {tier!r}, not sf0.1 — refusing "
        "to commit wrong-tier ceilings. Restore an sf0.1 BENCH.json first."
    )
qs = d["queries"]
budget = {k: round(max(2 * v, 0.3), 3) for k, v in sorted(qs.items()) if v >= 0}
out = {
    "_doc": "Per-query steady-time ceilings at sf0.1 (VERDICT r12 #8): "
    "2x the last committed steady min, floored at 0.3 s so sub-150ms "
    "queries don't flag on scheduler noise. Bench.scala compares its "
    "min-of-passes against these when the target dir basename matches "
    "the sf field and reports over_budget loudly. Regenerate from "
    "BENCH.json after a deliberate plan change: "
    "python3 tools/make_bench_budget.py",
    "sf": tier,
    "queries": budget,
}
json.dump(out, open("tools/bench_budget.json", "w"), indent=1, sort_keys=True)
print(f"{len(budget)} ceilings written to tools/bench_budget.json (tier {tier})")
