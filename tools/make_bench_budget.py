#!/usr/bin/env python3
"""Regenerate per-tier bench budget files from committed bench artifacts.

Ceiling = 2x the steady (min-of-passes) per-query time, floored at 0.3 s
so sub-150ms queries don't flag on scheduler noise. Run after a deliberate
plan change shifts a query's steady cost; commit the result so the next
round's bench compares against pinned expectations (VERDICT r12 #8 — the
motivating case was q_assoc_rules' quiet +22% hiding inside a healthy
total).

Tiers (VERDICT r14 #2 — the +23 s q_assoc_rules sf10 regression was
caught by eyeball because the scale benches had no over-budget gate):

  no args                  BENCH.json      -> tools/bench_budget.json
                           (must be sf0.1 — the committed contract)
  make_bench_budget.py BENCH_sf1.json   -> tools/bench_budget_sf1.json
  make_bench_budget.py BENCH_sf10.json  -> tools/bench_budget_sf10.json

The tier is DERIVED from the artifact's own "sf" field (ADVICE r13), and
the output filename is derived from the tier, so a budget can never claim
a tier its source artifact didn't run at. Bench.scala picks
tools/bench_budget_<tier>.json when the target dir basename matches, and
still refuses ceilings whose embedded "sf" disagrees.
"""
import json
import os
import sys


def emit(src_path, require_tier=None):
    d = json.load(open(src_path))
    tier = os.path.basename(d["sf"].rstrip("/"))
    if require_tier and tier != require_tier:
        sys.exit(
            f"{src_path} was produced at tier {tier!r}, not {require_tier!r}"
            " — refusing to commit wrong-tier ceilings."
        )
    qs = d["queries"]
    budget = {k: round(max(2 * v, 0.3), 3)
              for k, v in sorted(qs.items()) if v >= 0}
    out_path = ("tools/bench_budget.json" if tier == "sf0.1"
                else f"tools/bench_budget_{tier}.json")
    out = {
        "_doc": f"Per-query steady-time ceilings at {tier} (VERDICT r12 #8"
        " / r14 #2): 2x the last committed steady min, floored at 0.3 s so"
        " sub-150ms queries don't flag on scheduler noise. Bench.scala"
        " compares its min-of-passes against these when the target dir"
        " basename matches the sf field and reports over_budget loudly."
        " Regenerate from the tier's bench artifact after a deliberate"
        f" plan change: python3 tools/make_bench_budget.py"
        f"{'' if tier == 'sf0.1' else ' BENCH_' + tier + '.json'}",
        "sf": tier,
        "queries": budget,
    }
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"{len(budget)} ceilings written to {out_path} (tier {tier})")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        for p in sys.argv[1:]:
            emit(p)
    else:
        # the no-arg invocation stays the sf0.1 contract: BENCH.json is the
        # driver-read artifact and must never stamp another tier's numbers
        emit("BENCH.json", require_tier="sf0.1")
