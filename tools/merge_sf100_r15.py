#!/usr/bin/env python3
"""Merge helper for the r15 sf100 campaign (VERDICT r14 #4).

--list-adds  print the comma-separated bench-addition list: the 16
             full-oracle greens never benched, the engine-green heavies
             whose wall numbers lived only in script comments (rnn, nmf,
             the suffix pair, textrank, ppmi — all partial-oracled at
             tier), plus every leftover the r15 probe expansion turned
             hash-green.
--merge      fold /tmp/bench_sf100_adds.json into BENCH_sf100.json,
             fold the expansion's hash-greens into CORRECTNESS_sf100.json,
             and write a per-query "excluded" map into BENCH_sf100.json so
             the bench's coverage statement matches the correctness
             probe's — every registered query is either timed at tier or
             carries a measured reason.
"""
import json
import os
import re
import sys

HEAVIES = ["q_rnn_pairs", "q_nmf_topics", "q_suffix_spans",
           "q_suffix_scrub", "q_textrank", "q_ppmi_svd", "q_glove_embed"]
RAW = "/tmp/corr_sf100_r15.json"
# TPC-H relational tables absent from the docs/embeddings/events-only
# sf100 probe tier (see run_sf100.sh header: a full sf100 lineitem is
# ~600M rows, past sandbox wall-clock without adding signal over sf10)
MISSING_TABLES = ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"]


def load_raw():
    for p in (RAW, RAW + ".partial"):
        if os.path.exists(p):
            return json.load(open(p))
    return {}


def newly_green():
    return sorted(k for k, v in load_raw().items() if v.get("hash_match"))


def list_adds():
    bench = set(json.load(open("BENCH_sf100.json"))["queries"])
    corr = json.load(open("CORRECTNESS_sf100.json"))
    green = {k for k, v in corr.items() if v.get("hash_match")}
    adds = sorted((green - bench) | set(HEAVIES) | set(newly_green()))
    print(",".join(adds))


def merge():
    bench = json.load(open("BENCH_sf100.json"))
    adds = json.load(open("/tmp/bench_sf100_adds.json"))
    assert os.path.basename(adds["sf"].rstrip("/")) == "sf100", adds["sf"]
    merged = dict(bench["queries"])
    for k, v in adds["queries"].items():
        if v >= 0:
            merged[k] = v
    # correctness: fold the expansion's hash-greens in
    corr = json.load(open("CORRECTNESS_sf100.json"))
    raw = load_raw()
    for k, v in raw.items():
        if v.get("hash_match"):
            corr[k] = v
    json.dump(corr, open("CORRECTNESS_sf100.json", "w"),
              indent=1, sort_keys=True)
    # exclusion map over the full committed registry (the sf0.1 budget
    # file pins all 179 names)
    registry = sorted(json.load(open("tools/bench_budget.json"))["queries"])
    oracle = {}
    for cand in ("/tmp/out_sf100_exp_r15/oracle_sql.json",
                 "/tmp/out_sf100/oracle_sql.json"):
        if os.path.exists(cand):
            oracle = json.load(open(cand))
            break
    excluded = {}
    for q in registry:
        if q in merged:
            continue
        if q == "q_embed_dup_smalltier":
            excluded[q] = ("bench-demoted above sf1 by Bench.scala's tier "
                           "rule: disclosed O(n^2) oracle ground-truth twin "
                           "of q_embed_dup_capped")
            continue
        used = [t for t in MISSING_TABLES
                if re.search(r"\b" + t + r"\b", oracle.get(q, ""))]
        if used:
            excluded[q] = ("requires TPC-H table(s) " + ",".join(used) +
                           " not generated at the docs/embeddings/events-"
                           "only sf100 probe tier (run_sf100.sh header); "
                           "scale evidence is the full-registry sf10 sweep")
            continue
        r = raw.get(q)
        if r is None:
            excluded[q] = ("not probed at sf100 this round; sf10 "
                           "full-oracle hash-green")
        elif r.get("err") == "no_verify_output":
            excluded[q] = ("engine run failed at sf100 — investigate "
                           "before benching (sf10 green)")
        elif r.get("err"):
            excluded[q] = ("oracle-budget exclusion at sf100 (engine dump "
                           "green, DuckDB replay failed: " +
                           str(r["err"])[:120] + "); sf10 full-oracle green")
        elif r.get("hash_match"):
            excluded[q] = ("full-oracle hash-green at sf100 (r15 "
                           "expansion) but not timed this round — bench "
                           "next round")
        else:
            excluded[q] = ("hash mismatch at sf100 — NOT benched; "
                           "investigate (sf10 green)")
    bench["queries"] = dict(sorted(merged.items()))
    bench["value"] = round(sum(v for v in merged.values() if v >= 0), 3)
    bench["n_queries"] = len(merged)
    bench["excluded"] = excluded
    bench["excluded_doc"] = (
        "VERDICT r14 #4: every registered query is either timed at sf100 "
        "(queries) or carries a measured per-query reason (excluded). "
        "The standing 40 keep their min-of-2-passes numbers; the r15 "
        "additions ran " + adds.get("method", "?") + " (single-pass cold "
        "= steady disclosed where passes=1 — wall-clock budget). "
        "Engine-green heavies (q_rnn_pairs, q_nmf_topics, the suffix "
        "pair, q_textrank, q_ppmi_svd, q_glove_embed) are timed at tier "
        "with correctness vouched by CORRECTNESS_sf100_partial.json plus "
        "the sf10 full oracle.")
    json.dump(bench, open("BENCH_sf100.json", "w"), indent=1, sort_keys=True)
    print(f"BENCH_sf100.json: {len(merged)} timed, {len(excluded)} excluded,"
          f" total {bench['value']}s")
    print(f"CORRECTNESS_sf100.json: "
          f"{sum(1 for v in corr.values() if v.get('hash_match'))} green")


if __name__ == "__main__":
    if "--list-adds" in sys.argv:
        list_adds()
    elif "--merge" in sys.argv:
        merge()
    else:
        sys.exit("usage: merge_sf100_r15.py --list-adds | --merge")
