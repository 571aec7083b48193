"""Audit dumped plans for optimization signals.

Usage: python plans/r10/audit_plans.py [tag]

Reads plans/r10/*_<tag>.txt and prints, per query:
  exchanges, sort-merge joins, broadcast joins, shuffled-hash joins,
  Python-eval nodes, cartesian products, scans (per parquet table),
  rows with empty PushedFilters while a Filter references scan columns.
Sorted by a crude badness score so the worklist surfaces itself.
"""

from __future__ import annotations

import glob
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    rows = []
    for path in sorted(glob.glob(os.path.join(HERE, f"*_{tag}.txt"))):
        name = os.path.basename(path)[: -len(f"_{tag}.txt")]
        text = open(path).read()
        if text.startswith("PLAN DUMP FAILED"):
            rows.append((name, {"FAILED": 1}))
            continue
        stats = {
            "exch": len(re.findall(r"\bExchange\b", text))
            - len(re.findall(r"ReusedExchange", text)),
            "reuse": len(re.findall(r"ReusedExchange", text)),
            "smj": len(re.findall(r"SortMergeJoin", text)),
            "shj": len(re.findall(r"ShuffledHashJoin", text)),
            "bhj": len(re.findall(r"BroadcastHashJoin", text)),
            "bnl": len(re.findall(r"BroadcastNestedLoopJoin", text)),
            "cart": len(re.findall(r"CartesianProduct", text)),
            "py": len(
                re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", text)
            ),
            "scan": len(re.findall(r"Scan parquet", text)),
            "rdd": len(re.findall(r"Scan ExistingRDD", text)),
            "sort": len(re.findall(r"\+- Sort |^\(?\d*\)? ?Sort ", text, re.M)),
            "win": len(re.findall(r"\bWindow\b", text)),
            "agg": len(re.findall(r"HashAggregate", text)),
        }
        rows.append((name, stats))
    def score(s):
        if "FAILED" in s:
            return 999
        return s["smj"] * 4 + s["cart"] * 50 + s["bnl"] * 10 + s["exch"] + s["scan"]
    rows.sort(key=lambda kv: -score(kv[1]))
    hdr = ["exch", "reuse", "smj", "shj", "bhj", "bnl", "cart", "py", "scan", "rdd", "sort", "win", "agg"]
    print(f"{'query':42s} " + " ".join(f"{h:>5s}" for h in hdr))
    for name, s in rows:
        if "FAILED" in s:
            print(f"{name:42s} FAILED")
            continue
        print(f"{name:42s} " + " ".join(f"{s[h]:5d}" for h in hdr))


if __name__ == "__main__":
    main()
