"""Driver-signal staleness report + next-window proposal.

The driver hash-checks the FIRST 50 registry queries per round; keeping
every query's signal fresh is a rotation problem. This tool reads the
CORRECTNESS_r*.json records and prints, per registry query, the last
round its driver signal was green (hash-match for oracle-backed rows,
any recorded appearance for rows-only ones), then proposes the next
50-slot window in strict staleness order:

1. oracle-backed queries with NO green driver row ever (new additions
   must land here — the zero-visibility-debt invariant);
2. rows-only queries by last recorded appearance;
3. oracle-backed queries by last green round, registry order as the
   tie-break.

Usage: python staleness.py [--window-only]
The proposal is a starting point — family-value reweighting (VERDICT r6
item #1 style) is a judgement call the notes should record.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def load_history(
    through_round: int | None = None,
) -> tuple[dict[str, int], dict[str, int], int]:
    """Signal history from the CORRECTNESS_r*.json records, optionally
    truncated to rounds <= ``through_round`` (so a window chosen at round
    N can be re-derived — and regression-tested — after later records
    land)."""
    last_green: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if through_round is not None and rnd > through_round:
            continue
        max_round = max(max_round, rnd)
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            last_seen[name] = max(last_seen.get(name, 0), rnd)
            if (
                row.get("hash_match")
                and row.get("rows_match")
                and row.get("schema_match")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, last_seen, max_round


def propose_window(through_round: int | None = None) -> list[str]:
    """The staleness-ordered 50-slot window given records through
    ``through_round`` (None = all). Tie-break: current registry order.
    This is self-consistent under the window reorder itself: applying a
    staleness-ordered window moves equal-signal entries to the front IN
    staleness order, so re-deriving the proposal from the same records
    after the reorder reproduces the same window
    (tests/test_registry_window.py pins this for the active round)."""
    from pipeline_pyspark_etl_imdb_spark.plans import registry

    rows_only = set(registry.ROWS_ONLY)
    last_green, last_seen, _ = load_history(through_round)
    order = list(registry.QUERIES)

    def signal_round(name: str) -> int:
        if name in rows_only:
            return last_seen.get(name, 0)
        return last_green.get(name, 0)

    never = [n for n in order if n not in rows_only and signal_round(n) == 0]
    rest = sorted(
        (n for n in order if n not in never),
        key=lambda n: (signal_round(n), order.index(n)),
    )
    return (never + rest)[:50]


def main() -> None:
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES, ROWS_ONLY

    rows_only = set(ROWS_ONLY)
    last_green, last_seen, max_round = load_history()
    order = list(QUERIES)  # registry order = tie-break

    def signal_round(name: str) -> int:
        if name in rows_only:
            return last_seen.get(name, 0)
        return last_green.get(name, 0)

    proposal = propose_window()

    if "--window-only" not in sys.argv:
        print(f"registry: {len(order)} queries ({len(rows_only)} rows-only); "
              f"records through r{max_round}")
        by_round: dict[int, int] = {}
        for n in order:
            by_round[signal_round(n)] = by_round.get(signal_round(n), 0) + 1
        for rnd in sorted(by_round):
            label = "NEVER" if rnd == 0 else f"r{rnd}"
            print(f"  last signal {label}: {by_round[rnd]} queries")
        stalest = max_round - min(
            (signal_round(n) for n in order if signal_round(n)), default=max_round
        )
        print(f"  max rounds-since-signal (excl. never): {stalest}")
        if never:
            print(f"  NEVER-GREEN oracle-backed (visibility debt): {never}")
        print()
    print(f"# proposed r{max_round + 1} window (staleness-ordered)")
    print("_PROPOSED_WINDOW: tuple[str, ...] = (")
    for n in proposal:
        sig = signal_round(n)
        tag = "rows-only, last seen" if n in rows_only else "last green"
        print(f'    "{n}",  # {tag} {"never" if sig == 0 else f"r{sig}"}')
    print(")")


if __name__ == "__main__":
    main()
