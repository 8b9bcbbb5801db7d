"""Certification-age ledger: how old is each catalog query's newest
OFFICIAL green row?

The external driver certifies ~50 queries per round against a catalog
of ~180, so without explicit rotation a query's last official green can
silently age out (round 7 found 38 queries at r4 or older and the
flagship pipeline at r3). This tool makes that debt a committed,
diffable artifact instead of something a judge has to recompute:

  - joins the registered catalog against the CORRECTNESS_r*.json union
    (the same parser the sweep-order machinery uses);
  - writes CERTAGE.json: per-query {last_round, age, green, sweep_pos}
    plus a summary histogram;
  - exits 1 if any query that NEEDS re-certification (never checked,
    red, or older than MAX_AGE rounds) sits OUTSIDE the front-BUDGET
    sweep positions -- i.e. the rotation mechanism in
    catalog/__init__._apply_sweep_order cannot retire the debt this
    round. tests/test_catalog.py::
    test_certification_debt_is_retirable_this_round asserts the same
    bound (via compute() below), so the debt cannot re-accumulate
    unnoticed.

Usage: python tools/certage.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_AGE = 4    # a green older than this many rounds must be fronted
BUDGET = 50    # the official sweep's approximate per-round row budget


def compute() -> dict:
    from groove_to_helpscout_migration_tool_spark import catalog

    checked, green, last_round = catalog._official_status()
    newest = max(last_round.values(), default=0)
    order = list(catalog.QUERIES)
    report: dict[str, dict] = {}
    for pos, name in enumerate(order):
        lr = last_round.get(name, 0)
        report[name] = {
            "last_round": lr,
            "age": (newest - lr) if name in checked else None,
            "green": name in green,
            "sweep_pos": pos,
        }
    overdue = [
        n
        for n, r in report.items()
        if r["age"] is None or not r["green"] or r["age"] >= MAX_AGE
    ]
    unreachable = sorted(
        (n for n in overdue if report[n]["sweep_pos"] >= BUDGET),
        key=lambda n: report[n]["sweep_pos"],
    )
    hist: dict[str, int] = {}
    for r in report.values():
        key = "never" if r["age"] is None else f"age_{r['age']}"
        hist[key] = hist.get(key, 0) + 1
    return {
        "newest_round": newest,
        "n_queries": len(order),
        "max_age": MAX_AGE,
        "budget": BUDGET,
        "age_histogram": dict(sorted(hist.items())),
        "n_overdue": len(overdue),
        "overdue_beyond_budget": unreachable,
        "queries": report,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CERTAGE.json",
    )
    result = compute()
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=False)
        fh.write("\n")
    summary = {k: v for k, v in result.items() if k != "queries"}
    print(json.dumps(summary))
    sys.exit(1 if result["overdue_beyond_budget"] else 0)


if __name__ == "__main__":
    main()
