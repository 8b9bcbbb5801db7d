"""Straggler bounds on the skew paths (VERDICT r4 item 6).

Runs tools/skew_stress.py as a subprocess (it needs its own session:
event logging + broadcast disabled) and asserts its bounds held:

  - salted join over a frame with one key owning ~1/3 of rows: the
    dominant shuffle stage's max-task / median-task shuffle-read
    records stays under SALT_BOUND;
  - the UNSALTED control on the same frame is measurably pathological
    (otherwise the harness could not detect a salting regression);
  - the capped minhash/simhash candidate joins over a corpus with 10%
    identical boilerplate stay under CAP_BOUND.

Task *records*, not wall time: at test scale timing noise swamps
ms-sized tasks, while the record distribution is what drives task time
at 100 TB.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_skew_bounds_hold():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "skew_stress.py"),
         "/root/testdata/sf0.01"],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    # the JSON line is the last stdout line; surface stderr on failure
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON output; stderr tail: {proc.stderr[-2000:]}"
    result = json.loads(lines[-1])
    assert proc.returncode == 0, result["violations"]
    assert result["violations"] == []
    scen = result["scenarios"]
    # the control really is skewed and the salted path really is not
    assert scen["join_unsalted"]["max_over_median"] > scen["join_salted"][
        "max_over_median"
    ]
    for name in ("join_salted", "minhash_capped", "simhash_capped"):
        assert scen[name]["n_tasks"] >= 4, (name, scen[name])
    # pair-count boundedness on the hot-bucket corpus: the uncapped
    # control is exactly quadratic, the capped paths (the edge builders
    # of clusters/keep-best/PageRank/containment) hold the linear
    # cap*(cap-1)/2 + (width-cap) ceiling, and the anchor star keeps
    # EVERY hot doc attached to the pair graph (the r8 pure cap
    # orphaned beyond-cap members of the collapsed bucket)
    probe = result["pair_probe"]
    assert probe["hot_pairs_uncapped"] == probe["hot_pairs_uncapped_expected"]
    assert probe["hot_pairs_capped"] <= probe["cap_pair_ceiling"]
    assert probe["hot_docs_covered_capped"] == probe["n_hot_docs"]
    assert probe["hot_pairs_anchor_capped"] <= probe["cap_pair_ceiling"]
    assert probe["hot_pairs_uncapped"] > 10 * probe["cap_pair_ceiling"]
