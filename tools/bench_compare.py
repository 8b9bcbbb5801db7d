"""Compare two bench detail records (e.g. sf0.1 vs sf1) and emit the
per-query wall-clock growth ratios for the common headline set.

Usage: python tools/bench_compare.py SMALL_DETAIL.json LARGE_DETAIL.json \
           [data_ratio]

Prints one JSON object:
  {"small_sha", "large_sha", "small_sf", "large_sf", "data_ratio",
   "n_common", "total_small", "total_large", "total_ratio",
   "queries": {name: {"small": s, "large": s, "ratio": r}},
   "superlinear": [names with ratio > data_ratio],
   "overhead_floor_note": ...}

Ratios below data_ratio at these absolute scales are expected: each
query carries a fixed per-plan scheduling/codegen floor (~0.2-0.5 s)
that does not grow with data, so a perfectly linear operator measures
sub-linear wall clock until the data term dominates. The interesting
signal is the other direction -- any query whose wall clock grows
FASTER than the data is flagged in "superlinear".
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small_path, large_path = sys.argv[1], sys.argv[2]
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    with open(small_path) as f:
        small = json.load(f)
    with open(large_path) as f:
        large = json.load(f)
    sq, lq = small.get("queries", {}), large.get("queries", {})
    common = sorted(set(sq) & set(lq))
    queries = {}
    superlinear = []
    for name in common:
        s, l = float(sq[name]), float(lq[name])
        ratio = round(l / max(s, 1e-9), 2)
        queries[name] = {"small": s, "large": l, "ratio": ratio}
        if ratio > data_ratio:
            superlinear.append(name)
    total_small = round(sum(float(sq[n]) for n in common), 3)
    total_large = round(sum(float(lq[n]) for n in common), 3)
    out = {
        "small_sha": small.get("sha"),
        "large_sha": large.get("sha"),
        "small_sf": small.get("sf"),
        "large_sf": large.get("sf"),
        "data_ratio": data_ratio,
        "n_common": len(common),
        "total_small": total_small,
        "total_large": total_large,
        "total_ratio": round(total_large / max(total_small, 1e-9), 2),
        "queries": queries,
        "superlinear": superlinear,
        "overhead_floor_note": (
            "sub-data_ratio wall-clock growth is expected at these absolute "
            "scales (fixed per-plan scheduling/codegen floor); the flag "
            "direction is superlinear growth"
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
