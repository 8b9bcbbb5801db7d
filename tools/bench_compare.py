"""Compare two bench detail records (e.g. sf0.1 vs sf1) and emit the
per-query wall-clock growth ratios for the common headline set.

Usage: python tools/bench_compare.py SMALL_DETAIL.json LARGE_DETAIL.json \
           [data_ratio]
   or: python tools/bench_compare.py --rounds OLD_BENCH.json NEW_BENCH.json
       (round-over-round mode on CALIBRATION-NORMALIZED totals -- the r10
       convention, now one command instead of prose in BENCH_NOTES.json:
       each artifact's `calib` stamp scales its walls to the pooled-median
       reference session, `value_norm` totals are compared directly, and
       the verdict encodes the matched-pair rule: a >10% normalized total
       delta, or any per-query normalized ratio beyond 1.25x, demands a
       same-session worktree matched pair before it can be called a
       regression. Exits 1 when a matched pair is demanded, so the round
       stamp can gate on it.)

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

TOTAL_DRIFT_TRIGGER = 0.10   # >10% normalized-total delta -> matched pair
QUERY_DRIFT_TRIGGER = 1.25   # per-query normalized ratio -> matched pair

# Mirror of bench.py's CALIB_REF (the r10 reference-session calibration
# median). Kept as a literal so this tool stays stdlib-only -- importing
# bench.py would pull pyspark just to read one constant.
# tests/test_bench_compare.py asserts the two stay equal.
CALIB_REF = 0.99


def _load_bench(path: str) -> dict:
    """Accept either the driver's BENCH_r*.json wrapper (payload under
    'parsed') or bench.py's raw one-line JSON object."""
    with open(path) as f:
        rec = json.load(f)
    return rec.get("parsed", rec)


def _calib_of(rec: dict, path: str) -> float:
    """Calibration stamp of a bench record, as a float.

    Compact BENCH_r*.json files stamp `calib` as the pooled pre/post
    median scalar; BENCH_DETAIL*.json files stamp the full dict
    {pre, post, median, ref} -- accept both (ADVICE r11: the bare
    float() raised a TypeError on detail files)."""
    calib = rec.get("calib")
    if isinstance(calib, dict):
        # a calib DICT is a detail stamp by contract -- one without a
        # numeric median is malformed, not "unset"; falling back to 1.0
        # here would silently mis-normalize the comparison (ADVICE r12)
        calib = calib.get("median")
        if calib is None:
            raise SystemExit(
                f"{path}: calib dict lacks a numeric 'median':"
                f" {rec.get('calib')!r}"
            )
    if calib is None:
        return 1.0
    try:
        return float(calib)
    except (TypeError, ValueError):
        raise SystemExit(
            f"{path}: unreadable calib stamp {rec.get('calib')!r} -- expected"
            " a number or a {{pre,post,median,ref}} dict"
        )


def rounds() -> None:
    old = _load_bench(sys.argv[2])
    new = _load_bench(sys.argv[3])
    oc = _calib_of(old, sys.argv[2])
    nc = _calib_of(new, sys.argv[3])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(oq) & set(nq))
    queries = {}
    flagged = []
    for name in common:
        # normalize each side by ITS session's calibration stamp, scaled
        # by CALIB_REF so per-query and total values are in the same
        # value_norm units the committed artifacts stamp (ADVICE r11:
        # plain wall/calib was off the convention by the 0.99 factor --
        # ratios and delta_pct were unaffected)
        o = float(oq[name]) * CALIB_REF / oc
        n = float(nq[name]) * CALIB_REF / nc
        ratio = round(n / max(o, 1e-9), 2)
        queries[name] = {
            "old_norm": round(o, 3),
            "new_norm": round(n, 3),
            "ratio": ratio,
        }
        if ratio > QUERY_DRIFT_TRIGGER:
            flagged.append(name)
    t_old = sum(float(oq[n]) for n in common) * CALIB_REF / oc
    t_new = sum(float(nq[n]) for n in common) * CALIB_REF / nc
    delta = (t_new - t_old) / max(t_old, 1e-9)
    need_pair = abs(delta) > TOTAL_DRIFT_TRIGGER or bool(flagged)
    out = {
        "old_sha": old.get("sha"),
        "new_sha": new.get("sha"),
        "old_calib": oc,
        "new_calib": nc,
        "n_common": len(common),
        "old_only": sorted(set(oq) - set(nq)),
        "new_only": sorted(set(nq) - set(oq)),
        "total_norm_old": round(t_old, 3),
        "total_norm_new": round(t_new, 3),
        "total_norm_delta_pct": round(100 * delta, 1),
        "queries": queries,
        "flagged_queries": flagged,
        "verdict": (
            "MATCHED_PAIR_REQUIRED: normalized drift beyond trigger -- run a"
            " same-session worktree A/B (old sha vs HEAD, back-to-back, same"
            " box) before attributing the delta to code"
            if need_pair
            else "OK: normalized totals and every common query inside the"
            " drift triggers"
        ),
    }
    print(json.dumps(out, indent=1))
    sys.exit(1 if need_pair else 0)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--rounds":
        rounds()
        return
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
