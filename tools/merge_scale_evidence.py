"""Merge the round's scale evidence into one SCALE_r{N}.json artifact.

Inputs (all produced by committed tools this round):
  - decade-1 sweep: tools/scale_records.py sf0.01 -> sf0.1 (all probes)
  - decade-2 sweep: tools/scale_records.py sf0.1 -> testdata_sf1 with
    $SCALE_PROBES restricted to the flagship chains (the generated sf1
    snapshot carries documents + embeddings only; tools/gen_scale.py)
  - sf1 certification: tools/minidriver.py at testdata_sf1 (Spark vs
    DuckDB hash compare of the chain queries at 50k docs / 20k vectors)

The merged artifact keeps the decade-1 sweep as the top-level
probes/violations contract (tests/test_scale_records.py validates it
unchanged) and attaches the second decade + the sf1 hash results under
their own keys, so the scale story is measured across TWO decades
(sf0.01 -> sf0.1 -> sf1) instead of one.

Usage: python tools/merge_scale_evidence.py d1.json d2.json cert.json out.json
   or: python tools/merge_scale_evidence.py --extend out.json [d2_extra.json] [cert_extra.json]
       (unions extra decade-2 probes / extra sf1 cert rows into an
       already-merged artifact -- the r9 relational widening runs in
       batches, so evidence accretes instead of being rewritten; pass
       "-" to skip either input)
   or: python tools/merge_scale_evidence.py --decade3 out.json d3.json [cert10.json]
       (attaches the sf1 -> sf10 third decade under decade3 /
       sf10_certification, accreting like --extend)
"""

from __future__ import annotations

import json
import sys


def decade3() -> None:
    """Attach the third decade (sf1 -> generated sf10) to a merged
    artifact: `--decade3 out.json d3.json [cert10.json]`. Mirrors the
    decade-2 keys (decade3 / sf10_certification / sf10_rows_only /
    sf10_red_rows) so tests can assert the same contract per decade."""
    out_path = sys.argv[2]
    d3_path = sys.argv[3]
    cert_path = sys.argv[4] if len(sys.argv) > 4 else "-"
    with open(out_path) as fh:
        out = json.load(fh)
    with open(d3_path) as fh:
        d3 = json.load(fh)
    base = out.setdefault(
        "decade3",
        {k: d3[k] for k in ("small_sf_dir", "large_sf_dir", "data_ratio", "linear_bound")},
    )
    assert base["large_sf_dir"] == d3["large_sf_dir"], "decade mismatch"
    base.setdefault("probes", {}).update(d3["probes"])
    base["violations"] = sorted(
        set(base.get("violations", [])) | set(d3["violations"])
    )
    if cert_path != "-":
        with open(cert_path) as fh:
            cert = json.load(fh)
        hashed, rows_only = _split_rows_only(cert)
        q = out.setdefault("sf10_certification", {"queries": {}})["queries"]
        q.update(hashed)
        if rows_only:
            out.setdefault("sf10_rows_only", {}).update(rows_only)
        out["sf10_red_rows"] = sorted(
            n for n, r in q.items() if not r.get("hash_match")
        )
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(
        json.dumps(
            {
                "out": out_path,
                "d3_probes": len(out["decade3"]["probes"]),
                "d3_violations": out["decade3"]["violations"],
                "sf10_queries": len(out.get("sf10_certification", {}).get("queries", {})),
                "sf10_red_rows": out.get("sf10_red_rows", []),
            }
        )
    )


def extend() -> None:
    out_path = sys.argv[2]
    d2_path = sys.argv[3] if len(sys.argv) > 3 else "-"
    cert_path = sys.argv[4] if len(sys.argv) > 4 else "-"
    with open(out_path) as fh:
        out = json.load(fh)
    if d2_path != "-":
        with open(d2_path) as fh:
            d2 = json.load(fh)
        base = out.setdefault(
            "decade2",
            {k: d2[k] for k in ("small_sf_dir", "large_sf_dir", "data_ratio", "linear_bound")},
        )
        assert base["large_sf_dir"] == d2["large_sf_dir"], "decade mismatch"
        base.setdefault("probes", {}).update(d2["probes"])
        base["violations"] = sorted(
            set(base.get("violations", [])) | set(d2["violations"])
        )
    if cert_path != "-":
        with open(cert_path) as fh:
            cert = json.load(fh)
        hashed, rows_only = _split_rows_only(cert)
        q = out.setdefault("sf1_certification", {"queries": {}})["queries"]
        q.update(hashed)
        if rows_only:
            out.setdefault("sf1_rows_only", {}).update(rows_only)
        out["sf1_red_rows"] = sorted(
            n for n, r in q.items() if not r.get("hash_match")
        )
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(
        json.dumps(
            {
                "out": out_path,
                "d2_probes": len(out.get("decade2", {}).get("probes", {})),
                "d2_violations": out.get("decade2", {}).get("violations", []),
                "sf1_queries": len(out.get("sf1_certification", {}).get("queries", {})),
                "sf1_red_rows": out.get("sf1_red_rows", []),
            }
        )
    )


def _split_rows_only(cert: dict) -> tuple[dict, dict]:
    """Split a minidriver cert batch into (hash-certified, rows-only).

    minidriver records err="no_oracle" for queries that have no DuckDB
    oracle (deliberately weaker checks). Those rows must NOT enter
    sf1_certification.queries -- every row there is asserted
    hash_match=True by tests/test_scale_records.py, and admitting a
    rows-only row as "certified" would overstate the evidence. They go
    to the sf1_rows_only side table instead."""
    hashed = {n: r for n, r in cert.items() if r.get("err") != "no_oracle"}
    rows_only = {n: r for n, r in cert.items() if r.get("err") == "no_oracle"}
    return hashed, rows_only


def recall() -> None:
    """Attach the ANN recall-at-scale sweep (tools/ann_recall.py) to a
    merged artifact: `--recall out.json RECALL_rN.json`. Hash
    certification cannot see approximation-quality drift, so the scale
    artifact carries the recall rows next to the record/wall decades
    (VERDICT r10 task 3)."""
    out_path, rec_path = sys.argv[2], sys.argv[3]
    with open(out_path) as fh:
        out = json.load(fh)
    with open(rec_path) as fh:
        rec = json.load(fh)
    out["ann_recall"] = rec
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(
        json.dumps(
            {
                "out": out_path,
                "recall_snapshots": {
                    d: s["recall"] for d, s in rec["snapshots"].items()
                },
                "floor_violations": rec["floor_violations"],
            }
        )
    )
    sys.exit(1 if rec["floor_violations"] else 0)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--extend":
        extend()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--decade3":
        decade3()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--recall":
        recall()
        return
    d1_path, d2_path, cert_path, out_path = sys.argv[1:5]
    with open(d1_path) as fh:
        out = json.load(fh)
    with open(d2_path) as fh:
        out["decade2"] = json.load(fh)
    with open(cert_path) as fh:
        cert = json.load(fh)
    hashed, rows_only = _split_rows_only(cert)
    out["sf1_certification"] = {
        "sf_dir": out["decade2"]["large_sf_dir"],
        "note": (
            "tools/minidriver.py hash-compare (Spark vs DuckDB oracle) "
            "at the generated sf1 snapshot; rows/schema/hash per query"
        ),
        "queries": hashed,
    }
    if rows_only:
        out["sf1_rows_only"] = rows_only
    bad = [n for n, r in hashed.items() if not r.get("hash_match")]
    out["sf1_red_rows"] = bad
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(
        json.dumps(
            {
                "out": out_path,
                "d1_violations": out["violations"],
                "d2_violations": out["decade2"]["violations"],
                "sf1_red_rows": bad,
            }
        )
    )
    sys.exit(1 if (out["violations"] or out["decade2"]["violations"] or bad) else 0)


if __name__ == "__main__":
    main()
