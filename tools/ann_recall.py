"""Measure ANN recall@k AT SCALE against the brute-force baseline.

Hash-certification of the capped/bucketed ANN queries proves the plan
computes ITS OWN semantics exactly -- it cannot see approximation
quality drift. Bucket saturation (flagged by the sf10 probe notes for
LSH at 60M rows / 200k vectors) degrades RECALL while every hash stays
green, so recall needs its own scale measurement (VERDICT r10 task 3).

For each snapshot dir this tool runs, on a FIXED query panel
(vec_id < ANN_RECALL_QUERIES, default 200 -- identical panel at every
scale, so numbers are comparable across snapshots):

  - brute:  exact top-k (similarity.scores_vs_query_matrix +
            two_phase_topk -- the llm_ann_topk_cosine plan with the
            wider panel), the ground truth;
  - lsh:    similarity.lsh_topk   (bucket join + exact re-rank);
  - ivf:    similarity.ivf_topk   (nprobe=5 coarse cells -- the catalog
            llm_ann_ivf_topk config, raised from 3 in r11 exactly
            because this sweep measured 0.61 at sf1; keep in lockstep
            with catalog/llm_ops.py);
  - sq8:    similarity.sq8_topk   (int8 first pass + exact re-rank;
            bit-identical to brute by design -- a 1.0-recall control
            that validates the harness itself);
  - hybrid: similarity.ivf_sq8_hybrid_topk (r13: IVF probe candidates
            UNION the int8 pool as an exact safety net -- the
            floor-carrying production form; runs AFTER ivf and sq8 so
            its legs reuse their session-persisted artifacts, which is
            also the 100 TB accounting: the cell assignment and int8
            corpus are build-once snapshot tables).

Asserted floors (VERDICT r11 task 1 + r12 task 3: mean, tail, AND min):
  - mean recall@k >= 0.7 per family per snapshot;
  - p10 per-query recall >= 0.4 per family per snapshot;
  - MIN per-query recall >= 0.4 per family per snapshot for every
    family EXCEPT plain ivf (MIN_FLOORS): ivf's min is quantizer-
    resolution-bound at 0.2 -- its outlier queries' true top-5 are
    cross-cluster noise-band cosines spread uniformly over unprobed
    cells, and the committed routing sweep (tools/ivf_route_sweep.py,
    IVFROUTE_r13.json) measured that NO per-query signal (probe margin,
    boundary gap, retrieved-cosine) catches those offenders below a
    0.25 routed fraction at every scale -- so the min floor is carried
    by the hybrid (the exact int8 net over every query), and plain ivf
    stays measured for lockstep with the certified catalog config;
  - scale-path wall pins (VERDICT r11 task 2): at the LARGEST snapshot
    ivf_wall <= IVF_WALL_RATIO_MAX * brute_wall, and the floor-carrying
    hybrid <= HYBRID_WALL_RATIO_MAX * brute_wall (the per-query
    guarantee must cost less than the guarantee-free exact scan). LSH
    carries NO wall floor -- it is the documented small-N path (a
    config sweep measured every >=0.9-recall LSH config at >=0.42
    candidate fraction on this corpus geometry, so it cannot beat brute
    by 2x at any bit budget; COVERAGE.md + NOTES.md round 12).

Each family runs TWICE per snapshot: wall_build_s is the first pass
(includes the one-time index/artifact build -- at 100 TB a bucketed
table written once per corpus snapshot and amortized over every query
batch), wall_s is the second pass (steady state, the per-query-batch
cost the wall pin is about). The two differ by ~4x for LSH at sf10
(301s vs 77s measured r12), so conflating them makes the artifact
non-reproducible across sessions -- r11's single-pass stamp happened to
catch a warm index and read 79.5s where a cold session reads ~230s.

Usage: python tools/ann_recall.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /root/repo/testdata_sf1
                 /root/repo/testdata_sf10)
Env:   ANN_RECALL_JSON=<path>  write the artifact (default RECALL_r13.json)
       ANN_RECALL_QUERIES=<n>  panel size (default 200)
       ANN_RECALL_K=<k>        k (default 5)

Output JSON: {"panel": n, "k": k, "floor": 0.7, "p10_floor": 0.4,
              "min_floors": {family: floor|null},
              "min_floor_exemption": "...",
              "ivf_wall_ratio_max": 0.5, "hybrid_wall_ratio_max": 0.75,
              "snapshots": {dir: {"n_vectors": N,
                                  "recall": {family: mean},
                                  "p10_query_recall": {family: r},
                                  "min_query_recall": {family: r},
                                  "wall_build_s": {family: s},
                                  "wall_s": {family: s (steady state)},
                                  "wall_ratio_vs_brute": {family: r}}},
              "floor_violations": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from groove_to_helpscout_migration_tool_spark import get_session
from groove_to_helpscout_migration_tool_spark.operators import similarity as SIM
from groove_to_helpscout_migration_tool_spark.session import load_tables

FLOOR = 0.7            # per-family MEAN recall@k floor
P10_FLOOR = 0.4        # per-family 10th-percentile per-query floor
IVF_WALL_RATIO_MAX = 0.5   # scale-path pin at the largest snapshot
HYBRID_WALL_RATIO_MAX = 0.75  # floor-carrying form must beat exact scan
# Per-family MIN per-query floors (r13). None == documented exemption:
# plain ivf's min is quantizer-resolution-bound (IVFROUTE_r13.json shows
# no routing signal exists); the hybrid carries the floor instead.
MIN_FLOORS: dict[str, float | None] = {
    "lsh": 0.4,
    "ivf": None,
    "sq8": 0.4,
    "hybrid": 0.4,
}


def brute_topk(emb, k: int, query_max_id: int):
    """Exact baseline: the llm_ann_topk_cosine plan (one Arrow stage vs
    the collected query matrix, salted two-phase top-k) with a
    parameterized panel."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    e = e.withColumn(
        "norm", F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    )
    q = e.filter(F.col("vec_id") < query_max_id).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        SIM.scores_vs_query_matrix(e, q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nid"), "cosine")
    )
    return SIM.two_phase_topk(scored, "qid", k, 8)


def pairs(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("qid", "nid").collect():
        out.setdefault(r[0], set()).add(r[1])
    return out


def normalize(df):
    """Top-k frames differ in column names across operators; take the
    first two id-typed columns as (qid, nid)."""
    cols = df.columns
    qcol = "qid" if "qid" in cols else "query_id"
    ncol = "nid" if "nid" in cols else "neighbor_id"
    return df.select(F.col(qcol).alias("qid"), F.col(ncol).alias("nid"))


def p10(values: list[float]) -> float:
    """10th percentile, lower-interpolation (the conservative side: the
    reported p10 is an ACTUAL per-query recall, never an interpolated
    value above one)."""
    if not values:
        return 0.0
    s = sorted(values)
    return s[int(0.10 * (len(s) - 1))]


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/root/repo/testdata_sf1",
        "/root/repo/testdata_sf10",
    ]
    n_queries = int(os.environ.get("ANN_RECALL_QUERIES", "200"))
    k = int(os.environ.get("ANN_RECALL_K", "5"))
    out_path = os.environ.get("ANN_RECALL_JSON", "/root/repo/RECALL_r13.json")
    spark = get_session()
    snapshots: dict[str, dict] = {}
    violations: list[str] = []
    sized: list[tuple[int, str]] = []
    for sf_dir in dirs:
        t = load_tables(spark, sf_dir, ["embeddings"])
        emb = t.embeddings
        n_vec = emb.count()
        sized.append((n_vec, sf_dir))
        # ground truth once per snapshot; brute also gets the two-pass
        # treatment (pass 1 builds/caches prepared(); pass 2 is the
        # steady-state scan every approximate family is compared to)
        t0 = time.time()
        truth = pairs(normalize(brute_topk(emb, k, n_queries)))
        builds = {"brute": round(time.time() - t0, 2)}
        t0 = time.time()
        truth = pairs(normalize(brute_topk(emb, k, n_queries)))
        walls = {"brute": round(time.time() - t0, 2)}
        fams = {
            "lsh": lambda: SIM.lsh_topk(emb, k=k, query_max_id=n_queries),
            # nprobe=5 == the catalog llm_ann_ivf_topk config
            "ivf": lambda: SIM.ivf_topk(emb, k=k, query_max_id=n_queries, nprobe=5),
            "sq8": lambda: SIM.sq8_topk(emb, k=k, query_max_id=n_queries),
            # runs last ON PURPOSE: its legs reuse the cell assignment /
            # int8 corpus persisted by the ivf+sq8 passes above -- the
            # honest steady-state accounting, since both are build-once
            # snapshot artifacts at 100 TB (its wall_build_s is
            # therefore NOT a cold build; the cold costs are ivf's and
            # sq8's own build stamps)
            "hybrid": lambda: SIM.ivf_sq8_hybrid_topk(
                emb, k=k, query_max_id=n_queries, nprobe=5
            ),
        }
        recall: dict[str, float] = {}
        p10_q: dict[str, float] = {}
        min_q: dict[str, float] = {}
        for fam, build in fams.items():
            t0 = time.time()
            got = pairs(normalize(build()))
            builds[fam] = round(time.time() - t0, 2)
            t0 = time.time()
            got = pairs(normalize(build()))
            walls[fam] = round(time.time() - t0, 2)
            per_q = [
                len(got.get(qid, set()) & tset) / max(len(tset), 1)
                for qid, tset in truth.items()
            ]
            recall[fam] = round(sum(per_q) / max(len(per_q), 1), 4)
            p10_q[fam] = round(p10(per_q), 4)
            min_q[fam] = round(min(per_q), 4) if per_q else 0.0
            if recall[fam] < FLOOR:
                violations.append(f"{sf_dir}:{fam}={recall[fam]}")
            if p10_q[fam] < P10_FLOOR:
                violations.append(f"{sf_dir}:{fam}:p10={p10_q[fam]}")
            mfloor = MIN_FLOORS.get(fam)
            if mfloor is not None and min_q[fam] < mfloor:
                violations.append(f"{sf_dir}:{fam}:min={min_q[fam]}")
            print(
                f"{sf_dir} {fam}: recall@{k}={recall[fam]}"
                f" p10={p10_q[fam]} min={min_q[fam]}"
                f" build={builds[fam]}s steady={walls[fam]}s",
                flush=True,
            )
        ratios = {
            fam: round(walls[fam] / max(walls["brute"], 1e-9), 3)
            for fam in fams
        }
        snapshots[sf_dir] = {
            "n_vectors": n_vec,
            "recall": recall,
            "p10_query_recall": p10_q,
            "min_query_recall": min_q,
            "wall_build_s": builds,
            "wall_s": walls,
            "wall_ratio_vs_brute": ratios,
        }
        spark.catalog.clearCache()
    # scale-path pins: IVF must actually accelerate at the largest
    # scale, and the floor-carrying hybrid must beat the exact scan
    largest = max(sized)[1]
    ivf_ratio = snapshots[largest]["wall_ratio_vs_brute"]["ivf"]
    if ivf_ratio > IVF_WALL_RATIO_MAX:
        violations.append(f"{largest}:ivf_wall_ratio={ivf_ratio}")
    hyb_ratio = snapshots[largest]["wall_ratio_vs_brute"]["hybrid"]
    if hyb_ratio > HYBRID_WALL_RATIO_MAX:
        violations.append(f"{largest}:hybrid_wall_ratio={hyb_ratio}")
    # VERDICT r12 task 6: price the LSH index build honestly. The build
    # premium over the brute path's own build (prepared() etc.) is paid
    # back at (brute_steady - lsh_steady) per query batch; below the
    # break-even batch count, brute is cheaper END TO END and the LSH
    # index should not be built at all. Stamped per snapshot so the
    # small-N scope note carries the amortization math, not a vibe.
    lsh_break_even = {}
    for sf_dir, snap in snapshots.items():
        saving = snap["wall_s"]["brute"] - snap["wall_s"]["lsh"]
        premium = snap["wall_build_s"]["lsh"] - snap["wall_build_s"]["brute"]
        # premium <= 0 (build no dearer than brute's own prepared()
        # build) pays back immediately -> 0 batches; saving <= 0 (steady
        # LSH not faster) -> the index NEVER pays back -> null
        lsh_break_even[sf_dir] = (
            round(max(premium, 0.0) / saving, 1) if saving > 0 else None
        )
    from tools.lsh_scope_sweep import CONFIGS as LSH_CONFIGS

    out = {
        "panel": n_queries,
        "k": k,
        "floor": FLOOR,
        "p10_floor": P10_FLOOR,
        "min_floors": MIN_FLOORS,
        "min_floor_exemption": (
            "ivf: min is quantizer-resolution-bound (outlier queries'"
            " true top-5 are cross-cluster noise-band cosines spread"
            " uniformly over unprobed cells); the committed routing"
            " sweep (tools/ivf_route_sweep.py, IVFROUTE_r13.json) found"
            " no per-query signal catching them below a 0.25 routed"
            " fraction at every scale, so the min floor is carried by"
            " the hybrid family (exact int8 net over every query)"
        ),
        "ivf_wall_ratio_max": IVF_WALL_RATIO_MAX,
        "hybrid_wall_ratio_max": HYBRID_WALL_RATIO_MAX,
        "lsh_scope": (
            f"small-N path: a {len(LSH_CONFIGS)}-config (bands x bits x"
            " probe-budget) sweep at"
            " sf1/sf10 measured every >=0.9-recall config at >=0.42 candidate"
            " fraction -- this corpus's true top-5 cosines sit in the"
            " hyperplane noise band (0.32-0.48), so sign-LSH cannot prune it;"
            " IVF and SQ8 are the asserted scale paths (NOTES.md round 12)"
        ),
        "lsh_break_even_batches": lsh_break_even,
        "lsh_break_even_note": (
            "query batches (of panel size) needed before the LSH index"
            " build premium over the brute path's own build pays back at"
            " the steady-state per-batch saving; null = LSH steady is"
            " not faster than brute at that snapshot, so the index never"
            " pays back"
        ),
        "snapshots": snapshots,
        "floor_violations": violations,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}; violations: {violations}")
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
