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
  - ivf:    similarity.ivf_topk   (nprobe=3 coarse cells);
  - sq8:    similarity.sq8_topk   (int8 first pass + exact re-rank;
            bit-identical to brute by design -- a 1.0-recall control
            that validates the harness itself).

recall@k(family) = mean over panel queries of |approx_q ∩ brute_q| / k.
Tie noise at the rank-k boundary (equal ROUNDED cosines ordered by nid)
can cost a slot legitimately; the asserted floor (0.7) is far below it.

Usage: python tools/ann_recall.py [sf_dir ...]
       (default: /root/repo/testdata_sf1 /root/repo/testdata_sf10)
Env:   ANN_RECALL_JSON=<path>  write the artifact (default RECALL_r11.json)
       ANN_RECALL_QUERIES=<n>  panel size (default 200)
       ANN_RECALL_K=<k>        k (default 5)

Output JSON: {"panel": n, "k": k, "floor": 0.7,
              "snapshots": {dir: {"n_vectors": N,
                                  "recall": {family: r},
                                  "min_query_recall": {family: r},
                                  "wall_s": {family: s}}},
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

FLOOR = 0.7


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


def main() -> None:
    dirs = sys.argv[1:] or ["/root/repo/testdata_sf1", "/root/repo/testdata_sf10"]
    n_queries = int(os.environ.get("ANN_RECALL_QUERIES", "200"))
    k = int(os.environ.get("ANN_RECALL_K", "5"))
    out_path = os.environ.get("ANN_RECALL_JSON", "/root/repo/RECALL_r11.json")
    spark = get_session()
    snapshots: dict[str, dict] = {}
    violations: list[str] = []
    for sf_dir in dirs:
        t = load_tables(spark, sf_dir, ["embeddings"])
        emb = t.embeddings
        n_vec = emb.count()
        # ground truth once per snapshot
        t0 = time.time()
        truth = pairs(normalize(brute_topk(emb, k, n_queries)))
        walls = {"brute": round(time.time() - t0, 2)}
        fams = {
            "lsh": lambda: SIM.lsh_topk(emb, k=k, query_max_id=n_queries),
            # nprobe=5 == the catalog llm_ann_ivf_topk config (raised
            # from 3 in r11 exactly because this sweep measured 0.61 at
            # sf1 -- keep this in lockstep with catalog/llm_ops.py)
            "ivf": lambda: SIM.ivf_topk(emb, k=k, query_max_id=n_queries, nprobe=5),
            "sq8": lambda: SIM.sq8_topk(emb, k=k, query_max_id=n_queries),
        }
        recall: dict[str, float] = {}
        min_q: dict[str, float] = {}
        for fam, build in fams.items():
            t0 = time.time()
            got = pairs(normalize(build()))
            walls[fam] = round(time.time() - t0, 2)
            per_q = [
                len(got.get(qid, set()) & tset) / max(len(tset), 1)
                for qid, tset in truth.items()
            ]
            recall[fam] = round(sum(per_q) / max(len(per_q), 1), 4)
            min_q[fam] = round(min(per_q), 4) if per_q else 0.0
            if recall[fam] < FLOOR:
                violations.append(f"{sf_dir}:{fam}={recall[fam]}")
            print(
                f"{sf_dir} {fam}: recall@{k}={recall[fam]}"
                f" min={min_q[fam]} wall={walls[fam]}s",
                flush=True,
            )
        snapshots[sf_dir] = {
            "n_vectors": n_vec,
            "recall": recall,
            "min_query_recall": min_q,
            "wall_s": walls,
        }
        spark.catalog.clearCache()
    out = {
        "panel": n_queries,
        "k": k,
        "floor": FLOOR,
        "snapshots": snapshots,
        "floor_violations": violations,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}; violations: {violations}")


if __name__ == "__main__":
    main()
