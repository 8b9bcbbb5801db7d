"""Audit/assembly operators: contracts beyond the value-hash oracle --
the overlap matrix must recount from a pure-Python shingle set build,
the split must follow the salted-md5 bucket formula document by
document (and be independent of corpus membership), keep-best must pick
the true per-group score argmax, and novelty must recount from a
first-owner dict."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from groove_to_helpscout_migration_tool_spark import catalog
from groove_to_helpscout_migration_tool_spark.catalog.audit_ops import (
    KB,
    TVT_SHARDS,
)
from groove_to_helpscout_migration_tool_spark.operators.dedup import (
    GRAM_A,
    GRAM_B,
    XFOLD,
)
from groove_to_helpscout_migration_tool_spark.session import load_tables


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingles(text: str) -> set[int]:
    hs = [_h60(w) % XFOLD for w in text.split() if w]
    return {
        (hs[i] * GRAM_A + hs[i + 1] * GRAM_B + hs[i + 2]) % XFOLD
        for i in range(len(hs) - 2)
    }


def test_cross_source_overlap_recounts(spark, sf_dir):
    per: dict[str, set[int]] = defaultdict(set)
    docs = load_tables(spark, sf_dir, ["documents"]).documents.collect()
    for d in docs:
        per[d["source"]] |= _shingles(d["text"])
    rows = catalog.QUERIES["llm_cross_source_overlap"].fn(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        a, b = r["src_a"], r["src_b"]
        assert a < b  # unordered pairs, canonical order
        assert (a, b) not in seen
        seen.add((a, b))
        shared = len(per[a] & per[b])
        assert r["n_shared_grams"] == shared
        assert r["n_grams_a"] == len(per[a])
        assert r["n_grams_b"] == len(per[b])
        assert r["containment_milli"] == (1000 * shared) // min(
            len(per[a]), len(per[b])
        )
    # every pair with nonzero overlap must be present
    srcs = sorted(per)
    expect = {
        (a, b)
        for i, a in enumerate(srcs)
        for b in srcs[i + 1 :]
        if per[a] & per[b]
    }
    assert seen == expect


def test_train_val_test_split_formula_and_stability(spark, sf_dir):
    rows = catalog.QUERIES["llm_train_val_test_split"].fn(spark, sf_dir).collect()
    docs = load_tables(spark, sf_dir, ["documents"]).documents.collect()
    assert len(rows) == len(docs)
    for r in rows:
        key = _h60(f"{r['doc_id']}:tvt")
        assert r["bucket"] == key % 1000
        assert r["shard"] == (key // 1000) % TVT_SHARDS
        expect = (
            "train" if key % 1000 < 900 else "val" if key % 1000 < 950 else "test"
        )
        assert r["split"] == expect
    # split is a pure function of doc_id: corpus membership cannot move
    # a document between splits (the property row_number splits lack)
    by_split = defaultdict(int)
    for r in rows:
        by_split[r["split"]] += 1
    assert set(by_split) == {"train", "val", "test"}
    n = len(rows)
    assert 0.8 * n <= by_split["train"] <= 0.97 * n


def test_dedup_keep_best_argmax(spark, sf_dir):
    score = {
        r["doc_id"]: r["score_milli"]
        for r in catalog.QUERIES["llm_quality_classifier_score"].fn(
            spark, sf_dir
        ).collect()
    }
    docs = load_tables(spark, sf_dir, ["documents"]).documents.collect()
    groups: dict[str, list[int]] = defaultdict(list)
    for d in docs:
        groups[hashlib.md5(d["text"].encode()).hexdigest()].append(d["doc_id"])
    rows = catalog.QUERIES["llm_dedup_keep_best"].fn(spark, sf_dir).collect()
    assert len(rows) == len(groups)
    # (sf0.001 has no exact-dup groups -- the multi-copy argmax path is
    # exercised by test_dedup_keep_best_synthetic_dups below)
    for r in rows:
        members = groups[r["th"]]
        best = max(members, key=lambda d: (score[d], -d))
        assert r["doc_id"] == best
        assert r["score_milli"] == score[best]
        assert r["n_copies"] == len(members)
        assert r["had_duplicates"] == (len(members) > 1)
        assert 0 <= best < KB


def test_dedup_keep_best_synthetic_dups(spark, tmp_path):
    """Multi-copy groups with distinct qualities: the survivor must be
    the highest-scoring copy, ties to the LOWEST doc_id -- exercised on
    a synthetic corpus because sf0.001 has no exact duplicates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # 'good good good' scores differently from 'zzz' under the hashed
    # classifier; identical texts share a group regardless of doc_id
    texts = {
        10: "alpha beta gamma delta",
        11: "alpha beta gamma delta",  # dup of 10 (tie -> keep 10)
        20: "one two three",
        21: "one two three",
        22: "one two three",
        30: "solo document",
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values()), type=pa.string()),
            "lang": pa.array(["en"] * len(texts), type=pa.string()),
            "source": pa.array(["s"] * len(texts), type=pa.string()),
            "n_chars": pa.array(
                [len(v) for v in texts.values()], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in catalog.QUERIES["llm_dedup_keep_best"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    # identical text => identical score => tie broken by lowest doc_id
    assert set(rows) == {10, 20, 30}
    assert rows[10]["n_copies"] == 2 and rows[10]["had_duplicates"]
    assert rows[20]["n_copies"] == 3 and rows[20]["had_duplicates"]
    assert rows[30]["n_copies"] == 1 and not rows[30]["had_duplicates"]


def test_ngram_novelty_recounts(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ["documents"]).documents.collect()
    sh = {d["doc_id"]: _shingles(d["text"]) for d in docs}
    first: dict[int, int] = {}
    for did in sorted(sh):
        for g in sh[did]:
            first.setdefault(g, did)
    rows = catalog.QUERIES["llm_ngram_novelty"].fn(spark, sf_dir).collect()
    assert len(rows) == sum(1 for s in sh.values() if s)
    for r in rows:
        grams = sh[r["doc_id"]]
        novel = sum(1 for g in grams if first[g] == r["doc_id"])
        assert r["n_grams"] == len(grams)
        assert r["n_novel"] == novel
        assert r["novelty_milli"] == (1000 * novel) // len(grams)
    # the lowest doc_id with shingles owns everything it has
    lead = min(d for d, s in sh.items() if s)
    lead_row = next(r for r in rows if r["doc_id"] == lead)
    assert lead_row["novelty_milli"] == 1000


def test_retention_cohorts_recounts(spark, sf_dir):
    from collections import defaultdict as dd

    ev = load_tables(spark, sf_dir, ["events"]).events.collect()
    day = lambda ts: int(ts.timestamp() // 86400)  # noqa: E731
    first: dict[int, int] = {}
    for e in ev:
        d = day(e["ts"])
        u = e["user_id"]
        first[u] = min(first.get(u, d), d)
    cells = dd(set)
    for e in ev:
        u = e["user_id"]
        cells[(first[u], day(e["ts"]) - first[u])].add(u)
    csize = dd(int)
    for u, c in first.items():
        csize[c] += 1
    rows = catalog.QUERIES["a05_retention_cohorts"].fn(spark, sf_dir).collect()
    assert len(rows) == len(cells)
    for r in rows:
        key = (r["cohort_day"], r["offset_days"])
        assert r["n_active"] == len(cells[key])
        assert r["n_cohort"] == csize[r["cohort_day"]]
        assert r["retention_milli"] == (1000 * len(cells[key])) // csize[
            r["cohort_day"]
        ]
        if r["offset_days"] == 0:
            assert r["retention_milli"] == 1000  # everyone active on day 0


def test_neardup_keep_best_one_keeper_per_cluster(spark, sf_dir):
    from collections import defaultdict as dd

    rows = catalog.QUERIES["llm_neardup_keep_best"].fn(spark, sf_dir).collect()
    docs = load_tables(spark, sf_dir, ["documents"]).documents.collect()
    assert len(rows) == len(docs)  # one decision row per document
    clusters = dd(list)
    for r in rows:
        clusters[r["cluster_id"]].append(r)
    for cid, members in clusters.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1, cid
        k = keepers[0]
        # the keeper is the (score DESC, doc_id ASC) argmax
        best = max(members, key=lambda m: (m["score_milli"], -m["doc_id"]))
        assert (k["doc_id"], k["score_milli"]) == (
            best["doc_id"],
            best["score_milli"],
        )
    # cluster membership must agree with the certified clusters op
    lab = {
        r["doc_id"]: r["cluster_id"]
        for r in catalog.QUERIES["llm_dedup_clusters"].fn(spark, sf_dir).collect()
    }
    for r in rows:
        assert r["cluster_id"] == lab.get(r["doc_id"], r["doc_id"])


def test_scd2_merge_contract(spark, sf_dir):
    """History invariants: every key has EXACTLY one current row;
    changed keys carry a closed row whose interval abuts the open one;
    inserts exist only as current rows at day 1."""
    from collections import defaultdict as dd

    dim = {
        r["c_custkey"]: r
        for r in load_tables(spark, sf_dir, ["customer"]).customer.collect()
    }
    rows = catalog.QUERIES["d01_scd2_customer_merge"].fn(spark, sf_dir).collect()
    by_key = dd(list)
    for r in rows:
        by_key[r["c_custkey"]].append(r)
    for key, hist in by_key.items():
        current = [h for h in hist if h["is_current"]]
        assert len(current) == 1, key
        assert current[0]["valid_to"] is None
        if key in dim:
            if key % 7 == 3:  # updated: closed [0,1) + open [1, inf)
                closed = [h for h in hist if not h["is_current"]]
                assert len(closed) == 1 and closed[0]["valid_to"] == 1
                assert current[0]["valid_from"] == 1
                assert current[0]["c_mktsegment"].startswith("MOVED-")
            else:
                assert len(hist) == 1 and current[0]["valid_from"] == 0
        else:  # insert (synthetic key)
            assert key - 1000000 in dim and (key - 1000000) % 13 == 1
            assert current[0]["c_mktsegment"] == "NEW"
            assert current[0]["valid_from"] == 1


def test_profile_lineitem_recounts(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"]).lineitem.collect()
    rows = {
        r["col_name"]: r
        for r in catalog.QUERIES["p03_profile_lineitem"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {
        "l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }
    for c in ("l_quantity", "l_returnflag"):
        vals = [r[c] for r in li]
        assert rows[c]["n_rows"] == len(vals)
        assert rows[c]["n_null"] == sum(1 for v in vals if v is None)
        assert rows[c]["n_distinct"] == len({v for v in vals if v is not None})
    q = rows["l_quantity"]
    assert q["min_num"] == min(r["l_quantity"] for r in li)
    assert q["max_num"] == max(r["l_quantity"] for r in li)
    assert q["min_str"] is None
    rf = rows["l_returnflag"]
    assert rf["min_str"] == min(r["l_returnflag"] for r in li)
    assert rf["min_num"] is None
    sd = rows["l_shipdate"]
    days = [int(r["l_shipdate"].timestamp() // 86400) for r in li]
    assert sd["min_num"] == float(min(days)) and sd["max_num"] == float(max(days))


def test_neardup_pagerank_recounts(spark, sf_dir):
    """Pure-Python replay of the integer PageRank recurrence from the
    certified pair list -- a third formulation next to the Spark loop
    and the unrolled-CTE oracle."""
    from groove_to_helpscout_migration_tool_spark.catalog.audit_ops import (
        PR_ROUNDS,
    )

    pairs = [
        (r["doc_i"], r["doc_j"])
        for r in catalog.QUERIES["llm_neardup_minhash_lsh"].fn(
            spark, sf_dir
        ).collect()
    ]
    out_edges = defaultdict(list)
    for i, j in pairs:
        out_edges[i].append(j)
        out_edges[j].append(i)
    deg = {n: len(vs) for n, vs in out_edges.items()}
    rank = {n: 1000 for n in deg}
    for _ in range(PR_ROUNDS):
        inflow = defaultdict(int)
        for s, targets in out_edges.items():
            c = rank[s] // deg[s]
            for d in targets:
                inflow[d] += c
        rank = {n: 150 + (850 * v) // 1000 for n, v in inflow.items()}
    rows = catalog.QUERIES["llm_neardup_pagerank"].fn(spark, sf_dir).collect()
    assert len(rows) == len(deg) > 0
    for r in rows:
        assert r["degree"] == deg[r["doc_id"]]
        assert r["rank_milli"] == rank[r["doc_id"]], r["doc_id"]
    # every rank stays in the damped band: >= the floor 150, and no
    # node can exceed 150 + 0.85 * (sum of neighbor ranks)
    assert all(150 <= r["rank_milli"] for r in rows)


def test_embedding_outlier_flags_synthetic_bignorm(spark, tmp_path):
    """A vector with 10x the typical norm must trip the 2x-mean gate;
    the uniform bulk must not (on this corpus the gate is all-false --
    concentration of measure in 64 dims -- so the discriminating path
    needs a synthetic outlier)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import hashlib

    def vec(seed: int, scale: float) -> list[float]:
        return [
            scale
            * (
                int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:8], 16)
                / 0xFFFFFFFF
                - 0.5
            )
            for j in range(64)
        ]

    vecs = [vec(i, 1.0) for i in range(40)] + [vec(99, 10.0)]
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(41)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([0] * 41, type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = {
        r["vec_id"]: r
        for r in catalog.QUERIES["llm_embedding_outlier"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows[40]["is_outlier"]
    assert sum(1 for r in rows.values() if r["is_outlier"]) == 1
    assert rows[40]["ratio_permille"] > 2000
    bulk = [r["ratio_permille"] for v, r in rows.items() if v != 40]
    assert all(b < 2000 for b in bulk)


def test_ann_incremental_ivf_contract(spark, sf_dir):
    """Delta/base disjointness: every query is a delta vector, every
    neighbor a base vector; ranks are 1..k dense per query and ordered
    by (cosine DESC, nid ASC)."""
    from groove_to_helpscout_migration_tool_spark.catalog.corpus_ops import (
        DELTA_MOD,
    )

    rows = catalog.QUERIES["llm_ann_incremental_ivf"].fn(spark, sf_dir).collect()
    assert rows
    by_q = defaultdict(list)
    for r in rows:
        assert r["query_id"] % DELTA_MOD == 0
        assert r["neighbor_id"] % DELTA_MOD != 0
        by_q[r["query_id"]].append(r)
    for q, nbrs in by_q.items():
        nbrs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in nbrs] == list(range(1, len(nbrs) + 1))
        keys = [(-r["cosine"], r["neighbor_id"]) for r in nbrs]
        assert keys == sorted(keys), q


def test_neardup_containment_recounts(spark, sf_dir):
    """Directional ratios recomputed from pure-Python shingle sets; a
    flagged pair's smaller side must be >= 80% inside the other."""
    docs = load_tables(spark, sf_dir, ["documents"]).documents.collect()
    sh = {d["doc_id"]: _shingles(d["text"]) for d in docs}
    rows = catalog.QUERIES["llm_neardup_containment"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        a, b = sh[r["doc_i"]], sh[r["doc_j"]]
        c = len(a & b)
        assert r["n_common"] == c
        assert r["n_i"] == len(a) and r["n_j"] == len(b)
        assert r["cont_i_in_j_milli"] == (1000 * c) // len(a)
        assert r["cont_j_in_i_milli"] == (1000 * c) // len(b)
        assert max(r["cont_i_in_j_milli"], r["cont_j_in_i_milli"]) >= 800
        # candidates must share their minimum shingle (the anchor)
        assert min(a) == min(b)
