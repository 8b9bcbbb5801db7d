"""Training-signal mining operators: contracts the value-hash oracle
can't express -- hard negatives must be the TRUE top among the
different-label subset (recounted via a naive global window), the kNN
vote must equal a plain-Python recount over the exact neighbor lists,
boilerplate stripping must be source-scoped (a segment's copies under
another source survive), and the dataset card must recount from the raw
table."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from groove_to_helpscout_migration_tool_spark import catalog
from groove_to_helpscout_migration_tool_spark.catalog.mining_ops import (
    BP_MIN_DOCS,
    HN_K,
    HN_QUERIES,
    KNN_K,
    KNN_SEEDS,
    _embeddings_with_norm,
    _zip_dot,
)
from groove_to_helpscout_migration_tool_spark.session import load_tables


def _brute_pairs(spark, sf_dir, query_pred, pool_pred):
    """(qid, nid, nlabel, cosine) for every (query, pool) pair, rounded
    like the operator rounds."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    e = _embeddings_with_norm(t.embeddings)
    q = e.filter(query_pred).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    return (
        e.filter(pool_pred)
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            F.col("vec_id").alias("nid"),
            F.col("label").alias("nlabel"),
            F.round(
                _zip_dot("qv", "v") / (F.col("qnorm") * F.col("norm")), 6
            ).alias("cosine"),
        )
    )


def test_hard_negatives_match_naive_window_ranking(spark, sf_dir):
    """The two-phase salted top-k must equal a naive global window over
    the different-label pairs, rank for rank."""
    out = catalog.QUERIES["llm_hard_negatives"].fn(spark, sf_dir)
    pairs = _brute_pairs(
        spark, sf_dir, F.col("vec_id") < HN_QUERIES, F.lit(True)
    ).filter(F.col("nlabel") != F.col("qlabel"))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    naive = (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= HN_K)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("nid").alias("negative_id"),
        )
    )
    got = out.select("query_id", "rank", "negative_id")
    assert got.count() == HN_QUERIES * HN_K
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_hard_negatives_never_share_the_anchor_label(spark, sf_dir):
    out = catalog.QUERIES["llm_hard_negatives"].fn(spark, sf_dir)
    assert out.filter(F.col("negative_label") == F.col("query_label")).count() == 0
    # and they must be HARD: each anchor's top negative must beat that
    # anchor's MEDIAN different-label similarity (otherwise the mining
    # picked nothing special)
    pairs = _brute_pairs(
        spark, sf_dir, F.col("vec_id") < HN_QUERIES, F.lit(True)
    ).filter(F.col("nlabel") != F.col("qlabel"))
    med = pairs.groupBy("qid").agg(
        F.expr("percentile_approx(cosine, 0.5)").alias("med")
    )
    top1 = out.filter(F.col("rank") == 1).select(
        F.col("query_id").alias("qid"), F.col("cosine").alias("top")
    )
    assert top1.join(med, ["qid"]).filter(F.col("top") <= F.col("med")).count() == 0


def test_knn_vote_matches_python_recount(spark, sf_dir):
    """Exact neighbor lists -> a plain-Python majority vote with the
    same (votes DESC, label ASC) tie-break must reproduce every
    prediction."""
    out = {
        r["vec_id"]: (r["predicted_label"], r["votes"], r["correct"])
        for r in catalog.QUERIES["llm_knn_label_vote"].fn(spark, sf_dir).collect()
    }
    pairs = _brute_pairs(
        spark, sf_dir, F.col("vec_id") < KNN_SEEDS, F.col("vec_id") >= KNN_SEEDS
    )
    rows = pairs.select("qid", "nid", "nlabel", "cosine").collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((-r["cosine"], r["nid"], r["nlabel"]))
    truth = {
        r["vec_id"]: r["label"]
        for r in load_tables(spark, sf_dir, ["embeddings"])
        .embeddings.filter(F.col("vec_id") < KNN_SEEDS)
        .collect()
    }
    assert set(out) == set(by_q)
    for qid, cand in by_q.items():
        cand.sort()
        votes: dict[int, int] = {}
        for _, _, lab in cand[:KNN_K]:
            votes[lab] = votes.get(lab, 0) + 1
        pred, n = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        assert out[qid] == (pred, n, pred == truth[qid]), qid


def test_boilerplate_strip_is_source_scoped_and_reversible(spark, sf_dir):
    """Every stripped segment must be shared by >= BP_MIN_DOCS distinct
    docs WITHIN ITS SOURCE; untouched docs reassemble verbatim; and the
    corpus must actually contain boilerplate (else the test is vacuous)."""
    from groove_to_helpscout_migration_tool_spark.catalog.corpus_ops import (
        _segment_table,
    )
    from groove_to_helpscout_migration_tool_spark.functions import text as TX

    t = load_tables(spark, sf_dir, ["documents"])
    out = catalog.QUERIES["llm_boilerplate_strip"].fn(spark, sf_dir)
    assert out.filter(F.col("n_kept") > F.col("n_segments")).count() == 0
    assert out.filter(F.col("n_kept") < F.col("n_segments")).count() > 0

    norm = t.documents.select(
        "doc_id", F.array_join(TX.tokens(F.col("text")), " ").alias("norm_text")
    )
    full = out.filter(F.col("n_kept") == F.col("n_segments")).join(norm, ["doc_id"])
    assert full.filter(F.col("kept_text") != F.col("norm_text")).count() == 0

    # recount: the set of (source, seg_hash) whose distinct-doc count
    # within the source reaches the threshold == exactly the segments
    # the operator dropped
    src = t.documents.select("doc_id", "source")
    segs = _segment_table(t.documents).join(src, ["doc_id"])
    per = segs.groupBy("source", "seg_hash").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    boiler_hashes = per.filter(F.col("nd") >= BP_MIN_DOCS)
    expected_dropped = (
        segs.join(boiler_hashes, ["source", "seg_hash"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("drop"))
    )
    got_dropped = out.select(
        "doc_id", (F.col("n_segments") - F.col("n_kept")).alias("drop")
    ).filter(F.col("drop") > 0)
    assert got_dropped.exceptAll(expected_dropped).count() == 0
    assert expected_dropped.exceptAll(got_dropped).count() == 0


def test_dataset_card_recounts_from_raw_table(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["documents"])
    card = {r["source"]: r for r in catalog.QUERIES["llm_dataset_card"].fn(spark, sf_dir).collect()}
    rows = t.documents.collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert set(card) == set(by_src)
    for src, docs in by_src.items():
        c = card[src]
        assert c["n_docs"] == len(docs)
        langs = {}
        texts = set()
        ntok = 0
        for d in docs:
            langs[d["lang"]] = langs.get(d["lang"], 0) + 1
            texts.add(d["text"])
            ntok += len([w for w in d["text"].split() if w])
        assert c["n_tokens"] == ntok
        assert c["n_langs"] == len(langs)
        top = min(langs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert c["top_lang"] == top
        assert c["n_dup_docs"] == len(docs) - len(texts)
        # exact integer half-up, the operator's (r9) tie-free formula --
        # NOT python round(), which is half-even and differs on ties
        n = len(docs)
        assert c["avg_doc_tokens"] == ((2 * 100 * ntok + n) // (2 * n)) / 100.0


def test_token_budget_sample_matches_python_recount(spark, sf_dir):
    """The two-phase (shard-offset) cumulative sum must equal a plain
    per-source running sum in (key, doc_id) order; kept sets must be
    non-trivial in both directions."""
    from groove_to_helpscout_migration_tool_spark.catalog.mining_ops import (
        TB_BUDGET,
    )
    from groove_to_helpscout_migration_tool_spark.catalog.llm_ops import _doc_key

    t = load_tables(spark, sf_dir, ["documents"])
    keyed = t.documents.select(
        "doc_id", "source", _doc_key("budget:v1").alias("h"), "text"
    ).collect()
    by_src: dict[str, list] = {}
    for r in keyed:
        n = len([w for w in r["text"].split() if w])
        by_src.setdefault(r["source"], []).append((r["h"], r["doc_id"], n))
    expect = {}
    for src, rows in by_src.items():
        rows.sort()
        cum = 0
        for h, did, n in rows:
            cum += n
            expect[did] = (src, n, cum, cum <= TB_BUDGET)
    out = catalog.QUERIES["llm_token_budget_sample"].fn(spark, sf_dir)
    got = {
        r["doc_id"]: (r["source"], r["n_toks"], r["cum_toks"], r["kept"])
        for r in out.collect()
    }
    assert got == expect
    kept = sum(1 for v in got.values() if v[3])
    assert 0 < kept < len(got)


def test_cluster_assign_is_true_argmax_and_sizes_sum(spark, sf_dir):
    """The codebook-ranking assignment must equal a brute recount: for
    every vector, the assigned cell is the rounded-cosine argmax over
    the refined centroid set (cid tie-break), and cell sizes sum to the
    corpus."""
    from groove_to_helpscout_migration_tool_spark.operators import similarity as SIM

    t = load_tables(spark, sf_dir, ["embeddings"])
    out = catalog.QUERIES["llm_cluster_kmeans_assign"].fn(spark, sf_dir)
    rows = out.collect()
    n = t.embeddings.count()
    assert len(rows) == n
    sizes = {}
    for r in rows:
        sizes[r["cell"]] = sizes.get(r["cell"], 0) + 1
    for r in rows:
        assert r["cell_size"] == sizes[r["cell"]]
    # brute recount of the argmax against the same refined centroids
    emb = SIM.prepared(t.embeddings)
    reps = t.embeddings.groupBy("label").agg(F.min("vec_id").alias("rep_id"))
    cents = emb.join(
        F.broadcast(reps.select(F.col("rep_id").alias("vec_id"))), "vec_id"
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    cents = SIM.refined_centroids(emb, cents, 1)
    pairs = emb.crossJoin(cents).select(
        "vec_id",
        "cid",
        F.round(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("cv"), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / (F.col("nrm") * F.col("cnrm")),
            9,
        ).alias("csim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    brute = {
        r["vec_id"]: (r["cid"], r["csim"])
        for r in pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    }
    for r in rows:
        bc, bs = brute[r["vec_id"]]
        assert r["cell"] == bc and abs(r["centroid_cosine"] - bs) < 1e-12, r


def test_cluster_balanced_sample_rates_recount(spark, sf_dir):
    """Keep rates must recount from the clustering view's cell sizes via
    the integer temperature formula; kept rows must be exactly the
    bucket-below-rate subset of the full assignment; over-dense cells
    must get LOWER rates than sparse cells."""
    import math

    assign = {
        r["vec_id"]: (r["cell"], r["cell_size"])
        for r in catalog.QUERIES["llm_cluster_kmeans_assign"].fn(spark, sf_dir).collect()
    }
    sizes = {}
    for cell, csz in assign.values():
        sizes[cell] = csz
    n_total = sum(sizes.values())
    w_total = sum(math.isqrt(c) for c in sizes.values())
    rates = {
        cell: min(1000, (1000 * (n_total // 2) * math.isqrt(c)) // (w_total * c))
        for cell, c in sizes.items()
    }
    out = catalog.QUERIES["llm_cluster_balanced_sample"].fn(spark, sf_dir).collect()
    assert all(r["keep_rate"] == rates[r["cell"]] for r in out)
    assert all(r["keep_bucket"] < r["keep_rate"] for r in out)
    # exactness of the kept set: recount buckets driver-side
    from groove_to_helpscout_migration_tool_spark.catalog.mining_ops import _cell_key

    t = load_tables(spark, sf_dir, ["embeddings"])
    buckets = {
        r["vec_id"]: r["b"]
        for r in t.embeddings.select(
            "vec_id", (_cell_key() % 1000).alias("b")
        ).collect()
    }
    expect_kept = {
        vid for vid, (cell, _) in assign.items() if buckets[vid] < rates[cell]
    }
    assert {r["vec_id"] for r in out} == expect_kept
    # monotone in the large: cells at least 2x denser must not get a
    # HIGHER rate (the integer isqrt steps wobble +-2% between cells of
    # near-equal size, so strict pairwise monotonicity does not hold)
    for ca, a in sizes.items():
        for cb, b in sizes.items():
            if a >= 2 * b:
                assert rates[ca] <= rates[cb], (ca, cb, a, b)


def test_vote_pack_guard_fails_loudly_on_out_of_range_label(spark):
    """ADVICE r6: a label >= _VOTE_PACK silently corrupts the packed
    argmax (cnt*16 + (15-label) collides across cnt boundaries) and the
    oracle shares the packing, so the hash compare would still pass.
    The runtime guard must raise instead of mispredicting."""
    import pyspark.sql.functions as F
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException, SparkRuntimeException

    from groove_to_helpscout_migration_tool_spark.catalog.mining_ops import _VOTE_PACK

    votes = spark.createDataFrame(
        [(1, _VOTE_PACK, 3), (1, 2, 1)], "qid long, nlabel long, cnt long"
    )
    nlabel_ok = F.when(
        (F.col("nlabel") >= 0) & (F.col("nlabel") < _VOTE_PACK), F.col("nlabel")
    ).otherwise(
        F.raise_error(
            F.format_string("label %s out of range", F.col("nlabel"))
        )
    )
    bad = votes.groupBy("qid").agg(
        F.max(F.col("cnt") * _VOTE_PACK + (F.lit(_VOTE_PACK - 1) - nlabel_ok))
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException, PythonException)):
        bad.collect()


def test_balanced_sample_rate_arithmetic_is_128bit_exact(spark):
    """ADVICE r6: the BIGINT form of 1000*(n_total div 2)*sw overflows
    near n_total*sw ~ 1.8e16. The DECIMAL(38,0) form must produce the
    exact Python-bigint result at magnitudes where BIGINT wraps."""
    import duckdb

    n_total, sw, w_total, c = 10**13, 3_162_277, 5 * 10**9, 10**13
    expect = min(1000, (1000 * (n_total // 2) * sw) // (w_total * c))
    row = spark.createDataFrame(
        [(n_total, sw, w_total, c)], "n_total long, sw long, w_total long, c long"
    )
    got = row.selectExpr(
        "least(CAST(1000 AS BIGINT),"
        " (CAST(1000 AS DECIMAL(38,0)) * (n_total div 2) * sw)"
        " div (CAST(w_total AS DECIMAL(38,0)) * c)) AS r"
    ).first()["r"]
    assert got == expect
    # the DuckDB oracle's HUGEINT form agrees at the same magnitudes
    duck = duckdb.sql(
        f"SELECT least(1000::HUGEINT, (1000::HUGEINT * ({n_total} // 2) *"
        f" {sw}) // ({w_total}::HUGEINT * {c}))"
    ).fetchone()[0]
    assert int(duck) == expect


def test_hard_negatives_ivf_recall_floor(spark, sf_dir):
    """The IVF-indexed miner must recover most of the brute miner's
    negatives (measured 0.78 at sf0.001, 0.84 at sf0.01/0.1 -- floor
    pinned with margin), and every emitted negative must still obey the
    different-label contract."""
    ivf = catalog.QUERIES["llm_hard_negatives_ivf"].fn(spark, sf_dir)
    assert ivf.filter(F.col("negative_label") == F.col("query_label")).count() == 0
    brute = catalog.QUERIES["llm_hard_negatives"].fn(spark, sf_dir)
    bset = {
        (r["query_id"], r["negative_id"]) for r in brute.collect()
    }
    iset = {(r["query_id"], r["negative_id"]) for r in ivf.collect()}
    assert len(bset & iset) / len(bset) >= 0.70


def test_jl_projection_recount_and_norm_envelope(spark, sf_dir):
    """One vector recounted in pure Python must match component-for-
    component; every vector's norm ratio must sit inside the measured
    JL envelope with margin."""
    import math

    from groove_to_helpscout_migration_tool_spark.catalog.mining_ops import (
        _JL_S,
        JL_OUT,
    )

    out = catalog.QUERIES["llm_embedding_jl_project"].fn(spark, sf_dir)
    rows = out.collect()
    assert all(0.55 <= r["norm_ratio"] <= 1.60 for r in rows)
    # round-7 output contract: scalar columns only -- the projected vector
    # ships as a %.6f CSV string, parsed back here for the recount.
    assert all(len(r["proj_csv"].split(",")) == JL_OUT for r in rows)
    t = load_tables(spark, sf_dir, ["embeddings"])
    first = t.embeddings.orderBy("vec_id").first()
    v = [float(x) for x in first["embedding"]]
    expect = [
        round(
            sum(v[i] * _JL_S[i][j] for i in range(len(v))) / math.sqrt(JL_OUT), 6
        )
        for j in range(JL_OUT)
    ]
    got_csv = next(r["proj_csv"] for r in rows if r["vec_id"] == first["vec_id"])
    got = [float(x) for x in got_csv.split(",")]
    assert [round(x, 5) for x in got] == [round(x, 5) for x in expect]


def test_jl_matrix_is_md5_derived_and_balanced():
    """The embedded +-1 matrix must recompute exactly from md5('jl:i:j')
    (guards accidental edits to the literal) and be roughly sign-
    balanced (a skewed matrix would bias every projection)."""
    import hashlib

    from groove_to_helpscout_migration_tool_spark.catalog.mining_ops import (
        _JL_S,
        JL_IN,
        JL_OUT,
    )

    assert len(_JL_S) == JL_IN and all(len(r) == JL_OUT for r in _JL_S)
    for i in range(JL_IN):
        for j in range(JL_OUT):
            h = hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()
            assert _JL_S[i][j] == (1 if int(h[:15], 16) % 2 == 0 else -1)
    pos = sum(1 for r in _JL_S for x in r if x == 1)
    n = JL_IN * JL_OUT
    assert 0.4 < pos / n < 0.6


def test_semantic_dedup_clusters_matches_python_recount(spark, sf_dir):
    """SemDeDup decisions must recount from first principles: rank each
    cell's members by (centroid_cosine DESC, vec_id), verify every
    vector against the top-SEM_ANCHORS anchors that outrank it with a
    round-6 numpy cosine, and a vector is dropped iff any such anchor
    is >= SEM_TAU -- rep = the smallest matching anchor. Also: the
    result must cover every vector exactly once, and keepers must
    include each cell's rank-1 member (nothing outranks it)."""
    import numpy as np

    from groove_to_helpscout_migration_tool_spark.catalog.mining_ops import (
        SEM_ANCHORS,
        SEM_TAU,
    )

    out = {
        r["vec_id"]: r
        for r in catalog.QUERIES["llm_semantic_dedup_clusters"].fn(
            spark, sf_dir
        ).collect()
    }
    assign = catalog.QUERIES["llm_cluster_kmeans_assign"].fn(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_tables(spark, sf_dir, ["embeddings"]).embeddings.collect()
    }
    assert set(out) == set(emb)

    def cos(a, b):
        return round(float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b)), 6)

    cells: dict[int, list] = {}
    # centroid_cosine from the clustering view: identical machinery by
    # construction (shared _kmeans_assigned), so the RANKING is pinned
    for r in assign:
        cells.setdefault(r["cell"], []).append((r["centroid_cosine"], r["vec_id"]))
    n_dropped = 0
    for cell, members in cells.items():
        ranked = sorted(members, key=lambda t: (-t[0], t[1]))
        ids = [v for _c, v in ranked]
        anchors = ids[:SEM_ANCHORS]
        for rank0, vid in enumerate(ids):
            better = [a for a in anchors if ids.index(a) < rank0]
            hits = [a for a in better if cos(emb[vid], emb[a]) >= SEM_TAU]
            row = out[vid]
            assert row["cell"] == cell and row["rank_in_cell"] == rank0 + 1, row
            if hits:
                n_dropped += 1
                rep = min(hits)
                assert row["keep"] is False and row["rep_id"] == rep, (vid, row)
                assert abs(row["rep_cosine"] - cos(emb[vid], emb[rep])) < 1e-9
            else:
                assert row["keep"] is True and row["rep_id"] is None, (vid, row)
        # rank-1 member is always a keeper
        assert out[ids[0]]["keep"] is True
    # the corpus actually exercises the drop path
    assert n_dropped > 0


def test_heavy_hitters_cms_matches_python_recount(spark, sf_dir):
    """The sketch must equal a plain-Python count-min recount (same
    md5-prefix seeded hashes), and the CMS one-sided guarantee must
    hold: estimate >= exact for EVERY candidate, and every true heavy
    hitter (exact >= total DIV 256) must appear in the output -- no
    false negatives, the property that makes estimate-screening safe."""
    import hashlib

    from groove_to_helpscout_migration_tool_spark.catalog.mining_ops import (
        CMS_D,
        CMS_THRESH_DIV,
        CMS_W,
    )

    t = load_tables(spark, sf_dir, ["documents"])
    toks = []
    for r in t.documents.select("text").collect():
        toks.extend(w for w in r["text"].lower().split() if w)

    def bucket(seed: int, term: str) -> int:
        h = hashlib.md5(f"cms{seed}#{term}".encode()).hexdigest()[:15]
        return int(h, 16) % CMS_W

    cells: dict[tuple[int, int], int] = {}
    exact: dict[str, int] = {}
    for w in toks:
        exact[w] = exact.get(w, 0) + 1
        for s in range(CMS_D):
            k = (s, bucket(s, w))
            cells[k] = cells.get(k, 0) + 1
    total = len(toks)
    thresh = total // CMS_THRESH_DIV
    expect = {}
    for w, c in exact.items():
        est = min(cells[(s, bucket(s, w))] for s in range(CMS_D))
        assert est >= c, (w, est, c)  # one-sided error
        if est >= thresh:
            expect[w] = (c, est, est - c, c >= thresh)

    got = {
        r["term"]: (
            r["exact_count"],
            r["cms_estimate"],
            r["overestimate"],
            r["true_heavy"],
        )
        for r in catalog.QUERIES["llm_heavy_hitters_cms"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    # no false negatives: every true heavy hitter survived the
    # estimate-based screen (est >= exact >= thresh)
    for w, c in exact.items():
        if c >= thresh:
            assert w in got


def test_heavy_hitters_cms_exact_leg_is_candidate_bounded(spark, sf_dir):
    """Plan-level proof of the candidate-bounded exact leg (VERDICT r9
    task 4): the term-keyed HashAggregate must sit ABOVE the estimate
    screen (the BroadcastNestedLoopJoin condition `est >= n DIV 256`
    over the row-local least() projection), i.e. exact counting only
    ever sees screened candidate instances -- never the full vocabulary
    (the r9 formulation ran groupBy(term) over the whole token stream
    for certification)."""
    import re

    df = catalog.QUERIES["llm_heavy_hitters_cms"].fn(spark, sf_dir)
    df.collect()  # finalize under AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    # top-down plan text: term-keyed aggregate, then the screen
    # condition (folded into the scalar-total BNLJ), then the least()
    # estimate projection
    assert re.search(
        r"HashAggregate\(?[^\n]*keys=\[term"
        r"[\s\S]*BroadcastNestedLoopJoin [^\n]*est#\d+L >= "
        r"[\s\S]*least\(",
        plan,
    ), plan
    # and no term-keyed aggregate exists BELOW the screen (the old
    # vocabulary-sized leg). AQE's toString repeats the pre-execution
    # plan under "== Initial Plan ==" -- only the final section counts.
    final = plan.split("== Initial Plan ==", 1)[0]
    tail = final.split("BroadcastNestedLoopJoin", 1)[1]
    assert "keys=[term" not in tail, tail


def test_heavy_hitters_cms_output_is_vocabulary_bounded(spark, tmp_path):
    """Behavioral proof on a corpus with a LARGE vocabulary and one hot
    term: the estimate screen must cut the vocabulary by >10x, so the
    exact leg's per-term state is candidate-sized (the sf fixtures'
    ~31-word vocabulary makes every term heavy and cannot show this)."""
    docs = []
    uniq = 0
    for d in range(20):
        words = ["hot"] * 50
        for _ in range(200):
            words.append(f"w{uniq}")
            uniq += 1
        docs.append((d, "src", " ".join(words)))
    spark.createDataFrame(
        docs, "doc_id bigint, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = (
        catalog.QUERIES["llm_heavy_hitters_cms"].fn(spark, str(tmp_path)).collect()
    )
    terms = {r["term"] for r in out}
    assert "hot" in terms  # the true heavy hitter always survives
    # vocabulary = 4001 terms; candidates must be a >10x cut
    assert len(out) * 10 < uniq + 1, (len(out), uniq + 1)
    # and every survivor's exact count is consistent with the screen
    for r in out:
        assert r["cms_estimate"] >= r["exact_count"]


# ---------------------------------------------------------------------------
# scores_vs_query_matrix: the shared Arrow brute-scan stage (r9)
# ---------------------------------------------------------------------------
def test_scores_vs_query_matrix_bit_equal_to_interpreted_fold(spark, sf_dir):
    """The vectorized query-matrix stage must be BIT-identical to the
    interpreted zip_with/aggregate per-pair fold it replaced -- same
    dimension-axis float-add order, so equality is exact (==), not
    approximate."""
    from groove_to_helpscout_migration_tool_spark.operators import similarity as SIM

    t = load_tables(spark, sf_dir, ["embeddings"])
    e = _embeddings_with_norm(t.embeddings)
    q = e.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    got = {
        (r["qid"], r["vec_id"]): (r["cosine"], r["qlabel"])
        for r in SIM.scores_vs_query_matrix(e, q, extras=("qlabel",)).collect()
    }
    naive = {
        (r["qid"], r["nid"]): (r["cosine"], r["qlabel"])
        for r in e.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "qlabel",
            F.col("vec_id").alias("nid"),
            F.round(
                _zip_dot("qv", "v") / (F.col("qnorm") * F.col("norm")), 6
            ).alias("cosine"),
        )
        .collect()
    }
    assert got == naive  # exact float equality, including self-pairs


def test_scores_vs_query_matrix_empty_query_set_keeps_schema(spark, sf_dir):
    """An empty query frame must yield an empty result with the SAME
    schema as the populated path (qid bigint, extras typed from the
    query frame, cosine double) -- the empty-corpus totality contract."""
    from groove_to_helpscout_migration_tool_spark.operators import similarity as SIM

    t = load_tables(spark, sf_dir, ["embeddings"])
    e = _embeddings_with_norm(t.embeddings)
    q = e.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    full = SIM.scores_vs_query_matrix(e, q.filter(F.col("vec_id") < 3), extras=("qlabel",))
    empty = SIM.scores_vs_query_matrix(e, q.filter(F.lit(False)), extras=("qlabel",))
    assert empty.collect() == []
    assert [(f.name, f.dataType) for f in empty.schema.fields] == [
        (f.name, f.dataType) for f in full.schema.fields
    ]
