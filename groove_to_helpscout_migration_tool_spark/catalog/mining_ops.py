"""Training-signal mining operators (round 6, session 3): the ops that
turn a curated corpus into TRAINING SIGNAL -- contrastive negatives,
label propagation over the embedding space, per-domain boilerplate
removal, and the per-source "dataset card" audit a 100 TB corpus ships
with.

  - llm_hard_negatives    : hard-negative mining for contrastive /
        retrieval training -- for each query vector, the most-similar
        corpus vectors with a DIFFERENT label (similar but wrong = the
        gradient-rich negatives).
  - llm_knn_label_vote    : kNN label propagation -- classify a seed
        set of "unlabeled" vectors by majority vote of their k nearest
        labeled neighbors (the embedding-space quality-classifier
        bootstrap shape).
  - llm_boilerplate_strip : per-SOURCE boilerplate removal (the CCNet
        per-domain stage): a segment shared by >= BP_MIN_DOCS distinct
        documents of the same source is site chrome, not content --
        strip every copy within that source.
  - llm_dataset_card      : one audit row per source -- doc/token
        counts, language spread, deterministic top language, exact-dup
        ratio -- the summary table a dataset release documents.
  - llm_token_budget_sample : Chinchilla-style per-source data
        budgeting -- deterministic salted-key order, keep while the
        inclusive cumulative token count fits the budget; two-phase
        sharded cumulative sum, never one window per source.
  - llm_cluster_kmeans_assign : the corpus clustering view (SemDeDup /
        topic-balancing prep) on the certified IVF k-means machinery.
  - llm_cluster_balanced_sample : temperature re-balancing (T=2) over
        the k-means CELLS -- flatten over-dense embedding regions with
        integer-exact deterministic keep rates.
  - llm_hard_negatives_ivf : the negative miner through the IVF index
        (probe nprobe cells, drop same-label, exact re-rank) -- the
        scale path of llm_hard_negatives.
  - llm_embedding_jl_project : Johnson-Lindenstrauss 64->32 random
        projection -- the distance-preserving reducer before expensive
        pairwise stages; deterministic literal matrix, map-only plan.
  - llm_heavy_hitters_cms : count-min-sketch frequent-term mining --
        D x W bounded sketch state (never a vocabulary table), one-
        sided estimates screen heavy-hitter candidates with zero false
        negatives; the sketch-vs-exact columns certify the error.

Reference parity note: the reference tool (a PHP ticket migrator) has
no training-data stage; these extend the engine for the LLM-data
workload like catalog/llm_ops.py / curation_ops.py / corpus_ops.py do.
Every operator carries a DuckDB oracle over the shared parquet tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window as W

from ..functions import text as TX
from ..operators import cache
from ..operators import dedup as DD
from ..registry import register
from ..session import load_tables
from . import corpus_ops as _CO  # registration-order dependency
from . import llm_ops as _LL
from .corpus_ops import SEG_W, _segment_drop_lists, _segment_reassemble, _segment_table

_TOKENS_SQL = _CO._TOKENS_SQL

# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive / retrieval training)
# ---------------------------------------------------------------------------
HN_QUERIES = 10  # vec_id < HN_QUERIES form the anchor set
HN_K = 5
_HN_SALT = 8  # phase-1 fan of the two-phase top-k


def _embeddings_with_norm(emb: DataFrame) -> DataFrame:
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)).alias("norm"),
    )


def _zip_dot(a: str, b: str) -> F.Column:
    # The interpreted higher-order fold. No longer on any production hot
    # path (scores_vs_query_matrix's Arrow stage replaced it, same float
    # order) -- kept as the NAIVE recount the mining tests rank against
    # (tests/test_mining_ops.py::_brute_pairs), which makes those tests
    # an independent bit-exactness check of the Arrow path.
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _two_phase_topk(scored: DataFrame, qid: str, k: int, salt_mod: int) -> DataFrame:
    """The mining-ops entry to the ONE shared salted two-phase top-k
    (operators/similarity.two_phase_topk) with the label column these
    operators all carry. Returns (qid, rank, nid, cosine, nlabel)."""
    from ..operators.similarity import two_phase_topk

    return two_phase_topk(scored, qid, k, salt_mod, label_col="nlabel")


_HN_PAIR_CTES = f"""
e AS (
  SELECT vec_id, label, embedding,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
  FROM embeddings
), q AS (
  SELECT vec_id AS qid, label AS qlabel, embedding AS qv, nrm AS qnrm
  FROM e WHERE vec_id < {HN_QUERIES}
), pairs AS (
  SELECT q.qid, q.qlabel, e.vec_id AS nid, e.label AS nlabel,
         round(
           list_sum(list_transform(range(1, len(q.qv) + 1),
                    i -> q.qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
           / (q.qnrm * e.nrm), 6) AS cosine
  FROM q CROSS JOIN e
  WHERE e.vec_id <> q.qid
)"""


@register(
    "llm_hard_negatives",
    oracle=f"""
WITH {_HN_PAIR_CTES}
SELECT qid AS query_id, qlabel AS query_label,
       CAST(rn AS BIGINT) AS rank, nid AS negative_id,
       nlabel AS negative_label, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rn
  FROM pairs WHERE nlabel <> qlabel
) WHERE rn <= {HN_K}
""",
    doc=(
        "Hard-negative mining for contrastive / retrieval training: for"
        f" each anchor vector (vec_id < {HN_QUERIES}), the top-{HN_K}"
        " most-cosine-similar corpus vectors whose LABEL DIFFERS from the"
        " anchor's -- similar-but-wrong examples, the negatives that carry"
        " gradient (SimCLR/DPR practice). Plan: the anchor set is a"
        " bounded codebook-style fetch (tens of rows by contract), the"
        " corpus streams ONCE through a single Arrow stage that scores"
        " each row against the whole anchor matrix vectorized"
        " (similarity.scores_vs_query_matrix -- dimension-axis"
        " accumulation, bit-identical to the interpreted per-pair fold"
        " it replaced), and top-k is TWO-PHASE (per-salt partial top-k, then a"
        f" merge over <= {_HN_SALT}*{HN_K} rows per anchor) -- no"
        " corpus-wide window partition, so a 100 TB corpus never sorts"
        " inside a 10-partition window. Ranks use the ROUNDED cosine with"
        " vec_id tie-break so Spark/DuckDB float noise cannot flip order."
    ),
)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["embeddings"])
    e = _embeddings_with_norm(t.embeddings)
    q = e.filter(F.col("vec_id") < HN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        SIM.scores_vs_query_matrix(e, q, extras=("qlabel",))
        .filter((F.col("vec_id") != F.col("qid")) & (F.col("label") != F.col("qlabel")))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.col("label").alias("nlabel"),
            "cosine",
        )
    )
    top = _two_phase_topk(scored, "qid", HN_K, _HN_SALT)
    qlab = q.select("qid", "qlabel")
    return top.join(F.broadcast(qlab), ["qid"]).select(
        F.col("qid").alias("query_id"),
        F.col("qlabel").alias("query_label"),
        "rank",
        F.col("nid").alias("negative_id"),
        F.col("nlabel").alias("negative_label"),
        "cosine",
    )


# ---------------------------------------------------------------------------
# kNN label propagation (embedding-space classifier bootstrap)
# ---------------------------------------------------------------------------
KNN_SEEDS = 30  # vec_id < KNN_SEEDS are treated as unlabeled probes
KNN_K = 5
# packed (votes, label) argmax: votes <= KNN_K < 16, label in [0, 16) on
# this corpus -- votes*16 + (15 - label) orders by votes DESC then label
# ASC under a plain integer max(), which stays inside HashAggregate
# codegen (max over a struct falls out into SortAggregate).
_VOTE_PACK = 16


@register(
    "llm_knn_label_vote",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, embedding,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
  FROM embeddings
), q AS (
  SELECT vec_id AS qid, label AS true_label, embedding AS qv, nrm AS qnrm
  FROM e WHERE vec_id < {KNN_SEEDS}
), pairs AS (
  SELECT q.qid, q.true_label, e.vec_id AS nid, e.label AS nlabel,
         round(
           list_sum(list_transform(range(1, len(q.qv) + 1),
                    i -> q.qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
           / (q.qnrm * e.nrm), 6) AS cosine
  FROM q CROSS JOIN e
  WHERE e.vec_id >= {KNN_SEEDS}
), knn AS (
  SELECT qid, true_label, nlabel FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rn
    FROM pairs
  ) WHERE rn <= {KNN_K}
), votes AS (
  SELECT qid, true_label, nlabel, count(*) AS cnt
  FROM knn GROUP BY qid, true_label, nlabel
), best AS (
  SELECT qid, true_label,
         max(cnt * {_VOTE_PACK} + ({_VOTE_PACK} - 1 - nlabel)) AS packed
  FROM votes GROUP BY qid, true_label
)
SELECT qid AS vec_id,
       CAST({_VOTE_PACK} - 1 - (packed % {_VOTE_PACK}) AS BIGINT) AS predicted_label,
       CAST(packed // {_VOTE_PACK} AS BIGINT) AS votes,
       true_label,
       ({_VOTE_PACK} - 1 - (packed % {_VOTE_PACK})) = true_label AS correct
FROM best
""",
    doc=(
        "kNN label propagation (the embedding-space quality-classifier"
        f" bootstrap): each probe vector (vec_id < {KNN_SEEDS}, its stored"
        " label held out as ground truth) is classified by majority vote"
        f" of its {KNN_K} nearest LABELED neighbors (vec_id >="
        f" {KNN_SEEDS}) by rounded cosine. Plan: the probe set is a"
        " bounded codebook-style fetch; the corpus streams once through"
        " ONE Arrow stage scoring each row against the whole probe matrix"
        " (similarity.scores_vs_query_matrix, bit-identical floats to the"
        " per-pair fold it replaced); two-phase salted top-k (no"
        " corpus-wide window),"
        " then the vote argmax is BIT-PACKED into one integer max() --"
        f" votes*{_VOTE_PACK} + ({_VOTE_PACK}-1-label) orders votes DESC,"
        " label ASC, and a plain max stays in HashAggregate codegen where"
        " max(struct(...)) would fall into SortAggregate. Ties are"
        " deterministic by construction; at scale the probe set is the"
        " unlabeled delta and the labeled pool is the corpus, so cost is"
        " one corpus scan per delta batch (the ANN index replaces the"
        " brute scan when the delta outgrows broadcast)."
    ),
)
def llm_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["embeddings"])
    e = _embeddings_with_norm(t.embeddings)
    q = e.filter(F.col("vec_id") < KNN_SEEDS).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = SIM.scores_vs_query_matrix(
        e.filter(F.col("vec_id") >= KNN_SEEDS), q.drop("true_label")
    ).select(
        "qid",
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        "cosine",
    )
    knn = _two_phase_topk(scored, "qid", KNN_K, _HN_SALT)
    votes = knn.groupBy("qid", "nlabel").agg(F.count(F.lit(1)).alias("cnt"))
    # Runtime pack guard (ADVICE r6): the packed argmax is only a valid
    # (votes DESC, label ASC) order while 0 <= label < _VOTE_PACK -- an
    # out-of-range label would collide across cnt boundaries and
    # SILENTLY mispredict (the oracle shares the packing, so the hash
    # compare could not catch data drift). Fail loudly instead.
    nlabel_ok = F.when(
        (F.col("nlabel") >= 0) & (F.col("nlabel") < _VOTE_PACK), F.col("nlabel")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "llm_knn_label_vote: label %%s outside [0, %d) breaks the"
                " packed vote argmax -- raise _VOTE_PACK" % _VOTE_PACK,
                F.col("nlabel"),
            )
        )
    )
    packed = votes.groupBy("qid").agg(
        F.max(
            F.col("cnt") * _VOTE_PACK + (F.lit(_VOTE_PACK - 1) - nlabel_ok)
        ).alias("packed")
    )
    truth = q.select("qid", "true_label")
    pred = F.lit(_VOTE_PACK - 1) - F.pmod(F.col("packed"), F.lit(_VOTE_PACK))
    return packed.join(F.broadcast(truth), ["qid"]).select(
        F.col("qid").alias("vec_id"),
        pred.cast("bigint").alias("predicted_label"),
        (F.col("packed") / _VOTE_PACK).cast("bigint").alias("votes"),
        "true_label",
        (pred == F.col("true_label")).alias("correct"),
    )


# ---------------------------------------------------------------------------
# Per-source boilerplate removal (CCNet per-domain stage)
# ---------------------------------------------------------------------------
BP_MIN_DOCS = 2  # >= this many distinct docs of ONE source share the segment
# Production note: real web corpora use a higher threshold (CCNet strips
# lines shared by >= 2 docs of a domain snapshot; Gopher-style pipelines
# use proportional cutoffs). The synthetic corpus tops out at 2 distinct
# docs per (source, segment), so 2 is the only exercising threshold.


@register(
    "llm_boilerplate_strip",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKENS_SQL} AS t FROM documents
), segs AS (
  SELECT doc_id, source, k AS seg_idx,
         array_to_string(list_slice(t, (k-1)*{SEG_W}+1, k*{SEG_W}), ' ') AS seg_text
  FROM toks, unnest(range(1, CAST(ceil(len(t)/{SEG_W}.0) AS BIGINT) + 1)) AS u(k)
), h AS (
  SELECT doc_id, source, seg_idx, seg_text, md5(seg_text) AS seg_hash FROM segs
), boiler AS (
  SELECT source, seg_hash FROM h
  GROUP BY source, seg_hash HAVING count(DISTINCT doc_id) >= {BP_MIN_DOCS}
), m AS (
  SELECT h.doc_id, h.source, h.seg_idx, h.seg_text,
         (b.seg_hash IS NOT NULL) AS is_boiler
  FROM h LEFT JOIN boiler b ON h.source = b.source AND h.seg_hash = b.seg_hash
)
SELECT doc_id, source,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(coalesce(sum(CASE WHEN NOT is_boiler THEN 1 END), 0) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN NOT is_boiler THEN seg_text END, ' '
                           ORDER BY seg_idx), '') AS kept_text
FROM m GROUP BY doc_id, source
""",
    doc=(
        "Per-source boilerplate removal (the CCNet per-domain line-dedup"
        " stage, over the same fixed 12-token segments as"
        " llm_segment_dedup): a segment appearing in >="
        f" {BP_MIN_DOCS} DISTINCT documents of the SAME source is site"
        " chrome (headers, footers, navigation), not content -- every copy"
        " within that source drops; the same segment under another source"
        " survives. Differs from llm_segment_dedup in both key (source-"
        " scoped, not corpus-wide) and predicate (distinct-DOC count, so a"
        " within-doc repetition is NOT boilerplate). Plan (r13 re-shape,"
        " shared with llm_segment_dedup): the tokenize+md5 segment pass"
        " runs ONCE into a persisted slim (doc_id, source, seg_idx,"
        " seg_hash) stream; distinct-doc counting runs as"
        " groupBy(source, seg_hash, doc_id) collapse then"
        " groupBy(source, seg_hash) count -- two map-side-combining hash"
        " aggregations, never a count-distinct sort; the boilerplate list"
        " is small (chrome is rare) so the mark join against the slim"
        " stream is broadcast-shaped at any scale; kept_text reassembles"
        " in one md5-free text pass with array expressions, no windows."
    ),
)
def llm_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    # source rides the segment scan itself (carry=) and the reassembly
    # pass: the pre-r10 shape broadcast the full (doc_id, source)
    # projection twice, which is corpus-sized -- not broadcastable at
    # 100 TB.
    slim = cache.persist_artifact(
        _segment_table(t.documents, carry=("source",), with_text=False)
    )
    # count(DISTINCT doc_id) as two hash aggregations: collapse the
    # (source, seg_hash, doc_id) triples first (map-side combine kills
    # within-doc repeats early), then count per (source, seg_hash).
    boiler = (
        slim.select("source", "seg_hash", "doc_id")
        .groupBy("source", "seg_hash", "doc_id")
        .agg(F.lit(1).alias("_one"))
        .groupBy("source", "seg_hash")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= BP_MIN_DOCS)
        .select("source", "seg_hash")
    )
    drops = _segment_drop_lists(slim.join(boiler, ["source", "seg_hash"]))
    out = _segment_reassemble(t.documents, drops, carry=("source",))
    return out.select("doc_id", "source", "n_segments", "n_kept", "kept_text")


# ---------------------------------------------------------------------------
# Dataset card: the per-source audit table a corpus release ships with
# ---------------------------------------------------------------------------
@register(
    "llm_dataset_card",
    oracle=f"""
WITH base AS (
  SELECT doc_id, source, lang, n_chars,
         len({_TOKENS_SQL}) AS n_toks, md5(text) AS th
  FROM documents
), per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         ((2 * 100 * sum(n_toks) + count(*)) // (2 * count(*))) / 100.0
           AS avg_doc_tokens,
         ((2 * 100 * sum(n_chars) + count(*)) // (2 * count(*))) / 100.0
           AS avg_chars,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(*) - count(DISTINCT th) AS BIGINT) AS n_dup_docs,
         ((2 * 10000 * (count(*) - count(DISTINCT th)) + count(*))
          // (2 * count(*))) / 10000.0 AS dup_ratio
  FROM base GROUP BY source
), lang_cnt AS (
  SELECT source, lang, count(*) AS cnt FROM base GROUP BY source, lang
), top AS (
  SELECT source, min(struct_pack(ncnt := -cnt, lang := lang)) AS s
  FROM lang_cnt GROUP BY source
)
SELECT p.source, p.n_docs, p.n_tokens, p.avg_doc_tokens, p.avg_chars,
       p.n_langs, t.s.lang AS top_lang, p.n_dup_docs, p.dup_ratio
FROM per_src p JOIN top t USING (source)
""",
    doc=(
        "Dataset card: the one-row-per-source audit table a corpus release"
        " documents -- document/token counts, mean document size, language"
        " spread with a DETERMINISTIC top language (min over"
        " struct(-count, lang) = count DESC, lang ASC -- no arbitrary-tie"
        " mode()), and the exact-duplicate ratio (1 - distinct md5/count"
        " within source). Plan: ONE scan -- the slim tokenized"
        " projection is persisted, because under AQE a twice-referenced"
        " subtree executes per reference (the r13 scan census caught"
        " this query at three documents scans) -- feeding two map-side-"
        "combining aggregations: per-(source, lang) for language mode"
        " AND count in a single aggregate, and per-(source, text-hash)"
        " collapse then per-source for the rest, joined by broadcast on"
        " the tiny source key. Averages are"
        " exact-integer half-up rounds (halfup(10^d * sum / count) /"
        " 10^d via DIV // on both engines), never avg() and never"
        " round(double, d) -- accumulation order cannot wobble the hash"
        " and decimal-tie counts cannot split the engines (r9 DSIR"
        " lesson). At 100 TB this is the cheapest query in the catalog: pure"
        " map-combine tree aggregation, output rows = number of sources."
    ),
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    # persist the slim post-scan projection (r13 scan census): base is
    # referenced by two aggregation branches, and under AQE a twice-
    # referenced subtree executes twice (the round's central finding) --
    # the executed plan held THREE documents scans (per_hash once,
    # lang_cnt once per consumer), each re-running the \s+ tokenize and
    # full-text md5. The persisted frame drops text (source/lang/
    # n_chars/n_toks/th, ~60 B/row), so the expensive scan runs once and
    # both branches read the materialized slim rows.
    base = cache.persist_artifact(
        DD.spread_off_file_layout(t.documents, "doc_id").select(
            "source",
            "lang",
            "n_chars",
            TX.token_count_ws(F.col("text")).alias("n_toks"),
            F.md5("text").alias("th"),
        )
    )
    # count(DISTINCT th) via an explicit pre-collapse keeps both
    # aggregations in plain hash-agg shape (no expand-based distinct).
    per_hash = base.groupBy("source", "th").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("n_toks").alias("toks"),
        F.sum("n_chars").alias("chars"),
    )
    # display averages via exact integer half-up (the DSIR r9 lesson):
    # round(int_sum / count, d) re-rounds a DOUBLE, and when the exact
    # rational lands on the d+1-digit tie (counts carrying 5^(d+1) pick
    # it) Spark's BigDecimal HALF_UP and DuckDB's binary rounding split.
    # halfup(10^d * sum / count) / 10^d is tie-free and engine-exact.
    per_src = per_hash.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
        (
            F.expr("(2 * 100 * sum(toks) + sum(c)) DIV (2 * sum(c))") / 100.0
        ).alias("avg_doc_tokens"),
        (
            F.expr("(2 * 100 * sum(chars) + sum(c)) DIV (2 * sum(c))") / 100.0
        ).alias("avg_chars"),
        (F.sum("c") - F.count(F.lit(1))).cast("bigint").alias("n_dup_docs"),
        (
            F.expr(
                "(2 * 10000 * (sum(c) - count(1)) + sum(c)) DIV (2 * sum(c))"
            )
            / 10000.0
        ).alias("dup_ratio"),
    )
    lang_cnt = base.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    # top language and language count in ONE aggregate over lang_cnt
    # (r13 scan census): as two aggregates, lang_cnt itself was a twice-
    # referenced subtree and re-ran its corpus pass under AQE. Same
    # groups, same expressions -- values identical by construction.
    lang_stats = lang_cnt.groupBy("source").agg(
        F.min(F.struct((-F.col("cnt")).alias("ncnt"), F.col("lang").alias("lang"))).alias(
            "s"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    return (
        per_src.join(F.broadcast(lang_stats), ["source"])
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "avg_doc_tokens",
            "avg_chars",
            "n_langs",
            F.col("s.lang").alias("top_lang"),
            "n_dup_docs",
            "dup_ratio",
        )
    )


# ---------------------------------------------------------------------------
# Per-source token-budget sampling (Chinchilla-style data budgeting)
# ---------------------------------------------------------------------------
TB_BUDGET = 700  # tokens kept per source (inclusive cumulative bound)
# 64 ORDERED shards by 60-bit key prefix: shard = key >> 54 is monotone
# in the key, so (shard ASC, key ASC, doc_id ASC) equals the global
# (key, doc_id) order within a source -- the property that lets the
# cumulative sum run as per-shard windows plus a tiny shard-offset
# window instead of one straggler window per source.
TB_SHARD_SHIFT = 54
TB_KEY_SQL = _LL._DOC_KEY_SQL.format(salt="budget:v1")


@register(
    "llm_token_budget_sample",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_toks,
         {TB_KEY_SQL} AS h
  FROM documents
), c AS (
  SELECT doc_id, source, n_toks,
         sum(n_toks) OVER (PARTITION BY source ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_toks
  FROM toks
)
SELECT doc_id, source, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks,
       cum_toks <= {TB_BUDGET} AS kept
FROM c
""",
    doc=(
        "Per-source token-budget sampling (the Chinchilla-style data-"
        "budget stage): each source contributes documents in a"
        " DETERMINISTIC pseudo-random order (the 60-bit salted md5 key"
        " that stands in for rand() across this catalog) until its"
        f" cumulative token count exceeds {TB_BUDGET}; kept ="
        " inclusive-cumulative-sum <= budget, so reruns and retries pick"
        " the identical subset. The oracle states the semantics as ONE"
        " window per source -- the formulation that does NOT scale (a"
        " 100 TB source is a single sort partition). The Spark plan is"
        " TWO-PHASE instead, the llm_pack_sequences trick applied to"
        " sources: 64 ORDERED shards by key prefix (shard = key >> 54 is"
        " monotone in the key), a per-(source, shard) running sum over"
        " well-spread partitions, shard totals rolled into exclusive"
        " offsets by a window over the tiny (source x 64)-row frame, and"
        " cum = offset + intra. Equality with the oracle holds because"
        " shard order refines key order exactly."
    ),
)
def llm_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    toks = t.documents.select(
        "doc_id",
        "source",
        TX.token_count_ws(F.col("text")).cast("bigint").alias("n_toks"),
        _LL._doc_key("budget:v1").alias("h"),
    ).withColumn("shard", F.shiftright(F.col("h"), TB_SHARD_SHIFT))
    intra_w = (
        W.partitionBy("source", "shard")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    intra = toks.withColumn("intra_cum", F.sum("n_toks").over(intra_w))
    shard_tot = toks.groupBy("source", "shard").agg(
        F.sum("n_toks").alias("tot")
    )
    # exclusive shard offset: running total minus own -- the window frame
    # is (sources x <=64) rows, driver-trivial at any corpus size
    off_w = (
        W.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = shard_tot.withColumn(
        "off", F.sum("tot").over(off_w) - F.col("tot")
    ).select("source", "shard", "off")
    cum = intra.join(F.broadcast(offsets), ["source", "shard"]).withColumn(
        "cum_toks", (F.col("off") + F.col("intra_cum")).cast("bigint")
    )
    return cum.select(
        "doc_id",
        "source",
        "n_toks",
        "cum_toks",
        (F.col("cum_toks") <= TB_BUDGET).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Corpus k-means clustering view (SemDeDup / topic-balancing prep)
# ---------------------------------------------------------------------------
from ..operators import similarity as SIM  # noqa: E402


def _kmeans_assign_oracle(n_iter: int = 1) -> str:
    """Clustering-view oracle on the SHARED IVF CTE prefix
    (llm_ops._ivf_ctes): same deterministic init, same fixed-point Lloyd
    refinement, same rounded-cosine argmax -- only the final SELECT
    differs (every vector's assignment + cell occupancy instead of a
    query probe)."""
    ctes = _LL._ivf_ctes(n_iter)
    return "WITH " + ",\n".join(ctes) + """
, sizes AS (SELECT cell, count(*) AS cell_size FROM assigned GROUP BY cell)
SELECT a.vec_id, a.cell, a.csim AS centroid_cosine,
       CAST(s.cell_size AS BIGINT) AS cell_size
FROM assigned a JOIN sizes s USING (cell)
"""


def _kmeans_assigned(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(assigned, emb): every embedding's (vec_id, cell, centroid_cosine)
    after one deterministic Lloyd round, plus the prepared embedding
    frame -- the shared front half of llm_cluster_kmeans_assign and
    llm_semantic_dedup_clusters (identical cells by construction; the
    oracles share llm_ops._ivf_ctes the same way)."""
    t = load_tables(spark, sf_dir, ["embeddings"])
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
    best = F.element_at(F.col("_csims"), 1)
    assigned = SIM._with_cell_ranking(emb, SIM._codebook(cents)).select(
        "vec_id",
        (-best["ncid"]).alias("cell"),
        best["csim"].alias("centroid_cosine"),
    )
    return assigned, emb


@register(
    "llm_cluster_kmeans_assign",
    oracle=_kmeans_assign_oracle(n_iter=1),
    doc=(
        "Corpus k-means clustering view (the SemDeDup / topic-balancing"
        " prep stage): every embedding's cell after one deterministic"
        " Lloyd round, with its cosine to the winning centroid and the"
        " cell's occupancy. Same machinery the IVF ANN index certifies"
        " (operators/similarity.refined_centroids + the O(1)-in-C"
        " codebook ranking -- one Arrow dots stage, per-row argmax, NO"
        " N x C crossJoin and NO per-vector window), so the clustering"
        " output and the ANN index can never disagree; the oracle shares"
        " the IVF oracle's CTE prefix verbatim (llm_ops._ivf_ctes)."
        " Downstream: SemDeDup prunes within-cell near-duplicates, data"
        " mixers re-weight cells, and cell_size exposes the imbalance a"
        " production pipeline monitors. At 100 TB the assignment is the"
        " same build-once cell-partitioned artifact IVF persists."
    ),
)
def llm_cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned, _emb = _kmeans_assigned(spark, sf_dir)
    sizes = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("cell_size")
    )
    return assigned.join(F.broadcast(sizes), ["cell"]).select(
        "vec_id", "cell", "centroid_cosine", "cell_size"
    )


# ---------------------------------------------------------------------------
# Cluster-level semantic dedup (SemDeDup): k-means cells -> within-cell
# cosine-threshold keep-best
# ---------------------------------------------------------------------------
SEM_TAU = 0.35       # within-cell duplicate threshold (rounded cosine)
SEM_ANCHORS = 8      # per-cell anchor budget (the candidate-side cap)


@register(
    "llm_semantic_dedup_clusters",
    oracle=(
        "WITH "
        + ",\n".join(_LL._ivf_ctes(1))
        + f"""
, rk AS (
  SELECT vec_id, v, cell, csim,
         row_number() OVER (PARTITION BY cell ORDER BY csim DESC, vec_id)
           AS rank_in_cell
  FROM assigned
), anch AS (
  SELECT vec_id, v, cell, rank_in_cell FROM rk
  WHERE rank_in_cell <= {SEM_ANCHORS}
), hits AS (
  SELECT x.vec_id, min(a.vec_id) AS rep_id,
         min_by({_LL._cos_sql('x.v', 'a.v', 6)}, a.vec_id) AS rep_cosine
  FROM rk x JOIN anch a
    ON a.cell = x.cell AND a.rank_in_cell < x.rank_in_cell
  WHERE {_LL._cos_sql('x.v', 'a.v', 6)} >= {SEM_TAU}
  GROUP BY x.vec_id
)
SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell,
       CAST(r.rank_in_cell AS BIGINT) AS rank_in_cell,
       h.rep_id, h.rep_cosine,
       h.rep_id IS NULL AS keep
FROM rk r LEFT JOIN hits h USING (vec_id)
"""
    ),
    doc=(
        "CLUSTER-LEVEL semantic dedup (the SemDeDup shape: Abbas et al."
        " 2023, public arXiv:2303.09540 -- k-means the embedding space,"
        " then prune near-duplicates WITHIN each cell): vectors get the"
        " same one-Lloyd-round cells as llm_cluster_kmeans_assign"
        " (shared _kmeans_assigned builder + shared llm_ops._ivf_ctes"
        " oracle prefix, so cells can never drift between the two"
        " views), are ranked within their cell by closeness to the"
        " centroid (csim DESC, vec_id tiebreak = 'best extraction"
        " first'), and every vector verifies exact cosine against the"
        f" cell's top-{SEM_ANCHORS} ranked ANCHORS that outrank it;"
        f" cosine >= {SEM_TAU} to any such anchor marks it a duplicate"
        " (rep_id = smallest matching anchor, the same smallest-"
        "verified-anchor convention as llm_semantic_dedup_assign)."
        " keep = no better-ranked anchor is near. Scale: candidates are"
        f" O(N x {SEM_ANCHORS}) -- the anchor budget plays the role"
        " cap_bucket+star_pairs play for the LSH family (a dense cell"
        " contributes width x anchors candidates, never width^2); the"
        " within-cell ranking is ONE window shuffled on cell, vectors"
        " rejoin per candidate Arrow-batched (_rejoin_cosine), output"
        " is exactly N rows. The oracle replays cells + ranking +"
        " verify over the shared IVF prefix with the identical"
        " round-6 cosine."
    ),
)
def llm_semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned, emb = _kmeans_assigned(spark, sf_dir)
    rk_w = W.partitionBy("cell").orderBy(F.desc("centroid_cosine"), "vec_id")
    rk = cache.persist_artifact(
        assigned.withColumn(
            "rank_in_cell", F.row_number().over(rk_w).cast("bigint")
        )
    )
    anch = rk.filter(F.col("rank_in_cell") <= SEM_ANCHORS).select(
        F.col("vec_id").alias("anchor"),
        "cell",
        F.col("rank_in_cell").alias("a_rank"),
    )
    cand = (
        rk.select("vec_id", "cell", "rank_in_cell")
        .join(anch, ["cell"])
        .filter(F.col("a_rank") < F.col("rank_in_cell"))
        .select("vec_id", "anchor")
    )
    scored = SIM._rejoin_cosine(cand, emb, "vec_id", "anchor", "qv", "av")
    hits = (
        scored.filter(F.col("cosine") >= SEM_TAU)
        .groupBy("vec_id")
        .agg(
            F.min("anchor").alias("rep_id"),
            F.min_by("cosine", "anchor").alias("rep_cosine"),
        )
    )
    return rk.join(hits, ["vec_id"], "left").select(
        "vec_id",
        F.col("cell").cast("bigint").alias("cell"),
        "rank_in_cell",
        "rep_id",
        "rep_cosine",
        F.col("rep_id").isNull().alias("keep"),
    )


# ---------------------------------------------------------------------------
# Cluster-balanced sampling (flatten the cell mixture, SemDeDup-style)
# ---------------------------------------------------------------------------
_CELL_KEY_SQL = "(('0x' || substr(md5(vec_id::VARCHAR || ':cellmix:t0.5'), 1, 15))::BIGINT)"


def _cell_key() -> F.Column:
    return TX.word_hash(
        F.concat(F.col("vec_id").cast("string"), F.lit(":cellmix:t0.5"))
    )


@register(
    "llm_cluster_balanced_sample",
    oracle=(
        "WITH "
        + ",\n".join(_LL._ivf_ctes(1))
        + f"""
, sizes AS (
  SELECT cell, count(*) AS c FROM assigned GROUP BY cell
), s AS (
  SELECT cell, c, CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS sw FROM sizes
), tot AS (
  SELECT sum(c) AS n_total, sum(sw) AS w_total FROM s
), rates AS (
  SELECT cell,
         least(1000::HUGEINT,
               (1000::HUGEINT * (n_total // 2) * sw) // (w_total::HUGEINT * c))
           AS keep_rate
  FROM s, tot
)
SELECT a.vec_id, a.cell,
       CAST(r.keep_rate AS BIGINT) AS keep_rate,
       CAST({_CELL_KEY_SQL.replace('vec_id', 'a.vec_id')} % 1000 AS BIGINT)
         AS keep_bucket
FROM assigned a JOIN rates r USING (cell)
WHERE {_CELL_KEY_SQL.replace('vec_id', 'a.vec_id')} % 1000 < r.keep_rate
"""
    ),
    doc=(
        "Cluster-balanced sampling: the temperature re-balancing rule"
        " (T = 2, weight ~ count^0.5 -- llm_lang_temperature_sample's"
        " integer-exact machinery) applied to the K-MEANS CELLS of the"
        " clustering view instead of a metadata column, targeting ~half"
        " the corpus while flattening over-dense embedding regions --"
        " the mixing step SemDeDup-style pipelines run after clustering"
        " (topical balance, not just label balance). Keep decisions are"
        " per-mille buckets of a salted md5 key, so reruns are"
        " reproducible and the oracle is integer-exact; the cell rate"
        " table is cells-sized and broadcast. The oracle extends the"
        " shared IVF CTE prefix (llm_ops._ivf_ctes), so the clustering"
        " it samples is bit-identical to the certified assignment."
    ),
)
def llm_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = (
        llm_cluster_kmeans_assign(spark, sf_dir)
        .select("vec_id", "cell", F.col("cell_size").alias("c"))
    )
    # cell_size is constant within a cell; max() collapses it exactly
    stats = assigned.groupBy("cell").agg(F.max("c").alias("c")).select(
        "cell",
        "c",
        F.floor(F.sqrt(F.col("c").cast("double"))).cast("bigint").alias("sw"),
    )
    # 128-bit exact rate arithmetic (ADVICE r6): in BIGINT the numerator
    # 1000 * (n_total div 2) * sw overflows once n_total*sw nears
    # ~1.8e16 -- i.e. at the 100 TB corpus the doc narrative targets.
    # DECIMAL(38,0) on the Spark side and HUGEINT in the DuckDB oracle
    # hold the full product exactly (bound ~1e38 >> any corpus), so the
    # formula stays integer-exact with NO added rounding step; `div`
    # returns the floored BIGINT both engines agree on.
    # Totals via a global window over the O(cells) aggregate, not a
    # second stats reference through agg+crossJoin: AQE does not
    # stage-reuse a twice-referenced subtree (r13 finding, q11), so the
    # broadcast-total form re-ran the whole kmeans-assign cascade above
    # stats. Single-partition window over a cells-bounded frame; integer
    # sums are order-free, values bit-identical.
    tot_w = W.partitionBy()
    rates = stats.select(
        "cell",
        "c",
        "sw",
        F.sum("c").over(tot_w).alias("n_total"),
        F.sum("sw").over(tot_w).alias("w_total"),
    ).select(
        "cell",
        F.least(
            F.lit(1000).cast("bigint"),
            F.expr(
                "(CAST(1000 AS DECIMAL(38,0)) * (n_total div 2) * sw)"
                " div (CAST(w_total AS DECIMAL(38,0)) * c)"
            ),
        ).alias("keep_rate"),
    )
    bucket = _cell_key() % 1000
    return (
        assigned.join(F.broadcast(rates), ["cell"])
        .filter(bucket < F.col("keep_rate"))
        .select(
            "vec_id",
            "cell",
            F.col("keep_rate").cast("bigint").alias("keep_rate"),
            bucket.cast("bigint").alias("keep_bucket"),
        )
    )


# ---------------------------------------------------------------------------
# Hard negatives through the IVF index (the scale path of the miner)
# ---------------------------------------------------------------------------
HN_IVF_NPROBE = 3


def _hn_ivf_oracle() -> str:
    ctes = _LL._ivf_ctes(0)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
, probes AS (
  SELECT vec_id AS qid, cid AS cell FROM ranked
  WHERE crank <= {HN_IVF_NPROBE} AND vec_id < {HN_QUERIES}
), cand AS (
  SELECT DISTINCT p.qid, a.vec_id AS nid
  FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.qid
), lab AS (
  SELECT c.qid, c.nid, eq.label AS qlabel, en.label AS nlabel
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.qid
  JOIN embeddings en ON en.vec_id = c.nid
  WHERE en.label <> eq.label
), scored AS (
  SELECT l.qid, l.qlabel, l.nid, l.nlabel,
         {_LL._cos_sql('ev.v', 'nv.v', 6)} AS cosine
  FROM lab l JOIN e ev ON ev.vec_id = l.qid JOIN e nv ON nv.vec_id = l.nid
)
SELECT qid AS query_id, qlabel AS query_label, CAST(rn AS BIGINT) AS rank,
       nid AS negative_id, nlabel AS negative_label, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rn
  FROM scored
) WHERE rn <= {HN_K}
"""
    )


@register(
    "llm_hard_negatives_ivf",
    oracle=_hn_ivf_oracle(),
    doc=(
        "Hard-negative mining THROUGH the IVF index (the scale path of"
        " llm_hard_negatives, exactly as llm_ann_ivf_topk is the scale"
        f" path of the brute ANN baseline): each anchor probes its"
        f" {HN_IVF_NPROBE} nearest cells, candidates drop same-label"
        " rows, and survivors exact-re-rank on the shared rounded-cosine"
        " path -- so at 100 TB the miner touches nprobe cells instead of"
        " the corpus, reusing the SAME build-once cell assignment the"
        " ANN index persists. The oracle mirrors the algorithm on the"
        " shared IVF CTE prefix; recall vs the brute miner is"
        " floor-tested in tests/test_mining_ops.py (similar-but-wrong"
        " vectors concentrate in the anchor's own cells, which is the"
        " reason cell probing works for negative mining at all)."
    ),
)
def llm_hard_negatives_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = SIM.prepared(t.embeddings)
    labels = t.embeddings.select("vec_id", "label")
    reps = t.embeddings.groupBy("label").agg(F.min("vec_id").alias("rep_id"))
    cents = emb.join(
        F.broadcast(reps.select(F.col("rep_id").alias("vec_id"))), "vec_id"
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    book = SIM._codebook(cents)
    assigned = SIM._with_cell_ranking(emb, book).select(
        "vec_id",
        (-F.element_at(F.col("_csims"), 1)["ncid"]).alias("cell"),
    )
    probes = (
        SIM._with_cell_ranking(emb.filter(F.col("vec_id") < HN_QUERIES), book)
        .select(
            F.col("vec_id").alias("qid"),
            F.explode(F.slice(F.col("_csims"), 1, HN_IVF_NPROBE)).alias("_s"),
        )
        .select("qid", (-F.col("_s")["ncid"]).alias("cell"))
    )
    cand = (
        probes.join(assigned, ["cell"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nid"))
        .distinct()
    )
    ql = labels.select(F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"))
    nl = labels.select(F.col("vec_id").alias("nid"), F.col("label").alias("nlabel"))
    cand = (
        cand.join(F.broadcast(ql), ["qid"])
        .join(nl, ["nid"])
        .filter(F.col("nlabel") != F.col("qlabel"))
    )
    scored = SIM._rejoin_cosine(
        cand.select("qid", "nid", "nlabel"), emb, "qid", "nid", "qv", "nv"
    )
    top = _two_phase_topk(
        scored.select("qid", "nid", "nlabel", "cosine"), "qid", HN_K, _HN_SALT
    )
    return top.join(F.broadcast(ql), ["qid"]).select(
        F.col("qid").alias("query_id"),
        F.col("qlabel").alias("query_label"),
        "rank",
        F.col("nid").alias("negative_id"),
        F.col("nlabel").alias("negative_label"),
        "cosine",
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (distance-preserving reducer)
# ---------------------------------------------------------------------------
import hashlib as _hashlib  # noqa: E402
import math as _math  # noqa: E402

JL_IN = 64   # source embedding dim (the testdata layout)
JL_OUT = 32  # projected dim: 2x cheaper distances, norm ratio within
             # [0.61, 1.51] measured across all three SFs


def _jl_sign(i: int, j: int) -> int:
    """Deterministic +-1 from md5('jl:i:j') -- the same digest family
    every other salted decision in this catalog uses, so the projection
    matrix is reproducible from the code alone (no RNG state). Computed
    ONCE at import and embedded as LITERALS in both the Spark plan and
    the oracle SQL: neither engine re-hashes at run time."""
    h = _hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()
    return 1 if int(h[:15], 16) % 2 == 0 else -1


_JL_S = [[_jl_sign(i, j) for j in range(JL_OUT)] for i in range(JL_IN)]
_JL_SQL_MATRIX = (
    "[" + ", ".join("[" + ", ".join(str(x) for x in row) + "]" for row in _JL_S) + "]"
)


@register(
    "llm_embedding_jl_project",
    oracle=f"""
WITH s AS (SELECT {_JL_SQL_MATRIX} AS m), e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
), p AS (
  SELECT vec_id, v,
         list_transform(range(1, {JL_OUT} + 1), j ->
           round(list_sum(list_transform(range(1, {JL_IN} + 1),
                          i -> v[i] * m[i][j]))
                 / sqrt({JL_OUT}.0), 6) + 0.0) AS proj
  FROM e, s
)
SELECT vec_id,
       array_to_string(list_transform(proj, y -> printf('%.6f', y)), ',')
         AS proj_csv,
       round(sqrt(list_sum(list_transform(proj, y -> y * y)))
             / sqrt(list_sum(list_transform(v, x -> x * x))), 4) AS norm_ratio
FROM p
""",
    doc=(
        "Johnson-Lindenstrauss random projection"
        f" ({JL_IN} -> {JL_OUT} dims): the distance-preserving reducer"
        " large-scale semantic-dedup / clustering pipelines run before"
        " the expensive pairwise stages -- halve every downstream dot"
        " product while keeping norms within the JL envelope (measured"
        " [0.61, 1.51] on this corpus, bound-tested). The +-1 projection"
        " matrix derives each sign from md5('jl:i:j') at import and"
        " enters BOTH engines as the same literal, so the oracle is"
        " bit-exact (ascending-i sequential folds on both sides, the"
        " catalog's standard dot-product contract). Plan: map-only, one"
        " scan pruned to (vec_id, embedding), zero Exchange -- at 100 TB"
        " this is a streaming column transform writing the build-once"
        " projected table the ANN/dedup family then consumes."
    ),
)
def llm_embedding_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["embeddings"])
    v = F.col("embedding").cast("array<double>")
    rt = F.lit(float(_math.sqrt(JL_OUT)))
    cols = []
    for j in range(JL_OUT):
        sj = F.lit([float(_JL_S[i][j]) for i in range(JL_IN)])
        dot = F.aggregate(
            F.zip_with(v, sj, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # + 0.0 normalizes IEEE negative zero: DuckDB's round(-4e-7, 6)
        # yields -0.0 (printf '-0.000000') while Spark's Round (BigDecimal
        # HALF_UP) yields +0.0 -- any component in (-5e-7, 0) would hash-
        # mismatch without this. -0.0 + 0.0 = +0.0 in round-to-nearest,
        # identity for every other value; mirrored in the oracle's p CTE.
        cols.append(F.round(dot / rt, 6) + F.lit(0.0))
    proj = F.array(*cols)
    ssq = lambda a: F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)  # noqa: E731
    out = t.embeddings.select("vec_id", v.alias("v"), proj.alias("proj"))
    # Output contract (round 7): the official driver canonicalizes results
    # in pandas, where a list-typed cell is unhashable/unsortable -- every
    # catalog query must emit SCALAR columns only. Serialize the projected
    # vector to a deterministic CSV string: each component is already
    # rounded to 6 decimals, and %.6f of the same double is bit-identical
    # across Java's Formatter and DuckDB's printf (no decimal halfway case
    # of the form n/10^6 + 5/10^7 is representable in binary, so the two
    # formatters can never disagree on the rounding of digit 7).
    proj_csv = F.concat_ws(
        ",", F.transform(F.col("proj"), lambda y: F.format_string("%.6f", y))
    )
    return out.select(
        "vec_id",
        proj_csv.alias("proj_csv"),
        F.round(F.sqrt(ssq(F.col("proj"))) / F.sqrt(ssq(F.col("v"))), 4).alias(
            "norm_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters: bounded-state frequent-term mining
# ---------------------------------------------------------------------------
CMS_D = 4        # independent hash rows
CMS_W = 2048     # buckets per row; total sketch state = D*W = 8192 cells
CMS_THRESH_DIV = 256  # heavy-hitter threshold = total_tokens DIV 256


def _cms_bucket_sql(seed: int, term: str) -> str:
    """DuckDB mirror of the seeded CMS bucket hash (md5-prefix 60-bit)."""
    return (
        f"(('0x' || substr(md5('cms{seed}#' || {term}), 1, 15))::BIGINT)"
        f" % {CMS_W}"
    )


_CMS_CELLS_SQL = " UNION ALL ".join(
    f"SELECT {s} AS s, {_cms_bucket_sql(s, 'term')} AS b, count(*) AS c"
    f" FROM tok GROUP BY 2"
    for s in range(CMS_D)
)

_CMS_EST_SQL = " UNION ALL ".join(
    f"SELECT term, exact_count, {_cms_bucket_sql(s, 'term')} AS b, {s} AS s"
    f" FROM term_counts"
    for s in range(CMS_D)
)


@register(
    "llm_heavy_hitters_cms",
    oracle=f"""
WITH tok AS (
  SELECT unnest(list_filter(str_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS term
  FROM documents
), cells AS (
  {_CMS_CELLS_SQL}
), term_counts AS (
  SELECT term, count(*) AS exact_count FROM tok GROUP BY term
), tot AS (
  SELECT count(*) AS n FROM tok
), probes AS (
  {_CMS_EST_SQL}
), est AS (
  SELECT p.term, p.exact_count, min(c.c) AS cms_estimate
  FROM probes p JOIN cells c ON c.s = p.s AND c.b = p.b
  GROUP BY p.term, p.exact_count
)
SELECT term,
       CAST(exact_count AS BIGINT) AS exact_count,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - exact_count AS BIGINT) AS overestimate,
       exact_count >= n // {CMS_THRESH_DIV} AS true_heavy
FROM est, tot
WHERE cms_estimate >= n // {CMS_THRESH_DIV}
""",
    doc=(
        "Count-min-sketch heavy hitters: the bounded-memory frequent-term"
        f" mine. {CMS_D} independent md5-seeded hash rows x {CMS_W}"
        " buckets; every token increments one cell per row (map-side"
        " partial agg collapses each partition to <= D*W cells before ONE"
        f" bounded shuffle of {CMS_D * CMS_W} cells -- the sketch is the"
        " whole aggregation state, NO vocabulary table, which is the 100-"
        "TB story: exact top-k needs per-term state that grows with the"
        " billions-term vocabulary, the sketch never exceeds 8192"
        " counters and merges associatively across executors/days/"
        "snapshots). A term's estimate = min over rows of its cell"
        " (one-sided: estimate >= true count, pinned by test and by the"
        " overestimate column). Candidates are screened on the ESTIMATE"
        " >= total/256 BEFORE any per-term aggregation: each token row"
        f" looks its {CMS_D} cells up via chained {CMS_W}-row broadcast"
        " joins (one per sketch row -- no fanout, each bucket key hits"
        " exactly one cell) and a row-local least(); only the surviving"
        " token instances reach the term-keyed exact count, so the"
        " whole query's aggregation state is sketch-cells + candidate"
        " terms -- NEVER the vocabulary (r9 shipped a vocabulary-sized"
        " exact leg for certification; VERDICT r9 task 4 closed it)."
        " One-sidedness makes the screen lossless: every true heavy"
        " hitter's estimate >= its true count >= threshold, so no false"
        " negatives (CMS's guarantee), while false positives are bounded"
        f" by the eps = e/{CMS_W} overestimate mass. The total-token"
        " threshold derives from the sketch itself (sum of one row's"
        " cells), not a second corpus pass. Both engines compute the"
        " sketch cell-for-cell (shared md5-prefix hash), so every column"
        " is integer-exact cross-engine."
    ),
)
def llm_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    tok = DD.spread_off_file_layout(t.documents, "doc_id").select(
        F.explode(TX.tokens(F.lower(F.col("text")))).alias("term")
    )
    tok = cache.persist_artifact(tok)

    def bucket(seed: int, col):
        return TX.word_hash(F.concat(F.lit(f"cms{seed}#"), col)) % CMS_W

    # pass 1 (the sketch): token stream -> (row, bucket) cells. The x D
    # fanout is map-only; partial aggregation bounds every partition's
    # state (and the single shuffle) at D*W counters.
    cells = (
        tok.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"), bucket(s, F.col("term")).alias("b")
                        )
                        for s in range(CMS_D)
                    ]
                )
            ).alias("x")
        )
        .select("x.s", "x.b")
        .groupBy("s", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = cache.persist_artifact(cells)
    # total tokens = sum of any ONE sketch row's cells (every token
    # increments exactly one cell per row) -- no second corpus pass
    total = cells.filter(F.col("s") == 0).agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n")
    )
    # pass 2 (the screen): each token row looks up its D cells via
    # chained broadcast joins -- each join side is one sketch row
    # (<= CMS_W rows), each key matches exactly one cell (no fanout),
    # so this stays a map-only pipeline over the token stream
    cand = tok
    for s in range(CMS_D):
        row_s = cells.filter(F.col("s") == s).select(
            F.col("b").alias(f"b{s}"), F.col("c").alias(f"c{s}")
        )
        cand = cand.withColumn(f"b{s}", bucket(s, F.col("term"))).join(
            F.broadcast(row_s), [f"b{s}"]
        )
    est_col = F.least(*[F.col(f"c{s}") for s in range(CMS_D)])
    thresh = F.expr(f"n DIV {CMS_THRESH_DIV}")
    cand = (
        cand.withColumn("est", est_col)
        .crossJoin(F.broadcast(total))
        .filter(F.col("est") >= thresh)
        .select("term", "est", "n")
    )
    # pass 3 (the certificate): exact counts over CANDIDATE instances
    # only -- per-term state is bounded by the screened candidate set
    # (<= ~CMS_THRESH_DIV true heavies + eps-mass false positives),
    # never by the vocabulary
    return (
        cand.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_count"),
            F.min("est").cast("bigint").alias("cms_estimate"),
            F.min("n").alias("_n"),
        )
        .select(
            "term",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count"))
            .cast("bigint")
            .alias("overestimate"),
            (
                F.col("exact_count") >= F.expr(f"_n DIV {CMS_THRESH_DIV}")
            ).alias("true_heavy"),
        )
    )
