"""Corpus-audit and release-assembly operators (round 7): the
cross-cutting reports and deterministic partitions a dataset RELEASE
needs once curation is done.

  - llm_cross_source_overlap : source x source shared-shingle matrix --
        the inter-source contamination/duplication audit a dataset card
        links to (which crawls copied which, where the mixture
        double-counts).
  - llm_train_val_test_split : deterministic hash split into
        train/val/test per-mille buckets plus a write-layout shard --
        the one split every training run downstream assumes is stable
        across reruns and engines.
  - llm_dedup_keep_best      : exact-duplicate groups keep their
        highest-QUALITY copy (classifier-scored representative
        selection), not the arbitrary first -- the policy production
        dedup actually wants when duplicates differ in extraction
        quality.
  - llm_ngram_novelty        : per-document fraction of corpus-novel
        3-gram shingles (first-owner = lowest doc_id) -- the
        data-valuation signal curriculum/selection recipes rank
        documents by.
  - llm_neardup_keep_best    : the fuzzy-dedup DECISION -- one row per
        document with its MinHash-LSH connected component and a keep
        flag on the per-cluster quality argmax.
  - llm_neardup_pagerank     : integer-exact PageRank over the near-dup
        pair graph -- hub/template detection (the graph-centrality
        curation signal).

Reference parity note: the reference tool (a one-tenant ticket
migrator, app/Console/Commands/ -- e.g. TicketProcessor.php processes
rows one at a time) has no corpus-release stage; these extend the
engine for the LLM-data workload with the same oracle-paired
correctness contract as the rest of the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import cache
from ..operators import dedup as DD
from ..registry import register
from ..session import load_tables
from . import llm_ops as _LL
from . import modelprep_ops as _MP

_TOKENS_SQL = _LL._TOKENS_SQL
_DOC_KEY_SQL = _LL._DOC_KEY_SQL
_SHINGLE_CTES = _LL._SHINGLE_CTES


# ---------------------------------------------------------------------------
# Cross-source overlap matrix (inter-source duplication audit)
# ---------------------------------------------------------------------------
@register(
    "llm_cross_source_overlap",
    oracle=f"""
WITH {_SHINGLE_CTES},
sg AS (
  SELECT DISTINCT dd.source, u.g
  FROM docs JOIN documents dd USING (doc_id), unnest(docs.xs) AS u(g)
), tot AS (
  SELECT source, count(*) AS n FROM sg GROUP BY source
), mat AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared_grams
  FROM sg a JOIN sg b USING (g)
  WHERE a.source < b.source
  GROUP BY a.source, b.source
)
SELECT m.src_a, m.src_b,
       CAST(m.n_shared_grams AS BIGINT) AS n_shared_grams,
       CAST(ta.n AS BIGINT) AS n_grams_a,
       CAST(tb.n AS BIGINT) AS n_grams_b,
       CAST((1000 * m.n_shared_grams) // least(ta.n, tb.n) AS BIGINT)
         AS containment_milli
FROM mat m
JOIN tot ta ON m.src_a = ta.source
JOIN tot tb ON m.src_b = tb.source
""",
    doc=(
        "Cross-source overlap matrix: for every unordered SOURCE pair,"
        " the count of distinct word-3-gram shingles (the llm_ops shingle"
        " space) present in BOTH, with per-source distinct-shingle totals"
        " and an integer containment ratio (shared / smaller side, per"
        " mille) -- the inter-source duplication audit that tells a"
        " mixture designer which crawls copied which before weights are"
        " chosen (exact-duplicate DOCS never cross sources here; shingle"
        " granularity is what actually overlaps). Plan: one shingle scan"
        " with source carried on the explode (NO corpus-sized join-back),"
        " one (gram)-keyed hash aggregation collapsing to the per-gram"
        " sorted source-set, then pair EXPANSION as a map-side array"
        " expression bounded by C(|sources|,2) per gram -- never a"
        " self-join of the exploded shingle table, whose hot grams would"
        " square. Output rows = source pairs (tiny); the per-source"
        " totals re-use the same aggregated frame and broadcast back."
        " At 100 TB: linear in corpus shingles, bounded by the source"
        " count everywhere else."
    ),
)
def llm_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    # shingles with source carried on the scan itself (carry= rides the
    # persisted artifact): joining source back over (doc_id) would
    # shuffle the corpus a second time for a column the scan already had
    # (the boilerplate-strip lesson), and rebuilding the shingles
    # UNPERSISTED would let projection collapse re-inline the md5-heavy
    # hash expressions into the explode (measured 3x slower)
    sh = DD.shingled_docs(t.documents, carry=("source",))
    # one gram-keyed aggregation: collect_set dedups (source, gram)
    # pairs map-side; the sorted source-set is bounded by |sources|
    bys = cache.persist_artifact(
        sh.select(F.explode("xs").alias("g"), "source")
        .groupBy("g")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
    )
    ss = F.col("ss")
    # unordered pairs as a pure array expression: for element i, pair it
    # with every LATER element (ss is sorted, so src_a < src_b holds by
    # construction and matches the oracle's a.source < b.source)
    pairs = F.flatten(
        F.transform(
            ss,
            lambda x, i: F.transform(
                F.slice(ss, i + F.lit(2), F.size(ss)),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    mat = (
        bys.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_grams"))
    )
    # per-source distinct-shingle totals from the SAME aggregated frame
    # (one corpus-scale shuffle total); 20-ish rows -> broadcast twice
    tot = (
        bys.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    ta = F.broadcast(tot.select(F.col("source").alias("src_a"), F.col("n").alias("n_grams_a")))
    tb = F.broadcast(tot.select(F.col("source").alias("src_b"), F.col("n").alias("n_grams_b")))
    return (
        mat.join(ta, "src_a")
        .join(tb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared_grams",
            "n_grams_a",
            "n_grams_b",
            F.expr(
                "CAST((1000 * n_shared_grams) DIV least(n_grams_a, n_grams_b)"
                " AS BIGINT)"
            ).alias("containment_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (release partition)
# ---------------------------------------------------------------------------
_TVT_KEY_SQL = _DOC_KEY_SQL.format(salt="tvt")
TVT_SHARDS = 16  # output-file layout shards within each split


@register(
    "llm_train_val_test_split",
    oracle=f"""
WITH k AS (
  SELECT doc_id, source, {_TVT_KEY_SQL} AS key FROM documents
)
SELECT doc_id, source,
       CAST(key % 1000 AS BIGINT) AS bucket,
       CASE WHEN key % 1000 < 900 THEN 'train'
            WHEN key % 1000 < 950 THEN 'val'
            ELSE 'test' END AS split,
       CAST((key // 1000) % {TVT_SHARDS} AS BIGINT) AS shard
FROM k
""",
    doc=(
        "Deterministic train/val/test split (90/5/5): every document"
        " lands in a per-mille bucket from its salted md5 key -- the"
        " rand()-free split that is REPRODUCIBLE across reruns, engines,"
        " and corpus growth (a document's split never changes when"
        " neighbors are added/removed, unlike any percentile- or"
        " row_number-based split), plus an independent write-layout"
        f" shard ({TVT_SHARDS}-way, from disjoint key bits) for output"
        " file assignment. Plan: MAP-ONLY, zero Exchange -- the split of"
        " a 100 TB corpus costs one scan and is embarrassingly parallel;"
        " writers partitionBy(split, shard) without any pre-shuffle"
        " because the key is already uniform."
    ),
)
def llm_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    bucket = F.col("_key") % 1000
    return (
        t.documents.withColumn("_key", _LL._doc_key("tvt"))
        .select(
            "doc_id",
            "source",
            bucket.cast("bigint").alias("bucket"),
            F.when(bucket < 900, F.lit("train"))
            .when(bucket < 950, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
            # integer DIV, never `/`: the 60-bit key exceeds double
            # precision, so a float divide would corrupt the shard bits
            F.expr(f"CAST((_key DIV 1000) % {TVT_SHARDS} AS BIGINT)").alias(
                "shard"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Release-writer layout certification (the sink side of the split)
# ---------------------------------------------------------------------------
@register(
    "q_release_layout",
    oracle=f"""
WITH k AS (
  SELECT {_TVT_KEY_SQL} AS key FROM documents
), lab AS (
  SELECT CASE WHEN key % 1000 < 900 THEN 'train'
              WHEN key % 1000 < 950 THEN 'val'
              ELSE 'test' END AS split,
         CAST((key // 1000) % {TVT_SHARDS} AS BIGINT) AS shard
  FROM k
)
SELECT split, shard,
       CAST(1 AS BIGINT) AS n_files,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lab GROUP BY split, shard
""",
    doc=(
        "RELEASE-WRITER layout certification: actually writes the"
        " train/val/test split through sources/compact.write_release"
        " (Hive partitionBy(split, shard) with the pre-repartition that"
        " makes one task own each leaf), reads the release back, and"
        " returns the per-leaf manifest (split, shard, n_files,"
        " n_rows). The oracle recomputes the expected leaves and row"
        " counts from the md5 split keys and pins n_files = 1 PER LEAF"
        " as a literal -- the writer's small-files contract. A"
        " regression to naive write.partitionBy (every upstream task"
        " opening a writer per leaf it sees -> tasks x leaves files at"
        " 100 TB) shows up as n_files > 1 and hash-mismatches; dropped"
        " or duplicated rows show up in n_rows. The manifest is"
        " materialized eagerly (one row per leaf -- bounded by the"
        f" 3 x {TVT_SHARDS} layout config, never by corpus size) so the"
        " temp release directory can be removed before returning."
    ),
)
def q_release_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sources.compact import write_release

    import os

    split_df = llm_train_val_test_split(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="release_layout_")
    try:
        write_release(split_df, out, ["split", "shard"], mode="overwrite")
        # empty corpus -> zero leaves written; read.parquet cannot infer
        # a schema from no files, so short-circuit the empty manifest
        has_files = any(
            f.endswith(".parquet")
            for _r, _d, fs in os.walk(out)
            for f in fs
        )
        if not has_files:
            return spark.createDataFrame(
                [], "split string, shard bigint, n_files bigint, n_rows bigint"
            )
        manifest = (
            spark.read.parquet(out)
            .withColumn("_f", F.input_file_name())
            .groupBy("split", "shard")
            .agg(
                F.countDistinct("_f").cast("bigint").alias("n_files"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            )
            .select(
                "split",
                F.col("shard").cast("bigint").alias("shard"),
                "n_files",
                "n_rows",
            )
            .collect()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        manifest, "split string, shard bigint, n_files bigint, n_rows bigint"
    )


# ---------------------------------------------------------------------------
# Keep-best exact dedup (quality-scored representative selection)
# ---------------------------------------------------------------------------
# argmax bit-packing base: packed = score * KB + (KB - 1 - doc_id), so a
# plain BIGINT max orders by (score DESC, doc_id ASC) and the aggregation
# stays in HashAggregate (a max over a STRUCT falls back to the
# SortAggregate path -- the llm_segment_dedup_keep_first lesson). Range
# guards raise loudly (the _VOTE_PACK policy): doc_id must fit the 40
# packing bits (~1.1e12 docs) and |score| must stay under 2^22 milli
# (a ~4M-token document) so packed never leaves int64.
KB = 1 << 40
_KB_SCORE_CAP = 1 << 22


def _packed_argmax(score: F.Column, doc: F.Column, op: str) -> F.Column:
    """score * KB + (KB - 1 - doc_id) with loud range guards -- shared by
    llm_dedup_keep_best and llm_neardup_keep_best so the two packings can
    never drift. Out-of-range inputs would SILENTLY corrupt the argmax
    (and the oracles share the packing, so the hash compare could not
    catch the drift) -- fail loudly instead, the _VOTE_PACK policy."""
    # NOTE: a single %s -- f-strings do not consume %, so '%%s' would
    # reach format_string literally, print '%s', and drop the value
    # (ADVICE r7). The mining_ops _VOTE_PACK twin formats with Python %
    # first; here the value is a Column, so format_string must carry it.
    doc_ok = F.when((doc >= 0) & (doc < KB), doc).otherwise(
        F.raise_error(
            F.format_string(
                f"{op}: doc_id %s outside [0, 2^40) breaks the packed"
                " argmax -- raise KB",
                doc,
            )
        )
    )
    score_ok = F.when(F.abs(score) < _KB_SCORE_CAP, score).otherwise(
        F.raise_error(
            F.format_string(
                f"{op}: |score_milli| %s >= 2^22 would overflow the"
                " packed argmax",
                score,
            )
        )
    )
    return score_ok * KB + (F.lit(KB - 1) - doc_ok)


@register(
    "llm_dedup_keep_best",
    oracle=f"""
WITH {_MP.QCLF_W_CTE_SQL},
scored AS (
  SELECT doc_id, md5(text) AS th,
         {_MP.QCLF_SCORE_SQL} AS score_milli
  FROM documents, w
), g AS (
  SELECT th,
         max(score_milli * {KB} + ({KB} - 1 - doc_id)) AS packed,
         count(*) AS c
  FROM scored GROUP BY th
), u AS (
  -- unpack with explicit non-negative remainder: packed can be negative
  -- (negative scores), and truncating division is only safe on the
  -- exact multiple (packed - r)
  SELECT th, c, ((packed % {KB}) + {KB}) % {KB} AS r, packed FROM g
)
SELECT CAST({KB} - 1 - r AS BIGINT) AS doc_id, th,
       CAST((packed - r) // {KB} AS BIGINT) AS score_milli,
       CAST(c AS BIGINT) AS n_copies,
       c > 1 AS had_duplicates
FROM u
""",
    doc=(
        "Exact dedup keeping the BEST copy: within each exact-duplicate"
        " group (md5(text)), the survivor is the copy with the highest"
        " quality-classifier score (modelprep_ops.qclf_score -- the same"
        " md5-literal linear model as llm_quality_classifier_score, so"
        " selection is all-integer), ties broken by LOWEST doc_id via"
        " max(struct(score, -doc_id)). llm_dedup_exact keeps the"
        " arbitrary-canonical first; this is the policy production dedup"
        " wants when duplicate extractions differ in quality (same text"
        " here implies same score, but the same operator applies"
        " unchanged to normalized-text grouping where they differ)."
        " Plan: the score is a map-only projection; the argmax is ONE"
        " hash aggregation on the text hash -- partial max(struct)"
        " combines map-side, no window, no sort, no self-join. At 100 TB"
        " this is exactly the shape of llm_dedup_exact plus a free"
        " scan-side expression."
    ),
)
def llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    scored = t.documents.select(
        "doc_id",
        F.md5("text").alias("th"),
        _MP.qclf_score(TX.tokens(F.col("text"))).cast("bigint").alias("score_milli"),
    )
    g = scored.groupBy("th").agg(
        F.max(
            _packed_argmax(
                F.col("score_milli"), F.col("doc_id"), "llm_dedup_keep_best"
            )
        ).alias("packed"),
        F.count(F.lit(1)).alias("c"),
    )
    u = g.withColumn("r", F.pmod(F.col("packed"), F.lit(KB)))
    return u.select(
        (F.lit(KB - 1) - F.col("r")).cast("bigint").alias("doc_id"),
        "th",
        # exact multiple after subtracting the remainder, so truncating
        # integer DIV is exact even for negative packed values; `/`
        # would route through double and lose bits above 2^53
        F.expr(f"CAST((packed - r) DIV {KB} AS BIGINT)").alias("score_milli"),
        F.col("c").cast("bigint").alias("n_copies"),
        (F.col("c") > 1).alias("had_duplicates"),
    )


# ---------------------------------------------------------------------------
# Per-document n-gram novelty (data-valuation signal)
# ---------------------------------------------------------------------------
@register(
    "llm_ngram_novelty",
    oracle=f"""
WITH {_SHINGLE_CTES},
ex AS (
  SELECT doc_id, len(xs) AS n_grams, u.g
  FROM docs, unnest(docs.xs) AS u(g)
), fo AS (
  SELECT g, min(doc_id) AS fd FROM ex GROUP BY g
)
SELECT e.doc_id,
       CAST(e.n_grams AS BIGINT) AS n_grams,
       CAST(count(CASE WHEN f.fd = e.doc_id THEN 1 END) AS BIGINT) AS n_novel,
       CAST((1000 * count(CASE WHEN f.fd = e.doc_id THEN 1 END)) // e.n_grams
            AS BIGINT) AS novelty_milli
FROM ex e JOIN fo f USING (g)
GROUP BY e.doc_id, e.n_grams
""",
    doc=(
        "Per-document n-gram NOVELTY: the fraction (per mille, integer"
        " division) of a document's distinct word-3-gram shingles whose"
        " corpus-wide first owner (minimum doc_id -- the deterministic"
        " stand-in for earliest-crawled) is the document itself. The"
        " data-valuation signal selection/curriculum recipes rank by: a"
        " novelty near 0 means everything in the document was already"
        " contributed by earlier documents. Differs from"
        " llm_segment_dedup_keep_first in granularity (overlapping"
        " 3-gram shingles vs disjoint 12-token segments) and in OUTPUT"
        " (a per-doc scalar score, not a rewritten corpus). Plan: reuses"
        " the persisted shingle artifact shared by the near-dup family;"
        " first-owner is one (gram)-keyed hash aggregation (partial min"
        " combines map-side); the join back is gram-keyed with a UNIQUE"
        " right side, so output rows == exploded rows (no fanout) and"
        " the final per-doc rollup combines map-side. Linear at 100 TB;"
        " hot grams cost max(docs-per-gram) join rows, never a square."
    ),
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    docs = DD.shingled_docs(t.documents)
    ex = docs.select(
        "doc_id", F.size("xs").alias("n_grams"), F.explode("xs").alias("g")
    )
    first = ex.groupBy("g").agg(F.min("doc_id").alias("fd"))
    novel = F.sum(F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0))
    return (
        ex.join(first, "g")
        .groupBy("doc_id", "n_grams")
        .agg(novel.cast("bigint").alias("n_novel"))
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            "n_novel",
            F.expr("CAST((1000 * n_novel) DIV n_grams AS BIGINT)").alias(
                "novelty_milli"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Keep-best NEAR-dup dedup (quality argmax per LSH connected component)
# ---------------------------------------------------------------------------
_KEEPBEST_PACK_SQL = f"(score_milli * {KB} + ({KB} - 1 - doc_id))"


@register(
    "llm_neardup_keep_best",
    oracle=f"""
WITH RECURSIVE {_LL._SHINGLE_CTES}, {_LL._MINHASH_SIG_SQL}, {_LL._PAIRS_05_CAPPED_CTES},
edges AS (
  SELECT doc_i AS s, doc_j AS d FROM goodpairs
  UNION ALL
  SELECT doc_j, doc_i FROM goodpairs
), nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
), comp AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
), {_MP.QCLF_W_CTE_SQL}, scored AS (
  SELECT doc_id, {_MP.QCLF_SCORE_SQL} AS score_milli
  FROM documents, w
), lab AS (
  SELECT s.doc_id, coalesce(c.cluster_id, s.doc_id) AS cluster_id,
         s.score_milli
  FROM scored s LEFT JOIN comp c USING (doc_id)
), best AS (
  SELECT cluster_id, max({_KEEPBEST_PACK_SQL}) AS bp
  FROM lab GROUP BY cluster_id
)
SELECT l.doc_id, CAST(l.cluster_id AS BIGINT) AS cluster_id,
       CAST(l.score_milli AS BIGINT) AS score_milli,
       {_KEEPBEST_PACK_SQL.replace('score_milli', 'l.score_milli').replace('doc_id', 'l.doc_id')} = b.bp AS keep
FROM lab l JOIN best b USING (cluster_id)
""",
    doc=(
        "NEAR-dup dedup keeping the BEST copy: every document joins its"
        " MinHash-LSH connected component (dedup.neardup_clusters --"
        " docs outside the pair graph are their own singleton cluster),"
        " and the survivor per cluster is the highest quality-classifier"
        " score, ties to the LOWEST doc_id -- the production fuzzy-dedup"
        " DECISION (llm_dedup_clusters keeps the arbitrary min-id; this"
        " keeps the best extraction). One row per document with its"
        " cluster, score, and keep flag, so downstream filters are one"
        " predicate. Plan: the component labels come from the CAPPED-LSH"
        f" pair graph (bucket_cap={_LL._LSH_CAP} threaded through"
        " dedup.neardup_clusters -> minhash_lsh_pairs -> cap_bucket +"
        " star_pairs: one boilerplate band bucket is bounded at"
        " cap*(cap-1)/2 pairs plus width-1 anchor star edges, and no"
        " hot-bucket member is orphaned from its cluster)"
        " + the checkpointed label-propagation machinery; scoring"
        " is a map-only projection; the per-cluster argmax is ONE hash"
        " aggregation on the shared bit-packed BIGINT (same _packed_"
        "argmax expression and guards as llm_dedup_keep_best -- packings"
        " can never drift), joined back cluster-keyed with a unique"
        " right side (no fanout). Corpus-linear at 100 TB; the oracle"
        " replays the components with a recursive CTE over the"
        " identically-capped pair prefix and the SAME packed max."
    ),
)
def llm_neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    labels = DD.neardup_clusters(
        t.documents, jaccard_threshold=0.5, bucket_cap=_LL._LSH_CAP
    ).select("doc_id", "cluster_id")
    scored = t.documents.select(
        "doc_id",
        _MP.qclf_score(TX.tokens(F.col("text"))).cast("bigint").alias("score_milli"),
    )
    lab = (
        scored.join(labels, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    packed = _packed_argmax(
        F.col("score_milli"), F.col("doc_id"), "llm_neardup_keep_best"
    )
    best = lab.groupBy("cluster_id").agg(F.max(packed).alias("bp"))
    return (
        lab.join(best, "cluster_id")
        .select(
            "doc_id",
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            "score_milli",
            (packed == F.col("bp")).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank centrality over the near-dup graph (hub/template detection)
# ---------------------------------------------------------------------------
PR_ROUNDS = 3
_PR_EDGES_SQL = """
edges AS (
  SELECT doc_i AS s, doc_j AS d FROM goodpairs
  UNION ALL
  SELECT doc_j, doc_i FROM goodpairs
), deg AS (
  SELECT s AS node, count(*) AS deg FROM edges GROUP BY s
)"""


def _pr_round_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT e.d AS node,
         150 + (850 * sum({prev}.r // dg.deg)) // 1000 AS r
  FROM edges e
  JOIN {prev} ON {prev}.node = e.s
  JOIN deg dg ON dg.node = e.s
  GROUP BY e.d
)"""


@register(
    "llm_neardup_pagerank",
    oracle=f"""
WITH {_LL._SHINGLE_CTES}, {_LL._MINHASH_SIG_SQL}, {_LL._PAIRS_05_CAPPED_CTES},
{_PR_EDGES_SQL},
r0 AS (SELECT node, CAST(1000 AS BIGINT) AS r FROM deg),
{", ".join(_pr_round_sql(f"r{i}", f"r{i + 1}") for i in range(PR_ROUNDS))}
SELECT dg.node AS doc_id,
       CAST(dg.deg AS BIGINT) AS degree,
       CAST(r{PR_ROUNDS}.r AS BIGINT) AS rank_milli
FROM deg dg JOIN r{PR_ROUNDS} ON r{PR_ROUNDS}.node = dg.node
""",
    doc=(
        "Integer-exact PageRank over the MinHash-LSH near-dup graph"
        f" ({PR_ROUNDS} rounds, damping 0.85 in milli units): a high"
        " rank marks HUB documents -- templates/boilerplate whose text"
        " near-duplicates into many others -- the graph-centrality"
        " curation signal that complements per-pair dedup (drop or"
        " down-weight the hub, not its leaves). Per round: rank flows as"
        " r DIV degree along each edge (integer division, truncation"
        " identical in both engines; all values non-negative), partial-"
        "summed per destination, then 150 + (850 * inflow) DIV 1000."
        " The fourth certified iterative loop in the catalog (after CC,"
        " PCA power iteration, BPE merges): the driver unrolls"
        f" {PR_ROUNDS} join+hash-agg rounds over the persisted"
        " edge+degree frame -- no window, no cartesian -- and the DuckDB"
        " oracle replays the SAME recurrence as unrolled CTEs over the"
        " shared pair-graph prefix. Edges come from the CAPPED-LSH"
        f" candidate build (bucket_cap={_LL._LSH_CAP} ->"
        " dedup.cap_bucket + dedup.star_pairs): every band bucket emits"
        " cap*(cap-1)/2 self-join pairs plus width-1 anchor star edges,"
        " so EDGE COUNT stays corpus-linear; non-anchor node degree is"
        f" bounded (<= 4*{_LL._LSH_CAP} edges from capped buckets plus"
        " 4 star edges), while a hot bucket's anchor is a deliberate"
        " HUB whose degree is the bucket width -- exactly the"
        " template-document centrality this query exists to surface,"
        " and an aggregation hot key the partial-sum (map-side combine)"
        " absorbs; each round's shuffle carries one record per edge."
    ),
)
def llm_neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    pairs = DD.minhash_lsh_pairs(
        t.documents, jaccard_threshold=0.5, bucket_cap=_LL._LSH_CAP
    ).select("doc_i", "doc_j")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_j").alias("doc_i"), F.col("doc_i").alias("doc_j"))
    ).toDF("s", "d")
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # edge list with the source degree attached ONCE (reused every
    # round), persisted like the other iterative loops' round state
    ed = cache.persist_artifact(
        edges.join(deg.withColumnRenamed("s", "node"), edges.s == F.col("node"))
        .select("s", "d", "deg")
    )
    ranks = deg.select(F.col("s").alias("node"), F.lit(1000).cast("bigint").alias("r"))
    for _ in range(PR_ROUNDS):
        inflow = (
            ed.join(ranks, ed.s == ranks.node)
            .select("d", F.expr("r DIV deg").alias("c"))
            .groupBy("d")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = inflow.select(
            F.col("d").alias("node"),
            (F.lit(150) + F.expr("(850 * inflow) DIV 1000")).cast("bigint").alias("r"),
        )
    return (
        deg.withColumnRenamed("s", "node")
        .join(ranks, "node")
        .select(
            F.col("node").alias("doc_id"),
            F.col("deg").cast("bigint").alias("degree"),
            F.col("r").cast("bigint").alias("rank_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding outlier scoring (distance-to-centroid curation gate)
# ---------------------------------------------------------------------------
EMB_Q = 10**6   # micro-unit quantization, as in the PCA loop
EMB_DIMS = 64


@register(
    "llm_embedding_outlier",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x::DOUBLE * {EMB_Q}) AS BIGINT)) AS xq
  FROM embeddings
), st AS (
  SELECT j, sum(q.xq[j]) AS sj, count(*) AS n
  FROM q, unnest(range(1, {EMB_DIMS} + 1)) AS t(j) GROUP BY j
), mv AS (
  -- sign-aware truncating mean (floor vs trunc differ on negatives
  -- across engines; |s| // n is truncation in both)
  SELECT max(n) AS n,
         list(CASE WHEN sj < 0 THEN -((-sj) // n) ELSE sj // n END
              ORDER BY j) AS m
  FROM st
), d AS (
  SELECT vec_id,
         list_sum(list_transform(range(1, {EMB_DIMS} + 1),
                  j -> (q.xq[j] - mv.m[j]) * (q.xq[j] - mv.m[j]))) AS d2
  FROM q, mv
), tot AS (
  SELECT sum(d2::HUGEINT) AS s2, count(*) AS n FROM d
)
SELECT d.vec_id, CAST(d.d2 AS BIGINT) AS d2_micro2,
       CAST((1000 * d.d2) // nullif(CAST(tot.s2 // tot.n AS BIGINT), 0)
            AS BIGINT) AS ratio_permille,
       d.d2 > CAST((2::HUGEINT * tot.s2) // tot.n AS BIGINT) AS is_outlier
FROM d, tot
""",
    doc=(
        "Embedding OUTLIER scoring (the distance-to-centroid curation"
        " gate that drops mis-embedded / off-distribution vectors before"
        " clustering or ANN indexing): squared distance to the corpus"
        " centroid in micro-unit integers, flagged when above 2x the"
        " mean squared distance. Integer-exact the int64-SAFE way: the"
        " centroid is the sign-aware TRUNCATING per-dim mean (|sum| DIV"
        " n -- identical truncation in both engines; the PCA loop's"
        " multiply-through centering would square n into every term and"
        " overflow at corpus scale), so each squared diff is <="
        f" (2*{EMB_Q})^2 * {EMB_DIMS} ~ 2.6e14 regardless of corpus"
        " size; only the corpus-wide total runs in DECIMAL(38)/HUGEINT."
        " The 2x-mean threshold compares d2 > (2*total) DIV n -- same"
        " truncation convention on both sides. Plan: one 1-row stats"
        " aggregate broadcast back over the scan (the allowed one-row"
        " BroadcastNestedLoop, as in DSIR/temperature), then ONE map-only"
        " scoring pass whose slim (vec_id, d2) output persists and feeds"
        " both the 1-row total and the output projection -- two corpus"
        " scans, one fold pass, zero corpus shuffles, linear at 100 TB."
    ),
)
def llm_embedding_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["embeddings"])
    q = cache.persist_artifact(
        t.embeddings.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * EMB_Q).cast("bigint"),
            ).alias("xq"),
        )
    )
    # per-dim sums -> 1-row (n, m[]) frame with the truncating mean
    st = (
        q.select(F.posexplode("xq").alias("j", "x"))
        .groupBy("j")
        .agg(F.sum("x").alias("sj"), F.count(F.lit(1)).alias("n"))
    )
    mj = F.when(
        F.col("sj") < 0, -F.expr("(-sj) DIV n")
    ).otherwise(F.expr("sj DIV n"))
    mv = st.select(F.struct("j", mj.alias("m")).alias("jm"), "n").agg(
        F.max("n").alias("n"),
        F.transform(
            F.sort_array(F.collect_list("jm")), lambda s: s.getField("m")
        ).alias("m"),
    )
    # d is referenced twice (the 1-row total + the output projection).
    # AQE does not stage-reuse a twice-referenced subtree (r13 finding,
    # q11), so without the persist the interpreted per-row zip_with
    # fold -- the expensive map stage here -- executed twice over the
    # corpus. Persisting the SLIM (vec_id, d2) frame makes it one fold
    # pass + two cheap reads of 16-byte rows.
    d = cache.persist_artifact(
        q.crossJoin(F.broadcast(mv)).select(
            "vec_id",
            F.aggregate(
                F.zip_with("xq", "m", lambda x, mm: (x - mm) * (x - mm)),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
    )
    tot = d.agg(
        F.sum(F.col("d2").cast("decimal(38,0)")).alias("s2"),
        F.count(F.lit(1)).alias("nn"),
    )
    return d.crossJoin(F.broadcast(tot)).select(
        "vec_id",
        F.col("d2").cast("bigint").alias("d2_micro2"),
        # per-row distance ratio vs the mean (per mille): the column the
        # hash check certifies varies row to row even when the 2x gate
        # is (correctly) all-false on a concentrated corpus
        F.expr(
            "CAST((1000 * d2) DIV nullif(CAST(s2 DIV nn AS BIGINT), 0)"
            " AS BIGINT)"
        ).alias("ratio_permille"),
        (
            F.col("d2").cast("decimal(38,0)")
            > F.expr("CAST((2 * s2) DIV nn AS DECIMAL(38,0))")
        ).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Asymmetric containment near-dup (quote / subset detection)
# ---------------------------------------------------------------------------
CONT_MILLI = 800  # flag pairs where the smaller side is >= 80% contained
CONT_ANCHOR_CAP = _LL._LSH_CAP  # hot-anchor guard, same cap as the LSH twins


@register(
    "llm_neardup_containment",
    oracle=f"""
WITH {_SHINGLE_CTES},
anchored_all AS (SELECT doc_id, list_min(xs) AS anchor FROM docs),
anchored AS (
  SELECT doc_id, anchor FROM anchored_all
  QUALIFY row_number() OVER (PARTITION BY anchor ORDER BY doc_id) <= {CONT_ANCHOR_CAP}
),
anchor_mins AS (
  SELECT anchor, min(doc_id) AS m FROM anchored_all GROUP BY anchor
),
cand AS (
  SELECT DISTINCT i, j FROM (
    SELECT a.doc_id AS i, b.doc_id AS j
    FROM anchored a JOIN anchored b
      ON a.anchor = b.anchor AND a.doc_id < b.doc_id
    UNION ALL
    SELECT am.m AS i, x.doc_id AS j
    FROM anchored_all x JOIN anchor_mins am USING (anchor)
    WHERE x.doc_id > am.m
  )
),
pairs AS (
  SELECT c.i AS doc_i, c.j AS doc_j,
         CAST(len(list_intersect(a.xs, b.xs)) AS BIGINT) AS n_common,
         CAST(len(a.xs) AS BIGINT) AS n_i,
         CAST(len(b.xs) AS BIGINT) AS n_j
  FROM cand c JOIN docs a ON a.doc_id = c.i JOIN docs b ON b.doc_id = c.j
)
SELECT doc_i, doc_j, n_common, n_i, n_j,
       CAST((1000 * n_common) // n_i AS BIGINT) AS cont_i_in_j_milli,
       CAST((1000 * n_common) // n_j AS BIGINT) AS cont_j_in_i_milli
FROM pairs
WHERE greatest((1000 * n_common) // n_i, (1000 * n_common) // n_j)
      >= {CONT_MILLI}
""",
    doc=(
        "Asymmetric CONTAINMENT near-dup (quote/subset detection --"
        " what Jaccard misses by construction: a short document fully"
        " quoted inside a long one has low Jaccard but containment"
        " ~1000): candidate pairs share their minimum 3-gram shingle"
        " hash (the bottom-1 anchor -- a contained document shares ALL"
        " its shingles, so its anchor always collides with the"
        " container's shingle set whenever the container's minimum is"
        " inside the quoted span, and candidates are cheap either way),"
        " verified by the DIRECTIONAL integer ratios |A&B| per mille of"
        f" |A| and of |B|, flagged at >= {CONT_MILLI} on the larger"
        " direction. Plan: reuses the persisted shingle artifact; the"
        " anchor equi-join shuffles (anchor, doc_id) pairs only, and"
        f" every anchor bucket is CAPPED at its {CONT_ANCHOR_CAP} lowest"
        " doc_ids for the all-pairs self-join (dedup.cap_bucket on a"
        " payload-free (anchor, doc_id) frame -- the window never sorts"
        " rows carrying shingle arrays) PLUS a star link from every"
        " bucket member to the bucket's min doc_id (dedup.star_pairs),"
        " so a hot anchor (a very common minimum shingle) contributes"
        " cap*(cap-1)/2 + (width-cap) candidates -- linear in width and"
        " no beyond-cap member orphaned (a doc has exactly ONE bottom-1"
        " anchor, so without the star a hot bucket's dropped members"
        " would lose their only candidate edges); the verify is an"
        " in-row array_intersect after the shingle arrays join back per"
        " candidate. The oracle mirrors the cap with a row_number()"
        " QUALIFY and the star with a min-anchor join. Output rows are"
        " the flagged pairs."
    ),
)
def llm_neardup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    docs = DD.shingled_docs(t.documents)
    # shared capped bottom-1-anchor candidate build (cap + star link +
    # per-candidate xs join-back) -- the same machinery
    # ngram_jaccard_pairs verifies Jaccard over
    pairs = DD.capped_anchor_candidates(docs, CONT_ANCHOR_CAP)
    scored = pairs.select(
        F.col("i").alias("doc_i"),
        F.col("j").alias("doc_j"),
        F.size(F.array_intersect("xs_i", "xs_j")).cast("bigint").alias("n_common"),
        F.size("xs_i").cast("bigint").alias("n_i"),
        F.size("xs_j").cast("bigint").alias("n_j"),
    ).select(
        "doc_i",
        "doc_j",
        "n_common",
        "n_i",
        "n_j",
        F.expr("CAST((1000 * n_common) DIV n_i AS BIGINT)").alias(
            "cont_i_in_j_milli"
        ),
        F.expr("CAST((1000 * n_common) DIV n_j AS BIGINT)").alias(
            "cont_j_in_i_milli"
        ),
    )
    return scored.filter(
        F.greatest("cont_i_in_j_milli", "cont_j_in_i_milli") >= CONT_MILLI
    )
