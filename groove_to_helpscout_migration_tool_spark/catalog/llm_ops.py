"""LLM-training-data pipeline operators (BASELINE.json north star).

Dedup / similarity / text-analysis / multimodal over the ``documents``
and ``embeddings`` tables. Everything is a DataFrame transform with the
error-side-channel conventions of the rest of the engine; hashes go
through the md5-prefix scheme (functions/text.py) so DuckDB oracles can
mirror them exactly.

Scale design notes are on each operator; the common theme: per-row
expressions stay shuffle-free, candidate generation for pairwise ops is
always bucketed (never an unbounded cross join), and the brute-force
variants exist as oracles/baselines for the bucketed ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import register
from ..session import load_tables

_TOKENS_SQL = "list_filter(str_split_regex(text, '\\s+'), x -> x <> '')"
_WORD_HASH_SQL = "(('0x' || substr(md5({w}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy on normalized text)
# ---------------------------------------------------------------------------
@register(
    "llm_dedup_exact",
    oracle="""
WITH normed AS (
  SELECT doc_id,
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm_text
  FROM documents
)
SELECT min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies,
       md5(norm_text) AS text_hash
FROM normed GROUP BY norm_text
""",
    doc=(
        "Exact dedup: normalize (lower/trim/collapse-ws), group by text, keep "
        "min doc_id. At 100 TB: group on md5(norm_text) so the shuffle moves "
        "32-byte keys, never document bodies."
    ),
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    normed = t.documents.select(
        "doc_id",
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ").alias("norm_text"),
    )
    return (
        normed.groupBy(F.md5("norm_text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Document fingerprint (position-weighted rolling-style hash)
# ---------------------------------------------------------------------------
@register(
    "llm_doc_fingerprint",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest({_TOKENS_SQL}) AS word,
         generate_subscripts({_TOKENS_SQL}, 1) - 1 AS pos
  FROM documents
)
SELECT doc_id,
       CAST(sum(({_WORD_HASH_SQL.format(w='word')} % 1000000007) * ((pos % 31) + 1))
            % 2305843009213693951 AS BIGINT) AS fingerprint
FROM toks GROUP BY doc_id
""",
    doc=(
        "Position-weighted document fingerprint over word hashes (rolling-hash "
        "family). posexplode + partial-agg: the shuffle carries (doc_id, "
        "contribution) longs only."
    ),
)
def llm_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    toks = t.documents.select(
        "doc_id", F.posexplode(TX.tokens(F.col("text"))).alias("pos", "word")
    )
    contrib = (TX.word_hash(F.col("word")) % TX.FOLD_PRIME) * (
        (F.col("pos") % 31) + 1
    )
    return (
        toks.withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg((F.sum("contrib") % TX.FP_MOD).cast("bigint").alias("fingerprint"))
    )


# ---------------------------------------------------------------------------
# Text statistics / token counting
# ---------------------------------------------------------------------------
@register(
    "llm_text_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
         AS n_tokens_bpe,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       CAST(len(list_filter({_TOKENS_SQL},
            x -> list_contains(['the','a','of','and','to','in','is','it'], lower(x))))
            AS BIGINT) AS n_stopwords,
       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct
FROM documents
""",
    doc="Token counting (whitespace + BPE-ish regex), stopword & punct counts.",
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    c = F.col("text")
    return t.documents.select(
        "doc_id",
        TX.token_count_ws(c).alias("n_tokens_ws"),
        TX.token_count_bpe(c).alias("n_tokens_bpe"),
        F.length(c).cast("bigint").alias("n_chars_actual"),
        TX.stopword_count(c).alias("n_stopwords"),
        TX.punct_count(c).alias("n_punct"),
    )


# ---------------------------------------------------------------------------
# Language identification (marker-token heuristic)
# ---------------------------------------------------------------------------
@register(
    "llm_lang_id",
    oracle=f"""
WITH counted AS (
  SELECT doc_id, lang,
    len(list_filter({_TOKENS_SQL}, x -> list_contains(['the','a','of','and','is'], lower(x)))) AS n_en,
    len(list_filter({_TOKENS_SQL}, x -> list_contains(['el','la','de','y','es'], lower(x))))   AS n_es,
    len(list_filter({_TOKENS_SQL}, x -> list_contains(['le','la','de','et','est'], lower(x)))) AS n_fr,
    len(list_filter({_TOKENS_SQL}, x -> list_contains(['der','die','das','und','ist'], lower(x)))) AS n_de
  FROM documents
)
SELECT doc_id, lang AS labeled_lang,
       CASE
         WHEN n_en >= n_es AND n_en >= n_fr AND n_en >= n_de AND n_en > 0 THEN 'en'
         WHEN n_es >= n_fr AND n_es >= n_de AND n_es > 0 THEN 'es'
         WHEN n_fr >= n_de AND n_fr > 0 THEN 'fr'
         WHEN n_de > 0 THEN 'de'
         ELSE 'unk' END AS detected_lang
FROM counted
""",
    doc="Language-ID heuristic: marker-token voting with fixed precedence.",
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    return t.documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TX.detect_language(F.col("text")).alias("detected_lang"),
    )


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------
@register(
    "llm_quality_score",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         CAST(len({_TOKENS_SQL}) AS DOUBLE) AS n_tok,
         CAST(length(text) AS DOUBLE) AS n_chr,
         CAST(len(list_filter({_TOKENS_SQL},
              x -> list_contains(['the','a','of','and','to','in','is','it'], lower(x))))
              AS DOUBLE) AS n_stop,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS n_punct
  FROM documents
)
SELECT doc_id,
       round(greatest(0.0, least(1.0,
         0.4 * least(n_tok / 64.0, 1.0)
         + 0.4 * (1.0 - n_punct / greatest(n_chr, 1.0))
         + 0.2 * (n_stop / greatest(n_tok, 1.0)) * 4.0)), 6) AS quality
FROM m
""",
    doc="Pre-training quality heuristics: length + punctuation + stopword ratio.",
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    return t.documents.select(
        "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (the ANN baseline)
# ---------------------------------------------------------------------------
@register(
    "llm_ann_topk_cosine",
    oracle="""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.qid, e.vec_id AS nid,
         round(
           list_sum(list_transform(range(1, len(q.qv) + 1),
                    i -> q.qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                    i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                    i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))), 6) AS cosine
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.qid
)
SELECT qid AS query_id, nid AS neighbor_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rn
  FROM pairs
) WHERE rn <= 5
""",
    doc=(
        "Brute-force cosine top-k: broadcast the query set, one scan of the "
        "corpus, per-partition partial top-k via window. The exact baseline "
        "the bucketed-LSH path is validated against. Ranks computed on the "
        "ROUNDED cosine so Spark/DuckDB float noise cannot flip order."
    ),
)
def llm_ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    emb = emb.withColumn("norm", norm)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        F.col("qid"),
        F.col("vec_id").alias("nid"),
        F.round(dot / (F.col("qnorm") * F.col("norm")), 6).alias("cosine"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Multimodal: opaque binary column + typed metadata (decode stubbed)
# ---------------------------------------------------------------------------
@register(
    "llm_multimodal_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CASE
         WHEN substr(text, 1, 1) = chr(255) THEN 'image/jpeg'
         WHEN substr(text, 1, 1) = chr(137) THEN 'image/png'
         ELSE 'text/plain' END AS sniffed_mime,
       octet_length(encode(text)) > 10485760 AS oversize
FROM documents
""",
    doc=(
        "Multimodal plumbing: payloads as opaque BINARY + typed metadata; MIME "
        "sniffed from leading bytes (P13, TicketProcessor.php:296-298). Real "
        "image/audio decode is a mapInPandas stage (multimodal/decode.py), "
        "stubbed here because codec libs are absent."
    ),
)
def llm_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    payload = F.encode(F.col("text"), "UTF-8")
    first = F.substring(F.col("text"), 1, 1)
    return t.documents.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.when(first == F.lit("ÿ"), "image/jpeg")
        .when(first == F.lit(""), "image/png")
        .otherwise("text/plain")
        .alias("sniffed_mime"),
        (F.octet_length(payload) > 10485760).alias("oversize"),
    )
