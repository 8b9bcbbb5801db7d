"""Similarity search over embedding columns.

Two paths:
  - brute_force_topk: exact cosine top-k of a (small, broadcast) query
    set against the corpus -- the baseline every approximate variant is
    validated against (catalog: llm_ann_topk_cosine).
  - hyperplane LSH: sign-random-projection bucketing. The hyperplanes
    are +-1 vectors derived from md5 bits at BUILD time (in Python's
    hashlib, which matches SQL md5 byte-for-byte), inlined as literals
    into both the Spark plan and the DuckDB oracle -- fully
    deterministic, no engine RNG anywhere.

Scale: bucket keys are tiny ints; the candidate join shuffles
(bucket_key, vec_id) only. Vectors are fetched for candidate pairs via
a keyed join. Skewed buckets (dense regions) would be salted/capped at
100 TB; the multiprobe variant widens recall without more hyperplanes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 12          # 2 bands x 6 hyperplanes
N_BANDS, BITS_PER_BAND = 2, 6


def _plane_sign(k: int, i: int) -> int:
    """Deterministic +-1 from md5('hp-k-i') -- identical to the SQL
    expression ('0x'||substr(md5('hp-k-i'),1,15))::BIGINT % 2."""
    h = int(hashlib.md5(f"hp-{k}-{i}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 1 else -1


HYPERPLANES: list[list[int]] = [
    [_plane_sign(k, i) for i in range(DIM)] for k in range(N_PLANES)
]


def _dot_sign(v, plane: list[int]):
    signs = F.array(*[F.lit(float(s)) for s in plane])
    dot = F.aggregate(
        F.zip_with(v, signs, lambda x, s: x * s), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.when(dot > 0, F.lit("1")).otherwise(F.lit("0"))


def lsh_band_keys(v) -> "F.Column":
    """ARRAY of band bucket keys for an array<double> vector column."""
    bits = [_dot_sign(v, HYPERPLANES[k]) for k in range(N_PLANES)]
    return F.array(
        *[
            F.concat_ws(
                "", F.lit(str(b)), *bits[b * BITS_PER_BAND : (b + 1) * BITS_PER_BAND]
            )
            for b in range(N_BANDS)
        ]
    )


def cosine(a, b) -> "F.Column":
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def lsh_neardup_pairs(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """-> (vec_i, vec_j, cosine): pairs sharing an LSH band bucket with
    exact cosine >= threshold (rounded to 6 before thresholding so the
    oracle comparison is stable)."""
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = emb.select("vec_id", "v", F.explode(lsh_band_keys(F.col("v"))).alias("bkey"))
    left = ex.select(F.col("vec_id").alias("i"), F.col("v").alias("v_i"), "bkey")
    right = ex.select(F.col("vec_id").alias("j"), F.col("v").alias("v_j"), "bkey")
    cand = (
        left.join(right, ["bkey"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j", "v_i", "v_j")
        .distinct()
    )
    return (
        cand.withColumn("cosine", F.round(cosine(F.col("v_i"), F.col("v_j")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("i").alias("vec_i"), F.col("j").alias("vec_j"), "cosine")
    )


def sql_hyperplane_literal(k: int) -> str:
    """DuckDB DOUBLE[] literal for hyperplane k (oracle mirror)."""
    return "[" + ", ".join(f"{float(s):.1f}" for s in HYPERPLANES[k]) + "]"


IVF_STRIDE = 37  # corpus vectors with vec_id % IVF_STRIDE == 0 act as centroids


def ivf_topk(
    embeddings: DataFrame, k: int = 5, query_max_id: int = 10, nprobe: int = 2
) -> DataFrame:
    """ANN top-k via IVF (inverted-file) coarse quantization: every corpus
    vector is assigned to its nearest centroid cell; a query probes only
    its ``nprobe`` nearest cells and exact-re-ranks the candidates.

    The coarse quantizer here is deterministic (corpus vectors at
    vec_id % IVF_STRIDE == 0 stand in for offline-trained k-means
    centroids) so the DuckDB oracle can mirror it exactly. At 100 TB the
    assignment is one broadcast-centroids map stage writing a
    cell-partitioned (bucketed) table; queries touch nprobe cells --
    cost scales with cell occupancy, not corpus size."""
    from pyspark.sql import Window as W

    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = emb.filter(F.col("vec_id") % IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    # assignment: broadcast the (tiny) centroid set, argmax cosine
    sim = F.round(cosine(F.col("v"), F.col("cv")), 9)
    w_assign = W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("csim", sim)
        .withColumn("crank", F.row_number().over(w_assign))
        .filter(F.col("crank") == 1)
        .select("vec_id", "v", F.col("cid").alias("cell"))
    )
    # queries probe their nprobe nearest cells
    probes = (
        emb.filter(F.col("vec_id") < query_max_id)
        .crossJoin(F.broadcast(cents))
        .withColumn("csim", sim)
        .withColumn("crank", F.row_number().over(w_assign))
        .filter(F.col("crank") <= nprobe)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("cid").alias("cell"))
    )
    cand = (
        probes.join(assigned, ["cell"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "qv", F.col("vec_id").alias("nid"), F.col("v").alias("nv"))
        .distinct()
    )
    scored = cand.withColumn("cosine", F.round(cosine(F.col("qv"), F.col("nv")), 6))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def lsh_topk(embeddings: DataFrame, k: int = 5, query_max_id: int = 10) -> DataFrame:
    """ANN top-k via LSH inverted lists: candidates = corpus vectors
    sharing any band bucket with the query; exact cosine re-rank within
    the candidate set. The scale path next to brute_force: the corpus
    scan is replaced by a bucket-key equi-join, so cost is proportional
    to bucket occupancy, not corpus size. Recall is tunable by bands
    (multiprobe would flip band bits for more)."""
    from pyspark.sql import Window as W

    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = emb.select("vec_id", "v", F.explode(lsh_band_keys(F.col("v"))).alias("bkey"))
    q = ex.filter(F.col("vec_id") < query_max_id).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "bkey"
    )
    cand = (
        q.join(ex, ["bkey"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "qv", F.col("vec_id").alias("nid"), F.col("v").alias("nv"))
        .distinct()
    )
    scored = cand.withColumn("cosine", F.round(cosine(F.col("qv"), F.col("nv")), 6))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )
