"""Deterministic sf1-shaped snapshot generator (documents + embeddings).

The driver ships read-only testdata at sf0.001/0.01/0.1; every scale
probe so far measures ONE decade (sf0.01 -> sf0.1). This script derives
a second decade: a 10x-sf0.1 snapshot of the two tables the flagship
dedup/ANN chains read (documents 50,000 rows, embeddings 20,000 rows),
with its distributions FITTED from the read-only sf0.1 parquet rather
than invented -- vocabulary, language/source mixes, word-count
distribution, exact-dup and mutated-near-dup rates, and per-label
embedding moments -- so per-row statistics (shingle density, bucket
widths, cell occupancy) match the driver corpus and a growth ratio
against sf0.1 measures DATA growth, not distribution drift.

Everything is a pure function of SEED: rerunning reproduces the
snapshot bit-for-bit, so the parquet itself stays out of git
(testdata_sf1/ is gitignored; regenerate with `python
tools/gen_scale.py`).

Usage: python tools/gen_scale.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260814
SRC = "/root/testdata/sf0.1"
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
# dup structure fitted from sf0.1 (16 of 5000 docs in exact-dup pairs;
# near-dup pairs emerge from the mutation copies below)
EXACT_DUP_PAIRS_PER_10K = 16
MUTATED_DUP_PAIRS_PER_10K = 24


def _fit(con: duckdb.DuckDBPyConnection) -> dict:
    docs = f"'{SRC}/documents.parquet'"
    vocab = [
        w
        for (w,) in con.execute(
            f"SELECT DISTINCT unnest(str_split(text, ' ')) FROM {docs}"
        ).fetchall()
        if w
    ]
    vocab.sort()
    lang_rows = con.execute(
        f"SELECT lang, count(*) FROM {docs} GROUP BY 1 ORDER BY 1"
    ).fetchall()
    src_rows = con.execute(
        f"SELECT source, count(*) FROM {docs} GROUP BY 1 ORDER BY 1"
    ).fetchall()
    wc = np.array(
        [
            n
            for (n,) in con.execute(
                f"SELECT len(str_split(text, ' ')) FROM {docs} ORDER BY doc_id"
            ).fetchall()
        ],
        dtype=np.int64,
    )
    emb = f"'{SRC}/embeddings.parquet'"
    lab_rows = con.execute(
        f"SELECT label, count(*) FROM {emb} GROUP BY 1 ORDER BY 1"
    ).fetchall()
    moments = {}
    for lab, _ in lab_rows:
        vecs = np.array(
            [
                v
                for (v,) in con.execute(
                    # ORDER BY pins the float-summation order of
                    # np.mean/np.std -- scan order is not guaranteed
                    # across DuckDB versions/thread counts, and an
                    # order flip would shift mu/sd by an ULP and
                    # regenerate a byte-different snapshot
                    f"SELECT embedding FROM {emb} WHERE label = {int(lab)}"
                    " ORDER BY vec_id"
                ).fetchall()
            ],
            dtype=np.float64,
        )
        moments[int(lab)] = (vecs.mean(axis=0), vecs.std(axis=0))
    return {
        "vocab": vocab,
        "langs": [(l, c) for l, c in lang_rows],
        "sources": [(s, c) for s, c in src_rows],
        "word_counts": wc,
        "labels": [(int(l), c) for l, c in lab_rows],
        "moments": moments,
    }


def _weighted_choice(rng, items, n):
    names = [x for x, _ in items]
    w = np.array([c for _, c in items], dtype=np.float64)
    return rng.choice(names, size=n, p=w / w.sum())


def gen_documents(fit: dict, rng: np.random.Generator) -> pa.Table:
    vocab = np.array(fit["vocab"])
    n_words = rng.choice(fit["word_counts"], size=N_DOCS)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), int(k))])
        for k in n_words
    ]
    # exact-dup pairs: doc j becomes a verbatim copy of doc i
    n_exact = N_DOCS * EXACT_DUP_PAIRS_PER_10K // 10_000
    pairs = rng.choice(N_DOCS, size=(n_exact + N_DOCS * MUTATED_DUP_PAIRS_PER_10K // 10_000, 2), replace=False)
    for i, j in pairs[:n_exact]:
        texts[int(j)] = texts[int(i)]
    # mutated near-dup pairs: copy with ~5% of words resampled -- high
    # Jaccard but not exact, the LSH/containment fodder
    for i, j in pairs[n_exact:]:
        ws = texts[int(i)].split(" ")
        n_mut = max(1, len(ws) // 20)
        for pos in rng.integers(0, len(ws), n_mut):
            ws[int(pos)] = str(vocab[int(rng.integers(0, len(vocab)))])
        texts[int(j)] = " ".join(ws)
    langs = _weighted_choice(rng, fit["langs"], N_DOCS)
    sources = _weighted_choice(rng, fit["sources"], N_DOCS)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(sources, type=pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


def gen_embeddings(fit: dict, rng: np.random.Generator) -> pa.Table:
    labels = _weighted_choice(rng, fit["labels"], N_VECS).astype(np.int32)
    vecs = np.empty((N_VECS, DIM), dtype=np.float32)
    for lab, (mu, sd) in fit["moments"].items():
        mask = labels == lab
        k = int(mask.sum())
        vecs[mask] = (
            mu[None, :] + sd[None, :] * rng.standard_normal((k, DIM))
        ).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )


def main() -> None:
    global N_DOCS, N_VECS
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1",
    )
    # Optional decade multiplier (r9 decade-3): `gen_scale.py out 10`
    # scales both tables 10x (sf10: 500k docs / 200k vecs). The default
    # path consumes the rng identically to before, so the committed sf1
    # snapshot stays byte-for-byte reproducible; a scaled run is its own
    # deterministic stream (row counts change every draw after the
    # first, so cross-scale prefixes are NOT shared -- by design each
    # scale is a self-consistent corpus, not a superset).
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    N_DOCS *= scale
    N_VECS *= scale
    os.makedirs(out_dir, exist_ok=True)
    fit = _fit(duckdb.connect())
    rng = np.random.default_rng(SEED)
    docs = gen_documents(fit, rng)
    emb = gen_embeddings(fit, rng)
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))
    print(
        f"wrote {out_dir}: documents={docs.num_rows} embeddings={emb.num_rows}"
    )


if __name__ == "__main__":
    main()
