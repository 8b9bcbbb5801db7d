"""connected_components unit tests on synthetic graphs.

The catalog-level oracle (llm_dedup_clusters vs a recursive CTE) pins
real-corpus behavior; these pin the graph algorithm itself on shapes the
corpus doesn't produce -- above all the pathological chain, where plain
min-label propagation needs O(diameter) rounds and the path-halving
pointer jump must deliver O(log diameter).
"""

from __future__ import annotations

import pytest

from groove_to_helpscout_migration_tool_spark.operators.dedup import connected_components


def _edges_df(spark, pairs):
    """Directed both-orientation edge frame from undirected (u, v) pairs."""
    both = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return spark.createDataFrame(both, "src: long, dst: long")


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


class TestConnectedComponents:
    def test_chain_converges_logarithmically(self, spark):
        # a 200-node path: diameter 199. Pure neighbor propagation would
        # need ~100 rounds; path halving must finish within 10.
        pairs = [(i, i + 1) for i in range(199)]
        labels = connected_components(_edges_df(spark, pairs), max_iter=10)
        got = {r["node"]: r["label"] for r in labels.collect()}
        assert got == {n: 0 for n in range(200)}

    def test_random_graph_matches_union_find(self, spark):
        # deterministic pseudo-random graph: multiplicative-hash edges
        # over 300 nodes, mix of small components and isolated-pair ones
        pairs = sorted(
            {
                tuple(sorted(((i * 48271) % 300, (i * 16807 + 7) % 300)))
                for i in range(220)
            }
        )
        pairs = [(u, v) for u, v in pairs if u != v]
        labels = connected_components(_edges_df(spark, pairs), max_iter=20)
        got = {r["node"]: r["label"] for r in labels.collect()}
        assert got == _union_find(pairs)

    def test_nonconvergence_raises(self, spark):
        pairs = [(i, i + 1) for i in range(63)]
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(_edges_df(spark, pairs), max_iter=1)
