"""Connected-components operator: property-tested against union-find.

The registry oracle (``dedup_cluster_canonical``) proves the end-to-end
pipeline on real documents; these tests pin the operator itself on
adversarial graph shapes (chains that need pointer jumping, cycles,
isolated star centers) that the near-dup corpus may never produce.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_lake_pyspark_scd2_spark.operators.graph import (
    cluster_documents,
    connected_components,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.label
        for r in connected_components(df, max_iter=20).collect()
    }


def test_long_chain_needs_pointer_jumping(spark):
    """A 33-node path converges only via pointer jumping within the
    max_iter budget (plain min-propagation needs diameter rounds)."""
    edges = [(i, i + 1) for i in range(32)]
    got = _cc_spark(spark, edges)
    assert got == {i: 0 for i in range(33)}


def test_cycle_and_disjoint_components(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (12, 11)]
    got = _cc_spark(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_components_match_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    nodes = sorted({n for e in edges for n in e})
    assert _cc_spark(spark, edges) == _union_find(nodes, edges)


def test_cluster_documents_singletons_and_canonical(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    out = {
        r.doc_id: (r.cluster_id, r.cluster_size, r.is_canonical)
        for r in cluster_documents(docs, pairs).collect()
    }
    assert out == {
        0: (0, 3, True),
        3: (0, 3, False),
        5: (0, 3, False),
        1: (1, 1, True),
        2: (2, 1, True),
        4: (4, 1, True),
    }


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(32)], "src long, dst long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=1)


# -- pagerank ---------------------------------------------------------------


def _naive_pagerank(edge_list, iters=3, d=0.85):
    """Reference power iteration with the operator's rounding contract."""
    both = edge_list + [(b, a) for a, b in edge_list]
    nodes = sorted({u for u, _ in both})
    deg = {u: sum(1 for s, _ in both if s == u) for u in nodes}
    n = len(nodes)
    r = {u: round(1.0 / n, 6) for u in nodes}
    for _ in range(iters):
        nxt = {}
        for v in nodes:
            s = sum(r[u] / deg[u] for u, vv in both if vv == v)
            nxt[v] = round((1 - d) / n + d * s, 6)
        r = nxt
    return r


def test_pagerank_star_graph(spark):
    from delta_lake_pyspark_scd2_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=3).collect()}
    want = _naive_pagerank([(0, i) for i in range(1, 6)], iters=3)
    assert got == want
    hub, leaves = got[0], [got[i] for i in range(1, 6)]
    assert all(hub > l for l in leaves)
    assert len(set(leaves)) == 1  # symmetry
    assert abs(sum(got.values()) - 1.0) < 1e-3


def test_pagerank_matches_naive_on_random_graph(spark):
    import random

    from delta_lake_pyspark_scd2_spark.operators.graph import pagerank

    rng = random.Random(5)
    edge_list = sorted(
        {
            tuple(sorted(rng.sample(range(30), 2)))
            for _ in range(80)
        }
    )
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=3).collect()}
    assert got == _naive_pagerank(edge_list, iters=3)


def test_cluster_keep_best_prefers_high_score_over_min_id(spark):
    from delta_lake_pyspark_scd2_spark.operators.graph import (
        cluster_keep_best,
    )

    # cluster {1,2,3}: doc 2 is the longest — it must be kept even
    # though min-id canonical selection would pick doc 1; doc 9 is a
    # singleton and keeps itself.
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 200), (9, 50)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    rows = {
        r["doc_id"]: r
        for r in cluster_keep_best(docs, pairs, "n_chars").collect()
    }
    assert [rows[i]["cluster_id"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [rows[i]["is_kept"] for i in (1, 2, 3)] == [False, True, False]
    assert rows[9]["is_kept"] and rows[9]["cluster_size"] == 1
    assert rows[1]["cluster_size"] == 3


def test_cluster_keep_best_tie_breaks_to_lowest_id(spark):
    from delta_lake_pyspark_scd2_spark.operators.graph import (
        cluster_keep_best,
    )

    docs = spark.createDataFrame(
        [(5, 100), (6, 100)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    rows = {
        r["doc_id"]: r["is_kept"]
        for r in cluster_keep_best(docs, pairs, "n_chars").collect()
    }
    assert rows == {5: True, 6: False}


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------


def _edges_w(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_lpa_splits_two_dense_communities(spark):
    """Two 4-cliques joined by ONE weak bridge: connected_components
    would merge them; LPA must keep them apart."""
    from delta_lake_pyspark_scd2_spark.operators.graph import (
        label_propagation,
    )

    clique_a = [(a, b, 5) for a in range(4) for b in range(4) if a < b]
    clique_b = [(a, b, 5) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10, 1)]
    out = label_propagation(
        _edges_w(spark, clique_a + clique_b + bridge),
        weight_col="w",
        iters=4,
    )
    got = {r["node"]: r["label"] for r in out.collect()}
    a_labels = {got[n] for n in range(4)}
    b_labels = {got[n] for n in range(10, 14)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels


def test_lpa_weight_majority_beats_edge_count(spark):
    """Node 2 has two unit edges into community {0,1} but one heavy
    edge to 3 — the weighted vote must pull it toward 3's label."""
    from delta_lake_pyspark_scd2_spark.operators.graph import (
        label_propagation,
    )

    rows = [(0, 1, 10), (0, 2, 1), (1, 2, 1), (2, 3, 9), (3, 4, 10)]
    out = label_propagation(_edges_w(spark, rows), weight_col="w", iters=3)
    got = {r["node"]: r["label"] for r in out.collect()}
    assert got[2] == got[3] == got[4]
    assert got[0] == got[1] != got[2]


def test_lpa_unweighted_defaults_to_unit_votes(spark):
    from delta_lake_pyspark_scd2_spark.operators.graph import (
        label_propagation,
    )

    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = label_propagation(df, iters=2)
    assert out.count() == 3
