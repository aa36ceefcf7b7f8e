"""Iterative graph analytics: exact fixed-point PageRank + ancestor closure.

Both are pinned against slow pure-Python replays of the same integer
recurrences (the engine result must be BIT-identical — exactness is the
operators' contract) and against structural invariants (mass monotonicity,
partitioning independence, log-round squaring).
"""

import pytest
from pyspark.sql import functions as F

from kg_obo_spark.operators.graph_algos import (
    ancestor_closure,
    node_depth,
    pagerank,
)


def py_pagerank(edges, n_iter, num=85, den=100, scale=10**9, extra_nodes=()):
    """Reference replay of the integer recurrence (dict-based, sequential)."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = {s for s, _ in e} | {d for _, d in e} | set(extra_nodes)
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    base = ((den - num) * scale) // den
    rank = {v: scale for v in nodes}
    for _ in range(n_iter):
        dang = sum(r for v, r in rank.items() if v not in out) // len(nodes)
        inc = {v: 0 for v in nodes}
        for s, d in e:
            inc[d] += rank[s] // out[s]
        rank = {v: base + (num * (inc[v] + dang)) // den for v in nodes}
    return rank


def py_closure(edges):
    e = {(s, d) for s, d in edges if s != d}
    closure = set(e)
    while True:
        step = {(a, d) for a, b in closure for c, d in e if b == c}
        new = closure | step
        if new == closure:
            return closure
        closure = new


GRAPH = [
    # two hubs, a chain, a dangling sink, a duplicate edge and a self-loop
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 4), (6, 4), (7, 1),
    (3, 8), (8, 8), (1, 2),
]


def test_pagerank_matches_python_replay(spark):
    df = spark.createDataFrame(GRAPH, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, iterations=4).collect()}
    assert got == py_pagerank(GRAPH, 4)


def test_pagerank_partitioning_independent(spark):
    df = spark.createDataFrame(GRAPH, "src long, dst long")
    a = {r.id: r.rank for r in pagerank(df, iterations=3).collect()}
    b = {
        r.id: r.rank
        for r in pagerank(df.repartition(7, "dst"), iterations=3).collect()
    }
    assert a == b


def test_pagerank_isolated_nodes_and_mass(spark):
    df = spark.createDataFrame(GRAPH, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 12)], "id long")
    got = {r.id: r.rank for r in pagerank(df, iterations=2, nodes=nodes).collect()}
    assert set(got) == set(range(1, 12))
    assert got == py_pagerank(GRAPH, 2, extra_nodes=range(1, 12))
    # floor-div rounding only ever loses mass: total <= n * scale
    assert sum(got.values()) <= 11 * 10**9


def test_pagerank_hub_outranks_leaf(spark):
    df = spark.createDataFrame(GRAPH, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, iterations=4).collect()}
    assert got[3] > got[5]  # 3 has in-links from 1,2,4; 5 has none


def test_ancestor_closure_binary_tree(spark):
    edges = [(i, i // 2) for i in range(1, 32)]
    df = spark.createDataFrame(edges, "child long, parent long")
    got = {(r.id, r.anc) for r in ancestor_closure(df).collect()}
    assert got == py_closure(edges)


def test_ancestor_closure_squaring_is_logarithmic(spark):
    # a depth-16 chain: frontier iteration would need 16 rounds; squaring
    # doubles reachable depth per round -> converge+confirm well under 8
    edges = [(i, i - 1) for i in range(1, 17)]
    df = spark.createDataFrame(edges, "child long, parent long")
    closure, rounds = ancestor_closure(df, return_iterations=True)
    assert {(r.id, r.anc) for r in closure.collect()} == py_closure(edges)
    assert rounds <= 6


def test_ancestor_closure_dag_multiple_parents(spark):
    edges = [(3, 1), (3, 2), (4, 3), (5, 3), (2, 1)]
    df = spark.createDataFrame(edges, "child long, parent long")
    got = {(r.id, r.anc) for r in ancestor_closure(df).collect()}
    assert got == py_closure(edges)
    assert (4, 1) in got and (5, 2) in got


def test_node_depth_roots_and_leaves(spark):
    edges = [(i, i // 2) for i in range(1, 16)]
    df = spark.createDataFrame(edges, "child long, parent long")
    got = {r.id: r.depth for r in node_depth(df).collect()}
    ref = {}
    for i in range(16):
        d, j = 0, i
        while j > 0:
            j //= 2
            d += 1
        ref[i] = d
    assert got == ref
    assert got[0] == 0  # root


def test_pagerank_plan_has_no_cartesian_blowup(spark):
    # the dangling/n-count folds are one-row cross joins (broadcast);
    # the plan must not contain a non-broadcast cartesian product
    df = spark.createDataFrame(GRAPH, "src long, dst long")
    out = pagerank(df, iterations=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def py_triangles(edges):
    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {x for p in e for x in p}
    cnt = {v: 0 for v in nodes}
    es = sorted(e)
    for i, (a, b) in enumerate(es):
        for (c, d) in es[i + 1:]:
            if c == a and (min(b, d), max(b, d)) in e:
                for v in (a, b, d):
                    cnt[v] += 1
    return cnt


def test_triangle_counts_known_graph(spark):
    from kg_obo_spark.operators.graph_algos import triangle_counts

    # K4 on {1..4} (4 triangles, each node in 3) plus a pendant and a square
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5),
        (6, 7), (7, 8), (8, 9), (9, 6),
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.n_tri for r in triangle_counts(df).collect()}
    assert got == py_triangles(edges)
    assert got[1] == 3 and got[5] == 0 and got[6] == 0


def test_triangle_counts_skew_and_duplicates(spark):
    from kg_obo_spark.operators.graph_algos import triangle_counts

    # hub star + fan triangles, with duplicate/reversed/self edges thrown in
    edges = [(0, i) for i in range(1, 20)]
    edges += [(i, i + 1) for i in range(1, 19)]
    edges += [(5, 0), (0, 5), (7, 7), (3, 4)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.n_tri for r in triangle_counts(df.repartition(7)).collect()}
    assert got == py_triangles(edges)


def test_kcore_fixpoint_peels_tail(spark):
    from kg_obo_spark.operators.graph_algos import kcore

    # 4-clique {0,1,2,3} with a tail 3-4-5: k=2 peels 5 then 4, leaving
    # the clique (degree 3 each)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.core_deg for r in kcore(df, k=2).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # fixpoint invariant: every survivor has core_deg >= k
    assert all(d >= 2 for d in got.values())
    # k above the max core empties the graph
    assert kcore(df, k=4).count() == 0


def test_kcore_fixed_rounds_replay(spark):
    from kg_obo_spark.operators.graph_algos import kcore

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "a long, b long")
    # one peel removes only node 5; node 4 survives with degree 1 (< k) —
    # the fixed-rounds mode reports the intermediate subgraph faithfully
    got1 = {r.id: r.core_deg for r in kcore(df, k=2, rounds=1).collect()}
    assert got1 == {0: 3, 1: 3, 2: 3, 3: 4, 4: 1}
    # enough fixed rounds == fixpoint; dup/reversed/self edges ignored
    noisy = df.union(
        spark.createDataFrame([(1, 0), (2, 2), (0, 1)], "a long, b long")
    )
    got3 = {r.id: r.core_deg for r in kcore(noisy.repartition(5), k=2, rounds=3).collect()}
    fix = {r.id: r.core_deg for r in kcore(df, k=2).collect()}
    assert got3 == fix

    with pytest.raises(ValueError, match="k must be >= 1"):
        kcore(df, k=0)
