"""Filtered corrupted-triple negative sampling for KG-embedding training."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kg_obo_spark.operators.negatives import negative_samples


def _edges(spark):
    rows = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 2), (1, 2)]
    return spark.createDataFrame(rows, "src long, dst long")


def _replay(edges, n_nodes, n_neg=2, seed=7):
    ed = {(s, d) for s, d in edges if s != d}
    out = set()
    for s, d in ed:
        for j in range(n_neg):
            h = hashlib.md5(f"{seed}:{s}:{d}:{j}".encode()).hexdigest()
            neg = int(h[:8], 16) % n_nodes
            if neg != s and (s, neg) not in ed:
                out.add((s, neg, j))
    return out


def test_negative_samples_protocol_and_replay(spark):
    df = _edges(spark)
    got = {
        (r.src, r.dst_neg, r.slot)
        for r in negative_samples(df, n_nodes=10, n_neg=2).collect()
    }
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 2), (1, 2)]
    assert got == _replay(edges, 10)
    true_edges = {(s, d) for s, d in edges if s != d}
    for s, neg, j in got:
        assert (s, neg) not in true_edges  # filtered: never a true edge
        assert neg != s                    # never the self-loop
        assert 0 <= j < 2
        assert 0 <= neg < 10


def test_negative_samples_deterministic_and_bounded(spark):
    df = _edges(spark)
    a = sorted(map(tuple, negative_samples(df, n_nodes=10, n_neg=3).collect()))
    b = sorted(map(tuple, negative_samples(df.repartition(5), n_nodes=10, n_neg=3).collect()))
    assert a == b
    # fan-out bound: at most n_neg per distinct non-self edge (6 here)
    assert len(a) <= 3 * 6
    # different seed -> different corruption stream
    c = sorted(map(tuple, negative_samples(df, n_nodes=10, n_neg=3, seed=8).collect()))
    assert a != c

    with pytest.raises(ValueError, match="n_neg"):
        negative_samples(df, n_nodes=10, n_neg=0)
    with pytest.raises(ValueError, match="n_nodes"):
        negative_samples(df, n_nodes=1)
