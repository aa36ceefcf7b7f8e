"""Graph aggregates pinned to the reference's bfo golden fixture values:
73 nodes / 116 edges / CC (10,1,49) / 7 singletons / max degree 47 /
mean degree '3.18' (/root/reference/tests/test_stats.py:25-31). The fixture
TSVs are read from the read-only reference checkout — data, not code."""

import os

import pytest
from pyspark.sql import functions as F

from kg_obo_spark.operators.graph_stats import (
    compare_versions,
    degree_frame,
    format_fanout,
    graph_stats,
    missing_namespaces,
    parse_robot_metrics,
)
from kg_obo_spark.sources.kgx import read_kgx_tsv

FIXTURE_DIR = "/root/reference/tests/resources/download_ontology"


@pytest.fixture(scope="module")
def bfo(spark):
    if not os.path.isdir(FIXTURE_DIR):
        pytest.skip("reference fixture not available")
    nodes = read_kgx_tsv(spark, os.path.join(FIXTURE_DIR, "bfo_kgx_tsv_nodes.tsv"))
    edges = read_kgx_tsv(spark, os.path.join(FIXTURE_DIR, "bfo_kgx_tsv_edges.tsv"))
    return nodes.cache(), edges.cache()


def test_bfo_golden_stats(bfo):
    nodes, edges = bfo
    s = graph_stats(nodes, edges)
    assert s.nodes == 73
    assert s.edges == 116
    assert s.connected_components == (10, 1, 49)
    assert s.singletons == 7
    assert s.max_node_degree == 47
    assert s.mean_node_degree == "3.18"


def test_salted_degree_matches_plain(bfo):
    _, edges = bfo
    plain = {r["id"]: r["degree"] for r in degree_frame(edges).collect()}
    salted = {r["id"]: r["degree"] for r in degree_frame(edges, salted=True).collect()}
    assert plain == salted


def test_format_fanout(spark):
    nv = spark.createDataFrame([("bfo", "v1"), ("go", "v2")], "Name string, Version string")
    out = format_fanout(nv)
    assert out.count() == 4
    assert {r["Format"] for r in out.collect()} == {"TSV", "JSON"}


def test_compare_versions_outliers(spark):
    rows = [
        ("bfo", "v1", "TSV", 1000, 100, 200),
        ("bfo", "v2", "TSV", 1100, 105, 210),  # within all bands
        ("bfo", "v3", "TSV", 5000, 500, 1000),  # size+count outlier vs v1/v2
    ]
    df = spark.createDataFrame(
        rows, "Name string, Version string, Format string, Size long, Nodes long, Edges long"
    )
    flagged = {r["Version"]: r["issues"] for r in compare_versions(df).collect()}
    assert "v3" in flagged and "size_outlier" in flagged["v3"]
    assert "v1" in flagged  # ratio vs v3 is out of band in the other direction
    # v1 vs v2 within bands -> the only issues come from comparisons against v3
    assert set(flagged) == {"v1", "v2", "v3"}


def test_missing_namespaces_anti_join(spark):
    owl_ns = spark.createDataFrame([("BFO",), ("GO",), ("MISSING",)], "ns string")
    names = spark.createDataFrame([("BFO:x",), ("GO:y",)], "name string")
    out = [r["ns"] for r in missing_namespaces(owl_ns, names).collect()]
    assert out == ["MISSING"]


def test_parse_robot_metrics_golden(spark):
    """Golden assertion from /root/reference/tests/test_stats.py:193-198."""
    path = "/root/reference/tests/resources/test-owl-profile-validation.tsv"
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    df = spark.read.csv(path, sep="\t", header=True)
    out = {
        r["metric"]: r["metric_values"]
        for r in parse_robot_metrics(df, ["constructs", "rule_count"]).collect()
    }
    assert out["constructs"] == ["I", "O", "Q", "R", "S"]
    assert out["rule_count"] == ["0"]
