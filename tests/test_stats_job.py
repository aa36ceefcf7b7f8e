"""End-to-end stats job (get_all_stats analog): tracking flatten, fanout,
graph details, enrichment, validation, outlier comparison, TSV reports."""

import os

from kg_obo_spark.plans.stats_job import run_stats_job, tracking_to_versions
from kg_obo_spark.plans.tracking import TRACKING_SCHEMA


def _tracking(spark):
    rows = [
        ("bfo", "iri2", "v2", [("iri1", "v1")]),
        ("go", "iriG", "g1", []),
        ("new", "NA", "NA", []),
    ]
    return spark.createDataFrame(rows, TRACKING_SCHEMA)


def _graph(spark, n_nodes, n_edges):
    nodes = spark.createDataFrame([(f"N:{i}",) for i in range(n_nodes)], "id string")
    edges = spark.createDataFrame(
        [(f"N:{i}", "biolink:related_to", f"N:{(i + 1) % n_nodes}", "r", "ks") for i in range(n_edges)],
        "subject string, predicate string, object string, relation string, knowledge_source string",
    )
    return nodes, edges


def test_tracking_to_versions(spark):
    v = {(r["Name"], r["Version"]) for r in tracking_to_versions(_tracking(spark)).collect()}
    assert v == {("bfo", "v2"), ("bfo", "v1"), ("go", "g1")}


def test_run_stats_job(spark, tmp_path):
    graphs = {
        ("bfo", "v1"): _graph(spark, 10, 5),
        ("bfo", "v2"): _graph(spark, 11, 6),
        ("go", "g1"): _graph(spark, 50, 40),
    }
    sizes = {
        ("bfo", "v1", "TSV"): 1000,
        ("bfo", "v2", "TSV"): 1100,
        ("bfo", "v1", "JSON"): 900,
        ("bfo", "v2", "JSON"): 5000,  # size outlier vs v1 JSON
        ("go", "g1", "TSV"): 4000,
        ("go", "g1", "JSON"): 3500,
    }
    out = run_stats_job(spark, _tracking(spark), graphs, sizes, str(tmp_path))
    stats = {(r["Name"], r["Version"], r["Format"]): r for r in out["stats"].collect()}
    assert stats[("bfo", "v2", "TSV")]["Nodes"] == 11
    assert stats[("go", "g1", "JSON")]["Size"] == 3500
    assert len(stats) == 6  # 3 (name,version) x 2 formats
    flagged = {(r["Name"], r["Version"], r["Format"]): r["issues"] for r in out["comparison"].collect()}
    assert ("bfo", "v2", "JSON") in flagged and "size_outlier" in flagged[("bfo", "v2", "JSON")]
    assert ("bfo", "v2", "TSV") not in flagged
    val = {(r["Name"], r["Version"], r["Format"]): r["issue"] for r in out["validation"].collect()}
    assert all(v == "ok" for v in val.values())
    for f in ("stats.tsv", "validation.tsv", "comparison.tsv"):
        assert os.path.getsize(os.path.join(str(tmp_path), f)) > 0
