"""Publish-side operators: format tagging, index generation, upload checks,
remap counting, set diff."""

from pyspark.sql import functions as F

from kg_obo_spark.operators.publish import (
    directory_index,
    file_set_diff,
    remap_with_count,
    tag_artifact_format,
    verify_uploads,
)


def _files(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_tag_artifact_format(spark):
    f = _files(
        spark,
        ["bfo/bfo_kgx_tsv.tar.gz", "bfo/bfo.json", "bfo/index.html", "bfo/notes.log"],
    )
    out = {r["basename"]: r["format"] for r in tag_artifact_format(f).collect()}
    assert out == {"bfo_kgx_tsv.tar.gz": "TSV", "bfo.json": "JSON", "notes.log": "OTHER"}


def test_directory_index(spark):
    f = _files(spark, ["a/x/1.json", "a/x/2.json", "a/y/3.json"])
    rows = {r["dirname"]: r for r in directory_index(f).collect()}
    assert rows["a/x"]["files"] == ["1.json", "2.json"]
    assert '<a href="3.json">' in rows["a/y"]["index_html"]


def test_verify_uploads(spark):
    good = _files(spark, ["o/bfo_kgx_tsv.tar.gz", "o/bfo.json"])
    missing = _files(spark, ["o/bfo_kgx_tsv.tar.gz"])
    assert verify_uploads(good, "bfo")
    assert not verify_uploads(missing, "bfo")


def test_remap_with_count(spark):
    df = spark.createDataFrame(
        [("bfo:1", "GO:2"), ("GO:3", "bfo:1"), ("X:9", "Y:8")], "s string, o string"
    )
    out, n = remap_with_count(df, ["s", "o"], {"bfo:1": "BFO:1"})
    assert n == 2
    vals = {(r["s"], r["o"]) for r in out.collect()}
    assert ("BFO:1", "GO:2") in vals and ("GO:3", "BFO:1") in vals


def test_file_set_diff(spark):
    a = _files(spark, ["x", "x", "y", "z"])
    b = _files(spark, ["x", "z"])
    got = sorted(r["key"] for r in file_set_diff(a, b).collect())
    assert got == ["x", "y"]


def test_index_dead_links_anti_join(spark):
    """Planted dead link: the index references a key missing from the manifest
    (the head_object probe as a left-anti join, upload.py:356-363)."""
    from kg_obo_spark.operators.publish import directory_index, index_dead_links

    files = spark.createDataFrame(
        [("bfo/a.json",), ("bfo/b.json",), ("go/c.json",)], "key string"
    )
    idx = directory_index(files)
    # manifest lost bfo/b.json after indexing
    manifest = files.filter(F.col("key") != "bfo/b.json")
    dead = [r["key"] for r in index_dead_links(idx, manifest).collect()]
    assert dead == ["bfo/b.json"]
    assert index_dead_links(idx, files).count() == 0


def test_root_index_links_only_live_dirs(spark):
    """Root index links only first-level dirs whose own index.html exists
    (update_root path, upload.py:283-384); missing-index dirs are reported."""
    from kg_obo_spark.operators.publish import root_index

    files = spark.createDataFrame(
        [
            ("bfo/a.json",), ("bfo/index.html",),
            ("go/c.json",),  # no index.html -> dead
            ("pato/d.json",), ("pato/index.html",),
            ("rootfile.txt",),  # not a directory
        ],
        "key string",
    )
    row = root_index(files).first()
    assert row["dirs"] == ["bfo", "pato"]
    assert row["dead_dirs"] == ["go"]
    assert '<a href="bfo/">' in row["index_html"]
    assert "go/" not in row["index_html"]
