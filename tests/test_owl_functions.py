"""OWL header scans pinned to the reference's own golden fixtures — the exact
(iri, version, version_format) tuples asserted in
/root/reference/tests/test_transform.py:249-315 for every *_SNIPPET.owl.
Fixture files are read from the read-only reference checkout (data, not code).
"""

import os

import pytest
from pyspark.sql import functions as F

from kg_obo_spark.functions.owl import (
    extract_imports,
    extract_version_iri,
    replace_illegal_chars,
)

RES = "/root/reference/tests/resources/download_ontology"

GOLDEN = {
    "bfo.owl": ("http://purl.obolibrary.org/obo/bfo/2019-08-26/bfo.owl", "2019-08-26", "versionIRI"),
    "aro_SNIPPET.owl": ("http://purl.obolibrary.org/obo/antibiotic_resistance.owl", "05-07-2021-15-21", "a date or version info field"),
    "go_SNIPPET.owl": ("http://purl.obolibrary.org/obo/go/releases/2021-09-01/go-base.owl", "2021-09-01", "versionIRI"),
    "micro_SNIPPET.owl": ("&obo;MicrO.owl", "20ca3a0f90793de0c0f9b2ecbd186456e1393cdd0547b46f8eb2d466c6fa080a", "a date or version info field"),
    "swo_SNIPPET.owl": ("http://www.ebi.ac.uk/swo/swo.owl/1.7", "1.7", "versionIRI"),
    "pr_SNIPPET.owl": ("http://purl.obolibrary.org/obo/pr/63.0/pr.owl", "63.0", "versionIRI"),
    "oae_SNIPPET.owl": ("http://purl.obolibrary.org/obo/oae.owl", "1.2.44", "versionInfo"),
    "opmi_SNIPPET.owl": ("http://purl.obolibrary.org/obo/opmi.owl", "Vision-Release--1.0.130", "versionInfo"),
    "cheminf_SNIPPET.owl": ("http://semanticchemistry.github.io/semanticchemistry/ontology/cheminf.owl", "2.0", "versionInfo"),
    "tads_SNIPPET.owl": ("http://purl.obolibrary.org/obo/tads/2015-08-20/tads.owl", "2015-08-20", "versionIRI (but missing the owl: prefix)"),
    "iceo_SNIPPET.owl": ("http://purl.obolibrary.org/obo/2019/1/ICEO", "2.1", "a date or version info field"),
    "bfo_NO_VERSION_IRI.owl": ("http://purl.obolibrary.org/obo/bfo.owl", "no_version", "versionInfo"),
}


@pytest.fixture(scope="module")
def owl_df(spark):
    if not os.path.isdir(RES):
        pytest.skip("reference fixtures not available")
    rows = []
    for fname in GOLDEN:
        with open(os.path.join(RES, fname), "rb") as f:
            rows.append((fname, f.read().decode("utf-8", errors="replace")))
    return spark.createDataFrame(rows, "fname string, text string")


def test_extract_version_iri_golden(owl_df):
    out = {
        r["fname"]: (r["v"]["iri"], r["v"]["version"], r["v"]["version_format"])
        for r in owl_df.select("fname", extract_version_iri(F.col("text")).alias("v")).collect()
    }
    for fname, expected in GOLDEN.items():
        assert out[fname] == expected, f"{fname}: {out[fname]} != {expected}"


def test_extract_imports_golden(spark):
    path = os.path.join(RES, "upheno_SNIPPET.owl")
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    with open(path, "rb") as f:
        df = spark.createDataFrame([(f.read().decode("utf-8", "replace"),)], "text string")
    [row] = df.select(extract_imports(F.col("text")).alias("imp")).collect()
    assert row["imp"] == ["&obo;upheno/metazoa.owl"]


def test_replace_illegal_chars(spark):
    df = spark.createDataFrame([("a b&c:d(e)f[g]h",)], "s string")
    [r] = df.select(replace_illegal_chars(F.col("s")).alias("x")).collect()
    assert r["x"] == "a-b-c-d-e-f-g-h"
