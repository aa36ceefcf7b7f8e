"""OWL-header scanning as native column expressions (SURVEY §2.1 S4/S5).

Distributed reformulation of the reference's mmap+regex header scans: instead
of one file on one machine, a DataFrame with a ``text`` column holding raw
OWL header content (one row per ontology file / file head), scanned with a
``regexp_extract`` cascade inside whole-stage codegen.

Semantics reproduced exactly from /root/reference/kg_obo/transform.py:
- ``extract_version_iri`` == get_owl_iri (transform.py:223-346): versionIRI ->
  rdf:about -> prefixless versionIRI precedence; version = second-to-last IRI
  path segment with the fao (third-to-last) and swo.owl (last) special cases
  (transform.py:272-276); per-ontology version-tag overrides for the
  oae/opmi/ons/geo/dideo/ino group, cheminf, and ICEO/KISAO (transform.py:
  282-296,310-311); date / dc:date / versionInfo / short-versionInfo
  fallbacks; sha256 digest for version strings longer than 100 chars
  (transform.py:334-337); S3-illegal characters replaced with '-'
  (transform.py:182-220).
- ``extract_imports`` == imports_requested (transform.py:501-523).

Pinned by the reference's own golden fixtures in tests/test_owl_functions.py
(every *_SNIPPET.owl case from /root/reference/tests/test_transform.py:249-310).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ILLEGAL_CHARS_RE = r"[&$@=;:+,?{}%`\[\]~<>#|() ]"

_IRI_TAG = r'owl:versionIRI rdf:resource="(.*)"'
_IRI_ABOUT_TAG = r'owl:Ontology rdf:about="(.*)"'
_DATE_TAG = r'oboInOwl:date rdf:datatype="http://www\.w3\.org/2001/XMLSchema#string">([^<]+)'
_DATE_DC_TAG = r'dc:date xml:lang="en">([^<]+)'
_VERSION_INFO_TAG = r'owl:versionInfo rdf:datatype="http://www\.w3\.org/2001/XMLSchema#string">([^<]+)'
_VERSION_INFO_DECIMAL_TAG = r'owl:versionInfo rdf:datatype="http://www\.w3\.org/2001/XMLSchema#decimal">([^<]+)'
_SHORT_VERSION_INFO_TAG = r"owl:versionInfo>([^<]+)"
_VERSION_IRI_ONLY_TAG = r'versionIRI rdf:resource="(.*)"'
_VERSION_LANG_EN_TAG = r'owl:versionInfo xml:lang="en">([^<]+)'
_VERSION_XSD_ENTITY_TAG = r'owl:versionInfo rdf:datatype="&xsd;string">([^<]+)'

# per-ontology special groups (transform.py:282-296,310-311)
_LANG_EN_GROUP = ["oae.owl", "opmi.owl", "ons.owl", "geo.owl", "dideo.owl", "ino.owl"]
_XSD_ENTITY_GROUP = ["cheminf.owl"]
_DECIMAL_GROUP = ["ICEO", "KISAO#"]


def replace_illegal_chars(col: Column, repl: str = "-") -> Column:
    """P2: replace the 23 S3-hostile characters (transform.py:182-220)."""
    return F.regexp_replace(col, ILLEGAL_CHARS_RE, repl)


def _seg(iri: Column, idx: int) -> Column:
    """iri.split('/')[idx] with IndexError -> empty string semantics."""
    parts = F.split(iri, "/")
    return F.when(F.size(parts) >= abs(idx), F.element_at(parts, idx)).otherwise(F.lit(""))


def extract_version_iri(text: Column) -> Column:
    """struct(iri, version, version_format) — get_owl_iri as one expression tree."""
    iri_m = F.regexp_extract(text, _IRI_TAG, 1)
    about_m = F.regexp_extract(text, _IRI_ABOUT_TAG, 1)
    only_m = F.regexp_extract(text, _VERSION_IRI_ONLY_TAG, 1)

    iri = (
        F.when(iri_m != "", iri_m)
        .when(about_m != "", about_m)
        .when(only_m != "", only_m)
        .otherwise(F.lit("no_iri"))
    )
    fmt0 = (
        F.when(iri_m != "", F.lit("versionIRI"))
        .when(about_m != "", F.lit("versionInfo"))
        .when(only_m != "", F.lit("versionIRI (but missing the owl: prefix)"))
        .otherwise(F.lit("none"))
    )

    last = _seg(iri, -1)
    penult = _seg(iri, -2)

    # version from the IRI path (versionIRI branches only)
    v_from_iri = (
        F.when(penult == "fao", _seg(iri, -3))
        .when(penult == "swo.owl", last)
        .otherwise(penult)
    )
    # about-branch version: only the special groups yield one directly
    v_about = (
        F.when(last.isin(_LANG_EN_GROUP), F.regexp_extract(text, _VERSION_LANG_EN_TAG, 1))
        .when(last.isin(_XSD_ENTITY_GROUP), F.regexp_extract(text, _VERSION_XSD_ENTITY_TAG, 1))
        .otherwise(F.lit(""))
    )

    version0 = (
        F.when(iri_m != "", v_from_iri)
        .when(about_m != "", v_about)
        .when(only_m != "", _seg(only_m, -2))
        .otherwise(F.lit(""))
    )
    version0 = F.when(version0 == "", F.lit("no_version")).otherwise(version0)

    # phase 2: date / versionInfo fallbacks when no version was found
    vinfo_tag_m = F.when(
        last.isin(_DECIMAL_GROUP),
        F.regexp_extract(text, _VERSION_INFO_DECIMAL_TAG, 1),
    ).otherwise(F.regexp_extract(text, _VERSION_INFO_TAG, 1))
    fallback = F.coalesce(
        *[
            F.nullif(m, F.lit(""))
            for m in (
                F.regexp_extract(text, _DATE_TAG, 1),
                F.regexp_extract(text, _DATE_DC_TAG, 1),
                vinfo_tag_m,
                F.regexp_extract(text, _SHORT_VERSION_INFO_TAG, 1),
            )
        ]
    )
    needs_fallback = version0 == "no_version"
    version1 = F.when(needs_fallback & fallback.isNotNull(), fallback).otherwise(version0)
    fmt = F.when(needs_fallback & fallback.isNotNull(), F.lit("a date or version info field")).otherwise(fmt0)

    # free-text versions are hashed (len > 100 -> sha256, transform.py:334-337);
    # hashing applies only on the fallback path, mirroring the reference flow
    version2 = F.when(
        needs_fallback & (F.length(version1) > 100), F.sha2(version1, 256)
    ).otherwise(version1)

    return F.struct(
        iri.alias("iri"),
        replace_illegal_chars(version2).alias("version"),
        fmt.alias("version_format"),
    )


def extract_imports(text: Column) -> Column:
    """array of owl:imports targets (imports_requested, transform.py:501-523)."""
    return F.regexp_extract_all(text, F.lit(r'owl:imports rdf:resource="(.*)"'), F.lit(1))
