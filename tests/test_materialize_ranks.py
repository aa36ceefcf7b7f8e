"""Vocab-int edge materialization equals the string path exactly: the
extract_turn_ranks -> edges_from_per_turn_ranks chain must produce the
identical edge set as extract_turn_terms -> edges_from_per_turn on the same
corpus (rank order == lexicographic string order makes a < b semantics
line up)."""

from kg_obo_spark.datagen import build_ontology, generate_transcripts
from kg_obo_spark.dictionary import get_matcher
from kg_obo_spark.operators.canonicalize import canonical_map
from kg_obo_spark.operators.extract import extract_turn_ranks, extract_turn_terms
from kg_obo_spark.operators.materialize import (
    edges_from_per_turn,
    edges_from_per_turn_ranks,
)


def test_rank_edges_equal_string_edges(spark):
    onto = build_ontology()
    tr = generate_transcripts(spark, n_convs=120, seed=9, ontology=onto).cache()
    eq = spark.createDataFrame(onto.xrefs, "a string, b string")
    terms_df = spark.createDataFrame(
        [(t["id"],) for t in onto.terms], "id string"
    )
    cdict = {
        r["term_id"]: r["canonical_id"]
        for r in canonical_map(terms_df, eq).collect()
    }

    want = {
        tuple(r)
        for r in edges_from_per_turn(
            extract_turn_terms(tr, onto, cdict), onto
        ).collect()
    }
    cu = get_matcher(onto, 0).canon_rank_table(cdict)[1]
    got = {
        tuple(r)
        for r in edges_from_per_turn_ranks(
            extract_turn_ranks(tr, onto, cdict), cu, onto
        ).collect()
    }
    assert got == want
    assert len(got) > 50  # the corpus actually produced edges


def test_rank_frame_matches_term_frame(spark):
    """Per-turn rank arrays decode to exactly the per-turn term arrays."""
    onto = build_ontology()
    tr = generate_transcripts(spark, n_convs=40, seed=3, ontology=onto)
    cu = list(get_matcher(onto, 0).canon_rank_table({})[1])
    terms = {
        (r.conv_id, r.turn_idx): list(r.terms)
        for r in extract_turn_terms(tr, onto, {}).collect()
    }
    ranks = {
        (r.conv_id, r.turn_idx): [cu[i] for i in r.ranks]
        for r in extract_turn_ranks(tr, onto, {}).collect()
    }
    assert ranks == terms and terms
