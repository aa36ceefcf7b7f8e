"""Deterministic synthetic `transcripts` table generator.

Schema is exactly the BASELINE.json input_hint contract:

    conv_id:string, turn_idx:int32, role:string, text:string, tool:string, ts:timestamp

Planted content (FIXTURES.md §1): dictionary mentions as exact labels, case
variants, synonyms, raw CURIEs, and malformed CURIEs (lowercased prefix /
``OBO:``-prefixed / raw IRI — the shapes normalized by the reference's
examine_owl_names + clean_and_normalize_graph,
/root/reference/kg_obo/robot_utils.py:287-311 and transform.py:604-621);
Zipf-skewed hot terms and speakers; some turns with zero mentions.

Generation is Spark-distributed (`spark.range(n_convs)` → ``mapInPandas``) and
partition-independent: every draw is a pure function of (seed, conv, turn, slot)
via splitmix64 (see rand.py), so the same (n_convs, seed) always yields the
identical table at any parallelism — required for the local[8]-vs-local[32]
scaling evidence to run on byte-identical input.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kg_obo_spark.datagen import rand
from kg_obo_spark.datagen.ontology import Ontology, build_ontology

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_ROLES = ["assistant", "user", "tool"]
_TOOLS = ["search", "calculator", "kg_lookup", "retrieval"]

# Sentence templates; {m} slots are replaced by planted mention surfaces.
_TEMPLATES_BY_SLOTS = {
    0: [
        "Let me summarize the findings so far.",
        "Could you clarify the last step?",
        "Running the requested analysis now.",
        "No entities were detected in this chunk.",
    ],
    1: [
        "The concept {m0} appears in the corpus.",
        "I looked up {m0} in the ontology registry.",
        "Annotation: {m0} was tagged in the prior turn.",
        "See the definition of {m0} for details.",
    ],
    2: [
        "Note that {m0} is closely related to {m1}.",
        "We observed {m0} interacting with {m1} in the assay.",
        "Both {m0} and {m1} occur in this document.",
        "Compare {m0} against {m1} before merging.",
    ],
    3: [
        "The terms {m0}, {m1} and {m2} co-occur frequently.",
        "Mapping {m0} to {m1} requires the context of {m2}.",
        "Entities: {m0}; {m1}; {m2}.",
    ],
}

_BASE_TS = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp())


def _surface_variants(term: dict) -> list[str]:
    """All plantable surface forms for a term, in a stable order.

    Index into this list is chosen by a deterministic draw. Covers: exact label,
    case variants, synonyms, canonical CURIE, and the malformed-CURIE shapes the
    normalization stage must repair.
    """
    tid = term["id"]
    prefix, num = tid.split(":")
    forms = [
        term["name"],                 # exact label          -> score 1.0
        term["name"].upper(),         # case variant         -> 0.95
        term["name"].capitalize(),    # case variant         -> 0.95
        tid,                          # canonical CURIE      -> 1.0
        f"{prefix.lower()}:{num}",    # lowercased prefix    -> normalize (P8)
        f"OBO:{prefix}_{num}",        # OBO:-prefixed        -> normalize (J3)
        term["iri"],                  # raw IRI              -> compress (J3)
    ]
    forms.extend(term["synonyms"])    # synonyms             -> 0.9
    return forms


def _gen_for_convs(
    conv_ids: np.ndarray,
    seed: int,
    onto_terms: list[dict],
    sentences_range: tuple[int, int] = (1, 1),
) -> pd.DataFrame:
    """Emit all turns for a batch of conversation ids (vectorized where it counts).

    ``sentences_range=(lo, hi)``: sentences per turn — (1,1) for the small test
    corpora; the bench uses a wider range so per-turn extraction cost is
    representative of real transcripts (hundreds of chars, several mentions)."""
    n_terms = len(onto_terms)
    variants = [_surface_variants(t) for t in onto_terms]

    # turns per conversation in [2, 16)
    lengths = 2 + rand.randint(seed, conv_ids, 1, 14)
    conv_rep = np.repeat(conv_ids, lengths)
    total = int(lengths.sum())
    # turn_idx = position within conversation
    starts = np.zeros(len(conv_ids), dtype=np.int64)
    starts[1:] = np.cumsum(lengths)[:-1]
    turn_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)

    # one global turn key per row for deterministic draws
    tkey = conv_rep * np.int64(64) + turn_idx

    role_idx = rand.zipf_indices(seed, tkey, 2, len(_ROLES), alpha=1.0)
    tool_idx = rand.randint(seed, tkey, 3, len(_TOOLS))
    lo, hi = sentences_range
    n_sent = lo + (rand.randint(seed, tkey, 6, hi - lo + 1) if hi > lo else 0)

    # per-sentence draws, slot-offset by sentence index j
    max_sent = hi
    sent_draws = []
    for j in range(max_sent):
        base = 100 + j * 30
        m_draw = rand.uniform(seed, tkey, base + 4)
        n_mentions = np.select(
            [m_draw < 0.15, m_draw < 0.50, m_draw < 0.85], [0, 1, 2], default=3
        )
        tmpl_idx = rand.randint(seed, tkey, base + 5, 4)
        term_sel = [
            rand.zipf_indices(seed, tkey, base + 10 + s, n_terms, alpha=1.2)
            for s in range(3)
        ]
        var_draw = [rand.uniform(seed, tkey, base + 20 + s) for s in range(3)]
        sent_draws.append((n_mentions, tmpl_idx, term_sel, var_draw))

    texts = []
    roles = []
    tools = []
    for i in range(total):
        ns = int(n_sent[i]) if hi > lo else lo
        parts = []
        for j in range(ns):
            n_mentions, tmpl_idx, term_sel, var_draw = sent_draws[j]
            k = int(n_mentions[i])
            tmpl = _TEMPLATES_BY_SLOTS[k][int(tmpl_idx[i]) % len(_TEMPLATES_BY_SLOTS[k])]
            if k:
                subs = {}
                for s in range(k):
                    forms = variants[int(term_sel[s][i])]
                    subs[f"m{s}"] = forms[int(var_draw[s][i] * len(forms))]
                parts.append(tmpl.format(**subs))
            else:
                parts.append(tmpl)
        texts.append(" ".join(parts))
        r = _ROLES[int(role_idx[i])]
        roles.append(r)
        tools.append(_TOOLS[int(tool_idx[i])] if r == "tool" else "")

    ts = pd.to_datetime(
        _BASE_TS + conv_rep * 3600 + turn_idx * 30, unit="s", utc=True
    ).tz_localize(None)

    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv-", conv_rep.astype(str)),
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    ontology: Ontology | None = None,
    num_partitions: int | None = None,
    sentences_range: tuple[int, int] = (1, 1),
) -> DataFrame:
    """Distributed deterministic transcripts DataFrame (~9 turns/conversation)."""
    onto = ontology or build_ontology()
    terms = onto.terms  # small; ships in the task closure once per executor
    seed_ = int(seed)
    srange = tuple(sentences_range)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_for_convs(
                    pdf["id"].to_numpy(np.int64), seed_, terms, srange
                )

    rng = spark.range(n_convs, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=SCHEMA)


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_convs: int = 1000,
    seed: int = 42,
    num_files: int | None = None,
    ontology: Ontology | None = None,
    sentences_range: tuple[int, int] = (1, 1),
) -> None:
    """Materialize to Parquet, bucket-friendly layout: hash-partitioned by
    conv_id so downstream per-conversation stages read co-located data
    (SURVEY §4 item 4).

    ``num_files`` fixes the file count independent of the writing session's
    parallelism — readers at any core count then get the same split layout
    (required for the N-vs-4N scaling comparison to be apples-to-apples).

    Default file count (r8): the size-derived count (``n_convs // 2000``,
    floor 64) rounded to the nearest multiple of the writing session's
    ``defaultParallelism``, so the reader's split packing divides evenly
    into task waves instead of leaving a straggler tail (guide §2.6/§6 —
    measured: 100 files pack into 34 splits on 32 cores, a 2-wave tail that
    ran the fused extraction scan at 1.64 s; 96 files pack into exactly 32
    splits and run it at 1.31 s, identical row content at every count)."""
    if num_files is None:
        base = max(64, n_convs // 2000)
        par = max(1, spark.sparkContext.defaultParallelism)
        num_files = max(par, round(base / par) * par)
    df = generate_transcripts(
        spark, n_convs=n_convs, seed=seed, ontology=ontology,
        sentences_range=sentences_range,
    )
    df.repartition(num_files, "conv_id").sortWithinPartitions(
        "conv_id", "turn_idx"
    ).write.mode("overwrite").parquet(path)
