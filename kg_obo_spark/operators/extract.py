"""Mention detection + entity-link scoring over transcripts.

This is the engine's replacement for the reference's per-ontology parse stages
(regex scans over raw OWL text, /root/reference/kg_obo/transform.py:223-346 and
:501-523): instead of mmap+regex over one file on one machine, an Arrow-batched
``mapInPandas`` stage scans the ``text`` column against the broadcast dictionary.

Invariants (BASELINE.json input_hint):
- per-turn text equality: ``text`` is never mutated; mentions carry offsets into
  the original string, verified by ``tests/test_extract.py``.
- stable (conv_id, turn_idx) ordering: mentions keep both keys; within a turn,
  emission order is (start, end, term_id) — deterministic.
- no per-row Python UDFs: the scan is a vectorized Arrow stage; the regex engine
  does the per-character work in C, and the matcher is compiled once per worker
  (see dictionary.get_matcher).

Scale notes: the output carries offsets + surface, not the full text, so the
shuffle after extraction moves a small fraction of input bytes. The stage is
embarrassingly parallel — no shuffle of its own — and its partitioning follows
the input (bucketed by conv_id).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kg_obo_spark.datagen.ontology import Ontology
from kg_obo_spark.dictionary import get_matcher

MENTIONS_SCHEMA = (
    "conv_id string, turn_idx int, start int, end int, "
    "surface string, term_id string, score double"
)


def extract_mentions(
    transcripts: DataFrame, onto: Ontology, all_candidates: bool = False
) -> DataFrame:
    """transcripts -> mentions(conv_id, turn_idx, start, end, surface, term_id, score).

    Default (``all_candidates=False``): 1-best linking is resolved inside the
    scan task (candidates for a span are always co-located), so linking costs no
    shuffle. With ``all_candidates=True`` every candidate term per span is
    emitted; resolve later with :func:`link_best`.
    """
    best_only = not all_candidates

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = get_matcher(onto)
        for pdf in batches:
            conv_ids: list[str] = []
            turn_idxs: list[int] = []
            starts: list[int] = []
            ends: list[int] = []
            surfaces: list[str] = []
            term_ids: list[str] = []
            scores: list[float] = []
            for cid, tix, text in zip(
                pdf["conv_id"].to_numpy(), pdf["turn_idx"].to_numpy(), pdf["text"].to_numpy()
            ):
                for start, end, surf, tid, score in matcher.find(text, best_only=best_only):
                    conv_ids.append(cid)
                    turn_idxs.append(int(tix))
                    starts.append(start)
                    ends.append(end)
                    surfaces.append(surf)
                    term_ids.append(tid)
                    scores.append(score)
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv_ids, dtype="string"),
                    "turn_idx": pd.Series(turn_idxs, dtype="int32"),
                    "start": pd.Series(starts, dtype="int32"),
                    "end": pd.Series(ends, dtype="int32"),
                    "surface": pd.Series(surfaces, dtype="string"),
                    "term_id": pd.Series(term_ids, dtype="string"),
                    "score": pd.Series(scores, dtype="float64"),
                }
            )

    # only the columns the scan needs — lets Catalyst prune the parquet read
    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        scan, schema=MENTIONS_SCHEMA
    )


def link_best(mentions: DataFrame) -> DataFrame:
    """1-best entity linking: per (conv_id, turn_idx, start, end) keep the highest
    score, ties broken by term_id asc (deterministic).

    Expressed as a window rank so Catalyst plans a single shuffle on the span
    key; no Python in the loop.
    """
    w = Window.partitionBy("conv_id", "turn_idx", "start", "end").orderBy(
        F.col("score").desc(), F.col("term_id").asc()
    )
    return (
        mentions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
