"""Pluggable subword tokenization for the training-data layout family.

The layout operators (:func:`~kg_obo_spark.operators.packing.pack_sequences`,
:func:`~kg_obo_spark.operators.chunking.chunk_documents`, token budgeting)
are parameterized by a token model. The default is the engine-wide
whitespace :func:`~kg_obo_spark.functions.text.tokens` model — cheap and
JVM-side — but a real LLM pipeline packs SUBWORD tokens: budgets differ
from whitespace counts by ~1.3-1.7x and vary by language, so a shipped
sequence layout computed on whitespace counts would not match what a
training run actually consumes. :class:`GreedyWordpiece` is that seam's
first pluggable implementation.

Model: greedy longest-prefix (max-munch) segmentation of each whitespace
word against a fixed vocabulary, with an implicit single-character
fallback — equivalent to HuggingFace-style WordPiece over a vocab closed
under single characters, with continuation pieces identified by their
surface form (the ``##`` marker is presentation, not semantics). The
segmentation — and therefore every token count and slice boundary the
layout operators consume — is fully deterministic and engine-portable:
the driver's DuckDB oracle reproduces it bit-for-bit with a recursive CTE
(see ``pack_sequences_bpe`` in ``__spark_entry__``).

100 TB shape: a vectorized ``mapInPandas`` stage — map-side, ZERO exchange,
so plugging it under pack/chunk leaves their one-/zero-exchange dataflow
untouched. Per Arrow batch the text is split with the engine token model
(:func:`~kg_obo_spark.functions.text.py_tokens`, the exact Java ``\\s+``
mirror), each DISTINCT word is segmented exactly once through a
worker-lifetime memo (natural-language corpora repeat words heavily; the
max-munch loop is O(word_len * max_piece_len) on misses only), and rows are
expanded by dict lookup. The vocabulary rides the closure (broadcast-sized
by definition: a tokenizer vocab is 30k-100k pieces).

Reference analog: none — kg-obo has no tokenizer (reference:
kg_obo/transform.py processes ontologies as atomic artifacts). This is
part of the LLM-training-data family built on top of the reference's
inventory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from kg_obo_spark.functions.text import py_tokens

# The contract vocabulary: literal pieces shared verbatim with the DuckDB
# oracle (the md5_sign_planes discipline — one source of truth, embedded in
# BOTH engines). Sized so the synthetic corpus's words split into 1-3
# pieces (~1.8x whitespace counts — realistic subword inflation), with
# the highest-frequency function words kept whole.
DEFAULT_WORDPIECE_VOCAB: tuple[str, ...] = (
    "the", "fast", "slow", "big", "row", "key",
    "tab", "le", "val", "ue", "sc", "an", "ag", "gr", "oup",
    "part", "ha", "sh", "li", "ne", "so", "rt", "mer", "ge",
    "ba", "tch", "sp", "ark", "wind", "ow", "ord", "er",
    "da", "ta", "col", "umn", "jo", "in", "sm", "all",
    "cust", "om", "qu", "ery", "str", "eam", "vec", "tor",
    "fil", "ter",
)

# Worker-lifetime memo: Python workers are reused across tasks, so keying
# the word->pieces cache on the vocab (module-global) makes the per-task
# closure's memo survive task boundaries.
_WORKER_MEMOS: dict[frozenset[str], dict[str, tuple[str, ...]]] = {}


class GreedyWordpiece:
    """Greedy longest-prefix subword tokenizer over a fixed vocabulary.

    ``encode_word`` repeatedly strips the longest vocabulary piece that
    prefixes the remaining word; a position where no piece matches emits
    that single character as its own piece (the implicit single-char
    closure), so every word segments and ``len(pieces) >= 1``.

    Plug an instance into ``pack_sequences(..., tokenizer=...)`` /
    ``chunk_documents(..., tokenizer=...)`` to lay out training sequences
    in subword tokens; :meth:`counts_frame` / :meth:`pieces_frame` are the
    DataFrame-level stages they use (and the subword equivalents of
    ``token_count`` / ``tokens`` for any other consumer).
    """

    def __init__(self, vocab: tuple[str, ...] = DEFAULT_WORDPIECE_VOCAB):
        pieces = tuple(vocab)
        if not pieces:
            raise ValueError("vocab must be non-empty")
        for p in pieces:
            if not p or py_tokens(p) != [p]:
                raise ValueError(
                    f"vocab pieces must be non-empty and whitespace-free: {p!r}"
                )
        self.vocab = frozenset(pieces)
        self.max_piece_len = max(len(p) for p in pieces)

    # ------------------------------------------------------- pure Python
    def encode_word(self, word: str) -> tuple[str, ...]:
        memo = _WORKER_MEMOS.setdefault(self.vocab, {})
        got = memo.get(word)
        if got is None:
            out: list[str] = []
            i, n = 0, len(word)
            while i < n:
                ln = min(self.max_piece_len, n - i)
                while ln > 1 and word[i : i + ln] not in self.vocab:
                    ln -= 1
                out.append(word[i : i + ln])
                i += ln
            got = memo[word] = tuple(out)
        return got

    def encode(self, text: str) -> list[str]:
        """All pieces of ``text`` under the engine token model."""
        return [p for w in py_tokens(text) for p in self.encode_word(w)]

    def n_tokens(self, text: str) -> int:
        return sum(len(self.encode_word(w)) for w in py_tokens(text))

    # -------------------------------------------------- DataFrame stages
    def counts_frame(
        self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """(``id_col``, ``n_tok``): subword token count per document — the
        tokenizer-seam replacement for ``token_count`` in pack_sequences.
        Map-side mapInPandas, zero exchange."""
        id_type = df.schema[id_col].dataType.simpleString()
        tok = self

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                counts = [
                    sum(len(tok.encode_word(w)) for w in py_tokens(t))
                    for t in pdf[text_col].astype(str)
                ]
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "n_tok": pd.Series(counts, dtype="int64", index=pdf.index),
                    }
                )

        return df.select(id_col, text_col).mapInPandas(
            gen, schema=f"{id_col} {id_type}, n_tok long"
        )

    def pieces_frame(
        self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """(``id_col``, ``_toks`` array<string>): the document's subword
        pieces in order — the tokenizer-seam replacement for ``tokens()``
        in chunk_documents. Map-side mapInPandas, zero exchange."""
        id_type = df.schema[id_col].dataType.simpleString()
        tok = self

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pieces = [
                    [p for w in py_tokens(t) for p in tok.encode_word(w)]
                    for t in pdf[text_col].astype(str)
                ]
                yield pd.DataFrame({id_col: pdf[id_col], "_toks": pieces})

        return df.select(id_col, text_col).mapInPandas(
            gen, schema=f"{id_col} {id_type}, _toks array<string>"
        )
