"""Deterministic sampling operators for training-data pipelines.

Random samplers (``df.sample``, ``TABLESAMPLE``) are irreproducible across
engines, partitionings, and reruns. Large-scale corpus work wants
HASH-MOD sampling instead: a row is in the sample iff
``hash(key) % M < k`` — the same rows come back on every engine, every
partitioning, and every rerun; disjoint (k, offset) slices give
train/val/test splits that never leak; and the filter is a pure map-side
projection (no shuffle, no state, no RNG seeds to thread through a DAG).

The hash is the first 8 hex chars of md5(key) — md5 is bit-identical in
every engine (Spark ``F.md5``, DuckDB ``md5``), which makes the sample
exactly SQL-oracle-able, unlike engine-specific xxhash64.

100 TB shape: a codegen projection + filter over the scan — sampling never
pays more than the read itself, and column pruning/pushdown still apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: modulus for the sampling buckets; 10_000 gives 0.01%-granular rates
SAMPLE_MOD = 10_000


def sample_bucket(key_col: Column) -> Column:
    """Deterministic bucket in [0, SAMPLE_MOD): first 8 md5 hex chars of the
    stringified key, parsed as an integer, mod SAMPLE_MOD. Engine-portable."""
    return F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % SAMPLE_MOD


def hash_mod_sample(
    df: DataFrame, key_col: str, rate_bp: int, offset_bp: int = 0
) -> DataFrame:
    """Keep rows whose key hashes into ``[offset_bp, offset_bp + rate_bp)``
    of the SAMPLE_MOD bucket space (bp = basis-point-of-10000 buckets).
    Disjoint offsets give leak-free splits: e.g. train = (9000, 0),
    val = (500, 9000), test = (500, 9500).

    The window must fit inside the bucket space: an interval sticking past
    ``SAMPLE_MOD`` silently undersamples (buckets wrap, the filter doesn't),
    which would break the leak-free-split guarantee (ADVICE r5 low)."""
    if not (0 <= offset_bp and 0 <= rate_bp and offset_bp + rate_bp <= SAMPLE_MOD):
        raise ValueError(
            f"sample window [{offset_bp}, {offset_bp + rate_bp}) outside "
            f"[0, {SAMPLE_MOD}): rate_bp and offset_bp must be non-negative "
            f"with offset_bp + rate_bp <= {SAMPLE_MOD}"
        )
    b = sample_bucket(F.col(key_col))
    lo, hi = offset_bp, offset_bp + rate_bp
    return df.filter((b >= F.lit(lo)) & (b < F.lit(hi)))


def hash_mod_sample_by(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates_bp: dict[str, int],
    default_bp: int = 0,
) -> DataFrame:
    """Stratified deterministic sampling (the reproducible ``sampleBy``):
    each stratum keeps rows whose bucket < its rate (in 1/SAMPLE_MOD units);
    unlisted strata fall back to ``default_bp``. Same determinism and
    split-safety as :func:`hash_mod_sample` — e.g. downsample a dominant
    language while keeping the tail whole. Still a pure codegen
    projection + filter: the per-stratum rate is a CASE expression, not a
    join, so the plan stays a single scan."""
    for k, v in {**rates_bp, "<default>": default_bp}.items():
        if not (0 <= v <= SAMPLE_MOD):
            raise ValueError(
                f"stratum {k!r} rate {v} outside [0, {SAMPLE_MOD}]"
            )
    rate = F.lit(default_bp)
    for k, v in sorted(rates_bp.items()):
        rate = F.when(F.col(strata_col) == F.lit(k), F.lit(v)).otherwise(rate)
    return df.filter(sample_bucket(F.col(key_col)) < rate)
