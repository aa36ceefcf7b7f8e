"""Mergeable distinct-count sketches (HLL) as first-class columns.

The reference's stats job counts distincts by full rescans (stats.py single-
node pandas); at 100 TB a distinct-count that needs the raw data again is a
non-starter. This module makes the sketch itself a column value:

- every snapshot/batch commit can carry per-group (or per-partition) HLL
  sketch rows alongside its lineage;
- cross-snapshot distinct counts = ``hll_union_agg`` over the stored sketch
  rows — NO rescan of the data, associative and commutative so any subset of
  snapshots can be merged in any order;
- estimates come from ``hll_sketch_estimate`` (Apache DataSketches HLL inside
  Spark — JVM-side, codegen-friendly, no Python).

``approx_count_distinct`` (HyperLogLog++) exists but its state is not exposed
as a value, so it cannot be merged across snapshots — the whole point here.

Error: DataSketches HLL with ``lg_k`` buckets gives ~1.04/sqrt(2^lg_k)
relative standard error (lg_k=12 -> ~1.6%); small cardinalities are exact
(coupon list/set modes before HLL promotion).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12


def sketch_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """(group..., sketch binary): one HLL sketch of ``value_col`` per group
    (whole frame if no groups). One hash shuffle; sketches partial-aggregate
    map-side like any typed aggregate."""
    agg = F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def merge_sketches(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union sketch rows (from any number of snapshots/partitions) into one
    sketch per group: (group..., sketch). Associative + commutative."""
    agg = F.hll_union_agg("sketch").alias("sketch")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def estimate(sketch: Column | str) -> Column:
    """Distinct-count estimate of a sketch column."""
    return F.hll_sketch_estimate(sketch).alias("estimate")


def partition_sketch_lineage(
    df: DataFrame, value_col: str, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """(partition_id, rows, sketch): per-partition sketch rows for the lineage
    table — commit these with each stage snapshot and any later job can answer
    'how many distinct X so far' by merging, without touching the data."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("rows"),
            F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        )
    )
