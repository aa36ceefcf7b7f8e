"""Mergeable HLL sketches: accuracy, associativity, cross-snapshot merge."""

from pyspark.sql import functions as F

from kg_obo_spark.functions.sketches import (
    estimate,
    merge_sketches,
    partition_sketch_lineage,
    sketch_distinct,
)
from kg_obo_spark.sources.tableio import Table


def test_estimate_accuracy_large_cardinality(spark):
    n = 50_000
    df = spark.range(n * 3).select((F.col("id") % n).alias("v"))
    est = sketch_distinct(df, "v").select(estimate("sketch")).first()["estimate"]
    assert abs(est - n) / n < 0.05  # lg_k=12 -> ~1.6% RSE (3-sigma bound)


def test_partition_merge_equals_whole(spark):
    # associativity: union of per-partition sketches == one whole-frame sketch
    df = spark.range(20_000).select((F.col("id") % 3777).alias("v")).repartition(8)
    whole = sketch_distinct(df, "v").select(estimate("sketch")).first()["estimate"]
    parts = partition_sketch_lineage(df, "v")
    assert parts.count() == 8
    merged = merge_sketches(parts).select(estimate("sketch")).first()["estimate"]
    assert merged == whole


def test_cross_snapshot_merge_without_rescan(spark, tmp_path):
    # two batch commits each carry their sketch rows; distinct-over-all comes
    # from merging the stored sketches, never rescanning the data
    t = Table(str(tmp_path / "sk"))
    b1 = spark.range(0, 1000).select(F.col("id").alias("v"))
    b2 = spark.range(500, 1500).select(F.col("id").alias("v"))  # 50% overlap
    t.commit(sketch_distinct(b1, "v"), mode="append")
    t.commit(sketch_distinct(b2, "v"), mode="append")
    merged = merge_sketches(t.read(spark)).select(estimate("sketch")).first()["estimate"]
    exact = b1.union(b2).distinct().count()
    assert abs(merged - exact) / exact < 0.03
    assert merged != 2000  # it deduplicates across snapshots, not a row sum
