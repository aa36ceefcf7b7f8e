"""spark-submit entry point for the KG-construction pipeline.

Cluster usage (north_rule: spark-submit --py-files on a multi-executor cluster):

    zip -r kg_obo_spark.zip kg_obo_spark/
    spark-submit --py-files kg_obo_spark.zip \
        scripts/submit_pipeline.py \
        --transcripts s3://bucket/transcripts/ \
        --out s3://bucket/kg_out/ \
        --buckets 4096 --unit-batch 64

Local smoke:

    python scripts/submit_pipeline.py --synthetic 500 --out /tmp/kg_out

The script only parses args and wires the session; all semantics live in
kg_obo_spark.plans.pipeline.run_pipeline (lock, resume, lineage included).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--transcripts", help="path of the transcripts table (parquet)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic conversations instead of reading --transcripts")
    p.add_argument("--out", required=True, help="output root for KG tables + tracking")
    p.add_argument("--buckets", type=int, default=8, help="resume-unit bucket count")
    p.add_argument("--unit-batch", type=int, default=None,
                   help="units per atomic commit (default: all pending in one)")
    p.add_argument("--run-id", default=None)
    p.add_argument("--export-targz", action="store_true",
                   help="also export the {name}_kgx_tsv.tar.gz artifact")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from kg_obo_spark.datagen.ontology import build_ontology
    from kg_obo_spark.plans.pipeline import run_pipeline

    # under spark-submit the session is preconfigured by the submitter; fall
    # back to the tuned local builder otherwise
    spark = SparkSession.getActiveSession()
    if spark is None:
        from kg_obo_spark.session import get_spark

        spark = get_spark(app_name="kg_obo_spark_pipeline")

    onto = build_ontology()
    if args.synthetic:
        from kg_obo_spark.datagen.transcripts import generate_transcripts

        transcripts = generate_transcripts(spark, n_convs=args.synthetic, ontology=onto)
    elif args.transcripts:
        transcripts = spark.read.parquet(args.transcripts)
    else:
        p.error("one of --transcripts / --synthetic is required")

    res = run_pipeline(
        spark,
        transcripts,
        onto,
        args.out,
        run_id=args.run_id,
        n_buckets=args.buckets,
        unit_batch_size=args.unit_batch,
    )
    print(
        f"run_id={res.run_id} nodes={res.nodes.count()} edges={res.edges.count()} "
        f"units_processed={len(res.units_processed)} units_skipped={len(res.units_skipped)}"
    )
    if args.export_targz:
        from kg_obo_spark.sources.kgx import export_kgx_targz

        tar = export_kgx_targz(res.nodes, res.edges, onto.name, args.out)
        print(f"exported {tar}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
