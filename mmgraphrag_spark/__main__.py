"""spark-submit entry point (the north_rule invocation shape).

Cluster:

    zip -r mmgraphrag_spark.zip mmgraphrag_spark/
    spark-submit --py-files mmgraphrag_spark.zip \\
        --master <cluster> --num-executors <N> \\
        mmgraphrag_spark/__main__.py --sf-dir s3://.../docs --work-dir s3://.../kg

The session comes from spark-submit's conf (master/executors/memory); local
runs fall back to mmgraphrag_spark.session.get_spark. The job is the staged,
checkpointed, resumable pipeline (plans/pipeline.py): rerunning after a
failure skips complete stages.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(prog="mmgraphrag_spark")
    ap.add_argument("--sf-dir", default="", help="input table directory")
    ap.add_argument("--work-dir", required=True, help="checkpoint/output directory")
    ap.add_argument("--no-resume", action="store_true",
                    help="recompute every stage even if checkpoints exist")
    ap.add_argument(
        "--source", default=None, metavar="KIND=PATH",
        help="real-ingestion front end instead of the documents table: "
             "mineru=<glob of *_content_list.json>, docx=<glob>, pdf=<glob>",
    )
    args = ap.parse_args()
    if not args.sf_dir and not args.source:
        ap.error("one of --sf-dir or --source is required")

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from .session import get_spark

        spark = get_spark("mmgraphrag_spark")

    from .plans.pipeline import Pipeline

    source = None
    if args.source:
        kind, _, path = args.source.partition("=")
        source = (kind, path)
    pipe = Pipeline(spark, args.sf_dir, args.work_dir, source=source)
    ran = pipe.run(resume=not args.no_resume)
    lin = pipe.lineage().toPandas()
    rows = lin.drop_duplicates("output").set_index("output")["rows_out"]
    print(json.dumps({
        "run_id": pipe.run_id,
        "stages_ran": ran,
        "rows": {k: int(v) for k, v in rows.items()},
    }))


if __name__ == "__main__":
    main()
